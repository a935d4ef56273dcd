"""Extended text family: TF-IDF/BM25 retrieval, histograms, BPE/perceptron steps, chunking, novelty, MRR."""

from __future__ import annotations

from cloudpelican_lsd_spark.operators import textstats as text_ops
from cloudpelican_lsd_spark.sources.tables import LOGS_ORACLE_CTE
from cloudpelican_lsd_spark.sources.tables import load_table
from cloudpelican_lsd_spark.sources.tables import logs_view
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloudpelican_lsd_spark.registry._core import (
    register,
)




@register(
    "text_bigram_topk",
    """WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM toks WHERE len(w) >= 2
)
SELECT bigram, COUNT(*)::BIGINT AS cnt
FROM bg GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 50""",
)
def q_text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-50 bigrams (language-model / boilerplate-mining
    primitive).  Same position-explode + element_at shape as the shingle
    path (dedup.py:80 notes: measured ~45% faster than a transform()
    lambda, which drops out of codegen); counts partial-aggregate
    map-side so the shuffle carries (bigram, partial_count), and the
    top-50 is a TakeOrdered — no global sort materialization."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(F.split(F.col("text"), " ").alias("w")).where(
        F.size("w") >= 2
    )
    bg = toks.select(
        "w",
        F.explode(F.expr("sequence(1, size(w) - 1)")).alias("i"),
    ).select(
        F.concat(
            F.element_at("w", F.col("i")),
            F.lit(" "),
            F.element_at("w", F.col("i") + 1),
        ).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(50)
    )



@register("text_repetition_ratio", text_ops.REPETITION_RATIO_ORACLE)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: per-doc top-word and top-bigram
    mass fractions (textstats.repetition_ratio) — the boilerplate /
    degenerate-text quality gate for corpus filtering."""
    return text_ops.repetition_ratio(load_table(spark, "documents", sf_dir))



@register(
    "text_length_quartiles",
    """WITH base AS (
  SELECT lang, doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
tiled AS (
  SELECT lang, n_tokens,
         ntile(4) OVER (PARTITION BY lang
                        ORDER BY n_tokens ASC, doc_id ASC) AS quartile
  FROM base
)
SELECT lang, CAST(quartile AS INT) AS quartile,
       COUNT(*)::BIGINT AS cnt,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens
FROM tiled GROUP BY lang, quartile""",
)
def q_text_length_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language NTILE(4) buckets of document token length with
    per-quartile count/min/max — the length-distribution audit behind
    curriculum bucketing and truncation-budget decisions.  NTILE needs a
    total order within each lang partition (tie-broken by doc_id, so the
    tiling is deterministic); at 100 TB the per-lang sort is the cost —
    the scale path swaps exact NTILE for approx_percentile cut points
    (distributed sketch, no global sort) with the same downstream shape."""
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "lang",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("n_tokens").asc(), F.col("doc_id").asc()
    )
    return (
        base.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("lang", F.col("quartile").cast("int").alias("quartile"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )



@register(
    "text_length_histogram",
    """WITH t AS (
  SELECT len(string_split(text, ' ')) AS n_tokens FROM documents
)
SELECT CAST(length(bin(n_tokens)) - 1 AS INT) AS log2_bucket,
       COUNT(*)::BIGINT AS n_docs,
       SUM(n_tokens)::BIGINT AS sum_tokens,
       MIN(n_tokens)::BIGINT AS min_tokens,
       MAX(n_tokens)::BIGINT AS max_tokens
FROM t GROUP BY 1""",
)
def q_text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two token-length histogram — the shape audit behind
    sequence-length budgeting (how much of the corpus lands in each
    context-window doubling).  The bucket is length(bin(n))-1 =
    floor(log2(n)) computed in INTEGER space (binary-string length), not
    float log2 — floating log at exact powers of two is
    implementation-defined at the ulp level and would flip bucket
    boundaries between engines.  Single hash agg, ~30 groups, map-side
    combinable."""
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select(
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    return (
        t.select(
            "n_tokens",
            (F.length(F.bin("n_tokens")) - 1).cast("int").alias("log2_bucket"),
        )
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )



@register(
    "logs_template_mining",
    f"""WITH {LOGS_ORACLE_CTE},
t AS (
  SELECT regexp_replace(_raw, '[0-9]+', '#', 'g') AS template FROM logs
)
SELECT template, COUNT(*)::BIGINT AS cnt
FROM t GROUP BY template ORDER BY cnt DESC, template LIMIT 20""",
)
def q_logs_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log template mining (Drain-lite): mask every digit run to '#' and
    count the surviving templates — turns a raw log stream into its
    message-shape inventory (the reference's filters are hand-written
    regexes over exactly these shapes; this query discovers them).
    Per-row regexp_replace in codegen, one template-keyed hash agg with
    map-side partials (template cardinality ≪ line count), TakeOrdered
    top-20 — no global sort."""
    logs = logs_view(spark, sf_dir)
    t = logs.select(
        F.regexp_replace("_raw", "[0-9]+", "#").alias("template")
    )
    return (
        t.groupBy("template")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "template")
        .limit(20)
    )



@register(
    "logs_trending_terms",
    f"""WITH {LOGS_ORACLE_CTE},
{text_ops.trending_terms_oracle(5, 5)}""",
)
def q_logs_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day term risers (textstats.trending_terms): top-5 tokens
    per day by count rise vs the previous calendar day — surfaces a new
    error term the day it appears, BEFORE anyone writes a filter for it.
    Gap-aware lag (absent yesterday counts from zero), digit-led tokens
    excluded, min-count floor on per-line-unique junk."""
    return text_ops.trending_terms(logs_view(spark, sf_dir), k=5, min_cnt=5)



@register(
    "logs_pii_redact",
    f"WITH {LOGS_ORACLE_CTE}\n"
    + text_ops.pii_redact_oracle("logs", id_col="event_id", text_col="_raw"),
)
def q_logs_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the log stream: mask e-mails / IPv4 / long digit
    runs, with per-rule audit counts (textstats.pii_redact).  _spread:
    six regexp passes per row is CPU-bound — parallelize the single-split
    local scan (no-op on a real multi-split scan)."""
    from cloudpelican_lsd_spark.operators.dedup import _spread

    return text_ops.pii_redact(
        _spread(logs_view(spark, sf_dir)), id_col="event_id", text_col="_raw"
    )



@register("text_tfidf_topk", text_ops.tfidf_topk_oracle(5))
def q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document — one token shuffle serves both tf
    and df (ReuseExchange), vocabulary joined back, row_number top-k."""
    return text_ops.tfidf_topk(load_table(spark, "documents", sf_dir), k=5)



@register("text_line_dedup", text_ops.line_dedup_oracle(3, 10))
def q_text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate line removal (RefinedWeb/CCNet-style): drop every
    occurrence of a line appearing >= 3 times corpus-wide, rejoin the
    survivors in order (textstats.line_dedup).  The corpus has no
    newlines, so the fixture derives deterministic 10-word lines first —
    the operator itself is the production '\\n' path."""
    d = load_table(spark, "documents", sf_dir)
    wpl = 10
    lined = d.select(
        "doc_id",
        F.expr(
            f"array_join(transform(sequence(0,"
            f" CAST(ceil(size(split(text, ' ')) / {wpl}.0) AS INT) - 1),"
            f" i -> array_join(slice(split(text, ' '), i * {wpl} + 1, {wpl}), ' ')),"
            " '\\n')"
        ).alias("text"),
    )
    return text_ops.line_dedup(lined, min_df=3)



@register("text_unigram_logprob", text_ops.UNIGRAM_LOGPROB_ORACLE)
def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality proxy: mean per-token negative log-likelihood
    under the corpus's own unigram MLE (textstats.unigram_logprob) —
    exact integer micro-nat sums, so order-independent and oracle-safe."""
    return text_ops.unigram_logprob(load_table(spark, "documents", sf_dir))



@register("text_bm25_topk", text_ops.bm25_topk_oracle())
def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relevance-ranked lexical retrieval: BM25 top-10 for a fixed query
    bag (textstats.bm25_topk) — deterministic fixed-point saturation
    (DECIMAL(38,0) rational, denominators cleared) + micro-rounded idf
    clamped at 0; the ranked-search completion of the grep surface."""
    return text_ops.bm25_topk(load_table(spark, "documents", sf_dir))



@register("text_chunk_windows", text_ops.chunk_windows_oracle(24, 6))
def q_text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-ingestion chunking: ≤24-token windows with 6-token overlap
    (textstats.chunk_windows) — exact integer chunk-count/boundary
    arithmetic, zero-shuffle per-row explode."""
    return text_ops.chunk_windows(
        load_table(spark, "documents", sf_dir), chunk_tokens=24, overlap=6
    )



@register("text_bpe_merge_step", text_ops.bpe_merge_candidates_oracle(20))
def q_text_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training inner loop at iteration 0: top-20 adjacent
    symbol pairs over char-level symbols with exact counts and the
    classic lexicographic tie order (textstats.bpe_merge_candidates
    over char_symbols); a driver-side loop alternating this step with
    bpe_apply_merge IS BPE training (same step-structure as
    kmeans_step)."""
    return text_ops.bpe_merge_candidates(
        text_ops.char_symbols(load_table(spark, "documents", sf_dir)), k=20
    )



@register("text_tokenizer_fertility", text_ops.TOKENIZER_FERTILITY_ORACLE)
def q_text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer fertility — UTF-8 bytes per BPE-ish token
    (textstats.tokenizer_fertility), exact integer ppm; the
    token-budget cost driver behind mixture decisions."""
    return text_ops.tokenizer_fertility(load_table(spark, "documents", sf_dir))



@register("text_ngram_novelty", text_ops.ngram_novelty_oracle(3))
def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of n-grams appearing FIRST here (min-doc_id claim,
    no joins) — the curriculum/data-ordering novelty signal
    (textstats.ngram_novelty)."""
    return text_ops.ngram_novelty(load_table(spark, "documents", sf_dir), n=3)



@register("text_known_item_mrr", text_ops.known_item_mrr_oracle(25, 4, 10))
def q_text_known_item_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Known-item retrieval self-evaluation: query = each probe doc's
    first 4 tokens, rank the corpus by exact-integer tf-idf via the
    inverted-index plan, report the probe's comeback rank and exact
    reciprocal-rank ppm (textstats.known_item_mrr) — the MRR@10 quality
    number a retrieval corpus tracks per release, and the many-queries
    complement to bm25_topk's fixed-bag plan."""
    return text_ops.known_item_mrr(load_table(spark, "documents", sf_dir))



@register("text_cms_topk_audit", text_ops.cms_topk_audit_oracle(50))
def q_cms_topk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-sketch heavy hitters, accuracy-audited: the exact top-50
    tokens with the depth-4 x width-256 CMS estimate and per-token
    collision overestimate (textstats.cms_topk_audit).  The
    bounded-memory mergeable-sketch counterpart to the exact token agg —
    same estimate-vs-true audit pattern as minhash_est_vs_true /
    pq_recall, and the first fully value-hash-gated sketch (the HLL
    sketch is rows-only by design)."""
    return text_ops.cms_topk_audit(load_table(spark, "documents", sf_dir), k=50)



@register(
    "text_len_correlation",
    """WITH x AS (
  SELECT len(string_split(text, ' '))::BIGINT AS xt,
         length(text)::BIGINT AS yc
  FROM documents
)
SELECT COUNT(*)::BIGINT AS n,
       ROUND((COUNT(*) * CAST(SUM(xt * yc) AS DOUBLE)
              - CAST(SUM(xt) AS DOUBLE) * CAST(SUM(yc) AS DOUBLE))
             / sqrt((COUNT(*) * CAST(SUM(xt * xt) AS DOUBLE)
                     - CAST(SUM(xt) AS DOUBLE) * CAST(SUM(xt) AS DOUBLE))
                    * (COUNT(*) * CAST(SUM(yc * yc) AS DOUBLE)
                       - CAST(SUM(yc) AS DOUBLE) * CAST(SUM(yc) AS DOUBLE))),
             6) AS pearson_r
FROM x""",
)
def q_text_len_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation between token count and char count: all
    five moments are BIGINT sums of integer columns (associative, reduce-
    order independent); only the final closed-form division touches
    floats, rounded to 6 — a hash-stable corr() the built-in (which sums
    doubles) cannot give across engines."""
    d = load_table(spark, "documents", sf_dir)
    x = d.select(
        F.size(F.split(F.col("text"), " ")).cast("long").alias("xt"),
        F.length("text").cast("long").alias("yc"),
    )
    n = F.count(F.lit(1))
    # moment sums accumulate in DECIMAL(38,0) (matching DuckDB's
    # HUGEINT-exact SUM(BIGINT)): the per-row products are bounded, but at
    # 100 TB the row-summed squares blow past int64 and ANSI Spark would
    # throw where the oracle succeeds — same wrap class as q_emb_dim_health
    sx = F.sum(F.col("xt").cast("decimal(38,0)")).cast("double")
    sy = F.sum(F.col("yc").cast("decimal(38,0)")).cast("double")
    sxy = F.sum((F.col("xt") * F.col("yc")).cast("decimal(38,0)")).cast("double")
    sxx = F.sum((F.col("xt") * F.col("xt")).cast("decimal(38,0)")).cast("double")
    syy = F.sum((F.col("yc") * F.col("yc")).cast("decimal(38,0)")).cast("double")
    return x.agg(
        n.alias("n"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("pearson_r"),
    )



@register("text_gopher_repetition", text_ops.gopher_repetition_oracle(10))
def q_text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL Gopher repetition panel (Rae et al. 2021 Table A1):
    dup-line fraction/char-fraction, top-{2,3,4}-gram char fraction,
    dup-{5..10}-gram char fraction, plus the paper-threshold pass flag
    (textstats.gopher_repetition) — completing text_repetition_ratio's
    top-word/top-bigram pair into the production MassiveText gate.  The
    corpus has no newlines, so the fixture derives deterministic 10-word
    lines first (split_into_lines); the operator itself is the
    production '\\n' path.  One fused explode serves all nine n-gram
    sizes; every join is doc_id-co-partitioned."""
    d = load_table(spark, "documents", sf_dir)
    return text_ops.gopher_repetition(
        text_ops.split_into_lines(d, words_per_line=10)
    )


@register("text_winnowing_density", text_ops.winnowing_density_oracle(8, 4))
def q_text_winnowing_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
    algorithm; k=8, w=4) audited per document: selected density must sit
    near the paper's expected 2/(w+1) of windows
    (textstats.winnowing_density).  The window-min selection is packed
    into one integer key so rightmost-tie-break is engine-exact; all
    windows are doc_id-partitioned and bounded by the 4096-char cap."""
    return text_ops.winnowing_density(
        load_table(spark, "documents", sf_dir), k=8, w=4
    )


@register("text_bigram_logprob", text_ops.BIGRAM_LOGPROB_ORACLE)
def q_text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer interpolated bigram LM scoring
    (textstats.bigram_logprob): per-doc mean NLL under the corpus's own
    bigram model, the unigram baseline on the same tokens, and the
    context gain between them — the CCNet LM-quality filter one order up
    from text_unigram_logprob, with lm_gain as the shuffled-text
    detector the unigram model cannot express."""
    return text_ops.bigram_logprob(load_table(spark, "documents", sf_dir))


@register("text_ndcg_topk", text_ops.ndcg_topk_oracle(25, 4, 10))
def q_text_ndcg_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 over the known-item synthetic query set with graded
    scorer-independent relevance (textstats.ndcg_topk) — whole-list
    retrieval quality alongside text_known_item_mrr's known-item rank;
    discounts frozen as exact ppm constants so the metric is BIGINT end
    to end."""
    return text_ops.ndcg_topk(
        load_table(spark, "documents", sf_dir), probe_mod=25, q_tokens=4, topk=10
    )


@register("text_zipf_audit", text_ops.zipf_audit_oracle(100))
def q_text_zipf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency audit over the top-100 terms
    (textstats.zipf_audit): ratio-to-top vs the 1/rank law in exact ppm
    — the third statistical-laws panel beside corpus_heaps_law and the
    length histogram.  Top-100 via TakeOrderedAndProject, ranks over
    the bounded post-limit frame."""
    return text_ops.zipf_audit(load_table(spark, "documents", sf_dir), topn=100)


@register("text_distinct_ngrams", text_ops.distinct_ngrams_oracle(3))
def q_text_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity (Li et al. 2016) per source for n=1..3
    (textstats.distinct_ngrams) — the mode-collapse detector for
    synthetic/generated sources.  One fused explode serves all three
    n-gram sizes (the gopher_repetition trick); exact ppm."""
    return text_ops.distinct_ngrams(load_table(spark, "documents", sf_dir), max_n=3)


@register("text_utf8_stats", text_ops.UTF8_STATS_ORACLE)
def q_text_utf8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 byte-vs-character budget per source
    (textstats.utf8_stats): the signal behind byte-fallback tokenizer
    and storage decisions — exact octet arithmetic, one scan, one
    |sources|-row aggregate."""
    return text_ops.utf8_stats(load_table(spark, "documents", sf_dir))


@register("text_gopher_sensitivity", text_ops.gopher_sensitivity_oracle(10))
def q_text_gopher_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which Gopher rule bites (textstats.gopher_sensitivity): per Table
    A1 rule, total failures and SOLE failures (docs the panel would keep
    if only this rule were dropped) — the threshold-tuning diagnostic; a
    rule with zero sole-fails is redundant with the rest of the panel.
    One aggregation job over the shared panel relation."""
    d = load_table(spark, "documents", sf_dir)
    return text_ops.gopher_sensitivity(
        text_ops.split_into_lines(d, words_per_line=10)
    )


@register("text_kneser_ney_logprob", text_ops.KNESER_NEY_ORACLE)
def q_text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM scoring
    (textstats.kneser_ney_logprob): per-doc mean NLL with the
    continuation-probability backoff (how many CONTEXTS a token
    follows, not how often it occurs) that made KN the production
    n-gram smoothing — beside text_bigram_logprob's Jelinek-Mercer
    twin, same first-token convention, so the two models' gains are
    directly comparable per document."""
    return text_ops.kneser_ney_logprob(load_table(spark, "documents", sf_dir))
