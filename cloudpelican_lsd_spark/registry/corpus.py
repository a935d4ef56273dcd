"""Corpus curation capstones: C4/Gopher cleaning, mixtures, splits, packing, manifests, perplexity splits, decontamination."""

from __future__ import annotations

from cloudpelican_lsd_spark.operators import corpus as corpus_ops
from cloudpelican_lsd_spark.operators import dedup as dedup_ops
from cloudpelican_lsd_spark.operators import textstats as text_ops
from cloudpelican_lsd_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.registry._core import (
    register,
)
from cloudpelican_lsd_spark.registry.dedup_core import (
    _CORPUS_CTE,
    _MINHASH_PAIRS_SQL,
    _PLANTED_CTE,
    _corpus_base,
    _docs_with_dupes,
)




@register("corpus_shingle_contamination", text_ops.shingle_contamination_oracle(8, 2))
def q_shingle_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document contamination: fraction of each doc's distinct word
    8-grams that appear in >= 2 documents (textstats.shingle_contamination).
    The sub-document "how much of me is duplicated elsewhere" score used
    for benchmark-decontamination and boilerplate stripping."""
    return text_ops.shingle_contamination(
        load_table(spark, "documents", sf_dir), n=8, min_df=2
    )



@register(
    "corpus_lang_drift",
    """WITH marked AS (
  SELECT lang, doc_id % 2 AS half FROM documents
),
cnt AS (
  SELECT lang,
         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_b
  FROM marked GROUP BY lang
),
tot AS (SELECT SUM(n_a) AS t_a, SUM(n_b) AS t_b FROM cnt)
SELECT c.lang,
       c.n_a::BIGINT AS n_a,
       c.n_b::BIGINT AS n_b,
       ROUND((c.n_a / t.t_a) * ln((c.n_a / t.t_a) / (c.n_b / t.t_b)), 6)
         AS kl_contrib
FROM cnt c, tot t
WHERE c.n_a > 0 AND c.n_b > 0""",
)
def q_corpus_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-distribution drift between two corpus halves (doc_id
    parity stands in for snapshot A/B): per-language KL-divergence
    contribution p·ln(p/q).  The drift audit that catches a crawl or
    filter change shifting corpus composition before training.  One hash
    agg (lang keys) + a broadcast 1-row totals frame — no shuffle of the
    corpus beyond the lang count; ln ulps are absorbed by round-6 (the
    ratio inputs are exact BIGINT-division doubles)."""
    docs = load_table(spark, "documents", sf_dir)
    cnt = docs.select("lang", (F.col("doc_id") % 2).alias("half")).groupBy(
        "lang"
    ).agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_b"),
    )
    tot = cnt.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    p = F.col("n_a") / F.col("t_a")
    q = F.col("n_b") / F.col("t_b")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "lang",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(p * F.log(p / q), 6).alias("kl_contrib"),
        )
    )



@register("corpus_pack_sequences", corpus_ops.pack_sequences_oracle(256, 8))
def q_corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing into 256-token context windows across
    8 shards (corpus.pack_sequences) — training-batch assembly with
    partition-local cumulative sums instead of a serializing global
    order."""
    return corpus_ops.pack_sequences(
        load_table(spark, "documents", sf_dir), capacity=256, shards=8
    )



@register(
    "corpus_source_mixture",
    """SELECT doc_id, source
FROM documents
WHERE substr(md5(text), 1, 2) <
      CASE source
        WHEN 'src0' THEN 'ff'
        WHEN 'src1' THEN '80'
        WHEN 'src2' THEN '40'
        ELSE '1a'
      END""",
)
def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixture downsampling — per-source keep rates
    (src0 ~100%, src1 ~50%, src2 ~25%, tail ~10%) applied by content-hash
    threshold, the mixture-reweighting primitive for combining crawl /
    curated / synthetic sources at target proportions.  Like
    corpus_split_assign: pure per-row hashing, no RNG state, no shuffle,
    reproducible under re-partitioning at any scale."""
    docs = load_table(spark, "documents", sf_dir)
    prefix = F.substring(F.md5(F.col("text").cast("binary")), 1, 2)
    thr = (
        F.when(F.col("source") == "src0", "ff")
        .when(F.col("source") == "src1", "80")
        .when(F.col("source") == "src2", "40")
        .otherwise("1a")
    )
    return docs.where(prefix < thr).select("doc_id", "source")



@register(
    "corpus_token_budget_sample",
    """WITH tok AS (
  SELECT doc_id, source, text,
         len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
tot AS (
  SELECT source, SUM(n_tokens)::BIGINT AS t_s FROM tok GROUP BY source
),
ns AS (SELECT COUNT(*)::BIGINT AS n_sources FROM tot),
thr AS (
  SELECT t.source,
         least(65536, (65536 * 20000) // (n.n_sources * t.t_s)) AS keep65536
  FROM tot t, ns n
)
SELECT k.doc_id, k.source, k.n_tokens
FROM tok k JOIN thr ON thr.source = k.source
WHERE ('0x' || substr(md5(k.text), 1, 4))::BIGINT < thr.keep65536""",
)
def q_corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampling: split a 20k-token budget equally across
    sources, derive each source's keep probability FROM THE DATA
    (keep = budget_share / source_tokens, floored into 65536 hash
    buckets — all integer arithmetic), and keep a doc iff its content
    hash falls under the source's threshold.  The data-dependent
    follow-up to corpus_source_mixture: thresholds come from a per-source
    token aggregate (tiny, broadcast), sampling stays stateless per-row
    hashing — reproducible at any scale, expected sampled tokens per
    oversized source ≈ its budget share."""
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id",
        "source",
        "text",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    tot = tok.groupBy("source").agg(F.sum("n_tokens").alias("t_s"))
    ns = tot.agg(F.count(F.lit(1)).alias("n_sources"))
    thr = (
        tot.crossJoin(F.broadcast(ns))
        .select(
            "source",
            F.least(
                F.lit(65536),
                F.expr("(65536 * 20000) div (n_sources * t_s)"),
            ).alias("keep65536"),
        )
    )
    return (
        tok.join(F.broadcast(thr), "source")
        .where(
            F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 4), 16, 10)
            .cast("long")
            < F.col("keep65536")
        )
        .select("doc_id", "source", "n_tokens")
    )



@register("corpus_c4_by_source", corpus_ops.c4_audit_by_source_oracle())
def q_corpus_c4_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source C4/Gopher rule breakdown (corpus.c4_audit_by_source):
    which source fails which quality rule — the feed-weighting
    drill-down behind the corpus-wide panel; same shared predicates,
    same single-scan stack-unpivot shape, |rules|×|sources| output."""
    return corpus_ops.c4_audit_by_source(
        load_table(spark, "documents", sf_dir)
    )



@register(
    "corpus_snapshot_diff",
    f"""WITH v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text,
         source
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, text || ' new' AS text, source
  FROM documents WHERE doc_id < 30
),
{corpus_ops.snapshot_diff_oracle('documents', 'v2')}""",
)
def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning audit (corpus.snapshot_diff): per-source
    added/removed/changed/unchanged doc counts + exact token deltas
    between two snapshots — here v2 derives deterministically from v1
    (every 7th doc dropped, every 5th rewritten, 30 docs added) so the
    oracle replays the same history."""
    docs = load_table(spark, "documents", sf_dir)
    v1 = docs.select("doc_id", "text", "source")
    v2 = (
        v1.where(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat("text", F.lit(" rev2"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "source",
        )
        .unionByName(
            v1.where(F.col("doc_id") < 30).select(
                # 1e9 offset: far above any testdata scale factor's max
                # doc_id, so the planted 'added' rows can never collide
                # with (and silently reclassify as) real v1 docs
                (F.col("doc_id") + 1000000000).alias("doc_id"),
                F.concat("text", F.lit(" new")).alias("text"),
                "source",
            )
        )
    )
    return corpus_ops.snapshot_diff(v1, v2)



@register("corpus_source_divergence", text_ops.SOURCE_DIVERGENCE_ORACLE)
def q_corpus_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift vs the whole corpus: exact
    total-variation distance in parts-per-billion
    (textstats.source_divergence) — the mixture-health check run before
    reweighting sources; all-integer (DECIMAL(38,0)/HUGEINT) so the
    driver hash cannot drift on float summation order."""
    return text_ops.source_divergence(load_table(spark, "documents", sf_dir))



_ID_SPLIT_CASE = """CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'val'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'test'
            ELSE 'train' END"""



@register(
    "corpus_split_neardup_leakage",
    f"""WITH {_PLANTED_CTE},
{dedup_ops.minhash_oracle_cte(12, 3, 3).replace('FROM documents', 'FROM docs_planted')},
pairs AS ({_MINHASH_PAIRS_SQL}),
splits AS (
  SELECT doc_id, {_ID_SPLIT_CASE} AS split FROM docs_planted
)
SELECT sa.split AS split_a, sb.split AS split_b,
       COUNT(*)::BIGINT AS n_pairs
FROM pairs p
JOIN splits sa ON sa.doc_id = p.doc_a
JOIN splits sb ON sb.doc_id = p.doc_b
WHERE sa.split <> sb.split
GROUP BY sa.split, sb.split""",
)
def q_split_neardup_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination audit: near-dup (MinHash-LSH) pairs that
    straddle split boundaries under a doc_id-hash split — the classic
    random-split leakage a content-hash or cluster-aware split
    (corpus_split_assign, dedup_cluster_keepers) exists to prevent.
    The pair table is smaller than the corpus but CORPUS-PROPORTIONAL
    (one row per near-dup candidate pair; web-crawl dup rates run
    10-50%), so both split lookups are left to AQE — broadcast at
    harness scales, shuffled doc_id-keyed joins at the 100 TB shape.
    Either way the corpus-sized `splits` map is never the build side."""
    docs = _docs_with_dupes(spark, sf_dir)
    pairs = dedup_ops.lsh_candidate_pairs(
        docs, num_hashes=12, rows_per_band=3, n=3
    )
    prefix = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
    )
    splits = docs.select(
        "doc_id",
        F.when(prefix < "0d", "val")
        .when(prefix < "1a", "test")
        .otherwise("train")
        .alias("split"),
    )
    # keep the PAIR side the probe-side candidate (dup-proportional)
    # against the corpus-sized split map; strategy left to AQE —
    # broadcasting splits would ship a per-document table to every
    # executor, and pinning the pair side would OOM at real dup rates
    with_a = (
        splits.withColumnRenamed("split", "split_a")
        .join(pairs, F.col("doc_id") == F.col("doc_a"))
        .select("doc_a", "doc_b", "split_a")
    )
    return (
        splits.withColumnRenamed("split", "split_b")
        .join(with_a, F.col("doc_id") == F.col("doc_b"))
        .where(F.col("split_a") != F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )



@register("corpus_training_manifest", corpus_ops.training_manifest_oracle(16))
def q_corpus_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-example training manifest: quality decision (shared C4
    panel), embedding availability (id-equi join, bucket-colocatable),
    modality metadata, deterministic shard — decisions RECORDED, never
    applied, so releases stay auditable and snapshot-diffable
    (corpus.training_manifest)."""
    return corpus_ops.training_manifest(
        load_table(spark, "documents", sf_dir),
        load_table(spark, "embeddings", sf_dir),
        shards=16,
    )



@register("corpus_release_dryrun", corpus_ops.release_dryrun_oracle(16))
def q_corpus_release_dryrun(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end release dry-run capstone: the training manifest rolled
    up into the per-shard export plan (docs/kept/tokens/embeddings per
    shard) stamped with the integrity-audit release gate — one query for
    "what would we ship, and may we" (corpus.release_dryrun)."""
    return corpus_ops.release_dryrun(
        load_table(spark, "documents", sf_dir),
        load_table(spark, "embeddings", sf_dir),
        shards=16,
    )


@register("corpus_integrity_audit", corpus_ops.integrity_audit_oracle())
def q_corpus_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-release integrity checks as one plan: anti-joins both ways
    between docs and embeddings, key duplication, empty text, stale
    derived columns (n_chars vs length), unknown lang codes — a 7-row
    all-zeros-means-shippable report (corpus.integrity_audit)."""
    return corpus_ops.integrity_audit(
        load_table(spark, "documents", sf_dir),
        load_table(spark, "embeddings", sf_dir),
    )



@register("corpus_unimax_alloc", corpus_ops.unimax_allocation_oracle(2, 5))
def q_corpus_unimax_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax water-filling: spend a 40% token budget as uniformly as
    possible across sources without over-sampling any (Chung et al.
    2023) — the principled successor to temperature mixing, as exact
    integer window math (corpus.unimax_allocation).  Allocations sum to
    exactly min(B, total) by construction."""
    return corpus_ops.unimax_allocation(
        load_table(spark, "documents", sf_dir), budget_num=2, budget_den=5
    )



@register(
    "corpus_quality_weighted_alloc", corpus_ops.quality_weighted_alloc_oracle(2, 5)
)
def q_corpus_quality_weighted_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture allocation weighted by C4/Gopher-surviving tokens — the
    budget a pipeline actually trains on, next to the raw-count unimax /
    temperature splits (corpus.quality_weighted_alloc)."""
    return corpus_ops.quality_weighted_alloc(
        load_table(spark, "documents", sf_dir), budget_num=2, budget_den=5
    )



@register("corpus_perplexity_buckets", corpus_ops.perplexity_buckets_oracle(3))
def q_corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail: documents ranked by mean unigram NLL and
    cut into terciles, reported per (source, bucket) — the fluency-split
    that decides keep/down-sample/drop (corpus.perplexity_buckets;
    Wenzek et al. 2020)."""
    return corpus_ops.perplexity_buckets(
        load_table(spark, "documents", sf_dir), n_buckets=3
    )



@register(
    "corpus_perplexity_cutpoints", corpus_ops.perplexity_cutpoints_oracle(3)
)
def q_corpus_perplexity_cutpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production CCNet split: exact tercile cutpoints via distributed
    two-level counting over the score histogram, broadcast to a stateless
    value-bucketing pass — zero partition-less windows, unlike the NTILE
    audit twin `corpus_perplexity_buckets`
    (corpus.perplexity_cutpoints; Wenzek et al. 2020)."""
    return corpus_ops.perplexity_cutpoints(
        load_table(spark, "documents", sf_dir), n_buckets=3
    )



@register("corpus_perplexity_by_lang", corpus_ops.perplexity_by_lang_oracle(3))
def q_corpus_perplexity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The faithful CCNet split: head/middle/tail cutpoints PER LANGUAGE
    (one threshold pair per language, as Wenzek et al. 2020 draw one per
    KenLM) via the grouped two-level histogram machinery — no
    partition-less window (corpus.perplexity_by_lang)."""
    return corpus_ops.perplexity_by_lang(
        load_table(spark, "documents", sf_dir), n_buckets=3
    )


@register("corpus_eval_decontaminate", corpus_ops.eval_decontaminate_oracle(8, 97))
def q_corpus_eval_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-vs-eval n-gram decontamination (GPT-3 appendix-C pattern):
    per source, how many training docs share any 8-gram with the held-out
    eval slice and must be dropped (corpus.eval_decontaminate)."""
    return corpus_ops.eval_decontaminate(
        load_table(spark, "documents", sf_dir), n=8, eval_mod=97
    )



@register("corpus_doremi_step", corpus_ops.doremi_step_oracle(1, 2))
def q_corpus_doremi_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi-style exponentiated-gradient domain-reweighting step
    (Xie et al. 2023): sources whose documents fail the shared C4/Gopher
    panel more often are up-weighted multiplicatively from token share,
    via an exact 3rd-order integer exp surrogate (corpus.doremi_step) —
    completes the mixture triptych with corpus_temperature_mixture and
    corpus_unimax_alloc."""
    return corpus_ops.doremi_step(
        load_table(spark, "documents", sf_dir), eta_num=1, eta_den=2
    )



@register("corpus_temperature_mixture", corpus_ops.temperature_mixture_oracle(2, 5))
def q_corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling (T=2, the mBERT/XLM-R mixer)
    spending the same 40% budget as `corpus_unimax_alloc` — integer-exact
    via IEEE sqrt micro-units, with the `oversampled` flag marking the
    small-source over-sampling UniMax exists to prevent
    (corpus.temperature_mixture)."""
    return corpus_ops.temperature_mixture(
        load_table(spark, "documents", sf_dir), budget_num=2, budget_den=5
    )



@register(
    "corpus_clean_yield",
    corpus_ops.corpus_clean_yield_oracle(_CORPUS_CTE, "docs_corpus"),
)
def q_corpus_clean_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline report card: documents surviving each cleanup stage
    (raw -> quality/lang gate -> exact dedup -> near-dup removal) plus
    final token yield, one row (corpus.corpus_clean_yield)."""
    return corpus_ops.corpus_clean_yield(_corpus_base(spark, sf_dir))



@register("corpus_heaps_law", text_ops.heaps_law_oracle(20))
def q_corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve at 20 ingestion checkpoints
    (textstats.heaps_law): cumulative distinct terms vs cumulative
    tokens in doc_id order — the corpus-level novelty dashboard (a
    flattening tail = incoming data is mostly known vocabulary, the
    dedup/diversity alarm).  One token explode serves both the
    per-bucket token counts and the per-term first-appearance buckets;
    cumulative sums run over the bounded 20-row checkpoint frame."""
    return text_ops.heaps_law(load_table(spark, "documents", sf_dir), n_buckets=20)


@register(
    "corpus_gopher_by_source",
    f"""WITH gp AS (SELECT * FROM ({text_ops.gopher_repetition_oracle(10)})),
tk AS (
  SELECT doc_id, source,
         len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents WHERE length(text) > 0
)
SELECT t.source,
       COUNT(*)::BIGINT AS n_docs,
       SUM(g.pass_gopher)::BIGINT AS n_pass,
       CAST((SUM(g.pass_gopher) * 1000000) // COUNT(*) AS BIGINT)
           AS pass_ppm,
       SUM(t.n_tokens)::BIGINT AS total_tokens,
       SUM(CASE WHEN g.pass_gopher = 1 THEN t.n_tokens ELSE 0 END)::BIGINT
           AS kept_tokens
FROM gp g JOIN tk t USING (doc_id)
GROUP BY t.source""",
)
def q_corpus_gopher_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source yield under the FULL Gopher repetition gate
    (text_gopher_repetition composed with per-source doc/token rollups):
    the release-decision table — which sources lose how many documents
    and tokens to the Rae et al. 2021 thresholds.  The panel's doc_id
    join is co-partitioned; everything after is a source-keyed
    aggregate."""
    d = load_table(spark, "documents", sf_dir)
    gp = text_ops.gopher_repetition(
        text_ops.split_into_lines(d, words_per_line=10)
    ).select("doc_id", "pass_gopher")
    tk = d.where(F.length("text") > 0).select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return (
        gp.join(tk, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("pass_gopher").cast("long").alias("n_pass"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("pass_gopher") == 1, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_pass",
            F.expr("(n_pass * 1000000) DIV n_docs").alias("pass_ppm"),
            "total_tokens",
            "kept_tokens",
        )
    )


@register("corpus_k_anonymity", corpus_ops.k_anonymity_oracle(10))
def q_corpus_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release audit (Sweeney 2002 applied to corpus cards):
    equivalence classes of the (lang, source, token-length-bucket)
    quasi-identifier with fewer than k={2,5,10} members, and the
    documents at metadata re-identification risk inside them
    (corpus.k_anonymity).  One quasi-identifier aggregate; the heavy
    relation never re-shuffles."""
    return corpus_ops.k_anonymity(
        load_table(spark, "documents", sf_dir), len_bucket=10
    )


@register(
    "corpus_eval_decontaminate_neardup",
    corpus_ops.eval_decontaminate_neardup_oracle(97, 12, 3, 3),
)
def q_corpus_eval_decontaminate_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup benchmark decontamination — the lexical middle of the
    triptych between corpus_eval_decontaminate (exact n-gram) and
    emb_semantic_decontaminate (embedding): train docs sharing any
    MinHash-LSH band with the held-out eval slice, per source
    (corpus.eval_decontaminate_neardup).  Eval bands broadcast; the
    train shuffle never carries shingles."""
    return corpus_ops.eval_decontaminate_neardup(
        load_table(spark, "documents", sf_dir)
    )


@register(
    "corpus_decontaminate_agreement",
    corpus_ops.decontaminate_agreement_oracle(),
)
def q_corpus_decontaminate_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Decontamination method-agreement matrix per source
    (corpus.decontaminate_agreement): how the exact-n-gram and banded
    MinHash rules partition the training docs (both / exact-only /
    neardup-only / clean) — the dedup_method_agreement discipline
    applied to eval leakage; a fat disagreement cell is the signal to
    tighten the weaker rule before release."""
    return corpus_ops.decontaminate_agreement(
        load_table(spark, "documents", sf_dir)
    )


@register(
    "corpus_decontaminate_ngram_sweep",
    corpus_ops.decontaminate_ngram_sweep_oracle((4, 8, 13), 97),
)
def q_corpus_decontaminate_ngram_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Decontamination rule-length curve
    (corpus.decontaminate_ngram_sweep): flagged train docs at n in
    {4,8,13} from ONE fused tokenize+position pass — how the
    any-shared-n-gram rule's flag rate collapses as n grows, the policy
    knob beside the per-source single-n report and the near-dup
    threshold variant.  Exact integer ppm."""
    return corpus_ops.decontaminate_ngram_sweep(
        load_table(spark, "documents", sf_dir), sizes=(4, 8, 13), eval_mod=97
    )


@register("corpus_c4_sensitivity", corpus_ops.c4_sensitivity_oracle())
def q_corpus_c4_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which C4 rule bites (corpus.c4_sensitivity): per rule, total
    failures and SOLE failures (docs kept if only that rule were
    dropped) — the marginal diagnostic text_gopher_sensitivity gives the
    repetition panel, here over the document-quality rules, as a pure
    one-scan stack-unpivot plan (the C4 flags are cheap enough to skip
    the Gopher twin's one-row collect)."""
    return corpus_ops.c4_sensitivity(load_table(spark, "documents", sf_dir))
