"""North-star deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard, connected components, and the planted-duplicate fixtures shared by the extended families."""

from __future__ import annotations

from cloudpelican_lsd_spark.operators import dedup as dedup_ops
from cloudpelican_lsd_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.registry._core import (
    register,
)


# ===========================================================================
# north-star: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard)
# ===========================================================================

#: documents ∪ re-keyed copies of the first 50 — plants real duplicate
#: texts so dedup operators have non-trivial output (testdata is unique)
_PLANTED_CTE = """\
documents0 AS (SELECT * FROM documents),
docs_planted AS (
  SELECT * FROM documents0
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
  FROM documents0 WHERE doc_id < 50
)"""


def _docs_with_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    dup = d.where(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return d.unionByName(dup)


@register(
    "dedup_exact_groups",
    f"""WITH {_PLANTED_CTE}
SELECT md5(text) AS text_hash, min(doc_id)::BIGINT AS keeper_id,
       COUNT(*)::BIGINT AS n_copies
FROM docs_planted GROUP BY md5(text)""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by md5(text) with keeper selection."""
    return dedup_ops.exact_duplicates(_docs_with_dupes(spark, sf_dir))


@register(
    "dedup_minhash_lsh_pairs",
    f"""WITH {_PLANTED_CTE},
{dedup_ops.minhash_oracle_cte(12, 3, 3).replace('FROM documents', 'FROM docs_planted')}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""",
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs (band-bucket join)."""
    return dedup_ops.lsh_candidate_pairs(
        _docs_with_dupes(spark, sf_dir), num_hashes=12, rows_per_band=3, n=3
    )


_MINHASH_PAIRS_SQL = """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id"""


@register(
    "dedup_clusters",
    f"""WITH RECURSIVE {_PLANTED_CTE},
{dedup_ops.minhash_oracle_cte(12, 3, 3).replace('FROM documents', 'FROM docs_planted')},
{dedup_ops.connected_components_oracle(_MINHASH_PAIRS_SQL)}
SELECT node::BIGINT AS doc_id, MIN(lbl)::BIGINT AS cluster_id
FROM reach GROUP BY node""",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster formation: connected components over the MinHash
    LSH candidate pairs — keep ``doc_id == cluster_id`` as the canonical
    copy per group (see dedup.connected_components for the scale story)."""
    pairs = dedup_ops.lsh_candidate_pairs(
        _docs_with_dupes(spark, sf_dir), num_hashes=12, rows_per_band=3, n=3
    )
    return dedup_ops.connected_components(pairs)


@register(
    "corpus_split_cluster_safe",
    f"""WITH RECURSIVE {_PLANTED_CTE},
{dedup_ops.minhash_oracle_cte(12, 3, 3).replace('FROM documents', 'FROM docs_planted')},
{dedup_ops.connected_components_oracle(_MINHASH_PAIRS_SQL)},
cs_clusters AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
cs_labeled AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM docs_planted d LEFT JOIN cs_clusters c USING (doc_id)
),
cs_tagged AS (
  SELECT doc_id, cluster_id,
         CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT *, ('0x' || substr(md5('cs:' || cluster_id), 1, 4))::BIGINT % 10
              AS b
    FROM cs_labeled
  )
),
cs_leaky AS (
  SELECT COUNT(*)::BIGINT AS leaky_clusters FROM (
    SELECT cluster_id FROM cs_tagged
    GROUP BY cluster_id HAVING COUNT(DISTINCT split) > 1
  )
)
SELECT t.split,
       COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT t.cluster_id)::BIGINT AS n_clusters,
       l.leaky_clusters
FROM cs_tagged t CROSS JOIN cs_leaky l
GROUP BY t.split, l.leaky_clusters""",
)
def q_corpus_split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-safe train/val/test split: assignment hashed on the
    near-dup CLUSTER id so whole duplicate groups land in one split —
    the structural fix for the leakage `corpus_split_neardup_leakage`
    measures; the `leaky_clusters` column audits the invariant (0 by
    construction) (corpus.split_cluster_safe)."""
    pairs = dedup_ops.lsh_candidate_pairs(
        _docs_with_dupes(spark, sf_dir), num_hashes=12, rows_per_band=3, n=3
    )
    return corpus_ops.split_cluster_safe(
        _docs_with_dupes(spark, sf_dir), pairs
    )


@register(
    "dedup_ngram_jaccard_pairs",
    f"""WITH {_PLANTED_CTE},
{dedup_ops.shingles_oracle_cte(3, base_table='docs_planted')},
sizes AS (SELECT doc_id, COUNT(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::BIGINT AS inter_cnt
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter_cnt,
       (sa.sz + sb.sz - inter_cnt)::BIGINT AS union_cnt
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE inter_cnt * 5 >= (sa.sz + sb.sz - inter_cnt) * 1""",
)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs over an inverted shingle index."""
    return dedup_ops.ngram_jaccard_pairs(
        _docs_with_dupes(spark, sf_dir), n=3, threshold_num=1, threshold_den=5
    )


_CONTAINED_CTE = """\
docs_contained AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         substring(text, 1, CAST(length(text) // 2 AS INT)) AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id < 30
)"""


def _docs_with_contained(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    cut = d.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.expr("substring(text, 1, CAST(length(text) DIV 2 AS INT))").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return d.unionByName(cut)


@register(
    "dedup_containment_pairs",
    f"""WITH {_CONTAINED_CTE},
{dedup_ops.containment_oracle(3, 4, 5).replace('FROM documents', 'FROM docs_contained').replace('WITH ', '', 1)}""",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment (Broder resemblance-vs-containment):
    planted half-length prefix copies score containment≈1 against their
    source but Jaccard≈0.5 — the quote/snippet-reuse dedup a Jaccard
    threshold never fires on.  Same one-shingle-pipeline inverted-index
    plan as ngram_jaccard_pairs (dedup.containment_pairs)."""
    return dedup_ops.containment_pairs(
        _docs_with_contained(spark, sf_dir), n=3, threshold_num=4, threshold_den=5
    )


@register(
    "dedup_token_savings",
    f"""WITH RECURSIVE {_PLANTED_CTE},
{dedup_ops.minhash_oracle_cte(12, 3, 3).replace('FROM documents', 'FROM docs_planted')},
{dedup_ops.connected_components_oracle(_MINHASH_PAIRS_SQL)},
ts_clusters AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
ts_tok AS (
  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS n
  FROM docs_planted
),
ts_mem AS (
  SELECT c.cluster_id, t.doc_id, t.source, t.n
  FROM ts_clusters c JOIN ts_tok t USING (doc_id)
),
ts_keep AS (
  SELECT cluster_id, doc_id AS keeper_id FROM (
    SELECT cluster_id, doc_id,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n DESC, doc_id ASC) AS rn
    FROM ts_mem
  ) WHERE rn = 1
),
ts_removed AS (
  SELECT m.source, SUM(m.n)::BIGINT AS removed_tokens
  FROM ts_mem m JOIN ts_keep k USING (cluster_id)
  WHERE m.doc_id <> k.keeper_id GROUP BY m.source
),
ts_total AS (
  SELECT source, SUM(n)::BIGINT AS total_tokens FROM ts_tok GROUP BY source
)
SELECT t.source, t.total_tokens,
       COALESCE(r.removed_tokens, 0)::BIGINT AS removed_tokens,
       CAST((t.total_tokens - COALESCE(r.removed_tokens, 0))::HUGEINT * 1000000
            // t.total_tokens AS BIGINT) AS kept_ppm
FROM ts_total t LEFT JOIN ts_removed r USING (source)""",
)
def q_dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What dedup buys, in tokens: per source, the token mass removed by
    keeping only the longest member of each near-dup cluster (same
    keeper policy as dedup_cluster_keepers) — the before/after report a
    curation run publishes.  The cluster table has one row per
    NEAR-DUPLICATED doc — CORPUS-PROPORTIONAL at web-crawl dup rates
    (10-50%), so the doc_id-keyed joins are left to AQE (broadcast at
    harness scales, shuffled at the 100 TB shape); token counting is the
    shared split-size column math."""
    docs = _docs_with_dupes(spark, sf_dir)
    pairs = dedup_ops.lsh_candidate_pairs(docs, num_hashes=12, rows_per_band=3, n=3)
    clusters = dedup_ops.connected_components(pairs)
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n"),
    )
    members = clusters.join(toks, "doc_id")
    keepers = members.groupBy("cluster_id").agg(
        F.max(F.struct(F.col("n"), (-F.col("doc_id")).alias("neg_id"))).alias("m")
    ).select("cluster_id", (-F.col("m.neg_id")).alias("keeper_id"))
    removed = (
        members.join(keepers, "cluster_id")
        .where(F.col("doc_id") != F.col("keeper_id"))
        .groupBy("source")
        .agg(F.sum("n").cast("long").alias("removed_tokens"))
    )
    total = toks.groupBy("source").agg(
        F.sum("n").cast("long").alias("total_tokens")
    )
    return total.join(removed, "source", "left").select(
        "source",
        "total_tokens",
        F.coalesce(F.col("removed_tokens"), F.lit(0)).cast("long").alias(
            "removed_tokens"
        ),
        F.expr(
            "CAST(CAST(total_tokens - coalesce(removed_tokens, 0L)"
            " AS DECIMAL(38,0)) * 1000000 div total_tokens AS BIGINT)"
        ).alias("kept_ppm"),
    )


@register(
    "dedup_method_agreement",
    f"""WITH {_PLANTED_CTE},
{dedup_ops.method_agreement_oracle(12, 3, 3, 6, base_table='docs_planted')}""",
)
def q_dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement audit between MinHash-LSH band candidates and SimHash
    prefix-bucket near pairs on the planted-dup corpus — counts of pairs
    both/only-one method surfaces (dedup.method_agreement), the check run
    before trusting a single sub-linear detector as THE dedup pass."""
    return dedup_ops.method_agreement(
        _docs_with_dupes(spark, sf_dir),
        num_hashes=12,
        rows_per_band=3,
        n=3,
        max_hamming=6,
    )


@register(
    "dedup_jaccard_df_pruned",
    f"""WITH {_PLANTED_CTE},
{dedup_ops.ngram_jaccard_oracle(3, 1, 5, max_df=20).replace('FROM documents', 'FROM docs_planted').replace('WITH ', '', 1)}""",
)
def q_dedup_jaccard_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB skew-guarded Jaccard: shingles in >20 docs excluded from
    intersection counting (document-frequency pruning, dedup.py)."""
    return dedup_ops.ngram_jaccard_pairs(
        _docs_with_dupes(spark, sf_dir),
        n=3,
        threshold_num=1,
        threshold_den=5,
        max_df=20,
    )


@register(
    "dedup_cdc_overlap",
    dedup_ops.cdc_overlap_oracle(_PLANTED_CTE, 16, 64, 2, 10),
)
def q_dedup_cdc_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTRING-level dedup: document pairs sharing >= 2 distinct
    content-defined chunks (df-pruned at 10) — catches partial copies and
    embedded passages that whole-document MinHash misses
    (dedup.cdc_overlap_pairs over the planted-duplicates corpus)."""
    return dedup_ops.cdc_overlap_pairs(
        _docs_with_dupes(spark, sf_dir), window=16, divisor=64,
        min_shared=2, max_df=10,
    )


@register("dedup_substring_spans", dedup_ops.substring_span_oracle(8, 2))
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (Lee et al. 2021 ExactSubstr at
    token-gram granularity, dedup.substring_span_stats): per doc, the
    union size of all 8-token windows whose text repeats corpus-wide —
    window-count hot detection (no join on the hot path), interval-union
    islands via two doc-keyed windows."""
    return dedup_ops.substring_span_stats(
        load_table(spark, "documents", sf_dir), w=8, min_df=2
    )


@register("dedup_substring_clean", dedup_ops.substring_clean_oracle(8, 2))
def q_dedup_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring-deduped corpus itself (dedup.substring_span_clean):
    hot spans removed, survivors rejoined in order via ONE
    filter-with-index HOF over the per-doc interval array — no
    token-level explode or range join on the rebuild side."""
    return dedup_ops.substring_span_clean(
        load_table(spark, "documents", sf_dir), w=8, min_df=2
    )


@register("simhash_fingerprints", dedup_ops.SIMHASH_ORACLE)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints per document."""
    return dedup_ops.simhash(load_table(spark, "documents", sf_dir))


@register("simhash_near_pairs", dedup_ops.simhash_pairs_oracle(6))
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via fingerprint-prefix bucketing."""
    return dedup_ops.simhash_near_pairs(
        load_table(spark, "documents", sf_dir), max_hamming=6
    )


@register("simhash_pairs_complete", dedup_ops.simhash_complete_oracle(3, 4))
def q_simhash_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guaranteed-recall simhash near-dup pairs (4 rotated blocks,
    pigeonhole-complete for hamming <= 3; dedup.py)."""
    return dedup_ops.simhash_near_pairs_complete(
        load_table(spark, "documents", sf_dir), max_hamming=3, n_blocks=4
    )


@register("dedup_embedding_cosine", dedup_ops.embedding_near_dups_oracle(4, 3, 10))
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold."""
    return dedup_ops.embedding_near_dups(
        load_table(spark, "embeddings", sf_dir),
        bits=4,
        min_cos_num=3,
        min_cos_den=10,
    )


# ---------------------------------------------------------------------------
# capstone: the full corpus-cleaning pipeline as ONE plan
# ---------------------------------------------------------------------------

from cloudpelican_lsd_spark.operators import corpus as corpus_ops  # noqa: E402

#: documents ∪ exact copies (dedup stage fodder) ∪ near copies with a
#: 2-token suffix (near-dup stage fodder)
_CORPUS_CTE = """\
documents0 AS (SELECT * FROM documents),
docs_corpus AS (
  SELECT doc_id, text FROM documents0
  UNION ALL
  SELECT doc_id + 100000, text FROM documents0 WHERE doc_id < 50
  UNION ALL
  SELECT doc_id + 200000, text || ' trailing marker' FROM documents0 WHERE doc_id < 30
)"""


def _corpus_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    exact = d.where(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    near = d.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailing marker")).alias("text"),
    )
    return d.unionByName(exact).unionByName(near)


@register("corpus_c4_audit", corpus_ops.c4_audit_oracle())
def q_corpus_c4_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule audit of the public C4/Gopher quality heuristics
    (corpus.c4_audit): token floor, stopword density, type-token ratio,
    mean token length, terminal punctuation, max word length — fail
    counts + rates per rule plus the any-rule summary, all integer-exact
    decisions, one scan / one tiny agg / zero joins."""
    return corpus_ops.c4_audit(load_table(spark, "documents", sf_dir))


@register(
    "corpus_clean_v2",
    corpus_ops.corpus_clean_v2_oracle(_CORPUS_CTE, "docs_corpus"),
)
def q_corpus_clean_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 capstone — the full modern pre-training pipeline: boilerplate
    line dedup -> quality gate -> lang-ID gate -> exact dedup -> near-dup
    removal -> EVAL DECONTAMINATION (docs sharing a word 8-gram with the
    doc_id%97 held-out slice are dropped, and eval docs never enter the
    training output).  corpus.corpus_clean_v2 over the 10-word-line view
    of the planted corpus."""
    return corpus_ops.corpus_clean_v2(_lined_corpus(spark, sf_dir))


def _lined_corpus(spark: SparkSession, sf_dir: str, wpl: int = 10) -> DataFrame:
    """The planted corpus in 10-word-line view (shared by v2/v3)."""
    base = _corpus_base(spark, sf_dir)
    return base.select(
        "doc_id",
        F.expr(
            f"array_join(transform(sequence(0,"
            f" CAST(ceil(size(split(text, ' ')) / {wpl}.0) AS INT) - 1),"
            f" i -> array_join(slice(split(text, ' '), i * {wpl} + 1, {wpl}), ' ')),"
            " '\\n')"
        ).alias("text"),
    )


@register(
    "corpus_clean_v3",
    corpus_ops.corpus_clean_v3_oracle(_CORPUS_CTE, "docs_corpus"),
)
def q_corpus_clean_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v3 capstone — v2 plus a C4/Gopher rule gate (type-token ratio +
    mean token length, the axes v1's gates lack) spliced between the
    boilerplate line dedup and the v1 chain; predicates shared with the
    corpus_c4_audit panel (corpus.c4_flag_exprs), so the audit is this
    gate's dry-run.  Zero added shuffles over v2."""
    return corpus_ops.corpus_clean_v3(_lined_corpus(spark, sf_dir))


@register(
    "corpus_clean_pipeline",
    corpus_ops.corpus_clean_oracle(_CORPUS_CTE, "docs_corpus"),
)
def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone: quality gate → lang-ID gate → exact dedup → near-dup
    removal → token accounting, one Catalyst plan (corpus.py)."""
    return corpus_ops.corpus_clean(_corpus_base(spark, sf_dir))




@register(
    "corpus_clean_v4",
    corpus_ops.corpus_clean_v4_oracle(_CORPUS_CTE, "docs_corpus"),
)
def q_corpus_clean_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v4 capstone — v3 plus the FULL Gopher repetition panel as a gate
    (textstats.gopher_repetition over the line-deduped text with its
    line structure intact), spliced before the C4 rule gate.  The panel
    is aggregation-valued, so the gate is one doc_id-keyed semi join;
    text_gopher_repetition / corpus_gopher_by_source are its dry-run
    (audit-is-the-gate, same as v3's C4 stage)."""
    return corpus_ops.corpus_clean_v4(_lined_corpus(spark, sf_dir))
