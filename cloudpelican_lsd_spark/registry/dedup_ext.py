"""Extended dedup family: keeper policies, accuracy audits, bloom prescreen, incremental index, containment, substring spans."""

from __future__ import annotations

from cloudpelican_lsd_spark.operators import dedup as dedup_ops
from cloudpelican_lsd_spark.operators import similarity as sim_ops
from cloudpelican_lsd_spark.operators import textstats as text_ops
from cloudpelican_lsd_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.registry._core import (
    register,
)
from cloudpelican_lsd_spark.registry.dedup_core import (
    _MINHASH_PAIRS_SQL,
    _PLANTED_CTE,
    _docs_with_dupes,
)




@register(
    "dedup_cluster_keepers",
    f"""WITH RECURSIVE {_PLANTED_CTE},
{dedup_ops.minhash_oracle_cte(12, 3, 3).replace('FROM documents', 'FROM docs_planted')},
{dedup_ops.connected_components_oracle(_MINHASH_PAIRS_SQL)},
clusters AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
sel AS (
  SELECT c.cluster_id, d.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, d.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
  FROM clusters c JOIN docs_planted d USING (doc_id)
)
SELECT cluster_id::BIGINT AS cluster_id, doc_id::BIGINT AS keeper_id,
       n_chars::BIGINT AS keeper_chars, n_members::BIGINT AS n_members
FROM sel WHERE rn = 1""",
)
def q_dedup_cluster_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection per duplicate cluster: keep the
    longest member (ties → lowest doc_id) — the canonical-copy policy of
    a training-data dedup stage (vs `dedup_clusters`' structural
    doc_id==cluster_id convention).  One hash aggregate with an argmax
    encoded as max(struct(n_chars, -doc_id)): no per-cluster window sort,
    map-side combinable, so the shuffle carries one candidate struct per
    (partition, cluster).  The cluster table is CORPUS-PROPORTIONAL
    (one row per near-duplicated doc; web-crawl dup rates run 10-50%),
    so the member join is left to AQE — broadcast at harness scales,
    shuffled at the 100 TB shape — rather than pinned."""
    docs = _docs_with_dupes(spark, sf_dir)
    pairs = dedup_ops.lsh_candidate_pairs(
        docs, num_hashes=12, rows_per_band=3, n=3
    )
    clusters = dedup_ops.connected_components(pairs)
    members = clusters.join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    return (
        members.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col("n_chars"), (-F.col("doc_id")).alias("neg_id")
                )
            ).alias("m"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "cluster_id",
            (-F.col("m.neg_id")).cast("long").alias("keeper_id"),
            F.col("m.n_chars").cast("long").alias("keeper_chars"),
            "n_members",
        )
    )



@register(
    "dedup_minhash_est_vs_true",
    f"""WITH {_PLANTED_CTE},
{dedup_ops.minhash_oracle_cte(12, 3, 3).replace('FROM documents', 'FROM docs_planted')},
{dedup_ops.minhash_estimate_oracle(12)}""",
)
def q_dedup_minhash_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit for the MinHash family: per LSH candidate
    pair, signature agreement count vs TRUE shingle-set
    intersection/union — the measurement loop for tuning
    (num_hashes, rows_per_band) on a corpus before a 100 TB run.
    Integer-exact outputs keep the oracle hash stable."""
    return dedup_ops.minhash_estimate_vs_true(
        _docs_with_dupes(spark, sf_dir), num_hashes=12, rows_per_band=3, n=3
    )



@register("dedup_semantic_prune", sim_ops.semantic_prune_oracle(3, 10, 64))
def q_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (similarity.semantic_prune): assign
    vectors to nearest per-label-mean centroid, prune near-duplicates
    within each cluster at cosine >= 3/10 (greedy keep-lowest-id), report
    per-cluster members/dropped/kept.  Threshold decision is exact
    integer arithmetic (DECIMAL(38,0) vs DuckDB HUGEINT)."""
    return sim_ops.semantic_prune(load_table(spark, "embeddings", sf_dir))



@register(
    "dedup_pair_edit_distance",
    f"""WITH {_PLANTED_CTE},
{dedup_ops.minhash_oracle_cte(12, 3, 3).replace('FROM documents', 'FROM docs_planted')},
pairs AS ({_MINHASH_PAIRS_SQL}),
t AS (SELECT doc_id, substr(text, 1, 64) AS t FROM docs_planted)
SELECT p.doc_a, p.doc_b,
       levenshtein(a.t, b.t)::BIGINT AS lev,
       ROUND(1 - levenshtein(a.t, b.t) / greatest(length(a.t), length(b.t)), 6)
         AS sim
FROM pairs p
JOIN t a ON a.doc_id = p.doc_a
JOIN t b ON b.doc_id = p.doc_b""",
)
def q_pair_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of the MinHash LSH candidate pairs —
    sketches propose, Levenshtein on a 64-char prefix confirms
    (dedup.pair_edit_distance)."""
    return dedup_ops.pair_edit_distance(
        _docs_with_dupes(spark, sf_dir), num_hashes=12, rows_per_band=3, n=3,
        prefix=64,
    )



@register(
    "dedup_cross_source_matrix",
    f"""WITH {_PLANTED_CTE},
{dedup_ops.minhash_oracle_cte(12, 3, 3, base_table='docs_planted')},
{dedup_ops.cross_source_matrix_oracle(_MINHASH_PAIRS_SQL)}""",
)
def q_dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup (MinHash-LSH) pair counts
    per unordered source pair (dedup.cross_source_matrix) — which sources
    republish which, the double-counting signal behind mixture weights.
    Companion to corpus_split_neardup_leakage (same candidate pairs,
    metadata dimension instead of derived split, diagonal included)."""
    return dedup_ops.cross_source_matrix(
        _docs_with_dupes(spark, sf_dir), num_hashes=12, rows_per_band=3, n=3
    )



_CLUSTER_SIZES_ORACLE = f"""WITH RECURSIVE {_PLANTED_CTE},
{dedup_ops.minhash_oracle_cte(12, 3, 3, base_table='docs_planted')},
{dedup_ops.connected_components_oracle(_MINHASH_PAIRS_SQL)},
clusters AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
             FROM reach GROUP BY node),
sizes AS (SELECT cluster_id, COUNT(*)::BIGINT AS sz
          FROM clusters GROUP BY cluster_id)
SELECT sz, COUNT(*)::BIGINT AS n_clusters FROM sizes GROUP BY sz"""



def _cluster_sizes(spark: SparkSession, sf_dir: str, method: str) -> DataFrame:
    pairs = dedup_ops.lsh_candidate_pairs(
        _docs_with_dupes(spark, sf_dir), num_hashes=12, rows_per_band=3, n=3
    )
    cc = dedup_ops.connected_components(pairs, method=method)
    return (
        cc.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )



@register("dedup_cluster_sizes", _CLUSTER_SIZES_ORACLE)
def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram over the MinHash-LSH dup graph —
    the power-law sanity check run before trusting a dedup pass (one
    giant cluster usually means boilerplate linked everything; many
    pairs means true near-dups).  Composes connected components with
    two tiny cluster-keyed aggregates."""
    return _cluster_sizes(spark, sf_dir, "label")



@register("dedup_cluster_sizes_star", _CLUSTER_SIZES_ORACLE)
def q_dedup_cluster_sizes_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same cluster-size histogram computed through the
    large-star/small-star CC fallback (dedup.connected_components
    method='star', Kiveris et al. SoCC'14) — gives the adversarial-graph
    path a measured bench number and a driver hash against the SAME
    oracle as the min-label default (identical output by construction)."""
    return _cluster_sizes(spark, sf_dir, "star")



@register(
    "dedup_incremental_vs_index",
    f"""WITH batch_docs AS (
  SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id < 50
),
{dedup_ops.minhash_oracle_cte(12, 3, 3)},
{dedup_ops.minhash_oracle_cte(12, 3, 3, base_table='batch_docs', prefix='b')}
SELECT DISTINCT b.doc_id AS new_id, o.doc_id AS old_id
FROM bbands b JOIN bands o ON b.band = o.band AND b.sig = o.sig""",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: a re-ingested batch (first 50 docs
    under new ids) checked against the corpus's persisted band-signature
    index (dedup.incremental_near_dup_pairs) — only the batch is
    shingled; the historical corpus contributes fingerprints, never
    text.  Every batch doc must at minimum hit its byte-identical
    origin (identical signatures), so the planted 50 are a lower bound
    on the pair set."""
    docs = load_table(spark, "documents", sf_dir)
    index = dedup_ops.minhash_band_signatures(
        docs, num_hashes=12, rows_per_band=3, n=3
    )
    batch = docs.where(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return dedup_ops.incremental_near_dup_pairs(
        batch, index, num_hashes=12, rows_per_band=3, n=3
    )



@register("dedup_bloom_prefilter", dedup_ops.bloom_prefilter_oracle(3, 16))
def q_dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership prescreen for incremental exact dedup:
    a new batch (50 re-ingested + 50 edited docs) classified
    new_bloom / dup_confirmed / false_positive against the corpus's
    bounded-size position set (dedup.bloom_prefilter).  The cheap
    broadcast screen in front of dedup_incremental_vs_index's exact
    path — no false negatives by construction."""
    docs = load_table(spark, "documents", sf_dir)
    reingest = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    edited = docs.where((F.col("doc_id") >= 50) & (F.col("doc_id") < 100)).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" v2")).alias("text"),
    )
    return dedup_ops.bloom_prefilter(
        docs, reingest.unionByName(edited), k=3, bits_log2=16
    )



@register(
    "dedup_winnowing_pairs",
    text_ops.winnowing_pairs_oracle(8, 4, 8, 3),
)
def q_dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style overlap candidates over winnowed fingerprints
    (textstats.winnowing_pairs; k=8, w=4, df<=8, shared>=3): the
    guarantee-bearing complement of the minhash/simhash pair generators —
    any >=11-char shared substring leaves a shared fingerprint, so near-
    verbatim reuse cannot hide from this family the way it can from
    bag-of-shingles sketches.  df-pruned before pairing (boilerplate
    k-grams would explode the join quadratically); one hash-keyed
    exchange serves df count and both probes."""
    return text_ops.winnowing_pairs(
        load_table(spark, "documents", sf_dir), k=8, w=4, max_df=8, min_shared=3
    )


def _winnowing_pairs_edges_sql() -> str:
    """(doc_a, doc_b) edge CTE body from the winnowing pair generator's
    oracle internals (k=8, w=4, df<=8, shared>=3) — shared with
    dedup_winnowing_pairs via textstats.winnowing_fp_cte."""
    return """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM wdocfp a JOIN wrare r ON a.fph = r.fph
  JOIN wdocfp b ON a.fph = b.fph AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 3"""


@register(
    "dedup_winnowing_clusters",
    f"""WITH RECURSIVE {text_ops.winnowing_fp_cte(8, 4)},
wdocfp AS (SELECT DISTINCT doc_id, fph FROM fp),
wrare AS (SELECT fph FROM wdocfp GROUP BY fph HAVING COUNT(*) <= 8),
{dedup_ops.connected_components_oracle(_winnowing_pairs_edges_sql())}
SELECT node::BIGINT AS doc_id, MIN(lbl)::BIGINT AS cluster_id
FROM reach GROUP BY node""",
)
def q_dedup_winnowing_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-reuse cluster formation: connected components over the
    MOSS winnowing pairs (textstats.winnowing_pairs k=8/w=4/df<=8/
    shared>=3) — the pairs→clusters step the MinHash family already has
    (dedup_clusters), on the guarantee-bearing fingerprint graph; keep
    doc_id == cluster_id as the canonical copy.  Same compact
    (BIGINT, BIGINT) min-label propagation, same O(diameter) rounds."""
    pairs = text_ops.winnowing_pairs(
        load_table(spark, "documents", sf_dir),
        k=8, w=4, max_df=8, min_shared=3,
        # CC consumes the pair graph through an RDD checkpoint, where
        # runtime exchange reuse does not apply — materialize the
        # fingerprint set once (see winnowing_pairs docstring, r8)
        materialize_fp=True,
    ).select("doc_a", "doc_b")
    return dedup_ops.connected_components(pairs)


@register(
    "dedup_threshold_sweep",
    f"""WITH {_PLANTED_CTE},
{dedup_ops.minhash_oracle_cte(12, 3, 3).replace('FROM documents', 'FROM docs_planted')},
{dedup_ops.threshold_sweep_oracle(12)}""",
)
def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup policy curve (dedup.threshold_sweep): per Jaccard cut in
    {50..90}%, candidate pairs passing by TRUE overlap vs by MinHash
    ESTIMATE, plus documents the keep-lowest-id policy would drop —
    the release knob a corpus engineer reads before fixing the
    production threshold, with the estimator's policy error visible
    per cut.  Integer cross-multiplied thresholds; one estimate pass,
    no extra scan."""
    return dedup_ops.threshold_sweep(
        _docs_with_dupes(spark, sf_dir), num_hashes=12, rows_per_band=3, n=3
    )
