"""Extended embedding family: IVF/PQ/LSH recall audits, kmeans, triplet mining, kNN eval, sketches over embeddings, hybrid retrieval."""

from __future__ import annotations

from cloudpelican_lsd_spark.operators import similarity as sim_ops
from cloudpelican_lsd_spark.operators import stats as stats_ops
from cloudpelican_lsd_spark.operators import textstats as text_ops
from cloudpelican_lsd_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.registry._core import (
    register,
    register_ungated,
)




@register(
    "emb_centroid_per_label",
    """SELECT label, pos,
       CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 10000000) AS BIGINT))
            AS DOUBLE) / COUNT(*) / 10000000 AS centroid
FROM (SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings) t
GROUP BY label, pos""",
)
def q_emb_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector as (label, pos, centroid) rows — the
    k-means-step / class-prototype primitive.  posexplode keeps the
    whole computation in codegen; the shuffle carries map-side partial
    (sum, count) pairs per (label, pos) — dim × labels rows, independent
    of corpus size.  Elements are fixed-point quantized
    (floor(v·1e7) — exact on any IEEE engine, unlike double→DECIMAL
    casts, which round through float arithmetic in DuckDB) so the SUM is
    an exact BIGINT: identical under any partitioning / reduce order
    (double addition is not associative; at 1000 executors that
    nondeterminism would otherwise leak into the value hash)."""
    e = load_table(spark, "embeddings", sf_dir)
    ex = e.select("label", F.posexplode("embedding").alias("pos0", "v"))
    qv = F.floor(F.col("v").cast("double") * 10000000).cast("long")
    return (
        ex.groupBy(
            "label", (F.col("pos0") + 1).cast("long").alias("pos")
        )
        .agg(
            (
                # DECIMAL accumulator: sum(long) wraps past ~9e10 rows per
                # (label, pos) at this quantization; DuckDB's SUM(BIGINT)
                # is HUGEINT-exact already
                F.sum(qv.cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
                / F.lit(10000000)
            ).alias("centroid")
        )
    )



@register("distinct_users_hll_audit", stats_ops.HLL_DISTINCT_AUDIT_ORACLE)
def q_distinct_users_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ accuracy contract, hash-gated: the estimate must sit within
    3·rsd of the exact distinct count (guarantee-as-constant oracle, the
    GK-audit pattern; stats.hll_distinct_audit)."""
    return stats_ops.hll_distinct_audit(load_table(spark, "events", sf_dir), rsd_pct=2)



@register_ungated("distinct_users_sketch")  # rows-only: approximate by design
def q_distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch next to the exact answer —
    the scale path for `distinct_users_per_type` (exact COUNT DISTINCT
    shuffles every distinct key; the sketch shuffles one fixed-size
    register set per group and merges).  Approximate ⇒ no value oracle;
    the test asserts the 2% rsd bound instead."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )



@register("emb_ivf_recall", sim_ops.ivf_recall_oracle(8, 2, 10, 10))
def q_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF probe search vs brute-force ground truth —
    the ANN tuning loop (see similarity.ivf_recall)."""
    return sim_ops.ivf_recall(
        load_table(spark, "embeddings", sf_dir),
        n_centroids=8, nprobe=2, num_queries=10, k=10,
    )



@register(
    "emb_ivf_index_incremental",
    sim_ops.ivf_index_topk_oracle(8, 2, 10, 10),
)
def q_ivf_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental retrieval against the PERSISTED IVF index
    (similarity.build_ivf_index / ivf_index_topk) — the embedding
    analogue of dedup_incremental_vs_index: the corpus is indexed once
    (centroids + per-vector assignment + norms), and a new query batch
    (the first 10 vectors re-ingested under shifted ids) probes only
    its nprobe=2 nearest centroid lists.  Each re-ingested query must
    at minimum retrieve its byte-identical origin at cos 1.0 — the
    planted lower bound.  The bucketed-persistence layout (zero
    index-side shuffle) is plan-pinned in tests; here the index is
    built inline so the oracle replays it exactly."""
    emb = load_table(spark, "embeddings", sf_dir)
    cents, assign = sim_ops.build_ivf_index(emb, n_centroids=8)
    queries = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("qid"), "embedding"
    )
    return sim_ops.ivf_index_topk(queries, cents, assign, nprobe=2, k=10)



@register(
    "emb_pq_index_incremental",
    sim_ops.pq_index_topk_oracle(8, 16, 10, 10, 64),
)
def q_pq_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ADC retrieval against the PERSISTED PQ index
    (similarity.build_pq_index / pq_index_topk): the corpus is encoded
    once into the compact (vec_id, s, code) table, and a new query
    batch (the first 10 vectors re-ingested under shifted ids) builds
    only its own lookup tables and joins the codes — no raw corpus
    embedding is touched on the query path.  Exact fixed-point BIGINT
    end to end; completes the persisted-index pair with
    emb_ivf_index_incremental."""
    emb = load_table(spark, "embeddings", sf_dir)
    codebook, codes = sim_ops.build_pq_index(emb, m=8, n_codes=16, dim=64)
    queries = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("qid"), "embedding"
    )
    return sim_ops.pq_index_topk(queries, codebook, codes, m=8, dim=64, k=10)



@register(
    "emb_ivfpq_index_incremental",
    sim_ops.ivfpq_index_topk_oracle(8, 8, 16, 2, 10, 10, 64),
)
def q_ivfpq_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental retrieval against the PERSISTED **IVF-PQ residual
    index** (similarity.build_ivfpq_index / ivfpq_index_topk) — the
    combined production ANN shape: the corpus is coarse-assigned to 8
    centroids and its residuals product-quantized ONCE (m=8 subspaces,
    16-entry shared codebook); a new query batch (the first 10 vectors
    re-ingested under shifted ids) probes its nprobe=2 nearest cells and
    ADC-scores only the compact codes inside them.  Exact fixed-point
    BIGINT end to end; each re-ingested query's origin achieves the
    minimum ADC among its own (always-probed) cell's candidates — the
    per-cell planted lower bound.  Unites emb_ivf_index_incremental's
    pruned scan with emb_pq_index_incremental's code-only query path."""
    emb = load_table(spark, "embeddings", sf_dir)
    cents, codebook, codes = sim_ops.build_ivfpq_index(
        emb, n_centroids=8, m=8, n_codes=16, dim=64
    )
    queries = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("qid"), "embedding"
    )
    return sim_ops.ivfpq_index_topk(
        queries, cents, codebook, codes, nprobe=2, k=10
    )



@register(
    "emb_prototype_pruning",
    sim_ops.prototype_pruning_oracle(1, 4, 64),
)
def q_prototype_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototypicality-based data pruning
    (similarity.prototype_pruning, after Sorscher et al. 2022): the 25%
    most prototypical vectors of each label cluster — highest exact
    fixed-point cosine to their own centroid — are marked drop_easy,
    the large-dataset regime where redundant easy examples contribute
    least.  Scale-safe: the rank threshold runs over the bounded
    rounded-cosine histogram (the perplexity-cutpoints pattern), never
    a per-vector window over the corpus."""
    return sim_ops.prototype_pruning(
        load_table(spark, "embeddings", sf_dir), drop_num=1, drop_den=4
    )



@register(
    "emb_margin_scoring",
    sim_ops.margin_scoring_oracle(10, 10),
)
def q_margin_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-margin scoring of each query's top-10 candidates
    (similarity.margin_scoring, after Artetxe & Schwenk 2019): the
    hubness correction production mining pipelines apply on top of raw
    cosine — a pair only scores high if the endpoints are close
    RELATIVE to their own neighborhoods.  Exact micro-unit sums + one
    correctly-rounded division, hash-identical across engines."""
    return sim_ops.margin_scoring(load_table(spark, "embeddings", sf_dir))



@register(
    "emb_semantic_decontaminate",
    sim_ops.semantic_decontaminate_oracle(2, 5, 97),
)
def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination
    (similarity.semantic_decontaminate): training vectors within cosine
    2/5 of ANY held-out eval vector (the deterministic BOUNDED slice:
    first 20 multiples of 97, fixed-size like a real benchmark) are
    flagged per label — the semantic complement of the n-gram rule in
    corpus_eval_decontaminate, catching paraphrased eval leakage that
    shares no shingle.  Eval side broadcast, train side one exact
    LINEAR scan (no LSH recall loss, no shuffle of train vectors)."""
    return sim_ops.semantic_decontaminate(
        load_table(spark, "embeddings", sf_dir)
    )



@register(
    "emb_ivfpq_recall",
    sim_ops.ivfpq_recall_oracle(8, 8, 16, 2, 10, 10, 64),
)
def q_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the combined IVF-PQ residual index against the exact
    fixed-point L2 top-k (similarity.ivfpq_recall) — quantifies the
    STACKED loss of cell probing plus residual quantization, the tuning
    loop for (n_centroids, nprobe, m, n_codes); compare with
    emb_ivf_recall and emb_pq_recall to attribute which tier loses
    what."""
    return sim_ops.ivfpq_recall(load_table(spark, "embeddings", sf_dir))



@register("emb_pq_topk", sim_ops.pq_topk_oracle(8, 16, 10, 10, 64))
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-k (similarity.pq_topk): m=8 subspace
    codebooks from the first 16 vectors, asymmetric-distance search over
    the compact code table — the memory-bound scale path beyond IVF.
    All arithmetic exact fixed-point BIGINT (hash-identical oracle)."""
    return sim_ops.pq_topk(load_table(spark, "embeddings", sf_dir))



@register("emb_pq_recall", sim_ops.pq_recall_oracle(8, 16, 10, 10, 64))
def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ recall@k audit against the exact fixed-point L2 top-k under
    identical tie rules (similarity.pq_recall)."""
    return sim_ops.pq_recall(load_table(spark, "embeddings", sf_dir))



@register("emb_kmeans_assign", sim_ops.kmeans_assign_oracle(64))
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means assignment step in exact fixed-point arithmetic:
    per-label mean centroids, nearest-centroid by cosine, output the
    label-vs-cluster confusion (similarity.kmeans_assign_confusion)."""
    return sim_ops.kmeans_assign_confusion(
        load_table(spark, "embeddings", sf_dir)
    )



@register(
    "emb_quantize_audit",
    """WITH ex AS (
  SELECT vec_id, i AS pos, embedding[i]::DOUBLE AS v
  FROM embeddings, generate_series(1, 64) t(i)
),
st AS (
  SELECT vec_id, MIN(v) AS mn, MAX(v) AS mx FROM ex GROUP BY vec_id
),
q AS (
  SELECT e.vec_id, e.v, s.mn, s.mx,
         CASE WHEN s.mx > s.mn
              THEN least(floor(((e.v - s.mn) * 255) / (s.mx - s.mn)), 255)
              ELSE 0 END AS qv
  FROM ex e JOIN st s ON s.vec_id = e.vec_id
),
err AS (
  SELECT vec_id, abs(v - (mn + (qv * (mx - mn)) / 255)) AS e FROM q
)
SELECT vec_id,
       ROUND(MAX(e), 6) AS max_abs_err,
       ROUND(SUM(CAST(floor(e * 1000000000) AS BIGINT)) / 64 / 1e9, 6)
         AS mean_abs_err
FROM err GROUP BY vec_id""",
)
def q_emb_quantize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 (256-level) min-max quantization error audit per vector —
    the compression-loss measurement for shipping embeddings at 1/4 the
    bytes (the PQ/scalar-quantization decision input).  Quantize/
    dequantize stay in per-row IEEE chains (deterministic given identical
    operand order, written identically in both engines); the MEAN goes
    through exact fixed-point (floor(err·1e9) BIGINT sum) because a
    double sum's reduce order is partitioning-dependent — same discipline
    as emb_centroid_per_label.  One posexplode scan, vec_id-keyed aggs
    (exchange reused between the min/max agg and the join)."""
    emb = load_table(spark, "embeddings", sf_dir)
    ex = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos0", "v"
        ),
    )
    st = ex.groupBy("vec_id").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    )
    q = ex.join(st, "vec_id").select(
        "vec_id",
        "v",
        "mn",
        "mx",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.floor(
                    ((F.col("v") - F.col("mn")) * 255) / (F.col("mx") - F.col("mn"))
                ),
                F.lit(255),
            ),
        )
        .otherwise(0)
        .alias("qv"),
    )
    err = q.select(
        "vec_id",
        F.abs(
            F.col("v")
            - (F.col("mn") + (F.col("qv") * (F.col("mx") - F.col("mn"))) / 255)
        ).alias("e"),
    )
    return err.groupBy("vec_id").agg(
        F.round(F.max("e"), 6).alias("max_abs_err"),
        F.round(
            F.sum(F.floor(F.col("e") * 1000000000).cast("long")) / 64 / F.lit(1e9),
            6,
        ).alias("mean_abs_err"),
    )



@register("emb_kmeans_step_shift", sim_ops.kmeans_step_shift_oracle(64))
def q_kmeans_step_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd iteration: nearest-centroid assignment, cluster-mean
    recompute, per-cluster L2 centroid shift — the k-means convergence
    loop body as pure relational algebra
    (similarity.kmeans_step_shift)."""
    return sim_ops.kmeans_step_shift(
        load_table(spark, "embeddings", sf_dir)
    )



@register("emb_rank_fusion", sim_ops.rank_fusion_oracle(8, 2, 10, 10, 60))
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of brute-force and IVF retrieval lists —
    the multi-retriever ensembling step (similarity.rank_fusion_topk)."""
    return sim_ops.rank_fusion_topk(
        load_table(spark, "embeddings", sf_dir),
        n_centroids=8, nprobe=2, num_queries=10, k=10, rrf_k=60,
    )



@register(
    "hybrid_retrieval_topk",
    sim_ops.hybrid_retrieval_oracle(text_ops.bm25_topk_oracle(k=20)),
)
def q_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval: RRF fusion of BM25 (fixed query
    bag) with brute-force cosine for query vector 0
    (similarity.hybrid_retrieval_topk) — the two-retriever RAG recall
    stack over the aligned documents/embeddings tables."""
    return sim_ops.hybrid_retrieval_topk(
        load_table(spark, "documents", sf_dir),
        load_table(spark, "embeddings", sf_dir),
    )



@register("emb_triplet_mining", sim_ops.triplet_mining_oracle(10, 5))
def q_emb_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-hard triplet mining for contrastive training: per query the
    hardest same-label positive + top-5 hardest different-label
    negatives with margin-violation flags (similarity.triplet_mining) —
    the training-pair generator that sits on top of the ANN family.
    Broadcast-queries plan: the candidate corpus never shuffles."""
    return sim_ops.triplet_mining(
        load_table(spark, "embeddings", sf_dir), num_queries=10, k=5
    )



@register("emb_centroid_outliers", sim_ops.centroid_outliers_oracle(500000, 64))
def q_emb_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA: micro-unit cosine of every vector to its own label
    centroid, flagging < 0.5 — mislabels and garbage vectors surface
    before they poison retrieval (similarity.centroid_outliers; shares
    _fixed_point_scores with the kmeans family)."""
    return sim_ops.centroid_outliers(
        load_table(spark, "embeddings", sf_dir), threshold_ppm=500000
    )



@register("emb_knn_accuracy", sim_ops.knn_accuracy_oracle(5, 50))
def q_emb_knn_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label-prediction eval (k=5 cosine majority vote vs true
    label) — the do-labels-cluster probe for the embedding space
    (similarity.knn_accuracy)."""
    return sim_ops.knn_accuracy(
        load_table(spark, "embeddings", sf_dir), k=5, num_queries=50
    )



@register("emb_cluster_purity", sim_ops.cluster_purity_oracle(64))
def q_emb_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering quality: per nearest-centroid cluster, the
    dominant true label and its exact ppm share — built on the same
    fixed-point assignment as the kmeans confusion/semantic-prune ops
    (similarity.cluster_purity)."""
    return sim_ops.cluster_purity(load_table(spark, "embeddings", sf_dir))



@register("emb_power_iteration", sim_ops.power_iteration_oracle(64))
def q_emb_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the top principal direction
    (deterministic all-ones start; driver loop = PCA training, the
    kmeans/BPE/perceptron step pattern).  Order-independent decimal
    accumulation throughout (similarity.power_iteration_step)."""
    return sim_ops.power_iteration_step(load_table(spark, "embeddings", sf_dir), dims=64)



@register("emb_matryoshka_audit", sim_ops.matryoshka_audit_oracle(16, 10, 10))
def q_emb_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (Kusupati et al. 2022): recall@10 of
    16-dim prefix cosine retrieval vs the full 64-dim ranking — one
    broadcast pass computes both cosines, two windows share one exchange
    (similarity.matryoshka_audit)."""
    return sim_ops.matryoshka_audit(
        load_table(spark, "embeddings", sf_dir), trunc_dims=16, num_queries=10, k=10
    )



@register(
    "emb_dim_health",
    """WITH q AS (
  SELECT pos, CAST(floor(CAST(v AS DOUBLE) * 10000000) AS BIGINT) AS qv
  FROM (SELECT unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings) t
)
SELECT pos,
       COUNT(*)::BIGINT AS n,
       ROUND(CAST(SUM(qv) AS DOUBLE) / COUNT(*) / 1e7, 6) AS mean_v,
       ROUND((CAST(SUM(CAST(qv AS HUGEINT) * qv) AS DOUBLE) / COUNT(*)
              - (CAST(SUM(qv) AS DOUBLE) / COUNT(*))
                * (CAST(SUM(qv) AS DOUBLE) / COUNT(*))) / 1e14, 6)
         AS var_v,
       SUM(CASE WHEN qv = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero
FROM q GROUP BY pos""",
)
def q_emb_dim_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health: mean, variance, and zero counts
    for each vector position — the pre-training feature audit that
    catches dead or saturated dimensions.  Fixed-point exact sums so the
    reduce order never leaks into the hash; the sum of squares
    accumulates in DECIMAL(38,0) (DuckDB: HUGEINT), since qv**2 reaches
    1e14 per row and a BIGINT accumulator would wrap past ~9e4 rows per
    dimension.  One posexplode scan, one (pos)-keyed agg bounded by
    dimensionality."""
    e = load_table(spark, "embeddings", sf_dir)
    ex = e.select(F.posexplode("embedding").alias("pos0", "v"))
    qv = F.floor(F.col("v").cast("double") * 10000000).cast("long")
    return (
        ex.select((F.col("pos0") + 1).cast("long").alias("pos"), qv.alias("qv"))
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("qv").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
                / F.lit(1e7),
                6,
            ).alias("mean_v"),
            F.round(
                (
                    F.sum(
                        (F.col("qv") * F.col("qv")).cast("decimal(38,0)")
                    ).cast("double")
                    / F.count(F.lit(1))
                    - (
                        F.sum(F.col("qv").cast("decimal(38,0)")).cast("double")
                        / F.count(F.lit(1))
                    )
                    * (
                        F.sum(F.col("qv").cast("decimal(38,0)")).cast("double")
                        / F.count(F.lit(1))
                    )
                )
                / F.lit(1e14),
                6,
            ).alias("var_v"),
            F.sum((F.col("qv") == 0).cast("long")).alias("n_zero"),
        )
    )



@register("emb_jl_audit", sim_ops.jl_audit_oracle(16, 64))
def q_emb_jl_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss norm-preservation audit for a deterministic
    Rademacher projection 64 -> 16 dims (similarity.jl_audit): ratio_ppm
    concentrates around 1e6 with spread ~sqrt(2/16); systematic drift
    flags correlated dimensions before a pipeline commits to projected
    ANN.  Exact BIGINT quantized arithmetic, zero shuffles."""
    emb = load_table(spark, "embeddings", sf_dir)
    return sim_ops.jl_audit(emb, proj_dim=16, dim=64)


@register("emb_kcenter_seeds", sim_ops.kcenter_seeds_oracle(4, 64))
def q_emb_kcenter_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-first k-center seeding (Gonzalez 1985), k=4 — the
    deterministic k-means++ initialization feeding emb_kmeans_step_shift
    (similarity.kcenter_seeds).  Exact milli-quantized L2, maximin
    selection with MIN-vec_id ties; driver loop over one plan with
    broadcast seed state (the kmeans family convention)."""
    return sim_ops.kcenter_seeds(
        load_table(spark, "embeddings", sf_dir), k=4, dim=64
    )


@register("emb_ivf_probe_sweep", sim_ops.ivf_probe_sweep_oracle(8, (1, 2, 4), 10, 10))
def q_ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF tuning curve (similarity.ivf_probe_sweep): corpus-level
    recall@10 vs brute-force truth at nprobe in {1,2,4}, from ONE probe
    ranking — the ANN analogue of dedup_threshold_sweep, read before
    fixing nprobe for a production run."""
    return sim_ops.ivf_probe_sweep(
        load_table(spark, "embeddings", sf_dir),
        n_centroids=8, probes=(1, 2, 4), num_queries=10, k=10,
    )
