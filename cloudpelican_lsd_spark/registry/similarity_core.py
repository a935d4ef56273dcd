"""North-star similarity search over embeddings (brute-force cosine baseline)."""

from __future__ import annotations

from cloudpelican_lsd_spark.operators import similarity as sim_ops
from cloudpelican_lsd_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession

from cloudpelican_lsd_spark.registry._core import (
    register,
)


# ===========================================================================
# north-star: similarity search over embeddings
# ===========================================================================


@register("emb_cosine_topk", sim_ops.cosine_topk_oracle(10, 10))
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the ANN correctness baseline."""
    return sim_ops.cosine_topk(
        load_table(spark, "embeddings", sf_dir), num_queries=10, k=10
    )


@register("emb_lsh_near_pairs", sim_ops.lsh_near_pairs_oracle(8, 4, 10))
def q_lsh_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed near-neighbor pairs (the ANN scale path)."""
    return sim_ops.lsh_near_pairs(
        load_table(spark, "embeddings", sf_dir),
        bits=8,
        min_cos_num=4,
        min_cos_den=10,
    )


@register("emb_ivf_topk", sim_ops.ivf_topk_oracle(8, 2, 10, 10))
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe search: nearest-centroid lists only."""
    return sim_ops.ivf_topk(
        load_table(spark, "embeddings", sf_dir),
        n_centroids=8,
        nprobe=2,
        num_queries=10,
        k=10,
    )


