"""Bucketed table layout — shuffle-free co-located equi-joins.

At 100 TB the dominant cost of a fact-fact equi-join (lineitem ⋈ orders,
results ⋈ results-yesterday, events ⋈ sessions) is shuffling both sides on
the join key.  Hash-bucketing both tables on that key at WRITE time moves
the shuffle to ingest, once, and every subsequent join/aggregation on the
key reads co-located buckets: the physical plan contains no Exchange on
either side (bucket count and key become the scan's output partitioning,
which SortMergeJoin accepts directly).

This is the Spark-native replacement for the reference's per-filter
table-per-day layout (BigQueryInsertRunnable.java:32-37): partitioning
prunes by date/filter, bucketing co-locates the high-cardinality join key
inside each partition.

Rules of thumb encoded here:
- bucket count is fixed at write time; pick it for the TARGET scale
  (buckets ≈ total_size / desired_split_size), not the test scale — too
  few buckets caps join parallelism forever.
- both sides must agree on (key, bucket count) or Spark falls back to a
  shuffle for the mismatched side only.
- `sortBy` the same key: with one file per bucket the scan also reports
  sorted output and the SortMergeJoin drops its Sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) on ``keys``.

    Bucketing metadata lives in the session catalog, so readers must use
    ``spark.table(table)`` — a plain ``read.parquet(path)`` sees the same
    files but loses the co-location contract.
    """
    w = df.write.bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.format("parquet").mode("overwrite").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucketed output partitioning."""
    return spark.table(table)
