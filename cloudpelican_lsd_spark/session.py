"""SparkSession construction tuned for this engine.

Local testing runs on ``local[N]``; the configuration is written so the
same code runs unchanged on a multi-executor cluster: AQE handles skew and
partition coalescing at runtime, shuffle partitions are sized by the
driver, and all scale-sensitive choices (broadcast thresholds, partition
bytes) are plain Spark confs a cluster deployment would override.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime confs every session needs (settable on an existing session too).
RUNTIME_CONFS = {
    # The driver-generated parquet stores INT64 TIMESTAMP(NANOS) which Spark
    # cannot decode as a timestamp; read it as raw nanos and convert
    # explicitly (see sources.tables.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Adaptive execution: runtime shuffle-partition coalescing + skew-join
    # splitting; essential at 100 TB where static partition counts are wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas-UDF boundary (vectorized transfer).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply engine confs to an externally-created session (driver contract:
    ``entry(spark)`` / ``queries()`` receive a session we didn't build)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this session; proceed with its defaults
    return spark


def get_spark(app_name: str = "cloudpelican-lsd-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a local session. ``SPARK_GRAFT_CPUS`` controls core
    count (default: all)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or 0
    master = f"local[{cpus}]" if cpus else "local[*]"
    shuffle = str(max(32, (cpus or os.cpu_count() or 8)))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return apply_runtime_confs(builder.getOrCreate())
