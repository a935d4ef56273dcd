"""Batch table loaders over the driver-generated parquet.

Design notes (100 TB posture):
- ``spark.read.parquet`` keeps column pruning + predicate pushdown; we never
  collect or pre-materialize.
- Timestamps: the generator wrote INT64 TIMESTAMP(NANOS), which Spark cannot
  decode natively; we read nanos as LONG (``nanosAsLong``) and convert with
  *integer* arithmetic (``div``, never double division — 1.7e18 ns exceeds
  double's 2^53 exact-integer range).
- All event-time columns are exposed as TIMESTAMP_NTZ in UTC wall time plus
  a ``*_epoch`` BIGINT column so every downstream bucket computation is
  session-timezone independent and matches DuckDB's naive-timestamp reads
  bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: timestamp-typed columns per table (written as INT64 nanos by the generator)
_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _nanos_to_ntz(df: DataFrame, col: str) -> DataFrame:
    """Normalize a timestamp column to (TIMESTAMP_NTZ, BIGINT epoch-seconds).

    Generator quirk: `events.ts` is INT64 TIMESTAMP(NANOS) → read as LONG
    nanos (``nanosAsLong``) and converted with integer ``div`` arithmetic;
    `orders`/`lineitem` dates are TIMESTAMP(MICROS) → already NTZ on read.
    ``timestamp_micros`` yields an instant (LTZ); ``convert_timezone('UTC')``
    pins it to UTC wall time as NTZ so formatting/date functions never
    depend on ``spark.sql.session.timeZone`` (the driver owns the session).
    """
    dtype = dict(df.dtypes)[col]
    if dtype == "bigint":  # nanos-as-long
        # FLOOR division, not `div`: `div` truncates toward zero, so a
        # pre-1970 nanos value would land one second/microsecond high,
        # diverging from the DuckDB oracle's floor(epoch(ts)).  Subtracting
        # pmod first makes the quotient exact floor semantics in pure
        # integer arithmetic (never doubles: 2^53 loss).
        ns = f"`{col}`"
        fsec = f"(({ns} - pmod({ns}, 1000000000)) div 1000000000)"
        fmicro = f"(({ns} - pmod({ns}, 1000)) div 1000)"
        return df.withColumn(
            f"{col}_epoch", F.expr(fsec).cast("long")
        ).withColumn(
            col,
            F.expr(f"convert_timezone('UTC', timestamp_micros({fmicro}))"),
        )
    if dtype == "timestamp":  # LTZ instant → pin to UTC wall
        df = df.withColumn(col, F.expr(f"convert_timezone('UTC', `{col}`)"))
    # NTZ epoch: pure wall-time arithmetic (timestampdiff on NTZ never
    # consults the session timezone, unlike unix_timestamp).  SECOND-diff
    # truncates toward zero, so pre-1970 sub-second values would land one
    # high vs the oracle's floor(epoch(ts)); diff in micros then floor-
    # divide with the same pmod trick as the nanos branch above.
    us = (
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" `{col}`)"
    )
    return df.withColumn(
        f"{col}_epoch",
        F.expr(f"(({us}) - pmod({us}, 1000000)) div 1000000").cast("long"),
    )


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one driver table with normalized timestamp columns."""
    apply_runtime_confs(spark)
    sf_dir = sf_dir or DEFAULT_SF_DIR
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_COLS.get(name, ()):
        if c in df.columns:
            df = _nanos_to_ntz(df, c)
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


# ---------------------------------------------------------------------------
# The synthesized log stream.
#
# The reference's native record is a raw syslog line with an embedded
# ISO-8601 timestamp (reference: storm .../LogTypeSniffer.java:20,
# ParseBolt.java:41).  We synthesize the same shape from `events` so the
# grep/tail/stats surface has a realistic `_raw` to chew on.  The expression
# is engineered to be *bit-identical* between Spark and the DuckDB oracle:
# second-truncated ISO timestamp, integer cents (no float formatting), and a
# unique `id=` suffix so ORDER BY _raw is a total order (LIMIT-stable).
# ---------------------------------------------------------------------------

_RAW_SPARK = (
    "concat(date_format(ts, \"yyyy-MM-dd'T'HH:mm:ss\"), ' host', user_id,"
    " ' app: ', event_type, ' value=', cast(round(value * 100) as bigint),"
    " ' id=', event_id)"
)

#: DuckDB CTE defining the identical `logs` relation for oracle SQL.
LOGS_ORACLE_CTE = """\
logs AS (
  SELECT
    strftime(ts, '%Y-%m-%dT%H:%M:%S') || ' host' || user_id || ' app: '
      || event_type || ' value=' || CAST(ROUND(value * 100) AS BIGINT)
      || ' id=' || event_id AS _raw,
    CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
    event_id,
    event_type,
    user_id
  FROM events
)"""


def logs_view(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """`(_raw, ts, ts_epoch, event_id, event_type, user_id)` log stream.

    Deliberately NOT repartitioned here: the testdata scan is one split
    (single-row-group parquet), but an unconditional exchange taxes every
    consumer — aggregating queries pay a second shuffle and operators
    that _spread internally would shuffle twice (measured net loss on the
    headline bench).  CPU-heavy per-row consumers opt in via _spread."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        F.expr(_RAW_SPARK).alias("_raw"),
        F.col("ts"),
        F.col("ts_epoch"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("user_id"),
    )
