"""Extended ops analytics: autocorrelation, burn rate, series correlation, sketch audits over logs."""

from __future__ import annotations

from cloudpelican_lsd_spark.operators import stats as stats_ops
from cloudpelican_lsd_spark.sources.tables import LOGS_ORACLE_CTE
from cloudpelican_lsd_spark.sources.tables import load_table
from cloudpelican_lsd_spark.sources.tables import logs_view
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloudpelican_lsd_spark.registry._core import (
    register,
)




@register("stats_autocorrelation", stats_ops.autocorrelation_oracle(300, 3))
def q_stats_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..3 autocorrelation of each event type's zero-filled count
    series — the periodicity/burstiness probe (stats.autocorrelation)."""
    return stats_ops.autocorrelation(
        load_table(spark, "events", sf_dir), bucket_sec=300, max_lag=3
    )



@register("stats_series_correlation", stats_ops.series_correlation_oracle(300))
def q_stats_series_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between per-5-min event-type count
    series on the zero-filled common grid — exact BIGINT moments, one
    float op per pair (stats.series_correlation)."""
    return stats_ops.series_correlation(
        load_table(spark, "events", sf_dir), bucket_sec=300
    )



@register(
    "stats_burn_rate",
    f"""WITH {LOGS_ORACLE_CTE},
{stats_ops.burn_rate_oracle(1, 50, 3600, 21600, 144, 60)}""",
)
def q_stats_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow error-budget burn (stats.burn_rate): page when BOTH
    the 1h @ 14.4x and 6h @ 6x trailing error ratios exceed a 2% budget
    — the public SRE Workbook low-noise paging rule, decided entirely in
    cross-multiplied BIGINT (no float ratio).  Trailing RANGE frames
    over the minutely pre-aggregate, not the raw stream.  The 2% budget
    puts the fast threshold (28.8%) just above this stream's median
    hourly error ratio (~20%), so all three flags take both values."""
    # every oracle literal passed explicitly — a stats.py default change
    # must not silently fork the Spark side from the registered SQL
    return stats_ops.burn_rate(
        logs_view(spark, sf_dir), budget_num=1, budget_den=50,
        fast_sec=3600, slow_sec=21600, fast_x10=144, slow_x10=60,
    )



@register(
    "stats_rate_of_change",
    f"""WITH {LOGS_ORACLE_CTE},
b AS (
  SELECT event_type, ts_epoch - ts_epoch % 3600 AS bucket, COUNT(*) AS cnt
  FROM logs GROUP BY event_type, bucket
),
d AS (
  SELECT event_type, bucket, cnt,
         lag(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS prev
  FROM b
)
SELECT event_type, bucket, cnt::BIGINT AS cnt,
       COALESCE(prev, 0)::BIGINT AS prev_cnt,
       CAST(cnt - COALESCE(prev, 0) AS BIGINT) AS delta,
       CASE WHEN prev IS NULL OR prev = 0 THEN NULL
            ELSE ROUND((cnt - prev) * 100.0 / prev, 6) END AS pct_change
FROM d""",
)
def q_stats_rate_of_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type rate-of-change: bucket counts with LAG delta and
    percent change — the dashboard "rate spiked vs last hour" primitive.
    One hash agg (map-side partial) then ONE window sort per event_type
    partition over already-aggregated rows (buckets ≪ events); integer
    deltas exact, pct through a single rounded division."""
    logs = logs_view(spark, sf_dir)
    b = (
        logs.select(
            "event_type", stats_ops.bucket_col("ts_epoch", 3600).alias("bucket")
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    d = b.withColumn("prev", F.lag("cnt").over(w))
    return d.select(
        "event_type",
        "bucket",
        F.col("cnt").cast("long").alias("cnt"),
        F.coalesce("prev", F.lit(0)).cast("long").alias("prev_cnt"),
        (F.col("cnt") - F.coalesce("prev", F.lit(0)))
        .cast("long")
        .alias("delta"),
        F.when(
            F.col("prev").isNull() | (F.col("prev") == 0), F.lit(None)
        )
        .otherwise(
            F.round((F.col("cnt") - F.col("prev")) * 100.0 / F.col("prev"), 6)
        )
        .alias("pct_change"),
    )



@register(
    "parse_sniff_types",
    """SELECT CASE WHEN regexp_matches(_raw,
         '[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}\\.[0-9]{3}[0-9]*(\\+|-)[0-9]{2}:[0-9]{2}')
       THEN 'rsyslog' ELSE 'unknown' END AS log_type,
       COUNT(*)::BIGINT AS n
FROM (
  SELECT _raw FROM (
    SELECT strftime(ts, '%Y-%m-%dT%H:%M:%S') || ' host' || user_id || ' app: '
             || event_type AS _raw FROM events
    UNION ALL
    SELECT strftime(ts, '%Y-%m-%dT%H:%M:%S.123+00:00') || ' syslog line '
             || event_type FROM events
  ) u
) lines
GROUP BY 1""",
)
def q_parse_sniff_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogTypeSniffer semantics (LogTypeSniffer.java:24-51): classify a
    mixed stream — second-precision lines (no millis+offset → unknown)
    vs full ISO-8601 lines (→ rsyslog) — and count per type.  Both
    synthesized lines come off ONE events scan (explode of a 2-element
    array), not a union of two scans."""
    from cloudpelican_lsd_spark.functions.parse import sniff_log_type

    ev = load_table(spark, "events", sf_dir)
    plain = F.concat(
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit(" host"),
        F.col("user_id"),
        F.lit(" app: "),
        F.col("event_type"),
    )
    iso = F.concat(
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit(".123+00:00 syslog line "),
        F.col("event_type"),
    )
    lines = ev.select(F.explode(F.array(plain, iso)).alias("_raw"))
    return lines.groupBy(
        sniff_log_type(F.col("_raw")).alias("log_type")
    ).agg(F.count(F.lit(1)).alias("n"))

