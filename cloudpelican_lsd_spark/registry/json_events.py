"""JSON props extraction (schema-on-read) and windowed anomaly analytics: bursts, range joins, grouping sets, percentiles, deterministic sampling."""

from __future__ import annotations

from cloudpelican_lsd_spark.operators import asof as asof_ops
from cloudpelican_lsd_spark.operators import sessions as session_ops
from cloudpelican_lsd_spark.operators import stats as stats_ops
from cloudpelican_lsd_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloudpelican_lsd_spark.registry._core import (
    register,
)


# ===========================================================================
# JSON column ops (events.props — schema-on-read extraction)
# ===========================================================================


#: try_cast, not cast: schema-on-read over free-form JSON must tolerate
#: malformed values (ANSI-mode CAST aborts the whole job on one bad row;
#: try_cast → NULL, and DuckDB's TRY_CAST matches)
_JSON_K = "try_cast(get_json_object(props, '$.k') AS long)"


@register(
    "json_props_extract",
    """SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the JSON props blob (the reference keeps its
    `details` JSON opaque end-to-end; we expose it relationally)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select("event_id", F.expr(_JSON_K).alias("k_val")).where(
        F.col("k_val") >= 50
    )


@register(
    "json_props_agg",
    """SELECT event_type,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*)::BIGINT AS cnt
FROM events GROUP BY event_type""",
)
def q_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregation over events.props."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.sum(F.expr(_JSON_K)).cast("long").alias("sum_k"),
        F.count(F.lit(1)).alias("cnt"),
    )


#: shared contract of the plain and salted top-k-per-group variants —
#: ONE oracle string so the pair can never silently diverge
_TOPK3_ORACLE = """SELECT event_type, event_id, value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn <= 3"""


@register(
    "topk_per_group",
    _TOPK3_ORACLE,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (few-group variant)."""
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("event_type", "event_id", "value")
    )


@register(
    "distinct_users_per_type",
    """SELECT event_type,
       COUNT(DISTINCT user_id)::BIGINT AS n_users,
       COUNT(*)::BIGINT AS n_events
FROM events GROUP BY event_type""",
)
def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (the reference has no DISTINCT at all —
    inherited from Spark SQL).  Physical plan is the two-phase expand +
    partial agg; at 100 TB swap `count_distinct` for
    `approx_count_distinct` (HyperLogLog++, one pass, mergeable sketches)
    when ±2% error is acceptable — same query shape."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "events_asof_attribution",
    """WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
  FROM events
),
l AS (SELECT event_id, user_id, ts_epoch FROM ev WHERE event_type = 'error'),
r AS (
  SELECT user_id, ts_epoch, MAX(event_id) AS purchase_id
  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts_epoch
)
SELECT l.event_id, l.user_id, l.ts_epoch,
       r.purchase_id AS asof_purchase_id,
       r.ts_epoch AS asof_ts,
       (l.ts_epoch - r.ts_epoch) AS lag_s
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts_epoch >= r.ts_epoch""",
)
def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of-backward join: each error event attributed to the same
    user's latest at-or-before purchase (union-merge single-shuffle plan;
    see operators/asof.py).  Oracle uses DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, "events", sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_epoch"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_epoch")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    joined = asof_ops.asof_join(
        errors, purchases, keys=["user_id"], ts="ts_epoch",
        value_cols=["purchase_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_epoch",
        F.col("asof_purchase_id"),
        "asof_ts",
        (F.col("ts_epoch") - F.col("asof_ts")).alias("lag_s"),
    )


@register(
    "events_sessionize",
    f"""WITH {session_ops.sessionize_oracle(1800)}
SELECT user_id, session_idx::BIGINT AS session_idx,
       MIN(ts_epoch)::BIGINT AS start_epoch,
       MAX(ts_epoch)::BIGINT AS end_epoch,
       COUNT(*)::BIGINT AS n_events,
       (MAX(ts_epoch) - MIN(ts_epoch))::BIGINT AS duration_s,
       SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_errors
FROM sess GROUP BY user_id, session_idx""",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) — one shuffle,
    all-codegen; see operators/sessions.py for the 100 TB plan story."""
    return session_ops.sessionize(load_table(spark, "events", sf_dir))


@register(
    "topk_per_group_salted",
    _TOPK3_ORACLE,
)
def q_topk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as topk_per_group via the skew-proof salted two-phase
    plan (tail.topk_per_group_salted) — the shape that survives few-key
    windows at 100 TB."""
    from cloudpelican_lsd_spark.operators.tail import topk_per_group_salted

    return topk_per_group_salted(load_table(spark, "events", sf_dir))


# ===========================================================================
# windowed anomaly analytics, range join, grouping sets, percentiles,
# deterministic sampling (beyond-reference batch surface)
# ===========================================================================

@register(
    "stats_moving_zscore",
    """WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch FROM events
),
series AS (
  SELECT event_type, ts_epoch - (ts_epoch % 300) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ev GROUP BY 1, 2
),
framed AS (
  SELECT event_type, bucket, cnt,
         COUNT(cnt) OVER w AS n,
         CAST(SUM(cnt) OVER w AS BIGINT) AS s,
         CAST(SUM(cnt * cnt) OVER w AS BIGINT) AS ss
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)
),
calc AS (
  SELECT event_type, bucket, cnt, n,
         CAST(s AS DOUBLE) / greatest(n, 1) AS mean,
         (CAST(ss AS DOUBLE)
            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / greatest(n, 1))
           / greatest(n - 1, 1) AS var
  FROM framed
)
SELECT event_type, bucket, cnt,
       CASE WHEN n >= 10 THEN round(mean, 6) END AS mov_avg,
       CASE WHEN n >= 10 AND var > 0.0
            THEN round((CAST(cnt AS DOUBLE) - mean) / sqrt(var), 6)
       END AS zscore,
       CAST(CASE WHEN abs(CASE WHEN n >= 10 AND var > 0.0
                    THEN round((CAST(cnt AS DOUBLE) - mean) / sqrt(var), 6)
                    END) > 3.0 THEN 1 ELSE 0 END AS INTEGER) AS is_outlier
FROM calc""",
)
def q_stats_moving_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing moving-average z-score over per-type 5-min bucket counts —
    relational form of the MovingAverage/NormalDistribution analyzers
    (storm OutlierDetectionBolt.java:61-74); see stats.moving_zscore."""
    ev = load_table(spark, "events", sf_dir)
    series = ev.groupBy(
        "event_type",
        stats_ops.bucket_col("ts_epoch", 300).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return stats_ops.moving_zscore(series, keys=["event_type"])


@register(
    "events_range_join",
    """WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
  FROM events
),
e AS (SELECT event_id AS error_id, user_id, ts_epoch AS error_ts
      FROM ev WHERE event_type = 'error'),
p AS (SELECT event_id AS purchase_id, user_id, ts_epoch AS purchase_ts
      FROM ev WHERE event_type = 'purchase')
SELECT p.purchase_id, p.user_id, p.purchase_ts, e.error_id, e.error_ts,
       (p.purchase_ts - e.error_ts) AS delta_s
FROM p JOIN e
  ON p.user_id = e.user_id
 AND p.purchase_ts >= e.error_ts
 AND p.purchase_ts <= e.error_ts + 3600""",
)
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: purchases within one hour after an error by the same
    user, via the bucketized equi-join (operators/ranges.py) — compact
    (user, hour-bucket) shuffle keys, no nested-loop join."""
    from cloudpelican_lsd_spark.operators.ranges import interval_join

    ev = load_table(spark, "events", sf_dir)
    points = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_epoch").alias("purchase_ts"),
    )
    intervals = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts_epoch").alias("error_ts"),
        F.col("ts_epoch").alias("start_epoch"),
        (F.col("ts_epoch") + F.lit(3600)).alias("end_epoch"),
    )
    joined = interval_join(
        points, intervals, keys=["user_id"],
        point_ts="purchase_ts", bucket_s=3600,
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "error_id",
        "error_ts",
        (F.col("purchase_ts") - F.col("error_ts")).alias("delta_s"),
    )


@register(
    "events_rollup_day_type",
    """WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
  FROM events
),
d AS (
  SELECT event_type, ts_epoch - (ts_epoch % 86400) AS day_bucket FROM ev
)
SELECT event_type, day_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(GROUPING(event_type, day_bucket) AS INTEGER) AS gid
FROM d GROUP BY ROLLUP (event_type, day_bucket)""",
)
def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets aggregation (per type×day, per type, grand
    total) — one pass, Spark expands grouping sets inside a single hash
    aggregate; `gid` disambiguates NULL-as-total from NULL data."""
    ev = load_table(spark, "events", sf_dir)
    d = ev.select(
        "event_type",
        stats_ops.bucket_col("ts_epoch", 86400).alias("day_bucket"),
    )
    return d.rollup("event_type", "day_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().cast("int").alias("gid"),
    )


@register(
    "events_value_percentiles",
    """WITH ev AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents FROM events
)
SELECT event_type,
       round(quantile_cont(cents, 0.5), 6) AS p50,
       round(quantile_cont(cents, 0.9), 6) AS p90,
       round(quantile_cont(cents, 0.99), 6) AS p99,
       CAST(MAX(cents) AS BIGINT) AS max_cents
FROM ev GROUP BY event_type""",
)
def q_events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (integer-cents
    domain so both engines interpolate over identical inputs).  At 100 TB
    swap `percentile` for `percentile_approx` (t-digest sketch, map-side
    combinable) — exact percentile is a full sort per group."""
    ev = load_table(spark, "events", sf_dir)
    cents = ev.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return cents.groupBy("event_type").agg(
        F.round(F.expr("percentile(cents, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(cents, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(cents, 0.99)"), 6).alias("p99"),
        F.max("cents").alias("max_cents"),
    )


@register(
    "corpus_split_assign",
    """SELECT doc_id,
       CASE WHEN substr(md5(text), 1, 2) < '0d' THEN 'val'
            WHEN substr(md5(text), 1, 2) < '1a' THEN 'test'
            ELSE 'train' END AS split
FROM documents""",
)
def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val/test assignment (~5%/5%/90%)
    — the reproducible-split primitive of a training-data pipeline:
    pure per-row hashing, no shuffle, no RNG state, stable under
    re-partitioning and re-runs at any scale."""
    docs = load_table(spark, "documents", sf_dir)
    prefix = F.substring(F.md5(F.col("text").cast("binary")), 1, 2)
    return docs.select(
        "doc_id",
        F.when(prefix < "0d", "val")
        .when(prefix < "1a", "test")
        .otherwise("train")
        .alias("split"),
    )


@register(
    "events_stratified_sample",
    """WITH kept AS (
  SELECT event_type, event_id FROM events
  WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '1a'
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum
FROM kept GROUP BY event_type""",
)
def q_events_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% per-stratum sample via key-hash thresholding
    (substr(md5,1,2) < '1a' ⇒ 26/256) — unlike `sample()`, replayable
    across engines/runs; the checksum pins exact membership."""
    ev = load_table(spark, "events", sf_dir)
    kept = ev.where(
        F.substring(F.md5(F.col("event_id").cast("string").cast("binary")), 1, 2)
        < "1a"
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("event_id").alias("id_checksum"),
    )


