"""Extended events analytics: funnels, retention, gini, key skew, z-order locality, percentile sketch audits."""

from __future__ import annotations

from cloudpelican_lsd_spark.operators import stats as stats_ops
from cloudpelican_lsd_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloudpelican_lsd_spark.registry._core import (
    register,
)




@register(
    "events_funnel_daily",
    """WITH e AS (
  SELECT user_id, event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS tse,
         CAST(floor(epoch(ts)) AS BIGINT)
           - (CAST(floor(epoch(ts)) AS BIGINT) % 86400) AS day_bucket
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
w1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' THEN tse END)
    OVER (PARTITION BY user_id, day_bucket ORDER BY tse, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_view
  FROM e
),
w2 AS (
  SELECT *, CASE WHEN event_type = 'click' AND run_view IS NOT NULL
                  AND tse > run_view THEN tse END AS click_after
  FROM w1
),
w3 AS (
  SELECT *, MIN(click_after)
    OVER (PARTITION BY user_id, day_bucket ORDER BY tse, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_click
  FROM w2
),
w4 AS (
  SELECT *, CASE WHEN event_type = 'purchase' AND run_click IS NOT NULL
                  AND tse > run_click THEN tse END AS purch_after
  FROM w3
),
ud AS (
  SELECT user_id, day_bucket,
         MIN(CASE WHEN event_type = 'view' THEN tse END) AS t_view,
         MIN(click_after) AS t_click,
         MIN(purch_after) AS t_purchase
  FROM w4 GROUP BY user_id, day_bucket
)
SELECT day_bucket,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view,
       CAST(SUM(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view_click,
       CAST(SUM(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full_funnel
FROM ud GROUP BY day_bucket""",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase, strictly
    increasing event-second, per user per day): per-day counts of
    user-days reaching each stage.  Sequential "B after A" is a running
    conditional MIN over one window spec — both funnel hops share the
    same (partition, order), so Spark plans ONE shuffle + ONE sort for
    the whole chain; the day-level re-aggregation then shuffles only
    user-day rows.  No self-joins: a join-per-hop formulation would
    re-shuffle the fact table once per funnel stage.  Non-stage events
    can never advance the funnel, so the stage-type filter is applied
    up front — it reaches the parquet scan (PushedFilters) and shrinks
    the window input.  Contract: the result has one row per day WITH
    stage activity; a day whose events are all non-stage types is absent
    rather than reported as zeros (the oracle encodes the same)."""
    from cloudpelican_lsd_spark.operators import funnel as funnel_ops

    ev = load_table(spark, "events", sf_dir).where(
        F.col("event_type").isin("view", "click", "purchase")
    )
    e = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.col("ts_epoch").alias("tse"),
        stats_ops.bucket_col("ts_epoch", 86400).alias("day_bucket"),
    )
    return funnel_ops.funnel_daily_counts(funnel_ops.funnel_stage_times(e))



@register(
    "events_grouping_sets",
    """WITH d AS (
  SELECT event_type,
         (epoch_ns(ts) // 1000000000) - ((epoch_ns(ts) // 1000000000) % 86400)
           AS day_bucket
  FROM events
)
SELECT event_type, day_bucket,
       COUNT(*)::BIGINT AS n,
       CAST(GROUPING(event_type, day_bucket) AS INT) AS gid
FROM d GROUP BY GROUPING SETS ((event_type), (day_bucket))""",
)
def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — per-type totals and per-day totals in ONE
    hash aggregate (neither is a prefix of the other, so ROLLUP/CUBE can't
    express it); `gid` = GROUPING bitmask disambiguates NULL-as-total.
    Spark expands the sets before the agg, so the input scans once and the
    shuffle carries both groupings' partials together."""
    ev = load_table(spark, "events", sf_dir)
    d = ev.select(
        "event_type",
        stats_ops.bucket_col("ts_epoch", 86400).alias("day_bucket"),
    )
    return d.groupingSets(
        [["event_type"], ["day_bucket"]], "event_type", "day_bucket"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().cast("int").alias("gid"),
    )



@register(
    "events_retention_cohorts",
    """WITH d AS (
  SELECT DISTINCT user_id,
         (epoch_ns(ts) // 1000000000)
           - ((epoch_ns(ts) // 1000000000) % 86400) AS day
  FROM events
),
first AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY user_id)
SELECT f.first_day,
       CAST((d.day - f.first_day) // 86400 AS BIGINT) AS day_offset,
       COUNT(*)::BIGINT AS n_users
FROM d JOIN first f ON f.user_id = d.user_id
GROUP BY f.first_day, day_offset""",
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-seen day, counted
    on each later active day offset — the engagement-decay view behind
    any cohort chart.  (user, day) pairs dedup in one hash agg; the
    first-seen MIN reuses that exchange's output; the cohort cell count
    keys on (first_day, offset) — three user-keyed-or-smaller shuffles
    total, nothing driver-side."""
    ev = load_table(spark, "events", sf_dir)
    d = ev.select(
        "user_id", stats_ops.bucket_col("ts_epoch", 86400).alias("day")
    ).distinct()
    first = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        d.join(first, "user_id")
        .select(
            "first_day",
            ((F.col("day") - F.col("first_day")) / 86400)
            .cast("long")
            .alias("day_offset"),
        )
        .groupBy("first_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )



@register(
    "user_day_setops_all",
    """WITH d AS (
  SELECT event_type, user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - (CAST(floor(epoch(ts)) AS BIGINT) % 86400) AS day_bucket
  FROM events
),
views  AS (SELECT user_id, day_bucket FROM d WHERE event_type = 'view'),
clicks AS (SELECT user_id, day_bucket FROM d WHERE event_type = 'click')
SELECT user_id, day_bucket, 'both_bag' AS cohort
FROM (SELECT * FROM views INTERSECT ALL SELECT * FROM clicks) t
UNION ALL
SELECT user_id, day_bucket, 'view_surplus' AS cohort
FROM (SELECT * FROM views EXCEPT ALL SELECT * FROM clicks) t""",
)
def q_user_day_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — bag (multiset) semantics, the other
    half of the set-op surface: per (user, day), min(view_n, click_n)
    rows survive the intersection and the view surplus survives the
    difference (row multiplicity is data, e.g. event-frequency
    balancing).  Spark plans both as a count-aggregate + generate
    (no row-by-row anti join); the sides stay co-partitioned on the
    full row key."""
    ev = load_table(spark, "events", sf_dir)
    d = ev.select(
        "event_type",
        "user_id",
        stats_ops.bucket_col("ts_epoch", 86400).alias("day_bucket"),
    )
    views = d.where(F.col("event_type") == "view").select(
        "user_id", "day_bucket"
    )
    clicks = d.where(F.col("event_type") == "click").select(
        "user_id", "day_bucket"
    )
    both = views.intersectAll(clicks).withColumn("cohort", F.lit("both_bag"))
    surplus = views.exceptAll(clicks).withColumn(
        "cohort", F.lit("view_surplus")
    )
    return both.unionByName(surplus)



@register(
    "events_gini_concentration",
    """WITH ux AS (
  SELECT event_type, user_id, COUNT(*)::BIGINT AS x
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY x, user_id) AS i
  FROM ux
),
g AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_users,
         CAST(SUM(x) AS BIGINT) AS total_events,
         SUM(i::HUGEINT * x) AS six
  FROM r GROUP BY 1
)
SELECT event_type, n_users, total_events,
       ROUND(CAST(2 * six - (n_users::HUGEINT + 1) * total_events AS DOUBLE)
             / CAST(n_users::HUGEINT * total_events AS DOUBLE), 6) AS gini
FROM g""",
)
def q_events_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of per-user event volume, per event type — the
    inequality audit behind "are a few power users dominating this
    signal" (and, for corpora, "does one source dominate the mixture").
    Sample Gini over ascending-sorted counts: (2·Σi·x − (n+1)·Σx)/(n·Σx)
    — exact integer numerators (tie order cannot change Σi·x within
    equal-x runs), with one final double divide rounded to 6dp.  The
    rank-weighted sum Σi·x is ~n·Σx and exceeds BIGINT at the 100 TB
    design point (1e9 users × 1e12 events ≈ 1e21), so it accumulates in
    DECIMAL(38,0) / HUGEINT per the repo's row-summed-product rule.
    One agg + one per-type rank window + one tiny agg; the ranked table
    is |users×types|, not |events|."""
    from pyspark.sql.window import Window

    d38 = "decimal(38,0)"
    ev = load_table(spark, "events", sf_dir)
    ux = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("x")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("x").asc(), F.col("user_id").asc()
    )
    ranked = ux.withColumn("i", F.row_number().over(w))
    g = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("total_events"),
        # cast BEFORE the multiply: i·x itself overflows BIGINT at scale
        F.sum(F.col("i").cast(d38) * F.col("x")).cast(d38).alias("six"),
    )
    return g.select(
        "event_type",
        "n_users",
        "total_events",
        F.round(
            (
                2 * F.col("six")
                - (F.col("n_users").cast(d38) + 1)
                * F.col("total_events").cast(d38)
            ).cast("double")
            / (
                F.col("n_users").cast(d38) * F.col("total_events").cast(d38)
            ).cast("double"),
            6,
        ).alias("gini"),
    )



@register(
    "events_rolling_wau",
    """WITH ud AS (
  SELECT DISTINCT user_id,
         (epoch_ns(ts) // 1000000000)
           - ((epoch_ns(ts) // 1000000000) % 86400) AS day
  FROM events
),
contrib AS (
  SELECT user_id, day + i * 86400 AS obs_day
  FROM ud, generate_series(0, 6) t(i)
),
spine AS (SELECT DISTINCT day AS obs_day FROM ud)
SELECT s.obs_day,
       COUNT(DISTINCT c.user_id)::BIGINT AS wau
FROM spine s JOIN contrib c ON c.obs_day = s.obs_day
GROUP BY s.obs_day""",
)
def q_events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per observed day — the WAU/DAU family.
    Spark windows can't COUNT(DISTINCT) over a RANGE frame, so the
    scalable shape is contribution-explode: each distinct (user, day)
    fans out to the ≤7 observation days it counts toward, then one
    distinct-agg per observation day.  The fan-out is bounded (×7) and
    happens AFTER the user-day dedup, so the exploded stream is
    7·|user-days|, not 7·|events|; the day spine keeps the output to
    days that actually occur."""
    ev = load_table(spark, "events", sf_dir)
    ud = ev.select(
        "user_id", stats_ops.bucket_col("ts_epoch", 86400).alias("day")
    ).distinct()
    contrib = ud.select(
        "user_id", "day", F.explode(F.expr("sequence(0, 6)")).alias("i")
    ).select("user_id", (F.col("day") + F.col("i") * 86400).alias("obs_day"))
    spine = ud.select(F.col("day").alias("obs_day")).distinct()
    return (
        contrib.join(spine, "obs_day")
        .groupBy("obs_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )



@register(
    "events_first_last_touch",
    """WITH o AS (
  SELECT user_id,
         first_value(event_type) OVER w AS first_touch,
         last_value(event_type) OVER w AS last_touch
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY epoch_ns(ts) // 1000000000, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
per_user AS (SELECT DISTINCT user_id, first_touch, last_touch FROM o)
SELECT first_touch, last_touch, COUNT(*)::BIGINT AS n_users
FROM per_user GROUP BY first_touch, last_touch""",
)
def q_events_first_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution matrix: each user's earliest
    and latest event type (first_value/last_value over one unbounded
    frame — both share the window spec, so Spark plans ONE sort per user
    partition), deduped to a user row, counted per combination.
    Tie-broken by event_id for a total order (hash-stable)."""
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    per_user = (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_touch"),
            F.last("event_type").over(w).alias("last_touch"),
        )
        .distinct()
    )
    return per_user.groupBy("first_touch", "last_touch").agg(
        F.count(F.lit(1)).alias("n_users")
    )



@register(
    "events_percentile_sketch_audit",
    stats_ops.percentile_sketch_audit_oracle((500, 900, 990)),
)
def q_events_percentile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native-sketch contract audit: Spark's percentile_approx (GK
    summaries) per event_type at p50/p90/p99, verified against exact
    rank counts — the sketch VALUE is merge-order-dependent so only the
    guaranteed rank-error bound is emitted, which the oracle asserts as
    a constant (stats.percentile_sketch_audit).  Complements the exact
    events_value_percentiles with the at-scale single-pass path."""
    return stats_ops.percentile_sketch_audit(load_table(spark, "events", sf_dir))



from cloudpelican_lsd_spark.operators import layout as layout_ops  # noqa: E402



@register("events_zorder_locality", layout_ops.zorder_locality_oracle())
def q_events_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear layout, measured: chunk the events table by the
    (day, user) linear sort and by Morton bit-interleave, report summed
    per-chunk bounding-box areas — expected chunks touched by a 2-D
    predicate, the data-skipping win Z-ordering buys at 100 TB
    (operators/layout.py; production = repartitionByRange on the
    morton key + parquet min/max stats)."""
    return layout_ops.zorder_locality_audit(load_table(spark, "events", sf_dir))



@register(
    "events_key_skew",
    """WITH per_user AS (
  SELECT event_type, user_id, COUNT(*)::BIGINT AS cnt
  FROM events GROUP BY event_type, user_id
)
SELECT event_type,
       SUM(cnt)::BIGINT AS n_rows,
       COUNT(*)::BIGINT AS n_users,
       MAX(cnt)::BIGINT AS top_user_rows,
       CAST(MAX(cnt)::HUGEINT * 1000000 // SUM(cnt) AS BIGINT)
         AS top_share_ppm
FROM per_user GROUP BY event_type""",
)
def q_events_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key skew diagnosis: for each event_type, total rows, distinct
    users, and the heaviest user's row count + exact ppm share — the
    measurement behind the salt-or-not decision for user-keyed
    shuffles (SCALING.md's skew section; topk_per_group_salted is the
    remedy this report justifies).  Two map-side-combinable aggregates,
    DECIMAL(38,0) for the ppm product (BIGINT wraps past ~9.2e12 rows
    per key, inside the 100 TB envelope)."""
    ev = load_table(spark, "events", sf_dir)
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_user.groupBy("event_type").agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_users"),
        F.max("cnt").alias("top_user_rows"),
        F.expr(
            "CAST(CAST(MAX(cnt) AS decimal(38,0)) * 1000000"
            " div SUM(cnt) AS BIGINT)"
        ).alias("top_share_ppm"),
    )



@register(
    "events_transition_matrix",
    """WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*)::BIGINT AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type""",
)
def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts over per-user event sequences: one LAG
    window (single shuffle on user_id, ordered by (ts, event_id) for a
    total order) then a tiny |types|² aggregation — the behavioral-model
    primitive next to the funnel/sessionize family.  At scale the window
    partitions by user (millions of small partitions, no single-reducer
    key) and the output is dimension-bounded."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )



@register(
    "events_burst_windows",
    """WITH counted AS (
  SELECT user_id, ts_epoch,
         COUNT(*) OVER (
           PARTITION BY user_id ORDER BY ts_epoch
           RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS n_10min
  FROM (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
        FROM events) t
)
SELECT user_id,
       MAX(n_10min)::BIGINT AS peak_burst,
       SUM(CASE WHEN n_10min >= 5 THEN 1 ELSE 0 END)::BIGINT AS n_bursty
FROM counted GROUP BY user_id""",
)
def q_events_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-10-minute burst detection per user: a RANGE frame over
    event-time seconds (value-based, so simultaneous events share one
    window — a ROWS frame would undercount ties), then per-user peak and
    bursty-row counts.  One shuffle on user_id; frame state is the
    trailing 600 s of one user's events."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts_epoch")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch")
        .rangeBetween(-600, Window.currentRow)
    )
    counted = ev.withColumn("n_10min", F.count(F.lit(1)).over(w))
    return counted.groupBy("user_id").agg(
        F.max("n_10min").alias("peak_burst"),
        F.sum((F.col("n_10min") >= 5).cast("long")).alias("n_bursty"),
    )

