"""The `search <sql>` path (S10) plus Naive Bayes / perceptron classifiers and the 12-analyzer outlier battery (F8, F10)."""

from __future__ import annotations

from cloudpelican_lsd_spark.sources.tables import LOGS_ORACLE_CTE
from cloudpelican_lsd_spark.sources.tables import load_table
from cloudpelican_lsd_spark.sources.tables import logs_view
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.registry._core import (
    register,
    register_ungated,
)


# ===========================================================================
# the `search <sql>` path (S10): full relational SQL the reference delegates
# to BigQuery — here it's native.  Decimal-exact aggregation keeps the
# DuckDB hash comparison deterministic (float sums are order-dependent).
# ===========================================================================


@register(
    "search_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
       COUNT(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
)
def q_search_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary over lineitem."""
    li = load_table(spark, "lineitem", sf_dir)
    dec = "decimal(25,6)"
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(dec)).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(dec)
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "search_region_revenue",
    """SELECT r.r_name AS region_name,
       COUNT(*)::BIGINT AS order_cnt,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE o.o_orderstatus <> 'F'
GROUP BY r.r_name""",
)
def q_search_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by region through broadcast dims."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    return (
        o.where(F.col("o_orderstatus") != "F")
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "search_shipping_priority",
    """SELECT l.l_orderkey AS orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6)))
            AS DOUBLE) AS revenue,
       CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS orderdate_epoch,
       o.o_orderpriority AS orderpriority
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY 1, 3, 4
ORDER BY revenue DESC, orderkey
LIMIT 10""",
)
def q_search_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through the `search` surface (S10: arbitrary SQL is
    inherited from the engine, supervisor.go:276-351 collapses to one
    API call).  Plan notes: both date filters push to the scans; the
    orders⨝lineitem join shuffles on the key with AQE free to re-plan;
    the final top-10 needs a deterministic total order, so revenue (an
    exact DECIMAL-summed value) ties break on the unique orderkey —
    LIMIT over a non-total order would be engine-dependent row
    membership."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    return (
        li.where(F.col("l_shipdate") > F.lit("1995-03-15 00:00:00"))
        .join(
            o.where(F.col("o_orderdate") < F.lit("1995-03-15 00:00:00")),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            c.where(F.col("c_mktsegment") == "BUILDING"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate_epoch").alias("orderdate_epoch"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(25,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select("orderkey", "revenue", "orderdate_epoch", "orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


from cloudpelican_lsd_spark.operators import classifier as nb_ops  # noqa: E402


@register("naive_bayes_confusion", nb_ops.nb_confusion_oracle(LOGS_ORACLE_CTE))
def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained naive Bayes vs the heuristic labeler — confusion counts.
    The only ML operator with a full SQL oracle (see classifier.py notes)."""
    return nb_ops.train_and_classify(logs_view(spark, sf_dir))


@register("text_perceptron_step", nb_ops.perceptron_oracle())
def q_perceptron_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature perceptron training: the first two full-batch steps
    of distilling the lang-id label into a 64-bucket bag-of-words linear
    model — classifier.perceptron_step in a driver loop IS training
    (kmeans_step / bpe_merge_step structure).  Exact BIGINT weights,
    broadcastable <=65-row model, gradient agg map-side-collapsed."""
    return nb_ops.perceptron_two_steps(load_table(spark, "documents", sf_dir))


@register(
    "text_perceptron_calibration", nb_ops.perceptron_calibration_oracle(64)
)
def q_perceptron_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the distilled perceptron: per signed
    order-of-magnitude margin bin, document count and true-'en' rate —
    the calibration audit before the model gates a corpus.  No global
    sort: binning is per-row math, the report one map-side agg
    (classifier.perceptron_calibration)."""
    return nb_ops.perceptron_calibration(
        load_table(spark, "documents", sf_dir), dims=64
    )


from cloudpelican_lsd_spark.operators import outliers as outlier_ops  # noqa: E402


@register_ungated("outlier_consensus")  # rows-only: stateful numpy analyzers
def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consensus outlier scores for the newest complete 5-min bucket of each
    event-type series (OutlierDetectionBolt semantics; min_score=0 so the
    driver's rows-only check always sees one row per series)."""
    logs = logs_view(spark, sf_dir)
    series = outlier_ops.event_series(logs)
    return outlier_ops.detect_outliers(series, min_score=0.0)


#: shared series prep for the SQL-expressible analyzer twins — the same
#: drop-newest / 24h-lookback / zero-gap-fill / >=10-points pipeline
#: detect_outliers applies inside applyInPandas (OutlierDetectionBolt
#: :137-161), as DuckDB CTEs.
_OUTLIER_GRID_CTE = """series AS (
  SELECT event_type AS series_key,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 300 AS bucket,
         COUNT(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
mx AS (SELECT series_key, MAX(bucket) AS maxb FROM series GROUP BY 1),
obs AS (SELECT s.* FROM series s JOIN mx USING (series_key)
        WHERE s.bucket < mx.maxb),
bnd AS (SELECT series_key, MAX(bucket) AS ceiling FROM obs GROUP BY 1),
obs2 AS (SELECT o.*, b.ceiling FROM obs o JOIN bnd b USING (series_key)
         WHERE o.bucket >= b.ceiling - 86400),
sp AS (SELECT series_key, ceiling, MIN(bucket) AS start
       FROM obs2 GROUP BY 1, 2),
grid AS (SELECT series_key, start, ceiling,
                unnest(generate_series(start, ceiling, 300)) AS bucket
         FROM sp),
filled AS (
  SELECT g.series_key, g.start, g.ceiling, g.bucket,
         CAST(COALESCE(o.cnt, 0) AS BIGINT) AS cnt
  FROM grid g LEFT JOIN obs2 o
    ON o.series_key = g.series_key AND o.bucket = g.bucket
),
ok AS (SELECT series_key FROM filled GROUP BY 1 HAVING COUNT(*) >= 11),
f2 AS (SELECT f.* FROM filled f JOIN ok USING (series_key)),
tgt AS (SELECT series_key, bucket, cnt AS actual FROM f2
        WHERE bucket = ceiling)"""


def _analyzer_span(spark: SparkSession, sf_dir: str):
    series = outlier_ops.event_series(logs_view(spark, sf_dir))
    return outlier_ops.analyzer_span(series)


@register(
    "outlier_moving_avg",
    f"""WITH {_OUTLIER_GRID_CTE},
w12 AS (SELECT series_key, bucket, cnt,
               cnt - lag(cnt) OVER (PARTITION BY series_key ORDER BY bucket) AS d
        FROM f2 WHERE bucket < ceiling AND bucket >= ceiling - 3600),
ma AS (SELECT series_key, COUNT(*)::BIGINT AS n12,
              CAST(SUM(cnt) AS BIGINT) AS sum12,
              CAST(COALESCE(SUM(ABS(d)), 0) AS BIGINT) AS sum_ad
       FROM w12 GROUP BY 1)
SELECT t.series_key, t.bucket, t.actual, m.n12, m.sum12, m.sum_ad,
       CASE WHEN m.n12 = 1 OR m.sum_ad = 0 THEN t.actual * m.n12 <> m.sum12
            ELSE ABS(t.actual * m.n12 - m.sum12) * (m.n12 - 1)
                 > 3 * m.n12 * m.sum_ad END AS is_outlier
FROM tgt t JOIN ma m USING (series_key)""",
)
def q_outlier_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MovingAverage analyzer as exact relational algebra: last-hour mean
    forecast, 3x mean-|diff| tolerance, decided by cross-multiplied BIGINT
    comparison (outliers.moving_average_check; numpy-consistency pinned in
    tests)."""
    return outlier_ops.moving_average_check(_analyzer_span(spark, sf_dir))


@register(
    "outlier_ewma",
    f"""WITH {_OUTLIER_GRID_CTE},
eh AS (SELECT series_key, cnt,
              row_number() OVER (PARTITION BY series_key
                                 ORDER BY bucket DESC) AS j
       FROM f2 WHERE bucket < ceiling),
eh2 AS (SELECT * FROM eh WHERE j <= 8),
em AS (SELECT series_key, MAX(j)::BIGINT AS m FROM eh2 GROUP BY 1),
ew AS (SELECT h.series_key, e.m,
              CAST(SUM(h.cnt * (1::BIGINT << (e.m - h.j))) AS BIGINT) AS ewma_num
       FROM eh2 h JOIN em e USING (series_key) GROUP BY 1, 2)
SELECT t.series_key, t.bucket, t.actual, w.m, w.ewma_num,
       ((1::BIGINT << w.m) - 1)::BIGINT AS ewma_den,
       CASE WHEN w.ewma_num = 0 THEN t.actual <> 0
            ELSE ABS(t.actual * ((1::BIGINT << w.m) - 1) - w.ewma_num) * 2
                 > w.ewma_num END AS is_outlier
FROM tgt t JOIN ew w USING (series_key)""",
)
def q_outlier_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control-chart analyzer: dyadic α=1/2 exponential forecast over
    the last 8 buckets, ±50% band, decided by cross-multiplied BIGINT
    comparison (outliers.ewma_check) — the exponential twin of the
    flat-window moving-average analyzer."""
    return outlier_ops.ewma_check(_analyzer_span(spark, sf_dir))


@register(
    "outlier_seasonal_naive",
    f"""WITH {_OUTLIER_GRID_CTE},
ss AS (SELECT series_key, cnt FROM f2
       WHERE bucket < ceiling AND (ceiling - bucket) % 3600 = 0),
sm AS (SELECT series_key, COUNT(*)::BIGINT AS m FROM ss GROUP BY 1),
sr AS (SELECT series_key, cnt,
              row_number() OVER (PARTITION BY series_key
                                 ORDER BY cnt ASC) AS rn
       FROM ss),
sv AS (SELECT r.series_key, m.m, r.cnt AS seasonal_med
       FROM sr r JOIN sm m USING (series_key)
       WHERE r.rn = (m.m + 1) // 2)
SELECT t.series_key, t.bucket, t.actual, v.m, v.seasonal_med,
       (ABS(t.actual - v.seasonal_med) * 2 > v.seasonal_med + 6) AS is_outlier
FROM tgt t JOIN sv v USING (series_key)""",
)
def q_outlier_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive analyzer: lower-median of same-phase-of-hour history
    as the forecast, ±50% band + slack — the periodicity-robust twin of
    moving-average/EWMA (outliers.seasonal_naive_check)."""
    return outlier_ops.seasonal_naive_check(_analyzer_span(spark, sf_dir))


@register(
    "outlier_cusum",
    f"""WITH {_OUTLIER_GRID_CTE},
cu_hist AS (SELECT series_key, COUNT(*)::BIGINT AS n,
                   CAST(SUM(cnt) AS BIGINT) AS sum_hist
            FROM f2 WHERE bucket < ceiling GROUP BY 1),
cu_d AS (
  SELECT f.series_key, f.bucket,
         2 * h.n * f.cnt - 3 * h.sum_hist AS d
  FROM f2 f JOIN cu_hist h USING (series_key)
),
cu_p AS (
  SELECT series_key, bucket,
         SUM(d) OVER (PARTITION BY series_key ORDER BY bucket
                      ROWS UNBOUNDED PRECEDING) AS p
  FROM cu_d
),
cu_s AS (
  SELECT series_key,
         CAST(arg_max(p, bucket) AS BIGINT)
           - CAST(LEAST(0, MIN(p)) AS BIGINT) AS cusum
  FROM cu_p GROUP BY series_key
)
SELECT t.series_key, t.bucket, t.actual, h.n, h.sum_hist, s.cusum,
       (8 * h.sum_hist)::BIGINT AS threshold,
       (s.cusum > 8 * h.sum_hist) AS is_outlier
FROM tgt t JOIN cu_hist h USING (series_key) JOIN cu_s s USING (series_key)""",
)
def q_outlier_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point analyzer (Page 1954): sustained-shift
    detection via the exact prefix-sum closed form — one integer array
    fold, alarm at 4μ in 2n-scaled units (outliers.cusum_check)."""
    return outlier_ops.cusum_check(_analyzer_span(spark, sf_dir))


_MA_CASE = """CASE WHEN m.n12 = 1 OR m.sum_ad = 0 THEN t.actual * m.n12 <> m.sum12
            ELSE ABS(t.actual * m.n12 - m.sum12) * (m.n12 - 1)
                 > 3 * m.n12 * m.sum_ad END"""
_Z_CASE = """CASE WHEN z.n * z.sxx - CAST(z.sum_cnt AS HUGEINT) * z.sum_cnt = 0
            THEN z.n * t.actual <> z.sum_cnt
            ELSE CAST(z.n * t.actual - z.sum_cnt AS HUGEINT)
                   * CAST(z.n * t.actual - z.sum_cnt AS HUGEINT)
                 > 9 * (z.n * z.sxx - CAST(z.sum_cnt AS HUGEINT) * z.sum_cnt)
       END"""
_RW_CASE = """CASE WHEN r.n = 1 OR r.m * r.sum_d2 - r.sum_d * r.sum_d = 0
            THEN t.actual <> r.last_cnt
            ELSE CAST(t.actual - r.last_cnt AS HUGEINT)
                   * (t.actual - r.last_cnt) * r.m * r.m
                 > 9 * (r.m * r.sum_d2 - r.sum_d * r.sum_d)
       END"""
_EW_CASE = """CASE WHEN w.ewma_num = 0 THEN t.actual <> 0
            ELSE ABS(t.actual * ((1::BIGINT << w.m) - 1) - w.ewma_num) * 2
                 > w.ewma_num END"""


@register(
    "outlier_analyzer_consensus",
    f"""WITH {_OUTLIER_GRID_CTE},
w12 AS (SELECT series_key, bucket, cnt,
               cnt - lag(cnt) OVER (PARTITION BY series_key ORDER BY bucket) AS d
        FROM f2 WHERE bucket < ceiling AND bucket >= ceiling - 3600),
ma AS (SELECT series_key, COUNT(*)::BIGINT AS n12,
              CAST(SUM(cnt) AS BIGINT) AS sum12,
              CAST(COALESCE(SUM(ABS(d)), 0) AS BIGINT) AS sum_ad
       FROM w12 GROUP BY 1),
z AS (SELECT series_key, COUNT(*)::BIGINT AS n,
             CAST(SUM(cnt) AS BIGINT) AS sum_cnt,
             SUM(CAST(cnt AS HUGEINT) * cnt) AS sxx
      FROM f2 WHERE bucket < ceiling GROUP BY 1),
hist AS (SELECT series_key, bucket, cnt,
                cnt - lag(cnt) OVER (PARTITION BY series_key
                                     ORDER BY bucket) AS d
         FROM f2 WHERE bucket < ceiling),
rw AS (SELECT series_key, COUNT(*)::BIGINT AS n,
              arg_max(cnt, bucket)::BIGINT AS last_cnt,
              CAST(COALESCE(SUM(d), 0) AS HUGEINT) AS sum_d,
              COALESCE(SUM(CAST(d AS HUGEINT) * d), 0) AS sum_d2,
              (COUNT(*) - 1)::HUGEINT AS m
       FROM hist GROUP BY 1),
eh AS (SELECT series_key, cnt,
              row_number() OVER (PARTITION BY series_key
                                 ORDER BY bucket DESC) AS j
       FROM f2 WHERE bucket < ceiling),
eh2 AS (SELECT * FROM eh WHERE j <= 8),
em AS (SELECT series_key, MAX(j)::BIGINT AS m FROM eh2 GROUP BY 1),
ew AS (SELECT h.series_key, e.m,
              CAST(SUM(h.cnt * (1::BIGINT << (e.m - h.j))) AS BIGINT) AS ewma_num
       FROM eh2 h JOIN em e USING (series_key) GROUP BY 1, 2)
SELECT t.series_key, t.bucket, t.actual,
       {_MA_CASE} AS flag_moving_avg,
       {_Z_CASE} AS flag_zscore,
       {_RW_CASE} AS flag_random_walk,
       {_EW_CASE} AS flag_ewma,
       (CASE WHEN {_MA_CASE} THEN 1 ELSE 0 END
        + CASE WHEN {_Z_CASE} THEN 1 ELSE 0 END
        + CASE WHEN {_RW_CASE} THEN 1 ELSE 0 END
        + CASE WHEN {_EW_CASE} THEN 1 ELSE 0 END)::BIGINT AS n_flagging,
       ((CASE WHEN {_MA_CASE} THEN 1 ELSE 0 END
         + CASE WHEN {_Z_CASE} THEN 1 ELSE 0 END
         + CASE WHEN {_RW_CASE} THEN 1 ELSE 0 END
         + CASE WHEN {_EW_CASE} THEN 1 ELSE 0 END) >= 2) AS consensus
FROM tgt t
JOIN ma m USING (series_key)
JOIN z USING (series_key)
JOIN rw r USING (series_key)
JOIN ew w USING (series_key)""",
)
def q_outlier_analyzer_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact relational consensus over the four integer-exact analyzers
    (moving-avg, z-score, random-walk, EWMA): per-series votes and the
    ≥2-vote verdict — the hash-gated twin of the numpy
    `outlier_consensus` (outliers.analyzer_consensus_relational)."""
    return outlier_ops.analyzer_consensus_relational(_analyzer_span(spark, sf_dir))


@register(
    "outlier_zscore",
    f"""WITH {_OUTLIER_GRID_CTE},
z AS (SELECT series_key, COUNT(*)::BIGINT AS n,
             CAST(SUM(cnt) AS BIGINT) AS sum_cnt,
             SUM(CAST(cnt AS HUGEINT) * cnt) AS sxx
      FROM f2 WHERE bucket < ceiling GROUP BY 1)
SELECT t.series_key, t.bucket, t.actual, z.n, z.sum_cnt,
       CASE WHEN z.n * z.sxx - CAST(z.sum_cnt AS HUGEINT) * z.sum_cnt = 0
            THEN z.n * t.actual <> z.sum_cnt
            ELSE CAST(z.n * t.actual - z.sum_cnt AS HUGEINT)
                   * CAST(z.n * t.actual - z.sum_cnt AS HUGEINT)
                 > 9 * (z.n * z.sxx
                        - CAST(z.sum_cnt AS HUGEINT) * z.sum_cnt)
       END AS is_outlier
FROM tgt t JOIN z USING (series_key)""",
)
def q_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NormalDistribution (3-sigma) analyzer, exact: squared + cross-
    multiplied in DECIMAL(38,0)/HUGEINT so no float enters the decision
    (outliers.zscore_check)."""
    return outlier_ops.zscore_check(_analyzer_span(spark, sf_dir))


@register(
    "outlier_regression",
    f"""WITH {_OUTLIER_GRID_CTE},
h AS (SELECT series_key, (bucket - start) // 300 AS x, cnt
      FROM f2 WHERE bucket < ceiling),
g1 AS (SELECT series_key, COUNT(*)::BIGINT AS n,
              SUM(CAST(cnt AS HUGEINT)) AS sy,
              SUM(CAST(x * cnt AS HUGEINT)) AS sxy
       FROM h GROUP BY 1),
co AS (SELECT series_key, n,
              CAST(n AS HUGEINT) * (n*(n-1)*(2*n-1)//6)
                - CAST(n*(n-1)//2 AS HUGEINT) * (n*(n-1)//2) AS dd,
              sy * (n*(n-1)*(2*n-1)//6) - CAST(n*(n-1)//2 AS HUGEINT) * sxy AS aa,
              CAST(n AS HUGEINT) * sxy - CAST(n*(n-1)//2 AS HUGEINT) * sy AS bb
       FROM g1),
r AS (SELECT h.series_key,
             co.dd * h.cnt - (co.aa + co.bb * h.x) AS dr
      FROM h JOIN co USING (series_key)),
g2 AS (SELECT series_key, SUM(ABS(dr)) AS s1, SUM(dr * dr) AS s2
       FROM r GROUP BY 1)
SELECT t.series_key, t.bucket, t.actual, co.n,
       CASE WHEN CAST(co.n AS HUGEINT) * g2.s2 - g2.s1 * g2.s1 = 0
            THEN co.dd * t.actual - (co.aa + co.bb * co.n) <> 0
            ELSE CAST(co.n AS HUGEINT) * co.n
                   * (co.dd * t.actual - (co.aa + co.bb * co.n))
                   * (co.dd * t.actual - (co.aa + co.bb * co.n))
                 > 9 * (CAST(co.n AS HUGEINT) * g2.s2 - g2.s1 * g2.s1)
       END AS is_outlier
FROM tgt t JOIN co USING (series_key) JOIN g2 USING (series_key)""",
)
def q_outlier_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimpleRegression analyzer, exact: least-squares forecast at x=n with
    3x std(|residual|) tolerance, denominator-cleared to DECIMAL(38,0)
    integer comparisons (outliers.regression_check)."""
    return outlier_ops.regression_check(_analyzer_span(spark, sf_dir))


@register(
    "outlier_random_walk",
    f"""WITH {_OUTLIER_GRID_CTE},
hist AS (SELECT series_key, bucket, cnt,
                cnt - lag(cnt) OVER (PARTITION BY series_key
                                     ORDER BY bucket) AS d
         FROM f2 WHERE bucket < ceiling),
rw AS (SELECT series_key, COUNT(*)::BIGINT AS n,
              arg_max(cnt, bucket)::BIGINT AS last_cnt,
              CAST(COALESCE(SUM(d), 0) AS HUGEINT) AS sum_d,
              COALESCE(SUM(CAST(d AS HUGEINT) * d), 0) AS sum_d2,
              (COUNT(*) - 1)::HUGEINT AS m
       FROM hist GROUP BY 1)
SELECT t.series_key, t.bucket, t.actual, r.last_cnt,
       CASE WHEN r.n = 1 OR r.m * r.sum_d2 - r.sum_d * r.sum_d = 0
            THEN t.actual <> r.last_cnt
            ELSE CAST(t.actual - r.last_cnt AS HUGEINT)
                   * (t.actual - r.last_cnt) * r.m * r.m
                 > 9 * (r.m * r.sum_d2 - r.sum_d * r.sum_d)
       END AS is_outlier
FROM tgt t JOIN rw r USING (series_key)""",
)
def q_outlier_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RandomWalk analyzer, exact: last-value forecast with 3x std of
    consecutive diffs; sum(d) telescopes to last-first and the decision
    is DECIMAL(38,0)/HUGEINT (outliers.random_walk_check)."""
    return outlier_ops.random_walk_check(_analyzer_span(spark, sf_dir))


@register(
    "outlier_interval",
    f"""WITH {_OUTLIER_GRID_CTE},
iv AS (SELECT series_key, MIN(cnt)::BIGINT AS lo, MAX(cnt)::BIGINT AS hi
       FROM f2 WHERE bucket < ceiling GROUP BY 1)
SELECT t.series_key, t.bucket, t.actual, i.lo, i.hi,
       ABS(2 * t.actual - i.lo - i.hi)
         > (i.hi - i.lo) + GREATEST(i.hi - i.lo, 1) AS is_outlier
FROM tgt t JOIN iv i USING (series_key)""",
)
def q_outlier_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IntervalInterceptor analyzer, exact: [min, max] envelope midpoint
    with half-range + half-unit tolerance; doubling clears all fractions
    so the decision is pure BIGINT (outliers.interval_check)."""
    return outlier_ops.interval_check(_analyzer_span(spark, sf_dir))


@register(
    "outlier_iqr",
    f"""WITH {_OUTLIER_GRID_CTE},
arr AS (SELECT series_key, list_sort(list(cnt)) AS s, COUNT(*)::BIGINT AS n
        FROM f2 WHERE bucket < ceiling GROUP BY 1),
qs AS (SELECT series_key, n,
              CASE WHEN (n-1) % 4 = 0 THEN 4 * s[((n-1) // 4)::INT + 1]
                   ELSE 4 * s[((n-1) // 4)::INT + 1]
                        + ((n-1) % 4) * (s[((n-1) // 4)::INT + 2]
                                         - s[((n-1) // 4)::INT + 1]) END AS q14,
              CASE WHEN (2*(n-1)) % 4 = 0 THEN 4 * s[((2*(n-1)) // 4)::INT + 1]
                   ELSE 4 * s[((2*(n-1)) // 4)::INT + 1]
                        + ((2*(n-1)) % 4) * (s[((2*(n-1)) // 4)::INT + 2]
                                             - s[((2*(n-1)) // 4)::INT + 1]) END AS med4,
              CASE WHEN (3*(n-1)) % 4 = 0 THEN 4 * s[((3*(n-1)) // 4)::INT + 1]
                   ELSE 4 * s[((3*(n-1)) // 4)::INT + 1]
                        + ((3*(n-1)) % 4) * (s[((3*(n-1)) // 4)::INT + 2]
                                             - s[((3*(n-1)) // 4)::INT + 1]) END AS q34
       FROM arr)
SELECT t.series_key, t.bucket, t.actual,
       CAST(q.q14 AS BIGINT) AS q14, CAST(q.med4 AS BIGINT) AS med4,
       CAST(q.q34 AS BIGINT) AS q34,
       ABS(8 * t.actual - 2 * q.med4)
         > 3 * (q.q34 - q.q14) + 2 * (q.q34 - q.med4) AS is_outlier
FROM tgt t JOIN qs q USING (series_key)""",
)
def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR-envelope analyzer (the documented OneClassSVM substitution),
    exact: quarter-scaled integer order statistics make 4x the linearly
    interpolated quartiles integers, and an 8x-scaled comparison clears
    the remaining fractions (outliers.iqr_check)."""
    return outlier_ops.iqr_check(_analyzer_span(spark, sf_dir))


@register(
    "outlier_time_bucket",
    f"""WITH {_OUTLIER_GRID_CTE},
tb AS (SELECT f.series_key,
              COUNT(*) FILTER (WHERE (f.bucket // 3600) % 24
                                     = (f.ceiling // 3600) % 24)::BIGINT AS nm,
              CAST(COALESCE(SUM(f.cnt) FILTER (WHERE (f.bucket // 3600) % 24
                                     = (f.ceiling // 3600) % 24), 0)
                   AS BIGINT) AS sm,
              COALESCE(SUM(CAST(f.cnt AS HUGEINT) * f.cnt)
                       FILTER (WHERE (f.bucket // 3600) % 24
                                     = (f.ceiling // 3600) % 24),
                       0) AS sm2,
              COUNT(*)::BIGINT AS nf,
              CAST(SUM(f.cnt) AS BIGINT) AS sf,
              SUM(CAST(f.cnt AS HUGEINT) * f.cnt) AS sf2
       FROM f2 f WHERE f.bucket < f.ceiling GROUP BY 1),
pick AS (SELECT series_key, nm,
                CASE WHEN nm > 0 THEN nm ELSE nf END AS n_s,
                CASE WHEN nm > 0 THEN sm ELSE sf END AS s_s,
                CASE WHEN nm > 0 THEN sm2 ELSE sf2 END AS s2_s
         FROM tb)
SELECT t.series_key, t.bucket, t.actual, p.nm AS n_match,
       CASE WHEN p.n_s::HUGEINT * p.s2_s - p.s_s::HUGEINT * p.s_s = 0
            THEN p.n_s * t.actual <> p.s_s
            ELSE (p.n_s::HUGEINT * t.actual - p.s_s)
                   * (p.n_s::HUGEINT * t.actual - p.s_s)
                 > 9 * (p.n_s::HUGEINT * p.s2_s - p.s_s::HUGEINT * p.s_s)
       END AS is_outlier
FROM tgt t JOIN pick p USING (series_key)""",
)
def q_outlier_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimeBucketSimpleRegression analyzer, exact: 3-sigma z over the
    same-hour-of-day history subset (full history when the hour never
    recurs), cross-multiplied DECIMAL(38,0)/HUGEINT
    (outliers.time_bucket_check)."""
    return outlier_ops.time_bucket_check(_analyzer_span(spark, sf_dir))




@register(
    "outlier_mad",
    f"""WITH {_OUTLIER_GRID_CTE},
arr AS (SELECT series_key, list_sort(list(cnt)) AS s, COUNT(*)::BIGINT AS n
        FROM f2 WHERE bucket < ceiling GROUP BY 1),
m AS (SELECT series_key, n, s,
             CASE WHEN n % 2 = 1 THEN 2 * s[((n + 1) // 2)::INT]
                  ELSE s[(n // 2)::INT] + s[(n // 2 + 1)::INT] END AS med2
      FROM arr),
dv AS (SELECT series_key, n, med2,
              list_sort(list_transform(s, x -> abs(2 * x - med2))) AS d
       FROM m),
q AS (SELECT series_key, med2,
             CASE WHEN n % 2 = 1 THEN 2 * d[((n + 1) // 2)::INT]
                  ELSE d[(n // 2)::INT] + d[(n // 2 + 1)::INT] END AS mad4
      FROM dv)
SELECT t.series_key, t.bucket, t.actual,
       CAST(q.med2 AS BIGINT) AS med2, CAST(q.mad4 AS BIGINT) AS mad4,
       ABS(2 * t.actual - q.med2) * 10000 > 22239 * q.mad4 AS is_outlier
FROM tgt t JOIN q USING (series_key)""",
)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation analyzer (outliers.mad_check): the
    robust z-score — one wild history point cannot inflate its own
    tolerance, unlike every mean/stddev analyzer in the reference's
    set.  Exact 2x/4x-scaled integer medians; the 3*1.4826 cut rides
    the rational 22239/5000 so the flag is pure BIGINT."""
    return outlier_ops.mad_check(_analyzer_span(spark, sf_dir))
