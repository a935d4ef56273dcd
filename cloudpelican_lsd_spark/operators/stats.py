"""Time-series stats: bucketing, rollup, windowing, gap-fill, pivot.

Reproduces the reference's stats pipeline semantics with deterministic
integer bucket math (``ts - ts % N``):

- partial secondly buckets → minutely buckets (storm RollupStatsBolt.java:86,
  SupervisorStatsWriterBolt.java:132).  NOTE: the reference has an agg-key
  bug (RollupStatsBolt.java:87 keys by increment, not bucket); we implement
  the intended semantics — key by bucket.
- client-side re-rollup + window + zero gap-fill
  (cli/supervisorcon.go:43-119: window filter :81-83, re-bucket :86-89,
  sum :100, gap-fill :108-114); defaults window=86400s rollup=60s
  (cli/cloudpelican-lsd.go:795-798).
- dual-metric chart series: MATCH=1 / ERROR=2 (storm MetricsEnum.java:6-9)
  rendered together (cli/stats.go:59-201) → a bucket×metric pivot.

Scale notes: bucket math is pure integer column arithmetic inside codegen;
the groupBy is a single hash aggregate with map-side partial aggregation;
gap-fill joins against an exploded `sequence()` whose size is
(window/rollup) rows — tiny — and is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.functions.parse import is_likely_error

#: reference metric ids (MetricsEnum.java:6-9)
METRIC_MATCH = 1
METRIC_ERROR = 2


def bucket_col(epoch_col: str, rollup_sec: int) -> F.Column:
    """``ts - (ts % rollup)`` — the reference's bucket arithmetic
    (supervisorcon.go:86-89), deterministic for oracle hash-equality.

    Rejects rollup <= 0 at plan-build time: ``% 0`` aborts the whole job
    at runtime under ANSI mode (and `parse_duration("0")` is accepted by
    the CLI grammar, so the value can reach here from user input)."""
    if rollup_sec <= 0:
        raise ValueError(f"rollup must be positive, got {rollup_sec}")
    c = F.col(epoch_col)
    return (c - (c % F.lit(rollup_sec))).cast("long")


def metric_counts(
    logs: DataFrame,
    rollup_sec: int = 60,
    epoch_col: str = "ts_epoch",
    raw_col: str = "_raw",
) -> DataFrame:
    """`(metric, bucket, cnt)` — MATCH counts every line, ERROR counts
    heuristic-error lines (ErrorClassifierBolt.java:71-89 feed).

    NOT _spread (r8, measured): the heuristic is too cheap per row for
    input-spreading to pay — the spread's serial exchange-write stage
    costs as much as the serialized compute it removes, and post-shuffle
    row processing loses the columnar-scan codegen path (walls regressed
    ~15-50% across gapfill/pivot/chart/window_rollup/minmax in the
    stage-probe A/B).  Contrast explode-heavy consumers, where the same
    spread wins."""
    b = logs.select(
        bucket_col(epoch_col, rollup_sec).alias("bucket"),
        is_likely_error(F.col(raw_col)).alias("is_err"),
    )
    # one pass, two conditional sums, then unpivot → no second scan
    agg = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("match_cnt"),
        F.sum(F.when(F.col("is_err"), 1).otherwise(0)).cast("long").alias("err_cnt"),
    )
    return (
        agg.select(
            "bucket",
            F.expr(
                f"stack(2, {METRIC_MATCH}, match_cnt, {METRIC_ERROR}, err_cnt)"
            ).alias("metric", "cnt"),
        )
        .where(F.col("cnt") > 0)
        .select("metric", "bucket", "cnt")
    )


def rollup_window(
    stats: DataFrame,
    rollup_sec: int,
    window_sec: int | None = None,
    now_epoch: int | None = None,
) -> DataFrame:
    """Re-bucket minutely stats to an arbitrary rollup, dropping buckets
    outside the lookback window (supervisorcon.go:81-100)."""
    df = stats.withColumn("bucket", bucket_col("bucket", rollup_sec))
    if window_sec is not None and now_epoch is not None:
        df = df.where(F.col("bucket") >= F.lit(now_epoch - window_sec))
    return df.groupBy("metric", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def gap_fill(stats: DataFrame, rollup_sec: int) -> DataFrame:
    """Zero-fill missing buckets between the series min and max
    (supervisorcon.go:108-114) per metric.

    Implemented as `sequence(min,max,step)` + explode, cross-joined with the
    metric list, left-joined back — all broadcastable scalars; no driver
    collect, so the plan is identical at any scale.
    """
    if rollup_sec <= 0:
        raise ValueError(f"rollup must be positive, got {rollup_sec}")
    # ONE auxiliary agg pass derives bounds AND the metric list together
    # (a broadcast 1-row frame), so the upstream series is computed twice
    # total (aux pass + join probe), not three times — and nothing is
    # .cache()d: a cached relation per stats command would pin executor
    # storage memory for the whole session
    meta = stats.agg(
        F.min("bucket").alias("lo"),
        F.max("bucket").alias("hi"),
        F.collect_set("metric").alias("metrics"),
    )
    grid = meta.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(rollup_sec))
        ).alias("bucket"),
        "metrics",
    ).select("bucket", F.explode("metrics").alias("metric"))
    return (
        grid.join(stats, ["metric", "bucket"], "left")
        .select(
            "metric",
            "bucket",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        )
    )


def pivot_dual_series(stats: DataFrame) -> DataFrame:
    """bucket × {regular_cnt, error_cnt} — the dual-series chart feed
    (cli/stats.go:59-201 overlays metric 1 as 'o', metric 2 as '*')."""
    return stats.groupBy("bucket").agg(
        F.sum(F.when(F.col("metric") == METRIC_MATCH, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("regular_cnt"),
        F.sum(F.when(F.col("metric") == METRIC_ERROR, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("error_cnt"),
    )


def minmax_scale(stats: DataFrame) -> DataFrame:
    """Chart-scaling min/max pass (cli/stats.go:127-137)."""
    return stats.agg(
        F.min("cnt").cast("long").alias("min_cnt"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )


def chart_series(stats: DataFrame, width: int) -> DataFrame:
    """Chart data prep: keep only the newest `width` buckets per metric,
    ascending (the CLI truncates to terminal_width-1 points and renders
    buckets in ascending ts order — cli/stats.go:116-123, 97-101).

    One window ranking per metric; at scale this is a TakeOrdered per
    metric key, no full sort of the series history.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("metric").orderBy(F.col("bucket").desc())
    return (
        stats.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= width)
        .select("metric", "bucket", "cnt")
    )


def moving_zscore(
    series: DataFrame,
    keys: list[str],
    bucket: str = "bucket",
    cnt: str = "cnt",
    lookback: int = 12,
    min_points: int = 10,
) -> DataFrame:
    """Trailing moving-average z-score per series point — the relational
    form of the reference's MovingAverage / NormalDistribution analyzers
    (storm OutlierDetectionBolt.java:61-74): for each bucket, score the
    count against the mean/stddev of the previous ``lookback`` buckets
    (current bucket excluded, mirroring the skip-newest-bucket rule
    OutlierDetectionBolt.java:140-141; ``min_points`` mirrors the ≥10
    points gate :159-161).

    Determinism: mean/variance are derived from integer SUM / SUM-of-
    squares window aggregates with an explicit double-arithmetic order
    (``(ss - s*s/n)/(n-1)``) so DuckDB reproduces the exact IEEE result;
    z-scores round to 6 places before comparison.

    Scale: the input is an already-aggregated bucket series (rows ∝
    series-count × time-buckets, independent of raw data volume); one
    hash partition per series key, one per-partition sort, all codegen.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket)
        .rowsBetween(-lookback, -1)
    )
    c = F.col(cnt)
    n = F.count(c).over(w)
    s = F.sum(c).over(w)
    ss = F.sum(c * c).over(w)
    # denominators clamped to >=1 so ANSI mode can never hit x/0 (a
    # when() guard is NOT enough: codegen may evaluate the expression
    # before the branch); rows with too few points are nulled by the
    # when() below, so the clamped garbage value is never emitted.  The
    # oracle SQL uses the IDENTICAL greatest() expressions so the IEEE
    # double arithmetic matches bit-for-bit.
    nd = F.greatest(n, F.lit(1))
    n1 = F.greatest(n - F.lit(1), F.lit(1))
    mean = s.cast("double") / nd
    var = (ss.cast("double") - s.cast("double") * s.cast("double") / nd) / n1
    z = (c.cast("double") - mean) / F.sqrt(var)
    gate = n >= F.lit(max(min_points, 2))
    scored = series.select(
        *keys,
        bucket,
        cnt,
        F.when(gate, F.round(mean, 6)).alias("mov_avg"),
        F.when(gate & (var > F.lit(0.0)), F.round(z, 6)).alias("zscore"),
    )
    return scored.withColumn(
        "is_outlier",
        F.when(F.abs(F.col("zscore")) > F.lit(3.0), 1)
        .otherwise(0)
        .cast("int"),
    )


# ---------------------------------------------------------------------------
# Error-budget burn rate (multiwindow, multi-burn-rate alert — the public
# Google SRE Workbook pattern)
# ---------------------------------------------------------------------------

# One source of truth for both the Spark operator and its DuckDB oracle twin:
# a defaults drift between the two would silently fork the registered oracle
# SQL from the Spark plan for any caller that relies on defaults.
BURN_RATE_DEFAULTS = dict(
    budget_num=1,
    budget_den=1000,
    fast_sec=3600,
    slow_sec=6 * 3600,
    fast_x10=144,   # 14.4x budget over the fast window
    slow_x10=60,    # 6x budget over the slow window
)


def burn_rate(
    logs: DataFrame,
    budget_num: int = BURN_RATE_DEFAULTS["budget_num"],
    budget_den: int = BURN_RATE_DEFAULTS["budget_den"],
    fast_sec: int = BURN_RATE_DEFAULTS["fast_sec"],
    slow_sec: int = BURN_RATE_DEFAULTS["slow_sec"],
    fast_x10: int = BURN_RATE_DEFAULTS["fast_x10"],
    slow_x10: int = BURN_RATE_DEFAULTS["slow_x10"],
) -> DataFrame:
    """`(bucket, err_fast, total_fast, err_slow, total_slow, fast_burn,
    slow_burn, page)` — minutely multiwindow error-budget burn: page when
    BOTH the fast (1h @ 14.4x budget) and slow (6h @ 6x) trailing error
    ratios exceed their burn thresholds, the standard low-noise paging
    rule (short window for reset speed, long window against flapping).

    Decisions are integer-exact cross-multiplications — burn factors are
    tenths (``fast_x10``/10), so the flag is
    ``err · den · 10 > total · num · x10`` with BIGINT counts; no float
    ratio ever materializes.

    The default budget is the SRE Workbook's 0.1% example — note that a
    budget above ``10·den/x10`` makes a window's threshold exceed a 100%
    error ratio and the flag unsatisfiable, so that configuration is
    rejected loudly rather than silently never paging.

    100 TB shape: one minutely pre-aggregation (map-side combinable),
    then two trailing RANGE-frame window sums over the tiny bucket
    series — the frames scan buckets, not raw rows, so the window state
    is minutes-of-history regardless of log volume.
    """
    from pyspark.sql import Window

    from cloudpelican_lsd_spark.functions.parse import is_likely_error

    for label, x10 in (("fast", fast_x10), ("slow", slow_x10)):
        if budget_num * x10 >= budget_den * 10:
            raise ValueError(
                f"burn_rate: {label} threshold "
                f"{budget_num * x10 / (budget_den * 10):.2f} exceeds a 100% "
                "error ratio — this flag could never fire; lower the budget "
                "or the burn factor"
            )
    # NOT _spread (r8, measured): same negative result as metric_counts
    # — the heuristic is too cheap per row; the spread's serial exchange
    # write + row-path processing cost more than the serialized compute
    # they remove.
    per_min = (
        logs.select(
            bucket_col("ts_epoch", 60).alias("bucket"),
            is_likely_error(F.col("_raw")).cast("long").alias("is_err"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_err").alias("err"),
            F.count(F.lit(1)).alias("total"),
        )
    )
    w = Window.orderBy("bucket")

    def trail(col: str, sec: int):
        return F.sum(col).over(w.rangeBetween(-(sec - 60), 0))

    g = per_min.select(
        "bucket",
        trail("err", fast_sec).alias("err_fast"),
        trail("total", fast_sec).alias("total_fast"),
        trail("err", slow_sec).alias("err_slow"),
        trail("total", slow_sec).alias("total_slow"),
    )
    fast = (
        g["err_fast"] * budget_den * 10 > g["total_fast"] * budget_num * fast_x10
    )
    slow = (
        g["err_slow"] * budget_den * 10 > g["total_slow"] * budget_num * slow_x10
    )
    return g.select(
        "bucket",
        "err_fast",
        "total_fast",
        "err_slow",
        "total_slow",
        fast.alias("fast_burn"),
        slow.alias("slow_burn"),
        (fast & slow).alias("page"),
    )


def burn_rate_oracle(
    budget_num: int = BURN_RATE_DEFAULTS["budget_num"],
    budget_den: int = BURN_RATE_DEFAULTS["budget_den"],
    fast_sec: int = BURN_RATE_DEFAULTS["fast_sec"],
    slow_sec: int = BURN_RATE_DEFAULTS["slow_sec"],
    fast_x10: int = BURN_RATE_DEFAULTS["fast_x10"],
    slow_x10: int = BURN_RATE_DEFAULTS["slow_x10"],
) -> str:
    """DuckDB twin of :func:`burn_rate` over the `logs` CTE (uses the
    shared is-likely-error SQL twin)."""
    from cloudpelican_lsd_spark.functions.parse import is_likely_error_sql

    return f"""per_min AS (
  SELECT ts_epoch - ts_epoch % 60 AS bucket,
         CAST(SUM(CASE WHEN {is_likely_error_sql('_raw')} THEN 1 ELSE 0 END)
              AS BIGINT) AS err,
         COUNT(*)::BIGINT AS total
  FROM logs GROUP BY 1
),
g AS (
  SELECT bucket,
         CAST(SUM(err) OVER (ORDER BY bucket RANGE BETWEEN {fast_sec - 60}
           PRECEDING AND CURRENT ROW) AS BIGINT) AS err_fast,
         CAST(SUM(total) OVER (ORDER BY bucket RANGE BETWEEN {fast_sec - 60}
           PRECEDING AND CURRENT ROW) AS BIGINT) AS total_fast,
         CAST(SUM(err) OVER (ORDER BY bucket RANGE BETWEEN {slow_sec - 60}
           PRECEDING AND CURRENT ROW) AS BIGINT) AS err_slow,
         CAST(SUM(total) OVER (ORDER BY bucket RANGE BETWEEN {slow_sec - 60}
           PRECEDING AND CURRENT ROW) AS BIGINT) AS total_slow
  FROM per_min
)
SELECT bucket, err_fast, total_fast, err_slow, total_slow,
       err_fast * {budget_den} * 10 > total_fast * {budget_num} * {fast_x10}
         AS fast_burn,
       err_slow * {budget_den} * 10 > total_slow * {budget_num} * {slow_x10}
         AS slow_burn,
       (err_fast * {budget_den} * 10 > total_fast * {budget_num} * {fast_x10})
         AND (err_slow * {budget_den} * 10
              > total_slow * {budget_num} * {slow_x10}) AS page
FROM g"""


# ---------------------------------------------------------------------------
# approx-percentile sketch audit (rank-error contract, merge-order-proof)
# ---------------------------------------------------------------------------


def percentile_sketch_audit(
    events, percentiles=(500, 900, 990), accuracy: int = 1000
):
    """`(event_type, p_milli, n, within_bound)` — runs Spark's native
    `percentile_approx` (Greenwald-Khanna QuantileSummaries) per
    event_type and VERIFIES its documented rank-error contract against
    exact counts: some valid rank of the returned element must lie
    within ``ceil(n/accuracy) + 1`` of the target rank ``ceil(p*n)``
    (+1 absorbs the implementation's target-rank rounding).

    The returned sketch VALUE is merge-order-dependent (partial
    summaries merge in partition order), so it is deliberately NOT in
    the output — only the bound check is, which the guarantee says holds
    for every merge order.  That makes a native sketch deterministic
    enough to value-hash: the DuckDB oracle asserts the contract as a
    constant, and the gate fails if Spark's sketch ever violates it.
    All comparisons are exact integers (milli-units cleared).
    """

    parr = "array(" + ", ".join(f"{p}/1000D" for p in percentiles) + ")"
    approx = events.groupBy("event_type").agg(
        F.expr(f"percentile_approx(value, {parr}, {accuracy})").alias("avals")
    )
    per_p = approx.select(
        "event_type",
        F.posexplode("avals").alias("idx", "aval"),
    ).select(
        "event_type",
        F.element_at(
            F.array(*[F.lit(int(p)) for p in percentiles]), F.col("idx") + 1
        ).alias("p_milli"),
        "aval",
    )
    joined = events.select("event_type", "value").join(
        F.broadcast(per_p), "event_type"
    )
    counted = joined.groupBy("event_type", "p_milli").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") <= F.col("aval"), 1).otherwise(0)).alias(
            "cnt_le"
        ),
        F.sum(F.when(F.col("value") < F.col("aval"), 1).otherwise(0)).alias(
            "cnt_lt"
        ),
    )
    acc = int(accuracy)
    return counted.select(
        "event_type",
        F.col("p_milli").cast("int").alias("p_milli"),
        F.col("n").cast("long").alias("n"),
        (
            # target rank T = ceil(p*n) in milli-units; slack s = ceil(n/acc)+1;
            # rank interval [cnt_lt+1, cnt_le] must intersect [T-s, T+s]
            (
                (F.col("cnt_lt") + 1)
                <= F.expr(f"(p_milli * n + 999) div 1000 + (n + {acc - 1}) div {acc} + 1")
            )
            & (
                F.col("cnt_le")
                >= F.expr(f"(p_milli * n + 999) div 1000 - (n + {acc - 1}) div {acc} - 1")
            )
        ).alias("within_bound"),
    )


def percentile_sketch_audit_oracle(percentiles=(500, 900, 990)) -> str:
    """The guarantee itself is the oracle: per (event_type, percentile),
    exact `n` and ``within_bound = TRUE`` — any sketch violation
    hash-fails the gate."""
    plist = ", ".join(str(int(p)) for p in percentiles)
    return f"""SELECT event_type, CAST(t.p AS INT) AS p_milli,
       COUNT(*)::BIGINT AS n, TRUE AS within_bound
FROM events, unnest([{plist}]) AS t(p)
GROUP BY event_type, t.p"""


def hll_distinct_audit(events, rsd_pct: int = 2) -> DataFrame:
    """`(event_type, exact_users, within_bound)` — runs Spark's native
    `approx_count_distinct` (HyperLogLog++, relative standard deviation
    ``rsd_pct``%) per event_type and VERIFIES it against the exact
    distinct count: the estimate must land within 3·rsd (plus an absolute
    slack of 2 for tiny groups, where the sketch switches to its exact
    linear-counting regime).

    Like the GK percentile audit, the sketch VALUE is deliberately NOT in
    the output — HLL register merges are max() (order-independent), but
    no other engine can reproduce Spark's exact register hashing, so the
    hash-gated claim is the accuracy contract itself (constant TRUE in
    the oracle; a sketch regression fails the gate).  The companion
    `distinct_users_sketch` query exposes the raw estimate rows-only.
    Comparison is exact integer: |approx−exact|·100 ≤ exact·3·rsd + 200.
    """

    agg = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd_pct / 100.0).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users")) * 100
            <= F.col("exact_users") * (3 * rsd_pct) + 200
        ).alias("within_bound"),
    )


HLL_DISTINCT_AUDIT_ORACLE = """\
SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY event_type"""


def _zero_filled_counts(events, bucket_sec: int):
    """`(t, bucket, cnt)` — per-(event_type, bucket) counts zero-filled
    onto the full type × bucket grid (the common timeline every series-
    to-series statistic needs).  Shared by series_correlation and
    autocorrelation; counts collapse map-side before the one shuffle."""
    c = (
        events.select(
            F.col("event_type").alias("t"),
            (F.col("ts_epoch") - F.col("ts_epoch") % bucket_sec).alias("bucket"),
        )
        .groupBy("t", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    types = c.select("t").distinct()
    buckets = c.select("bucket").distinct()
    return (
        types.crossJoin(buckets)
        .join(c, ["t", "bucket"], "left")
        .select(
            "t",
            "bucket",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        )
    )


_D38 = "decimal(38,0)"


def _pearson_moments(grouped, x: str = "x", y: str = "y"):
    """Six exact moments for a Pearson correlation, accumulated in
    DECIMAL(38,0) — the repo's rule for row-summed squares (a BIGINT
    sum of cnt² overflows ~2^63 at 1e9-count buckets; the DuckDB twins
    use HUGEINT for the same reason)."""
    return [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(x).cast(_D38)).alias("sx"),
        F.sum(F.col(y).cast(_D38)).alias("sy"),
        F.sum(F.col(x).cast(_D38) * F.col(x)).alias("sxx"),
        F.sum(F.col(y).cast(_D38) * F.col(y)).alias("syy"),
        F.sum(F.col(x).cast(_D38) * F.col(y)).alias("sxy"),
    ]


def _pearson_corr(m):
    """Rounded Pearson r from the decimal moments; NULL on zero
    variance.  One float op per output row — every input is exact."""
    n = m["n"].cast(_D38)
    num = n * m["sxy"] - m["sx"] * m["sy"]
    dx = n * m["sxx"] - m["sx"] * m["sx"]
    dy = n * m["syy"] - m["sy"] * m["sy"]
    return F.when(
        (dx > 0) & (dy > 0),
        F.round(
            num.cast("double")
            / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))),
            6,
        ),
    )


def series_correlation(events, bucket_sec: int = 300) -> DataFrame:
    """`(type_a, type_b, n, corr)` — Pearson correlation between the
    per-`bucket_sec` count series of every event-type pair, zero-filled
    onto the common bucket grid: the "do these errors move together"
    incident-correlation table (and a mixture-health signal when keyed by
    source).

    Exactness: every moment (n, Σx, Σy, Σx², Σy², Σxy) is a DECIMAL(38,0)
    sum — associative, partition-order-free, and safe where BIGINT sums
    of squared 1e9-scale bucket counts would overflow; the only float op
    is the final single-value Pearson per pair, deterministic on
    identical integer inputs, rounded to 6.  Constant series (zero
    variance) report NULL corr on both engines.

    Scale: counts collapse map-side to |types|×|buckets| rows before the
    one shuffle; the pair join is |types|² × |buckets| — types are
    enum-bounded here; for high-cardinality keys, pre-filter to the
    top-k series first.
    """
    filled = _zero_filled_counts(events, bucket_sec)
    a = filled.select(F.col("t").alias("type_a"), "bucket", F.col("cnt").alias("x"))
    b = filled.select(F.col("t").alias("type_b"), "bucket", F.col("cnt").alias("y"))
    pairs = a.join(b, "bucket").where(F.col("type_a") < F.col("type_b"))
    m = pairs.groupBy("type_a", "type_b").agg(*_pearson_moments(pairs))
    return m.select("type_a", "type_b", "n", _pearson_corr(m).alias("corr"))


def series_correlation_oracle(bucket_sec: int = 300) -> str:
    return f"""WITH sc_c AS (
  SELECT event_type AS t,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % {bucket_sec} AS bucket,
         COUNT(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
sc_grid AS (
  SELECT t, bucket FROM (SELECT DISTINCT t FROM sc_c),
                        (SELECT DISTINCT bucket FROM sc_c)
),
sc_f AS (
  SELECT g.t, g.bucket, COALESCE(c.cnt, 0)::BIGINT AS cnt
  FROM sc_grid g LEFT JOIN sc_c c ON c.t = g.t AND c.bucket = g.bucket
),
sc_m AS (
  SELECT a.t AS type_a, b.t AS type_b, COUNT(*)::HUGEINT AS n,
         SUM(a.cnt::HUGEINT) AS sx, SUM(b.cnt::HUGEINT) AS sy,
         SUM(a.cnt::HUGEINT * a.cnt) AS sxx,
         SUM(b.cnt::HUGEINT * b.cnt) AS syy,
         SUM(a.cnt::HUGEINT * b.cnt) AS sxy
  FROM sc_f a JOIN sc_f b ON a.bucket = b.bucket AND a.t < b.t
  GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN ROUND((n * sxy - sx * sy)::DOUBLE
                       / (sqrt((n * sxx - sx * sx)::DOUBLE)
                          * sqrt((n * syy - sy * sy)::DOUBLE)), 6)
       END AS corr
FROM sc_m"""


def autocorrelation(events, bucket_sec: int = 300, max_lag: int = 3) -> DataFrame:
    """`(event_type, lag, n, corr)` — lag-1..`max_lag` autocorrelation of
    each event type's zero-filled per-bucket count series: the
    periodicity/burstiness probe (high lag-k ⇒ k·bucket_sec cycles; ~0
    everywhere ⇒ Poisson-like arrivals) that tells an alerting config
    which analyzer family fits the stream.

    Same exactness discipline as series_correlation (shared
    `_pearson_moments` / `_pearson_corr`: DECIMAL(38,0) moments, one
    rounded float per output row, NULL on zero variance); the series
    joins to itself shifted by lag·bucket_sec — an equi-join repeated
    per lag (`max_lag` small) on the shared zero-filled grid.
    """
    filled = _zero_filled_counts(events, bucket_sec)
    lags = filled.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = filled.select(F.col("t"), "bucket", F.col("cnt").alias("x"))
    b = filled.select(F.col("t"), F.col("bucket").alias("b2"), F.col("cnt").alias("y"))
    j = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("b2", F.col("bucket") + F.col("lag") * bucket_sec)
        .join(b, ["t", "b2"])
    )
    m = j.groupBy("t", "lag").agg(*_pearson_moments(j))
    return m.select(
        F.col("t").alias("event_type"), "lag", "n", _pearson_corr(m).alias("corr")
    )


def autocorrelation_oracle(bucket_sec: int = 300, max_lag: int = 3) -> str:
    return f"""WITH ac_c AS (
  SELECT event_type AS t,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % {bucket_sec} AS bucket,
         COUNT(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
ac_f AS (
  SELECT g.t, g.bucket, COALESCE(c.cnt, 0)::BIGINT AS cnt
  FROM (SELECT t, bucket FROM (SELECT DISTINCT t FROM ac_c),
                              (SELECT DISTINCT bucket FROM ac_c)) g
  LEFT JOIN ac_c c ON c.t = g.t AND c.bucket = g.bucket
),
ac_m AS (
  SELECT a.t, l.lag, COUNT(*)::HUGEINT AS n,
         SUM(a.cnt::HUGEINT) AS sx, SUM(b.cnt::HUGEINT) AS sy,
         SUM(a.cnt::HUGEINT * a.cnt) AS sxx,
         SUM(b.cnt::HUGEINT * b.cnt) AS syy,
         SUM(a.cnt::HUGEINT * b.cnt) AS sxy
  FROM ac_f a
  CROSS JOIN (SELECT unnest(generate_series(1, {max_lag}))::BIGINT AS lag) l
  JOIN ac_f b ON b.t = a.t AND b.bucket = a.bucket + l.lag * {bucket_sec}
  GROUP BY 1, 2
)
SELECT t AS event_type, lag, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN ROUND((n * sxy - sx * sy)::DOUBLE
                       / (sqrt((n * sxx - sx * sx)::DOUBLE)
                          * sqrt((n * syy - sy * sy)::DOUBLE)), 6)
       END AS corr
FROM ac_m"""
