"""Time-series outlier detection — consensus of analyzers per series.

Rebuilds the reference's outlier stage (storm .../OutlierDetectionBolt.java):
per-filter count series at 5-minute buckets over a 24h lookback with the
newest bucket excluded (:137-141), at least 10 points required (:159-161),
one forecast period (:174), and a consensus score across the analyzer
list (:61-74, from the external `nl.us2.timeseriesoutlierdetection` lib —
Noop, NormalDistribution, LogNormalDistribution, SimpleRegression,
MovingAverage, PolynomialRegression, IntervalInterceptor,
RandomWalkRegression, OneClassSVM, TimeBucketSimpleRegression,
MultipleLinearRegression, SimpleExponentialSmoothing).

Spark shape: the bucket aggregation is a plain groupBy; the per-series
model fitting runs in ``applyInPandas`` keyed by series — Arrow-batched,
one pandas frame per series, embarrassingly parallel across series.  Each
analyzer is a deterministic numpy port (no RNG, no SVM — OneClassSVM is
replaced by an IQR envelope, documented divergence) producing an
(expected, tolerance) forecast for the target bucket; the score is the
fraction of analyzers whose tolerance band the actual value escapes.

At 100 TB the input to applyInPandas is already reduced to
(series × buckets) — 288 points per series-day — so state per group is
tiny regardless of raw data volume; skew across series is handled by AQE.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKET_SEC = 300  # OutlierDetectionBolt.java:137
LOOKBACK_SEC = 86400  # :139
MIN_POINTS = 10  # :159-161

OUTLIER_SCHEMA = T.StructType(
    [
        T.StructField("series_key", T.StringType(), False),
        T.StructField("bucket", T.LongType(), False),
        T.StructField("actual", T.DoubleType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("details", T.StringType(), False),
    ]
)


# --- analyzers: fit on history, forecast (expected, tolerance) for target --


def _normal_dist(hist: np.ndarray) -> tuple[float, float]:
    mu = float(hist.mean())
    sd = float(hist.std(ddof=0))
    return mu, 3.0 * sd


def _log_normal_dist(hist: np.ndarray) -> tuple[float, float]:
    lh = np.log1p(np.clip(hist, 0, None))
    mu, sd = float(lh.mean()), float(lh.std(ddof=0))
    return float(np.expm1(mu)), float(np.expm1(mu + 3.0 * sd) - np.expm1(mu))


def _moving_average(hist: np.ndarray) -> tuple[float, float]:
    w = hist[-12:]  # last hour of 5-min buckets
    resid = float(np.abs(np.diff(w)).mean()) if len(w) > 1 else 0.0
    return float(w.mean()), 3.0 * resid


def _simple_regression(hist: np.ndarray) -> tuple[float, float]:
    x = np.arange(len(hist), dtype=float)
    coef = np.polyfit(x, hist, 1)
    fit = np.polyval(coef, x)
    resid = float(np.abs(hist - fit).std(ddof=0))
    return float(np.polyval(coef, len(hist))), 3.0 * resid


def _poly_regression(hist: np.ndarray) -> tuple[float, float]:
    x = np.arange(len(hist), dtype=float)
    coef = np.polyfit(x, hist, 2)
    fit = np.polyval(coef, x)
    resid = float(np.abs(hist - fit).std(ddof=0))
    return float(np.polyval(coef, len(hist))), 3.0 * resid


def _exp_smoothing(hist: np.ndarray, alpha: float = 0.3) -> tuple[float, float]:
    s = hist[0]
    errs = []
    for v in hist[1:]:
        errs.append(abs(v - s))
        s = alpha * v + (1 - alpha) * s
    resid = float(np.mean(errs)) if errs else 0.0
    return float(s), 3.0 * resid


def _interval_interceptor(hist: np.ndarray) -> tuple[float, float]:
    lo, hi = float(hist.min()), float(hist.max())
    mid = (lo + hi) / 2.0
    return mid, (hi - lo) / 2.0 + 0.5 * max(hi - lo, 1.0)


def _random_walk(hist: np.ndarray) -> tuple[float, float]:
    diffs = np.diff(hist)
    sd = float(diffs.std(ddof=0)) if len(diffs) else 0.0
    return float(hist[-1]), 3.0 * sd


def _time_bucket_regression(
    hist: np.ndarray, buckets: np.ndarray, target_bucket: int
) -> tuple[float, float]:
    """Hour-of-day seasonal mean (TimeBucketSimpleRegression analog)."""
    hours = (buckets // 3600) % 24
    th = (target_bucket // 3600) % 24
    mask = hours == th
    sel = hist[mask] if mask.any() else hist
    return float(sel.mean()), 3.0 * float(sel.std(ddof=0))


def _iqr_envelope(hist: np.ndarray) -> tuple[float, float]:
    """Deterministic stand-in for the OneClassSVM analyzer (divergence:
    no SVM dependency; an IQR fence is the standard robust envelope)."""
    q1, q3 = np.percentile(hist, [25, 75])
    med = float(np.median(hist))
    return med, float(q3 - q1) * 1.5 + (q3 - med)


def _noop(hist: np.ndarray) -> tuple[float, float]:
    """Noop analyzer: accepts everything — its role is diluting the
    consensus denominator exactly as the reference's Noop entry does
    (OutlierDetectionBolt.java:62)."""
    return float(hist.mean()), float("inf")


def _multiple_linear_regression(
    hist: np.ndarray, buckets: np.ndarray, target_bucket: int
) -> tuple[float, float]:
    """Least-squares fit on [1, t, sin(hour), cos(hour)] — trend plus
    daily seasonality (MultipleLinearRegression analog)."""
    t = (buckets - buckets[0]).astype(float)
    hour = ((buckets // 3600) % 24).astype(float) * (2.0 * np.pi / 24.0)
    X = np.column_stack([np.ones_like(t), t, np.sin(hour), np.cos(hour)])
    coef, *_ = np.linalg.lstsq(X, hist, rcond=None)
    resid = float(np.abs(hist - X @ coef).std(ddof=0))
    tt = float(target_bucket - buckets[0])
    th = ((target_bucket // 3600) % 24) * (2.0 * np.pi / 24.0)
    expected = float(
        np.array([1.0, tt, np.sin(th), np.cos(th)]) @ coef
    )
    return expected, 3.0 * resid


#: 12 analyzers — same count and roles as the reference list
#: (OutlierDetectionBolt.java:61-74); OneClassSVM → iqr_envelope is the
#: one documented substitution.
#:
#: SEVEN have exact relational twins with full DuckDB value-hash oracles
#: (moving_average, normal_dist/zscore, simple_regression, random_walk,
#: interval_interceptor, time_bucket_regression, iqr_envelope — see the
#: *_check functions below).  The remaining five are NOT oracle-twinnable
#: and stay numpy-only inside the consensus: log_normal_dist and
#: multiple_linear_regression need transcendentals (ln / sin) that are
#: not bit-identical across engines; poly_regression's
#: denominator-cleared residuals overflow DECIMAL(38,0) (the 3x3
#: Vandermonde determinant scales residuals by ~n^5); exp_smoothing's
#: exact rational state grows as 10^n over a 288-point history; noop
#: never flags by construction (its role is diluting the consensus
#: denominator).
#:
#: The registry is the §2.10 extension
#: point (the reference's compiled-in ITimeserieAnalyzer list):
#: `register_analyzer` plugs any (hist [, buckets, target]) -> (expected,
#: tolerance) callable into the consensus.
_SEASONAL = {"time_bucket_regression", "multiple_linear_regression"}

ANALYZER_REGISTRY: dict = {}


def register_analyzer(name: str, fn, seasonal: bool = False) -> None:
    """Add/replace a consensus analyzer.  `seasonal` analyzers receive
    (hist, buckets, target_bucket); plain ones receive (hist).

    On a real cluster, register at import time of a module shipped to
    executors (--py-files) so the registry exists inside applyInPandas
    workers, not just on the driver."""
    ANALYZER_REGISTRY[name] = fn
    if seasonal:
        _SEASONAL.add(name)


for _n in (
    "noop",
    "normal_dist",
    "log_normal_dist",
    "moving_average",
    "simple_regression",
    "poly_regression",
    "exp_smoothing",
    "interval_interceptor",
    "random_walk",
    "time_bucket_regression",
    "multiple_linear_regression",
    "iqr_envelope",
):
    ANALYZER_REGISTRY[_n] = globals()[f"_{_n}"]

ANALYZERS = tuple(ANALYZER_REGISTRY)


def score_last_bucket(
    buckets: np.ndarray, counts: np.ndarray
) -> tuple[float, dict] | None:
    """Consensus-score the newest *complete* bucket against its history."""
    if len(buckets) < MIN_POINTS + 1:
        return None
    hist, target = counts[:-1].astype(float), float(counts[-1])
    flags = {}
    for name, fn in ANALYZER_REGISTRY.items():
        if name in _SEASONAL:
            expected, tol = fn(hist, buckets[:-1], int(buckets[-1]))
        else:
            expected, tol = fn(hist)
        tol = max(tol, 1e-9)
        flags[name] = bool(abs(target - expected) > tol)
    score = sum(flags.values()) / len(flags)
    return score, flags


def detect_outliers(
    stats: DataFrame,
    series_col: str = "series_key",
    bucket_col: str = "bucket",
    cnt_col: str = "cnt",
    min_score: float = 0.5,
    bucket_sec: int = BUCKET_SEC,
    now_epoch: int | None = None,
) -> DataFrame:
    """`(series_key, bucket, actual, score, details)` for the newest
    complete bucket of each series whose consensus score >= min_score.

    Input: a bucketed count series, e.g. from stats.metric_counts keyed by
    (filter, metric).  The 24h lookback / newest-bucket-exclusion of the
    reference is applied inside the group function.

    ``bucket_sec`` MUST match the series' bucket width: the zero gap-fill
    materializes the grid at this spacing, and a finer input grid would
    silently collapse (several input buckets mapping to one slot).
    ``now_epoch`` (optional) anchors the analysis window to wall clock:
    buckets in the still-filling current bucket are dropped and the fill
    extends to the newest COMPLETE bucket even when the series went dark
    — a trailing traffic-drop-to-zero then scores as the zero it is
    instead of never materializing.  Without it (static/backtest data)
    the newest observed bucket plays the still-filling role, matching
    the reference's data-driven behavior.
    """

    def analyze(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col)
        buckets = pdf[bucket_col].to_numpy()
        counts = pdf[cnt_col].to_numpy()
        # 24h lookback ending at the newest bucket, which itself is still
        # filling and therefore excluded as the reference does (:140-141):
        # the *target* is the newest complete bucket (index -2 overall).
        if now_epoch is not None:
            cur = (now_epoch // bucket_sec) * bucket_sec
            live = buckets < cur
            buckets, counts = buckets[live], counts[live]
            if len(buckets) == 0:
                return pd.DataFrame(columns=[f.name for f in OUTLIER_SCHEMA])
            ceiling = cur - bucket_sec
        else:
            if len(buckets) < 2:
                return pd.DataFrame(columns=[f.name for f in OUTLIER_SCHEMA])
            buckets, counts = buckets[:-1], counts[:-1]
            ceiling = int(buckets[-1])
        lo = ceiling - LOOKBACK_SEC
        mask = buckets >= lo
        buckets, counts = buckets[mask], counts[mask]
        if len(buckets) == 0:
            return pd.DataFrame(columns=[f.name for f in OUTLIER_SCHEMA])
        # zero gap-fill over the observed range (≤ 288 buckets): count
        # series only materialize buckets with events, so without the
        # fill a traffic-drop-to-zero is invisible (the outage bucket
        # simply doesn't exist) and analyzer baselines are biased high
        if len(buckets) >= 1 and ceiling > buckets[0]:
            full = np.arange(buckets[0], ceiling + 1, bucket_sec)
            filled = np.zeros(len(full), dtype=counts.dtype)
            filled[((buckets - buckets[0]) // bucket_sec).astype(int)] = counts
            buckets, counts = full, filled
        res = score_last_bucket(buckets, counts)
        if res is None:
            return pd.DataFrame(columns=[f.name for f in OUTLIER_SCHEMA])
        score, flags = res
        if score < min_score:
            return pd.DataFrame(columns=[f.name for f in OUTLIER_SCHEMA])
        return pd.DataFrame(
            [
                {
                    "series_key": str(pdf[series_col].iloc[0]),
                    "bucket": int(buckets[-1]),
                    "actual": float(counts[-1]),
                    "score": float(score),
                    "details": json.dumps(flags, sort_keys=True),
                }
            ]
        )

    return stats.groupBy(series_col).applyInPandas(analyze, OUTLIER_SCHEMA)


def event_series(logs: DataFrame, bucket_sec: int = BUCKET_SEC) -> DataFrame:
    """Per-event-type 5-min count series (the per-filter series analog).
    Bucket math via stats.bucket_col — one definition, and its
    rollup-positive guard (ANSI `% 0` aborts at runtime)."""
    from cloudpelican_lsd_spark.operators.stats import bucket_col

    return (
        logs.groupBy(
            F.col("event_type").alias("series_key"),
            bucket_col("ts_epoch", bucket_sec).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Relational analyzer twins (oracle-checkable, integer-exact)
#
# Three of the reference's analyzers (OutlierDetectionBolt.java:123-182 via
# nl.us2.timeseriesoutlierdetection) have SQL-expressible math: MovingAverage,
# NormalDistribution (z-score), SimpleRegression.  These builders recompute
# the SAME decision the numpy analyzers make — same series prep (drop newest
# observed bucket, 24h lookback, zero gap-fill, >=10 points) — but as pure
# DataFrame algebra with CROSS-MULTIPLIED INTEGER comparisons, so the flag is
# bit-reproducible in DuckDB and hash-gateable (floats never enter the
# predicate; products accumulate in DECIMAL(38,0) = DuckDB HUGEINT).
# Consistency with the numpy path is pinned in tests.
# ---------------------------------------------------------------------------


def analyzer_span(
    series: DataFrame,
    bucket_sec: int = BUCKET_SEC,
    lookback: int = LOOKBACK_SEC,
    min_points: int = MIN_POINTS,
) -> DataFrame:
    """Relational twin of detect_outliers' per-series prep — ONE ROW PER
    SERIES: drop the newest (still-filling) observed bucket, trim to the
    lookback ending at the new ceiling, and zero gap-fill into an ordered
    history array.  Columns: (series_key, start, ceiling, n, actual,
    cnts) with ``cnts[i]`` the count at ``start + i*bucket_sec`` and
    ``actual`` the count at the target bucket (= ceiling).

    100 TB plan shape — ONE scan, TWO shuffles, ZERO joins, and every
    analyzer check below is a per-row projection on this single pipeline
    (no fan-out that would re-evaluate the scan).  Per-series state is
    bounded at lookback/bucket_sec (= 288) array slots regardless of raw
    volume, so the collect_list and the interpreted higher-order
    functions downstream cost O(series), not O(data)."""
    from pyspark.sql import Window

    w = Window.partitionBy("series_key")
    obs = (
        series.withColumn("maxb", F.max("bucket").over(w))
        # newest observed bucket is still filling → excluded (ref :140-141)
        .where(F.col("bucket") < F.col("maxb"))
        .withColumn("ceiling", F.max("bucket").over(w))
        .where(F.col("bucket") >= F.col("ceiling") - F.lit(lookback))
    )
    # one row per series: ≤289 (bucket,cnt) points + bounds; partitioning
    # from the window chain is reused — no third exchange
    span = obs.groupBy("series_key").agg(
        F.min("bucket").alias("start"),
        F.first("ceiling").alias("ceiling"),
        F.map_from_entries(F.collect_list(F.struct("bucket", "cnt"))).alias("pts"),
    )
    span = span.where(
        (F.col("ceiling") - F.col("start")) / bucket_sec + 1 >= min_points + 1
    )
    b = int(bucket_sec)
    return span.select(
        "series_key",
        "start",
        "ceiling",
        F.expr(
            f"transform(sequence(start, ceiling - {b}, {b}),"
            " b -> coalesce(element_at(pts, b), 0L))"
        ).alias("cnts"),
        F.expr("coalesce(element_at(pts, ceiling), 0L)").alias("actual"),
    ).withColumn("n", F.size("cnts").cast("long"))


def analyzer_grid(
    series: DataFrame,
    bucket_sec: int = BUCKET_SEC,
    lookback: int = LOOKBACK_SEC,
    min_points: int = MIN_POINTS,
) -> DataFrame:
    """Exploded (series_key, start, ceiling, bucket, cnt) view of
    `analyzer_span` — the gap-filled grid, for tests and ad-hoc SQL."""
    b = int(bucket_sec)
    span = analyzer_span(series, bucket_sec, lookback, min_points)
    return span.select(
        "series_key",
        "start",
        "ceiling",
        F.posexplode(
            F.expr(f"array_append(cnts, actual)")
        ).alias("i", "cnt"),
    ).select(
        "series_key",
        "start",
        "ceiling",
        (F.col("start") + F.col("i") * b).cast("long").alias("bucket"),
        F.col("cnt").cast("long").alias("cnt"),
    )


def moving_average_check(span: DataFrame, bucket_sec: int = BUCKET_SEC) -> DataFrame:
    """MovingAverage analyzer, exact: expected = mean of the last-hour
    window (12 buckets), tolerance = 3 * mean(|consecutive diff|); flag via
    |actual*n12 - sum12| * (n12-1) > 3 * n12 * sum_absdiff — pure BIGINT,
    computed per series row from the history array (no joins, no second
    pass)."""
    s = span.select(
        "series_key",
        F.col("ceiling").alias("bucket"),
        "actual",
        F.expr("slice(cnts, greatest(size(cnts) - 11, 1), 12)").alias("w12"),
    ).select(
        "series_key",
        "bucket",
        "actual",
        F.size("w12").cast("long").alias("n12"),
        F.expr("aggregate(w12, 0L, (a, x) -> a + x)").alias("sum12"),
        F.expr(
            "aggregate(w12, named_struct('p', CAST(NULL AS BIGINT), 's', 0L),"
            " (a, x) -> named_struct('p', x, 's',"
            "   a.s + CASE WHEN a.p IS NULL THEN 0L ELSE abs(x - a.p) END)).s"
        ).alias("sum_ad"),
    )
    return s.select(
        "series_key",
        "bucket",
        "actual",
        "n12",
        "sum12",
        "sum_ad",
        F.when(
            (F.col("n12") == 1) | (F.col("sum_ad") == 0),
            F.col("actual") * F.col("n12") != F.col("sum12"),
        )
        .otherwise(
            F.abs(F.col("actual") * F.col("n12") - F.col("sum12"))
            * (F.col("n12") - 1)
            > 3 * F.col("n12") * F.col("sum_ad")
        )
        .alias("is_outlier"),
    )


def zscore_check(span: DataFrame) -> DataFrame:
    """NormalDistribution analyzer, exact: |actual - mean| > 3*sd(pop)
    squared and cross-multiplied — (n*actual - sum)^2 > 9*(n*sumsq - sum^2)
    in DECIMAL(38,0) (DuckDB HUGEINT); one projection per series row."""
    d38 = "decimal(38,0)"
    s = span.select(
        "series_key",
        F.col("ceiling").alias("bucket"),
        "actual",
        "n",
        F.expr("aggregate(cnts, 0L, (a, x) -> a + x)").alias("sum_cnt"),
        F.expr(
            "aggregate(cnts, CAST(0 AS DECIMAL(38,0)),"
            " (a, x) -> CAST(a + CAST(x AS DECIMAL(38,0)) * x AS DECIMAL(38,0)))"
        ).alias("sxx"),
    )
    dd = (F.col("n") * F.col("actual") - F.col("sum_cnt")).cast(d38)
    var9 = 9 * (
        F.col("n").cast(d38) * F.col("sxx")
        - F.col("sum_cnt").cast(d38) * F.col("sum_cnt").cast(d38)
    )
    return s.select(
        "series_key",
        "bucket",
        "actual",
        "n",
        "sum_cnt",
        F.when(var9 == 0, F.col("n") * F.col("actual") != F.col("sum_cnt"))
        .otherwise(dd * dd > var9)
        .alias("is_outlier"),
    )


def regression_check(span: DataFrame) -> DataFrame:
    """SimpleRegression analyzer, exact: least-squares line over the
    gap-filled history (x = bucket index), forecast at x = n, tolerance =
    3 * std(|residual|).  Everything is cleared of the rational
    denominator D = n*Sxx - Sx^2, so the flag compares DECIMAL(38,0)
    integers: n^2*(D*actual - A - B*n)^2 > 9*(n*S2 - S1^2) with
    S1 = sum|D*r_i|, S2 = sum (D*r_i)^2.  The moment sums AND the
    residual folds all run over the per-row history array, so the whole
    check stays one linear plan — no join, no second pass over the
    data.

    Numeric domain: clearing the denominator scales residuals by
    D ≈ n^4/12 ≈ 5.7e8 at the 288-slot grid, so the DECIMAL(38,0)
    accumulators are exact for per-bucket counts up to ~5e7.  Beyond
    that the check FAILS LOUDLY (assert_true) instead of silently
    nulling the flag — matching the oracle, whose HUGEINT errors rather
    than wraps; series hotter than 5e7 events per 5-minute bucket should
    be pre-aggregated to coarser buckets or count-scaled upstream."""
    d38 = "decimal(38,0)"
    # the assert must live INSIDE a consumed expression (a dropped column
    # gets pruned before it ever evaluates): assert_true yields NULL on
    # success, so the WHEN wrapper passes `ceiling` through unchanged on
    # every legal row and aborts loudly on the first out-of-domain one
    domain_ok = F.assert_true(
        F.expr("aggregate(cnts, actual, (a, x) -> greatest(a, x)) < 50000000"),
        F.lit(
            "regression_check: per-bucket count >= 5e7 exceeds the exact"
            " DECIMAL(38,0) domain; pre-aggregate or scale the series"
        ),
    )
    g = span.select(
        "series_key",
        (F.col("ceiling") + F.coalesce(domain_ok.cast("long"), F.lit(0)))
        .alias("bucket"),
        "actual",
        "n",
        "cnts",
        F.expr(
            "aggregate(cnts, CAST(0 AS DECIMAL(38,0)),"
            " (a, x) -> CAST(a + x AS DECIMAL(38,0)))"
        ).alias("sy"),
        F.expr(
            "aggregate(cnts,"
            " named_struct('i', 0L, 's', CAST(0 AS DECIMAL(38,0))),"
            " (a, x) -> named_struct('i', a.i + 1L,"
            "   's', CAST(a.s + CAST(a.i AS DECIMAL(38,0)) * x AS DECIMAL(38,0)))).s"
        ).alias("sxy"),
    )
    n = F.col("n").cast(d38)
    sx = F.expr("CAST(n * (n - 1) DIV 2 AS DECIMAL(38,0))")
    sxx = F.expr("CAST(n * (n - 1) * (2 * n - 1) DIV 6 AS DECIMAL(38,0))")
    co = (
        g.withColumn("dd", n * sxx - sx * sx)
        .withColumn("aa", F.col("sy") * sxx - sx * F.col("sxy"))
        .withColumn("bb", n * F.col("sxy") - sx * F.col("sy"))
    )
    # fold |D*r| and (D*r)^2 over the history in one pass; dd/aa/bb are
    # outer columns, legal inside the lambda
    folded = co.withColumn(
        "rsum",
        F.expr(
            "aggregate(cnts,"
            " named_struct('i', CAST(0 AS DECIMAL(38,0)),"
            "              's1', CAST(0 AS DECIMAL(38,0)),"
            "              's2', CAST(0 AS DECIMAL(38,0))),"
            " (a, x) -> named_struct("
            "   'i', CAST(a.i + 1 AS DECIMAL(38,0)),"
            "   's1', CAST(a.s1 + abs(dd * CAST(x AS DECIMAL(38,0))"
            "                         - (aa + bb * a.i)) AS DECIMAL(38,0)),"
            "   's2', CAST(a.s2 + (dd * CAST(x AS DECIMAL(38,0))"
            "                      - (aa + bb * a.i))"
            "                   * (dd * CAST(x AS DECIMAL(38,0))"
            "                      - (aa + bb * a.i)) AS DECIMAL(38,0))))"
        ),
    )
    nn = F.col("n").cast(d38)
    delta = F.col("dd") * F.col("actual").cast(d38) - (
        F.col("aa") + F.col("bb") * nn
    )
    sigma2 = nn * F.col("rsum.s2") - F.col("rsum.s1") * F.col("rsum.s1")
    return folded.select(
        "series_key",
        "bucket",
        "actual",
        "n",
        F.when(sigma2 == 0, delta != 0)
        .otherwise(nn * nn * delta * delta > 9 * sigma2)
        .alias("is_outlier"),
    )


def random_walk_check(span: DataFrame) -> DataFrame:
    """RandomWalk analyzer, exact: expected = last history value,
    tolerance = 3 * std(consecutive diffs, population).  With m = n-1
    diffs, sd² = (m·Σd² − (Σd)²)/m² and Σd telescopes to last − first,
    so the flag is Δ²·m² > 9·(m·Σd² − (Σd)²) in DECIMAL(38,0) — only the
    Σd² fold walks the array; everything else is endpoint arithmetic."""
    d38 = "decimal(38,0)"
    s = span.select(
        "series_key",
        F.col("ceiling").alias("bucket"),
        "actual",
        "n",
        F.element_at("cnts", -1).alias("last_cnt"),
        (F.element_at("cnts", -1) - F.element_at("cnts", 1)).alias("sum_d"),
        F.expr(
            "aggregate(cnts,"
            " named_struct('p', CAST(NULL AS BIGINT),"
            "              's', CAST(0 AS DECIMAL(38,0))),"
            " (a, x) -> named_struct('p', x,"
            "   's', CAST(a.s + CASE WHEN a.p IS NULL"
            "     THEN CAST(0 AS DECIMAL(38,0))"
            "     ELSE CAST(x - a.p AS DECIMAL(38,0)) * (x - a.p) END"
            "   AS DECIMAL(38,0)))).s"
        ).alias("sum_d2"),
    )
    m = (F.col("n") - 1).cast(d38)
    var_m = m * F.col("sum_d2") - F.col("sum_d").cast(d38) * F.col("sum_d").cast(d38)
    delta = (F.col("actual") - F.col("last_cnt")).cast(d38)
    return s.select(
        "series_key",
        "bucket",
        "actual",
        "last_cnt",
        F.when(
            (F.col("n") == 1) | (var_m == 0),
            F.col("actual") != F.col("last_cnt"),
        )
        .otherwise(delta * delta * m * m > 9 * var_m)
        .alias("is_outlier"),
    )


def interval_check(span: DataFrame) -> DataFrame:
    """IntervalInterceptor analyzer, exact: expected = midpoint of the
    history's [min, max] envelope, tolerance = half-range + ½·max(range,
    1).  Doubling clears every fraction: flag iff |2·actual − lo − hi| >
    (hi − lo) + max(hi − lo, 1) — pure BIGINT endpoint arithmetic, and
    the range-0 case degrades to `actual != lo` with no special branch."""
    s = span.select(
        "series_key",
        F.col("ceiling").alias("bucket"),
        "actual",
        F.array_min("cnts").alias("lo"),
        F.array_max("cnts").alias("hi"),
    )
    return s.select(
        "series_key",
        "bucket",
        "actual",
        "lo",
        "hi",
        (
            F.abs(2 * F.col("actual") - F.col("lo") - F.col("hi"))
            > (F.col("hi") - F.col("lo"))
            + F.greatest(F.col("hi") - F.col("lo"), F.lit(1).cast("long"))
        ).alias("is_outlier"),
    )


def iqr_check(span: DataFrame) -> DataFrame:
    """IQR-envelope analyzer, exact: median forecast with tolerance
    1.5·IQR + (Q3 − median) over the history's order statistics.

    numpy's linear-interpolated percentiles at q ∈ {¼, ½, ¾} land on
    quarter positions, so 4·percentile is an integer:
    ``val4(m) = 4·s[m div 4] + (m mod 4)·(s[m div 4 + 1] − s[m div 4])``
    with m = (n−1)·4q over the sorted history s.  Scaling the flag by 8
    clears every fraction: |8·actual − 2·med4| > 3·(q34 − q14) +
    2·(q34 − med4) — pure BIGINT.  (For counts ≤ 2^53 numpy's float64
    interpolation is exact — frac is a dyadic rational — so the integer
    decision coincides with the numpy analyzer bit-for-bit.)"""

    def val4(numer):
        idx = (numer / F.lit(4)).cast("long") + 1  # 1-based element_at
        rem = numer % 4
        lo = F.element_at("s", idx.cast("int"))
        hi = F.element_at("s", (idx + 1).cast("int"))
        return F.when(rem == 0, 4 * lo).otherwise(4 * lo + rem * (hi - lo))

    s = span.select(
        "series_key",
        F.col("ceiling").alias("bucket"),
        "actual",
        "n",
        F.array_sort("cnts").alias("s"),
    )
    q14 = val4(F.col("n") - 1)
    med4 = val4(2 * (F.col("n") - 1))
    q34 = val4(3 * (F.col("n") - 1))
    out = s.select(
        "series_key",
        "bucket",
        "actual",
        q14.alias("q14"),
        med4.alias("med4"),
        q34.alias("q34"),
    )
    return out.select(
        "series_key",
        "bucket",
        "actual",
        "q14",
        "med4",
        "q34",
        (
            F.abs(8 * F.col("actual") - 2 * F.col("med4"))
            > 3 * (F.col("q34") - F.col("q14"))
            + 2 * (F.col("q34") - F.col("med4"))
        ).alias("is_outlier"),
    )


def mad_check(span: DataFrame) -> DataFrame:
    """Median-absolute-deviation analyzer — the robust z-score
    (beyond-reference 13th analyzer; Leys et al. 2013's recommended
    default: unlike mean/stddev, ONE wild history point cannot inflate
    its own tolerance).  Flag when |actual − median| > 3·1.4826·MAD,
    the 3-sigma-equivalent cut under the normal-consistency constant.

    Exact integer arithmetic throughout: ``med2 = 2·median`` over the
    sorted history is an integer for any n (even n sums the two middle
    values, odd n doubles the middle); per-point deviations ride 2x
    (``dev2 = |2·cnt − med2|``); ``mad4 = 2·median(dev2)`` is 4x the
    MAD.  The flag clears every fraction with the rational constant
    3·1.4826 = 22239/5000:  dev > 4.4478·MAD  ⟺
    |2·actual − med2|·10000 > 22239·mad4 — pure BIGINT, no float
    boundary.  All per-series work is array expressions over the
    already-bounded history window (no extra shuffle, no UDF)."""

    def med2_of(arr, n):
        mid = (n / F.lit(2)).cast("long").cast("int")
        return F.when(
            n % 2 == 1, 2 * F.element_at(arr, mid + 1)
        ).otherwise(F.element_at(arr, mid) + F.element_at(arr, mid + 1))

    s = span.select(
        "series_key",
        F.col("ceiling").alias("bucket"),
        "actual",
        "n",
        F.array_sort("cnts").alias("s"),
    ).withColumn("med2", med2_of(F.col("s"), F.col("n")))
    d = s.withColumn(
        "d", F.array_sort(F.expr("transform(s, x -> abs(2*x - med2))"))
    ).withColumn("mad4", med2_of(F.col("d"), F.col("n")))
    return d.select(
        "series_key",
        "bucket",
        "actual",
        F.col("med2").cast("long").alias("med2"),
        F.col("mad4").cast("long").alias("mad4"),
        (
            F.abs(2 * F.col("actual") - F.col("med2")) * 10000
            > 22239 * F.col("mad4")
        ).alias("is_outlier"),
    )


def time_bucket_check(span: DataFrame, bucket_sec: int = BUCKET_SEC) -> DataFrame:
    """TimeBucketSimpleRegression analyzer, exact: 3-sigma z-score over
    the SAME-HOUR-OF-DAY subset of the history (the seasonal mask; full
    history when the target hour never appears).  One indexed fold
    accumulates the masked count/sum/sumsq and the full sumsq; the flag
    is the cross-multiplied z-score decision over whichever subset
    applies — DECIMAL(38,0) throughout, no float."""
    b = int(bucket_sec)
    d38 = "decimal(38,0)"
    s = span.select(
        "series_key",
        F.col("ceiling").alias("bucket"),
        "actual",
        "n",
        F.expr("aggregate(cnts, 0L, (a, x) -> a + x)").alias("sf"),
        F.expr(
            "aggregate(cnts, CAST(0 AS DECIMAL(38,0)),"
            " (a, x) -> CAST(a + CAST(x AS DECIMAL(38,0)) * x"
            " AS DECIMAL(38,0)))"
        ).alias("sf2"),
        F.expr(
            f"aggregate(cnts,"
            f" named_struct('i', 0L, 'nm', 0L, 'sm', 0L,"
            f"              'sm2', CAST(0 AS DECIMAL(38,0))),"
            f" (a, x) -> named_struct("
            f"   'i', a.i + 1L,"
            f"   'nm', a.nm + IF(((start + a.i * {b}) DIV 3600) % 24"
            f"                   = (ceiling DIV 3600) % 24, 1L, 0L),"
            f"   'sm', a.sm + IF(((start + a.i * {b}) DIV 3600) % 24"
            f"                   = (ceiling DIV 3600) % 24, x, 0L),"
            f"   'sm2', CAST(a.sm2 + IF(((start + a.i * {b}) DIV 3600) % 24"
            f"                          = (ceiling DIV 3600) % 24,"
            f"     CAST(x AS DECIMAL(38,0)) * x, CAST(0 AS DECIMAL(38,0)))"
            f"   AS DECIMAL(38,0))))"
        ).alias("tb"),
    )
    use_masked = F.col("tb.nm") > 0
    n_s = F.when(use_masked, F.col("tb.nm")).otherwise(F.col("n")).cast(d38)
    s_s = F.when(use_masked, F.col("tb.sm")).otherwise(F.col("sf")).cast(d38)
    s2_s = F.when(use_masked, F.col("tb.sm2")).otherwise(F.col("sf2"))
    delta = n_s * F.col("actual").cast(d38) - s_s
    var9 = 9 * (n_s * s2_s - s_s * s_s)
    return s.select(
        "series_key",
        "bucket",
        "actual",
        F.col("tb.nm").cast("long").alias("n_match"),
        F.when(var9 == 0, delta != 0)
        .otherwise(delta * delta > var9)
        .alias("is_outlier"),
    )


def ewma_check(span: DataFrame, hist: int = 8) -> DataFrame:
    """EWMA control-chart analyzer, exact: forecast = exponentially
    weighted moving average of the last `hist` history buckets with
    dyadic α=1/2 weights (newest bucket weight 2^(m-1), oldest 2^0 —
    EXACT integer weights, no float decay), flag when the actual bucket
    leaves a ±50% band around the forecast:
    ``2·|actual·den − num| > num`` with ``num = Σ cnt_j·2^(m-j)``,
    ``den = 2^m − 1`` — pure BIGINT cross-multiplication, same shape as
    the other analyzer twins (one per-row HOF fold over the bounded
    history array; no joins, no second pass).  Degenerate all-zero
    history flags any non-zero actual.

    The dyadic ladder makes the EWMA recurrence ``s_j = (cnt_j + s_{j-1})
    ·½`` exact after clearing denominators — the reason for α=1/2 rather
    than an arbitrary smoothing constant.
    """
    s = span.select(
        "series_key",
        F.col("ceiling").alias("bucket"),
        "actual",
        F.expr(
            f"slice(cnts, greatest(size(cnts) - {hist - 1}, 1), {hist})"
        ).alias("wh"),
    ).select(
        "series_key",
        "bucket",
        "actual",
        F.size("wh").cast("long").alias("m"),
        # oldest element first: weight 2^0 ... newest gets 2^(m-1)
        F.expr(
            "aggregate(wh, named_struct('i', 0, 's', 0L),"
            " (a, x) -> named_struct('i', a.i + 1,"
            " 's', a.s + x * shiftleft(1L, a.i)), a -> a.s)"
        ).alias("ewma_num"),
    )
    return s.select(
        "series_key",
        "bucket",
        "actual",
        "m",
        "ewma_num",
        (F.expr("shiftleft(1L, CAST(m AS INT))") - 1).cast("long").alias("ewma_den"),
        F.when(F.col("ewma_num") == 0, F.col("actual") != 0)
        .otherwise(
            F.abs(
                F.col("actual") * (F.expr("shiftleft(1L, CAST(m AS INT))") - 1)
                - F.col("ewma_num")
            )
            * 2
            > F.col("ewma_num")
        )
        .alias("is_outlier"),
    )


def analyzer_consensus_relational(span: DataFrame) -> DataFrame:
    """`(series_key, bucket, actual, flag_moving_avg, flag_zscore,
    flag_random_walk, flag_ewma, n_flagging, consensus)` — the exact
    relational twin of the numpy `outlier_consensus`: the four integer-
    exact analyzers voted per series, consensus at ≥2 votes (the
    reference's OutlierDetectionBolt consensus rule over its analyzer
    battery).

    Each flag column is the corresponding single-analyzer gate verbatim
    (same cross-multiplied BIGINT/DECIMAL decisions), equi-joined on the
    one-row-per-series keys.  The span subtree is evaluated once per
    analyzer branch (4× at this plan's leaves) — per-series state is
    bounded, so the joins are trivially small; a production deployment
    would materialize `analyzer_span` once (it IS the stats rollup) and
    run all votes off the cached table, which this composition mirrors
    1:1.
    """
    checks = [
        ("moving_avg", moving_average_check(span)),
        ("zscore", zscore_check(span)),
        ("random_walk", random_walk_check(span)),
        ("ewma", ewma_check(span)),
    ]
    out = None
    for name, df in checks:
        f = df.select(
            "series_key",
            "bucket",
            "actual",
            F.col("is_outlier").alias(f"flag_{name}"),
        )
        out = f if out is None else out.join(f, ["series_key", "bucket", "actual"])
    votes = sum(
        F.when(F.col(f"flag_{name}"), 1).otherwise(0) for name, _ in checks
    )
    return out.select(
        "*",
        votes.cast("long").alias("n_flagging"),
    ).withColumn("consensus", F.col("n_flagging") >= 2)


def seasonal_naive_check(
    span: DataFrame, period_sec: int = 3600, bucket_sec: int = BUCKET_SEC
) -> DataFrame:
    """`(series_key, bucket, actual, m, seasonal_med, is_outlier)` —
    seasonal-naive analyzer: the forecast for the target bucket is the
    LOWER MEDIAN of the history values at the same phase of the
    `period_sec` cycle (same 5-minute-of-hour across the 24h lookback →
    up to 24 samples), and the flag is a ±50% band with absolute slack 3:
    ``|actual − med|·2 > med + 6``.  This is the analyzer that survives
    daily/hourly periodicity where moving-average and EWMA false-positive
    on every peak.

    Exactness: the lower median of integers is an exact order statistic —
    `element_at(array_sort(samples), (m+1) div 2)` — no interpolation, so
    no float anywhere.  Same one-row-per-series HOF shape as the other
    analyzer twins: the phase filter and median are per-row array ops on
    the bounded history.
    """
    b = int(bucket_sec)
    p = int(period_sec)
    s = span.select(
        "series_key",
        F.col("ceiling").alias("bucket"),
        "actual",
        F.expr(
            "transform(filter(transform(cnts,"
            " (x, i) -> named_struct('x', x, 'i', i)),"
            f" s -> pmod(ceiling - (start + s.i * {b}), {p}) = 0),"
            " s -> s.x)"
        ).alias("samples"),
    )
    return (
        s.select(
            "series_key",
            "bucket",
            "actual",
            F.size("samples").cast("long").alias("m"),
            # m = 0 (history shorter than one period) must not reach
            # element_at — index 0 is an error, not null, under ANSI
            F.expr(
                "CASE WHEN size(samples) = 0 THEN 0L ELSE"
                " element_at(array_sort(samples),"
                " CAST((size(samples) + 1) div 2 AS INT)) END"
            )
            .cast("long")
            .alias("seasonal_med"),
        )
        # ABSTAIN with no same-phase history: a series younger than one
        # period has no seasonal baseline to judge against — flagging
        # every nonzero bucket there would flood the streaming battery
        # with false positives (and the oracle's median join drops these
        # rows, so emitting them would also break row-set parity).
        .where(F.col("m") > 0)
        .select(
            "*",
            (
                F.abs(F.col("actual") - F.col("seasonal_med")) * 2
                > F.col("seasonal_med") + 6
            ).alias("is_outlier"),
        )
    )


def cusum_check(span: DataFrame) -> DataFrame:
    """`(series_key, bucket, actual, n, sum_hist, cusum, threshold,
    is_outlier)` — one-sided CUSUM change-point analyzer (Page 1954):
    detect a sustained upward level shift that no single-bucket analyzer
    fires on.  Reference rate ``k = 1.5·μ`` (μ = history mean), alarm
    when the cumulative exceedance passes ``h = 4·μ``.

    Exact-integer formulation: with deviations scaled by 2n —
    ``D_i = 2n·x_i − 3·sum`` — the recurrence ``S_t = max(0, S_{t−1} +
    D_t)`` has the prefix-sum closed form ``S_T = P_T − min_{0≤k≤T} P_k``
    (P = cumulative D, P_0 = 0), so ONE array fold tracking (prefix,
    min_prefix) computes it: no iteration, no float, order fixed by the
    array.  The alarm compares in the same scaled units: ``S > 8·sum``
    (= 4μ·2n).  The target bucket participates as the final step.
    """
    s = span.select(
        "series_key",
        F.col("ceiling").alias("bucket"),
        "actual",
        "n",
        F.expr("aggregate(cnts, 0L, (a, x) -> a + x)").alias("sum_hist"),
        "cnts",
    )
    folded = s.select(
        "series_key",
        "bucket",
        "actual",
        "n",
        "sum_hist",
        F.expr(
            "aggregate(concat(cnts, array(actual)),"
            " named_struct('p', 0L, 'mn', 0L),"
            " (a, x) -> named_struct("
            "   'p', a.p + 2 * n * x - 3 * sum_hist,"
            "   'mn', least(a.mn, a.p + 2 * n * x - 3 * sum_hist)),"
            " a -> a.p - a.mn)"
        ).alias("cusum"),
    )
    return folded.select(
        "*",
        (8 * F.col("sum_hist")).alias("threshold"),
    ).withColumn("is_outlier", F.col("cusum") > F.col("threshold"))
