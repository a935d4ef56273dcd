from __future__ import annotations

import json

import numpy as np
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.operators import classifier as nb
from cloudpelican_lsd_spark.operators import outliers as out
from cloudpelican_lsd_spark.sources.tables import logs_view


def test_heuristic_label(spark):
    df = spark.createDataFrame(
        [("all good here",), ("connection TIMED OUT again",), ("HTTP 404 served",)],
        ["_raw"],
    )
    labels = [r.l for r in df.select(nb.heuristic_label(F.col("_raw")).alias("l")).collect()]
    assert labels == ["regular", "error", "error"]


def test_naive_bayes_separates_obvious_classes(spark, sf_dir):
    logs = logs_view(spark, sf_dir)
    confusion = {
        (r.pred_label, r.heur_label): r.cnt
        for r in nb.train_and_classify(logs).collect()
    }
    agree = sum(v for (p, h), v in confusion.items() if p == h)
    total = sum(confusion.values())
    # self-trained NB must mostly agree with its own training labels
    assert agree / total > 0.9


def test_outlier_consensus_flags_spike():
    # 48 flat buckets then a 10x spike in the newest complete bucket
    buckets = np.arange(48, dtype=np.int64) * 300
    counts = np.full(48, 10.0)
    counts[-1] = 100.0
    score, flags = out.score_last_bucket(buckets, counts)
    assert score >= 0.5
    assert flags["normal_dist"] and flags["moving_average"]


def test_outlier_consensus_quiet_on_flat():
    buckets = np.arange(48, dtype=np.int64) * 300
    counts = np.full(48, 10.0)
    score, _ = out.score_last_bucket(buckets, counts)
    assert score == 0.0


def test_outlier_needs_min_points():
    buckets = np.arange(5, dtype=np.int64) * 300
    assert out.score_last_bucket(buckets, np.full(5, 1.0)) is None


def test_detect_outliers_end_to_end(spark, sf_dir):
    logs = logs_view(spark, sf_dir)
    series = out.event_series(logs)
    res = out.detect_outliers(series, min_score=0.0).collect()
    assert len(res) > 0
    for r in res:
        details = json.loads(r.details)
        assert set(details) == set(out.ANALYZERS)
        assert 0.0 <= r.score <= 1.0


def test_register_custom_analyzer():
    import numpy as np

    from cloudpelican_lsd_spark.operators import outliers as out

    def always_flags(hist):
        return float(hist.mean()), 1e-12  # zero tolerance -> flags anything

    out.register_analyzer("always_flags", always_flags)
    try:
        buckets = np.arange(0, 14) * 300
        counts = np.array([4.0, 6.0] * 6 + [5.5, 5.0])  # mild target, calm hist
        score, flags = out.score_last_bucket(buckets, counts)
        assert flags["always_flags"] is True  # zero tolerance fires
        assert score > 0
    finally:
        del out.ANALYZER_REGISTRY["always_flags"]


def test_nb_all_one_category(spark):
    """Degenerate input where every line is heuristic-'error': the zero
    count category must never win (log(0) guard)."""
    rows = [(i, f"error failure case {i}") for i in range(20)]
    logs = spark.createDataFrame(rows, ["event_id", "_raw"])
    out = nb.train_and_classify(logs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pred_label, r.heur_label, r.cnt) == ("error", "error", 20)


def test_outlier_trailing_outage_scores_zero_bucket(spark):
    """With a now anchor, a series that goes dark is scored on the
    zero-filled newest complete bucket instead of the last pre-outage
    one."""
    import json

    from cloudpelican_lsd_spark.operators.outliers import detect_outliers

    base = 1_700_000_000 - (1_700_000_000 % 300)
    rows = [("s", base + i * 300, 100) for i in range(40)]  # steady 100/5min
    df = spark.createDataFrame(rows, "series_key string, bucket long, cnt long")
    now = base + 45 * 300 + 10  # 5 empty buckets after the last datapoint
    out = detect_outliers(df, min_score=0.0, now_epoch=now).collect()
    assert len(out) == 1
    r = out[0]
    assert r.bucket == base + 44 * 300  # newest COMPLETE bucket, zero-filled
    assert r.actual == 0.0
    assert r.score >= 0.5  # a flatline dropping to zero flags consensus
    assert json.loads(r.details)


def test_outlier_minutely_grid_not_collapsed(spark):
    """bucket_sec=60 input keeps every minutely count (the 300s default
    grid would silently collapse 5 buckets into one slot)."""
    from cloudpelican_lsd_spark.operators.outliers import detect_outliers

    base = 1_700_000_000 - (1_700_000_000 % 60)
    rows = [("s", base + i * 60, 10) for i in range(30)]
    rows.append(("s", base + 30 * 60, 1000))  # spike in the newest complete
    rows.append(("s", base + 31 * 60, 1))  # still-filling bucket (excluded)
    df = spark.createDataFrame(rows, "series_key string, bucket long, cnt long")
    out = detect_outliers(df, min_score=0.0, bucket_sec=60).collect()
    assert len(out) == 1
    assert out[0].bucket == base + 30 * 60 and out[0].actual == 1000.0
    assert out[0].score > 0.5


def test_classifier_null_raw_counts_toward_priors(spark):
    from cloudpelican_lsd_spark.operators.classifier import train_and_classify

    df = spark.createDataFrame(
        [(1, "fatal error here"), (2, "all fine"), (3, None), (4, None)],
        "event_id long, _raw string",
    )
    rows = train_and_classify(df).collect()
    # NULL-raw messages carry no tokens (never classified) but must not
    # crash and must not distort the labeled counts of real messages
    total = sum(r.cnt for r in rows)
    assert total == 2


def test_relational_analyzer_twins_match_numpy(spark, sf_dir):
    """The SQL-expressible analyzer twins (moving-average, z-score,
    simple-regression) must reach the SAME outlier decision as the numpy
    analyzers they mirror, on the same gap-filled series."""
    import numpy as np

    from cloudpelican_lsd_spark.operators import outliers as O
    from cloudpelican_lsd_spark.sources.tables import logs_view

    series = O.event_series(logs_view(spark, sf_dir))
    grid = O.analyzer_grid(series)
    rows = grid.orderBy("series_key", "bucket").collect()
    by_series: dict = {}
    for r in rows:
        by_series.setdefault(r.series_key, []).append((r.bucket, r.cnt))

    span = O.analyzer_span(series)
    rel = {
        name: {r.series_key: r for r in fn(span).collect()}
        for name, fn in (
            ("ma", O.moving_average_check),
            ("z", O.zscore_check),
            ("reg", O.regression_check),
            ("rw", O.random_walk_check),
            ("iv", O.interval_check),
            ("tb", O.time_bucket_check),
            ("iqr", O.iqr_check),
        )
    }
    assert set(rel["ma"]) == set(by_series) and len(by_series) >= 2
    for sk, pts in by_series.items():
        counts = np.array([c for _, c in pts], dtype=float)
        hist, target = counts[:-1], float(counts[-1])

        def numpy_flag(expected, tol):
            return abs(target - expected) > max(tol, 1e-9)

        assert rel["ma"][sk].is_outlier == numpy_flag(*O._moving_average(hist))
        assert rel["z"][sk].is_outlier == numpy_flag(*O._normal_dist(hist))
        assert rel["reg"][sk].is_outlier == numpy_flag(*O._simple_regression(hist))
        assert rel["rw"][sk].is_outlier == numpy_flag(*O._random_walk(hist))
        assert rel["iv"][sk].is_outlier == numpy_flag(*O._interval_interceptor(hist))
        assert rel["iqr"][sk].is_outlier == numpy_flag(*O._iqr_envelope(hist))
        hist_buckets = np.array([b for b, _ in pts[:-1]], dtype=np.int64)
        assert rel["tb"][sk].is_outlier == numpy_flag(
            *O._time_bucket_regression(hist, hist_buckets, pts[-1][0])
        )
        # and the relational target row is the grid's newest bucket
        assert rel["ma"][sk].bucket == pts[-1][0]
        assert rel["ma"][sk].actual == pts[-1][1]


def _perceptron_py(rows, dims, steps):
    """Pure-Python batch perceptron reference: rows = (doc_id, y, text)."""
    import hashlib

    def hdim(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % dims

    feats = {}
    for doc_id, _y, text in rows:
        f = {nb.PERCEPTRON_BIAS_DIM: 1}
        for tok in text.lower().split(" "):
            d = hdim(tok)
            f[d] = f.get(d, 0) + 1
        feats[doc_id] = f
    labels = {doc_id: y for doc_id, y, _ in rows}
    w = {}
    for _ in range(steps):
        grad = {}
        for doc_id, f in feats.items():
            score = sum(x * w.get(d, 0) for d, x in f.items())
            pred = 1 if score > 0 else -1
            if pred != labels[doc_id]:
                for d, x in f.items():
                    grad[d] = grad.get(d, 0) + labels[doc_id] * x
        for d, g in grad.items():
            w[d] = w.get(d, 0) + g
        w = {d: v for d, v in w.items() if v != 0}
    return w


def test_perceptron_loop_matches_python_reference(spark):
    """4 driver-loop perceptron_step iterations equal the pure-Python
    batch perceptron (same md5 hashing, sign(0) = -1, lr = 1), and the
    learned model separates a linearly separable toy corpus."""
    rows = [
        (1, 1, "good clean prose with varied words here"),
        (2, 1, "another good clean fluent document body"),
        (3, 1, "clean prose fluent varied good words"),
        (4, -1, "spam spam spam buy buy click"),
        (5, -1, "click click buy spam junk junk"),
        (6, -1, "junk buy spam click spam buy"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en" if y > 0 else "xx") for i, y, t in rows],
        "doc_id long, text string, lang string",
    )
    dims = 16
    feats = nb.hashed_features(docs, dims)
    labels = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(-1))
        .cast("long").alias("y"),
    )
    w = nb.zero_weights(spark)
    for step in range(1, 5):
        w = nb.perceptron_step(feats, labels, w)
        got = {r["dim"]: r["w"] for r in w.collect()}
        want = _perceptron_py(rows, dims, step)
        assert got == want, f"step {step}: {got} != {want}"
    # converged model classifies the training set perfectly
    final = {r["dim"]: r["w"] for r in w.collect()}
    scores = {
        doc_id: sum(
            x * final.get(d, 0)
            for d, x in _build_feats_py(text, dims).items()
        )
        for doc_id, _y, text in rows
    }
    for doc_id, y, _t in rows:
        assert (1 if scores[doc_id] > 0 else -1) == y


def _build_feats_py(text, dims):
    import hashlib

    f = {nb.PERCEPTRON_BIAS_DIM: 1}
    for tok in text.lower().split(" "):
        d = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % dims
        f[d] = f.get(d, 0) + 1
    return f


def test_perceptron_two_steps_gate_shape(spark, sf_dir):
    """gate query contract: bias row present, every weight integral and
    bounded by total token mass, step-1 weights equal the positive-class
    feature sums."""
    from cloudpelican_lsd_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    out_rows = nb.perceptron_two_steps(docs).collect()
    dims = {r["dim"] for r in out_rows}
    assert nb.PERCEPTRON_BIAS_DIM in dims
    pos = docs.where(F.col("lang") == "en")
    w1_want = {
        r["dim"]: r["s"]
        for r in nb.hashed_features(pos)
        .groupBy("dim").agg(F.sum("x").alias("s")).collect()
        if r["s"] != 0
    }
    w1_got = {r["dim"]: r["w_step1"] for r in out_rows if r["w_step1"] != 0}
    assert w1_got == w1_want


def test_ewma_check_closed_form(spark):
    """history [1,2,4]: num = 1·1+2·2+4·4 = 21, den = 7, forecast 3;
    actual 3 inside the ±50% band, actual 5 outside; all-zero history
    flags any nonzero actual."""
    from cloudpelican_lsd_spark.operators.outliers import ewma_check

    span = spark.createDataFrame(
        [
            ("ok", 0, 900, [1, 2, 4], 3, 3),
            ("spike", 0, 900, [1, 2, 4], 5, 3),
            ("dead", 0, 900, [0, 0, 0], 1, 3),
            ("flat0", 0, 900, [0, 0, 0], 0, 3),
        ],
        "series_key string, start long, ceiling long, cnts array<bigint>, "
        "actual long, n long",
    )
    got = {r.series_key: r for r in ewma_check(span, hist=8).collect()}
    assert got["ok"].ewma_num == 21 and got["ok"].ewma_den == 7
    assert not got["ok"].is_outlier
    assert got["spike"].is_outlier
    assert got["dead"].is_outlier and not got["flat0"].is_outlier
    # hist cap: 10-long history uses only the newest 8 entries
    span2 = spark.createDataFrame(
        [("cap", 0, 900, [9, 9, 1, 1, 1, 1, 1, 1, 1, 1], 1, 10)],
        "series_key string, start long, ceiling long, cnts array<bigint>, "
        "actual long, n long",
    )
    r = ewma_check(span2, hist=8).collect()[0]
    assert r.m == 8 and r.ewma_num == 255 and r.ewma_den == 255


def test_perceptron_calibration_consistency(spark):
    """bins partition the corpus: doc counts sum to |docs|, positives to
    |en docs|; bin ids are signed digit counts consistent with the
    reported min/max scores; rate is exact ppm floor-division."""
    from cloudpelican_lsd_spark.operators.classifier import (
        perceptron_calibration,
    )

    docs = spark.createDataFrame(
        [
            (1, "good clean text good clean", "en"),
            (2, "good clean words here now", "en"),
            (3, "spam junk noise spam junk", "xx"),
            (4, "noise junk spam words now", "xx"),
            (5, "good clean text here", "en"),
            (6, "junk junk junk junk", "xx"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = perceptron_calibration(docs, dims=16).collect()
    assert sum(r.n_docs for r in rows) == 6
    assert sum(r.n_pos for r in rows) == 3
    for r in rows:
        assert r.pos_rate_ppm == r.n_pos * 1000000 // r.n_docs
        for s in (r.min_score, r.max_score):
            expect = 0 if s == 0 else (1 if s > 0 else -1) * len(str(abs(s)))
            # min/max live in the row's bin
            assert expect == r.score_bin


def test_analyzer_consensus_matches_individual_checks(spark):
    """consensus columns must equal each analyzer's own verdict, and
    n_flagging/consensus follow from the flags."""
    from cloudpelican_lsd_spark.operators import outliers as oo

    span = spark.createDataFrame(
        [
            ("a", 0, 3600, [5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5], 5, 12),
            ("b", 0, 3600, [5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5], 50, 12),
            ("c", 0, 3600, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12], 13, 12),
        ],
        "series_key string, start long, ceiling long, cnts array<bigint>, "
        "actual long, n long",
    )
    cons = {r.series_key: r for r in oo.analyzer_consensus_relational(span).collect()}
    singles = {
        "flag_moving_avg": oo.moving_average_check(span),
        "flag_zscore": oo.zscore_check(span),
        "flag_random_walk": oo.random_walk_check(span),
        "flag_ewma": oo.ewma_check(span),
    }
    for col, df in singles.items():
        for r in df.collect():
            assert cons[r.series_key][col] == r.is_outlier, (col, r.series_key)
    for r in cons.values():
        votes = sum(
            int(r[c])
            for c in ("flag_moving_avg", "flag_zscore", "flag_random_walk", "flag_ewma")
        )
        assert r.n_flagging == votes and r.consensus == (votes >= 2)
    # sanity: flat history + same actual is clean; 10x spike is consensus
    assert cons["a"].n_flagging == 0 and not cons["a"].consensus
    assert cons["b"].consensus


def test_seasonal_naive_closed_form(spark):
    """hand grid: start=0, ceiling=7200, bucket=300s, period=3600 -> the
    same-phase samples are buckets 0 and 3600 (indices 0 and 12); lower
    median of [2, 10] = 2; actual 20 breaks the band, actual 3 does not.
    A spiky-but-periodic series (peak every hour) stays clean where the
    peak would trip the flat-window analyzers."""
    from cloudpelican_lsd_spark.operators.outliers import seasonal_naive_check

    # 24 history slots (0..6900), target at 7200
    base = [1] * 24
    base[0], base[12] = 2, 10
    span = spark.createDataFrame(
        [
            ("calm", 0, 7200, base, 3, 24),
            ("spike", 0, 7200, base, 20, 24),
        ],
        "series_key string, start long, ceiling long, cnts array<bigint>, "
        "actual long, n long",
    )
    got = {r.series_key: r for r in seasonal_naive_check(span).collect()}
    assert got["calm"].m == 2 and got["calm"].seasonal_med == 2
    assert not got["calm"].is_outlier and got["spike"].is_outlier
    # periodic peak: history peaks 100 at each hour mark, target also 100
    peaks = [100 if i % 12 == 0 else 1 for i in range(24)]
    span2 = spark.createDataFrame(
        [("periodic", 0, 7200, peaks, 100, 24)],
        "series_key string, start long, ceiling long, cnts array<bigint>, "
        "actual long, n long",
    )
    r = seasonal_naive_check(span2).collect()[0]
    assert r.seasonal_med == 100 and not r.is_outlier


def test_cusum_closed_form(spark):
    """flat series -> cusum 0; a sustained 10x level shift accumulates
    past the 4-mu threshold where a mild shift stays under; hand-checked
    scaled units (D_i = 2n*x - 3*sum)."""
    from cloudpelican_lsd_spark.operators.outliers import cusum_check

    span = spark.createDataFrame(
        [
            ("flat", 0, 3600, [2] * 12, 2, 12),
            ("mild", 0, 3600, [2] * 8 + [10] * 4, 10, 12),
            ("shift", 0, 3600, [2] * 8 + [20] * 4, 20, 12),
        ],
        "series_key string, start long, ceiling long, cnts array<bigint>, "
        "actual long, n long",
    )
    got = {r.series_key: r for r in cusum_check(span).collect()}
    assert got["flat"].cusum == 0 and not got["flat"].is_outlier
    # mild: sum=56; 5 steps of +72 after a -960 trough -> S=360 < 448
    assert got["mild"].cusum == 360 and got["mild"].threshold == 448
    assert not got["mild"].is_outlier
    # shift: sum=96; S = 5*192 = 960 > 768
    assert got["shift"].cusum == 960 and got["shift"].is_outlier


def test_mad_check_closed_form_and_robustness(spark):
    """Hand-computed MAD decisions, plus the property that motivates the
    analyzer: ONE wild history point (which blows up mean/stddev) leaves
    the MAD tolerance almost unchanged."""
    from cloudpelican_lsd_spark.operators.outliers import mad_check

    span = spark.createDataFrame(
        [
            # history [4,6,4,6,5]: median 5 (med2=10), devs2 |2x-10| =
            # [2,2,0,2,0] -> sorted [0,0,2,2,2], mad4 = 2*2 = 4
            # cut: |2a-10|*10000 > 22239*4 = 88956 <=> |2a-10| > 8.8956
            ("ok", 0, 900, [4, 6, 4, 6, 5], 9, 5),      # |18-10|=8 -> in
            ("spike", 0, 900, [4, 6, 4, 6, 5], 10, 5),  # |20-10|=10 -> out
            # SAME history plus one wild point 1000: med2 = s[3]+s[4] =
            # 5+6 = 11; devs2 |2x-11| = [3,1,3,1,1,1989] -> sorted
            # [1,1,1,3,3,1989], mad4 = 1+3 = 4: the tolerance barely
            # moves instead of exploding (stddev would be ~406 and pass
            # anything under ~1200)
            ("robust", 0, 900, [4, 6, 4, 6, 5, 1000], 30, 6),
            # even n, exact middle pair; n=1 degenerate -> mad4=0, any
            # deviation flags
            ("single", 0, 900, [7], 7, 1),
            ("single_off", 0, 900, [7], 8, 1),
        ],
        "series_key string, start long, ceiling long, cnts array<bigint>, "
        "actual long, n long",
    )
    got = {r.series_key: r for r in mad_check(span).collect()}
    assert got["ok"].med2 == 10 and got["ok"].mad4 == 4
    assert not got["ok"].is_outlier
    assert got["spike"].is_outlier
    r = got["robust"]
    assert r.med2 == 11 and r.mad4 == 4
    assert r.is_outlier  # 30 is flagged despite the 1000 in history
    assert got["single"].mad4 == 0 and not got["single"].is_outlier
    assert got["single_off"].is_outlier
