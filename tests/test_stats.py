from __future__ import annotations

from pyspark.sql import functions as F

from cloudpelican_lsd_spark.operators import stats as stats_ops
from cloudpelican_lsd_spark.sources.tables import logs_view


def test_bucket_math(spark):
    df = spark.range(1).select(
        F.lit(1704067798).alias("e1"), F.lit(1704067800).alias("e2")
    )
    row = df.select(
        stats_ops.bucket_col("e1", 60).alias("b1"),
        stats_ops.bucket_col("e2", 60).alias("b2"),
    ).collect()[0]
    assert row.b1 == 1704067798 - (1704067798 % 60) == 1704067740
    assert row.b2 == 1704067800


def test_metric_counts_sum_to_total(spark, sf_dir):
    logs = logs_view(spark, sf_dir)
    total = logs.count()
    mc = stats_ops.metric_counts(logs, rollup_sec=3600)
    match_total = (
        mc.where(F.col("metric") == stats_ops.METRIC_MATCH)
        .agg(F.sum("cnt"))
        .collect()[0][0]
    )
    assert match_total == total


def test_gap_fill_dense_and_zeroed(spark, sf_dir):
    logs = logs_view(spark, sf_dir)
    mc = stats_ops.metric_counts(logs, rollup_sec=300)
    filled = stats_ops.gap_fill(mc, rollup_sec=300)
    rows = filled.collect()
    by_metric = {}
    for r in rows:
        by_metric.setdefault(r.metric, []).append(r.bucket)
    for metric, buckets in by_metric.items():
        buckets.sort()
        # dense grid: every consecutive bucket differs by exactly the rollup
        assert all(b2 - b1 == 300 for b1, b2 in zip(buckets, buckets[1:]))
    # gap-fill must add zero rows (sparse minutes exist at sf0.001)
    assert filled.where(F.col("cnt") == 0).count() > 0
    # and must not change any nonzero count
    orig = {(r.metric, r.bucket): r.cnt for r in mc.collect()}
    for r in rows:
        if r.cnt != 0:
            assert orig[(r.metric, r.bucket)] == r.cnt


def test_pivot_dual_series(spark, sf_dir):
    logs = logs_view(spark, sf_dir)
    mc = stats_ops.metric_counts(logs, rollup_sec=3600)
    piv = stats_ops.pivot_dual_series(mc).collect()
    assert all(r.error_cnt <= r.regular_cnt for r in piv)
    assert sum(r.regular_cnt for r in piv) == logs.count()


def test_chart_series_truncates_to_newest(spark, sf_dir):
    from cloudpelican_lsd_spark.operators import stats as stats_ops
    from cloudpelican_lsd_spark.sources.tables import logs_view

    mc = stats_ops.metric_counts(logs_view(spark, sf_dir), rollup_sec=300)
    out = stats_ops.chart_series(mc, width=10)
    per_metric = {}
    for r in out.collect():
        per_metric.setdefault(r.metric, []).append(r.bucket)
    full_max = {r.metric: r.mx for r in
                mc.groupBy("metric").agg(F.max("bucket").alias("mx")).collect()}
    for m, buckets in per_metric.items():
        assert len(buckets) == 10
        assert max(buckets) == full_max[m]  # newest bucket retained


def test_sessionize_gap_splits_and_counts(spark):
    from cloudpelican_lsd_spark.operators.sessions import sessionize

    # user 1: events at t=1000,1010 (one session), then t=3010 — the
    # 2000s gap (> 1800) starts session 2; user 2: a single error event
    ev = spark.createDataFrame(
        [
            (100, 1, "view", 1000),
            (101, 1, "click", 1010),
            (102, 1, "error", 3010),
            (200, 2, "error", 500),
        ],
        "event_id long, user_id long, event_type string, ts_epoch long",
    )
    got = {
        (r.user_id, r.session_idx): (
            r.start_epoch, r.end_epoch, r.n_events, r.duration_s, r.n_errors
        )
        for r in sessionize(ev, gap_s=1800).collect()
    }
    assert got == {
        (1, 1): (1000, 1010, 2, 10, 0),
        (1, 2): (3010, 3010, 1, 0, 1),
        (2, 1): (500, 500, 1, 0, 1),
    }


def test_asof_join_backward_semantics(spark):
    from cloudpelican_lsd_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 200), (3, 1, 50), (4, 2, 100)],
        "event_id long, user_id long, ts_epoch long",
    )
    right = spark.createDataFrame(
        # user 1: facts at t=100 (id 10) and t=150 (id 11); user 3: never
        # matches anything
        [(1, 100, 10), (1, 150, 11), (3, 10, 30)],
        "user_id long, ts_epoch long, fact_id long",
    )
    got = {
        r.event_id: (r.asof_fact_id, r.asof_ts)
        for r in asof_join(
            left, right, keys=["user_id"], ts="ts_epoch",
            value_cols=["fact_id"],
        ).collect()
    }
    assert got == {
        1: (10, 100),   # at-or-before: fact at the same instant counts
        2: (11, 150),   # latest prior wins, not the first
        3: (None, None),  # nothing at-or-before t=50
        4: (None, None),  # user with no facts at all
    }


def test_asof_join_null_fact_value_is_not_skipped(spark):
    """A right row whose VALUE is NULL is still the latest fact: the
    joined columns must come from that row (NULL value, its ts), never
    mix an older row's value with the newer row's timestamp."""
    from cloudpelican_lsd_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, 200)], "event_id long, user_id long, ts_epoch long"
    )
    right = spark.createDataFrame(
        # t=100 has a value; t=150 (the latest prior) has value NULL
        [(1, 100, 10), (1, 150, None)],
        "user_id long, ts_epoch long, fact_id long",
    )
    [row] = asof_join(
        left, right, keys=["user_id"], ts="ts_epoch", value_cols=["fact_id"]
    ).collect()
    assert row.asof_ts == 150
    assert row.asof_fact_id is None  # the NULL fact, not the stale 10


def test_asof_join_reserved_and_dotted_value_cols(spark):
    """A value column literally named '_ts' would duplicate the carried
    struct's timestamp field (ambiguous extraction) — rejected loudly;
    a value column whose NAME contains a dot must survive (getField /
    backtick paths, never string column-path parsing)."""
    import pytest as _pytest

    from cloudpelican_lsd_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, 200)], "event_id long, user_id long, ts_epoch long"
    )
    bad = spark.createDataFrame(
        [(1, 100, 10)], "user_id long, ts_epoch long, _ts long"
    )
    with _pytest.raises(ValueError, match="_ts"):
        asof_join(left, bad, keys=["user_id"], ts="ts_epoch",
                  value_cols=["_ts"])

    dotted = (
        spark.createDataFrame(
            [(1, 100, 10), (1, 150, 11)],
            "user_id long, ts_epoch long, fact long",
        )
        .withColumnRenamed("fact", "payload.kind")
    )
    [row] = asof_join(
        left, dotted, keys=["user_id"], ts="ts_epoch",
        value_cols=["payload.kind"],
    ).collect()
    assert row.asof_ts == 150
    assert row["asof_payload.kind"] == 11

    # dotted KEY and ts columns must survive too (same bug class)
    dotted_all = (
        spark.createDataFrame(
            [(1, 100, 10), (1, 150, 11)],
            "user_id long, ts_epoch long, fact long",
        )
        .withColumnRenamed("user_id", "u.id")
        .withColumnRenamed("ts_epoch", "t.s")
    )
    left2 = left.withColumnRenamed("user_id", "u.id").withColumnRenamed(
        "ts_epoch", "t.s"
    )
    [row2] = asof_join(
        left2, dotted_all, keys=["u.id"], ts="t.s", value_cols=["fact"]
    ).collect()
    assert row2.asof_ts == 150 and row2.asof_fact == 11


def test_moving_zscore_math_and_gates(spark):
    # key "a": buckets 0..12 alternate 4/6 (so trailing var > 0), bucket
    # 13 spikes to 50.  key "b": constant series -> var=0 -> zscore NULL.
    rows = [("a", b, 4 if b % 2 == 0 else 6) for b in range(13)]
    rows.append(("a", 13, 50))
    rows += [("b", b, 5) for b in range(14)]
    series = spark.createDataFrame(rows, "k string, bucket long, cnt long")
    got = {
        (r.k, r.bucket): (r.mov_avg, r.zscore, r.is_outlier)
        for r in stats_ops.moving_zscore(series, keys=["k"]).collect()
    }
    # too few trailing points (n<10): both stats NULL, not flagged
    assert got[("a", 5)] == (None, None, 0)
    assert got[("a", 9)] == (None, None, 0)
    # first gated bucket: n=10 trailing points (buckets 0..9: five 4s,
    # five 6s), mean 5, var = (260 - 250)/9
    import math

    var10 = (5 * 16 + 5 * 36 - 50 * 50 / 10) / 9
    z10 = round((4 - 5.0) / math.sqrt(var10), 6)
    assert got[("a", 10)] == (5.0, z10, 0)
    # the spike: 12 trailing points alternating 4/6 -> mean 5,
    # var = (312 - 300)/11, z = 45/sd -> flagged
    var12 = (6 * 16 + 6 * 36 - 60 * 60 / 12) / 11
    z13 = round((50 - 5.0) / math.sqrt(var12), 6)
    assert got[("a", 13)] == (5.0, z13, 1)
    assert z13 > 40
    # constant series: mean defined, zero variance -> zscore NULL
    assert got[("b", 13)] == (5.0, None, 0)


def test_interval_join_boundaries_and_overlap(spark):
    from cloudpelican_lsd_spark.operators.ranges import interval_join

    points = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 600), (3, 1, 601), (4, 2, 100), (5, 1, 4000)],
        "pid long, user_id long, ts_epoch long",
    )
    intervals = spark.createDataFrame(
        # [100,600] and an overlapping [500,5000] for user 1; user 3 never
        # matches; interval spans multiple 1h buckets
        [(10, 1, 100, 600), (11, 1, 500, 5000), (12, 3, 0, 10000)],
        "iid long, user_id long, start_epoch long, end_epoch long",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, keys=["user_id"], point_ts="ts_epoch",
            bucket_s=3600,
        ).collect()
    )
    assert got == [
        (1, 10),          # start boundary inclusive
        (2, 10), (2, 11),  # end boundary inclusive + overlap -> two rows
        (3, 11),          # just past [100,600], inside [500,5000]
        (5, 11),          # multi-bucket interval still matches (bucket 1)
    ]  # pid 4: user 2 has no intervals


def test_retention_cohort_day0_equals_cohort_size(spark, sf_dir):
    from cloudpelican_lsd_spark.registry import QUERIES
    from cloudpelican_lsd_spark.sources.tables import load_table

    rows = QUERIES["events_retention_cohorts"](spark, sf_dir).collect()
    # every cohort has a day-0 cell and it is its largest cell
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.first_day, {})[r.day_offset] = r.n_users
    users = load_table(spark, "events", sf_dir).select("user_id").distinct().count()
    assert sum(c[0] for c in by_cohort.values()) == users
    for c in by_cohort.values():
        assert 0 in c and c[0] == max(c.values())
        assert all(off >= 0 for off in c)


def test_template_mining_masks_all_digits(spark, sf_dir):
    from cloudpelican_lsd_spark.registry import QUERIES

    rows = QUERIES["logs_template_mining"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert not any(ch.isdigit() for ch in r.template)
    # templates cover the whole stream (synthetic logs: one per event type)
    from cloudpelican_lsd_spark.sources.tables import logs_view

    assert sum(r.cnt for r in rows) == logs_view(spark, sf_dir).count()


def test_rate_of_change_chains_consistently(spark, sf_dir):
    from cloudpelican_lsd_spark.registry import QUERIES

    rows = QUERIES["stats_rate_of_change"](spark, sf_dir).collect()
    series = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.bucket)):
        assert r.delta == r.cnt - r.prev_cnt
        prev = series.get(r.event_type)
        if prev is None:
            assert r.prev_cnt == 0 and r.pct_change is None
        else:
            assert r.prev_cnt == prev
            if prev > 0:
                assert r.pct_change == round((r.cnt - prev) * 100.0 / prev, 6)
        series[r.event_type] = r.cnt


def test_rolling_wau_matches_python_reference(spark, sf_dir):
    from cloudpelican_lsd_spark.registry import QUERIES
    from cloudpelican_lsd_spark.operators import stats as stats_ops
    from cloudpelican_lsd_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    got = {
        r.obs_day: r.wau
        for r in QUERIES["events_rolling_wau"](spark, sf_dir).collect()
    }
    ud = {
        (r.user_id, r.day)
        for r in load_table(spark, "events", sf_dir)
        .select("user_id", stats_ops.bucket_col("ts_epoch", 86400).alias("day"))
        .distinct()
        .collect()
    }
    days = sorted({d for _, d in ud})
    for obs in days:
        expect = len(
            {u for u, d in ud if obs - 6 * 86400 <= d <= obs}
        )
        assert got[obs] == expect, obs
    assert set(got) == set(days)


def test_transition_matrix_conserves_transitions(spark, sf_dir):
    from cloudpelican_lsd_spark import registry
    from cloudpelican_lsd_spark.sources.tables import load_table

    out = registry.QUERIES["events_transition_matrix"](spark, sf_dir)
    rows = out.collect()
    ev = load_table(spark, "events", sf_dir)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every event except each user's first contributes exactly one transition
    assert sum(r.n for r in rows) == n_events - n_users
    types = {r["event_type"] for r in ev.select("event_type").distinct().collect()}
    assert {r.prev_type for r in rows} <= types
    assert {r.next_type for r in rows} <= types


def test_burst_windows_range_frame_counts_ties(spark):
    from cloudpelican_lsd_spark import registry
    # user 1: 5 events inside 600s (burst); user 2: spread out;
    # user 3: 5 SIMULTANEOUS events — the RANGE-frame tie case where a
    # ROWS frame would undercount (each row must see all 5)
    rows = (
        [(1, t) for t in (0, 100, 200, 300, 400)]
        + [(2, t) for t in (0, 1000, 2000, 3000)]
        + [(3, 50)] * 5
    )
    df = spark.createDataFrame(rows, "user_id long, ts_epoch long")
    # patch load_table in the module that OWNS the query (the registry is
    # a package since round 5; each family module binds load_table itself)
    import importlib

    owner = importlib.import_module(
        registry.QUERIES["events_burst_windows"].__module__
    )
    orig = owner.load_table
    try:
        owner.load_table = lambda s, n, d: df  # route the query to the fixture
        out = {
            r.user_id: r
            for r in registry.QUERIES["events_burst_windows"](spark, "x").collect()
        }
    finally:
        owner.load_table = orig
    assert out[1].peak_burst == 5 and out[1].n_bursty == 1
    assert out[2].peak_burst == 1 and out[2].n_bursty == 0
    # every tied row sees the full group of 5 under a value-based frame
    assert out[3].peak_burst == 5 and out[3].n_bursty == 5


def test_burn_rate_multiwindow_paging(spark):
    """Planted incident: clean traffic, then a 100%-error burst long
    enough to blow the fast window but only pages once the slow window
    also exceeds; after recovery the fast window resets first."""
    from cloudpelican_lsd_spark.operators.stats import burn_rate

    rows = []
    eid = 0
    # 6h of clean traffic: 10 ok lines/min
    for m in range(360):
        for i in range(10):
            rows.append(("app: click ok", m * 60 + i)); eid += 1
    # 90 min of pure errors at the same rate
    for m in range(360, 450):
        for i in range(10):
            rows.append(("app: error boom", m * 60 + i)); eid += 1
    # 3h of clean recovery
    for m in range(450, 630):
        for i in range(10):
            rows.append(("app: click ok", m * 60 + i)); eid += 1
    logs = spark.createDataFrame(rows, "_raw string, ts_epoch long")
    out = {r.bucket // 60: r for r in burn_rate(
        logs, budget_num=1, budget_den=50).collect()}
    # before the incident: nothing fires (2% budget, clean traffic)
    assert not out[300].fast_burn and not out[300].slow_burn
    assert not out[300].page
    # deep in the incident: fast window is pure errors (ratio 1 > 28.8%),
    # slow window is 89/360 minutes of errors (~24.7% > 12%) -> PAGE
    r = out[449]
    assert r.err_fast == 600 and r.total_fast == 600
    assert r.fast_burn and r.slow_burn and r.page
    # 2h into recovery the fast window is clean again (resets first),
    # while the slow window still carries the incident -> no page
    r2 = out[570]
    assert r2.err_fast == 0 and not r2.fast_burn
    assert r2.slow_burn and not r2.page


def test_burn_rate_defaults_shared_with_oracle():
    """burn_rate and burn_rate_oracle must advertise identical defaults —
    a drift would silently fork a defaults-based Spark call from the
    registered oracle SQL (ADVICE r3)."""
    import inspect

    from cloudpelican_lsd_spark.operators import stats

    spark_sig = inspect.signature(stats.burn_rate)
    oracle_sig = inspect.signature(stats.burn_rate_oracle)
    spark_defaults = {
        k: p.default
        for k, p in spark_sig.parameters.items()
        if p.default is not inspect.Parameter.empty
    }
    oracle_defaults = {
        k: p.default for k, p in oracle_sig.parameters.items()
    }
    assert spark_defaults == oracle_defaults == stats.BURN_RATE_DEFAULTS


def test_events_key_skew_matches_python(spark, sf_dir):
    """The registered query equals an independent Python recomputation
    from raw (event_type, user_id) counts — totals, distinct users,
    heaviest user, and the exact ppm share."""
    from collections import Counter

    from cloudpelican_lsd_spark.registry import QUERIES
    from cloudpelican_lsd_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir).select("event_type", "user_id")
    per = Counter((r.event_type, r.user_id) for r in ev.collect())
    by_type = {}
    for (t, _u), c in per.items():
        tot, users, top = by_type.get(t, (0, 0, 0))
        by_type[t] = (tot + c, users + 1, max(top, c))
    got = {r.event_type: r for r in QUERIES["events_key_skew"](spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    for t, (tot, users, top) in by_type.items():
        r = got[t]
        assert (r.n_rows, r.n_users, r.top_user_rows) == (tot, users, top)
        assert r.top_share_ppm == top * 1000000 // tot


def test_morton_interleave_matches_python(spark):
    """the div/% Morton expression equals a pure-Python bit interleave
    over the full 8x5-bit domain sample."""
    from cloudpelican_lsd_spark.operators.layout import morton_sql

    rows = [(x, y) for x in (0, 1, 5, 127, 255) for y in (0, 1, 17, 31)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.selectExpr(
            "x", "y", f"({morton_sql('x', 'y', 8, 5, 'div')}) AS z"
        ).collect()
    }

    def morton_py(x, y):
        z = 0
        for b in range(8):
            z |= ((x >> b) & 1) << (2 * b)
        for b in range(5):
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == {(x, y): morton_py(x, y) for x, y in rows}


def test_zorder_locality_tradeoff(spark, sf_dir):
    """the audit exhibits the canonical layout trade: linear sort skips
    nothing on the non-leading dim (x-span ~ chunks * |X|) while Morton
    order cuts it by >=3x, paying a bounded cost on the leading dim; both
    layouts account every chunk."""
    from cloudpelican_lsd_spark.operators.layout import zorder_locality_audit
    from cloudpelican_lsd_spark.sources.tables import load_table

    # sf0.01: at 1k events (sf0.001) the 20-row chunks are too sparse for
    # a stable 3x margin; 10k rows give the gate-scale geometry
    ev = load_table(spark, "events", "/root/testdata/sf0.01")
    rows = {r["layout"]: r for r in zorder_locality_audit(ev).collect()}
    lin, zo = rows["linear_day_user"], rows["zorder"]
    assert lin["n_chunks"] == zo["n_chunks"] == 50
    assert zo["sum_span_x"] * 3 <= lin["sum_span_x"]
    assert lin["sum_span_y"] <= zo["sum_span_y"]
    for r in rows.values():
        assert r["sum_bbox_area"] >= r["n_chunks"]  # every box area >= 1


def test_percentile_sketch_audit_bounds(spark):
    """on a deterministic 1..N single-type table the sketch must pass its
    rank contract at every percentile; and the integer bound predicate
    itself (python twin) accepts exactly the ranks within
    ceil(p*n) +/- (ceil(n/acc)+1)."""
    from cloudpelican_lsd_spark.operators.stats import percentile_sketch_audit

    n = 500
    df = spark.createDataFrame(
        [(i, "t", float(i % n + 1)) for i in range(n)],
        "event_id long, event_type string, value double",
    )
    rows = percentile_sketch_audit(df).collect()
    assert len(rows) == 3 and all(r["within_bound"] for r in rows)
    assert all(r["n"] == n for r in rows)

    # python twin of the predicate: value v has rank interval
    # [cnt_lt+1, cnt_le]; with distinct 1..n values both equal v
    def within(v, p_milli, n, acc=1000):
        t = (p_milli * n + 999) // 1000
        s = (n + acc - 1) // acc + 1
        cnt_le = cnt_lt_plus1 = v  # distinct integers 1..n
        return (cnt_lt_plus1 <= t + s) and (cnt_le >= t - s)

    # p50 of 1..500: target rank 250, slack 2 -> accepts exactly 248..252
    accepted = [v for v in range(1, n + 1) if within(v, 500, n)]
    assert accepted == list(range(248, 253))
    # and an out-of-contract value is rejected (the gate would hash-fail)
    assert not within(260, 500, n)


def test_hll_distinct_audit_contract(spark):
    """exact tiny groups sit in HLL's linear-counting regime (estimate ==
    exact); a 500-distinct group must land within the 3·rsd band — all
    flags TRUE, exact counts exact."""
    from cloudpelican_lsd_spark.operators.stats import hll_distinct_audit

    rows = [(i, "tiny", i % 3) for i in range(9)] + [
        (1000 + i, "wide", i) for i in range(500)
    ]
    ev = spark.createDataFrame(
        [(eid, et, float(uid), uid) for eid, et, uid in rows],
        "event_id long, event_type string, value double, user_id long",
    )
    got = {r.event_type: r for r in hll_distinct_audit(ev, rsd_pct=2).collect()}
    assert got["tiny"].exact_users == 3 and got["tiny"].within_bound
    assert got["wide"].exact_users == 500 and got["wide"].within_bound


def test_series_correlation_closed_form(spark):
    """two perfectly correlated series -> corr 1.0; one anti-correlated
    -> -1.0 against the first; constant series -> NULL corr; zero-fill
    covers a bucket where one type is silent."""
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 2, 1, 10, 0, 0)

    def add(t, minute, k):
        for i in range(k):
            rows.append((len(rows), base + dt.timedelta(minutes=minute, seconds=i), 1, t, 1.0, "{}"))

    # buckets at minutes 0,5,10 (300s): a = [1,2,3], b = [2,4,6], c = [3,2,1]
    for m, (ka, kb, kc) in zip((0, 5, 10), ((1, 2, 3), (2, 4, 2), (3, 6, 1))):
        add("a", m, ka)
        add("b", m, kb)
        add("c", m, kc)
    # d constant 1 per bucket; e present only in bucket 0 (zero-filled later)
    for m in (0, 5, 10):
        add("d", m, 1)
    add("e", 0, 2)
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).withColumn(
        "ts_epoch",
        __import__("pyspark.sql.functions", fromlist=["F"]).expr(
            "CAST(floor(unix_timestamp(ts)) AS BIGINT)"
        ),
    )
    from cloudpelican_lsd_spark.operators.stats import series_correlation

    got = {
        (r.type_a, r.type_b): r
        for r in series_correlation(ev, bucket_sec=300).collect()
    }
    assert got[("a", "b")].corr == 1.0
    assert got[("a", "c")].corr == -1.0
    assert got[("a", "d")].corr is None  # zero variance side
    # e = [2,0,0] vs a = [1,2,3]: negative but > -1
    assert -1.0 < got[("a", "e")].corr < 0
    assert got[("a", "b")].n == 3


def test_autocorrelation_closed_form(spark):
    """an alternating 2-bucket cycle has lag-1 corr -1 and lag-2 corr +1;
    constant series -> NULL."""
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 2, 1, 10, 0, 0)
    # 8 buckets of 300s: alternating counts 1,3,1,3,... for type 'alt'
    for j in range(8):
        k = 1 if j % 2 == 0 else 3
        for i in range(k):
            rows.append((len(rows), base + dt.timedelta(seconds=300 * j + i), 1, "alt", 1.0, "{}"))
    # constant type: 2 per bucket
    for j in range(8):
        for i in range(2):
            rows.append((len(rows), base + dt.timedelta(seconds=300 * j + i), 1, "const", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).withColumn(
        "ts_epoch",
        __import__("pyspark.sql.functions", fromlist=["F"]).expr(
            "CAST(floor(unix_timestamp(ts)) AS BIGINT)"
        ),
    )
    from cloudpelican_lsd_spark.operators.stats import autocorrelation

    got = {
        (r.event_type, r.lag): r.corr
        for r in autocorrelation(ev, bucket_sec=300, max_lag=2).collect()
    }
    assert got[("alt", 1)] == -1.0
    assert got[("alt", 2)] == 1.0
    assert got[("const", 1)] is None and got[("const", 2)] is None
