from __future__ import annotations

import pytest

from cloudpelican_lsd_spark.functions.predicates import GrepPredicate, is_plain_word
from cloudpelican_lsd_spark.operators.grep_pipeline import GrepPipeline
from cloudpelican_lsd_spark.sources.tables import logs_view


def test_parse_flagship():
    p = GrepPipeline.parse(
        "cat errors | grep -v 404 | grep -i checkout | grep -e '(100|200)' | grep -v -i -e '404'"
    )
    assert p.source == "errors"
    assert len(p.greps) == 4
    assert p.greps[0] == GrepPredicate("404", invert=True)
    assert p.greps[1] == GrepPredicate("checkout", case_insensitive=True)
    assert p.greps[2] == GrepPredicate("(100|200)", regex=True)
    assert p.greps[3] == GrepPredicate("404", invert=True, case_insensitive=True, regex=True)


def test_parse_sort_head_limit():
    p = GrepPipeline.parse("cat f | sort | head")
    assert p.sort and not p.sort_desc and p.limit == 10
    p = GrepPipeline.parse("cat f | sort - r | limit 7")
    assert p.sort_desc and p.limit == 7


@pytest.mark.parametrize(
    "bad",
    ["", "cat", "cat f | grp x", "cat f | grep", "cat f | limit x", "cat f | grep a b"],
)
def test_parse_errors(bad):
    with pytest.raises(ValueError):
        GrepPipeline.parse(bad)


def test_plain_word_detection():
    assert is_plain_word("error")
    assert is_plain_word("abc_DEF-9")
    assert not is_plain_word("(100|200)")
    assert not is_plain_word("a b")


def test_fast_path_plan_uses_contains(spark, sf_dir):
    """Plain-word grep must compile to Contains, not RLike (Filter.java:96)."""
    logs = logs_view(spark, sf_dir)
    plan = GrepPipeline.parse("cat f | grep error").apply(logs)._jdf.queryExecution().executedPlan().toString()
    assert "Contains" in plan or "contains" in plan
    assert "RLIKE" not in plan and "rlike" not in plan


def test_grep_matches_python_semantics(spark, sf_dir):
    """Cross-check grep output against a pure-Python reimplementation."""
    import re

    logs = logs_view(spark, sf_dir)
    raw = [r[0] for r in logs.select("_raw").collect()]
    got = {
        r[0]
        for r in GrepPipeline.parse("cat f | grep -v click | grep -i ERROR")
        .apply(logs)
        .collect()
    }
    want = {s for s in raw if "click" not in s and "error" in s.lower()}
    assert got == want

    got_rx = {
        r[0]
        for r in GrepPipeline.parse("cat f | grep -e 'value=1[0-9]{2} '")
        .apply(logs)
        .collect()
    }
    want_rx = {s for s in raw if re.search(r"value=1[0-9]{2} ", s)}
    assert got_rx == want_rx


def test_extract_event_time_tolerates_any_fraction_width(spark):
    from cloudpelican_lsd_spark.functions.parse import extract_event_time
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("2026-08-13T12:00:00.12Z x",),       # 2-digit fraction
            ("2026-08-13T12:00:00.123456789Z x",),  # nanos
            ("2026-08-13T12:00:00.123+02:00 x",),  # millis + offset
            ("2026-08-13T12:00:00 x",),            # no fraction
            ("no timestamp at all",),
        ],
        ["_raw"],
    )
    got = df.select(extract_event_time(F.col("_raw")).alias("ts")).collect()
    vals = [str(r.ts) for r in got]
    assert vals[0] == "2026-08-13 12:00:00.120000"
    assert vals[1] == "2026-08-13 12:00:00.123456"  # truncated to micros
    assert vals[2] == "2026-08-13 12:00:00.123000"
    assert vals[3] == "2026-08-13 12:00:00"
    assert got[4].ts is None


def test_extract_event_time_invalid_calendar_is_null_not_crash(spark):
    """The digit classes in ISO8601_RE admit month 13 / hour 99 / Feb 31;
    under ANSI mode (Spark 4 default) an unguarded to_timestamp_ntz
    aborts the WHOLE query on one such line.  Invalid-but-matched
    timestamps must parse to NULL (the processing-time fallback) instead."""
    from pyspark.sql import functions as F

    from cloudpelican_lsd_spark.functions.parse import extract_event_time

    df = spark.createDataFrame(
        [
            ("x 2024-13-45T99:99:99 y",),   # month 13, hour 99
            ("2024-02-31T10:00:00 feb31",),  # calendar-invalid day
            ("ok 2024-02-01T10:00:00Z",),
        ],
        ["_raw"],
    )
    got = df.select(extract_event_time(F.col("_raw")).alias("ts")).collect()
    assert got[0].ts is None and got[1].ts is None
    assert str(got[2].ts) == "2024-02-01 10:00:00"


def test_sniff_log_type_reference_semantics(spark):
    from cloudpelican_lsd_spark.functions.parse import sniff_log_type
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "x 2001-07-04T12:08:56.235-07:00 rsyslog line"),
            (2, "sub-ms ok 2001-07-04T12:08:56.23599+02:00 y"),
            (3, "2001-07-04T12:08:56 no millis -> unknown"),
            (4, "no timestamp at all"),
            (5, "2001-07-04T12:08:56.235Z zulu offset unsupported by sniffer"),
        ],
        "i long, _raw string",
    )
    got = {r.i: r.t for r in df.select("i", sniff_log_type(F.col("_raw")).alias("t")).collect()}
    assert got == {1: "rsyslog", 2: "rsyslog", 3: "unknown", 4: "unknown", 5: "unknown"}
