from __future__ import annotations

import pytest

from cloudpelican_lsd_spark.catalog import FilterCatalog, compile_fast_path, demo_catalog
from cloudpelican_lsd_spark.operators.fanout import match_filters
from cloudpelican_lsd_spark.sources.tables import logs_view


def test_fast_path_compile():
    assert compile_fast_path("error") == ("error", False)
    assert compile_fast_path("(?i)Error") == ("error", True)
    assert compile_fast_path("(100|200)") == (None, False)
    assert compile_fast_path("(?i)(100|200)") == (None, True)


def test_catalog_crud_and_naming():
    cat = FilterCatalog()
    f = cat.create("errors", "error")
    assert cat.get("errors").id == f.id
    with pytest.raises(ValueError):
        cat.create("Bad Name", "x")
    with pytest.raises(ValueError):
        cat.create("ab0a4a52-7b2b-4a8f-bbf2-a2c2f3f2b000", "x")  # uuid-ish
    t = cat.create_temp("xyz", 1700000000)
    assert t.name.startswith("__tmp__")
    assert t.name not in [x.name for x in cat.list()]  # hidden from list
    assert t.name in [x.name for x in cat.list(include_temp=True)]
    cat.drop("errors")
    assert "errors" not in [x.name for x in cat.list()]


def test_fanout_matches_each_filter_semantics(spark, sf_dir):
    logs = logs_view(spark, sf_dir)
    matched = match_filters(logs, demo_catalog().to_df(spark))
    counts = {r.filter_name: r.cnt for r in matched.groupBy("filter_name").count().withColumnRenamed("count", "cnt").collect()}
    raw = [r[0] for r in logs.select("_raw").collect()]
    import re

    assert counts.get("errors", 0) == sum("error" in s for s in raw)
    assert counts.get("purchases_ci", 0) == sum("purchase" in s.lower() for s in raw)
    assert counts.get("clicks_or_signups", 0) == sum(
        bool(re.search("(click|signup)", s)) for s in raw
    )
    assert "nomatch" not in counts


def test_fanout_plan_is_broadcast(spark, sf_dir):
    logs = logs_view(spark, sf_dir)
    plan = (
        match_filters(logs, demo_catalog().to_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan


def test_temp_filter_ttl_expiry():
    from cloudpelican_lsd_spark.catalog import FilterCatalog

    cat = FilterCatalog()
    cat.create("keep", "x")
    cat.create_temp("a", 1000)
    cat.create_temp("b", 9000)
    dropped = cat.expire_temp(now_unix=10000, ttl_sec=3600)
    assert dropped == ["__tmp__1000"]
    names = {f.name for f in cat.list(include_temp=True)}
    assert names == {"keep", "__tmp__9000"}
