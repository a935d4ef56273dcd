"""Standing-filter fan-out: every log line × every matching filter.

The reference tests each line against every live filter and emits one
tuple per match (storm .../MatchBolt.java:189-202).  Semantically that is
a **broadcast nested-loop join** between the unbounded log stream and the
tiny filters dimension with an RLIKE theta-predicate — so that's exactly
the plan we build.  At 100 TB the filters side is always a handful of
rows: `broadcast()` pins it to BroadcastNestedLoopJoin, no shuffle of the
log side, and the predicate runs inside codegen.

The contains-vs-regex fast path (Filter.java:33-52,88-105) is encoded in
catalog columns (`plain_word`, `plain_ci`) so the join predicate takes the
cheap branch per filter without leaving the single join plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: join predicate with per-filter fast path:
#: plain filters use substring contains, regex filters use RLIKE
#: (RLIKE on a literal-per-row pattern: Spark caches compiled patterns).
_MATCH_COND = (
    "(CASE WHEN plain_word IS NOT NULL THEN "
    " CASE WHEN plain_ci THEN contains(lower(_raw), plain_word) "
    " ELSE contains(_raw, plain_word) END "
    "ELSE _raw RLIKE regex END)"
)

MATCH_COND_DUCKDB = (
    "(CASE WHEN plain_word IS NOT NULL THEN "
    " CASE WHEN plain_ci THEN contains(lower(_raw), plain_word) "
    " ELSE contains(_raw, plain_word) END "
    "ELSE regexp_matches(_raw, regex) END)"
)


def match_filters(logs: DataFrame, filters: DataFrame) -> DataFrame:
    """`(filter_id, filter_name, _raw, ts_epoch, ...)` — one row per
    (line, matching filter), i.e. MatchBolt's fan-out as one join plan."""
    f = F.broadcast(
        filters.select(
            F.col("id").alias("filter_id"),
            F.col("name").alias("filter_name"),
            "regex",
            "plain_word",
            "plain_ci",
        )
    )
    return logs.join(f, on=F.expr(_MATCH_COND), how="inner").drop(
        "regex", "plain_word", "plain_ci"
    )


def match_counts(logs: DataFrame, filters: DataFrame) -> DataFrame:
    """Matches per filter — the MATCH metric feed (MatchBolt.java:198)."""
    return (
        match_filters(logs, filters)
        .groupBy("filter_id", "filter_name")
        .agg(F.count(F.lit(1)).alias("match_cnt"))
    )
