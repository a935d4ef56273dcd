"""Interval (range) join — point-in-window pairing at scale.

The reference has no joins at all (SURVEY.md §2.3), but its outlier and
attribution workflows imply the question "which events fall inside this
time window" constantly.  Spark has no native range join either: the
naive formulation ``l JOIN r ON l.key = r.key AND l.ts BETWEEN r.lo AND
r.hi`` plans as a hash join on ``key`` whose matched groups are then
filtered — fine when keys are selective, catastrophic when they are not
(and a full BroadcastNestedLoopJoin when there is no equi-key at all).

The scalable shape is **bucketized equi-join**: chop the time axis into
fixed buckets, explode each interval into the bucket ids it covers, tag
each point with its bucket id, equi-join on ``(keys..., bucket)``, then
apply the exact range predicate.  The join key becomes compact and
uniformly distributed; the explosion factor is bounded by
``span / bucket_s + 1`` (pick ``bucket_s`` near the typical span, so the
factor is ~2).  This is the same trick Databricks' range-join hint and
KDB's band joins use.

Physical plan: one shuffle per side keyed on ``(keys, bucket)`` — small
ints, never raw payloads — a sort-merge or hash join, and the residual
``BETWEEN`` filter inside codegen.  At 100 TB the bucket key spreads
evenly (time is dense), AQE handles hot buckets, and no row leaves the
JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str = "ts_epoch",
    start: str = "start_epoch",
    end: str = "end_epoch",
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner-join every ``points`` row to each ``intervals`` row of the
    same ``keys`` whose ``[start, end]`` (inclusive) contains
    ``point_ts``.  Overlapping intervals yield one output row per match
    (plain SQL range-join semantics).

    ``bucket_s`` tunes the explosion factor: each interval contributes
    ``(end - start) / bucket_s + 1`` exploded rows; choose it at or above
    the typical interval span.
    """
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be positive, got {bucket_s}")
    ivl = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start} div {bucket_s}"),
                F.expr(f"{end} div {bucket_s}"),
            )
        ),
    )
    pts = points.withColumn("_bucket", F.expr(f"{point_ts} div {bucket_s}"))
    cond = [pts["_bucket"] == ivl["_bucket"]] + [
        pts[k] == ivl[k] for k in keys
    ]
    joined = pts.join(ivl, cond, "inner").where(
        (pts[point_ts] >= ivl[start]) & (pts[point_ts] <= ivl[end])
    )
    out_cols = (
        [pts[c] for c in points.columns]
        + [ivl[c] for c in intervals.columns if c not in keys]
    )
    return joined.select(*out_cols)
