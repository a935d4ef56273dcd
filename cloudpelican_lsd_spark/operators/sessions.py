"""Gap-based sessionization of the event stream.

The reference has no session concept — its closest construct is the
per-filter time-bucketing (reference: storm RollupStatsBolt.java:86,
cli/supervisorcon.go:86-89), which buckets by wall-clock, not by activity
gaps.  Sessionization is a first-class need for the training-data /
analytics side (user journeys, rate-limiting windows, per-session token
accounting), so the engine provides it as a native operator.

Spark-first shape: two analytic window functions over one
``PARTITION BY user_id ORDER BY (ts_epoch, event_id)`` sort — a LAG to
flag gap starts and a running SUM to number sessions — then a hash
aggregate per ``(user_id, session_idx)``.  Physical plan: exactly one
shuffle (hash-partition by ``user_id``); the session aggregation reuses
the same partitioning, so Catalyst plans it without a second exchange.

At 100 TB this is the canonical sessionization plan: the shuffle is keyed
by the user dimension (high cardinality → even spread; AQE skew-split
handles hot users), per-partition sort spills gracefully, and everything
runs in whole-stage codegen — no Python, no state store.  The streaming
analog is ``session_window(ts, gap)`` in a watermarked streaming
aggregation, which shares the gap-merge semantics implemented here.

The ``event_id`` tiebreak makes the intra-user order total (``ts_epoch``
is second-truncated, so same-second events would otherwise order
nondeterministically between engines — cross-engine hash-compare
requires a total order anywhere LAG/running-SUM is involved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: default inactivity gap that closes a session (industry-standard 30 min)
SESSION_GAP_S = 1800


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """`(user_id, session_idx, start_epoch, end_epoch, n_events,
    duration_s, n_errors)` — one row per user session, where a gap of
    more than ``gap_s`` seconds between consecutive events starts a new
    session.  ``session_idx`` is 1-based per user in time order.

    Expects the ``ts_epoch`` BIGINT column provided by
    :func:`cloudpelican_lsd_spark.sources.tables.load_table`.
    """
    w = Window.partitionBy("user_id").orderBy("ts_epoch", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts_epoch") - F.lag("ts_epoch").over(w)
    flagged = events.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_epoch",
        F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0).alias("is_new"),
    )
    with_idx = flagged.withColumn("session_idx", F.sum("is_new").over(run))
    return with_idx.groupBy("user_id", "session_idx").agg(
        F.min("ts_epoch").alias("start_epoch"),
        F.max("ts_epoch").alias("end_epoch"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_epoch") - F.min("ts_epoch")).alias("duration_s"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_errors"),
    )


def sessionize_oracle(gap_s: int = SESSION_GAP_S) -> str:
    """DuckDB oracle for :func:`sessionize` over the ``events`` view."""
    return f"""ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
  FROM events
),
flags AS (
  SELECT *,
         CASE WHEN ts_epoch - LAG(ts_epoch) OVER w > {gap_s}
                   OR LAG(ts_epoch) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_epoch, event_id)
),
sess AS (
  SELECT *,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_epoch, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flags
)"""
