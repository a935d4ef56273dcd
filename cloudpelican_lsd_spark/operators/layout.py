"""Data-layout optimization: Z-order (Morton) clustering and its
measurable data-skipping benefit.

Beyond-reference north-star operator (the reference stores results in
per-day BigQuery tables — one-dimensional layout; see SURVEY.md §2.1 S4).
At 100 TB the dominant cost of multi-dimensional predicates
(``user_id = U AND day BETWEEN a AND b``) is how many files a scan can
SKIP on min/max statistics.  A linear sort is perfect for its leading
dimension and useless for the others; Z-ordering interleaves the bits of
both keys so every chunk covers a small bounding box in BOTH dimensions.

`zorder_locality_audit` quantifies that: it chunks the table both ways
(linear time-then-user sort vs Morton order), computes each chunk's
(user, day) bounding box, and reports the summed box areas — directly
proportional to the expected number of chunks a 2-D point/range predicate
must touch.  Everything is exact integer math, so the audit value-hashes
against DuckDB.

Production notes: writing a Z-ordered table is
``df.withColumn("zkey", <morton expr>).repartitionByRange(N, "zkey")``
+ sortWithinPartitions — parquet min/max stats then give the skipping
this audit measures (the chunk assignment in production IS the range
partitioning).  The audit's chunking reproduces ``ntile`` EXACTLY but
distributed — two-level prefix sums over the value-domain-bounded key
histogram plus per-key row_number (``_exact_ntile_chunks``), so even
the measurement harness carries no partition-less window.
Bit-interleave is pure column arithmetic (`div`/`%`/constants): no UDF,
identical in Spark SQL and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloudpelican_lsd_spark.checkpoint import materialize

#: audit defaults: 8 user bits x 5 day bits, 50 chunks
ZORDER_XBITS = 8
ZORDER_YBITS = 5
ZORDER_CHUNKS = 50


def morton_sql(xcol: str, ycol: str, xbits: int, ybits: int, intdiv: str) -> str:
    """Bit-interleave expression (x bit b -> position 2b, y bit b ->
    2b+1) using only ``div``/``%``/constants — `intdiv` is the engine's
    integer-division spelling ('div' for Spark SQL, '//' for DuckDB)."""
    terms = []
    for b in range(xbits):
        terms.append(f"((({xcol}) {intdiv} {1 << b}) % 2) * {1 << (2 * b)}")
    for b in range(ybits):
        terms.append(f"((({ycol}) {intdiv} {1 << b}) % 2) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


def _exact_ntile_chunks(
    d: DataFrame, chunks: int, key_domain: int, coarse: int | None = None
) -> DataFrame:
    """``d`` (columns ``key``, ``event_id``, passthrough) + ``chunk`` =
    EXACT ``ntile(chunks) OVER (ORDER BY key, event_id)`` — computed
    distributed, with no partition-less window (round 5: the last
    unbounded global window in the registry, replaced per the
    global-window lint).

    How: the key histogram is bounded by the Morton-key VALUE DOMAIN
    (``2^(xbits+ybits)`` ≤ 8,192 at audit defaults), so a two-level
    prefix sum over it is cheap and bounded at ANY corpus size —
    coarse ``key div coarse`` buckets accumulate via a broadcast
    self-theta-join (~√domain² = domain lightweight pairs, no window),
    fine keys via a window PARTITIONED by coarse bucket (≤ ``coarse``
    rows each).  Each row's
    global rank is then ``cum_before(key) + row_number within key`` (a
    window partitioned by the 8,192-value key — the standard scalable
    shape), and NTILE's tile-size arithmetic is replicated in closed
    form: the first ``N % chunks`` tiles hold ``N div chunks + 1`` rows,
    the rest ``N div chunks``.

    ``coarse`` (the coarse-bucket WIDTH) defaults to ``isqrt(key_domain)``
    so both levels stay balanced at ~√domain rows whatever the domain —
    the theta-join side and each fine partition grow as the square root,
    never linearly.
    """
    if coarse is None:
        import math

        coarse = max(1, math.isqrt(key_domain))
    hist = d.groupBy("key").agg(F.count(F.lit(1)).alias("kc"))
    ch = hist.withColumn("cb", F.expr(f"key div {coarse}")).groupBy("cb").agg(
        F.sum("kc").alias("cc")
    )
    a, b = ch.alias("a"), ch.alias("b")
    cbase = (
        a.join(F.broadcast(b), F.col("b.cb") <= F.col("a.cb"))
        .groupBy(F.col("a.cb").alias("cb"), F.col("a.cc").alias("cc"))
        .agg(F.sum(F.col("b.cc")).alias("ccum"))
        .select("cb", (F.col("ccum") - F.col("cc")).alias("cbase"))
    )
    wf = (
        Window.partitionBy("cb")
        .orderBy("key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    key_base = (
        hist.withColumn("cb", F.expr(f"key div {coarse}"))
        .join(F.broadcast(cbase), "cb")
        .withColumn("fcum", F.sum("kc").over(wf))
        .select(
            "key",
            (F.col("cbase") + F.col("fcum") - F.col("kc")).alias("kbase"),
        )
    )
    total = hist.agg(F.sum("kc").alias("n_total"))
    wr = Window.partitionBy("key").orderBy("event_id")
    ranked = (
        d.join(F.broadcast(key_base), "key")
        .withColumn("rn", F.row_number().over(wr))
        .withColumn("r", F.col("kbase") + F.col("rn"))
        .crossJoin(F.broadcast(total))
    )
    # ntile arithmetic: big = N % chunks tiles of size sb, then size ss
    return ranked.selectExpr(
        "*",
        f"""CASE WHEN r <= (n_total % {chunks}) * (n_total div {chunks} + 1)
             THEN (r + (n_total div {chunks} + 1) - 1)
                  div (n_total div {chunks} + 1)
             ELSE (n_total % {chunks})
                  + (r - (n_total % {chunks}) * (n_total div {chunks} + 1)
                     + greatest(n_total div {chunks}, 1) - 1)
                    div greatest(n_total div {chunks}, 1)
        END AS chunk""",
    ).drop("kbase", "rn", "r", "n_total")


def zorder_locality_audit(
    events: DataFrame,
    xbits: int = ZORDER_XBITS,
    ybits: int = ZORDER_YBITS,
    chunks: int = ZORDER_CHUNKS,
) -> DataFrame:
    """`(layout, n_chunks, sum_span_x, sum_span_y, sum_bbox_area)` — one
    row for the linear (day, user) sort and one for the Morton order.

    How to read it: ``sum_span_x / X`` is the expected chunks touched by
    a ``user_id = U`` predicate, ``sum_span_y / Y`` by a day predicate,
    ``sum_bbox_area / (X·Y)`` by a 2-D point predicate.  The linear sort
    is perfect on its leading dimension and skips NOTHING on the other
    (every chunk spans all users); Morton order buys orders-of-magnitude
    skipping on the non-leading dimension at a modest cost on the
    leading one (measured at sf0.01: user-span 6255 -> 866, day-span
    81 -> 687) — the right trade whenever queries filter on more than
    one dimension.  Requires ``ts_epoch`` (long seconds) and ``user_id``
    columns (sources.tables.load_table's events schema).
    """
    # r8 (guide §2.4/§5): materialize the compact (x, y, event_id)
    # projection ONCE.  Both layout passes and every consumer inside
    # _exact_ntile_chunks (histogram, ranked join) otherwise re-read the
    # events scan — 6 static parquet scans for one audit.  The
    # projection is three small ints per event, strictly fewer bytes
    # than six column-pruned scans at any scale.  Interleaved A/B at
    # sf0.1: 3.66 -> 2.66 s median, 5/5 pairwise.  localCheckpoint
    # locally; reliable checkpoint() on a real cluster.
    d = events.select(
        (F.col("user_id") % (1 << xbits)).alias("x"),
        F.expr("(ts_epoch div 86400) % " + str(1 << ybits)).alias("y"),
        "event_id",
    ).transform(materialize)
    out = []
    for layout, key in (
        ("linear_day_user", F.expr("y * " + str(1 << xbits) + " + x")),
        (
            "zorder",
            F.expr(morton_sql("x", "y", xbits, ybits, "div")),
        ),
    ):
        chunked = _exact_ntile_chunks(
            d.withColumn("key", key), chunks, key_domain=1 << (xbits + ybits)
        )
        boxes = chunked.groupBy("chunk").agg(
            (F.max("x") - F.min("x") + 1).alias("sx"),
            (F.max("y") - F.min("y") + 1).alias("sy"),
        )
        out.append(
            boxes.agg(
                F.lit(layout).alias("layout"),
                F.count(F.lit(1)).cast("long").alias("n_chunks"),
                F.sum("sx").cast("long").alias("sum_span_x"),
                F.sum("sy").cast("long").alias("sum_span_y"),
                F.sum(F.col("sx") * F.col("sy")).cast("long").alias("sum_bbox_area"),
            )
        )
    return out[0].unionByName(out[1])


def zorder_locality_oracle(
    xbits: int = ZORDER_XBITS,
    ybits: int = ZORDER_YBITS,
    chunks: int = ZORDER_CHUNKS,
) -> str:
    morton = morton_sql("x", "y", xbits, ybits, "//")
    body = []
    for layout, key in (
        ("linear_day_user", f"y * {1 << xbits} + x"),
        ("zorder", morton),
    ):
        body.append(f"""(
  SELECT '{layout}' AS layout, COUNT(*)::BIGINT AS n_chunks,
         SUM(sx)::BIGINT AS sum_span_x, SUM(sy)::BIGINT AS sum_span_y,
         SUM(sx * sy)::BIGINT AS sum_bbox_area
  FROM (
    SELECT chunk, MAX(x) - MIN(x) + 1 AS sx, MAX(y) - MIN(y) + 1 AS sy
    FROM (
      SELECT x, y,
             ntile({chunks}) OVER (ORDER BY ({key}) ASC, event_id ASC) AS chunk
      FROM zd
    ) GROUP BY chunk
  )
)""")
    return (
        f"""WITH zd AS (
  SELECT event_id,
         user_id % {1 << xbits} AS x,
         (CAST(floor(epoch(ts)) AS BIGINT) // 86400) % {1 << ybits} AS y
  FROM events
)
"""
        + "\nUNION ALL\n".join(body)
    )
