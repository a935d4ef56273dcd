"""As-of (most-recent-prior) join — a custom operator Spark lacks.

The reference implements no joins at all (SURVEY.md §2.3); this is one of
the beyond-the-reference operators a log/metrics engine needs constantly:
attribute each observation to the latest preceding fact — error → last
deploy, event → last config change, trade → last quote (the classic
time-series formulation).

Spark has no native ASOF JOIN (DuckDB/Pandas do), and the naive
formulations collapse at scale:

- equi-join on key + ``r.ts <= l.ts`` + row_number to keep the max is a
  many-to-many explosion (every left row × every earlier right row)
  before the filter;
- a theta band join is a BroadcastNestedLoopJoin unless one side is tiny;
- per-key ``applyInPandas`` + ``pandas.merge_asof`` works but moves every
  row through Arrow into Python.

The scalable relational shape is the **union-merge**: tag both inputs,
union them, and carry the right side's values forward over one
``PARTITION BY key ORDER BY (ts, side)`` window with
``last(value, ignoreNulls=True)``.  Each left row then holds the values
of the latest right row with ``r.ts <= l.ts``.  Physical plan: ONE
shuffle (hash by key), one per-partition sort, whole-stage codegen
throughout — rows never multiply, no Python.  Right rows ordered before
left rows at equal timestamps, so a same-instant fact is visible
("at-or-before" semantics, matching DuckDB ``ASOF JOIN`` with ``>=``).

At 100 TB: the shuffle is keyed by the join key (users/hosts — high
cardinality), AQE splits skewed keys, and the window sort spills to disk
per partition.  This beats the pairwise formulations by the ratio of
right-rows-per-key (often thousands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts: str = "ts_epoch",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of-backward join: every ``left`` row gains each
    ``value_cols`` column from the latest ``right`` row of the same
    ``keys`` with ``right.ts <= left.ts`` (NULL when no such row).

    Precondition: ``right`` has at most one row per ``(keys, ts)`` —
    pre-aggregate otherwise (ties would be nondeterministic in any
    engine; DuckDB's ASOF has the same caveat).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != ts
    ]
    clash = set(value_cols) & set(left.columns)
    if clash:  # a stripped assert (-O) would yield ambiguous output columns
        raise ValueError(f"value_cols must not collide with left columns: {clash}")
    if "_ts" in value_cols:
        # the carried struct names its timestamp field "_ts" — a value
        # column with that name would create a duplicate struct field and
        # make getField("_ts") ambiguous
        raise ValueError(
            "value_cols must not contain '_ts' (reserved for the carried "
            "fact timestamp) — rename the column before the join"
        )
    # backtick-quote EVERY column reference (keys/ts/values/left): a
    # bare string with a dot ("payload.kind") would otherwise be parsed
    # as a nested field path; embedded backticks escape by doubling
    def _qcol(c: str):
        return F.col("`" + c.replace("`", "``") + "`")

    r = right.select(
        *[_qcol(k) for k in keys],
        _qcol(ts),
        *[_qcol(c) for c in value_cols],
        F.lit(0).alias("_side"),
    )
    l = left.select(
        *[_qcol(c) for c in left.columns], F.lit(1).alias("_side")
    )
    u = r.unionByName(l, allowMissingColumns=True)
    w = (
        Window.partitionBy(*[_qcol(k) for k in keys])
        .orderBy(_qcol(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE struct carries (ts, values...) atomically: the struct is
    # non-null for every right row even when its fields are NULL, so a
    # right row holding a legitimate NULL value still advances every
    # asof_* column together.  (Per-column last(value, ignoreNulls)
    # would skip the NULL column but advance asof_ts — the output pair
    # could then mix two different right rows.)
    fact = F.last(
        F.when(
            F.col("_side") == 0,
            F.struct(_qcol(ts).alias("_ts"), *[_qcol(c) for c in value_cols]),
        ),
        ignorenulls=True,
    ).over(w)
    carried = u.select("*", fact.alias("_fact"))
    # getField, not the "_fact.<c>" string path: a value column whose
    # name contains a dot would be parsed as a nested path and fail
    fact_col = F.col("_fact")
    return carried.where(F.col("_side") == 1).select(
        *[_qcol(c) for c in left.columns],
        *[fact_col.getField(c).alias(f"asof_{c}") for c in value_cols],
        fact_col.getField("_ts").alias("asof_ts"),
    )
