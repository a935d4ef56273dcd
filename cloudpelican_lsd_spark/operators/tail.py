"""Tail / cursor reads over the results buffer.

- ``tail f`` keeps the **last N** rows of the matched stream and prints
  them oldest-first (cli/cloudpelican-lsd.go:630-636).
- Offset-cursor pagination returns rows with ``id > offset`` plus the new
  max offset (cli/cloudpelican-lsd.go:567-608; supervisor.go:473-512).
  The reference's auto-increment row id (filter_manager.go:298-312) maps to
  any monotone unique column — here ``event_id``.

Top-K note: ``orderBy(ts desc).limit(n)`` compiles to TakeOrderedAndProject
— a per-partition top-N + merge, no global sort — which is the right
physical plan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tail_last_n(
    df: DataFrame,
    n: int,
    ts_col: str = "ts_epoch",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Last N by event time (tiebroken for determinism), re-sorted ascending
    like the CLI prints them."""
    last = df.orderBy(F.col(ts_col).desc(), F.col(tiebreak_col).desc()).limit(n)
    return last.orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())


def cursor_read(
    df: DataFrame,
    offset: int,
    limit: int,
    id_col: str = "event_id",
) -> DataFrame:
    """Rows with id > offset, oldest-first, capped at `limit`
    (supervisor.go:473-512 cursor semantics)."""
    return (
        df.where(F.col(id_col) > F.lit(offset))
        .orderBy(F.col(id_col).asc())
        .limit(limit)
    )
