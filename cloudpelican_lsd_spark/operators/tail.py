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


def topk_per_group_salted(
    df: DataFrame,
    key: str = "event_type",
    value: str = "value",
    id_col: str = "event_id",
    k: int = 3,
    salt_buckets: int = 64,
) -> DataFrame:
    """Exact top-k rows per group, skew-proof.

    A ``row_number() OVER (PARTITION BY key)`` window shuffles every row
    of a group into ONE reducer — with few distinct keys (here: a handful
    of event types over 100 TB) that is a straggler by construction.  This
    plan salts the key into `salt_buckets` sub-groups, takes a per-salt
    top-k (hash aggregate, map-side partial), then reduces the ≤
    salt_buckets·k survivors per key to the final top-k — the global top-k
    is necessarily a subset of the per-salt top-ks.

    Ordering: value DESC, id ASC (ties) — encoded as an ascending struct
    sort on (-value, id); double negation is sign-exact in IEEE 754.

    Domain: NULL values are dropped up front (a DESC window ranks them
    last; under the struct sort they would rank first).  NaN values are
    not supported — Spark's window ordering puts NaN above every number
    while -NaN sorts last ascending; pre-filter with ``isnan`` if the
    column can contain them.
    """
    df = df.where(F.col(value).isNotNull())
    neg = F.struct((-F.col(value)).alias("nv"), F.col(id_col).alias("eid"))
    partial = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
        )
        .groupBy(key, "_salt")
        .agg(F.slice(F.sort_array(F.collect_list(neg)), 1, k).alias("top"))
    )
    return (
        partial.select(key, F.explode("top").alias("t"))
        .groupBy(key)
        .agg(F.slice(F.sort_array(F.collect_list("t")), 1, k).alias("top"))
        .select(key, F.explode("top").alias("t"))
        .select(
            key,
            F.col("t.eid").alias(id_col),
            (-F.col("t.nv")).alias(value),
        )
    )


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
