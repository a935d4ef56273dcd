"""Registration core: the QUERIES/ORACLES/UNGATED dicts and the
@register decorators every family module feeds (split out of the single
4,800-line registry.py in round 5 — VERDICT r4 item 7)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Library-surface queries kept OUT of the driver contract: rows-only by
#: design (approximate sketches / stateful numpy analyzers with no
#: SQL-expressible value oracle).  A gate entry that *cannot* hash-match is
#: a guaranteed red row, so these live here — still benched, still
#: pytest-covered, and each has a fully-oracled contract twin in QUERIES
#: (distinct_users_hll_audit; the seven relational outlier-analyzer twins).
UNGATED: dict[str, QueryFn] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def register_ungated(name: str):
    def deco(fn: QueryFn) -> QueryFn:
        UNGATED[name] = fn
        return fn

    return deco


#: Query-name prefix -> operator family — the ONE definition shared by
#: the lockstep gate test (family coverage over window + CORRECTNESS
#: rows) and tools/coverage_ledger.py's freshness-debt dashboard.  A
#: divergent copy in either place would let the dashboard schedule
#: window rotations from staleness data the gate doesn't enforce.
FAMILIES: dict[str, str] = {
    "grep_": "grep", "filter_fanout": "fanout", "show_filters": "catalog",
    "select_where": "select", "stats_": "stats", "tail_": "tail",
    "parse_": "parse", "naive_bayes": "classifier", "search_": "search",
    "events_": "events", "topk_": "window", "distinct_users": "distinct",
    "user_day_setops": "setops", "outlier_": "outliers", "dedup_": "dedup",
    "simhash_": "simhash", "corpus_": "corpus", "emb_": "similarity",
    "text_": "text", "logs_": "logs", "multimodal_": "multimodal",
    "json_": "json",
}


def family_of(name: str) -> str:
    """Operator family for a query name ('other' when no prefix maps)."""
    for prefix, fam in FAMILIES.items():
        if name.startswith(prefix):
            return fam
    return "other"
