"""Standing-filter / grep predicates with the plain-word fast path.

The reference short-circuits plain-word regexes (``^[A-Za-z0-9_-]+$``)
through ``String.contains`` — "2-30x faster" — and hoists a ``(?i)`` prefix
into a single lowercase pass (reference: storm .../Filter.java:33-52,88-105).
Catalyst gives us the same physics: a literal ``contains``/``LIKE '%w%'``
compiles to ``StringContains`` inside whole-stage codegen, while ``rlike``
pays java.util.regex per row.  So the *planner* choice happens here, once,
at plan-construction time: plain word → ``contains`` (optionally over
``lower()``), everything else → ``rlike`` with ``find()`` substring
semantics (which is exactly what Spark's RLIKE implements).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

#: plain-word pattern eligible for the contains fast path
#: (reference: Filter.java:34 `^[a-zA-Z0-9-_]+$`)
#: \Z, not $ — $ would also match before a trailing newline (fullmatch needed)
_PLAIN_WORD_RE = re.compile(r"[A-Za-z0-9_-]+\Z")
_CASE_PREFIX = "(?i)"


def is_plain_word(pattern: str) -> bool:
    return bool(_PLAIN_WORD_RE.match(pattern))


@dataclass(frozen=True)
class GrepPredicate:
    """One grep stage: pattern + flags (reference: cli grepsql.go:16-27).

    ``invert`` ↔ ``-v``; ``case_insensitive`` ↔ ``-i``; ``regex`` ↔ ``-e``.
    Plain substring match unless ``regex`` is set.
    """

    pattern: str
    invert: bool = False
    case_insensitive: bool = False
    regex: bool = False

    def column(self, col: Column) -> Column:
        """Compile to a Spark boolean Column with the fast-path rewrite."""
        pat = self.pattern
        ci = self.case_insensitive
        if self.regex:
            # hoist (?i) the way the reference hoists it before compile
            # (Filter.java:36-41; grepsql.go injects `(?i)` for `-i -e`)
            if ci and not pat.startswith(_CASE_PREFIX):
                pat = _CASE_PREFIX + pat
            cond = col.rlike(pat)
        else:
            # plain substring — stays a StringContains in codegen, the same
            # fast path Filter.java:96 claims 2-30x for
            cond = (
                F.lower(col).contains(pat.lower()) if ci else col.contains(pat)
            )
        return ~cond if self.invert else cond

    def duckdb_sql(self, col: str = "_raw") -> str:
        """Equivalent DuckDB predicate (the oracle side).

        Substring stages use ``contains()`` — literal semantics identical
        to Spark's ``Column.contains`` with no metacharacters.  (A LIKE
        '%...%' formulation needs an explicit ESCAPE clause for `_`/`%`/
        `\\` — DuckDB has NO default escape char — and is easy to get
        subtly wrong; the reference emits LIKE only because BigQuery
        legacy SQL lacked contains().)
        """
        pat = self.pattern
        if self.regex:
            flags = ", 'i'" if self.case_insensitive else ""
            expr = f"regexp_matches({col}, '{_sq(pat)}'{flags})"
        else:
            if self.case_insensitive:
                expr = f"contains(lower({col}), '{_sq(pat.lower())}')"
            else:
                expr = f"contains({col}, '{_sq(pat)}')"
        return f"NOT ({expr})" if self.invert else expr


def _sq(s: str) -> str:
    return s.replace("'", "''")


def grep_column(preds: list[GrepPredicate], col: Column) -> Column:
    """AND-conjunction of grep stages (grepsql.go:177-182)."""
    out = None
    for p in preds:
        c = p.column(col)
        out = c if out is None else (out & c)
    if out is None:
        out = F.lit(True)
    return out


def grep_sql(preds: list[GrepPredicate], col: str = "_raw") -> str:
    return " AND ".join(p.duckdb_sql(col) for p in preds) if preds else "TRUE"
