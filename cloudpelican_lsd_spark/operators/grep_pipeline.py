"""The grep→plan compiler: ``cat f | grep [-v|-i|-e] p | sort [- r] | head | limit N``.

A from-scratch Python implementation of the reference CLI's pipeline
grammar (reference: cli/grepsql.go:61-199 — first token is the filter
name; ``|``-separated stages ``grep [flags] pattern`` / ``sort [- r]`` /
``head`` / ``limit N``; grep stages AND-ed at grepsql.go:177-182).

Where the reference emits a BigQuery SQL *string* and ships it over two
process hops, we emit a DataFrame plan directly: Catalyst then does
predicate pushdown / column pruning / codegen on it.  ``to_duckdb_sql``
emits the equivalent ANSI SQL used as the correctness oracle.

Divergence from the reference (documented, intended semantics):
``sort`` orders by ``_raw`` as the code actually does (grepsql.go:186-188;
the header comment at grepsql.go:3 claims ``ts`` — we follow the code).
``head`` → LIMIT 10 (grepsql.go:70-72).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.functions.predicates import (
    GrepPredicate,
    grep_column,
    grep_sql,
)

_HEAD_LIMIT = 10  # grepsql.go:70-72


@dataclass
class GrepPipeline:
    """Parsed pipeline: source filter name + stages."""

    source: str
    greps: list[GrepPredicate] = field(default_factory=list)
    sort: bool = False
    sort_desc: bool = False
    limit: int | None = None

    # -- parsing ------------------------------------------------------------

    @classmethod
    def parse(cls, pipeline: str) -> "GrepPipeline":
        stages = [s.strip() for s in pipeline.split("|")]
        # regex alternation like `(100|200)` inside quotes would be split —
        # re-join fragments with unbalanced quotes
        stages = _rejoin_quoted(stages)
        if not stages or not stages[0]:
            raise ValueError("empty pipeline")
        head = stages[0].split()
        # accept both `cat <name>` and bare `<name>` as the source
        if head[0] == "cat":
            if len(head) != 2:
                raise ValueError("usage: cat <filter>")
            source = head[1]
        else:
            source = head[0]
        p = cls(source=source)
        for stage in stages[1:]:
            toks = _split_stage(stage)
            if not toks:
                raise ValueError("empty pipeline stage")
            cmd, args = toks[0], toks[1:]
            if cmd == "grep":
                p.greps.append(_parse_grep(args))
            elif cmd == "sort":
                p.sort = True
                # `sort - r` → reverse (grepsql.go:111-112)
                p.sort_desc = args[:2] == ["-", "r"] or args[:1] == ["-r"]
            elif cmd == "head":
                p.limit = _HEAD_LIMIT
            elif cmd == "limit":
                if len(args) != 1 or not args[0].isdigit():
                    raise ValueError("usage: limit <n>")
                p.limit = int(args[0])
            else:
                raise ValueError(f"unknown pipeline command: {cmd!r}")
        return p

    # -- compilation --------------------------------------------------------

    def apply(self, logs: DataFrame, col: str = "_raw") -> DataFrame:
        """Compile onto a log DataFrame → `SELECT _raw ... ` plan.

        Mirrors the emitted SQL shape `SELECT _raw FROM t WHERE .. ORDER BY
        .. LIMIT ..` (grepsql.go:161-198); the `select * → _raw` rewrite is
        reference behavior (cli/cloudpelican-lsd.go:339).
        """
        out = logs.where(grep_column(self.greps, F.col(col))).select(col)
        if self.sort:
            out = out.orderBy(F.col(col).desc() if self.sort_desc else F.col(col).asc())
        if self.limit is not None:
            out = out.limit(self.limit)
        return out

    def to_duckdb_sql(self, table: str = "logs", col: str = "_raw") -> str:
        sql = f"SELECT {col} FROM {table}"
        if self.greps:
            sql += f" WHERE {grep_sql(self.greps, col)}"
        if self.sort:
            # explicit null ordering: Spark ASC is NULLS FIRST / DESC is
            # NULLS LAST; DuckDB defaults to NULLS LAST for both — without
            # this a NULL _raw under LIMIT diverges between the engines
            nulls = "NULLS LAST" if self.sort_desc else "NULLS FIRST"
            sql += f" ORDER BY {col} {'DESC' if self.sort_desc else 'ASC'} {nulls}"
        if self.limit is not None:
            sql += f" LIMIT {self.limit}"
        return sql


def _parse_grep(args: list[str]) -> GrepPredicate:
    """grep flags: -v invert, -i case-insensitive, -e regex
    (grepsql.go:113-122)."""
    invert = ci = rx = False
    pattern = None
    for a in args:
        if a == "-v":
            invert = True
        elif a == "-i":
            ci = True
        elif a == "-e":
            rx = True
        elif pattern is None:
            pattern = a
        else:
            raise ValueError(f"grep: unexpected token {a!r}")
    if pattern is None:
        raise ValueError("grep: missing pattern")
    return GrepPredicate(pattern=pattern, invert=invert, case_insensitive=ci, regex=rx)


def _split_stage(stage: str) -> list[str]:
    """Whitespace-split with verbatim quoted tokens.

    NOT shlex: shlex's POSIX mode eats unquoted backslashes (silently
    corrupting regex patterns like ``value=\\d+``) and raises on a lone
    apostrophe inside a word (``grep don't``).  Here a quote only opens a
    quoted token at a token boundary; inside a word it is a literal char,
    and backslashes pass through untouched (the reference tokenizes with
    Go's text/scanner, which behaves the same way for these inputs).
    """
    toks: list[str] = []
    i, n = 0, len(stage)
    while i < n:
        while i < n and stage[i].isspace():
            i += 1
        if i >= n:
            break
        if stage[i] in "'\"":
            q = stage[i]
            j = stage.find(q, i + 1)
            if j == -1:
                raise ValueError(f"unclosed quote in stage {stage!r}")
            toks.append(stage[i + 1 : j])
            i = j + 1
        else:
            j = i
            while j < n and not stage[j].isspace():
                j += 1
            toks.append(stage[i:j])
            i = j
    return toks


def _has_unclosed_quote(s: str) -> bool:
    """True when `_split_stage` would reject `s` for an unterminated quoted
    token (an apostrophe INSIDE a word is a literal and doesn't count)."""
    try:
        _split_stage(s)
        return False
    except ValueError:
        return True


def _rejoin_quoted(stages: list[str]) -> list[str]:
    """Re-join stages split on a `|` that was inside quotes."""
    out: list[str] = []
    for s in stages:
        if out and _has_unclosed_quote(out[-1]):
            out[-1] = out[-1] + "|" + s
        else:
            out.append(s)
    return out


def grep_query(logs: DataFrame, pipeline: str) -> DataFrame:
    """One-shot: parse + apply."""
    return GrepPipeline.parse(pipeline).apply(logs)
