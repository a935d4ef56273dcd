"""CloudPelicanEngine — the user-facing command surface.

Re-creates the reference CLI's grammar (dispatcher
cli/cloudpelican-lsd.go:200-303, help :860-882) over the batch engine, so
a user of the reference can run the commands they run today:

    create filter <name> as '<regex>'
    drop filter <name>
    show filters
    describe filter <name>
    cat <name> | grep [-v|-i|-e] <p> | sort [- r] | head | limit N
    select * from <name> [where '<regex>'] [limit N]
    tail <name> [limit N]
    stats <name> [window W] [rollup R] [-regular|-error]
    search <sql>

Every command returns a DataFrame (or filter metadata), never prints —
presentation (the reference's ASCII charts, cli/stats.go) is a client
concern.  The `search` path is plain Spark SQL over registered tables:
what the reference ships to BigQuery through two process hops
(supervisor.go:276-351) is one Catalyst call here.
"""

from __future__ import annotations

import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.catalog import FilterCatalog
from cloudpelican_lsd_spark.functions.durations import parse_duration
from cloudpelican_lsd_spark.operators import stats as stats_ops
from cloudpelican_lsd_spark.operators.fanout import match_filters_compiled
from cloudpelican_lsd_spark.operators.grep_pipeline import GrepPipeline
from cloudpelican_lsd_spark.operators.tail import tail_last_n
from cloudpelican_lsd_spark.sources.tables import TABLES, load_tables

#: every dispatcher prefix execute() recognizes (single source of truth —
#: the junk-command fuzz test imports this)
COMMAND_PREFIXES = (
    "ping", "auth ", "connect ", "history", "clearhistory", "save",
    "clearsession", "configure supervisor ", "show filters",
    "describe filter ", "create filter ", "drop filter ", "select ",
    "tail ", "stats ", "search ", "cat ", "help", "explain ",
)

_CREATE_RE = re.compile(r"^create filter ([a-z0-9_]+) as '(.+)'$")
_SELECT_RE = re.compile(
    r"^select \* from ([a-z0-9_:]+)(?: where '(.+?)')?(?: limit (\d+))?$"
)

# ---------------------------------------------------------------------------
# Command dispatch table (cloudpelican-lsd.go:200-303)
#
# ONE ordered rule list shared by execute() AND _routes_to_query so their
# precedence cannot fork (round-2 review: a hand-duplicated precedence
# meant a future side-effecting command misclassified as a query would be
# EXECUTED by explain's recursive call before the DataFrame backstop).
# Each rule: (kind, predicate(cmd, low) -> truthy match, produces_query).
# The bare-pipe → cat fallback is LAST, exactly like the reference
# dispatcher's final branch, so `create filter f as 'err|warn'` routes to
# create, never to cat.
# ---------------------------------------------------------------------------

_DISPATCH_RULES: list[tuple[str, object, bool]] = [
    ("help", lambda c, l: l == "help", False),
    ("ping", lambda c, l: l == "ping", False),
    ("auth", lambda c, l: l.startswith("auth "), False),
    ("connect", lambda c, l: l.startswith("connect "), False),
    ("history", lambda c, l: l == "history", False),
    ("history_n", lambda c, l: l.startswith("history "), False),
    ("clearhistory", lambda c, l: l == "clearhistory", False),
    ("save", lambda c, l: l == "save", False),
    ("clearsession", lambda c, l: l == "clearsession", False),
    ("configure", lambda c, l: l.startswith("configure supervisor "), False),
    ("show_filters", lambda c, l: l == "show filters", True),
    ("describe_filter", lambda c, l: l.startswith("describe filter "), False),
    ("create_filter", lambda c, l: _CREATE_RE.match(c), False),
    ("drop_filter", lambda c, l: l.startswith("drop filter "), False),
    ("select", lambda c, l: _SELECT_RE.match(c), True),
    ("tail", lambda c, l: l.startswith("tail "), True),
    ("stats", lambda c, l: l.startswith("stats "), True),
    ("search", lambda c, l: l.startswith("search "), True),
    ("explain", lambda c, l: l.startswith("explain "), False),
    ("cat", lambda c, l: l.startswith("cat ") or "|" in c, True),
]

_QUERY_KINDS = frozenset(k for k, _, q in _DISPATCH_RULES if q)


def _classify(cmd: str) -> tuple[str, object]:
    """First matching rule wins — the single statement of precedence."""
    low = cmd.lower()
    for kind, pred, _ in _DISPATCH_RULES:
        m = pred(cmd, low)
        if m:
            return kind, m
    return "unknown", None


class CloudPelicanEngine:
    """Batch command engine over a log DataFrame + filter catalog."""

    def __init__(
        self,
        spark: SparkSession,
        logs: DataFrame,
        catalog: FilterCatalog | None = None,
        sf_dir: str | None = None,
        session_path: str | None = None,
    ) -> None:
        self.spark = spark
        self.logs = logs
        self.catalog = catalog or FilterCatalog()
        self.sf_dir = sf_dir
        self._tables_registered = False
        #: session state (cli session.go analog): auth/uri are recorded but
        #: carry no behavior — there is no supervisor process to dial.
        self.session: dict = {"history": [], "config": {}}
        self.session_path = session_path

    # -- command dispatcher (cloudpelican-lsd.go:200-303) --------------------

    def _routes_to_query(self, command: str) -> bool:
        """True iff :meth:`execute` would dispatch ``command`` to a
        DataFrame-producing handler.  Derived from the SAME ordered rule
        table execute() dispatches through (``_DISPATCH_RULES``), so the
        two cannot drift: the bare-pipe → ``cat`` fallback is reachable
        only when no earlier (possibly side-effecting) rule matches
        first, so ``create filter f as 'err|warn'`` is NOT a query even
        though it contains a pipe."""
        kind, _ = _classify(command.strip())
        return kind in _QUERY_KINDS

    def execute(self, command: str):
        cmd = command.strip()
        low = cmd.lower()
        if not low.startswith(("history", "clearhistory")):
            self.session["history"].append(cmd)
        kind, m = _classify(cmd)
        if kind == "unknown":
            raise ValueError(f"unknown command: {command!r}")
        return getattr(self, "_cmd_" + kind)(cmd, low, m)

    # -- per-kind handlers (bodies unchanged from the round-1 dispatcher) ----

    def _cmd_help(self, cmd, low, m):
        # reference help text (cloudpelican-lsd.go:860-882) — same
        # command inventory, engine-native wording
        return "\n".join(
            [
                "auth <user> <password>",
                "connect <uri>",
                "ping",
                "save | clearsession | history [id] | clearhistory",
                "show filters | describe filter <f>",
                "create filter <f> as '<regex>' | drop filter <f>",
                "select * from <f> [where '<regex>'] [limit N]",
                "tail <f> [limit N]",
                "cat <f> | grep [-v|-i|-e] <p> | sort [- r] | head | limit N",
                "search <sql>",
                "stats <f> [window W] [rollup R] [-regular|-error]",
                "explain <query-producing command>",
                "configure supervisor <key>=<value>",
            ]
        )

    def _cmd_ping(self, cmd, low, m):
        # reference pings the supervisor; here: one trivial Catalyst
        # round-trip proves the session is live
        self.spark.sql("SELECT 1").collect()
        return "pong"

    def _cmd_auth(self, cmd, low, m):
        parts = cmd.split(maxsplit=2)
        if len(parts) != 3:
            raise ValueError("usage: auth <user> <password>")
        self.session["user"] = parts[1]
        return f"authenticated as {parts[1]}"

    def _cmd_connect(self, cmd, low, m):
        self.session["uri"] = cmd.split(maxsplit=1)[1]
        return f"connected to {self.session['uri']}"

    def _cmd_history(self, cmd, low, m):
        return list(self.session["history"])

    def _cmd_history_n(self, cmd, low, m):
        arg = cmd.split()[1]
        if not arg.lstrip("-").isdigit():
            raise ValueError("usage: history <index>")
        idx = int(arg)
        if not -len(self.session["history"]) <= idx < len(self.session["history"]):
            raise ValueError(f"history: no entry {idx}")
        return self.execute(self.session["history"][idx])

    def _cmd_clearhistory(self, cmd, low, m):
        self.session["history"].clear()
        return "history cleared"

    def _cmd_save(self, cmd, low, m):
        return self.save_session()

    def _cmd_clearsession(self, cmd, low, m):
        self.session = {"history": [], "config": {}}
        return "session cleared"

    def _cmd_configure(self, cmd, low, m):
        body = cmd[len("configure supervisor "):]
        if "=" not in body:
            raise ValueError("usage: configure supervisor <key>=<value>")
        k, v = body.split("=", 1)
        self.session["config"][k.strip()] = v.strip()
        return dict(self.session["config"])

    def _cmd_show_filters(self, cmd, low, m):
        return self.show_filters()

    def _cmd_describe_filter(self, cmd, low, m):
        return self.describe_filter(cmd.split()[-1])

    def _cmd_create_filter(self, cmd, low, m):
        return self.create_filter(m.group(1), m.group(2))

    def _cmd_drop_filter(self, cmd, low, m):
        return self.drop_filter(cmd.split()[-1])

    def _cmd_select(self, cmd, low, m):
        return self.select(m.group(1), m.group(2), m.group(3))

    def _cmd_tail(self, cmd, low, m):
        parts = cmd.split()
        n = 100
        if "limit" in parts:
            li = parts.index("limit")
            if li + 1 >= len(parts) or not parts[li + 1].isdigit():
                raise ValueError("usage: tail <filter> [limit N]")
            n = int(parts[li + 1])
        return self.tail(parts[1], n)

    def _cmd_stats(self, cmd, low, m):
        return self._stats_command(cmd)

    def _cmd_search(self, cmd, low, m):
        return self.search(cmd[len("search "):])

    def _cmd_explain(self, cmd, low, m):
        # plan visibility the reference never had (its planner was a
        # string builder shipped to BigQuery): a query-producing
        # command prefixed with `explain` returns Catalyst's formatted
        # physical plan instead of rows.  The rule table is consulted
        # BEFORE dispatching so a side-effecting command (drop filter,
        # clearsession, ...) is rejected without being executed —
        # including commands whose ARGUMENTS contain a pipe (regex
        # alternation is the normal case: `create filter f as
        # 'err|warn'` must not slip through via the bare-pipe branch,
        # which only fires when no earlier rule matches).
        inner_cmd = cmd[len("explain "):].strip()
        if not self._routes_to_query(inner_cmd):
            raise ValueError("explain: command does not produce a query")
        try:
            inner = self.execute(inner_cmd)
        finally:
            # the recursive execute() recorded the inner command BEFORE
            # dispatch; pop it even when the inner command RAISES — one
            # user keystroke = one history entry, and a later
            # `history -1` must replay the explain, not a failing inner
            if (
                self.session["history"]
                and self.session["history"][-1] == inner_cmd
            ):
                self.session["history"].pop()
        if not isinstance(inner, DataFrame):
            raise ValueError("explain: command does not produce a query")
        return inner._sc._jvm.PythonSQLUtils.explainString(
            inner._jdf.queryExecution(), "formatted"
        )

    def _cmd_cat(self, cmd, low, m):
        return self.cat(cmd)

    # -- session persistence (cli `save`, session file analog) ----------------

    def save_session(self) -> str:
        """Persist session state + filter definitions as JSON (the CLI's
        `save` writes ~/.cloudpelican; filters live in BoltDB server-side —
        here both land in one file)."""
        import json

        if not self.session_path:
            return "no session path configured"
        payload = {
            "session": {k: v for k, v in self.session.items()},
            "filters": [
                {"id": f.id, "name": f.name, "regex": f.regex}
                for f in self.catalog.list(include_temp=True)
            ],
        }
        with open(self.session_path, "w") as fh:
            json.dump(payload, fh, indent=1)
        return f"saved to {self.session_path}"

    def load_session(self) -> None:
        import json
        import os

        if not self.session_path or not os.path.exists(self.session_path):
            return
        with open(self.session_path) as fh:
            payload = json.load(fh)
        self.session = payload.get("session", {"history": [], "config": {}})
        from cloudpelican_lsd_spark.catalog import Filter

        for f in payload.get("filters", []):
            self.catalog._filters[f["name"]] = Filter(
                name=f["name"], regex=f["regex"], id=f["id"]
            )

    # -- filter CRUD ----------------------------------------------------------

    def create_filter(self, name: str, regex: str):
        return self.catalog.create(name, regex)

    def drop_filter(self, name: str) -> None:
        # a typo'd drop must not print ok while the filter keeps matching
        if name not in {f.name for f in self.catalog.list(include_temp=True)}:
            raise ValueError(f"unknown filter: {name!r}")
        self.catalog.drop(name)

    def show_filters(self) -> DataFrame:
        return self.catalog.to_df(self.spark, include_temp=False).select(
            "id", "name", "regex"
        )

    def _get_filter(self, name: str):
        """catalog.get with the engine's error contract: a ValueError
        naming the filter, not a bare KeyError (select/cat established
        the 'unknown filter: ...' message; tail/stats/describe must
        match)."""
        try:
            return self.catalog.get(name)
        except KeyError:
            raise ValueError(f"unknown filter: {name!r}") from None

    def describe_filter(self, name: str) -> dict:
        f = self._get_filter(name)
        return {"id": f.id, "name": f.name, "regex": f.regex}

    # -- matched stream for one filter ---------------------------------------

    def _matched(self, name: str) -> DataFrame:
        f = self._get_filter(name)
        return match_filters_compiled(self.logs, [f])

    # -- cat pipeline ---------------------------------------------------------

    def cat(self, pipeline: str) -> DataFrame:
        p = GrepPipeline.parse(pipeline)
        known = {f.name for f in self.catalog.list(include_temp=True)}
        if p.source in known:
            base = self._matched(p.source)
        elif p.source == "logs":
            base = self.logs  # explicit raw-stream alias
        else:
            # same contract as select(): a typo'd filter name must not
            # silently fall back to a full-stream scan
            raise ValueError(f"unknown filter: {p.source!r} (use 'logs' for the raw stream)")
        return p.apply(base)

    # -- select / tail ---------------------------------------------------------

    def select(
        self, name: str, where_regex: str | None, limit: str | int | None
    ) -> DataFrame:
        """`select * from f [where '<re>'] [limit N]` — unknown names of the
        form `stream:default` create a 1h temp filter from the where-regex
        (cloudpelican-lsd.go:500-523); `select *` is rewritten to `_raw`
        (:339)."""
        known = {f.name for f in self.catalog.list(include_temp=True)}
        if name in known:
            df = self._matched(name)
        elif name == "stream:default" and where_regex:
            # ONLY the literal stream:default form auto-creates the temp
            # filter (cloudpelican-lsd.go:508-511 rejects every other
            # unknown name) — a typo'd filter name must not silently
            # become a full-stream scan on the where-regex
            tmp = self.catalog.create_temp(where_regex, int(time.time()))
            df = match_filters_compiled(self.logs, [tmp])
            where_regex = None  # already applied as the temp filter
        elif name.startswith("stream:") and where_regex:
            raise ValueError(
                "can not create temporary filter from stream "
                f"{name!r}, try 'select * from stream:default'"
            )
        else:
            # the reference fails on a missing per-filter results table;
            # silently returning the whole stream would mask typos
            raise ValueError(f"unknown filter: {name!r}")
        if where_regex:
            df = df.where(F.col("_raw").rlike(where_regex))
        out = df.select("_raw")
        if limit is not None:
            out = out.limit(int(limit))
        return out

    def tail(self, name: str, n: int = 100) -> DataFrame:
        return tail_last_n(self._matched(name), n)

    # -- stats ------------------------------------------------------------------

    def _parse_stats_args(self, cmd: str) -> tuple[str, int, int, int | None]:
        """`stats f [window W] [rollup R] [-regular|-error]`
        (cloudpelican-lsd.go:761-833; defaults window=86400 rollup=60 :795-798)."""
        parts = cmd.split()
        if len(parts) < 2:
            raise ValueError("usage: stats <filter> [window W] [rollup R] [-regular|-error]")
        name = parts[1]
        window, rollup, metric = 86400, 60, None
        i = 2
        while i < len(parts):
            if parts[i] in ("window", "rollup") and i + 1 >= len(parts):
                raise ValueError(f"stats: {parts[i]} needs a duration argument")
            if parts[i] == "window":
                window = parse_duration(parts[i + 1]); i += 2
            elif parts[i] == "rollup":
                rollup = parse_duration(parts[i + 1]); i += 2
            elif parts[i] == "-regular":
                metric = stats_ops.METRIC_MATCH; i += 1
            elif parts[i] == "-error":
                metric = stats_ops.METRIC_ERROR; i += 1
            else:
                raise ValueError(f"stats: unexpected token {parts[i]!r}")
        return name, window, rollup, metric

    def _stats_command(self, cmd: str) -> DataFrame:
        return self.stats(*self._parse_stats_args(cmd))

    def stats(
        self,
        name: str,
        window_sec: int = 86400,
        rollup_sec: int = 60,
        metric: int | None = None,
    ) -> DataFrame:
        """Windowed, re-bucketed, zero-gap-filled series for one filter
        (supervisorcon.go:43-119 semantics, window anchored at the newest
        event rather than wall-clock for determinism).

        Two-stage bucketing like the reference: the store keeps MINUTELY
        buckets (SupervisorStatsWriterBolt.java:132) and the client
        re-buckets those to the requested rollup (supervisorcon.go:86-89).
        Bucketing raw timestamps directly at `rollup_sec` would differ for
        any rollup that is not a multiple of 60 (ts=119 → minute bucket
        60 → re-bucket@90 = 0, vs direct 119-(119%90) = 90)."""
        matched = self._matched(name)
        mc = stats_ops.metric_counts(matched, rollup_sec=60)
        rolled = stats_ops.rollup_window(mc, rollup_sec=rollup_sec)
        now_df = matched.agg(F.max("ts_epoch").alias("_now"))
        windowed = (
            rolled.crossJoin(F.broadcast(now_df))
            .where(F.col("bucket") >= F.col("_now") - F.lit(window_sec))
            .drop("_now")
        )
        filled = stats_ops.gap_fill(windowed, rollup_sec=rollup_sec)
        if metric is not None:
            filled = filled.where(F.col("metric") == metric)
        return filled

    def stats_chart(
        self,
        name: str,
        window_sec: int = 86400,
        rollup_sec: int = 60,
        width: int = 80,
    ) -> str:
        """The reference console's `stats f` output: the windowed series
        rendered as a dual-series ASCII chart (cli/stats.go:59-201)."""
        from cloudpelican_lsd_spark.chart import chart_from_df

        return chart_from_df(
            self.stats(name, window_sec=window_sec, rollup_sec=rollup_sec),
            width=width,
        )

    # -- search (historical SQL) -------------------------------------------------

    #: legacy BigQuery table ref the reference's grep transpiler emits:
    #: cloudpelican_lsd_v1.<uuid with _ for ->_results_<yyyy_MM_dd>_v1
    #: (cli/supervisorcon.go:34-40; written bare into SQL at grepsql.go:169),
    #: optionally [bracket]-quoted as legacy BigQuery SQL allows.
    _LEGACY_TABLE_RE = re.compile(
        r"\[?cloudpelican_lsd_v\d+\.([0-9a-f_]+)_results_"
        r"(\d{4})_(\d{2})_(\d{2})_v\d+\]?",
        re.IGNORECASE,
    )

    #: BigQuery legacy-SQL constructs with NO sound Spark translation —
    #: rejected loudly with guidance instead of silently mis-running
    #: (legacy comma-FROM means UNION ALL, Spark would CROSS JOIN; FLATTEN/
    #: WITHIN need repeated-field schemas this engine does not model).
    #: The full translate/reject table is in COVERAGE.md §S10.
    _LEGACY_REJECTED: tuple[tuple[re.Pattern, str], ...] = (
        (
            re.compile(r"(?i)\bFLATTEN\s*\("),
            "FLATTEN() flattens legacy repeated fields; this engine's log "
            "schema has no repeated fields — use LATERAL VIEW explode() "
            "over an array column instead",
        ),
        (
            # scope may be RECORD, a bare node name (WITHIN children), or a
            # dotted path — all three are legacy repeated-field scopes.
            # ANSI `WITHIN GROUP (ORDER BY ...)` (ordered-set aggregates,
            # valid Spark SQL) is explicitly excluded.
            re.compile(r"(?i)\bWITHIN\s+(?!GROUP\b)(RECORD\b|\w+(?:\.\w+)*)"),
            "WITHIN-scoped aggregation needs legacy repeated-field "
            "records; aggregate with GROUP BY instead",
        ),
        (
            re.compile(r"(?i)\bTABLE_DATE_RANGE\s*\("),
            "TABLE_DATE_RANGE() enumerates day-sharded tables; the "
            "results table is date-partitioned — use WHERE date BETWEEN "
            "'yyyy-MM-dd' AND 'yyyy-MM-dd' (partition-pruned)",
        ),
        (
            re.compile(r"(?i)\bTABLE_QUERY\s*\("),
            "TABLE_QUERY() enumerates tables by name predicate; query the "
            "partitioned results table with a WHERE on filter_id/date",
        ),
        (
            # a legacy day-table ref on EITHER side of a comma — the list
            # means UNION ALL in legacy SQL but CROSS JOIN in ANSI, and
            # catching only one side would let 'FROM [day_table], other'
            # slip through to the silent wrong answer
            re.compile(
                r"(?i),\s*\[?cloudpelican_lsd_v\d+\.[0-9a-f_]+_results_"
                r"|_results_\d{4}_\d{2}_\d{2}_v\d+\]?\s*,"
            ),
            "a comma-separated FROM list containing a legacy day table "
            "means UNION ALL in BigQuery legacy SQL but CROSS JOIN in "
            "ANSI — use explicit UNION ALL, or one table ref plus WHERE "
            "date BETWEEN",
        ),
    )

    #: dialect markers that identify a query as written in BigQuery legacy
    #: SQL — only such queries get the comma-FROM (UNION ALL) rejection;
    #: plain ANSI comma-joins pass through to Spark untouched
    _LEGACY_MARKER_RE = re.compile(
        r"(?i)\b(GROUP\s+EACH\s+BY|JOIN\s+EACH|REGEXP_MATCH\s*\(|"
        r"EXACT_COUNT_DISTINCT\s*\(|FLATTEN\s*\(|TABLE_DATE_RANGE\s*\(|"
        r"TABLE_QUERY\s*\()"
    )

    @staticmethod
    def _comma_from_snippet(sql_no_literals: str) -> str | None:
        """Return the offending ``FROM a, b`` snippet if any FROM clause
        contains a paren-depth-0 comma (a legacy table list, which means
        UNION ALL in BigQuery legacy SQL but CROSS JOIN in ANSI), else
        None.  Operates on literal-stripped text; commas inside
        subqueries/function calls are at depth > 0 and ignored."""
        # (?<![\w.$]) — a clause keyword only terminates the scan at a
        # word START: table names ENDING in a keyword (person, my_union,
        # db.on) must not abort the scan before the comma is seen
        stop = re.compile(
            r"(?i)(?<![\w.$])(WHERE|GROUP|ORDER|HAVING|LIMIT|UNION|JOIN|ON)\b"
        )
        for m in re.finditer(r"(?i)\bFROM\b", sql_no_literals):
            depth, i = 0, m.end()
            while i < len(sql_no_literals):
                ch = sql_no_literals[i]
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    if depth == 0:
                        break  # end of the subquery containing this FROM
                    depth -= 1
                elif depth == 0:
                    if ch == ",":
                        return sql_no_literals[m.start() : i + 1] + " ..."
                    if stop.match(sql_no_literals, i):
                        break
                i += 1
        return None

    def _legacy_sql_shim(self, sql: str, results: DataFrame | None) -> str:
        """Accept the BigQuery-legacy SQL the reference's own CLI emits, so
        a user's saved `search` queries run unchanged:

        - ``REGEXP_MATCH(x, p)`` (grepsql.go:49) → Spark's ``REGEXP_LIKE``
          (same two-arg substring-match semantics);
        - per-filter-per-day table names → the partitioned results table
          constrained to that filter_id and date (the table-per-day layout
          IS our (filter_id, date) partitioning);
        - ``GROUP EACH BY`` / ``JOIN EACH`` → the EACH shuffle hint is
          dropped (Catalyst/AQE decide the strategy);
        - ``EXACT_COUNT_DISTINCT(x)`` → ``COUNT(DISTINCT x)``.

        Constructs with no sound translation raise ValueError with
        guidance (see ``_LEGACY_REJECTED``); everything else passes
        through to Spark SQL, whose ANSI surface covers the remainder of
        the legacy function library.  Rewrites and rejection scans apply
        outside single-quoted string literals only.
        """
        segments = re.split(r"('(?:[^']|'')*')", sql)
        for k, seg in enumerate(segments):
            if k % 2 == 1:
                continue
            for pat, why in self._LEGACY_REJECTED:
                m = pat.search(seg)
                if m:
                    raise ValueError(
                        f"unsupported BigQuery legacy SQL construct "
                        f"{m.group(0).strip()!r}: {why}"
                    )
        # comma-separated FROM lists: UNION ALL in legacy SQL, CROSS JOIN
        # in ANSI — silently wrong, so reject whenever the query is
        # identifiably legacy-dialect (day-table ref or legacy function/
        # clause marker).  Pure-ANSI queries keep comma-join semantics.
        stripped = "".join(
            seg if k % 2 == 0 else "'…'" for k, seg in enumerate(segments)
        )
        if self._LEGACY_TABLE_RE.search(stripped) or self._LEGACY_MARKER_RE.search(
            stripped
        ):
            snippet = self._comma_from_snippet(stripped)
            if snippet:
                raise ValueError(
                    f"unsupported BigQuery legacy SQL construct {snippet!r}: "
                    "a comma-separated FROM list means UNION ALL in legacy "
                    "SQL but CROSS JOIN in ANSI — use explicit UNION ALL, "
                    "or one table ref plus WHERE date BETWEEN"
                )

        def fix(seg: str) -> str:
            seg = re.sub(r"(?i)\bREGEXP_MATCH\s*\(", "REGEXP_LIKE(", seg)
            seg = re.sub(r"(?i)\bGROUP\s+EACH\s+BY\b", "GROUP BY", seg)
            seg = re.sub(r"(?i)\bJOIN\s+EACH\b", "JOIN", seg)
            seg = re.sub(
                r"(?i)\bEXACT_COUNT_DISTINCT\s*\(", "COUNT(DISTINCT ", seg
            )

            def table(m: re.Match) -> str:
                fid = m.group(1).replace("_", "-")
                date = f"{m.group(2)}-{m.group(3)}-{m.group(4)}"
                if results is None:
                    raise ValueError(
                        "legacy results-table reference needs the results "
                        f"DataFrame: {m.group(0)}"
                    )
                view = f"__results_legacy_{m.group(1)}_{m.group(2)}{m.group(3)}{m.group(4)}"
                results.where(
                    (F.col("filter_id") == fid) & (F.col("date") == date)
                ).createOrReplaceTempView(view)
                return view

            return self._LEGACY_TABLE_RE.sub(table, seg)

        return "".join(
            fix(seg) if k % 2 == 0 else seg for k, seg in enumerate(segments)
        )

    def search(self, sql: str, results: DataFrame | None = None) -> DataFrame:
        """Arbitrary SQL over the engine tables — the reference delegates
        this to BigQuery via subprocess+HTTP (supervisor.go:276-351,
        bigquery-client Main.java:98-148); here it's one spark.sql call.

        FROM-name resolution (P6): a FROM target that names a catalog
        filter resolves to the partitioned results table constrained to
        `filter_id = <id>` (FROM and JOIN targets; names buried in a
        comma-separated FROM list are not rewritten) — the reference's
        per-filter-per-day table name
        (`<id>_results_<date>_v1`, cli/supervisorcon.go:34-40) becomes a
        partition predicate Catalyst prunes at the file index.  Pass the
        results DataFrame (e.g. `StreamingEngine.results()`) to enable it.
        """
        if not self._tables_registered:
            if self.sf_dir:
                for name, df in load_tables(self.spark, self.sf_dir).items():
                    df.createOrReplaceTempView(name)
            self.logs.createOrReplaceTempView("logs")
            self._tables_registered = True
        sql = self._legacy_sql_shim(sql, results)
        if results is not None:
            # rewrite only OUTSIDE single-quoted string literals (a WHERE
            # literal like 'from errors' must pass through untouched); a
            # filter name that shadows a base table resolves to the filter
            # — reference precedence, where FROM names are always filters
            segments = re.split(r"('(?:[^']|'')*')", sql)
            for f in self.catalog.list(include_temp=True):
                pat = re.compile(rf"(?i)\b(FROM|JOIN)\s+{re.escape(f.name)}\b")
                if any(
                    pat.search(seg)
                    for k, seg in enumerate(segments)
                    if k % 2 == 0
                ):
                    view = f"__results_{f.name}"
                    results.where(F.col("filter_id") == f.id).createOrReplaceTempView(view)
                    segments = [
                        pat.sub(rf"\1 {view}", seg) if k % 2 == 0 else seg
                        for k, seg in enumerate(segments)
                    ]
            sql = "".join(segments)
        return self.spark.sql(sql)


def df_to_tsv(df: DataFrame, max_rows: int = 1000) -> str:
    """Render a DataFrame as TSV text, capped at ``max_rows`` with a
    truncation marker — the one rows-to-text path shared by the Slack
    adapter and the HTTP query passthrough (divergent copies of this
    idiom would drift on NULL/encoding handling)."""
    rows = df.limit(max_rows + 1).collect()
    clipped = len(rows) > max_rows
    body = "\n".join(
        "\t".join("" if v is None else str(v) for v in r)
        for r in rows[:max_rows]
    ) or "(empty)"
    if clipped:
        body += f"\n... (truncated at {max_rows} rows)"
    return body


def render_result(engine: CloudPelicanEngine, command: str) -> tuple[str, bool]:
    """`(text, ok)` — the ONE command-to-text renderer shared by the
    Slack adapter and the console (`__main__`), so the two surfaces can
    never diverge on a result type: `stats` renders the ASCII chart,
    DataFrames print as TSV, lists one entry per line, None (a pure
    side effect, e.g. drop filter) prints `ok`; errors come back as
    text with ok=False, never raised."""
    try:
        if command.strip().lower().startswith("stats "):
            from cloudpelican_lsd_spark.chart import chart_from_df

            # ONE dispatch path: the full stats grammar goes through
            # execute() like every other command, so the invocation
            # lands in session history and inherits any dispatcher-level
            # checks; only the rendering differs (ASCII chart, not TSV)
            return chart_from_df(engine.execute(command.strip())), True
        out = engine.execute(command)
        if isinstance(out, DataFrame):
            return df_to_tsv(out, max_rows=1000), True
        if isinstance(out, list):
            return "\n".join(str(x) for x in out) or "(empty)", True
        if out is None:
            return "ok", True
        return str(out), True
    except Exception as ex:  # noqa: BLE001 — surfaces answer, never crash
        return f"error: {ex}", False


def slack_command(engine: CloudPelicanEngine, text: str, max_bytes: int = 12 * 1024) -> str:
    """The supervisor's Slack slash-command adapter as a pure function
    (reference: supervisor.go:97-273 shells the CLI binary and caps the
    response at 12KB, supervisor.go:194).  Rendering is the shared
    :func:`render_result`; this adapter only adds the byte cap."""
    body, _ = render_result(engine, text)
    raw = body.encode("utf-8", errors="replace")
    if len(raw) > max_bytes:
        marker = b"\n... (truncated)"
        body = raw[: max_bytes - len(marker)].decode("utf-8", "ignore") + marker.decode()
    return body
