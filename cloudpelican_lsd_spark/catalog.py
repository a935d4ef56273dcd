"""Filter catalog — the engine's standing-query registry.

The reference stores filters `{id, name, regex, client_host}` in BoltDB
(reference: supervisor/filter_manager.go:49-57, UUID at :580) and every
match worker polls + recompiles them (storm .../MatchBolt.java:89-97).
Here a filter set is a small DataFrame (broadcastable dimension) plus a
plan-time "compilation" step that decides the contains-vs-regex fast path
per filter, exactly where the reference's Filter.java:33-52 does it.

Name rules follow the CLI: ``^[a-z0-9_]+$`` (cli/cloudpelican-lsd.go:394);
``__tmp__<unix>`` filters are temporary and expire after 1h
(Filter.java:64-75) — `list()` excludes them the way `show filters` does
(cli/cloudpelican-lsd.go:448-450).
"""

from __future__ import annotations

import re
import threading
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# \A..\Z, not ^..$: Python's $ also matches before a trailing newline, so
# "err\n" would pass the Go-CLI name rule it is meant to mirror (RE2
# fullmatch semantics required)
_NAME_RE = re.compile(r"\A[a-z0-9_]+\Z")
_CI_PREFIX = "(?i)"

FILTER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("regex", T.StringType(), False),
        T.StructField("client_host", T.StringType(), True),
        # plan-time fast-path compilation (Filter.java:33-52):
        # plain_word != NULL → use substring contains (lowercased if plain_ci)
        T.StructField("plain_word", T.StringType(), True),
        T.StructField("plain_ci", T.BooleanType(), False),
    ]
)


def compile_fast_path(regex: str) -> tuple[str | None, bool]:
    """(?i)-hoist + plain-word detection (Filter.java:33-52).  The
    plain-word eligibility rule is SHARED with the grep predicates
    (functions/predicates.is_plain_word) so the contains-vs-regex fast
    path can never fork between the catalog and the grep pipeline."""
    from cloudpelican_lsd_spark.functions.predicates import is_plain_word

    ci = regex.startswith(_CI_PREFIX)
    body = regex[len(_CI_PREFIX):] if ci else regex
    if is_plain_word(body):
        return (body.lower() if ci else body), ci
    return None, ci


@dataclass
class Filter:
    name: str
    regex: str
    client_host: str | None = None
    id: str = field(default_factory=lambda: str(uuid.uuid4()))

    def row(self) -> tuple:
        plain, ci = compile_fast_path(self.regex)
        return (self.id, self.name, self.regex, self.client_host, plain, ci)


class FilterCatalog:
    """In-memory registry; persistable as a parquet dimension table.

    Thread-safe: the supervisor serves HTTP from a ThreadingHTTPServer,
    so a POST /filter (create) can race a GET /filter iterating the dict
    — every mutation and every snapshot takes the internal lock (the
    reference locks its filter manager the same way)."""

    def __init__(self) -> None:
        self._lock = threading.RLock()
        self._filters: dict[str, Filter] = {}

    def create(self, name: str, regex: str, client_host: str | None = None) -> Filter:
        if not _NAME_RE.match(name) or _is_uuid(name):
            raise ValueError(f"invalid filter name: {name!r}")
        if name.startswith("__tmp__"):
            # reserved for create_temp: a user filter with this prefix is
            # hidden from `show filters` and silently reaped by the 1h
            # expire_temp maintenance tick
            raise ValueError(f"reserved name prefix '__tmp__': {name!r}")
        with self._lock:
            if name in self._filters:
                # replacing would mint a fresh UUID and orphan results
                # rows keyed by the old filter_id
                raise ValueError(f"filter exists: {name!r} (drop it first)")
            f = Filter(name=name, regex=regex, client_host=client_host)
            self._filters[name] = f
            return f

    def create_temp(self, regex: str, unix_ts: int) -> Filter:
        """``__tmp__<unix>`` auto-filter for `select ... where '<re>'`
        (cli/cloudpelican-lsd.go:507-523).  Two selects within the same
        second must NOT collide (a dict overwrite would orphan the first
        filter's id while its results rows still reference it), so the
        timestamp is bumped to the next free second — the name stays
        all-digits for expire_temp's TTL parse, expiring ≤ a few seconds
        late."""
        with self._lock:
            while f"__tmp__{unix_ts}" in self._filters:
                unix_ts += 1
            f = Filter(name=f"__tmp__{unix_ts}", regex=regex)
            self._filters[f.name] = f
            return f

    def drop(self, name: str) -> None:
        with self._lock:
            self._filters.pop(name, None)

    def expire_temp(self, now_unix: int, ttl_sec: int = 3600) -> list[str]:
        """Drop ``__tmp__<unix>`` filters older than `ttl_sec` (1h,
        Filter.java:64-75; purge tick filter_manager.go:519-576).  Returns
        the dropped names."""
        with self._lock:
            dropped = [
                name
                for name in self._filters
                if name.startswith("__tmp__")
                and name[len("__tmp__"):].isdigit()
                and int(name[len("__tmp__"):]) < now_unix - ttl_sec
            ]
            for name in dropped:
                del self._filters[name]
            return dropped

    def get(self, name: str) -> Filter:
        return self._filters[name]

    def list(self, include_temp: bool = False) -> list[Filter]:
        with self._lock:  # snapshot: creates may race the iteration
            return [
                f
                for f in self._filters.values()
                if include_temp or not f.name.startswith("__tmp__")
            ]

    def to_df(self, spark: SparkSession, include_temp: bool = True) -> DataFrame:
        with self._lock:
            rows = [
                f.row()
                for f in self._filters.values()
                if include_temp or not f.name.startswith("__tmp__")
            ]
        return spark.createDataFrame(rows, FILTER_SCHEMA)

    def to_values_sql(self, include_temp: bool = True) -> str:
        """DuckDB VALUES CTE body mirroring ``to_df`` for oracle SQL."""
        rows = []
        with self._lock:
            filters = list(self._filters.values())
        for f in filters:
            if not include_temp and f.name.startswith("__tmp__"):
                continue
            plain, ci = compile_fast_path(f.regex)
            rows.append(
                "("
                + ", ".join(
                    [
                        _lit(f.id),
                        _lit(f.name),
                        _lit(f.regex),
                        _lit(f.client_host),
                        _lit(plain),
                        "true" if ci else "false",
                    ]
                )
                + ")"
            )
        if not rows:
            # `VALUES` with zero tuples is a syntax error — emit a typed
            # empty relation instead
            return (
                "(SELECT NULL::VARCHAR AS id, NULL::VARCHAR AS name,"
                " NULL::VARCHAR AS regex, NULL::VARCHAR AS client_host,"
                " NULL::VARCHAR AS plain_word, NULL::BOOLEAN AS plain_ci"
                " WHERE 1 = 0)"
            )
        return (
            "(SELECT * FROM (VALUES "
            + ", ".join(rows)
            + ") AS t(id, name, regex, client_host, plain_word, plain_ci))"
        )


def _is_uuid(s: str) -> bool:
    try:
        uuid.UUID(s)
        return True
    except ValueError:
        return False


def _lit(v: str | None) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR)"
    return "'" + v.replace("'", "''") + "'"


def demo_catalog() -> FilterCatalog:
    """Deterministic fixture filter set covering the reference's cases:
    plain word, case-insensitive word, real regex, match-nothing, temp."""
    cat = FilterCatalog()
    # fixed ids so Spark and oracle rows agree
    for fid, name, regex in [
        ("f-0001", "errors", "error"),
        ("f-0002", "purchases_ci", "(?i)PURCHASE"),
        ("f-0003", "value_1xx", "value=1[0-9]{2} "),
        ("f-0004", "nomatch", "zz_no_such_token_zz"),
        ("f-0005", "clicks_or_signups", "(click|signup)"),
    ]:
        f = Filter(name=name, regex=regex, id=fid)
        cat._filters[name] = f
    t = Filter(name="__tmp__1700000000", regex="purchase", id="f-tmp1")
    cat._filters[t.name] = t
    return cat
