"""Oracle output-type lints (VERDICT r7 "wrong" #1 made a class, not an
instance).

The driver's correctness gate hashes TYPED values through Arrow, so an
oracle whose output type Spark cannot emit (DuckDB HUGEINT from
SUM(BIGINT), DECIMAL, UTINYINT...) red-flags a numerically-correct
engine: Arrow surfaces HUGEINT as decimal128(38,0) and the hasher sees
Decimal != int64 even when every value matches (the r7
search_important_parts red cell).  Two lints close the class:

1. every oracle's DESCRIBE types must come from the Spark-emittable set;
2. every gated query's Spark schema must agree with its oracle's
   DESCRIBE per column name on a coarse type CLASS (int/float/str/...)
   — catching silent int-vs-double drift before the driver does.
"""

from __future__ import annotations

import re

import duckdb
import pytest

import __spark_entry__ as entry_mod
from cloudpelican_lsd_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

#: DuckDB DESCRIBE types Spark can emit losslessly through Arrow.  The
#: r7 judge sweep found exactly one violator (HUGEINT); keep this list
#: tight — widening it to admit DECIMAL/HUGEINT/U* would re-open the
#: typed-hasher false-red the lint exists to prevent.
SPARK_EMITTABLE = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "TIMESTAMP",
    "TIMESTAMP_NS",
    "DATE",
    "BOOLEAN",
    "BLOB",
}

#: coarse class per engine type — int-width differences (Spark bigint vs
#: oracle INTEGER) hash identically through Python/Arrow values, so the
#: cross-engine assert compares classes, not widths.
_DUCK_CLASS = {
    "BIGINT": "int",
    "INTEGER": "int",
    "SMALLINT": "int",
    "TINYINT": "int",
    "DOUBLE": "float",
    "FLOAT": "float",
    "VARCHAR": "str",
    "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts",
    "DATE": "date",
    "BOOLEAN": "bool",
    "BLOB": "bin",
}

_SPARK_CLASS = {
    "bigint": "int",
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "double": "float",
    "float": "float",
    "string": "str",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "date": "date",
    "boolean": "bool",
    "binary": "bin",
}


def _base_and_list(duck_type: str) -> tuple[str, bool]:
    """DuckDB DESCRIBE type -> (base type, is_list).  Parametrized types
    (DECIMAL(38,0)) keep their parameters so they fail the allowlist
    loudly rather than slipping through as their base name."""
    t = duck_type.strip()
    is_list = t.endswith("[]")
    if is_list:
        t = t[:-2].strip()
    return t, is_list


def _duck_class(duck_type: str) -> str:
    base, is_list = _base_and_list(duck_type)
    cls = _DUCK_CLASS.get(base, f"?{base}")
    return f"array<{cls}>" if is_list else cls


def _spark_class(dtype: str) -> str:
    m = re.fullmatch(r"array<(.+)>", dtype)
    if m:
        return f"array<{_SPARK_CLASS.get(m.group(1), '?' + m.group(1))}>"
    return _SPARK_CLASS.get(dtype, f"?{dtype}")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def oracle_describe(duck) -> dict[str, list[tuple[str, str]]]:
    """(column, DESCRIBE type) per oracle — computed once, shared by both
    lints."""
    out: dict[str, list[tuple[str, str]]] = {}
    for name, sql in entry_mod.oracle_sql().items():
        desc = duck.sql(f"DESCRIBE ({sql})").fetchall()
        out[name] = [(row[0], row[1]) for row in desc]
    return out


def test_oracle_output_types_are_spark_emittable(oracle_describe):
    """Lint 1: no oracle may emit a type outside the Spark-emittable set
    (the exact failure mode of the r7 search_important_parts red cell:
    an un-cast SUM(BIGINT) surfacing as HUGEINT/decimal128)."""
    violations = []
    for name, cols in oracle_describe.items():
        for col, typ in cols:
            base, _ = _base_and_list(typ)
            if base not in SPARK_EMITTABLE:
                violations.append(f"{name}.{col}: {typ}")
    assert not violations, (
        "oracle columns with non-Spark-emittable DuckDB types (cast them "
        "in the oracle's final projection, e.g. ::BIGINT after SUM): "
        + "; ".join(violations)
    )


def test_spark_schema_matches_oracle_type_classes(spark, oracle_describe):
    """Lint 2: per gated query, the Spark schema and the oracle DESCRIBE
    must agree column-by-name on the coarse type class — a query whose
    engine emits double where the oracle emits BIGINT (or vice versa)
    hash-reds at the driver even when values round-trip equal."""
    queries = entry_mod.queries()
    mismatches = []
    for name, fn in queries.items():
        if name not in oracle_describe:
            continue
        sdf = fn(spark, SF_DIR)
        spark_types = {c: _spark_class(t) for c, t in sdf.dtypes}
        duck_types = {c: _duck_class(t) for c, t in oracle_describe[name]}
        if sorted(spark_types) != sorted(duck_types):
            mismatches.append(
                f"{name}: columns {sorted(spark_types)} vs "
                f"{sorted(duck_types)}"
            )
            continue
        for col, scls in spark_types.items():
            dcls = duck_types[col]
            if scls != dcls:
                mismatches.append(f"{name}.{col}: spark {scls} vs oracle {dcls}")
    assert not mismatches, "; ".join(mismatches)
