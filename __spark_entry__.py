"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship grep-pipeline query (the reference's own
e2e smoke, cli/resources/tests/grep_sql.sh) at sf0.001.  ``queries()`` maps
every implemented operator from SURVEY.md §2 to a (spark, sf_dir) callable;
``oracle_sql()`` holds the DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

from cloudpelican_lsd_spark.operators.grep_pipeline import GrepPipeline
from cloudpelican_lsd_spark.sources.tables import LOGS_ORACLE_CTE, logs_view

# ---------------------------------------------------------------------------
# grep pipelines under test — the flagship mirrors the reference's own e2e
# test pipeline shape (cli/resources/tests/grep_sql.sh:1)
# ---------------------------------------------------------------------------

_PIPELINES = {
    # flagship: negation + case-insensitive word + regex + sort + limit
    "grep_pipeline": "cat all | grep -v click | grep -i ERROR | grep -e 'value=[0-9]+' | sort | limit 50",
    # plain-word contains fast path (Filter.java:96 semantics)
    "grep_word": "cat all | grep purchase | sort",
    # -v and -i composition
    "grep_invert_icase": "cat all | grep -v -i SIGNUP | grep -i Error | sort | limit 100",
    # raw regex path + `head` (LIMIT 10, grepsql.go:70-72)
    "grep_regex": "cat all | grep -e 'host[0-9] ' | sort | head",
    # case-insensitive regex: (?i) injection (grepsql.go `-i -e`)
    "grep_icase_regex": "cat all | grep -i -e 'ERROR|PURCHASE' | sort - r | limit 25",
}


def _grep_q(pipeline: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return GrepPipeline.parse(pipeline).apply(logs_view(spark, sf_dir))

    return run


def _grep_oracle(pipeline: str) -> str:
    return f"WITH {LOGS_ORACLE_CTE}\n" + GrepPipeline.parse(pipeline).to_duckdb_sql("logs")


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _grep_q(_PIPELINES["grep_pipeline"])(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, pipe in _PIPELINES.items():
        q[name] = _grep_q(pipe)
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    for name, pipe in _PIPELINES.items():
        o[name] = _grep_oracle(pipe)
    return o
