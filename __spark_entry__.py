"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship grep-pipeline query (the reference's own
e2e smoke shape, cli/resources/tests/grep_sql.sh) at sf0.001.
``queries()``/``oracle_sql()`` are built from the engine's query registry
(cloudpelican_lsd_spark/registry/ package) — one entry per implemented operator
from SURVEY.md §2, each with its DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

from cloudpelican_lsd_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["grep_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
