"""Named query registry: every implemented operator as a (spark, sf_dir) →
DataFrame callable plus its DuckDB oracle SQL.

This is the single source of truth consumed by ``__spark_entry__`` (driver
contract), ``bench.py``, and the test suite.  Each entry exercises one
operator family from SURVEY.md §2 with column names aligned between the
Spark plan and the oracle.

Round 5 split the single registry.py by operator family; importing
this package registers every query (the family modules run their
@register decorators at import) and then re-keys QUERIES/ORACLES
into driver order."""

from __future__ import annotations

from cloudpelican_lsd_spark.registry._core import (  # noqa: F401
    FAMILIES,
    ORACLES,
    QUERIES,
    QueryFn,
    UNGATED,
    family_of,
    register,
    register_ungated,
)
from cloudpelican_lsd_spark.sources.tables import load_table  # noqa: F401

# family modules register their queries on import (order is cosmetic —
# _apply_driver_order re-keys the dicts)
from cloudpelican_lsd_spark.registry import core_pipeline  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import search_outliers  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import dedup_core  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import similarity_core  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import text_core  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import multimodal  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import json_events  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import relational  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import corpus  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import dedup_ext  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import emb  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import events_ext  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import search_ext  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import search_joins  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import stats_ext  # noqa: F401,E402
from cloudpelican_lsd_spark.registry import text_ext  # noqa: F401,E402

from cloudpelican_lsd_spark.registry.driver_order import (  # noqa: E402
    DRIVER_ORDER,
    _apply_driver_order,
)

# compat re-exports at their old registry.* paths
from cloudpelican_lsd_spark.registry.dedup_core import (  # noqa: F401,E402
    _lined_corpus,
)

PIPELINES = core_pipeline.PIPELINES

_apply_driver_order()
