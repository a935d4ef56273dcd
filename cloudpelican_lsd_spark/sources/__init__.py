from cloudpelican_lsd_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    logs_view,
    LOGS_ORACLE_CTE,
)
