"""cloudpelican_lsd_spark — a PySpark-native log-stream analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
RobinUS2/cloudpelican-lsd (rsyslog→Kafka→Storm→BigQuery log analyzer) as an
idiomatic Spark engine:

- batch relational layer on parquet (DataFrame/SQL, Catalyst-optimized),
- standing-filter fan-out as a broadcast theta-join,
- time-series stats with rollup + zero gap-fill,
- Structured Streaming ingest (parse → match → results/stats sinks),
- error classifier + time-series outlier analyzers,
- plus large-scale training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal column plumbing).

Reference behaviors are cited as ``file:line`` inside ``/root/reference``;
no reference code is used, only observed semantics.
"""

__version__ = "0.1.0"

from cloudpelican_lsd_spark.session import get_spark  # noqa: F401
