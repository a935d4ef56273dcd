"""Additional log-ingest formats: JSON-lines and CSV, batch and streaming.

The reference ingests exactly one shape — a raw syslog line via
rsyslog→Kafka (scripts/centos6/rsyslog_to_kafka.sh) — but real fleets ship
structured logs too.  These loaders normalize any of the three wire
formats into the SAME stream schema the whole engine consumes
(`_raw STRING, ts TIMESTAMP_NTZ, ts_epoch BIGINT`), so every downstream
operator (fan-out, grep, stats, classifier) is format-agnostic.

Scale notes:
- Schemas are always EXPLICIT (`LOG_JSON_SCHEMA` / `LOG_CSV_SCHEMA`):
  schema inference reads the data twice and can flip types between runs —
  never acceptable on a 100 TB lake, and required anyway by streaming.
- JSON parsing is `from_json` on the JVM (no Python); malformed rows land
  in `_corrupt` (PERMISSIVE mode) instead of killing the job, and
  `drop_corrupt=True` filters them after the fact.
- The timestamp path reuses the engine's ISO-8601 extraction fallback
  chain (functions/parse.py ParseBolt semantics): explicit `ts` field if
  present and valid, else extract from the message text, else now().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cloudpelican_lsd_spark.functions.parse import extract_event_time

#: structured log line: message + optional ISO-8601 timestamp + labels
LOG_JSON_SCHEMA = T.StructType(
    [
        T.StructField("message", T.StringType(), True),
        T.StructField("ts", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("level", T.StringType(), True),
    ]
)

LOG_CSV_SCHEMA = LOG_JSON_SCHEMA


def _normalize(df: DataFrame) -> DataFrame:
    """(message, ts-string, host, level) → engine log schema.

    `_raw` keeps the human-searchable line (level + host + message) so
    grep/fan-out semantics are preserved; event time prefers the explicit
    field, then in-message ISO-8601, then processing time (the ParseBolt
    fallback chain, ParseBolt.java:72-84)."""
    raw = F.concat_ws(
        " ",
        *[F.col(c) for c in ("ts", "level", "host")],
        F.coalesce(F.col("message"), F.lit("")),
    )
    ts = F.coalesce(
        F.try_to_timestamp(F.col("ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss")).cast(
            "timestamp_ntz"
        ),
        extract_event_time(F.col("ts")),
        extract_event_time(F.coalesce(F.col("message"), F.lit(""))),
        F.expr("convert_timezone('UTC', current_timestamp())"),
    )
    return df.select(
        raw.alias("_raw"),
        ts.alias("ts"),
    ).withColumn(
        "ts_epoch",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).cast("long"),
    )


def read_jsonl_logs(
    spark: SparkSession, path: str, drop_corrupt: bool = True
) -> DataFrame:
    """Batch JSON-lines ingest → engine log schema."""
    schema = T.StructType(
        LOG_JSON_SCHEMA.fields + [T.StructField("_corrupt", T.StringType(), True)]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    if drop_corrupt:
        df = df.where(F.col("_corrupt").isNull())
    return _normalize(df)


def read_csv_logs(
    spark: SparkSession, path: str, header: bool = True, sep: str = ","
) -> DataFrame:
    """Batch CSV ingest (columns message,ts,host,level) → engine schema."""
    df = (
        spark.read.schema(LOG_CSV_SCHEMA)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    return _normalize(df)


def jsonl_stream_source(spark: SparkSession, path: str) -> DataFrame:
    """Streaming JSON-lines file source → engine log schema (same contract
    as streaming/pipeline.file_source; plug into parse/fan-out as-is).
    Malformed lines are dropped like the batch twin — otherwise they'd
    enter the stream as empty-_raw rows with fabricated now() timestamps
    and skew the max-ts window anchoring."""
    schema = T.StructType(
        LOG_JSON_SCHEMA.fields + [T.StructField("_corrupt", T.StringType(), True)]
    )
    df = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    return _normalize(df.where(F.col("_corrupt").isNull()))


def read_orc_logs(spark: SparkSession, path: str) -> DataFrame:
    """Batch ORC ingest (columns message,ts,host,level) → engine schema.

    ORC is Spark-native (no extra package) and the common hand-off format
    from Hive-era log pipelines; the column contract and the normalize
    chain are identical to the JSONL/CSV twins, so a corpus can arrive in
    any of the three and hit the same fan-out."""
    return _normalize(spark.read.schema(LOG_CSV_SCHEMA).orc(path))


def write_orc_logs(df: DataFrame, path: str) -> None:
    """Structured-log writer twin: persist (message,ts,host,level) rows as
    ORC for `read_orc_logs` (round-trip pinned in tests)."""
    df.select("message", "ts", "host", "level").write.mode("overwrite").orc(path)
