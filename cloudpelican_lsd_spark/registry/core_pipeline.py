"""Reference core: grep pipelines (P2-P5, O1-O2), filter catalog fan-out (S9, P2/P3), the stats pipeline (A1-A6), and tail/cursor/parse (O3-O4, P1, F1)."""

from __future__ import annotations

from cloudpelican_lsd_spark.catalog import demo_catalog
from cloudpelican_lsd_spark.functions.parse import ISO8601_RE
from cloudpelican_lsd_spark.functions.parse import is_likely_error
from cloudpelican_lsd_spark.functions.parse import is_likely_error_sql
from cloudpelican_lsd_spark.operators import stats as stats_ops
from cloudpelican_lsd_spark.operators.fanout import MATCH_COND_DUCKDB
from cloudpelican_lsd_spark.operators.fanout import match_counts_compiled
from cloudpelican_lsd_spark.operators.grep_pipeline import GrepPipeline
from cloudpelican_lsd_spark.operators.tail import tail_last_n
from cloudpelican_lsd_spark.sources.tables import LOGS_ORACLE_CTE
from cloudpelican_lsd_spark.sources.tables import logs_view
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.registry._core import (
    QueryFn,
    register,
)


# ===========================================================================
# grep pipelines (P2-P5, O1, O2; flagship = reference e2e grep_sql.sh)
# ===========================================================================

PIPELINES = {
    "grep_pipeline": "cat all | grep -v click | grep -i ERROR | grep -e 'value=[0-9]+' | sort | limit 50",
    "grep_word": "cat all | grep purchase | sort",
    "grep_invert_icase": "cat all | grep -v -i SIGNUP | grep -i Error | sort | limit 100",
    "grep_regex": "cat all | grep -e 'host[0-9] ' | sort | head",
    "grep_icase_regex": "cat all | grep -i -e 'ERROR|PURCHASE' | sort - r | limit 25",
}

for _name, _pipe in PIPELINES.items():

    def _mk(pipe: str) -> QueryFn:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return GrepPipeline.parse(pipe).apply(logs_view(spark, sf_dir))

        run.__doc__ = f"Grep pipeline `{pipe}` as one DataFrame plan (grepsql.go grammar)."
        return run

    register(
        _name,
        f"WITH {LOGS_ORACLE_CTE}\n" + GrepPipeline.parse(_pipe).to_duckdb_sql("logs"),
    )(_mk(_pipe))


# ===========================================================================
# filter catalog + standing-filter fan-out (S9, P2/P3; MatchBolt semantics)
# ===========================================================================

_CAT = demo_catalog()
_FILTERS_CTE = f"filters AS {_CAT.to_values_sql(include_temp=True)}"


@register(
    "filter_fanout_counts",
    f"""WITH {LOGS_ORACLE_CTE}, {_FILTERS_CTE}
SELECT f.id AS filter_id, f.name AS filter_name,
       COUNT(*)::BIGINT AS match_cnt
FROM logs l JOIN filters f ON {MATCH_COND_DUCKDB}
GROUP BY 1, 2""",
)
def q_filter_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing-filter fan-out match counts: the MatchBolt hot path as one compiled scan."""
    return match_counts_compiled(
        logs_view(spark, sf_dir), _CAT.list(include_temp=True)
    )


@register(
    "show_filters",
    f"""WITH {_FILTERS_CTE}
SELECT id, name, regex FROM filters WHERE name NOT LIKE '\\_\\_tmp\\_\\_%' ESCAPE '\\'""",
)
def q_show_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter catalog listing (BoltDB CRUD analog)."""
    # `show filters` hides temp filters (cli/cloudpelican-lsd.go:448-450)
    return (
        _CAT.to_df(spark, include_temp=False).select("id", "name", "regex")
    )


@register(
    "select_where_limit",
    f"""WITH {LOGS_ORACLE_CTE}
SELECT _raw FROM logs
WHERE contains(_raw, 'error') AND regexp_matches(_raw, 'value=[0-9]{{3}} ')
ORDER BY _raw LIMIT 20""",
)
def q_select_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`select * from errors where 'value=[0-9]{3} ' limit 20` — the
    where-clause-as-temp-filter path (cli/cloudpelican-lsd.go:455-523)."""
    logs = logs_view(spark, sf_dir)
    return (
        logs.where(F.col("_raw").contains("error"))
        .where(F.col("_raw").rlike("value=[0-9]{3} "))
        .select("_raw")
        .orderBy("_raw")
        .limit(20)
    )


# ===========================================================================
# stats pipeline (A1-A6): bucketing, rollup+window, gap-fill, pivot, minmax
# ===========================================================================

_STATS_CTE = f"""{LOGS_ORACLE_CTE},
b AS (
  SELECT ts_epoch - ts_epoch % {{rollup}} AS bucket,
         {is_likely_error_sql('_raw')} AS is_err
  FROM logs
),
s AS (
  SELECT 1 AS metric, bucket, COUNT(*)::BIGINT AS cnt FROM b GROUP BY bucket
  UNION ALL
  SELECT 2 AS metric, bucket, COUNT(*)::BIGINT AS cnt FROM b WHERE is_err GROUP BY bucket
)"""


@register(
    "stats_rollup_minutely",
    f"WITH {_STATS_CTE.format(rollup=60)}\nSELECT metric, bucket, cnt FROM s",
)
def q_stats_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minutely match/error counters per filter (A3)."""
    return stats_ops.metric_counts(logs_view(spark, sf_dir), rollup_sec=60)


@register(
    "stats_gapfill",
    f"""WITH {_STATS_CTE.format(rollup=300)},
bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM s),
grid AS (
  SELECT m.metric, g.bucket
  FROM (SELECT unnest(generate_series(lo, hi, 300)) AS bucket FROM bounds) AS g,
       (SELECT DISTINCT metric FROM s) AS m
)
SELECT grid.metric, grid.bucket, COALESCE(s.cnt, 0)::BIGINT AS cnt
FROM grid LEFT JOIN s ON s.metric = grid.metric AND s.bucket = grid.bucket""",
)
def q_stats_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window+rollup with zero gap-fill via sequence-explode join (A5)."""
    mc = stats_ops.metric_counts(logs_view(spark, sf_dir), rollup_sec=300)
    return stats_ops.gap_fill(mc, rollup_sec=300)


@register(
    "stats_window_rollup",
    f"""WITH {_STATS_CTE.format(rollup=60)},
now_e AS (SELECT max(ts_epoch) AS now_epoch FROM logs)
SELECT metric, bucket - bucket % 3600 AS bucket, SUM(cnt)::BIGINT AS cnt
FROM s, now_e
WHERE bucket - bucket % 3600 >= now_epoch - {7 * 86400}
GROUP BY 1, 2""",
)
def q_stats_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Client-side re-rollup: minutely series → 1h buckets, 7d lookback
    (supervisorcon.go:43-119 with window/rollup args)."""
    logs = logs_view(spark, sf_dir)
    mc = stats_ops.metric_counts(logs, rollup_sec=60)
    now_df = logs.agg(F.max("ts_epoch").alias("now_epoch"))
    rolled = (
        mc.withColumn("bucket", stats_ops.bucket_col("bucket", 3600))
        .crossJoin(F.broadcast(now_df))
        .where(F.col("bucket") >= F.col("now_epoch") - F.lit(7 * 86400))
        .groupBy("metric", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return rolled


@register(
    "stats_pivot_dual",
    f"""WITH {_STATS_CTE.format(rollup=300)}
SELECT bucket,
       SUM(CASE WHEN metric = 1 THEN cnt ELSE 0 END)::BIGINT AS regular_cnt,
       SUM(CASE WHEN metric = 2 THEN cnt ELSE 0 END)::BIGINT AS error_cnt
FROM s GROUP BY bucket""",
)
def q_stats_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dual-metric overlay: regular vs error series pivoted by bucket."""
    mc = stats_ops.metric_counts(logs_view(spark, sf_dir), rollup_sec=300)
    return stats_ops.pivot_dual_series(mc)


@register(
    "stats_chart_series",
    f"""WITH {_STATS_CTE.format(rollup=300)}
SELECT metric, bucket, cnt FROM (
  SELECT metric, bucket, cnt,
         row_number() OVER (PARTITION BY metric ORDER BY bucket DESC) AS rn
  FROM s
) WHERE rn <= 79""",
)
def q_stats_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5/O6: last terminal_width-1 points per metric (cli/stats.go:116-123)."""
    mc = stats_ops.metric_counts(logs_view(spark, sf_dir), rollup_sec=300)
    return stats_ops.chart_series(mc, width=79)


@register(
    "stats_minmax",
    f"""WITH {_STATS_CTE.format(rollup=60)}
SELECT min(cnt)::BIGINT AS min_cnt, max(cnt)::BIGINT AS max_cnt FROM s""",
)
def q_stats_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max scan for chart y-scaling (A6)."""
    mc = stats_ops.metric_counts(logs_view(spark, sf_dir), rollup_sec=60)
    return stats_ops.minmax_scale(mc)


# ===========================================================================
# tail / cursor / parse (O3, O4, P1, F1)
# ===========================================================================


@register(
    "tail_last_n",
    f"""WITH {LOGS_ORACLE_CTE}
SELECT _raw, ts_epoch, event_id FROM logs
WHERE contains(_raw, 'error')
ORDER BY ts_epoch DESC, event_id DESC LIMIT 100""",
)
def q_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tail last-N: TakeOrderedAndProject, re-sorted ascending (O3)."""
    logs = logs_view(spark, sf_dir).where(F.col("_raw").contains("error"))
    return tail_last_n(logs.select("_raw", "ts_epoch", "event_id"), 100)


@register(
    "cursor_read",
    f"""WITH {LOGS_ORACLE_CTE}
SELECT _raw, event_id FROM logs
WHERE event_id > (SELECT max(event_id) - 500 FROM logs)
ORDER BY event_id ASC LIMIT 200""",
)
def q_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-cursor page: id > offset, oldest-first, capped
    (supervisor.go:473-512).  The offset is computed as a broadcast scalar
    (max-500) so the plan needs no driver round-trip."""
    logs = logs_view(spark, sf_dir)
    threshold = logs.agg((F.max("event_id") - 500).alias("_off"))
    return (
        logs.select("_raw", "event_id")
        .crossJoin(F.broadcast(threshold))
        .where(F.col("event_id") > F.col("_off"))
        .orderBy(F.col("event_id").asc())
        .limit(200)
        .drop("_off")
    )


@register(
    "parse_extract_ts",
    f"""WITH {LOGS_ORACLE_CTE}
SELECT event_id, regexp_extract(_raw, '{ISO8601_RE}', 0) AS event_ts_str
FROM logs""",
)
def q_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 event-time extraction with sub-ms strip (F1)."""
    logs = logs_view(spark, sf_dir)
    return logs.select(
        "event_id",
        F.regexp_extract(F.col("_raw"), ISO8601_RE, 0).alias("event_ts_str"),
    )


@register(
    "parse_normalize",
    f"""WITH {LOGS_ORACLE_CTE},
planted AS (
  SELECT event_id,
         CASE WHEN event_id % 97 = 0 THEN '  ' || _raw || repeat('x', 5000)
              WHEN event_id % 89 = 0 THEN '   '
              ELSE _raw END AS _raw
  FROM logs
),
trimmed AS (SELECT event_id, trim(_raw) AS t FROM planted)
SELECT event_id,
       CASE WHEN length(t) > 4096 THEN substr(t, 1, 4096) || '..'
            ELSE t END AS _raw
FROM trimmed
WHERE t IS NOT NULL AND length(t) > 0""",
)
def q_parse_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 ParseBolt normalize semantics (trim / drop-empty / 4096-truncate
    with `..`), exercised on planted oversized and whitespace-only lines so
    every branch shows up in the hash (testdata lines are all short)."""
    logs = logs_view(spark, sf_dir).select("event_id", "_raw")
    planted = logs.withColumn(
        "_raw",
        F.when(
            F.col("event_id") % 97 == 0,
            F.concat(F.lit("  "), F.col("_raw"), F.expr("repeat('x', 5000)")),
        )
        .when(F.col("event_id") % 89 == 0, F.lit("   "))
        .otherwise(F.col("_raw")),
    )
    from cloudpelican_lsd_spark.functions.parse import normalize_lines

    return normalize_lines(planted)


@register(
    "classifier_heuristic",
    f"""WITH {LOGS_ORACLE_CTE}
SELECT event_type, {is_likely_error_sql('_raw')} AS is_err,
       COUNT(*)::BIGINT AS cnt
FROM logs GROUP BY 1, 2""",
)
def q_classifier_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25-keyword error labeler as a column expression (F7).  _spread
    (guide §2.5): the heuristic's contains-chain runs on the scan stage;
    a single-split local scan serialized it onto one core (0.5 s single
    task at sf0.1); no-op at scale."""
    from cloudpelican_lsd_spark.operators.dedup import _spread

    logs = _spread(logs_view(spark, sf_dir))
    return (
        logs.select(
            "event_type", is_likely_error(F.col("_raw")).alias("is_err")
        )
        .groupBy("event_type", "is_err")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


