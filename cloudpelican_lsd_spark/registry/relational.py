"""Relational breadth beyond the reference: semi/anti joins, ranking windows, CUBE/ROLLUP, set ops."""

from __future__ import annotations

from cloudpelican_lsd_spark.operators import stats as stats_ops
from cloudpelican_lsd_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloudpelican_lsd_spark.registry._core import (
    register,
)


# ===========================================================================
# relational breadth: semi/anti joins, ranking windows, CUBE, set ops
# (the reference has no joins at all — SURVEY.md §2.3 — and inherits its
# relational surface from BigQuery via `search`, supervisor.go:276-351;
# these queries pin down the join/window/set-op surface a switching user
# would send through the same entry point)
# ===========================================================================


@register(
    "search_order_priority",
    """SELECT o.o_orderpriority AS orderpriority,
       COUNT(*)::BIGINT AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority""",
)
def q_search_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS ⇒ LEFT SEMI join.  The date range pushes to
    the orders scan; the semi join carries the non-equi residual
    (l_shipdate > o_orderdate) on top of the orderkey equi-key, so it
    stays a hash/sort-merge semi join — never a nested loop.  Semi join
    also never multiplies rows, so the agg input is bounded by orders."""
    o = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "search_stalled_orders",
    """SELECT o.o_orderpriority AS orderpriority,
       COUNT(*)::BIGINT AS n_stalled
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00')
GROUP BY o.o_orderpriority""",
)
def q_search_stalled_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS ⇒ LEFT ANTI join.  The correlated predicate only touches
    the lineitem side, so it is applied as a plain filter *before* the
    anti join — at 100 TB that filter prunes the build side at the scan
    (PushedFilters on l_shipdate) instead of materializing all lineitems
    into the join state."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00")
    )
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count(F.lit(1)).alias("n_stalled"))
    )


@register(
    "search_promo_revenue",
    """SELECT (100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
         THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))
         ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE))
       / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(25,6))) AS DOUBLE) AS promo_revenue_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-02-01 00:00:00'""",
)
def q_search_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact⨝dim with a conditional-aggregate ratio.
    part joins with strategy left to AQE (broadcast at harness scales —
    no shuffle of the filtered fact; part is SF-linear, so a pinned
    broadcast dies at 100 TB);
    both sums are exact DECIMAL (order-insensitive) and the ratio is one
    double expression evaluated in the same operation order as the
    oracle, so the value-hash is bit-stable."""
    dec = "decimal(25,6)"
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00"))
    )
    p = load_table(spark, "part", sf_dir)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(dec)
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (
                (
                    F.lit(100.0)
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", rev).otherwise(
                            F.lit(0).cast(dec)
                        )
                    ).cast("double")
                )
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "search_supplier_rank",
    """WITH sr AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
              AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name, sr.revenue,
       CAST(rank() OVER (ORDER BY sr.revenue DESC, s.s_suppkey) AS BIGINT)
         AS rnk
FROM sr JOIN supplier s ON s.s_suppkey = sr.l_suppkey
ORDER BY rnk LIMIT 10""",
)
def q_search_supplier_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window over an aggregate (TPC-H Q15 flavor).  The global
    rank() runs AFTER the groupBy has reduced lineitem to one row per
    supplier; the supplier join (two supplier-sized relations) is left
    to AQE.  The top-10 is expressed as a
    rank FILTER (not a post-sort limit) so Catalyst inserts
    WindowGroupLimit below the global window — each upstream partition
    forwards only its own top 10, bounding the single-partition leg to
    ~10·partitions rows however many suppliers exist.  The window order
    is a total order (revenue DESC, s_suppkey), so rank has no ties and
    the filter returns exactly the limit(10) row set."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    sr = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(25,6)"
            )
        )
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("s_suppkey"))
    return (
        sr.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            "revenue",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .where(F.col("rnk") <= 10)
        .orderBy("rnk")
    )


@register(
    "events_user_top3",
    """SELECT user_id, event_id, rn, value FROM (
  SELECT user_id, event_id, value,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY value DESC, event_id) AS BIGINT)
           AS rn
  FROM events) t WHERE rn <= 3""",
)
def q_events_user_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-N via row_number() — the partitioned-window form (one
    shuffle on user_id, rank computed streaming per partition; ties broken
    on the unique event_id so membership is deterministic).  Complements
    `topk_per_group`/`topk_per_group_salted`, which solve the same
    problem without a sort for skewed keys."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn", "value")
    )


@register(
    "events_cube_day_type",
    """WITH d AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - (CAST(floor(epoch(ts)) AS BIGINT) % 86400) AS day_bucket,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, day_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(GROUPING(event_type, day_bucket) AS INTEGER) AS gid
FROM d GROUP BY CUBE (event_type, day_bucket)""",
)
def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: (type,day), (type), (day), () marginals in ONE
    hash aggregate — Spark expands the sets map-side, so the fact scan
    happens once (vs 4 self-unions); `gid` disambiguates NULL-as-total.
    Integer-cents sum keeps the value-hash order-insensitive."""
    ev = load_table(spark, "events", sf_dir)
    d = ev.select(
        "event_type",
        stats_ops.bucket_col("ts_epoch", 86400).alias("day_bucket"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return d.cube("event_type", "day_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.grouping_id().cast("int").alias("gid"),
    )


@register(
    "user_day_setops",
    """WITH d AS (
  SELECT DISTINCT event_type, user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - (CAST(floor(epoch(ts)) AS BIGINT) % 86400) AS day_bucket
  FROM events
),
clicks AS (SELECT user_id, day_bucket FROM d WHERE event_type = 'click'),
purch  AS (SELECT user_id, day_bucket FROM d WHERE event_type = 'purchase')
SELECT user_id, day_bucket, 'click_and_purchase' AS cohort
FROM (SELECT * FROM clicks INTERSECT SELECT * FROM purch) t
UNION ALL
SELECT user_id, day_bucket, 'click_only' AS cohort
FROM (SELECT * FROM clicks EXCEPT SELECT * FROM purch) t""",
)
def q_user_day_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct set semantics) over (user, day)
    activity — the set-op surface the reference lacks entirely
    (SURVEY.md §2.7).  Spark plans both as hash semi/anti joins over the
    deduplicated sides; day granularity keeps the sets non-degenerate
    (every user is active in every cohort at month granularity)."""
    ev = load_table(spark, "events", sf_dir)
    d = ev.select(
        "event_type",
        "user_id",
        stats_ops.bucket_col("ts_epoch", 86400).alias("day_bucket"),
    ).distinct()
    clicks = d.where(F.col("event_type") == "click").select(
        "user_id", "day_bucket"
    )
    purch = d.where(F.col("event_type") == "purchase").select(
        "user_id", "day_bucket"
    )
    both = clicks.intersect(purch).withColumn(
        "cohort", F.lit("click_and_purchase")
    )
    only = clicks.subtract(purch).withColumn("cohort", F.lit("click_only"))
    return both.unionByName(only)




@register(
    "search_waiting_suppliers",
    """SELECT s.s_name AS s_name, COUNT(*)::BIGINT AS numwait
FROM lineitem l1
JOIN orders o ON l1.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name ORDER BY numwait DESC, s_name ASC LIMIT 20""",
)
def q_search_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the hardest
    decorrelation in the suite — EXISTS + NOT EXISTS over the same
    fact table, correlated on BOTH orderkey and suppkey.  The schema
    has no commit/receipt dates, so "late" is l_shipdate >
    o_orderdate + 60 days (documented stand-in, structure unchanged).

    Spark-first rewrite: instead of two correlated self-semi-joins the
    plan aggregates lineitem ONCE per order (n_suppliers,
    n_late_suppliers — reference the reference cannot push down;
    cli/cloudpelican-lsd.go:322 would ship the correlated form to
    BigQuery verbatim) and joins that back: EXISTS other-supplier ⇔
    n_supp > 1, NOT EXISTS other-late ⇔ n_late = 1 given l1 is late —
    ONE scan of lineitem serves both subqueries instead of three, and
    the oracle cross-checks the genuinely-correlated EXISTS/NOT EXISTS
    form, so the decorrelation's equivalence is hash-verified, not
    assumed.  Late rows join order stats on the orderkey equi-key;
    the 20-row answer is a TakeOrderedAndProject."""
    o = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, "lineitem", sf_dir)
    lo = li.join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    ostat = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late"),
    )
    s = load_table(spark, "supplier", sf_dir)
    return (
        lo.where(F.col("is_late"))
        .join(
            ostat.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@register(
    "search_nation_volume",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(25,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3""",
)
def q_search_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (cross-nation shipping volume): the two-sided
    symmetric nation filter over a 6-table join, grouped by both nation
    roles and ship year.  Only the genuinely fixed-size nation dims get
    an explicit broadcast hint; customer/supplier are left to
    Catalyst/AQE — at test scale they broadcast anyway, at 100 TB a
    forced broadcast of customer would OOM the executors, so pinning it
    would be the plan that does NOT survive the scale-up.
    lineitem-orders stays the only guaranteed shuffle; revenue sums
    through DECIMAL(25,6) (the float-aggregate parity discipline)."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("cn_key") == F.col("c_nationkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(25,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
