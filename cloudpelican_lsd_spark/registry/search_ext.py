"""Extended TPC-H-shaped search queries (decimal-exact revenue aggregates)."""

from __future__ import annotations

from cloudpelican_lsd_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloudpelican_lsd_spark.registry._core import (
    register,
)




@register(
    "search_small_qty_revenue",
    """WITH li AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice,
         AVG(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem
)
SELECT p.p_brand AS brand,
       COUNT(*)::BIGINT AS small_qty_lines,
       CAST(SUM(CAST(li.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
         AS small_qty_revenue
FROM li JOIN part p ON p.p_partkey = li.l_partkey
WHERE li.qty < 0.2 * li.avg_qty
GROUP BY p.p_brand""",
)
def q_search_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue from lineitems whose quantity is below
    20% of their part's average (the correlated-scalar-subquery pattern).
    Spark-first: the correlated subquery decorrelates into a window AVG
    over l_partkey — ONE shuffle of the fact table, no per-part rejoin of
    an aggregated copy (the naive self-join shuffles lineitem twice and
    materializes the agg).  Quantities ride as BIGINT so the window AVG is
    an exact-sum division (order-independent → hash-stable); revenue sums
    through DECIMAL(25,6).  The part-join strategy is left to AQE —
    part is SF-linear, so it broadcasts at harness scales and shuffles
    at the 100 TB shape."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    w = Window.partitionBy("l_partkey")
    flt = (
        li.select(
            "l_partkey",
            F.col("l_quantity").cast("long").alias("qty"),
            "l_extendedprice",
        )
        .withColumn("avg_qty", F.avg("qty").over(w))
        .where(F.col("qty") < 0.2 * F.col("avg_qty"))
    )
    return (
        flt.join(
            p.select("p_partkey", "p_brand"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("small_qty_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("small_qty_revenue"),
        )
    )



@register(
    "search_disjunctive_revenue",
    """SELECT COUNT(*)::BIGINT AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6)))
            AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size <= 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size <= 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)""",
)
def q_search_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — revenue under a 3-branch disjunction of
    conjunctive brand/size/quantity predicates.  The optimizer test: the
    common `p_partkey = l_partkey` stays an equi-join (NOT a nested-loop
    over the OR), Catalyst pushes the brand/size disjunction to the part
    scan and the quantity bounds to the lineitem scan (CNF extraction:
    `l_quantity >= 1 AND l_quantity <= 30` is derivable), and the
    filtered part side's join is left to AQE (broadcast at harness
    scales; part is SF-linear, so pinning would OOM at 100 TB)."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size") <= 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size") <= 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size") <= 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(branch).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(25,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )



@register(
    "search_custdist",
    """WITH co AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'F'
  GROUP BY c.c_custkey
)
SELECT c_count::BIGINT AS c_count, COUNT(*)::BIGINT AS custdist
FROM co GROUP BY c_count""",
)
def q_search_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — distribution of per-customer order counts,
    zero-order customers included via the LEFT join (COUNT(col) skips the
    unmatched NULLs, so they land in the c_count=0 bucket).  The
    join-side filter rides in the join condition, not a WHERE (a WHERE
    would silently turn the outer join inner).  Two hash aggs; the
    second's input is one row per customer."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    co = (
        c.join(
            o,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderstatus") != "F"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy(F.col("c_count").cast("long").alias("c_count")).agg(
        F.count(F.lit(1)).alias("custdist")
    )



@register(
    "search_large_volume_customers",
    """WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 250
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(CAST(o.o_totalprice AS DECIMAL(25,6)) AS DOUBLE) AS total_price,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
FROM orders o
JOIN big ON big.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY total_qty DESC, o.o_orderkey LIMIT 20""",
)
def q_search_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — large-volume customers: the HAVING subquery
    reduces lineitem to qualifying order keys FIRST (semi-join input is
    keys only, shuffled once on l_orderkey), then the detail re-join
    reuses the same key.  Quantity sums ride in DECIMAL(25,6) so the
    HAVING threshold and the output are float-exact against the oracle;
    deterministic LIMIT via the (total_qty, o_orderkey) tie-break."""
    dec = "decimal(25,6)"
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(dec)).alias("qty"))
        .where(F.col("qty") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast(dec).cast("double").alias("total_price"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )



@register(
    "search_idle_rich_customers",
    """WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS s, COUNT(*)::BIGINT AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey, COUNT(*)::BIGINT AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS totacctbal
FROM customer c, pos
WHERE CAST(c.c_acctbal AS DECIMAL(25,6)) * pos.n > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-05-01 00:00:00')
GROUP BY c.c_nationkey""",
)
def q_search_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nationkey standing in for the phone country
    code): customers with above-average positive balance and NO orders.
    The average threshold is decorrelated into a broadcast (sum, count)
    singleton and compared CROSS-MULTIPLIED in DECIMAL — no float
    boundary for a balance sitting exactly on the mean; "idle" = no
    order since 2001-05-01 (the testdata has orders for every customer,
    so a recency window is what makes the anti join discriminate), a
    LEFT ANTI join whose date predicate is pushed to the orders scan."""
    dec = "decimal(25,6)"
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    pos = c.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast(dec)).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .where(F.col("c_acctbal").cast(dec) * F.col("n") > F.col("s"))
        .join(
            o.where(F.col("o_orderdate") >= F.lit("2001-05-01 00:00:00")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(dec)).cast("double").alias("totacctbal"),
        )
    )



@register(
    "search_returned_revenue",
    """WITH rev AS (
  SELECT c.c_custkey AS custkey, c.c_name AS cust_name, n.n_name AS nation,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(25,6))) AS DOUBLE) AS revenue
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, n.n_name
)
SELECT custkey, cust_name, nation, ROUND(revenue, 4) AS revenue
FROM rev ORDER BY revenue DESC, custkey ASC LIMIT 20""",
)
def q_search_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer, top
    20.  Broadcast nation; the lineitem-orders join shuffles on orderkey
    (AQE-replannable); TakeOrderedAndProject caps the driver transfer at
    20 rows.  Revenue sums ride DECIMAL(25,6) in both engines and the
    displayed value rounds to 4 decimals so the ORDER BY tie-break
    (custkey) is hash-stable."""
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    rev = (
        l.where(F.col("l_returnflag") == "R")
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation"),
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
    return (
        rev.select(
            "custkey", "cust_name", "nation", F.round("revenue", 4).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("custkey").asc())
        .limit(20)
    )

