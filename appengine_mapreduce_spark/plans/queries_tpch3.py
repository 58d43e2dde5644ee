"""Third TPC-H batch — adapted to the fixture's columns — chosen to cover
the join/subquery shapes not yet exercised: LEFT OUTER (Q13), anti-join
(Q22), correlated scalar subquery via window (Q17), two-sided dimension
join (Q7), and view-style CTE aggregation (Q15)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load

_D = "decimal(18,2)"


def _dec(col: str):
    return F.col(col).cast(_D)


_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


@register(
    "q7_nation_volume",
    oracle=f"""
        SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
               CAST(sum({_REV}) AS DOUBLE) AS volume
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n1.n_name, n2.n_name
    """,
    description="TPC-H Q7 shape: shipping volume between distinct "
    "customer/supplier nations — the same dimension table joined twice "
    "under different roles. Only nation (25 rows) carries broadcast hints; "
    "customer/supplier are SF-scaled so AQE's size guard picks their "
    "strategy.",
    tags=("analytics", "join"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == n1.c_nk)
        .join(F.broadcast(n2), supp.s_nationkey == n2.s_nk)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.sum(revenue).cast("double").alias("volume"))
    )


@register(
    "q13_order_count_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    description="TPC-H Q13 customer order-count distribution: LEFT OUTER "
    "join (customers with zero orders count as 0) + double aggregation.",
    tags=("analytics", "join", "outer"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no, CAST(sum({_REV}) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    description="TPC-H Q15 top supplier: CTE revenue view + scalar max "
    "subquery (decimal-exact so the max comparison is portable).",
    tags=("analytics", "subquery", "scalar-cross"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("total_revenue")
        )
    )
    # Scalar max + broadcast cross join, NOT a global rank window: a
    # Window.orderBy with no partition key funnels the whole supplier
    # aggregate through one partition — needless at any scale when only
    # the max is wanted. The 1-row max broadcasts; the aggregate never
    # re-sorts.
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    top = (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .drop("_mx")
    )
    supp = load(spark, sf_dir, "supplier")
    return top.join(supp, top.supplier_no == supp.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                   AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT 0.2 * avg(l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    description="TPC-H Q17 small-quantity-order revenue: correlated scalar "
    "subquery (per-part average) — implemented as a window average, one "
    "pass, no rescan per row. avg is over integral quantities ⇒ exact in "
    "both engines.",
    tags=("analytics", "subquery", "window"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    w = Window.partitionBy("l_partkey")
    # quantities are x.0 doubles; sum/count both exact ⇒ avg deterministic
    with_avg = li.withColumn("_avg_qty", F.avg("l_quantity").over(w))
    return (
        with_avg.join(part, with_avg.l_partkey == part.p_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q22_idle_customers",
    oracle="""
        WITH avg_bal AS (
            SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer, avg_bal
        WHERE c_acctbal > a
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """,
    description="TPC-H Q22 shape: above-average-balance customers with no "
    "orders — anti-join (NOT EXISTS) + scalar aggregate subquery. avg over "
    "2-decimal doubles is summation-order-sensitive only below the "
    "comparison's discrimination (balances differ at cent scale).",
    tags=("analytics", "join", "anti", "subquery", "scalar-cross"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    # Scalar avg as a 1-row broadcast cross join (same pattern as
    # q11_important_stock / tfidf_top_terms): one plan, no driver action
    # before the final collect.
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_a"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
