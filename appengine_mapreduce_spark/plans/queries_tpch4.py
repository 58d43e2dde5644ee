"""Fourth TPC-H batch: the EXISTS (Q4) and double-correlated semi+anti
(Q21) patterns — the last classic join/subquery shapes the registry lacked.

The fixture's lineitem has no commit/receipt dates, so "late" uses a
documented ship-date proxy (l_shipdate > o_orderdate + N days); the
pattern — correlated EXISTS / NOT EXISTS compiled to semi/anti joins — is
the point, and the oracle applies the identical proxy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load


@register(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 80 DAY)
        GROUP BY o_orderpriority
    """,
    description="TPC-H Q4 order-priority checking: correlated EXISTS with a "
    "cross-table predicate (late-ship proxy: shipped >80 days after order) "
    "— compiles to a left-semi join with a non-equi condition; the priority "
    "rollup counts orders, not lineitems.",
    tags=("analytics", "semi-join", "exists"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_exists = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 80 DAYS")),
        "left_semi",
    )
    return late_exists.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
        WITH late AS (
            SELECT l_orderkey, l_suppkey
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
    """,
    description="TPC-H Q21 suppliers-who-kept-orders-waiting: the classic "
    "semi-join (another supplier shares the order) + anti-join (but no OTHER "
    "supplier was late) on the same fact table, late-ship proxy as in Q4. "
    "Both correlations reduce to per-order distinct-supplier COUNTS "
    "(EXISTS other supplier ⇔ n_suppliers ≥ 2; NOT EXISTS other late "
    "supplier ⇔ n_late_suppliers = 1, since the row's own supplier is "
    "late): two partially-aggregated shuffles on the order key replace "
    "semi/anti joins that would re-shuffle the raw fact table — smaller "
    "exchanges at any scale, same rows out.",
    bench=True,
    tags=("analytics", "semi-join", "anti-join"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")

    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    # EXISTS/NOT EXISTS as per-order distinct-supplier counts: both
    # aggregates partially combine map-side and share the orderkey shuffle
    # key with the final joins — no re-shuffle of raw lineitem rows.
    order_suppliers = li.groupBy(F.col("l_orderkey").alias("o2_key")).agg(
        F.count_distinct("l_suppkey").alias("_n_supp")
    )
    late_suppliers = late.groupBy(F.col("l_orderkey").alias("o3_key")).agg(
        F.count_distinct("l_suppkey").alias("_n_late")
    )
    l1 = (
        late.join(order_suppliers, F.col("l_orderkey") == F.col("o2_key"))
        .join(late_suppliers, F.col("l_orderkey") == F.col("o3_key"))
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_late") == 1))
    )
    return (
        l1.join(supp, l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
