"""SQL-interface queries: the engine's plans are equally expressible via
``spark.sql`` over registered views — Catalyst produces the same physical
plan either way. One representative query runs through the SQL door to
keep that contract tested (the reference had no SQL surface at all)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load


@register(
    "sql_interface_revenue",
    oracle="""
        SELECT n_name,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS nation_revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    description="Same engine through the SQL API: spark.sql over temp views "
    "(per-nation order revenue). The reference exposed no SQL; here SQL and "
    "DataFrame are two doors to one Catalyst plan.",
    tags=("sql", "join", "aggregation"),
)
def sql_interface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        SELECT n_name,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS nation_revenue,
               count(*) AS n_orders
        FROM v_orders JOIN v_customer ON o_custkey = c_custkey
                      JOIN v_nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
