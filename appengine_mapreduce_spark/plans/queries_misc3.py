"""Last coverage batch: conditional-share aggregation (TPC-H Q8 shape) and
a funnel analysis (the archetypal product-analytics query)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load

_D = "decimal(18,2)"


@register(
    "q8_market_share",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(CAST(sum(CASE WHEN n_name = 'CHINA'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(18,2)))
                        ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS DOUBLE) AS mkt_share
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY year(o_orderdate)
    """,
    description="TPC-H Q8 market-share shape: one supplier nation's share "
    "of regional revenue per year — conditional decimal sums ratioed after "
    "exact accumulation (numerator and denominator both order-independent).",
    tags=("analytics", "join", "share"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice").cast(_D) * (
        F.lit(1) - F.col("l_discount").cast(_D)
    )
    china_rev = F.when(F.col("n_name") == "CHINA", rev).otherwise(
        F.lit(0).cast("decimal(38,4)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (F.sum(china_rev).cast("double") / F.sum(rev).cast("double"))
            .cast("double")
            .alias("mkt_share")
        )
    )


@register(
    "signup_purchase_funnel",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
            FROM events GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               CAST(sum(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_signed_up,
               CAST(sum(CASE WHEN first_signup IS NOT NULL
                              AND first_purchase > first_signup
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        FROM per_user
    """,
    description="Signup→purchase funnel: per-user first-event times via "
    "conditional min, then conversion counting — one shuffle on user_id, "
    "the archetypal product-analytics rollup the reference could only "
    "express as two chained MR jobs.",
    tags=("analytics", "funnel"),
)
def signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("first_signup").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_signed_up"),
        F.sum(
            F.when(
                F.col("first_signup").isNotNull()
                & (F.col("first_purchase") > F.col("first_signup")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_converted"),
    )


@register(
    "salted_join_priority_revenue",
    oracle="""
        SELECT o_orderpriority,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    description="Skew-resistant salted join through the driver gate: the "
    "probe side spreads each key over 16 salt buckets and the build side "
    "replicates into all of them (operators/joins.salted_join) — the "
    "explicit remedy for pathological hot keys AQE's skew split can't "
    "absorb. Salting must be result-invariant: the oracle is the PLAIN "
    "join, so any row lost or duplicated by the salt plumbing fails the "
    "value hash.",
    tags=("join", "skew", "salted"),
)
def salted_join_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.joins import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, orders, key="l_orderkey", build_key="o_orderkey")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return joined.groupBy("o_orderpriority").agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "grouped_values_capped",
    oracle="""
        SELECT user_id,
               array_to_string(list_slice(list_sort(list(event_type)), 1, 5),
                               ',') AS sample_values,
               count(*) AS n_total
        FROM events GROUP BY user_id
    """,
    description="IdentityReducer(maxGroupedValues) parity through the "
    "driver gate (reference: reducers/IdentityReducer.java, value caps "
    "shuffler.py:596-598): collate values per key as a SORTED list capped "
    "at 5 (operators/shuffle.group_values) — sorting makes the cap "
    "deterministic, so the truncated list value-hashes identically in "
    "both engines; joined to a string for portable comparison.",
    tags=("mr-parity", "reducer", "grouping"),
)
def grouped_values_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.shuffle import group_values

    ev = load(spark, sf_dir, "events")
    grouped = group_values(
        ev, "user_id", "event_type", sort=True, max_grouped_values=5
    )
    n = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_total"))
    return grouped.join(n, "user_id").select(
        "user_id",
        F.array_join("values", ",").alias("sample_values"),
        "n_total",
    )


@register(
    "bucketed_join_revenue",
    oracle="""
        SELECT c_mktsegment,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    description="Bucketed co-located join through the driver gate "
    "(reference: outputs/ShardingOutputWriter.java — per-key-bucket files "
    "for the NEXT job's co-located consumption): orders and customer are "
    "written bucketed on the join key (sinks/bucketed.BucketedTableOutput, "
    "8 buckets each), then joined — same-bucket-spec joins run without an "
    "exchange (plan-asserted in tests/test_sources_sinks.py); the oracle "
    "is the plain join, so the bucketing layout is value-hash-verified.",
    tags=("join", "bucketed", "sinks"),
)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re as _re

    from appengine_mapreduce_spark.sinks.bucketed import BucketedTableOutput

    tag = _re.sub(r"[^A-Za-z0-9]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    orders_t, cust_t = f"bt_orders_{tag}", f"bt_customer_{tag}"
    BucketedTableOutput(orders_t, key="o_custkey", num_buckets=8).write(
        load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    )
    BucketedTableOutput(cust_t, key="c_custkey", num_buckets=8).write(
        load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    o = spark.table(orders_t)
    c = spark.table(cust_t)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
