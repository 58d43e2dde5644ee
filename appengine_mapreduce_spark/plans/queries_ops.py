"""Pipeline-operations queries: change-data capture between snapshots and
declarative data-quality gates — the admission/incremental machinery around
a 100 TB training-data build (operators/cdc.py, operators/quality_checks.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load


@register(
    "cdc_snapshot_diff",
    oracle="""
        WITH old AS (
            SELECT c_custkey, c_acctbal, c_nationkey FROM customer
            WHERE c_custkey % 10 <> 3
        ),
        new AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
                        ELSE c_acctbal END AS c_acctbal,
                   c_nationkey
            FROM customer WHERE c_custkey % 13 <> 5
        )
        SELECT * FROM (
            SELECT COALESCE(new.c_custkey, old.c_custkey) AS c_custkey,
                   CASE WHEN old.c_custkey IS NULL THEN 'insert'
                        WHEN new.c_custkey IS NULL THEN 'delete'
                        WHEN old.c_acctbal IS DISTINCT FROM new.c_acctbal
                          OR old.c_nationkey IS DISTINCT FROM new.c_nationkey
                        THEN 'update'
                   END AS change_type,
                   CASE WHEN new.c_custkey IS NULL THEN old.c_acctbal
                        ELSE new.c_acctbal END AS c_acctbal,
                   CASE WHEN new.c_custkey IS NULL THEN old.c_nationkey
                        ELSE new.c_nationkey END AS c_nationkey
            FROM old FULL OUTER JOIN new ON old.c_custkey = new.c_custkey
        ) WHERE change_type IS NOT NULL
    """,
    description="Change-data capture between two customer snapshots "
    "(operators/cdc.snapshot_diff): one full-outer key shuffle, null-safe "
    "column comparison, emits only insert/delete/update rows — the delta an "
    "incremental pipeline consumes instead of a full reprocess. Snapshots "
    "are derived deterministically from the fixture (drops + a balance "
    "bump) so the oracle replays them exactly.",
    tags=("pipeline", "cdc", "join"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.cdc import snapshot_diff

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    old = cust.filter(F.col("c_custkey") % 10 != 3)
    new = cust.filter(F.col("c_custkey") % 13 != 5).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100
        ).otherwise(F.col("c_acctbal")),
    )
    return snapshot_diff(old, new, key_cols=["c_custkey"])


@register(
    "data_quality_checks",
    oracle="""
        SELECT 'orderkey_not_null' AS rule,
               CAST(sum(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS violations,
               count(*) AS n_rows
        FROM orders
        UNION ALL
        SELECT 'totalprice_positive',
               CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT),
               count(*)
        FROM orders
        UNION ALL
        SELECT 'status_in_domain',
               CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END) AS BIGINT),
               count(*)
        FROM orders
        UNION ALL
        SELECT 'custkey_non_negative',
               CAST(sum(CASE WHEN o_custkey >= 0 THEN 0 ELSE 1 END) AS BIGINT),
               count(*)
        FROM orders
    """,
    description="Declarative data-quality gate "
    "(operators/quality_checks.validate): every expectation is a "
    "conditional sum inside ONE partial+final aggregation — a 100-rule "
    "suite over 100 TB costs a single scan with map-side combine, then a "
    "shuffle-free stack() unpivot of the 1-row aggregate. NULL rule "
    "results count as violations (unevaluable = failing).",
    tags=("pipeline", "quality", "aggregation"),
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.quality_checks import validate

    orders = load(spark, sf_dir, "orders")
    return validate(
        orders,
        {
            "orderkey_not_null": F.col("o_orderkey").isNotNull(),
            "totalprice_positive": F.col("o_totalprice") > 0,
            "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
            "custkey_non_negative": F.col("o_custkey") >= 0,
        },
    )


@register(
    "incremental_agg_refresh",
    oracle="""
        WITH new AS (
            SELECT c_custkey, c_nationkey,
                   CAST(CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100
                             ELSE c_acctbal END AS DECIMAL(18,2)) AS bal
            FROM customer WHERE c_custkey % 13 <> 5
        )
        SELECT c_nationkey, CAST(sum(bal) AS DOUBLE) AS total, count(*) AS n
        FROM new GROUP BY c_nationkey
    """,
    description="Incremental materialized-aggregate maintenance "
    "(operators/cdc.incremental_sum_refresh): the per-nation (sum, count) "
    "aggregate is refreshed from the OLD aggregate plus the CDC delta's "
    "signed contributions (+new value on the new group, -old value on the "
    "old group — group migration included), never from a full rescan. The "
    "oracle aggregates the NEW snapshot directly, so a match PROVES "
    "incremental == full recompute. Sums are decimal for exact retraction; "
    "at 100 TB the refresh cost tracks change volume, not table size.",
    tags=("pipeline", "cdc", "aggregation", "incremental"),
)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.cdc import (
        incremental_sum_refresh,
        snapshot_diff,
    )

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    old = cust.filter(F.col("c_custkey") % 10 != 3)
    new = cust.filter(F.col("c_custkey") % 13 != 5).withColumn(
        "bal",
        F.when(F.col("c_custkey") % 7 == 0, F.col("bal") + 100)
        .otherwise(F.col("bal"))
        .cast("decimal(18,2)"),
    )
    old_agg = old.groupBy("c_nationkey").agg(
        F.sum("bal").alias("total"), F.count(F.lit(1)).alias("n")
    )
    delta = snapshot_diff(
        old, new, key_cols=["c_custkey"], include_old=True
    )
    refreshed = incremental_sum_refresh(
        old_agg, delta, group_col="c_nationkey", value_col="bal",
        sum_col="total", count_col="n",
    )
    return refreshed.select(
        "c_nationkey", F.col("total").cast("double").alias("total"), "n"
    )
