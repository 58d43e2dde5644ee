"""Dynamic-schema queries: the reference's datastore entities carry
arbitrary typed properties (SURVEY.md §1.2); our fixture's analog is the
``events.props`` JSON string column. Spark's JSON path expressions and
DuckDB's JSON functions agree on extraction semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load


@register(
    "dynamic_props_agg",
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
                   AS total_k,
               max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    description="Aggregate over a dynamic JSON property column — the "
    "datastore dynamic-schema pattern (entity properties not in the fixed "
    "schema; SURVEY.md §1.2/§7.2 risk c): extract at scan time, then "
    "ordinary codegen'd aggregation.",
    tags=("dynamic-schema", "json", "aggregation"),
)
def dynamic_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("total_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "dynamic_props_filter",
    oracle="""
        SELECT event_id, user_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 90
    """,
    description="Filter on a dynamic JSON property (≙ datastore property "
    "filter on a non-modeled attribute).",
    tags=("dynamic-schema", "json", "filter"),
)
def dynamic_props_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", "user_id", k.alias("k")).filter(F.col("k") >= 90)
