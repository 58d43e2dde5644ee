"""Deterministic-sampling and profiling queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load

_HASH = "('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"


@register(
    "deterministic_sample_10pct",
    oracle=f"""
        SELECT source, count(*) AS n_sampled, min(doc_id) AS first_doc
        FROM documents
        WHERE {_HASH} % 10000 < 1000
        GROUP BY source
    """,
    description="Reproducible 10% sample by key hash (not RNG): identical "
    "membership on every run, engine, and partitioning — the train/test "
    "split primitive; verified value-exact against DuckDB replaying the "
    "same hash arithmetic.",
    tags=("sampling", "training-data"),
)
def deterministic_sample_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.sampling import deterministic_sample

    docs = load(spark, sf_dir, "documents")
    return (
        deterministic_sample(docs, key="doc_id", fraction=0.10)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.min("doc_id").alias("first_doc"))
    )


@register(
    "profile_orders_table",
    oracle="""
        SELECT * FROM (
            SELECT 'o_orderkey' AS column,
                   CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                   count(DISTINCT o_orderkey) AS n_distinct,
                   CAST(min(o_orderkey) AS VARCHAR) AS min_s,
                   CAST(max(o_orderkey) AS VARCHAR) AS max_s
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus',
                   CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT o_orderstatus),
                   CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority',
                   CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT o_orderpriority),
                   CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
            FROM orders
        )
    """,
    description="ANALYZE-style column profiling (nulls/distincts/min/max "
    "per column) in ONE aggregation pass + stack() unpivot — the data-"
    "quality gate before a training run.",
    tags=("profiling", "training-data"),
)
def profile_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.sampling import profile_table

    orders = load(spark, sf_dir, "orders")
    return profile_table(orders, ["o_orderkey", "o_orderstatus", "o_orderpriority"])


@register(
    "global_shuffle_shards",
    oracle=f"""
        WITH hashed AS (
            SELECT doc_id, lang,
                   ('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)),
                                   1, 8))::BIGINT AS h
            FROM documents
        ),
        positioned AS (
            SELECT doc_id, lang,
                   CAST(h % 8 AS INT) AS shard,
                   CAST(row_number() OVER (PARTITION BY h % 8
                                           ORDER BY h, doc_id) - 1
                        AS BIGINT) AS position
            FROM hashed
        )
        SELECT shard, count(*) AS n_rows,
               CAST(min(position) AS BIGINT) AS min_pos,
               CAST(max(position) AS BIGINT) AS max_pos,
               CAST(sum(doc_id * (position + 1)) AS BIGINT) AS perm_sig
        FROM positioned GROUP BY shard
    """,
    description="Deterministic global shuffle for training export "
    "(operators/sampling.global_shuffle): every document gets a "
    "reproducible pseudo-random shard (row-local salted hash, no shuffle "
    "to assign) and a within-shard position (one window per shard "
    "partition — a single exchange keyed on shard). perm_sig "
    "(sum of doc_id x (position+1)) pins the EXACT permutation, so the "
    "oracle match proves byte-for-byte reproducibility of the shuffle — "
    "the property RNG-based orderBy(rand()) cannot give across task "
    "retries. min/max positions prove each shard is densely numbered.",
    tags=("sampling", "training-data", "window"),
)
def global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.sampling import global_shuffle

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    shuffled = global_shuffle(docs, key="doc_id", n_shards=8)
    return shuffled.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("position").alias("min_pos"),
        F.max("position").alias("max_pos"),
        F.sum(F.col("doc_id") * (F.col("position") + 1)).alias("perm_sig"),
    )
