"""Additional coverage: ntile/lag-lead windows, multimodal plumbing through
the driver gate, and a lazily-chained two-stage MapReduce."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load


@register(
    "customer_balance_quartiles",
    oracle="""
        SELECT c_custkey,
               ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
               lag(c_custkey) OVER (ORDER BY c_acctbal, c_custkey) AS prev_cust,
               lead(c_custkey) OVER (ORDER BY c_acctbal, c_custkey) AS next_cust
        FROM customer
    """,
    description="ntile/lag/lead analytic windows over a deterministic "
    "global order — completes the window-function surface (global windows "
    "single-partition: fine for dimension tables, never for facts).",
    tags=("analytics", "window"),
)
def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.lag("c_custkey").over(w).alias("prev_cust"),
        F.lead("c_custkey").over(w).alias("next_cust"),
    )


@register(
    "multimodal_decode_stub",
    oracle=None,  # stubbed decoders are engine-internal — rows-only check;
    # determinism and schema are asserted in tests/test_multimodal.py
    description="Multimodal pipeline through the driver gate: documents' "
    "text bytes stand in for media blobs → binary column → Arrow-batched "
    "stub decode → (width, height, feature vector) stats. Proves the "
    "binary-column plumbing end-to-end; real codecs swap one function "
    "(operators/multimodal.py).",
    tags=("multimodal", "udf"),
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.operators.multimodal import decode_image_features

    blobs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.encode("text", "utf-8").alias("content")
    )
    feats = decode_image_features(blobs)
    return feats.agg(
        F.count(F.lit(1)).alias("n_decoded"),
        F.min("width").alias("min_w"),
        F.max("height").alias("max_h"),
        F.round(F.avg(F.element_at("features", 1)), 6).alias("mean_f0"),
    )


@register(
    "mapreduce_api_chained",
    oracle="""
        SELECT tok AS word, count(*) AS n
        FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                        t -> t <> '')) AS tok FROM documents)
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 1
    """,
    description="Chained two-stage MapReduce, fully lazy (stage 2's mapper "
    "consumes stage 1's output DataFrame with no intermediate action) — "
    "≙ ChainedMapReduceJob.java, minus the materialization between stages.",
    tags=("api", "mr-parity", "udf", "chaining"),
)
def mapreduce_api_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.core.job import (
        DataFrameInput,
        MapReduceJob,
        MapReduceSpecification,
    )
    from appengine_mapreduce_spark.core.worker import Mapper, Reducer

    class WordCountMapper(Mapper):
        def __call__(self, ctx, row):
            for w in row.text.split():
                if w:
                    yield (w, 1)

    class SumReducer(Reducer):
        def __call__(self, ctx, key, values):
            yield (key, sum(values))

    stage1 = MapReduceJob.plan(
        spark,
        MapReduceSpecification(
            job_name="chain-wc",
            input=DataFrameInput(load(spark, sf_dir, "documents").select("text")),
            mapper=WordCountMapper(),
            map_output_schema="word string, n bigint",
            reducer=SumReducer(),
            output_schema="word string, n bigint",
            output=None,
        ),
    )

    class TagMapper(Mapper):
        def __call__(self, ctx, row):
            yield ("all", f"{row.n:012d}:{row.word}")

    class MaxReducer(Reducer):
        def __call__(self, ctx, key, values):
            # max on the zero-padded "count:word" string = (max n, max word);
            # ties on n resolve to the lexicographically LAST word, so
            # invert: take max n, then min word among that n.
            vals = list(values)
            best_n = max(int(v.split(":", 1)[0]) for v in vals)
            best_word = min(
                v.split(":", 1)[1] for v in vals if int(v.split(":", 1)[0]) == best_n
            )
            yield (best_word, best_n)

    stage2 = MapReduceJob.plan(
        spark,
        MapReduceSpecification(
            job_name="chain-top",
            input=DataFrameInput(stage1),
            mapper=TagMapper(),
            map_output_schema="key string, value string",
            reducer=MaxReducer(),
            output_schema="word string, n bigint",
            output=None,
        ),
    )
    return stage2
