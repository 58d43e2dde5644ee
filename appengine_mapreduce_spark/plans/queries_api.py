"""Queries exercising the MapReduceJob generator-UDF path end-to-end.

These run arbitrary user Python (the reference's whole programming model)
through the Arrow-batched adapters and must still hash-match the same SQL
oracles as the native-DataFrame queries — proving the adapter layer is
semantics-preserving, not just the built-in expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from appengine_mapreduce_spark.plans.registry import register
from appengine_mapreduce_spark.plans.tables import load

_TOKENS_SQL = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"


@register(
    "mapreduce_api_wordcount",
    oracle=f"""
        SELECT tok AS word, CAST(sum(1) AS BIGINT) AS n
        FROM (SELECT unnest({_TOKENS_SQL}) AS tok FROM documents)
        GROUP BY tok
    """,
    description="Wordcount via the full MapReduceJob API (generator Mapper → "
    "map-side Combiner → shuffle → generator Reducer, Arrow-batched) — the "
    "reference's programming model (demo/main.py:195-208) on the slow path, "
    "oracle-checked against the same SQL as the native wordcount.",
    bench=True,
    tags=("api", "mr-parity", "udf"),
)
def mapreduce_api_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _wordcount_plan(spark, sf_dir)


@register(
    "mapreduce_api_eventfilter",
    oracle="""
        SELECT event_id, user_id, value
        FROM events WHERE event_type = 'purchase'
    """,
    description="Map-only job (MapOnlyMapper ≙ java MapOnlyMapper.java:15) "
    "through the generator adapter over the full events table — doubles as "
    "the generator-path throughput probe (records/sec through Python, "
    "BASELINE.md target ≥1M/s aggregate).",
    bench=True,
    tags=("api", "mr-parity", "udf", "map-only"),
)
def mapreduce_api_eventfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from appengine_mapreduce_spark.core.adapters import run_mapper
    from appengine_mapreduce_spark.core.counters import Counters
    from appengine_mapreduce_spark.core.partitioning import ensure_parallelism
    from appengine_mapreduce_spark.core.worker import MapOnlyMapper
    from pyspark.sql.types import StructType

    class PurchaseFilter(MapOnlyMapper):
        def __call__(self, ctx, row):
            if row.event_type == "purchase":
                yield (row.event_id, row.user_id, row.value)

    ev = ensure_parallelism(
        load(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    )
    counters = Counters(spark.sparkContext)
    return run_mapper(
        ev,
        PurchaseFilter(),
        StructType.fromDDL("event_id bigint, user_id bigint, value double"),
        counters.accumulator,
    )


def _wordcount_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
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

    def sum_combiner(ctx, key, values):
        yield sum(values)

    spec = (
        MapReduceSpecification.builder()
        .set_job_name("api-wordcount")
        .set_input(DataFrameInput(load(spark, sf_dir, "documents").select("text")))
        .set_mapper(WordCountMapper())
        .set_map_output_schema("word string, n bigint")
        .set_combiner(sum_combiner)
        .set_reducer(SumReducer())
        .set_output_schema("word string, n bigint")
        .set_output(None)
        .build()
    )
    return MapReduceJob.plan(spark, spec)
