"""Executable twins of the MIGRATION.md code examples — the guide's
snippets must keep running as the API evolves."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_migration_example_map_only(spark):
    from appengine_mapreduce_spark.core.job import (
        DataFrameInput, MapReduceJob, MapSpecification,
    )
    from appengine_mapreduce_spark.plans.tables import load
    from appengine_mapreduce_spark.sinks.inmemory import InMemoryOutput
    from appengine_mapreduce_spark.sources.entity import entity_scan

    def process_entity(ctx, row):
        ctx.increment("seen")
        yield (row.o_orderkey, row.o_totalprice)

    spec = MapSpecification(
        job_name="process-entities",
        input=DataFrameInput(entity_scan(
            load(spark, SF_SMOKE, "orders"),
            filters=[("o_orderpriority", "=", "1-URGENT")])),
        mapper=process_entity,
        output_schema="key bigint, value double",
        output=InMemoryOutput(),
    )
    result = MapReduceJob.run_map(spark, spec)
    expected = (
        load(spark, SF_SMOKE, "orders")
        .filter("o_orderpriority = '1-URGENT'")
        .count()
    )
    assert result.counters["seen"] == expected
    assert len(result.output) == expected


def test_migration_example_full_mapreduce(spark, tmp_path):
    from pyspark.sql import functions as F

    from appengine_mapreduce_spark.core.job import (
        DataFrameInput, MapReduceJob, MapReduceSpecification,
    )
    from appengine_mapreduce_spark.plans.tables import load
    from appengine_mapreduce_spark.sinks.files import FileOutput
    from appengine_mapreduce_spark.sources.text import line_input

    docs = load(spark, SF_SMOKE, "documents").select("text").limit(50)
    path = str(tmp_path / "lines.txt")
    with open(path, "w") as fh:
        fh.writelines(r.text.replace("\n", " ") + "\n" for r in docs.collect())

    def word_count_map(ctx, row):
        for w in row.line.split():
            yield (w, 1)

    def word_count_combine(ctx, key, values):
        yield sum(values)

    def word_count_reduce(ctx, key, values):
        yield (key, sum(values))

    out_dir = str(tmp_path / "wc_out")
    spec = MapReduceSpecification(
        job_name="word_count",
        input=DataFrameInput(line_input(spark, path)),
        mapper=word_count_map,
        combiner=word_count_combine,
        map_output_schema="word string, n bigint",
        reducer=word_count_reduce,
        output_schema="word string, n bigint",
        output=FileOutput(out_dir, shards=4),
    )
    MapReduceJob.run(spark, spec)

    got = {r.word: r.n for r in spark.read.parquet(out_dir).collect()}
    expected = {
        r.word: r.n
        for r in spark.read.text(path)
        .select(F.explode(F.split("value", r"\s+")).alias("word"))
        .filter("word <> ''")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected
