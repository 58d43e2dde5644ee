"""MapReduceJob API tests — Spark-idiomatic mirrors of the reference's
end-to-end scenarios:

- wordcount MR       ≙ mapreduce_pipeline_test.py:125 testMapReduce
- combiner semantics ≙ combiner_test.py:77 (without) vs :123 (with)
- counters           ≙ end_to_end_test.py counter assertions
- map-only job       ≙ EndToEndTest.java:162 map-only scenario
- lifecycle hooks    ≙ shard_life_cycle begin/end_shard contract
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from appengine_mapreduce_spark.core.job import (
    DataFrameInput,
    MapReduceJob,
    MapReduceSpecification,
    MapSpecification,
)
from appengine_mapreduce_spark.core.worker import Mapper, Reducer
from appengine_mapreduce_spark.sinks.inmemory import InMemoryOutput
from tests.conftest import SF_SMOKE


class WordCountMapper(Mapper):
    def __init__(self):
        self.shards_begun = 0

    def begin_shard(self, ctx):
        ctx.increment("shards-begun", 1)

    def end_shard(self, ctx):
        ctx.increment("shards-ended", 1)

    def __call__(self, ctx, row):
        ctx.increment("docs-seen", 1)
        for w in row.text.split():
            if w:
                yield (w, 1)


class SumReducer(Reducer):
    def __call__(self, ctx, key, values):
        yield (key, sum(values))


def sum_combiner(ctx, key, values):
    yield sum(values)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")


@pytest.fixture(scope="module")
def expected_counts(docs):
    counts: Counter = Counter()
    for r in docs.collect():
        counts.update(w for w in r.text.split() if w)
    return dict(counts)


def _wc_spec(docs, combiner=None) -> MapReduceSpecification:
    return (
        MapReduceSpecification.builder()
        .set_job_name("wordcount")
        .set_input(DataFrameInput(docs))
        .set_mapper(WordCountMapper())
        .set_map_output_schema("word string, n bigint")
        .set_combiner(combiner)
        .set_reducer(SumReducer())
        .set_output_schema("word string, n bigint")
        .set_output(InMemoryOutput())
        .build()
    )


def test_mapreduce_wordcount_end_to_end(spark, docs, expected_counts):
    result = MapReduceJob.run(spark, _wc_spec(docs))
    got = dict(result.output)
    assert got == expected_counts


def test_combiner_equivalence(spark, docs, expected_counts):
    """Same output with and without the combiner (combiner_test.py parity)."""
    with_comb = MapReduceJob.run(spark, _wc_spec(docs, combiner=sum_combiner))
    assert dict(with_comb.output) == expected_counts


def test_counters(spark, docs):
    n_docs = docs.count()
    result = MapReduceJob.run(spark, _wc_spec(docs))
    assert result.counters["docs-seen"] == n_docs
    assert result.counters["mapper-calls"] == n_docs
    # one begin/end pair per shard (partition), equal counts
    assert result.counters["shards-begun"] == result.counters["shards-ended"] > 0
    assert result.counters["reducer-calls"] == len(
        {w for r in docs.collect() for w in r.text.split() if w}
    )


def test_map_only_job(spark, docs):
    class ProjectMapper(Mapper):
        def __call__(self, ctx, row):
            if row.doc_id % 2 == 0:
                yield (row.doc_id, len(row.text))

    spec = MapSpecification(
        job_name="map-only",
        input=DataFrameInput(docs),
        mapper=ProjectMapper(),
        output_schema="doc_id bigint, n_chars bigint",
        output=InMemoryOutput(),
    )
    result = MapReduceJob.run_map(spark, spec)
    expected = {
        (r.doc_id, len(r.text)) for r in docs.collect() if r.doc_id % 2 == 0
    }
    assert set(result.output) == expected


def test_job_chaining(spark, docs, expected_counts):
    """Chained MR (≙ ChainedMapReduceJob.java): stage 2 consumes stage 1's
    output DataFrame — top word by count."""
    stage1 = MapReduceJob.run(spark, _wc_spec(docs))

    class TagMapper(Mapper):
        def __call__(self, ctx, row):
            yield ("all", f"{row.word}:{row.n}")

    class MaxReducer(Reducer):
        def __call__(self, ctx, key, values):
            best = max(values, key=lambda s: (int(s.rsplit(":", 1)[1]), s))
            yield (best.rsplit(":", 1)[0], int(best.rsplit(":", 1)[1]))

    spec2 = (
        MapReduceSpecification.builder()
        .set_job_name("top-word")
        .set_input(DataFrameInput(stage1.output_df))
        .set_mapper(TagMapper())
        .set_map_output_schema("key string, value string")
        .set_reducer(MaxReducer())
        .set_output_schema("word string, n bigint")
        .set_output(InMemoryOutput())
        .build()
    )
    result = MapReduceJob.run(spark, spec2)
    [(word, n)] = result.output
    best_n = max(expected_counts.values())
    assert n == best_n
    assert expected_counts[word] == best_n


def test_multi_column_values(spark, docs):
    """Reducer receives namedtuples when the map output has >1 value col."""

    class EmitMapper(Mapper):
        def __call__(self, ctx, row):
            yield (row.doc_id % 7, row.doc_id, len(row.text))

    class StatsReducer(Reducer):
        def __call__(self, ctx, key, values):
            vals = list(values)
            yield (key, len(vals), sum(v.n_chars for v in vals))

    spec = (
        MapReduceSpecification.builder()
        .set_job_name("multi-col")
        .set_input(DataFrameInput(docs))
        .set_mapper(EmitMapper())
        .set_map_output_schema("bucket bigint, doc_id bigint, n_chars bigint")
        .set_reducer(StatsReducer())
        .set_output_schema("bucket bigint, n bigint, total_chars bigint")
        .set_output(InMemoryOutput())
        .build()
    )
    result = MapReduceJob.run(spark, spec)
    rows = docs.collect()
    for bucket, n, total in result.output:
        mine = [r for r in rows if r.doc_id % 7 == bucket]
        assert n == len(mine)
        assert total == sum(len(r.text) for r in mine)


def test_observe_counters(spark, docs):
    """Spark-native observed metrics — the zero-overhead counter path
    (≙ counters without touching Python per row)."""
    from appengine_mapreduce_spark.core.counters import observe_counters

    df, obs = observe_counters(
        docs,
        "scan",
        rows=F.count(F.lit(1)),
        total_chars=F.sum(F.length("text")),
    )
    df.collect()
    got = obs.get
    expected_rows = docs.count()
    expected_chars = docs.agg(F.sum(F.length("text"))).first()[0]
    assert got["rows"] == expected_rows
    assert got["total_chars"] == expected_chars


def test_combiner_requires_two_column_schema(spark, docs):
    """A combiner with a >2-column map output must fail loudly, not drop
    value columns silently."""
    spec = (
        MapReduceSpecification.builder()
        .set_job_name("bad-combiner")
        .set_input(DataFrameInput(docs))
        .set_mapper(WordCountMapper())
        .set_map_output_schema("word string, n bigint, extra bigint")
        .set_combiner(sum_combiner)
        .set_reducer(SumReducer())
        .set_output_schema("word string, n bigint")
        .set_output(InMemoryOutput())
        .build()
    )
    with pytest.raises(ValueError, match="2-column"):
        MapReduceJob.run(spark, spec)
