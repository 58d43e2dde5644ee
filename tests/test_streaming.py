"""Structured Streaming tests: drive each streaming job to completion with
file sources + memory sinks (processAllAvailable), then compare against the
batch twin computed on the same data."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from appengine_mapreduce_spark.plans.tables import load
from appengine_mapreduce_spark.streaming.jobs import (
    hourly_event_counts,
    session_counts,
    streaming_wordcount,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stream"))
    load(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(d)
    return d


def _run_stream(df, name: str):
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_hourly_event_counts_matches_batch(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    # generous watermark: finite replay in complete mode drops nothing
    agg = hourly_event_counts(stream, watermark="100 days")
    _run_stream(agg, "hourly_stream")
    got = {
        (r.hour, r.event_type): (r.n, round(r.total_value, 2))
        for r in spark.sql("SELECT * FROM hourly_stream").collect()
    }

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    expected = {
        (r.hour, r.event_type): (r.n, round(r.total_value, 2)) for r in batch.collect()
    }
    assert got == expected


def test_streaming_wordcount_matches_batch(spark, tmp_path):
    docs = load(spark, SF_SMOKE, "documents").select("text")
    d = str(tmp_path / "docs_stream")
    docs.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(docs.schema).parquet(d)
    _run_stream(streaming_wordcount(stream), "wc_stream")
    got = {
        (r.word, r.n) for r in spark.sql("SELECT * FROM wc_stream").collect()
    }
    expected = {
        (r.word, r.n)
        for r in docs.select(
            F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


def test_session_counts_stateful(spark, tmp_path):
    """Two bursts per user separated by >30 min: the first session closes
    when the second burst arrives (state transition), the second stays open."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for uid in (1, 2):
        for i in range(3):  # burst 1: 3 events 1 min apart
            rows.append((uid, base + dt.timedelta(minutes=i)))
        for i in range(2):  # burst 2: 45 min later
            rows.append((uid, base + dt.timedelta(minutes=45 + i)))
    pdf_dir = str(tmp_path / "sessions_stream")
    spark.createDataFrame(rows, "user_id bigint, ts timestamp").write.parquet(pdf_dir)

    stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(pdf_dir)
    out = session_counts(stream, use_timeout=False)
    q = out.writeStream.outputMode("append").format("memory").queryName("sessions").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    closed = spark.sql("SELECT * FROM sessions").collect()
    assert len(closed) == 2  # one closed session per user
    for r in closed:
        assert r.n_events == 3
        assert r.session_start == base
        assert r.session_end == base + dt.timedelta(minutes=2)


def test_idempotent_foreachbatch_sink(spark, tmp_path):
    """Exactly-once foreachBatch sink: replaying the same batch_id must not
    duplicate rows."""
    from appengine_mapreduce_spark.streaming.sinks import idempotent_parquet_sink

    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    spark.range(0, 100).write.parquet(src_dir)

    sink = idempotent_parquet_sink(out_dir)
    stream = spark.readStream.schema("id bigint").parquet(src_dir)
    q = stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    first = spark.read.parquet(f"{out_dir}/batch_id=*").count()
    assert first == 100

    # simulate a replay of batch 0: the marker must suppress the rewrite
    import pyspark.sql.functions as F

    replay_df = spark.range(0, 100).select((F.col("id") + 1000).alias("id"))
    sink(replay_df, 0)
    after = spark.read.parquet(f"{out_dir}/batch_id=*")
    assert after.count() == 100
    assert after.filter(F.col("id") >= 1000).count() == 0  # replay ignored


def test_stream_static_join(spark, tmp_path):
    """Stream-static join: enrich a stream with a static dimension —
    no state, the static side re-reads per micro-batch."""
    src = str(tmp_path / "ss_src")
    spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 2.5), (1, 1.0)], "uid bigint, amount double"
    ).write.parquet(src)
    static_dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "uid bigint, tier string"
    )
    stream = spark.readStream.schema("uid bigint, amount double").parquet(src)
    enriched = stream.join(static_dim, "uid", "left_outer")
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(r.uid, r.amount, r.tier) for r in spark.sql("SELECT * FROM ss_join").collect()}
    assert rows == {(1, 10.0, "gold"), (2, 5.0, "silver"), (3, 2.5, None), (1, 1.0, "gold")}


def test_stream_stream_conversion_join(spark, tmp_path):
    """Stream-stream event-time join (clicks→purchases within 1h) must match
    the identical join computed in batch over the same data."""
    from appengine_mapreduce_spark.streaming.jobs import conversion_join

    events = load(spark, SF_SMOKE, "events")
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    events.filter(F.col("event_type") == "click").write.parquet(clicks_dir)
    events.filter(F.col("event_type") == "purchase").write.parquet(buys_dir)

    schema = events.schema
    s_clicks = spark.readStream.schema(schema).parquet(clicks_dir)
    s_buys = spark.readStream.schema(schema).parquet(buys_dir)
    joined = conversion_join(s_clicks, s_buys, within="1 hour", watermark="100 days")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("conv_join")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.lead_ts, r.conv_ts, r.delay_s, r.conv_value)
        for r in spark.sql("SELECT * FROM conv_join").collect()
    }

    b_clicks = events.filter(F.col("event_type") == "click")
    b_buys = events.filter(F.col("event_type") == "purchase")
    batch = conversion_join(
        b_clicks, b_buys, within="1 hour", watermark="100 days"
    )  # watermark is a no-op on batch DataFrames
    want = {
        (r.user_id, r.lead_ts, r.conv_ts, r.delay_s, r.conv_value)
        for r in batch.collect()
    }
    assert got == want
    assert len(got) > 0  # the join actually fired


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg with a 10-minute watermark: an event
    arriving after its window closed must be dropped, and on-time counts
    must be unaffected."""
    import pandas as pd

    src = str(tmp_path / "late_src")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def write_batch(rows, name):
        pdf = pd.DataFrame(rows, columns=["ts", "k"])
        spark.createDataFrame(pdf).write.mode("append").parquet(src)

    # batch 1: three events 10:00-10:04, plus one at 12:00 to advance the
    # watermark far past the 10:00 window
    write_batch(
        [(base, "a"), (base + dt.timedelta(minutes=2), "a"),
         (base + dt.timedelta(minutes=4), "a"),
         (base + dt.timedelta(hours=2), "a")],
        "b1",
    )

    stream = spark.readStream.schema("ts timestamp, k string").parquet(
        src
    ).withWatermark("ts", "10 minutes")
    agg = stream.groupBy(F.window("ts", "10 minutes").alias("win"), "k").agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.col("win.start").alias("start"), "k", "n")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_agg")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE event inside the long-closed 10:00 window, and an
        # on-time one at 12:05
        write_batch(
            [(base + dt.timedelta(minutes=1), "a"),
             (base + dt.timedelta(hours=2, minutes=5), "a")],
            "b2",
        )
        q.processAllAvailable()
        # empty batch to let the final watermark close remaining windows
        write_batch([(base + dt.timedelta(hours=3), "a")], "b3")
        q.processAllAvailable()
    finally:
        q.stop()

    counts = {
        (r.start, r.k): r.n for r in spark.sql("SELECT * FROM late_agg").collect()
    }
    # the 10:00 window emitted exactly the 3 on-time events; the late row
    # (10:01, arriving in batch 2) was dropped, not added
    assert counts[(base, "a")] == 3, counts


def test_streaming_dedup_drops_replayed_keys(spark, tmp_path):
    """At-least-once delivery (duplicate event_ids across micro-batches)
    becomes effectively-once: dropDuplicatesWithinWatermark keeps one row
    per key within the watermark horizon."""
    import datetime as dt

    from appengine_mapreduce_spark.streaming.jobs import streaming_dedup

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    d = str(tmp_path / "dedup_stream")
    # two files = two micro-batches; event 2 is replayed in both, event 1
    # duplicated within one batch
    spark.createDataFrame(
        [(1, base, "a"), (1, base, "a"), (2, base + dt.timedelta(minutes=1), "b")],
        "event_id bigint, ts timestamp, payload string",
    ).coalesce(1).write.parquet(d)
    spark.createDataFrame(
        [(2, base + dt.timedelta(minutes=1), "b"),
         (3, base + dt.timedelta(minutes=2), "c")],
        "event_id bigint, ts timestamp, payload string",
    ).coalesce(1).write.mode("append").parquet(d)

    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, payload string"
    ).option("maxFilesPerTrigger", 1).parquet(d)
    out = streaming_dedup(stream, key_cols=("event_id",), watermark="1 hour")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("dedup_stream").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r.event_id, r.payload)
        for r in spark.sql("SELECT * FROM dedup_stream").collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_stream_stream_left_outer_join_null_on_expiry(spark, tmp_path):
    """Streaming LEFT OUTER join: an unconverted lead must emit with NULL
    conversion columns — but only after the watermark passes the point
    where a match could still arrive. Two micro-batches: the second's
    timestamps push the watermark far past batch one's join window,
    forcing the NULL row out."""
    import datetime as dt

    from appengine_mapreduce_spark.streaming.jobs import conversion_join

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    leads_dir = str(tmp_path / "leads")
    conv_dir = str(tmp_path / "convs")
    # batch 1: user 1 converts, user 2 never does
    spark.createDataFrame(
        [(1, base), (2, base)], "user_id bigint, ts timestamp"
    ).coalesce(1).write.parquet(leads_dir)
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=10), 9.5)],
        "user_id bigint, ts timestamp, value double",
    ).coalesce(1).write.parquet(conv_dir)
    # batch 2: far-future rows on BOTH sides advance the watermark
    far = base + dt.timedelta(days=2)
    spark.createDataFrame(
        [(99, far)], "user_id bigint, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(leads_dir)
    spark.createDataFrame(
        [(99, far, 1.0)], "user_id bigint, ts timestamp, value double"
    ).coalesce(1).write.mode("append").parquet(conv_dir)

    leads = spark.readStream.schema("user_id bigint, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(leads_dir)
    convs = spark.readStream.schema(
        "user_id bigint, ts timestamp, value double"
    ).option("maxFilesPerTrigger", 1).parquet(conv_dir)

    out = conversion_join(
        leads, convs, within="1 hour", watermark="1 hour", how="left_outer"
    )
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("outer_join_stream").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM outer_join_stream").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user[1][0].conv_value == 9.5        # matched within window
    assert by_user[2][0].conv_ts is None          # expired → NULL emission
    assert by_user[2][0].conv_value is None


def test_streaming_corpus_scrub_matches_batch(spark, tmp_path):
    """The streaming scrub must keep exactly the documents the same
    stateless rules keep in batch (scrub_signals is one shared
    projection, so this is an identity check on the streaming plumbing)."""
    from pyspark.sql import functions as F

    from appengine_mapreduce_spark.operators.text_analysis import scrub_signals
    from appengine_mapreduce_spark.streaming.jobs import streaming_corpus_scrub
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    d = str(tmp_path / "docs_scrub_stream")
    docs.write.mode("overwrite").parquet(d)

    stream = spark.readStream.schema(docs.schema).parquet(d)
    out = streaming_corpus_scrub(stream, min_quality=0.35)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("scrub_stream").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM scrub_stream").collect()}
    expected = {
        r.doc_id
        for r in scrub_signals(docs)
        .filter((F.col("pred_lang") != "und") & (F.col("quality") >= 0.35))
        .collect()
    }
    assert got == expected and len(expected) > 0


def test_streaming_materialized_aggregate_matches_full_recompute(
    spark, tmp_path
):
    """Stream two CDC delta files through materialized_aggregate_sink; the
    stored view must equal a direct aggregation of the final snapshot, and
    a replayed batch must be a no-op (exactly-once)."""
    from appengine_mapreduce_spark.operators.cdc import snapshot_diff
    from appengine_mapreduce_spark.streaming.sinks import (
        materialized_aggregate_sink,
    )

    def snap(rows):
        return spark.createDataFrame(
            rows, "k int, g string, v int"
        ).withColumn("v", F.col("v").cast("decimal(18,2)"))

    s0 = snap([])
    s1 = snap([(1, "g1", 10), (2, "g1", 20), (3, "g2", 30)])
    s2 = snap([(1, "g1", 11), (3, "g2", 30), (4, "g3", 40)])

    deltas_dir = tmp_path / "deltas"
    d01 = snapshot_diff(s0, s1, key_cols=["k"], include_old=True)
    d12 = snapshot_diff(s1, s2, key_cols=["k"], include_old=True)
    d01.coalesce(1).write.parquet(str(deltas_dir / "b0"))
    d12.coalesce(1).write.parquet(str(deltas_dir / "b1"))

    agg_path = str(tmp_path / "matview")
    sink = materialized_aggregate_sink(agg_path, "g", "v")

    schema = d01.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(deltas_dir / "b*"))
    )
    q = stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    import os

    view = (
        spark.read.parquet(os.path.join(agg_path, "data"))
        .filter(F.col("n") > 0)
    )
    got = {r.g: (float(r.total), r.n) for r in view.collect()}
    direct = {
        r.g: (float(r.total), r.n)
        for r in s2.groupBy("g")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == direct, (got, direct)

    # exactly-once: re-applying an already-committed batch changes nothing
    sink(spark.read.parquet(str(deltas_dir / "b1")), 1)
    again = {
        r.g: (float(r.total), r.n)
        for r in spark.read.parquet(os.path.join(agg_path, "data"))
        .filter(F.col("n") > 0)
        .collect()
    }
    assert again == direct, again


def test_substring_scrub_sink_accumulates_and_replays_exactly_once(
    spark, tmp_path
):
    """The continuous ingest scrub (streaming/sinks.substring_scrub_sink),
    driven batch-by-batch: batch 0 bootstraps an empty store (nothing
    stripped, digests learned), batch 1 loses exactly the spans repeating
    batch 0's boilerplate, batch-internal repeats pass through, and
    re-applying a batch with the same id is a no-op for BOTH the cleaned
    output and the store (crash-replay exactly-once)."""
    import os

    from appengine_mapreduce_spark.streaming.sinks import substring_scrub_sink

    boiler = " ".join(f"lic{i}" for i in range(10))  # 10-token boilerplate

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    day0 = docs([
        (0, f"alpha beta {boiler} gamma delta"),
        (1, f"{boiler} epsilon zeta eta theta iota kappa"),
    ])
    # doc 10 repeats day-0 boilerplate (must be stripped); doc 11 repeats
    # doc 10's fresh phrase (batch-internal — must NOT be stripped)
    fresh = " ".join(f"new{i}" for i in range(10))
    day1 = docs([
        (10, f"one two {boiler} three four {fresh}"),
        (11, f"five six {fresh} seven eight nine ten eleven"),
    ])

    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    sink = substring_scrub_sink(store, out, k=8)

    sink(day0, 0)
    b0 = {
        r.doc_id: r
        for r in spark.read.parquet(os.path.join(out, "batch_id=0")).collect()
    }
    assert b0[0].n_tokens_after == b0[0].n_tokens_before == 14
    assert "lic0" in b0[0].cleaned_text  # bootstrap: nothing stripped

    sink(day1, 1)
    b1 = {
        r.doc_id: r
        for r in spark.read.parquet(os.path.join(out, "batch_id=1")).collect()
    }
    # doc 10: the boilerplate (and nothing else) goes; k=8 windows can
    # extend a strip ≤ k-1 tokens into coincidentally-matching neighbors,
    # but here neighbors are unique so exactly the 10 boilerplate tokens go
    assert b1[10].n_tokens_before == 24
    assert "lic0" not in b1[10].cleaned_text
    assert "new0" in b1[10].cleaned_text  # batch-internal repeat kept
    assert b1[10].n_tokens_after == 14
    assert b1[11].n_tokens_after == b1[11].n_tokens_before  # untouched

    n_store = spark.read.parquet(os.path.join(store, "data")).count()

    # replay batch 1 (same id): output and store byte-stable
    sink(day1, 1)
    again = {
        r.doc_id: r
        for r in spark.read.parquet(os.path.join(out, "batch_id=1")).collect()
    }
    assert {d: r.cleaned_text for d, r in again.items()} == {
        d: r.cleaned_text for d, r in b1.items()
    }
    assert spark.read.parquet(os.path.join(store, "data")).count() == n_store

    # a LATER batch is stripped of batch 1's fresh phrase too — the store
    # accumulated across batches
    day2 = docs([(20, f"x y {fresh} z w v u t s r")])
    sink(day2, 2)
    b2 = spark.read.parquet(os.path.join(out, "batch_id=2")).collect()[0]
    assert "new0" not in b2.cleaned_text and b2.n_tokens_after == 9


def test_substring_scrub_sink_equals_batch_composition_randomized(
    spark, tmp_path
):
    """Equivalence property (seeded): driving N random micro-batches
    through substring_scrub_sink must produce, for EVERY batch, exactly
    the batch operator's output against the union-of-prior-batches
    digest store — and the final store must equal the digest store of
    the whole corpus. The streaming pipeline is the batch pipeline
    folded over batches; this pins that identity on random data."""
    import os
    import random

    from appengine_mapreduce_spark.operators.dedup import (
        strip_repeated_substrings_incremental,
        substring_digest_store,
    )
    from appengine_mapreduce_spark.streaming.sinks import substring_scrub_sink

    rnd = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    phrases = [
        " ".join(rnd.choice(vocab) for _ in range(rnd.randint(8, 12)))
        for _ in range(4)
    ]

    def make_doc(i):
        parts = [rnd.choice(vocab) for _ in range(rnd.randint(0, 6))]
        if rnd.random() < 0.7:
            parts.append(rnd.choice(phrases))
        parts.extend(rnd.choice(vocab) for _ in range(rnd.randint(0, 6)))
        return (i, " ".join(parts))

    all_rows = [make_doc(i) for i in range(30)]
    cuts = sorted(rnd.sample(range(1, 30), 2))
    batches = [
        all_rows[: cuts[0]], all_rows[cuts[0]:cuts[1]], all_rows[cuts[1]:]
    ]

    store_path = str(tmp_path / "store")
    out = str(tmp_path / "out")
    sink = substring_scrub_sink(store_path, out, k=8)

    def df_of(rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    prior: list[tuple] = []
    for bid, rows in enumerate(batches):
        sink(df_of(rows), bid)
        expected_store = (
            substring_digest_store(df_of(prior), k=8)
            if prior
            else spark.createDataFrame([], "dig bigint")
        )
        expected = {
            r.doc_id: (r.cleaned_text, r.n_tokens_before, r.n_tokens_after)
            for r in strip_repeated_substrings_incremental(
                df_of(rows), expected_store, k=8
            ).collect()
        }
        got = {
            r.doc_id: (r.cleaned_text, r.n_tokens_before, r.n_tokens_after)
            for r in spark.read.parquet(
                os.path.join(out, f"batch_id={bid}")
            ).collect()
        }
        assert got == expected, f"batch {bid} diverged from batch operator"
        prior.extend(rows)

    final_store = {
        r.dig
        for r in spark.read.parquet(os.path.join(store_path, "data")).collect()
    }
    full = {
        r.dig for r in substring_digest_store(df_of(all_rows), k=8).collect()
    }
    assert final_store == full
