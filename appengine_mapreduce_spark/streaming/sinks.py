"""Streaming sinks.

``idempotent_parquet_sink`` is the exactly-once pattern for arbitrary
targets: Structured Streaming replays a failed micro-batch with the SAME
batch_id, so a writer that (1) skips already-committed ids and (2) writes
each batch to a batch-id-scoped location commits each batch exactly once.
This is the streaming analog of the reference's
GoogleCloudStorageConsistentOutputWriter (output_writers.py:863-1054 —
tmp-file rewrite + GC), with the checkpoint's batch id replacing the
slice-retry bookkeeping.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def idempotent_parquet_sink(base_path: str):
    """Return a ``foreachBatch`` function writing each micro-batch to
    ``base_path/batch_id=N`` with a commit marker; replayed batch ids are
    skipped. Read the result with
    ``spark.read.parquet(f"{base_path}/batch_id=*")``."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        target = os.path.join(base_path, f"batch_id={batch_id}")
        marker = os.path.join(target, "_COMMITTED")
        if os.path.exists(marker):
            return  # replay of an already-committed batch
        df.write.mode("overwrite").parquet(target)
        with open(marker, "w") as fh:
            fh.write("ok")

    return write_batch


def materialized_aggregate_sink(
    agg_path: str,
    group_col: str,
    value_col: str,
    sum_col: str = "total",
    count_col: str = "n",
):
    """``foreachBatch`` function maintaining a materialized (group → sum,
    count) aggregate from a STREAM of CDC delta rows
    (operators/cdc.snapshot_diff shape, include_old=True) — a streaming
    materialized view.

    Each micro-batch applies its signed contributions via
    ``incremental_sum_refresh`` against the stored aggregate, then swaps
    the new aggregate in atomically (tmp + rename, the compaction commit
    pattern). Exactly-once: replayed batch ids are skipped via committed
    markers, exactly like :func:`idempotent_parquet_sink`. Zero-count
    groups are KEPT in the stored table (deltas are additive and
    order-free; dropping a transiently-zero group would lose
    retractions) — read the view with ``n > 0``.

    At 100 TB the per-batch cost is delta-sized + aggregate-sized, never
    source-table-sized: this is the streaming twin of the batch
    ``incremental_agg_refresh`` gate query.
    """
    import shutil

    from appengine_mapreduce_spark.operators.cdc import incremental_sum_refresh

    os.makedirs(agg_path, exist_ok=True)
    data_dir = os.path.join(agg_path, "data")
    last_file = "_LAST_APPLIED"  # rides INSIDE the data dir, so the
    # applied-batch watermark swaps in atomically WITH the state it
    # describes — a marker written after the swap would leave a crash
    # window where the swap landed but the marker did not, and the
    # replayed batch would double-apply (read-modify-write is not
    # replay-idempotent the way a pure overwrite sink is).

    def _last_applied() -> int:
        try:
            with open(os.path.join(data_dir, last_file)) as fh:
                return int(fh.read().strip())
        except (OSError, ValueError):
            return -1

    def _recover() -> None:
        # a crash between the two renames leaves data absent and .old
        # present: restore the previous state (whose watermark correctly
        # predates the interrupted batch, so it will re-apply)
        old = data_dir + ".old"
        if not os.path.exists(data_dir) and os.path.exists(old):
            os.replace(old, data_dir)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(data_dir + ".next", ignore_errors=True)

    def apply_batch(delta: DataFrame, batch_id: int) -> None:
        _recover()
        if _last_applied() >= batch_id:
            return  # replay of an already-applied batch
        spark = delta.sparkSession
        if os.path.exists(data_dir):
            old_agg = spark.read.parquet(data_dir)
        else:
            # typed empty aggregate derived from the delta itself
            old_agg = (
                delta.limit(0)
                .groupBy(group_col)
                .agg(
                    F.sum(value_col).alias(sum_col),
                    F.count(F.lit(1)).alias(count_col),
                )
            )
        refreshed = incremental_sum_refresh(
            old_agg, delta, group_col, value_col, sum_col, count_col,
            drop_empty=False,
        )
        tmp = data_dir + ".next"
        shutil.rmtree(tmp, ignore_errors=True)
        refreshed.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, last_file), "w") as fh:
            fh.write(str(batch_id))
        old = data_dir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(data_dir):
            os.replace(data_dir, old)
        os.replace(tmp, data_dir)
        shutil.rmtree(old, ignore_errors=True)

    return apply_batch


def substring_scrub_sink(
    store_path: str,
    out_path: str,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_spans: bool = True,
):
    """``foreachBatch`` function running the CONTINUOUS ingest scrub —
    the streaming twin of the batch
    ``strip_repeated_substrings_incremental`` gate queries: each
    micro-batch of documents is stripped of every token span that
    repeats the accumulated HISTORY k-gram digest store, the cleaned
    batch lands in ``out_path/batch_id=N`` (committed-marker
    idempotent, like :func:`idempotent_parquet_sink`), and the batch's
    own digests are then merged into the store — so every batch dedups
    against EVERYTHING ingested before it, and the store bootstraps
    from empty on the first batch (nothing stripped, all digests
    learned).

    Semantics match the batch operator exactly: only history overlap is
    stripped — a batch's internal repeats pass through (they become
    strippable for LATER batches once their digests land in the store).

    Crash/replay safety: the cleaned write commits first (pure
    overwrite + marker, replay-skippable); the store update is
    read-modify-write, so it swaps in atomically WITH a
    ``_LAST_APPLIED`` watermark exactly like
    :func:`materialized_aggregate_sink` — a replayed batch re-scrubs
    against the same pre-batch store (its cleaned output is skipped by
    the marker) and skips the store merge.

    At 100 TB: per-batch cost is batch-sized plus store-DIGEST-sized (8
    bytes per distinct history k-gram — history documents are never
    re-read, the whole point of the digest store). The demo store swap
    rewrites the digest table per batch; a production store is a
    bucketed-by-``dig`` table appended with batch-id-scoped files,
    which also makes the probe's history side exchange-free
    (tests/test_plan_quality.py's bucketed-store witness)."""
    import shutil

    from appengine_mapreduce_spark.operators.dedup import (
        strip_repeated_substrings_incremental,
        substring_digest_store,
    )

    os.makedirs(store_path, exist_ok=True)
    data_dir = os.path.join(store_path, "data")
    last_file = "_LAST_APPLIED"

    def _last_applied() -> int:
        try:
            with open(os.path.join(data_dir, last_file)) as fh:
                return int(fh.read().strip())
        except (OSError, ValueError):
            return -1

    def _recover() -> None:
        old = data_dir + ".old"
        if not os.path.exists(data_dir) and os.path.exists(old):
            os.replace(old, data_dir)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(data_dir + ".next", ignore_errors=True)

    def scrub_batch(batch: DataFrame, batch_id: int) -> None:
        _recover()
        spark = batch.sparkSession
        if os.path.exists(data_dir):
            store = spark.read.parquet(data_dir).select("dig")
        else:
            store = spark.createDataFrame([], "dig bigint")

        target = os.path.join(out_path, f"batch_id={batch_id}")
        marker = os.path.join(target, "_COMMITTED")
        if not os.path.exists(marker):
            cleaned = strip_repeated_substrings_incremental(
                batch, store, id_col=id_col, text_col=text_col, k=k,
                broadcast_spans=broadcast_spans,
            )
            cleaned.write.mode("overwrite").parquet(target)
            with open(marker, "w") as fh:
                fh.write("ok")

        if _last_applied() >= batch_id:
            return  # replayed batch: store already includes it
        merged = store.unionByName(
            substring_digest_store(batch, id_col=id_col, text_col=text_col, k=k)
        ).distinct()
        tmp = data_dir + ".next"
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, last_file), "w") as fh:
            fh.write(str(batch_id))
        old = data_dir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(data_dir):
            os.replace(data_dir, old)
        os.replace(tmp, data_dir)
        shutil.rmtree(old, ignore_errors=True)

    return scrub_batch
