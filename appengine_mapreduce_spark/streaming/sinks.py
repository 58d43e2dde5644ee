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

from pyspark.sql import DataFrame


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
