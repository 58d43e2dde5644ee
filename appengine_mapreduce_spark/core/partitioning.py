"""Partitioning utilities.

The reference hand-tunes shard counts (8 default / 256 max, oversplit for
skew — parameters.py:216, input_readers.py:724-733). Spark owns partition
planning, but two gaps need explicit handling:

1. Sources that deliver fewer splits than cores (one parquet row group, a
   gzip file) serialize all downstream narrow compute. ``ensure_parallelism``
   repartitions ONLY in that case — on a 100 TB input with thousands of
   splits it is a no-op and never shuffles.
2. CPU-heavy projections (hashing every shingle of every document) should
   run after that widening, not before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the plan has fewer partitions than the cluster has
    cores. Reading partition count plans the scan but runs no job."""
    if df.isStreaming:
        # micro-batch partitioning is the source's/trigger's concern;
        # df.rdd is undefined on a streaming plan
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
