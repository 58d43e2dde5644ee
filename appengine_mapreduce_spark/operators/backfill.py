"""Partition backfill orchestration.

A date-partitioned derived table (the partitioned layouts in
plans/queries_layout.py) is maintained by filling MISSING partitions only:
each partition directory is built independently (its own Spark write, its
own completion marker) so a backfill over a year of history re-computes
only the holes, retries are per-partition, and concurrent backfills of
different partitions never conflict. This is the batch-side sibling of the
streaming sinks' batch-id idempotence — the reference's closest machinery
is the per-shard retry loop (shard_life_cycle / slice retries), which
Spark replaces per task while this replaces it per PARTITION of the
output.

At 100 TB: the unit of recovery is one partition's data, not the table;
a failed day re-runs one day.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MARKER = "_BACKFILL_OK"


def missing_partitions(
    dest: str, partition_col: str, values: list[str]
) -> list[str]:
    """Partition values in ``values`` that have no committed directory."""
    return [
        v
        for v in values
        if not os.path.exists(
            os.path.join(dest, f"{partition_col}={v}", _MARKER)
        )
    ]


def backfill_partitions(
    spark: SparkSession,
    dest: str,
    partition_col: str,
    values: list[str],
    build_fn: Callable[[SparkSession, str], DataFrame],
) -> list[str]:
    """Build every missing partition of ``dest``; returns the values
    actually built. ``build_fn(spark, value)`` produces that partition's
    rows (WITHOUT the partition column — it's encoded in the path). The
    write is per-directory with a commit marker written last, so a
    partition is either absent or complete; the whole table reads back as
    one partitioned dataset via ``spark.read.parquet(dest)``.
    """
    built = []
    for v in missing_partitions(dest, partition_col, values):
        part_dir = os.path.join(dest, f"{partition_col}={v}")
        build_fn(spark, v).write.mode("overwrite").parquet(part_dir)
        with open(os.path.join(part_dir, _MARKER), "w") as fh:
            fh.write("ok")
        built.append(v)
    return built
