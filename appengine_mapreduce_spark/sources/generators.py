"""Synthetic generator sources.

Parity targets:
- consecutive_longs ≙ java inputs/ConsecutiveLongInput.java:19
- random_longs      ≙ java inputs/RandomLongInput.java:19 (seedable)
- random_strings    ≙ python input_readers.py:1834-1926
                      (RandomStringInputReader) and
                      api/map_job/sample_input_reader.py:34-101

All are built on ``spark.range`` so generation is distributed — no
driver-side materialization at any count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def consecutive_longs(
    spark: SparkSession, start: int, limit: int, num_partitions: int | None = None
) -> DataFrame:
    """All longs in [start, limit), split evenly across partitions."""
    rng = spark.range(start, limit, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return rng.select(F.col("id").alias("value"))


def random_longs(
    spark: SparkSession,
    count: int,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """``count`` seeded pseudo-random longs — same seed ⇒ same dataset,
    independent of partitioning (rand is seeded per-partition offset)."""
    rng = spark.range(0, count, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return rng.select(
        F.col("id").alias("seed"),
        (F.rand(seed) * F.lit(2**62)).cast("bigint").alias("value"),
    )


def random_strings(
    spark: SparkSession,
    count: int,
    length: int = 10,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """``count`` fixed-length lowercase strings from a seeded RNG.

    Characters derive from md5 of (seed, id) — deterministic and
    distribution-uniform, generated fully JVM-side.
    """
    rng = spark.range(0, count, 1, num_partitions or spark.sparkContext.defaultParallelism)
    # md5 hex → letters: map each of `length` hex pairs to 'a'..'z'
    hexes = F.md5(F.concat(F.lit(f"{seed}:"), F.col("id").cast("string")))
    chars = F.transform(
        F.sequence(F.lit(0), F.lit(length - 1)),
        lambda i: F.chr(
            F.lit(97)
            + F.conv(F.substring(hexes, i * 2 + 1, 2), 16, 10).cast("int") % 26
        ),
    )
    return rng.select(
        F.col("id").alias("seed"), F.array_join(chars, "").alias("value")
    )
