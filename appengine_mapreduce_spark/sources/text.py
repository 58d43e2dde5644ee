"""Newline-delimited text sources.

Reference: ``BlobstoreLineInputReader`` (input_readers.py:1286-1437) yields
``(byte_offset, line)`` per record, byte-range sharded with the
skip-first-partial-line rule (:1306-1344). Java
``GoogleCloudStorageLineInput.java:21`` + ``LineInputStream.java:35`` do
the same with a configurable separator.

Spark: Hadoop's ``TextInputFormat`` *is* that exact protocol (byte-range
splits, first-partial-line skip), and its record key is the byte offset —
so ``line_input(with_offsets=True)`` is bit-parity with the reference's
``(offset, line)`` stream. ``spark.read.text`` is the fast DataFrame path
when offsets aren't needed (it prunes/pushes down; the Hadoop-RDD path
cannot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def line_input(
    spark: SparkSession,
    path: str,
    with_offsets: bool = False,
    min_partitions: int | None = None,
    line_sep: str | None = None,
) -> DataFrame:
    """Read text file(s) (glob ok) as lines.

    with_offsets=False → DataFrame[line: string]        (fast path)
    with_offsets=True  → DataFrame[offset: bigint, line: string]
                         (reference parity: input_readers.py:1327-1344)
    line_sep           → custom record separator (≙ Java
                         GoogleCloudStorageLineInput's configurable
                         separator, GoogleCloudStorageLineInput.java:21);
                         fast path only — Hadoop TextInputFormat's offset
                         protocol is newline-defined.
    """
    if line_sep is not None and with_offsets:
        raise ValueError("line_sep is supported on the fast path only")
    if not with_offsets:
        reader = spark.read
        if line_sep is not None:
            reader = reader.option("lineSep", line_sep)
        return reader.text(path).withColumnRenamed("value", "line")
    conf = {}
    if min_partitions:
        # hint Hadoop toward that many byte-range splits
        import os

        total = sum(
            os.path.getsize(p) for p in __import__("glob").glob(path) if os.path.isfile(p)
        ) or 1
        conf["mapreduce.input.fileinputformat.split.maxsize"] = str(
            max(1, total // min_partitions)
        )
    rdd = spark.sparkContext.hadoopFile(
        path,
        "org.apache.hadoop.mapred.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf or None,
    )
    return rdd.toDF(["offset", "line"])


def multi_file_line_input(
    spark: SparkSession, paths: list[str], fail_on_missing: bool = True
) -> DataFrame:
    """Multi-file scan with filename column — ≙
    _GoogleCloudStorageInputReader's file list + round-robin shard packing
    (input_readers.py:2247-2541); Spark's FilePartition packing replaces
    the round-robin. ``input_file_name()`` exposes provenance like the
    reference's per-file readers."""
    from pyspark.sql import functions as F

    reader = spark.read
    if not fail_on_missing:
        reader = reader.option("ignoreMissingFiles", "true")
    df = reader.text(list(paths))
    return df.select(
        F.input_file_name().alias("file_name"),
        F.col("value").alias("line"),
    )
