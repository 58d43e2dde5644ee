"""Path-filtered multi-file input.

Reference: new-API ``GCSInputReader`` + ``PathFilter``
(lib/input_reader/_gcs.py:46-300) — the user supplies an ``accept(ctx,
path)`` callback consulted during file listing; plus ``*`` prefix
expansion (input_readers.py:2256-2264).

Spark-native: listing happens driver-side through the Hadoop FileSystem
(works for any supported scheme, not just local), the Python callback
filters the listing, and the surviving paths feed one ``spark.read`` —
so Catalyst still plans one scan over the final file set. For pure glob
patterns prefer the built-in ``pathGlobFilter`` option (JVM-side, no
driver listing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def list_files(spark: SparkSession, pattern: str) -> list[str]:
    """Glob-expand via the Hadoop FileSystem (scheme-agnostic)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = jpath.getFileSystem(conf)
    statuses = fs.globStatus(jpath)
    if statuses is None:
        return []
    return sorted(
        s.getPath().toString() for s in statuses if s.isFile()
    )


def filtered_file_input(
    spark: SparkSession,
    pattern: str,
    path_filter: Callable[[str], bool] | None = None,
    format: str = "text",
    fail_on_missing_input: bool = True,
    **options: str,
) -> DataFrame:
    """Read all files matching ``pattern`` accepted by ``path_filter``.

    ``fail_on_missing_input`` ≙ the reference's flag of the same name
    (input_readers.py:2288): raise when nothing matches vs return empty.
    """
    paths = list_files(spark, pattern)
    if path_filter is not None:
        paths = [p for p in paths if path_filter(p)]
    if not paths:
        if fail_on_missing_input:
            raise FileNotFoundError(
                f"no input files match {pattern!r} after path filter"
            )
        return spark.createDataFrame([], "value string")
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return getattr(reader.format(format), "load")(paths)
