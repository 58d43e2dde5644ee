"""Zip-archive sources.

Reference: ``BlobstoreZipInputReader`` (input_readers.py:1440-1601) iterates
members of one zip by TOC index range; ``BlobstoreZipLineInputReader``
(:1604-1830) additionally splits members into lines keyed
``((file_index, offset), line)``.

Spark: ``binaryFile`` scans the archives (one partition per archive —
archives themselves are the natural split unit, matching the reference's
TOC-range sharding), and a ``mapInPandas`` stage opens each with the
stdlib ``zipfile``. Python is unavoidable here (no JVM zip source), but it
runs per archive member, not per record — the line split is vectorized.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from appengine_mapreduce_spark.core.pickling import register_self

register_self(__name__)


_MEMBER_SCHEMA = "zip_path string, member_index int, member_name string, content binary"
_LINE_SCHEMA = "zip_path string, member_index int, offset bigint, line string"


def zip_members(spark: SparkSession, path: str) -> DataFrame:
    """One row per archive member: (zip_path, member_index, member_name,
    content bytes), members ordered by TOC index (reference parity:
    input_readers.py:1497-1510 iterates zipfile.infolist order)."""
    bins = spark.read.format("binaryFile").load(path)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for idx, info in enumerate(zf.infolist()):
                        if info.is_dir():
                            continue
                        rows.append((p, idx, info.filename, zf.read(info)))
            yield pd.DataFrame(
                rows, columns=["zip_path", "member_index", "member_name", "content"]
            ) if rows else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in
                 ["zip_path", "member_index", "member_name", "content"]}
            )

    return bins.select("path", "content").mapInPandas(extract, schema=_MEMBER_SCHEMA)


def zip_member_lines(spark: SparkSession, path: str, encoding: str = "utf-8") -> DataFrame:
    """Per-member line records keyed (member_index, byte offset) —
    ≙ BlobstoreZipLineInputReader's ((file_num, offset), line)
    (input_readers.py:1604-1830)."""
    members = zip_members(spark, path)

    def split_lines(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for zp, idx, content in zip(
                pdf["zip_path"], pdf["member_index"], pdf["content"]
            ):
                offset = 0
                for raw in bytes(content).splitlines(keepends=True):
                    line = raw.rstrip(b"\r\n")
                    rows.append((zp, int(idx), offset, line.decode(encoding)))
                    offset += len(raw)
            yield pd.DataFrame(
                rows, columns=["zip_path", "member_index", "offset", "line"]
            ) if rows else pd.DataFrame(
                {
                    "zip_path": pd.Series(dtype="object"),
                    "member_index": pd.Series(dtype="int32"),
                    "offset": pd.Series(dtype="int64"),
                    "line": pd.Series(dtype="object"),
                }
            )

    return members.select("zip_path", "member_index", "content").mapInPandas(
        split_lines, schema=_LINE_SCHEMA
    )
