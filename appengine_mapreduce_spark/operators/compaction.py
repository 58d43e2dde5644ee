"""Small-file compaction — the maintenance pass every long-running lake
pipeline needs.

Streaming sinks, per-shard writers and fine-grained partitionBy layouts all
produce directories of many small files; at 100 TB scale, scan cost is
dominated by file-open overhead and scheduler pressure long before bytes.
``compact_files`` rewrites a directory to approximately ``target_bytes``
files with a plain distributed read→repartition→write (no driver data
path), then swaps the result in via write-to-temp + two renames (the
same commit discipline as the reference's tmp-file rewrite in
GoogleCloudStorageConsistentOutputWriter, output_writers.py:863-1054).

Sort order within files is NOT preserved (compaction is for unordered
record sets; use the sorted/z-order layouts in plans/queries_layout.py
when order carries pruning value).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class CompactionStats:
    files_before: int
    files_after: int
    bytes_total: int


_COMPRESSION_EXTS = (".gz", ".bz2", ".zst", ".snappy", ".lz4", ".deflate",
                     ".zstd", ".br")


def _data_files(path: str, suffix: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            # Compressed writers append the codec AFTER the format suffix
            # for text formats (part-*.csv.gz) but BEFORE it for parquet
            # (part-*.snappy.parquet) — accept both shapes, but ONLY
            # known codec extensions: sidecars like part-0.parquet.crc
            # or *.parquet.tmp are not data files.
            name_ok = f.endswith(suffix) or any(
                f.endswith(suffix + ext) for ext in _COMPRESSION_EXTS
            )
            if name_ok and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return out


def _partition_leaves(path: str) -> list[str] | None:
    """Leaf directories of a Hive-partitioned (key=value) tree under
    ``path``, or None if the directory is flat. A mix of key=value and
    plain subdirectories is rejected (ambiguous layout).

    Heals interrupted per-leaf swaps FIRST: a crash between the two
    renames leaves ``<leaf>.old`` (data) with ``<leaf>`` absent — and
    since ``p=1.old`` still contains ``=``, it would otherwise be
    mistaken for a real partition and its data resurrected under a wrong
    partition value."""
    p = path.rstrip("/")
    for d in os.listdir(p):
        full = os.path.join(p, d)
        if d.endswith(".compacting"):
            shutil.rmtree(full, ignore_errors=True)
        elif d.endswith(".old") and os.path.isdir(full):
            _recover(full[: -len(".old")])
    subdirs = [
        d for d in os.listdir(p)
        if os.path.isdir(os.path.join(p, d)) and not d.startswith((".", "_"))
    ]
    if not subdirs:
        return None
    hive = [d for d in subdirs if "=" in d]
    if not hive:
        return None
    if len(hive) != len(subdirs):
        raise ValueError(
            f"{path}: mixed key=value and plain subdirectories — "
            "refusing to compact an ambiguous layout"
        )
    leaves: list[str] = []
    for d in hive:
        child = os.path.join(p, d)
        nested = _partition_leaves(child)
        leaves.extend(nested if nested else [child])
    return leaves


def _recover(path: str) -> None:
    """Heal an interrupted swap: if a previous compact_files crashed
    between its two renames, the data sits in <path>.old and <path> is
    absent — restore it. Stale .compacting dirs are just deleted."""
    p = path.rstrip("/")
    if not os.path.exists(p) and os.path.exists(p + ".old"):
        os.replace(p + ".old", p)
    shutil.rmtree(p + ".old", ignore_errors=True)
    shutil.rmtree(p + ".compacting", ignore_errors=True)


def compact_files(
    spark: SparkSession,
    path: str,
    data_format: str = "parquet",
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
) -> CompactionStats:
    """Rewrite ``path`` so each output file is ~``target_bytes``.

    The file count is derived from the CURRENT on-disk bytes (cheap
    listing), so a directory already compact is a near-no-op rewrite.
    ``repartition(n)`` is a round-robin exchange — it balances output
    sizes regardless of input skew, which is exactly right for compaction
    (key locality is the sorted/partitioned layouts' job, not this one).

    A Hive-partitioned (key=value) tree is compacted PER PARTITION LEAF,
    preserving the directory layout and planning-time partition pruning —
    a flat rewrite would infer the partition columns, inline them into
    data files and destroy the layout. Per-leaf is also the 100 TB shape:
    each leaf compaction is independent (parallelizable, restartable) and
    untouched partitions can be skipped entirely by a change-aware caller.
    """
    leaves = _partition_leaves(path)
    if leaves is not None:
        stats = [
            compact_files(
                spark, leaf, data_format=data_format,
                target_bytes=target_bytes, min_files=min_files,
            )
            for leaf in leaves
        ]
        return CompactionStats(
            files_before=sum(s.files_before for s in stats),
            files_after=sum(s.files_after for s in stats),
            bytes_total=sum(s.bytes_total for s in stats),
        )
    _recover(path)
    suffix = "." + data_format
    before = _data_files(path, suffix)
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(min_files, (total + target_bytes - 1) // target_bytes)

    df = getattr(spark.read, data_format)(path)
    tmp = path.rstrip("/") + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    getattr(df.repartition(int(n_out)).write.mode("overwrite"), data_format)(tmp)

    # Two renames, not one atomic op: there is a sub-millisecond window
    # where the path is absent. A crash in that window is recoverable
    # (see _recover, called on entry); readers racing the swap should
    # coordinate via the table format / catalog at production scale.
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(path.rstrip("/"), old)
    os.replace(tmp, path.rstrip("/"))
    shutil.rmtree(old, ignore_errors=True)

    after = _data_files(path, suffix)
    return CompactionStats(
        files_before=len(before), files_after=len(after), bytes_total=total
    )
