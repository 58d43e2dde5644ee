"""Runtime metric taps over Spark's AppStatusStore (the store behind the
UI / REST status API — public monitoring surface, no listener plumbing).

Used by bench.py to attribute shuffle bytes per query (plan regressions
show up as metric diffs even when wall-clock noise hides them) and by the
spill probe to prove external sort/agg carries constrained-memory runs.

Reference parity note: the reference framework exposes the same class of
evidence through per-job counters (python/src/mapreduce/model.py
CounterMap, io-* counters); here the engine already meters every stage,
so the tap is read-only.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


def total_shuffle_write_bytes(spark: SparkSession) -> int:
    """Monotonic total of shuffle bytes written across all executors
    since context start. Executor summaries are never evicted (unlike
    retained stages), so before/after diffs are exact per-query shuffle
    attribution even in long bench runs."""
    store = spark.sparkContext._jsc.sc().statusStore()
    lst = store.executorList(True)
    return sum(lst.apply(i).totalShuffleWrite() for i in range(lst.size()))


@dataclass(frozen=True)
class StageTotals:
    n_stages: int
    shuffle_write_bytes: int
    shuffle_read_bytes: int
    memory_spill_bytes: int
    disk_spill_bytes: int
    peak_execution_memory: int


def stage_totals(spark: SparkSession) -> StageTotals:
    """Sum stage-level metrics across all RETAINED stages (default
    retention 1000 — fine for one probe run; prefer
    :func:`total_shuffle_write_bytes` for long-lived diffs)."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    sl = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        sc._gateway.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    sw = sr = ms = ds = pm = 0
    n = sl.size()
    for i in range(n):
        s = sl.apply(i)
        sw += s.shuffleWriteBytes()
        sr += s.shuffleReadBytes()
        ms += s.memoryBytesSpilled()
        ds += s.diskBytesSpilled()
        pm = max(pm, s.peakExecutionMemory())
    return StageTotals(n, sw, sr, ms, ds, pm)
