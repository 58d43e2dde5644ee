#!/usr/bin/env python3
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"spread": {...}, "runs": N, "sf": ...}.

Methodology:
- Interleaved rounds (VERDICT.md round-1 ask #9): after a warmup pass
  (JIT + parquet footer reads), every query runs once per measurement
  ROUND and rounds repeat, so a transient noisy-neighbor spike on this VM
  hits one round of many queries instead of all runs of one query.
  Reported per-query time is the MEDIAN across rounds; "spread" records
  (max-min)/median as a jitter diagnostic. Each run fully materializes
  the result (collect), so the measurement covers the whole plan.
- Process isolation for UDF queries (VERDICT.md round-2 ask #2): queries
  that spawn Python UDF workers run in a SEPARATE SparkContext, created
  after the JVM-only context stops. Round 2 showed resident Python
  workers (spark.python.worker.reuse) degrading later JVM-only stages
  3-5x in the shared session; stopping the context kills the workers, so
  the JVM-only phase measures plans, not resident-worker drag.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from appengine_mapreduce_spark.plans import bench_queries
from appengine_mapreduce_spark.session import get_spark

N_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))


def _measure(
    spark, ordered, sf_dir: str,
    samples: dict[str, list[float]], rows: dict[str, int],
) -> None:
    # Warmup: whole-stage-codegen JIT, parquet footers, broadcast warm paths.
    for name, spec in ordered:
        spec.fn(spark, sf_dir).collect()
    for _rnd in range(N_ROUNDS):
        for name, spec in ordered:
            t0 = time.perf_counter()
            rows[name] = len(spec.fn(spark, sf_dir).collect())
            samples[name].append(time.perf_counter() - t0)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    specs = bench_queries()
    jvm_only = sorted(
        ((n, s) for n, s in specs.items() if "udf" not in s.tags),
        key=lambda kv: kv[0],
    )
    udf = sorted(
        ((n, s) for n, s in specs.items() if "udf" in s.tags),
        key=lambda kv: kv[0],
    )

    samples: dict[str, list[float]] = {n: [] for n in specs}
    rows: dict[str, int] = {}

    spark = get_spark(app_name="bench-jvm")
    _measure(spark, jvm_only, sf_dir, samples, rows)
    if udf:
        # Fresh context for the UDF phase: the JVM-only numbers above were
        # taken with zero Python workers resident.
        spark.stop()
        spark = get_spark(app_name="bench-udf")
        _measure(spark, udf, sf_dir, samples, rows)

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    total = 0.0
    for name, _ in jvm_only + udf:
        runs = samples[name]
        med = statistics.median(runs)
        timings[name] = round(med, 4)
        spread[name] = round((max(runs) - min(runs)) / med, 3) if med > 0 else 0.0
        total += med
        print(
            f"# {name}: median {med:.3f}s over {len(runs)} runs "
            f"(min {min(runs):.3f} max {max(runs):.3f}, {rows[name]} rows)",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "runs": N_ROUNDS,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
