#!/usr/bin/env python3
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"spread": {...}, "runs": N, "sf": ...}.

Methodology (VERDICT.md round-1 ask #9): after a warmup pass (JIT +
parquet footer reads), every query runs once per measurement ROUND and
rounds repeat — interleaved, so a transient noisy-neighbor spike on this
VM (~8% CPU steal, 1.5-3x jitter observed) hits one round of many queries
instead of all runs of one query. Reported per-query time is the MEDIAN
across rounds; "spread" records (max-min)/median as a jitter diagnostic.
Each run fully materializes the result (collect), so the measurement
covers the whole plan.
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")

    specs = bench_queries()
    # Queries that spawn Python UDF workers run LAST within each round: the
    # resident workers (spark.python.worker.reuse) measurably slow later
    # JVM-only stages.
    ordered = sorted(specs.items(), key=lambda kv: ("udf" in kv[1].tags, kv[0]))

    # Warmup: whole-stage-codegen JIT, parquet footers, broadcast warm paths.
    for name, spec in ordered:
        spec.fn(spark, sf_dir).collect()

    samples: dict[str, list[float]] = {name: [] for name, _ in ordered}
    rows: dict[str, int] = {}
    for rnd in range(N_ROUNDS):
        for name, spec in ordered:
            t0 = time.perf_counter()
            rows[name] = len(spec.fn(spark, sf_dir).collect())
            samples[name].append(time.perf_counter() - t0)

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    total = 0.0
    for name, _ in ordered:
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
