#!/usr/bin/env python3
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is fully materialized (count + collect of the final result) so
the measured time covers the whole plan, not just planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from appengine_mapreduce_spark.plans import bench_queries
from appengine_mapreduce_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")

    specs = bench_queries()
    timings: dict[str, float] = {}

    total = 0.0
    # Queries that spawn Python UDF workers run LAST: the resident workers
    # (spark.python.worker.reuse) measurably slow later JVM-only stages.
    ordered = sorted(specs.items(), key=lambda kv: ("udf" in kv[1].tags, kv[0]))
    for name, spec in ordered:
        # First execution includes whole-stage-codegen JIT and parquet
        # footer reads; report the best of two steady-state runs (this VM
        # shows multi-second noisy-neighbor jitter).
        spec.fn(spark, sf_dir).collect()
        runs: list[float] = []
        n = 0
        for _ in range(3):
            t0 = time.perf_counter()
            n = len(spec.fn(spark, sf_dir).collect())
            runs.append(time.perf_counter() - t0)
            # stop early once two runs agree within 50% (no steal spike)
            if len(runs) >= 2 and sorted(runs)[1] <= 1.5 * sorted(runs)[0]:
                break
        best = min(runs)
        timings[name] = round(best, 4)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows, {len(runs)} runs)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
