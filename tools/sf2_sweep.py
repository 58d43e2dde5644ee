#!/usr/bin/env python3
"""Extend the measured scaling-exponent story one more half-decade:
run the frozen 25-headliner bench suite at an sf2 fixture
(tools/gen_sf.py --mult 20) and report per-query sf1→sf2 exponents
(log2 ratio over the 2× data growth, so 1.0 = linear, 0.0 = flat).

Deliberately a SEPARATE tool: bench.py's payload shape is frozen for
round-over-round comparability, so the extra decade is additive
evidence committed as BENCH_SF2_r{N}.json, not a change to the driver's
per-round bench contract.

Usage: python tools/sf2_sweep.py [sf2_dir] [sf1_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (reuses the frozen suite + calibration)


def main() -> None:
    sf2_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "testdata", "sf2")
    sf1_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "testdata", "sf1")
    if not os.path.isdir(sf2_dir):
        raise SystemExit(f"missing sf2 fixture {sf2_dir} — run "
                         "tools/gen_sf.py --mult 20 first")
    sf1 = bench._run_suite(sf1_dir, 2, "sf1")
    sf2 = bench._run_suite(sf2_dir, 2, "sf2")
    exponents = {
        n: round(
            math.log2(max(sf2["queries"][n], 1e-4)
                      / max(sf1["queries"][n], 1e-4)), 2)
        for n in sf1["queries"]
    }
    out = {
        "metric": "sf2_sweep",
        "sf1_total": sf1["value"],
        "sf2_total": sf2["value"],
        "sf1_queries": sf1["queries"],
        "sf2_queries": sf2["queries"],
        "scaling_exponent_sf1_to_sf2_log2": exponents,
        "worst_exponent": max(exponents.values()),
        "calibration_sec_sf1": sf1["calibration_sec"],
        "calibration_sec_sf2": sf2["calibration_sec"],
    }
    dest = os.path.join(REPO, f"BENCH_SF2_r{bench._round_number()}.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"# written to {dest}", file=sys.stderr)
    print(json.dumps({k: out[k] for k in (
        "sf1_total", "sf2_total", "worst_exponent")}))


if __name__ == "__main__":
    main()
