#!/usr/bin/env python3
"""Witness ledger: per-query driver-witness history from the committed
CORRECTNESS_r*.json artifacts, plus rotation suggestions.

The driver checks only the FIRST 50 queries each round, so witness
freshness decays for everything else; tests/test_registry.py guarantees
never-witnessed queries enter the window, and this tool makes the
round-N+1 ROTATION choice (VERDICT r10 ask #7: refresh stale witnesses)
mechanical instead of hand-computed.

Usage: python tools/witness_ledger.py [--suggest N]
Prints: never-witnessed queries, a last-witness-round histogram, and the
N stalest queries (family-diverse) to rotate into the window tail.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    n_suggest = 3
    for a in sys.argv[1:]:
        if a.startswith("--suggest="):
            n_suggest = int(a.split("=", 1)[1])

    from appengine_mapreduce_spark.plans import all_queries

    qs = all_queries()
    window = set(list(qs)[:50])

    last: dict[str, int] = {}
    newest_artifact = 0
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        newest_artifact = max(newest_artifact, rnd)
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if name not in qs:
                    continue
                full = row.get("hash_match") and row.get("rows_match")
                rows_only = (
                    qs[name].oracle is None
                    and row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                )
                if full or rows_only:
                    last[name] = max(last.get(name, 0), rnd)

    never = sorted(n for n in qs if n not in last)
    print(f"registry: {len(qs)} queries, window: first 50")
    print(f"never driver-witnessed: {never or 'none'}")
    in_window = [n for n in never if n in window]
    out_window = [n for n in never if n not in window]
    if out_window:
        print(f"  !! OUTSIDE the window (guard test should fail): {out_window}")
    elif never:
        print(f"  all {len(in_window)} are in the window (witnessed next round)")

    hist: dict[int, int] = {}
    for rnd in last.values():
        hist[rnd] = hist.get(rnd, 0) + 1
    print("last-witness-round histogram:",
          {k: hist[k] for k in sorted(hist)})

    # Staleness gap (mirrors tests/test_registry.py::
    # test_witness_staleness_bounded): worst (newest_artifact - witness)
    # among queries NOT scheduled in the current window — the number the
    # guard bounds at 9 and that each round's rotation must keep down.
    # Newest comes from the FILENAME round like the test, not from the
    # witness values — a green-less newest artifact must not shrink the
    # printed gap below what the guard enforces (review r13).
    newest = newest_artifact
    gaps = sorted(
        ((newest - rnd, n) for n, rnd in last.items() if n not in window),
        reverse=True,
    )
    if gaps:
        worst_gap, worst_name = gaps[0]
        print(f"worst non-window staleness gap: {worst_gap} rounds "
              f"({worst_name}, r{newest - worst_gap} vs newest artifact "
              f"r{newest}; guard bound 9, +1 round grace for "
              f"_NEXT_ROTATION names)")
        from appengine_mapreduce_spark.plans.registry import _NEXT_ROTATION
        deferred = [n for g, n in gaps if g > 9 and n in set(_NEXT_ROTATION)]
        hard = [n for g, n in gaps
                if g > 9 and n not in set(_NEXT_ROTATION)]
        if deferred:
            print(f"  deferred via _NEXT_ROTATION (must enter the window "
                  f"at the NEXT round open): {deferred}")
        if hard:
            print(f"  GUARD VIOLATIONS (not scheduled anywhere): {hard}")

    # Stalest rotation candidates, at most one per leading family tag so
    # the rotation spreads across operator families.
    stale = sorted(
        ((rnd, n) for n, rnd in last.items() if n not in window),
        key=lambda t: (t[0], t[1]),
    )
    seen_fams: set[str] = set()
    picks: list[tuple[int, str]] = []
    for rnd, name in stale:
        fam = qs[name].tags[0] if qs[name].tags else "untagged"
        if fam in seen_fams:
            continue
        seen_fams.add(fam)
        picks.append((rnd, name))
        if len(picks) >= n_suggest:
            break
    print(f"rotation suggestions (stalest, family-diverse, top {n_suggest}):")
    for rnd, name in picks:
        print(f"  {name}  (last witnessed r{rnd}, family "
              f"{qs[name].tags[0] if qs[name].tags else '-'})")

    # Artifact freshness: the newest PARITY sweep embeds the registry
    # fingerprint it ran against; flag a mismatch with the live registry
    # (PLAN_AUDIT has a hard pytest staleness gate; PARITY costs a ~45 min
    # sf1 sweep, so this is an advisory check, not a test failure).
    from appengine_mapreduce_spark.plans.registry import registry_fingerprint

    live = registry_fingerprint()
    parities = sorted(glob.glob(os.path.join(_REPO, "PARITY_r*.md")))
    if parities:
        newest = parities[-1]
        with open(newest) as fh:
            m = re.search(r"fingerprint: `([0-9a-f]+)`", fh.read(2000))
        embedded = m.group(1) if m else "?"
        status = "FRESH" if embedded == live else (
            "STALE — re-run tools/parity_sweep.py")
        print(f"newest parity sweep {os.path.basename(newest)}: "
              f"fingerprint {embedded} vs live {live} -> {status}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
