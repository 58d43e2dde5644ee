#!/usr/bin/env python3
"""Round-open ritual (VERDICT r10 ask #3): commit the driver-written
artifacts FIRST THING each round, so they can't leak into mid-round
diffs or get forgotten (the same hygiene slip recurred rounds 8-10
because the driver writes BENCH_r{N}/CORRECTNESS_r{N} after the
end-of-round snapshot).

Usage: python tools/round_open.py [--dry-run]

Commits (when present and dirty/untracked):
- BENCH_r*.json, CORRECTNESS_r*.json (driver-written, usually untracked)
- BENCH_LOCAL_r*.json, LEAKCHECK.json, PROGRESS.jsonl, VERDICT.md,
  ADVICE.md (driver-modified after the snapshot)

Exits 0 with "nothing to commit" when the tree is already clean —
idempotent, safe to run every round open.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PATTERNS = [
    re.compile(p)
    for p in (
        r"BENCH_r\d+\.json$",
        r"CORRECTNESS_r\d+\.json$",
        r"BENCH_LOCAL_r\d+\.json$",
        r"BENCH_SF2_r\d+\.json$",
        r"LEAKCHECK\.json$",
        r"COPYCHECK\.json$",
        r"PROGRESS\.jsonl$",
        r"VERDICT\.md$",
        r"ADVICE\.md$",
    )
]


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", _REPO, *args],
        check=True, capture_output=True, text=True,
    ).stdout


def main() -> int:
    dry = "--dry-run" in sys.argv[1:]
    status = _git("status", "--porcelain")
    targets: list[str] = []
    for line in status.splitlines():
        path = line[3:].strip()
        if any(p.search(path) for p in _PATTERNS):
            targets.append(path)
    if not targets:
        print("round_open: nothing to commit (tree clean of driver artifacts)")
        return 0
    rounds = sorted(
        {m.group(1) for t in targets for m in [re.search(r"_r(\d+)\.", t)] if m}
    )
    tag = f"r{'/r'.join(rounds)}" if rounds else "driver"
    msg = f"round open: commit driver artifacts ({tag}): " + ", ".join(
        sorted(targets)
    )
    print(msg)
    if dry:
        return 0
    _git("add", "--", *targets)
    _git("commit", "-m", msg)
    print(_git("log", "--oneline", "-1").strip())
    return 0


if __name__ == "__main__":
    sys.exit(main())
