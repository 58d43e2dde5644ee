"""Dump `.explain("formatted")` for registered queries to per-query text
files — the optimization round's plan evidence (plans/r14/<q>_before.txt /
_after.txt are generated with this, once from the pre-round tree and once
from HEAD, so the judge can check plan claims without running Spark).

Usage:
    python tools/explain_dump.py --out DIR [--sf SF_DIR] [--suffix _after]
                                 [names...]

With no names, dumps every registered query (used to mechanically diff
which plans a round changed).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--suffix", default="")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from appengine_mapreduce_spark.plans import all_queries
    from appengine_mapreduce_spark.session import get_spark

    os.makedirs(args.out, exist_ok=True)
    qs = all_queries()
    names = args.names or sorted(qs)
    spark = get_spark(app_name="explain-dump")
    try:
        for name in names:
            spec = qs[name]
            try:
                df = spec.fn(spark, args.sf)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception as exc:  # keep the sweep going
                txt = f"BUILD ERROR: {exc}\n"
            path = os.path.join(args.out, f"{name}{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path}", file=sys.stderr)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
