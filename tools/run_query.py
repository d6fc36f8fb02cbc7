"""Run any registered query by name — the user-facing entry point for
ad-hoc execution:

    python -m tools.run_query q1_pricing_summary
    python -m tools.run_query dedup_exact --sf /root/testdata/sf0.01 -n 5
    python -m tools.run_query session_stats --explain
    python -m tools.run_query --list
"""

from __future__ import annotations

import argparse
import sys
import time

from streamforge_spark import registry
from streamforge_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("-n", "--limit", type=int, default=20)
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead of rows")
    ap.add_argument("--list", action="store_true",
                    help="list registered query names and exit")
    args = ap.parse_args()
    registry.load_all()
    if args.list or not args.name:
        for name in sorted(registry.QUERIES):
            mark = "oracle" if name in registry.ORACLES else "rows-only"
            print(f"{name}  [{mark}]")
        return 0
    if args.name not in registry.QUERIES:
        print(f"unknown query {args.name!r}; --list shows all", file=sys.stderr)
        return 2
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    df = registry.QUERIES[args.name](spark, args.sf)
    if args.explain:
        df.explain("formatted")
        return 0
    t0 = time.time()
    df.show(args.limit, truncate=False)
    print(f"[{args.name}] {df.count()} rows ({time.time() - t0:.1f}s) at {args.sf}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
