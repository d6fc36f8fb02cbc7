"""Quick parity runner: compare named queries against their DuckDB
oracles at a given SF without the full pytest session.

    python -m tools.parity boilerplate_strip bigram_lm_score
    python -m tools.parity --sf /root/testdata/sf0.01 boilerplate_strip
"""

from __future__ import annotations

import argparse
import sys
import time

from streamforge_spark import registry
from streamforge_spark.session import get_spark
from tests.oracle import compare, duck_con


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    registry.load_all()
    spark = get_spark()
    con = duck_con(args.sf)
    rc = 0
    for name in args.names:
        t0 = time.time()
        try:
            sdf = registry.QUERIES[name](spark, args.sf).toPandas()
            odf = con.execute(registry.ORACLES[name]).df()
            compare(sdf, odf, name)
            print(f"PASS {name} rows={len(sdf)} ({time.time() - t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001 — report-and-continue CLI
            rc = 1
            print(f"FAIL {name}: {exc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
