#!/usr/bin/env python
"""Dump .explain('formatted') for headline queries to plans/r12/.

    python tools/dump_plans.py before [NAME ...]
    python tools/dump_plans.py after  [NAME ...]

Default name set: every headline query. Existing files are only
overwritten when --force is given (so a 'before' captured prior to an
edit survives later runs).
"""
from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from streamforge_spark import registry  # noqa: E402
from streamforge_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv
    suffix = argv[0] if argv and argv[0] in ("before", "after") else "before"
    names = argv[1:] if len(argv) > 1 else None
    if names is None:
        import bench
        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = pathlib.Path(__file__).resolve().parent.parent / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("streamforge-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    for name in names:
        path = out_dir / f"{name}_{suffix}.txt"
        if path.exists() and not force:
            print(f"skip {path.name} (exists)")
            continue
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building {name}: {exc}"
        path.write_text(plan)
        print(f"wrote {path.name} ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
