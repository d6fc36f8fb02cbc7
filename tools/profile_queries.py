#!/usr/bin/env python
"""Per-query wall decomposition: DataFrame-construction (driver/py4j)
time vs noop-execution time, for the headline set or a named subset.

Usage: python tools/profile_queries.py [NAME ...]
Prints one line per query: name, t_build, t_exec, total.
Methodology matches bench.py (same session shape, benchcache on,
same warmup); ONLY a diagnostic — never a published number.
"""
from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from streamforge_spark import registry  # noqa: E402
from streamforge_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("streamforge-profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    if os.environ.get("SPARK_GRAFT_NO_BENCH_CACHE") != "1":
        from streamforge_spark import benchcache
        benchcache.enable()
    names = sys.argv[1:]
    if not names:
        import bench
        names = list(bench.HEADLINE)
    # warmup (same as bench.py)
    registry.QUERIES["q6_forecast_revenue"](spark, sf_dir).collect()
    spark.range(64).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))) \
        .mapInPandas(lambda it: it, "id long").collect()
    sc = spark.sparkContext
    rows = []
    for name in names:
        fn = registry.QUERIES[name]
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        jobs_build = len(sc.statusTracker().getJobIdsForGroup(name))
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(name))
        rows.append((name, t1 - t0, t2 - t1, t2 - t0))
        print(f"{name:42s} build={t1-t0:7.3f} exec={t2-t1:7.3f} "
              f"total={t2-t0:7.3f} jobs={n_jobs:3d} "
              f"(build-side {jobs_build})", flush=True)
    tb = sum(r[1] for r in rows)
    te = sum(r[2] for r in rows)
    print(f"{'TOTAL':42s} build={tb:7.3f} exec={te:7.3f} total={tb+te:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
