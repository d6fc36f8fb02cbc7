"""Named-job launcher: ``python -m streamforge_spark.launcher <JobName>``.

The run.sh -> Launcher -> JobRegistry -> job.run lifecycle
(core/launcher/Launcher.java:9-20, core/launcher/JobRegistry.java:6-10)
as a module main: look the job up in JOB_REGISTRY, activate its config
scope, build the pipeline, await the streaming queries.

``--drain`` processes everything currently available and stops (the
bounded-run mode tests and backfills use); without it the queries run
until terminated.
"""

from __future__ import annotations

import sys

from streamforge_spark.config import ScopedConfig
from streamforge_spark.jobs import JOB_REGISTRY
from streamforge_spark.session import get_spark


def run_job(name: str, cfg: ScopedConfig | None = None,
            spark=None, drain: bool = False) -> None:
    if name not in JOB_REGISTRY:
        known = ", ".join(sorted(JOB_REGISTRY))
        raise SystemExit(f"unknown job {name!r}; registered jobs: {known}")
    cfg = cfg or ScopedConfig()
    cfg.activate_job(name)
    spark = spark or get_spark(name)
    queries = JOB_REGISTRY[name](spark, cfg)
    if drain:
        for q in queries:
            q.processAllAvailable()
        for q in queries:
            q.stop()
    else:
        for q in queries:
            q.awaitTermination()


def main(argv: list[str]) -> None:
    args = [a for a in argv if a != "--drain"]
    if len(args) != 1:
        raise SystemExit("usage: python -m streamforge_spark.launcher "
                         "[--drain] <JobName>")
    run_job(args[0], drain="--drain" in argv)


if __name__ == "__main__":
    main(sys.argv[1:])
