"""Metric collection & export.

The reference keeps a counter registry per (scope, operator) on Flink
metric groups with an optional Prometheus reporter
(core/metric/Metrics.java:9-24, core/config/MetricKeys.java:5-70). The
Spark analog: operators attach named ``df.observe`` expressions (zero
extra passes — metrics ride the existing job); this module collects
them:

- streaming: ``MetricsCollector`` is a StreamingQueryListener that
  accumulates every micro-batch's observedMetrics — counters sum
  across batches, ``*_max`` names take the running max;
- batch: ``batch_observation`` wraps ``pyspark.sql.Observation`` so a
  one-action job yields the same named counters;
- export: ``prometheus_text()`` renders the Prometheus text exposition
  format (the METRICS_PORT reporter analog — serve it from any HTTP
  endpoint).
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


class MetricsCollector(StreamingQueryListener):
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.metrics: dict[str, dict[str, float]] = {}

    # StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        observed = event.progress.observedMetrics or {}
        with self._lock:
            for scope, row in observed.items():
                d = self.metrics.setdefault(scope, {})
                for name, value in row.asDict().items():
                    if value is None:
                        continue
                    if name.endswith("_max"):
                        d[name] = max(d.get(name, value), value)
                    else:
                        d[name] = d.get(name, 0) + value

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # accessors --------------------------------------------------------
    def get(self, scope: str, name: str, default: float = 0) -> float:
        with self._lock:
            return self.metrics.get(scope, {}).get(name, default)

    def snapshot(self) -> dict[str, dict[str, float]]:
        with self._lock:
            return {s: dict(d) for s, d in self.metrics.items()}

    def prometheus_text(self, prefix: str = "streamforge") -> str:
        lines = []
        for scope, d in sorted(self.snapshot().items()):
            for name, value in sorted(d.items()):
                kind = "gauge" if name.endswith("_max") else "counter"
                metric = f"{prefix}_{scope}_{name}"
                lines.append(f"# TYPE {metric} {kind}")
                lines.append(f"{metric} {value}")
        return "\n".join(lines) + "\n"


def batch_observation(df: DataFrame, checks: list[tuple[str, Column]],
                      name: str = "health") -> tuple[DataFrame, Observation]:
    """Attach OnlineObserver-style counters to a batch DataFrame; read
    ``observation.get`` after the first action."""
    obs = Observation(name)
    df = df.observe(
        obs,
        F.count(F.lit(1)).alias("events_total"),
        *[F.count(F.when(pred, 1)).alias(n) for n, pred in checks],
    )
    return df, obs
