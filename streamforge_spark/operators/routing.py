"""Routing / fan-out / fan-in.

Reference:
- ``pattern/split/ParallelSplitter.java:60-131`` — ordered predicate
  routes to named side outputs; exclusive (first match wins, unmatched
  -> main) or copy-to-main (record goes to main AND every match);
- ``pattern/split/WatermarkAlignedFanIn.java:47-81`` — union of N
  streams after per-source watermark assignment + source tagging.

Spark-first: routing is a single ``when``-cascade route-tag column
(one pass, no re-scan per route — the Catalyst analog of side
outputs); fan-in is ``unionByName`` and Spark's global watermark
(min across inputs) provides alignment for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAIN_ROUTE = "main"


def route_tag(routes: Sequence[tuple[str, Column]]) -> Column:
    """First-match-wins route tag (exclusive mode)."""
    expr = None
    for name, pred in routes:
        expr = F.when(pred, F.lit(name)) if expr is None else expr.when(pred, F.lit(name))
    if expr is None:
        return F.lit(MAIN_ROUTE)
    return expr.otherwise(F.lit(MAIN_ROUTE))


def parallel_splitter(df: DataFrame, routes: Sequence[tuple[str, Column]],
                      copy_to_main: bool = False) -> dict[str, DataFrame]:
    """Split one DataFrame into named routes.

    Exclusive mode: each row lands on the FIRST route whose predicate
    matches; unmatched rows land on 'main' (ParallelSplitter.java:
    117-127). copy_to_main: every row lands on 'main' AND on every
    matching route.

    Returns {route_name: DataFrame}. For a streaming multi-sink write,
    compute the tag once inside one foreachBatch and write each split
    (persist the batch df) — see streamforge_spark.streaming.sinks.
    """
    out: dict[str, DataFrame] = {}
    if copy_to_main:
        out[MAIN_ROUTE] = df
        for name, pred in routes:
            out[name] = df.filter(pred)
        return out
    tagged = df.withColumn("_route", route_tag(routes))
    for name, _ in routes:
        out[name] = tagged.filter(F.col("_route") == name).drop("_route")
    out[MAIN_ROUTE] = tagged.filter(F.col("_route") == MAIN_ROUTE).drop("_route")
    return out


def routed(df: DataFrame, routes: Sequence[tuple[str, Column]]) -> DataFrame:
    """Single-output form: df + a ``route`` column (exclusive mode).

    This is the shape used for partitioned sink writes
    (``.write.partitionBy('route')``) — zero-copy fan-out at scale.
    """
    return df.withColumn("route", route_tag(routes))


def watermark_aligned_fan_in(sources: Sequence[tuple[str, DataFrame]],
                             event_time_col: str = "event_time",
                             max_drift: str | None = None,
                             tag_col: str = "ingest_source") -> DataFrame:
    """Union N streams with per-source tags and (if streaming) a
    bounded-out-of-orderness watermark per input.

    Spark computes the global watermark as the min across inputs —
    exactly the alignment WatermarkAlignedFanIn provides; no reordering
    is performed (WatermarkAlignedFanIn.java:80).
    """
    tagged = []
    for name, df in sources:
        t = df.withColumn(tag_col, F.lit(name))
        if max_drift is not None and t.isStreaming:
            t = t.withWatermark(event_time_col, max_drift)
        tagged.append(t)
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out
