"""Predicate filtering with pass/drop observability.

Reference: ``pattern/filter/FilterInterceptor.java:19-47`` — a
predicate filter that counts passed/dropped records. In Spark the
filter is a Catalyst expression (pushed into the scan when possible);
the counters ride on ``df.observe`` so they cost nothing extra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_interceptor(df: DataFrame, predicate: Column,
                       observe_name: str | None = None) -> DataFrame:
    """Keep rows matching ``predicate``; optionally observe counters.

    ``observe`` metrics surface through QueryExecutionListener /
    StreamingQueryListener — the Spark analog of the reference's
    ``Metrics.inc`` counters (core/metric/Metrics.java:9-24).
    """
    if observe_name:
        df = df.observe(
            observe_name,
            F.count(F.lit(1)).alias("events_total"),
            F.count(F.when(predicate, 1)).alias("events_passed"),
            F.count(F.when(~predicate, 1)).alias("events_dropped"),
        )
    return df.filter(predicate)
