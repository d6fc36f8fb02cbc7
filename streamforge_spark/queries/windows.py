"""Windowed-analytics & reshaping surplus queries (SURVEY §2.8
'absent' row): PIVOT, running-total window frames, exact percentiles.
The reference's only aggregation shape is a session-window list fold —
these demonstrate the analytic surface Spark adds for free.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from streamforge_spark.queries.common import prep
from streamforge_spark.registry import query

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_event_types",
    oracle="""
SELECT user_id,
       CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
       CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
       CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
       CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
       CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
FROM events GROUP BY user_id
""",
)
def pivot_event_types(spark, sf_dir):
    """PIVOT reshaping: one row per user, one column per event type.
    The pivot value list is pinned (no extra distinct-values job — at
    100 TB an unpinned pivot is two passes over the fact table)."""
    (events,) = prep(spark, sf_dir, "events")
    out = (
        events.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES])


@query(
    "running_user_total",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
FROM events
""",
)
def running_user_total(spark, sf_dir):
    """Running-total window frame per user (ROWS UNBOUNDED PRECEDING),
    ordered by (ts, event_id) — the unique tiebreak makes every row's
    prefix sum deterministic. One hash shuffle on user_id; the frame
    is a single forward scan per partition."""
    (events,) = prep(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id", "user_id",
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias("running_cents"),
        F.row_number().over(wo).cast("long").alias("seq"),
    )
