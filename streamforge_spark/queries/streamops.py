"""Dedup / suppression / routing / fan-in queries (SURVEY §2.5, §2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_spark.envelope import envelope_from_events
from streamforge_spark.operators.dedup import deduplicator, stateful_merger
from streamforge_spark.operators.routing import parallel_splitter, routed, watermark_aligned_fan_in
from streamforge_spark.queries.common import ENVELOPE_CTE, prep
from streamforge_spark.registry import query


@query(
    "dedup_first_seen",
    oracle=f"""
WITH {ENVELOPE_CTE},
filtered AS (SELECT * FROM envelope WHERE operation <> 'unknown')
SELECT event_id, operation, primary_key, event_time, payload_json FROM (
  SELECT *, row_number() OVER (PARTITION BY primary_key, event_time ORDER BY event_id) AS rn
  FROM filtered
) WHERE rn = 1
""",
)
def dedup_first_seen(spark, sf_dir):
    """Deduplicator: first-seen-wins on the CDC key
    (primary_key, event_time) — Deduplicator.java:51-70 with the
    composite key of MongoToKafkaJob.java:67-69."""
    (events,) = prep(spark, sf_dir, "events")
    env = envelope_from_events(events).filter(F.col("operation") != "unknown")
    return deduplicator(env, ["primary_key", "event_time"], ["event_id"]).select(
        "event_id", "operation", "primary_key", "event_time", "payload_json")


@query(
    "merger_suppress",
    oracle=f"""
WITH {ENVELOPE_CTE},
w AS (
  SELECT *, lag(payload_json) OVER (PARTITION BY primary_key ORDER BY event_time, event_id) AS prev_payload
  FROM envelope
)
SELECT event_id, primary_key, event_time, payload_json
FROM w WHERE prev_payload IS NULL OR payload_json <> prev_payload
""",
)
def merger_suppress(spark, sf_dir):
    """StatefulMerger: suppress consecutive no-op updates per key via
    content fingerprint (StatefulMerger.java:94-120)."""
    (events,) = prep(spark, sf_dir, "events")
    env = envelope_from_events(events)
    return stateful_merger(env, ["primary_key"], "payload_json",
                           ["event_time", "event_id"]).select(
        "event_id", "primary_key", "event_time", "payload_json")


@query(
    "splitter_exclusive",
    oracle=f"""
WITH {ENVELOPE_CTE}
SELECT event_id, operation, value,
       CASE WHEN operation = 'delete' THEN 'deletes'
            WHEN value > 400 THEN 'big_values'
            WHEN operation = 'update' THEN 'updates'
            ELSE 'main' END AS route
FROM envelope
""",
)
def splitter_exclusive(spark, sf_dir):
    """ParallelSplitter exclusive mode: first matching route wins,
    unmatched -> main (ParallelSplitter.java:117-127). Single-output
    route-tag form (partitioned-write shape)."""
    (events,) = prep(spark, sf_dir, "events")
    env = envelope_from_events(events)
    routes = [
        ("deletes", F.col("operation") == "delete"),
        ("big_values", F.col("value") > 400),
        ("updates", F.col("operation") == "update"),
    ]
    return routed(env, routes).select("event_id", "operation", "value", "route")


@query(
    "splitter_copy_to_main",
    oracle=f"""
WITH {ENVELOPE_CTE}
SELECT event_id, 'main' AS route FROM envelope
UNION ALL
SELECT event_id, 'deletes' AS route FROM envelope WHERE operation = 'delete'
UNION ALL
SELECT event_id, 'big_values' AS route FROM envelope WHERE value > 400
""",
)
def splitter_copy_to_main(spark, sf_dir):
    """ParallelSplitter copyToMain mode: record goes to main AND every
    matching route (ParallelSplitter.java:109-116)."""
    (events,) = prep(spark, sf_dir, "events")
    env = envelope_from_events(events)
    routes = [
        ("deletes", F.col("operation") == "delete"),
        ("big_values", F.col("value") > 400),
    ]
    splits = parallel_splitter(env, routes, copy_to_main=True)
    out = None
    for name, df in splits.items():
        tagged = df.select("event_id", F.lit(name).alias("route"))
        out = tagged if out is None else out.unionByName(tagged)
    return out


@query(
    "fanin_union",
    oracle=f"""
WITH {ENVELOPE_CTE}
SELECT event_id, event_time, 'inserts' AS ingest_source FROM envelope WHERE operation = 'insert'
UNION ALL
SELECT event_id, event_time, 'updates' AS ingest_source FROM envelope WHERE operation = 'update'
""",
)
def fanin_union(spark, sf_dir):
    """WatermarkAlignedFanIn: tag-and-union of N sources
    (WatermarkAlignedFanIn.java:47-81); watermark alignment is a no-op
    in batch and Spark-global-watermark in streaming."""
    (events,) = prep(spark, sf_dir, "events")
    env = envelope_from_events(events)
    merged = watermark_aligned_fan_in(
        [
            ("inserts", env.filter(F.col("operation") == "insert")),
            ("updates", env.filter(F.col("operation") == "update")),
        ],
        event_time_col="event_time", max_drift="5 seconds",
    )
    return merged.select("event_id", "event_time", "ingest_source")
