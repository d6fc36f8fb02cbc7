"""Envelope serialization round-trip — the Kafka-shaped wire path.

The reference's primary data path is JSON envelopes over Kafka
(StreamEnvelopParser on the way in, KafkaSinkBuilder's to-JSON on the
way out). This query drives serialize -> parse end-to-end through the
correctness gate: envelopes rendered with to_json, mixed with poison
rows, parsed back with parse_stream_envelop (poison lands on the DLQ
side and must NOT appear in the output)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_spark.envelope import envelope_from_events, parse_stream_envelop
from streamforge_spark.queries.common import ENVELOPE_CTE, prep
from streamforge_spark.registry import query


@query(
    "envelope_roundtrip",
    oracle=f"""
WITH {ENVELOPE_CTE}
SELECT event_id, operation, source, payload_json, event_time, trace_id, primary_key
FROM envelope
""",
)
def envelope_roundtrip(spark, sf_dir):
    (events,) = prep(spark, sf_dir, "events")
    env = envelope_from_events(events)
    wire = env.select(
        "event_id",
        F.to_json(F.struct(
            "operation", "source", "payload_json", "event_time",
            "trace_id", "primary_key",
        ), {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
            # events.ts is TIMESTAMP_NTZ — to_json picks the NTZ format
            # option for it, and the default truncates micros to millis.
            "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"}).alias("value"),
    )
    poison = spark.createDataFrame(
        [(-1, "not json"), (-2, '{"operation": "truncated'), (-3, "[1,2,3]")],
        "event_id long, value string")
    ok, dlq = parse_stream_envelop(wire.unionByName(poison),
                                   passthrough_cols=("event_id",))
    assert dlq is not None
    return ok.select("event_id", "operation", "source", "payload_json",
                     "event_time", "trace_id", "primary_key")


@query(
    "variant_payload_agg",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_sum,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
FROM events GROUP BY event_type
""",
)
def variant_payload_agg(spark, sf_dir):
    """Schema-on-read payload access through Spark's VARIANT type
    (SURVEY §1.1's alternative payload encoding): parse_json once into
    a binary variant, then typed variant_get extraction — the
    open-schema path that avoids re-parsing JSON per field at 100 TB.
    Aggregates stay exact (BIGINT)."""
    (events,) = prep(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (events.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("k").alias("k_sum"),
                 F.min("k").alias("k_min"),
                 F.max("k").alias("k_max")))
