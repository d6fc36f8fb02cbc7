"""The universal record: StreamEnvelop as a fixed Spark schema.

Re-expresses the reference's envelope model
(``core/model/StreamEnvelop.java:23-30``: operation, source,
payloadJson, eventTime, processedTime, traceId, primaryKey, metadata)
and the CDC decode rules of
``job/cdc/parser/MongoToKafkaParser.java:73-160`` as pure column
algebra — no UDFs, fully whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType([
    T.StructField("operation", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("payload_json", T.StringType()),
    T.StructField("event_time", T.TimestampType()),
    T.StructField("processed_time", T.TimestampType()),
    T.StructField("trace_id", T.StringType()),
    T.StructField("primary_key", T.StringType()),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
])

#: Wire-side parse schema: the reference serializes the envelope via
#: Jackson with camelCase names (StreamEnvelop.java:23-30 toJson —
#: payloadJson/eventTime/processedTime/traceId/primaryKey), while this
#: repo's own sinks emit snake_case. Parsing accepts BOTH in one
#: from_json pass (the name pairs differ by more than case, so the
#: struct is legal under case-insensitive resolution) and the reader
#: coalesces per field — a reference-produced topic no longer slips
#: through as all-null columns.
#: Timestamps parse as STRINGS then cast: from_json's pattern-based
#: TimestampType parsing is fixed-precision (default truncates to
#: millis), while the cast accepts ISO-8601 with any fractional-digit
#: count and offset — what Jackson actually emits for Instant.
_WIRE_SCHEMA = T.StructType(
    list(ENVELOPE_SCHEMA.fields[:2]) + [
        T.StructField("payload_json", T.StringType()),
        T.StructField("payloadJson", T.StringType()),
        T.StructField("event_time", T.StringType()),
        T.StructField("eventTime", T.StringType()),
        T.StructField("processed_time", T.StringType()),
        T.StructField("processedTime", T.StringType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("traceId", T.StringType()),
        T.StructField("primary_key", T.StringType()),
        T.StructField("primaryKey", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ])

#: CDC op normalization map — MongoToKafkaParser.java:80-86.
#: {c, insert} -> insert; {u, update, replace} -> update;
#: {d, delete} -> delete; anything else -> unknown.
OP_INSERT = ("c", "insert")
OP_UPDATE = ("u", "update", "replace")
OP_DELETE = ("d", "delete")


def normalize_op(op: Column) -> Column:
    """Normalize a raw CDC op code to insert/update/delete/unknown."""
    return (
        F.when(op.isin(*OP_INSERT), F.lit("insert"))
        .when(op.isin(*OP_UPDATE), F.lit("update"))
        .when(op.isin(*OP_DELETE), F.lit("delete"))
        .otherwise(F.lit("unknown"))
    )


def cdc_payload(op_normalized: Column, after: Column, full_document: Column,
                updated_fields: Column, document_key: Column) -> Column:
    """Payload precedence — MongoToKafkaParser.java:88-136.

    ``after`` -> ``fullDocument`` -> (update) ``updateDescription.
    updatedFields`` -> documentKey; deletes carry only the documentKey.
    All operands are JSON strings; merge semantics for partial updates
    are handled by the caller when typed access is needed.
    """
    return (
        F.when(op_normalized == "delete", document_key)
        .otherwise(F.coalesce(after, full_document, updated_fields, document_key))
    )


def envelope_from_events(events: DataFrame) -> DataFrame:
    """Adapt the driver's ``events`` fixture to the StreamEnvelop shape.

    Deterministic mapping (no randomness, no wall clock) so batch
    results are oracle-checkable:

    - raw op code derives from event_type (signup->c, purchase->u,
      click->update, view->other, error->d) and is then normalized
      through the reference op map — 'view' rows deliberately land on
      the unknown branch so the filter-unknown path has real work
      (MongoToKafkaJob.java:66);
    - primary_key = user_id, event_time = ts, payload_json = props,
      source = 'events'.
    - trace_id is null for every 5th event (processor backfill path,
      cf. MongoToKafkaProcessor.java:71-81).
    """
    raw_op = (
        F.when(F.col("event_type") == "signup", F.lit("c"))
        .when(F.col("event_type") == "purchase", F.lit("u"))
        .when(F.col("event_type") == "click", F.lit("update"))
        .when(F.col("event_type") == "view", F.lit("other"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.col("event_type"))
    )
    return events.select(
        F.col("event_id"),
        normalize_op(raw_op).alias("operation"),
        F.lit("events").alias("source"),
        F.col("props").alias("payload_json"),
        F.col("ts").alias("event_time"),
        F.col("ts").alias("processed_time"),
        F.when(F.col("event_id") % 5 != 0,
               F.concat(F.lit("trace-"), F.col("event_id").cast("string"))
               ).alias("trace_id"),
        F.col("user_id").cast("string").alias("primary_key"),
        F.create_map(F.lit("event_type"), F.col("event_type")).alias("metadata"),
        F.col("value"),
        F.col("event_type"),
    )


def parse_stream_envelop(raw: DataFrame, value_col: str = "value",
                         passthrough_cols: tuple[str, ...] = ()) -> tuple[DataFrame, DataFrame]:
    """``String -> StreamEnvelop`` with DLQ split.

    Mirrors ``core/parser/StreamEnvelopParser.java:39-72``: non-JSON /
    unparseable strings go to the DLQ side; parse succeeds -> envelope
    with ``event_time`` defaulted to now and ``processed_time`` stamped.
    Validity = the reference's pre-filter (string must be a ``{...}``
    object, StreamEnvelopParser.java:73-86) AND syntactically valid
    JSON (``try_parse_json`` null on failure — ``from_json`` alone is
    PERMISSIVE and yields all-null structs instead of failing).
    Validity is computed once; the split happens once (SURVEY §7.5#7).
    """
    is_valid = (F.trim(F.col(value_col)).startswith("{")
                & F.try_parse_json(F.col(value_col)).isNotNull())
    parsed = raw.withColumn("_valid", is_valid).withColumn(
        "_env", F.from_json(F.col(value_col), _WIRE_SCHEMA))

    def wire(snake: str, camel: str) -> Column:
        return F.coalesce(F.col(f"_env.{snake}"), F.col(f"_env.{camel}"))

    ok = parsed.filter(F.col("_valid")).select(
        *[F.col(c) for c in passthrough_cols],
        F.col("_env.operation").alias("operation"),
        F.col("_env.source").alias("source"),
        wire("payload_json", "payloadJson").alias("payload_json"),
        F.coalesce(wire("event_time", "eventTime").cast("timestamp"),
                   F.current_timestamp()).alias("event_time"),
        F.current_timestamp().alias("processed_time"),
        wire("trace_id", "traceId").alias("trace_id"),
        wire("primary_key", "primaryKey").alias("primary_key"),
        F.col("_env.metadata").alias("metadata"),
    )
    dlq = parsed.filter(~F.col("_valid")).select(
        F.lit("PARSE_ERROR").alias("error_type"),
        F.lit("unparseable stream envelope").alias("error_message"),
        F.lit("stream-envelop-parser").alias("source"),
        F.current_timestamp().alias("timestamp"),
        F.col(value_col).alias("raw_event"),
        F.lit(None).cast("string").alias("stacktrace"),
    )
    return ok, dlq
