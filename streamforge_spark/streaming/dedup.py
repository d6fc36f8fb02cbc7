"""Streaming dedup & no-op-update suppression.

Reference TTL state (Deduplicator.java:53-55 10m; StatefulMerger.java:
88-90 24h) maps to watermark-scoped streaming state:
``dropDuplicatesWithinWatermark`` keeps a key's dedup state only while
it is within the watermark — the event-time formulation of the
reference's processing-time TTL (SURVEY §7.5#1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(df: DataFrame, key_cols: Sequence[str],
                    event_time_col: str, ttl: str = "10 minutes",
                    assign_watermark: bool = True) -> DataFrame:
    """First-seen-wins dedup within the watermark horizon.

    assign_watermark=False when the stream already carries a watermark
    (Spark forbids redefining one across chained stateful operators —
    assign once at ingest, like the reference assigns per-source
    watermarks at fan-in)."""
    if assign_watermark:
        df = df.withWatermark(event_time_col, ttl)
    return df.dropDuplicatesWithinWatermark(list(key_cols))


def streaming_merger(df: DataFrame, key_cols: Sequence[str],
                     payload_col: str, event_time_col: str,
                     ttl: str = "24 hours",
                     excluded_fields: Sequence[str] = (),
                     assign_watermark: bool = True) -> DataFrame:
    """Suppress updates whose content fingerprint repeats for the key
    within the TTL window. Approximates last-hash-per-key compare with
    (key, fingerprint) dedup — identical output whenever a payload
    doesn't revert to a previously-seen value within the window; exact
    last-value semantics would use transformWithStateInPandas/
    applyInPandasWithState (see streaming.materialize for the
    pattern)."""
    payload = F.col(payload_col)
    if excluded_fields:
        stripped = F.map_filter(
            F.from_json(payload, "map<string,string>"),
            lambda k, _: ~k.isin(*excluded_fields),
        )
        entries = F.array_sort(F.transform(
            F.map_entries(stripped),
            lambda e: F.concat_ws("\x01", e.key, e.value),
        ))
        fingerprint = F.xxhash64(F.concat_ws("\x02", entries))
    else:
        fingerprint = F.xxhash64(payload)
    df = df.withColumn("_fp", fingerprint)
    if assign_watermark:
        df = df.withWatermark(event_time_col, ttl)
    return df.dropDuplicatesWithinWatermark([*key_cols, "_fp"]).drop("_fp")
