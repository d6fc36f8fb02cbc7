"""Deduplication & no-op-update suppression.

Reference:
- ``pattern/dedup/Deduplicator.java:29-70`` — keyed first-seen-wins
  dedup with state TTL;
- ``pattern/merge/StatefulMerger.java:50-120`` — suppresses updates
  whose payload hash (minus excluded fields) equals the previous hash
  for the key.

Batch formulations below are window-function based (one hash exchange
on the key — the same shuffle the reference's ``keyBy`` implies).
Streaming variants: ``streamforge_spark.streaming.dedup``
(dropDuplicatesWithinWatermark / applyInPandasWithState).

Scale notes: the window partitions by the dedup key, so skew follows
key skew — AQE skew-join handles joins, but for pathological hot keys
pre-salt with a bucket column. ``xxhash64`` keeps change-detection
O(1)/row and columnar (StatefulMerger.java:110-120 does the same with
Java hashing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deduplicator(df: DataFrame, key_cols: Sequence[str],
                 order_cols: Sequence[str]) -> DataFrame:
    """First-seen-wins per key.

    ``key_cols`` is the dedup identity (the CDC job uses
    ``primary_key + ':' + event_time``, MongoToKafkaJob.java:67-69);
    ``order_cols`` defines arrival order (deterministic tiebreak).
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stateful_merger(df: DataFrame, key_cols: Sequence[str],
                    payload_col: str, order_cols: Sequence[str],
                    excluded_fields: Sequence[str] = ()) -> DataFrame:
    """Emit only rows whose payload content changed vs the previous
    row of the same key (no-op-update suppression).

    The content fingerprint is ``xxhash64`` over the payload with
    ``excluded_fields`` (e.g. updatedAt/modifiedAt) stripped — the
    columnar analog of StatefulMerger's sorted-TreeMap hash.
    """
    payload = F.col(payload_col)
    if excluded_fields:
        # payload is a JSON string; strip excluded keys via from_json →
        # map minus keys → canonical sorted re-serialization.
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

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_fp", fingerprint)
        .withColumn("_prev_fp", F.lag("_fp").over(w))
        .filter(F.col("_prev_fp").isNull() | (F.col("_fp") != F.col("_prev_fp")))
        .drop("_fp", "_prev_fp")
    )


def table_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
               compare_cols: list[str]) -> DataFrame:
    """Row-level diff between two versions of a table: one row per
    changed key, classified INSERT / UPDATE / DELETE, carrying the
    compared columns from whichever side(s) exist — the reconciliation
    primitive behind CDC backfills, replication audits, and "what did
    this rebuild change?" reviews (the batch analog of the
    Materializer's changelog, pattern/materialization/Materializer).

    Shape: ONE full-outer join on the key (both sides shuffle once —
    or zero times if both are bucketed on the key), change detection
    via null-safe column comparison.  Unchanged rows drop out, so
    output is proportional to the drift, not the table.
    """
    from pyspark.sql import functions as F
    o = old.select(*key_cols, *[F.col(c).alias(f"_old_{c}")
                                for c in compare_cols])
    n = new.select(*key_cols, *[F.col(c).alias(f"_new_{c}")
                                for c in compare_cols])
    o = o.withColumn("_in_old", F.lit(True))
    n = n.withColumn("_in_new", F.lit(True))
    j = o.join(n, key_cols, "full")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
    kind = (F.when(F.col("_in_old").isNull(), "INSERT")
            .when(F.col("_in_new").isNull(), "DELETE")
            .when(changed, "UPDATE"))
    return (j.withColumn("change_type", kind)
            .where(F.col("change_type").isNotNull())
            .select("change_type", *key_cols,
                    *[F.col(f"_old_{c}").alias(f"old_{c}")
                      for c in compare_cols],
                    *[F.col(f"_new_{c}").alias(f"new_{c}")
                      for c in compare_cols]))
