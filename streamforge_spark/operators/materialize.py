"""Latest-per-key materialized views with changelog emission.

Reference: ``pattern/materialization/Materializer.java:53-164`` —
keyed ValueState holding the latest value; first value emits
INSERT(null→v), subsequent values emit UPDATE(before→after) (default
merge = replace), deletePredicate clears state and emits
DELETE(before→null); a value after a delete is a fresh INSERT.
Changelog shape: ``ChangelogEvent{type, key, before, after, ts}``
(ChangelogEvent.java:6-14).

Batch formulation: per-key ordered window with lag() for the
before-image and delete-aware INSERT/UPDATE/DELETE typing. Streaming:
``streamforge_spark.streaming.materialize`` (applyInPandasWithState).

Scale notes: one hash exchange on the key; the window never holds more
than the partition in memory (spills); no collect, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def materializer_latest(df: DataFrame, key_cols: Sequence[str],
                        order_cols: Sequence[str],
                        delete_predicate: Column | None = None) -> DataFrame:
    """The materialized view itself: latest row per key, with deleted
    keys removed (a delete clears state, Materializer.java:147-156)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    latest = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if delete_predicate is not None:
        latest = latest.filter(~delete_predicate)
    return latest


def materializer_changelog(df: DataFrame, key_cols: Sequence[str],
                           order_cols: Sequence[str], value_col: str,
                           time_col: str,
                           delete_predicate: Column | None = None) -> DataFrame:
    """Full changelog: one ChangelogEvent row per input row.

    type: first-for-key (or first after a delete) → INSERT; delete rows
    → DELETE (dropped when there is no live state to delete,
    Materializer.java:147-152); otherwise UPDATE. before = previous
    live value (null after delete / at first), after = value (null on
    delete).
    """
    is_del = delete_predicate if delete_predicate is not None else F.lit(False)
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    # Stage the two lag() columns EXPLICITLY before deriving anything
    # from them.  Folding lags inline into the output expressions made
    # Spark's window extraction (a) evaluate lag(value) three separate
    # times and (b) push the derived key/after/ts projections BELOW the
    # window exchange — shipping the payload twice (raw + derived) and
    # doubling shuffle bytes.  With the lags staged, the exchange
    # carries only key/order/value/time columns plus one boolean.
    withw = (df.withColumn("_is_del", is_del.cast("boolean"))
             .withColumn("_prev_val", F.lag(value_col).over(w))
             .withColumn("_prev_del", F.lag("_is_del").over(w)))
    # 'before' image: null when no previous row or previous row deleted the state.
    before = F.when(F.col("_prev_del") | F.col("_prev_val").isNull(),
                    F.lit(None)).otherwise(F.col("_prev_val"))
    ctype = (
        F.when(F.col("_is_del"), F.lit("DELETE"))
        .when(before.isNull(), F.lit("INSERT"))
        .otherwise(F.lit("UPDATE"))
    )
    out = withw.select(
        ctype.alias("change_type"),
        F.concat_ws("\x01", *key_cols).alias("key"),
        before.cast("string").alias("before"),
        F.when(F.col("_is_del"), F.lit(None)).otherwise(F.col(value_col))
        .cast("string").alias("after"),
        F.col(time_col).alias("ts"),
        *[F.col(c) for c in key_cols],
    )
    # a DELETE with nothing live to delete is a no-op (state was empty)
    return out.filter(~((F.col("change_type") == "DELETE") & F.col("before").isNull()))


def materializer_history(df: DataFrame, key_cols: Sequence[str],
                         order_cols: Sequence[str],
                         time_col: str,
                         delete_predicate: Column | None = None) -> DataFrame:
    """SCD-2 history materialization — the Materializer's state
    timeline as a queryable table: every non-delete row becomes a
    version with ``valid_from``/``valid_to``/``is_current``; a delete
    emits no version but still closes its predecessor (its timestamp
    becomes the predecessor's ``valid_to``).

    Same single hash exchange as the changelog (the ``lead`` window
    shares the changelog's partitioning), so deriving history + latest
    + changelog from one source costs one shuffle total."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    is_del = delete_predicate if delete_predicate is not None else F.lit(False)
    versioned = df.withColumn("valid_to", F.lead(time_col).over(w)) \
                  .withColumn("_is_del", is_del.cast("boolean"))
    return (
        versioned.filter(~F.col("_is_del"))
        .withColumn("valid_from", F.col(time_col))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_is_del")
    )
