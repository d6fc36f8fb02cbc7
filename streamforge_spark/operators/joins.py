"""Join operators.

Reference:
- ``pattern/enrich/StaticJoiner.java:51-170`` — broadcast enrichment
  join: reference data held as latest-value-per-key broadcast state;
  main-stream lookup; miss => pass-through unchanged (left-outer).
- ``pattern/enrich/DynamicJoiner.java:102-326`` — time-bounded
  stream-stream N:M equi-join with INNER/LEFT/RIGHT/FULL_OUTER
  emission at TTL expiry.

Spark-first: StaticJoiner is ``F.broadcast`` over a latest-per-key
reduction of the dimension (auto-broadcast below the threshold, hint
for certainty); DynamicJoiner is an equi-join with a time-range
predicate — in streaming, watermarks bound the state exactly like the
reference's TTL (SURVEY §7.5#1-2 documents the processing-time →
event-time semantic shift).

Scale notes: the broadcast side must stay small (dimension tables) —
that's the contract of the pattern itself. The time-bounded join is an
equi-join on the key with a range residual, so it hash-partitions on
the key (no cross product); skewed keys → AQE skew handling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

JOIN_TYPES = {"inner", "left", "right", "full_outer"}
_SPARK_HOW = {"inner": "inner", "left": "left", "right": "right", "full_outer": "full_outer"}


def latest_per_key(ref: DataFrame, key_cols: Sequence[str],
                   order_cols: Sequence[str]) -> DataFrame:
    """Latest-value-per-key reduction of a changelog-shaped reference
    table (StaticJoiner.java:167-169: updates replace)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        ref.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def static_joiner(main: DataFrame, ref: DataFrame, on, *,
                  ref_key_cols: Sequence[str] | None = None,
                  ref_order_cols: Sequence[str] | None = None,
                  broadcast_ref: bool = True) -> DataFrame:
    """Broadcast enrichment join; miss => row passes through with null
    enrichment columns (left-outer, StaticJoiner.java:134-152).

    If ``ref_key_cols``/``ref_order_cols`` are given the reference side
    is first reduced to latest-per-key (slowly-changing ref idiom). In
    streaming this is a stream-static join: Spark re-reads the static
    side each micro-batch, which IS the broadcast-state refresh.
    """
    if ref_key_cols and ref_order_cols:
        ref = latest_per_key(ref, ref_key_cols, ref_order_cols)
    if broadcast_ref:
        ref = F.broadcast(ref)
    return main.join(ref, on=on, how="left")


def dynamic_joiner(left: DataFrame, right: DataFrame, *,
                   left_key: str, right_key: str,
                   left_time: str, right_time: str,
                   ttl_seconds: int,
                   join_type: str = "inner",
                   left_alias: str = "l", right_alias: str = "r",
                   extra_condition: Column | None = None) -> DataFrame:
    """Time-bounded N:M equi-join: rows match when keys are equal AND
    |left_time - right_time| <= ttl (DynamicJoiner.java:238-292; the
    10-minute TTL of OrderPaymentJoinJob.java:51-53 becomes the range
    predicate).

    join_type in {inner, left, right, full_outer}; outer rows are the
    unmatched-at-expiry emissions (DynamicJoiner.java:294-326) — in
    batch they're just the outer join result; in streaming Spark emits
    them when the watermark passes. Both sides are aliased internally
    (self-join safe); select output columns through the aliases.
    """
    if join_type not in JOIN_TYPES:
        raise ValueError(f"join_type must be one of {JOIN_TYPES}")
    la, ra = left_alias, right_alias
    ttl = F.expr(f"INTERVAL {ttl_seconds} SECONDS")
    cond = (
        (F.col(f"{la}.{left_key}") == F.col(f"{ra}.{right_key}"))
        & (F.col(f"{ra}.{right_time}") >= F.col(f"{la}.{left_time}") - ttl)
        & (F.col(f"{ra}.{right_time}") <= F.col(f"{la}.{left_time}") + ttl)
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    return left.alias(la).join(right.alias(ra), on=cond, how=_SPARK_HOW[join_type])


def asof_join(left: DataFrame, right: DataFrame, *,
              key: str, left_ts: str, right_ts: str,
              right_cols: Sequence[str],
              right_tiebreak: str | None = None,
              prefix: str = "asof_",
              direction: str = "backward",
              tolerance_seconds: int | None = None) -> DataFrame:
    """As-of join (capability surplus — absent in the reference,
    SURVEY §2.7 'absent' row): each left row is enriched with the
    single nearest right row for the same key — the most recent with
    ``right_ts <= left_ts`` (``direction="backward"``, the default)
    or the earliest with ``right_ts >= left_ts``
    (``direction="forward"`` — "what happened next": next maintenance
    after a fault, next purchase after a click); no match => nulls
    (left-outer). Forward is the same one-shuffle union+running-carry
    plan over the reversed sort order, not a second algorithm.

    Scale-first implementation: instead of a range join (which Spark
    plans as an equi-join + per-key sort or, worse, a broadcast
    nested loop), both sides are tagged and UNIONed, then a single
    running ``last(ignorenulls)`` window per key carries the latest
    right payload forward onto each left row — ONE hash shuffle on
    the key, O(n log n) per partition, no intermediate N:M blow-up.
    At 100 TB this is the difference between a sort within each key
    partition and a cross-product retry.

    ``tolerance_seconds`` bounds staleness (feature-store semantics:
    "don't serve a feature older than X"): a carried match farther than
    the tolerance from left_ts nulls out instead of enriching — the
    row still emits (left-outer), it just refuses the stale payload.
    Requires timestamp-typed ts columns; same one-shuffle plan (the
    matched right's timestamp rides along in the carry struct).

    Ties: a right row at exactly left_ts matches in both directions
    (>= / <= semantics, same as DuckDB ASOF). Equal right timestamps
    within a key are broken by ``right_tiebreak`` (backward: the last
    one ascending wins; forward: the first one ascending wins) — pass
    a unique column for determinism.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    r_payload = F.struct(*[F.col(c) for c in right_cols])
    r_type = right.select(r_payload.alias("_r")).schema["_r"].dataType
    l_payload = F.struct(*[F.col(c) for c in left.columns])
    l_type = left.select(l_payload.alias("_l")).schema["_l"].dataType

    lp = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"), l_payload.alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
        F.lit(None).cast("string").alias("_tb"),
        F.lit(None).cast(left.schema[left_ts].dataType).alias("_rts"))
    rp = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"), F.lit(None).cast(l_type).alias("_l"),
        r_payload.alias("_r"),
        (F.col(right_tiebreak).cast("string") if right_tiebreak
         else F.lit(None).cast("string")).alias("_tb"),
        F.col(right_ts).alias("_rts"))

    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_is_left").asc(),
                 F.col("_tb").asc_nulls_first()]
    else:
        # reversed time: the "last right seen so far" in this order is
        # the earliest right_ts >= left_ts; _tb desc makes the
        # ascending-first right win among equal timestamps
        order = [F.col("_ts").desc(), F.col("_is_left").asc(),
                 F.col("_tb").desc_nulls_first()]
    w = (Window.partitionBy("_k")
         .orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (
        lp.unionByName(rp)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .withColumn("_mts", F.last("_rts", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    if tolerance_seconds is not None:
        gap = (F.unix_micros("_ts") - F.unix_micros("_mts")
               if direction == "backward"
               else F.unix_micros("_mts") - F.unix_micros("_ts"))
        fresh = gap <= F.lit(tolerance_seconds).cast("long") * 1_000_000
        matched = matched.withColumn(
            "_m", F.when(fresh, F.col("_m")))
    # emit the key from the window's own partitioning attribute (_k),
    # not the struct field: downstream groupBy/join on the key then
    # reuses this exchange instead of adding one
    out_cols = [F.col("_k").alias(c) if c == key else F.col(f"_l.{c}").alias(c)
                for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols]
    return matched.select(*out_cols)


def interval_join(left: DataFrame, right: DataFrame, *,
                  ts_col: str, start_col: str, end_col: str,
                  bucket_seconds: int) -> DataFrame:
    """Range join (point-in-interval, no equi key) as a bucketized
    equi-join — the missing Spark primitive (SURVEY §2.7 'absent' row).

    A literal ``l.ts BETWEEN r.start AND r.end`` join has no equi
    condition, so Spark plans BroadcastNestedLoopJoin (O(n*m) — fatal
    at 100 TB). Instead: explode each interval into the epoch buckets
    it covers (``sequence``), bucket each point, equi-join on the
    bucket id, then apply the exact ``start <= ts < end`` residual.
    One hash exchange on the bucket id; cost scales with
    points x avg-overlapping-intervals, not points x intervals.
    ``bucket_seconds`` ~ median interval length keeps the per-interval
    explode factor ~2 rows.

    Output: matched pairs only (inner); bounds are [start, end)."""
    bs = int(bucket_seconds)
    r = right.withColumn(
        "_b", F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col(start_col)) / bs).cast("long"),
            F.floor(F.unix_timestamp(F.col(end_col)) / bs).cast("long"))))
    l = left.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts_col)) / bs).cast("long"))
    return (
        l.join(r, "_b")
        .filter((F.col(ts_col) >= F.col(start_col))
                & (F.col(ts_col) < F.col(end_col)))
        .drop("_b")
    )


def interval_overlap_join(left: DataFrame, right: DataFrame, *,
                          left_start: str, left_end: str,
                          right_start: str, right_end: str,
                          bucket_seconds: int) -> DataFrame:
    """Interval × interval OVERLAP join as a bucketized equi-join —
    the two-sided generalization of :func:`interval_join` (which joins
    points to intervals). Overlap is closed-closed:
    ``l_start <= r_end AND r_start <= l_end`` (touching endpoints
    match; filter ``overlap > 0`` downstream for strict overlap).

    Both sides explode into the epoch buckets they cover; pairs
    sharing a bucket equi-join; the exact overlap predicate prunes
    false bucket neighbors; and because a pair can share up to
    ``overlap/bucket_seconds`` buckets, duplicates collapse with one
    dropDuplicates over the output columns — callers must therefore
    pass rows that are distinct as tuples (project stable keys first).

    One hash exchange per side on the bucket id; cost scales with
    Σ per-bucket |L_b|·|R_b| — pick ``bucket_seconds`` near the median
    interval length so each interval explodes into ~2 cells and only
    temporally-near pairs ever meet. The literal predicate form plans
    BroadcastNestedLoopJoin (O(n·m)); this shape is what survives
    100 TB."""
    bs = int(bucket_seconds)

    def cells(s, e):
        return F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col(s)) / bs).cast("long"),
            F.floor(F.unix_timestamp(F.col(e)) / bs).cast("long")))

    l = left.withColumn("_b", cells(left_start, left_end))
    r = right.withColumn("_b", cells(right_start, right_end))
    return (l.join(r, "_b")
            .filter((F.col(left_start) <= F.col(right_end))
                    & (F.col(right_start) <= F.col(left_end)))
            .drop("_b")
            .dropDuplicates())
