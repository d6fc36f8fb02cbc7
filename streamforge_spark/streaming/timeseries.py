"""Streaming time-series resampling.

The batch OHLC query (queries/timeseries.py::ohlc_daily) uses only
algebraic aggregates (min_by/max_by under a unique order key), so the
IDENTICAL agg spec runs under a streaming watermark — bars for a day
finalize once the watermark passes the day boundary, late events
within the watermark update their bar in place (update mode), and
state per key is one partial OHLC tuple, not the events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streamforge_spark.queries.timeseries import ohlc_aggs


def streaming_ohlc(events: DataFrame, *, watermark: str = "1 day",
                   window: str = "1 day") -> DataFrame:
    """Watermarked per-user OHLC bars over event-time windows.

    At 100 TB/day rates the state store holds exactly one 6-field
    tuple per open (user, window) — the watermark bounds the number of
    open windows, and map-side partial aggregation compacts each
    micro-batch before the keyed state update."""
    cents = F.round(F.col("value") * 100).cast("long")
    src = (events.withWatermark("ts", watermark)
           .select("user_id", F.window("ts", window).alias("w"),
                   cents.alias("cents"), "ts", "event_id"))
    return (src.groupBy("user_id", "w")
            .agg(*ohlc_aggs())
            .select("user_id", F.col("w.start").alias("day"),
                    "open_cents", "high_cents", "low_cents", "close_cents",
                    "n_trades", "volume_cents"))


def streaming_topk(events: DataFrame, *, group_col: str = "event_type",
                   k: int = 3) -> DataFrame:
    """Streaming per-group top-k: keyed GroupState holds the current
    k best (cents DESC, event_id ASC) rows per group; each micro-batch
    merges its candidates into the state and re-emits the group's
    refreshed top-k (update semantics — downstream keeps latest per
    (group, rank)).

    The 100 TB property: state per group is EXACTLY k tuples — input
    volume only affects per-batch merge cost, and the map-side cut
    (each batch contributes at most its own local top-k) bounds what
    reaches the state update. The batch analog (topk_per_group) is the
    correctness spec; test_streaming_topk_matches_batch pins
    streaming == batch on the same data.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("rank", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("cents", T.ArrayType(T.LongType())),
    ])

    def fn(key: tuple, pdfs, state: GroupState):
        import pandas as pd
        if state.exists:
            ids, cents = state.get
            best = list(zip(list(cents), [-i for i in ids]))
        else:
            best = []
        for pdf in pdfs:
            for eid, c in zip(pdf["event_id"], pdf["cents"]):
                best.append((int(c), -int(eid)))
        # (cents DESC, event_id ASC) == sort by (-cents, event_id):
        # encode as (cents, -event_id) and take the k LARGEST
        best.sort(reverse=True)
        best = best[:k]
        state.update(([-neg for _, neg in best], [c for c, _ in best]))
        yield pd.DataFrame({
            "event_type": [key[0]] * len(best),
            "event_id": [-neg for _, neg in best],
            "cents": [c for c, _ in best],
            "rank": list(range(1, len(best) + 1)),
        })

    cents = F.round(F.col("value") * 100).cast("long")
    prepared = events.select(F.col(group_col).alias("event_type"),
                             "event_id", cents.alias("cents"))
    return prepared.groupBy("event_type").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)


EWMA_NUM, EWMA_DEN = 1, 8       # alpha = 1/8 in exact integer arithmetic
EWMA_ANOMALY_MICRO = 40_000_000  # |x - ewma| above this (micro-units) flags


def ewma_recursion(xs: list[int], ewma: int | None,
                   num: int = EWMA_NUM, den: int = EWMA_DEN):
    """The sequential spec shared by the streaming operator and the
    batch test oracle: floor-division integer EWMA, anomaly when the
    pre-update deviation exceeds the threshold (never on the first
    observation). Returns (rows, final_ewma) with rows =
    [(x, ewma_after, is_anomaly)]."""
    rows = []
    for x in xs:
        if ewma is None:
            rows.append((x, x, False))
            ewma = x
        else:
            anomaly = abs(x - ewma) > EWMA_ANOMALY_MICRO
            ewma = ewma + (x - ewma) * num // den
            rows.append((x, ewma, anomaly))
    return rows, ewma


def streaming_ewma(events: DataFrame, *, key_col: str = "user_id") -> DataFrame:
    """Exact recursive per-key EWMA smoothing + deviation alerting as
    keyed streaming state — the IIR filter the batch `ewma_values`
    query approximates with a finite tap window, here computed exactly
    because streaming sees values in order. Integer micro-units and
    floor division make every step deterministic.

    State per key is ONE integer (the running EWMA) — input volume
    never grows it. Within a micro-batch, rows process in (ts,
    event_id) order; cross-batch order is the source's replay order,
    which checkpointed file/Kafka sources preserve per key.

    Emits one row per event (append semantics): the post-update ewma
    and whether the PRE-update deviation crossed the anomaly
    threshold (never alerts on a key's first observation).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("x_micro", T.LongType()),
        T.StructField("ewma_micro", T.LongType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ])
    state_schema = T.StructType([T.StructField("ewma", T.LongType())])

    def fn(key: tuple, pdfs, state: GroupState):
        import pandas as pd
        ewma = state.get[0] if state.exists else None
        ids, xs = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            ids.extend(int(e) for e in pdf["event_id"])
            xs.extend(int(x) for x in pdf["x_micro"])
        rows, ewma = ewma_recursion(xs, ewma)
        state.update((int(ewma),))
        yield pd.DataFrame({
            "user_id": [key[0]] * len(rows),
            "event_id": ids,
            "x_micro": [r[0] for r in rows],
            "ewma_micro": [r[1] for r in rows],
            "is_anomaly": [r[2] for r in rows],
        })

    prepared = events.select(
        F.col(key_col).alias("user_id"), "event_id", "ts",
        (F.round(F.col("value") * 100).cast("long") * 10000).alias("x_micro"))
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout)


def streaming_debounce(events: DataFrame, *, key_col: str = "user_id",
                       quiet_ms: int = 30 * 60 * 1000,
                       watermark: str = "10 minutes") -> DataFrame:
    """Trailing-edge debounce: per key, hold the LATEST event and emit
    it only once no newer event arrives for ``quiet_ms`` of EVENT time
    — the settle-then-act primitive (ship the final state of a burst of
    edits; alert once a flapping signal stabilizes). The leading-edge
    complement of flow_disruption_detector's silence alarm.

    State per key is one held row + one timer. Each arrival replaces
    the held row (latest by (ts, event_id)) and re-arms an event-time
    timeout at held_ts + quiet_ms; the timeout fires when the WATERMARK
    passes that point, so emission is deterministic in event time —
    independent of micro-batch boundaries and replay speed (the same
    late-data contract as windowed aggregation, and why this needs no
    wall clock).

    Emits (user_id, event_id, ts, value_cents) append rows.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value_cents", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_micro", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ])

    def fn(key: tuple, pdfs, state: GroupState):
        import pandas as pd
        cols = [f.name for f in out_schema]
        if state.hasTimedOut:
            eid, ts_micro, cents = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": key[0], "event_id": eid,
                "ts": pd.Timestamp(ts_micro, unit="us"),
                "value_cents": cents}], columns=cols)
            return
        held = state.get if state.exists else None
        for pdf in pdfs:
            for eid, ts, v in zip(pdf["event_id"], pdf["ts"], pdf["value_cents"]):
                cand = (int(ts.value // 1000), int(eid), int(v))
                cur = (held[1], held[0], held[2]) if held else None
                if cur is None or cand[:2] > cur[:2]:
                    held = (cand[1], cand[0], cand[2])
        if held is not None:
            state.update(held)
            # fire once the watermark passes held_ts + quiet
            state.setTimeoutTimestamp(held[1] // 1000 + quiet_ms)
        yield pd.DataFrame([], columns=cols)

    cents = F.round(F.col("value") * 100).cast("long")
    prepared = (events
                .withWatermark("ts", watermark)
                .select(F.col(key_col).alias("user_id"), "event_id", "ts",
                        cents.alias("value_cents")))
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.EventTimeTimeout)


def holt_recursion(ys: list[int], level: int | None, trend: int):
    """The sequential Holt(alpha=beta=1/2) spec shared by the streaming
    operator and the batch recursive-CTE query (queries/timeseries.py::
    holt_forecast): TRUNCATING integer halving (matches SQL ``div`` /
    DuckDB ``//``), first observation initializes (level=y, trend=0).
    Returns (rows, level, trend) with rows = [(y, l, b, l+b)]."""
    def tdiv2(a: int) -> int:
        q = abs(a) // 2
        return q if a >= 0 else -q
    rows = []
    for y in ys:
        if level is None:
            level, trend = y, 0
        else:
            ln = tdiv2(y + level + trend)
            trend = tdiv2(ln - level + trend)
            level = ln
        rows.append((y, level, trend, level + trend))
    return rows, level, trend


def streaming_holt(points: DataFrame) -> DataFrame:
    """Streaming Holt linear-trend smoothing: per-key (level, trend)
    keyed state updated by the EXACT integer recursion the batch
    ``holt_forecast`` recursive CTE runs — streaming and batch are the
    same function of the series, so a restarted/backfilled stream
    converges to the batch answer bit-for-bit
    (test_streaming_holt_matches_batch).

    Input rows are pre-aggregated series points
    (c_custkey, month timestamp, rev_cents) — at 100 TB the upstream
    micro-batch does the map-side monthly rollup and this operator
    holds TWO integers per key regardless of volume. Within a
    micro-batch points process in month order; cross-batch order is
    the source's replay order (checkpointed file/Kafka sources
    preserve it per key)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("month", T.TimestampType()),
        T.StructField("rev_cents", T.LongType()),
        T.StructField("level_cents", T.LongType()),
        T.StructField("trend_cents", T.LongType()),
        T.StructField("forecast_cents", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("level", T.LongType()),
        T.StructField("trend", T.LongType()),
    ])

    def fn(key: tuple, pdfs, state: GroupState):
        import pandas as pd
        level, trend = state.get if state.exists else (None, 0)
        months, ys = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values("month")
            months.extend(pdf["month"])
            ys.extend(int(y) for y in pdf["rev_cents"])
        rows, level, trend = holt_recursion(ys, level, trend)
        state.update((int(level), int(trend)))
        yield pd.DataFrame({
            "c_custkey": [key[0]] * len(rows),
            "month": months,
            "rev_cents": [r[0] for r in rows],
            "level_cents": [r[1] for r in rows],
            "trend_cents": [r[2] for r in rows],
            "forecast_cents": [r[3] for r in rows],
        })

    return points.groupBy("c_custkey").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout)


def streaming_value_histogram(events: DataFrame, *,
                              watermark: str = "2 days",
                              window: str = "1 day",
                              bucket_cents: int = 5000) -> DataFrame:
    """Watermarked per-(event_type, window) value histogram — the
    streaming half of the distribution-drift monitor.

    One windowed count per (type, window, bucket): algebraic, so
    map-side partials compact each micro-batch before the state
    update; state is one counter per open (type, window, bucket) —
    bucket count is bounded by the value range, windows by the
    watermark.  Late events inside the watermark update their bucket
    in place (update mode).  The drift statistic itself is plain
    column algebra over this stream's output (`drift_vs_baseline`) —
    keeping the stateful stage to ONE aggregation, which is what
    Structured Streaming supports without append-mode chaining.
    """
    cents = F.round(F.col("value") * 100).cast("long")
    return (events.withWatermark("ts", watermark)
            .groupBy("event_type",
                     F.window("ts", window).alias("w"),
                     F.floor(cents / F.lit(bucket_cents)).cast("long")
                     .alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select("event_type", F.col("w.start").alias("day"), "bucket", "n"))


def drift_vs_baseline(hist: DataFrame, baseline: DataFrame) -> DataFrame:
    """Total-variation drift (x2, ppm) of each (event_type, day)
    histogram against a static baseline distribution
    ``(event_type, bucket, share_ppm)`` — same transcendental-free
    integer statistic as the batch `value_drift_report`.

    Batch column algebra (run it on the drained histogram table or
    inside foreachBatch): per-window totals are a tiny rollup; the
    baseline is KB-scale and broadcast; buckets absent on either side
    of a given (type, day) contribute their full share via the
    explicit (type, day) x bucket grid.

    Absence semantics: the distance is summed over the FULL grid of
    observed (event_type, day) windows crossed with the union of
    observed-and-baseline buckets per type.  A join keyed only on
    (event_type, bucket) would be wrong: a baseline bucket that
    matched SOME day of a type would never produce a null-day row, so
    days where that bucket has zero observations would silently lose
    their |0 - base_ppm| term — suppressing exactly the
    bucket-vanished-today signal the monitor exists to raise.
    """
    from pyspark.sql import Window
    # the histogram is rollup-sized (types x windows x buckets);
    # materialize once so the three consumers below (shares, observed
    # windows, the bucket union) never replay the upstream source, and
    # self-join lineage stays unambiguous even over sink views
    hist = (hist.select("event_type", "day", "bucket", "n")
            .localCheckpoint(eager=False))
    t = F.sum("n").over(Window.partitionBy("event_type", "day"))
    sh = hist.select("event_type", "day", "bucket",
                     F.round(F.col("n").cast("double") / t.cast("double")
                             * 1000000).cast("long").alias("share_ppm"))
    base = F.broadcast(
        baseline.withColumnRenamed("share_ppm", "base_ppm"))
    days = hist.select("event_type", "day").distinct()
    buckets = (hist.select("event_type", "bucket")
               .unionByName(baseline.select("event_type", "bucket"))
               .distinct())
    grid = days.join(buckets, "event_type")
    return (grid.join(sh, ["event_type", "day", "bucket"], "left")
            .join(base, ["event_type", "bucket"], "left")
            .groupBy("event_type", "day")
            .agg(F.sum(F.abs(F.coalesce("share_ppm", F.lit(0))
                             - F.coalesce("base_ppm", F.lit(0))))
                 .alias("tv2_ppm")))


def streaming_daily_distinct(events: DataFrame, *,
                             watermark: str = "2 days",
                             window: str = "1 day") -> DataFrame:
    """Watermarked daily distinct-user estimates via HLL sketches —
    the streaming twin of `queries/sketches.py::hll_daily_distinct`.

    Why sketches and not dropDuplicates+count: exact distinct state
    grows with cardinality; the HLL register array is FIXED-SIZE per
    open window, and register merges are max-operations — commutative
    and order-insensitive — so incremental arrival produces the SAME
    estimate as one batch pass (pinned by the streaming==batch test,
    exact equality, no tolerance).  Map-side partials compact each
    micro-batch to one sketch per (window, partition) before the
    state update.
    """
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"))
            .agg(F.hll_sketch_agg("user_id").alias("sk"))
            .select(F.col("w.start").alias("day"),
                    F.hll_sketch_estimate("sk").alias("est_users")))


def streaming_cents_histogram(events: DataFrame) -> DataFrame:
    """Global per-(type, cents) frequency stream — the stateful half
    of EXACT online percentiles.  State is one counter per distinct
    (type, cents) pair: bounded by the value DOMAIN (like the bloom
    dedup's bitset, not by throughput), which is what makes exact
    order statistics feasible as a stream.  Drain the update-mode
    output (latest count per key) and hand it to
    `functions/percentiles.py::percentiles_from_frequencies` — the
    SAME selection the batch `exact_percentiles_by_type` oracle
    verifies, so the online readout provably equals the batch one.
    """
    cents = F.round(F.col("value") * 100).cast("long")
    return (events
            .groupBy("event_type", cents.alias("c"))
            .agg(F.count(F.lit(1)).alias("k")))
