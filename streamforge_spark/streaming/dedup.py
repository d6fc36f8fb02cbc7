"""Streaming dedup & no-op-update suppression.

Reference TTL state (Deduplicator.java:53-55 10m; StatefulMerger.java:
88-90 24h) maps to watermark-scoped streaming state:
``dropDuplicatesWithinWatermark`` keeps a key's dedup state only while
it is within the watermark — the event-time formulation of the
reference's processing-time TTL (SURVEY §7.5#1).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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
    df = df.withColumn(
        "_fp", content_fingerprint(F.col(payload_col), excluded_fields))
    if assign_watermark:
        df = df.withWatermark(event_time_col, ttl)
    return df.dropDuplicatesWithinWatermark([*key_cols, "_fp"]).drop("_fp")


def content_fingerprint(payload: Column,
                        excluded_fields: Sequence[str] = ()) -> Column:
    """64-bit content hash of a JSON payload minus excluded fields,
    order-normalized — the O(1)-per-event change detector
    (StatefulMerger.java:110-120's sorted-TreeMap hash as a codegen
    column expression)."""
    if excluded_fields:
        stripped = F.map_filter(
            F.from_json(payload, "map<string,string>"),
            lambda k, _: ~k.isin(*excluded_fields),
        )
        entries = F.array_sort(F.transform(
            F.map_entries(stripped),
            lambda e: F.concat_ws("\x01", e.key, e.value),
        ))
        return F.xxhash64(F.concat_ws("\x02", entries))
    return F.xxhash64(payload)


_MERGER_STATE = T.StructType([T.StructField("last_fp", T.LongType())])


def streaming_merger_exact(df: DataFrame, key_col: str, payload_col: str,
                           time_col: str,
                           excluded_fields: Sequence[str] = (),
                           ttl_ms: int | None = None) -> DataFrame:
    """Exact last-hash-per-key suppression (StatefulMerger.java:94-120
    semantics): an update passes iff its content hash differs from the
    key's CURRENT hash — so a payload that reverts to an earlier value
    re-emits, which the (key, fingerprint) watermark-dedup
    approximation in ``streaming_merger`` would wrongly suppress.

    Keyed GroupState holds one int64 per key (the same O(1) state bound
    as the reference's ValueState<Long>); ttl_ms maps its 24h
    StateTtlConfig onto a ProcessingTimeTimeout. Output = the passing
    rows as (key, payload, ts)."""
    out_schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in out_schema])
            return
        (last,) = state.get if state.exists else (None,)
        out: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(by=[time_col])
            for row in pdf.itertuples(index=False):
                fp = getattr(row, "cfp0")
                if last is None or fp != last:
                    out.append(dict(key=key[0],
                                    payload=getattr(row, payload_col),
                                    ts=getattr(row, time_col)))
                    last = fp
        if last is not None:
            state.update((int(last),))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=[f.name for f in out_schema])

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
               else GroupStateTimeout.NoTimeout)
    prepared = df.withColumn(
        "cfp0", content_fingerprint(F.col(payload_col), excluded_fields))
    return prepared.groupBy(key_col).applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=_MERGER_STATE,
        outputMode="append", timeoutConf=timeout)


def streaming_merger_tws(df: DataFrame, key_col: str, payload_col: str,
                         time_col: str,
                         excluded_fields: Sequence[str] = (),
                         ttl_ms: int | None = None) -> DataFrame:
    """``streaming_merger_exact`` on the transformWithState API (Spark
    4 arbitrary-state v2): the key's last content hash lives in a
    ValueState<Long> with NATIVE per-state TTL — the closest Spark
    construct to the reference's ``StateTtlConfig`` on a Flink
    ValueState (StatefulMerger.java:88-120), with no hand-rolled
    timeout handling.

    Same contract as streaming_merger_exact (an update passes iff its
    hash differs from the key's current hash; reverts re-emit), same
    O(8 bytes)/key state bound. Requires the RocksDB state store
    provider (spark.sql.streaming.stateStore.providerClass) — which is
    also the provider you want at 100 TB: state lives off-heap and
    spills to disk, so key cardinality is bounded by storage, not
    executor heap. (The TWS Python state protocol additionally needs
    the protobuf package — absent in minimal containers, where the
    applyInPandasWithState twin ``streaming_merger_exact`` is the
    executable fallback; the contract test covers both and skips this
    one when protobuf is missing.)"""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    out_cols = ["key", "payload", "ts"]
    out_schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])

    class LastHashMerger(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState(
                "last_fp", "last_fp bigint", ttlDurationMs=ttl_ms)

        def handleInputRows(self, key, rows, timer_values):
            cur = self._last.get()
            last = cur[0] if cur is not None else None
            out: list[dict] = []
            for pdf in rows:
                pdf = pdf.sort_values(by=[time_col])
                for row in pdf.itertuples(index=False):
                    fp = getattr(row, "cfp0")
                    if last is None or fp != last:
                        out.append(dict(key=key[0],
                                        payload=getattr(row, payload_col),
                                        ts=getattr(row, time_col)))
                        last = fp
            if last is not None:
                self._last.update((int(last),))
            yield pd.DataFrame(out, columns=out_cols)

        def close(self) -> None:
            pass

    prepared = df.withColumn(
        "cfp0", content_fingerprint(F.col(payload_col), excluded_fields))
    return prepared.groupBy(key_col).transformWithStateInPandas(
        LastHashMerger(), outputStructType=out_schema,
        outputMode="append",
        timeMode="none" if ttl_ms is None else "processingTime")


def streaming_bloom_dedup(stream: DataFrame, *, key_col: str = "key",
                          m_bits: int = 1 << 16,
                          n_buckets: int = 8) -> DataFrame:
    """Forever-dedup with BOUNDED state: a keyed bloom filter replaces
    the exact seen-set.  `streaming_dedup` (dropDuplicatesWithin-
    Watermark) is exact but FORGETS once the watermark passes — a
    duplicate arriving a week later sails through.  This operator
    never forgets and never grows: state per bucket is a fixed
    ``m_bits``-bit array, whatever the cardinality.

    The trade is exactness: false POSITIVES (a genuinely-new record
    suppressed) occur at the classic bloom rate (~(1-e^{-2n/m})² for
    2 hashes after n keys) — acceptable for dedup, where dropping a
    rare fresh record costs a row, while missing duplicates costs
    correctness downstream.  False negatives cannot happen: the first
    occurrence ALWAYS emits.

    Keys shard over ``n_buckets`` state groups (md5-derived, so
    placement is deterministic and replayable); scale the bucket
    count, not the per-bucket bitset, as cardinality grows.
    """
    import hashlib

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([T.StructField("key", T.StringType())])
    state_schema = T.StructType([
        T.StructField("words", T.ArrayType(T.LongType()))])
    n_words = m_bits // 64

    def positions(key: str):
        h = hashlib.md5(key.encode()).digest()
        return (int.from_bytes(h[:8], "big") % m_bits,
                int.from_bytes(h[8:16], "big") % m_bits)

    def fn(bucket: tuple, pdfs, state: GroupState):
        import pandas as pd
        words = list(state.get[0]) if state.exists else [0] * n_words
        fresh = []
        for pdf in pdfs:
            for k in pdf["key"].sort_values():
                p1, p2 = positions(str(k))
                seen = ((words[p1 // 64] >> (p1 % 64)) & 1) \
                    and ((words[p2 // 64] >> (p2 % 64)) & 1)
                if not seen:
                    fresh.append(str(k))
                    for p in (p1, p2):
                        # keep the word in signed-64 range for the
                        # LongType state column
                        w = words[p // 64] | (1 << (p % 64))
                        words[p // 64] = w - (1 << 64) if w >= (1 << 63) else w
        state.update((words,))
        yield pd.DataFrame({"key": fresh})

    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("bkt:"),
                                          F.col(key_col).cast("string"))),
                           1, 15), 16, 10).cast("long"),
        F.lit(n_buckets))
    prepared = stream.select(F.col(key_col).cast("string").alias("key"),
                             bucket.alias("bucket"))
    return prepared.groupBy("bucket").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout)
