"""Structured Streaming operator tests: file-stream micro-batches
driven to completion with processAllAvailable, asserted against the
batch formulations (SURVEY §5 'streaming semantics tested against
batch oracles')."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streamforge_spark.streaming.dedup import streaming_dedup, streaming_merger
from streamforge_spark.streaming.materialize import streaming_materializer
from streamforge_spark.streaming.sinks import foreach_batch_upsert, kafka_compacted_output
from streamforge_spark.streaming.sources import file_stream


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("key", T.StringType()),
    T.StructField("t", T.TimestampType()),
    T.StructField("op", T.StringType()),
    T.StructField("payload", T.StringType()),
])


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="sf_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_to_memory(df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    return q


def test_streaming_dedup_within_watermark(spark, workdir):
    src = f"{workdir}/in"
    _write_batch(spark, src, [
        (1, "k1", ts("2024-01-01 10:00:00"), "insert", "a"),
        (2, "k1", ts("2024-01-01 10:00:00"), "insert", "b"),   # dup key+time
        (3, "k1", ts("2024-01-01 10:05:00"), "update", "c"),
    ])
    stream = file_stream(spark, src, EVENTS_SCHEMA)
    deduped = streaming_dedup(stream, ["key", "t"], "t", ttl="10 minutes")
    _run_to_memory(deduped, "dedup_out")
    got = sorted(r.event_id for r in spark.sql("select * from dedup_out").collect())
    assert got[0] in (1, 2) and len(got) == 2


def test_streaming_merger_suppress(spark, workdir):
    src = f"{workdir}/in"
    _write_batch(spark, src, [
        (1, "k", ts("2024-01-01 10:00:00"), "u", '{"a": 1}'),
        (2, "k", ts("2024-01-01 10:01:00"), "u", '{"a": 1}'),   # no-op
        (3, "k", ts("2024-01-01 10:02:00"), "u", '{"a": 2}'),
    ])
    stream = file_stream(spark, src, EVENTS_SCHEMA)
    merged = streaming_merger(stream, ["key"], "payload", "t", ttl="1 hour")
    _run_to_memory(merged, "merge_out")
    got = sorted(r.payload for r in spark.sql("select * from merge_out").collect())
    assert got == ['{"a": 1}', '{"a": 2}']


def test_streaming_materializer_changelog(spark, workdir):
    src = f"{workdir}/in"
    _write_batch(spark, src, [
        (1, "k", ts("2024-01-01 10:00:00"), "insert", "v1"),
        (2, "k", ts("2024-01-01 10:01:00"), "update", "v2"),
        (3, "k", ts("2024-01-01 10:02:00"), "delete", None),
        (4, "k", ts("2024-01-01 10:03:00"), "insert", "v3"),
    ])
    stream = file_stream(spark, src, EVENTS_SCHEMA)
    log = streaming_materializer(stream, key_col="key", value_col="payload",
                                 time_col="t", delete_op_col="op",
                                 output_mode="append")
    _run_to_memory(log, "mat_out")
    rows = spark.sql("select * from mat_out order by ts").collect()
    assert [(r.change_type, r.before, r.after) for r in rows] == [
        ("INSERT", None, "v1"),
        ("UPDATE", "v1", "v2"),
        ("DELETE", "v2", None),
        ("INSERT", None, "v3"),
    ]


def test_streaming_materializer_state_across_batches(spark, workdir):
    src = f"{workdir}/in"
    _write_batch(spark, src, [(1, "k", ts("2024-01-01 10:00:00"), "insert", "v1")])
    stream = file_stream(spark, src, EVENTS_SCHEMA)
    log = streaming_materializer(stream, key_col="key", value_col="payload",
                                 time_col="t", delete_op_col="op")
    q = (log.writeStream.format("memory").queryName("mat2")
         .outputMode("append").start())
    q.processAllAvailable()
    _write_batch(spark, src, [(2, "k", ts("2024-01-01 10:05:00"), "update", "v2")])
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from mat2 order by ts").collect()
    # second batch must see first batch's state: UPDATE with before=v1
    assert [(r.change_type, r.before, r.after) for r in rows] == [
        ("INSERT", None, "v1"), ("UPDATE", "v1", "v2")]


def test_kafka_compacted_tombstones(spark):
    df = spark.createDataFrame(
        [("p1", "insert", "x"), ("p2", "delete", "y")],
        "primary_key string, operation string, v string")
    out = kafka_compacted_output(df).collect()
    got = {r.key: r.value for r in out}
    assert got["p2"] is None                  # DELETE -> tombstone
    assert got["p1"] is not None and "x" in got["p1"]


def test_foreach_batch_upsert_idempotent(spark, workdir):
    src = f"{workdir}/in"
    target = f"{workdir}/target"
    ckpt = f"{workdir}/ckpt"
    _write_batch(spark, src, [
        (1, "k1", ts("2024-01-01 10:00:00"), "insert", "v1"),
        (2, "k1", ts("2024-01-01 10:01:00"), "update", "v2"),
        (3, "k2", ts("2024-01-01 10:00:00"), "insert", "w1"),
        (4, "k2", ts("2024-01-01 10:02:00"), "delete", None),
    ])
    stream = file_stream(spark, src, EVENTS_SCHEMA)
    q = foreach_batch_upsert(stream, target, ["key"], ["t", "event_id"],
                             checkpoint=ckpt, op_col="op").start()
    q.processAllAvailable()
    q.stop()
    snap = {r.key: r.payload for r in spark.read.parquet(target).collect()}
    assert snap == {"k1": "v2"}  # k2 deleted, k1 upserted to latest


def test_streaming_merger_exact_reemits_reverts(spark, workdir):
    # reference semantics (StatefulMerger compares to the CURRENT hash):
    # A -> B -> A must emit all three; (key,fp) watermark-dedup would
    # suppress the revert
    from streamforge_spark.streaming.dedup import streaming_merger_exact
    src = f"{workdir}/in"
    _write_batch(spark, src, [
        (1, "k", ts("2024-01-01 10:00:00"), "u", '{"a": 1}'),
        (2, "k", ts("2024-01-01 10:01:00"), "u", '{"a": 1}'),   # no-op
        (3, "k", ts("2024-01-01 10:02:00"), "u", '{"a": 2}'),
        (4, "k", ts("2024-01-01 10:03:00"), "u", '{"a": 1}'),   # revert
    ])
    stream = file_stream(spark, src, EVENTS_SCHEMA)
    merged = streaming_merger_exact(stream, "key", "payload", "t")
    _run_to_memory(merged, "merge_exact_out")
    rows = spark.sql("select * from merge_exact_out order by ts").collect()
    assert [r.payload for r in rows] == ['{"a": 1}', '{"a": 2}', '{"a": 1}']


def test_streaming_merger_exact_state_across_batches(spark, workdir):
    from streamforge_spark.streaming.dedup import streaming_merger_exact
    src = f"{workdir}/in"
    _write_batch(spark, src, [(1, "k", ts("2024-01-01 10:00:00"), "u", '{"a": 1}')])
    stream = file_stream(spark, src, EVENTS_SCHEMA)
    merged = streaming_merger_exact(
        stream, "key", "payload", "t",
        excluded_fields=["updatedAt"])
    q = (merged.writeStream.format("memory").queryName("merge_exact2")
         .outputMode("append").start())
    q.processAllAvailable()
    # same content, different excluded field -> suppressed across batches
    _write_batch(spark, src, [(2, "k", ts("2024-01-01 10:05:00"), "u",
                               '{"a": 1, "updatedAt": "x"}')])
    q.processAllAvailable()
    _write_batch(spark, src, [(3, "k", ts("2024-01-01 10:06:00"), "u",
                               '{"a": 2, "updatedAt": "y"}')])
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from merge_exact2 order by ts").collect()
    assert [r.payload for r in rows] == ['{"a": 1}', '{"a": 2, "updatedAt": "y"}']


def test_streaming_fanin_windowed_agg_matches_batch(spark, workdir):
    # two watermarked file streams unioned with per-source tags, then a
    # tumbling-window count: the streaming result (after all data is
    # processed) must equal the batch formulation on the union
    from streamforge_spark.operators.routing import watermark_aligned_fan_in
    a_dir, b_dir = f"{workdir}/a", f"{workdir}/b"
    rows_a = [(1, "k1", ts("2024-01-01 10:00:10"), "u", "x"),
              (2, "k2", ts("2024-01-01 10:00:50"), "u", "x"),
              (3, "k1", ts("2024-01-01 10:01:10"), "u", "x")]
    rows_b = [(4, "k1", ts("2024-01-01 10:00:20"), "u", "x"),
              (5, "k3", ts("2024-01-01 10:01:40"), "u", "x")]
    _write_batch(spark, a_dir, rows_a)
    _write_batch(spark, b_dir, rows_b)
    merged = watermark_aligned_fan_in(
        [("a", file_stream(spark, a_dir, EVENTS_SCHEMA)),
         ("b", file_stream(spark, b_dir, EVENTS_SCHEMA))],
        event_time_col="t", max_drift="5 seconds")
    agg = (merged.groupBy(F.window("t", "1 minute").alias("w"), "ingest_source")
           .agg(F.count(F.lit(1)).alias("n")))
    q = (agg.writeStream.format("memory").queryName("fanin_out")
         .outputMode("complete").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.w.start.isoformat(), r.ingest_source): r.n
           for r in spark.sql("select * from fanin_out").collect()}
    assert got == {
        ("2024-01-01T10:00:00", "a"): 2,
        ("2024-01-01T10:01:00", "a"): 1,
        ("2024-01-01T10:00:00", "b"): 1,
        ("2024-01-01T10:01:00", "b"): 1,
    }


def test_compact_files_preserves_rows(spark, tmp_path):
    # many tiny files -> one compacted file, same rows
    from streamforge_spark.io import compact_files
    path = str(tmp_path / "many")
    for i in range(6):
        (spark.range(i * 10, i * 10 + 10)
         .coalesce(1).write.mode("append").parquet(path))
    import glob
    assert len(glob.glob(f"{path}/*.parquet")) >= 6
    before = sorted(r.id for r in spark.read.parquet(path).collect())
    n = compact_files(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{path}/*.parquet")) == 1
    after = sorted(r.id for r in spark.read.parquet(path).collect())
    assert after == before == list(range(60))


def _bucket_files(target: str) -> dict[str, list[str]]:
    """Map _kb=N partition dir -> sorted data file names."""
    import glob
    import os
    out = {}
    for d in glob.glob(f"{target}/_kb=*"):
        out[os.path.basename(d)] = sorted(
            f for f in os.listdir(d) if not f.startswith((".", "_")))
    return out


def test_upsert_batch_rewrites_only_touched_buckets(spark, workdir):
    from streamforge_spark.streaming.sinks import upsert_batch
    target = f"{workdir}/target"
    apply = upsert_batch(target, ["key"], ["t"], num_buckets=8)
    rows = [(f"k{i}", ts("2024-01-01 10:00:00"), f"v{i}") for i in range(40)]
    apply(spark.createDataFrame(rows, "key string, t timestamp, payload string"), 0)
    before = _bucket_files(target)
    assert len(before) > 1  # keys must span several buckets for the test to mean anything

    apply(spark.createDataFrame([("k0", ts("2024-01-01 11:00:00"), "v0b")],
                                "key string, t timestamp, payload string"), 1)
    after = _bucket_files(target)
    # spark writes fresh uuid-named files on rewrite, so an untouched
    # bucket keeps the exact same file set
    changed = [b for b in before if after.get(b) != before[b]]
    assert len(changed) == 1  # only k0's bucket was rewritten
    assert set(after) == set(before)
    snap = {r.key: r.payload for r in spark.read.parquet(target).collect()}
    assert snap["k0"] == "v0b" and snap["k1"] == "v1" and len(snap) == 40


def test_upsert_batch_delete_empties_bucket(spark, workdir):
    """Regression: a delete removing a bucket's LAST surviving key must
    drop the bucket's partition dir — dynamic overwrite alone writes
    zero rows for it and would leave the stale row resurrectable."""
    from streamforge_spark.streaming.sinks import upsert_batch
    target = f"{workdir}/target"
    apply = upsert_batch(target, ["key"], ["t"], op_col="op", num_buckets=8)
    schema = "key string, t timestamp, op string, payload string"
    rows = [(f"k{i}", ts("2024-01-01 10:00:00"), "insert", f"v{i}")
            for i in range(10)]
    apply(spark.createDataFrame(rows, schema), 0)
    assert spark.read.parquet(target).count() == 10

    # delete all but one key: several touched buckets become empty
    dels = [(f"k{i}", ts("2024-01-01 11:00:00"), "delete", None)
            for i in range(1, 10)]
    apply(spark.createDataFrame(dels, schema), 1)
    left = spark.read.parquet(target)
    assert {r.key for r in left.collect()} == {"k0"}

    # replay of the delete batch (at-least-once) is a no-op
    apply(spark.createDataFrame(dels, schema), 1)
    assert {r.key for r in spark.read.parquet(target).collect()} == {"k0"}

    # and the target accepts re-inserts into a dropped bucket
    apply(spark.createDataFrame(
        [("k3", ts("2024-01-01 12:00:00"), "insert", "v3c")], schema), 2)
    snap = {r.key: r.payload for r in spark.read.parquet(target).collect()}
    assert snap == {"k0": "v0", "k3": "v3c"}


def test_effectively_once_skips_replayed_batch(spark, workdir):
    from streamforge_spark.streaming.sinks import effectively_once
    produced = []

    def produce(batch_df, batch_id):
        produced.append((batch_id, sorted(r.key for r in batch_df.collect())))

    apply = effectively_once(produce, f"{workdir}/ledger")
    b0 = spark.createDataFrame([("k1",), ("k2",)], "key string")
    b1 = spark.createDataFrame([("k3",)], "key string")
    apply(b0, 0)
    apply(b0, 0)   # checkpoint-recovery replay of the same batch id
    apply(b1, 1)
    apply(b0, 0)   # late replay after newer batches committed
    assert produced == [(0, ["k1", "k2"]), (1, ["k3"])]


def test_effectively_once_failed_produce_retries(spark, workdir):
    # crash BEFORE the ledger write must leave the batch uncommitted so
    # the retry produces again (at-least-once inside the fenced window,
    # fenced by the batchId key downstream)
    from streamforge_spark.streaming.sinks import effectively_once
    calls = []

    def flaky(batch_df, batch_id):
        calls.append(batch_id)
        if len(calls) == 1:
            raise RuntimeError("broker away")

    apply = effectively_once(flaky, f"{workdir}/ledger")
    b = spark.createDataFrame([("k",)], "key string")
    with pytest.raises(RuntimeError):
        apply(b, 0)
    apply(b, 0)    # retry succeeds and commits
    apply(b, 0)    # further replay is now a no-op
    assert calls == [0, 0]


def test_kafka_eo_writer_builds_without_broker(spark, workdir):
    # the env has no Kafka; the wiring (compacted projection + batchId
    # header + writeStream plumbing) must still build
    from streamforge_spark.streaming.sinks import foreach_batch_kafka_eo
    src = f"{workdir}/in"
    _write_batch(spark, src, [(1, "k1", ts("2024-01-01 10:00:00"), "insert", "v1")])
    stream = file_stream(spark, src, EVENTS_SCHEMA)
    writer = foreach_batch_kafka_eo(stream, "out-topic", "broker:9092",
                                    checkpoint=f"{workdir}/ckpt",
                                    ledger_path=f"{workdir}/ledger")
    assert writer is not None  # DataStreamWriter built; .start() needs a broker


def test_session_allowed_lateness_extends_watermark(spark, workdir):
    # SessionAnalyzer.java:76-78 — allowedLateness is a second knob on
    # top of the out-of-orderness watermark; in Spark the two compose
    # additively into the single state-retention knob
    from streamforge_spark.operators.sessions import session_analyzer
    src = f"{workdir}/in"
    _write_batch(spark, src, [(1, "k", ts("2024-01-01 10:00:00"), "insert", "v")])
    stream = file_stream(spark, src, EVENTS_SCHEMA)
    out = session_analyzer(stream, "key", "t", gap="5 minutes",
                           watermark="10 minutes", allowed_lateness="5 minutes")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan and "15 minutes" in plan  # 10m + 5m
    # and the watermark knob alone keeps its old meaning
    out2 = session_analyzer(stream, "key", "t", gap="5 minutes",
                            watermark="10 minutes")
    plan2 = out2._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan2 and "10 minutes" in plan2


def test_kafka_stream_wiring(spark):
    # no broker/connector jar in this env: the reader options must be
    # wired correctly up to source resolution either way
    from streamforge_spark.streaming.sources import kafka_stream
    try:
        df = kafka_stream(spark, "broker:9092", "topic", exactly_once=True)
    except Exception as ex:  # connector package absent: the one allowed error
        assert "Failed to find data source: kafka" in str(ex)
    else:  # connector present: the raw kafka frame shape
        assert {"key", "value", "topic", "partition", "offset"} <= set(df.columns)


def test_foreach_batch_es_upsert_doc_id_keyed(spark, workdir):
    # ElasticsearchSinkBuilder.java: doc id = traceId; replaying the
    # same trace ids must leave one (latest) document per id
    from streamforge_spark.streaming.sinks import foreach_batch_es_upsert
    src = f"{workdir}/in"
    _write_batch(spark, src, [
        (1, "t1", ts("2024-01-01 10:00:00"), "insert", "v1"),
        (2, "t1", ts("2024-01-01 10:05:00"), "update", "v2"),
        (3, "t2", ts("2024-01-01 10:01:00"), "insert", "w1"),
    ])
    stream = file_stream(spark, src, EVENTS_SCHEMA).withColumnRenamed("key", "trace_id")
    q = foreach_batch_es_upsert(stream, f"{workdir}/es", checkpoint=f"{workdir}/ckpt",
                                time_cols=["t", "event_id"]).start()
    q.processAllAvailable()
    q.stop()
    docs = {r.trace_id: r.payload for r in spark.read.parquet(f"{workdir}/es").collect()}
    assert docs == {"t1": "v2", "t2": "w1"}


def test_streaming_contamination_matches_batch(spark, workdir):
    # stream-static broadcast decontamination: streamed docs checked
    # against a static benchmark shingle set, equal to the batch check
    from streamforge_spark.streaming.curation import (
        benchmark_grams, streaming_contamination)
    DOCS = T.StructType([T.StructField("doc_id", T.LongType()),
                         T.StructField("text", T.StringType())])
    bench_rows = [(0, "the quick brown fox jumps over the dog")]
    corpus_b1 = [(10, "a clean document with no overlap at all"),
                 (11, "quick brown fox jumps straight home now")]   # shares 4-grams? no (shifted)
    corpus_b2 = [(12, "the quick brown fox jumps over a fence")]    # shares 2
    bench = benchmark_grams(spark.createDataFrame(bench_rows, DOCS))
    src = f"{workdir}/docs"
    spark.createDataFrame(corpus_b1, DOCS).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOCS).parquet(src)
    out = streaming_contamination(stream, bench)
    q = (out.writeStream.format("memory").queryName("contam_out")
         .outputMode("update").start())
    q.processAllAvailable()
    spark.createDataFrame(corpus_b2, DOCS).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: r.n_shared_grams
           for r in spark.sql("select * from contam_out").collect()}
    # batch reference on the same data
    all_docs = spark.createDataFrame(corpus_b1 + corpus_b2, DOCS)
    from streamforge_spark.functions.text import word_ngrams as wng
    batch = (all_docs.select("doc_id", F.explode(wng(F.col("text"), 4)).alias("g"))
             .join(bench, "g").groupBy("doc_id").count())
    want = {r.doc_id: r["count"] for r in batch.collect()}
    assert got == want and 12 in got


def test_effectively_once_ledger_self_compacts(spark, workdir):
    import os
    from streamforge_spark.streaming.sinks import effectively_once
    ledger = f"{workdir}/ledger"
    apply = effectively_once(lambda df, bid: None, ledger, retain=3)
    b = spark.createDataFrame([("k",)], "key string")
    for bid in range(8):
        apply(b, bid)
    markers = sorted(f for f in os.listdir(ledger) if f.startswith("batch-"))
    # batches 0..3 pruned once ids passed retain; recent window kept
    assert markers == ["batch-4", "batch-5", "batch-6", "batch-7"]
    apply(b, 7)  # replay inside the window is still skipped (no error)


def test_streaming_merger_tws_reemits_reverts(spark, workdir):
    # same contract as streaming_merger_exact, on the Spark 4
    # transformWithState API (ValueState + native TTL, RocksDB provider).
    # The TWS state-server protocol needs protobuf, which this container
    # lacks — the test runs wherever pyspark's [connect] extras exist.
    pytest.importorskip("google.protobuf")
    from streamforge_spark.streaming.dedup import streaming_merger_tws
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try:
        src = f"{workdir}/in"
        _write_batch(spark, src, [
            (1, "k", ts("2024-01-01 10:00:00"), "u", '{"a": 1}'),
            (2, "k", ts("2024-01-01 10:01:00"), "u", '{"a": 1}'),   # no-op
            (3, "k", ts("2024-01-01 10:02:00"), "u", '{"a": 2}'),
            (4, "k", ts("2024-01-01 10:03:00"), "u", '{"a": 1}'),   # revert
        ])
        stream = file_stream(spark, src, EVENTS_SCHEMA)
        merged = streaming_merger_tws(stream, "key", "payload", "t")
        _run_to_memory(merged, "merge_tws_out")
        rows = spark.sql("select * from merge_tws_out order by ts").collect()
        assert [r.payload for r in rows] == ['{"a": 1}', '{"a": 2}', '{"a": 1}']
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_streaming_ohlc_matches_batch(spark, workdir):
    # the shared algebraic agg spec must produce identical bars when
    # fed incrementally under a watermark as in one batch pass
    from streamforge_spark.io import load
    from streamforge_spark.queries.timeseries import ohlc_daily
    from streamforge_spark.streaming.timeseries import streaming_ohlc
    events = load(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "user_id", "value")
    # two arrival batches, split mid-month to exercise bar updates
    src = f"{workdir}/ev"
    events.filter(F.dayofmonth("ts") <= 15).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_ohlc(stream)
    q = (out.writeStream.format("memory").queryName("ohlc_out")
         .outputMode("update").start())
    q.processAllAvailable()
    events.filter(F.dayofmonth("ts") > 15).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    # update mode re-emits a bar on change: keep the LAST emission per key
    got_df = spark.sql(
        "select * from (select *, row_number() over "
        "(partition by user_id, day order by n_trades desc) rn "
        "from ohlc_out) where rn = 1").drop("rn")
    got = {(r.user_id, r.day): (r.open_cents, r.high_cents, r.low_cents,
                                r.close_cents, r.n_trades, r.volume_cents)
           for r in got_df.collect()}
    want = {(r.user_id, r.day): (r.open_cents, r.high_cents, r.low_cents,
                                 r.close_cents, r.n_trades, r.volume_cents)
            for r in ohlc_daily(spark, "/root/testdata/sf0.001").collect()}
    assert got == want


def test_streaming_topk_matches_batch(spark, workdir):
    # keyed-state top-k fed in two batches must equal the batch
    # window-rank result on the same data
    from streamforge_spark.io import load
    from streamforge_spark.queries.windows import topk_per_group
    from streamforge_spark.streaming.timeseries import streaming_topk
    events = load(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "event_type", "value")
    src = f"{workdir}/evk"
    events.filter(F.col("event_id") % 2 == 0).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_topk(stream, k=3)
    q = (out.writeStream.format("memory").queryName("topk_out")
         .outputMode("update").start())
    q.processAllAvailable()
    events.filter(F.col("event_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    want = {(r.event_type, r.event_id, r.cents, r.rank)
            for r in topk_per_group(spark, "/root/testdata/sf0.001").collect()}
    # the memory sink appends every update; the final top-k per (group,
    # rank) is the best emission seen there, since each merge only ever
    # improves a rank slot
    final = {}
    for r in spark.sql("select * from topk_out").collect():
        cur = final.get((r.event_type, r.rank))
        if cur is None or (r.cents, -r.event_id) > (cur[1], -cur[0]):
            final[(r.event_type, r.rank)] = (r.event_id, r.cents)
    got = {(g, eid, c, rk) for (g, rk), (eid, c) in final.items()}
    assert got == want


def test_streaming_dedup_under_rocksdb_state_store(spark, workdir):
    # the production state backend: RocksDB provider (incremental
    # checkpoints, state spills off-heap — the 100 TB configuration)
    # must run our watermark-scoped dedup identically to the default
    # HDFS-backed store. JVM-side only — no protobuf gate.
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try:
        src = f"{workdir}/in"
        _write_batch(spark, src, [
            (1, "k1", ts("2024-01-01 10:00:00"), "insert", "a"),
            (2, "k1", ts("2024-01-01 10:00:00"), "insert", "b"),   # dup
            (3, "k1", ts("2024-01-01 10:05:00"), "update", "c"),
            (4, "k2", ts("2024-01-01 10:00:00"), "insert", "d"),
        ])
        stream = file_stream(spark, src, EVENTS_SCHEMA)
        deduped = streaming_dedup(stream, ["key", "t"], "t", ttl="10 minutes")
        _run_to_memory(deduped, "dedup_rocks_out")
        got = sorted(r.event_id for r in
                     spark.sql("select * from dedup_rocks_out").collect())
        assert len(got) == 3 and got[0] in (1, 2) and got[1:] == [3, 4]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_streaming_ewma_matches_sequential_spec(spark, workdir):
    # the keyed-state recursive EWMA fed in two time-ordered batches
    # must equal the sequential per-key recursion over all events
    from streamforge_spark.io import load
    from streamforge_spark.streaming.timeseries import (
        ewma_recursion, streaming_ewma)
    events = load(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "user_id", "value")
    src = f"{workdir}/ewma_in"
    first = F.dayofmonth("ts") <= 15
    events.filter(first).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_ewma(stream)
    q = (out.writeStream.format("memory").queryName("ewma_out")
         .outputMode("append").start())
    q.processAllAvailable()
    events.filter(~first).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {(r.user_id, r.event_id): (r.x_micro, r.ewma_micro, r.is_anomaly)
           for r in spark.sql("select * from ewma_out").collect()}
    pdf = events.toPandas().sort_values(["ts", "event_id"])
    want = {}
    for uid, g in pdf.groupby("user_id"):
        xs = [int(round(v * 100)) * 10000 for v in g["value"]]
        rows, _ = ewma_recursion(xs, None)
        for eid, row in zip(g["event_id"], rows):
            want[(uid, int(eid))] = row
    assert len(got) == len(want)
    assert got == want


def test_streaming_debounce_emits_latest_after_quiet_gap(spark, workdir):
    # trailing-edge debounce: a burst of edits per key must produce ONE
    # emission — the latest row — and only after the watermark passes
    # the quiet period; a key still inside its quiet window stays held
    import pandas as pd
    from streamforge_spark.streaming.timeseries import streaming_debounce
    schema = ("event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE")
    src = f"{workdir}/deb_in"

    def write(rows):
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"]),
            schema=schema).coalesce(1).write.mode("append").parquet(src)

    write([(1, pd.Timestamp("2024-01-01 10:00:00"), 1, 1.0),
           (2, pd.Timestamp("2024-01-01 10:00:05"), 1, 2.0),
           (3, pd.Timestamp("2024-01-01 10:00:03"), 2, 3.0)])
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_debounce(stream, quiet_ms=60_000, watermark="10 seconds")
    q = (out.writeStream.format("memory").queryName("deb_out")
         .outputMode("append").start())
    q.processAllAvailable()
    assert spark.sql("select * from deb_out").count() == 0  # all still held
    # advance the watermark past both quiet windows via an unrelated key
    write([(4, pd.Timestamp("2024-01-01 10:05:00"), 3, 4.0)])
    q.processAllAvailable()
    got = {(r.user_id, r.event_id, r.value_cents)
           for r in spark.sql("select * from deb_out").collect()}
    assert got == {(1, 2, 200), (2, 3, 300)}  # latest of the burst only
    # key 3 is still inside its own quiet window: a newer event for it
    # replaces the held row instead of emitting the old one
    write([(5, pd.Timestamp("2024-01-01 10:10:00"), 3, 5.0)])
    q.processAllAvailable()
    held3 = {r.event_id for r in spark.sql(
        "select * from deb_out where user_id = 3").collect()}
    assert held3 == set()
    # and once the watermark clears 10:10 + quiet, the LATEST emits
    write([(6, pd.Timestamp("2024-01-01 10:20:00"), 4, 6.0)])
    q.processAllAvailable()
    q.stop()
    held3 = {(r.event_id, r.value_cents) for r in spark.sql(
        "select * from deb_out where user_id = 3").collect()}
    assert held3 == {(5, 500)}


def test_streaming_hll_daily_matches_batch(spark, workdir):
    # sketch aggregation IS streaming-compatible state: per-day HLL
    # sketches built incrementally over two micro-batches must estimate
    # identically to the one-shot batch query (exact regime -> equality)
    from streamforge_spark.io import load
    from streamforge_spark.queries.sketches import hll_daily_distinct
    events = load(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "user_id")
    src = f"{workdir}/hll_in"
    first = F.col("event_id") % 2 == 0
    events.filter(first).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    daily = (stream
             .groupBy(F.date_format(F.date_trunc("day", "ts"),
                                    "yyyy-MM-dd").alias("scope"))
             .agg(F.hll_sketch_agg("user_id").alias("sk")))
    out = daily.select("scope", F.hll_sketch_estimate("sk").alias("est_users"))
    q = (out.writeStream.format("memory").queryName("hll_out")
         .outputMode("complete").start())
    q.processAllAvailable()
    events.filter(~first).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {(r.scope, r.est_users)
           for r in spark.sql("select * from hll_out").collect()}
    want = {(r.scope, r.est_users)
            for r in hll_daily_distinct(spark, "/root/testdata/sf0.001")
            .filter(F.col("scope") != "total").collect()}
    assert got == want


def test_streaming_cep_matches_batch(spark, workdir):
    # the watermark-driven CEP state machine fed in two time-ordered
    # halves (+ a sentinel to push the final watermark) must emit
    # exactly the batch pattern matches
    import pandas as pd
    from streamforge_spark.io import load
    from streamforge_spark.queries.analytics import cep_click_error_pattern
    from streamforge_spark.streaming.cep import streaming_cep_click_error
    events = load(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "user_id", "event_type")
    src = f"{workdir}/cep_in"
    first = F.dayofmonth("ts") <= 15
    events.filter(first).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_cep_click_error(stream)
    q = (out.writeStream.format("memory").queryName("cep_out")
         .outputMode("append").start())
    q.processAllAvailable()
    events.filter(~first).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    # sentinel: a 'view' event a year out advances the watermark past
    # every undecided click's deadline
    spark.createDataFrame(
        pd.DataFrame([{"event_id": 10**9,
                       "ts": pd.Timestamp("2025-06-01"),
                       "user_id": 9999, "event_type": "view"}]),
        schema=events.schema).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {(r.user_id, r.click_id, r.error_id, r.gap_us)
           for r in spark.sql("select * from cep_out").collect()}
    want = {(r.user_id, r.click_id, r.error_id, r.gap_us)
            for r in cep_click_error_pattern(
                spark, "/root/testdata/sf0.001").collect()}
    assert got == want and len(want) > 0


def test_streaming_cep_under_rocksdb_state_store(spark, workdir):
    # the CEP buffer state must behave identically on the production
    # RocksDB state-store backend
    import pandas as pd
    from streamforge_spark.io import load
    from streamforge_spark.queries.analytics import cep_click_error_pattern
    from streamforge_spark.streaming.cep import streaming_cep_click_error
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try:
        events = load(spark, "/root/testdata/sf0.001", "events") \
            .select("event_id", "ts", "user_id", "event_type")
        src = f"{workdir}/cepr_in"
        events.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (streaming_cep_click_error(stream)
             .writeStream.format("memory").queryName("cepr_out")
             .outputMode("append").start())
        q.processAllAvailable()
        spark.createDataFrame(
            pd.DataFrame([{"event_id": 10**9,
                           "ts": pd.Timestamp("2025-06-01"),
                           "user_id": 9999, "event_type": "view"}]),
            schema=events.schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        q.stop()
        got = {(r.user_id, r.click_id, r.error_id, r.gap_us)
               for r in spark.sql("select * from cepr_out").collect()}
        want = {(r.user_id, r.click_id, r.error_id, r.gap_us)
                for r in cep_click_error_pattern(
                    spark, "/root/testdata/sf0.001").collect()}
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)


def test_streaming_holt_matches_batch(spark, workdir):
    # per-key (level, trend) state fed in two month-ordered batches
    # must equal the batch WITH RECURSIVE holt_forecast bit-for-bit
    from streamforge_spark.io import load
    from streamforge_spark.queries.timeseries import holt_forecast
    from streamforge_spark.streaming.timeseries import streaming_holt
    sf = "/root/testdata/sf0.001"
    orders = load(spark, sf, "orders")
    series = (orders.groupBy(F.col("o_custkey").alias("c_custkey"),
                             F.date_trunc("month", "o_orderdate").alias("month"))
              .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                   .alias("rev_cents")))
    pivot = "1998-01-01"
    src = f"{workdir}/holt_src"
    series.filter(F.col("month") < pivot).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(series.schema).parquet(src)
    out = streaming_holt(stream)
    q = (out.writeStream.format("memory").queryName("holt_out")
         .outputMode("append").start())
    q.processAllAvailable()
    series.filter(F.col("month") >= pivot).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.sql("select * from holt_out").collect()}
    want = {tuple(r) for r in holt_forecast(spark, sf).collect()}
    assert got == want


def test_state_inspect_reads_dedup_checkpoint(spark, workdir):
    # the offline state reader must see exactly the keys the dedup
    # operator holds, with expiry = event time + ttl (the ops/debug
    # surface: state introspection without touching the job)
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))
    from state_inspect import inspect
    from streamforge_spark.streaming.dedup import streaming_dedup
    src, ckpt, out = f"{workdir}/si_src", f"{workdir}/si_ckpt", f"{workdir}/si_out"
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:01:00"),
         (1, "2024-01-01 10:02:00")], "k long, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (streaming_dedup(stream, ["k"], "ts", ttl="10 minutes")
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable(); q.stop()
    report = inspect(spark, ckpt, limit=5)
    assert report["n_state_rows"] == 2          # keys 1 and 2, not the dup
    assert report["operators"]                  # metadata rows exist
    state = (spark.read.format("statestore").option("path", ckpt).load()
             .select("key.k", "value.expiresAtMicros").collect())
    got = {(r.k, r.expiresAtMicros) for r in state}
    import datetime
    base = datetime.datetime(2024, 1, 1, 10, 0, tzinfo=datetime.timezone.utc)
    micros = lambda m: int((base + datetime.timedelta(minutes=m)).timestamp() * 1e6)
    # expiry = first-seen event time + 10m ttl
    assert got == {(1, micros(10)), (2, micros(11))}


def test_drift_counts_per_day_bucket_absence(spark):
    # A baseline bucket that is present on day 1 but VANISHES on day 2
    # must still contribute |0 - base_ppm| to day 2's distance.  The
    # streaming==batch test can't see this (both sides share the code);
    # a (event_type, bucket)-keyed outer join loses the term whenever
    # the bucket matched ANY day of that type.
    import datetime
    from streamforge_spark.streaming.timeseries import drift_vs_baseline
    d1 = datetime.datetime(2024, 1, 1)
    d2 = datetime.datetime(2024, 1, 2)
    hist = spark.createDataFrame(
        [("A", d1, 0, 1), ("A", d1, 1, 1), ("A", d2, 0, 1)],
        "event_type string, day timestamp, bucket long, n long")
    baseline = spark.createDataFrame(
        [("A", 0, 500000), ("A", 1, 500000)],
        "event_type string, bucket long, share_ppm long")
    got = {(r.day, r.tv2_ppm)
           for r in drift_vs_baseline(hist, baseline).collect()}
    # day1: shares 500000/500000 == baseline -> 0
    # day2: |1000000-500000| + |0-500000| = 1000000 (NOT 500000)
    assert got == {(d1, 0), (d2, 1000000)}


def test_streaming_drift_matches_batch(spark, workdir):
    # windowed histogram fed in two arrival batches + TV drift vs a
    # static baseline must equal the same computation done in one batch
    from streamforge_spark.io import load
    from streamforge_spark.streaming.timeseries import (
        drift_vs_baseline, streaming_value_histogram)
    events = load(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "event_type", "value")
    src = f"{workdir}/evd"
    events.filter(F.dayofmonth("ts") <= 15).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_value_histogram(stream)
    q = (out.writeStream.format("memory").queryName("drift_hist")
         .outputMode("update").start())
    q.processAllAvailable()
    events.filter(F.dayofmonth("ts") > 15).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    # update mode re-emits on change: last (= max n) emission per key wins
    hist = spark.sql(
        "select event_type, day, bucket, max(n) as n from drift_hist "
        "group by event_type, day, bucket")
    # baseline: the first week's distribution, computed batch-side
    base_ev = events.filter(F.dayofmonth("ts") <= 7)
    cents = F.round(F.col("value") * 100).cast("long")
    bh = (base_ev.groupBy("event_type",
                          F.floor(cents / F.lit(5000)).cast("long")
                          .alias("bucket"))
          .agg(F.count(F.lit(1)).alias("n")))
    bt = bh.groupBy("event_type").agg(F.sum("n").alias("t"))
    baseline = (bh.join(bt, "event_type")
                .select("event_type", "bucket",
                        F.round(F.col("n").cast("double")
                                / F.col("t").cast("double") * 1000000)
                        .cast("long").alias("share_ppm")))
    got = {(r.event_type, r.day, r.tv2_ppm)
           for r in drift_vs_baseline(hist, baseline).collect()}
    # batch analog: identical histogram computed in one pass
    batch_hist = (events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day"),
        F.floor(cents / F.lit(5000)).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n")))
    want = {(r.event_type, r.day, r.tv2_ppm)
            for r in drift_vs_baseline(batch_hist, baseline).collect()}
    assert got == want and len(got) > 10


def test_streaming_hll_distinct_matches_batch(spark, workdir):
    # HLL register merges are max-ops (order-insensitive), so the
    # streaming estimate must EQUAL the batch estimate, not approximate
    from streamforge_spark.io import load
    from streamforge_spark.streaming.timeseries import streaming_daily_distinct
    events = load(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "user_id")
    src = f"{workdir}/evh"
    # time-ordered arrival (watermark-legal), with day 15 sent in BOTH
    # batches: exercises cross-batch register merge for one window and
    # HLL's insensitivity to duplicate arrivals
    events.filter(F.dayofmonth("ts") <= 15).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (streaming_daily_distinct(stream)
         .writeStream.format("memory").queryName("hll_out")
         .outputMode("update").start())
    q.processAllAvailable()
    events.filter(F.dayofmonth("ts") >= 15).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {(r.day, r.est_users) for r in spark.sql(
        "select day, max(est_users) as est_users from hll_out group by day"
    ).collect()}
    want = {(r.day, r.est_users) for r in
            (events.groupBy(F.window("ts", "1 day").alias("w"))
             .agg(F.hll_sketch_agg("user_id").alias("sk"))
             .select(F.col("w.start").alias("day"),
                     F.hll_sketch_estimate("sk").alias("est_users"))
             ).collect()}
    assert got == want and len(got) > 5


def test_streaming_scd2_enrich_matches_batch(spark, workdir):
    # stream-static temporal join must enrich each event with the same
    # version the batch SCD2 join picks
    from streamforge_spark.envelope import envelope_from_events
    from streamforge_spark.io import load
    from streamforge_spark.operators.materialize import materializer_history
    from streamforge_spark.streaming.materialize import streaming_scd2_enrich
    events = load(spark, "/root/testdata/sf0.001", "events")
    env = envelope_from_events(events)
    hist = materializer_history(
        env, ["primary_key"], ["event_time", "event_id"], "event_time",
        delete_predicate=F.col("operation") == "delete")
    versions = hist.select("primary_key", "payload_json",
                           "valid_from", "valid_to").localCheckpoint()
    left = env.select("event_id", "primary_key", "event_time")
    want = {(r.event_id, r.state_payload) for r in
            streaming_scd2_enrich(left, versions).collect()}
    src = f"{workdir}/scd2"
    left.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(left.schema).parquet(src)
    q = (streaming_scd2_enrich(stream, versions)
         .writeStream.format("memory").queryName("scd2_out")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.event_id, r.state_payload)
           for r in spark.sql("select * from scd2_out").collect()}
    assert got == want and len(got) > 100


def test_streaming_token_budget_admission(spark, workdir):
    # per-source budget: arrival-order admission across two batches
    # must equal the batch prefix-sum spec in the same order, and
    # never overshoot any source's budget
    from streamforge_spark.functions.text import token_count
    from streamforge_spark.io import load
    from streamforge_spark.streaming.curation import streaming_token_budget
    budget = 800
    docs = (load(spark, "/root/testdata/sf0.001", "documents")
            .select("doc_id", "source",
                    token_count(F.col("text")).alias("n_tokens")))
    src = f"{workdir}/docs"
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (streaming_token_budget(stream, budget=budget)
         .writeStream.format("memory").queryName("budget_out")
         .outputMode("append").start())
    q.processAllAvailable()
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = [(r.source, r.doc_id, r.cum_tokens)
           for r in spark.sql(
               "select * from budget_out order by source, cum_tokens").collect()]
    # batch spec: same arrival order (evens by doc_id, then odds)
    from pyspark.sql import Window
    ordered = docs.withColumn(
        "arr", F.struct((F.col("doc_id") % 2).alias("p"), "doc_id"))
    w = (Window.partitionBy("source").orderBy("arr")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spec = (ordered.withColumn("cum", F.sum("n_tokens").over(w))
            .where(F.col("cum") <= budget))
    # NOTE: the window spec admits only while the prefix stays in
    # budget CONTIGUOUSLY; FCFS admission skips an oversized doc and
    # may admit a later smaller one, so compare against a python fold
    rows = ordered.select("source", "doc_id", "n_tokens", "arr").collect()
    used, want = {}, []
    for r in sorted(rows, key=lambda r: (r.source, (r.arr.p, r.arr.doc_id))):
        u = used.get(r.source, 0)
        if u + r.n_tokens <= budget:
            used[r.source] = u + r.n_tokens
            want.append((r.source, r.doc_id, used[r.source]))
    assert got == sorted(want, key=lambda t: (t[0], t[2]))
    assert max(used.values()) <= budget


def test_streaming_rate_limit_matches_batch_fold(spark, workdir):
    # token bucket over two arrival batches == one python fold over the
    # event-time-ordered stream (event-time refill => deterministic)
    from streamforge_spark.io import load
    from streamforge_spark.streaming.curation import streaming_rate_limit
    events = load(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "user_id")
    src = f"{workdir}/evr"
    events.filter(F.dayofmonth("ts") <= 15).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (streaming_rate_limit(stream, rate_num=1, rate_den=100_000, burst=2)
         .writeStream.format("memory").queryName("rate_out")
         .outputMode("append").start())
    q.processAllAvailable()
    events.filter(F.dayofmonth("ts") > 15).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {r.event_id: (r.admitted, r.tokens_after)
           for r in spark.sql("select * from rate_out").collect()}
    # batch spec: same fold in python over (user, ts) order
    scale = 1_000_000
    rows = events.select("user_id", "event_id",
                         F.unix_micros("ts").alias("eus")).collect()
    state = {}
    want = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.eus, r.event_id)):
        tokens, last = state.get(r.user_id, (2 * scale, None))
        if last is not None and r.eus > last:
            tokens = min(2 * scale, tokens + (r.eus - last) * 1 // 100_000)
        last = r.eus if last is None else max(last, r.eus)
        ok = tokens >= scale
        if ok:
            tokens -= scale
        state[r.user_id] = (tokens, last)
        want[r.event_id] = (ok, tokens // scale)
    assert got == want
    assert any(not v[0] for v in got.values())   # throttling actually bites


def test_streaming_bloom_dedup_never_forgets(spark, workdir):
    # duplicates arriving in a later batch (far beyond any watermark)
    # must STILL be suppressed; every first occurrence must emit
    from streamforge_spark.streaming.dedup import streaming_bloom_dedup
    src = f"{workdir}/bloomdd"
    b1 = spark.createDataFrame([(f"k{i}",) for i in range(200)], "key string")
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(b1.schema).parquet(src)
    q = (streaming_bloom_dedup(stream)
         .writeStream.format("memory").queryName("bloom_out")
         .outputMode("append").start())
    q.processAllAvailable()
    # batch 2: 100 repeats + 100 new keys
    b2 = spark.createDataFrame(
        [(f"k{i}",) for i in range(100)] + [(f"n{i}",) for i in range(100)],
        "key string")
    b2.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = [r.key for r in spark.sql("select * from bloom_out").collect()]
    assert len(got) == len(set(got))            # nothing emitted twice
    emitted = set(got)
    # no false negatives: a key absent from the output must be a
    # bloom false positive of an earlier DIFFERENT key — at 300 keys
    # over 2x64k bits that's vanishingly rare, so demand near-total
    # coverage and full suppression of the 100 repeats
    assert len(emitted) >= 298
    assert sum(1 for k in emitted if k.startswith("k")) <= 200


def test_streaming_histogram_under_rocksdb_matches_default(spark, workdir):
    # the windowed drift histogram must be store-agnostic: RocksDB
    # provider (the 100 TB configuration) == default HDFS-backed store
    from streamforge_spark.io import load
    from streamforge_spark.streaming.timeseries import streaming_value_histogram
    events = load(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "event_type", "value")

    def run(name, provider):
        prev = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None)
        if provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", provider)
        try:
            src = f"{workdir}/{name}"
            events.coalesce(1).write.mode("append").parquet(src)
            stream = spark.readStream.schema(events.schema).parquet(src)
            q = (streaming_value_histogram(stream)
                 .writeStream.format("memory").queryName(name)
                 .outputMode("update").start())
            q.processAllAvailable()
            q.stop()
            return {(r.event_type, r.day, r.bucket, r.n)
                    for r in spark.sql(f"select * from {name}").collect()}
        finally:
            if provider and prev:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev)

    default = run("hist_default", None)
    rocks = run("hist_rocks", "org.apache.spark.sql.execution.streaming."
                "state.RocksDBStateStoreProvider")
    assert default == rocks and len(default) > 50


def test_streaming_pack_chunks_state_spans_batches(spark, workdir):
    # packing positions must be continuous across micro-batches: a
    # chunk that starts in batch 1 finishes in batch 2 with the same
    # chunk id, and the whole two-batch run equals one python fold in
    # the same arrival order
    from streamforge_spark.functions.text import token_count
    from streamforge_spark.io import load
    from streamforge_spark.streaming.curation import streaming_pack_chunks
    C = 512
    docs = (load(spark, "/root/testdata/sf0.001", "documents")
            .select("doc_id", "source",
                    token_count(F.col("text")).alias("n_tokens")))
    src = f"{workdir}/packdocs"
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (streaming_pack_chunks(stream, chunk_tokens=C)
         .writeStream.format("memory").queryName("pack_out")
         .outputMode("append").start())
    q.processAllAvailable()
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {(r.source, r.doc_id): (r.start_pos, r.chunk_first,
                                  r.chunk_last, r.split)
           for r in spark.sql("select * from pack_out").collect()}
    # python fold in arrival order (evens by doc_id, then odds)
    rows = docs.collect()
    cum, want = {}, {}
    for r in sorted(rows, key=lambda r: (r.doc_id % 2, r.doc_id)):
        if r.n_tokens <= 0:
            continue
        s = cum.get(r.source, 0)
        cum[r.source] = s + r.n_tokens
        cf, cl = s // C, (cum[r.source] - 1) // C
        want[(r.source, r.doc_id)] = (s, cf, cl, cf != cl)
    assert got == want and len(got) > 100
    # at least one doc straddles a batch boundary chunk: its start is
    # in batch-1 territory but its chunk completes with batch-2 docs
    assert any(v[3] for v in got.values())


def test_streaming_funnel_matches_batch_min_chain(spark, workdir):
    # staged funnel state across two in-order batches == the batch
    # chained-MIN formulation (funnel_conversion's spec)
    from streamforge_spark.io import load
    from streamforge_spark.streaming.funnel import streaming_funnel
    events = load(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "user_id", "event_type")
    src = f"{workdir}/funnel_src"
    events.filter(F.dayofmonth("ts") <= 15).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (streaming_funnel(stream)
         .writeStream.format("memory").queryName("funnel_out")
         .outputMode("append").start())
    q.processAllAvailable()
    events.filter(F.dayofmonth("ts") > 15).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {(r.user_id, r.stage_idx): r.completed_us
           for r in spark.sql("select * from funnel_out").collect()}
    # batch spec: chained MINs over the full history (order-free)
    rows = events.select("user_id", "event_type",
                         F.unix_micros("ts").alias("eus")).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.eus, r.event_type))
    want = {}
    for u, evs in by_user.items():
        t1 = min((e for e, t in evs if t == "signup"), default=None)
        if t1 is None:
            continue
        want[(u, 0)] = t1
        t2 = min((e for e, t in evs if t == "click" and e > t1),
                 default=None)
        if t2 is None:
            continue
        want[(u, 1)] = t2
        t3 = min((e for e, t in evs if t == "purchase" and e > t2),
                 default=None)
        if t3 is not None:
            want[(u, 2)] = t3
    assert got == want and len(got) > 30


def test_streaming_funnel_state_crosses_batches(spark, workdir):
    # signup arrives in batch 1, click/purchase in batch 2: the stage
    # state must survive the boundary and enforce strict ordering
    # (the click at the SAME instant as signup does not count)
    import datetime as dt
    from streamforge_spark.streaming.funnel import streaming_funnel
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string")
    src = f"{workdir}/funnel2"
    spark.createDataFrame(
        [(1, t0, 7, "signup"), (2, t0, 7, "click")], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = (streaming_funnel(stream)
         .writeStream.format("memory").queryName("funnel2_out")
         .outputMode("append").start())
    q.processAllAvailable()
    spark.createDataFrame(
        [(3, t0 + dt.timedelta(minutes=1), 7, "click"),
         (4, t0 + dt.timedelta(minutes=2), 7, "purchase")], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = [(r.stage_idx, r.stage) for r in spark.sql(
        "select * from funnel2_out order by completed_us, stage_idx")
        .collect()]
    # batch 1: only signup (same-instant click fails strict order);
    # batch 2: click then purchase complete against carried state
    assert got == [(0, "signup"), (1, "click"), (2, "purchase")]


def test_streaming_exact_percentiles_match_batch(spark, workdir):
    # drained streaming cents-histogram + shared percentile selection
    # == the oracle-checked batch exact_percentiles_by_type
    from streamforge_spark.functions.percentiles import (
        percentiles_from_frequencies,
    )
    from streamforge_spark.io import load
    from streamforge_spark.streaming.timeseries import (
        streaming_cents_histogram,
    )
    from streamforge_spark.registry import QUERIES, load_all
    load_all()
    events = load(spark, "/root/testdata/sf0.001", "events") \
        .select("event_id", "ts", "event_type", "value")
    src = f"{workdir}/pctl_src"
    events.filter(F.col("event_id") % 2 == 0).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (streaming_cents_histogram(stream)
         .writeStream.format("memory").queryName("pctl_hist")
         .outputMode("update").start())
    q.processAllAvailable()
    events.filter(F.col("event_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    drained = spark.sql(
        "select event_type, c, max(k) as k from pctl_hist "
        "group by event_type, c")
    got = {(r.event_type): (r.p50_cents, r.p90_cents, r.p99_cents)
           for r in percentiles_from_frequencies(
               drained, ["event_type"]).collect()}
    want = {(r.event_type): (r.p50_cents, r.p90_cents, r.p99_cents)
            for r in QUERIES["exact_percentiles_by_type"](
                spark, "/root/testdata/sf0.001").collect()}
    assert got == want and len(got) >= 4


def test_streaming_substring_contamination_matches_batch(spark, workdir):
    # stream-static exact-substring gate == the batch incremental
    # query (same window hash, same interval merge) on the same split
    import unittest.mock as mock
    import streamforge_spark.queries.text as qt
    from streamforge_spark.streaming.curation import (
        streaming_substring_contamination, substring_hash_index)

    DOCS = T.StructType([T.StructField("doc_id", T.LongType()),
                         T.StructField("text", T.StringType())])
    passage = "a distinctive forty-character long shared passage of corpus text"
    ref_rows = [(1, "established corpus document alpha " + passage),
                (2, "another established doc with only its own words here")]
    new_b1 = [(400, "new arrival containing " + passage + " plus a new tail"),
              (401, "a totally novel new document with zero verbatim overlap")]
    new_b2 = [(402, passage + " duplicated wholesale in a later batch")]
    ref = spark.createDataFrame(ref_rows, DOCS)
    idx = substring_hash_index(ref)

    src = f"{workdir}/newdocs"
    spark.createDataFrame(new_b1, DOCS).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOCS).parquet(src)
    out = streaming_substring_contamination(stream, idx)
    q = (out.writeStream.format("memory").queryName("substr_contam")
         .outputMode("update").start())
    q.processAllAvailable()
    spark.createDataFrame(new_b2, DOCS).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: (r.n_dup_spans, r.dup_chars, r.dup_char_ppm)
           for r in spark.sql("select * from substr_contam").collect()}

    # batch reference: same fixture through the incremental query
    # (ref ids < XS_SPLIT_ID=400, stream ids >= 400)
    combined = spark.createDataFrame(ref_rows + new_b1 + new_b2, DOCS)
    with mock.patch.object(qt, "prep", lambda s, d, *n: [combined]):
        batch = qt.incremental_substring_contamination(spark, "unused")
        want = {r.doc_id: (r.n_dup_spans, r.dup_chars, r.dup_char_ppm)
                for r in batch.collect() if r.n_dup_spans > 0}
    assert got == want
    assert 400 in got and 402 in got and 401 not in got


def test_streaming_substring_contamination_watermark_evicts(spark, workdir):
    # ts_col/watermark wire withWatermark before the aggregation and
    # put the ingest ts in the group key, so a doc's state row leaves
    # the store once the watermark passes it — same emitted values
    import datetime as dt
    import pytest
    from streamforge_spark.streaming.curation import (
        streaming_substring_contamination, substring_hash_index)

    DOCS = T.StructType([T.StructField("doc_id", T.LongType()),
                         T.StructField("text", T.StringType()),
                         T.StructField("ingest_ts", T.TimestampType())])
    passage = "a distinctive forty-character long shared passage of corpus text"
    ref = spark.createDataFrame(
        [(1, "corpus doc alpha " + passage, None)], DOCS)
    idx = substring_hash_index(ref)

    with pytest.raises(ValueError):
        streaming_substring_contamination(
            spark.readStream.schema(DOCS).parquet(workdir), idx,
            ts_col="ingest_ts")

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    late = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = f"{workdir}/wmdocs"
    spark.createDataFrame(
        [(500, "arrival with " + passage + " inside", t0)],
        DOCS).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOCS).parquet(src)
    out = streaming_substring_contamination(
        stream, idx, ts_col="ingest_ts", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("substr_wm")
         .outputMode("update").start())
    q.processAllAvailable()
    # a batch far past the watermark horizon: doc 500's state row
    # (keyed by its ts) must be evicted afterwards
    spark.createDataFrame(
        [(501, passage + " again much later", late)],
        DOCS).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    # one more empty-advance batch so eviction metrics land
    spark.createDataFrame(
        [(502, "no overlap at all in this one", late)],
        DOCS).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    got = {r.doc_id: (r.n_dup_spans, r.dup_chars)
           for r in spark.sql("select * from substr_wm").collect()}
    state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    q.stop()
    # the shared span may extend past the passage through shared
    # adjacent characters (the space before it is also in the ref)
    assert got[500][0] == 1 and got[500][1] >= len(passage)
    assert got[501][0] == 1
    assert 502 not in got
    assert state_rows <= 1  # doc 500 (t0) evicted by the 12:00 watermark


def test_streaming_vocab_oov_matches_batch(spark, workdir):
    # stream-static OOV gate == the batch query's per-doc counts when
    # fed the batch-built vocabulary
    from streamforge_spark.streaming.curation import streaming_vocab_oov

    DOCS = T.StructType([T.StructField("doc_id", T.LongType()),
                         T.StructField("text", T.StringType())])
    rows = [(1, "alpha beta alpha gamma"),
            (2, "alpha delta delta epsilon zeta"),
            (3, "beta beta beta")]
    vocab = spark.createDataFrame([("alpha",), ("beta",)], "term string")
    src = f"{workdir}/oovdocs"
    spark.createDataFrame(rows[:2], DOCS).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOCS).parquet(src)
    q = (streaming_vocab_oov(stream, vocab)
         .writeStream.format("memory").queryName("oov_out")
         .outputMode("update").start())
    q.processAllAvailable()
    spark.createDataFrame(rows[2:], DOCS).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: (r.n_tokens, r.n_oov, r.oov_ppm)
           for r in spark.sql("select * from oov_out").collect()}
    assert got == {1: (4, 1, 250000), 2: (5, 4, 800000), 3: (3, 0, 0)}


def test_streaming_dsir_gate_matches_batch(spark, workdir):
    # stream-static DSIR gate == the batch scorer when fed the
    # batch-fit model; novel-vocabulary tokens take the neutral score
    from streamforge_spark.functions.dsir import dsir_llr_model, dsir_score
    from streamforge_spark.streaming.curation import streaming_dsir_gate

    DOCS = T.StructType([T.StructField("doc_id", T.LongType()),
                         T.StructField("source", T.StringType()),
                         T.StructField("text", T.StringType())])
    fit_rows = [(1, "tgt", "alpha beta alpha"),
                (2, "tgt", "alpha alpha gamma"),
                (3, "raw", "delta delta epsilon"),
                (4, "raw", "beta delta zeta zeta")]
    fit = spark.createDataFrame(fit_rows, DOCS)
    model = dsir_llr_model(fit, F.col("source") == "tgt").localCheckpoint()

    stream_rows = [(10, "?", "alpha alpha delta"),
                   (11, "?", "zeta epsilon"),
                   (12, "?", "alpha novelword")]
    src = f"{workdir}/dsirdocs"
    spark.createDataFrame(stream_rows[:2], DOCS).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOCS).parquet(src)
    q = (streaming_dsir_gate(stream, model, threshold_micro=0)
         .writeStream.format("memory").queryName("dsir_out")
         .outputMode("update").start())
    q.processAllAvailable()
    spark.createDataFrame(stream_rows[2:], DOCS).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: (r.n_tokens, r.score_micro, r.avg_llr_micro, r.admitted)
           for r in spark.sql("select * from dsir_out").collect()}

    # batch reference over the in-model docs (10, 11): identical sums
    batch = {r.doc_id: (r.n_tokens, r.score_micro) for r in dsir_score(
        spark.createDataFrame(stream_rows[:2], DOCS), model).collect()}
    for did in (10, 11):
        assert got[did][0] == batch[did][0]
        assert got[did][1] == batch[did][1]
        assert got[did][3] == (got[did][1] // got[did][0] >= 0)
    # doc 12: 'novelword' is outside the fit vocabulary -> neutral 0,
    # 'alpha' keeps its model score; both tokens counted
    model_rows = {r.bkt: r.llr_micro for r in model.collect()}
    from streamforge_spark.functions.dsir import dsir_bucket
    alpha_bkt = spark.range(1).select(
        dsir_bucket(F.lit("alpha")).alias("b")).collect()[0].b
    assert got[12][0] == 2
    assert got[12][1] == model_rows[alpha_bkt]


def test_streaming_gopher_gate_matches_batch(spark, workdir):
    # the gate is stateless shared column algebra: streaming rows ==
    # the batch builder's rows for the same documents
    from streamforge_spark.functions.text import gopher_metrics
    from streamforge_spark.streaming.curation import streaming_gopher_gate

    DOCS = T.StructType([T.StructField("doc_id", T.LongType()),
                         T.StructField("text", T.StringType())])
    rows = [(1, " ".join(["the"] * 50)),
            (2, "too short"),
            (3, " ".join(["of"] * 49 + ["the"]))]
    src = f"{workdir}/gopherdocs"
    spark.createDataFrame(rows[:2], DOCS).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOCS).parquet(src)
    q = (streaming_gopher_gate(stream)
         .writeStream.format("memory").queryName("gopher_out")
         .outputMode("append").start())
    q.processAllAvailable()
    spark.createDataFrame(rows[2:], DOCS).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: r.asDict() for r in
           spark.sql("select * from gopher_out").collect()}
    want = {r.doc_id: r.asDict() for r in
            gopher_metrics(spark.createDataFrame(rows, DOCS)).collect()}
    assert got == want
    assert got[1]["gopher_pass"] and not got[2]["gopher_pass"]


def test_streaming_fuzzy_dedup_gate(spark, workdir):
    # stream-vs-corpus near-dup admission: a near-copy of a corpus doc
    # is rejected, novel text is admitted — and verdicts agree with the
    # batch cross-side pairs from minhash_lsh_pairs on the union
    from streamforge_spark.functions.simdedup import minhash_lsh_pairs
    from streamforge_spark.streaming.curation import (
        minhash_corpus_index, streaming_fuzzy_dedup_gate)

    DOCS = T.StructType([T.StructField("doc_id", T.LongType()),
                         T.StructField("text", T.StringType())])
    base = ("the quick brown fox jumps over the lazy dog again and "
            "again while the cat naps by the warm stove every day")
    corpus_rows = [(1, base),
                   (2, "completely different corpus text about spark "
                       "plans shuffles exchanges and adaptive execution")]
    stream_rows = [(10, base + " extra"),          # near-dup of doc 1
                   (11, "novel text that matches nothing in the corpus "
                        "and should sail through the admission gate ok")]
    corpus = spark.createDataFrame(corpus_rows, DOCS)
    bands, grams = minhash_corpus_index(corpus)
    bands, grams = bands.localCheckpoint(), grams.localCheckpoint()

    src = f"{workdir}/fuzzydocs"
    spark.createDataFrame(stream_rows[:1], DOCS).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOCS).parquet(src)
    q = (streaming_fuzzy_dedup_gate(stream, bands, grams)
         .writeStream.format("memory").queryName("fuzzy_out")
         .outputMode("update").start())
    q.processAllAvailable()
    spark.createDataFrame(stream_rows[1:], DOCS).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: (r.n_near_dups, r.admitted)
           for r in spark.sql("select * from fuzzy_out").collect()}
    assert got[10] == (1, False)
    assert got[11] == (0, True)

    # batch agreement: cross-side pairs of the union give the same
    # rejected set
    union = corpus.unionByName(spark.createDataFrame(stream_rows, DOCS))
    pairs = minhash_lsh_pairs(union, threshold=0.2).collect()
    rejected = {p.d2 for p in pairs if p.d1 in (1, 2) and p.d2 >= 10}
    assert rejected == {d for d, (n, adm) in got.items() if not adm}


def test_minhash_index_append_equals_rebuild(spark, workdir):
    # append(batch) over a persisted index == rebuild over the union:
    # both artifacts are per-document, so the fold is exact — and the
    # gate gives identical verdicts against either index
    from streamforge_spark.streaming.curation import (
        append_minhash_index, load_minhash_index, minhash_corpus_index,
        save_minhash_index, streaming_fuzzy_dedup_gate)

    DOCS = T.StructType([T.StructField("doc_id", T.LongType()),
                         T.StructField("text", T.StringType())])
    first = [(1, "alpha beta gamma delta epsilon zeta eta theta iota"),
             (2, "one two three four five six seven eight nine ten")]
    second = [(3, "red orange yellow green blue indigo violet and white")]
    path = f"{workdir}/mhidx"
    b0, g0 = minhash_corpus_index(spark.createDataFrame(first, DOCS))
    save_minhash_index(b0, g0, path)
    append_minhash_index(path, spark.createDataFrame(second, DOCS))

    bands_l, grams_l = load_minhash_index(spark, path)
    b_full, g_full = minhash_corpus_index(
        spark.createDataFrame(first + second, DOCS))
    assert (sorted(map(tuple, bands_l.collect()))
            == sorted(map(tuple, b_full.collect())))
    assert (sorted((r.doc_id, tuple(r.gs)) for r in grams_l.collect())
            == sorted((r.doc_id, tuple(r.gs)) for r in g_full.collect()))

    probe = spark.createDataFrame(
        [(10, "red orange yellow green blue indigo violet and black"),
         (11, "totally unrelated words nowhere near any corpus doc")], DOCS)
    via_loaded = {r.doc_id: (r.n_near_dups, r.admitted)
                  for r in streaming_fuzzy_dedup_gate(
                      probe, bands_l, grams_l).collect()}
    via_rebuilt = {r.doc_id: (r.n_near_dups, r.admitted)
                   for r in streaming_fuzzy_dedup_gate(
                       probe, b_full, g_full).collect()}
    assert via_loaded == via_rebuilt
    assert not via_loaded[10][1] and via_loaded[11][1]


def test_minhash_index_append_replay_after_bands_only_crash(spark, workdir):
    # advisor-r8 crash window: bands land before grams, so an attempt
    # that dies between the two writes leaves band rows with no
    # shingle sets.  The replay must still converge to exactly the
    # rebuild rows — in particular it must WRITE the skipped grams
    # (the old band-derived anti-join skipped them forever, making the
    # fuzzy gate score Jaccard 0.0 and admit true near-dups)
    from streamforge_spark.streaming.curation import (
        append_minhash_index, load_minhash_index, minhash_corpus_index,
        save_minhash_index, streaming_fuzzy_dedup_gate)

    DOCS = T.StructType([T.StructField("doc_id", T.LongType()),
                         T.StructField("text", T.StringType())])
    first = [(1, "alpha beta gamma delta epsilon zeta eta theta iota"),
             (2, "one two three four five six seven eight nine ten")]
    second = [(3, "red orange yellow green blue indigo violet and white")]
    path = f"{workdir}/mhidx_crash"
    b0, g0 = minhash_corpus_index(spark.createDataFrame(first, DOCS))
    save_minhash_index(b0, g0, path)

    # simulate the crashed attempt: batch band rows written, grams and
    # marker untouched (exactly append_minhash_index's write order)
    batch = spark.createDataFrame(second, DOCS)
    b1, _g1 = minhash_corpus_index(batch)
    (b1.repartition("band").sortWithinPartitions("band", "band_hash")
     .write.mode("append").parquet(f"{path}/bands"))

    append_minhash_index(path, batch)   # the effectively-once replay

    bands_l, grams_l = load_minhash_index(spark, path)
    b_full, g_full = minhash_corpus_index(
        spark.createDataFrame(first + second, DOCS))
    assert (sorted(map(tuple, bands_l.collect()))
            == sorted(map(tuple, b_full.collect())))
    assert (sorted((r.doc_id, tuple(r.gs)) for r in grams_l.collect())
            == sorted((r.doc_id, tuple(r.gs)) for r in g_full.collect()))

    # and the gate REJECTS a near-dup of the replayed doc (the failure
    # mode was admitting it via a NULL shingle set)
    probe = spark.createDataFrame(
        [(10, "red orange yellow green blue indigo violet and black")],
        DOCS)
    got = {r.doc_id: r.admitted
           for r in streaming_fuzzy_dedup_gate(
               probe, bands_l, grams_l).collect()}
    assert got[10] is False


def test_minhash_marker_torn_overwrite_self_heals(spark, workdir):
    # a crash inside _write_max_doc_id's non-atomic mode('overwrite')
    # leaves the marker dir existing but FOOTERLESS: the exists-then-
    # read path must not brick every later append (review-r9) — it
    # recomputes the cached max from the authoritative grams table, so
    # the replay skip and the non-monotone guard stay armed, and the
    # next successful append rewrites the marker
    import glob
    import os

    from streamforge_spark.streaming.curation import (
        _read_max_doc_id, append_minhash_index, load_minhash_index,
        minhash_corpus_index, save_minhash_index)

    DOCS = T.StructType([T.StructField("doc_id", T.LongType()),
                         T.StructField("text", T.StringType())])
    first = [(1, "alpha beta gamma delta epsilon zeta eta theta iota"),
             (2, "one two three four five six seven eight nine ten")]
    second = [(3, "red orange yellow green blue indigo violet and white")]
    third = [(4, "entirely different final words closing out the test")]
    path = f"{workdir}/mhidx_torn"
    b0, g0 = minhash_corpus_index(spark.createDataFrame(first, DOCS))
    save_minhash_index(b0, g0, path)
    append_minhash_index(path, spark.createDataFrame(second, DOCS))

    # simulate the torn overwrite: dir stays, parquet files gone
    for f in glob.glob(f"{path}/_max_doc_id/*"):
        os.remove(f)
    assert _read_max_doc_id(spark, path) == 3   # recomputed from grams

    # replay of the already-folded batch is STILL skipped (no dup rows)
    append_minhash_index(path, spark.createDataFrame(second, DOCS))
    # and a genuinely new batch appends and re-writes the marker
    append_minhash_index(path, spark.createDataFrame(third, DOCS))
    assert _read_max_doc_id(spark, path) == 4

    bands_l, grams_l = load_minhash_index(spark, path)
    b_full, g_full = minhash_corpus_index(
        spark.createDataFrame(first + second + third, DOCS))
    assert (sorted(map(tuple, bands_l.collect()))
            == sorted(map(tuple, b_full.collect())))
    assert (sorted((r.doc_id, tuple(r.gs)) for r in grams_l.collect())
            == sorted((r.doc_id, tuple(r.gs)) for r in g_full.collect()))


def test_minhash_index_append_respects_bucket_cap(spark, workdir):
    # a bucket already full in the persisted index admits no appended
    # members, and a partly-full one admits only up to capacity — so
    # append still equals a rebuild over the union (monotone doc_ids)
    from streamforge_spark.functions.simdedup import BAND_MAX_BUCKET
    from streamforge_spark.streaming.curation import (
        append_minhash_index, load_minhash_index, minhash_corpus_index,
        save_minhash_index)

    DOCS = T.StructType([T.StructField("doc_id", T.LongType()),
                         T.StructField("text", T.StringType())])
    text = "identical template text repeated across the whole family"
    first = [(i, text) for i in range(BAND_MAX_BUCKET + 6)]
    second = [(1000 + i, text) for i in range(3)]
    path = f"{workdir}/mhidx_cap"
    b0, g0 = minhash_corpus_index(spark.createDataFrame(first, DOCS))
    save_minhash_index(b0, g0, path)
    append_minhash_index(path, spark.createDataFrame(second, DOCS))

    bands_l, _ = load_minhash_index(spark, path)
    b_full, _ = minhash_corpus_index(
        spark.createDataFrame(first + second, DOCS))
    assert (sorted(map(tuple, bands_l.collect()))
            == sorted(map(tuple, b_full.collect())))
    # the template bucket stayed at the cap: appended ids were evicted
    per_bucket = bands_l.groupBy("band", "band_hash").count().collect()
    assert max(r["count"] for r in per_bucket) == BAND_MAX_BUCKET
    assert bands_l.filter(F.col("doc_id") >= 1000).count() == 0


def test_ivf_index_append_equals_frozen_rebuild(spark, workdir):
    # IVF lifecycle parity with the MinHash index (verdict-r8 item 7):
    # append(batch) folds new vectors in under the index's FROZEN
    # centroids, so the posting rows equal re-assigning the union
    # under those SAME centroids (NOT a retrain — that belongs to
    # CorpusCompact), the centroids are untouched, and the semantic
    # gate sees appended vectors as live rejection targets
    from streamforge_spark.functions.clustering import KMEANS_QUANT
    from streamforge_spark.functions.similarity import (
        append_ivf_fixed_index, build_ivf_fixed_index,
        ivf_probe_cells_expr, load_ivf_fixed_index)
    from streamforge_spark.streaming.curation import (
        streaming_semantic_dedup_gate)

    EMB = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType()))])
    first = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])]
    second = [(3, [0.0, 0.0, 1.0, 0.0]), (4, [0.6, 0.8, 0.0, 0.0])]
    path = f"{workdir}/ivfidx_append"
    build_ivf_fixed_index(spark.createDataFrame(first, EMB), path,
                          cells=2, rounds=2)
    C0, _ = load_ivf_fixed_index(spark, path)
    append_ivf_fixed_index(path, spark.createDataFrame(second, EMB))
    C1, vecs = load_ivf_fixed_index(spark, path)
    assert C1 == C0   # frozen: an append never moves cell boundaries

    # frozen rebuild: assign the UNION under the pre-append centroids
    # with the exact builder projection
    union = spark.createDataFrame(first + second, EMB)
    raw = F.col("embedding").cast("array<double>")
    qv = F.transform(raw, lambda x: F.round(x * KMEANS_QUANT).cast("long"))
    expected = (union.select("vec_id", raw.alias("v"), qv.alias("qv"))
                .withColumn("cell",
                            ivf_probe_cells_expr(F.col("qv"), C0, 1)[0])
                .drop("qv"))
    assert (sorted((r.vec_id, tuple(r.v), r.cell)
                   for r in vecs.collect())
            == sorted((r.vec_id, tuple(r.v), r.cell)
                      for r in expected.collect()))

    # appended vectors are live gate targets: a near-dup of appended
    # vec 3 is rejected, an orthogonal probe still admits
    probe = spark.createDataFrame(
        [(10, [0.05, 0.0, 0.99, 0.0]), (11, [0.0, 0.0, 0.0, 1.0])], EMB)
    got = {r.vec_id: r.admitted
           for r in streaming_semantic_dedup_gate(
               probe, C1, vecs, threshold=0.30, nprobe=2).collect()}
    assert got == {10: False, 11: True}

    # train_stats stay FROZEN at the build-time population — the
    # append enters the postings but not the baseline (that gap IS
    # what the staleness report measures)
    from streamforge_spark.functions.similarity import load_ivf_train_stats
    assert (load_ivf_train_stats(spark, path)
            .agg(F.sum("n")).first()[0] == len(first))


def test_ivf_index_append_replay_is_idempotent(spark, workdir):
    # the effectively-once crash window: a batch whose append committed
    # but whose ledger marker didn't gets REPLAYED — the replay must
    # converge to the same index (no duplicate posting rows, which
    # would double n_near_dups in the gate's verdict rollup).  Partial
    # overlap too: a replayed batch carrying one already-stored id and
    # one genuinely new id appends only the new one.
    from streamforge_spark.functions.similarity import (
        append_ivf_fixed_index, build_ivf_fixed_index,
        load_ivf_fixed_index)
    from streamforge_spark.streaming.curation import (
        streaming_semantic_dedup_gate)

    EMB = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType()))])
    first = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])]
    batch = [(3, [0.0, 0.0, 1.0, 0.0])]
    path = f"{workdir}/ivfidx_replay"
    build_ivf_fixed_index(spark.createDataFrame(first, EMB), path,
                          cells=2, rounds=2)
    append_ivf_fixed_index(path, spark.createDataFrame(batch, EMB))
    append_ivf_fixed_index(path, spark.createDataFrame(batch, EMB))
    C, vecs = load_ivf_fixed_index(spark, path)
    assert sorted(r.vec_id for r in vecs.collect()) == [1, 2, 3]

    # partial replay: id 3 already stored, id 5 new
    append_ivf_fixed_index(
        path, spark.createDataFrame(
            batch + [(5, [0.0, 0.0, 0.0, 1.0])], EMB))
    C, vecs = load_ivf_fixed_index(spark, path)
    assert sorted(r.vec_id for r in vecs.collect()) == [1, 2, 3, 5]

    # verdict rollup counts each stored vector once
    probe = spark.createDataFrame([(10, [0.0, 0.0, 0.99, 0.05])], EMB)
    got = streaming_semantic_dedup_gate(
        probe, C, vecs, threshold=0.30, nprobe=2).collect()
    assert [(r.n_near_dups, r.admitted) for r in got] == [(1, False)]

    # an empty batch is a no-op, not a crash
    append_ivf_fixed_index(path, spark.createDataFrame([], EMB))
    assert load_ivf_fixed_index(spark, path)[1].count() == 4


def test_ivf_staleness_flags_fit_inflation(spark):
    # crafted geometry pins the FIT-INFLATION branch (the fixture's
    # stationary embeddings never fire it): training members hug their
    # centroid, appended members land in the same cell but >2x as far
    # -> stale, while a cell whose appends fit as well as training
    # stays fresh.  drift branch silent (shares chosen equal).
    from streamforge_spark.functions.clustering import kmeans_centroids
    from streamforge_spark.functions.similarity import ivf_staleness_table

    EMB = "vec_id long, embedding array<double>"
    # two tight training clusters around (1, 0) and (0, 1)
    est = spark.createDataFrame(
        [(0, [1.00, 0.00]), (1, [1.02, 0.00]),
         (2, [0.00, 1.00]), (3, [0.00, 1.02])], EMB)
    C = kmeans_centroids(est, k=2, rounds=2)
    arr = spark.createDataFrame(
        [(10, [1.40, 0.00]),     # cell of (1,0): ~40x the training d2
         (11, [0.00, 1.01]),     # cell of (0,1): fits like training
         (12, [0.00, 0.99])], EMB)
    got = {r.cell: r for r in ivf_staleness_table(
        est, arr, C, stale_drift_ppm=500_000).collect()}
    far = next(r for r in got.values() if r.n_appended == 1)
    fit = next(r for r in got.values() if r.n_appended == 2)
    assert far.mean_d2_appended > 2 * far.mean_d2_train
    assert far.stale
    assert fit.mean_d2_appended <= 2 * fit.mean_d2_train
    assert not fit.stale


def test_ivf_staleness_flags_occupancy_drift(spark):
    # the DRIFT branch: appends pile into one cell (100% vs a 50%
    # training share) while fitting its geometry perfectly -> stale on
    # drift alone; the starved cell's negative drift flags it too
    # (an abandoned region is as much a retrain signal as a hot one)
    from streamforge_spark.functions.clustering import kmeans_centroids
    from streamforge_spark.functions.similarity import ivf_staleness_table

    EMB = "vec_id long, embedding array<double>"
    est = spark.createDataFrame(
        [(0, [1.00, 0.00]), (1, [1.02, 0.00]),
         (2, [0.00, 1.00]), (3, [0.00, 1.02])], EMB)
    C = kmeans_centroids(est, k=2, rounds=2)
    arr = spark.createDataFrame(
        [(10, [1.00, 0.00]), (11, [1.02, 0.00])], EMB)  # all one cell
    rows = ivf_staleness_table(
        est, arr, C, stale_drift_ppm=300_000).collect()
    hot = next(r for r in rows if r.n_appended == 2)
    cold = next(r for r in rows if r.n_appended == 0)
    assert hot.drift_ppm == 500_000 and hot.stale
    assert cold.drift_ppm == -500_000 and cold.stale
    assert hot.mean_d2_appended <= 2 * hot.mean_d2_train  # drift alone
    # zero appends anywhere: total formulation, no division crash, and
    # an index with NO appends is definitionally fresh (zero drift,
    # nothing stale — not -train_share across the board)
    none = ivf_staleness_table(
        est, spark.createDataFrame([], EMB), C,
        stale_drift_ppm=300_000).collect()
    assert all(not r.stale for r in none)
    assert all(r.drift_ppm == 0 for r in none)


def test_streaming_semantic_dedup_gate(spark, workdir):
    # stream-vs-corpus SEMANTIC admission through the PERSISTED
    # fixed-point IVF index: a near-parallel vector of a corpus vec is
    # rejected, an orthogonal one admits — and full-probe verdicts
    # agree with the batch hyperplane-blocked semantic_dup_marks
    # cross-side on the union
    from streamforge_spark.functions.similarity import (
        build_ivf_fixed_index, load_ivf_fixed_index, semantic_dup_marks)
    from streamforge_spark.streaming.curation import (
        streaming_semantic_dedup_gate)

    EMB = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType()))])
    corpus_rows = [(1, [1.0, 0.0, 0.0, 0.0]),
                   (2, [0.0, 1.0, 0.0, 0.0])]
    stream_rows = [(10, [0.99, 0.12, 0.0, 0.0]),   # near-dup of vec 1
                   (11, [0.0, 0.0, 1.0, 0.0])]     # orthogonal: admits
    corpus = spark.createDataFrame(corpus_rows, EMB)
    path = f"{workdir}/ivfidx"
    build_ivf_fixed_index(corpus, path, cells=2, rounds=2)
    C, vecs = load_ivf_fixed_index(spark, path)
    assert len(C) == 2 and sorted(r.cell for r in vecs.collect()) == [0, 1]

    src = f"{workdir}/semvecs"
    spark.createDataFrame(stream_rows[:1], EMB).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(EMB).parquet(src)
    q = (streaming_semantic_dedup_gate(stream, C, vecs, threshold=0.30,
                                       nprobe=2)
         .writeStream.format("memory").queryName("sem_out")
         .outputMode("update").start())
    q.processAllAvailable()
    spark.createDataFrame(stream_rows[1:], EMB).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {r.vec_id: (r.n_near_dups, r.admitted)
           for r in spark.sql("select * from sem_out").collect()}
    assert got[10] == (1, False)
    assert got[11] == (0, True)

    # batch agreement: hyperplane-blocked semantic dedup of the union,
    # restricted cross-side, marks exactly the gate's rejected set
    union = corpus.unionByName(spark.createDataFrame(stream_rows, EMB))
    marks = semantic_dup_marks(union, threshold=0.30).collect()
    rejected = {m.vec_id for m in marks if m.dup_of in (1, 2)
                and m.vec_id >= 10}
    assert rejected == {v for v, (n, adm) in got.items() if not adm}


def test_streaming_fuzzy_gate_watermark_evicts_state(spark, workdir):
    # the ts_col/watermark wiring must actually BOUND the state store:
    # once the watermark passes a doc's ingest timestamp, its verdict
    # state row is evicted (advisor-r7 medium: without this every key
    # ever seen is retained forever)
    from streamforge_spark.streaming.curation import (
        minhash_corpus_index, streaming_fuzzy_dedup_gate)

    DOCS = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ingest_ts", T.TimestampType())])
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id long, text string")
    bands, grams = minhash_corpus_index(corpus)
    bands, grams = bands.localCheckpoint(), grams.localCheckpoint()

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    late = t0 + dt.timedelta(hours=6)   # far past the 10m watermark
    src = f"{workdir}/fuzzywm"
    spark.createDataFrame(
        [(10, "totally novel text one", t0),
         (11, "other novel words two", t0)], DOCS).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOCS).parquet(src)
    q = (streaming_fuzzy_dedup_gate(stream, bands, grams,
                                    ts_col="ingest_ts",
                                    watermark="10 minutes")
         .writeStream.format("memory").queryName("fuzzy_wm")
         .outputMode("update").start())
    q.processAllAvailable()
    spark.createDataFrame([(12, "third novel doc three", late)],
                          DOCS).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    # one more empty-progress batch so eviction metrics land
    spark.createDataFrame([(13, "fourth novel doc four",
                            late + dt.timedelta(minutes=1))],
                          DOCS).coalesce(1) \
        .write.mode("append").parquet(src)
    q.processAllAvailable()
    progress = q.recentProgress
    q.stop()
    got = {r.doc_id for r in spark.sql("select * from fuzzy_wm").collect()}
    assert got == {10, 11, 12, 13}
    removed = sum(op["numRowsRemoved"]
                  for p in progress for op in p["stateOperators"])
    assert removed >= 2, f"watermark evicted nothing: {removed}"

    # the two knobs must be passed together
    import pytest as _pytest
    with _pytest.raises(ValueError):
        streaming_fuzzy_dedup_gate(stream, bands, grams,
                                   ts_col="ingest_ts")


def test_streaming_semantic_gate_watermark_evicts_state(spark, workdir):
    # same eviction contract as the fuzzy gate, embedding side: the
    # verdict rollup's state row goes away once the watermark passes
    # the vector's arrival time
    from streamforge_spark.functions.similarity import (
        build_ivf_fixed_index, load_ivf_fixed_index)
    from streamforge_spark.streaming.curation import (
        streaming_semantic_dedup_gate)

    EMB = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
        T.StructField("ingest_ts", T.TimestampType())])
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    path = f"{workdir}/ivfwm"
    build_ivf_fixed_index(corpus, path, cells=2, rounds=2)
    C, vecs = load_ivf_fixed_index(spark, path)

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    late = t0 + dt.timedelta(hours=6)
    src = f"{workdir}/semwm"
    spark.createDataFrame(
        [(10, [0.0, 0.0, 1.0, 0.0], t0)], EMB).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(EMB).parquet(src)
    q = (streaming_semantic_dedup_gate(stream, C, vecs, threshold=0.30,
                                       nprobe=2, ts_col="ingest_ts",
                                       watermark="10 minutes")
         .writeStream.format("memory").queryName("sem_wm")
         .outputMode("update").start())
    q.processAllAvailable()
    spark.createDataFrame([(11, [0.0, 0.0, 0.0, 1.0], late)],
                          EMB).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    spark.createDataFrame(
        [(12, [0.5, 0.5, 0.5, 0.5], late + dt.timedelta(minutes=1))],
        EMB).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    progress = q.recentProgress
    q.stop()
    got = {r.vec_id: r.admitted
           for r in spark.sql("select * from sem_wm").collect()}
    assert got[10] and got[11] and not got[12]
    removed = sum(op["numRowsRemoved"]
                  for p in progress for op in p["stateOperators"])
    assert removed >= 1, f"watermark evicted nothing: {removed}"


def test_minhash_index_append_monotonicity_enforced(spark, workdir):
    # review-r8 finding 2: the append==rebuild algebra assumes
    # increasing doc_ids — the index now carries a _max_doc_id marker,
    # SKIPS a fully-replayed batch idempotently, and RAISES on
    # genuinely non-monotone input instead of silently corrupting the
    # bucket cap
    import pytest as _pytest

    from streamforge_spark.streaming.curation import (
        append_minhash_index, load_minhash_index, minhash_corpus_index,
        save_minhash_index)

    DOCS = T.StructType([T.StructField("doc_id", T.LongType()),
                         T.StructField("text", T.StringType())])
    first = [(100, "alpha beta gamma delta epsilon zeta eta theta"),
             (101, "one two three four five six seven eight nine")]
    path = f"{workdir}/mhidx_mono"
    b0, g0 = minhash_corpus_index(spark.createDataFrame(first, DOCS))
    save_minhash_index(b0, g0, path)

    batch = spark.createDataFrame(
        [(200, "red orange yellow green blue indigo violet white")], DOCS)
    append_minhash_index(path, batch)
    _, grams = load_minhash_index(spark, path)
    assert sorted(r.doc_id for r in grams.select("doc_id").collect()) \
        == [100, 101, 200]

    # replayed batch (same ids): skipped, no duplicate rows
    append_minhash_index(path, batch)
    _, grams = load_minhash_index(spark, path)
    assert sorted(r.doc_id for r in grams.select("doc_id").collect()) \
        == [100, 101, 200]

    # non-monotone batch (id below the marker): hard error
    bad = spark.createDataFrame(
        [(150, "this id sits below the index maximum")], DOCS)
    with _pytest.raises(ValueError, match="non-monotone"):
        append_minhash_index(path, bad)


def test_bench_integrity_incremental_equals_batch(spark):
    """The incremental face's additive contract (judge r9 item 6):
    summing per-batch deltas over all batches — equivalently, the
    final batch's cumulative — reproduces the one-shot
    benchmark_integrity_report exactly, because batches partition the
    corpus doc_ids and every modality's pair relation is distinct."""
    from pyspark.sql import functions as F

    from streamforge_spark import registry
    registry.load_all()
    sf = "/root/testdata/sf0.001"
    batch = {r.bench_doc_id: r for r in
             registry.QUERIES["benchmark_integrity_report"](spark, sf)
             .collect()}
    incr = registry.QUERIES["benchmark_integrity_incremental"](spark, sf)
    from streamforge_spark.queries.curation import INTEG_NB
    rolled = (incr.groupBy("bench_doc_id")
              .agg(F.sum("d_ngram").alias("ngram_leaks"),
                   F.sum("d_substring").alias("substring_leaks"),
                   F.sum("d_semantic").alias("semantic_leaks"),
                   F.sum("d_leakers").alias("distinct_leakers"),
                   F.max(F.when(F.col("batch_id") == INTEG_NB - 1,
                                F.col("cum_leakers"))).alias("final_cum"))
              .collect())
    assert len(rolled) == len(batch)
    for r in rolled:
        b = batch[r.bench_doc_id]
        assert (r.ngram_leaks, r.substring_leaks, r.semantic_leaks,
                r.distinct_leakers) == \
            (b.ngram_leaks, b.substring_leaks, b.semantic_leaks,
             b.distinct_leakers), r.bench_doc_id
        assert r.final_cum == b.distinct_leakers
        assert (r.final_cum > 0) == b.compromised
