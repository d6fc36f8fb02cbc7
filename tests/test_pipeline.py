"""Pipeline composition + dual-output DLQ accumulation
(pipeline.py — the PipelineBuilder analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_spark.operators.quality import (
    SchemaVersion, constraint_enforcer, not_null_rule, range_rule, schema_enforcer,
)
from streamforge_spark.pipeline import Pipeline


def test_pipeline_accumulates_dlq(spark):
    df = spark.createDataFrame(
        [(1, '{"k": "1"}', 10.0),
         (2, None, 20.0),            # schema fail (null payload)
         (3, '{"k": "2"}', -5.0),    # constraint fail (range)
         (4, '{"k": "3"}', 30.0)],
        "id long, payload string, amount double")
    v1 = SchemaVersion("v1", required={"k": "number"})
    p = (Pipeline(df)
         .then(lambda d: schema_enforcer(d, "payload", [v1]))
         .then(lambda d: d.withColumn("amount2", F.col("amount") * 2))
         .then(lambda d: constraint_enforcer(
             d, [not_null_rule("amount"), range_rule("amount", 0, 100)])))
    assert sorted(r.id for r in p.df.collect()) == [1, 4]
    dlq = p.dlq()
    assert dlq is not None
    errs = sorted((r.error_type) for r in dlq.collect())
    assert errs == ["CONSTRAINT_VIOLATION", "SCHEMA_VIOLATION"]


def test_pipeline_plain_operators(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    p = Pipeline(df).then(lambda d: d.filter(F.col("id") > 1))
    assert p.dlq() is None
    assert p.df.count() == 2


def test_replay_dlq_recovers_with_new_schema_version(spark):
    import json
    from streamforge_spark.operators.quality import SchemaVersion, schema_enforcer
    from streamforge_spark.pipeline import replay_dlq
    envelopes = spark.createDataFrame(
        [("insert", "s", json.dumps({"name": "no-id"}), "k1"),
         ("insert", "s", json.dumps({"_id": "a"}), "a")],
        "operation string, source string, payload_json string, primary_key string")
    v1 = SchemaVersion("v1", required={"_id": "any"})
    ok, dlq = schema_enforcer(envelopes, "payload_json", [v1])
    assert ok.count() == 1 and dlq.count() == 1
    # garbage that failed at parse time lands in the same DLQ shape
    from streamforge_spark.pipeline import dlq_event
    garbage = dlq_event(
        spark.createDataFrame([("not json",)], "value string"),
        "PARSE_ERROR", "unparseable", "parser", raw_event=F.col("value"))
    full_dlq = dlq.unionByName(garbage)
    # v2 no longer requires _id -> the schema-violating record recovers;
    # the garbage stays dead
    v2 = SchemaVersion("v2", required={"name": "string"})
    recovered, still_dead = replay_dlq(full_dlq, versions=[v2, v1])
    rec = recovered.collect()
    assert len(rec) == 1
    assert json.loads(rec[0].payload_json) == {"name": "no-id"}
    assert still_dead.count() == 1


def test_metrics_collector_streaming_and_batch(spark, tmp_path):
    import time
    from streamforge_spark.metrics import MetricsCollector, batch_observation
    from streamforge_spark.operators.observability import online_observer
    from streamforge_spark.streaming.sources import file_stream
    from pyspark.sql import types as T
    # batch: Observation counters
    df = spark.range(10).withColumn("flag", F.col("id") % 2 == 0)
    df, obs = batch_observation(df, [("evens", F.col("flag"))])
    df.write.format("noop").mode("overwrite").save()
    assert obs.get == {"events_total": 10, "evens": 5}
    # streaming: listener accumulates observe() metrics per micro-batch
    src = tmp_path / "metrics_in"
    src.mkdir()
    (src / "b0.txt").write_text("a\nb\n\n")
    collector = MetricsCollector()
    spark.streams.addListener(collector)
    try:
        stream = file_stream(spark, str(src),
                             T.StructType([T.StructField("value", T.StringType())]),
                             fmt="text")
        observed = online_observer(
            stream, [("nonempty", F.length("value") > 0)], observe_name="ingest")
        q = (observed.writeStream.format("memory").queryName("metrics_out")
             .outputMode("append").start())
        q.processAllAvailable()
        q.stop()
        for _ in range(50):           # listener delivery is async
            if collector.get("ingest", "events_total") >= 3:
                break
            time.sleep(0.2)
        # 3 lines in the file (one blank); the named check counts 2
        assert collector.get("ingest", "events_total") == 3
        assert collector.get("ingest", "nonempty") == 2
        text = collector.prometheus_text()
        assert "streamforge_ingest_events_total 3" in text
    finally:
        spark.streams.removeListener(collector)

