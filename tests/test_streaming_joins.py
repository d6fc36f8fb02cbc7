"""Streaming join forms (SURVEY §2.7): time-bounded stream-stream join
with watermarks (DynamicJoiner) and per-micro-batch stream-static
enrichment (StaticJoiner)."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streamforge_spark.streaming.sources import file_stream

PAY_SCHEMA = T.StructType([
    T.StructField("pid", T.LongType()),
    T.StructField("key", T.StringType()),
    T.StructField("t", T.TimestampType()),
])
ORD_SCHEMA = T.StructType([
    T.StructField("oid", T.LongType()),
    T.StructField("key", T.StringType()),
    T.StructField("t", T.TimestampType()),
])


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="sf_sj_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_stream_time_bounded_join(spark, workdir):
    # OrderPaymentJoinJob.java:62-77 — orders joined to payments within
    # a 10-minute TTL, LEFT emission for unmatched orders at expiry
    lsrc, rsrc = f"{workdir}/orders", f"{workdir}/payments"
    # the global watermark is the MIN across inputs (the reference's
    # fan-in alignment) — flush sentinels go on BOTH sides so outer
    # emission fires
    spark.createDataFrame([
        (1, "o1", ts("2024-01-01 10:00:00")),
        (2, "o2", ts("2024-01-01 10:00:00")),     # will stay unmatched
        (3, "o3", ts("2024-01-01 10:01:00")),
        (4, "yy", ts("2024-02-01 00:00:00")),     # watermark flush (left)
    ], ORD_SCHEMA).coalesce(1).write.mode("append").parquet(lsrc)
    spark.createDataFrame([
        (10, "o1", ts("2024-01-01 10:05:00")),    # within TTL
        (11, "o3", ts("2024-01-01 10:30:00")),    # outside TTL
        (12, "zz", ts("2024-02-01 00:00:00")),    # watermark flush (right)
    ], PAY_SCHEMA).coalesce(1).write.mode("append").parquet(rsrc)

    orders = (file_stream(spark, lsrc, ORD_SCHEMA)
              .withWatermark("t", "5 seconds").alias("o"))
    pays = (file_stream(spark, rsrc, PAY_SCHEMA)
            .withWatermark("t", "5 seconds").alias("p"))
    joined = orders.join(
        pays,
        F.expr("""o.key = p.key AND
                  p.t BETWEEN o.t - INTERVAL 10 MINUTES
                          AND o.t + INTERVAL 10 MINUTES"""),
        "leftOuter",
    ).select(F.col("o.oid"), F.col("p.pid"))
    q = (joined.writeStream.format("memory").queryName("ssj_out")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.oid, r.pid) for r in spark.sql("select * from ssj_out").collect()}
    assert (1, 10) in got                 # matched within TTL
    assert (2, None) in got               # unmatched -> outer emission
    assert (3, None) in got               # payment outside TTL -> outer
    assert (3, 11) not in got


def test_stream_static_broadcast_enrichment(spark, workdir):
    # StaticJoiner as Spark's stream-static join: the static side is
    # re-read per micro-batch (broadcast-state refresh); misses pass
    # through (KafkaToMongoJob.java:75-93)
    src, refp = f"{workdir}/facts", f"{workdir}/ref"
    fact_schema = T.StructType([
        T.StructField("fid", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("t", T.TimestampType()),
    ])
    spark.createDataFrame([("a", "A-name")], "rkey string, label string") \
        .write.mode("overwrite").parquet(refp)
    spark.createDataFrame([
        (1, "a", ts("2024-01-01 10:00:00")),
        (2, "miss", ts("2024-01-01 10:00:01")),
    ], fact_schema).coalesce(1).write.mode("append").parquet(src)
    # the refresh idiom: re-read the reference INSIDE foreachBatch so
    # every micro-batch sees the latest snapshot (a plain stream-static
    # join caches the file listing at plan time — updates to the path
    # would go unseen / break)
    from streamforge_spark.operators.joins import static_joiner
    results: list = []

    def enrich_batch(batch_df, batch_id):
        ref = batch_df.sparkSession.read.parquet(refp)
        out = static_joiner(batch_df, ref, on=batch_df["key"] == ref["rkey"])
        results.extend(out.select("fid", "label").collect())

    facts = file_stream(spark, src, fact_schema)
    q = facts.writeStream.foreachBatch(enrich_batch) \
        .option("checkpointLocation", f"{workdir}/ck").start()
    q.processAllAvailable()
    got = {r.fid: r.label for r in results}
    assert got == {1: "A-name", 2: None}   # enriched + miss passthrough

    # static-side update visible to the NEXT micro-batch (slowly
    # changing ref: latest value wins, StaticJoiner.java:155-170)
    spark.createDataFrame([("a", "A-v2"), ("miss", "M-name")],
                          "rkey string, label string") \
        .write.mode("overwrite").parquet(refp)
    spark.createDataFrame([(3, "a", ts("2024-01-01 10:02:00")),
                           (4, "miss", ts("2024-01-01 10:02:01"))],
                          fact_schema).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {r.fid: r.label for r in results}
    assert got[3] == "A-v2" and got[4] == "M-name"


def test_streaming_range_join_via_buckets(spark, workdir):
    # a pure range join (no natural equi key) is not plannable
    # stream-stream — the interval_join bucket id IS the equi key that
    # makes it legal: points and intervals watermark, equi-join on the
    # epoch bucket, exact [start, end) residual as the time constraint
    psrc, isrc = f"{workdir}/points", f"{workdir}/intervals"
    pts_schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("ts", T.TimestampType())])
    iv_schema = T.StructType([
        T.StructField("iid", T.LongType()),
        T.StructField("s", T.TimestampType()), T.StructField("e", T.TimestampType())])
    spark.createDataFrame([
        (1, ts("2024-01-01 10:00:30")),
        (2, ts("2024-01-01 10:07:00")),
        (3, ts("2024-01-01 10:20:00")),      # matches nothing
    ], pts_schema).coalesce(1).write.mode("append").parquet(psrc)
    spark.createDataFrame([
        (100, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
        (200, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:08:00")),
    ], iv_schema).coalesce(1).write.mode("append").parquet(isrc)

    bs = 300
    pts = (file_stream(spark, psrc, pts_schema)
           .withWatermark("ts", "10 seconds")
           .withColumn("_b", F.floor(F.unix_timestamp("ts") / bs).cast("long")))
    ivs = (file_stream(spark, isrc, iv_schema)
           .withWatermark("e", "10 seconds")
           .withColumn("_b", F.explode(F.sequence(
               F.floor(F.unix_timestamp("s") / bs).cast("long"),
               F.floor(F.unix_timestamp("e") / bs).cast("long")))))
    joined = pts.join(
        ivs,
        (pts["_b"] == ivs["_b"]) & (pts["ts"] >= ivs["s"]) & (pts["ts"] < ivs["e"]),
        "inner").select("id", "iid")
    q = (joined.writeStream.format("memory").queryName("range_out")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.id, r.iid) for r in spark.sql("select * from range_out").collect()}
    assert got == {(1, 100), (2, 100), (2, 200)}


def test_streaming_interval_overlap_via_buckets(spark, workdir):
    # interval x interval overlap is equally legal stream-stream: both
    # sides explode to epoch-bucket cells (the equi key), watermark on
    # their end times, exact closed-closed overlap as the residual;
    # duplicates from multi-cell pairs collapse downstream
    lsrc, rsrc = f"{workdir}/lsess", f"{workdir}/rinc"
    l_schema = T.StructType([
        T.StructField("sid", T.LongType()),
        T.StructField("s", T.TimestampType()), T.StructField("e", T.TimestampType())])
    r_schema = T.StructType([
        T.StructField("iid", T.LongType()),
        T.StructField("s", T.TimestampType()), T.StructField("e", T.TimestampType())])
    spark.createDataFrame([
        (1, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
        (2, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:05:00")),  # no overlap
    ], l_schema).coalesce(1).write.mode("append").parquet(lsrc)
    spark.createDataFrame([
        (100, ts("2024-01-01 10:20:00"), ts("2024-01-01 10:40:00")),
        (200, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:31:00")),  # touches s1
    ], r_schema).coalesce(1).write.mode("append").parquet(rsrc)

    bs = 600

    def cells(df):
        return df.withColumn("_b", F.explode(F.sequence(
            F.floor(F.unix_timestamp("s") / bs).cast("long"),
            F.floor(F.unix_timestamp("e") / bs).cast("long"))))

    left = (cells(file_stream(spark, lsrc, l_schema)
                  .withWatermark("e", "10 seconds"))
            .withColumnRenamed("s", "ls").withColumnRenamed("e", "le"))
    right = (cells(file_stream(spark, rsrc, r_schema)
                   .withWatermark("e", "10 seconds"))
             .withColumnRenamed("s", "rs").withColumnRenamed("e", "re"))
    joined = left.join(
        right,
        (left["_b"] == right["_b"]) & (left["ls"] <= right["re"])
        & (right["rs"] <= left["le"]),
        "inner").select("sid", "iid")
    q = (joined.writeStream.format("memory").queryName("overlap_out")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.sid, r.iid) for r in spark.sql("select * from overlap_out").collect()}
    assert got == {(1, 100), (1, 200)}
