"""Custom Python DataSource (sources_py.py): bounded-snapshot batch
reads and the resume-token streaming contract, proven by killing and
restarting a checkpointed query."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from streamforge_spark.sources_py import SyntheticCdcDataSource, _row


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="sf_ds_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(SyntheticCdcDataSource)
    return spark


def test_batch_snapshot_partitions_and_content(registered):
    spark = registered
    df = (spark.read.format("synthetic_cdc")
          .option("n", 57).option("parts", 4).load())
    assert df.rdd.getNumPartitions() >= 4  # range splits parallelize
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [_row(i) for i in range(57)]  # exact deterministic feed


def test_change_stream_resume_token_no_dups_no_gaps(registered, workdir):
    spark = registered
    out, ckpt = f"{workdir}/cdc_out", f"{workdir}/cdc_ckpt"

    def run(max_id):
        q = (spark.readStream.format("synthetic_cdc")
             .option("batch_size", 40).option("max_id", max_id).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run(120)
    assert spark.read.parquet(out).count() == 120
    # restart against a grown feed: the checkpointed offset (resume
    # token) makes the second query read ONLY ids 120..199
    run(200)
    ids = sorted(r.id for r in spark.read.parquet(out).collect())
    assert ids == list(range(200))  # no duplicates, no gaps


def test_cdc_source_feeds_pipeline_chain(registered, workdir):
    # the custom connector composes with the engine's own operators:
    # stream -> op-normalize -> dedup(primary_key) -> latest-per-key
    # compacted view, end-to-end through a checkpointed query
    from pyspark.sql import functions as F
    from streamforge_spark.envelope import normalize_op
    spark = registered
    out, ckpt = f"{workdir}/chain_out", f"{workdir}/chain_ckpt"
    stream = (spark.readStream.format("synthetic_cdc")
              .option("batch_size", 50).option("max_id", 150).load()
              .withColumn("operation", normalize_op(F.col("operation"))))

    def upsert(batch, batch_id):
        batch.write.mode("append").parquet(out)

    q = (stream.writeStream.foreachBatch(upsert)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 150
    # ops normalized through the reference op map (insert/update/delete
    # cycle by id)
    ops = {r.id % 3: r.operation for r in got.collect()}
    assert ops == {0: "insert", 1: "update", 2: "delete"}
    # latest-per-key compacted view over the connector output
    latest = (got.withColumn(
        "rn", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("primary_key").orderBy(F.col("seq").desc())))
        .filter(F.col("rn") == 1))
    assert latest.count() == 50  # one row per pk
    assert latest.filter(F.col("id") < 100).count() == 0  # all from last cycle
