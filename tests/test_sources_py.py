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
