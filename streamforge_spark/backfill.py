"""Resumable chunked backfill: replay a date-ranged transformation in
idempotent partition-scoped chunks with a completion ledger.

The operational gap this fills: a 100 TB historical reprocess cannot
run as one job — it runs as hundreds of partition-scoped jobs over
days, surviving crashes, cluster preemption, and code redeploys.  The
engine-side primitives that make that safe are exactly the reference's
idempotent-sink discipline (MongoSinkBuilder upsert semantics,
MongoSinkBuilder.java:104-139) applied to batch:

- each chunk writes via ``partitionOverwriteMode=dynamic`` so a re-run
  replaces ONLY its own partitions (idempotent per chunk);
- a ledger marker (`_backfill/<chunk>`) commits AFTER the chunk's
  write succeeds; on resume, ledgered chunks are skipped without
  touching data;
- a chunk is the unit of atomicity: a crash mid-chunk leaves a
  partially-written partition that the re-run overwrites in full.

At 100 TB each chunk is a bounded, retryable job whose input scan is
partition-pruned to the chunk's date range (PushedFilters on the
partition column), so cost per chunk is proportional to the chunk.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), jvm


def backfill(spark: SparkSession, *,
             transform: Callable[[SparkSession, str, str], DataFrame],
             target: str, partition_col: str,
             chunks: list[tuple[str, str]],
             ledger: str | None = None) -> dict:
    """Run ``transform(spark, lo, hi)`` for each ``[lo, hi)`` chunk and
    write the result to ``target`` partitioned by ``partition_col``,
    skipping chunks already recorded in the ledger.

    Returns {"run": [...], "skipped": [...]} chunk labels.
    """
    ledger = ledger or f"{target.rstrip('/')}/_backfill"
    fs, jvm = _fs(spark, ledger)
    run, skipped = [], []
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for lo, hi in chunks:
            label = f"{lo}__{hi}"
            marker = jvm.org.apache.hadoop.fs.Path(f"{ledger}/{label}")
            if fs.exists(marker):
                skipped.append(label)
                continue
            df = transform(spark, lo, hi)
            if partition_col not in df.columns:
                raise ValueError(
                    f"transform output lacks partition column {partition_col!r}")
            (df.write.partitionBy(partition_col)
             .mode("overwrite").parquet(target))
            fs.create(marker, True).close()   # commit AFTER the write
            run.append(label)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {"run": run, "skipped": skipped}
