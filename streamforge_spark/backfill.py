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


def publish_wap(spark: SparkSession, df: DataFrame, table_root: str,
                checks: list[tuple[str, str]],
                version: str) -> dict:
    """Write-Audit-Publish: stage the dataset, audit it with SQL
    predicates, and only then atomically flip the `_current` pointer —
    readers NEVER observe an unaudited or half-written version.

    ``checks`` are (name, violation_predicate_sql): a check fails when
    any staged row satisfies the predicate.  On failure the staged
    data stays on disk under ``_staging`` for debugging and the
    previous published version keeps serving.

    This is the batch twin of the streaming DLQ gate (SchemaEnforcer/
    ConstraintEnforcer, SURVEY §2.9): same rules, but the blast-radius
    control is versioned publication instead of row routing.  At
    100 TB the expensive parts (write, audit scan) happen OUTSIDE the
    serving path; the publish itself is one small pointer-file write.

    Returns {"published": bool, "version": str, "violations": {...}}.
    """
    staging = f"{table_root.rstrip('/')}/_staging/{version}"
    final = f"{table_root.rstrip('/')}/v={version}"
    df.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    violations = {}
    for name, predicate in checks:
        violations[name] = staged.where(predicate).count()
    if any(violations.values()):
        return {"published": False, "version": version,
                "violations": violations}
    fs, jvm = _fs(spark, table_root)
    final_p = jvm.org.apache.hadoop.fs.Path(final)
    # Refuse to re-publish an existing version id: Hadoop rename into
    # an existing directory either fails or NESTS staging inside it,
    # after which the pointer would serve stale files while reporting
    # success.  The operator must pick a fresh version id.
    if fs.exists(final_p):
        raise FileExistsError(
            f"version {version!r} already published at {final}; "
            f"re-publishing requires a new version id")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(staging), final_p):
        raise OSError(f"rename {staging} -> {final} failed")
    # pointer flip: write tmp then rename over _current with OVERWRITE
    # (FileContext posix-rename — atomic on HDFS/local, no window where
    # the pointer is absent; on S3 use a manifest commit service)
    ptr_tmp = jvm.org.apache.hadoop.fs.Path(
        f"{table_root.rstrip('/')}/_current.tmp")
    out = fs.create(ptr_tmp, True)
    out.write(bytearray(version.encode()))
    out.close()
    ptr = jvm.org.apache.hadoop.fs.Path(f"{table_root.rstrip('/')}/_current")
    gw = spark.sparkContext._gateway
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        ptr.toUri(), spark.sparkContext._jsc.hadoopConfiguration())
    opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
    opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    fc.rename(ptr_tmp, ptr, opts)  # raises (void method) on failure
    return {"published": True, "version": version, "violations": violations}


def read_published(spark: SparkSession, table_root: str) -> DataFrame:
    """Read the currently published version via the `_current` pointer."""
    fs, jvm = _fs(spark, table_root)
    ptr = jvm.org.apache.hadoop.fs.Path(f"{table_root.rstrip('/')}/_current")
    stream = fs.open(ptr)
    try:
        version = bytes(
            stream.readAllBytes() if hasattr(stream, "readAllBytes")
            else []).decode() or None
    finally:
        stream.close()
    if not version:
        raise FileNotFoundError(f"no published version under {table_root}")
    return spark.read.parquet(f"{table_root.rstrip('/')}/v={version}")
