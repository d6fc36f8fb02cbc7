"""Observability operators.

Reference (§2.10): LatencyDetector (e2e latency gauge + threshold
alert), MetadataDecorator (per-stage trace stamps into the metadata
map), OnlineObserver (named quality-check counters),
FlowDisruptionDetector (per-key stream-silence alarm).

Spark-first: latency/health ride on columns + ``df.observe`` (exported
via QueryExecutionListener / StreamingQueryListener — the analog of
the reference's Prometheus counters, core/metric/Metrics.java);
silence detection in batch is a per-key max-gap report, in streaming a
ProcessingTimeTimeout stateful op (streamforge_spark.streaming).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latency_detector(df: DataFrame, event_time_col: str,
                     threshold_seconds: int = 30,
                     now: Column | None = None,
                     observe_name: str | None = None) -> DataFrame:
    """Stamp per-record e2e latency and (optionally) observe max/over-
    threshold counters (LatencyDetector.java:26-79; 30s threshold in
    MongoToKafkaJob.java:82).

    ``now`` defaults to current_timestamp(); pass a deterministic
    Column for oracle-checked batch runs.
    """
    now = now if now is not None else F.current_timestamp()
    df = df.withColumn(
        "latency_ms",
        (F.unix_micros(now) - F.unix_micros(F.col(event_time_col))) / F.lit(1000.0),
    )
    if observe_name:
        df = df.observe(
            observe_name,
            F.max("latency_ms").alias("e2e_latency_ms_max"),
            F.count(F.when(F.col("latency_ms") > threshold_seconds * 1000, 1))
            .alias("latency_alerts"),
        )
    return df


def metadata_decorator(df: DataFrame, stage_name: str,
                       metadata_col: str = "metadata",
                       processed_at: Column | None = None) -> DataFrame:
    """Inject per-stage trace stamps into the metadata map
    (MetadataDecorator.java:71-82): stage.<name>.partition and
    stage.<name>.processedAt. Task identity ≈ spark_partition_id()."""
    processed_at = processed_at if processed_at is not None else F.current_timestamp()
    stamps = F.create_map(
        F.lit(f"stage.{stage_name}.partition"),
        F.spark_partition_id().cast("string"),
        F.lit(f"stage.{stage_name}.processedAt"),
        processed_at.cast("string"),
    )
    existing = F.coalesce(
        F.col(metadata_col),
        F.create_map().cast("map<string,string>"),
    )
    return df.withColumn(metadata_col, F.map_concat(existing, stamps))


def online_observer(df: DataFrame, checks: list[tuple[str, Column]],
                    observe_name: str = "health") -> DataFrame:
    """Named quality-check counters (OnlineObserver.java:21-58):
    events_total + one counter per predicate. Pass-through."""
    return df.observe(
        observe_name,
        F.count(F.lit(1)).alias("events_total"),
        *[F.count(F.when(pred, 1)).alias(name) for name, pred in checks],
    )


def health_report(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """Materialized (queryable) form of online_observer: a one-row
    DataFrame of the same counters — used for oracle checks."""
    return df.agg(
        F.count(F.lit(1)).alias("events_total"),
        *[F.count(F.when(pred, 1)).alias(name) for name, pred in checks],
    )


def flow_silence_report(df: DataFrame, key_col: str, time_col: str,
                        timeout_seconds: int = 300,
                        order_tiebreak: str | None = None) -> DataFrame:
    """Batch analog of FlowDisruptionDetector.java:61-89: per key,
    the largest inter-event gap and whether it breached the timeout.

    The streaming form (true per-key silence *alarms* while the stream
    is live) is streamforge_spark.streaming.flow_disruption — it has no
    batch equivalent (SURVEY §7.5#5); this report is the auditable
    batch view of the same signal.
    """
    order = [time_col] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_us = F.unix_micros(F.col(time_col)) - F.unix_micros(F.lag(time_col).over(w))
    return (
        df.withColumn("_gap_us", gap_us)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            (F.max("_gap_us") / 1000000.0).alias("max_gap_sec"),
            (F.coalesce(F.max("_gap_us"), F.lit(0)) > timeout_seconds * 1000000)
            .alias("disrupted"),
        )
    )
