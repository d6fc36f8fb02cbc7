"""Watermark-delay planning: derive ``withWatermark`` delays from the
feed's own lateness history instead of folklore constants.

The reference hard-codes its out-of-orderness dials — maxDrift=5s in
the fan-in (job/ingest/MergedIngestJob.java:55) and the session
analyzer's outOfOrderness (core/session/SessionAnalyzer.java:66-71) —
as blind configuration.  The batch face ``watermark_delay_planner``
(queries/timeseries.py) *prices* the dial; this module makes it an
*input*: :func:`planned_delay_seconds` measures the p-quantile arrival
lateness over a calibration window of the feed and the jobs consume it
through the ``WATERMARK_DELAY_MODE=derived`` config flag (jobs.py).

Scale shape: the naive "running event-time high-watermark in arrival
order" is a single global window — one partition, the classic scale
bug.  :func:`arrival_lateness` computes the SAME exact quantity with
two-level prefix maxima: value-range buckets over the numeric arrival
key (one broadcast scalar for the range), an exact running max WITHIN
each bucket (partition-parallel window), and a B-row rollup of
per-bucket maxima whose running max re-broadcasts as each bucket's
"all prior arrivals" high-watermark.  ``hw(i) = max(prior-bucket max,
within-bucket running max)`` — exact, no global sort, B≈256 rows on
the driver-side of nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def arrival_lateness(df: DataFrame, time_col: str, order_col: str,
                     buckets: int = 256) -> DataFrame:
    """``late_s`` per event: whole seconds the event arrived behind the
    running event-time high-watermark in ``order_col`` arrival order
    (0 for in-order arrivals).  ``order_col`` must be numeric and
    arrival-monotone — a Kafka offset, an ingest sequence, the
    fixture's event_id.  Ties in ``order_col`` are ordered
    arbitrarily within the tie; lateness is tie-stable because the
    running max is insensitive to permuting equal-order rows once both
    are included, and a tie's own contribution uses max-so-far
    INCLUDING the row itself only within its bucket window (matching
    watermark_delay_planner's ROWS UNBOUNDED PRECEDING convention).

    Exact two-level prefix max (module docstring): never a global
    single-partition sort.
    """
    rng = df.agg(F.min(F.col(order_col).cast("double")).alias("_lo"),
                 F.max(F.col(order_col).cast("double")).alias("_hi"))
    span = F.greatest(F.col("_hi") - F.col("_lo"), F.lit(1.0))
    bucketed = (df.crossJoin(F.broadcast(rng))
                .withColumn("_b", F.least(
                    F.floor((F.col(order_col).cast("double") - F.col("_lo"))
                            * buckets / span).cast("long"),
                    F.lit(buckets - 1)))
                .drop("_lo", "_hi")
                # two consumers (within-bucket window + per-bucket max
                # rollup): pin so the feed and the range scalar are
                # scanned once, not once per branch
                .localCheckpoint(eager=False))
    w_in = (Window.partitionBy("_b").orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t_us = F.unix_micros(F.col(time_col))
    within = bucketed.withColumn("_hw_in", F.max(t_us).over(w_in))
    # B-row rollup: running max of bucket maxima over STRICTLY PRIOR
    # buckets (shifted by one) — broadcast back as each bucket's
    # baseline high-watermark
    w_b = (Window.orderBy("_b")
           .rowsBetween(Window.unboundedPreceding, -1))
    prior = (bucketed.groupBy("_b").agg(F.max(t_us).alias("_bmax"))
             .select("_b", F.max("_bmax").over(w_b).alias("_hw_prior")))
    hw = F.greatest(F.col("_hw_in"),
                    F.coalesce(F.col("_hw_prior"), F.lit(0)))
    # hw >= t_us by construction (the within-bucket running max
    # includes the row itself), so truncation == floor here
    return (within.join(F.broadcast(prior), "_b")
            .withColumn("late_s",
                        ((hw - t_us) / F.lit(1_000_000)).cast("long"))
            .drop("_b", "_hw_in", "_hw_prior"))


def planned_delay_seconds(df: DataFrame, time_col: str, order_col: str,
                          quantile: float = 0.99, floor_s: int = 1,
                          cap_s: int = 86_400,
                          buckets: int = 256) -> int:
    """The watermark delay (whole seconds) admitting ~``quantile`` of
    the calibration feed: ceil of the lateness quantile, clamped to
    [floor_s, cap_s].  ``percentile_approx`` at accuracy 10000 — a
    config dial, not an exact statistic; the exact per-key profile is
    ``watermark_delay_planner``'s job.  The floor keeps a perfectly
    ordered calibration window from emitting a 0s watermark (which
    would drop ANY future disorder); the cap bounds streaming state
    when the calibration window contains a pathological straggler.
    """
    late = arrival_lateness(df, time_col, order_col, buckets=buckets)
    row = late.agg(F.ceil(F.percentile_approx(
        "late_s", float(quantile), 10_000)).alias("p")).first()
    p = int(row["p"]) if row and row["p"] is not None else 0
    return max(int(floor_s), min(int(cap_s), p))


def calibration_feed(spark: SparkSession, path: str) -> DataFrame:
    """Bounded BATCH read of a file-feed directory as parsed envelopes
    with a numeric ``_arrival`` order column.

    Arrival proxy for a file feed: (file path, line position) —
    lexicographic file names are the ingest batches for the
    directory-feed convention this repo's jobs use (batch0.txt,
    batch1.txt, ...), and line order within a file is the producer's
    append order.  A Kafka deployment would use the partition offset
    instead; the proxy is explicitly a calibration heuristic, not a
    delivery guarantee.

    The rank over (file, line) is a global sort of the CALIBRATION
    window only — bounded by construction (a day of history, not the
    corpus); the lateness math downstream stays partition-parallel.
    """
    from streamforge_spark.envelope import parse_stream_envelop
    raw = (spark.read.text(path)
           .select(F.col("value"),
                   F.input_file_name().alias("_file"),
                   F.monotonically_increasing_id().alias("_mid")))
    ok, _dlq = parse_stream_envelop(raw, passthrough_cols=("_file", "_mid"))
    w = Window.orderBy("_file", "_mid")
    return (ok.withColumn("_arrival", F.row_number().over(w))
            .drop("_file", "_mid"))
