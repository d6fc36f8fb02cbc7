"""Event-time session analysis.

Reference: ``pattern/session/SessionAnalyzer.java:63-185`` — keyed
event-time session windows (gap, default 30 min), bounded
out-of-orderness watermark, custom list-fold aggregator, emitting
``SessionResult{key, sessionStart, sessionEnd, eventCount, duration,
result}`` (SessionResult.java:7-13).

Spark-first: ``F.session_window`` (built-in since 3.2) + ``agg``. The
custom Aggregator<T,R> slot maps to agg expressions; ordered fold
semantics come from sorting collected (ts, payload) structs — still
JVM-side column algebra, no Python in the loop.

Scale notes: one hash exchange on the session key; state (streaming)
bounded by the watermark. Session assignment itself is gap-merge,
computed inside the aggregation — no self-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


_DURATION_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _duration_seconds(d: str) -> int:
    value, unit = d.strip().split()
    return int(value) * _DURATION_SECONDS[unit.lower()]


def session_analyzer(df: DataFrame, key_col: str, time_col: str,
                     gap: str = "30 minutes",
                     agg_exprs: Sequence[Column] = (),
                     watermark: str | None = None,
                     allowed_lateness: str | None = None) -> DataFrame:
    """Sessionize per key with the given inactivity gap.

    Emits the SessionResult shape: key, session_start, session_end,
    event_count, duration_sec (+ any custom ``agg_exprs``).
    session_end = last event time (not last+gap), matching the
    reference's SessionResult which reports real event extents.

    ``allowed_lateness`` is the reference's second lateness knob
    (SessionAnalyzer.java:76-78): events later than the out-of-
    orderness ``watermark`` but within ``watermark + allowed_lateness``
    must still merge into their session. Spark has ONE state-retention
    knob (the watermark), so the two compose additively — identical
    accept/drop behavior and state horizon; the difference is
    emission, where Flink re-fires a closed window on a late merge
    while Spark surfaces the merged session in update mode (documented
    semantic shift, SURVEY §7.5).
    """
    if df.isStreaming:
        if watermark or allowed_lateness:
            total = (_duration_seconds(watermark or "0 seconds")
                     + _duration_seconds(allowed_lateness or "0 seconds"))
            df = df.withWatermark(time_col, f"{total} seconds")
        # streaming: F.session_window — Spark's stateful session merge
        # is the only watermark-aware implementation.  session_start/
        # end are DERIVED from the merged window (start == first event
        # ts; end == last event ts + gap, exactly — microsecond-long
        # arithmetic) instead of min/max aggregates: two fewer
        # aggregation buffers in every state row.
        gap_us = _duration_seconds(gap) * 1_000_000
        end_ts = F.timestamp_micros(
            F.unix_micros(F.col("session_window.end")) - F.lit(gap_us))
        agged = df.groupBy(
            F.col(key_col), F.session_window(F.col(time_col), gap)).agg(
            F.count(F.lit(1)).alias("event_count"), *agg_exprs)
        extra = [c for c in agged.columns
                 if c not in (key_col, "session_window", "event_count")]
        return agged.select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            end_ts.alias("session_end"),
            "event_count",
            (F.unix_micros(end_ts)
             - F.unix_micros(F.col("session_window.start")))
            .alias("duration_us"),
            *[F.col(c) for c in extra],
        )
    # Batch: gaps-and-islands instead of F.session_window.  Measured
    # (SHUFFLE.md): the session_window plan ships one PARTIAL-AGG row
    # per event through the exchange — each carrying the 16-byte
    # session_window struct, a count buffer, and list/sum buffers —
    # 1.81x the scanned bytes at sf0.01.  Here the exchange carries
    # the RAW (key, ts, fold-input) row once; the two window passes
    # (lag -> gap flags, then running sum -> session ids) and the
    # final groupBy all reuse the same hashpartitioning(key) exchange
    # and its sort — ONE shuffle total, no per-row session structs or
    # buffers crossing.  Session-break rule is STRICT ts - prev > gap,
    # identical to session_window's merge-at-exactly-gap semantics
    # (pinned by test_session_window_exact_gap_boundary and the
    # batch==streaming equivalence test).
    gap_us = _duration_seconds(gap) * 1_000_000
    w = Window.partitionBy(key_col).orderBy(time_col)
    ts_us = F.unix_micros(F.col(time_col))
    prev_us = F.unix_micros(F.lag(F.col(time_col)).over(w))
    df = (df.where(F.col(time_col).isNotNull())   # session_window parity
          .withColumn("_new_sess",
                      F.when(prev_us.isNull() | ((ts_us - prev_us) > gap_us),
                             F.lit(1)).otherwise(F.lit(0))))
    df = df.withColumn(
        "_sess_id",
        F.sum("_new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    agged = df.groupBy(F.col(key_col), F.col("_sess_id")).agg(
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        F.count(F.lit(1)).alias("event_count"), *agg_exprs)
    extra = [c for c in agged.columns
             if c not in (key_col, "_sess_id", "session_start",
                          "session_end", "event_count")]
    return agged.select(
        F.col(key_col), "session_start", "session_end", "event_count",
        (F.unix_micros(F.col("session_end"))
         - F.unix_micros(F.col("session_start"))).alias("duration_us"),
        *[F.col(c) for c in extra],
    )


def ordered_fold(time_col: str, tiebreak_col: str, value_col: str,
                 sep: str = ",") -> Column:
    """Aggregator slot: time-ordered concatenation of a column within
    the group (UserSessionAnalysisJob.java:64-70 comma-joins ops).

    collect_list order is nondeterministic under parallel aggregation,
    so sort (time, tiebreak, value) structs before joining — the
    deterministic analog of the reference's ordered list fold.
    """
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(
                F.col(time_col).alias("t"),
                F.col(tiebreak_col).alias("i"),
                F.col(value_col).alias("v"),
            ))),
            lambda s: s.v,
        ),
        sep,
    )
