"""Streaming time-series resampling.

The batch OHLC query (queries/timeseries.py::ohlc_daily) uses only
algebraic aggregates (min_by/max_by under a unique order key), so the
IDENTICAL agg spec runs under a streaming watermark — bars for a day
finalize once the watermark passes the day boundary, late events
within the watermark update their bar in place (update mode), and
state per key is one partial OHLC tuple, not the events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamforge_spark.queries.timeseries import ohlc_aggs


def streaming_ohlc(events: DataFrame, *, watermark: str = "1 day",
                   window: str = "1 day") -> DataFrame:
    """Watermarked per-user OHLC bars over event-time windows.

    At 100 TB/day rates the state store holds exactly one 6-field
    tuple per open (user, window) — the watermark bounds the number of
    open windows, and map-side partial aggregation compacts each
    micro-batch before the keyed state update."""
    cents = F.round(F.col("value") * 100).cast("long")
    src = (events.withWatermark("ts", watermark)
           .select("user_id", F.window("ts", window).alias("w"),
                   cents.alias("cents"), "ts", "event_id"))
    return (src.groupBy("user_id", "w")
            .agg(*ohlc_aggs())
            .select("user_id", F.col("w.start").alias("day"),
                    "open_cents", "high_cents", "low_cents", "close_cents",
                    "n_trades", "volume_cents"))
