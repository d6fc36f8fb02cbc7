#!/usr/bin/env python
"""Streaming-throughput microbench: rate source -> synthetic CDC
envelope -> filter unknown -> dedup-within-watermark -> noop-ish
foreachBatch. Prints one JSON line with sustained rows/sec.

The reference publishes no throughput numbers (BASELINE.md); this
pins ours on the flagship stateful chain. Run:
  SPARK_GRAFT_CPUS=8 python tools/stream_bench.py [rows_per_sec] [secs]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from streamforge_spark.envelope import normalize_op
from streamforge_spark.session import get_spark
from streamforge_spark.streaming.dedup import streaming_dedup
from streamforge_spark.streaming.sources import rate_stream


def main() -> None:
    rps = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    secs = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    raw = rate_stream(spark, rows_per_second=rps)
    env = raw.select(
        F.col("timestamp").alias("event_time"),
        normalize_op(F.element_at(
            F.array(F.lit("c"), F.lit("u"), F.lit("d"), F.lit("other")),
            (F.col("value") % 4 + 1).cast("int"))).alias("operation"),
        F.col("value").cast("string").alias("primary_key"),
        (F.col("value") % 100_000).cast("string").alias("dedup_bucket"),
    )
    chain = streaming_dedup(
        env.filter(F.col("operation") != "unknown"),
        ["primary_key"], "event_time", ttl="30 seconds")

    counted = {"n": 0}

    def sink(batch, _bid):
        counted["n"] += batch.count()

    q = (chain.writeStream.foreachBatch(sink)
         .option("checkpointLocation", "/tmp/stream_bench_ckpt_" + str(time.time_ns()))
         .start())
    t0 = time.perf_counter()
    time.sleep(secs)
    q.stop()
    wall = time.perf_counter() - t0
    progress = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
    in_rows = sum(p["numInputRows"] for p in progress)
    print(json.dumps({
        "metric": "streaming_cdc_chain_rows_per_sec",
        "value": round(in_rows / wall, 1),
        "unit": "rows/sec",
        "configured_rps": rps,
        "input_rows": in_rows,
        "emitted_rows": counted["n"],
        "wall_s": round(wall, 1),
        "batches": len(progress),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
