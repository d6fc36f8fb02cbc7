"""Flagship pipeline: the reference's core CDC chain on Spark.

MongoToKafkaJob (job/cdc/MongoToKafkaJob.java:51-91) +
UserSessionAnalysisJob (job/session/UserSessionAnalysisJob.java:61-74):
CDC-envelope decode -> filter unknown ops -> dedup(primary_key,
event_time) -> sessionize(30 min gap) -> session stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamforge_spark.envelope import envelope_from_events
from streamforge_spark.io import load
from streamforge_spark.operators.dedup import deduplicator
from streamforge_spark.operators.filters import filter_interceptor
from streamforge_spark.operators.sessions import ordered_fold, session_analyzer
from streamforge_spark.queries.common import scaled_sum
from streamforge_spark.session import tune


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load(spark, sf_dir, "events")
    env = envelope_from_events(events)
    env = filter_interceptor(env, F.col("operation") != "unknown",
                             observe_name="flagship_filter")
    env = deduplicator(env, ["primary_key", "event_time"], ["event_id"])
    return session_analyzer(
        env, key_col="primary_key", time_col="event_time", gap="30 minutes",
        agg_exprs=[
            ordered_fold("event_time", "event_id", "operation").alias("ops"),
            scaled_sum(F.col("value")).alias("total_value"),
        ],
    )
