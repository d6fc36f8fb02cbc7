"""Shared helpers for oracle-checked queries.

Float-parity strategy: any aggregate over monetary/2-decimal doubles is
computed as an integer-scaled BIGINT sum (exact in both Spark and
DuckDB) and only converted to DOUBLE at the end with the identical IEEE
operation sequence — so value hashes match bit-for-bit regardless of
parallel summation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streamforge_spark.io import load
from streamforge_spark.session import tune


def prep(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Tune the (possibly driver-owned) session and load tables."""
    tune(spark)
    return [load(spark, sf_dir, n) for n in names]


def scaled_sum(col: Column, scale: int = 100) -> Column:
    """Exact sum of a fixed-decimal double: scale to integer units,
    sum as BIGINT, convert back to DOUBLE.

    Spark:  CAST(SUM(CAST(ROUND(x*scale) AS BIGINT)) AS DOUBLE)/scale
    DuckDB oracle: the literally identical expression — see
    ``sql_scaled_sum``. The per-row ROUND lands ~1e-9 from an integer,
    never near .5, so HALF_UP vs half-away is moot.
    """
    return F.sum(F.round(col * scale).cast("long")).cast("double") / float(scale)


def sql_scaled_sum(expr: str, scale: int = 100) -> str:
    return f"CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS DOUBLE) / {float(scale)}"


# The StreamEnvelop adapter over the events fixture, as a DuckDB CTE —
# must stay in lockstep with envelope.envelope_from_events.
ENVELOPE_CTE = """
envelope AS (
  SELECT event_id,
         CASE WHEN event_type = 'signup' THEN 'insert'
              WHEN event_type IN ('purchase', 'click') THEN 'update'
              WHEN event_type = 'error' THEN 'delete'
              ELSE 'unknown' END AS operation,
         'events' AS source,
         props AS payload_json,
         ts AS event_time,
         ts AS processed_time,
         CASE WHEN event_id % 5 <> 0 THEN 'trace-' || CAST(event_id AS VARCHAR) END AS trace_id,
         CAST(user_id AS VARCHAR) AS primary_key,
         value,
         event_type
  FROM events
)
"""
