"""Capability-surplus queries — relational surface the reference lacks
entirely (SURVEY §2.5 'absent' set ops, §2.8 'absent' windows/ranking,
§2.12 'no scalar function library'), all built-in for the Spark
engine. Registered so the inventory is graded, not just claimed."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from streamforge_spark.queries.common import prep, scaled_sum, sql_scaled_sum
from streamforge_spark.registry import query


@query(
    "set_except",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 200
""",
)
def set_except(spark, sf_dir):
    """EXCEPT (set difference): users with high-value purchases and no
    high-value errors (the value filter keeps both sets sparse so the
    difference is non-trivial on the fixture)."""
    (events,) = prep(spark, sf_dir, "events")
    hi = F.col("value") > 200
    # subtract = EXCEPT DISTINCT (set semantics; exceptAll would keep
    # multiplicity and leave users who error less often than they buy)
    return (events.filter((F.col("event_type") == "purchase") & hi).select("user_id")
            .subtract(events.filter((F.col("event_type") == "error") & hi).select("user_id")))


@query(
    "set_intersect",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'signup'
""",
)
def set_intersect(spark, sf_dir):
    """INTERSECT: users who both signed up and purchased."""
    (events,) = prep(spark, sf_dir, "events")
    return (events.filter(F.col("event_type") == "purchase").select("user_id")
            .intersect(events.filter(F.col("event_type") == "signup").select("user_id")))


@query(
    "rank_events",
    oracle="""
SELECT event_id, user_id, value,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       lag(value) OVER w AS prev_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
""",
)
def rank_events(spark, sf_dir):
    """Ranking/analytic window functions (rank, dense_rank, lag) —
    absent in the reference (§2.8)."""
    (events,) = prep(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return events.select(
        "event_id", "user_id", "value",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.lag("value").over(w).alias("prev_value"),
    )


@query(
    "cube_events",
    oracle=f"""
SELECT event_type, user_id % 10 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
       {sql_scaled_sum('value')} AS total_value
FROM events GROUP BY CUBE (event_type, user_id % 10)
""",
)
def cube_events(spark, sf_dir):
    """CUBE grouping sets over (event_type, user bucket)."""
    (events,) = prep(spark, sf_dir, "events")
    return (
        events.withColumn("bucket", F.col("user_id") % 10)
        .cube("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             scaled_sum(F.col("value")).alias("total_value"))
    )


@query(
    "distinct_agg",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""",
)
def distinct_agg(spark, sf_dir):
    """Distinct aggregation (two-phase under the hood) — absent in the
    reference's aggregation surface."""
    (events,) = prep(spark, sf_dir, "events")
    return (events.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("distinct_users"),
                 F.count(F.lit(1)).alias("n")))


@query(
    "scalar_functions",
    oracle="""
SELECT event_id,
       upper(event_type) AS et_upper,
       substring(event_type, 1, 3) AS et_pre,
       CAST(length(event_type) AS BIGINT) AS et_len,
       concat(event_type, '_', CAST(user_id AS VARCHAR)) AS tagged,
       CAST(EXTRACT(YEAR FROM ts) AS INTEGER) AS y,
       CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS h,
       abs(value - 100.0) AS dist,
       greatest(value, 50.0) AS floored
FROM events
""",
)
def scalar_functions(spark, sf_dir):
    """String/date/math scalar library — the reference has none
    (SURVEY §2.12); every call here is a codegen'd builtin."""
    (events,) = prep(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.upper("event_type").alias("et_upper"),
        F.substring("event_type", 1, 3).alias("et_pre"),
        F.length("event_type").cast("long").alias("et_len"),
        F.concat(F.col("event_type"), F.lit("_"), F.col("user_id").cast("string")).alias("tagged"),
        F.year("ts").alias("y"),
        F.hour("ts").alias("h"),
        F.abs(F.col("value") - 100.0).alias("dist"),
        F.greatest(F.col("value"), F.lit(50.0)).alias("floored"),
    )
