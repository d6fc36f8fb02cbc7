"""Analytics capability-surplus queries (SURVEY §2.8 'absent' row).

The reference has no aggregation/join/sort/limit surface beyond session
folds — these TPC-H-style queries demonstrate (and bench) the full
relational surface our Spark engine gets for free: multi-way joins with
broadcast dims, grouped aggregation with map-side partials, rollup,
top-k. All monetary aggregates use exact integer-scaled sums
(queries.common) so value hashes match DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_spark.queries.common import prep, scaled_sum, sql_scaled_sum
from streamforge_spark.registry import query


def _disc_price_sum():
    """SUM(extendedprice * (1-discount)) exactly, in 1e-4 dollar units."""
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    h = F.round((1 - F.col("l_discount")) * 100).cast("long")
    return F.sum(cents * h).cast("double") / 10000.0


_SQL_DISC_PRICE = ("CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
                   "CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0")


@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_scaled_sum('l_quantity')} AS sum_qty,
       {sql_scaled_sum('l_extendedprice')} AS sum_base_price,
       {_SQL_DISC_PRICE} AS sum_disc_price,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)
                * CAST(ROUND((1 + l_tax) * 100) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
         / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary: grouped aggregation with
    map-side partials; the scan reads only the 7 referenced columns
    (column pruning) and the shipdate filter is pushed to parquet."""
    (lineitem,) = prep(spark, sf_dir, "lineitem")
    cents_p = F.round(F.col("l_extendedprice") * 100).cast("long")
    h_d = F.round((1 - F.col("l_discount")) * 100).cast("long")
    h_t = F.round((1 + F.col("l_tax")) * 100).cast("long")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    return (
        lineitem.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            scaled_sum(F.col("l_quantity")).alias("sum_qty"),
            scaled_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            (F.sum(cents_p * h_d).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(cents_p * h_d * h_t).cast("double") / 1000000.0).alias("sum_charge"),
            (F.sum(qty_c).cast("double") / 100.0 / F.count(F.lit(1)).cast("double"))
            .alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey AS l_orderkey, {_SQL_DISC_PRICE} AS revenue,
       o.o_orderdate AS o_orderdate, o.o_orderpriority AS o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3-style: 3-way join + group + top-k. customer is the
    small side -> broadcast; orders⨝lineitem shuffles on the order
    key; top-k is a TakeOrderedAndProject (no full sort)."""
    customer, orders, lineitem = prep(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") > "1997-01-01")
        .join(orders.filter(F.col("o_orderdate") < "1997-01-01"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_disc_price_sum().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle=f"""
SELECT n.n_name AS n_name, {_SQL_DISC_PRICE} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5-style: 6-way join; all dimension sides broadcast, only
    orders⨝lineitem shuffles."""
    customer, orders, lineitem, supplier, nation, region = prep(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    return (
        lineitem
        .join(orders.filter((F.col("o_orderdate") >= "1996-01-01")
                            & (F.col("o_orderdate") < "1997-01-01")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_disc_price_sum().alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6-style: pure filter + scalar aggregate; every predicate
    pushes to the parquet scan."""
    (lineitem,) = prep(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    h = F.round(F.col("l_discount") * 100).cast("long")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.02, 0.06)) & (F.col("l_quantity") < 24))
        .agg((F.sum(cents * h).cast("double") / 10000.0).alias("revenue"))
    )


@query(
    "q18_large_orders",
    oracle=f"""
SELECT c.c_name AS c_name, c.c_custkey AS c_custkey, o.o_orderkey AS o_orderkey,
       o.o_orderdate AS o_orderdate, o.o_totalprice AS o_totalprice,
       {sql_scaled_sum('l.l_quantity')} AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 15000
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18-style: semi-join against a grouped HAVING subquery
    (left-semi in Spark — no row duplication), then join + re-group."""
    customer, orders, lineitem = prep(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"))
        .filter(F.col("q") > 15000)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(scaled_sum(F.col("l_quantity")).alias("sum_qty"))
    )


@query(
    "top_users_by_value",
    oracle=f"""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS event_count,
       {sql_scaled_sum('value')} AS total_value
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT 10
""",
)
def top_users_by_value(spark, sf_dir):
    """Top-k after aggregation (capability surplus: ranking + limit)."""
    (events,) = prep(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("event_count"),
             scaled_sum(F.col("value")).alias("total_value"))
        .orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(10)
    )


@query(
    "rollup_returnflag",
    oracle=f"""
SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
       {sql_scaled_sum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_returnflag(spark, sf_dir):
    """ROLLUP grouping sets (capability surplus over the reference)."""
    (lineitem,) = prep(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"),
             scaled_sum(F.col("l_quantity")).alias("sum_qty"))
    )
