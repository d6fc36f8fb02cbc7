"""Deep relational surface: subquery shapes + skew-hardened aggregation.

Capability surplus over the reference (SURVEY §2.7/§2.8 'absent' rows):
the reference has no semi/anti joins, no subqueries, no distinct or
conditional aggregation. These queries exercise EXISTS / NOT IN /
scalar-subquery / ratio-of-sums / count-distinct shapes the Spark
engine gets from Catalyst, each with an exact DuckDB oracle (float
parity via integer-scaled sums, see queries.common).

At 100 TB: every query here keeps the fact table (lineitem / orders /
events) on one side of at most one shuffle; dimensions and subquery
results are broadcast. `salted_event_agg` demonstrates the two-phase
hot-key aggregation from operators/skew.py giving results identical to
a direct groupBy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_spark.operators.skew import salted_aggregate
from streamforge_spark.queries.common import prep, scaled_sum, sql_scaled_sum
from streamforge_spark.queries.tpch import _SQL_DISC_PRICE, _disc_price_sum
from streamforge_spark.registry import query


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4-style: EXISTS -> left-semi join (no row duplication,
    no distinct needed); the date filter prunes orders before the
    shuffle."""
    orders, lineitem = prep(spark, sf_dir, "orders", "lineitem")
    return (
        orders.filter((F.col("o_orderdate") >= "1996-01-01")
                      & (F.col("o_orderdate") < "1996-04-01"))
        .join(lineitem,
              (F.col("o_orderkey") == F.col("l_orderkey"))
              & (F.col("l_shipdate") > F.col("o_orderdate")),
              "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
       {_SQL_DISC_PRICE} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7-style nation-pair trade flow: 6-way join where every
    dimension (customer, supplier, nation x2) broadcasts; only
    lineitem⨝orders shuffles."""
    lineitem, orders, customer, supplier, nation = prep(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | \
           ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_disc_price_sum().alias("revenue"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name, {_SQL_DISC_PRICE} AS revenue,
       c.c_acctbal AS c_acctbal, n.n_name AS n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10-style returned-item report: returnflag + date filters
    push to the scans, customer/nation broadcast, top-20 via
    TakeOrderedAndProject."""
    customer, orders, lineitem, nation = prep(
        spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders.filter((F.col("o_orderdate") >= "1996-01-01")
                            & (F.col("o_orderdate") < "1996-04-01")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_disc_price_sum().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_priority_class",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
""",
)
def q12_priority_class(spark, sf_dir):
    """TPC-H Q12-style conditional aggregation (adapted: the fixture
    has no l_shipmode, classify by o_orderpriority instead)."""
    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter((F.col("l_shipdate") >= "1996-01-01")
                        & (F.col("l_shipdate") < "1997-01-01"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
SELECT CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) END), 0) AS DOUBLE)
       * 100.0
       / CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
""",
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14-style promo-revenue ratio: ratio of two exact integer
    sums, divided once at the end (bit-identical on both sides).
    part broadcasts; one month of lineitem survives the pushed
    filter."""
    lineitem, part = prep(spark, sf_dir, "lineitem", "part")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    h = F.round((1 - F.col("l_discount")) * 100).cast("long")
    promo = F.coalesce(F.sum(F.when(F.col("p_type") == "PROMO", cents * h)), F.lit(0))
    return (
        lineitem.filter((F.col("l_shipdate") >= "1996-09-01")
                        & (F.col("l_shipdate") < "1996-10-01"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg((promo.cast("double") * 100.0 / F.sum(cents * h).cast("double"))
             .alias("promo_revenue_pct"))
    )


@query(
    "q15_top_supplier",
    oracle=f"""
WITH r AS (
  SELECT l_suppkey AS supplier_no, {_SQL_DISC_PRICE} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, r.total_revenue AS total_revenue
FROM supplier s JOIN r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM r)
""",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15-style top supplier: revenue CTE reused for both the
    ranking and the max scalar (self-join against a broadcast 1-row
    aggregate, not a global window sort)."""
    lineitem, supplier = prep(spark, sf_dir, "lineitem", "supplier")
    r = (
        lineitem.filter((F.col("l_shipdate") >= "1996-01-01")
                        & (F.col("l_shipdate") < "1996-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_disc_price_sum().alias("total_revenue"))
    )
    top = r.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        r.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_cnt",
    oracle="""
SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16-style (adapted: lineitem stands in for partsupp):
    NOT IN -> broadcast anti join against the small excluded-supplier
    set; distinct count shuffles once on the group keys."""
    lineitem, part, supplier = prep(spark, sf_dir, "lineitem", "part", "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem
        .join(F.broadcast(part.filter((F.col("p_type") != "PROMO")
                                      & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
WITH t AS (
  SELECT l_partkey AS t_partkey,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_cents,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0
       AS avg_yearly
FROM lineitem
JOIN t ON l_partkey = t_partkey
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND CAST(ROUND(l_quantity * 100) AS BIGINT) * 5 * cnt < qty_cents
""",
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17-style small-quantity revenue: the correlated scalar
    subquery (0.2 * avg per part) becomes a per-part aggregate joined
    back; the threshold compare is kept in integer space
    (qty*5*cnt < sum) so it is exact on both sides."""
    lineitem, part = prep(spark, sf_dir, "lineitem", "part")
    per_part = (
        lineitem.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_cents"),
             F.count(F.lit(1)).alias("cnt"))
    )
    small = (F.round(F.col("l_quantity") * 100).cast("long") * 5 * F.col("cnt")
             < F.col("qty_cents"))
    return (
        lineitem
        .join(F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .filter(small)
        .agg((F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
              .cast("double") / 100.0 / 7.0).alias("avg_yearly"))
    )


@query(
    "q22_idle_customers",
    oracle=f"""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
         / CAST(COUNT(*) AS DOUBLE) AS threshold
  FROM customer WHERE c_acctbal > 0.0)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       {sql_scaled_sum('c_acctbal')} AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > threshold
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
""",
)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22-style: scalar subquery (exact avg threshold,
    broadcast as a 1-row cross join) + NOT EXISTS -> left-anti join
    against orders."""
    customer, orders = prep(spark, sf_dir, "customer", "orders")
    threshold = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double")
              / 100.0 / F.count(F.lit(1)).cast("double")).alias("threshold"))
    )
    return (
        customer.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             scaled_sum(F.col("c_acctbal")).alias("totacctbal"))
    )


@query(
    "salted_event_agg",
    oracle=f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS event_count,
       {sql_scaled_sum('value')} AS total_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY event_type
""",
)
def salted_event_agg(spark, sf_dir):
    """Two-phase salted aggregation over a hot-key column (events has
    only a handful of event_type values — exactly the shape where one
    key's partition dwarfs the rest at 100 TB). Result is identical
    to a direct groupBy; the oracle proves it."""
    (events,) = prep(spark, sf_dir, "events")
    cents = events.withColumn(
        "value_c", F.round(F.col("value") * 100).cast("long"))
    out = salted_aggregate(
        cents, ["event_type"],
        {"event_count": ("value_c", "count"),
         "sum_cents": ("value_c", "sum"),
         "min_value": ("value", "min"),
         "max_value": ("value", "max")},
        salt_buckets=16, salt_from=["event_id"])
    return out.select(
        "event_type", "event_count",
        (F.col("sum_cents").cast("double") / 100.0).alias("total_value"),
        "min_value", "max_value")


@query(
    "retention_cohorts",
    oracle="""
WITH firstw AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort,
         CAST(datediff('week', f.cohort, date_trunc('week', e.ts)) AS BIGINT) AS week_n
  FROM events e JOIN firstw f ON e.user_id = f.user_id
)
SELECT cohort, week_n, CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity GROUP BY cohort, week_n
""",
)
def retention_cohorts(spark, sf_dir):
    """Cohort retention: users grouped by first-seen week, counted
    distinctly in each subsequent activity week. Two exchanges on
    user_id (first-seen agg + cohort join — the second reuses the
    first's partitioning) and one on the small (cohort, week) rollup.
    DuckDB's date_trunc('week') is ISO Monday-start; Spark's
    date_trunc('WEEK') matches."""
    (events,) = prep(spark, sf_dir, "events")
    firstw = (events.groupBy("user_id")
              .agg(F.date_trunc("WEEK", F.min("ts")).alias("cohort")))
    activity = (
        events.join(firstw, "user_id")
        .select("user_id", "cohort",
                (F.datediff(F.date_trunc("WEEK", F.col("ts")), F.col("cohort"))
                 / 7).cast("long").alias("week_n"))
        .distinct()
    )
    return (activity.groupBy("cohort", "week_n")
            .agg(F.count(F.lit(1)).alias("active_users")))


# -- funnel conversion latency percentiles ------------------------------

_FUNNEL_TIME_ORACLE = """
WITH clicks AS (
  SELECT user_id, MIN(ts) AS t_click FROM events
  WHERE event_type = 'click' GROUP BY user_id),
conv AS (
  SELECT c.user_id,
         MIN(epoch_us(e.ts) - epoch_us(c.t_click)) AS delta_us
  FROM clicks c JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase'
   AND e.ts >= c.t_click
  GROUP BY c.user_id),
ranked AS (
  SELECT delta_us,
         row_number() OVER (ORDER BY delta_us, user_id) AS rn,
         COUNT(*) OVER () AS n
  FROM conv)
SELECT MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT) THEN delta_us END) AS p50_us,
       MAX(CASE WHEN rn = CAST(CEIL(0.90 * n) AS BIGINT) THEN delta_us END) AS p90_us,
       MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN delta_us END) AS p99_us,
       CAST(COUNT(*) AS BIGINT) AS n_converters
FROM ranked
"""


@query("funnel_time_to_convert", oracle=_FUNNEL_TIME_ORACLE)
def funnel_time_to_convert(spark, sf_dir):
    """Conversion-latency distribution: for every user who purchased
    at or after their first click, the click→purchase delay in exact
    integer microseconds, summarized as exact order-statistic
    percentiles — the "how long does the funnel take" readout that
    pairs with funnel_conversion's "how many make it".

    Scale shape: first-click is one map-side-combined rollup; the
    conditional-min attribution joins it back onto the purchase rows
    only (filter pushed to the scan) — never event⨝event; the
    percentile rank runs over |converters| rows (aggregate-sized).
    Exact µs deltas keep every value and both rank boundaries
    bit-portable."""
    (events,) = prep(spark, sf_dir, "events")
    clicks = (events.filter(F.col("event_type") == "click")
              .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    conv = (events.filter(F.col("event_type") == "purchase")
            .join(clicks, "user_id")
            .filter(F.col("ts") >= F.col("t_click"))
            .groupBy("user_id")
            .agg(F.min(F.unix_micros("ts") - F.unix_micros("t_click"))
                 .alias("delta_us")))
    from pyspark.sql import Window
    w = Window.orderBy("delta_us", "user_id")
    ranked = conv.select(
        "delta_us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"))

    def at(q):
        return F.max(F.when(
            F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"),
            F.col("delta_us")))

    return ranked.agg(
        at(0.50).alias("p50_us"), at(0.90).alias("p90_us"),
        at(0.99).alias("p99_us"),
        F.count(F.lit(1)).alias("n_converters"))


# -- CEP sequence-pattern detection (A -> B within T, no C between) -----

CEP_WINDOW_S = 3600   # error must follow the click within an hour

_CEP_ORACLE = f"""
WITH clicks AS (
  SELECT user_id, event_id AS click_id, ts AS c_ts FROM events
  WHERE event_type = 'click'),
errors AS (
  SELECT user_id, event_id AS error_id, ts AS e_ts FROM events
  WHERE event_type = 'error'),
purchases AS (
  SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
matched AS (
  SELECT user_id, click_id, c_ts, e_ts, error_id FROM (
    SELECT c.user_id, c.click_id, c.c_ts, e.e_ts, e.error_id,
           row_number() OVER (PARTITION BY c.click_id
                              ORDER BY e.e_ts, e.error_id) AS rn
    FROM clicks c JOIN errors e
      ON e.user_id = c.user_id
     AND e.e_ts > c.c_ts AND e.e_ts <= c.c_ts + INTERVAL {CEP_WINDOW_S} SECOND)
  WHERE rn = 1),
vetoed AS (
  SELECT DISTINCT m.click_id
  FROM matched m JOIN purchases p
    ON p.user_id = m.user_id AND p.p_ts > m.c_ts AND p.p_ts < m.e_ts)
SELECT m.user_id, m.click_id, m.error_id,
       epoch_us(m.e_ts) - epoch_us(m.c_ts) AS gap_us
FROM matched m LEFT JOIN vetoed v ON v.click_id = m.click_id
WHERE v.click_id IS NULL
"""


@query("cep_click_error_pattern", oracle=_CEP_ORACLE)
def cep_click_error_pattern(spark, sf_dir):
    """Complex-event-processing pattern match: for every user, CLICK
    followed by an ERROR within {T}s with NO PURCHASE between them —
    the three-part CEP shape (sequence + time bound + negation) that
    MATCH_RECOGNIZE / Flink CEP express and plain SQL aggregation
    cannot: the negation must be scoped to the matched instance's own
    [click, first-error) interval, not any global window.

    Spark formulation: every leg is a bucketized interval equi-join
    (operators/joins.py machinery — never a nested loop): clicks ⨝
    errors on (user, time-bucket) with the exact (c_ts, c_ts+T]
    residual, earliest error per click via min/min_by (deterministic
    (ts, event_id) key), then the negation leg joins purchases into
    each match's OWN interval and anti-joins the vetoed clicks out.
    Gap is exact integer µs.

    Scale shape: the three filtered legs prune at the scan
    (event_type pushdown); joins key on (user_id, bucket) so temporal
    locality bounds the fan-out; the veto set is matched-sized, not
    corpus-sized. Streaming: the same bucket keys make the first join
    legal stream-stream (test_streaming_range_join_via_buckets);
    negation needs the watermark-closed variant (emit after c_ts+T
    passes the watermark) — the standard CEP-on-streams deployment."""
    (events,) = prep(spark, sf_dir, "events")
    bs = CEP_WINDOW_S
    clicks = (events.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts"))
              .withColumn("_b", F.explode(F.sequence(
                  F.floor(F.unix_timestamp("c_ts") / bs).cast("long"),
                  F.floor((F.unix_timestamp("c_ts") + bs) / bs).cast("long")))))
    errors = (events.filter(F.col("event_type") == "error")
              .select("user_id", F.col("event_id").alias("error_id"),
                      F.col("ts").alias("e_ts"))
              .withColumn("_b", F.floor(F.unix_timestamp("e_ts") / bs).cast("long")))
    matched = (clicks.join(errors, ["user_id", "_b"])
               .filter((F.col("e_ts") > F.col("c_ts"))
                       & (F.col("e_ts") <= F.col("c_ts")
                          + F.expr(f"INTERVAL {CEP_WINDOW_S} SECONDS")))
               .groupBy("user_id", "click_id", "c_ts")
               .agg(F.min("e_ts").alias("e_ts"),
                    F.min_by("error_id", F.struct("e_ts", "error_id"))
                    .alias("error_id")))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("ts").alias("p_ts")))
    # negation as a single-pass flag: a vetoed-set + anti-join shape
    # consumes `matched` (the expensive click⨝error leg) twice; the
    # left join + max(flag) rollup reads it once
    veto = F.max(F.when((F.col("p_ts") > F.col("c_ts"))
                        & (F.col("p_ts") < F.col("e_ts")), 1)
                 .otherwise(0))
    flagged = (matched.join(purchases, "user_id", "left")
               .groupBy("user_id", "click_id", "error_id", "c_ts", "e_ts")
               .agg(veto.alias("veto")))
    return (flagged.filter(F.col("veto") == 0)
            .select("user_id", "click_id", "error_id",
                    (F.unix_micros("e_ts") - F.unix_micros("c_ts"))
                    .alias("gap_us")))


PATH_LEN = 5  # leading events per user forming the path signature


_SESSION_PATHS_ORACLE = f"""
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= {PATH_LEN} GROUP BY user_id)
SELECT path, CAST(count(*) AS BIGINT) AS n_users
FROM paths GROUP BY path
"""


@query("session_paths", oracle=_SESSION_PATHS_ORACLE)
def session_paths(spark, sf_dir):
    """Clickstream path analysis: each user's first ``PATH_LEN`` events
    (by time, event_id tie-break) form an ordered path signature;
    output is the frequency of every distinct path — the top-paths /
    sankey-diagram feed of product analytics.

    Plan (100 TB): the per-user head is a rank window (one shuffle on
    user_id) — Spark pushes the rn <= K filter into the sort as a
    WindowGroupLimit per-partition heap, so each user contributes at
    most K rows past its exchange. The fold to a path string is
    per-user state only (collect_list of K structs -> array_sort), and
    the path frequency rollup is map-side combinable on a
    low-cardinality key (event-type^K paths)."""
    from pyspark.sql import Window
    (events,) = prep(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = (events.select("user_id", "event_type", "ts", "event_id")
              .withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= PATH_LEN))
    paths = ranked.groupBy("user_id").agg(
        F.concat_ws(">", F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
            lambda x: x["event_type"])).alias("path"))
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))


ATTR_WINDOW_S = 3600  # look-back window: clicks within 1h before a purchase


_ATTRIBUTION_ORACLE = f"""
WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
      FROM events WHERE event_type = 'click'),
touch AS (SELECT p.user_id, p.purchase_id, p.cents, c.click_id, c.c_ts
          FROM p JOIN c ON c.user_id = p.user_id
                 AND c.c_ts >= p.p_ts - INTERVAL {ATTR_WINDOW_S} SECONDS
                 AND c.c_ts < p.p_ts),
ranked AS (SELECT *,
                  row_number() OVER (PARTITION BY purchase_id
                                     ORDER BY c_ts, click_id) AS rn,
                  count(*) OVER (PARTITION BY purchase_id) AS n
           FROM touch)
SELECT user_id, purchase_id, click_id,
       cents // n + CASE WHEN rn <= cents % n THEN 1 ELSE 0 END AS credit_cents
FROM ranked
"""


@query("attribution_linear", oracle=_ATTRIBUTION_ORACLE)
def attribution_linear(spark, sf_dir):
    """Linear multi-touch marketing attribution: every click in the
    hour before a purchase shares the purchase value equally, with the
    cent remainder apportioned largest-remainder-style to the earliest
    touches — credits are integers that sum EXACTLY to the purchase
    amount (no float drift across 10^9 purchases).

    Plan (100 TB): the time-range join is bucketized — clicks key on
    their hour cell, purchases replicate to the two cells their
    look-back window overlaps, so the pair generation is an equi-join
    on (user_id, cell), never a nested loop. Per-purchase rank/count
    windows see only that purchase's touches (WindowGroupLimit-scale
    state), and the integer DIV/% split replays exactly in SQL."""
    from pyspark.sql import Window
    (events,) = prep(spark, sf_dir, "events")
    bs = ATTR_WINDOW_S
    p = (events.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("p_ts"),
                 F.round(F.col("value") * 100).cast("long").alias("cents"))
         .withColumn("_b", F.explode(F.sequence(
             F.floor((F.unix_timestamp("p_ts") - bs) / bs).cast("long"),
             F.floor(F.unix_timestamp("p_ts") / bs).cast("long")))))
    c = (events.filter(F.col("event_type") == "click")
         .select("user_id", F.col("event_id").alias("click_id"),
                 F.col("ts").alias("c_ts"))
         .withColumn("_b", F.floor(F.unix_timestamp("c_ts") / bs).cast("long")))
    touch = (p.join(c, ["user_id", "_b"])
             .filter((F.col("c_ts") >= F.col("p_ts")
                      - F.expr(f"INTERVAL {ATTR_WINDOW_S} SECONDS"))
                     & (F.col("c_ts") < F.col("p_ts")))
             .select("user_id", "purchase_id", "cents", "click_id", "c_ts"))
    wp = Window.partitionBy("purchase_id")
    ranked = (touch
              .withColumn("rn", F.row_number().over(
                  wp.orderBy("c_ts", "click_id")))
              .withColumn("n", F.count(F.lit(1)).over(wp)))
    return ranked.select(
        "user_id", "purchase_id", "click_id",
        (F.expr("cents DIV n")
         + F.when(F.col("rn") <= F.col("cents") % F.col("n"), 1).otherwise(0)
         ).alias("credit_cents"))


_SHARE_ORACLE = """
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2)
SELECT region, nation, cents,
       (1000000 * cents) // CAST(SUM(cents) OVER (PARTITION BY region) AS BIGINT)
         AS share_of_region_ppm,
       (1000000 * cents) // CAST(SUM(cents) OVER () AS BIGINT)
         AS share_of_total_ppm
FROM rev
"""


@query("revenue_share_hierarchy", oracle=_SHARE_ORACLE)
def revenue_share_hierarchy(spark, sf_dir):
    """Percent-of-parent OLAP rollup: nation revenue with its exact
    integer-ppm share of the region and of the grand total — the
    drill-down tree every BI layer renders. Shares are truncating
    integer division over exact cent sums, so hierarchy levels
    reconcile without float drift.

    Plan (100 TB): ONE fact aggregation (map-side combined onto
    |nation| rows; dims broadcast); both share windows run over the
    ~25-row aggregate — the single-partition global window is
    post-aggregation and explicitly fine."""
    from pyspark.sql import Window
    lineitem, supplier, nation, region = prep(
        spark, sf_dir, "lineitem", "supplier", "nation", "region")
    rev = (lineitem
           .join(F.broadcast(supplier),
                 F.col("l_suppkey") == F.col("s_suppkey"))
           .join(F.broadcast(nation),
                 F.col("s_nationkey") == F.col("n_nationkey"))
           .join(F.broadcast(region),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .groupBy(F.col("r_name").alias("region"),
                    F.col("n_name").alias("nation"))
           .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                .alias("cents")))
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    return rev.select(
        "region", "nation", "cents",
        F.expr("1000000 * cents").alias("_nr"),
        F.sum("cents").over(wr).alias("_rs"),
        F.sum("cents").over(wt).alias("_ts"),
    ).select(
        "region", "nation", "cents",
        F.expr("_nr DIV _rs").alias("share_of_region_ppm"),
        F.expr("_nr DIV _ts").alias("share_of_total_ppm"))


_TOP_MOVERS_ORACLE = """
WITH wk AS (
  SELECT event_type, date_trunc('week', ts) AS week,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
lagged AS (
  SELECT event_type, week, n,
         lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
  FROM wk)
SELECT event_type, week, n, prev_n,
       CASE WHEN prev_n IS NULL OR prev_n = 0 THEN NULL
            ELSE (1000000 * (n - prev_n)) // prev_n END AS wow_change_ppm
FROM lagged
"""


@query("weekly_top_movers", oracle=_TOP_MOVERS_ORACLE)
def weekly_top_movers(spark, sf_dir):
    """Week-over-week volume movement per event type in exact integer
    ppm — the trend panel of pipeline monitoring (pair to
    daily_volume_anomalies' absolute gate). NULL (not a crash, not a
    fake 0) when there is no previous week or it was empty — the
    ANSI-safe total formulation.

    Plan: raw events collapse map-side to |types|x|weeks| rows; the
    lag window runs over that tiny rollup."""
    from pyspark.sql import Window
    (events,) = prep(spark, sf_dir, "events")
    wk = (events.groupBy("event_type",
                         F.date_trunc("week", "ts").alias("week"))
          .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("event_type").orderBy("week")
    lagged = wk.withColumn("prev_n", F.lag("n").over(w))
    return lagged.select(
        "event_type", "week", "n", "prev_n",
        F.when(F.col("prev_n").isNotNull() & (F.col("prev_n") != 0),
               F.expr("(1000000 * (n - prev_n)) DIV prev_n"))
        .alias("wow_change_ppm"))


_FULFILLMENT_ORACLE = """
WITH per_order AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         date_diff('day', o.o_orderdate, max(l.l_shipdate)) AS days_to_ship
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, o.o_orderdate)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(days_to_ship) AS BIGINT) AS min_days,
       CAST(max(days_to_ship) AS BIGINT) AS max_days,
       CAST(sum(days_to_ship) AS BIGINT) AS sum_days
FROM per_order GROUP BY o_orderpriority
"""


@query("order_fulfillment_latency", oracle=_FULFILLMENT_ORACLE)
def order_fulfillment_latency(spark, sf_dir):
    """Operational SLA metric: days from order placement to the LAST
    line shipment, rolled up per priority class — exact integer day
    arithmetic (sum instead of a float mean, divided by n_orders at
    display time).

    Plan (100 TB): the per-order max-shipdate aggregation shuffles on
    l_orderkey (map-side combined); orders join on the same key can
    reuse that exchange; the priority rollup is a 5-row aggregate."""
    orders, lineitem = prep(spark, sf_dir, "orders", "lineitem")
    per_order = (lineitem.groupBy("l_orderkey")
                 .agg(F.max("l_shipdate").alias("last_ship"))
                 .join(orders,
                       F.col("l_orderkey") == F.col("o_orderkey"))
                 .select("o_orderpriority",
                         F.datediff("last_ship", "o_orderdate")
                         .alias("days_to_ship")))
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("days_to_ship").cast("long").alias("min_days"),
        F.max("days_to_ship").cast("long").alias("max_days"),
        F.sum("days_to_ship").alias("sum_days"))


_BASKET_ORACLE = """
WITH sizes AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey)
SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
FROM sizes GROUP BY n_lines
"""


@query("basket_size_distribution", oracle=_BASKET_ORACLE)
def basket_size_distribution(spark, sf_dir):
    """Order-size histogram (lines per order) — the fact-table shape
    check behind join cardinality estimates and skew planning. Two
    map-side-combined aggregations; the second runs over the
    |orders|-row rollup, the second key has ~7 values."""
    (lineitem,) = prep(spark, sf_dir, "lineitem")
    sizes = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"))
    return sizes.groupBy("n_lines").agg(F.count(F.lit(1)).alias("n_orders"))


LATE_SHIP_DAYS = 90  # shipped more than this many days after order = late


_RELIABILITY_ORACLE = f"""
WITH lines AS (
  SELECT l.l_suppkey,
         CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                   > {LATE_SHIP_DAYS} THEN 1 ELSE 0 END AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT s.s_name,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(is_late) AS BIGINT) AS n_late,
       (1000000 * CAST(sum(is_late) AS BIGINT)) // count(*) AS late_ppm
FROM lines JOIN supplier s ON s.s_suppkey = lines.l_suppkey
GROUP BY s.s_name
"""


@query("supplier_reliability", oracle=_RELIABILITY_ORACLE)
def supplier_reliability(spark, sf_dir):
    """Supplier scorecard: late-shipment rate (> {d} days after order)
    in exact integer ppm — the vendor-SLA rollup. One fact shuffle
    (lineitem x orders on the order key), broadcast supplier names,
    map-side-combined per-supplier counts.""".format(d=LATE_SHIP_DAYS)
    lineitem, orders, supplier = prep(
        spark, sf_dir, "lineitem", "orders", "supplier")
    lines = (lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
             .select("l_suppkey",
                     F.when(F.datediff("l_shipdate", "o_orderdate")
                            > LATE_SHIP_DAYS, 1).otherwise(0)
                     .alias("is_late")))
    return (lines.join(F.broadcast(supplier),
                       F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum("is_late").alias("n_late"))
            .select("s_name", "n_lines", "n_late",
                    F.expr("(1000000 * n_late) DIV n_lines")
                    .alias("late_ppm")))


_ABANDON_ORACLE = """
WITH ud AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
           AS n_clicks,
         CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
           AS n_purchases
  FROM events GROUP BY 1, 2)
SELECT day,
       CAST(count(CASE WHEN n_clicks > 0 THEN 1 END) AS BIGINT)
         AS engaged_users,
       CAST(count(CASE WHEN n_clicks > 0 AND n_purchases = 0 THEN 1 END)
            AS BIGINT) AS abandoned_users,
       CASE WHEN count(CASE WHEN n_clicks > 0 THEN 1 END) > 0
            THEN (1000000 * count(CASE WHEN n_clicks > 0
                                       AND n_purchases = 0 THEN 1 END))
                 // count(CASE WHEN n_clicks > 0 THEN 1 END) END
         AS abandon_ppm
FROM ud GROUP BY day
"""


@query("cart_abandonment_daily", oracle=_ABANDON_ORACLE)
def cart_abandonment_daily(spark, sf_dir):
    """Daily cart abandonment: users who clicked but never purchased
    that day, as an exact integer-ppm rate (ANSI-safe NULL on days
    with no engaged users). Two map-side-combined aggregations —
    (user, day) then day — with conditional counts instead of joins
    or distinct self-intersections."""
    (events,) = prep(spark, sf_dir, "events")
    ud = (events.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
          .agg(F.count(F.when(F.col("event_type") == "click", 1))
               .alias("n_clicks"),
               F.count(F.when(F.col("event_type") == "purchase", 1))
               .alias("n_purchases")))
    day = (ud.groupBy("day")
           .agg(F.count(F.when(F.col("n_clicks") > 0, 1))
                .alias("engaged_users"),
                F.count(F.when((F.col("n_clicks") > 0)
                               & (F.col("n_purchases") == 0), 1))
                .alias("abandoned_users")))
    return day.select(
        "day", "engaged_users", "abandoned_users",
        F.when(F.col("engaged_users") > 0,
               F.expr("(1000000 * abandoned_users) DIV engaged_users"))
        .alias("abandon_ppm"))


_MONTHLY_ORACLE = """
WITH m AS (
  SELECT date_trunc('month', o.o_orderdate) AS month,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1)
SELECT month, cents,
       cents - lag(cents) OVER (ORDER BY month) AS mom_delta_cents
FROM m
"""


@query("monthly_revenue_trend", oracle=_MONTHLY_ORACLE)
def monthly_revenue_trend(spark, sf_dir):
    """Month-over-month revenue trend in exact cents (NULL delta on
    the first month — ANSI-safe). One fact shuffle on the order key,
    a map-side-combined monthly rollup, and a lag window over the
    ~24-row month table."""
    from pyspark.sql import Window
    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    m = (lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
         .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
         .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
              .alias("cents")))
    w = Window.orderBy("month")
    return m.select("month", "cents",
                    (F.col("cents") - F.lag("cents").over(w))
                    .alias("mom_delta_cents"))


# -- skyline / pareto frontier ------------------------------------------

_SKYLINE_ORACLE = """
WITH p AS (SELECT p_partkey, p_size,
                  CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
           FROM part),
w AS (SELECT *,
             max(p_size) OVER (ORDER BY cents
                               RANGE BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS best_cheaper,
             max(p_size) OVER (PARTITION BY cents) AS best_same_price
      FROM p)
SELECT p_partkey, p_size, cents
FROM w
WHERE (best_cheaper IS NULL OR p_size > best_cheaper)
  AND p_size = best_same_price
"""


@query("pareto_frontier_parts", oracle=_SKYLINE_ORACLE)
def pareto_frontier_parts(spark, sf_dir):
    """Skyline query: the pareto-optimal parts under (minimize price,
    maximize size) — a part survives iff no other part is at least as
    big for a strictly lower price, and no same-price part is strictly
    bigger. The classic multi-criteria shortlist (supplier selection,
    price-performance frontiers).

    One-pass window formulation: order by exact integer cents; the
    strictly-cheaper best size is a RANGE frame ending 1 cent before
    the current row (integer range frame — no float boundary
    ambiguity), and same-price domination is a partitioned max. Part
    is a dimension table, so the global-order window is
    dimension-sized (the rfm_segments argument); the frontier itself
    is at most one row per distinct price."""
    from pyspark.sql import Window
    (part,) = prep(spark, sf_dir, "part")
    p = part.select("p_partkey", "p_size",
                    F.round(F.col("p_retailprice") * 100).cast("long")
                    .alias("cents"))
    cheaper = (Window.orderBy("cents")
               .rangeBetween(Window.unboundedPreceding, -1))
    same = Window.partitionBy("cents")
    w = p.select("p_partkey", "p_size", "cents",
                 F.max("p_size").over(cheaper).alias("best_cheaper"),
                 F.max("p_size").over(same).alias("best_same_price"))
    return (w.filter((F.col("best_cheaper").isNull()
                      | (F.col("p_size") > F.col("best_cheaper")))
                     & (F.col("p_size") == F.col("best_same_price")))
            .select("p_partkey", "p_size", "cents"))


# -- Benford first-digit audit ------------------------------------------

#: Benford expected first-digit shares in ppm (log10(1+1/d), fixed
#: literals so neither engine evaluates a non-correctly-rounded log)
BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910,
               5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757}

_BENFORD_ORACLE = f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
t AS (SELECT SUM(n) AS total FROM c),
e(digit, expected_ppm) AS (VALUES
  {", ".join(f"({d}, {p})" for d, p in BENFORD_PPM.items())})
SELECT e.digit, COALESCE(c.n, 0) AS n,
       (COALESCE(c.n, 0) * 1000000) // t.total AS observed_ppm,
       e.expected_ppm,
       abs((COALESCE(c.n, 0) * 1000000) // t.total - e.expected_ppm)
         AS deviation_ppm
FROM e LEFT JOIN c ON c.digit = e.digit CROSS JOIN t
"""


@query("benford_first_digit", oracle=_BENFORD_ORACLE)
def benford_first_digit(spark, sf_dir):
    """Benford's-law audit of order totals: the observed first-digit
    distribution vs the log-law expectation, in integer ppm — the
    classic screen for fabricated or systematically clamped monetary
    data (heavy deviation on one digit = pricing rule or fraud, not
    noise). Expected shares are fixed literals so no engine evaluates
    a (non-correctly-rounded) log10 at query time.

    Scale shape: first digit is a scan-side string op on exact cents;
    one 9-row map-side-combined rollup; the expectation join is a
    9-row broadcast."""
    (orders,) = prep(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    d = (orders.filter(F.col("o_totalprice") > 0)
         .select(F.substring(cents.cast("string"), 1, 1).cast("long")
                 .alias("digit")))
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    e = spark.createDataFrame(
        [(d_, p) for d_, p in BENFORD_PPM.items()],
        "digit long, expected_ppm long")
    return (F.broadcast(e).join(c, "digit", "left")
            .crossJoin(F.broadcast(t))
            .select("digit",
                    F.coalesce("n", F.lit(0)).alias("n"),
                    F.expr("(coalesce(n, 0) * 1000000) div total")
                    .alias("observed_ppm"),
                    "expected_ppm")
            .withColumn("deviation_ppm",
                        F.abs(F.col("observed_ppm")
                              - F.col("expected_ppm"))))


# -- price/volume variance decomposition (FP&A bridge) ------------------

VAR_YEAR_BASE, VAR_YEAR_CMP = 1997, 1998

_VARIANCE_ORACLE = f"""
WITH y AS (
  SELECT c.c_nationkey AS nation,
         year(o.o_orderdate) AS yr,
         SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS rev,
         SUM(CAST(l.l_quantity AS BIGINT)) AS qty
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE year(o.o_orderdate) IN ({VAR_YEAR_BASE}, {VAR_YEAR_CMP})
  GROUP BY 1, 2),
b AS (SELECT nation, rev AS rev1, qty AS q1 FROM y WHERE yr = {VAR_YEAR_BASE}),
c AS (SELECT nation, rev AS rev2, qty AS q2 FROM y WHERE yr = {VAR_YEAR_CMP})
SELECT b.nation,
       rev1, rev2, q1, q2,
       rev2 - rev1 AS delta_cents,
       CAST(q2 - q1 AS DOUBLE) * (CAST(rev1 AS DOUBLE) / CAST(q1 AS DOUBLE))
         AS volume_effect,
       CAST(q2 AS DOUBLE) * (CAST(rev2 AS DOUBLE) / CAST(q2 AS DOUBLE)
                             - CAST(rev1 AS DOUBLE) / CAST(q1 AS DOUBLE))
         AS price_effect
FROM b JOIN c ON c.nation = b.nation
WHERE q1 > 0 AND q2 > 0
"""


@query("revenue_variance_decomposition", oracle=_VARIANCE_ORACLE)
def revenue_variance_decomposition(spark, sf_dir):
    """Price/volume variance bridge: per nation, the year-over-year
    revenue delta split into a VOLUME effect ((q2-q1) at base-year
    unit price) and a PRICE effect (q2 at the unit-price change) —
    the standard FP&A decomposition that answers "did we sell more,
    or sell dearer". volume_effect + price_effect == delta exactly
    (the two-term Laspeyres/Paasche split).

    Revenue and quantity aggregate as exact integers (order-free);
    unit prices are then derived with the identical IEEE expression
    sequence in both engines, so even the float effects hash-match.
    One fact rollup keyed (nation, year), then a |nations| self-join."""
    lineitem, orders, customer = prep(spark, sf_dir,
                                      "lineitem", "orders", "customer")
    y = (lineitem
         .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
         .join(customer, orders["o_custkey"] == customer["c_custkey"])
         .filter(F.year("o_orderdate").isin(VAR_YEAR_BASE, VAR_YEAR_CMP))
         .groupBy(F.col("c_nationkey").alias("nation"),
                  F.year("o_orderdate").alias("yr"))
         .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
              .alias("rev"),
              F.sum(F.col("l_quantity").cast("long")).alias("qty")))
    b = (y.filter(F.col("yr") == VAR_YEAR_BASE)
         .select("nation", F.col("rev").alias("rev1"),
                 F.col("qty").alias("q1")))
    c = (y.filter(F.col("yr") == VAR_YEAR_CMP)
         .select(F.col("nation").alias("nation2"),
                 F.col("rev").alias("rev2"), F.col("qty").alias("q2")))
    p1 = F.col("rev1").cast("double") / F.col("q1").cast("double")
    p2 = F.col("rev2").cast("double") / F.col("q2").cast("double")
    return (b.join(c, b["nation"] == c["nation2"])
            .filter((F.col("q1") > 0) & (F.col("q2") > 0))
            .select("nation", "rev1", "rev2", "q1", "q2",
                    (F.col("rev2") - F.col("rev1")).alias("delta_cents"),
                    ((F.col("q2") - F.col("q1")).cast("double") * p1)
                    .alias("volume_effect"),
                    (F.col("q2").cast("double") * (p2 - p1))
                    .alias("price_effect")))


# -- cohort LTV curves --------------------------------------------------

_LTV_ORACLE = """
WITH firsts AS (
  SELECT o_custkey,
         date_trunc('month', MIN(o_orderdate)) AS cohort_month
  FROM orders GROUP BY o_custkey),
facts AS (
  SELECT f.cohort_month,
         (year(o.o_orderdate) * 12 + month(o.o_orderdate))
           - (year(f.cohort_month) * 12 + month(f.cohort_month))
           AS age_months,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
         o.o_custkey
  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey),
g AS (
  SELECT cohort_month, CAST(age_months AS BIGINT) AS age_months,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active,
         SUM(cents) AS rev_cents
  FROM facts GROUP BY 1, 2)
SELECT cohort_month, age_months, n_active, rev_cents,
       SUM(rev_cents) OVER (PARTITION BY cohort_month ORDER BY age_months
                            ROWS UNBOUNDED PRECEDING) AS cum_rev_cents
FROM g
"""


@query("cohort_ltv", oracle=_LTV_ORACLE)
def cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curves: customers grouped by first-order
    month; per (cohort, months-since-first-order) the active count,
    revenue, and CUMULATIVE revenue — the LTV curve marketing payback
    models read off. Complements retention_cohorts (who comes back)
    with how much they spend as they age.

    Ages are exact integer month arithmetic (year*12+month), revenue
    exact cents; the cumulative window is partitioned per cohort (a
    |cohorts| x |ages| table after one fact rollup + one first-order
    rollup joined back on the customer key)."""
    from pyspark.sql import Window
    (orders,) = prep(spark, sf_dir, "orders")
    firsts = (orders.groupBy("o_custkey")
              .agg(F.date_trunc("month", F.min("o_orderdate"))
                   .alias("cohort_month")))
    mnum = lambda c: F.year(c) * 12 + F.month(c)
    facts = (orders.join(firsts, "o_custkey")
             .select("cohort_month",
                     (mnum(F.col("o_orderdate"))
                      - mnum(F.col("cohort_month"))).cast("long")
                     .alias("age_months"),
                     F.round(F.col("o_totalprice") * 100).cast("long")
                     .alias("cents"),
                     "o_custkey"))
    g = (facts.groupBy("cohort_month", "age_months")
         .agg(F.count_distinct("o_custkey").alias("n_active"),
              F.sum("cents").alias("rev_cents")))
    w = (Window.partitionBy("cohort_month").orderBy("age_months")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return g.select("cohort_month", "age_months", "n_active", "rev_cents",
                    F.sum("rev_cents").over(w).alias("cum_rev_cents"))


_DECAY_ORACLE = """
WITH clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, ts AS p_ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
credits AS (
  SELECT c.click_id,
         p.cents // CAST(POWER(2, datediff('day', CAST(c.click_ts AS DATE),
                                           CAST(p.p_ts AS DATE))) AS BIGINT)
           AS credit_cents
  FROM clicks c JOIN purchases p
    ON c.user_id = p.user_id
   AND c.click_ts < p.p_ts
   AND c.click_ts >= p.p_ts - INTERVAL 7 DAY)
SELECT click_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       SUM(credit_cents) AS credit_cents
FROM credits GROUP BY click_id
HAVING SUM(credit_cents) > 0
"""


@query("attribution_time_decay", oracle=_DECAY_ORACLE)
def attribution_time_decay(spark, sf_dir):
    """Time-decayed attribution: each click within 7 days before a
    purchase earns credit halved per whole day of distance
    (cents DIV 2^days) — the recency-weighted complement of
    `attribution_linear`'s equal split.

    Half-per-day keeps the decay in EXACT integer arithmetic (floor
    halving, no pow-of-float): engines agree bit-for-bit, and credits
    remain summable BIGINTs.  The click⨝purchase join is per-user with
    a 7-day band — the same bounded-state shape as the stream-stream
    DynamicJoiner (ttl window), so state never follows history length.
    """
    (events,) = prep(spark, sf_dir, "events")
    clicks = (events.where(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts")))
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("pu"),
                         F.col("ts").alias("p_ts"),
                         F.round(F.col("value") * 100).cast("long")
                         .alias("cents")))
    days = F.datediff(F.to_date("p_ts"), F.to_date("click_ts"))
    joined = clicks.join(
        purchases,
        (clicks["user_id"] == purchases["pu"])
        & (clicks["click_ts"] < purchases["p_ts"])
        & (clicks["click_ts"] >= purchases["p_ts"] - F.expr("INTERVAL 7 DAYS")))
    return (joined
            .select("click_id",
                    F.expr("cents div CAST(POWER(2, datediff(to_date(p_ts), "
                           "to_date(click_ts))) AS BIGINT)")
                    .alias("credit_cents"))
            .groupBy("click_id")
            .agg(F.count(F.lit(1)).alias("n_purchases"),
                 F.sum("credit_cents").alias("credit_cents"))
            .where(F.col("credit_cents") > 0))


_NEWRET_ORACLE = """
WITH firsts AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_dt FROM orders GROUP BY 1),
tagged AS (
  SELECT date_trunc('month', o.o_orderdate) AS month,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
         date_trunc('month', o.o_orderdate) = date_trunc('month', f.first_dt)
           AS is_new
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey)
SELECT month,
       SUM(CASE WHEN is_new THEN cents ELSE 0 END) AS new_cents,
       SUM(CASE WHEN is_new THEN 0 ELSE cents END) AS returning_cents,
       (SUM(CASE WHEN is_new THEN cents ELSE 0 END) * 1000000)
         // SUM(cents) AS new_share_ppm
FROM tagged GROUP BY month
"""


@query("new_vs_returning_revenue", oracle=_NEWRET_ORACLE)
def new_vs_returning_revenue(spark, sf_dir):
    """Monthly revenue split between NEW customers (first-ever order
    month) and RETURNING ones, with the new share in exact ppm — the
    growth-vs-retention decomposition every revenue dashboard leads
    with.

    One window-free formulation: the per-customer first-order date is
    a map-side-combined rollup that joins back on the customer key
    (broadcast at dimension scale), so the fact table takes exactly
    one shuffle-free pass plus the month rollup.
    """
    (orders,) = prep(spark, sf_dir, "orders")
    firsts = (orders.groupBy("o_custkey")
              .agg(F.min("o_orderdate").alias("first_dt")))
    tagged = (orders.join(F.broadcast(firsts), "o_custkey")
              .select(F.date_trunc("month", "o_orderdate").alias("month"),
                      F.round(F.col("o_totalprice") * 100).cast("long")
                      .alias("cents"),
                      (F.date_trunc("month", "o_orderdate")
                       == F.date_trunc("month", "first_dt")).alias("is_new")))
    new_c = F.sum(F.when(F.col("is_new"), F.col("cents")).otherwise(F.lit(0)))
    ret_c = F.sum(F.when(F.col("is_new"), F.lit(0)).otherwise(F.col("cents")))
    return (tagged.groupBy("month")
            .agg(new_c.alias("new_cents"),
                 ret_c.alias("returning_cents"),
                 F.expr("(sum(CASE WHEN is_new THEN cents ELSE 0 END) "
                        "* 1000000) div sum(cents)").alias("new_share_ppm")))


_ELASTICITY_ORACLE = """
WITH monthly AS (
  SELECT p.p_brand,
         date_trunc('month', o.o_orderdate) AS month,
         SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
           // SUM(CAST(l.l_quantity AS BIGINT)) AS unit_cents,
         SUM(CAST(l.l_quantity AS BIGINT)) AS qty
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2),
lagged AS (
  SELECT p_brand, month, unit_cents, qty,
         LAG(unit_cents) OVER (PARTITION BY p_brand ORDER BY month) AS pc0,
         LAG(qty) OVER (PARTITION BY p_brand ORDER BY month) AS q0
  FROM monthly)
SELECT p_brand, month,
       ((qty - q0) * (unit_cents + pc0) * 1000000)
         // ((unit_cents - pc0) * (qty + q0)) AS arc_elasticity_ppm
FROM lagged
WHERE pc0 IS NOT NULL AND unit_cents <> pc0 AND qty + q0 > 0
"""


@query("price_elasticity_monthly", oracle=_ELASTICITY_ORACLE)
def price_elasticity_monthly(spark, sf_dir):
    """Arc price elasticity of demand per brand-month: the midpoint
    formula ((Δq·(p₁+p₀)) / (Δp·(q₁+q₀))) in exact integer ppm — the
    log-log regression's transcendental-free cousin, computable
    bit-identically in both engines (floor-division unit price, exact
    integer cross products, months with unchanged price excluded as
    undefined).

    Scale: the fact join collapses to a (brand, month) rollup
    (map-side combined; part is a broadcast dim), the lag window runs
    per brand over the month series, and every exchange carries
    dimension-scale rows.
    """
    from pyspark.sql import Window
    lineitem, orders, part = prep(spark, sf_dir, "lineitem", "orders", "part")
    monthly = (lineitem
               .join(orders.select("o_orderkey", "o_orderdate"),
                     lineitem["l_orderkey"] == orders["o_orderkey"])
               .join(F.broadcast(part.select("p_partkey", "p_brand")),
                     lineitem["l_partkey"] == part["p_partkey"])
               .groupBy("p_brand",
                        F.date_trunc("month", "o_orderdate").alias("month"))
               .agg(F.expr("sum(CAST(ROUND(l_extendedprice * 100) AS BIGINT))"
                           " div sum(CAST(l_quantity AS BIGINT))")
                    .alias("unit_cents"),
                    F.sum(F.col("l_quantity").cast("long")).alias("qty")))
    w = Window.partitionBy("p_brand").orderBy("month")
    lagged = monthly.select(
        "p_brand", "month", "unit_cents", "qty",
        F.lag("unit_cents").over(w).alias("pc0"),
        F.lag("qty").over(w).alias("q0"))
    return (lagged
            .where(F.col("pc0").isNotNull()
                   & (F.col("unit_cents") != F.col("pc0"))
                   & (F.col("qty") + F.col("q0") > 0))
            .select("p_brand", "month",
                    F.expr("((qty - q0) * (unit_cents + pc0) * 1000000) div "
                           "((unit_cents - pc0) * (qty + q0))")
                    .alias("arc_elasticity_ppm")))


_TRENDING_ORACLE = """
WITH aged AS (
  SELECT l.l_partkey,
         datediff('day', CAST(o.o_orderdate AS DATE), DATE '1998-08-02')
           AS age_d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1998-07-03')
SELECT l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders_30d,
       SUM(CAST(1000000 AS BIGINT) // CAST(POWER(2, LEAST(GREATEST(age_d, 0), 30)) AS BIGINT))
         AS trend_score_micro
FROM aged GROUP BY l_partkey
ORDER BY trend_score_micro DESC, l_partkey
LIMIT 20
"""


@query("trending_parts", oracle=_TRENDING_ORACLE)
def trending_parts(spark, sf_dir):
    """Trending ranking: the 20 parts with the highest exponentially
    recency-decayed order score over the last 30 days (half-life =
    one day, i.e. score += 1e6 >> age_days) — "what is hot RIGHT NOW"
    as opposed to raw 30-day counts that a slow steady seller wins.

    Halving per whole day keeps the decay exact-integer (the same
    trick as `attribution_time_decay`), so the score is an exact
    BIGINT sum.  The date filter pushes into the orders scan; one
    broadcast-joined rollup; top-20 via TakeOrderedAndProject.
    """
    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    aged = (lineitem
            .join(orders.select("o_orderkey", "o_orderdate")
                  .where(F.col("o_orderdate") >= "1998-07-03"),
                  lineitem["l_orderkey"] == orders["o_orderkey"])
            .select("l_partkey",
                    F.least(F.greatest(
                        F.datediff(F.lit("1998-08-02").cast("date"),
                                   F.to_date("o_orderdate")), F.lit(0)),
                        F.lit(30)).alias("age_d")))
    return (aged.groupBy("l_partkey")
            .agg(F.count(F.lit(1)).alias("n_orders_30d"),
                 F.sum(F.expr(
                     "CAST(1000000 AS BIGINT) div CAST(POWER(2, age_d) AS BIGINT)"))
                 .alias("trend_score_micro"))
            .orderBy(F.col("trend_score_micro").desc(), "l_partkey")
            .limit(20))


_TOPN_OTHERS_ORACLE = """
WITH rev AS (
  SELECT c.c_nationkey AS nation, o.o_custkey,
         SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
ranked AS (
  SELECT nation, o_custkey, cents,
         ROW_NUMBER() OVER (PARTITION BY nation
                            ORDER BY cents DESC, o_custkey) AS rn
  FROM rev)
SELECT nation,
       CASE WHEN rn <= 3 THEN CAST(o_custkey AS VARCHAR)
            ELSE 'OTHERS' END AS who,
       SUM(cents) AS cents,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM ranked
GROUP BY nation, CASE WHEN rn <= 3 THEN CAST(o_custkey AS VARCHAR)
                      ELSE 'OTHERS' END
"""


@query("topn_with_others", oracle=_TOPN_OTHERS_ORACLE)
def topn_with_others(spark, sf_dir):
    """Top-3 customers per nation by revenue PLUS an OTHERS residual
    row — the band-aggregation shape every exec dashboard uses (the
    plain top-k drops the long tail; this keeps totals reconciling).

    One (nation, customer) rollup (map-side combined), one rank
    window per nation, then a second rollup where ranks >3 collapse
    into the OTHERS band — totals across bands equal the nation total
    by construction.
    """
    from pyspark.sql import Window
    orders, customer = prep(spark, sf_dir, "orders", "customer")
    rev = (orders.join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
                       orders["o_custkey"] == customer["c_custkey"])
           .groupBy(F.col("c_nationkey").alias("nation"), "o_custkey")
           .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .alias("cents")))
    w = Window.partitionBy("nation").orderBy(F.col("cents").desc(), "o_custkey")
    ranked = rev.withColumn("rn", F.row_number().over(w))
    who = F.when(F.col("rn") <= 3, F.col("o_custkey").cast("string")) \
           .otherwise(F.lit("OTHERS"))
    return (ranked.groupBy("nation", who.alias("who"))
            .agg(F.sum("cents").alias("cents"),
                 F.count(F.lit(1)).alias("n_customers")))


_AGING_ORACLE = """
WITH open_orders AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         datediff('day', CAST(o_orderdate AS DATE), DATE '1998-08-02') AS age_d
  FROM orders WHERE o_orderstatus <> 'F')
SELECT CASE WHEN age_d <= 30 THEN '0-30'
            WHEN age_d <= 60 THEN '31-60'
            WHEN age_d <= 90 THEN '61-90'
            ELSE '90+' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(cents) AS outstanding_cents
FROM open_orders GROUP BY 1
"""


@query("receivables_aging", oracle=_AGING_ORACLE)
def receivables_aging(spark, sf_dir):
    """Accounts-receivable aging: open (non-finalized) orders bucketed
    by days outstanding at the snapshot date — the finance close
    report.  Scan-side projection + 4-group rollup; the status filter
    pushes into the scan.
    """
    (orders,) = prep(spark, sf_dir, "orders")
    age = F.datediff(F.lit("1998-08-02").cast("date"),
                     F.to_date("o_orderdate"))
    bucket = (F.when(age <= 30, "0-30").when(age <= 60, "31-60")
              .when(age <= 90, "61-90").otherwise("90+"))
    return (orders.where(F.col("o_orderstatus") != "F")
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                 .alias("outstanding_cents")))


SHRINK_C = 50   # empirical-Bayes pseudo-observations

_SHRUNK_ORACLE = f"""
WITH lines AS (
  SELECT l.l_suppkey,
         CASE WHEN datediff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) > 90
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
per AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(is_late) AS BIGINT) AS late
  FROM lines GROUP BY 1),
g AS (SELECT (SUM(late) * 1000000) // SUM(n) AS global_ppm FROM per)
SELECT p.l_suppkey AS suppkey, p.n AS n_lines, p.late AS n_late,
       (p.late * 1000000) // p.n AS raw_ppm,
       (p.late * 1000000 + {SHRINK_C} * g.global_ppm) // (p.n + {SHRINK_C})
         AS shrunk_ppm
FROM per p CROSS JOIN g
"""


@query("smoothed_supplier_reliability", oracle=_SHRUNK_ORACLE)
def smoothed_supplier_reliability(spark, sf_dir):
    """Empirical-Bayes shrunk supplier late-rates: each supplier's
    late-shipment ppm pulled toward the global rate by {SHRINK_C}
    pseudo-observations — so a supplier with 3 shipments and 1 late
    doesn't top the risk list above one with 3000 and 900 (the
    small-sample ranking pathology `supplier_reliability`'s raw ppm
    has).

    shrunk = (late·1e6 + C·global_ppm) / (n + C), all floor-division
    integers.  One fact shuffle for the per-supplier rollup; the
    global rate is a one-row broadcast.
    """
    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    lines = (lineitem.join(orders.select("o_orderkey", "o_orderdate"),
                           F.col("l_orderkey") == F.col("o_orderkey"))
             .select("l_suppkey",
                     F.when(F.datediff(F.to_date("l_shipdate"),
                                       F.to_date("o_orderdate")) > 90, 1)
                     .otherwise(0).alias("is_late")))
    per = (lines.groupBy("l_suppkey")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("is_late").cast("long").alias("late"))
           .localCheckpoint(eager=False))
    g = per.agg(F.expr("(sum(late) * 1000000) div sum(n)").alias("global_ppm"))
    return (per.crossJoin(F.broadcast(g))
            .select(F.col("l_suppkey").alias("suppkey"),
                    F.col("n").alias("n_lines"),
                    F.col("late").alias("n_late"),
                    F.expr("(late * 1000000) div n").alias("raw_ppm"),
                    F.expr(f"(late * 1000000 + {SHRINK_C} * global_ppm) "
                           f"div (n + {SHRINK_C})").alias("shrunk_ppm")))


_SINGLESOURCE_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS exposure_cents,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey AS partkey, exposure_cents, n_lines
FROM per_part WHERE n_suppliers = 1
ORDER BY exposure_cents DESC, partkey
LIMIT 20
"""


@query("single_source_parts", oracle=_SINGLESOURCE_ORACLE)
def single_source_parts(spark, sf_dir):
    """Supply-chain concentration risk: the 20 highest-revenue parts
    bought from exactly ONE supplier — the single-source exposure list
    a procurement team hedges first (complements
    `supplier_reliability`'s per-vendor view with a per-PART view).

    One map-side-combined part rollup (distinct-supplier count +
    exposure), a selectivity filter, top-20 via
    TakeOrderedAndProject.
    """
    (lineitem,) = prep(spark, sf_dir, "lineitem")
    per_part = (lineitem.groupBy("l_partkey")
                .agg(F.countDistinct("l_suppkey").alias("n_suppliers"),
                     F.sum(F.round(F.col("l_extendedprice") * 100)
                           .cast("long")).alias("exposure_cents"),
                     F.count(F.lit(1)).alias("n_lines")))
    return (per_part.where(F.col("n_suppliers") == 1)
            .select(F.col("l_partkey").alias("partkey"),
                    "exposure_cents", "n_lines")
            .orderBy(F.col("exposure_cents").desc(), "partkey")
            .limit(20))


_PRICESPREAD_ORACLE = """
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
           // SUM(CAST(l_quantity AS BIGINT)) AS unit_cents
  FROM lineitem GROUP BY 1, 2),
spread AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         MIN(unit_cents) AS min_unit_cents,
         MAX(unit_cents) AS max_unit_cents
  FROM unit GROUP BY l_partkey HAVING COUNT(*) >= 2)
SELECT l_partkey AS partkey, n_suppliers, min_unit_cents, max_unit_cents,
       ((max_unit_cents - min_unit_cents) * 1000000) // min_unit_cents
         AS spread_ppm
FROM spread WHERE min_unit_cents > 0
ORDER BY spread_ppm DESC, partkey
LIMIT 20
"""


@query("supplier_price_spread", oracle=_PRICESPREAD_ORACLE)
def supplier_price_spread(spark, sf_dir):
    """Procurement arbitrage: the 20 parts with the widest unit-price
    spread across suppliers (spread over the cheapest, exact ppm) —
    where switching vendors pays the most.

    Floor-division unit prices per (part, supplier) from one rollup,
    a per-part min/max rollup, top-20 — every exchange carries
    dimension-scale rows.
    """
    (lineitem,) = prep(spark, sf_dir, "lineitem")
    unit = (lineitem.groupBy("l_partkey", "l_suppkey")
            .agg(F.expr("sum(CAST(ROUND(l_extendedprice * 100) AS BIGINT))"
                        " div sum(CAST(l_quantity AS BIGINT))")
                 .alias("unit_cents")))
    spread = (unit.groupBy("l_partkey")
              .agg(F.count(F.lit(1)).alias("n_suppliers"),
                   F.min("unit_cents").alias("min_unit_cents"),
                   F.max("unit_cents").alias("max_unit_cents"))
              .where(F.col("n_suppliers") >= 2))
    return (spread.where(F.col("min_unit_cents") > 0)
            .select(F.col("l_partkey").alias("partkey"), "n_suppliers",
                    "min_unit_cents", "max_unit_cents",
                    F.expr("((max_unit_cents - min_unit_cents) * 1000000) "
                           "div min_unit_cents").alias("spread_ppm"))
            .orderBy(F.col("spread_ppm").desc(), "partkey")
            .limit(20))


_EROSION_ORACLE = """
WITH realized AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           // SUM(CAST(l_quantity AS BIGINT)) AS realized_unit_cents,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_partkey)
SELECT r.l_partkey AS partkey,
       CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS retail_cents,
       r.realized_unit_cents, r.n_lines,
       ((CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
         - r.realized_unit_cents) * 1000000)
         // CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS erosion_ppm
FROM realized r JOIN part p ON r.l_partkey = p.p_partkey
WHERE ROUND(p.p_retailprice * 100) > 0
ORDER BY erosion_ppm DESC, partkey
LIMIT 20
"""


@query("price_erosion_ranking", oracle=_EROSION_ORACLE)
def price_erosion_ranking(spark, sf_dir):
    """Margin-erosion ranking: the 20 parts whose realized
    (post-discount) unit price sits furthest below list price, in
    exact ppm of retail — the pricing-team view of where discounts
    actually land (q14 measures promo revenue share; this names the
    SKUs bleeding margin).

    One fact rollup (floor-division realized unit price), a broadcast
    join onto the part dim, top-20 via TakeOrderedAndProject.
    """
    lineitem, part = prep(spark, sf_dir, "lineitem", "part")
    realized = (lineitem.groupBy("l_partkey")
                .agg(F.expr(
                    "sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)"
                    " AS BIGINT)) div sum(CAST(l_quantity AS BIGINT))")
                    .alias("realized_unit_cents"),
                    F.count(F.lit(1)).alias("n_lines")))
    retail = F.round(F.col("p_retailprice") * 100).cast("long")
    return (realized.join(F.broadcast(
                part.select("p_partkey", retail.alias("retail_cents"))),
                realized["l_partkey"] == F.col("p_partkey"))
            .where(F.col("retail_cents") > 0)
            .select(F.col("l_partkey").alias("partkey"), "retail_cents",
                    "realized_unit_cents", "n_lines",
                    F.expr("((retail_cents - realized_unit_cents) * 1000000)"
                           " div retail_cents").alias("erosion_ppm"))
            .orderBy(F.col("erosion_ppm").desc(), "partkey")
            .limit(20))


_BCG_ORACLE = """
WITH rev AS (
  SELECT p.p_brand AS brand,
         o.o_orderdate >= TIMESTAMP '1995-06-01' AS is_h2,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey),
per AS (
  SELECT brand,
         SUM(cents) AS total_cents,
         SUM(CASE WHEN is_h2 THEN cents ELSE 0 END) AS h2_cents,
         SUM(CASE WHEN is_h2 THEN 0 ELSE cents END) AS h1_cents
  FROM rev GROUP BY brand),
tot AS (SELECT SUM(total_cents) AS t FROM per)
SELECT brand,
       (per.total_cents * 1000000) // tot.t AS share_ppm,
       CASE WHEN per.h1_cents > 0
            THEN (per.h2_cents * 1000000) // per.h1_cents END AS growth_ppm
FROM per CROSS JOIN tot
"""


@query("brand_portfolio_matrix", oracle=_BCG_ORACLE)
def brand_portfolio_matrix(spark, sf_dir):
    """Portfolio (BCG-style) matrix source: per brand, revenue SHARE
    (ppm of corpus) on one axis and GROWTH (second-half over
    first-half revenue, ppm) on the other — the scatter behind
    invest/divest reviews.

    ONE three-way-join pass collapses to a |brands| rollup with
    conditional half-period sums; the share normalizer is a one-row
    broadcast.  Brands with no first-half revenue report NULL growth
    (total formulation) rather than a division error.
    """
    lineitem, orders, part = prep(spark, sf_dir, "lineitem", "orders", "part")
    rev = (lineitem
           .join(orders.select("o_orderkey", "o_orderdate"),
                 lineitem["l_orderkey"] == orders["o_orderkey"])
           .join(F.broadcast(part.select("p_partkey", "p_brand")),
                 lineitem["l_partkey"] == part["p_partkey"])
           .select(F.col("p_brand").alias("brand"),
                   (F.col("o_orderdate") >= "1995-06-01").alias("is_h2"),
                   F.round(F.col("l_extendedprice")
                           * (1 - F.col("l_discount")) * 100)
                   .cast("long").alias("cents")))
    per = (rev.groupBy("brand")
           .agg(F.sum("cents").alias("total_cents"),
                F.sum(F.when(F.col("is_h2"), F.col("cents")).otherwise(0))
                .alias("h2_cents"),
                F.sum(F.when(F.col("is_h2"), F.lit(0)).otherwise(F.col("cents")))
                .alias("h1_cents")))
    tot = per.agg(F.sum("total_cents").alias("t"))
    return (per.crossJoin(F.broadcast(tot))
            .select("brand",
                    F.expr("(total_cents * 1000000) div t").alias("share_ppm"),
                    F.when(F.col("h1_cents") > 0,
                           F.expr("(h2_cents * 1000000) div h1_cents"))
                    .alias("growth_ppm")))


_ASSORT_ORACLE = """
WITH rev AS (
  SELECT date_trunc('month', o.o_orderdate) AS month, l.l_partkey,
         SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
             AS BIGINT)) AS cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
ranked AS (
  SELECT month, cents,
         ROW_NUMBER() OVER (PARTITION BY month
                            ORDER BY cents DESC, l_partkey) AS rn
  FROM rev)
SELECT month,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       SUM(cents) AS total_cents,
       (SUM(CASE WHEN rn <= 10 THEN cents ELSE 0 END) * 1000000)
         // SUM(cents) AS top10_share_ppm
FROM ranked GROUP BY month
"""


@query("assortment_concentration_trend", oracle=_ASSORT_ORACLE)
def assortment_concentration_trend(spark, sf_dir):
    """Assortment concentration over time: each month's revenue share
    captured by its OWN top-10 parts (exact ppm) — a rising curve
    means the catalog is hollowing out into hits, the merchandising
    signal `pareto_concentration` gives only as a whole-period
    snapshot.

    One (month, part) rollup, a per-month rank window, a month rollup
    with a conditional top-10 sum — exchanges carry (months x parts)
    rows, never raw facts.
    """
    from pyspark.sql import Window
    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    rev = (lineitem.join(orders.select("o_orderkey", "o_orderdate"),
                         lineitem["l_orderkey"] == orders["o_orderkey"])
           .groupBy(F.date_trunc("month", "o_orderdate").alias("month"),
                    "l_partkey")
           .agg(F.sum(F.round(F.col("l_extendedprice")
                              * (1 - F.col("l_discount")) * 100).cast("long"))
                .alias("cents")))
    w = Window.partitionBy("month").orderBy(F.col("cents").desc(), "l_partkey")
    ranked = rev.withColumn("rn", F.row_number().over(w))
    return (ranked.groupBy("month")
            .agg(F.count(F.lit(1)).alias("n_parts"),
                 F.sum("cents").alias("total_cents"),
                 F.expr("(sum(CASE WHEN rn <= 10 THEN cents ELSE 0 END)"
                        " * 1000000) div sum(cents)")
                 .alias("top10_share_ppm")))


_LATCV_ORACLE = """
WITH lat AS (
  SELECT l.l_suppkey,
         CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS BIGINT) AS x
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
m AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS s, SUM(x * x) AS s2
  FROM lat GROUP BY l_suppkey)
SELECT l_suppkey AS suppkey, n AS n_lines,
       s // n AS mean_latency_days,
       ((n * s2 - s * s) * 1000000) // (s * s) AS cv2_ppm
FROM m
WHERE n >= 20 AND s > 0
ORDER BY cv2_ppm DESC, suppkey
LIMIT 20
"""


@query("supplier_latency_consistency", oracle=_LATCV_ORACLE)
def supplier_latency_consistency(spark, sf_dir):
    """Vendor CONSISTENCY ranking: the 20 suppliers with the most
    erratic ship latency by squared coefficient of variation
    (var/mean², exact ppm) — a vendor who is always 40 days late is
    plannable; one who swings 5-80 days breaks every promise date
    (`supplier_reliability` ranks the late, this ranks the
    unpredictable).

    cv² = (n·Σx² − S²)/S², all exact BIGINT from one map-side-
    combined rollup; minimum 20 lines for stability; top-20 via
    TakeOrderedAndProject.
    """
    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    lat = (lineitem.join(orders.select("o_orderkey", "o_orderdate"),
                         lineitem["l_orderkey"] == orders["o_orderkey"])
           .select("l_suppkey",
                   F.datediff(F.to_date("l_shipdate"),
                              F.to_date("o_orderdate")).cast("long")
                   .alias("x")))
    m = (lat.groupBy("l_suppkey")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"),
              F.sum(F.col("x") * F.col("x")).alias("s2")))
    return (m.where((F.col("n") >= 20) & (F.col("s") > 0))
            .select(F.col("l_suppkey").alias("suppkey"),
                    F.col("n").alias("n_lines"),
                    F.expr("s div n").alias("mean_latency_days"),
                    F.expr("((n * s2 - s * s) * 1000000) div (s * s)")
                    .alias("cv2_ppm"))
            .orderBy(F.col("cv2_ppm").desc(), "suppkey")
            .limit(20))


_SPLITS_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey, CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) AS n_ship_days
  FROM lineitem GROUP BY l_orderkey)
SELECT n_ship_days,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       (COUNT(*) * 1000000) // (SELECT COUNT(*) FROM per_order) AS share_ppm
FROM per_order GROUP BY n_ship_days
"""


@query("shipment_fragmentation", oracle=_SPLITS_ORACLE)
def shipment_fragmentation(spark, sf_dir):
    """Shipment fragmentation: how many distinct ship DATES each order
    needed, as a distribution with exact ppm shares — every extra
    shipment day is a box, a label, and a support ticket; the ops
    lever is moving mass toward 1.

    Two map-side-combined rollups (per-order distinct days, then the
    distribution); the share normalizer is a one-row broadcast.
    """
    (lineitem,) = prep(spark, sf_dir, "lineitem")
    per_order = (lineitem.groupBy("l_orderkey")
                 .agg(F.countDistinct("l_shipdate").alias("n_ship_days"))
                 .localCheckpoint(eager=False))
    tot = per_order.agg(F.count(F.lit(1)).alias("t"))
    return (per_order.groupBy("n_ship_days")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .crossJoin(F.broadcast(tot))
            .select("n_ship_days", "n_orders",
                    F.expr("(n_orders * 1000000) div t").alias("share_ppm")))


_LATTREND_ORACLE = """
WITH lat AS (
  SELECT date_trunc('month', o.o_orderdate) AS month,
         CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS BIGINT) AS d,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
r AS (
  SELECT month, d,
         ROW_NUMBER() OVER (PARTITION BY month
                            ORDER BY d, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY month) AS n
  FROM lat)
SELECT month,
       MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT) THEN d END) AS p50_days,
       MAX(CASE WHEN rn = CAST(CEIL(0.90 * n) AS BIGINT) THEN d END) AS p90_days,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM r GROUP BY month
"""


@query("fulfillment_latency_trend", oracle=_LATTREND_ORACLE)
def fulfillment_latency_trend(spark, sf_dir):
    """Monthly p50/p90 order-to-ship latency trend — the ops question
    is never "what is p90" but "is p90 DRIFTING"; this is the
    time-series the `fulfillment_business_days` snapshot feeds into.
    Exact order statistics per month (deterministic composite order
    key), one month-partitioned rank window.
    """
    from pyspark.sql import Window
    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    lat = (lineitem.join(orders.select("o_orderkey", "o_orderdate"),
                         lineitem["l_orderkey"] == orders["o_orderkey"])
           .select(F.date_trunc("month", "o_orderdate").alias("month"),
                   F.datediff(F.to_date("l_shipdate"),
                              F.to_date("o_orderdate")).cast("long").alias("d"),
                   "l_orderkey", "l_linenumber"))
    w = Window.partitionBy("month").orderBy("d", "l_orderkey", "l_linenumber")
    wn = Window.partitionBy("month")
    r = lat.select("month", "d",
                   F.row_number().over(w).alias("rn"),
                   F.count(F.lit(1)).over(wn).alias("n"))

    def band(q):
        return F.max(F.when(
            F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"),
            F.col("d")))

    return (r.groupBy("month")
            .agg(band(0.50).alias("p50_days"), band(0.90).alias("p90_days"),
                 F.count(F.lit(1)).alias("n_lines")))


_TRADE_ORACLE = """
WITH flows AS (
  SELECT s.s_nationkey AS supp_nation, c.c_nationkey AS cust_nation,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey),
outb AS (SELECT supp_nation AS nation, SUM(cents) AS out_cents
         FROM flows GROUP BY 1),
inb AS (SELECT cust_nation AS nation, SUM(cents) AS in_cents
        FROM flows GROUP BY 1)
SELECT n.n_name AS nation,
       COALESCE(o.out_cents, 0) AS exports_cents,
       COALESCE(i.in_cents, 0) AS imports_cents,
       COALESCE(o.out_cents, 0) - COALESCE(i.in_cents, 0) AS net_cents
FROM nation n
LEFT JOIN outb o ON n.n_nationkey = o.nation
LEFT JOIN inb i ON n.n_nationkey = i.nation
"""


@query("nation_trade_balance", oracle=_TRADE_ORACLE)
def nation_trade_balance(spark, sf_dir):
    """Cross-nation trade balance: for each nation, revenue its
    suppliers EXPORT (sold to foreign customers) vs its customers
    IMPORT, and the net — the aggregate ledger q7's per-pair flows
    roll up into.

    ONE pass over the cross-nation flows (dims broadcast, only
    lineitem⨝orders shuffles — the q7 plan), then two nation-sized
    rollups joined onto the 25-row nation dim.
    """
    lineitem, orders, customer, supplier, nation = prep(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    flows = (lineitem
             .join(orders.select("o_orderkey", "o_custkey"),
                   lineitem["l_orderkey"] == orders["o_orderkey"])
             .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
                   orders["o_custkey"] == customer["c_custkey"])
             .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
                   lineitem["l_suppkey"] == supplier["s_suppkey"])
             .where(F.col("s_nationkey") != F.col("c_nationkey"))
             .select(F.col("s_nationkey").alias("supp_nation"),
                     F.col("c_nationkey").alias("cust_nation"),
                     F.round(F.col("l_extendedprice")
                             * (1 - F.col("l_discount")) * 100).cast("long")
                     .alias("cents"))
             .localCheckpoint(eager=False))
    outb = flows.groupBy(F.col("supp_nation").alias("nk")) \
        .agg(F.sum("cents").alias("out_cents"))
    inb = flows.groupBy(F.col("cust_nation").alias("nk")) \
        .agg(F.sum("cents").alias("in_cents"))
    return (nation.select(F.col("n_nationkey").alias("nk"),
                          F.col("n_name").alias("nation"))
            .join(F.broadcast(outb), "nk", "left")
            .join(F.broadcast(inb), "nk", "left")
            .select("nation",
                    F.coalesce("out_cents", F.lit(0)).alias("exports_cents"),
                    F.coalesce("in_cents", F.lit(0)).alias("imports_cents"),
                    (F.coalesce("out_cents", F.lit(0))
                     - F.coalesce("in_cents", F.lit(0))).alias("net_cents")))


_MISSING_DAYS_ORACLE = """
WITH bounds AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
         MAX(CAST(o_orderdate AS DATE)) AS d1
  FROM orders),
grid AS (
  SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds),
observed AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders)
SELECT CAST(g.day AS TIMESTAMP) AS day
FROM grid g LEFT JOIN observed o ON g.day = o.day
WHERE o.day IS NULL
"""


@query("missing_order_days", oracle=_MISSING_DAYS_ORACLE)
def missing_order_days(spark, sf_dir):
    """ETL-hole detector: calendar days inside the table's own active
    span with ZERO orders — for a feed that should never sleep, each
    row is a lost batch / upstream outage to investigate (the batch
    twin of the streaming `flow_silence_report`).

    The grid generates from a one-row bounds aggregate (executor-side
    sequence explode, same discipline as gap_fill_daily), anti-joined
    against the distinct observed days — all dimension-scale after
    the distinct-day rollup.
    """
    (orders,) = prep(spark, sf_dir, "orders")
    bounds = orders.agg(F.min(F.to_date("o_orderdate")).alias("d0"),
                        F.max(F.to_date("o_orderdate")).alias("d1"))
    grid = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    observed = orders.select(F.to_date("o_orderdate").alias("day")).distinct()
    return (grid.join(observed, "day", "left_anti")
            .select(F.col("day").cast("timestamp").alias("day")))


_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id),
c AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_signup,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_click,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_purchase)
SELECT n_signup, n_click, n_purchase,
       CASE WHEN n_signup = 0 THEN 0
            ELSE n_click * 1000000 // n_signup END AS click_conv_ppm,
       CASE WHEN n_click = 0 THEN 0
            ELSE n_purchase * 1000000 // n_click END AS purchase_conv_ppm
FROM c
"""


@query("funnel_conversion", oracle=_FUNNEL_ORACLE)
def funnel_conversion(spark, sf_dir):
    """Ordered conversion funnel signup -> click -> purchase: a user
    counts at each stage only if the stage event happens STRICTLY
    AFTER their first event of the previous stage (the temporal-order
    matching that separates a funnel from three independent counts —
    and the composition the reference user builds from FilterInterceptor
    + SessionAnalyzer output by hand).

    Scale shape: each stage is a type-filtered (pushed-down scan)
    map-side-combined MIN per user joined to the previous stage's
    dimension-sized (user, t) rollup — three narrow passes, no
    row-wise self-join.  Conversion ratios are integer ppm (floor
    division both engines).
    """
    (events,) = prep(spark, sf_dir, "events")

    def stage(event_type, prev):
        e = events.where(F.col("event_type") == event_type)
        if prev is not None:
            e = (e.join(prev, "user_id")
                 .where(F.col("ts") > F.col("_pt")))
        return (e.groupBy("user_id").agg(F.min("ts").alias("_pt"))
                .localCheckpoint(eager=False))

    s1 = stage("signup", None)
    s2 = stage("click", s1)
    s3 = stage("purchase", s2)
    counts = (s1.agg(F.count(F.lit(1)).alias("n_signup"))
              .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_click")))
              .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase"))))
    conv = lambda n, d: F.when(F.col(d) == 0, F.lit(0).cast("long")) \
        .otherwise(F.expr(f"{n} * 1000000L div {d}"))  # noqa: E731
    return counts.select(
        "n_signup", "n_click", "n_purchase",
        conv("n_click", "n_signup").alias("click_conv_ppm"),
        conv("n_purchase", "n_click").alias("purchase_conv_ppm"))


_PATHS_ORACLE = """
WITH seq AS (
  SELECT event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3
LIMIT 15
"""


@query("top_event_paths", oracle=_PATHS_ORACLE)
def top_event_paths(spark, sf_dir):
    """Top 3-step behavioral paths: the most frequent ordered triples
    of consecutive event types per user — the path-mining extension of
    the 1-step `event_transitions` Markov matrix (what funnels should
    we even look at?).

    One user_id exchange for the lead window (the per-user sequence
    never leaves its partition), a |types|^3-bounded aggregate, and a
    top-15 that rides TakeOrderedAndProject — no global sort of data.
    Deterministic tiebreak (count desc, then lexicographic).
    """
    from pyspark.sql import Window
    (events,) = prep(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"))
    return (seq.where(F.col("e3").isNotNull())
            .groupBy("e1", "e2", "e3")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), "e1", "e2", "e3")
            .limit(15))
