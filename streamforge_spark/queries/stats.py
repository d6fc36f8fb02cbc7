"""Classical statistics over the fact tables: autocorrelation,
two-sample KS drift, drawdown, and Gini concentration.

The reference's analytics surface stops at windowed aggregates
(SessionAnalyzer.java, SURVEY §2.8); a production engine feeding
dashboards and data-quality monitors also needs the textbook series
statistics.  Every query here follows the repo's exact-arithmetic
discipline (integer cents/dollars, one IEEE float op sequence at the
very end, identical in the DuckDB oracle) so value hashes match
bit-for-bit at any parallelism.

Scale theme: each query first collapses the fact table with ONE
map-side-combined rollup (days / distinct cents / users / customers)
and runs its window math on the small rollup.  ``ks_value_drift``
demonstrates the fully distributed form: a two-phase bucketed prefix
sum, so even the cumulative stage never needs a single-partition
window.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from streamforge_spark.queries.common import prep
from streamforge_spark.registry import query

_ACF_LAGS = 7

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS dollars
  FROM orders GROUP BY 1),
m AS (SELECT CAST(FLOOR(CAST(SUM(dollars) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mu
      FROM daily),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) AS rn,
         dollars - (SELECT mu FROM m) AS c
  FROM daily),
den AS (SELECT SUM(c * c) AS d FROM cent),
pairs AS (
  SELECT l.lag_k, a.c * b.c AS p
  FROM (VALUES (1), (2), (3), (4), (5), (6), (7)) l(lag_k)
  JOIN cent a ON TRUE
  JOIN cent b ON b.rn = a.rn + l.lag_k)
SELECT lag_k, COUNT(*) AS n_pairs,
       CAST(SUM(p) AS DOUBLE) / (SELECT CAST(d AS DOUBLE) FROM den) AS acf
FROM pairs GROUP BY lag_k ORDER BY lag_k
"""


@query("acf_daily_revenue", oracle=_ACF_ORACLE)
def acf_daily_revenue(spark, sf_dir):
    """Autocorrelation of the daily order-revenue series at lags 1..7
    (the standard estimator: lagged co-moments over the full-series
    second moment).

    Exactness: the series is whole dollars (BIGINT); the mean is the
    floored integer mean, so centered values, all products, and both
    moment sums are exact BIGINT; ``acf`` is one IEEE division of two
    exact integers — bit-identical to the oracle.  (BIGINT holds the
    moment sums up to roughly sf300; past that the two sums become
    DECIMAL(38,0)/HUGEINT with no other change.)

    Scale: the fact scan reduces to a |days|-sized rollup via ONE
    map-side-combined aggregation; the lag windows and moment sums run
    on that KB-scale table (the single-partition window is over days,
    never rows).  No Python, no collect.
    """
    (orders,) = prep(spark, sf_dir, "orders")
    # The |days| rollup is consumed four times (mean, centering, both
    # moment sums); materialize it once so the fact table is scanned
    # ONCE — it is KB-scale, so the checkpoint is free.
    daily = (orders
             .groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.sum(F.round("o_totalprice").cast("long")).alias("dollars"))
             .localCheckpoint(eager=False))
    mu = daily.agg(
        F.floor(F.sum("dollars").cast("double") / F.count(F.lit(1)))
        .cast("long").alias("mu"))
    cent = (daily.crossJoin(F.broadcast(mu))
            .select((F.col("dollars") - F.col("mu")).alias("c"), "day")
            .withColumn("rn", F.row_number().over(Window.orderBy("day"))))
    den = cent.agg(F.sum(F.col("c") * F.col("c")).alias("d"))
    w = Window.orderBy("rn")
    lag_cols = [F.lag("c", k).over(w).alias(f"c{k}") for k in range(1, _ACF_LAGS + 1)]
    stacked = (cent.select("c", *lag_cols)
               .select("c", F.expr(
                   "stack({n}, {args}) AS (lag_k, c_lag)".format(
                       n=_ACF_LAGS,
                       args=", ".join(f"{k}, c{k}" for k in range(1, _ACF_LAGS + 1)))))
               .where(F.col("c_lag").isNotNull()))
    num = (stacked.groupBy("lag_k")
           .agg(F.count(F.lit(1)).alias("n_pairs"),
                F.sum(F.col("c") * F.col("c_lag")).alias("num")))
    return (num.crossJoin(F.broadcast(den))
            .select(F.col("lag_k").cast("int").alias("lag_k"),
                    "n_pairs",
                    (F.col("num").cast("double") / F.col("d").cast("double"))
                    .alias("acf"))
            .orderBy("lag_k"))


_KS_ORACLE = """
WITH ev AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS eus
  FROM events),
bounds AS (SELECT MIN(eus) AS lo, MAX(eus) AS hi FROM ev),
tagged AS (
  SELECT cents,
         CASE WHEN eus < (SELECT lo + (hi - lo) // 2 FROM bounds)
              THEN 1 ELSE 0 END AS early
  FROM ev),
per_value AS (
  SELECT cents, SUM(early) AS n1, SUM(1 - early) AS n2
  FROM tagged GROUP BY cents),
cum AS (
  SELECT cents,
         SUM(n1) OVER (ORDER BY cents) AS c1,
         SUM(n2) OVER (ORDER BY cents) AS c2
  FROM per_value),
tot AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM per_value)
SELECT t.t1 AS n_early, t.t2 AS n_late,
       CAST(MAX(ABS(c.c1 * t.t2 - c.c2 * t.t1)) AS DOUBLE)
         / (CAST(t.t1 AS DOUBLE) * CAST(t.t2 AS DOUBLE)) AS ks_stat
FROM cum c, tot t
GROUP BY t.t1, t.t2
"""

_KS_BUCKET = 1000  # cents per ECDF bucket (partition key of phase 1)


@query("ks_value_drift", oracle=_KS_ORACLE)
def ks_value_drift(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov drift statistic: the event-value
    distribution of the first half of the time range vs the second
    half (split at the midpoint timestamp).

    D = max over values of |ECDF_early − ECDF_late|, computed exactly
    as MAX(|cum1·n2 − cum2·n1|) / (n1·n2): every term is BIGINT (the
    cross products stay under 2^63 up to ~10^9 rows per side) and the
    single division is the same IEEE sequence as the oracle.

    Scale — fully distributed ECDF: the fact table collapses to a
    distinct-cents rollup (map-side combined), then the cumulative
    counts use a TWO-PHASE BUCKETED PREFIX SUM: within-bucket running
    sums are windowed PARTITIONED BY bucket (parallel), bucket offsets
    come from a tiny bucket-totals rollup, broadcast back.  No
    single-partition window over data-sized input anywhere in the
    plan, so the ECDF scales to an arbitrary value domain.
    """
    (events,) = prep(spark, sf_dir, "events")
    ev = events.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.unix_micros("ts").alias("eus"))
    bounds = ev.agg(F.min("eus").alias("lo"), F.max("eus").alias("hi"))
    tagged = (ev.crossJoin(F.broadcast(bounds))
              .select("cents",
                      F.when(F.col("eus") < F.col("lo")
                             + F.expr("(hi - lo) DIV 2"), F.lit(1))
                      .otherwise(F.lit(0)).alias("early")))
    # The distinct-cents rollup feeds four consumers (within-bucket
    # cumsum, bucket totals, offsets, grand totals); materialize it
    # once so events is scanned only for the bounds pass + the tally
    # pass, never re-scanned per consumer.
    per_value = (tagged.groupBy("cents")
                 .agg(F.sum("early").alias("n1"),
                      F.sum(F.lit(1) - F.col("early")).alias("n2"))
                 .withColumn("bucket", F.expr(f"cents DIV {_KS_BUCKET}"))
                 .localCheckpoint(eager=False))
    w_in = (Window.partitionBy("bucket").orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    within = (per_value
              .withColumn("w1", F.sum("n1").over(w_in))
              .withColumn("w2", F.sum("n2").over(w_in)))
    btot = (per_value.groupBy("bucket")
            .agg(F.sum("n1").alias("b1"), F.sum("n2").alias("b2")))
    w_b = (Window.orderBy("bucket")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = (btot
               .withColumn("off1", F.sum("b1").over(w_b) - F.col("b1"))
               .withColumn("off2", F.sum("b2").over(w_b) - F.col("b2"))
               .select("bucket", "off1", "off2"))
    cum = (within.join(F.broadcast(offsets), "bucket")
           .select((F.col("off1") + F.col("w1")).alias("c1"),
                   (F.col("off2") + F.col("w2")).alias("c2")))
    tot = per_value.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    return (cum.crossJoin(F.broadcast(tot))
            .groupBy("t1", "t2")
            .agg(F.max(F.abs(F.col("c1") * F.col("t2")
                             - F.col("c2") * F.col("t1"))).alias("m"))
            .select(F.col("t1").alias("n_early"), F.col("t2").alias("n_late"),
                    (F.col("m").cast("double")
                     / (F.col("t1").cast("double") * F.col("t2").cast("double")))
                    .alias("ks_stat")))


@query(
    "max_drawdown_user",
    oracle="""
SELECT user_id, MAX(runmax) AS peak_cents,
       MAX(runmax - cum) AS max_drawdown_cents
FROM (
  SELECT user_id, cum,
         MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
  FROM (
    SELECT user_id, ts, event_id,
           SUM(CAST(ROUND(value * 100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM events))
GROUP BY user_id
""",
)
def max_drawdown_user(spark, sf_dir):
    """Per-user maximum drawdown of the cumulative event-value ledger:
    the largest peak-to-trough drop of the running total, plus the
    all-time peak.

    Spark shape: two stacked window functions over ONE ``user_id``
    exchange — running sum (the ledger), running max (the peak so
    far) — then a map-side-combined per-user rollup of the gap.  The
    (ts, event_id) order key is unique, so the fold is deterministic.
    All integers; no Python; one shuffle.
    """
    (events,) = prep(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ledger = events.select(
        "user_id", "ts", "event_id",
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias("cum"))
    ledger = ledger.withColumn("runmax", F.max("cum").over(w))
    return (ledger.groupBy("user_id")
            .agg(F.max("runmax").alias("peak_cents"),
                 F.max(F.col("runmax") - F.col("cum"))
                 .alias("max_drawdown_cents")))


_GINI_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i
  FROM per_cust)
SELECT COUNT(*) AS n_customers,
       SUM(cents) AS total_cents,
       (2.0 * CAST(SUM(i * cents) AS DOUBLE))
         / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE))
       - (CAST(COUNT(*) AS DOUBLE) + 1.0) / CAST(COUNT(*) AS DOUBLE) AS gini
FROM ranked
"""


@query("gini_revenue", oracle=_GINI_ORACLE)
def gini_revenue(spark, sf_dir):
    """Gini coefficient of customer revenue concentration, via the
    rank formula G = 2·Σ i·xᵢ / (n·Σxᵢ) − (n+1)/n over the ascending
    revenue order.

    Exactness: revenue is integer cents; Σ i·xᵢ and Σ xᵢ are exact
    BIGINT (ties contribute the same regardless of intra-tie order,
    and the (cents, custkey) key makes the rank itself deterministic
    anyway); the final expression is the identical IEEE sequence as
    the oracle.

    Scale: the fact table collapses to a |customers| rollup first
    (map-side combined); the global rank runs on that rollup.  Past
    dimension scale the rank becomes the bucketed two-phase prefix
    sum demonstrated in ``ks_value_drift`` (bucket by revenue range,
    offset by bucket counts) — same math, no single-partition window.
    """
    (orders,) = prep(spark, sf_dir, "orders")
    per_cust = (orders.groupBy("o_custkey")
                .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                     .alias("cents")))
    ranked = per_cust.select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "o_custkey")).alias("i"))
    n = F.count(F.lit(1))
    return ranked.agg(
        n.alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        ((F.lit(2.0) * F.sum(F.col("i") * F.col("cents")).cast("double"))
         / (n.cast("double") * F.sum("cents").cast("double"))
         - (n.cast("double") + F.lit(1.0)) / n.cast("double")).alias("gini"))


_XCORR_LAGS = 3

_XCORR_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) FILTER (WHERE event_type = 'click') AS a,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS b
  FROM events GROUP BY 1),
m AS (SELECT CAST(FLOOR(CAST(SUM(a) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ma,
             CAST(FLOOR(CAST(SUM(b) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mb
      FROM daily),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) AS rn,
         a - (SELECT ma FROM m) AS ca,
         b - (SELECT mb FROM m) AS cb
  FROM daily),
den AS (SELECT SUM(ca * ca) AS da, SUM(cb * cb) AS db FROM cent),
pairs AS (
  SELECT l.lag_k, x.ca * y.cb AS p
  FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) l(lag_k)
  JOIN cent x ON TRUE
  JOIN cent y ON y.rn = x.rn + l.lag_k)
SELECT lag_k, COUNT(*) AS n_pairs,
       CAST(SUM(p) AS DOUBLE)
         / SQRT(CAST((SELECT da FROM den) AS DOUBLE)
                * CAST((SELECT db FROM den) AS DOUBLE)) AS xcorr
FROM pairs GROUP BY lag_k ORDER BY lag_k
"""


@query("xcorr_lead_lag", oracle=_XCORR_ORACLE)
def xcorr_lead_lag(spark, sf_dir):
    """Lead-lag cross-correlation between the daily click series and
    the daily purchase series at lags -3..+3 — positive-lag peaks mean
    clicks LEAD purchases by that many days (the campaign-to-
    conversion delay estimator).

    Same exact-arithmetic scheme as ``acf_daily_revenue``: integer
    daily counts, floored integer means, exact BIGINT co-moments; the
    one float step is num / sqrt(da*db) — sqrt is correctly rounded
    under IEEE 754, so the identical operand sequence matches the
    oracle bit-for-bit.

    Scale: ONE map-side-combined (day) rollup of the fact table, then
    lag windows over the |days|-sized series.  Negative and positive
    lags come from the same seven stacked lead columns — one window
    pass, no per-lag self-joins.
    """
    (events,) = prep(spark, sf_dir, "events")
    daily = (events
             .groupBy(F.to_date("ts").alias("day"))
             .agg(F.count(F.when(F.col("event_type") == "click", 1)).alias("a"),
                  F.count(F.when(F.col("event_type") == "purchase", 1)).alias("b"))
             .localCheckpoint(eager=False))
    m = daily.agg(
        F.floor(F.sum("a").cast("double") / F.count(F.lit(1))).cast("long").alias("ma"),
        F.floor(F.sum("b").cast("double") / F.count(F.lit(1))).cast("long").alias("mb"))
    cent = (daily.crossJoin(F.broadcast(m))
            .select("day",
                    (F.col("a") - F.col("ma")).alias("ca"),
                    (F.col("b") - F.col("mb")).alias("cb"))
            .withColumn("rn", F.row_number().over(Window.orderBy("day"))))
    den = cent.agg(F.sum(F.col("ca") * F.col("ca")).alias("da"),
                   F.sum(F.col("cb") * F.col("cb")).alias("db"))
    w = Window.orderBy("rn")
    lags = range(-_XCORR_LAGS, _XCORR_LAGS + 1)
    lag_cols = [F.lag("cb", -k).over(w).alias(f"cb_{k + _XCORR_LAGS}")
                for k in lags]
    stacked = (cent.select("ca", *lag_cols)
               .select("ca", F.expr(
                   "stack({n}, {args}) AS (lag_k, cb_lag)".format(
                       n=len(list(lags)),
                       args=", ".join(f"{k}, cb_{k + _XCORR_LAGS}"
                                      for k in lags))))
               .where(F.col("cb_lag").isNotNull()))
    num = (stacked.groupBy("lag_k")
           .agg(F.count(F.lit(1)).alias("n_pairs"),
                F.sum(F.col("ca") * F.col("cb_lag")).alias("num")))
    return (num.crossJoin(F.broadcast(den))
            .select(F.col("lag_k").cast("int").alias("lag_k"),
                    "n_pairs",
                    (F.col("num").cast("double")
                     / F.sqrt(F.col("da").cast("double")
                              * F.col("db").cast("double"))).alias("xcorr"))
            .orderBy("lag_k"))


_FIFO_ORACLE = """
WITH supply AS (
  SELECT user_id, event_id AS supply_event,
         SUM(CAST(ROUND(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_hi,
         CAST(ROUND(value * 100) AS BIGINT) AS amt
  FROM events WHERE event_type IN ('signup', 'click')),
demand AS (
  SELECT user_id, event_id AS demand_event,
         SUM(CAST(ROUND(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d_hi,
         CAST(ROUND(value * 100) AS BIGINT) AS amt
  FROM events WHERE event_type = 'purchase')
SELECT s.user_id, s.supply_event, d.demand_event,
       LEAST(s.s_hi, d.d_hi) - GREATEST(s.s_hi - s.amt, d.d_hi - d.amt)
         AS matched_cents
FROM supply s JOIN demand d
  ON s.user_id = d.user_id
 AND s.s_hi - s.amt < d.d_hi
 AND d.d_hi - d.amt < s.s_hi
WHERE LEAST(s.s_hi, d.d_hi) - GREATEST(s.s_hi - s.amt, d.d_hi - d.amt) > 0
"""


@query("fifo_lot_matching", oracle=_FIFO_ORACLE)
def fifo_lot_matching(spark, sf_dir):
    """FIFO lot matching: per user, allocate each purchase (demand)
    against signup/click credits (supply lots) in strict POSITIONAL
    order — classic FIFO lot accounting: the j-th demanded unit
    always matches the j-th supplied unit, so a demand arriving ahead
    of its supply back-orders against the next lots (pinned by the
    conservation property test).  The inventory-costing /
    payment-application allocation, solved WITHOUT per-row iteration.

    The closed form: FIFO consumption is interval intersection of the
    two cumulative prefix sums — supply lot i covers [s_hi-amt, s_hi)
    of cumulative credit, demand j consumes [d_hi-amt, d_hi); the
    matched quantity is the overlap length.  Exact integer cents.

    Scale: ONE scan + ONE user_id window exchange computes BOTH
    ledgers (conditional prefix sums side by side over the tagged,
    materialized frame), then a per-user interval-overlap join — each
    demand matches O(1) lots amortized (intervals partition the
    line), so output is ~|supply|+|demand| rows, never a blow-up; a
    monster key range-partitions its prefix sums like every ledger op
    here.
    """
    (events,) = prep(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    is_supply = F.col("event_type").isin("signup", "click")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tagged = (events
              .where(is_supply | (F.col("event_type") == "purchase"))
              .select("user_id", "event_id", "ts",
                      cents.alias("amt"), is_supply.alias("sup"))
              .select("user_id", "event_id", "amt", "sup",
                      F.sum(F.when(F.col("sup"), F.col("amt"))
                            .otherwise(F.lit(0))).over(w).alias("s_cum"),
                      F.sum(F.when(~F.col("sup"), F.col("amt"))
                            .otherwise(F.lit(0))).over(w).alias("d_cum"))
              .localCheckpoint(eager=False))
    s = (tagged.where("sup")
         .select("user_id", F.col("event_id").alias("supply_event"),
                 (F.col("s_cum") - F.col("amt")).alias("s_lo"),
                 F.col("s_cum").alias("s_hi")))
    d = (tagged.where(~F.col("sup"))
         .select(F.col("user_id").alias("d_user"),
                 F.col("event_id").alias("demand_event"),
                 (F.col("d_cum") - F.col("amt")).alias("d_lo"),
                 F.col("d_cum").alias("d_hi")))
    matched = (F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo"))
    return (s.join(d, (s["user_id"] == d["d_user"])
                   & (s["s_lo"] < d["d_hi"]) & (d["d_lo"] < s["s_hi"]))
            .select("user_id", "supply_event", "demand_event",
                    matched.alias("matched_cents"))
            .where(F.col("matched_cents") > 0))


_BUSDAYS_ORACLE = """
WITH per_order AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         datediff('day', DATE '1970-01-05', CAST(o.o_orderdate AS DATE)) AS j1,
         datediff('day', DATE '1970-01-05', MAX(CAST(l.l_shipdate AS DATE))) AS j2
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3),
bd AS (
  SELECT o_orderpriority,
         (5 * (j2 // 7) + LEAST(j2 % 7, 5))
           - (5 * (j1 // 7) + LEAST(j1 % 7, 5)) AS bus_days
  FROM per_order)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(bus_days) AS total_bus_days,
       (SUM(bus_days) * 1000000) // COUNT(*) AS avg_bus_days_ppm
FROM bd GROUP BY o_orderpriority
"""


@query("fulfillment_business_days", oracle=_BUSDAYS_ORACLE)
def fulfillment_business_days(spark, sf_dir):
    """Order-to-last-shipment latency in BUSINESS days (weekends
    excluded) per order priority — the SLA metric contracts are
    actually written in.

    Weekday counting is the closed form f(d) = 5*(j DIV 7) +
    least(j MOD 7, 5) with j = days since a Monday epoch
    (1970-01-05): no calendar explode, no per-day anything — so it
    composes into the scan projection.  (Spark's dayofweek is 1-based
    and DuckDB's 0-based; the epoch-arithmetic form sidesteps that
    trap entirely.)  All integers; the ppm average is floor division.

    Scale: lineitem collapses to max(shipdate) per order in one
    map-side-combined rollup, joins orders on the key, and the
    priority rollup is 5 rows.
    """
    orders, lineitem = prep(spark, sf_dir, "orders", "lineitem")
    ship = (lineitem.groupBy("l_orderkey")
            .agg(F.max(F.to_date("l_shipdate")).alias("ship_d")))
    j = lambda c: F.datediff(c, F.lit("1970-01-05").cast("date"))  # noqa: E731
    f = lambda jc: (F.lit(5) * F.expr(f"({jc}) div 7")  # noqa: E731
                    + F.least(F.expr(f"({jc}) % 7"), F.lit(5)))
    per_order = (orders.join(ship, orders["o_orderkey"] == ship["l_orderkey"])
                 .select("o_orderpriority",
                         j(F.to_date("o_orderdate")).alias("j1"),
                         j(F.col("ship_d")).alias("j2")))
    bd = per_order.select(
        "o_orderpriority",
        (f("j2") - f("j1")).alias("bus_days"))
    return (bd.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum("bus_days").alias("total_bus_days"),
                 F.expr("(sum(bus_days) * 1000000) div count(*)")
                 .alias("avg_bus_days_ppm")))


_THEILSEN_ORACLE = """
WITH daily AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
  FROM events GROUP BY 1, 2),
slopes AS (
  SELECT a.event_type,
         ((b.y - a.y) * 1000000) // (b.x - a.x) AS slope_micro
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.x > a.x),
ranked AS (
  SELECT event_type, slope_micro,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY slope_micro, slope_micro) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM slopes)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_slopes,
       MAX(CASE WHEN rn = (n + 1) // 2 THEN slope_micro END)
         AS median_slope_micro
FROM ranked GROUP BY event_type
"""


@query("theilsen_trend", oracle=_THEILSEN_ORACLE)
def theilsen_trend(spark, sf_dir):
    """Theil–Sen robust trend per event type: the MEDIAN of all
    pairwise slopes of the daily-revenue series — outlier days that
    wreck the OLS trend (`user_value_trend`) barely move this one.

    Exactness without float slopes: each slope is (dy*1e6) DIV dx —
    exact integer micro-units with floor semantics identical in both
    engines — and the median is the lower order statistic at rank
    (n+1) DIV 2, so no float ever decides an ordering.

    Scale: the fact table collapses to the (type, day) rollup first;
    pair generation is quadratic ONLY in |days| per type (the series
    length, not row count) — 365 days → 66k slope rows per type, a
    rounding error next to the fact scan.
    """
    (events,) = prep(spark, sf_dir, "events")
    daily = (events.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .alias("x"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))
        .localCheckpoint(eager=False))
    a = daily.select("event_type", F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("event_type").alias("et2"),
                     F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = (a.join(b, (a["event_type"] == b["et2"]) & (b["xb"] > a["xa"]))
              .select("event_type",
                      F.expr("((yb - ya) * 1000000) div (xb - xa)")
                      .alias("slope_micro")))
    w = Window.partitionBy("event_type").orderBy("slope_micro")
    wn = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type", "slope_micro",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"))
    return (ranked.groupBy("event_type")
            .agg(F.max("n").alias("n_slopes"),
                 F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"),
                              F.col("slope_micro")))
                 .alias("median_slope_micro")))


_BOOT_B = 32

_BOOT_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
reps AS (
  SELECT r.b, o.cents
  FROM o, UNNEST(generate_series(1, {_BOOT_B})) AS r(b)
  WHERE CAST(('0x' || substr(md5('boot-v1:' || CAST(r.b AS VARCHAR) || ':'
        || CAST(o.o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0),
means AS (
  SELECT b, SUM(cents) // COUNT(*) AS mean_cents
  FROM reps GROUP BY b),
ranked AS (
  SELECT mean_cents, ROW_NUMBER() OVER (ORDER BY mean_cents, mean_cents) AS rn
  FROM means)
SELECT CAST({_BOOT_B} AS BIGINT) AS n_replicates,
       MAX(CASE WHEN rn = 1 THEN mean_cents END) AS lo_cents,
       MAX(CASE WHEN rn = {_BOOT_B} THEN mean_cents END) AS hi_cents,
       MAX(CASE WHEN rn = {_BOOT_B // 2} THEN mean_cents END) AS mid_cents
FROM ranked
"""


@query("bootstrap_ci_revenue", oracle=_BOOT_ORACLE)
def bootstrap_ci_revenue(spark, sf_dir):
    """Subsampling bootstrap for the mean order value: {_BOOT_B}
    deterministic half-samples (row r joins replicate b iff
    md5('boot-v1:b:key') is even — the reproducible-coin idiom, so
    any engine draws the SAME replicates), each replicate's integer
    mean, and the min/median/max replicate means as the spread
    estimate.

    Scale: replicate fan-out is explode(sequence(1, B)) over the
    (key, cents) projection — B× amplification of two BIGINTs, not of
    rows' full width — and the per-replicate means are ONE map-side-
    combined rollup of B groups.  All floor-division integers.
    """
    (orders,) = prep(spark, sf_dir, "orders")
    from streamforge_spark.functions.simdedup import oracle_hash60
    o = orders.select("o_orderkey",
                      F.round(F.col("o_totalprice") * 100).cast("long")
                      .alias("cents"))
    reps = (o.select("o_orderkey", "cents",
                     F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"))
            .where(F.pmod(oracle_hash60(
                F.concat(F.col("b").cast("string"), F.lit(":"),
                         F.col("o_orderkey").cast("string")), salt="boot-v1"),
                F.lit(2)) == 0))
    means = (reps.groupBy("b")
             .agg(F.expr("sum(cents) div count(*)").alias("mean_cents")))
    ranked = means.select(
        "mean_cents",
        F.row_number().over(Window.orderBy("mean_cents")).alias("rn"))
    return ranked.agg(
        F.lit(_BOOT_B).cast("long").alias("n_replicates"),
        F.max(F.when(F.col("rn") == 1, F.col("mean_cents"))).alias("lo_cents"),
        F.max(F.when(F.col("rn") == _BOOT_B, F.col("mean_cents"))).alias("hi_cents"),
        F.max(F.when(F.col("rn") == _BOOT_B // 2, F.col("mean_cents"))).alias("mid_cents"))


_IMPUTE_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
mean_ AS (
  SELECT event_type, SUM(cents) // COUNT(*) AS mean_cents FROM v GROUP BY 1),
ranked AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v),
median_ AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS median_cents
  FROM ranked GROUP BY event_type),
freq AS (SELECT event_type, cents, COUNT(*) AS c FROM v GROUP BY 1, 2),
mode_ AS (
  SELECT event_type, cents AS mode_cents FROM (
    SELECT event_type, cents,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY c DESC, cents) AS rm
    FROM freq) WHERE rm = 1)
SELECT m.event_type, m.mean_cents, d.median_cents, o.mode_cents
FROM mean_ m JOIN median_ d USING (event_type) JOIN mode_ o USING (event_type)
"""


@query("imputation_values", oracle=_IMPUTE_ORACLE)
def imputation_values(spark, sf_dir):
    """Null-imputation fitting: per event type, the three classic
    fill values — floored integer mean, lower-median order statistic,
    and mode (ties broken to the smallest value) — the artifacts a
    feature pipeline persists at train time and replays at serving.

    Scale: mean and mode come from map-side-combined rollups (the
    mode's (type, cents) rollup is bounded by the value domain); the
    median is the one rank window, per type.  The three KB-scale
    results join on the 4-row type key.
    """
    (events,) = prep(spark, sf_dir, "events")
    # three consumers (mean, median, mode) — materialize the 2-column
    # projection once so the fact table is scanned once, not thrice
    v = events.select("event_type",
                      F.round(F.col("value") * 100).cast("long").alias("cents")) \
        .localCheckpoint(eager=False)
    mean_ = v.groupBy("event_type").agg(
        F.expr("sum(cents) div count(*)").alias("mean_cents"))
    w = Window.partitionBy("event_type").orderBy("cents")
    wn = Window.partitionBy("event_type")
    median_ = (v.select("event_type", "cents",
                        F.row_number().over(w).alias("rn"),
                        F.count(F.lit(1)).over(wn).alias("n"))
               .groupBy("event_type")
               .agg(F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"),
                                 F.col("cents"))).alias("median_cents")))
    freq = v.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("c"))
    wm = Window.partitionBy("event_type").orderBy(F.col("c").desc(), "cents")
    mode_ = (freq.withColumn("rm", F.row_number().over(wm))
             .where(F.col("rm") == 1)
             .select("event_type", F.col("cents").alias("mode_cents")))
    return (mean_.join(median_, "event_type").join(mode_, "event_type"))


_CHISQ_ORACLE = """
WITH obs AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS o FROM events GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(o) AS t FROM obs)
SELECT t.k AS n_categories, t.t AS n_events,
       CAST(SUM((o.o * t.k - t.t) * (o.o * t.k - t.t)) AS DOUBLE)
         / (CAST(t.k AS DOUBLE) * CAST(t.t AS DOUBLE)) AS chisq_uniform
FROM obs o CROSS JOIN tot t
GROUP BY t.k, t.t
"""


@query("chisq_event_mix", oracle=_CHISQ_ORACLE)
def chisq_event_mix(spark, sf_dir):
    """Chi-square goodness-of-fit of the event-type mix against the
    uniform expectation — the alert behind "did a producer stop
    sending one event class?", complementing per-bucket drift
    (value_drift_report) with a single-number category test.

    Identity used: with e = t/k, sum((o-e)^2/e) == sum((o*k - t)^2) /
    (k*t) — the left side needs float expectations per category, the
    right side is ONE exact BIGINT sum and a single IEEE division.

    Scale: one map-side-combined type rollup (k rows), a one-row
    total, a broadcast cross — nothing data-sized after the scan.
    """
    (events,) = prep(spark, sf_dir, "events")
    obs = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("o")) \
        .localCheckpoint(eager=False)
    tot = obs.agg(F.count(F.lit(1)).alias("k"), F.sum("o").alias("t"))
    return (obs.crossJoin(F.broadcast(tot))
            .groupBy("k", "t")
            .agg(F.sum((F.col("o") * F.col("k") - F.col("t"))
                       * (F.col("o") * F.col("k") - F.col("t"))).alias("num"))
            .select(F.col("k").alias("n_categories"),
                    F.col("t").alias("n_events"),
                    (F.col("num").cast("double")
                     / (F.col("k").cast("double") * F.col("t").cast("double")))
                    .alias("chisq_uniform")))


_QQ_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE event_type IN ('click', 'purchase')),
q AS (
  SELECT g.q20, v.event_type, MAX(v.cents) AS qv
  FROM (SELECT UNNEST(generate_series(1, 19)) AS q20) g
  JOIN v ON v.rn = CAST(CEIL(g.q20 * v.n / 20.0) AS BIGINT)
  GROUP BY 1, 2)
SELECT a.q20 AS ventile,
       a.qv AS click_cents,
       b.qv AS purchase_cents,
       b.qv - a.qv AS gap_cents
FROM q a JOIN q b ON a.q20 = b.q20
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
"""


@query("qq_plot_points", oracle=_QQ_ORACLE)
def qq_plot_points(spark, sf_dir):
    """Q-Q plot data: the 19 ventiles of the click-value distribution
    against the same ventiles of the purchase-value distribution —
    the visual companion to `ks_value_drift` (KS says IF they differ;
    the Q-Q gap says WHERE).

    Exact order statistics (rank = ceil(q*n/20), deterministic
    (value, event_id) order), computed for both series in ONE rank
    window pass over the filtered scan — the ventile extraction is a
    19-row broadcast join against the ranked rows, not 19 queries.
    """
    (events,) = prep(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    v = (events.where(F.col("event_type").isin("click", "purchase"))
         .select("event_type",
                 F.round(F.col("value") * 100).cast("long").alias("cents"),
                 F.row_number().over(w).alias("rn"),
                 F.count(F.lit(1)).over(wn).alias("n")))
    g = spark.range(1, 20).select(F.col("id").cast("int").alias("q20"))
    # 38-row result consumed twice (click side, purchase side):
    # materialize so the ranked scan runs once
    q = (v.join(F.broadcast(g),
                F.col("rn") == F.ceil(F.col("q20") * F.col("n") / 20.0)
                .cast("long"))
         .groupBy("q20", "event_type").agg(F.max("cents").alias("qv"))
         .localCheckpoint(eager=False))
    a = q.where(F.col("event_type") == "click") \
         .select(F.col("q20").alias("ventile"), F.col("qv").alias("click_cents"))
    b = q.where(F.col("event_type") == "purchase") \
         .select(F.col("q20").alias("bq"), F.col("qv").alias("purchase_cents"))
    return (a.join(b, a["ventile"] == b["bq"])
            .select("ventile", "click_cents", "purchase_cents",
                    (F.col("purchase_cents") - F.col("click_cents"))
                    .alias("gap_cents")))


_FANO_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
m AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS s, SUM(x * x) AS s2
  FROM daily GROUP BY user_id)
SELECT user_id, n AS n_active_days, s AS n_events,
       ((n * s2 - s * s) * 1000000) // (n * s) AS fano_ppm
FROM m
WHERE n >= 5
ORDER BY fano_ppm DESC, user_id
LIMIT 20
"""


@query("user_burstiness", oracle=_FANO_ORACLE)
def user_burstiness(spark, sf_dir):
    """Burstiness ranking: the 20 users whose daily activity deviates
    most from Poisson, by the Fano factor (population variance over
    mean of daily event counts) in exact ppm — Fano ≈ 1e6 is
    Poisson-steady, above it is bursty (bot bursts, retry storms).

    Identity: var/mean = (n·Σx² − S²) / (n·S), every term an exact
    BIGINT from ONE map-side-combined (user, day) rollup followed by
    one per-user rollup; floor division keeps it integer.  Top-20 via
    TakeOrderedAndProject; minimum 5 active days for stability.
    """
    (events,) = prep(spark, sf_dir, "events")
    daily = (events.groupBy("user_id", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("x")))
    m = (daily.groupBy("user_id")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("s"),
              F.sum(F.col("x") * F.col("x")).alias("s2")))
    return (m.where(F.col("n") >= 5)
            .select("user_id", F.col("n").alias("n_active_days"),
                    F.col("s").alias("n_events"),
                    F.expr("((n * s2 - s * s) * 1000000) div (n * s)")
                    .alias("fano_ppm"))
            .orderBy(F.col("fano_ppm").desc(), "user_id")
            .limit(20))


_WMEDIAN_ORACLE = """
WITH r AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS w
  FROM orders),
c AS (
  SELECT o_orderpriority, cents, w,
         SUM(w) OVER (PARTITION BY o_orderpriority
                      ORDER BY cents, w
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(w) OVER (PARTITION BY o_orderpriority) AS tw
  FROM r)
SELECT o_orderpriority,
       MIN(cents) AS weighted_median_cents,
       MIN(tw) AS total_weight
FROM c WHERE 2 * cw >= tw
GROUP BY o_orderpriority
"""


@query("weighted_median_order_value", oracle=_WMEDIAN_ORACLE)
def weighted_median_order_value(spark, sf_dir):
    """Revenue-weighted median order value per priority: the order
    value at which HALF THE MONEY (not half the orders) sits below —
    the statistic that answers "what does the typical dollar buy?"
    when a plain median answers "what does the typical order cost?".

    Weighted median = smallest value whose running weight reaches half
    the total: one prefix-sum window per priority (exact BIGINT cents
    as both value and weight), then a min over the qualifying
    suffix — no iteration, no floats.  ONE priority-key exchange.
    """
    (orders,) = prep(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    r = orders.select("o_orderpriority", cents.alias("cents"),
                      cents.alias("w"))
    wc = (Window.partitionBy("o_orderpriority").orderBy("cents", "w")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy("o_orderpriority")
    c = r.select("o_orderpriority", "cents",
                 F.sum("w").over(wc).alias("cw"),
                 F.sum("w").over(wt).alias("tw"))
    return (c.where(2 * F.col("cw") >= F.col("tw"))
            .groupBy("o_orderpriority")
            .agg(F.min("cents").alias("weighted_median_cents"),
                 F.min("tw").alias("total_weight")))


_STREAK_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS j
  FROM events),
g AS (
  SELECT user_id, j,
         j - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY j) AS grp
  FROM d),
runs AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
         MIN(j) AS start_j
  FROM g GROUP BY user_id, grp)
SELECT user_id,
       MAX(len) AS longest_streak_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(SUM(len) AS BIGINT) AS active_days
FROM runs GROUP BY user_id
"""


@query("activity_streaks", oracle=_STREAK_ORACLE)
def activity_streaks(spark, sf_dir):
    """Per-user engagement streaks: longest run of CONSECUTIVE active
    days, streak count, and total active days — the retention-health
    metric behind habit scoring.

    The calendar twin of `event_runs`: islands come from the classic
    `day_number − row_number` constant (consecutive days share it),
    over the DISTINCT active-day rollup — so the fact table collapses
    to ≤|users|×|days| rows before any window.  One user_id exchange;
    all integers.
    """
    (events,) = prep(spark, sf_dir, "events")
    d = (events.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .alias("j")).distinct())
    w = Window.partitionBy("user_id").orderBy("j")
    g = d.select("user_id", "j",
                 (F.col("j") - F.row_number().over(w)).alias("grp"))
    runs = (g.groupBy("user_id", "grp")
            .agg(F.count(F.lit(1)).alias("len")))
    return (runs.groupBy("user_id")
            .agg(F.max("len").alias("longest_streak_days"),
                 F.count(F.lit(1)).alias("n_streaks"),
                 F.sum("len").alias("active_days")))


_DID_ORACLE = """
WITH treated AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
cells AS (
  SELECT (t.user_id IS NOT NULL) AS is_treated,
         e.ts >= TIMESTAMP '2024-01-16 00:00:00' AS is_post,
         CAST(ROUND(e.value * 100) AS BIGINT) AS cents
  FROM events e LEFT JOIN treated t ON e.user_id = t.user_id
  WHERE e.event_type = 'purchase'),
m AS (
  SELECT is_treated, is_post,
         SUM(cents) // COUNT(*) AS mean_cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM cells GROUP BY 1, 2)
SELECT
  MAX(CASE WHEN is_treated AND is_post THEN mean_cents END) AS treat_post,
  MAX(CASE WHEN is_treated AND NOT is_post THEN mean_cents END) AS treat_pre,
  MAX(CASE WHEN NOT is_treated AND is_post THEN mean_cents END) AS ctrl_post,
  MAX(CASE WHEN NOT is_treated AND NOT is_post THEN mean_cents END) AS ctrl_pre,
  (MAX(CASE WHEN is_treated AND is_post THEN mean_cents END)
   - MAX(CASE WHEN is_treated AND NOT is_post THEN mean_cents END))
  - (MAX(CASE WHEN NOT is_treated AND is_post THEN mean_cents END)
     - MAX(CASE WHEN NOT is_treated AND NOT is_post THEN mean_cents END))
    AS did_cents,
  SUM(n) AS n_purchases
FROM m
"""


@query("did_estimator", oracle=_DID_ORACLE)
def did_estimator(spark, sf_dir):
    """Difference-in-differences: purchase-value change for users who
    experienced an error (treated) vs those who didn't (control),
    before vs after the mid-month cutover — the quasi-experimental
    estimator when randomized assignment (`ab_test_cuped`) isn't
    available.

    DiD = (T_post − T_pre) − (C_post − C_pre) on floored integer
    cell means — all BIGINT, no float anywhere.  The treated set is a
    distinct rollup broadcast into the purchase stream; the 2x2 cell
    table is one map-side-combined aggregation.
    """
    (events,) = prep(spark, sf_dir, "events")
    treated = (events.where(F.col("event_type") == "error")
               .select(F.col("user_id").alias("t_uid")).distinct())
    cells = (events.where(F.col("event_type") == "purchase")
             .join(F.broadcast(treated),
                   F.col("user_id") == F.col("t_uid"), "left")
             .select(F.col("t_uid").isNotNull().alias("is_treated"),
                     (F.col("ts") >= "2024-01-16").alias("is_post"),
                     F.round(F.col("value") * 100).cast("long").alias("cents")))
    m = (cells.groupBy("is_treated", "is_post")
         .agg(F.expr("sum(cents) div count(*)").alias("mean_cents"),
              F.count(F.lit(1)).alias("n")))
    cell = lambda t, p: F.max(  # noqa: E731
        F.when((F.col("is_treated") == t) & (F.col("is_post") == p),
               F.col("mean_cents")))
    return m.agg(
        cell(True, True).alias("treat_post"),
        cell(True, False).alias("treat_pre"),
        cell(False, True).alias("ctrl_post"),
        cell(False, False).alias("ctrl_pre"),
        ((cell(True, True) - cell(True, False))
         - (cell(False, True) - cell(False, False))).alias("did_cents"),
        F.sum("n").alias("n_purchases"))


_TWOPROP_ORACLE = """
WITH halves AS (
  SELECT CAST(ts AS DATE) < DATE '2024-01-16' AS first_half,
         user_id, event_type
  FROM events WHERE event_type IN ('click', 'purchase')),
per AS (
  SELECT first_half,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS x
  FROM halves GROUP BY first_half),
w AS (
  SELECT MAX(CASE WHEN first_half THEN x END) AS x1,
         MAX(CASE WHEN first_half THEN n END) AS n1,
         MAX(CASE WHEN NOT first_half THEN x END) AS x2,
         MAX(CASE WHEN NOT first_half THEN n END) AS n2
  FROM per)
SELECT x1, n1, x2, n2,
       (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
       / SQRT((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
              * (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
              * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
         AS z_stat
FROM w
"""


@query("two_proportion_test", oracle=_TWOPROP_ORACLE)
def two_proportion_test(spark, sf_dir):
    """Two-proportion z-test: did the purchase share of engagement
    events shift between the first and second half of the month?  The
    pooled-variance z statistic — the simplest member of the
    significance family (`paired_rank_test` and the Mann-Whitney
    cogroup handle the rank-based cases).

    The four counts are exact event rollups; the z value is
    ONE fixed IEEE sequence (divisions, one sqrt) identical in both
    engines — floats never influence row identity, only the one
    output scalar.
    """
    (events,) = prep(spark, sf_dir, "events")
    halves = (events.where(F.col("event_type").isin("click", "purchase"))
              .select((F.to_date("ts") < F.lit("2024-01-16").cast("date"))
                      .alias("first_half"), "user_id", "event_type"))
    per = (halves.groupBy("first_half")
           .agg(F.count(F.lit(1)).alias("n"),
                F.count(F.when(F.col("event_type") == "purchase", 1))
                .alias("x")))
    w = per.agg(
        F.max(F.when(F.col("first_half"), F.col("x"))).alias("x1"),
        F.max(F.when(F.col("first_half"), F.col("n"))).alias("n1"),
        F.max(F.when(~F.col("first_half"), F.col("x"))).alias("x2"),
        F.max(F.when(~F.col("first_half"), F.col("n"))).alias("n2"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pooled = (d("x1") + d("x2")) / (d("n1") + d("n2"))
    z = ((d("x1") / d("n1") - d("x2") / d("n2"))
         / F.sqrt(pooled * (F.lit(1.0) - pooled)
                  * (F.lit(1.0) / d("n1") + F.lit(1.0) / d("n2"))))
    return w.select("x1", "n1", "x2", "n2", z.alias("z_stat"))


_CORR_ORACLE = """
WITH per_order AS (
  SELECT o.o_orderkey,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(MAX(CASE WHEN o.o_orderpriority = '1-URGENT'
                       THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM per_order)
SELECT n, sx AS total_lines, sy AS n_urgent,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)) AS corr
FROM m
"""


@query("size_urgency_corr", oracle=_CORR_ORACLE)
def size_urgency_corr(spark, sf_dir):
    """Point-biserial (Pearson) correlation between an order's line
    count and its being URGENT — "do rush orders run smaller?".  The
    named correlation primitive, computed the scale-correct way:

    all five co-moments are EXACT BIGINTs from one map-side-combined
    rollup (never a two-pass mean-then-deviation scan), and the
    classic n·Σxy − ΣxΣy formula spends exactly one IEEE
    division + sqrt at the end — bit-identical in both engines.
    """
    orders, lineitem = prep(spark, sf_dir, "orders", "lineitem")
    per_order = (lineitem.join(
        orders.select("o_orderkey", "o_orderpriority"),
        lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("x"))
        .select("x", F.when(F.col("o_orderpriority") == "1-URGENT",
                            F.lit(1)).otherwise(F.lit(0))
                .cast("long").alias("y")))
    m = per_order.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"))
    return m.select(
        "n", F.col("sx").alias("total_lines"), F.col("sy").alias("n_urgent"),
        ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
         / F.sqrt((F.col("n") * F.col("sxx")
                   - F.col("sx") * F.col("sx")).cast("double")
                  * (F.col("n") * F.col("syy")
                     - F.col("sy") * F.col("sy")).cast("double")))
        .alias("corr"))


_REPEAT_ORACLE = """
WITH p AS (
  SELECT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE event_type = 'purchase'),
gaps AS (
  SELECT user_id,
         datediff('day', LAG(d) OVER (PARTITION BY user_id ORDER BY d, user_id),
                  d) AS gap_d
  FROM (SELECT DISTINCT user_id, d FROM p))
SELECT CASE WHEN gap_d <= 1 THEN '1d'
            WHEN gap_d <= 3 THEN '2-3d'
            WHEN gap_d <= 7 THEN '4-7d'
            ELSE '8d+' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM gaps WHERE gap_d IS NOT NULL AND gap_d > 0
GROUP BY 1
"""


@query("repeat_purchase_intervals", oracle=_REPEAT_ORACLE)
def repeat_purchase_intervals(spark, sf_dir):
    """Repeat-purchase cadence: the distribution of gaps between a
    user's consecutive purchase DAYS, bucketed — the input to
    replenishment-reminder timing and the denominator behind "is this
    user overdue?" churn heuristics.

    Distinct purchase-days per user first (rollup), one lag window on
    that, then a 4-bucket rollup — every exchange dimension-scale.
    """
    (events,) = prep(spark, sf_dir, "events")
    p = (events.where(F.col("event_type") == "purchase")
         .select("user_id", F.to_date("ts").alias("d")).distinct())
    w = Window.partitionBy("user_id").orderBy("d", "user_id")
    gaps = p.select("user_id",
                    F.datediff(F.col("d"), F.lag("d").over(w)).alias("gap_d"))
    bucket = (F.when(F.col("gap_d") <= 1, "1d")
              .when(F.col("gap_d") <= 3, "2-3d")
              .when(F.col("gap_d") <= 7, "4-7d").otherwise("8d+"))
    return (gaps.where(F.col("gap_d").isNotNull() & (F.col("gap_d") > 0))
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_gaps")))


_ROLLCORR_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS a,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS b
  FROM events GROUP BY 1),
w AS (
  SELECT day,
         COUNT(*) OVER fr AS n,
         SUM(a) OVER fr AS sa, SUM(b) OVER fr AS sb,
         SUM(a * a) OVER fr AS saa, SUM(b * b) OVER fr AS sbb,
         SUM(a * b) OVER fr AS sab
  FROM daily
  WINDOW fr AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(n * sab - sa * sb AS DOUBLE)
         / SQRT(CAST(n * saa - sa * sa AS DOUBLE)
                * CAST(n * sbb - sb * sb AS DOUBLE)) AS corr_14d
FROM w
WHERE n = 14 AND n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
"""


@query("rolling_click_purchase_corr", oracle=_ROLLCORR_ORACLE)
def rolling_click_purchase_corr(spark, sf_dir):
    """Rolling 14-day Pearson correlation between daily click volume
    and daily purchase volume — the decoupling monitor ("clicks are
    up but purchases stopped following") that a single whole-period
    correlation (`size_urgency_corr`) can't see.

    The five co-moment sums accumulate in the SAME window frame as
    exact BIGINTs, so each day's correlation is one fixed IEEE
    formula over exact integers; degenerate windows (zero variance)
    are excluded identically on both sides.  One daily rollup; one
    frame pass over the |days| series.
    """
    (events,) = prep(spark, sf_dir, "events")
    daily = (events.groupBy(F.to_date("ts").alias("day"))
             .agg(F.count(F.when(F.col("event_type") == "click", 1)).alias("a"),
                  F.count(F.when(F.col("event_type") == "purchase", 1))
                  .alias("b")))
    fr = Window.orderBy("day").rowsBetween(-13, 0)
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("a").over(fr).alias("sa"), F.sum("b").over(fr).alias("sb"),
        F.sum(F.col("a") * F.col("a")).over(fr).alias("saa"),
        F.sum(F.col("b") * F.col("b")).over(fr).alias("sbb"),
        F.sum(F.col("a") * F.col("b")).over(fr).alias("sab"))
    va = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    vb = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    return (w.where((F.col("n") == 14) & (va > 0) & (vb > 0))
            .select(F.col("day").cast("timestamp").alias("day"),
                    ((F.col("n") * F.col("sab")
                      - F.col("sa") * F.col("sb")).cast("double")
                     / F.sqrt(va.cast("double") * vb.cast("double")))
                    .alias("corr_14d")))


_RESURRECT_GAP_D = 10

_RESURRECT_ORACLE = f"""
WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
seq AS (
  SELECT user_id, day,
         LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
  FROM d)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(COUNT(*) FILTER (
         WHERE prev_day IS NOT NULL
           AND datediff('day', prev_day, day) >= {_RESURRECT_GAP_D})
         AS BIGINT) AS n_resurrected,
       (COUNT(*) FILTER (
         WHERE prev_day IS NOT NULL
           AND datediff('day', prev_day, day) >= {_RESURRECT_GAP_D})
        * 1000000) // COUNT(*) AS resurrected_ppm
FROM seq GROUP BY day
"""


@query("resurrection_rate_daily", oracle=_RESURRECT_ORACLE)
def resurrection_rate_daily(spark, sf_dir):
    """Daily resurrection rate: of each day's active users, the share
    returning after ≥{_RESURRECT_GAP_D} dormant days — the lifecycle
    counterpart of `retention_cohorts` (retention asks "did they
    stay", this asks "did the lapsed come back", the number
    reactivation campaigns are graded on).

    Distinct (user, day) rollup → per-user lag → daily rollup with
    exact ppm share.  One user exchange + one day rollup.
    """
    (events,) = prep(spark, sf_dir, "events")
    d = events.select("user_id", F.date_trunc("day", "ts").alias("day")) \
        .distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    seq = d.select("user_id", "day", F.lag("day").over(w).alias("prev_day"))
    res = (F.col("prev_day").isNotNull()
           & (F.datediff(F.col("day"), F.col("prev_day"))
              >= _RESURRECT_GAP_D))
    return (seq.groupBy("day")
            .agg(F.count(F.lit(1)).alias("n_active"),
                 F.count(F.when(res, 1)).alias("n_resurrected"))
            .select("day", "n_active", "n_resurrected",
                    F.expr("(n_resurrected * 1000000) div n_active")
                    .alias("resurrected_ppm")))


_SDID_ORACLE = """
WITH treated AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
pre_activity AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pre
  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
  GROUP BY user_id),
bucketed AS (
  SELECT user_id, NTILE(5) OVER (ORDER BY n_pre, user_id) AS bucket
  FROM pre_activity),
cells AS (
  SELECT b.bucket,
         (t.user_id IS NOT NULL) AS is_treated,
         e.ts >= TIMESTAMP '2024-01-16 00:00:00' AS is_post,
         CAST(ROUND(e.value * 100) AS BIGINT) AS cents
  FROM events e
  JOIN bucketed b ON e.user_id = b.user_id
  LEFT JOIN treated t ON e.user_id = t.user_id
  WHERE e.event_type = 'purchase'),
m AS (
  SELECT bucket, is_treated, is_post,
         SUM(cents) // COUNT(*) AS mean_cents, CAST(COUNT(*) AS BIGINT) AS n
  FROM cells GROUP BY 1, 2, 3)
SELECT bucket,
  MAX(CASE WHEN is_treated AND is_post THEN mean_cents END) AS treat_post,
  MAX(CASE WHEN is_treated AND NOT is_post THEN mean_cents END) AS treat_pre,
  MAX(CASE WHEN NOT is_treated AND is_post THEN mean_cents END) AS ctrl_post,
  MAX(CASE WHEN NOT is_treated AND NOT is_post THEN mean_cents END) AS ctrl_pre,
  (MAX(CASE WHEN is_treated AND is_post THEN mean_cents END)
   - MAX(CASE WHEN is_treated AND NOT is_post THEN mean_cents END))
  - (MAX(CASE WHEN NOT is_treated AND is_post THEN mean_cents END)
     - MAX(CASE WHEN NOT is_treated AND NOT is_post THEN mean_cents END))
    AS did_cents,
  SUM(n) AS n_purchases
FROM m GROUP BY bucket
"""


@query("stratified_did", oracle=_SDID_ORACLE)
def stratified_did(spark, sf_dir):
    """Stratified difference-in-differences: users bucketed into
    pre-period activity quintiles FIRST, then the 2x2 DiD computed
    within each stratum — controls for "error-prone users were simply
    more active", the confound the pooled `did_estimator` can't see
    (the poor man's propensity matching, and often most of its value).

    NTILE over (n_pre, user_id) is deterministic; everything else is
    the same all-BIGINT floored-mean machinery.  The bucket map is a
    per-user rollup broadcast back into the purchase stream; the 5x4
    cell table is one map-side-combined aggregation.
    """
    (events,) = prep(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    treated = (events.where(F.col("event_type") == "error")
               .select(F.col("user_id").alias("t_uid")).distinct())
    pre = (events.where(F.col("ts") < cutoff)
           .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pre")))
    bucketed = pre.select(
        "user_id",
        F.ntile(5).over(Window.orderBy("n_pre", "user_id")).alias("bucket"))
    cells = (events.where(F.col("event_type") == "purchase")
             .join(F.broadcast(bucketed), "user_id")
             .join(F.broadcast(treated),
                   F.col("user_id") == F.col("t_uid"), "left")
             .select("bucket",
                     F.col("t_uid").isNotNull().alias("is_treated"),
                     (F.col("ts") >= cutoff).alias("is_post"),
                     F.round(F.col("value") * 100).cast("long").alias("cents")))
    m = (cells.groupBy("bucket", "is_treated", "is_post")
         .agg(F.expr("sum(cents) div count(*)").alias("mean_cents"),
              F.count(F.lit(1)).alias("n")))
    cell = lambda t, p: F.max(  # noqa: E731
        F.when((F.col("is_treated") == t) & (F.col("is_post") == p),
               F.col("mean_cents")))
    return m.groupBy("bucket").agg(
        cell(True, True).alias("treat_post"),
        cell(True, False).alias("treat_pre"),
        cell(False, True).alias("ctrl_post"),
        cell(False, False).alias("ctrl_pre"),
        ((cell(True, True) - cell(True, False))
         - (cell(False, True) - cell(False, False))).alias("did_cents"),
        F.sum("n").alias("n_purchases"))


_DOUBLECHARGE_ORACLE = """
WITH p AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase')
SELECT a.user_id, a.event_id AS first_charge, b.event_id AS second_charge,
       a.cents,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM p a JOIN p b
  ON a.user_id = b.user_id AND a.cents = b.cents
 AND a.ts <= b.ts AND a.event_id < b.event_id
 AND epoch_us(b.ts) - epoch_us(a.ts) <= 43200000000
"""


@query("double_charge_candidates", oracle=_DOUBLECHARGE_ORACLE)
def double_charge_candidates(spark, sf_dir):
    """Double-charge detection: purchase pairs by the SAME user for
    the SAME amount within 12 hours — the payment-ops dedup review
    queue (retry storms, double-submits), where exact TTL dedup
    (`dedup_first_seen`) can't apply because a repeated identical
    purchase is usually legitimate and must be REVIEWED, not dropped.

    Equi-join on (user, cents) — far more selective than user alone —
    with the time band as a residual filter; per-key pair cost is
    quadratic only in same-amount repeats per user (≈1).  Exact
    integer cents and microsecond gaps.
    """
    (events,) = prep(spark, sf_dir, "events")
    p = (events.where(F.col("event_type") == "purchase")
         .select("user_id", "event_id", "ts",
                 F.round(F.col("value") * 100).cast("long").alias("cents"))
         .localCheckpoint(eager=False))
    a = p.select(F.col("user_id"), F.col("event_id").alias("first_charge"),
                 F.col("ts").alias("ts_a"), "cents")
    b = p.select(F.col("user_id").alias("ub"),
                 F.col("event_id").alias("second_charge"),
                 F.col("ts").alias("ts_b"), F.col("cents").alias("cb"))
    gap = F.unix_micros("ts_b") - F.unix_micros("ts_a")
    return (a.join(b, (a["user_id"] == b["ub"]) & (a["cents"] == b["cb"])
                   & (a["ts_a"] <= b["ts_b"])
                   & (a["first_charge"] < b["second_charge"])
                   & (gap <= 43_200_000_000))
            .select("user_id", "first_charge", "second_charge", "cents",
                    gap.alias("gap_us")))


_FIRSTLAST_ORACLE = """
WITH clicks AS (
  SELECT user_id, event_id AS click_id, ts AS c_ts
  FROM events WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, event_id AS purchase_id, ts AS p_ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
joined AS (
  SELECT p.purchase_id, p.cents, c.click_id, c.c_ts
  FROM purchases p JOIN clicks c
    ON c.user_id = p.user_id
   AND c.c_ts < p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 7 DAY),
ranked AS (
  SELECT purchase_id, cents, click_id,
         ROW_NUMBER() OVER (PARTITION BY purchase_id
                            ORDER BY c_ts, click_id) AS rf,
         ROW_NUMBER() OVER (PARTITION BY purchase_id
                            ORDER BY c_ts DESC, click_id DESC) AS rl,
         COUNT(*) OVER (PARTITION BY purchase_id) AS n
  FROM joined)
SELECT purchase_id, cents,
       MAX(CASE WHEN rf = 1 THEN click_id END) AS first_touch,
       MAX(CASE WHEN rl = 1 THEN click_id END) AS last_touch,
       CAST(MAX(n) AS BIGINT) AS n_touches
FROM ranked GROUP BY purchase_id, cents
"""


@query("attribution_first_last", oracle=_FIRSTLAST_ORACLE)
def attribution_first_last(spark, sf_dir):
    """First-touch and last-touch attribution per purchase (7-day
    click window) — the two bookend models next to
    `attribution_linear` (equal split) and `attribution_time_decay`
    (recency-weighted), so a user can compare all four policies on
    identical joins.

    min_by/max_by under the composite (ts, click_id) key are
    deterministic AND map-side combinable — the whole attribution is
    one banded join + one algebraic rollup, no window sort.
    """
    (events,) = prep(spark, sf_dir, "events")
    clicks = (events.where(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts")))
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("pu"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts"),
                         F.round(F.col("value") * 100).cast("long")
                         .alias("cents")))
    joined = clicks.join(
        purchases,
        (clicks["user_id"] == purchases["pu"])
        & (clicks["c_ts"] < purchases["p_ts"])
        & (clicks["c_ts"] >= purchases["p_ts"] - F.expr("INTERVAL 7 DAYS")))
    seq = F.struct("c_ts", "click_id")
    return (joined.groupBy("purchase_id", "cents")
            .agg(F.min_by("click_id", seq).alias("first_touch"),
                 F.max_by("click_id", seq).alias("last_touch"),
                 F.count(F.lit(1)).alias("n_touches")))


_ROUNDBIAS_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE cents % 100 = 0) AS BIGINT) AS n_round,
       (COUNT(*) FILTER (WHERE cents % 100 = 0) * 1000000) // COUNT(*)
         AS round_ppm,
       (COUNT(*) FILTER (WHERE cents % 100 = 0) * 100 * 1000000) // COUNT(*)
         AS lift_vs_uniform_ppm
FROM v GROUP BY event_type
"""


@query("round_number_bias", oracle=_ROUNDBIAS_ORACLE)
def round_number_bias(spark, sf_dir):
    """Round-number bias: the share of whole-dollar values per event
    type, with lift against the 1-in-100 uniform expectation (ppm) —
    humans type round numbers, generators and organic processes
    don't; manual-entry fraud and synthetic data both light this up
    (the digit-pattern sibling of `benford_first_digit`).

    Pure scan-side modulo + one rollup; exact floor-division ppm.
    """
    (events,) = prep(spark, sf_dir, "events")
    v = events.select("event_type",
                      F.round(F.col("value") * 100).cast("long").alias("cents"))
    is_round = F.when(F.col("cents") % 100 == 0, 1)
    return (v.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count(is_round).alias("n_round"))
            .select("event_type", "n_events", "n_round",
                    F.expr("(n_round * 1000000) div n_events")
                    .alias("round_ppm"),
                    F.expr("(n_round * 100 * 1000000) div n_events")
                    .alias("lift_vs_uniform_ppm")))


_EXACT_PCTL_ORACLE = """
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY 1, 2),
r AS (
  SELECT event_type, c,
         SUM(k) OVER (PARTITION BY event_type ORDER BY c
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(k) OVER (PARTITION BY event_type) AS n
  FROM v)
SELECT event_type,
       CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN c END) AS BIGINT)
         AS p50_cents,
       CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN c END) AS BIGINT)
         AS p90_cents,
       CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN c END) AS BIGINT)
         AS p99_cents
FROM r GROUP BY event_type
"""


@query("exact_percentiles_by_type", oracle=_EXACT_PCTL_ORACLE)
def exact_percentiles_by_type(spark, sf_dir):
    """EXACT p50/p90/p99 of event value per type — percentile_disc
    semantics (smallest value whose cumulative count reaches ceil(p*n))
    in pure integer arithmetic, the SLO-reporting op where
    `percentile_approx`'s error bars are not acceptable.

    Scale shape — why this is NOT a per-type global sort: values are
    integer cents, so the fact table first collapses to a
    (type, cents) frequency rollup (map-side combined, cardinality
    bounded by the value domain, not the row count); the cumulative
    window and the rank selection then run on the ROLLUP.  The same
    two-phase trick as ks_value_drift, giving exact order statistics
    over 100 TB with one data-sized exchange.  Selection rule
    cum*100 >= n*p keeps everything in BIGINTs (no float ranks).
    """
    from streamforge_spark.functions.percentiles import (
        percentiles_from_frequencies,
    )
    (events,) = prep(spark, sf_dir, "events")
    v = (events.groupBy("event_type",
                        F.round(F.col("value") * 100).cast("long").alias("c"))
         .agg(F.count(F.lit(1)).alias("k")))
    return percentiles_from_frequencies(v, ["event_type"])


_PCHART_ORACLE = """
WITH w AS (
  SELECT date_trunc('week', CAST(l_shipdate AS TIMESTAMP)) AS wk,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS d
  FROM lineitem GROUP BY 1),
tot AS (SELECT SUM(n) AS tn, SUM(d) AS td FROM w)
SELECT wk, n, d,
       CAST(ROUND(CAST(d AS DOUBLE) / CAST(n AS DOUBLE) * 1000000)
            AS BIGINT) AS rate_ppm,
       CAST(ROUND((CAST(td AS DOUBLE) / CAST(tn AS DOUBLE)
                   + 3 * sqrt(CAST(td AS DOUBLE) / CAST(tn AS DOUBLE)
                              * (1 - CAST(td AS DOUBLE)
                                     / CAST(tn AS DOUBLE))
                              / CAST(n AS DOUBLE))) * 1000000)
            AS BIGINT) AS ucl_ppm
FROM w CROSS JOIN tot
"""


@query("return_rate_pchart", oracle=_PCHART_ORACLE)
def return_rate_pchart(spark, sf_dir):
    """Shewhart p-chart over the weekly return rate: each week's
    return fraction against the 3-sigma upper control limit
    p̄ + 3·sqrt(p̄(1-p̄)/n_week) — the statistical-process-control
    readout an ops team runs on any defect-rate stream (breach =
    rate_ppm > ucl_ppm, an integer compare downstream).

    Exactness: the control limit needs sqrt, so this is one of the
    few queries with a float tail — kept bit-portable by computing the
    IDENTICAL IEEE op sequence on both engines (div, mul, sub, div,
    sqrt, mul, add — every step correctly rounded in both JVM and
    DuckDB) and rounding to integer ppm once at the end.

    Scale shape: one map-side-combined conditional-count rollup to
    |weeks| rows; the totals broadcast back.  date_trunc('week') is
    ISO/Monday-based in both engines.
    """
    (lineitem,) = prep(spark, sf_dir, "lineitem")
    w = (lineitem.groupBy(
            F.date_trunc("week", F.col("l_shipdate").cast("timestamp"))
            .alias("wk"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("d"))
         # two consumers (totals + the chart rows): one fact scan
         .localCheckpoint(eager=False))
    tot = w.agg(F.sum("n").alias("tn"), F.sum("d").alias("td"))
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    pbar = dbl("td") / dbl("tn")
    ucl = (pbar + F.lit(3) * F.sqrt(pbar * (F.lit(1) - pbar) / dbl("n")))
    return (w.crossJoin(F.broadcast(tot))
            .select("wk", "n", "d",
                    F.round(dbl("d") / dbl("n") * 1000000).cast("long")
                    .alias("rate_ppm"),
                    F.round(ucl * 1000000).cast("long").alias("ucl_ppm")))
