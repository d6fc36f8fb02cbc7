"""Join queries (SURVEY §2.7)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from streamforge_spark.operators.joins import asof_join, dynamic_joiner, static_joiner
from streamforge_spark.queries.common import prep
from streamforge_spark.registry import query


@query(
    "static_join_enrich",
    oracle="""
SELECT e.event_id, e.user_id, e.value, c.c_name, c.c_mktsegment, c.c_nationkey
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
""",
)
def static_join_enrich(spark, sf_dir):
    """StaticJoiner: broadcast enrichment, miss => pass-through with
    null enrichment (StaticJoiner.java:134-152). The customer dim is
    broadcast — at 100 TB the fact side never shuffles."""
    events, customer = prep(spark, sf_dir, "events", "customer")
    enriched = static_joiner(
        events, customer.select("c_custkey", "c_name", "c_mktsegment", "c_nationkey"),
        on=events["user_id"] == F.col("c_custkey"),
    )
    return enriched.select("event_id", "user_id", "value",
                           "c_name", "c_mktsegment", "c_nationkey")


_DYN_ORACLE = """
SELECT l.event_id AS purchase_id, {sel}
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
{how} JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts - INTERVAL 10 MINUTE
 AND r.ts <= l.ts + INTERVAL 10 MINUTE
"""


@query(
    "dynamic_join_inner",
    oracle=_DYN_ORACLE.format(
        sel="r.event_id AS click_id, l.user_id AS user_id, l.ts AS purchase_ts, r.ts AS click_ts",
        how="INNER"),
)
def dynamic_join_inner(spark, sf_dir):
    """DynamicJoiner INNER: time-bounded N:M equi-join, 10-minute TTL
    (DynamicJoiner.java:238-292; OrderPaymentJoinJob.java:51-53)."""
    (events,) = prep(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == "purchase").alias("l")
    right = events.filter(F.col("event_type") == "click").alias("r")
    j = dynamic_joiner(left, right, left_key="user_id", right_key="user_id",
                       left_time="ts", right_time="ts", ttl_seconds=600,
                       join_type="inner")
    return j.select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("purchase_ts"),
        F.col("r.ts").alias("click_ts"),
    )


@query(
    "dynamic_join_left",
    oracle=_DYN_ORACLE.format(
        sel="r.event_id AS click_id, l.user_id AS user_id, l.ts AS purchase_ts, r.ts AS click_ts",
        how="LEFT"),
)
def dynamic_join_left(spark, sf_dir):
    """DynamicJoiner LEFT: unmatched left rows emitted with null right
    (the TTL-expiry emission of DynamicJoiner.java:294-326 — in batch,
    simply the outer rows)."""
    (events,) = prep(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == "purchase").alias("l")
    right = events.filter(F.col("event_type") == "click").alias("r")
    j = dynamic_joiner(left, right, left_key="user_id", right_key="user_id",
                       left_time="ts", right_time="ts", ttl_seconds=600,
                       join_type="left")
    return j.select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("purchase_ts"),
        F.col("r.ts").alias("click_ts"),
    )


@query(
    "dynamic_join_right",
    oracle=_DYN_ORACLE.format(
        sel="r.event_id AS click_id, r.user_id AS user_id, l.ts AS purchase_ts, r.ts AS click_ts",
        how="RIGHT"),
)
def dynamic_join_right(spark, sf_dir):
    """DynamicJoiner RIGHT: unmatched right rows emitted through the
    rightEmitFunction with null left (DynamicJoiner.java:294-326)."""
    (events,) = prep(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == "purchase").alias("l")
    right = events.filter(F.col("event_type") == "click").alias("r")
    j = dynamic_joiner(left, right, left_key="user_id", right_key="user_id",
                       left_time="ts", right_time="ts", ttl_seconds=600,
                       join_type="right")
    return j.select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
        F.col("r.user_id").alias("user_id"),
        F.col("l.ts").alias("purchase_ts"),
        F.col("r.ts").alias("click_ts"),
    )


@query(
    "dynamic_join_full",
    oracle="""
SELECT l.event_id AS purchase_id, r.event_id AS click_id,
       COALESCE(l.user_id, r.user_id) AS user_id,
       l.ts AS purchase_ts, r.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
FULL OUTER JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts - INTERVAL 10 MINUTE
 AND r.ts <= l.ts + INTERVAL 10 MINUTE
""",
)
def dynamic_join_full(spark, sf_dir):
    """DynamicJoiner FULL_OUTER with the rightEmitFunction projection
    folded into a coalesce (DynamicJoiner.java:169-173, 294-326)."""
    (events,) = prep(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == "purchase").alias("l")
    right = events.filter(F.col("event_type") == "click").alias("r")
    j = dynamic_joiner(left, right, left_key="user_id", right_key="user_id",
                       left_time="ts", right_time="ts", ttl_seconds=600,
                       join_type="full_outer")
    return j.select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
        F.coalesce(F.col("l.user_id"), F.col("r.user_id")).alias("user_id"),
        F.col("l.ts").alias("purchase_ts"),
        F.col("r.ts").alias("click_ts"),
    )


@query(
    "asof_join_latest_event",
    oracle="""
WITH purchases AS (
  SELECT user_id, ts, MAX(event_id) AS purchase_id,
         MAX(CAST(ROUND(value * 100) AS BIGINT)) AS purchase_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
clicks AS (SELECT * FROM events WHERE event_type = 'click')
SELECT c.user_id AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(COUNT(p.purchase_id) AS BIGINT) AS n_after_purchase,
       CAST(SUM(COALESCE(p.purchase_cents, 0)) AS BIGINT) AS cents_sum
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
GROUP BY c.user_id
""",
)
def asof_join_latest_event(spark, sf_dir):
    """As-of join (capability surplus): each click is enriched with the
    user's most recent prior-or-simultaneous purchase, then rolled up
    per user. The right side is pre-aggregated to one row per
    (user, ts) so the as-of pick is deterministic; the oracle uses
    DuckDB's native ASOF LEFT JOIN as an independent implementation."""
    (events,) = prep(spark, sf_dir, "events")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"),
             F.max(F.round(F.col("value") * 100).cast("long")).alias("purchase_cents"))
    )
    clicks = events.filter(F.col("event_type") == "click")
    enriched = asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["purchase_id", "purchase_cents"], prefix="")
    return (
        enriched.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"),
             F.count("purchase_id").alias("n_after_purchase"),
             F.sum(F.coalesce(F.col("purchase_cents"), F.lit(0))).alias("cents_sum"))
    )


@query(
    "incident_window_impact",
    oracle="""
WITH incidents AS (
  SELECT event_id AS incident_id, ts AS w_start,
         ts + INTERVAL 10 MINUTE AS w_end
  FROM events WHERE event_type = 'error'
)
SELECT i.incident_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM incidents i JOIN events e
  ON e.ts >= i.w_start AND e.ts < i.w_end
GROUP BY i.incident_id
""",
)
def incident_window_impact(spark, sf_dir):
    """Pure range join (no equi key): traffic inside the 10-minute
    blast window after every error event. Literal SQL plans a
    BroadcastNestedLoopJoin; ``interval_join`` rewrites it as a
    bucketized equi-join (600s buckets ~ window length → each interval
    explodes into ~2 bucket rows), one hash exchange on the bucket id.
    Guardrail: tests/test_plans.py::test_interval_join_no_bnlj."""
    from streamforge_spark.operators.joins import interval_join
    (events,) = prep(spark, sf_dir, "events")
    incidents = (events.filter(F.col("event_type") == "error")
                 .select(F.col("event_id").alias("incident_id"),
                         F.col("ts").alias("w_start"),
                         (F.col("ts") + F.expr("INTERVAL 10 MINUTES"))
                         .alias("w_end")))
    pairs = interval_join(events.select("user_id", "ts"), incidents,
                          ts_col="ts", start_col="w_start",
                          end_col="w_end", bucket_seconds=600)
    return (pairs.groupBy("incident_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("user_id").alias("n_users")))


@query(
    "asof_join_next_event",
    oracle="""
WITH purchases AS (
  SELECT user_id, ts, MAX(event_id) AS purchase_id,
         MAX(CAST(ROUND(value * 100) AS BIGINT)) AS purchase_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
clicks AS (SELECT * FROM events WHERE event_type = 'click')
SELECT c.user_id AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(COUNT(p.purchase_id) AS BIGINT) AS n_before_purchase,
       CAST(SUM(COALESCE(p.purchase_cents, 0)) AS BIGINT) AS cents_sum
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts <= p.ts
GROUP BY c.user_id
""",
)
def asof_join_next_event(spark, sf_dir):
    """Forward as-of join: each click enriched with the user's NEXT
    purchase at-or-after it ("did the click convert, and to what") —
    the attribution mirror of asof_join_latest_event. Same
    one-shuffle union+running-carry plan over the reversed sort
    (operators/joins.py::asof_join direction='forward'); the oracle
    is DuckDB's native ASOF with the inequality flipped."""
    (events,) = prep(spark, sf_dir, "events")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"),
             F.max(F.round(F.col("value") * 100).cast("long")).alias("purchase_cents"))
    )
    clicks = events.filter(F.col("event_type") == "click")
    enriched = asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["purchase_id", "purchase_cents"], prefix="",
        direction="forward")
    return (
        enriched.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"),
             F.count("purchase_id").alias("n_before_purchase"),
             F.sum(F.coalesce(F.col("purchase_cents"), F.lit(0))).alias("cents_sum"))
    )


# -- interval x interval overlap join -----------------------------------

_OVERLAP_ORACLE = """
WITH ev AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS brk
  FROM events),
grp AS (SELECT user_id, ts, SUM(brk) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM ev),
sessions AS (
  SELECT user_id, sid, MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM grp GROUP BY user_id, sid),
err AS (
  SELECT ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (ORDER BY ts, event_id)) > 600000000
              OR lag(ts) OVER (ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS brk
  FROM events WHERE event_type = 'error'),
egrp AS (SELECT ts, event_id, SUM(brk) OVER (
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
         FROM err),
incidents AS (
  SELECT CAST(MIN(event_id) AS BIGINT) AS incident_id,
         MIN(ts) AS i_start, MAX(ts) AS i_end
  FROM egrp GROUP BY iid)
SELECT s.user_id, CAST(s.sid AS BIGINT) AS sid, i.incident_id,
       epoch_us(least(s.s_end, i.i_end)) - epoch_us(greatest(s.s_start, i.i_start))
         AS overlap_us
FROM sessions s JOIN incidents i
  ON s.s_start <= i.i_end AND i.i_start <= s.s_end
"""


@query("session_incident_overlap", oracle=_OVERLAP_ORACLE)
def session_incident_overlap(spark, sf_dir):
    """Interval × interval overlap join: which user SESSIONS (30-min
    gap islands) overlapped which error INCIDENTS (10-min gap islands
    over error events) and for how long — the blast-radius question
    where BOTH sides are time ranges, not points
    (operators/joins.py::interval_overlap_join).

    Scale shape: sessions and incidents are aggregate-sized interval
    tables (one gap-and-island window each); the overlap join explodes
    both into shared hour cells and equi-joins — never the
    BroadcastNestedLoopJoin the literal overlap predicate plans. The
    overlap duration is exact integer microseconds."""
    from streamforge_spark.operators.joins import interval_overlap_join
    (events,) = prep(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.lag("ts").over(wu).isNull()
        | ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wu)))
           > 1800 * 1_000_000), 1).otherwise(0)
    grp = events.select(
        "user_id", "ts",
        F.sum(brk).over(wu.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"))
    sessions = (grp.groupBy("user_id", "sid")
                .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end")))
    we = Window.orderBy("ts", "event_id")
    ebrk = F.when(
        F.lag("ts").over(we).isNull()
        | ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(we)))
           > 600 * 1_000_000), 1).otherwise(0)
    egrp = (events.filter(F.col("event_type") == "error")
            .select("ts", "event_id",
                    F.sum(ebrk).over(we.rowsBetween(Window.unboundedPreceding, 0))
                    .alias("iid")))
    incidents = (egrp.groupBy("iid")
                 .agg(F.min("event_id").alias("incident_id"),
                      F.min("ts").alias("i_start"), F.max("ts").alias("i_end"))
                 .drop("iid"))
    pairs = interval_overlap_join(
        sessions, incidents,
        left_start="s_start", left_end="s_end",
        right_start="i_start", right_end="i_end",
        bucket_seconds=3600)
    return pairs.select(
        "user_id", F.col("sid").cast("long").alias("sid"), "incident_id",
        (F.unix_micros(F.least("s_end", "i_end"))
         - F.unix_micros(F.greatest("s_start", "i_start"))).alias("overlap_us"))


_BLOOM_M_BITS = 1 << 17   # 128 Kbit = 2048 words; KB-scale broadcast

_BLOOM_ORACLE = """
SELECT date_trunc('month', o.o_orderdate) AS month,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS urgent_revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1
"""


@query("bloom_prune_join", oracle=_BLOOM_ORACLE)
def bloom_prune_join(spark, sf_dir):
    """Monthly revenue of urgent orders, with the fact side pruned by a
    DataFrame-algebra bloom filter BEFORE the exact join
    (operators/bloomjoin.py).

    Why it exists: when the build side outgrows the broadcast-join
    threshold, a plain join shuffles the ENTIRE fact table; the bloom
    words table stays KB-sized no matter how many build keys there
    are, broadcasts for free, and drops ~80% of fact rows (only 1/5 of
    orders are urgent) before the shuffle.  False positives are
    eliminated by the exact equi-join that follows, so the result is
    bit-identical to the unpruned plan — which is exactly what the
    plain-SQL oracle checks.

    Scale: ONE map-side-combined bit_or rollup on the build side, two
    broadcast hash joins on the probe side (no shuffle, no Python),
    then the standard exact join on the pruned remainder.
    """
    from streamforge_spark.operators.bloomjoin import bloom_prune, bloom_words
    lineitem, orders = prep(spark, sf_dir, "lineitem", "orders")
    urgent = (orders.where(F.col("o_orderpriority") == "1-URGENT")
              .select("o_orderkey", "o_orderdate")
              .localCheckpoint(eager=False))
    words = bloom_words(urgent, "o_orderkey", _BLOOM_M_BITS)
    pruned = bloom_prune(
        lineitem.select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long").alias("cents")),
        "l_orderkey", words, _BLOOM_M_BITS)
    return (pruned.join(urgent, pruned["l_orderkey"] == urgent["o_orderkey"])
            .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
            .agg((F.sum("cents").cast("double") / 100.0).alias("urgent_revenue"),
                 F.count(F.lit(1)).alias("n_items")))
