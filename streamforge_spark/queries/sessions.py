"""Session-window / materialization / window queries (SURVEY §2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_spark.envelope import envelope_from_events
from streamforge_spark.operators.materialize import materializer_changelog, materializer_latest
from streamforge_spark.operators.sessions import ordered_fold, session_analyzer
from streamforge_spark.queries.common import ENVELOPE_CTE, prep, scaled_sum, sql_scaled_sum
from streamforge_spark.registry import query

# Gaps-and-islands oracle for Spark's session_window semantics: a new
# session starts when the gap since the previous event STRICTLY
# exceeds the gap duration (session_window merges at exactly-gap
# spacing — pinned by test_session_window_exact_gap_boundary).
_SESSION_ORACLE = f"""
WITH s AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM events
), g AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM s
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS ops,
       {sql_scaled_sum('value')} AS total_value
FROM g GROUP BY user_id, sess_id
"""


@query("session_stats", oracle=_SESSION_ORACLE)
def session_stats(spark, sf_dir):
    """SessionAnalyzer: 30-minute-gap event-time sessions per user with
    the job's list-fold aggregator (comma-joined ops + count,
    SessionAnalyzer.java:63-185, UserSessionAnalysisJob.java:61-74)."""
    (events,) = prep(spark, sf_dir, "events")
    return session_analyzer(
        events, key_col="user_id", time_col="ts", gap="30 minutes",
        agg_exprs=[
            ordered_fold("ts", "event_id", "event_type").alias("ops"),
            scaled_sum(F.col("value")).alias("total_value"),
        ],
    )


@query(
    "materialize_latest",
    oracle=f"""
WITH {ENVELOPE_CTE}
SELECT primary_key, event_time, payload_json FROM (
  SELECT *, row_number() OVER (PARTITION BY primary_key
                               ORDER BY event_time DESC, event_id DESC) AS rn
  FROM envelope
) WHERE rn = 1 AND operation <> 'delete'
""",
)
def materialize_latest(spark, sf_dir):
    """Materializer's view: latest live value per key; a delete as the
    latest state removes the key (Materializer.java:147-156)."""
    (events,) = prep(spark, sf_dir, "events")
    env = envelope_from_events(events)
    latest = materializer_latest(env, ["primary_key"], ["event_time", "event_id"],
                                 delete_predicate=F.col("operation") == "delete")
    return latest.select("primary_key", "event_time", "payload_json")


@query(
    "materialize_changelog",
    oracle=f"""
WITH {ENVELOPE_CTE},
w AS (
  SELECT *,
         lag(payload_json) OVER (PARTITION BY primary_key ORDER BY event_time, event_id) AS prev_val,
         lag(operation = 'delete') OVER (PARTITION BY primary_key ORDER BY event_time, event_id) AS prev_del
  FROM envelope
), c AS (
  SELECT operation, primary_key, event_time, payload_json,
         CASE WHEN prev_val IS NULL OR COALESCE(prev_del, FALSE) THEN NULL
              ELSE prev_val END AS before
  FROM w
)
SELECT CASE WHEN operation = 'delete' THEN 'DELETE'
            WHEN before IS NULL THEN 'INSERT'
            ELSE 'UPDATE' END AS change_type,
       primary_key AS key, before,
       CASE WHEN operation = 'delete' THEN NULL ELSE payload_json END AS after,
       event_time AS ts
FROM c
WHERE NOT (operation = 'delete' AND before IS NULL)
""",
)
def materialize_changelog(spark, sf_dir):
    """Materializer changelog: INSERT(null->v) / UPDATE(before->after) /
    DELETE(before->null), delete clears state so the next value is a
    fresh INSERT (Materializer.java:131-164; ChangelogEvent.java:6-14)."""
    (events,) = prep(spark, sf_dir, "events")
    env = envelope_from_events(events)
    log = materializer_changelog(
        env, ["primary_key"], ["event_time", "event_id"],
        value_col="payload_json", time_col="event_time",
        delete_predicate=F.col("operation") == "delete",
    )
    return log.select("change_type", "key", "before", "after", "ts")


@query(
    "tumbling_window_stats",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       {sql_scaled_sum('value')} AS total_value
FROM events GROUP BY 1
""",
)
def tumbling_window_stats(spark, sf_dir):
    """Tumbling event-time windows — capability surplus over the
    reference (it has session windows only, SURVEY §2.8); built-in
    ``window()`` with epoch-aligned 1h buckets."""
    (events,) = prep(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("event_count"),
             scaled_sum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_count", "total_value")
    )


@query(
    "materialize_history",
    oracle=f"""
WITH {ENVELOPE_CTE},
v AS (
  SELECT primary_key, payload_json, event_time,
         operation = 'delete' AS is_del,
         lead(event_time) OVER (PARTITION BY primary_key
                                ORDER BY event_time, event_id) AS valid_to
  FROM envelope
)
SELECT primary_key, payload_json, event_time AS valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM v WHERE NOT is_del
""",
)
def materialize_history(spark, sf_dir):
    """SCD-2 history view of the Materializer's keyed state (SURVEY
    §2.8 surplus): every live version with its validity interval;
    deletes close their predecessor's interval without emitting a
    version. One hash exchange on the key, shared with the changelog
    window."""
    from streamforge_spark.operators.materialize import materializer_history
    (events,) = prep(spark, sf_dir, "events")
    env = envelope_from_events(events)
    hist = materializer_history(
        env, ["primary_key"], ["event_time", "event_id"], "event_time",
        delete_predicate=F.col("operation") == "delete")
    return hist.select("primary_key", "payload_json", "valid_from",
                       "valid_to", "is_current")


@query(
    "scd2_temporal_join",
    oracle=f"""
WITH {ENVELOPE_CTE},
v AS (
  SELECT primary_key, payload_json, event_time AS valid_from,
         operation = 'delete' AS is_del,
         lead(event_time) OVER (PARTITION BY primary_key
                                ORDER BY event_time, event_id) AS valid_to
  FROM envelope
)
SELECT e.event_id, e.primary_key, e.event_time,
       s.payload_json AS state_payload,
       s.valid_from AS state_valid_from
FROM envelope e
LEFT JOIN (SELECT * FROM v WHERE NOT is_del) s
  ON e.primary_key = s.primary_key
 AND s.valid_from <= e.event_time
 AND (s.valid_to IS NULL OR e.event_time < s.valid_to)
""",
)
def scd2_temporal_join(spark, sf_dir):
    """Temporal (AS OF) join against the SCD-2 state history: every
    event enriched with the key's state version that was valid AT the
    event's timestamp — the canonical consumption pattern for the
    Materializer's history table (a delete closes the interval, so
    events landing after a delete and before the next insert enrich
    to NULL).

    Scale shape: composes materializer_history with the asof_join
    union+running-last rewrite — ONE hash shuffle on the key, no
    range join (which Spark would plan as BNLJ without an equi key),
    no N:M intermediate. The interval-validity check (ts < valid_to)
    is a post-filter that NULLs expired matches, preserving left-outer
    semantics."""
    from streamforge_spark.operators.joins import asof_join
    from streamforge_spark.operators.materialize import materializer_history
    (events,) = prep(spark, sf_dir, "events")
    env = envelope_from_events(events)
    hist = materializer_history(
        env, ["primary_key"], ["event_time", "event_id"], "event_time",
        delete_predicate=F.col("operation") == "delete")
    versions = hist.select("primary_key", "payload_json",
                           F.col("valid_from").alias("vfrom"),
                           F.col("valid_to").alias("vto"),
                           # zero-padded so the asof tiebreak's STRING
                           # order equals numeric event order under
                           # duplicate (key, valid_from) timestamps
                           F.lpad(F.col("event_id").cast("string"), 20, "0")
                           .alias("vev"))
    left = env.select("event_id", "primary_key", "event_time")
    j = asof_join(left, versions, key="primary_key",
                  left_ts="event_time", right_ts="vfrom",
                  right_cols=["payload_json", "vfrom", "vto"],
                  right_tiebreak="vev", prefix="s_")
    live = F.col("s_vto").isNull() | (F.col("event_time") < F.col("s_vto"))
    return j.select(
        "event_id", "primary_key", "event_time",
        F.when(live, F.col("s_payload_json")).alias("state_payload"),
        F.when(live, F.col("s_vfrom")).alias("state_valid_from"))


SNAP_T1 = "2024-01-11 00:00:00"
SNAP_T2 = "2024-01-21 00:00:00"


@query(
    "state_snapshot_diff",
    oracle=f"""
WITH {ENVELOPE_CTE},
s1 AS (
  SELECT primary_key, payload_json FROM (
    SELECT primary_key, payload_json, operation,
           ROW_NUMBER() OVER (PARTITION BY primary_key
                              ORDER BY event_time DESC, event_id DESC) AS rn
    FROM envelope WHERE event_time < TIMESTAMP '{SNAP_T1}')
  WHERE rn = 1 AND operation <> 'delete'),
s2 AS (
  SELECT primary_key, payload_json FROM (
    SELECT primary_key, payload_json, operation,
           ROW_NUMBER() OVER (PARTITION BY primary_key
                              ORDER BY event_time DESC, event_id DESC) AS rn
    FROM envelope WHERE event_time < TIMESTAMP '{SNAP_T2}')
  WHERE rn = 1 AND operation <> 'delete')
SELECT COALESCE(s1.primary_key, s2.primary_key) AS primary_key,
       CASE WHEN s1.primary_key IS NULL THEN 'added'
            WHEN s2.primary_key IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       s1.payload_json AS payload_before,
       s2.payload_json AS payload_after
FROM s1 FULL OUTER JOIN s2 ON s1.primary_key = s2.primary_key
WHERE s1.primary_key IS NULL OR s2.primary_key IS NULL
   OR s1.payload_json <> s2.payload_json
""",
)
def state_snapshot_diff(spark, sf_dir):
    """Snapshot diff: what changed in the materialized state between
    two points in time (added / removed / changed keys with before and
    after payloads) — the audit/backfill question every CDC consumer
    eventually asks of the Materializer.

    Scale shape: BOTH snapshots come from ONE scan and ONE hash
    exchange — per key, two filtered ``max_by`` aggregates (max_by
    skips rows whose when()-masked order key is null) reconstruct the
    latest pre-T1 and pre-T2 versions; delete-latest keys collapse to
    absent. No self-join of two as-of views, no second scan — the
    oracle's FULL OUTER formulation is the semantic spec, not the
    plan."""
    (events,) = prep(spark, sf_dir, "events")
    env = envelope_from_events(events)
    ordk = F.struct("event_time", "event_id")
    val = F.struct("payload_json", "operation")

    def snap(cutoff):
        cond = F.col("event_time") < F.lit(cutoff).cast("timestamp")
        return F.max_by(F.when(cond, val), F.when(cond, ordk))

    per_key = (env.groupBy("primary_key")
               .agg(snap(SNAP_T1).alias("v1"), snap(SNAP_T2).alias("v2")))
    p1 = F.when(F.col("v1.operation") != "delete", F.col("v1.payload_json"))
    p2 = F.when(F.col("v2.operation") != "delete", F.col("v2.payload_json"))
    d = per_key.select(
        "primary_key", p1.alias("payload_before"), p2.alias("payload_after"))
    return (d.filter(
        F.col("payload_before").isNotNull() | F.col("payload_after").isNotNull())
        .filter(F.col("payload_before").isNull()
                | F.col("payload_after").isNull()
                | (F.col("payload_before") != F.col("payload_after")))
        .select("primary_key",
                F.when(F.col("payload_before").isNull(), "added")
                .when(F.col("payload_after").isNull(), "removed")
                .otherwise("changed").alias("change_type"),
                "payload_before", "payload_after"))


FEATURE_STALENESS_S = 3 * 86400  # serve features at most 3 days old


_FEATURE_STORE_ORACLE = f"""
WITH feats AS (
  SELECT user_id, date_trunc('day', ts) + INTERVAL 1 DAY AS available_from,
         CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
           AS f_clicks,
         CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS f_cents
  FROM events GROUP BY 1, 2),
pit AS (
  SELECT e.event_id, e.user_id, e.ts, f.available_from, f.f_clicks, f.f_cents
  FROM events e LEFT JOIN LATERAL (
    SELECT * FROM feats f
    WHERE f.user_id = e.user_id AND f.available_from <= e.ts
    ORDER BY f.available_from DESC LIMIT 1) f ON true)
SELECT event_id, user_id, ts,
       CASE WHEN date_diff('microsecond', available_from, ts)
                 <= {FEATURE_STALENESS_S}::BIGINT * 1000000
            THEN f_clicks END AS f_clicks,
       CASE WHEN date_diff('microsecond', available_from, ts)
                 <= {FEATURE_STALENESS_S}::BIGINT * 1000000
            THEN f_cents END AS f_cents
FROM pit
"""


@query("feature_store_join", oracle=_FEATURE_STORE_ORACLE)
def feature_store_join(spark, sf_dir):
    """Point-in-time-correct feature join (the feature-store training
    primitive): every event is enriched with the latest per-user daily
    feature snapshot that was AVAILABLE at event time — snapshots
    computed from day d become available at day d+1, so no label ever
    sees same-day (leaky) aggregates — and a snapshot staler than
    3 days is refused (nulls) rather than served.

    Plan (100 TB): the snapshot build is one map-side-combined daily
    aggregate; the point-in-time join is the as-of union+running-carry
    (ONE shuffle on user_id, no range join, no N:M), with the
    staleness check riding the carried snapshot timestamp — zero extra
    exchanges vs plain as-of."""
    from streamforge_spark.operators.joins import asof_join
    (events,) = prep(spark, sf_dir, "events")
    feats = (events.groupBy(
        "user_id",
        (F.date_trunc("day", "ts")
         + F.expr("INTERVAL 1 DAY")).alias("available_from"))
        .agg(F.count(F.when(F.col("event_type") == "click", 1))
             .alias("f_clicks"),
             F.sum(F.round(F.col("value") * 100).cast("long"))
             .alias("f_cents")))
    labels = events.select("event_id", "user_id", "ts")
    out = asof_join(
        labels, feats, key="user_id", left_ts="ts",
        right_ts="available_from", right_cols=["f_clicks", "f_cents"],
        prefix="", tolerance_seconds=FEATURE_STALENESS_S)
    return out.select("event_id", "user_id", "ts", "f_clicks", "f_cents")


BT_VALID_AT = "2024-01-15 00:00:00"   # V: state as of this event time
BT_KNOWN_AT = "2024-01-20 00:00:00"   # K: using only data that had ARRIVED by this time


_BITEMPORAL_ORACLE = f"""
WITH env AS (
  SELECT user_id AS pk, event_id, ts AS valid_ts,
         ts + INTERVAL ((event_id % 7)) MINUTE AS txn_ts,
         event_type, value
  FROM events),
known AS (SELECT * FROM env WHERE txn_ts <= TIMESTAMP '{BT_KNOWN_AT}'),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY pk
                               ORDER BY valid_ts DESC, event_id DESC) AS rn
  FROM known WHERE valid_ts <= TIMESTAMP '{BT_VALID_AT}')
SELECT pk AS user_id, event_id, valid_ts, txn_ts, event_type,
       CAST(ROUND(value * 100) AS BIGINT) AS value_cents
FROM ranked WHERE rn = 1
"""


@query("bitemporal_snapshot", oracle=_BITEMPORAL_ORACLE)
def bitemporal_snapshot(spark, sf_dir):
    """Bitemporal as-of query: "what did we BELIEVE on K about the
    state at V" — the audit/backtest primitive that mono-temporal
    SCD-2 (materializer_history / scd2_temporal_join) cannot answer,
    because it needs BOTH the valid time (event_time) and the
    transaction time (arrival). Arrival here is the deterministic
    event_id-seeded delay (ts + id%7 minutes), standing in for the
    envelope's processed_time.

    Two filters + one latest-per-key rank: reproducing any historical
    report is a partition-pruned scan (both predicates push down) and
    ONE shuffle on the key — no state tables, no log replay.

    Plan guard: rn = 1 under WindowGroupLimit ships one row per key
    past the exchange."""
    from pyspark.sql import Window
    (events,) = prep(spark, sf_dir, "events")
    env = events.select(
        F.col("user_id").alias("pk"), "event_id",
        F.col("ts").alias("valid_ts"),
        (F.col("ts") + F.make_interval(
            mins=(F.col("event_id") % 7).cast("int"))).alias("txn_ts"),
        "event_type", F.round(F.col("value") * 100).cast("long")
        .alias("value_cents"))
    known = env.filter(
        (F.col("txn_ts") <= F.lit(BT_KNOWN_AT).cast("timestamp"))
        & (F.col("valid_ts") <= F.lit(BT_VALID_AT).cast("timestamp")))
    w = Window.partitionBy("pk").orderBy(
        F.col("valid_ts").desc(), F.col("event_id").desc())
    return (known.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("pk").alias("user_id"), "event_id", "valid_ts",
                    "txn_ts", "event_type", "value_cents"))


_GAP_SENSITIVITY_ORACLE = """
WITH seq AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)) AS gap_us
  FROM events),
gaps AS (
  SELECT g.gap_min,
         CAST((SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
           + SUM(CASE WHEN s.gap_us > CAST(g.gap_min AS BIGINT) * 60000000
                      THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sessions
  FROM (VALUES (10), (20), (30), (60)) g(gap_min)
  JOIN seq s ON s.gap_us IS NOT NULL
  GROUP BY g.gap_min)
SELECT gap_min, n_sessions FROM gaps
"""


@query("session_gap_sensitivity", oracle=_GAP_SENSITIVITY_ORACLE)
def session_gap_sensitivity(spark, sf_dir):
    """Sessionization parameter sensitivity: total session count at
    gap thresholds of 10/20/30/60 minutes — the tuning curve for the
    SessionAnalyzer's one free parameter (SessionAnalyzer.java:76-78):
    pick the knee, not a folklore constant.

    The trick: sessions(T) = |users| + |gaps > T|, so ONE lag pass
    over the events (one user_id exchange) answers every threshold
    with conditional sums — no per-threshold re-sessionization, no
    session_window at all.
    """
    (events,) = prep(spark, sf_dir, "events")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
        .alias("gap_us"))
    users = events.agg(F.countDistinct("user_id").alias("u"))
    gaps = seq.where(F.col("gap_us").isNotNull()) \
        .crossJoin(F.broadcast(
            spark.createDataFrame([(10,), (20,), (30,), (60,)],
                                  "gap_min int")))
    return (gaps.groupBy("gap_min")
            .agg(F.sum(F.when(F.col("gap_us")
                              > F.col("gap_min").cast("long") * 60000000,
                              1).otherwise(0)).alias("n_breaks"))
            .crossJoin(F.broadcast(users))
            .select("gap_min",
                    (F.col("u") + F.col("n_breaks")).alias("n_sessions")))


_DYN_GAP_CASE = """CASE event_type
  WHEN 'click' THEN 600 WHEN 'purchase' THEN 1800
  WHEN 'view' THEN 300 WHEN 'signup' THEN 900
  WHEN 'error' THEN 60 ELSE 600 END"""

_DYN_GAP_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS eus,
         ({_DYN_GAP_CASE}) * CAST(1000000 AS BIGINT) AS gap_us
  FROM events),
marked AS (
  SELECT user_id, event_id, eus, gap_us,
         MAX(eus + gap_us) OVER (
           PARTITION BY user_id ORDER BY eus, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM ev),
isl AS (
  SELECT user_id, eus, gap_us,
         SUM(CASE WHEN prev_end IS NULL OR eus > prev_end
                  THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY eus, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked)
SELECT user_id,
       CAST(MIN(eus) AS BIGINT) AS start_us,
       CAST(MAX(eus + gap_us) AS BIGINT) AS end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM isl GROUP BY user_id, sid
"""


@query("session_dynamic_gap", oracle=_DYN_GAP_ORACLE)
def session_dynamic_gap(spark, sf_dir):
    """Dynamic-gap sessionization: each event extends its session by a
    gap that depends on the EVENT TYPE (a purchase keeps intent alive
    30 min, an error only 60 s) — the SessionAnalyzer generalization
    where the inactivity knob is per-event instead of global, and the
    feature Spark's session_window uniquely supports as a gap COLUMN.

    Runs the real ``F.session_window(ts, gap_expr)`` and oracles it
    against the algebraic island spec: a session breaks exactly when
    an event's time exceeds the running MAX of (event_time + its gap)
    over all earlier events of the user (equality merges, matching
    the static-gap behavior pinned by session_gap_sensitivity).
    Bounds are emitted as epoch micros so both engines compare pure
    integers.

    Scale shape: identical to the static SessionAnalyzer — ONE hash
    exchange on user_id into merged-session aggregation; the gap CASE
    is scan-side column algebra.
    """
    from pyspark.sql import functions as F
    (events,) = prep(spark, sf_dir, "events")
    gap = F.expr(f"concat(cast(({_DYN_GAP_CASE}) as string), ' seconds')")
    return (events
            .groupBy("user_id", F.session_window(F.col("ts"), gap))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.unix_micros("session_window.start").alias("start_us"),
                    F.unix_micros("session_window.end").alias("end_us"),
                    "n_events"))
