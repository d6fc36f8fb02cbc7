"""Snapshot -> change-stream handoff certification queries (DBLog
watermark reconciliation, streaming/handoff.py).

The batch faces of the SnapshotHandoff job: ``customer`` plays the
collection snapshot, the events envelope plays the change log
(key = user_id, position = event_id), and the watermark manifest is
the deterministic ``uniform_watermarks`` stand-in for real interleave
timing — chunk c (hash-mod, the reference's MultiCdcSourceBuilder
split scheme) was read while the log grew through
(c*WINDOW, (c+1)*WINDOW]. The algebra under certification —
newest-event-per-key vs per-chunk low watermark, delete wins,
in-window collision accounting — is the literal production function
the job's bootstrap + replay converge to (tests/test_handoff.py
proves the loop and this relation agree).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamforge_spark.queries.common import ENVELOPE_CTE, prep
from streamforge_spark.registry import query
from streamforge_spark.streaming.handoff import (
    handoff_merged, handoff_state, uniform_watermarks,
)

N_CHUNKS = 8
WINDOW = 1250  # log positions that elapsed per chunk select


def _merged(spark, sf_dir):
    from streamforge_spark.envelope import envelope_from_events
    customer, events = prep(spark, sf_dir, "customer", "events")
    log = (envelope_from_events(events)
           .filter(F.col("operation") != "unknown")
           .select(F.col("primary_key").cast("long").alias("k"),
                   F.col("event_id").alias("seq"),
                   F.col("operation"),
                   F.round(F.col("value") * 100).cast("long").alias("bal")))
    return handoff_merged(
        customer, log,
        snap_key="c_custkey", log_key="k", seq="seq", op="operation",
        n_chunks=N_CHUNKS,
        watermarks=uniform_watermarks(spark, N_CHUNKS, WINDOW),
        snap_payload={"balance_cents":
                      F.round(F.col("c_acctbal") * 100).cast("long")},
        log_payload={"balance_cents": F.col("bal")})


_HANDOFF_CTE = f"""
lat AS (
  SELECT CAST(primary_key AS BIGINT) AS pk,
         MAX(event_id) AS last_seq,
         arg_max(operation, event_id) AS last_op,
         arg_max(CAST(ROUND(value * 100) AS BIGINT), event_id) AS l_bal
  FROM envelope
  WHERE operation <> 'unknown'
  GROUP BY 1
),
snap AS (
  SELECT c_custkey AS pk,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS s_bal,
         TRUE AS snap_present
  FROM customer
),
m AS (
  SELECT COALESCE(s.pk, l.pk) AS pk,
         CAST(COALESCE(s.pk, l.pk) % {N_CHUNKS} AS INT) AS chunk_id,
         COALESCE(s.snap_present, FALSE) AS snap_present,
         l.last_seq, l.last_op, l.l_bal, s.s_bal
  FROM snap s FULL OUTER JOIN lat l ON s.pk = l.pk
),
res AS (
  SELECT pk, chunk_id, snap_present, last_seq, last_op, l_bal, s_bal,
         (last_seq IS NOT NULL
          AND last_seq > chunk_id * {WINDOW}) AS log_wins,
         (last_seq IS NOT NULL
          AND last_seq > chunk_id * {WINDOW}
          AND last_seq <= chunk_id * {WINDOW} + {WINDOW}) AS in_window
  FROM m
)
"""


@query(
    "snapshot_handoff_state",
    oracle=f"""
WITH {ENVELOPE_CTE},
{_HANDOFF_CTE}
SELECT pk, chunk_id,
       CASE WHEN log_wins THEN 'log' ELSE 'snapshot' END AS src,
       CAST(CASE WHEN log_wins THEN last_seq ELSE -1 END AS BIGINT) AS version_seq,
       CASE WHEN log_wins THEN l_bal ELSE s_bal END AS balance_cents
FROM res
WHERE (log_wins AND last_op <> 'delete')
   OR (NOT log_wins AND snap_present)
""",
)
def snapshot_handoff_state(spark, sf_dir):
    """The seeded materialization a DBLog bootstrap converges to: per
    key, the chunk row survives unless the log's newest event outran
    the chunk's low watermark — then the event's payload wins, and a
    winning delete removes the key. Phantom guard: a log-only key
    whose events all predate its chunk's lw contributes nothing (the
    chunk read already reflected it).

    Plan: one map-side-combined max_by over the log, one full-outer
    join on the key, one broadcast of the 8-row manifest — the
    minimal shuffle shape for a keyed merge; at 100 TB the snapshot
    side never shuffles more than once and the log side is collapsed
    before the join.
    """
    return handoff_state(_merged(spark, sf_dir)).select(
        "pk", "chunk_id", "src", "version_seq", "balance_cents")


@query(
    "handoff_chunk_audit",
    oracle=f"""
WITH {ENVELOPE_CTE},
{_HANDOFF_CTE}
SELECT chunk_id,
       CAST(COUNT(*) FILTER (snap_present) AS BIGINT) AS snapshot_rows,
       CAST(COUNT(*) FILTER (snap_present AND in_window) AS BIGINT) AS inwindow_collisions,
       CAST(COUNT(*) FILTER (log_wins) AS BIGINT) AS log_wins,
       CAST(COUNT(*) FILTER (log_wins AND last_op = 'delete') AS BIGINT) AS deletes_applied,
       CAST(COUNT(*) FILTER ((log_wins AND last_op <> 'delete')
            OR (NOT log_wins AND snap_present)) AS BIGINT) AS final_rows
FROM res
GROUP BY chunk_id
""",
)
def handoff_chunk_audit(spark, sf_dir):
    """Per-chunk bootstrap observability: how many chunk rows raced an
    in-window event (the set DBLog's original formulation drops), how
    many keys the log ultimately owns, deletes applied, and the final
    state cardinality — the numbers an operator reads to size chunks
    and verify the handoff did not lose or double-apply writes.

    Same merged relation as snapshot_handoff_state + one 8-group
    rollup — no extra scan of either side.
    """
    m = _merged(spark, sf_dir)
    t = F.lit(1)
    z = F.lit(0)
    return (m.groupBy("chunk_id").agg(
        F.sum(F.when(F.col("snap_present"), t).otherwise(z)).alias("snapshot_rows"),
        F.sum(F.when(F.col("snap_present") & F.col("in_window"), t).otherwise(z)).alias("inwindow_collisions"),
        F.sum(F.when(F.col("log_wins"), t).otherwise(z)).alias("log_wins"),
        F.sum(F.when(F.col("delete_win"), t).otherwise(z)).alias("deletes_applied"),
        F.sum(F.when((F.col("log_wins") & ~F.col("delete_win"))
                     | (~F.col("log_wins") & F.col("snap_present")), t).otherwise(z)).alias("final_rows")))


@query(
    "state_audit_report",
    oracle=f"""
WITH {ENVELOPE_CTE},
ops AS (
  SELECT CAST(primary_key AS BIGINT) AS pk, operation, payload_json, event_id
  FROM envelope WHERE operation <> 'unknown'
),
g AS (
  SELECT pk, arg_max(operation, event_id) AS last_op,
         arg_max(payload_json, event_id) AS _payload,
         MAX(event_id) AS _at
  FROM ops GROUP BY 1
),
exp AS (SELECT pk, _payload, _at FROM g WHERE last_op <> 'delete'),
act AS (
  SELECT pk,
         CASE WHEN pk % 7 = 2 THEN _payload || '#corrupt'
              ELSE _payload END AS _actual_payload,
         _at AS _actual_pos
  FROM exp WHERE pk % 11 <> 3
  UNION ALL
  SELECT pk + 10000, '{{"ghost": true}}', CAST(0 AS BIGINT)
  FROM exp WHERE pk % 13 = 1
)
SELECT CAST(COALESCE(e.pk, a.pk) AS VARCHAR) AS primary_key,
       CASE WHEN e._payload IS NULL THEN 'orphan_in_state'
            WHEN a._actual_payload IS NULL THEN 'missing_in_state'
            WHEN e._payload = a._actual_payload THEN 'match'
            ELSE 'stale_value' END AS verdict,
       e._at AS expected_seq, a._actual_pos AS actual_pos
FROM exp e FULL OUTER JOIN act a ON e.pk = a.pk
""",
)
def state_audit_report(spark, sf_dir):
    """The StateAudit diff algebra, oracle-certified — the literal
    ``state_divergence`` function the StateAudit job runs
    (streaming/handoff.py), driven over a deterministically perturbed
    copy of the expected state so every verdict class is live: keys
    ``pk % 11 == 3`` dropped from the 'state' (missing_in_state),
    ``pk % 7 == 2`` payload-corrupted (stale_value), ghosts at
    ``pk + 10000`` injected for ``pk % 13 == 1`` (orphan_in_state),
    everything else match. Same synthesized-inputs protocol as
    cdc_payload_precedence; the lifecycle test drives the job against
    REAL corruption (tests/test_handoff.py).

    Plan: one map-side squash of the log + one full-outer diff — the
    expected side is computed once and perturbed by projection, so
    the log is scanned once.
    """
    from streamforge_spark.envelope import envelope_from_events
    from streamforge_spark.streaming.handoff import state_divergence

    (events,) = prep(spark, sf_dir, "events")
    env = (envelope_from_events(events)
           .filter(F.col("operation") != "unknown"))
    g = env.groupBy("primary_key").agg(
        F.max_by("operation", "event_id").alias("last_op"),
        F.max_by("payload_json", "event_id").alias("_payload"),
        F.max("event_id").alias("_at"))
    exp = (g.filter(F.col("last_op") != "delete")
           .withColumn("pk", F.col("primary_key").cast("long"))
           .select("pk", "primary_key", "_payload", "_at")
           .localCheckpoint())  # expected feeds both diff sides: one scan

    kept = (exp.filter(F.col("pk") % 11 != 3)
            .select("primary_key",
                    F.when(F.col("pk") % 7 == 2,
                           F.concat(F.col("_payload"), F.lit("#corrupt")))
                    .otherwise(F.col("_payload")).alias("_actual_payload"),
                    F.col("_at").alias("_actual_pos")))
    ghosts = (exp.filter(F.col("pk") % 13 == 1)
              .select((F.col("pk") + 10000).cast("string").alias("primary_key"),
                      F.lit('{"ghost": true}').alias("_actual_payload"),
                      F.lit(0).cast("long").alias("_actual_pos")))
    actual = kept.unionByName(ghosts)
    return state_divergence(exp.drop("pk"), actual)
