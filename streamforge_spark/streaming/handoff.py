"""Snapshot -> change-stream handoff: lock-free CDC bootstrap with
watermark reconciliation.

The problem (reference anchor: MongoChangeStreamSource.java consumes
the change stream only — a NEW materialization must first load the
collection, then switch to the stream without missing or double-
applying concurrent writes): a full-collection snapshot takes long
enough that the collection mutates underneath it, so a naive
"dump, then stream from now" loses every write that landed mid-dump,
and "stream from before the dump" re-applies writes the dump already
reflects — fatal for deletes.

Algorithm — DBLog watermarks (Andreakis & Papapanagiotou, "DBLog: A
Watermark Based Change-Data-Capture Framework", arXiv 2010.12597; the
same design underlies Debezium's incremental snapshots): interleave
CHUNKED snapshot selects with the live log. For chunk ``c``:

1. record low watermark ``lw_c`` = current log head position,
2. select the chunk (its rows reflect every op with seq <= lw_c,
   plus possibly some in (lw_c, hw_c] — the select is unlocked),
3. record high watermark ``hw_c`` = log head after the select.

A chunk row is authoritative only up to ``lw_c``: any log event for
its key with ``seq > lw_c`` must win (events in the (lw_c, hw_c]
window race the select; events after ``hw_c`` plainly supersede it).
DBLog phrases this as "drop chunk rows whose key appears in the
in-window event set, then emit the chunk at hw"; positioning every
chunk row AT ``lw_c`` and letting a last-writer-wins merge order
``(position, source-rank)`` decide is equivalent and needs no special
in-window machinery — which is exactly what the engine's idempotent
upsert sink (streaming/sinks.py::upsert_batch) already implements.
The streaming phase then resumes from ``min_c lw_c``; replaying
events below a chunk's ``lw_c`` is harmless because they lose the
merge order (and their effects are already in the chunk row).

Scale shape: each chunk select is an ordinary distributed bounded
read (hash-mod chunking — the reference's MultiCdcSourceBuilder split
scheme); the driver loop is over the CHUNK COUNT (dozens), never rows.
Reconciliation is one map-side-combined ``max_by`` per key over the
log plus one co-partitioned full-outer join against the snapshot —
the minimal shuffle shape for a keyed merge. The watermark manifest
is ``n_chunks`` rows, always broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: merge-order columns used by the bootstrap + streaming phases:
#: position (chunk rows: lw_c; events: seq), then source rank (events
#: outrank chunk rows at equal position — an event AT lw_c is already
#: reflected in the chunk row, so either winner is content-identical).
POS_COL, RANK_COL = "_pos", "_src_rank"
CHUNK_RANK, EVENT_RANK = 0, 1


def chunk_of(key: Column, n_chunks: int) -> Column:
    """Hash-mod chunk assignment (MultiCdcSourceBuilder's split
    scheme). ``pmod`` so negative keys land in [0, n)."""
    return F.pmod(key.cast("long"), F.lit(n_chunks)).cast("int")


def latest_log_state(log: DataFrame, *, key: str, seq: str,
                     payload: dict[str, Column]) -> DataFrame:
    """Collapse the change log to its newest event per key in ONE
    map-side-combined aggregation: ``max_by(payload, seq)`` carries
    each payload column at the winning sequence — no window, no
    shuffle of the un-collapsed log.

    Output: key, last_seq, and one ``l_<name>`` per payload entry.
    """
    aggs = [F.max(F.col(seq)).alias("last_seq")]
    aggs += [F.max_by(col, F.col(seq)).alias(f"l_{name}")
             for name, col in payload.items()]
    return log.groupBy(F.col(key).alias("k")).agg(*aggs)


def handoff_merged(snapshot: DataFrame, log: DataFrame, *,
                   snap_key: str, log_key: str, seq: str, op: str,
                   n_chunks: int, watermarks: DataFrame,
                   snap_payload: dict[str, Column],
                   log_payload: dict[str, Column],
                   delete_value: str = "delete") -> DataFrame:
    """The reconciliation relation both faces project from: for every
    key, which side is authoritative and why.

    ``watermarks`` is the bootstrap manifest — (chunk_id, lw, hw),
    ``n_chunks`` rows, broadcast into the snapshot scan. The log side
    collapses to one row per key (latest_log_state), then meets the
    snapshot in a single full-outer join on the key. Log wins iff its
    newest event outruns the key's chunk low watermark.

    Columns: pk, chunk_id, lw, hw, log_wins, delete_win, in_window
    (an event raced the chunk select — DBLog's dropped-row set),
    src, version_seq, plus the winner-resolved payload columns.
    """
    lpay = dict(log_payload)
    lpay[op] = F.col(op)  # winner op rides along for delete_win
    lat = latest_log_state(log, key=log_key, seq=seq, payload=lpay)

    snap = snapshot.select(
        F.col(snap_key).cast("long").alias("pk"),
        F.lit(True).alias("_snap"),
        *[col.alias(f"s_{name}") for name, col in snap_payload.items()])

    j = snap.join(lat.withColumnRenamed("k", "pk"), "pk", "full_outer")

    # chunk id from the key itself, so log-only keys (absent from the
    # snapshot) still resolve their chunk's watermarks
    chunk_id = chunk_of(F.col("pk"), n_chunks)
    j = _attach_lw(j, watermarks, chunk_id)
    log_wins = F.col("last_seq").isNotNull() & (F.col("last_seq") > F.col("lw"))
    delete_win = log_wins & (F.col(f"l_{op}") == delete_value)
    in_window = (F.col("last_seq").isNotNull()
                 & (F.col("last_seq") > F.col("lw"))
                 & (F.col("last_seq") <= F.col("hw")))

    snap_present = F.coalesce(F.col("_snap"), F.lit(False))
    cols = [F.col("pk"), F.col("_cid").alias("chunk_id"),
            F.col("lw"), F.col("hw"),
            snap_present.alias("snap_present"),
            log_wins.alias("log_wins"), delete_win.alias("delete_win"),
            in_window.alias("in_window"),
            F.when(log_wins, F.lit("log")).otherwise(F.lit("snapshot")).alias("src"),
            F.when(log_wins, F.col("last_seq")).otherwise(F.lit(-1)).cast("long").alias("version_seq")]
    for name in snap_payload:
        cols.append(F.when(log_wins, F.col(f"l_{name}"))
                    .otherwise(F.col(f"s_{name}")).alias(name))
    return j.select(*cols)


def _attach_lw(j: DataFrame, watermarks: DataFrame,
               chunk_id: Column) -> DataFrame:
    """Join lw/hw through the key-derived chunk id. The manifest is
    n_chunks rows — broadcast, no exchange."""
    wm = watermarks.select(F.col("chunk_id").alias("_wc"),
                           F.col("lw"), F.col("hw"))
    return (j.withColumn("_cid", chunk_id)
            .join(F.broadcast(wm), F.col("_cid") == F.col("_wc"), "left")
            .drop("_wc"))


def handoff_state(merged: DataFrame) -> DataFrame:
    """Survivor filter over handoff_merged: a key exists in the seeded
    state iff the log's winning event is not a delete, or the chunk
    row survives — log-only keys whose events all predate their
    chunk's lw are phantoms (already reflected in the chunk read) and
    contribute nothing."""
    return merged.filter((F.col("log_wins") & ~F.col("delete_win"))
                         | (~F.col("log_wins") & F.col("snap_present")))


def uniform_watermarks(spark: SparkSession, n_chunks: int,
                       window: int) -> DataFrame:
    """Deterministic manifest for the batch certification queries:
    chunk c was read while the log grew through (c*window,
    (c+1)*window] — the fixture stand-in for real interleave timing."""
    rows = [(c, c * window, (c + 1) * window) for c in range(n_chunks)]
    return spark.createDataFrame(rows, "chunk_id INT, lw BIGINT, hw BIGINT")


def bootstrap_snapshot(spark: SparkSession, *, snapshot: DataFrame,
                       key: str, n_chunks: int,
                       log_head: "callable",
                       apply_chunk: "callable",
                       chunk_expr: "callable" = None) -> list[tuple[int, int, int]]:
    """Phase 1 of the handoff: the DBLog chunk loop.

    For each chunk: read the log head (lw), hand the chunk rows —
    positioned at lw with CHUNK_RANK — to ``apply_chunk`` (the
    idempotent upsert), read the head again (hw). Returns the
    watermark manifest [(chunk_id, lw, hw)].

    ``log_head() -> int`` and ``apply_chunk(df, chunk_id)`` are
    injected so the loop is source/sink agnostic (files here; a real
    deployment points them at the change stream's resume token and
    the same upsert sink). The loop runs n_chunks times on the
    driver; every read inside it is distributed.
    """
    cexpr = chunk_expr or chunk_of
    manifest: list[tuple[int, int, int]] = []
    for c in range(n_chunks):
        lw = log_head()
        chunk = (snapshot
                 .filter(cexpr(F.col(key), n_chunks) == c)
                 .withColumn(POS_COL, F.lit(lw).cast("long"))
                 .withColumn(RANK_COL, F.lit(CHUNK_RANK)))
        apply_chunk(chunk, c)
        hw = log_head()
        manifest.append((c, lw, hw))
    return manifest


def state_divergence(expected: DataFrame, actual: DataFrame) -> DataFrame:
    """The StateAudit diff: expected (primary_key, _payload, _at) vs
    actual (primary_key, _actual_payload, _actual_pos), one full-outer
    join, verdict per key — match / stale_value / missing_in_state /
    orphan_in_state. Shared verbatim by jobs.py::state_audit and the
    oracle-checked ``state_audit_report`` query face."""
    j = expected.join(actual, "primary_key", "full_outer")
    verdict = (
        F.when(F.col("_payload").isNull(), F.lit("orphan_in_state"))
        .when(F.col("_actual_payload").isNull(), F.lit("missing_in_state"))
        .when(F.col("_payload") == F.col("_actual_payload"), F.lit("match"))
        .otherwise(F.lit("stale_value")))
    return j.select(
        "primary_key", verdict.alias("verdict"),
        F.col("_at").alias("expected_seq"),
        F.col("_actual_pos").alias("actual_pos"))
