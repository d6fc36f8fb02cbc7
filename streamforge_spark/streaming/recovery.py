"""CDC resume-token expiry degrade path.

Reference: ``connector/mongo/MongoChangeStreamSource.java:260-266`` —
when the stored resume token has aged out of the oplog the reference
does NOT crash-loop: it drops the token, opens a new change stream at
the current time, and logs the hole.  The Spark analog of the resume
token is the streaming checkpoint; the analog of oplog trimming is
source retention deleting files (or Kafka segments) that an
uncommitted batch still needs.

Two failure shapes, BOTH handled here:

- **Kafka-style loud loss**: the restarted query dies with
  ``Offsets out of range`` (or crash-loops forever with
  ``failOnDataLoss=true``) — caught from the exception message.
- **File-source silent loss**: measured on Spark 4.1 (and the reason
  the preflight exists): replaying a batch whose logged file was
  deleted does NOT raise even with ``ignoreMissingFiles=false`` — the
  lost file is skipped with a WARN and the batch commits EMPTY.  The
  hole would never be reported at all.  ``preflight_source_audit``
  therefore checks the checkpoint's uncommitted source-log entries
  against the filesystem BEFORE resuming — the exact analog of the
  reference validating its resume token before opening the stream.

``start_with_token_recovery`` implements the same degrade policy:

1. try a normal resume from the checkpoint;
2. if (and only if) the failure is unrecoverable source loss, archive
   the checkpoint aside (kept for forensics, like the logged token),
   append a structured gap row to the DLQ/metrics channel — the
   detection half (`offset_continuity_audit`) can quantify the hole
   later — and restart the SAME pipeline "from now";
3. "from now" for a file CDC feed means: only rows from files modified
   after the recovery point (``from_now_filter`` over the
   ``_metadata.file_modification_time`` column), so the restarted
   stream does not re-ingest history the sink already has.

At 100 TB the important property is that the blast radius of retention
misconfiguration is a REPORTED gap plus a clean restart, not an
unbounded replay or a crash-looping job.
"""

from __future__ import annotations

import datetime
import json
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Error signatures that mean "the source no longer holds data the
# checkpoint needs" — the Kafka spellings of a trimmed oplog, plus the
# JVM FileNotFound a mid-read deletion raises.  Kept NARROW on
# purpose: a broad marker like "does not exist" also matches unrelated
# AnalysisExceptions (a mistyped static-lookup path), and
# misclassifying a real bug as source loss ARCHIVES a healthy
# checkpoint and skips backlog.  File-source retention loss does not
# raise at all (it replays empty — measured); the preflight audit
# catches it, so no file-source string needs to be here.
_SOURCE_LOSS_MARKERS = (
    "FileNotFoundException",
    "Offsets out of range",          # Kafka trimmed segments
    "failOnDataLoss",
)


def _hadoop_fs(spark: SparkSession, path: str):
    """(fs, JPath, path_obj) for the filesystem hosting ``path`` —
    the one place the Hadoop FS resolution lives."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    JPath = jvm.org.apache.hadoop.fs.Path
    p = JPath(path)
    return p.getFileSystem(conf), JPath, p


def _is_source_loss(exc: BaseException) -> bool:
    if isinstance(exc, SourceDataLoss):
        return True
    msg = str(exc)
    return any(m in msg for m in _SOURCE_LOSS_MARKERS)


class SourceDataLoss(RuntimeError):
    """Pending (uncommitted) checkpoint data no longer exists at the
    source — the resume-token-expired condition."""


def preflight_source_audit(spark: SparkSession, checkpoint: str) -> list[str]:
    """Return source files that an UNCOMMITTED checkpoint batch still
    needs but that no longer exist — the resume-token validity check.

    Reads the checkpoint's own metadata logs: ``commits/`` gives the
    last durably-committed batch; ``sources/<i>/<batch>`` entries with
    a batch id beyond it list the files the replay will demand.  Only
    pending batches matter — files from committed batches are already
    in the sink and MAY legitimately age out of the source.

    Cost: a few KB of metadata-log reads; no data scan.  Uses the
    Hadoop FS API so it works on whatever filesystem hosts the
    checkpoint.
    """
    fs, JPath, root = _hadoop_fs(spark, checkpoint)
    if not fs.exists(root):
        return []

    def log_files(p):
        """(batch_id, name) pairs — including 'N.compact' logs, which
        hold the CUMULATIVE entry list at compaction interval N."""
        if not fs.exists(p):
            return []
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            base = name[:-len(".compact")] if name.endswith(".compact") \
                else name
            if base.isdigit():
                out.append((int(base), name))
        return out

    commits = [b for b, _ in log_files(JPath(f"{checkpoint}/commits"))]
    last_commit = max(commits) if commits else -1
    missing: set[str] = set()
    sources_dir = JPath(f"{checkpoint}/sources")
    if not fs.exists(sources_dir):
        return []
    for src_st in fs.listStatus(sources_dir):
        for bid, name in log_files(src_st.getPath()):
            if bid <= last_commit:
                continue
            log = JPath(f"{src_st.getPath()}/{name}")
            stream = fs.open(log)
            try:
                text = bytes(stream.readAllBytes()).decode()
            finally:
                stream.close()
            for line in text.splitlines():
                if not line.startswith("{"):
                    continue   # version header
                try:
                    entry = json.loads(line)
                except ValueError:
                    continue
                # compact logs replay EVERY historical entry; each
                # entry carries its own batchId — only pending ones
                # (beyond the last commit) gate the resume
                ebid = entry.get("batchId", bid)
                if ebid <= last_commit:
                    continue
                path = entry.get("path")
                if path and not fs.exists(JPath(path)):
                    missing.add(path)
    return sorted(missing)


def from_now_filter(stream: DataFrame, resumed_at: datetime.datetime | None,
                    ) -> DataFrame:
    """Restrict a file-source stream to files modified after the
    recovery point — the file-feed meaning of "restart from now".
    With ``resumed_at=None`` (normal start) the stream is unchanged."""
    if resumed_at is None:
        return stream
    return stream.where(
        F.col("_metadata.file_modification_time") > F.lit(resumed_at))


def report_gap(spark: SparkSession, gap_report_path: str, *,
               checkpoint: str, archived_to: str, error: str,
               resumed_at: datetime.datetime,
               policy: str = "restart-from-now",
               dedupe_key: str | None = None) -> bool:
    """Append one structured gap row to the DLQ/metrics channel (a
    JSON-lines directory readable by the observability queries).

    ``dedupe_key`` names the report file deterministically so the
    SAME loss reported twice (e.g. a --recover rerun before the
    pending batch commits) writes exactly one row; returns False when
    the row already existed."""
    row = json.dumps({
        "kind": "cdc_token_expired",
        "policy": policy,
        "checkpoint": checkpoint,
        "archived_to": archived_to,
        "error": error[:2000],
        "resumed_at": resumed_at.isoformat(),
    })
    name = dedupe_key or uuid.uuid4().hex
    fs, _JPath, path = _hadoop_fs(
        spark, f"{gap_report_path.rstrip('/')}/gap-{name}.json")
    if dedupe_key and fs.exists(path):
        return False   # this exact loss was already reported
    out = fs.create(path, False)
    out.write(bytearray((row + "\n").encode()))
    out.close()
    return True


def archive_checkpoint(spark: SparkSession, checkpoint: str) -> str:
    """Move the expired checkpoint aside (kept for forensics)."""
    fs, JPath, src = _hadoop_fs(spark, checkpoint)
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y%m%dT%H%M%S")
    dst = JPath(
        f"{checkpoint.rstrip('/')}.expired-{stamp}-{uuid.uuid4().hex[:6]}")
    if fs.exists(src) and not fs.rename(src, dst):
        raise OSError(f"failed to archive checkpoint {checkpoint}")
    return dst.toString()


def start_with_token_recovery(
        spark: SparkSession,
        start_fn: Callable[[datetime.datetime | None], "object"],
        *, checkpoint: str, gap_report_path: str):
    """Start (or resume) a streaming pipeline with the reference's
    token-expiry degrade policy.

    ``start_fn(resumed_at)`` builds and starts the query; it receives
    ``None`` on a normal resume, or the recovery timestamp after a
    source-loss recovery (pass it to :func:`from_now_filter` on the
    source).  The first micro-batches are driven synchronously
    (``processAllAvailable``) so replay-time source loss surfaces HERE
    rather than minutes later in the background thread.

    Returns ``(query, resumed_at)`` — ``resumed_at`` is None when the
    checkpoint resumed cleanly.
    """
    q = None
    try:
        lost = preflight_source_audit(spark, checkpoint)
        if lost:
            # file sources lose this data SILENTLY (empty replay with
            # a WARN) — fail the resume explicitly so the degrade path
            # below reports the hole instead of committing over it
            raise SourceDataLoss(
                f"uncommitted batches reference files that no longer "
                f"exist: {lost[:10]}{'...' if len(lost) > 10 else ''}")
        q = start_fn(None)
        q.processAllAvailable()
        return q, None
    except Exception as e:  # noqa: BLE001 - filtered below, else re-raised
        if q is not None:   # deregister the dead run before touching
            try:            # its checkpoint (else Spark sees two
                q.stop()    # queries on one commit log)
            except Exception:  # noqa: BLE001 - already terminated
                pass
        if not _is_source_loss(e):
            raise
        resumed_at = datetime.datetime.now(datetime.timezone.utc)
        archived = archive_checkpoint(spark, checkpoint)
        report_gap(spark, gap_report_path, checkpoint=checkpoint,
                   archived_to=archived, error=str(e), resumed_at=resumed_at)
        q = start_fn(resumed_at)
        q.processAllAvailable()
        return q, resumed_at
