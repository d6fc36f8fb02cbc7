"""Streaming CEP: the click→error-within-T, no-purchase-between
pattern (the batch spec is queries/analytics.py::
cep_click_error_pattern) as watermark-driven keyed state.

The semantics Flink CEP provides with NFA state and event-time timers
map onto applyInPandasWithState like this:

- per user, buffer the (type, ts, id) events still inside any
  undecided click's [click, click+T] horizon;
- a click becomes DECIDABLE exactly when the event-time watermark
  passes click_ts + T — at that point every event that could matter
  to it has arrived (the watermark contract), so the decision (first
  error in window, vetoed by any purchase strictly inside
  (click, error)) is final and deterministic — independent of
  micro-batch boundaries;
- an event-time timer re-wakes the group at its earliest undecided
  deadline, so decisions fire even if the user never sends another
  event;
- eviction: once decided clicks are emitted, everything at or below
  watermark - T leaves the buffer — state per user is bounded by
  rate x T, never history.

test_streaming_cep_matches_batch pins streaming == batch on the same
fixture (a far-future sentinel event pushes the final watermark so
every click decides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CEP_WINDOW_S = 3600


def streaming_cep_click_error(events: DataFrame, *,
                              window_s: int = CEP_WINDOW_S,
                              watermark: str = "10 minutes") -> DataFrame:
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("click_id", T.LongType()),
        T.StructField("error_id", T.LongType()),
        T.StructField("gap_us", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("types", T.ArrayType(T.StringType())),
    ])
    win_us = window_s * 1_000_000

    def fn(key: tuple, pdfs, state: GroupState):
        import pandas as pd
        ids, ts_us, types = ([], [], []) if not state.exists else \
            tuple(list(x) for x in state.get)
        if not state.hasTimedOut:
            for pdf in pdfs:
                for eid, ts, et in zip(pdf["event_id"], pdf["ts"],
                                       pdf["event_type"]):
                    ids.append(int(eid))
                    ts_us.append(int(ts.value // 1000))
                    types.append(str(et))
        wm_us = state.getCurrentWatermarkMs() * 1000
        buf = sorted(zip(ts_us, ids, types))
        out = []
        undecided_deadlines = []
        survivors = []
        for t, i, et in buf:
            if et == "click":
                if t + win_us <= wm_us:
                    errs = [(t2, i2) for t2, i2, e2 in buf
                            if e2 == "error" and t < t2 <= t + win_us]
                    if errs:
                        e_ts, e_id = min(errs)
                        veto = any(e2 == "purchase" and t < t2 < e_ts
                                   for t2, _, e2 in buf)
                        if not veto:
                            out.append((key[0], i, e_id, e_ts - t))
                    continue  # decided: drop from buffer
                undecided_deadlines.append(t + win_us)
            if t > wm_us - win_us:  # still inside someone's horizon
                survivors.append((t, i, et))
        if survivors or undecided_deadlines:
            state.update((
                [i for _, i, _ in survivors],
                [t for t, _, _ in survivors],
                [e for _, _, e in survivors]))
            if undecided_deadlines:
                state.setTimeoutTimestamp(min(undecided_deadlines) // 1000)
            else:
                # no pending decision — schedule a cleanup wake so a
                # silent user's residual buffer evicts once the
                # watermark passes its horizon (no state leak)
                state.setTimeoutTimestamp(
                    (max(t for t, _, _ in survivors) + win_us) // 1000 + 1)
        else:
            state.remove()
        yield pd.DataFrame(
            out, columns=["user_id", "click_id", "error_id", "gap_us"])

    prepared = (events
                .withWatermark("ts", watermark)
                .select("user_id", "event_id", "ts", "event_type"))
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.EventTimeTimeout)
