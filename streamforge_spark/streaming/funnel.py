"""Streaming ordered-funnel tracker.

The online twin of the batch `funnel_conversion` query: per user,
stage k of the funnel completes at the FIRST event of the stage's
type that arrives strictly after the user's stage-(k-1) completion
time.  Batch computes this with chained MIN-joins over history; a
live product dashboard needs it as events arrive — keyed state of
one timestamp per stage (3 longs for a 3-stage funnel), emitting a
row the moment a user advances a stage.

Ordering contract: within a micro-batch all Arrow chunks are
accumulated and folded once in (event_time, event_id) order; across
batches the fold is arrival-order, so equality with the batch
formulation holds when the feed is in-order per user (the module-wide
contract documented on `streaming_rate_limit`).

Reference tie: this is the composition a reference user hand-builds
from FilterInterceptor chains + keyed ValueState (SURVEY §2.4/§2.8);
here it is one `applyInPandasWithState` operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def streaming_funnel(events: DataFrame,
                     stages: Sequence[str] = ("signup", "click", "purchase"),
                     *, key_col: str = "user_id", type_col: str = "event_type",
                     time_col: str = "ts", id_col: str = "event_id") -> DataFrame:
    """Emit (user_id, stage_idx, stage, completed_us) whenever a user
    first completes a funnel stage (append mode)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stages = list(stages)
    n_stages = len(stages)
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("stage_idx", T.IntegerType()),
        T.StructField("stage", T.StringType()),
        T.StructField("completed_us", T.LongType()),
    ])
    # one completion time per stage; 0 = not reached
    state_schema = T.StructType([
        T.StructField("done_us", T.ArrayType(T.LongType()))])

    def fn(key: tuple, pdfs, state: GroupState):
        import pandas as pd
        done = list(state.get[0]) if state.exists else [0] * n_stages
        evs = []
        for pdf in pdfs:
            evs.extend(zip((int(u) for u in pdf["eus"]),
                           (int(i) for i in pdf["event_id"]),
                           pdf["etype"]))
        evs.sort()
        out = []
        for eus, _eid, etype in evs:
            for k in range(n_stages):
                if done[k]:
                    continue
                # stage k needs its type AND strict order after k-1
                if etype == stages[k] and (k == 0 or
                                           (done[k - 1] and
                                            eus > done[k - 1])):
                    done[k] = eus
                    out.append((k, stages[k], eus))
                break   # an event can only advance the first open stage
        state.update((done,))
        yield pd.DataFrame({
            "user_id": [key[0]] * len(out),
            "stage_idx": [r[0] for r in out],
            "stage": [r[1] for r in out],
            "completed_us": [r[2] for r in out],
        })

    prepared = events.select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("etype"),
        F.unix_micros(F.col(time_col)).alias("eus"))
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout)
