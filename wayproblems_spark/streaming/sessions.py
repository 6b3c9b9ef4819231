"""Custom stateful streaming operator: gap-based user sessionization via
``applyInPandasWithState`` (the q10 window query as an incremental stream).

Semantics (identical to the batch q10_user_event_sessions contract):
events per user, ordered by (ts, event_id); a gap > ``gap_s`` seconds
starts a new session; emit (user_id, session_id, n_events) as sessions
CLOSE (watermark-driven timeout) — session_id is the 1-based per-user
session ordinal, so a replayed stream produces the same ids as the batch
window.

State per user: (open session ordinal, event count, last event ts).
GroupStateTimeout.EventTimeTimeout closes sessions once the watermark
passes last_ts + gap — late events inside the watermark reopen nothing
incorrectly because arrival within the gap extends the session exactly
like the batch lag() formulation.

Scale: state is O(active users), keyed-partitioned by user_id; each
micro-batch touches only users with new events. This is the
applyInPandasWithState shape the north_star names for custom stateful
operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_DDL = "user_id long, session_id long, n_events long"
STATE_DDL = "session_id long, n_events long, last_ts_s long"


def _sessionize(gap_s: int):
    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            sid, n, _ = state.get
            state.remove()
            if n > 0:
                yield pd.DataFrame(
                    {"user_id": [user_id], "session_id": [sid], "n_events": [n]}
                )
            return

        sid, n, last = state.get if state.exists else (0, 0, None)
        closed_rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"].astype("int64") // 10**9:
                ts = int(ts)
                if last is None or ts - last > gap_s:
                    if n > 0:
                        closed_rows.append((user_id, sid, n))
                    sid += 1
                    n = 1
                else:
                    n += 1
                last = ts
        state.update((sid, n, last))
        state.setTimeoutTimestamp((last + gap_s) * 1000)
        if closed_rows:
            yield pd.DataFrame(
                closed_rows, columns=["user_id", "session_id", "n_events"]
            )

    return fn


def sessionize_stream(
    events: DataFrame, gap_s: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """events stream (event_id, ts, user_id, ...) → closed-session stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize(gap_s),
            outputStructType=OUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
