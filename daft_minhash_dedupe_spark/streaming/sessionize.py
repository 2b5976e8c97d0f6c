"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the pattern the engine uses for any stateful
logic Spark's built-in streaming aggregations can't express).

A session is a maximal run of one key's events with inter-event gaps ≤
``gap``. Open sessions live in the state store keyed by user; a session is
emitted when (a) a later event for the same key arrives past the gap
(closed within a batch), or (b) the event-time watermark passes
last_event + gap (EventTimeTimeout — so state is bounded and sessions of
departed users still flush). Per-batch work is vectorized pandas (sort +
diff/cumsum grouping), no per-event Python loop.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _parse_duration_seconds(s: str) -> float:
    qty, unit = s.split()
    mult = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }[unit]
    return float(qty) * mult


def streaming_sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """(key, session_start, session_end, n_events) stream of CLOSED sessions.

    State per key: the one open session (start, last, n) — O(active keys),
    evicted by event-time timeout at last + gap once the watermark passes.
    """
    gap_s = _parse_duration_seconds(gap)
    key_field = stream.schema[key_col]

    out_schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start", T.TimestampType()),
            T.StructField("last", T.TimestampType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def _out(key, sessions):
        return pd.DataFrame(
            {
                key_col: [key[0]] * len(sessions),
                "session_start": [s[0] for s in sessions],
                "session_end": [s[1] for s in sessions],
                "n_events": [s[2] for s in sessions],
            }
        )

    def _fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _out(key, [(start, last, n)])
            return

        ts = pd.concat([p[ts_col] for p in pdfs]).sort_values().reset_index(drop=True)
        prev = state.get if state.exists else None

        # vectorized session split: new session where gap to previous event
        # (or to the open session's last event) exceeds gap_s
        gaps = ts.diff().dt.total_seconds()
        new_flags = gaps > gap_s
        if prev is not None:
            new_flags.iloc[0] = (ts.iloc[0] - prev[1]).total_seconds() > gap_s
        else:
            new_flags.iloc[0] = True
        sid = new_flags.cumsum()
        grouped = ts.groupby(sid).agg(["min", "max", "count"])

        sessions = [
            (row["min"].to_pydatetime(), row["max"].to_pydatetime(), int(row["count"]))
            for _, row in grouped.iterrows()
        ]
        if prev is not None and not new_flags.iloc[0]:
            # first batch-session continues the open one
            s0 = sessions[0]
            sessions[0] = (prev[0], s0[1], prev[2] + s0[2])
        elif prev is not None:
            sessions.insert(0, tuple(prev))

        open_start, open_last, open_n = sessions[-1]
        closed = sessions[:-1]
        state.update((open_start, open_last, open_n))
        state.setTimeoutTimestamp(
            int(open_last.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
            + int(gap_s * 1000)
        )
        if closed:
            yield _out(key, closed)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            _fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
