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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


_UNIT_SECONDS = {
    "milli": 0.001, "sec": 1.0, "min": 60.0, "hour": 3600.0,
    "day": 86400.0, "week": 604800.0,
}


def _parse_duration_seconds(s: str) -> float:
    """Spark CalendarInterval-style duration strings: '30 minutes', '1 min',
    '1 hour 30 minutes', '90 seconds', ..."""
    parts = s.split()
    if len(parts) % 2:
        raise ValueError(f"cannot parse duration {s!r}")
    total = 0.0
    for qty, unit in zip(parts[::2], parts[1::2]):
        for prefix, mult in _UNIT_SECONDS.items():
            if unit.lower().startswith(prefix):
                total += float(qty) * mult
                break
        else:
            raise ValueError(f"unknown duration unit {unit!r} in {s!r}")
    return total


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
    # applyInPandasWithState hands the UDF tz-naive timestamps in the SESSION
    # timezone; capture it at plan time so the timeout epoch is correct in
    # non-UTC sessions
    tz = stream.sparkSession.conf.get("spark.sql.session.timeZone")
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

        ts = pd.concat([p[ts_col] for p in pdfs])
        prev = state.get if state.exists else None
        sentinel = None
        if prev is not None:
            # splice the open session's LAST event time into the series as a
            # sentinel so gap splits see it: late events (within watermark)
            # merge correctly and an event ≤ gap after prev.last continues
            # the open session even if the batch's own diffs exceed the gap
            sentinel = pd.Timestamp(prev[1])
            ts = pd.concat([ts, pd.Series([sentinel])])
        ts = ts.sort_values().reset_index(drop=True)

        # vectorized session split: new session where the gap to the previous
        # event exceeds gap_s
        new_flags = ts.diff().dt.total_seconds() > gap_s
        new_flags.iloc[0] = True
        sid = new_flags.cumsum()
        grouped = ts.groupby(sid).agg(["min", "max", "count"])

        sessions = []
        for _, row in grouped.iterrows():
            start, end, n = row["min"].to_pydatetime(), row["max"].to_pydatetime(), int(row["count"])
            if sentinel is not None and start <= sentinel <= end:
                # this split contains the open session: fold it in (sentinel
                # row itself is not an event — subtract it from the count)
                prev_start = prev[0]
                if hasattr(prev_start, "to_pydatetime"):
                    prev_start = prev_start.to_pydatetime()
                start = min(prev_start, start)
                n = prev[2] + n - 1
            sessions.append((start, end, n))

        open_start, open_last, open_n = sessions[-1]
        closed = sessions[:-1]
        state.update((open_start, open_last, open_n))
        epoch_ms = int(
            pd.Timestamp(open_last).tz_localize(tz).timestamp() * 1000
        )
        state.setTimeoutTimestamp(epoch_ms + int(gap_s * 1000))
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
