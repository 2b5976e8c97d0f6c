"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the pattern the engine uses for any stateful
logic Spark's built-in streaming aggregations can't express).

A session is a maximal run of one key's events with inter-event gaps ≤
``gap``. ALL of a key's not-yet-final sessions live in the state store (as
parallel arrays), and a session is emitted only once the event-time
watermark passes ``session_end + gap`` — at that point no admissible late
event (which must carry ts ≥ watermark) can extend or bridge it, so the
emission is correct by watermark-construction: late events within the
watermark always merge, never fragment. State per key is O(horizon / gap)
sessions, evicted by EventTimeTimeout. Per-batch event collapse is
vectorized pandas (sort + diff/cumsum); the merge with stored sessions is a
sweep over that small session list.
"""

from __future__ import annotations

from zoneinfo import ZoneInfo

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
    if not parts or len(parts) % 2:
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
    """(key, session_start, session_end, n_events) stream of FINAL sessions
    (append mode: each session is emitted exactly once, when the watermark
    guarantees no admissible event can still touch it)."""
    gap_s = _parse_duration_seconds(gap)
    # applyInPandasWithState hands the UDF tz-naive timestamps in the SESSION
    # timezone; resolve it once so watermark/timeout epoch math is correct in
    # non-UTC sessions. ZoneInfo + PEP495 fold handles DST-ambiguous times
    # without raising (fold=0 ≈ the earlier instant — a ≤1h conservative skew
    # twice a year).
    tz = stream.sparkSession.conf.get("spark.sql.session.timeZone")
    try:
        tzinfo = ZoneInfo(tz)
    except Exception as exc:  # non-IANA ids like 'GMT+08:00'
        raise ValueError(
            f"streaming_sessionize needs an IANA session timezone, got {tz!r}"
        ) from exc
    key_field = stream.schema[key_col]

    out_schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    # parallel arrays: every not-yet-final session of the key
    state_schema = T.StructType(
        [
            T.StructField("starts", T.ArrayType(T.TimestampType())),
            T.StructField("ends", T.ArrayType(T.TimestampType())),
            T.StructField("ns", T.ArrayType(T.LongType())),
        ]
    )

    def _epoch_ms(naive) -> int:
        if isinstance(naive, pd.Timestamp):
            naive = naive.to_pydatetime()
        return int(naive.replace(tzinfo=tzinfo).timestamp() * 1000)

    def _out(key, sessions):
        return pd.DataFrame(
            {
                key_col: [key[0]] * len(sessions),
                "session_start": [s[0] for s in sessions],
                "session_end": [s[1] for s in sessions],
                "n_events": [s[2] for s in sessions],
            }
        )

    def _flush(key, sessions, state: GroupState):
        """Emit sessions whose end+gap the watermark has passed; keep and
        re-arm the rest."""
        wm_ms = state.getCurrentWatermarkMs()
        # Finality must be strictly stronger than mergeability: an event at
        # exactly ts == end + gap still merges (<= gap, line below in _fn) and
        # ts == watermark is still admissible, so emit only on STRICT
        # end + gap < watermark — otherwise that boundary event would
        # fragment into a second emitted session.
        final = [s for s in sessions if _epoch_ms(s[1]) + gap_s * 1000 < wm_ms]
        live = [s for s in sessions if _epoch_ms(s[1]) + gap_s * 1000 >= wm_ms]
        if live:
            state.update(
                ([s[0] for s in live], [s[1] for s in live], [int(s[2]) for s in live])
            )
            # Spark requires the timeout to be strictly greater than the
            # current watermark; a session kept live at exactly
            # end + gap == watermark (strict-< finality) re-arms at wm + 1ms.
            state.setTimeoutTimestamp(
                max(min(_epoch_ms(s[1]) for s in live) + int(gap_s * 1000), wm_ms + 1)
            )
        else:
            state.remove()
        return final

    def _fn(key, pdfs, state: GroupState):
        def _stored():
            if not state.exists:
                return []
            starts, ends, ns = state.get
            return list(zip(starts, ends, ns))

        if state.hasTimedOut:
            final = _flush(key, _stored(), state)
            if final:
                yield _out(key, final)
            return

        ts = (
            pd.concat([p[ts_col] for p in pdfs])
            .sort_values()
            .reset_index(drop=True)
        )
        # vectorized collapse of this batch's events into sessions
        new_flags = ts.diff().dt.total_seconds() > gap_s
        new_flags.iloc[0] = True
        grouped = ts.groupby(new_flags.cumsum()).agg(["min", "max", "count"])
        batch_sessions = [
            (row["min"].to_pydatetime(), row["max"].to_pydatetime(), int(row["count"]))
            for _, row in grouped.iterrows()
        ]
        # sweep-merge with the stored session list (both sorted, both small)
        merged: list[tuple] = []
        for s in sorted(_stored() + batch_sessions):
            if merged and (s[0] - merged[-1][1]).total_seconds() <= gap_s:
                prev = merged[-1]
                merged[-1] = (
                    min(prev[0], s[0]),
                    max(prev[1], s[1]),
                    prev[2] + s[2],
                )
            else:
                merged.append(s)
        final = _flush(key, merged, state)
        if final:
            yield _out(key, final)

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
