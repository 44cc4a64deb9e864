"""Custom stateful streaming operator: gap-timeout sessionization via
``applyInPandasWithState``.

The batch engine's sessionization agg (registry ``agg_sessionize``) gets a
true STREAMING twin here — the reference's transform/rollup model for data
streams (``server/.../cluster/metadata/DataStream.java``, x-pack transforms)
re-expressed as Structured Streaming arbitrary stateful processing:

- state per user = the open session ``(start, end, n_events)``;
- a new event within ``gap`` of the session end extends it; an event
  beyond the gap closes the old session (emits a row) and opens a new one;
- an EventTimeTimeout fires when the WATERMARK passes ``end + gap`` —
  closing idle sessions exactly like the batch window's gap predicate.

Scale shape: state lives in the state store partitioned by user (RocksDB
on a real cluster), each micro-batch touches only updated keys; nothing
scans history. Deterministic given the same micro-batch boundaries.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, end long, n long"  # epoch microseconds


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _emit(user: int, start_us: int, end_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": [user],
        "session_start": [pd.Timestamp(start_us * 1000)],
        "session_end": [pd.Timestamp(end_us * 1000)],
        "n_events": [n],
    })


def _session_fn(gap_us: int):
    def fn(key, pdfs, state: GroupState):
        user = int(key[0])
        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield _emit(user, s, e, n)
            return
        new = pd.concat(list(pdfs), ignore_index=True)
        if len(new) == 0:
            return
        ts = new["ts"].map(_us).sort_values().to_numpy()
        if state.exists:
            s, e, n = state.get
        else:
            s, e, n = int(ts[0]), int(ts[0]), 0
        closed = []
        for t in ts:
            t = int(t)
            if t - e > gap_us:
                closed.append((s, e, n))
                s, e, n = t, t, 1
            else:
                # an in-watermark LATE event can precede the open session's
                # start — the batch twin would widen the session backwards
                s = min(s, t)
                e = max(e, t)
                n += 1
        state.update((s, e, n))
        # close the open session when the watermark passes end + gap
        state.setTimeoutTimestamp((e + gap_us) // 1000)
        for c in closed:
            yield _emit(user, *c)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """events stream (user_id, ts, …) → closed-session stream
    (user_id, session_start, session_end, n_events)."""
    value, unit = gap.split()
    gap_us = int(
        dt.timedelta(**{unit if unit.endswith("s") else unit + "s": int(value)})
        .total_seconds() * 1_000_000
    )
    prepared = events.select(
        events[user_col].cast("long").alias("user_id"),
        events[ts_col].alias("ts"),
    ).withWatermark("ts", gap)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_us),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
