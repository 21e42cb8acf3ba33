"""Custom stateful streaming operator: incremental gap sessionization
via ``applyInPandasWithState``.

The batch engine sessionizes with a lag window (operators/events.py);
a continuous crawl can't — a window needs the whole history. Here the
per-user state store carries exactly what the next micro-batch needs
(current session id, its start, last event time, event count), so state
is O(active users), not O(events seen).

Semantics match the batch ``session_stats`` for in-order input: a new
session starts when the gap to the user's previous event exceeds
``gap_minutes``; emitted rows are UPDATE-mode upserts of
(user_id, session_id, n_events, duration_ms) — a touched session is
re-emitted with its latest totals each micro-batch.

Scale notes: one shuffle per micro-batch on user_id (the state key);
per-group work is vectorized numpy over the Arrow batch, no per-row
Python beyond the group loop Spark itself drives. State is bounded by
the active-user set; pair with a state TTL (GroupStateTimeout) in a
production deployment to expire dormant users.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_id", LongType()),
    StructField("n_events", LongType()),
    StructField("duration_ms", LongType()),
])

# (current session id, its start ms, last event ms, events so far)
STATE_SCHEMA = StructType([
    StructField("session_id", LongType()),
    StructField("start_ms", LongType()),
    StructField("last_ms", LongType()),
    StructField("n_events", LongType()),
])


def _make_fn(gap_ms: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.exists:
            sid, start, last, n_prev = state.get
        else:
            sid, start, last, n_prev = 0, None, None, 0

        batch = pd.concat(list(pdfs))
        if len(batch) == 0:
            return
        batch = batch.sort_values(["ts", "event_id"])
        ms = (batch["ts"].astype("int64") // 1_000_000).to_numpy()

        new = np.empty(len(ms), dtype=bool)
        new[0] = last is None or (ms[0] - last) > gap_ms
        if len(ms) > 1:
            new[1:] = (ms[1:] - ms[:-1]) > gap_ms
        sess = sid + np.cumsum(new)  # continuing rows keep sid

        out = []
        for s in np.unique(sess):
            mask = sess == s
            seg_ms = ms[mask]
            n = int(mask.sum())
            seg_start = int(seg_ms[0])
            if s == sid:  # continuation of the state's open session
                n += n_prev
                seg_start = int(start)
            out.append((user_id, int(s), n, int(seg_ms[-1]) - seg_start))

        _, last_sid, last_n, last_dur = out[-1]
        state.update((last_sid, int(ms[-1]) - last_dur, int(ms[-1]),
                      last_n))
        yield pd.DataFrame(
            out, columns=["user_id", "session_id", "n_events",
                          "duration_ms"])

    return fn


def streaming_session_stats(events: DataFrame, gap_minutes: int = 30,
                            user_col: str = "user_id") -> DataFrame:
    """→ streaming (user_id, session_id, n_events, duration_ms) upserts.

    Input needs (user_id, ts, event_id) columns; use with
    ``outputMode("update")``.
    """
    fn = _make_fn(gap_minutes * 60_000)
    return (events.groupBy(user_col).applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout))
