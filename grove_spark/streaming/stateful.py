"""Custom stateful streaming operator: per-source sessionization via
``applyInPandasWithState`` (SURVEY §2.8 — the grouped, stateful form of
the pandas-UDF extension surface).

The reference has no sessionization, but its daemon's per-connector
run-tracking (Run model, grove/models.py:205-220: last run, in-flight
future per connector) is exactly per-key state over an event stream.
This operator generalizes it into the shape a training-data pipeline
needs: collapse a connector's event stream into activity sessions
(gap-based), emitting one row per closed session with row/token counts.

Arrow-batched per group; state is a single (start, last, rows, n_tok)
tuple per key — bounded, watermark-evicted.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("session_start_ms", T.LongType()),
    T.StructField("session_end_ms", T.LongType()),
    T.StructField("rows", T.LongType()),
    T.StructField("sum_n_tok", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("start_ms", T.LongType()),
    T.StructField("last_ms", T.LongType()),
    T.StructField("rows", T.LongType()),
    T.StructField("sum_n_tok", T.LongType()),
])


def sessionize_fn(gap_ms: int):
    """Build the per-group state function: events within ``gap_ms`` of
    each other extend the session; a larger gap (or state timeout)
    closes it and emits a session row."""

    def fn(
        key: Tuple[str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (source,) = key
        if state.hasTimedOut:
            start, last, rows, toks = state.get
            state.remove()
            yield pd.DataFrame(
                [[source, start, last, rows, toks]],
                columns=[f.name for f in SESSION_SCHEMA.fields],
            )
            return

        events = pd.concat(list(pdfs)).sort_values("event_time")
        ts = events["event_time"].astype("int64") // 1_000_000
        toks = events["n_tok"].astype("int64")

        prev_last = state.get[1] if state.exists else None
        # vectorized session assignment: a gap > gap_ms starts a session
        gaps = ts.diff()
        new_sess = gaps > gap_ms
        if len(new_sess):
            new_sess.iloc[0] = prev_last is None or (ts.iloc[0] - prev_last) > gap_ms
        sess_id = new_sess.cumsum()
        agg = pd.DataFrame({"ts": ts, "tok": toks, "sid": sess_id}).groupby("sid").agg(
            start=("ts", "min"), end=("ts", "max"),
            rows=("ts", "size"), sum_tok=("tok", "sum"),
        )

        sessions = [
            [int(r.start), int(r.end), int(r.rows), int(r.sum_tok)]
            for r in agg.itertuples()
        ]
        if state.exists and not new_sess.iloc[0]:
            # first batch-session continues the carried state
            s0, l0, r0, t0 = state.get
            sessions[0] = [s0, sessions[0][1], r0 + sessions[0][2], t0 + sessions[0][3]]
        elif state.exists:
            # carried session closed by the gap to this batch
            s0, l0, r0, t0 = state.get
            sessions.insert(0, [s0, l0, r0, t0])

        *closed, current = sessions
        state.update(tuple(current))
        state.setTimeoutDuration(gap_ms)
        if closed:
            yield pd.DataFrame(
                [[source, *c] for c in closed],
                columns=[f.name for f in SESSION_SCHEMA.fields],
            )

    return fn


def sessionize(stream: DataFrame, gap_ms: int = 60_000) -> DataFrame:
    """Gap-based sessions per source over a (possibly streaming)
    DataFrame with (source, event_time, n_tok)."""
    return (
        stream.groupBy("source")
        .applyInPandasWithState(
            sessionize_fn(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
