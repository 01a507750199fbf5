"""Custom stateful streaming operator (SURVEY §2.10 extension).

``running_totals_per_key`` is the engine's template for operators
Structured Streaming's built-ins can't express: arbitrary per-key
state evolved across micro-batches with ``applyInPandasWithState``.
State here is a (count, sum) pair per key — the shape generalizes to
sessionization with custom logic, decaying counters, online
sketches, etc.

Scale properties: state lives in the executor state store keyed by
the grouping key (one shuffle per batch on that key); batches arrive
as Arrow-backed pandas frames, so the per-key update is vectorized,
never per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_totals_per_key(
    events: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Emit the updated running (count, sum) for each key touched in
    each micro-batch. Use outputMode('update') on the sink."""
    return events.groupBy(key).applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint"
)
SESSION_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def _session_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    gap_us = 30 * 60 * 1_000_000
    closed: list[tuple[int, int, int]] = []
    cur = state.get if state.exists else None
    if state.hasTimedOut:
        if cur is not None:
            closed.append(cur)
        state.remove()
    else:
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(v) for v in pdf["ts_us"])
        for t in sorted(ts):
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > gap_us:
                closed.append(cur)
                cur = (t, t, 1)
            else:
                cur = (cur[0], t, cur[2] + 1)
        if cur is not None:
            state.update(cur)
            state.setTimeoutDuration(60_000)
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(closed),
            "session_start_us": [c[0] for c in closed],
            "session_end_us": [c[1] for c in closed],
            "n_events": [c[2] for c in closed],
        }
    )


def sessionize_per_key(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Custom gap-based sessionizer with explicit timeout state — the
    operator ``F.session_window`` can't express when the session
    carries custom per-session state (here start/last/count; in
    production: per-session feature accumulators). Input needs an
    integer-microsecond ``ts_us`` column; sessions close when a
    30-min gap appears in-batch, or via processing-time timeout for
    keys that go quiet. Emits only CLOSED sessions (append sink).

    Scale: state is (3 ints) per active key in the executor state
    store; each micro-batch shuffles once on the key. Events are
    sorted within each batch, but arrival is assumed batch-ordered
    per key (file source: one file per commit, oldest-first) — for
    out-of-order sources put a watermark + buffer stage in front, or
    use ``F.session_window`` when no custom per-session state is
    needed.
    """
    return events.groupBy(key).applyInPandasWithState(
        _session_update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
