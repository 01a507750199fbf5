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
