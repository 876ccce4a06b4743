"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.2 'Streaming — stateful'): a running per-user profile that
native windowed aggregation can't express (carries arbitrary Python
state across micro-batches, emits on every update, times out idle keys).

State is bounded two ways: GroupStateTimeout evicts idle users, and the
state value itself is a fixed-size tuple — the 100 TB rule for stateful
streaming is that state size must not grow with events seen.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
        StructField("max_value", DoubleType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), False),
        StructField("mx", DoubleType(), False),
    ]
)


def _update_profile(
    key: Any, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    state.setTimeoutDuration(60 * 60 * 1000)  # evict idle users after 1h
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """events(user_id, value, ...) stream → continuously-updated per-user
    profile. Update-mode output; one state row per active user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
