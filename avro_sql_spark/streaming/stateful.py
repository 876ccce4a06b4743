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


def _make_update_profile(evict_idle: bool):
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
        if evict_idle:
            state.setTimeoutDuration(60 * 60 * 1000)  # evict idle after 1h
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total], "max_value": [mx]}
        )

    return _update_profile


def running_user_profile(events: DataFrame, evict_idle: bool = True) -> DataFrame:
    """events(user_id, value, ...) stream → continuously-updated per-user
    profile. Update-mode output; one state row per active user.
    ``evict_idle=False`` (NoTimeout) lets bounded availableNow replays
    terminate — see :func:`streaming_funnel`."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_profile(evict_idle),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("stage", LongType(), False),  # 0 none, 1 view, 2 click, 3 purchase
    ]
)

# stage + the three stage timestamps (micros since epoch; 0 = unset).
# Fixed-size per user — state never grows with events seen.
FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("stage", LongType(), False),
        StructField("v_us", LongType(), False),
        StructField("c_us", LongType(), False),
        StructField("p_us", LongType(), False),
    ]
)

def _make_advance_funnel(evict_idle: bool):
    """Order-sensitive funnel update fn: a stage event only advances the
    user if it arrives with ts strictly AFTER the previous stage's first
    qualifying event — the same cascade as the batch
    ``funnel_conversion`` operator, carried across micro-batches.
    ``setTimeoutDuration`` is only legal under ProcessingTimeTimeout,
    hence the factory."""

    def _advance_funnel(
        key: Any, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        stage, v_us, c_us, p_us = state.get if state.exists else (0, 0, 0, 0)
        for pdf in batches:
            pdf = pdf.sort_values("ts")
            for ts, etype in zip(pdf["ts"], pdf["event_type"]):
                us = int(ts.value // 1_000)  # pandas ns -> micros
                if stage == 0 and etype == "view":
                    stage, v_us = 1, us
                elif stage == 1 and etype == "click" and us > v_us:
                    stage, c_us = 2, us
                elif stage == 2 and etype == "purchase" and us > c_us:
                    stage, p_us = 3, us
        state.update((stage, v_us, c_us, p_us))
        if evict_idle:
            state.setTimeoutDuration(24 * 60 * 60 * 1000)
        yield pd.DataFrame({"user_id": [user_id], "stage": [stage]})

    return _advance_funnel


def streaming_funnel(events: DataFrame, evict_idle: bool = True) -> DataFrame:
    """events(user_id, ts, event_type) stream → per-user funnel stage,
    updated every micro-batch. Within a batch events are processed in
    ts order; ACROSS batches ordering holds when the source respects
    event-time ordering per key (pair with a watermark + sorted replay
    for strict guarantees). One fixed-size state row per active user,
    idle users evicted after 24h.

    ``evict_idle=False`` switches to ``NoTimeout``: required for BOUNDED
    availableNow replays, because a processing-time timeout keeps the
    query alive after the data is exhausted (it must keep scheduling
    batches to fire timeouts) — an unbounded replay never terminates."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_advance_funnel(evict_idle),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
