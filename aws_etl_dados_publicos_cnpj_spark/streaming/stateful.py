"""Custom stateful streaming operator via ``applyInPandasWithState``:
a running per-key (event_type) count/sum that survives across
micro-batches — the pattern for operators Spark's built-in streaming
aggs can't express (custom eviction, per-key models, CDC folds).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_type string, total_events long, total_value double"
STATE_SCHEMA = "total_events long, total_value double"


def _update(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        total_events, total_value = state.get
    else:
        total_events, total_value = 0, 0.0
    for pdf in pdfs:
        total_events += len(pdf)
        total_value += float(pdf["value"].sum())
    state.update((total_events, total_value))
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "total_events": [total_events],
            "total_value": [round(total_value, 2)],
        }
    )


def running_totals(stream: DataFrame) -> DataFrame:
    """Running per-event_type totals with explicit state (update mode)."""
    return (
        stream.groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_STAGES = ["signup", "click", "purchase"]
FUNNEL_OUTPUT_SCHEMA = "user_id long, stage_reached integer"
# per-user state: highest funnel stage reached (0 = none) and the
# event-time at which it was entered (gates the NEXT stage's ordering)
FUNNEL_STATE_SCHEMA = "stage integer, entered_at double"


def _funnel_update(key, pdfs, state):
    """Fold each micro-batch of one user's events into (stage,
    entered_at): an event advances the funnel iff it is the next stage
    AND strictly later than the current stage's entry time. Events
    inside a batch are sorted by event time, so cross-batch and
    in-batch ordering agree with the batch operator."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    (user_id,) = key
    if state.exists:
        stage, entered_at = state.get
    else:
        stage, entered_at = 0, float("-inf")
    # the group's batch data arrives as multiple Arrow chunks in
    # arbitrary order — concat THEN sort, or the fold sees time travel
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    for _, row in batch.iterrows():
        if stage < len(FUNNEL_STAGES) and row["event_type"] == FUNNEL_STAGES[stage]:
            ts = row["ts"].timestamp()
            if stage == 0 or ts > entered_at:
                stage += 1
                entered_at = ts
    state.update((stage, entered_at))
    yield pd.DataFrame({"user_id": [user_id], "stage_reached": [stage]})


def streaming_funnel(stream: DataFrame) -> DataFrame:
    """Per-user funnel progression as a CUSTOM STATEFUL operator:
    built-in streaming aggs can't express "stage k only counts after
    stage k-1's entry time", so the per-user state machine lives in
    ``applyInPandasWithState`` (update mode — each batch re-emits the
    user's current stage). The batch twin is
    ``operators.behavioral.funnel``; parity is pinned in tests."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
