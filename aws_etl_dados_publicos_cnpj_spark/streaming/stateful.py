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
