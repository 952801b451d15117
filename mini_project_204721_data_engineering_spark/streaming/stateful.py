"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed aggregations can't express — here a
per-user *burst monitor*: maintains a running event count and the max
events seen in any single micro-batch, emitting an updated row per user
per batch.  The state is a tiny fixed-size tuple per key; with
``GroupStateTimeout.NoTimeout`` it lives for the stream's lifetime, so
production use should bound keys (or use event-time timeout) — noted
because unbounded state is the classic stateful-streaming scale trap.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["user_burst_monitor"]

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
        StructField("max_batch_events", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("total", LongType()),
        StructField("max_batch", LongType()),
    ]
)


def _update(
    key: tuple[Any, ...], batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_batch = 0
    for pdf in batches:
        n_batch += len(pdf)
    total, max_batch = state.get if state.exists else (0, 0)
    total += n_batch
    max_batch = max(max_batch, n_batch)
    state.update((total, max_batch))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_events": [total], "max_batch_events": [max_batch]}
    )


def user_burst_monitor(events: DataFrame) -> DataFrame:
    """Per-user running totals + per-batch burst maximum (stateful)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
