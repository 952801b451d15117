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

__all__ = ["user_burst_monitor", "user_running_totals", "RunningTotalsProcessor"]

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


# ---- transformWithState (Spark 4 arbitrary-state API) ---------------------


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class RunningTotalsProcessor(StatefulProcessor):
    """``StatefulProcessor`` for :func:`user_running_totals` — per-user
    cumulative (n_events, total_value) in a ``ValueState``, optionally
    with a state TTL so idle users' state self-evicts (the modern
    replacement for hand-rolled timeout bookkeeping).

    Spark 4's ``transformWithStateInPandas`` is the successor API to
    ``applyInPandasWithState``: typed state primitives (value/list/map),
    per-state TTL, timers, and composability — and it REQUIRES the
    RocksDB state store provider, which is what an at-scale deployment
    runs anyway (disk-backed state beyond executor heap).
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events LONG, total_value DOUBLE", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        n, tot = 0, 0.0
        if self._totals.exists():
            prev = self._totals.get()
            n, tot = int(prev[0]), float(prev[1])
        for pdf in rows:
            n += len(pdf)
            tot += float(pdf["value"].sum())
        self._totals.update((n, tot))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [tot]}
        )

    def close(self) -> None:
        pass


def user_running_totals(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Per-user running (count, sum) via ``transformWithStateInPandas``.

    ``ttl_ms`` bounds state lifetime per key: a user idle longer than
    the TTL has their state evicted and restarts from zero — the
    state-bound discipline for high-cardinality key spaces where a
    watermark can't help (state keyed by user, not time).  Requires the
    RocksDB state store (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...RocksDBStateStoreProvider`` before starting the query)."""
    proc = RunningTotalsProcessor(ttl_ms)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType="user_id LONG, n_events LONG, total_value DOUBLE",
        outputMode="Update",
        timeMode="ProcessingTime",
    )
