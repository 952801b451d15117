"""Streaming CDC upsert: a change-feed stream applied to a partitioned
parquet snapshot, one MERGE per micro-batch — the "streaming upsert to
the lakehouse" pattern (Kafka/Debezium feed → continuously-current
table) composed from two existing pieces: Structured Streaming's
``foreachBatch`` and :func:`~mini_project_204721_data_engineering_spark.sources.sink.merge_into`.

Restart semantics: ``foreachBatch`` replays are at-least-once, but the
merge itself is STATE-idempotent — re-applying a batch whose upserts
already landed rewrites identical values (update), and re-applying its
deletes finds no matching keys (``when_not_matched="ignore"`` no-op) —
so a crash at any point between or during the two merges replays to
the same final table with no tombstones, batch-id bookkeeping, or
transaction log (replay-idempotence pinned by calling the batch
function twice in tests/test_streaming.py).

Contract: within one micro-batch, each key appears AT MOST ONCE (the
per-key terminal-state contract of every change feed here; Debezium
compacted topics satisfy it, raw topics need an upstream
``dedup_keep_first`` on offset).  Violations surface loudly via a
cross-op duplicate-key check on the whole batch BEFORE the op split
(``merge_into``'s own in-plan guard only sees one op subset at a time,
so a key appearing as both upsert and delete would otherwise slip
through and resolve by apply order).

Scale shape per batch: one keys-only pass over the target (irreducible
for general MERGE — a CDC key can live in any partition) plus a
rewrite of only the partitions the batch actually touches; every other
partition's files stay byte-identical.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["process_cdc_batch", "cdc_upsert_stream"]


def process_cdc_batch(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    keys: Sequence[str],
    partition_col: str,
    op_col: str = "op",
) -> None:
    """One micro-batch of the streaming MERGE loop (module-level so
    replay idempotence is directly testable): split the feed by op and
    apply upserts (update-or-insert) then deletes (delete-or-ignore) —
    two partition-scoped merges whose order is immaterial because the
    two op sets are disjoint on keys (per-key terminal state)."""
    from mini_project_204721_data_engineering_spark.sources.sink import merge_into

    if batch_df.isEmpty():
        return
    # cross-op duplicate-key check on the WHOLE batch before splitting:
    # merge_into's in-plan guard sees one op subset at a time, so a key
    # appearing once as upsert AND once as delete would pass both guards
    # and the final state would silently depend on the fixed
    # upsert-then-delete apply order.  One aggregate over the (batch-
    # sized) feed closes that hole loudly.
    keys = list(keys)
    dup = (
        batch_df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__cn"))
        .filter(F.col("__cn") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        kv = ", ".join(f"{k}={dup[0][k]!r}" for k in keys)
        raise ValueError(
            f"process_cdc_batch: batch {batch_id} carries the same key "
            f"({kv}) more than once (possibly across ops) — a change "
            "feed must hold one terminal state per key per batch; "
            "dedup_keep_first on offset upstream"
        )
    ups = batch_df.filter(F.col(op_col) == "upsert").drop(op_col)
    dels = batch_df.filter(F.col(op_col) == "delete").drop(op_col)
    merge_into(ups, path, keys, partition_col,
               when_matched="update", when_not_matched="insert")
    merge_into(dels, path, keys, partition_col,
               when_matched="delete", when_not_matched="ignore")


def cdc_upsert_stream(
    changes: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_col: str,
    op_col: str = "op",
):
    """Wire a streaming change feed (rows = new values + an ``op``
    column in {upsert, delete}) into the per-batch MERGE loop.  Returns
    the ``DataStreamWriter`` (caller adds checkpoint/trigger and
    ``.start()``), same contract as the other foreachBatch wrappers."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_cdc_batch(batch_df, batch_id, path, keys, partition_col, op_col)

    return changes.writeStream.outputMode("append").foreachBatch(process_batch)
