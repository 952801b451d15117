"""Streaming semantic-dedup intake for embedding corpora.

The streaming twin of :func:`~..llm.dedup.incremental_semantic_dedup`,
composed with ``foreachBatch``: each micro-batch of (id, embedding)
rows is assigned against a FIXED quantizer, compared only within-cell
against the parquet-persisted assignment index (all prior vectors,
kept and dropped — the min-id rule needs both), survivors are appended
to the curated store, and the batch's assignments are appended to the
index.  State lives in parquet, not the state store: the comparison
side is the persistent index, so streaming state is zero.  Restart
semantics are EFFECTIVELY exactly-once: ``foreachBatch`` replays are
at-least-once, so each batch writes its own ``batch=<id>/``
subdirectory in OVERWRITE mode — a replayed half-written epoch
rewrites the same directories with identical content (the batch's rows
come from checkpointed source offsets, and recomputing the kept set
against an index that already holds the batch's own assignments is a
no-op under the ``id_b < id_a`` rule), so duplicate rows cannot
survive a crash at any point between or during the two writes
(replay-idempotence is pinned by calling the batch function twice in
tests/test_streaming.py).

Scale shape per batch: |batch|·(k) assignment flops + an equi-join of
the batch's cells against the index partition-pruned on ``cell`` (the
index is written partitioned by cell, so a batch touching c cells reads
only those partitions).  The historical corpus is never re-assigned
and never self-joined — identical to the batch form, proven ≡
from-scratch under the append-only invariants in tests/test_llm.py;
the stream ≡ batch twin is tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["dedup_embeddings_stream", "process_embedding_batch"]


def process_embedding_batch(
    batch_df: DataFrame,
    batch_id: int,
    centroids_path: str,
    index_path: str,
    kept_path: str,
    threshold: float = 0.40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One epoch of the streaming dedup loop (module-level so replay
    idempotence is directly testable): dedup the batch against the
    persisted index, then overwrite this batch's own ``batch=<id>/``
    directories under the index and kept stores."""
    from pyspark.errors import AnalysisException

    from mini_project_204721_data_engineering_spark.llm.dedup import (
        incremental_semantic_dedup,
    )

    from pyspark.sql import functions as F

    from mini_project_204721_data_engineering_spark.llm.similarity import (
        assign_cells_bcast,
    )

    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        return
    centroids = spark.read.parquet(centroids_path)
    assigned = assign_cells_bcast(batch_df, centroids, id_col, vec_col).select(
        id_col, "cell", vec_col
    )
    # STATIC partition pruning: the batch's distinct cells (bounded by
    # ncells — a quantizer-sized collect by contract) filter the index
    # on its partition column at planning time, so a batch touching c
    # cells reads only those partitions without relying on a dynamic-
    # pruning subquery.
    batch_cells = [r["cell"] for r in assigned.select("cell").distinct().collect()]
    try:  # first batch: no index yet (works on any filesystem/object store)
        index = (
            spark.read.parquet(index_path)
            .filter(F.col("cell").isin(batch_cells))
            .select(id_col, "cell", vec_col)
        )
    except AnalysisException:
        index = None
    if index is not None:
        kept = incremental_semantic_dedup(
            batch_df, index, centroids, threshold, id_col, vec_col
        )
    else:
        from mini_project_204721_data_engineering_spark.llm.dedup import semantic_dedup

        kept = semantic_dedup(
            batch_df, threshold, id_col=id_col, vec_col=vec_col, centroids=centroids
        )
    kept = kept.select(id_col, "cell", vec_col)
    # the static isin-prune above already fixes the partition set, so
    # dynamic partition pruning adds nothing — and its subquery eval is
    # unreliable when the batch function runs outside a streaming
    # microbatch (InSubqueryExec "has not finished" on direct calls),
    # so disable it for the two writes and restore after
    dpp_key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    dpp_prev = spark.conf.get(dpp_key, "true")
    spark.conf.set(dpp_key, "false")
    # per-batch subdirectories in overwrite mode make replays
    # idempotent: a crash at ANY point replays the batch and rewrites
    # the same batch=<id>/ dirs with identical content.  Kept first:
    # its plan reads the index, so executing it before the index write
    # sees exactly the pre-batch index state (no lineage checkpoint
    # needed); if only the kept write lands, the replay recomputes
    # against the same pre-batch index (identical), and if both land,
    # recomputing against an index holding the batch's own assignments
    # is a no-op under the id_b < id_a rule.
    try:
        kept.write.mode("overwrite").parquet(f"{kept_path}/batch={batch_id}")
        assigned.write.mode("overwrite").partitionBy("cell").parquet(
            f"{index_path}/batch={batch_id}"
        )
    finally:
        spark.conf.set(dpp_key, dpp_prev)


def dedup_embeddings_stream(
    vecs: DataFrame,
    centroids_path: str,
    index_path: str,
    kept_path: str,
    threshold: float = 0.40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Wire a streaming embeddings DataFrame into the incremental
    semantic-dedup loop.  Returns the ``DataStreamWriter`` (caller adds
    checkpoint/trigger and ``.start()``).

    ``centroids_path``: parquet (cell, cv) of the fixed quantizer —
    quantizers must not drift mid-stream or cell-locality breaks; to
    re-quantize, stop, re-assign the index offline, resume.
    ``index_path``: parquet assignment index (id, cell, embedding),
    one ``batch=<id>/`` directory per epoch (idempotent overwrite on
    replay), partitioned by ``cell`` within each batch for pruned
    probes.
    ``kept_path``: parquet of surviving vectors (id, cell, embedding),
    same per-batch directory layout.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_embedding_batch(
            batch_df, batch_id, centroids_path, index_path, kept_path,
            threshold, id_col, vec_col,
        )

    return vecs.writeStream.outputMode("append").foreachBatch(process_batch)
