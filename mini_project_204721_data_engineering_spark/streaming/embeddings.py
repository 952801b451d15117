"""Streaming semantic-dedup intake for embedding corpora.

The streaming twin of :func:`~..llm.dedup.incremental_semantic_dedup`,
composed with ``foreachBatch``: each micro-batch of (id, embedding)
rows is assigned against a FIXED quantizer, compared only within-cell
against the parquet-persisted assignment index (all prior vectors,
kept and dropped — the min-id rule needs both), survivors are appended
to the curated store, and the batch's assignments are appended to the
index.  State lives in parquet, not the state store: the comparison
side is the persistent index, so streaming state is zero and restarts
are exactly-once per batch via the checkpointed batch id (writes land
once per epoch; a replayed half-written epoch re-appends — pair with
the idempotent batch-side merge when the sink must be transactional).

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

__all__ = ["dedup_embeddings_stream"]


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
    appended every batch, partitioned by ``cell`` for pruned probes.
    ``kept_path``: parquet of surviving vectors (id, cell, embedding).
    """
    from mini_project_204721_data_engineering_spark.llm.dedup import (
        incremental_semantic_dedup,
    )

    def process_batch(batch_df: DataFrame, _batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        centroids = spark.read.parquet(centroids_path)
        try:  # first batch: no index yet (works on any filesystem/object store)
            index = spark.read.parquet(index_path).select(id_col, "cell", vec_col)
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
        kept = kept.select(id_col, "cell", vec_col).localCheckpoint(eager=True)
        from mini_project_204721_data_engineering_spark.llm.similarity import assign_cells_bcast

        assigned = assign_cells_bcast(batch_df, centroids, id_col, vec_col).select(
            id_col, "cell", vec_col
        )
        # index first: a crash between the writes re-admits the batch to
        # the index (harmless — dup rows dedup on the min-id rule), while
        # the reverse order could keep a vector whose duplicate was lost
        assigned.write.mode("append").partitionBy("cell").parquet(index_path)
        kept.write.mode("append").parquet(kept_path)

    return vecs.writeStream.outputMode("append").foreachBatch(process_batch)

