"""ANN index as a MAINTAINED snapshot table — IVF-PQ that rides ingest.

:func:`~.pq.ivfpq_build` rebuilds codebooks+postings per call; at corpus
scale the index must persist and follow appends.  Here the index IS a
lakehouse object:

- ``<index_dir>/postings`` — a snapshot table ``(id, cell, codes)``
  with ``stats_cols=["cell"]`` (cell-range file pruning for probes;
  ``snapshot_compact(zorder_by=["cell"])`` is the layout-maintenance
  pass that makes the pruning sharp after many append eras);
- ``<index_dir>/model.json`` — the FROZEN quantizer: coarse centroids +
  PQ codebooks + geometry, written once at :func:`ann_index_create`
  (training data = the corpus at creation; an index whose corpus has
  drifted far from the training distribution should be re-created —
  the FAISS operational contract).

Incremental maintenance is EXACTLY-ONCE by construction: the refresh
tails the source snapshot table with the incremental cursor
(:func:`~..sources.snapshots.snapshot_incremental_read`) and lands the
encoded postings through :func:`~..sources.snapshots.snapshot_txn_append`
with the SOURCE VERSION as the batch id — the cursor lives in the
postings table's own txn watermark, so a crashed or replayed refresh
can never double-encode a window (the Delta txn appId/version idea,
already race-pinned in the snapshot suite).

Because the quantizer is frozen and encoding is deterministic
(:func:`ann_encode`: rounded-cosine argmax cell with id tiebreak,
argmin-by-index PQ codes), the postings after ANY sequence of
incremental refreshes are IDENTICAL to a from-scratch encode of the
whole corpus under the same model — pytest-pinned, and the property
that makes staleness the ONLY recall variable.

Staleness-bounded search: :func:`ann_index_search` answers from the
index (probed ADC + exact rerank) and, with ``fresh=True``, UNIONS an
exact brute-force pass over just the NOT-YET-INDEXED tail (incremental
window behind the source tip) — so recall never degrades below the
indexed-corpus recall no matter how stale the index is, at tail-sized
extra cost.  :func:`ann_index_info` prices that decision
(``lag_versions``/``lag_rows``)."""

from __future__ import annotations

import json
import os
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _list_versions,
    _read_manifest,
    read_snapshot,
    snapshot_incremental_read,
    snapshot_txn_append,
)

__all__ = [
    "ann_index_create",
    "ann_index_refresh",
    "ann_index_search",
    "ann_index_info",
    "ann_encode",
]

_APP_ID = "ann-index"


def _postings_dir(index_dir: str) -> str:
    return os.path.join(str(index_dir), "postings")


def _model_path(index_dir: str) -> str:
    return os.path.join(str(index_dir), "model.json")


def _load_model(index_dir: str) -> dict:
    with open(_model_path(index_dir), "rb") as f:
        return json.loads(f.read().decode("utf-8"))


def ann_encode(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors under a FROZEN model → ``(id, codes, cell)``.
    Deterministic (rounded-cosine cell argmax with cell-id tiebreak;
    PQ argmin ties break on centroid index), so incremental and
    from-scratch encodes agree code-for-code."""
    from mini_project_204721_data_engineering_spark.llm.pq import pq_encode
    from mini_project_204721_data_engineering_spark.llm.similarity import (
        assign_cells_bcast,
    )

    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(model["centroids"])], ["cell", "cv"]
    ).select(
        "cell", F.expr("transform(cv, x -> cast(x AS double))").alias("cv")
    )
    assigned = assign_cells_bcast(df, cent_df, id_col=id_col, vec_col=vec_col)
    resid = assigned.join(F.broadcast(cent_df), "cell").select(
        id_col,
        "cell",
        F.expr(
            f"zip_with(transform({vec_col}, x -> cast(x as double)), cv, "
            "(a, b) -> a - b)"
        ).alias("__resid"),
    )
    codes = pq_encode(
        resid.select(id_col, "cell", "__resid"),
        model["codebooks"],
        id_col=id_col,
        vec_col="__resid",
    )
    return codes.join(resid.select(id_col, "cell"), id_col)


def ann_index_create(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    ncells: int = 16,
    m: int = 8,
    k: int = 256,
    kmeans_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 65536,
    pq_iters: int = 10,
) -> dict:
    """Train the quantizer on the source snapshot table's CURRENT
    content, freeze it to ``model.json``, and commit the initial
    postings with the source version as the txn watermark."""
    from mini_project_204721_data_engineering_spark.llm.pq import (
        ivfpq_build,
        pq_train,
    )
    from mini_project_204721_data_engineering_spark.llm.similarity import (
        kmeans_assign,
    )

    if os.path.exists(_model_path(index_dir)):
        # refuse BEFORE training: the quantizer fit is corpus-scale work
        raise ValueError(f"index already exists at {index_dir}")
    versions = _list_versions(spark, source_dir)
    if not versions:
        raise ValueError(f"no snapshots at {source_dir}")
    src_version = versions[-1]
    emb = read_snapshot(spark, source_dir, version=src_version)
    # train the model exactly as ivfpq_build does, but ENCODE through
    # ann_encode so create/refresh/from-scratch share one deterministic
    # code path (ivfpq_build's own codes come from the last Lloyd
    # assignment, whose means moved after it — not re-derivable from
    # the frozen centroids)
    assigned = kmeans_assign(
        emb, ncells=ncells, iters=kmeans_iters, id_col=id_col, vec_col=vec_col
    )
    cent_rows = (
        assigned.select("cell", F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.avg("x").alias("cx"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cx"))).alias("pc"))
        .select("cell", F.expr("transform(pc, s -> s.cx)").alias("cv"))
        .collect()
    )
    cents = {r["cell"]: [float(v) for v in r["cv"]] for r in cent_rows}
    centroids = [cents[c] for c in sorted(cents)]
    cent_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(centroids)], ["cell", "cv"]
    ).select(
        "cell", F.expr("transform(cv, x -> cast(x AS double))").alias("cv")
    )
    from mini_project_204721_data_engineering_spark.llm.similarity import (
        assign_cells_bcast,
    )

    resid = (
        assign_cells_bcast(emb, cent_df, id_col=id_col, vec_col=vec_col)
        .join(F.broadcast(cent_df), "cell")
        .select(
            id_col,
            F.expr(
                f"zip_with(transform({vec_col}, x -> cast(x as double)), cv, "
                "(a, b) -> a - b)"
            ).alias("__resid"),
        )
    )
    codebooks = pq_train(
        resid, m=m, k=k, id_col=id_col, vec_col="__resid",
        sample=sample, iters=pq_iters,
    )
    model = {
        "centroids": centroids,
        "codebooks": codebooks,
        "ncells": ncells,
        "m": m,
        "k": k,
        "id_col": id_col,
        "vec_col": vec_col,
        "source_dir": str(source_dir),
    }
    os.makedirs(str(index_dir), exist_ok=True)
    with open(_model_path(index_dir), "w") as f:
        json.dump(model, f)
    codes = ann_encode(emb, model, id_col=id_col, vec_col=vec_col)
    snapshot_txn_append(
        # range-cluster by cell so the manifest's cell stats actually
        # PRUNE at search time: an nprobe-cell probe plans ~nprobe/ncells
        # of the postings files instead of all of them (appends that
        # mixed every cell into every file would make the stats vacuous)
        codes.select(id_col, "cell", "codes").repartitionByRange(
            max(2, int(ncells) // 2), "cell"
        ),
        _postings_dir(index_dir),
        _APP_ID,
        src_version,
        stats_cols=["cell"],  # probe-set file pruning; sticky for refreshes
    )
    return ann_index_info(spark, index_dir)


def ann_index_refresh(spark: SparkSession, index_dir: str) -> dict:
    """Encode the source rows landed since the last refresh and append
    them — exactly-once (source version as txn batch id), no-op when
    the index is current.  Append-only sources only, like the cursor it
    rides; a rewritten source (delete/compact) raises — re-create the
    index (quantizer retraining is due at that point anyway)."""
    model = _load_model(index_dir)
    pdir = _postings_dir(index_dir)
    versions = _list_versions(spark, pdir)
    tip = _read_manifest(spark, pdir, versions[-1])
    cursor = int(tip.get("txn", {}).get(_APP_ID, -1))
    if cursor < 0:
        raise ValueError(f"postings at {pdir} carry no {_APP_ID} watermark")
    df, new_version = snapshot_incremental_read(
        spark, model["source_dir"], cursor
    )
    if df is None:
        return ann_index_info(spark, index_dir)
    codes = ann_encode(
        df, model, id_col=model["id_col"], vec_col=model["vec_col"]
    )
    snapshot_txn_append(
        # cell-cluster each refresh batch too (fewer ranges — batches
        # are small; zorder/compact converges layout across eras)
        codes.select(model["id_col"], "cell", "codes").repartitionByRange(
            2, "cell"
        ),
        pdir,
        _APP_ID,
        new_version,
    )
    return ann_index_info(spark, index_dir)


def ann_index_info(spark: SparkSession, index_dir: str) -> dict:
    """Staleness report: how far the index trails its source, in
    versions AND rows (the price of ``fresh=True`` at the next
    search)."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_count,
    )

    model = _load_model(index_dir)
    pdir = _postings_dir(index_dir)
    tip = _read_manifest(spark, pdir, _list_versions(spark, pdir)[-1])
    cursor = int(tip.get("txn", {}).get(_APP_ID, -1))
    src_tip = _list_versions(spark, model["source_dir"])[-1]
    indexed_rows = snapshot_count(spark, pdir)
    src_rows = snapshot_count(spark, model["source_dir"])
    return {
        "indexed_source_version": cursor,
        "source_version": src_tip,
        "lag_versions": src_tip - cursor,
        "indexed_rows": indexed_rows,
        "source_rows": src_rows,
        "lag_rows": src_rows - indexed_rows,
    }


def ann_index_search(
    spark: SparkSession,
    index_dir: str,
    query: list,
    topk: int = 10,
    nprobe: int = 4,
    shortlist: int = 100,
    fresh: bool = False,
    max_tail_rows: int | None = 100_000,
) -> DataFrame:
    """Search the maintained index: probed ADC over the postings
    snapshot (cell-set file pruning via the manifest before the scan
    plan exists) → exact rerank of the shortlist against the source
    embeddings.  ``fresh=True`` additionally brute-forces the
    NOT-YET-INDEXED source tail exactly, so index staleness can only
    add candidates, never lose them.  Returns ``(id, dist)`` ascending
    L2, id tiebreak.

    ``max_tail_rows`` is the STALENESS BUDGET on that fresh tail: the
    unindexed rows are brute-force scanned per query, so a refresh
    loop that falls far behind would silently turn every "fresh"
    search into a near-full-corpus exact scan.  When the tail (counted
    from manifests — no job) exceeds the budget, the search REFUSES
    and names :func:`ann_index_refresh` instead of degrading; pass
    ``max_tail_rows=None`` to accept any tail knowingly."""
    import numpy as np

    from mini_project_204721_data_engineering_spark.llm.pq import (
        _exact_rerank,
        ivfpq_search,
    )

    model = _load_model(index_dir)
    pdir = _postings_dir(index_dir)
    id_col, vec_col = model["id_col"], model["vec_col"]
    q = np.asarray(query, dtype=np.float64)
    cents = np.asarray(model["centroids"], dtype=np.float64)
    d2 = ((cents - q[None, :]) ** 2).sum(axis=1)
    order = np.lexsort((np.arange(len(d2)), d2))
    probed = {int(c) for c in order[: max(1, int(nprobe))]}
    # resolve the postings tip ONCE and pin both the probe scan and the
    # freshness cursor to it: reading the cursor from a LATER tip (a
    # concurrent refresh landed in between) would drop that refresh's
    # rows from the probe set AND from the fresh tail — a silent recall
    # hole the staleness bound exists to prevent
    tip_version = _list_versions(spark, pdir)[-1]
    tip_manifest = _read_manifest(spark, pdir, tip_version)
    cursor = int(tip_manifest.get("txn", {}).get(_APP_ID, -1))
    codes_df = read_snapshot(
        spark, pdir, version=tip_version, prune={"cell": probed}
    )
    cand = ivfpq_search(
        codes_df, query, model["centroids"], model["codebooks"],
        topk=int(shortlist), nprobe=nprobe, id_col=id_col,
    ).select(id_col)
    emb = read_snapshot(spark, model["source_dir"])
    if fresh:
        if max_tail_rows is not None:
            lag = _tail_rows(spark, model["source_dir"], cursor)
            if lag > max_tail_rows:
                raise ValueError(
                    f"ann_index_search(fresh=True): the unindexed source "
                    f"tail is {lag} rows (> max_tail_rows={max_tail_rows}) "
                    "— a brute-force scan that size per query is no "
                    "longer an index; run ann_index_refresh(spark, "
                    "index_dir) to fold the tail into the postings, or "
                    "pass max_tail_rows=None to accept the cost knowingly"
                )
        tail, _ = snapshot_incremental_read(
            spark, model["source_dir"], cursor
        )
        if tail is not None:
            cand = cand.unionByName(tail.select(id_col)).distinct()
    return _exact_rerank(emb, cand, query, topk, id_col, vec_col)


def _tail_rows(spark: SparkSession, source_dir: str, cursor: int) -> int:
    """Rows appended to the source since ``cursor`` — counted from
    manifest ``file_meta`` alone (no Spark job; the same metadata the
    incremental read will walk).  Files without recorded row counts
    (pre-file_meta commits) count as unknown-but-nonzero via their
    presence; missing meta degrades to a conservative snapshot_count
    diff rather than underestimating the budget."""
    versions = _list_versions(spark, source_dir)
    lag_vs = [v for v in versions if v > cursor]
    if not lag_vs:
        return 0
    prev = (
        set(_read_manifest(spark, source_dir, cursor)["files"])
        if cursor in versions
        else set()
    )
    total = 0
    complete = True
    for v in lag_vs:
        m = _read_manifest(spark, source_dir, v)
        meta = m.get("file_meta", {})
        for f in set(m["files"]) - prev:
            rows = (meta.get(f) or {}).get("rows")
            if rows is None:
                complete = False
            else:
                total += int(rows)
        prev = set(m["files"])
    if complete:
        return total
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_count,
    )

    tip_rows = snapshot_count(spark, source_dir)
    at_cursor = (
        snapshot_count(spark, source_dir, version=cursor)
        if cursor in versions
        else 0
    )
    return max(total, tip_rows - at_cursor)
