"""Maintained ANN index (llm/ann_index.py): IVF-PQ postings as a
snapshot table riding source appends exactly-once.  The load-bearing
property: encoding is deterministic under the frozen model, so the
index after ANY sequence of incremental refreshes is code-for-code
IDENTICAL to a from-scratch encode of the whole corpus — staleness is
the only recall variable, and fresh=True removes even that."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.llm.ann_index import (
    ann_encode,
    ann_index_create,
    ann_index_info,
    ann_index_refresh,
    ann_index_search,
    _load_model,
    _postings_dir,
)
from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _list_versions,
    _read_manifest,
    read_snapshot,
    snapshot_append,
    snapshot_compact,
    snapshot_delete_where,
    snapshot_merge_into,
)

DIM = 16


def _vecs(spark, lo, hi, seed=7):
    rnd = random.Random(seed)
    rows = []
    for i in range(lo, hi):
        # clustered data: 4 loose clusters so IVF cells mean something
        c = i % 4
        base = [math.sin(c * 5 + j) for j in range(DIM)]
        rows.append(
            (i, [float(b + rnd.gauss(0, 0.15)) for b in base])
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _codes_set(spark, pdir):
    return {
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in read_snapshot(spark, pdir).collect()
    }


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ann")
    src = str(root / "embeddings")
    idx = str(root / "index")
    snapshot_append(_vecs(spark, 0, 400, seed=1).coalesce(2), src)
    ann_index_create(
        spark, src, idx, ncells=8, m=4, k=16, sample=4096, pq_iters=4
    )
    return src, idx


def test_incremental_equals_from_scratch_encode(spark, built):
    src, idx = built
    info0 = ann_index_info(spark, idx)
    assert info0["lag_rows"] == 0 and info0["lag_versions"] == 0
    # two incremental eras
    snapshot_append(_vecs(spark, 400, 520, seed=2).coalesce(1), src)
    ann_index_refresh(spark, idx)
    snapshot_append(_vecs(spark, 520, 600, seed=3).coalesce(1), src)
    info = ann_index_refresh(spark, idx)
    assert info["lag_rows"] == 0 and info["lag_versions"] == 0
    # postings ≡ from-scratch encode of the FULL corpus under the model
    model = _load_model(idx)
    want = {
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in ann_encode(read_snapshot(spark, src), model).collect()
    }
    assert _codes_set(spark, _postings_dir(idx)) == want
    # refresh is idempotent: a replayed call appends nothing
    v = _list_versions(spark, _postings_dir(idx))[-1]
    ann_index_refresh(spark, idx)
    assert _list_versions(spark, _postings_dir(idx))[-1] == v


def test_search_recall_and_staleness_bound(spark, built):
    src, idx = built
    emb = read_snapshot(spark, src)
    # ground truth: brute-force L2 top-k
    q = [float(math.sin(5 + j)) for j in range(DIM)]  # near cluster 1

    def brute(k):
        qcol = F.array(*[F.lit(v) for v in q])
        d = F.expr(
            "aggregate(zip_with(transform(embedding, x -> cast(x as double)),"
            " __q, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x)"
        )
        return [
            r["vec_id"]
            for r in emb.withColumn("__q", qcol)
            .select("vec_id", d.alias("dist"))
            .orderBy("dist", "vec_id")
            .limit(k)
            .collect()
        ]

    want = set(brute(10))
    got = {
        r["vec_id"]
        for r in ann_index_search(
            spark, idx, q, topk=10, nprobe=4, shortlist=100
        ).collect()
    }
    recall = len(got & want) / 10
    assert recall >= 0.8, f"recall@10 {recall}"
    # staleness bound: append NEW vectors sitting exactly at the query
    # point WITHOUT refreshing — fresh=True must surface them anyway
    planted = spark.createDataFrame(
        [(9000 + i, [float(v) for v in q]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    snapshot_append(planted.coalesce(1), src)
    stale = {
        r["vec_id"]
        for r in ann_index_search(spark, idx, q, topk=3, nprobe=4).collect()
    }
    assert not stale & {9000, 9001, 9002}  # stale index can't see them
    fresh = {
        r["vec_id"]
        for r in ann_index_search(
            spark, idx, q, topk=3, nprobe=4, fresh=True
        ).collect()
    }
    assert fresh == {9000, 9001, 9002}
    info = ann_index_info(spark, idx)
    assert info["lag_rows"] == 3
    # refresh catches up; plain search now sees them
    ann_index_refresh(spark, idx)
    caught = {
        r["vec_id"]
        for r in ann_index_search(spark, idx, q, topk=3, nprobe=4).collect()
    }
    assert caught == {9000, 9001, 9002}


def test_postings_compaction_preserves_index(spark, built):
    src, idx = built
    pdir = _postings_dir(idx)
    before = _codes_set(spark, pdir)
    snapshot_compact(spark, pdir, zorder_by=["cell"])
    assert _codes_set(spark, pdir) == before
    # and the txn watermark survived compaction (cursor not amnesia'd)
    v = _list_versions(spark, pdir)[-1]
    ann_index_refresh(spark, idx)  # no-op, not a re-encode
    assert _list_versions(spark, pdir)[-1] == v


def test_create_refuses_double_create(spark, built):
    src, idx = built
    with pytest.raises(ValueError, match="already exists"):
        ann_index_create(spark, src, idx, ncells=4, m=4, k=16)


def test_search_prunes_postings_files_by_cell(spark, tmp_path):
    """Postings are range-clustered by cell at write time, so a probe's
    cell set PLANS a subset of the postings files from the manifest
    (the 100 TB economics: nprobe/ncells of the index scans, not all
    of it)."""
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    snapshot_append(_vecs(spark, 0, 400, seed=5).coalesce(2), src)
    ann_index_create(
        spark, src, idx, ncells=8, m=4, k=16, sample=4096, pq_iters=3
    )
    pdir = _postings_dir(idx)
    all_files = len(read_snapshot(spark, pdir).inputFiles())
    assert all_files >= 2
    # one-cell probe: strictly fewer files than the whole postings set
    one_cell = read_snapshot(spark, pdir, prune={"cell": {0}})
    assert 0 < len(one_cell.inputFiles()) < all_files


def test_fresh_staleness_budget_refuses_then_heals(spark, tmp_path):
    """r14: fresh=True's brute-forced tail is BUDGETED — an oversized
    unindexed tail refuses loudly (naming ann_index_refresh) instead of
    silently degrading every query to a near-full exact scan; after a
    refresh the SAME call succeeds, and max_tail_rows=None opts into
    the cost knowingly."""
    src = str(tmp_path / "embeddings")
    idx = str(tmp_path / "index")
    snapshot_append(_vecs(spark, 0, 200, seed=3).coalesce(1), src)
    ann_index_create(
        spark, src, idx, ncells=4, m=4, k=16, sample=2048, pq_iters=3
    )
    q = [0.0] * DIM
    # plant a tail larger than the budget
    snapshot_append(_vecs(spark, 200, 350, seed=4).coalesce(1), src)
    with pytest.raises(ValueError, match="ann_index_refresh"):
        ann_index_search(
            spark, idx, q, topk=5, fresh=True, max_tail_rows=100
        )
    # opting out of the budget still works (cost accepted knowingly)
    assert ann_index_search(
        spark, idx, q, topk=5, fresh=True, max_tail_rows=None
    ).count() == 5
    # refresh folds the tail into the postings -> same call succeeds
    ann_index_refresh(spark, idx)
    out = ann_index_search(
        spark, idx, q, topk=5, fresh=True, max_tail_rows=100
    )
    assert out.count() == 5
    assert ann_index_info(spark, idx)["lag_rows"] == 0


# ---------------------------------------------------------------------------
# r15: refresh across source TAKEDOWNS (deletes/merges/compactions) — the
# index consumes the file-confined row delta instead of refusing, and the
# incremental postings stay code-for-code identical to a re-created index.
# ---------------------------------------------------------------------------


def _from_scratch(spark, src, idx):
    model = _load_model(idx)
    return {
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in ann_encode(read_snapshot(spark, src), model).collect()
    }


def _mk_index(spark, tmp_path, n=300, seed=11):
    src = str(tmp_path / "embeddings")
    idx = str(tmp_path / "index")
    snapshot_append(_vecs(spark, 0, n, seed=seed).coalesce(2), src)
    ann_index_create(
        spark, src, idx, ncells=4, m=4, k=16, sample=4096, pq_iters=3
    )
    return src, idx


@pytest.mark.parametrize("mode", [False, True, "dv"])
def test_refresh_through_source_delete_all_modes(spark, tmp_path, mode):
    """A takedown in any delete mode (CoW rewrite, predicate-lazy, DV)
    refreshes incrementally: tombstoned ids leave the postings, the
    result equals a from-scratch encode, and search never returns the
    taken-down ids."""
    src, idx = _mk_index(spark, tmp_path)
    pdir = _postings_dir(idx)
    gone = {3, 7, 11, 15}  # cluster-3 ids: vec_id % 4 == 3
    snapshot_delete_where(
        spark, src, "vec_id in (3, 7, 11, 15)", lazy=mode
    )
    info = ann_index_refresh(spark, idx)
    assert info["lag_versions"] == 0 and info["lag_rows"] == 0
    got = _codes_set(spark, pdir)
    assert not {g for (g, _, _) in got} & gone
    assert got == _from_scratch(spark, src, idx)
    # search (stale OR fresh) can't resurrect them
    q = [math.sin(3 * 5 + j) for j in range(DIM)]  # at cluster 3
    hits = {
        r["vec_id"]
        for r in ann_index_search(
            spark, idx, q, topk=20, nprobe=4, fresh=True
        ).collect()
    }
    assert not hits & gone
    # replayed refresh is a no-op (exactly-once)
    v = _list_versions(spark, pdir)[-1]
    ann_index_refresh(spark, idx)
    assert _list_versions(spark, pdir)[-1] == v


def test_refresh_mixed_window_delete_then_append(spark, tmp_path):
    """One window holding a DV takedown AND an append of new rows:
    both consumed in a single refresh, identical to re-created."""
    src, idx = _mk_index(spark, tmp_path)
    snapshot_delete_where(spark, src, "vec_id < 20", lazy="dv")
    snapshot_append(_vecs(spark, 300, 360, seed=12).coalesce(1), src)
    ann_index_refresh(spark, idx)
    got = _codes_set(spark, _postings_dir(idx))
    ids = {g for (g, _, _) in got}
    assert not ids & set(range(20))
    assert set(range(300, 360)) <= ids
    assert got == _from_scratch(spark, src, idx)


def test_refresh_through_update_reencodes_changed(spark, tmp_path):
    """A merge that UPDATES vectors in place re-encodes exactly those
    ids (survivors sharing the rewritten files skip the bytes but stay
    correct — pinned by the from-scratch identity)."""
    src, idx = _mk_index(spark, tmp_path)
    moved = _vecs(spark, 5000, 5004, seed=13).withColumn(
        "vec_id", F.col("vec_id") - 5000 + 40
    ).select("vec_id", "embedding")  # ids 40..43, brand-new vectors
    snapshot_merge_into(moved, src, ["vec_id"], when_matched="update")
    ann_index_refresh(spark, idx)
    assert _codes_set(spark, _postings_dir(idx)) == _from_scratch(
        spark, src, idx
    )


def test_refresh_source_compaction_only_advances_watermark(spark, tmp_path):
    """A compaction-only source window is data-identical: the refresh
    advances the watermark WITHOUT rewriting any postings bytes."""
    src, idx = _mk_index(spark, tmp_path)
    pdir = _postings_dir(idx)
    files_before = _read_manifest(
        spark, pdir, _list_versions(spark, pdir)[-1]
    )["files"]
    snapshot_compact(spark, src)
    info = ann_index_refresh(spark, idx)
    assert info["lag_versions"] == 0
    tip = _read_manifest(spark, pdir, _list_versions(spark, pdir)[-1])
    assert tip["files"] == files_before  # no bytes moved
    assert _codes_set(spark, pdir) == _from_scratch(spark, src, idx)
    # and a second refresh is a no-op
    v = _list_versions(spark, pdir)[-1]
    ann_index_refresh(spark, idx)
    assert _list_versions(spark, pdir)[-1] == v


def test_refresh_compact_plus_delete_window(spark, tmp_path):
    """Compaction AND a delete in the same window: all_compact is
    False, the file diff spans the compacted files, but unchanged
    survivors skip re-encoding and the result still equals re-created."""
    src, idx = _mk_index(spark, tmp_path)
    snapshot_compact(spark, src)
    snapshot_delete_where(spark, src, "vec_id >= 280", lazy=False)
    ann_index_refresh(spark, idx)
    got = _codes_set(spark, _postings_dir(idx))
    assert not {g for (g, _, _) in got if g >= 280}
    assert got == _from_scratch(spark, src, idx)


def test_fresh_search_over_rewritten_tail(spark, tmp_path):
    """fresh=True with a takedown+append tail the index hasn't folded
    yet: new rows surface, deleted rows don't — without a refresh."""
    src, idx = _mk_index(spark, tmp_path, n=200)
    q = [0.5] * DIM
    planted = spark.createDataFrame(
        [(9000 + i, [float(v) for v in q]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    snapshot_delete_where(spark, src, "vec_id in (0, 1)", lazy="dv")
    snapshot_append(planted.coalesce(1), src)
    hits = {
        r["vec_id"]
        for r in ann_index_search(
            spark, idx, q, topk=3, nprobe=4, fresh=True,
            max_tail_rows=None,
        ).collect()
    }
    assert hits == {9000, 9001, 9002}
    # stale (non-fresh) search also can't resurrect deleted ids: the
    # rerank joins against the tip source
    stale = {
        r["vec_id"]
        for r in ann_index_search(
            spark, idx, q, topk=200, nprobe=4, shortlist=500
        ).collect()
    }
    assert not stale & {0, 1}


def test_refresh_recreated_log_refuses_with_guidance(spark, tmp_path):
    """An unreconstructible window (cursor expired / log recreated)
    still refuses loudly, naming ann_index_create."""
    import shutil

    src, idx = _mk_index(spark, tmp_path, n=100)
    shutil.rmtree(src)
    snapshot_append(_vecs(spark, 0, 10, seed=14).coalesce(1), src)
    with pytest.raises(ValueError, match="ann_index_create"):
        ann_index_refresh(spark, idx)
