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
    read_snapshot,
    snapshot_append,
    snapshot_compact,
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
