"""Per-file HLL sketch sidecars → metadata-cost distinct counts
(sources/snapshots.py::snapshot_ndv, ndv_cols= at append/overwrite/
compact) — the NDV rung of the stats family (Iceberg records the same
idea in puffin files).  The load-bearing property: HLL union is
register-wise max, so the estimate merged from per-file sketches
EQUALS the direct whole-data sketch — asserted exactly, not within a
tolerance — while covered files are never re-read (structural
moved-away proof)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _read_manifest,
    expire_snapshots,
    read_snapshot,
    snapshot_append,
    snapshot_clone,
    snapshot_compact,
    snapshot_delete_where,
    snapshot_ndv,
    snapshot_rename_column,
)


def _direct(df, col):
    return int(
        df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg(F.col(col))).alias("e")
        ).collect()[0]["e"]
    )


def _df(spark, lo, hi, mod=137):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % mod).alias("k"),
        F.concat(F.lit("u"), (F.col("id") % 53).cast("string")).alias("s"),
    )


def test_merged_estimate_equals_direct_sketch(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 3000).repartition(4), t, ndv_cols=["k", "s"])
    snapshot_append(_df(spark, 3000, 5000).repartition(2), t)  # sticky
    full = read_snapshot(spark, t)
    for col, true_n in [("k", 137), ("s", 53)]:
        est = snapshot_ndv(spark, t, col)
        assert est == _direct(full, col)
        assert abs(est - true_n) / true_n < 0.05


def test_covered_files_never_reread(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 2000).repartition(3), t, ndv_cols=["k"])
    want = snapshot_ndv(spark, t, "k")
    data_dir = str(tmp_path / "t" / "data")
    shutil.move(data_dir, data_dir + ".hidden")
    try:
        assert snapshot_ndv(spark, t, "k") == want
    finally:
        shutil.move(data_dir + ".hidden", data_dir)


def test_fallback_for_uncovered_and_filtered_files(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 1000).coalesce(1), t, ndv_cols=["k"])
    # a later commit through the sticky spec covers its files too, but
    # a pending takedown invalidates a file's sketch (predates delete)
    snapshot_append(_df(spark, 1000, 2000).coalesce(1), t)
    snapshot_delete_where(spark, t, "k >= 100", lazy=True)
    est = snapshot_ndv(spark, t, "k")
    assert est == _direct(read_snapshot(spark, t), "k")
    assert est == 100  # exact at this cardinality
    # compaction drains the filter and rebuilds sketches for the packed
    # output (sticky): covered again, merged == direct still holds
    snapshot_compact(spark, t)
    assert snapshot_ndv(spark, t, "k") == 100
    m = _read_manifest(spark, t, 4)
    covered = {f for e in m["ndv"]["entries"] for f in e["files"]}
    assert set(m["files"]) <= covered


def test_rename_strips_then_compact_recovers(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 1000).repartition(2), t, ndv_cols=["k"])
    snapshot_rename_column(spark, t, "k", "kk")
    m = _read_manifest(spark, t, 2)
    assert m["ndv"]["cols"] == ["kk"]  # sticky follows the rename
    assert not m["ndv"].get("entries")  # entries stripped (build-name rows)
    assert snapshot_ndv(spark, t, "kk") == 137  # fallback scan, correct
    snapshot_compact(spark, t)
    m2 = _read_manifest(spark, t, 3)
    assert any("kk" in e["cols"] for e in m2["ndv"]["entries"])
    assert snapshot_ndv(spark, t, "kk") == 137


def test_clone_copies_sidecars_and_expire_gcs(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 500).coalesce(1), t, ndv_cols=["k"])
    c = str(tmp_path / "c")
    snapshot_clone(spark, t, c)
    mc = _read_manifest(spark, c, 1)
    assert all(
        e["sidecar"].startswith("file:" + c) or c in e["sidecar"]
        for e in mc["ndv"]["entries"]
    )
    assert snapshot_ndv(spark, c, "k") == 137
    # expire: replacing all files strands the old sketch sidecar
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_overwrite,
    )

    snapshot_overwrite(_df(spark, 0, 100), t, ndv_cols=["k"])
    got = expire_snapshots(spark, t, keep_last=1, orphan_min_age_seconds=0.0)
    assert got["deleted_ndv_sidecars"] == 1
    assert snapshot_ndv(spark, t, "k") == 100


def test_narrow_int_columns_sketch_through_bigint(spark, tmp_path):
    """hll_sketch_agg rejects tinyint/smallint outright — the build and
    the fallback both cast the int chain to bigint, so narrow keys work
    AND keep their hash identity across a later widening."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_widen_column,
    )

    t = str(tmp_path / "t")
    df = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 91).cast("smallint").alias("k")
    )
    snapshot_append(df.repartition(2), t, ndv_cols=["k"])
    assert snapshot_ndv(spark, t, "k") == 91
    # widen: old sketches (built at bigint width) merge with new ones
    snapshot_widen_column(spark, t, "k", "int")
    snapshot_append(
        spark.range(300, 400).select(
            F.col("id"), (F.col("id") % 91 + 91).cast("int").alias("k")
        ).coalesce(1),
        t,
    )
    assert snapshot_ndv(spark, t, "k") == _direct(read_snapshot(spark, t), "k")


def test_refusals_and_empty(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(0, 10).select(
        F.col("id"), F.col("id").cast("double").alias("d")
    )
    with pytest.raises(ValueError, match="integral or string"):
        snapshot_append(df, t, ndv_cols=["d"])
    with pytest.raises(ValueError, match="not in the written schema"):
        snapshot_append(df, t, ndv_cols=["zz"])
    snapshot_append(df.limit(0).coalesce(1), t, ndv_cols=["id"])
    assert snapshot_ndv(spark, t, "id") == 0
