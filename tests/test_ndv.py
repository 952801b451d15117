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


# ---------------------------------------------------------------------------
# grouped NDV through snapshot_agg (aggs={"u": "approx_ndv(col)"})
# ---------------------------------------------------------------------------


def _grouped_direct(df, gcol, col):
    """Ground truth: per-group estimate from direct whole-group
    sketching (the number a user would get without the sidecars)."""
    return {
        r[gcol]: int(r["e"])
        for r in df.groupBy(gcol)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg(F.col(col))).alias("e"))
        .collect()
    }


def _day_df(spark, day, lo, hi, umod):
    return spark.range(lo, hi).select(
        F.col("id"),
        F.lit(day).cast("date").alias("day"),
        (F.col("id") % umod).alias("user_id"),
    )


def test_snapshot_agg_grouped_ndv_equals_direct(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_agg,
    )

    t = str(tmp_path / "t")
    for i, day in enumerate(["2024-01-01", "2024-01-02", "2024-01-03"]):
        snapshot_append(
            _day_df(spark, day, i * 1000, (i + 1) * 1000, 37 + i).coalesce(1),
            t,
            stats_cols=["day", "user_id"],
            ndv_cols=["user_id"],
        )
    full = read_snapshot(spark, t)
    want = _grouped_direct(full, "day", "user_id")
    got = snapshot_agg(
        spark, t, {"u": "approx_ndv(user_id)", "n": "count(*)"},
        group_by="day",
    )
    assert {k: v["u"] for k, v in got.items()} == want
    assert {k: v["n"] for k, v in got.items()} == {
        r["day"]: r["n"]
        for r in full.groupBy("day").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_snapshot_agg_grouped_ndv_moved_data_away(spark, tmp_path):
    """Structural proof: with every sidecar-covered data file MOVED,
    the grouped estimate still answers — sketches, not scans."""
    import os

    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_agg,
    )

    t = str(tmp_path / "t")
    for i, day in enumerate(["2024-01-01", "2024-01-02"]):
        snapshot_append(
            _day_df(spark, day, i * 500, (i + 1) * 500, 29).coalesce(1),
            t,
            stats_cols=["day"],
            ndv_cols=["user_id"],
        )
    want = _grouped_direct(read_snapshot(spark, t), "day", "user_id")
    data_dir = os.path.join(t, "data")
    hidden = os.path.join(str(tmp_path), "hidden")
    shutil.move(data_dir, hidden)
    try:
        got = snapshot_agg(
            spark, t, {"u": "approx_ndv(user_id)"}, group_by="day"
        )
    finally:
        shutil.move(hidden, data_dir)
    assert {k: v["u"] for k, v in got.items()} == want


def test_snapshot_agg_ndv_fallback_exactness(spark, tmp_path):
    """Files without a sketch (pre-ndv_cols commits) and files under a
    pending merge-on-read takedown fall back to the one scan; the
    merged estimate still equals direct whole-group sketching of the
    VISIBLE rows."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_agg,
    )

    t = str(tmp_path / "t")
    snapshot_append(
        _day_df(spark, "2024-01-01", 0, 600, 31).coalesce(1),
        t, stats_cols=["day"],
    )  # no sketches yet
    snapshot_append(
        _day_df(spark, "2024-01-02", 600, 1200, 41).coalesce(1),
        t, ndv_cols=["user_id"],
    )
    snapshot_append(
        _day_df(spark, "2024-01-03", 1200, 1800, 23).coalesce(1), t
    )
    # lazy takedown makes day-3's sketch stale — must be ignored
    snapshot_delete_where(
        spark, t, "day = DATE '2024-01-03' AND user_id >= 10", lazy=True
    )
    full = read_snapshot(spark, t)
    want = _grouped_direct(full, "day", "user_id")
    got = snapshot_agg(spark, t, {"u": "approx_ndv(user_id)"}, group_by="day")
    assert {k: v["u"] for k, v in got.items()} == want


def test_snapshot_agg_ndv_where_and_ungrouped(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_agg, snapshot_ndv,
    )

    t = str(tmp_path / "t")
    for i, day in enumerate(["2024-01-01", "2024-01-02", "2024-01-03"]):
        snapshot_append(
            _day_df(spark, day, i * 700, (i + 1) * 700, 43).coalesce(1),
            t, stats_cols=["day", "user_id"], ndv_cols=["user_id"],
        )
    full = read_snapshot(spark, t)
    # ungrouped == snapshot_ndv
    got = snapshot_agg(spark, t, {"u": "approx_ndv(user_id)"})
    assert got["u"] == snapshot_ndv(spark, t, "user_id")
    # where= covering exactly one file: the filtered distinct count
    pred = "day = DATE '2024-01-02'"
    got = snapshot_agg(spark, t, {"u": "approx_ndv(user_id)"}, where=pred)
    want = int(
        full.filter(pred)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")))
        .collect()[0][0]
    )
    assert got["u"] == want
    # where= CUTTING a file: boundary scan sketch, still exact vs direct
    pred = "user_id < 20"
    got = snapshot_agg(spark, t, {"u": "approx_ndv(user_id)"}, where=pred)
    want = int(
        full.filter(pred)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")))
        .collect()[0][0]
    )
    assert got["u"] == want


def test_snapshot_agg_ndv_refusals_and_empty(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_agg,
    )

    t = str(tmp_path / "t")
    snapshot_append(
        spark.range(10).select(
            F.col("id"), (F.col("id") * 0.5).alias("v")
        ).coalesce(1),
        t,
    )
    with pytest.raises(ValueError, match="integral or string"):
        snapshot_agg(spark, t, {"u": "approx_ndv(v)"})
    with pytest.raises(ValueError, match="is not an aggregate"):
        snapshot_agg(spark, t, {"u": "approx_ndv(*)"})
    # empty table answers 0 (ungrouped) / {} (grouped)
    e = str(tmp_path / "e")
    snapshot_append(
        spark.range(0).select(F.col("id")).coalesce(1), e
    )
    assert snapshot_agg(spark, e, {"u": "approx_ndv(id)"}) == {"u": 0}
    assert snapshot_agg(spark, e, {"u": "approx_ndv(id)"}, group_by="id") == {}
