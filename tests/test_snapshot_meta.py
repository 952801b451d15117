"""Metadata-only aggregates over the snapshot log (sources/snapshots.py
file_meta): per-file row/byte counts recorded at every commit feed
snapshot_count / snapshot_min_max — the reference's hottest serving
shapes (pagination COUNT(*) `backend/app/main.py:266-269`, date-limit
min/max `:668-676`) answered WITHOUT opening a data file — plus
snapshot_plan_info's byte-priced planning probe and size-aware
compaction.  The structural proof that no data is read: the data
directory is physically MOVED AWAY and the metadata paths still
answer."""

from __future__ import annotations

import datetime
import os
import shutil

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _read_manifest,
    read_snapshot,
    snapshot_append,
    snapshot_clone,
    snapshot_compact,
    snapshot_count,
    snapshot_delete_where,
    snapshot_merge_into,
    snapshot_min_max,
    snapshot_overwrite,
    snapshot_plan_info,
    snapshot_restore,
)


def _df(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(F.col("id"), F.lit(tag).alias("tag"))


def _scan_count(spark, t, **kw):
    return read_snapshot(spark, t, **kw).count()


def _scan_min_max(spark, t, col, **kw):
    r = read_snapshot(spark, t, **kw).agg(
        F.min(col).alias("mn"), F.max(col).alias("mx")
    ).collect()[0]
    return (r["mn"], r["mx"])


def test_snapshot_files_inventory_is_pure_metadata(spark, tmp_path):
    """snapshot_files: per-file rows/bytes/stats/pending-filter/bloom
    inventory with zero Spark jobs — proven by moving the data away."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_files,
    )

    t = str(tmp_path / "t")
    snapshot_append(
        _df(spark, 0, 40).repartition(2), t, stats_cols=["id"]
    )
    snapshot_delete_where(spark, t, "id = 3", lazy=True)
    inv = snapshot_files(spark, t)
    assert len(inv) == 2
    assert sum(e["rows"] for e in inv) == 40
    assert all(e["bytes"] > 0 and e["stats"]["id"] for e in inv)
    covered = [e for e in inv if e["pending_predicates"]]
    assert covered and covered[0]["pending_predicates"] == ["id = 3"]
    # version travel sees the pre-delete state
    assert all(
        not e["pending_predicates"] for e in snapshot_files(spark, t, version=1)
    )
    data_dir = str(tmp_path / "t" / "data")
    shutil.move(data_dir, data_dir + ".hidden")
    try:
        assert snapshot_files(spark, t) == inv  # no data touched
    finally:
        shutil.move(data_dir + ".hidden", data_dir)


def test_every_commit_records_rows_and_bytes(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 40).repartition(2), t)
    m = _read_manifest(spark, t, 1)
    assert set(m["file_meta"]) == set(m["files"])
    assert sum(e["rows"] for e in m["file_meta"].values()) == 40
    assert all(e["bytes"] > 0 for e in m["file_meta"].values())
    # carried files inherit their meta without a rescan; new files add
    snapshot_append(_df(spark, 40, 50).repartition(1), t)
    m2 = _read_manifest(spark, t, 2)
    assert set(m2["file_meta"]) == set(m2["files"])
    for f in m["files"]:
        assert m2["file_meta"][f] == m["file_meta"][f]
    assert sum(e["rows"] for e in m2["file_meta"].values()) == 50


@pytest.mark.parametrize("lazy_mode", [False, True, "dv"])
def test_count_and_min_max_equal_full_scan_across_history(
    spark, tmp_path, lazy_mode
):
    """count/min/max ≡ the full scan at every step of an
    append → delete → compact → restore history, in all three delete
    modes (CoW rewrites meta, lazy/dv trigger the MoR scan fallback)."""
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 50).repartition(2), t, stats_cols=["id"])
    snapshot_append(_df(spark, 50, 80).repartition(1), t)

    def check():
        assert snapshot_count(spark, t) == _scan_count(spark, t)
        assert snapshot_min_max(spark, t, "id") == _scan_min_max(spark, t, "id")

    check()
    snapshot_delete_where(spark, t, "id % 7 = 0", lazy=lazy_mode)
    check()
    snapshot_delete_where(spark, t, "id >= 75", lazy=lazy_mode)
    check()
    snapshot_compact(spark, t)
    check()
    snapshot_restore(spark, t, 2)
    check()
    # overwrite and merge refresh the meta wholesale
    snapshot_overwrite(_df(spark, 5, 25, "ow"), t, stats_cols=["id"])
    check()
    snapshot_merge_into(_df(spark, 20, 30, "mg"), t, ["id"])
    check()


def test_clean_count_and_min_max_read_zero_data_files(spark, tmp_path):
    """THE structural property: with no pending filters, count and
    min/max never open a data file — proven by physically moving the
    data directory away."""
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 60).repartition(3), t, stats_cols=["id"])
    snapshot_append(_df(spark, 60, 90).repartition(2), t)
    data_dir = str(tmp_path / "t" / "data")
    shutil.move(data_dir, data_dir + ".hidden")
    try:
        assert snapshot_count(spark, t) == 90
        assert snapshot_min_max(spark, t, "id") == (0, 89)
        info = snapshot_plan_info(spark, t, "id < 10")
        assert info["rows_total"] == 90 and info["meta_unknown_files"] == 0
    finally:
        shutil.move(data_dir + ".hidden", data_dir)


def test_mor_fallback_scans_only_covered_files(spark, tmp_path):
    """After a one-file takedown, the count scans exactly the covered
    file: the OTHER files can be physically absent and the count still
    answers (metadata for them, scan for the covered one)."""
    t = str(tmp_path / "t")
    for i in range(5):
        snapshot_append(_df(spark, i * 10, (i + 1) * 10).repartition(1), t)
    m = snapshot_delete_where(spark, t, "id = 25", lazy=True)
    covered = set(m["row_filters"][0]["files"])
    assert len(covered) == 1
    # hide every UNcovered file; the covered file stays readable
    hidden = []
    for f in _read_manifest(spark, t, 6)["files"]:
        local = f.replace("file:", "")
        if f not in covered:
            shutil.move(local, local + ".hidden")
            hidden.append(local)
    try:
        assert snapshot_count(spark, t) == 49
    finally:
        for local in hidden:
            shutil.move(local + ".hidden", local)
    assert snapshot_min_max(spark, t, "id") == (0, 49)


def test_count_with_where_prunes_and_matches_filter(spark, tmp_path):
    t = str(tmp_path / "t")
    # range-partitioned so files own disjoint id ranges → pruning bites
    df = spark.range(0, 200).select(F.col("id")).repartitionByRange(10, "id")
    snapshot_append(df, t, stats_cols=["id"])
    for pred in ("id BETWEEN 20 AND 39", "id = 7", "id < 0", "id IN (5, 195)"):
        want = read_snapshot(spark, t).filter(pred).count()
        assert snapshot_count(spark, t, where=pred) == want, pred
    info = snapshot_plan_info(spark, t, "id BETWEEN 20 AND 39")
    assert info["files_planned"] <= 2 < info["files_total"] == 10
    assert 0 < info["bytes_planned"] < info["bytes_total"]
    assert info["rows_planned"] <= 40
    # bytes planned scale with selectivity, priced WITHOUT any scan
    wide = snapshot_plan_info(spark, t, "id BETWEEN 0 AND 99")
    assert wide["bytes_planned"] > info["bytes_planned"]


def test_min_max_derived_stats_alias_and_types(spark, tmp_path):
    """A derived stats alias answers for its EXPRESSION; date values
    convert back to datetime.date, NTZ timestamps to datetime."""
    t = str(tmp_path / "t")
    df = spark.range(0, 30).select(
        F.col("id"),
        F.expr(
            "timestamp_ntz '2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id*3600)"
        ).alias("ts"),
    )
    snapshot_append(
        df.repartition(3), t, stats_cols={"day": "CAST(ts AS DATE)", "ts": "ts"}
    )
    lo, hi = snapshot_min_max(spark, t, "day")
    assert lo == datetime.date(2024, 3, 1)
    assert isinstance(hi, datetime.date)
    tlo, thi = snapshot_min_max(spark, t, "ts")
    assert tlo == datetime.datetime(2024, 3, 1, 0, 0, 0)
    assert thi == datetime.datetime(2024, 3, 2, 5, 0, 0)
    # and the zero-scan property holds for the derived alias too
    data_dir = str(tmp_path / "t" / "data")
    shutil.move(data_dir, data_dir + ".hidden")
    try:
        assert snapshot_min_max(spark, t, "day") == (lo, hi)
    finally:
        shutil.move(data_dir + ".hidden", data_dir)


def test_min_max_tz_aware_falls_back_to_scan(spark, tmp_path):
    """tz-AWARE timestamp stats are spelled in the collect-time frame —
    min/max must scan instead of trusting them (same hazard class the
    prune path disables)."""
    t = str(tmp_path / "t")
    df = spark.range(0, 10).select(
        F.col("id"),
        F.expr(
            "timestamp '2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id*60)"
        ).alias("ts"),
    )
    snapshot_append(df.repartition(2), t, stats_cols=["ts"])
    assert snapshot_min_max(spark, t, "ts") == _scan_min_max(spark, t, "ts")


def test_min_max_without_stats_degrades_to_scan(spark, tmp_path):
    """No stats configured: min/max still answers (full scan of the
    stat-less files), result ≡ the plain aggregate."""
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 3, 77).repartition(2), t)  # no stats_cols
    assert snapshot_min_max(spark, t, "id") == (3, 76)
    assert snapshot_min_max(spark, t, "tag") == ("a", "a")
    with pytest.raises(ValueError, match="neither a stats alias"):
        snapshot_min_max(spark, t, "nope")


def test_count_time_travel_and_empty_table(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 10).repartition(1), t)
    snapshot_append(_df(spark, 10, 30).repartition(1), t)
    assert snapshot_count(spark, t, version=1) == 10
    assert snapshot_count(spark, t, version=2) == 30
    snapshot_overwrite(_df(spark, 0, 0), t)
    assert snapshot_count(spark, t) == 0
    assert snapshot_min_max(spark, t, "id") == (None, None)


def test_merge_schema_evolved_column_min_max(spark, tmp_path):
    """Files written before an additive evolution read the new column
    as NULL — min/max over it must ignore them (SQL MIN/MAX null
    semantics) while the new files answer."""
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 10).repartition(1), t)
    evolved = _df(spark, 10, 20).withColumn("score", F.col("id") * 2)
    snapshot_append(evolved.repartition(1), t, merge_schema=True)
    assert snapshot_min_max(spark, t, "score") == (20, 38)
    assert snapshot_count(spark, t) == 20


def test_clone_and_restore_carry_file_meta(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 25).repartition(1), t, stats_cols=["id"])
    c = str(tmp_path / "c")
    snapshot_clone(spark, t, c)
    assert _read_manifest(spark, c, 1)["file_meta"] == _read_manifest(
        spark, t, 1
    )["file_meta"]
    assert snapshot_count(spark, c) == 25
    snapshot_restore(spark, t, 1)
    assert "file_meta" in _read_manifest(spark, t, 2)
    assert snapshot_count(spark, t) == 25


def test_compact_sizes_from_manifest_not_filesystem(spark, tmp_path):
    """Compaction plans its victims from file_meta bytes: with the
    manifest carrying sizes, getFileStatus is never needed for listed
    files — and the packing result is unchanged."""
    t = str(tmp_path / "t")
    for i in range(4):
        snapshot_append(_df(spark, i * 10, (i + 1) * 10).repartition(1), t)
    want = {r["id"] for r in read_snapshot(spark, t).collect()}
    m = snapshot_compact(spark, t)
    assert m["op"] == "compact" and m["meta"]["compacted_files"] == 4
    assert {r["id"] for r in read_snapshot(spark, t).collect()} == want
    # the new packed files got meta too (commit-path invariant)
    assert set(_read_manifest(spark, t, m["version"])["file_meta"]) == set(
        m["files"]
    )


def test_plan_info_reports_unknown_meta_files(spark, tmp_path):
    """A manifest whose file_meta lost an entry (pre-r12 commit shape)
    still answers: the file counts toward files_*, bytes/rows exclude
    it, meta_unknown_files names the gap — and snapshot_count falls
    back to scanning exactly that file."""
    import json

    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 20).repartition(2), t)
    mpath = str(tmp_path / "t" / "_manifests" / ("v%010d.json" % 1))
    with open(mpath) as fh:
        m = json.load(fh)
    dropped = m["files"][0]
    del m["file_meta"][dropped]
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    info = snapshot_plan_info(spark, t)
    assert info["files_total"] == 2 and info["meta_unknown_files"] == 1
    assert info["meta_unknown_planned"] == 1
    assert info["rows_total"] == 10  # only the known file's rows
    # a predicate pruning AWAY the meta-less file must still report the
    # totals' gap (review pass-5: a complete-looking total misprices
    # the selectivity ratio)
    snap = snapshot_plan_info(spark, t, "id IS NOT NULL")
    assert snap["meta_unknown_files"] == 1
    assert snapshot_count(spark, t) == 20  # exact: scans the unknown file


# --- string-bound truncation (manifest stats stay O(files) even with
# stats on a text column) ---------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _STATS_STR_CAP,
    _trunc_bound,
    read_snapshot_where,
)


@given(v=st.text(min_size=_STATS_STR_CAP + 1, max_size=64))
@settings(max_examples=300, deadline=None)
def test_trunc_bound_soundness_property(v):
    """For ANY string, the truncated lower bound is ≤ it and the
    truncated upper bound is > it (or None = unbounded) — the exact
    invariant pruning needs; both land at exactly cap length so
    consumers can detect 'possibly truncated'."""
    lo = _trunc_bound(v, False)
    hi = _trunc_bound(v, True)
    assert lo is not None and lo <= v and len(lo) == _STATS_STR_CAP
    assert hi is None or (hi > v and len(hi) == _STATS_STR_CAP)


def test_trunc_bound_edge_cases():
    assert _trunc_bound("short", True) == "short"  # under cap: verbatim
    v = "a" * 40
    assert _trunc_bound(v, False) == "a" * 16
    hi = _trunc_bound(v, True)
    assert hi is not None and hi > v
    # max-code-point tail: increment moves left, dropping the tail
    v2 = "ab" + "\U0010ffff" * 20
    hi2 = _trunc_bound(v2, True)
    assert hi2 is not None and hi2 > v2
    # all-max string: no finite upper bound at this length
    assert _trunc_bound("\U0010ffff" * 20, True) is None
    # surrogate block is skipped on increment
    v3 = "x" * 15 + "퟿" + "tail"
    hi3 = _trunc_bound(v3, True)
    assert hi3 is not None and hi3 > v3 and "\ud800" not in hi3


def test_long_string_stats_truncate_and_stay_sound(spark, tmp_path):
    """Stats on a long text column store bounded prefixes, never the
    documents themselves — manifests stay O(files) — and pruning on the
    truncated bounds is still sound AND still selective."""
    import json

    t = str(tmp_path / "t")
    a_docs = spark.createDataFrame(
        [(i, "aardvark essay " + "a" * 50 + str(i)) for i in range(5)],
        "id bigint, doc string",
    )
    z_docs = spark.createDataFrame(
        [(100 + i, "zebra treatise " + "z" * 50 + str(i)) for i in range(5)],
        "id bigint, doc string",
    )
    snapshot_append(a_docs.repartition(1), t, stats_cols=["doc"])
    snapshot_append(z_docs.repartition(1), t)
    mpath = str(tmp_path / "t" / "_manifests" / ("v%010d.json" % 2))
    with open(mpath) as fh:
        m = json.load(fh)
    for f, cols in m["stats"].items():
        mn, mx = cols["doc"][0], cols["doc"][1]
        assert len(mn) <= _STATS_STR_CAP and len(mx) <= _STATS_STR_CAP
    # equality on a FULL long value: the other file prunes, result exact
    needle = "aardvark essay " + "a" * 50 + "3"
    got = read_snapshot_where(spark, t, f"doc = '{needle}'")
    assert len(got.inputFiles()) == 1
    assert {r["id"] for r in got.collect()} == {3}
    # range spanning both keeps both
    got2 = read_snapshot_where(spark, t, "doc >= 'aardvark' AND doc <= 'zz'")
    assert len(got2.inputFiles()) == 2
    assert got2.count() == 10
    # min/max over truncated bounds must SCAN (cap-length detection)
    # and return the exact full strings
    lo, hi = snapshot_min_max(spark, t, "doc")
    assert lo == "aardvark essay " + "a" * 50 + "0"
    assert hi == "zebra treatise " + "z" * 50 + "4"


def test_min_max_decimal_and_binary_scan_fallback(spark, tmp_path):
    """Review fix: non-JSON-safe types (Decimal) record no usable stats
    — min/max must return the SCAN's raw values, not fabricate
    (None, None) by piping them through the JSON-safe conversion."""
    from decimal import Decimal

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, Decimal("5.25")), (2, Decimal("99.10")), (3, None)],
        "id bigint, amt decimal(10,2)",
    )
    snapshot_append(df.repartition(1), t, stats_cols=["amt"])
    lo, hi = snapshot_min_max(spark, t, "amt")
    assert lo == Decimal("5.25") and hi == Decimal("99.10")


def test_compact_retry_adopts_winning_schema_evolution(spark, tmp_path):
    """Review pass-5: compaction tolerates concurrent appends — when the
    interloper additively EVOLVED the schema, the compact's winning
    retry must commit the evolved schema, not its stale planning-time
    one (which would pin the interloper's wider file to a narrower
    read or vanish its new column)."""
    from mini_project_204721_data_engineering_spark.sources import (
        snapshots as S,
    )

    t = str(tmp_path / "t")
    narrow = spark.createDataFrame([(i,) for i in range(10)], "k int")
    snapshot_append(narrow.repartition(1), t)
    snapshot_append(
        spark.createDataFrame([(i,) for i in range(10, 20)], "k int"), t
    )
    wide = spark.createDataFrame([(1000,)], "k bigint")
    real_write = S._try_write_manifest

    def racing(spark_, table_dir_, version, manifest):
        if manifest["op"] == "compact" and not getattr(racing, "raced", False):
            racing.raced = True
            # the widening append lands FIRST, stealing this version
            snapshot_append(wide, t, merge_schema=True)
        return real_write(spark_, table_dir_, version, manifest)

    S._try_write_manifest = racing
    try:
        m = snapshot_compact(spark, t)
    finally:
        S._try_write_manifest = real_write
    assert getattr(racing, "raced", False)
    assert m["schema"] == "struct<k:bigint>"  # evolution survives
    got = read_snapshot(spark, t)
    assert got.schema.simpleString() == "struct<k:bigint>"
    assert {r["k"] for r in got.collect()} == set(range(20)) | {1000}


def test_zero_row_part_files_get_meta_and_prune_away(spark, tmp_path):
    """Review pass-6: an explicit repartition writes empty part files —
    they must still get file_meta (rows=0 backfill) so the
    metadata-only invariant holds unconditionally, and a zero-row file
    satisfies NO request, so pruning drops it for free."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        read_snapshot_where,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1,), (2,), (3,)], "id bigint")
    snapshot_append(df.repartition(1), t, stats_cols=["id"])
    # an EMPTY append writes exactly one schema-only part file — the
    # deterministic zero-row case (a sparse repartition produces the
    # same shape nondeterministically)
    snapshot_append(df.filter("id < 0"), t)
    m = _read_manifest(spark, t, 2)
    assert set(m["file_meta"]) == set(m["files"])  # the empty included
    assert sum(e["rows"] for e in m["file_meta"].values()) == 3
    assert sorted(e["rows"] for e in m["file_meta"].values()) == [0, 3]
    assert all(e["bytes"] > 0 for e in m["file_meta"].values())
    # metadata-only count answers with the data physically gone
    data_dir = str(tmp_path / "t" / "data")
    shutil.move(data_dir, data_dir + ".hidden")
    try:
        assert snapshot_count(spark, t) == 3
    finally:
        shutil.move(data_dir + ".hidden", data_dir)
    # the zero-row file is never planned under ANY predicate
    got = read_snapshot_where(spark, t, "id >= 0")
    assert len(got.inputFiles()) == 1
    assert {r["id"] for r in got.collect()} == {1, 2, 3}


def test_min_max_skips_all_null_and_empty_files_zero_scan(spark, tmp_path):
    """Review pass-7: a provably all-null file (null count == rows) and
    a zero-row file contribute nothing to MIN/MAX — the metadata path
    must skip them, not scan them on every serving call.  Structural
    proof: the data directory is gone and min/max still answers."""
    t = str(tmp_path / "t")
    vals = spark.createDataFrame([(1, 10), (2, 99)], "id bigint, v bigint")
    nulls = spark.createDataFrame(
        [(3, None), (4, None)], "id bigint, v bigint"
    )
    snapshot_append(vals.repartition(1), t, stats_cols=["v"])
    snapshot_append(nulls.repartition(1), t)
    snapshot_append(vals.filter("id < 0"), t)  # the empty file
    assert snapshot_min_max(spark, t, "v") == (10, 99)
    data_dir = str(tmp_path / "t" / "data")
    shutil.move(data_dir, data_dir + ".hidden")
    try:
        assert snapshot_min_max(spark, t, "v") == (10, 99)
    finally:
        shutil.move(data_dir + ".hidden", data_dir)


# ---------------------------------------------------------------------------
# layout advisor (snapshot_layout_report) — the observe half of maintenance
# ---------------------------------------------------------------------------


def test_layout_report_shapes_and_recommendations(spark, tmp_path):
    from pyspark.sql import functions as F

    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_append,
        snapshot_compact,
        snapshot_delete_where,
        snapshot_layout_report,
        snapshot_set_stats_spec,
    )

    t = str(tmp_path / "t")
    # 12 tiny single-file commits with HEAVILY OVERLAPPING id ranges
    # (round-robin striping: every file spans almost the whole domain)
    for i in range(12):
        df = (
            spark.range(i, 1200, 12)
            .select(F.col("id"), (F.col("id") % 7).alias("k"))
            .coalesce(1)
        )
        snapshot_append(df, t, stats_cols=["id"])
    rep = snapshot_layout_report(spark, t)
    assert rep["files"] == 12
    assert rep["rows_total"] == 1200
    assert rep["small_files"] == 12
    assert rep["stats_coverage"] == {"id": 1.0}
    # striped ranges all overlap: a point can hit every file
    assert rep["clustering_depth"]["id"] == 12
    msgs = "\n".join(rep["recommendations"])
    assert "snapshot_compact" in msgs and "zorder_by" in msgs

    # stack takedowns until the drain recommendation fires
    for j in range(4):
        snapshot_delete_where(spark, t, f"id % 997 = {j}", lazy=True)
    rep = snapshot_layout_report(spark, t)
    assert rep["pending_filters"] == 4
    assert any("apply_filters" in r for r in rep["recommendations"])

    # a spec change pins every stats-carrying file
    snapshot_set_stats_spec(spark, t, {"id": "id", "kk": "k * 10"})
    rep = snapshot_layout_report(spark, t)
    assert rep["spec_pinned"] == 12
    assert any("old-spec" in r for r in rep["recommendations"])
    # the new alias has no stats anywhere yet -> low coverage flagged
    assert rep["stats_coverage"]["kk"] == 0.0

    # the ACT half: compaction fixes everything the report flagged
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_apply_filters,
    )

    snapshot_apply_filters(spark, t)
    snapshot_compact(spark, t, zorder_by=["id"])
    rep = snapshot_layout_report(spark, t)
    assert rep["pending_filters"] == 0
    assert rep["spec_pinned"] == 0
    assert rep["stats_coverage"]["id"] == 1.0
    assert rep["clustering_depth"]["id"] <= 2  # zorder un-striped it
    assert rep["recommendations"] == []
