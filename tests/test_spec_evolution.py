"""Partition-spec evolution (snapshots.py::snapshot_set_stats_spec):
Iceberg-style — the spec changes as a METADATA commit; new files get
new-spec stats, old files keep pruning under the spec that produced
their stats, and an alias whose derivation CHANGED can never mis-prune
old files (their stats are filtered out by _effective_stats, so they
are conservatively kept/scanned).  Compaction migrates files to the
current spec."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _list_versions,
    _prune_files,
    _read_manifest,
    read_snapshot,
    snapshot_agg,
    snapshot_append,
    snapshot_compact,
    snapshot_files,
    snapshot_min_max,
    snapshot_plan_info,
    snapshot_set_stats_spec,
)


def _df(spark, lo, hi, day):
    return spark.range(lo, hi).select(
        F.col("id"),
        (
            F.lit(f"{day}T00:00:00").cast("timestamp_ntz")
            + F.make_interval(hours=F.col("id") % 24)
        ).alias("ts"),
        (F.col("id") % 5).alias("k"),
    )


def _tip(spark, t):
    return _read_manifest(spark, t, _list_versions(spark, t)[-1])


def test_spec_change_is_metadata_only_and_content_identical(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(
        _df(spark, 0, 100, "2024-01-01").coalesce(1), t,
        stats_cols={"day": "CAST(ts AS DATE)", "id": "id"},
    )
    before = {(r["id"],) for r in read_snapshot(spark, t).collect()}
    files_before = set(_tip(spark, t)["files"])
    snapshot_set_stats_spec(
        spark, t,
        {"day": "CAST(ts AS DATE)", "id": "id", "hour": "date_trunc('hour', ts)"},
    )
    tip = _tip(spark, t)
    assert set(tip["files"]) == files_before  # no bytes moved
    assert tip["op"] == "set_spec"
    assert {(r["id"],) for r in read_snapshot(spark, t).collect()} == before
    # old file pinned to the outgoing spec, history records it
    assert set(tip["file_spec"].values()) == {0}
    assert tip["spec_history"][0]["cols"] == {
        "day": "CAST(ts AS DATE)", "id": "id",
    }


def test_unchanged_alias_prunes_old_and_new_files(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(
        _df(spark, 0, 100, "2024-01-01").coalesce(1), t,
        stats_cols={"day": "CAST(ts AS DATE)"},
    )
    snapshot_set_stats_spec(
        spark, t, {"day": "CAST(ts AS DATE)", "kk": "k * 10"}
    )
    snapshot_append(_df(spark, 100, 200, "2024-02-01").coalesce(1), t)
    # "day" is textually identical in both specs: both eras' files prune
    info_old = snapshot_plan_info(spark, t, predicate="day = '2024-01-01'")
    info_new = snapshot_plan_info(spark, t, predicate="day = '2024-02-01'")
    assert info_old["files_planned"] == 1
    assert info_new["files_planned"] == 1
    # the NEW alias prunes only the new file; the old file is kept
    # conservatively (it has no kk stats under any spec)
    info_kk = snapshot_plan_info(spark, t, predicate="kk > 100")
    assert info_kk["files_planned"] == 1  # new file pruned out, old kept
    # row-level results stay exact: prune + real filter
    got = (
        read_snapshot(spark, t, prune={"day": ("2024-01-01", "2024-01-01")})
        .filter(F.expr("CAST(ts AS DATE) = DATE '2024-01-01'"))
        .count()
    )
    assert got == 100


def test_changed_derivation_never_misprunes_old_files(spark, tmp_path):
    """day: CAST(ts AS DATE) → month granularity — same ALIAS, different
    semantics.  Old files' day stats hold daily values; a
    month-semantics prune request must not consult them."""
    t = str(tmp_path / "t")
    snapshot_append(
        _df(spark, 0, 100, "2024-03-15").coalesce(1), t,
        stats_cols={"day": "CAST(ts AS DATE)"},
    )
    snapshot_set_stats_spec(
        spark, t, {"day": "CAST(date_trunc('month', ts) AS DATE)"}
    )
    snapshot_append(_df(spark, 100, 200, "2024-04-20").coalesce(1), t)
    m = _tip(spark, t)
    old_file = [f for f in m["files"] if f in m.get("file_spec", {})]
    assert len(old_file) == 1
    # month-semantics request 2024-03-01: the old file's STALE daily
    # stats (min=max=2024-03-15) would have pruned it — it must be KEPT
    # (its stats are inadmissible under the current spec), while the
    # new file (month stats 2024-04-01) prunes out
    planned = _prune_files(m, {"day": ("2024-03-01", "2024-03-01")})
    assert planned == old_file
    # and the rows are really there under month semantics
    got = (
        read_snapshot(spark, t, prune={"day": ("2024-03-01", "2024-03-01")})
        .filter(
            F.expr("CAST(date_trunc('month', ts) AS DATE)")
            == F.lit("2024-03-01").cast("date")
        )
        .count()
    )
    assert got == 100
    # a request matching the stale DAILY stats value keeps the old file
    # (conservative) but finds no month-semantics rows
    got = (
        read_snapshot(spark, t, prune={"day": ("2024-03-15", "2024-03-15")})
        .filter(
            F.expr("CAST(date_trunc('month', ts) AS DATE)")
            == F.lit("2024-03-15").cast("date")
        )
        .count()
    )
    assert got == 0
    # min/max under the new spec: old file scans, answer is exact
    lo, hi = snapshot_min_max(spark, t, "day")
    assert (lo, hi) == (datetime.date(2024, 3, 1), datetime.date(2024, 4, 1))
    # grouped rollup: the old file falls back to the scan, result exact
    got = snapshot_agg(spark, t, {"n": "count(*)"}, group_by="day")
    assert got == {
        datetime.date(2024, 3, 1): {"n": 100},
        datetime.date(2024, 4, 1): {"n": 100},
    }


def test_compaction_migrates_to_current_spec(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(
        _df(spark, 0, 50, "2024-01-01").coalesce(1), t,
        stats_cols={"day": "CAST(ts AS DATE)"},
    )
    snapshot_append(_df(spark, 50, 100, "2024-01-02").coalesce(1), t)
    snapshot_set_stats_spec(
        spark, t, {"day": "CAST(ts AS DATE)", "hour": "date_trunc('hour', ts)"}
    )
    assert len(_tip(spark, t)["file_spec"]) == 2
    snapshot_compact(spark, t)
    tip = _tip(spark, t)
    # rewritten files carry fresh current-spec stats; pins are gone
    assert not tip.get("file_spec")
    assert not tip.get("spec_history")
    # and the new alias now has stats on every file
    for f in snapshot_files(spark, t):
        assert "hour" in (f["stats"] or {})
    assert read_snapshot(spark, t).count() == 100


def test_spec_noop_and_validation(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(
        _df(spark, 0, 10, "2024-01-01").coalesce(1), t,
        stats_cols={"day": "CAST(ts AS DATE)"},
    )
    # same spec → commit records no pins
    snapshot_set_stats_spec(spark, t, {"day": "CAST(ts AS DATE)"})
    assert not _tip(spark, t).get("file_spec")
    with pytest.raises(ValueError, match="does not resolve"):
        snapshot_set_stats_spec(spark, t, {"bad": "no_such_col + 1"})
    with pytest.raises(ValueError, match="no snapshots"):
        snapshot_set_stats_spec(spark, str(tmp_path / "nope"), ["id"])


def test_repeated_spec_changes_stack_pins_correctly(spark, tmp_path):
    """A → B → C: files written under each era pin to THEIR spec; an
    alias surviving every era keeps pruning all of them."""
    t = str(tmp_path / "t")
    snapshot_append(
        _df(spark, 0, 50, "2024-01-01").coalesce(1), t,
        stats_cols={"day": "CAST(ts AS DATE)"},
    )
    snapshot_set_stats_spec(
        spark, t, {"day": "CAST(ts AS DATE)", "kk": "k * 10"}
    )
    snapshot_append(_df(spark, 50, 100, "2024-02-01").coalesce(1), t)
    snapshot_set_stats_spec(
        spark, t,
        {"day": "CAST(ts AS DATE)", "kk": "k * 10", "idh": "id % 100"},
    )
    snapshot_append(_df(spark, 100, 150, "2024-03-01").coalesce(1), t)
    tip = _tip(spark, t)
    assert len(tip["spec_history"]) == 2
    assert sorted(set(tip["file_spec"].values())) == [0, 1]
    # day (identical in all three specs) prunes every era's file
    for day in ("2024-01-01", "2024-02-01", "2024-03-01"):
        info = snapshot_plan_info(spark, t, predicate=f"day = '{day}'")
        assert info["files_planned"] == 1, day
    # kk (absent in era 1) prunes era-2 and era-3 files only
    info = snapshot_plan_info(spark, t, predicate="kk > 1000")
    assert info["files_planned"] == 1  # only the stats-less era-1 file kept
    # idh exists only in era 3: eras 1-2 conservatively kept
    info = snapshot_plan_info(spark, t, predicate="idh > 1000")
    assert info["files_planned"] == 2
