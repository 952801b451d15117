"""Materialized aggregate views over the snapshot log
(operators/matview.py): exactly-once incremental refresh with the
cursor riding the view's own manifest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.operators.incremental import base_aggregate
from mini_project_204721_data_engineering_spark.operators.matview import refresh_aggregate_view
from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _list_versions,
    read_snapshot,
    snapshot_append,
    snapshot_delete_where,
)

MEAS = {"cents": lambda r: F.round(r["val"] * 100).cast("long")}


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") % 7).cast("double").alias("val"),
    )


def _agg_dict(df):
    return {r["grp"]: (r["cents"], r["n"]) for r in df.collect()}


def _expected(spark, src):
    return _agg_dict(base_aggregate(read_snapshot(spark, src), ["grp"], MEAS))


def test_full_build_then_incremental_then_replay(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snapshot_append(_rows(spark, 0, 100), src)
    m = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m is not None
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)

    # two more source appends, one refresh consumes BOTH deltas
    snapshot_append(_rows(spark, 100, 150), src)
    snapshot_append(_rows(spark, 150, 180), src)
    m2 = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m2["meta"]["src_version"] == 3
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)

    # replayed refresh: no-op, zero new view versions (exactly-once)
    n_versions = len(_list_versions(spark, view))
    assert refresh_aggregate_view(spark, src, view, ["grp"], MEAS) is None
    assert len(_list_versions(spark, view)) == n_versions


def test_non_append_source_window_consumes_confined_delta(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snapshot_append(_rows(spark, 0, 50).repartition(1), src)
    refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    # the source REWRITES files — consumed as the CoW file delta, not a rebuild
    snapshot_delete_where(spark, src, "id < 10")
    m = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m is not None
    assert m["meta"]["refresh_mode"] == "delta-confined"
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)
    # and the view keeps refreshing incrementally afterwards
    snapshot_append(_rows(spark, 50, 80), src)
    m2 = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m2["meta"]["refresh_mode"] == "delta-append"
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)


def test_one_file_delete_refreshes_without_source_sized_scan(spark, tmp_path):
    """The 100 TB claim, pinned: a delete that rewrote 1 of 10 source
    files refreshes the view reading exactly the 2 delta files — the
    refresh never performs a full source read (monkeypatch-proven) and
    records the confined cost in its own manifest."""
    import mini_project_204721_data_engineering_spark.operators.matview as mv

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    for i in range(10):
        snapshot_append(_rows(spark, i * 10, (i + 1) * 10).repartition(1), src)
    refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    snapshot_delete_where(spark, src, "id = 55")

    real = mv.snap.read_snapshot

    def no_source_reads(spark_, table_dir, *a, **kw):
        assert table_dir != src, "confined refresh performed a full source read"
        return real(spark_, table_dir, *a, **kw)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(mv.snap, "read_snapshot", no_source_reads)
        m = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m["meta"]["refresh_mode"] == "delta-confined"
    assert m["meta"]["src_files_read"] == 2  # hit file + survivor rewrite
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)


def test_merge_and_replace_where_windows_stay_confined(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_merge_into,
        snapshot_replace_where,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snapshot_append(_rows(spark, 0, 40).repartition(2), src)
    refresh_aggregate_view(spark, src, view, ["grp"], MEAS)

    # keyed upsert window (values change, keys move between groups)
    upd = spark.range(20, 50).select(
        F.col("id"),
        ((F.col("id") + 1) % 4).cast("string").alias("grp"),
        (F.col("id") % 11).cast("double").alias("val"),
    )
    snapshot_merge_into(upd, src, ["id"])
    m = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m["meta"]["refresh_mode"] == "delta-confined"
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)

    # slice re-land window
    snapshot_replace_where(
        _rows(spark, 0, 10).withColumn("val", F.col("val") + 100.0).filter("id < 10"),
        src, "id < 10",
    )
    m2 = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m2["meta"]["refresh_mode"] == "delta-confined"
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)


def test_pure_compaction_window_advances_cursor_without_reading_bytes(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_compact,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    for i in range(5):
        snapshot_append(_rows(spark, i * 10, (i + 1) * 10).repartition(1), src)
    refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    state_before = _agg_dict(read_snapshot(spark, view))
    view_files_before = read_snapshot(spark, view).inputFiles()

    mc = snapshot_compact(spark, src)  # data-identical rewrite
    assert mc["op"] == "compact"
    m = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m["meta"]["refresh_mode"] == "cursor-advance"
    assert m["meta"]["src_files_read"] == 0
    # metadata-only: the view's data files are the SAME files
    assert sorted(read_snapshot(spark, view).inputFiles()) == sorted(view_files_before)
    assert _agg_dict(read_snapshot(spark, view)) == state_before
    # cursor really advanced: replay is a no-op, later appends are delta-append
    assert refresh_aggregate_view(spark, src, view, ["grp"], MEAS) is None
    snapshot_append(_rows(spark, 50, 60), src)
    m2 = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m2["meta"]["refresh_mode"] == "delta-append"
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)


def test_unexpected_error_in_file_changes_surfaces_not_rebuilds(spark, tmp_path):
    """Only the expired-evidence ValueError may demote a refresh to the
    full rebuild; a programming error / FS fault must SURFACE — a bare
    except here would silently turn every refresh O(source) forever."""
    import mini_project_204721_data_engineering_spark.operators.matview as mv

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snapshot_append(_rows(spark, 0, 30).repartition(1), src)
    refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    snapshot_delete_where(spark, src, "id = 5")

    def boom(*a, **kw):
        raise TypeError("injected programming error")

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(mv.snap, "snapshot_file_changes", boom)
        with pytest.raises(TypeError, match="injected"):
            refresh_aggregate_view(spark, src, view, ["grp"], MEAS)

    # the TOCTOU expiry race (manifest GC'd between listing and read)
    # surfaces as a wrapped FileNotFoundException — that one DOES fall
    # back to the rebuild, because it is the same evidence-gone signal
    def gone(*a, **kw):
        raise RuntimeError(
            "py4j: java.io.FileNotFoundException: v0000000001.json"
        )

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(mv.snap, "snapshot_file_changes", gone)
        m = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m["meta"]["refresh_mode"] == "full"
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)

    # and the un-patched refresh still completes confined
    snapshot_delete_where(spark, src, "id = 7")
    m = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m["meta"]["refresh_mode"] == "delta-confined"
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)


def test_schema_changed_window_falls_back_to_rebuild(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snapshot_append(_rows(spark, 0, 30).repartition(1), src)
    refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    # additive evolution + a delete in the same window: the before/after
    # images would not union across schemas — rebuild is the honest path
    snapshot_append(
        _rows(spark, 30, 40).withColumn("extra", F.lit(1)), src, merge_schema=True
    )
    snapshot_delete_where(spark, src, "id = 5")
    m = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m["meta"]["refresh_mode"] == "full"
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)


def test_confined_refresh_equals_rebuild_over_random_op_sequence(spark, tmp_path):
    """Delta ≡ recompute oracle: a mixed sequence of append / delete /
    merge / replace-where / compact windows, refreshing after each —
    the maintained view must equal a from-scratch recompute at every
    step, and only schema-stable windows may rebuild."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_compact,
        snapshot_merge_into,
        snapshot_replace_where,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snapshot_append(_rows(spark, 0, 60).repartition(3), src)
    refresh_aggregate_view(spark, src, view, ["grp"], MEAS)

    def upsert(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"),
            ((F.col("id") + 2) % 4).cast("string").alias("grp"),
            (F.col("id") % 13).cast("double").alias("val"),
        )

    steps = [
        lambda: snapshot_append(_rows(spark, 60, 90).repartition(2), src),
        lambda: snapshot_delete_where(spark, src, "id % 7 = 0"),
        lambda: snapshot_merge_into(upsert(40, 100), src, ["id"]),
        lambda: snapshot_compact(spark, src),
        lambda: snapshot_replace_where(
            upsert(0, 20).filter("id < 20"), src, "id < 20"
        ),
        lambda: (
            snapshot_append(_rows(spark, 100, 120), src),
            snapshot_delete_where(spark, src, "id BETWEEN 10 AND 30"),
        ),
    ]
    modes = []
    for step in steps:
        step()
        m = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
        modes.append(m["meta"]["refresh_mode"] if m else None)
        assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)
    # no step in this schema-stable sequence may pay a full rebuild
    assert "full" not in modes


def test_view_time_travel_tracks_refresh_history(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snapshot_append(_rows(spark, 0, 40), src)
    refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    v1_state = _agg_dict(read_snapshot(spark, view))
    snapshot_append(_rows(spark, 40, 90), src)
    refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert _agg_dict(read_snapshot(spark, view, version=1)) == v1_state


def test_empty_source_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="no snapshots"):
        refresh_aggregate_view(
            spark, str(tmp_path / "nope"), str(tmp_path / "v"), ["grp"], MEAS
        )


def test_stream_to_log_to_view_composition(spark, tmp_path):
    """Production wiring: one foreachBatch lands the micro-batch into
    the fact log (txn exactly-once) AND refreshes the serving view —
    after the stream, and after a full lost-checkpoint replay, the view
    equals a from-scratch recompute over the fact tip."""
    import os

    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_txn_append,
    )

    src_files = str(tmp_path / "in")
    fact, view = str(tmp_path / "fact"), str(tmp_path / "view")
    os.makedirs(src_files)
    for i in range(3):
        _rows(spark, i * 30, (i + 1) * 30).coalesce(1).write.parquet(
            os.path.join(src_files, f"b{i}")
        )
    schema = spark.read.parquet(src_files + "/b0").schema

    def land(batch_df, batch_id):
        snapshot_txn_append(batch_df, fact, "pipe", int(batch_id))
        # refresh UNCONDITIONALLY — it is an idempotent no-op when the
        # view is current, and skipping it on a replayed batch would
        # strand the view if a prior run crashed between append and
        # refresh
        refresh_aggregate_view(spark, fact, view, ["grp"], MEAS)

    def run(chk):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_files + "/*")
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(str(tmp_path / "chk1"))
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, fact)
    n_view_versions = len(_list_versions(spark, view))
    run(str(tmp_path / "chk2"))  # lost checkpoint, full replay
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, fact)
    assert len(_list_versions(spark, view)) == n_view_versions


def test_kill_and_restart_mid_stream_view_equals_recompute(spark, tmp_path):
    """The full lakehouse loop under a crash at the WORST spot: the
    pipeline dies inside foreachBatch after the fact append but before
    the view refresh (state torn across the two logs).  Restarting from
    the SAME checkpoint must (a) not double-land the torn batch (txn
    watermark), (b) catch the stranded view up, (c) finish the
    remaining batches — ending with view ≡ from-scratch recompute and
    exactly-once fact contents."""
    import os

    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_txn_append,
    )

    src_files = str(tmp_path / "in")
    fact, view = str(tmp_path / "fact"), str(tmp_path / "view")
    os.makedirs(src_files)
    for i in range(4):
        _rows(spark, i * 25, (i + 1) * 25).coalesce(1).write.parquet(
            os.path.join(src_files, f"b{i}")
        )
    schema = spark.read.parquet(src_files + "/b0").schema
    crash_armed = {"armed": True}

    def land(batch_df, batch_id):
        snapshot_txn_append(batch_df, fact, "pipe", int(batch_id))
        if int(batch_id) == 2 and crash_armed["armed"]:
            crash_armed["armed"] = False
            raise RuntimeError("injected crash between append and refresh")
        refresh_aggregate_view(spark, fact, view, ["grp"], MEAS)

    chk = str(tmp_path / "chk")

    def run():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_files + "/*")
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with pytest.raises(Exception, match="injected crash"):
        run()
    # torn state on disk: fact holds the crashed batch, the view doesn't
    assert _agg_dict(read_snapshot(spark, view)) != _expected(spark, fact)

    run()  # SAME checkpoint: the torn batch replays, then the rest
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, fact)
    # exactly-once on the fact side: 4 batches = 4 appends, 100 rows
    assert read_snapshot(spark, fact).count() == 100
    assert len(_list_versions(spark, fact)) == 4


def test_recreated_source_log_triggers_rebuild_even_when_regrown(spark, tmp_path):
    """The nasty case: the source log is dropped and RECREATED, then
    grows PAST the view's cursor version — version arithmetic alone
    cannot see it (cursor < tip, no files missing), but the table
    identity can.  The refresh must rebuild, not merge a bogus delta."""
    import shutil

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snapshot_append(_rows(spark, 0, 40), src)
    snapshot_append(_rows(spark, 40, 60), src)
    refresh_aggregate_view(spark, src, view, ["grp"], MEAS)  # cursor = 2

    shutil.rmtree(src)  # the table is dropped...
    for i in range(3):  # ...and recreated, regrowing to tip=3 > cursor
        snapshot_append(_rows(spark, 100 + i * 10, 110 + i * 10), src)

    m = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m is not None
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)
