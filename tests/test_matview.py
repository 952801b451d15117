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


def test_non_append_source_window_falls_back_to_rebuild(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    snapshot_append(_rows(spark, 0, 50).repartition(1), src)
    refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    # the source REWRITES files — the appended-file delta is invalid
    snapshot_delete_where(spark, src, "id < 10")
    m = refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert m is not None
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)
    # and the view keeps refreshing incrementally afterwards
    snapshot_append(_rows(spark, 50, 80), src)
    refresh_aggregate_view(spark, src, view, ["grp"], MEAS)
    assert _agg_dict(read_snapshot(spark, view)) == _expected(spark, src)


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
