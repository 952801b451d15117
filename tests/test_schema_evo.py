"""Column rename/drop as pure-metadata commits (sources/snapshots.py
snapshot_rename_column / snapshot_drop_column) — the column-mapping
capability Iceberg gets from field IDs, re-derived for the by-name read
model: old files keep their physical name and the reader repairs the
chain in-plan (augmented schema + coalesce), stats re-key so pruning
and the metadata-only aggregate family keep working, bloom entries
strip (sidecars record build-time names), and dropped/renamed-away
names become RESERVED against by-name resurrection until a full
overwrite rebuild."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _read_manifest,
    read_snapshot,
    read_snapshot_where,
    snapshot_agg,
    snapshot_append,
    snapshot_apply_filters,
    snapshot_clone,
    snapshot_compact,
    snapshot_count,
    snapshot_delete_where,
    snapshot_drop_column,
    snapshot_min_max,
    snapshot_overwrite,
    snapshot_rename_column,
    snapshot_restore,
)


def _df(spark, lo, hi, value_col="b"):
    return spark.range(lo, hi).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias(value_col)
    )


def test_rename_reads_old_and_new_files(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 20).repartition(2), t)
    snapshot_rename_column(spark, t, "b", "c")
    # schema renamed in place, order preserved
    got = read_snapshot(spark, t)
    assert got.columns == ["a", "c"]
    assert sorted(r["c"] for r in got.collect()) == [2 * i for i in range(20)]
    # appends now write the new name (old schema refused)
    with pytest.raises(ValueError, match="does not match table schema"):
        snapshot_append(_df(spark, 20, 30), t)
    snapshot_append(_df(spark, 20, 30, value_col="c"), t)
    got = read_snapshot(spark, t)
    assert got.count() == 30
    assert sorted(r["c"] for r in got.collect()) == [2 * i for i in range(30)]
    # null values in OLD files survive the coalesce repair as NULL
    t2 = str(tmp_path / "t2")
    nulls = spark.range(0, 6).select(
        F.col("id").alias("a"),
        F.when(F.col("id") % 2 == 0, F.col("id")).alias("b"),
    )
    snapshot_append(nulls, t2)
    snapshot_rename_column(spark, t2, "b", "c")
    vals = {r["a"]: r["c"] for r in read_snapshot(spark, t2).collect()}
    assert vals == {i: (i if i % 2 == 0 else None) for i in range(6)}


def test_rename_keeps_stats_pruning_and_metadata_aggregates(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(
        _df(spark, 0, 100).repartitionByRange(4, "b"), t, stats_cols=["b"]
    )
    snapshot_rename_column(spark, t, "b", "c")
    m = _read_manifest(spark, t, 2)
    assert m["stats_cols"] == {"c": "c"}
    assert all("c" in v and "b" not in v for v in m["stats"].values())
    # file skipping on the NEW name over files written under the OLD
    q = read_snapshot_where(spark, t, "c < 20")
    assert len(q.inputFiles()) < 4
    assert sorted(r["c"] for r in q.collect()) == [2 * i for i in range(10)]
    # metadata-only family answers under the new name
    assert snapshot_count(spark, t) == 100
    assert snapshot_min_max(spark, t, "c") == (0, 198)
    agg = snapshot_agg(spark, t, {"s": "sum(c)", "n": "count(c)"})
    assert agg == {"s": sum(2 * i for i in range(100)), "n": 100}


def test_rename_chain_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 10).coalesce(1), t)           # v1: a,b
    snapshot_rename_column(spark, t, "b", "b2")                  # v2
    snapshot_append(_df(spark, 10, 20, "b2").coalesce(1), t)     # v3
    snapshot_rename_column(spark, t, "b2", "b3")                 # v4
    snapshot_append(_df(spark, 20, 30, "b3").coalesce(1), t)     # v5
    m = _read_manifest(spark, t, 5)
    assert m["renames"] == {"b3": ["b2", "b"]}
    assert set(m["reserved_cols"]) == {"b", "b2"}
    got = read_snapshot(spark, t)
    assert got.columns == ["a", "b3"]
    assert sorted(r["b3"] for r in got.collect()) == [
        2 * i for i in range(30)
    ]
    # time travel reads each era under its own schema
    assert read_snapshot(spark, t, version=1).columns == ["a", "b"]
    assert read_snapshot(spark, t, version=3).columns == ["a", "b2"]
    assert read_snapshot(spark, t, version=3).count() == 20


def test_rename_refusals(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 10), t)
    with pytest.raises(ValueError, match="not in schema"):
        snapshot_rename_column(spark, t, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        snapshot_rename_column(spark, t, "b", "a")
    snapshot_rename_column(spark, t, "b", "c")
    with pytest.raises(ValueError, match="reserved"):
        snapshot_rename_column(spark, t, "c", "b")  # back to the old name
    # pending predicate-mode lazy delete blocks (DV does not)
    t2 = str(tmp_path / "t2")
    snapshot_append(_df(spark, 0, 10), t2)
    snapshot_delete_where(spark, t2, "b = 4", lazy=True)
    with pytest.raises(ValueError, match="pending lazy-delete"):
        snapshot_rename_column(spark, t2, "b", "c")
    snapshot_apply_filters(spark, t2)
    snapshot_rename_column(spark, t2, "b", "c")
    assert sorted(r["c"] for r in read_snapshot(spark, t2).collect()) == [
        2 * i for i in range(10) if 2 * i != 4
    ]
    # derived stats expression referencing the column blocks
    t3 = str(tmp_path / "t3")
    snapshot_append(_df(spark, 0, 10), t3, stats_cols={"b10": "b * 10"})
    with pytest.raises(ValueError, match="derived stats expression"):
        snapshot_rename_column(spark, t3, "b", "c")
    # renaming ONTO a derived stats alias would mis-prune: bounds under
    # that key belong to the alias's expression, not the column
    t4 = str(tmp_path / "t4")
    snapshot_append(
        spark.range(0, 10).select(
            F.col("id").alias("a"),
            (F.col("id") * 2).alias("b"),
            F.lit("2024-01-01 00:00:00").cast("timestamp_ntz").alias("ts"),
        ),
        t4,
        stats_cols={"day": "CAST(ts AS DATE)"},
    )
    with pytest.raises(ValueError, match="collides with the stats alias"):
        snapshot_rename_column(spark, t4, "b", "day")
    # a name that breaks the schema-DDL round-trip must refuse NOW, not
    # corrupt the manifest for every future read
    with pytest.raises(ValueError, match="DDL round-trip"):
        snapshot_rename_column(spark, t4, "b", "x,y")
    with pytest.raises(ValueError, match="DDL round-trip"):
        snapshot_rename_column(spark, t4, "b", "x:int,y")
    assert read_snapshot(spark, t4).count() == 10  # table intact


def test_reserved_names_block_merge_schema_until_overwrite(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 10).coalesce(1), t)
    snapshot_rename_column(spark, t, "b", "c")
    readd = spark.range(10, 15).select(
        F.col("id").alias("a"),
        (F.col("id") * 2).alias("c"),
        F.lit(99).alias("b"),  # the renamed-away physical name
    )
    with pytest.raises(ValueError, match="resurrect"):
        snapshot_append(readd, t, merge_schema=True)
    # a full overwrite rebuild clears the reservation
    snapshot_overwrite(read_snapshot(spark, t), t)
    assert not _read_manifest(
        spark, t, _read_manifest(spark, t, 3)["version"]
    ).get("reserved_cols")
    snapshot_append(readd, t, merge_schema=True)
    got = read_snapshot(spark, t)
    assert set(got.columns) == {"a", "c", "b"}
    assert got.filter("b = 99").count() == 5
    # the pre-overwrite files read b as NULL, never as the 2024 values
    assert got.filter("b IS NULL").count() == 10


@pytest.mark.parametrize("lazy_mode", [True, "dv"])
def test_lazy_delete_after_rename_covers_old_files(spark, tmp_path, lazy_mode):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 20).repartition(2), t)
    snapshot_rename_column(spark, t, "b", "c")
    snapshot_append(_df(spark, 20, 30, "c").coalesce(1), t)
    snapshot_delete_where(spark, t, "c % 8 = 0", lazy=lazy_mode)
    want = sorted(2 * i for i in range(30) if (2 * i) % 8 != 0)
    assert sorted(r["c"] for r in read_snapshot(spark, t).collect()) == want
    snapshot_apply_filters(spark, t)
    assert sorted(r["c"] for r in read_snapshot(spark, t).collect()) == want


def test_rename_strips_bloom_entries_and_compact_rebuilds(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(0, 200).select(
        F.col("id").alias("a"),
        F.sha2(F.col("id").cast("string"), 256).alias("k"),
    )
    snapshot_append(df.repartition(8), t, bloom_cols=["k"])
    needle = df.filter("id = 100").collect()[0]["k"]
    assert len(
        read_snapshot_where(spark, t, f"k = '{needle}'").inputFiles()
    ) < 8
    snapshot_rename_column(spark, t, "k", "doc")
    m = _read_manifest(spark, t, 2)
    assert m["bloom"]["cols"] == ["doc"]  # sticky spec follows
    assert all("k" not in e.get("cols", []) for e in m["bloom"]["entries"])
    # correctness first: the lookup still finds the row (no false prune)
    q = read_snapshot_where(spark, t, f"doc = '{needle}'")
    assert q.count() == 1
    assert len(q.inputFiles()) == 8  # entries stripped: nothing prunes
    # compaction rebuilds blooms under the new name
    snapshot_compact(spark, t)
    q2 = read_snapshot_where(spark, t, f"doc = '{needle}'")
    assert q2.count() == 1
    tip = _read_manifest(spark, t, 3)
    assert any("doc" in e.get("cols", []) for e in tip["bloom"]["entries"])


def test_restore_and_clone_carry_evolution_state(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 10).coalesce(1), t)   # v1
    snapshot_rename_column(spark, t, "b", "c")           # v2
    snapshot_append(_df(spark, 10, 20, "c").coalesce(1), t)  # v3
    # clone of the renamed table repairs borrowed files
    c = str(tmp_path / "clone")
    snapshot_clone(spark, t, c)
    got = read_snapshot(spark, c)
    assert got.columns == ["a", "c"] and got.count() == 20
    assert _read_manifest(spark, c, 1)["renames"] == {"c": ["b"]}
    # restore to the pre-rename version reads the old schema, and the
    # evolution bookkeeping rolls back with the data state
    snapshot_restore(spark, t, 1)
    got = read_snapshot(spark, t)
    assert got.columns == ["a", "b"] and got.count() == 10
    assert not _read_manifest(spark, t, 4).get("renames")


def test_rename_then_widen_under_new_name(spark, tmp_path):
    t = str(tmp_path / "t")
    narrow = spark.range(0, 5).select(
        F.col("id").alias("a"), F.col("id").cast("int").alias("b")
    )
    snapshot_append(narrow.coalesce(1), t)
    snapshot_rename_column(spark, t, "b", "c")
    wide = spark.range(5, 10).select(
        F.col("id").alias("a"), (F.col("id") + 2**40).alias("c")
    )
    snapshot_append(wide.coalesce(1), t, merge_schema=True)
    got = read_snapshot(spark, t)
    assert dict(got.dtypes)["c"] == "bigint"
    assert got.filter(F.col("c") >= 2**40).count() == 5
    assert sorted(r["c"] for r in got.filter("c < 100").collect()) == [
        0, 1, 2, 3, 4,
    ]


def test_drop_column(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(
        spark.range(0, 10).select(
            F.col("id").alias("a"), (F.col("id") * 2).alias("b"),
            F.lit("x").alias("s"),
        ),
        t,
        stats_cols=["b"],
    )
    snapshot_drop_column(spark, t, "b")
    got = read_snapshot(spark, t)
    assert got.columns == ["a", "s"] and got.count() == 10
    m = _read_manifest(spark, t, 2)
    assert "stats_cols" not in m or "b" not in m.get("stats_cols", {})
    assert m["reserved_cols"] == ["b"]
    # metadata count survives; min/max on the dropped column refuses
    assert snapshot_count(spark, t) == 10
    with pytest.raises(ValueError, match="neither a stats alias"):
        snapshot_min_max(spark, t, "b")
    # re-adding the name is refused; time travel still sees the values
    with pytest.raises(ValueError, match="resurrect"):
        snapshot_append(
            spark.range(0, 3).select(
                F.col("id").alias("a"), F.lit("y").alias("s"),
                F.lit(7).alias("b"),
            ),
            t,
            merge_schema=True,
        )
    assert read_snapshot(spark, t, version=1).filter("b = 4").count() == 1


def test_drop_refusals(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(spark.range(0, 5).select(F.col("id").alias("a")), t)
    with pytest.raises(ValueError, match="only column"):
        snapshot_drop_column(spark, t, "a")
    with pytest.raises(ValueError, match="not in schema"):
        snapshot_drop_column(spark, t, "zz")
    t2 = str(tmp_path / "t2")
    snapshot_append(_df(spark, 0, 10), t2)
    snapshot_delete_where(spark, t2, "b = 4", lazy=True)
    with pytest.raises(ValueError, match="pending lazy-delete"):
        snapshot_drop_column(spark, t2, "b")


def test_drop_rename_target_buries_chain(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 10).coalesce(1), t)
    snapshot_rename_column(spark, t, "b", "c")
    snapshot_drop_column(spark, t, "c")
    m = _read_manifest(spark, t, 3)
    assert not m.get("renames")
    assert set(m["reserved_cols"]) == {"b", "c"}
    assert read_snapshot(spark, t).columns == ["a"]


def test_widen_column(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_widen_column,
    )

    t = str(tmp_path / "t")
    narrow = spark.range(0, 10).select(
        F.col("id").alias("a"), F.col("id").cast("int").alias("b")
    )
    snapshot_append(narrow.coalesce(1), t, stats_cols=["b"])
    snapshot_widen_column(spark, t, "b", "bigint")
    got = read_snapshot(spark, t)
    assert dict(got.dtypes)["b"] == "bigint"
    assert got.agg(F.sum("b")).collect()[0][0] == sum(range(10))
    # appends at the widened type land without merge_schema
    snapshot_append(
        spark.range(0, 3).select(
            F.col("id").alias("a"), (F.col("id") + 2**40).alias("b")
        ).coalesce(1),
        t,
    )
    assert read_snapshot(spark, t).filter(F.col("b") >= 2**40).count() == 3
    # carried stats still feed pruning and the metadata aggregates
    assert snapshot_min_max(spark, t, "b") == (0, 2**40 + 2)
    assert snapshot_agg(spark, t, {"s": "sum(b)"})["s"] == (
        sum(range(10)) + 3 * 2**40 + 3
    )
    # refusals: narrowing, cross-family, no-op, unknown column
    with pytest.raises(ValueError, match="not a lossless widening"):
        snapshot_widen_column(spark, t, "b", "int")
    with pytest.raises(ValueError, match="not a lossless widening"):
        snapshot_widen_column(spark, t, "b", "string")
    with pytest.raises(ValueError, match="already"):
        snapshot_widen_column(spark, t, "b", "bigint")
    with pytest.raises(ValueError, match="not in schema"):
        snapshot_widen_column(spark, t, "zz", "bigint")


def test_widen_keeps_bloom_point_lookup(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_widen_column,
    )

    t = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        (F.col("id") * 7919).cast("int").alias("k"), F.col("id").alias("v")
    )
    snapshot_append(df.repartition(5), t, bloom_cols=["k"])
    snapshot_widen_column(spark, t, "k", "bigint")
    # probe hashes at the entry's RECORDED build type (int), so the
    # lookup still prunes and still finds the row after the widening
    q = read_snapshot_where(spark, t, f"k = {50 * 7919}")
    assert q.count() == 1
    assert len(q.inputFiles()) < 5


def test_grouped_agg_on_renamed_group_key(spark, tmp_path):
    t = str(tmp_path / "t")
    d1 = spark.range(0, 10).select(
        F.col("id").alias("v"), F.lit("2024-01-01").cast("date").alias("d")
    )
    d2 = spark.range(10, 25).select(
        F.col("id").alias("v"), F.lit("2024-01-02").cast("date").alias("d")
    )
    snapshot_append(d1.coalesce(1), t, stats_cols=["d", "v"])
    snapshot_append(d2.coalesce(1), t)
    snapshot_rename_column(spark, t, "d", "day")
    got = snapshot_agg(
        spark, t, {"n": "count(*)", "s": "sum(v)"}, group_by="day"
    )
    import datetime

    assert got == {
        datetime.date(2024, 1, 1): {"n": 10, "s": sum(range(10))},
        datetime.date(2024, 1, 2): {"n": 15, "s": sum(range(10, 25))},
    }
