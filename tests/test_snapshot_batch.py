"""Batch DataSource over snapshot tables (sources/snapshot_batch.py):
the SQL face of the lakehouse.  Pins the two-mode contract — the safe
default plans the FULL file set with exact row semantics (DV, time
travel, renames) while the pushdown opt-in prunes files exactly as
``read_snapshot_where`` would — plus the upstream relation-cache hazard
that makes pruning opt-in in the first place."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    In,
    LessThanOrEqual,
)

from mini_project_204721_data_engineering_spark.sources.snapshot_batch import (
    SnapshotDataSource,
    _filter_atom,
    _SnapshotPushdownReader,
    register_snapshot_table,
    snapshot_sql,
)
from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _plan_files,
    _resolve_manifest,
    read_snapshot,
    read_snapshot_where,
    snapshot_append,
    snapshot_delete_where,
    snapshot_rename_column,
    snapshot_widen_column,
)


def _mk_table(spark, path, stats=("k",)):
    """Two single-file commits with DISJOINT k ranges + one DV delete
    hitting each file — the pruning and merge-on-read testbed."""
    snapshot_append(
        spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v").coalesce(1),
        path,
        stats_cols=list(stats),
    )
    snapshot_append(
        spark.range(100, 200)
        .selectExpr("id AS k", "id * 2 AS v")
        .coalesce(1),
        path,
    )
    snapshot_delete_where(spark, path, "k in (5, 150)", lazy="dv")


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _mk_table(spark, path)
    return path


def test_safe_view_mixed_queries_all_exact(spark, tbl):
    """The DEFAULT registration serves filtered and unfiltered queries
    interleaved with exact results — the mode a long-lived view needs
    (under pushdown this exact sequence is the poisoned one)."""
    register_snapshot_table(spark, "t_safe", tbl)
    assert (
        spark.sql(
            "SELECT count(*) c FROM t_safe WHERE k BETWEEN 10 AND 20"
        ).collect()[0]["c"]
        == 11
    )
    assert spark.sql("SELECT count(*) c FROM t_safe").collect()[0]["c"] == 198
    assert (
        spark.sql("SELECT count(*) c FROM t_safe WHERE k >= 150").collect()[
            0
        ]["c"]
        == 49
    )
    assert spark.sql("SELECT count(*) c FROM t_safe").collect()[0]["c"] == 198
    # DV-deleted rows are invisible through SQL
    assert spark.sql("SELECT * FROM t_safe WHERE k = 5").collect() == []


def test_sql_results_equal_read_snapshot_where(spark, tbl):
    register_snapshot_table(spark, "t_eq", tbl)
    got = spark.sql(
        "SELECT k, v FROM t_eq WHERE k >= 90 AND k <= 110 ORDER BY k"
    ).collect()
    want = (
        read_snapshot_where(spark, tbl, "k >= 90 AND k <= 110")
        .orderBy("k")
        .collect()
    )
    assert got == want


def test_pushdown_plans_read_snapshot_where_file_set(spark, tbl):
    """The pruned mode's planner seam must equal read_snapshot_where's
    planning pipeline (minus the bloom probe) for the same conjuncts —
    same extractor, same manifest pruning."""
    schema = read_snapshot(spark, tbl).schema
    m = _resolve_manifest(spark, tbl)
    cases = [
        ([GreaterThanOrEqual(("k",), 10), LessThanOrEqual(("k",), 20)],
         "k >= 10 AND k <= 20"),
        ([EqualTo(("k",), 150)], "k = 150"),
        ([In(("k",), (5, 199))], "k IN (5, 199)"),
        ([], None),
    ]
    for filters, predicate in cases:
        rdr = _SnapshotPushdownReader(
            {"table_dir": tbl, "pushdown": "true"}, schema
        )
        rdr.pushFilters(filters)
        want = (
            _plan_files(spark, m, predicate, bloom=False)
            if predicate
            else list(m["files"])
        )
        assert rdr.planned_files() == want, predicate


def test_pushdown_prunes_structurally(spark, tmp_path):
    """Moved-the-data-away proof: delete the bytes of the file the
    predicate prunes; the pruned single-statement read still answers
    (the file is never opened), while a full scan fails."""
    path = str(tmp_path / "tbl")
    _mk_table(spark, path)
    m = _resolve_manifest(spark, path)
    keep = set(_plan_files(spark, m, "k <= 50", bloom=False))
    pruned = [f for f in m["files"] if f not in keep]
    assert len(pruned) == 1
    os.rename(
        pruned[0].replace("file:", ""),
        pruned[0].replace("file:", "") + ".hidden",
    )
    try:
        out = snapshot_sql(
            spark,
            "SELECT count(*) AS c, sum(v) AS s FROM t WHERE k <= 50",
            {"t": path},
        ).collect()[0]
        assert out["c"] == 50 and out["s"] == 2 * sum(
            i for i in range(51) if i != 5
        )
        register_snapshot_table(spark, "t_gone", path)
        with pytest.raises(Exception):
            spark.sql("SELECT count(*) FROM t_gone").collect()
    finally:
        os.rename(
            pruned[0].replace("file:", "") + ".hidden",
            pruned[0].replace("file:", ""),
        )


def test_upstream_relation_cache_hazard_still_present(spark, tbl):
    """Documents WHY pushdown is opt-in: Spark 4.1 caches one Python
    plan per relation and serves it to scans without pushable filters,
    so a shared PUSHDOWN view answers an unfiltered count with the
    previous query's pruned plan.  This pin asserts the hazard EXISTS —
    if a Spark upgrade fixes the caching, this test fails and the safe
    default can be revisited."""
    register_snapshot_table(spark, "t_hazard", tbl, pushdown=True)
    assert (
        spark.sql(
            "SELECT count(*) c FROM t_hazard WHERE k BETWEEN 10 AND 20"
        ).collect()[0]["c"]
        == 11
    )
    poisoned = spark.sql("SELECT count(*) c FROM t_hazard").collect()[0]["c"]
    assert poisoned == 99  # pruned plan reused: one file instead of two


def test_snapshot_sql_fresh_relations_stay_exact(spark, tbl):
    """snapshot_sql's fresh-view-per-statement pattern: a pruned
    statement followed by an unfiltered one stays exact (each gets its
    own relation, so no plan can leak across)."""
    a = snapshot_sql(
        spark,
        "SELECT count(*) AS c FROM t WHERE k BETWEEN 10 AND 20",
        {"t": tbl},
    ).collect()[0]["c"]
    b = snapshot_sql(
        spark, "SELECT count(*) AS c FROM t", {"t": tbl}
    ).collect()[0]["c"]
    assert (a, b) == (11, 198)


def test_time_travel_options(spark, tbl):
    v1 = (
        spark.read.format("snapshot")
        .option("table_dir", tbl)
        .option("version", 1)
        .load()
    )
    assert v1.count() == 100
    m1 = _resolve_manifest(spark, tbl, version=1)
    as_of = (
        spark.read.format("snapshot")
        .option("table_dir", tbl)
        .option("as_of", m1["ts"])
        .load()
    )
    assert as_of.count() == 100
    # pre-delete version still shows the later-deleted row
    v2 = (
        spark.read.format("snapshot")
        .option("table_dir", tbl)
        .option("version", 2)
        .load()
    )
    assert v2.filter("k = 5").count() == 1


def test_rename_and_widen_repair_through_sql(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshot_append(
        spark.range(0, 10).selectExpr(
            "cast(id AS int) AS k", "id * 2 AS v"
        ).coalesce(1),
        path,
    )
    snapshot_rename_column(spark, path, "v", "val")
    snapshot_widen_column(spark, path, "k", "bigint")
    snapshot_append(
        spark.range(10, 20).selectExpr("id AS k", "id * 3 AS val").coalesce(1),
        path,
    )
    df = register_snapshot_table(spark, "t_ren", path)
    assert df.columns == ["k", "val"]
    assert dict(df.dtypes)["k"] == "bigint"
    got = spark.sql(
        "SELECT sum(val) AS s, count(*) AS c FROM t_ren"
    ).collect()[0]
    want = read_snapshot(spark, path).agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("c")
    ).collect()[0]
    assert (got["s"], got["c"]) == (want["s"], want["c"])


def test_catalog_mode_reads_enrolled_table(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
        catalog_init,
        multi_table_txn,
    )

    root = tmp_path / "cat"
    cat = str(root / "_catalog")
    catalog_init(
        spark,
        cat,
        {"facts": str(root / "facts"), "dims": str(root / "dims")},
    )
    multi_table_txn(
        spark,
        cat,
        {
            "facts": {
                "op": "append",
                "df": spark.range(0, 50).selectExpr("id AS k"),
            },
            "dims": {
                "op": "append",
                "df": spark.range(0, 5).selectExpr("id AS d"),
            },
        },
    )
    df = register_snapshot_table(
        spark, "t_cat", catalog_dir=cat, table="facts"
    )
    assert df.count() == 50
    assert (
        spark.sql("SELECT count(*) c FROM t_cat WHERE k < 10").collect()[0][
            "c"
        ]
        == 10
    )


def test_predicate_lazy_refuses(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snapshot_append(
        spark.range(0, 10).selectExpr("id AS k").coalesce(1), path
    )
    snapshot_delete_where(spark, path, "k = 3", lazy=True)
    with pytest.raises(Exception, match="PREDICATE-shaped"):
        register_snapshot_table(spark, "t_pred", path).collect()


def test_unsatisfiable_predicate_plans_empty(spark, tbl):
    out = snapshot_sql(
        spark, "SELECT * FROM t WHERE k = -42", {"t": tbl}
    )
    assert out.count() == 0


def test_filter_atom_spellings():
    import datetime

    assert _filter_atom(EqualTo(("k",), 5)) == "k = 5"
    assert _filter_atom(EqualTo(("s",), "a'b")) == "s = 'a''b'"
    assert (
        _filter_atom(EqualTo(("d",), datetime.date(2024, 1, 2)))
        == "d = DATE '2024-01-02'"
    )
    assert (
        _filter_atom(
            EqualTo(("t",), datetime.datetime(2024, 1, 2, 3, 4, 5))
        )
        == "t = TIMESTAMP '2024-01-02 03:04:05'"
    )
    assert _filter_atom(In(("k",), (1, 2))) == "k IN (1, 2)"
    # nested columns and unspeakable values contribute nothing
    assert _filter_atom(EqualTo(("a", "b"), 1)) is None
    assert _filter_atom(EqualTo(("k",), b"\x00")) is None


def test_exclude_positions_row_group_offsets():
    import pyarrow as pa

    from mini_project_204721_data_engineering_spark.streaming.snapshot_source import (
        pos_filter,
    )

    batches = [
        pa.RecordBatch.from_arrays([pa.array([10, 11, 12])], names=["x"]),
        pa.RecordBatch.from_arrays([pa.array([13, 14])], names=["x"]),
    ]
    # whole-file positions 101 and 103, read from a row group whose
    # global start offset is 100
    out = [
        v
        for b in pos_filter(
            iter(batches), [1, 101, 103], pa, exclude=True, base=100
        )
        for v in b.column(0).to_pylist()
    ]
    assert out == [10, 12, 14]


def test_format_registered_name(spark):
    assert SnapshotDataSource.name() == "snapshot"


def test_view_pins_load_time_version(spark, tbl):
    """load() without an explicit version pins the tip resolved at
    schema time: later queries on the relation read that snapshot even
    after new commits (read_snapshot semantics — and the guard against
    serving newer files under an older schema).  A fresh registration
    sees the new tip."""
    register_snapshot_table(spark, "t_pin", tbl)
    n0 = spark.sql("SELECT count(*) c FROM t_pin").collect()[0]["c"]
    snapshot_append(
        spark.range(500, 520).selectExpr("id AS k", "id * 2 AS v")
        .coalesce(1),
        tbl,
    )
    assert spark.sql("SELECT count(*) c FROM t_pin").collect()[0]["c"] == n0
    register_snapshot_table(spark, "t_pin2", tbl)
    assert (
        spark.sql("SELECT count(*) c FROM t_pin2").collect()[0]["c"]
        == n0 + 20
    )


def test_snapshot_sql_restores_conf_and_drops_views_on_failure(spark, tbl):
    """A failing statement must not leak the pushdown-enabled views or
    the session conf flip (a leaked view would re-expose the
    relation-cache hazard)."""
    prior = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    with pytest.raises(Exception):
        snapshot_sql(spark, "SELECT bogus_col FROM t_led", {"t_led": tbl})
    assert (
        spark.conf.get("spark.sql.python.filterPushdown.enabled") == prior
    )
    assert not any(
        v.name == "t_led" for v in spark.catalog.listTables()
    )


def test_batch_reads_mock_object_store_table(spark, tmp_path):
    """The batch DataSource resolves registered manifest-IO schemes in
    the sessionless planner exactly like the stream feed: a table whose
    manifests live behind the mock object store reads through plain
    SQL (data bytes are file:-spelled inside manifests, so pyarrow
    reads them directly)."""
    t = "mock:" + str(tmp_path / "store" / "tbl")
    snapshot_append(
        spark.range(0, 50).selectExpr("id AS k", "id * 2 AS v").coalesce(1),
        t,
    )
    snapshot_delete_where(spark, t, "k = 7", lazy="dv")
    register_snapshot_table(spark, "t_mock", t)
    assert spark.sql("SELECT count(*) c FROM t_mock").collect()[0]["c"] == 49
    assert spark.sql("SELECT v FROM t_mock WHERE k = 7").collect() == []


# ---------------------------------------------------------------------------
# r15: the WRITE path — df.write.format("snapshot") through the commit
# protocol (executor pyarrow writes + one atomic manifest commit).
# ---------------------------------------------------------------------------


def _w(df, t, mode="append", **opts):
    w = df.write.format("snapshot").mode(mode).option("table_dir", t)
    for k, v in opts.items():
        w = w.option(k, v)
    w.save()


def test_writer_append_roundtrip_sticky_stats_and_prune(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        _plan_files,
        snapshot_count,
    )

    spark.dataSource.register(SnapshotDataSource)
    t = str(tmp_path / "t")
    _w(
        spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v").coalesce(1),
        t,
        stats_cols="k",
    )
    # second commit: NO stats option — the spec is sticky
    _w(
        spark.range(100, 200)
        .selectExpr("id AS k", "id * 2 AS v")
        .coalesce(1),
        t,
    )
    assert read_snapshot(spark, t).count() == 200
    assert snapshot_count(spark, t) == 200  # file_meta is exact
    m = _resolve_manifest(spark, t)
    assert len(m["files"]) == 2
    assert all(f in m["stats"] for f in m["files"])
    # the writer's stats PRUNE: a k<=50 plan keeps one file
    assert len(_plan_files(spark, m, "k <= 50", bloom=False)) == 1
    # and results match read_snapshot_where exactly
    got = read_snapshot_where(spark, t, "k BETWEEN 90 AND 110").orderBy(
        "k"
    ).collect()
    assert [r["k"] for r in got] == list(range(90, 111))


def test_writer_stats_spelling_matches_spark_stats_pass(spark, tmp_path):
    """The executor-side pyarrow stats must spell values EXACTLY like
    snapshot_append's Spark stats job — a drift would mis-prune.  Same
    single-partition data through both write paths; per-column entries
    compared value-for-value (ints incl. the exact decimal sum, floats
    without sum — the writer omits it by design, strings through the
    same truncate-with-increment bound)."""
    df = spark.createDataFrame(
        [
            (1, 0.5, "short", "x" * 40),
            (7, -2.25, "zz-" + "y" * 30, "abc"),
            (None, None, None, "m" * 16),
        ],
        "k int, x double, s string, s2 string",
    ).coalesce(1)
    ta, tb = str(tmp_path / "a"), str(tmp_path / "b")
    snapshot_append(df, ta, stats_cols=["k", "x", "s", "s2"])
    spark.dataSource.register(SnapshotDataSource)
    _w(df, tb, stats_cols="k,x,s,s2")
    sa = _resolve_manifest(spark, ta)
    sb = _resolve_manifest(spark, tb)
    (ea,) = sa["stats"].values()
    (eb,) = sb["stats"].values()
    assert eb["k"] == ea["k"]  # [min, max, nulls, exact int sum]
    assert eb["x"] == ea["x"][:3]  # floats: writer records no sum
    assert eb["s"] == ea["s"][:3]
    assert eb["s2"] == ea["s2"][:3]
    (ma,) = sa["file_meta"].values()
    (mb,) = sb["file_meta"].values()
    assert mb["rows"] == ma["rows"] == 3


def test_writer_overwrite_time_travel_and_evo_clear(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_rename_column,
    )

    spark.dataSource.register(SnapshotDataSource)
    t = str(tmp_path / "t")
    _w(spark.range(0, 50).selectExpr("id AS k", "id AS v").coalesce(1), t)
    snapshot_rename_column(spark, t, "v", "val")
    _w(
        spark.range(0, 5).selectExpr("id AS k", "id AS val").coalesce(1),
        t,
        mode="overwrite",
    )
    assert read_snapshot(spark, t).count() == 5
    assert read_snapshot(spark, t, version=1).count() == 50
    m = _resolve_manifest(spark, t)
    assert not m.get("renames")  # full replace clears the chain


def test_writer_refusals(spark, tmp_path):
    spark.dataSource.register(SnapshotDataSource)
    t = str(tmp_path / "t")
    df = spark.range(3).selectExpr("id AS k")
    with pytest.raises(Exception, match="multi_table_txn"):
        (
            df.write.format("snapshot").mode("append")
            .option("catalog_dir", str(tmp_path / "c"))
            .option("table", "facts")
            .save()
        )
    with pytest.raises(Exception, match="stats_cols"):
        _w(df, t, stats_cols="nope")
    _w(df, t)
    with pytest.raises(Exception, match="schema|snapshot"):
        _w(spark.range(3).selectExpr("id AS wrong"), t)


def test_writer_skips_empty_partitions(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_count,
    )

    spark.dataSource.register(SnapshotDataSource)
    t = str(tmp_path / "t")
    _w(spark.range(3).selectExpr("id AS k").repartition(8), t)
    m = _resolve_manifest(spark, t)
    assert 0 < len(m["files"]) <= 3  # no empty part files committed
    assert snapshot_count(spark, t) == 3


def test_writer_append_carries_pending_dv(spark, tmp_path):
    spark.dataSource.register(SnapshotDataSource)
    t = str(tmp_path / "t")
    snapshot_append(
        spark.range(0, 20).selectExpr("id AS k").coalesce(1), t
    )
    snapshot_delete_where(spark, t, "k = 3", lazy="dv")
    _w(spark.range(20, 30).selectExpr("id AS k").coalesce(1), t)
    rows = {r["k"] for r in read_snapshot(spark, t).collect()}
    assert rows == set(range(30)) - {3}  # takedown survived the append


def test_writer_mock_object_store(spark, tmp_path):
    spark.dataSource.register(SnapshotDataSource)
    t = "mock:" + str(tmp_path / "store" / "tbl")
    _w(spark.range(0, 40).selectExpr("id AS k").coalesce(1), t)
    _w(spark.range(40, 60).selectExpr("id AS k").coalesce(1), t)
    assert read_snapshot(spark, t).count() == 60
    # full loop: write through the writer, query through the SQL face
    out = snapshot_sql(
        spark, "SELECT count(*) AS c FROM t WHERE k >= 50", {"t": t}
    )
    assert out.collect()[0]["c"] == 10


def test_upstream_catalog_table_options_gap_still_present(spark, tmp_path):
    """Documents why SQL DML is out of reach: Spark 4.1 hands a Python
    DataSource EMPTY options when it is read/written as a CATALOG table
    (CREATE TABLE ... USING snapshot) — neither OPTIONS nor LOCATION is
    forwarded, so the reader cannot find table_dir.  If this test
    FAILS, a Spark upgrade fixed the forwarding and INSERT INTO can be
    supported."""
    import uuid

    spark.dataSource.register(SnapshotDataSource)
    t = str(tmp_path / "tbl")
    snapshot_append(spark.range(3).selectExpr("id AS k").coalesce(1), t)
    name = f"snap_cat_{uuid.uuid4().hex[:8]}"
    spark.sql(
        f"CREATE TABLE {name} USING snapshot OPTIONS (table_dir '{t}')"
    )
    try:
        with pytest.raises(Exception, match="table_dir|required"):
            spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_writer_concurrent_commits_compose(spark, tmp_path):
    """Two DataFrame-writer commits racing the manifest claim compose
    like any other appenders (shared _commit loop; the loser retries on
    the new tip).  Driven at the writer level with pyarrow batches:
    Spark cannot resolve a PYTHON data source from a non-main thread at
    all (DATA_SOURCE_NOT_FOUND even under pyspark.InheritableThread —
    the JVM-side lookup consults thread state the py4j call doesn't
    carry), so whole-df.write threading is untestable upstream; the
    COMMIT race is the part this engine owns, and it is exercised
    exactly here."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow as pa

    from mini_project_204721_data_engineering_spark.sources.snapshot_batch import (
        _SnapshotBatchWriter,
    )

    t = str(tmp_path / "t")
    schema = spark.range(1).selectExpr("id AS k").schema
    writers, msgs = [], []
    for lo in (0, 1000):
        w = _SnapshotBatchWriter({"table_dir": t}, schema, False)
        batch = pa.record_batch(
            [pa.array(list(range(lo, lo + 50)), type=pa.int64())],
            names=["k"],
        )
        writers.append(w)
        msgs.append(w.write(iter([batch])))
    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(lambda i: writers[i].commit([msgs[i]]), range(2)))
    ids = sorted(r["k"] for r in read_snapshot(spark, t).collect())
    assert ids == list(range(0, 50)) + list(range(1000, 1050))
    m = _resolve_manifest(spark, t)
    assert len(m["files"]) == 2
    assert all(v["rows"] == 50 for v in m["file_meta"].values())


def test_snapshot_sql_joins_two_snapshot_tables(spark, tmp_path):
    """snapshot_sql registers every referenced table fresh — a join of
    two snapshot tables (fact pruned by the WHERE, dim complete) runs
    as one statement."""
    facts = str(tmp_path / "facts")
    dims = str(tmp_path / "dims")
    snapshot_append(
        spark.range(0, 200)
        .selectExpr("id AS k", "id % 4 AS d", "id * 2 AS v")
        .coalesce(1),
        facts,
        stats_cols=["k"],
    )
    snapshot_append(
        spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "c"), (3, "d")], "d long, name string"
        ).coalesce(1),
        dims,
    )
    snapshot_delete_where(spark, facts, "k = 10", lazy="dv")
    out = snapshot_sql(
        spark,
        """
        SELECT name, count(*) AS n, sum(v) AS s
        FROM f JOIN d USING (d)
        WHERE k < 20
        GROUP BY name ORDER BY name
        """,
        {"f": facts, "d": dims},
    ).collect()
    # k in 0..19 minus the taken-down k=10 (d = 10 % 4 = 2)
    assert [(r["name"], r["n"]) for r in out] == [
        ("a", 5), ("b", 5), ("c", 4), ("d", 5),
    ]
    assert sum(r["s"] for r in out) == 2 * (sum(range(20)) - 10)
