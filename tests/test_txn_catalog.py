"""Multi-table atomic transactions (sources/txn_catalog.py): the
reference's ingest is a TWO-table transaction — upload-lineage row +
fact rows land together (`backend/app/main.py:136-150`).  The catalog
makes that all-or-nothing across snapshot tables: one exclusive-create
of the next catalog version flips every pin simultaneously, so a reader
resolving through the catalog can never see fact rows without the
lineage row, across any injected crash point."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
import time

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _list_versions,
    expire_snapshots,
    read_snapshot,
    snapshot_append,
    snapshot_history,
)
from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
    catalog_history,
    catalog_init,
    catalog_pins,
    catalog_publish,
    catalog_read,
    multi_table_txn,
)


def _setup(spark, tmp_path):
    cat = str(tmp_path / "cat")
    facts = str(tmp_path / "facts")
    lineage = str(tmp_path / "lineage")
    catalog_init(spark, cat, {"facts": facts, "lineage": lineage})
    return cat, facts, lineage


def _fact_df(spark, upload_id: int, n: int = 5):
    return spark.range(n).select(
        F.lit(upload_id).alias("upload_id"),
        F.col("id").alias("v"),
    )


def _lineage_df(spark, upload_id: int, n: int):
    return spark.createDataFrame(
        [(upload_id, n, "ok")], "upload_id long, n_rows long, status string"
    )


def test_txn_commits_both_tables_atomically(spark, tmp_path):
    cat, facts, lineage = _setup(spark, tmp_path)
    res = multi_table_txn(
        spark,
        cat,
        {
            "facts": {"op": "append", "df": _fact_df(spark, 1)},
            "lineage": {"op": "append", "df": _lineage_df(spark, 1, 5)},
        },
    )
    assert res["op"] == "txn"
    assert catalog_read(spark, cat, "facts").count() == 5
    assert catalog_read(spark, cat, "lineage").count() == 1
    # publication happened: single-table tooling sees the same state
    assert read_snapshot(spark, facts).count() == 5
    assert read_snapshot(spark, lineage).count() == 1
    assert _list_versions(spark, facts) == [1]
    # second txn stacks on the first
    multi_table_txn(
        spark,
        cat,
        {
            "facts": {"op": "append", "df": _fact_df(spark, 2, 3)},
            "lineage": {"op": "append", "df": _lineage_df(spark, 2, 3)},
        },
    )
    assert catalog_read(spark, cat, "facts").count() == 8
    assert catalog_read(spark, cat, "lineage").count() == 2
    hist = catalog_history(spark, cat)
    assert [h["op"] for h in hist] == ["init", "txn", "txn"]
    assert hist[-1]["tables"] == {"facts": 2, "lineage": 2}


def test_catalog_version_is_consistent_cross_table_snapshot(spark, tmp_path):
    cat, facts, lineage = _setup(spark, tmp_path)
    for u in (1, 2, 3):
        multi_table_txn(
            spark,
            cat,
            {
                "facts": {"op": "append", "df": _fact_df(spark, u, u)},
                "lineage": {"op": "append", "df": _lineage_df(spark, u, u)},
            },
        )
    # at EVERY catalog version, sum(lineage.n_rows) == count(facts):
    # the invariant a torn two-table commit would break
    for cv in (2, 3, 4):
        nf = catalog_read(spark, cat, "facts", catalog_version=cv).count()
        nl = (
            catalog_read(spark, cat, "lineage", catalog_version=cv)
            .agg(F.sum("n_rows").alias("s"))
            .collect()[0]["s"]
        )
        assert nf == nl, cv


def test_lost_catalog_race_restages_without_losing_data(spark, tmp_path):
    """Two transactions prepared against the same catalog tip: the loser
    must re-stage against the winner's pins and BOTH land."""
    import mini_project_204721_data_engineering_spark.sources.txn_catalog as tc

    cat, facts, lineage = _setup(spark, tmp_path)
    real_try = tc._try_write_manifest
    state = {"injected": False}

    def racing_try(spark_, dir_, version, manifest):
        # just before OUR first catalog claim, let a competitor commit
        if (
            not state["injected"]
            and dir_ == cat
            and manifest.get("op") == "txn"
        ):
            state["injected"] = True
            multi_table_txn(
                spark,
                cat,
                {"facts": {"op": "append", "df": _fact_df(spark, 99, 2)}},
            )
        return real_try(spark_, dir_, version, manifest)

    tc._try_write_manifest = racing_try
    try:
        multi_table_txn(
            spark,
            cat,
            {
                "facts": {"op": "append", "df": _fact_df(spark, 1, 5)},
                "lineage": {"op": "append", "df": _lineage_df(spark, 1, 5)},
            },
        )
    finally:
        tc._try_write_manifest = real_try
    assert catalog_read(spark, cat, "facts").count() == 7  # 2 + 5
    assert catalog_read(spark, cat, "lineage").count() == 1
    # table log is linear: both txns published, no version collision
    assert _list_versions(spark, facts) == [1, 2]


CRASH_POINTS = ["after_data", "after_staging", "before_publish"]


@pytest.mark.parametrize("crash", CRASH_POINTS)
def test_injected_crash_never_tears_the_transaction(spark, tmp_path, crash):
    """Kill the transaction at every interesting point; the catalog
    reader must see fact rows IFF it sees the lineage row."""
    import mini_project_204721_data_engineering_spark.sources.txn_catalog as tc

    cat, facts, lineage = _setup(spark, tmp_path)
    # a pre-existing committed txn so readers have a baseline
    multi_table_txn(
        spark,
        cat,
        {
            "facts": {"op": "append", "df": _fact_df(spark, 1, 5)},
            "lineage": {"op": "append", "df": _lineage_df(spark, 1, 5)},
        },
    )

    class Boom(RuntimeError):
        pass

    real_write_data = tc._write_data_files
    real_write_json = tc._write_json
    real_try = tc._try_write_manifest
    calls = {"data": 0, "staged": 0}

    def crash_write_data(df, tdir):
        out = real_write_data(df, tdir)
        calls["data"] += 1
        if crash == "after_data" and calls["data"] == 2:
            raise Boom()  # both tables' bytes down, nothing staged
        return out

    def crash_write_json(spark_, path, obj):
        real_write_json(spark_, path, obj)
        calls["staged"] += 1
        if crash == "after_staging" and calls["staged"] == 2:
            raise Boom()  # both staged manifests written, no catalog commit

    def crash_try(spark_, dir_, version, manifest):
        ok = real_try(spark_, dir_, version, manifest)
        if (
            crash == "before_publish"
            and ok
            and dir_ == cat
            and manifest.get("op") == "txn"
            and manifest.get("version", 0) > 2
        ):
            raise Boom()  # catalog committed, publication never ran
        return ok

    tc._write_data_files = crash_write_data
    tc._write_json = crash_write_json
    tc._try_write_manifest = crash_try
    try:
        with pytest.raises(Boom):
            multi_table_txn(
                spark,
                cat,
                {
                    "facts": {"op": "append", "df": _fact_df(spark, 2, 3)},
                    "lineage": {"op": "append", "df": _lineage_df(spark, 2, 3)},
                },
            )
    finally:
        tc._write_data_files = real_write_data
        tc._write_json = real_write_json
        tc._try_write_manifest = real_try

    nf = catalog_read(spark, cat, "facts").count()
    nl = (
        catalog_read(spark, cat, "lineage")
        .agg(F.sum("n_rows").alias("s"))
        .collect()[0]["s"]
    )
    assert nf == nl, f"torn transaction at crash={crash}: {nf} != {nl}"
    if crash == "before_publish":
        # the txn IS durable (catalog committed before the crash) —
        # readers recover through the staged manifests
        assert nf == 8
        # and the NEXT transaction heals the table logs idempotently
        multi_table_txn(
            spark,
            cat,
            {
                "facts": {"op": "append", "df": _fact_df(spark, 3, 1)},
                "lineage": {"op": "append", "df": _lineage_df(spark, 3, 1)},
            },
        )
        assert catalog_read(spark, cat, "facts").count() == 9
        assert read_snapshot(spark, facts).count() == 9  # published
        assert _list_versions(spark, facts) == [1, 2, 3]
    else:
        assert nf == 5  # aborted txn fully invisible


def test_explicit_publish_recovers_crashed_txn(spark, tmp_path):
    """catalog_publish alone (no new txn) converges table logs."""
    import mini_project_204721_data_engineering_spark.sources.txn_catalog as tc

    cat, facts, lineage = _setup(spark, tmp_path)
    real_publish = tc._publish
    tc._publish = lambda *a, **k: None  # txn commits, never publishes
    try:
        multi_table_txn(
            spark,
            cat,
            {
                "facts": {"op": "append", "df": _fact_df(spark, 1, 4)},
                "lineage": {"op": "append", "df": _lineage_df(spark, 1, 4)},
            },
        )
    finally:
        tc._publish = real_publish
    assert _list_versions(spark, facts) == []  # unpublished
    assert catalog_read(spark, cat, "facts").count() == 4  # still durable
    catalog_publish(spark, cat)
    assert _list_versions(spark, facts) == [1]
    assert read_snapshot(spark, facts).count() == 4
    # idempotent
    catalog_publish(spark, cat)
    assert _list_versions(spark, facts) == [1]


def test_expire_never_sweeps_staged_transaction_data(spark, tmp_path):
    """A committed-but-unpublished txn's data files are referenced ONLY
    by its staged manifest; expire_snapshots must keep them."""
    import mini_project_204721_data_engineering_spark.sources.txn_catalog as tc

    cat, facts, lineage = _setup(spark, tmp_path)
    multi_table_txn(
        spark,
        cat,
        {"facts": {"op": "append", "df": _fact_df(spark, 1, 4)}},
    )
    real_publish = tc._publish
    tc._publish = lambda *a, **k: None
    try:
        multi_table_txn(
            spark,
            cat,
            {"facts": {"op": "append", "df": _fact_df(spark, 2, 6)}},
        )
    finally:
        tc._publish = real_publish
    # aggressive GC with zero grace windows — the staged manifest is the
    # only thing standing between the txn's bytes and the sweep
    expire_snapshots(
        spark, facts, keep_last=1, orphan_min_age_seconds=0.0
    )
    assert catalog_read(spark, cat, "facts").count() == 10
    catalog_publish(spark, cat)
    assert read_snapshot(spark, facts).count() == 10


def test_overwrite_and_mixed_ops_in_one_txn(spark, tmp_path):
    cat, facts, lineage = _setup(spark, tmp_path)
    multi_table_txn(
        spark,
        cat,
        {
            "facts": {"op": "append", "df": _fact_df(spark, 1, 5)},
            "lineage": {"op": "append", "df": _lineage_df(spark, 1, 5)},
        },
    )
    # atomically REPLACE facts while appending a correction lineage row
    multi_table_txn(
        spark,
        cat,
        {
            "facts": {"op": "overwrite", "df": _fact_df(spark, 2, 2)},
            "lineage": {"op": "append", "df": _lineage_df(spark, 2, 2)},
        },
    )
    f = catalog_read(spark, cat, "facts")
    assert f.count() == 2
    assert f.agg(F.min("upload_id")).collect()[0][0] == 2
    assert catalog_read(spark, cat, "lineage").count() == 2


def test_stats_cols_ride_txn_commits(spark, tmp_path):
    """Staged manifests go through the SAME stats machinery as normal
    commits — pruning and metadata aggregates work on txn tables."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_count,
    )

    cat, facts, lineage = _setup(spark, tmp_path)
    multi_table_txn(
        spark,
        cat,
        {
            "facts": {
                "op": "append",
                "df": _fact_df(spark, 1, 100),
                "stats_cols": ["upload_id", "v"],
            }
        },
    )
    multi_table_txn(
        spark,
        cat,
        {
            "facts": {
                "op": "append",
                "df": _fact_df(spark, 2, 50),
            }
        },
    )
    catalog_publish(spark, cat)
    # sticky stats columns carried into the second txn's commit
    assert snapshot_count(spark, str(tmp_path / "facts"), where="upload_id = 2") == 50
    assert snapshot_count(spark, str(tmp_path / "facts"), where="v >= 0") == 150


def test_unenrolled_table_and_empty_writes_refuse(spark, tmp_path):
    cat, facts, lineage = _setup(spark, tmp_path)
    with pytest.raises(ValueError, match="not enrolled"):
        multi_table_txn(
            spark, cat, {"nope": {"op": "append", "df": _fact_df(spark, 1)}}
        )
    with pytest.raises(ValueError, match="no writes"):
        multi_table_txn(spark, cat, {})
    with pytest.raises(ValueError, match="unsupported op"):
        multi_table_txn(
            spark, cat, {"facts": {"op": "delete", "df": _fact_df(spark, 1)}}
        )
    with pytest.raises(ValueError, match="already exists"):
        catalog_init(spark, cat, {"facts": facts})
    with pytest.raises(ValueError, match="no committed data"):
        catalog_read(spark, cat, "facts")


def test_enroll_preexisting_table_pins_its_tip(spark, tmp_path):
    facts = str(tmp_path / "facts")
    snapshot_append(_fact_df(spark, 1, 7), facts)
    cat = str(tmp_path / "cat")
    catalog_init(spark, cat, {"facts": facts, "lineage": str(tmp_path / "l")})
    assert catalog_pins(spark, cat)["facts"]["version"] == 1
    assert catalog_read(spark, cat, "facts").count() == 7
    multi_table_txn(
        spark,
        cat,
        {"facts": {"op": "append", "df": _fact_df(spark, 2, 3)}},
    )
    assert catalog_read(spark, cat, "facts").count() == 10
    assert [h["version"] for h in snapshot_history(spark, facts)] == [1, 2]


def test_cross_process_txn_race_no_torn_commit(spark, tmp_path):
    """Two driver JVMs run interleaved multi-table transactions on the
    SAME catalog; every catalog version must satisfy the fact/lineage
    invariant and all 8 transactions must land exactly once."""
    cat, facts, lineage = _setup(spark, tmp_path)
    ready = str(tmp_path / "ready")
    go = str(tmp_path / "go")
    child_code = textwrap.dedent(
        f"""
        import pathlib, time
        from pyspark.sql import SparkSession, functions as F
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.ui.enabled", "false")
                 .config("spark.sql.shuffle.partitions", "2")
                 .getOrCreate())
        from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
            multi_table_txn,
        )
        pathlib.Path({ready!r}).touch()
        for _ in range(1200):
            if pathlib.Path({go!r}).exists():
                break
            time.sleep(0.05)
        else:
            raise SystemExit("no go signal from the parent")
        for i in range(4):
            u = 100 + i
            multi_table_txn(spark, {cat!r}, {{
                "facts": {{"op": "append", "df": spark.range(u).select(
                    F.lit(u).alias("upload_id"), F.col("id").alias("v"))}},
                "lineage": {{"op": "append", "df": spark.createDataFrame(
                    [(u, u, "ok")],
                    "upload_id long, n_rows long, status string")}},
            }})
        spark.stop()
        """
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-c", child_code],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        deadline = time.time() + 180
        while not os.path.exists(ready):
            if proc.poll() is not None or time.time() > deadline:
                out, err = proc.communicate(timeout=10)
                pytest.skip(f"second driver JVM unavailable: {err[-500:]!r}")
            time.sleep(0.1)
        open(go, "w").close()
        for i in range(4):
            u = 200 + i
            multi_table_txn(
                spark,
                cat,
                {
                    "facts": {"op": "append", "df": _fact_df(spark, u, u)},
                    "lineage": {"op": "append", "df": _lineage_df(spark, u, u)},
                },
            )
        out, err = proc.communicate(timeout=300)
        assert proc.returncode == 0, err[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()
    hist = catalog_history(spark, cat)
    assert [h["version"] for h in hist] == list(range(1, 10))  # init + 8
    # the invariant holds at EVERY catalog version, not just the tip
    for cv in range(2, 10):
        nf = catalog_read(spark, cat, "facts", catalog_version=cv).count()
        nl = (
            catalog_read(spark, cat, "lineage", catalog_version=cv)
            .agg(F.sum("n_rows").alias("s"))
            .collect()[0]["s"]
        )
        assert nf == nl, cv
    want = sum(100 + i for i in range(4)) + sum(200 + i for i in range(4))
    assert catalog_read(spark, cat, "facts").count() == want


def test_expire_releases_abandoned_staging_keeps_committed(spark, tmp_path):
    """An ABANDONED staging (catalog commit never landed) must not pin
    its orphan data files forever; a committed-but-unpublished txn's
    staged manifest stays load-bearing until published, then becomes
    redundant bytes expire can drop."""
    import glob as _glob

    import mini_project_204721_data_engineering_spark.sources.txn_catalog as tc

    cat, facts, lineage = _setup(spark, tmp_path)
    multi_table_txn(
        spark, cat, {"facts": {"op": "append", "df": _fact_df(spark, 1, 4)}}
    )
    # abandoned: every catalog claim loses -> txn raises, staging orphaned
    real_try = tc._try_write_manifest

    def always_lose(spark_, dir_, version, manifest):
        if dir_ == cat and manifest.get("op") == "txn":
            return False
        return real_try(spark_, dir_, version, manifest)

    tc._try_write_manifest = always_lose
    try:
        with pytest.raises(RuntimeError, match="catalog commit race"):
            multi_table_txn(
                spark, cat,
                {"facts": {"op": "append", "df": _fact_df(spark, 2, 6)}},
                max_retries=3,
            )
    finally:
        tc._try_write_manifest = real_try
    staged = _glob.glob(f"{facts}/_manifests/staged-*.json")
    assert staged  # the abandoned staging is on disk
    res = expire_snapshots(
        spark, facts, keep_last=10, orphan_min_age_seconds=0.0
    )
    # abandoned staged file released AND its orphan data swept
    assert not _glob.glob(f"{facts}/_manifests/staged-*.json")
    assert res["deleted_files"] >= 1
    assert catalog_read(spark, cat, "facts").count() == 4  # intact

    # committed-but-unpublished: staged file survives expire...
    real_publish = tc._publish
    tc._publish = lambda *a, **k: None
    try:
        multi_table_txn(
            spark, cat, {"facts": {"op": "append", "df": _fact_df(spark, 3, 2)}}
        )
    finally:
        tc._publish = real_publish
    assert _glob.glob(f"{facts}/_manifests/staged-*.json")
    expire_snapshots(spark, facts, keep_last=10, orphan_min_age_seconds=0.0)
    assert _glob.glob(f"{facts}/_manifests/staged-*.json")  # load-bearing
    assert catalog_read(spark, cat, "facts").count() == 6
    # ...and becomes droppable redundant bytes once published
    catalog_publish(spark, cat)
    expire_snapshots(spark, facts, keep_last=10, orphan_min_age_seconds=0.0)
    assert not _glob.glob(f"{facts}/_manifests/staged-*.json")
    assert catalog_read(spark, cat, "facts").count() == 6
    assert read_snapshot(spark, facts).count() == 6


def test_idempotent_multi_table_txn(spark, tmp_path):
    """app_id/batch_id make the transaction at-most-once: a replay is a
    no-op returning None even through the race window, so a two-table
    stream batch can never double-land OR tear."""
    import mini_project_204721_data_engineering_spark.sources.txn_catalog as tc

    cat, facts, lineage = _setup(spark, tmp_path)

    def txn(b):
        return multi_table_txn(
            spark, cat,
            {
                "facts": {"op": "append", "df": _fact_df(spark, b, 4)},
                "lineage": {"op": "append", "df": _lineage_df(spark, b, 4)},
            },
            app_id="ingest", batch_id=b,
        )

    assert txn(0) is not None
    assert txn(0) is None  # replay skipped (fast path, no bytes moved)
    assert txn(1) is not None
    assert txn(0) is None  # old batch stays skipped
    assert catalog_read(spark, cat, "facts").count() == 8
    # race window: a competitor lands the SAME batch between our tip
    # read and our catalog claim — the loop recheck must skip, not dup
    real_try = tc._try_write_manifest
    state = {"hit": False}

    def inject(spark_, dir_, version, manifest):
        if (
            not state["hit"] and dir_ == cat and manifest.get("op") == "txn"
            and manifest.get("txn", {}).get("ingest") == 2
        ):
            state["hit"] = True
            txn(2)  # competitor wins batch 2 first
        return real_try(spark_, dir_, version, manifest)

    tc._try_write_manifest = inject
    try:
        assert txn(2) is None  # we lost; recheck made the replay a no-op
    finally:
        tc._try_write_manifest = real_try
    assert catalog_read(spark, cat, "facts").count() == 12
    with pytest.raises(ValueError, match="go together"):
        multi_table_txn(
            spark, cat,
            {"facts": {"op": "append", "df": _fact_df(spark, 9, 1)}},
            app_id="x",
        )


def test_catalog_stream_sink_two_table_exactly_once(spark, tmp_path):
    """foreachBatch sink: fact rows + derived lineage row land per
    micro-batch atomically; a replayed batch id is a no-op."""
    from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
        catalog_stream_sink,
    )

    cat, facts, lineage = _setup(spark, tmp_path)

    def writes(df):
        n = df.count()
        return {
            "facts": {"op": "append", "df": df},
            "lineage": {
                "op": "append",
                "df": spark.createDataFrame(
                    [(0, n, "ok")],
                    "upload_id long, n_rows long, status string",
                ),
            },
        }

    sink = catalog_stream_sink(cat, "s1", writes)
    b0 = _fact_df(spark, 1, 5)
    sink(b0, 0)
    sink(b0, 0)  # at-least-once replay
    sink(_fact_df(spark, 2, 3), 1)
    assert catalog_read(spark, cat, "facts").count() == 8
    nl = (
        catalog_read(spark, cat, "lineage")
        .agg(F.sum("n_rows").alias("s")).collect()[0]["s"]
    )
    assert nl == 8


def test_delete_where_in_txn_atomic_correction(spark, tmp_path):
    """The correction shape: retract fact rows + append the correcting
    audit row in ONE catalog commit; three-valued logic matches the
    single-table CoW contract (a NULL-predicate row survives)."""
    cat, facts, lineage = _setup(spark, tmp_path)
    base = spark.createDataFrame(
        [(1, 10), (1, 20), (1, None), (2, 30)],
        "upload_id long, v long",
    )
    multi_table_txn(
        spark, cat,
        {
            "facts": {"op": "append", "df": base},
            "lineage": {"op": "append", "df": _lineage_df(spark, 1, 4)},
        },
    )
    multi_table_txn(
        spark, cat,
        {
            "facts": {"op": "delete_where", "predicate": "v >= 20"},
            "lineage": {"op": "append", "df": _lineage_df(spark, 2, -2)},
        },
    )
    rows = {
        (r["upload_id"], r["v"])
        for r in catalog_read(spark, cat, "facts").collect()
    }
    # v=NULL row SURVIVES (predicate NULL is not TRUE); 20 and 30 go
    assert rows == {(1, 10), (1, None)}
    assert catalog_read(spark, cat, "lineage").count() == 2
    # published into the table log like any other txn commit
    assert read_snapshot(spark, facts).count() == 2


def test_delete_where_txn_restages_on_lost_race(spark, tmp_path):
    """A competitor moves the facts pin between our staging and the
    catalog claim: the delete's rewrite must REDO against the new pin —
    rows the competitor appended that match the predicate must also go
    (conservative serializability, not write-skew)."""
    import mini_project_204721_data_engineering_spark.sources.txn_catalog as tc

    cat, facts, lineage = _setup(spark, tmp_path)
    multi_table_txn(
        spark, cat,
        {"facts": {"op": "append", "df": _fact_df(spark, 1, 10)}},
    )
    real_try = tc._try_write_manifest
    state = {"hit": False}

    def inject(spark_, dir_, version, manifest):
        if (
            not state["hit"] and dir_ == cat
            and manifest.get("op") == "txn"
            and any(
                "delete" in str(p.get("staged", ""))
                or p.get("version", 0) > 1
                for p in manifest.get("tables", {}).values()
            )
        ):
            state["hit"] = True
            # competitor appends rows that MATCH the delete predicate
            multi_table_txn(
                spark, cat,
                {"facts": {"op": "append", "df": _fact_df(spark, 2, 4)}},
            )
        return real_try(spark_, dir_, version, manifest)

    tc._try_write_manifest = inject
    try:
        multi_table_txn(
            spark, cat,
            {"facts": {"op": "delete_where", "predicate": "v < 2"}},
        )
    finally:
        tc._try_write_manifest = real_try
    got = {
        (r["upload_id"], r["v"])
        for r in catalog_read(spark, cat, "facts").collect()
    }
    # 10 original rows (v 0..9) + 4 competitor rows (v 0..3); v<2 gone
    # from BOTH eras — the rewrite redid against the competitor's pin
    want = {(1, v) for v in range(2, 10)} | {(2, v) for v in range(2, 4)}
    assert got == want
    with pytest.raises(ValueError, match="no committed data"):
        multi_table_txn(
            spark, cat,
            {"lineage": {"op": "delete_where", "predicate": "1=1"}},
        )


def test_catalog_changes_transaction_consistent_deltas(spark, tmp_path):
    """Deltas between CATALOG versions cut at transaction boundaries:
    the fact delta's row count equals the lineage delta's n_rows sum in
    EVERY window — what per-table cursors cannot guarantee."""
    from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
        catalog_changes,
    )

    cat, facts, lineage = _setup(spark, tmp_path)
    for u in (1, 2, 3):
        multi_table_txn(
            spark, cat,
            {
                "facts": {"op": "append", "df": _fact_df(spark, u, 3 * u)},
                "lineage": {"op": "append", "df": _lineage_df(spark, u, 3 * u)},
            },
        )
    # every (from, to) catalog window is consistent
    for lo in (1, 2, 3):
        for hi in range(lo, 5):
            d = catalog_changes(spark, cat, lo, hi)
            nf = d["facts"].count() if d["facts"] is not None else 0
            nl = (
                d["lineage"].agg(F.sum("n_rows")).collect()[0][0]
                if d["lineage"] is not None
                else 0
            ) or 0
            assert nf == nl, (lo, hi)
    # full window = everything; empty window = None for both
    d = catalog_changes(spark, cat, 1)
    assert d["facts"].count() == 3 + 6 + 9
    d = catalog_changes(spark, cat, 4, 4)
    assert d == {"facts": None, "lineage": None}
    # a rewrite inside the window refuses
    multi_table_txn(
        spark, cat,
        {"facts": {"op": "delete_where", "predicate": "v = 0"}},
    )
    with pytest.raises(ValueError, match="non-append"):
        catalog_changes(spark, cat, 4)
    # ...but a window that STARTS after the rewrite works again
    multi_table_txn(
        spark, cat,
        {"facts": {"op": "append", "df": _fact_df(spark, 9, 2)}},
    )
    d = catalog_changes(spark, cat, 5)
    assert d["facts"].count() == 2 and d["lineage"] is None
    # a COMPACTION step inside the window is skipped, not raised —
    # routine maintenance must not break the downstream-ETL loop
    base_cv = len(catalog_history(spark, cat))
    multi_table_txn(
        spark, cat,
        {"facts": {"op": "append", "df": _fact_df(spark, 10, 3)}},
    )
    multi_table_txn(spark, cat, {"facts": {"op": "compact"}})
    multi_table_txn(
        spark, cat,
        {"facts": {"op": "append", "df": _fact_df(spark, 11, 4)}},
    )
    d = catalog_changes(spark, cat, base_cv)
    assert d["facts"].count() == 7  # both appends, compaction silent


def test_catalog_as_of_cross_table_time_travel(spark, tmp_path):
    import time as _time

    cat, facts, lineage = _setup(spark, tmp_path)
    multi_table_txn(
        spark, cat,
        {
            "facts": {"op": "append", "df": _fact_df(spark, 1, 5)},
            "lineage": {"op": "append", "df": _lineage_df(spark, 1, 5)},
        },
    )
    mid = _time.time()
    _time.sleep(0.05)
    multi_table_txn(
        spark, cat,
        {
            "facts": {"op": "append", "df": _fact_df(spark, 2, 7)},
            "lineage": {"op": "append", "df": _lineage_df(spark, 2, 7)},
        },
    )
    # "the database as of mid": BOTH tables at the first txn's state
    assert catalog_read(spark, cat, "facts", as_of=mid).count() == 5
    assert catalog_read(spark, cat, "lineage", as_of=mid).count() == 1
    assert catalog_read(spark, cat, "facts").count() == 12
    with pytest.raises(ValueError, match="at or before"):
        catalog_pins(spark, cat, as_of=1.0)


def test_catalog_expire_retention_and_min_pinned(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
        catalog_expire,
    )

    cat, facts, lineage = _setup(spark, tmp_path)
    for u in (1, 2, 3, 4):
        multi_table_txn(
            spark, cat,
            {"facts": {"op": "append", "df": _fact_df(spark, u, 2)}},
        )
    res = catalog_expire(spark, cat, keep_last=2)
    assert res["expired"] == 3  # init + txn1 + txn2 dropped
    assert res["min_pinned"] == {"facts": 3}
    hist = catalog_history(spark, cat)
    assert [h["version"] for h in hist] == [4, 5]
    # tip reads unaffected; expired cross-table time travel is gone
    assert catalog_read(spark, cat, "facts").count() == 8
    with pytest.raises(Exception):
        catalog_read(spark, cat, "facts", catalog_version=2)
    # new txns keep working after expiry
    multi_table_txn(
        spark, cat,
        {"facts": {"op": "append", "df": _fact_df(spark, 9, 1)}},
    )
    assert catalog_read(spark, cat, "facts").count() == 9
    with pytest.raises(ValueError, match="keep_last"):
        catalog_expire(spark, cat, keep_last=0)


def test_merge_into_in_txn_upsert_with_audit(spark, tmp_path):
    """Atomic upsert + audit: MERGE the fact table and append the audit
    row in one catalog commit; a lost race redoes the merge rewrite
    against the winner's pin (keys the competitor appended are matched,
    not duplicated)."""
    import mini_project_204721_data_engineering_spark.sources.txn_catalog as tc

    cat, facts, lineage = _setup(spark, tmp_path)
    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "upload_id long, v long"
    )
    multi_table_txn(spark, cat, {"facts": {"op": "append", "df": base}})
    src = spark.createDataFrame(
        [(2, 200), (4, 400)], "upload_id long, v long"
    )
    multi_table_txn(
        spark, cat,
        {
            "facts": {"op": "merge_into", "df": src, "keys": ["upload_id"]},
            "lineage": {"op": "append", "df": _lineage_df(spark, 7, 2)},
        },
    )
    got = {
        (r["upload_id"], r["v"])
        for r in catalog_read(spark, cat, "facts").collect()
    }
    assert got == {(1, 10), (2, 200), (3, 30), (4, 400)}
    assert catalog_read(spark, cat, "lineage").count() == 1

    # fresh-table merge = dedup-guarded insert
    cat2 = str(tmp_path / "cat2")
    from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
        catalog_init,
    )

    catalog_init(spark, cat2, {"t": str(tmp_path / "t2"),
                               "empty": str(tmp_path / "t3")})
    multi_table_txn(
        spark, cat2,
        {"t": {"op": "merge_into", "df": base, "keys": ["upload_id"]}},
    )
    assert catalog_read(spark, cat2, "t").count() == 3
    with pytest.raises(ValueError, match="vacuous"):
        multi_table_txn(
            spark, cat2,
            {"empty": {"op": "merge_into", "df": base,
                       "keys": ["upload_id"],
                       "when_not_matched": "ignore"}},
        )

    # lost-race redo: competitor appends key 5 while our merge stages;
    # our merge source also carries key 5 -> must UPDATE, not duplicate
    real_try = tc._try_write_manifest
    state = {"hit": False}

    def inject(spark_, dir_, version, manifest):
        if (
            not state["hit"] and dir_ == cat
            and manifest.get("op") == "txn"
        ):
            state["hit"] = True
            multi_table_txn(
                spark, cat,
                {"facts": {"op": "append", "df": spark.createDataFrame(
                    [(5, 50)], "upload_id long, v long")}},
            )
        return real_try(spark_, dir_, version, manifest)

    tc._try_write_manifest = inject
    try:
        multi_table_txn(
            spark, cat,
            {"facts": {"op": "merge_into",
                       "df": spark.createDataFrame(
                           [(5, 500)], "upload_id long, v long"),
                       "keys": ["upload_id"]}},
        )
    finally:
        tc._try_write_manifest = real_try
    rows = [
        r
        for r in catalog_read(spark, cat, "facts").collect()
        if r["upload_id"] == 5
    ]
    assert [(r["upload_id"], r["v"]) for r in rows] == [(5, 500)]


def test_model_based_random_txn_sequences(spark, tmp_path):
    """Model-based pin: random transaction sequences (append /
    overwrite / delete_where / merge_into / injected crashes / replays)
    against an in-memory model — after every step the catalog view of
    BOTH tables equals the model, and every historical catalog version
    still replays its recorded state (time-travel consistency)."""
    import random as rnd

    import mini_project_204721_data_engineering_spark.sources.txn_catalog as tc

    class Boom(RuntimeError):
        pass

    for seed in (11, 23):
        rng = rnd.Random(seed)
        root = tmp_path / f"m{seed}"
        cat = str(root / "cat")
        catalog_init(
            spark, cat, {"a": str(root / "a"), "b": str(root / "b")}
        )
        model = {"a": [], "b": []}  # list of (k, v)
        history = []  # (catalog_version, snapshot of model)
        next_k = [0]

        def fresh_rows(n):
            out = [(next_k[0] + i, rng.randrange(100)) for i in range(n)]
            next_k[0] += n
            return out

        def df_of(rows):
            return spark.createDataFrame(rows or [], "k long, v long")

        def apply_model(name, spec):
            if spec["op"] == "append":
                model[name] = model[name] + spec["rows"]
            elif spec["op"] == "overwrite":
                model[name] = list(spec["rows"])
            elif spec["op"] == "delete_where":
                t = spec["thresh"]
                model[name] = [r for r in model[name] if not (r[1] >= t)]
            else:  # merge_into on k
                keys = {r[0] for r in spec["rows"]}
                model[name] = [
                    r for r in model[name] if r[0] not in keys
                ] + spec["rows"]

        def to_writes(specs):
            out = {}
            for name, spec in specs.items():
                if spec["op"] == "delete_where":
                    out[name] = {
                        "op": "delete_where",
                        "predicate": f"v >= {spec['thresh']}",
                    }
                elif spec["op"] == "merge_into":
                    out[name] = {
                        "op": "merge_into",
                        "df": df_of(spec["rows"]),
                        "keys": ["k"],
                    }
                else:
                    out[name] = {"op": spec["op"], "df": df_of(spec["rows"])}
            return out

        for step in range(14):
            specs = {}
            for name in rng.sample(["a", "b"], rng.randint(1, 2)):
                op = rng.choice(
                    ["append", "append", "overwrite", "delete_where",
                     "merge_into"]
                )
                if op == "delete_where":
                    if not model[name]:
                        op = "append"
                if op == "append" or op == "overwrite":
                    specs[name] = {"op": op, "rows": fresh_rows(rng.randint(1, 5))}
                elif op == "delete_where":
                    specs[name] = {
                        "op": "delete_where", "thresh": rng.randrange(100)
                    }
                else:
                    # half existing keys (update), half new (insert)
                    existing = [r[0] for r in model[name]]
                    ks = rng.sample(existing, min(2, len(existing)))
                    rows = [(k, rng.randrange(100)) for k in ks] + fresh_rows(1)
                    specs[name] = {"op": "merge_into", "rows": rows}
            crash = rng.random() < 0.25
            if crash:
                real = tc._try_write_manifest

                def boom(spark_, dir_, version, manifest):
                    if dir_ == cat and manifest.get("op") == "txn":
                        raise Boom()
                    return real(spark_, dir_, version, manifest)

                tc._try_write_manifest = boom
                try:
                    with pytest.raises(Boom):
                        multi_table_txn(spark, cat, to_writes(specs))
                finally:
                    tc._try_write_manifest = real
                # crash BEFORE the catalog commit: model unchanged
            else:
                res = multi_table_txn(spark, cat, to_writes(specs))
                for name, spec in specs.items():
                    apply_model(name, spec)
                history.append(
                    (res["version"], {n: sorted(model[n]) for n in model})
                )
            # invariant: live view == model for both tables
            for name in ("a", "b"):
                if model[name]:
                    got = sorted(
                        (r["k"], r["v"])
                        for r in catalog_read(spark, cat, name).collect()
                    )
                    assert got == sorted(model[name]), (seed, step, name)
                else:
                    try:
                        assert catalog_read(spark, cat, name).count() == 0
                    except ValueError:
                        pass  # never written yet: acceptable empty form
        # time travel: every recorded catalog version replays its state
        for cv, snap in rng.sample(history, min(4, len(history))):
            for name in ("a", "b"):
                if snap[name]:
                    got = sorted(
                        (r["k"], r["v"])
                        for r in catalog_read(
                            spark, cat, name, catalog_version=cv
                        ).collect()
                    )
                    assert got == snap[name], (seed, cv, name)


def test_compact_spec_maintains_enrolled_table(spark, tmp_path):
    """Maintenance reaches enrolled tables THROUGH the catalog: the
    compact spec bin-packs small files as a staged-pin flip — content
    identical, no divergence race with publication, and combinable with
    other tables' writes in one transaction."""
    import glob as _glob

    cat, facts, lineage = _setup(spark, tmp_path)
    for u in range(6):
        multi_table_txn(
            spark, cat,
            {"facts": {"op": "append", "df": _fact_df(spark, u, 50)}},
        )
    before = sorted(
        (r["upload_id"], r["v"])
        for r in catalog_read(spark, cat, "facts").collect()
    )
    n_files_before = len(_glob.glob(f"{facts}/data/*/part-*"))
    res = multi_table_txn(
        spark, cat,
        {
            "facts": {"op": "compact"},
            "lineage": {"op": "append", "df": _lineage_df(spark, 99, 0)},
        },
    )
    assert res["op"] == "txn"
    after = sorted(
        (r["upload_id"], r["v"])
        for r in catalog_read(spark, cat, "facts").collect()
    )
    assert after == before  # content identical
    # the catalog view plans FEWER files now
    files_planned = len(catalog_read(spark, cat, "facts").inputFiles())
    assert files_planned < n_files_before
    assert catalog_read(spark, cat, "lineage").count() == 1
    # published like any txn; single-table tooling agrees
    assert read_snapshot(spark, facts).count() == 300
    # compact on an already-packed table commits NOTHING (no table
    # version, no catalog churn — hourly maintenance jobs must not
    # mint empty versions)
    v = len(catalog_history(spark, cat))
    res = multi_table_txn(spark, cat, {"facts": {"op": "compact"}})
    assert len(catalog_history(spark, cat)) == v
    assert res["version"] == v  # the unchanged tip comes back
    assert (
        len(catalog_read(spark, cat, "facts").inputFiles()) == files_planned
    )
    with pytest.raises(ValueError, match="no committed data"):
        cat2 = str(tmp_path / "c2")
        catalog_init(spark, cat2, {"e": str(tmp_path / "e")})
        multi_table_txn(spark, cat2, {"e": {"op": "compact"}})


def test_compact_spec_zorder_and_sidecars(spark, tmp_path):
    """The catalog compact carries snapshot_compact's full maintenance
    surface: zorder layout (per-column pruning sharpens) and bloom/NDV
    sidecar rebuilds on the packed files (how an enrolled stream-fed
    table gets point-lookup pruning without bypassing the catalog)."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        _read_manifest,
        snapshot_ndv,
    )

    cat, facts, lineage = _setup(spark, tmp_path)
    for i in range(6):
        df = spark.range(i, 600, 6).select(
            F.col("id").alias("upload_id"), (F.col("id") % 37).alias("v")
        ).coalesce(1)
        multi_table_txn(spark, cat, {"facts": {"op": "append", "df": df}})
    multi_table_txn(
        spark, cat,
        {
            "facts": {
                "op": "compact",
                "zorder_by": ["upload_id"],
                "bloom_cols": ["upload_id"],
                "ndv_cols": ["v"],
            }
        },
    )
    tip = _read_manifest(spark, facts, _list_versions(spark, facts)[-1])
    assert (tip.get("bloom") or {}).get("entries"), "bloom sidecars missing"
    assert (tip.get("ndv") or {}).get("entries"), "ndv sidecars missing"
    # zorder: striped ranges became contiguous — a range prune plans a
    # strict subset of the packed files
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        read_snapshot,
    )

    all_files = len(catalog_read(spark, cat, "facts").inputFiles())
    some = len(
        read_snapshot(spark, facts, prune={"upload_id": (0, 50)}).inputFiles()
    )
    assert 0 < some < all_files or all_files == 1
    # ndv sidecars answer through the published table log
    assert abs(snapshot_ndv(spark, facts, "v") - 37) <= 2
    assert catalog_read(spark, cat, "facts").count() == 600
    with pytest.raises(ValueError, match="positive"):
        multi_table_txn(
            spark, cat,
            {"facts": {"op": "compact", "target_file_bytes": 0}},
        )
    with pytest.raises(ValueError, match="bloom"):
        multi_table_txn(
            spark, cat,
            {"facts": {"op": "compact", "bloom_cols": ["nope"]}},
        )


def test_apply_filters_spec_drains_enrolled_table(spark, tmp_path):
    """{"op": "apply_filters"} drains every pending lazy-delete filter
    on the catalog-pinned manifest: read results identical before and
    after, row_filters empties, and a filter-free table is a catalog
    NO-OP (no empty versions from a sweep)."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_delete_where,
    )
    from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
        catalog_resolve,
    )

    t = str(tmp_path / "t")
    snapshot_append(
        spark.range(40).select("id", (F.col("id") % 5).alias("k")).coalesce(2),
        t,
    )
    snapshot_delete_where(spark, t, "k = 1", lazy=True)
    snapshot_delete_where(spark, t, "id < 3", lazy="dv")
    cat = str(tmp_path / "cat")
    catalog_init(spark, cat, {"t": t})
    before = sorted(
        (r["id"], r["k"]) for r in catalog_read(spark, cat, "t").collect()
    )
    multi_table_txn(spark, cat, {"t": {"op": "apply_filters"}})
    m = catalog_resolve(spark, cat, "t")
    assert not m.get("row_filters"), "filters not drained"
    after = sorted(
        (r["id"], r["k"]) for r in catalog_read(spark, cat, "t").collect()
    )
    assert before == after
    # idempotent sweep: nothing pending -> NO catalog churn (the call
    # returns the unchanged tip and mints no versions)
    v = len(catalog_history(spark, cat))
    res = multi_table_txn(spark, cat, {"t": {"op": "apply_filters"}})
    assert res is not None and res["version"] == v
    assert len(catalog_history(spark, cat)) == v


def test_catalog_layout_report_triages_and_heals(spark, tmp_path):
    """The fleet sweep (r14): 3 enrolled tables — one small-file-heavy,
    one takedown-stacked, one healthy — the report names exactly the
    two sick ones with the right write specs; running those specs
    through multi_table_txn heals the report."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_delete_where,
    )
    from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
        catalog_layout_report,
    )

    frag = str(tmp_path / "frag")
    for i in range(6):  # 6 tiny single-file commits -> bin-pack bait
        snapshot_append(
            spark.range(10 * i, 10 * (i + 1))
            .select("id", (F.col("id") % 5).alias("k"))
            .coalesce(1),
            frag,
        )
    stacked = str(tmp_path / "stacked")
    snapshot_append(
        spark.range(100)
        .select("id", (F.col("id") % 10).alias("k"))
        .coalesce(1),
        stacked,
    )
    for kk in range(4):  # 4 pending takedowns -> every read re-filters
        snapshot_delete_where(spark, stacked, f"k = {kk}", lazy="dv")
    healthy = str(tmp_path / "healthy")
    snapshot_append(
        spark.range(50).select("id", (F.col("id") % 5).alias("k")).coalesce(1),
        healthy,
    )
    cat = str(tmp_path / "cat")
    catalog_init(
        spark, cat, {"frag": frag, "stacked": stacked, "healthy": healthy}
    )
    rep = catalog_layout_report(spark, cat)
    assert set(rep["ranked"]) == {"frag", "stacked"}
    assert {s["op"] for s in rep["writes"]["frag"]} == {"compact"}
    assert "apply_filters" in {s["op"] for s in rep["writes"]["stacked"]}
    assert rep["writes"]["healthy"] == []
    assert rep["catalog_actions"] == []  # 1 catalog version, no expire
    # run the recommended calls — each table's specs in order
    rounds = max(len(v) for v in rep["writes"].values())
    for i in range(rounds):
        batch = {
            n: specs[i]
            for n, specs in rep["writes"].items()
            if i < len(specs)
        }
        if batch:
            multi_table_txn(spark, cat, batch)
    healed = catalog_layout_report(spark, cat)
    assert healed["ranked"] == [], healed["tables"]
    assert all(not v for v in healed["writes"].values())
    # content survived the maintenance
    assert catalog_read(spark, cat, "frag").count() == 60
    assert catalog_read(spark, cat, "stacked").count() == 60  # 40 deleted
    assert catalog_read(spark, cat, "healthy").count() == 50


def test_catalog_changes_from_version_zero(spark, tmp_path):
    """from_version=0 means 'from before the catalog existed' — the
    same from-the-beginning spelling snapshot_incremental_read accepts
    (it used to crash with a raw FileNotFound on catalog v0)."""
    from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
        catalog_changes,
    )

    cat, facts, lineage = _setup(spark, tmp_path)
    multi_table_txn(
        spark,
        cat,
        {
            "facts": {"op": "append", "df": _fact_df(spark, 1, 5)},
            "lineage": {"op": "append", "df": _lineage_df(spark, 1, 5)},
        },
    )
    out = catalog_changes(spark, cat, from_version=0)
    assert out["facts"].count() == 5
    assert out["lineage"].count() == 1


def test_catalog_layout_report_expire_recommendation(spark, tmp_path):
    """The sweep also watches the CATALOG's own log: past
    max_catalog_versions it recommends catalog_expire, and running it
    clears the recommendation."""
    from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
        catalog_expire,
        catalog_layout_report,
    )

    cat, facts, lineage = _setup(spark, tmp_path)
    for i in range(4):
        multi_table_txn(
            spark,
            cat,
            {"facts": {"op": "append", "df": _fact_df(spark, i, 3)}},
        )
    rep = catalog_layout_report(spark, cat, max_catalog_versions=3)
    assert rep["catalog_versions"] == 5
    assert any("catalog_expire" in a for a in rep["catalog_actions"])
    catalog_expire(spark, cat, keep_last=2)
    healed = catalog_layout_report(spark, cat, max_catalog_versions=3)
    assert healed["catalog_versions"] == 2
    assert healed["catalog_actions"] == []


def test_catalog_maintain_one_call_loop(spark, tmp_path):
    """catalog_maintain = report -> execute -> re-report in one call;
    a healthy fleet is a no-op (no transactions, no versions minted)."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_delete_where,
    )
    from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
        catalog_maintain,
    )

    frag = str(tmp_path / "frag")
    for i in range(6):
        snapshot_append(
            spark.range(10 * i, 10 * (i + 1))
            .select("id", (F.col("id") % 5).alias("k"))
            .coalesce(1),
            frag,
        )
    stacked = str(tmp_path / "stacked")
    snapshot_append(
        spark.range(100).select("id", (F.col("id") % 10).alias("k")).coalesce(1),
        stacked,
    )
    for kk in range(4):
        snapshot_delete_where(spark, stacked, f"k = {kk}", lazy="dv")
    cat = str(tmp_path / "cat")
    catalog_init(spark, cat, {"frag": frag, "stacked": stacked})
    dry = catalog_maintain(spark, cat, dry_run=True)
    assert dry["executed"] == [] and dry["after"] is None
    assert set(dry["before"]["ranked"]) == {"frag", "stacked"}
    res = catalog_maintain(spark, cat)
    assert res["executed"], "nothing executed on a sick fleet"
    assert res["after"]["ranked"] == []
    # second sweep on the healed fleet: pure no-op
    v = len(catalog_history(spark, cat))
    res2 = catalog_maintain(spark, cat)
    assert res2["executed"] == [] and res2["catalog_expired"] == 0
    assert len(catalog_history(spark, cat)) == v
    assert catalog_read(spark, cat, "frag").count() == 60
    assert catalog_read(spark, cat, "stacked").count() == 60


def test_maintenance_races_appenders(spark, tmp_path):
    """r15 judge task: a catalog_maintain loop (compact write specs
    through multi_table_txn) racing concurrent appenders on a LIVE
    catalog — no lost updates (every appended row survives exactly
    once), bounded redo (nobody exhausts the OCC retry budget), and a
    catalog_changes window spanning the interleaved compact steps
    still reads as the exact append-only delta (compactions skipped,
    never raised)."""
    from concurrent.futures import ThreadPoolExecutor

    from mini_project_204721_data_engineering_spark.sources.txn_catalog import (
        catalog_changes,
        catalog_maintain,
    )

    import threading

    cat = str(tmp_path / "cat")
    catalog_init(spark, cat, {"facts": str(tmp_path / "facts")})
    # fragmented seed: six one-file appends, so the very first sweep
    # already has packing work (the compact action needs >4 small files)
    for j in range(6):
        multi_table_txn(
            spark, cat,
            {"facts": {"op": "append",
                       "df": spark.range(100 * j, 100 * (j + 1)).coalesce(1)}},
        )
    cursor = catalog_history(spark, cat)[-1]["version"]
    WRITERS, PER, ROWS = 3, 5, 100
    errors: list = []
    compact_txns: list = []
    done = threading.Event()

    def appender(w):
        try:
            for i in range(PER):
                df = spark.range(ROWS).select(
                    (F.col("id") + 1_000_000 * (w + 1) + 1_000 * i).alias(
                        "id"
                    )
                ).coalesce(1)
                multi_table_txn(
                    spark, cat, {"facts": {"op": "append", "df": df}}
                )
        except Exception as e:
            errors.append(repr(e))

    def maintainer():
        try:
            while True:
                res = catalog_maintain(
                    spark, cat, target_file_bytes=512 * 1024
                )
                compact_txns.extend(res["executed"])
                if done.is_set():
                    break
                time.sleep(0.2)
        except Exception as e:
            errors.append(repr(e))

    with ThreadPoolExecutor(max_workers=WRITERS + 1) as ex:
        futs = [ex.submit(appender, w) for w in range(WRITERS)]
        mfut = ex.submit(maintainer)
        for f in futs:
            f.result()
        done.set()
        mfut.result()
    assert not errors, errors[:3]
    assert compact_txns, "maintenance never executed — the race is vacuous"
    # no lost updates: every append survived the interleaved compacts
    rows = catalog_read(spark, cat, "facts").collect()
    ids = sorted(r["id"] for r in rows)
    want = sorted(
        list(range(600))
        + [
            1_000_000 * (w + 1) + 1_000 * i + r
            for w in range(WRITERS)
            for i in range(PER)
            for r in range(ROWS)
        ]
    )
    assert ids == want
    # the incremental window spanning every interleaved compact reads
    # as the exact append-only delta
    delta = catalog_changes(spark, cat, cursor)["facts"]
    assert delta is not None
    got = sorted(r["id"] for r in delta.collect())
    assert got == want[600:]
