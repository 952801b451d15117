"""Per-file Bloom sidecars on the snapshot log (sources/snapshots.py
bloom entries): point-lookup file skipping where min/max ranges are
useless — `doc_id = 'x'` on a hash-distributed key.  The load-bearing
property is NO FALSE SKIPS (a bloom may keep too much, never drop a
file holding the value); selectivity is plan-asserted via inputFiles."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _read_manifest,
    expire_snapshots,
    read_snapshot,
    read_snapshot_where,
    snapshot_append,
    snapshot_clone,
    snapshot_compact,
    snapshot_count,
    snapshot_delete_where,
)


def _docid(i: int) -> str:
    return hashlib.md5(str(i).encode()).hexdigest()


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    t = str(tmp_path_factory.mktemp("bloom") / "t")
    rows = [(i, _docid(i)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id bigint, doc_id string").repartition(8)
    snapshot_append(df, t, bloom_cols=["doc_id", "id"])
    return t


def test_point_lookup_plans_few_files_with_zero_false_skips(spark, bloom_table):
    t = bloom_table
    n_files = len(_read_manifest(spark, t, 1)["files"])
    assert n_files == 8
    # selectivity: a hash-distributed key prunes NOTHING by min/max
    # range (every file spans the hex space) but the bloom plans ~1 file
    planned = []
    for i in (0, 17, 555, 1234, 1999):
        got = read_snapshot_where(spark, t, f"doc_id = '{_docid(i)}'")
        planned.append(len(got.inputFiles()))
        rows = got.collect()
        assert [r["id"] for r in rows] == [i]  # found — never a false skip
    assert max(planned) < n_files
    # the integer key probes too
    got = read_snapshot_where(spark, t, "id = 777")
    assert len(got.inputFiles()) < n_files
    assert got.count() == 1
    # IN lists probe every member
    pred = f"doc_id IN ('{_docid(3)}', '{_docid(1998)}')"
    got2 = read_snapshot_where(spark, t, pred)
    assert {r["id"] for r in got2.collect()} == {3, 1998}
    # absent key: empty result (files planned may be 0 or a false
    # positive's worth — either way no rows)
    assert read_snapshot_where(spark, t, "doc_id = 'nope'").count() == 0
    # and snapshot_count goes through the same pruning
    assert snapshot_count(spark, t, where=f"doc_id = '{_docid(42)}'") == 1


def test_every_key_is_findable_exhaustively(spark, bloom_table):
    """The no-false-negative property, checked for EVERY key at once:
    the bloom-pruned union of per-key reads must equal the table.  One
    query per key is too slow for 2000 keys — instead verify via a
    single equality per file-worth of sampled keys across the space."""
    t = bloom_table
    for i in range(0, 2000, 97):  # 21 keys spread across the space
        assert (
            read_snapshot_where(spark, t, f"doc_id = '{_docid(i)}'").count()
            == 1
        ), i


def test_cross_family_literal_keeps_files(spark, bloom_table):
    """A literal outside the column's type family never bloom-prunes
    (conservative): string-spelled number on the bigint key."""
    t = bloom_table
    got = read_snapshot_where(spark, t, "id = '777'")
    # no bloom (nor range, str-vs-int stats) pruning: all files planned
    assert len(got.inputFiles()) == 8
    assert got.count() == 1  # SQL casts and finds it


def test_bloom_survives_widening_append(spark, tmp_path):
    """Probe hashes at the entry's RECORDED build type: after an
    int→bigint widening, lookups still find keys written as int (a
    current-type probe would hash bigint and false-skip every file)."""
    t = str(tmp_path / "t")
    old = spark.createDataFrame([(i,) for i in range(100)], "k int")
    snapshot_append(old.repartition(2), t, bloom_cols=["k"])
    new = spark.createDataFrame([(1000,)], "k bigint")
    snapshot_append(new.repartition(1), t, merge_schema=True)
    m = _read_manifest(spark, t, 2)
    assert m["schema"] == "struct<k:bigint>"
    for k in (7, 63, 1000):
        got = read_snapshot_where(spark, t, f"k = {k}")
        assert got.count() == 1, k
    # and pruning still bites (old files' blooms usable via recorded type)
    got = read_snapshot_where(spark, t, "k = 7")
    assert len(got.inputFiles()) < 3


def test_refusals_and_validation(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 2.5)], "k bigint, v double")
    with pytest.raises(ValueError, match="integral or string"):
        snapshot_append(df, t, bloom_cols=["v"])
    with pytest.raises(ValueError, match="not in the written schema"):
        snapshot_append(df, t, bloom_cols=["nope"])


def test_rewrites_carry_and_drop_bloom_entries(spark, tmp_path):
    """A CoW delete drops rewritten files from bloom entries (their
    replacements have no blooms — never pruned, sound); untouched
    files keep theirs; compaction rebuilds for the packed output."""
    t = str(tmp_path / "t")
    for j in range(4):
        df = spark.createDataFrame(
            [(i, _docid(i)) for i in range(j * 50, (j + 1) * 50)],
            "id bigint, doc_id string",
        ).repartition(1)
        snapshot_append(df, t, bloom_cols=["doc_id"] if j == 0 else None)
    m = _read_manifest(spark, t, 4)
    assert len(m["bloom"]["entries"]) == 4  # sticky built one per commit
    snapshot_delete_where(spark, t, "id BETWEEN 50 AND 99")  # CoW file 2
    m2 = _read_manifest(spark, t, 5)
    # the rewritten file left its entry; 3 entries remain
    assert len(m2["bloom"]["entries"]) == 3
    for i in (0, 120, 199):
        assert (
            read_snapshot_where(spark, t, f"doc_id = '{_docid(i)}'").count()
            == 1
        ), i
    # compact packs everything and rebuilds ONE entry for the output
    mc = snapshot_compact(spark, t)
    assert len(mc["bloom"]["entries"]) == 1
    assert set(mc["bloom"]["entries"][0]["files"]) >= set(
        mc["files"]
    ) - set(m2["files"])
    for i in (0, 120, 199):
        assert (
            read_snapshot_where(spark, t, f"doc_id = '{_docid(i)}'").count()
            == 1
        ), i


def test_expire_gcs_unreferenced_bloom_sidecars(spark, tmp_path):
    import os

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, _docid(i)) for i in range(100)], "id bigint, doc_id string"
    )
    snapshot_append(df.repartition(2), t, bloom_cols=["doc_id"])
    old_sidecar = _read_manifest(spark, t, 1)["bloom"]["entries"][0]["sidecar"]
    snapshot_compact(spark, t, small_file_bytes=10**9)
    got = expire_snapshots(spark, t, keep_last=1, orphan_min_age_seconds=0.0)
    assert got["deleted_bloom_sidecars"] == 1
    assert not os.path.exists(old_sidecar.replace("file:", ""))
    # the live sidecar answers
    assert read_snapshot_where(spark, t, f"doc_id = '{_docid(5)}'").count() == 1


def test_clone_copies_bloom_sidecars(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, _docid(i)) for i in range(100)], "id bigint, doc_id string"
    )
    snapshot_append(df.repartition(2), t, bloom_cols=["doc_id"])
    src_sidecar = _read_manifest(spark, t, 1)["bloom"]["entries"][0]["sidecar"]
    c = str(tmp_path / "c")
    snapshot_clone(spark, t, c)
    for e in _read_manifest(spark, c, 1)["bloom"]["entries"]:
        assert str(tmp_path / "c") in e["sidecar"]
        assert e["sidecar"] != src_sidecar
    # the source GC-ing its own sidecar (simulated directly — a full
    # source expire would also sweep the borrowed DATA files, the
    # separately-documented shallow-clone hazard) leaves the clone
    # probing through its own copy
    import shutil

    shutil.rmtree(src_sidecar.replace("file:", ""))
    got = read_snapshot_where(spark, c, f"doc_id = '{_docid(7)}'")
    assert got.count() == 1 and len(got.inputFiles()) <= 1


def test_bloom_result_always_equals_residual_filter(spark, bloom_table):
    """The contract: read_snapshot_where ≡ read_snapshot().filter(pred),
    bloom or not."""
    t = bloom_table
    for pred in (
        f"doc_id = '{_docid(100)}'",
        f"doc_id IN ('{_docid(1)}', 'missing', '{_docid(2)}')",
        f"doc_id = '{_docid(3)}' AND id < 10",
        f"doc_id = '{_docid(3)}' OR doc_id = '{_docid(1500)}'",
        "id = 55 AND doc_id IS NOT NULL",
    ):
        want = {r["id"] for r in read_snapshot(spark, t).filter(pred).collect()}
        got = {r["id"] for r in read_snapshot_where(spark, t, pred).collect()}
        assert got == want, pred


def test_out_of_int64_literal_keeps_files_no_crash(spark, bloom_table):
    """Review fix: an equality literal past int64 must not crash the
    probe (F.lit would raise before try_cast) — it conservatively
    skips bloom pruning; the residual filter answers (nothing)."""
    t = bloom_table
    got = read_snapshot_where(spark, t, "id = 99999999999999999999")
    assert got.count() == 0


def test_plan_info_bloom_option_matches_read_plan(spark, bloom_table):
    """snapshot_plan_info(bloom=True) prices the point lookup the way
    read_snapshot_where actually plans it; the zero-job default stays
    an upper bound."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_plan_info,
    )

    t = bloom_table
    pred = f"doc_id = '{_docid(321)}'"
    upper = snapshot_plan_info(spark, t, pred)
    exact = snapshot_plan_info(spark, t, pred, bloom=True)
    planned = len(read_snapshot_where(spark, t, pred).inputFiles())
    assert exact["files_planned"] == planned
    assert upper["files_planned"] >= exact["files_planned"]
    assert exact["bytes_planned"] <= upper["bytes_planned"]


def test_sticky_bloom_cols_survive_unsupported_schema(spark, tmp_path):
    """Review fix: an overwrite whose schema lacks (or mistypes) a
    sticky bloom column keeps the column CONFIGURED — building resumes
    when the schema supports it again (sticky stats_cols contract)."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, _docid(i)) for i in range(50)], "id bigint, doc_id string"
    )
    snapshot_append(df.repartition(1), t, bloom_cols=["doc_id"])
    # schema change drops the column: nothing builds, config survives
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        snapshot_overwrite,
    )

    m2 = snapshot_overwrite(spark.createDataFrame([(1,)], "id bigint"), t)
    assert m2["bloom"]["cols"] == ["doc_id"]
    assert m2["bloom"]["entries"] == []
    # the column comes back: blooms build again with NO explicit arg
    m3 = snapshot_overwrite(df.repartition(1), t)
    assert m3["bloom"]["cols"] == ["doc_id"]
    assert len(m3["bloom"]["entries"]) == 1
    got = read_snapshot_where(spark, t, f"doc_id = '{_docid(7)}'")
    assert got.count() == 1


def test_explicit_bad_bloom_cols_raise_before_writing_bytes(spark, tmp_path):
    """Review fix: explicit bloom_cols validation runs BEFORE the data
    write (like _validate_stats) — a mis-typed call leaves no orphan
    files behind."""
    import os

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 2.5)], "k bigint, v double")
    with pytest.raises(ValueError, match="integral or string"):
        snapshot_append(df, t, bloom_cols=["v"])
    assert not os.path.exists(os.path.join(t, "data"))


def test_bloom_on_table_path_with_space_no_false_skip(spark, tmp_path):
    """Review pass-2 CONFIRMED bug: _metadata.file_path is URL-encoded
    ('a dir' → 'a%20dir') while the manifest stores the decoded
    spelling — the sidecar must record the MANIFEST spelling or the
    probe's candidate filter matches nothing and every file silently
    prunes (0 rows for a present key)."""
    t = str(tmp_path / "bloom dir" / "t")  # space → URL-encoding differs
    df = spark.createDataFrame(
        [(i, _docid(i)) for i in range(200)], "id bigint, doc_id string"
    ).repartition(4)
    snapshot_append(df, t, bloom_cols=["doc_id"])
    for i in (0, 99, 199):
        got = read_snapshot_where(spark, t, f"doc_id = '{_docid(i)}'")
        assert got.count() == 1, i
    # and pruning still bites (sidecar usable, not just conservative)
    got = read_snapshot_where(spark, t, f"doc_id = '{_docid(42)}'")
    assert len(got.inputFiles()) < 4


def test_compact_explicit_bad_bloom_cols_raise_before_repack(spark, tmp_path):
    """Review pass-2: compact validates explicit bloom_cols BEFORE
    paying for the repack — no stranded packed files."""
    import os

    t = str(tmp_path / "t")
    for i in range(3):
        snapshot_append(
            spark.createDataFrame([(i, 2.5)], "k bigint, v double"), t
        )
    data_dirs = set(os.listdir(os.path.join(t, "data")))
    with pytest.raises(ValueError, match="integral or string"):
        snapshot_compact(spark, t, bloom_cols=["v"])
    assert set(os.listdir(os.path.join(t, "data"))) == data_dirs


def test_compact_bad_bloom_cols_raise_even_when_nothing_to_pack(spark, tmp_path):
    """Review pass-4: a mistyped bloom_cols= must raise on a table with
    <2 small files too — a silent no-op would mask the typo until small
    files accumulate weeks later."""
    t = str(tmp_path / "t")
    snapshot_append(spark.createDataFrame([(1, 2.5)], "k bigint, v double"), t)
    with pytest.raises(ValueError, match="integral or string"):
        snapshot_compact(spark, t, bloom_cols=["v"])
