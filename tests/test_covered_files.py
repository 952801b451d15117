"""Full-coverage file detection (sources/snapshots.py::_cover_atoms /
_file_covered / _covered_split): the converse of pruning — a file whose
manifest bounds prove the WHERE predicate TRUE for every row (atoms
inside the requested ranges, null-free) is answered from metadata by
snapshot_count(where=) / snapshot_agg(where=), so a filtered serving
count over a date-laid-out table scans only the boundary files a range
cuts through.  Soundness is the UNSAFE direction here (over-claiming
coverage = wrong answers), so the strict parser refuses anything it
cannot prove and a hypothesis property checks random conjunctions
against the real scan."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _cover_atoms,
    read_snapshot,
    snapshot_agg,
    snapshot_append,
    snapshot_count,
    snapshot_delete_where,
    snapshot_plan_info,
)


def test_cover_atoms_strict_grammar():
    assert _cover_atoms("a > 5") == [("cmp", "a", ">", 5)]
    assert _cover_atoms("5 < a") == [("cmp", "a", ">", 5)]
    assert _cover_atoms("a >= 1 AND (b <= 2 AND c = 'x')") == [
        ("cmp", "a", ">=", 1),
        ("cmp", "b", "<=", 2),
        ("cmp", "c", "=", "x"),
    ]
    assert _cover_atoms("d BETWEEN DATE '2024-01-01' AND DATE '2024-01-31'") == [
        ("between", "d", ("date", "2024-01-01"), ("date", "2024-01-31"))
    ]
    assert _cover_atoms("k IN (1, 2, 3)") == [("in", "k", frozenset({1, 2, 3}))]
    assert _cover_atoms("v IS NOT NULL AND w IS NULL") == [
        ("null", "v", False),
        ("null", "w", True),
    ]
    assert _cover_atoms("a != 7") == [("cmp", "a", "!=", 7)]
    # anything unprovable refuses the WHOLE predicate
    assert _cover_atoms("a > 5 OR b < 2") is None
    assert _cover_atoms("NOT (a > 5)") is None
    assert _cover_atoms("abs(a) > 5") is None
    assert _cover_atoms("a > b") is None
    assert _cover_atoms("a + 1 > 5") is None
    assert _cover_atoms("a > 5 AND lower(s) = 'x'") is None


def _table(spark, tmp_path):
    """Three daily single-file commits + one file with NULLs."""
    t = str(tmp_path / "t")
    for i, day in enumerate(["2024-01-01", "2024-01-02", "2024-01-03"]):
        df = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id"),
            (F.col("id") % 7).cast("double").alias("v"),
            F.lit(day).cast("date").alias("day"),
            F.concat(F.lit("u"), F.format_string("%03d", F.col("id"))).alias("s"),
        )
        snapshot_append(df.coalesce(1), t, stats_cols=["id", "v", "day", "s"])
    nulls = spark.range(300, 320).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.col("id").cast("double")).alias("v"),
        F.lit(None).cast("date").alias("day"),
        F.lit(None).cast("string").alias("s"),
    )
    snapshot_append(nulls.coalesce(1), t)
    return t


PREDS = [
    "id >= 0",                                     # covers everything
    "id >= 100 AND id < 200",                      # exactly one file
    "id > 50 AND id <= 250",                       # cuts two boundaries
    "day = DATE '2024-01-02'",
    "day BETWEEN DATE '2024-01-01' AND DATE '2024-01-02'",
    "day = '2024-01-03'",                          # plain ISO string
    "s >= 'u000' AND s < 'u100'",
    "v >= 0",                                      # null v rows must drop
    "day IS NULL",
    "day IS NOT NULL AND id < 150",
    "id != 9999",
    "id IN (5, 105, 205)",
    "id >= 100 AND day >= '2024-01-02'",
]


@pytest.mark.parametrize("pred", PREDS)
def test_count_where_equals_scan(spark, tmp_path, pred):
    t = _table(spark, tmp_path)
    want = read_snapshot(spark, t).filter(pred).count()
    assert snapshot_count(spark, t, where=pred) == want


def test_covered_count_reads_zero_data_files(spark, tmp_path):
    t = _table(spark, tmp_path)
    # NB: a strict bound widens to inclusive at the PRUNE layer, so
    # `id < 200` keeps (and scans) the file starting at 200 — the
    # inclusive BETWEEN spelling prunes exactly and covers fully
    info = snapshot_plan_info(spark, t, "id BETWEEN 100 AND 199")
    assert info["files_covered"] == 1 and info["files_planned"] == 1
    assert info["bytes_scanned"] == 0
    data_dir = str(tmp_path / "t" / "data")
    shutil.move(data_dir, data_dir + ".hidden")
    try:
        # whole-file ranges: pure manifest arithmetic, no bytes needed
        assert snapshot_count(spark, t, where="id BETWEEN 100 AND 199") == 100
        assert snapshot_count(
            spark, t, where="day BETWEEN '2024-01-01' AND '2024-01-03'"
        ) == 300
        assert snapshot_count(spark, t, where="day IS NULL") == 20
        got = snapshot_agg(
            spark,
            t,
            {"n": "count(*)", "s": "sum(id)"},
            group_by="day",
            where="day IS NOT NULL",
        )
        import datetime

        assert got == {
            datetime.date(2024, 1, 1): {"n": 100, "s": sum(range(100))},
            datetime.date(2024, 1, 2): {"n": 100, "s": sum(range(100, 200))},
            datetime.date(2024, 1, 3): {"n": 100, "s": sum(range(200, 300))},
        }
    finally:
        shutil.move(data_dir + ".hidden", data_dir)


def test_boundary_files_scan_and_merge(spark, tmp_path):
    t = _table(spark, tmp_path)
    pred = "id > 50 AND id <= 250 AND day IS NOT NULL"
    want = read_snapshot(spark, t).filter(pred).count()
    assert snapshot_count(spark, t, where=pred) == want == 200
    # agg hybrid: the fully-covered middle file is metadata, the two
    # boundary files scan — structural proof: hide ONLY the middle file
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        _covered_split,
        _read_manifest,
    )

    m = _read_manifest(spark, t, 4)
    covered, rest = _covered_split(spark, m, pred)
    assert len(covered) == 1 and len(rest) == 2
    local = covered[0].replace("file:", "")
    shutil.move(local, local + ".hidden")
    try:
        got = snapshot_agg(spark, t, {"n": "count(*)", "mx": "max(id)"},
                           where=pred)
        assert got == {"n": 200, "mx": 250}
    finally:
        shutil.move(local + ".hidden", local)


def test_pending_filters_exclude_coverage(spark, tmp_path):
    t = _table(spark, tmp_path)
    snapshot_delete_where(spark, t, "id = 150", lazy=True)
    pred = "id >= 100 AND id < 200"
    assert snapshot_count(spark, t, where=pred) == 99
    got = snapshot_agg(spark, t, {"n": "count(*)"}, where=pred)
    assert got == {"n": 99}


def test_conservative_domains_still_exact(spark, tmp_path):
    """Hazard spellings never claim coverage but must stay EXACT via
    the scan fallback: typed literal on a string column, non-ISO
    spellings, cross-type literals."""
    t = str(tmp_path / "t")
    df = spark.range(0, 50).select(
        F.col("id"),
        F.date_format(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")),
            "yyyy-MM-dd",
        ).alias("sday"),
    )
    snapshot_append(df.coalesce(1), t, stats_cols=["id", "sday"])
    for pred in [
        "sday = DATE '2024-01-10'",      # typed literal vs string column
        "sday >= '2024-1-2'",            # non-canonical spelling
        "id = '7'",                      # string literal vs int column
    ]:
        want = read_snapshot(spark, t).filter(pred).count()
        assert snapshot_count(spark, t, where=pred) == want


def test_lax_temporal_spellings_never_claim_coverage(spark, tmp_path):
    """Python's fromisoformat is laxer than Spark's cast: compact
    '20240101' (3.11+) and tz offsets on an NTZ comparison parse
    driver-side but Spark treats them differently — the strict
    spelling gate must push both to the scan so behavior matches the
    read_snapshot().filter() contract exactly (including raising when
    ANSI raises)."""
    import datetime

    t = str(tmp_path / "t")
    df = spark.range(0, 10).select(
        F.col("id"),
        F.lit("2024-01-01").cast("date").alias("day"),
        F.lit("2024-01-01 00:00:00").cast("timestamp_ntz").alias("ts"),
    )
    snapshot_append(df.coalesce(1), t, stats_cols=["day", "ts"])
    # compact date spelling: Spark's ANSI cast raises on the scan side;
    # a metadata answer here would be a silent wrong result
    lax = "day = '20240101'"
    try:
        want = read_snapshot(spark, t).filter(lax).count()
        assert snapshot_count(spark, t, where=lax) == want
    except Exception as e:
        with pytest.raises(type(e)):
            snapshot_count(spark, t, where=lax)
    # tz-offset literal against an NTZ column: must scan, answers equal
    for pred in [
        "ts < '2024-01-01 00:00:00+05:00'",
        "ts <= '2024-01-01T00:00:00'",  # T separator IS canonical
        "ts >= '2024-01-01 00:00:00.5'",
    ]:
        try:
            want = read_snapshot(spark, t).filter(pred).count()
        except Exception as e:
            with pytest.raises(type(e)):
                snapshot_count(spark, t, where=pred)
            continue
        assert snapshot_count(spark, t, where=pred) == want, pred
    # the canonical spellings DO cover: zero-scan proof
    shutil.move(str(tmp_path / "t" / "data"), str(tmp_path / "t" / "data.h"))
    try:
        assert snapshot_count(spark, t, where="day = '2024-01-01'") == 10
        assert snapshot_count(
            spark, t, where="ts >= '2024-01-01 00:00:00'"
        ) == 10
    finally:
        shutil.move(str(tmp_path / "t" / "data.h"), str(tmp_path / "t" / "data"))
    assert isinstance(datetime.date.fromisoformat("2024-01-01"), datetime.date)


def test_hypothesis_random_conjunctions_match_scan(spark, tmp_path):
    """Property: for random conjunctions of supported atom shapes over
    a nullable mixed-type table, the hybrid count ≡ the real scan."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    t = _table(spark, tmp_path)
    full = read_snapshot(spark, t).cache()
    full.count()

    num_atom = st.builds(
        lambda col, op, v: f"{col} {op} {v}",
        st.sampled_from(["id", "v"]),
        st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
        st.integers(min_value=-5, max_value=330),
    )
    day_atom = st.builds(
        lambda op, d: f"day {op} '2024-01-{d:02d}'",
        st.sampled_from(["=", "<", "<=", ">", ">="]),
        st.integers(min_value=1, max_value=4),
    )
    null_atom = st.builds(
        lambda col, n: f"{col} IS {'NOT ' if n else ''}NULL",
        st.sampled_from(["day", "v", "s"]),
        st.booleans(),
    )
    between_atom = st.builds(
        lambda lo, w: f"id BETWEEN {lo} AND {lo + w}",
        st.integers(min_value=-10, max_value=320),
        st.integers(min_value=0, max_value=150),
    )
    atom = st.one_of(num_atom, day_atom, null_atom, between_atom)

    str_atom = st.builds(
        lambda op, i: f"s {op} 'u{i:03d}'",
        st.sampled_from(["=", "<", "<=", ">", ">="]),
        st.integers(min_value=0, max_value=330),
    )
    atom = st.one_of(atom, str_atom)

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(atom, min_size=1, max_size=3))
    def prop(atoms):
        pred = " AND ".join(atoms)
        assert snapshot_count(spark, t, where=pred) == full.filter(pred).count()

    prop()


def test_hypothesis_grouped_agg_where_matches_scan(spark, tmp_path):
    """Property for the riskiest merge logic: grouped snapshot_agg
    under random conjunctive predicates ≡ the real filtered groupBy —
    exercising the covered/boundary split, per-group accumulator merge,
    NULL groups and sum/avg/min/max finalization together."""
    import math as _math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    t = _table(spark, tmp_path)
    full = read_snapshot(spark, t).cache()
    full.count()

    atom = st.one_of(
        st.builds(
            lambda op, v: f"id {op} {v}",
            st.sampled_from(["<", "<=", ">", ">="]),
            st.integers(min_value=-5, max_value=330),
        ),
        st.builds(
            lambda op, d: f"day {op} '2024-01-{d:02d}'",
            st.sampled_from(["=", "<", "<=", ">", ">="]),
            st.integers(min_value=1, max_value=4),
        ),
        st.builds(
            lambda n: f"v IS {'NOT ' if n else ''}NULL", st.booleans()
        ),
    )

    def close(a, b):
        if a is None or b is None:
            return a is None and b is None
        if isinstance(a, float) or isinstance(b, float):
            if _math.isnan(a) or _math.isnan(b):
                return _math.isnan(a) and _math.isnan(b)
            return _math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)
        return a == b

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(atom, min_size=1, max_size=2))
    def prop(atoms):
        pred = " AND ".join(atoms)
        got = snapshot_agg(
            spark,
            t,
            {"n": "count(*)", "nv": "count(v)", "s": "sum(v)",
             "mn": "min(v)", "mx": "max(v)", "a": "avg(v)"},
            group_by="day",
            where=pred,
        )
        want = {
            r["day"]: r
            for r in full.filter(pred)
            .groupBy("day")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("v").alias("nv"),
                F.sum("v").alias("s"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
                F.avg("v").alias("a"),
            )
            .collect()
        }
        assert set(got) == set(want), pred
        for k in want:
            for a in ("n", "nv", "s", "mn", "mx", "a"):
                assert close(got[k][a], want[k][a]), (pred, k, a)

    prop()


def test_backslash_literals_refuse_coverage_and_prune(spark, tmp_path):
    """Spark's SQL parser decodes backslash escapes in string literals
    by default ('C:\\temp' -> 'C:<TAB>emp'); the manifest tokenizer
    keeps text verbatim.  Comparing the raw text against file min/max
    would claim coverage (or prune) on the WRONG value — so any string
    literal containing a backslash must refuse both extraction paths
    and fall through to the Spark-evaluated residual filter."""
    from mini_project_204721_data_engineering_spark.sources.snapshots import (
        _predicate_prune_ranges,
    )

    # unit level: both extractors refuse the whole predicate
    assert _cover_atoms(r"s = 'C:\temp'") is None
    assert _cover_atoms(r"s >= 'a\b' AND id > 0") is None
    assert _predicate_prune_ranges(r"s = 'C:\temp'") == {}
    assert _predicate_prune_ranges(r"s = 'C:\temp' AND id > 5") == {}

    # end-to-end: a single-file table whose s is constant at the RAW
    # backslash string.  Spark decodes the predicate literal's \t to a
    # TAB, so the true filtered count is 0; a verbatim-text coverage
    # claim (min==max=='C:\\temp') would have answered 20.
    t = str(tmp_path / "bs")
    df = spark.range(20).select(
        F.col("id"), F.lit("C:\\temp").alias("s")
    )
    snapshot_append(df.coalesce(1), t, stats_cols=["id", "s"])
    pred = r"s = 'C:\temp'"
    want = read_snapshot(spark, t).filter(pred).count()
    assert snapshot_count(spark, t, where=pred) == want
    # and the raw value IS reachable through Spark's own escaping
    pred2 = r"s = 'C:\\temp'"
    want2 = read_snapshot(spark, t).filter(pred2).count()
    assert want2 == 20
    assert snapshot_count(spark, t, where=pred2) == want2


def test_plan_info_bytes_scanned_excludes_empty_files(spark, tmp_path):
    """A rows==0 file is dropped from both sides of _covered_split and
    never opened by snapshot_count/snapshot_agg — plan_info must not
    price it into bytes_scanned."""
    t = str(tmp_path / "pe")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    snapshot_append(df.coalesce(1), t, stats_cols=["id", "v"])
    empty = spark.range(0).select(
        F.col("id"), F.lit(None).cast("double").alias("v")
    )
    snapshot_append(empty.coalesce(1), t)
    info = snapshot_plan_info(spark, t, predicate="id >= 50")
    # the data file is range-cut (not covered) so it scans; the empty
    # file must contribute zero scan bytes even though it has no stats
    assert info["files_covered"] == 0
    data_bytes = snapshot_plan_info(spark, t, predicate="id >= 0")
    # id >= 0 fully covers the data file -> nothing scans at all
    assert data_bytes["bytes_scanned"] == 0
    assert 0 < info["bytes_scanned"] < info["bytes_total"]
