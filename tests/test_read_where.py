"""read_snapshot_where: the engine derives manifest file-skipping from an
ordinary SQL WHERE clause (the reference's serving-path shape — dynamic
equality + date-range predicates, `backend/app/main.py:252-263`) instead
of a hand-built ``prune={"col": (lo, hi)}`` dict.  Extraction is
CONSERVATIVE: results must always equal ``read_snapshot().filter(pred)``;
the pruned file set must equal the hand-built dict's."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _predicate_prune_ranges,
    read_snapshot,
    read_snapshot_where,
    snapshot_append,
    snapshot_delete_where,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(F.col("id"), F.lit(tag).alias("tag"))


def _ids(df):
    return {r["id"] for r in df.collect()}


@pytest.mark.parametrize("pred,want", [
    ("id = 5", {"id": (5, 5)}),
    ("id >= 10 AND id < 20", {"id": (10, 20)}),
    ("ts BETWEEN '2024-01-01' AND '2024-02-01' AND k = 5",
     {"ts": ("2024-01-01", "2024-02-01"), "k": (5, 5)}),
    ("day = DATE '2024-01-02'",
     {"day": {"typed": ("2024-01-02", "2024-01-02")}}),
    ("ts < TIMESTAMP '2024-01-01 03:00:00'",
     {"ts": {"typed": (None, "2024-01-01 03:00:00")}}),
    ("id IN (3, 7, 5)", {"id": frozenset({3, 7, 5})}),  # SET, not envelope
    ("id IN (3, 7, 5) AND id >= 5", {"id": frozenset({7, 5})}),  # set ∧ range
    ("id IN (3, 7) AND id IN (7, 9)", {"id": frozenset({7})}),  # set ∧ set
    ("id IN (3) AND id IN (9)", {"id": frozenset()}),  # unsatisfiable
    ("id IN ('5') AND id IN (5)", {"id": None}),  # str/num mix: disable
    # two spellings of ONE instant are unequal as text: any set
    # intersection touching differing date/ts spellings must DISABLE,
    # never silently empty (pass-4 review regression — prune-all bug)
    ("ts IN (TIMESTAMP '2024-01-01') AND ts >= TIMESTAMP '2024-01-01 00:00:00'",
     {"ts": None}),
    ("day IN (DATE '2024-01-01') AND day IN (TIMESTAMP '2024-01-01 00:00:00')",
     {"day": None}),
    ("ts IN (TIMESTAMP '2024-01-01 03:00:00.5') AND ts IN (TIMESTAMP '2024-01-01 03:00:00.50')",
     {"ts": None}),  # fractions never compare as text
    # identical spelling class stays sharp
    ("day IN (DATE '2024-01-01', DATE '2024-03-01') AND day >= DATE '2024-02-01'",
     {"day": {"typed": frozenset({"2024-03-01"})}}),
    ("5 <= id AND 10 > id", {"id": (5, 10)}),  # literal-on-the-left flips
    ("(id > 5) AND (id < 9)", {"id": (5, 9)}),
    ("(a BETWEEN 1 AND 5 AND b = 2)", {"a": (1, 5), "b": (2, 2)}),
    ("name = 'o''brien'", {"name": ("o'brien", "o'brien")}),
    ("v <= 1.5e2", {"v": (None, 150.0)}),
    # single-column OR prunes by UNION (every disjunct constrains it)
    ("id < 10 OR id >= 900", {"id": {"any": [(None, 10), (900, None)]}}),
    ("k = 5 AND (id < 10 OR id >= 900)",
     {"k": (5, 5), "id": {"any": [(None, 10), (900, None)]}}),
    ("(id < 10 OR id >= 900) AND id < 950",
     {"id": {"any": [(None, 10), (900, 950)]}}),  # union ∧ range distributes
    ("(id < 10 AND k = 1) OR (id > 900 AND k = 2)",
     {"id": {"any": [(None, 10), (900, None)]},
      "k": {"any": [(1, 1), (2, 2)]}}),
    ("id IN (5) OR id BETWEEN 900 AND 910",
     {"id": {"any": [frozenset({5}), (900, 910)]}}),
    # conservative: these shapes prove nothing and must contribute nothing
    ("id > 5 OR name = 'x'", {}),  # disjuncts constrain different columns
    ("id > 5 AND (name = 'x' OR v < 2)", {"id": (5, None)}),
    ("NOT id = 5 AND v = 2", {"v": (2, 2)}),
    ("a NOT BETWEEN 1 AND 5 AND b = 2", {"b": (2, 2)}),
    ("substr(name, 1, 2) = 'ab' AND id = 3", {"id": (3, 3)}),
    ("id + 1 > 5", {}),
    ("id IS NOT NULL AND id = 4", {"id": (4, 4)}),
    # nullness atoms extract to prune requests (r12)
    ("id IS NULL", {"id": {"null": True}}),
    ("id IS NOT NULL", {"id": {"null": False}}),
    ("id IS NULL AND id = 4", {"id": frozenset()}),  # never TRUE together
    ("id IS NULL AND id IS NOT NULL", {"id": frozenset()}),
    ("id IS NULL OR id > 100",
     {"id": {"any": [{"null": True}, (100, None)]}}),
    ("id IS NULL OR id IS NULL", {"id": {"any": [{"null": True}]}}),
    ("(id IS NULL OR id < 3) AND id IS NOT NULL",
     {"id": {"any": [(None, 3)]}}),  # null branch ∧ NOT NULL folds away
    ("id IS NOT TRUE", {}),  # IS-family beyond NULL: no contribution
    ("id IS DISTINCT FROM 5", {}),
    ("id != 7", {}),
    ("id > -5", {}),  # unary minus: out of grammar → no extraction
    ("id = 1e+", {}),  # malformed exponent: tokenizer error → no extraction
    ("id > ²", {}),  # isdigit()-true non-\d char degrades, never crashes
    ("id = ½3", {}),
    ("id = 1e3 AND v = .5", {"id": (1000.0, 1000.0), "v": (0.5, 0.5)}),
    ("v < 2.E2", {"v": (None, 200.0)}),  # dotted exponent spelling
    # contradictory types on one column disable that column's pruning
    ("id = 'x' AND id = 5", {"id": None}),
])
def test_predicate_range_extraction(pred, want):
    assert _predicate_prune_ranges(pred) == want


def test_read_where_plans_same_files_as_handbuilt_prune(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 100, "a").repartition(1), t, stats_cols=["id"])
    snapshot_append(_df(spark, 100, 200, "b").repartition(1), t)
    snapshot_append(_df(spark, 200, 300, "c").repartition(1), t)

    got = read_snapshot_where(spark, t, "id BETWEEN 120 AND 150")
    hand = read_snapshot(spark, t, prune={"id": (120, 150)})
    assert sorted(got.inputFiles()) == sorted(hand.inputFiles())
    assert len(got.inputFiles()) == 1  # only the 100-199 file survives
    # result ≡ unpruned + filter, always
    full = read_snapshot(spark, t).filter("id BETWEEN 120 AND 150")
    assert _ids(got) == _ids(full) == set(range(120, 151))

    # conjunction of an extractable range and a residual-only atom: the
    # range prunes, the residual still filters rows
    got2 = read_snapshot_where(spark, t, "id >= 250 AND tag != 'nope'")
    assert len(got2.inputFiles()) == 1
    assert _ids(got2) == set(range(250, 300))


def test_read_where_derived_date_stats_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")

    def day_rows(day, lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"),
            (F.lit(f"2024-01-{day:02d} 00:00:00").cast("timestamp_ntz")
             + F.make_interval(mins=F.col("id") % 600)).alias("ts"),
            F.lit(f"2024-01-{day:02d}").cast("date").alias("day"),
        )

    snapshot_append(day_rows(1, 0, 50).repartition(1), t, stats_cols=["day"])
    snapshot_append(day_rows(2, 50, 100).repartition(1), t)
    snapshot_append(day_rows(3, 100, 150).repartition(1), t)

    got = read_snapshot_where(spark, t, "day = DATE '2024-01-02'")
    assert len(got.inputFiles()) == 1
    assert _ids(got) == set(range(50, 100))

    # version pin flows through
    got_v1 = read_snapshot_where(spark, t, "day >= DATE '2024-01-01'", version=1)
    assert _ids(got_v1) == set(range(50))


def test_read_where_or_union_prunes_the_middle(spark, tmp_path):
    """A single-column OR prunes by union: the head-and-tail read plans
    2 of 5 files; a multi-column OR still degrades to the full scan
    with the exact answer."""
    t = str(tmp_path / "t")
    for k in range(5):
        snapshot_append(
            _df(spark, k * 100, (k + 1) * 100, f"f{k}").repartition(1),
            t, stats_cols=["id"] if k == 0 else None,
        )
    got = read_snapshot_where(spark, t, "id < 10 OR id >= 490")
    assert len(got.inputFiles()) == 2  # first + last; middle 3 pruned
    assert _ids(got) == set(range(10)) | set(range(490, 500))
    # OR over DIFFERENT columns: nothing provable → full plan, exact rows
    got2 = read_snapshot_where(spark, t, "id < 10 OR tag = 'f4'")
    assert len(got2.inputFiles()) == 5
    assert _ids(got2) == set(range(10)) | set(range(400, 500))


def test_read_where_respects_pending_lazy_deletes(spark, tmp_path):
    """read_snapshot_where goes through the merge-on-read path: a pending
    lazy takedown must be invisible even in the pruned read."""
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 100, "a").repartition(1), t, stats_cols=["id"])
    snapshot_append(_df(spark, 100, 200, "b").repartition(1), t)
    snapshot_delete_where(spark, t, "id BETWEEN 120 AND 130", lazy=True)
    got = read_snapshot_where(spark, t, "id >= 100")
    assert len(got.inputFiles()) == 1
    assert _ids(got) == set(range(100, 200)) - set(range(120, 131))


def test_read_where_files_planned_scale_with_selectivity(spark, tmp_path):
    """The 100 TB property in miniature: files planned ∝ range width,
    not table size."""
    t = str(tmp_path / "t")
    for k in range(10):
        snapshot_append(
            _df(spark, k * 100, (k + 1) * 100, f"f{k}").repartition(1),
            t, stats_cols=["id"] if k == 0 else None,
        )
    widths = {}
    for width in (50, 250, 450):
        got = read_snapshot_where(spark, t, f"id >= 0 AND id < {width}")
        widths[width] = len(got.inputFiles())
        assert _ids(got) == set(range(width))
    assert widths[50] == 1 and widths[250] == 3 and widths[450] == 5


def test_bare_date_bound_on_timestamp_stats_is_exact(spark, tmp_path):
    """Review regression: a bare-date string bound ('2024-02-01') casts
    to MIDNIGHT in SQL but sorted lexicographically BEFORE the stats'
    SQL spelling ('2024-02-01 00:00:00') — a file whose min is exactly
    midnight of the bound day was wrongly pruned while its midnight row
    matches.  Bound normalization must keep the contract result ≡
    read_snapshot().filter(pred) exact."""
    t = str(tmp_path / "t")
    early = spark.range(0, 5).select(
        F.col("id"),
        (F.lit("2024-01-15 12:00:00").cast("timestamp_ntz")).alias("ts"),
    )
    # this file's MIN ts is exactly midnight of the upper-bound day
    boundary = spark.range(100, 101).select(
        F.col("id"),
        (F.lit("2024-02-01 00:00:00").cast("timestamp_ntz")).alias("ts"),
    )
    late = spark.range(200, 205).select(
        F.col("id"),
        (F.lit("2024-03-01 00:00:00").cast("timestamp_ntz")).alias("ts"),
    )
    snapshot_append(early.repartition(1), t, stats_cols=["ts"])
    snapshot_append(boundary.repartition(1), t)
    snapshot_append(late.repartition(1), t)

    pred = "ts BETWEEN '2024-01-01' AND '2024-02-01'"
    got = read_snapshot_where(spark, t, pred)
    want = read_snapshot(spark, t).filter(pred)
    assert _ids(got) == _ids(want) == set(range(5)) | {100}
    # pruning still bites: the March file stays unplanned
    assert len(got.inputFiles()) == 2
    # equality on a bare date against a timestamp column: same hazard
    got_eq = read_snapshot_where(spark, t, "ts = '2024-02-01'")
    assert _ids(got_eq) == {100}


def test_noncanonical_time_spellings_never_misprune(spark, tmp_path):
    """Pass-2 review regression: unpadded dates ('2024-2-1') and ISO 'T'
    separators cast fine in SQL but sort differently as text — those
    spellings must DISABLE the column's pruning (full scan, exact
    result), while minutes-only and fractional spellings normalize to
    the stats' spelling and stay exact."""
    t = str(tmp_path / "t")

    def day_rows(lo, hi, day):
        return spark.range(lo, hi).select(
            F.col("id"),
            (F.lit(f"{day} 00:00:00").cast("timestamp_ntz")
             + F.make_interval(mins=F.col("id") % 90)).alias("ts"),
            F.lit(day).cast("date").alias("day"),
        )

    snapshot_append(day_rows(0, 5, "2024-01-15").repartition(1), t,
                    stats_cols=["ts", "day"])
    snapshot_append(day_rows(100, 105, "2024-03-15").repartition(1), t)

    cases = [
        "day >= '2024-2-1'",                  # unpadded: disable, not misprune
        "ts > '2024-01-31T23:00:00'",         # 'T' separator: disable
        "ts >= '2024-03-15 00:05'",           # minutes-only: normalized exact
        "ts <= '2024-01-15 00:30:00.000000'", # zero fraction: stripped exact
        "ts <= '2024-01-15 00:30:00.5'",      # fraction: padded exact
        "day <= '2024-01-15 12:00:00'",       # ts-spelled vs date: truncated
    ]
    for pred in cases:
        got = read_snapshot_where(spark, t, pred)
        want = read_snapshot(spark, t).filter(pred)
        assert _ids(got) == _ids(want), pred
    # the normalized spellings still prune (1 of 2 files planned)
    assert len(read_snapshot_where(spark, t, "ts >= '2024-03-15 00:05'").inputFiles()) == 1
    assert len(read_snapshot_where(spark, t, "day <= '2024-01-15 12:00:00'").inputFiles()) == 1


def test_contradictory_parenthesized_types_degrade_not_crash():
    """Pass-2 regression: a parenthesized subexpression returning the
    None disable-sentinel crashed _merge_range with a NoneType unpack."""
    assert _predicate_prune_ranges("id = 7 AND (id = 'x' AND id = 5)") == {"id": None}
    assert _predicate_prune_ranges("(id = 'x' AND id = 5) AND id = 7") == {"id": None}


def test_in_set_pruning_skips_between_members(spark, tmp_path):
    """IN-set pruning tests each MEMBER against a file's range: a sparse
    IN (5, 955) skips every file strictly between the two values, where
    the old (min, max) envelope kept the whole span."""
    t = str(tmp_path / "t")
    for k in range(10):
        snapshot_append(
            _df(spark, k * 100, (k + 1) * 100, f"f{k}").repartition(1),
            t, stats_cols=["id"] if k == 0 else None,
        )
    got = read_snapshot_where(spark, t, "id IN (5, 955)")
    assert len(got.inputFiles()) == 2  # first + last file only
    assert _ids(got) == {5, 955}
    # the hand-built SET form works too, and matches the WHERE form
    # (a 2-element LIST keeps its historical range meaning)
    hand = read_snapshot(spark, t, prune={"id": {5, 955}})
    assert sorted(hand.inputFiles()) == sorted(got.inputFiles())
    # set ∧ range conjunction tightens further
    got2 = read_snapshot_where(spark, t, "id IN (5, 955) AND id > 100")
    assert len(got2.inputFiles()) == 1
    assert _ids(got2) == {955}
    # unsatisfiable conjunction: zero files planned, zero rows — still
    # exactly read_snapshot().filter(pred)
    got3 = read_snapshot_where(spark, t, "id IN (5) AND id IN (955)")
    assert len(got3.inputFiles()) == 0 and got3.count() == 0
    # str/num mixed IN disables pruning but never wrongs the answer
    got4 = read_snapshot_where(spark, t, "id IN ('5') AND id IN (5)")
    assert _ids(got4) == {5}
    assert len(got4.inputFiles()) == 10  # disabled → full plan


def test_in_set_pruning_date_members_normalize(spark, tmp_path):
    t = str(tmp_path / "t")

    def day_rows(day, lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"), F.lit(day).cast("date").alias("day")
        )

    snapshot_append(day_rows("2024-01-01", 0, 5).repartition(1), t, stats_cols=["day"])
    snapshot_append(day_rows("2024-02-01", 100, 105).repartition(1), t)
    snapshot_append(day_rows("2024-03-01", 200, 205).repartition(1), t)
    got = read_snapshot_where(
        spark, t, "day IN (DATE '2024-01-01', DATE '2024-03-01')"
    )
    assert len(got.inputFiles()) == 2
    assert _ids(got) == set(range(5)) | set(range(200, 205))


def test_list_prune_bound_keeps_range_meaning(spark, tmp_path):
    """Pass-4 review regression: a 2-element LIST passed as a prune
    bound (e.g. a JSON round-trip of a (lo, hi) tuple) must keep its
    historical RANGE meaning — only set/frozenset means IN."""
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 100, "a").repartition(1), t, stats_cols=["id"])
    snapshot_append(_df(spark, 100, 200, "b").repartition(1), t)
    hand = read_snapshot(spark, t, prune={"id": [120, 150]})
    assert len(hand.inputFiles()) == 1
    assert _ids(hand.filter("id BETWEEN 120 AND 150")) == set(range(120, 151))


def test_unsatisfiable_in_prunes_even_without_stats(spark, tmp_path):
    """Pass-4 review regression: an empty IN intersection is
    unsatisfiable INDEPENDENT of stats — zero files planned even for a
    table written without stats_cols."""
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 100, "a").repartition(1), t)  # NO stats
    got = read_snapshot_where(spark, t, "id IN (3) AND id IN (9)")
    assert len(got.inputFiles()) == 0 and got.count() == 0


def test_spelling_mixed_in_set_disables_not_misprunes(spark, tmp_path):
    """End-to-end pin of the pass-4 prune-all bug: equal instants in
    different spellings meeting a set must fall back to a full scan
    with the exact filtered answer."""
    t = str(tmp_path / "t")
    df = spark.range(0, 5).select(
        F.col("id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
         + F.make_interval(hours=F.col("id"))).alias("ts"),
    )
    snapshot_append(df.repartition(1), t, stats_cols=["ts"])
    pred = "ts IN (TIMESTAMP '2024-01-01') AND ts >= TIMESTAMP '2024-01-01 00:00:00'"
    got = read_snapshot_where(spark, t, pred)
    assert len(got.inputFiles()) == 1  # disabled → planned, not pruned away
    assert _ids(got) == {0}


def test_union_branches_coalesce_and_never_blow_up():
    """Pass-5 review regression: N AND-ed OR-pairs on one column used to
    multiply to 2^N union branches (18 conjuncts → 262k; ~30 → planning
    death).  Simplification drops empty products and coalesces
    overlaps, so the result is the TRUE interval set — and a cap
    disables the column rather than stalling the driver."""
    import time

    pred = " AND ".join(f"(a < {2 * k + 1} OR a > {2 * k + 2})" for k in range(18))
    t0 = time.time()
    got = _predicate_prune_ranges(pred)
    assert time.time() - t0 < 1.0
    assert len(got["a"]["any"]) == 19  # the satisfiable intervals, exactly
    # subsumed/duplicate disjuncts collapse
    assert _predicate_prune_ranges("id < 10 OR id < 20 OR id < 10") == {
        "id": {"any": [(None, 20)]}
    }
    assert _predicate_prune_ranges("id IN (1, 2) OR id IN (2, 3)") == {
        "id": {"any": [frozenset({1, 2, 3})]}
    }


def test_union_pruning_end_to_end_interval_set(spark, tmp_path):
    """The coalesced interval set plans exactly the overlapping files
    and the residual filter keeps the answer exact."""
    t = str(tmp_path / "t")
    for k in range(5):
        snapshot_append(
            _df(spark, k * 100, (k + 1) * 100, f"f{k}").repartition(1),
            t, stats_cols=["id"] if k == 0 else None,
        )
    pred = "(id < 150 OR id >= 450) AND (id < 50 OR id >= 420)"
    got = read_snapshot_where(spark, t, pred)
    # true region: id < 50 ∪ id >= 450 (the cross terms are empty and
    # get dropped as provably-empty products) → files 0, 4
    assert len(got.inputFiles()) == 2
    assert _ids(got) == set(range(50)) | set(range(450, 500))
    assert _ids(got) == _ids(read_snapshot(spark, t).filter(pred))


def test_read_where_residual_filter_pushes_to_scan(spark, tmp_path):
    """Two pruning layers must compose: manifest file-skipping plans the
    file subset, and Catalyst pushes the residual predicate into the
    parquet scan of the survivors (PushedFilters), so row groups inside
    a kept file still skip on footer stats."""
    from mini_project_204721_data_engineering_spark.plans.checks import (
        has_pushed_filters,
    )

    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 100, "a").repartition(1), t, stats_cols=["id"])
    snapshot_append(_df(spark, 100, 200, "b").repartition(1), t)
    df = read_snapshot_where(spark, t, "id BETWEEN 120 AND 150 AND tag = 'b'")
    assert len(df.inputFiles()) == 1  # manifest layer
    assert has_pushed_filters(df, "id")  # scan layer
    assert has_pushed_filters(df, "tag")
    assert _ids(df) == set(range(120, 151))


# ---------------------------------------------------------------------------
# Property: extraction + pruning is SOUND.  For ANY predicate the grammar
# may (partially) extract, a file whose per-column [min, max] contains a
# row SATISFYING the predicate must never be pruned.  The oracle is a
# direct structural evaluator: over non-null integers, Python comparison
# semantics are exactly SQL's for this closed grammar (=, </<=/>/>=,
# BETWEEN, IN, AND, OR), so no engine is needed; hypothesis shrinks
# counterexamples.
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

from mini_project_204721_data_engineering_spark.sources.snapshots import (
    _prune_files,
)

def _eval_pred(sql: str, env: dict) -> bool:
    """Evaluate the closed test grammar with SQL semantics over
    non-null ints: quoted digit literals CAST numerically (as Spark and
    DuckDB do against a bigint column), then Python comparison is
    exactly SQL's."""
    import re as _re

    py = _re.sub(r"'(\d+)'", r"\1", sql)  # the numeric cast
    py = py.replace(" = ", " == ")
    py = _re.sub(
        r"(\b[ab]\b) BETWEEN (\d+) AND (\d+)", r"(\2 <= \1 <= \3)", py
    )
    py = py.replace(" AND ", " and ").replace(" OR ", " or ")
    py = _re.sub(r"(\b[ab]\b) IN \(([^)]*)\)", r"(\1 in (\2,))", py)
    return bool(eval(py, {}, dict(env)))


_lit = st.integers(0, 20)
_col = st.sampled_from(["a", "b"])

_atom = st.one_of(
    st.tuples(_col, st.sampled_from(["=", "<", "<=", ">", ">="]), _lit).map(
        lambda t: f"{t[0]} {t[1]} {t[2]}"
    ),
    # quoted digit literals: SQL casts them numerically against the
    # bigint column, Python text order disagrees — the extractor must
    # stay sound anyway (pass-6 hazard class)
    st.tuples(_col, st.sampled_from(["=", "<", "<=", ">", ">="]), _lit).map(
        lambda t: f"{t[0]} {t[1]} '{t[2]}'"
    ),
    st.tuples(_col, st.lists(_lit, min_size=1, max_size=3)).map(
        lambda t: f"{t[0]} IN ({', '.join(repr(str(v)) for v in t[1])})"
    ),
    st.tuples(_col, _lit, _lit).map(
        lambda t: f"{t[0]} BETWEEN {min(t[1], t[2])} AND {max(t[1], t[2])}"
    ),
    st.tuples(_col, st.lists(_lit, min_size=1, max_size=4)).map(
        lambda t: f"{t[0]} IN ({', '.join(map(str, t[1]))})"
    ),
)

_expr = st.recursive(
    _atom,
    lambda sub: st.tuples(sub, st.sampled_from(["AND", "OR"]), sub).map(
        lambda t: f"({t[0]} {t[1]} {t[2]})"
    ),
    max_leaves=8,
)


@given(pred=_expr, row=st.tuples(_lit, _lit), span=st.integers(0, 3))
@settings(max_examples=400, deadline=None)
def test_extraction_pruning_soundness_property(pred, row, span):
    a, b = row
    sat = _eval_pred(pred, {"a": a, "b": b})
    if not sat:
        return  # soundness constrains only satisfying rows
    ranges = {
        c: r for c, r in _predicate_prune_ranges(pred).items() if r is not None
    }
    manifest = {
        "files": ["f"],
        "schema": "struct<a:bigint,b:bigint>",
        "stats": {"f": {"a": [a - span, a + span], "b": [b - span, b + span]}},
    }
    kept = _prune_files(manifest, ranges)
    assert kept == ["f"], (pred, row, ranges)


def test_digit_string_literals_never_misprune(spark, tmp_path):
    """Pass-6 review regression: Python text order ('5' > '10') must
    never DROP a branch or EMPTY a set that SQL's numeric cast
    satisfies — untyped-string decisions keep, they never drop."""
    # extraction level: the set/branch survives or the column disables
    assert _predicate_prune_ranges("id IN ('10') AND id >= '5'") == {"id": None}
    assert _predicate_prune_ranges("id IN ('5') AND id IN ('5.0')") == {"id": None}
    got = _predicate_prune_ranges("(id >= '5' AND id <= '10') OR id = 0")
    assert got["id"]["any"] and len(got["id"]["any"]) == 2  # branch kept
    # end-to-end: the cast-satisfying rows come back
    t = str(tmp_path / "t")
    snapshot_append(_df(spark, 0, 4, "a").repartition(1), t, stats_cols=["id"])
    snapshot_append(_df(spark, 6, 10, "b").repartition(1), t)
    pred = "(id >= '5' AND id <= '10') OR id = 0"
    gotdf = read_snapshot_where(spark, t, pred)
    assert _ids(gotdf) == _ids(read_snapshot(spark, t).filter(pred)) == {0, 6, 7, 8, 9}
    pred2 = "id IN ('8') AND id >= '5'"
    got2 = read_snapshot_where(spark, t, pred2)
    assert _ids(got2) == _ids(read_snapshot(spark, t).filter(pred2)) == {8}


def test_equal_instant_spellings_never_drop_a_branch():
    """Same class of hazard with timestamps: '2024-01-01 00:00:00' vs
    '2024-01-01' are one instant, reversed as text — the BETWEEN branch
    must survive (spelling normalization aligns it later)."""
    got = _predicate_prune_ranges(
        "(ts BETWEEN '2024-01-01 00:00:00' AND '2024-01-01') "
        "OR ts = '2025-06-01 00:00:00'"
    )
    assert len(got["ts"]["any"]) == 2


def test_timed_spellings_on_date_columns_never_drop(spark, tmp_path):
    """Pass-7 review regression: on a DATE column the cast TRUNCATES, so
    two text-ordered 'm'/'s'-spelled instants can be SQL-equal — only
    bare-date spellings are drop/removal-safe at extraction time."""
    # the "text-empty" BETWEEN is non-empty after the date cast
    got = _predicate_prune_ranges(
        "(d BETWEEN '2024-01-01 23:00' AND '2024-01-01 01:00') OR d = '2025-06-01'"
    )
    assert len(got["d"]["any"]) == 2  # branch kept
    # the IN removal would empty the set → must disable instead
    assert _predicate_prune_ranges(
        "d IN ('2024-01-01 01:00') AND d >= '2024-01-01 23:00'"
    ) == {"d": None}
    assert _predicate_prune_ranges(
        "d IN ('2024-01-01 01:00:00') AND d IN ('2024-01-01 23:00:00')"
    ) == {"d": None}
    # end-to-end on a real DATE column: rows survive
    t = str(tmp_path / "t")
    rows = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2025-06-01")], "id bigint, ds string"
    ).select("id", F.col("ds").cast("date").alias("d"))
    snapshot_append(rows.repartition(2), t, stats_cols=["d"])
    pred = ("(d BETWEEN '2024-01-01 23:00:00' AND '2024-01-01 01:00:00') "
            "OR d = '2025-06-01'")
    gotdf = read_snapshot_where(spark, t, pred)
    assert _ids(gotdf) == _ids(read_snapshot(spark, t).filter(pred)) == {1, 2}
    # bare-date drops stay sharp: a genuinely empty date range still
    # contributes a droppable branch
    sharp = _predicate_prune_ranges(
        "(d BETWEEN DATE '2024-01-05' AND DATE '2024-01-01') OR d = DATE '2025-06-01'"
    )
    assert sharp["d"]["typed"]["any"] == [("2025-06-01", "2025-06-01")]


def test_null_pruning_end_to_end(spark, tmp_path):
    """IS NULL plans only files with recorded nulls; IS NOT NULL (and
    plain ranges) skip all-null files — results always ≡ the residual
    filter over the full snapshot."""
    t = str(tmp_path / "t")
    clean = spark.createDataFrame([(i, i * 10) for i in range(10)], "id bigint, v bigint")
    allnull = spark.createDataFrame(
        [(100 + i, None) for i in range(5)], "id bigint, v bigint"
    )
    mixed = spark.createDataFrame(
        [(200, 7), (201, None)], "id bigint, v bigint"
    )
    snapshot_append(clean.repartition(1), t, stats_cols=["v"])
    snapshot_append(allnull.repartition(1), t)
    snapshot_append(mixed.repartition(1), t)

    def planned(pred):
        return len(read_snapshot_where(spark, t, pred).inputFiles())

    # IS NULL: the null-free file is skipped
    assert planned("v IS NULL") == 2
    got = read_snapshot_where(spark, t, "v IS NULL")
    assert _ids(got) == {100, 101, 102, 103, 104, 201}
    # IS NOT NULL: the all-null file is skipped (needs rows from file_meta)
    assert planned("v IS NOT NULL") == 2
    assert _ids(read_snapshot_where(spark, t, "v IS NOT NULL")) == set(
        range(10)
    ) | {200}
    # a plain range also skips the all-null file now
    assert planned("v >= 0") == 2
    # IS NULL ∧ range: unsatisfiable — ZERO files planned
    assert planned("v IS NULL AND v > 3") == 0
    # union: null-or-high keeps the all-null file AND the matching clean file
    pred = "v IS NULL OR v >= 90"
    assert _ids(read_snapshot_where(spark, t, pred)) == {
        9, 100, 101, 102, 103, 104, 201
    }


def test_null_pruning_ignores_legacy_two_element_stats(spark, tmp_path):
    """Stats written before null counts ([min, max] entries) contribute
    nothing to nullness pruning — conservative, never wrong."""
    import json

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, None), (2, 5)], "id bigint, v bigint")
    snapshot_append(df.repartition(1), t, stats_cols=["v"])
    mpath = str(tmp_path / "t" / "_manifests" / ("v%010d.json" % 1))
    with open(mpath) as fh:
        m = json.load(fh)
    for f in m["stats"]:
        m["stats"][f]["v"] = m["stats"][f]["v"][:2]  # legacy shape
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    got = read_snapshot_where(spark, t, "v IS NULL")
    assert len(got.inputFiles()) == 1  # kept (no null info), not mispruned
    assert _ids(got) == {1}


# --- nullable soundness property: tree-generated predicates, Kleene
# evaluation, single-row files with [min, max, nulls] stats -----------------

_ncol = st.sampled_from(["a", "b"])
_natom = st.one_of(
    st.tuples(_ncol, st.sampled_from(["=", "<", "<=", ">", ">="]), _lit).map(
        lambda t: ("cmp", t[0], t[1], t[2])
    ),
    _ncol.map(lambda c: ("isnull", c)),
    _ncol.map(lambda c: ("notnull", c)),
    st.tuples(_ncol, st.lists(_lit, min_size=1, max_size=4)).map(
        lambda t: ("in", t[0], t[1])
    ),
    st.tuples(_ncol, _lit, _lit).map(
        lambda t: ("between", t[0], min(t[1], t[2]), max(t[1], t[2]))
    ),
)
_ntree = st.recursive(
    _natom,
    lambda sub: st.tuples(st.sampled_from(["and", "or"]), sub, sub),
    max_leaves=8,
)


def _render_tree(t) -> str:
    k = t[0]
    if k in ("and", "or"):
        return f"({_render_tree(t[1])} {k.upper()} {_render_tree(t[2])})"
    if k == "isnull":
        return f"{t[1]} IS NULL"
    if k == "notnull":
        return f"{t[1]} IS NOT NULL"
    if k == "cmp":
        return f"{t[1]} {t[2]} {t[3]}"
    if k == "in":
        return f"{t[1]} IN ({', '.join(map(str, t[2]))})"
    return f"{t[1]} BETWEEN {t[2]} AND {t[3]}"


def _ev_tree(t, env):
    """SQL three-valued logic: True / False / None (unknown)."""
    k = t[0]
    if k == "and":
        l, r = _ev_tree(t[1], env), _ev_tree(t[2], env)
        if l is False or r is False:
            return False
        if l is None or r is None:
            return None
        return True
    if k == "or":
        l, r = _ev_tree(t[1], env), _ev_tree(t[2], env)
        if l is True or r is True:
            return True
        if l is None or r is None:
            return None
        return False
    v = env[t[1]]
    if k == "isnull":
        return v is None
    if k == "notnull":
        return v is not None
    if v is None:
        return None  # comparisons with NULL are unknown
    if k == "cmp":
        op, lit = t[2], t[3]
        return {
            "=": v == lit, "<": v < lit, "<=": v <= lit,
            ">": v > lit, ">=": v >= lit,
        }[op]
    if k == "in":
        return v in t[2]
    return t[2] <= v <= t[3]


@given(
    tree=_ntree,
    row=st.tuples(st.none() | _lit, st.none() | _lit),
)
@settings(max_examples=400, deadline=None)
def test_null_extraction_pruning_soundness_property(tree, row):
    """For ANY predicate over nullable columns, a single-row file whose
    row SATISFIES it (SQL TRUE, not just not-FALSE) must never be
    pruned — with stats carrying exact [min, max, nulls] and file_meta
    rows, the sharpest information the engine ever has."""
    a, b = row
    if _ev_tree(tree, {"a": a, "b": b}) is not True:
        return
    sql = _render_tree(tree)
    ranges = {
        c: r for c, r in _predicate_prune_ranges(sql).items() if r is not None
    }

    def stat(v):
        return [v, v, 0] if v is not None else [None, None, 1]

    manifest = {
        "files": ["f"],
        "schema": "struct<a:bigint,b:bigint>",
        "stats": {"f": {"a": stat(a), "b": stat(b)}},
        "file_meta": {"f": {"rows": 1, "bytes": 1}},
    }
    assert _prune_files(manifest, ranges) == ["f"], (sql, row, ranges)


def test_typed_literal_on_string_column_never_misprunes(spark, tmp_path):
    """Review pass-3 CONFIRMED bug: Spark compares a DATE/TIMESTAMP
    literal against a STRING column by casting the COLUMN — the
    literal's text is not the comparison domain, so text-order pruning
    (and bloom hashing) on it mis-pruned files whose stored text
    differs from the literal yet casts equal.  Typed literals now
    disable string-column pruning; date/timestamp columns keep it."""
    t = str(tmp_path / "t")
    a = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "id bigint, s string"
    )
    b = spark.createDataFrame(
        [(2, "2025-05-05 00:00:00")], "id bigint, s string"
    )
    snapshot_append(a.repartition(1), t, stats_cols=["s"])
    snapshot_append(b.repartition(1), t)
    for pred in ("s = DATE '2024-01-01'", "s = TIMESTAMP '2024-01-01 00:00'"):
        got = read_snapshot_where(spark, t, pred)
        want = read_snapshot(spark, t).filter(pred)
        assert _ids(got) == _ids(want) == {1}, pred
    # untyped text equality on the same column stays sharp (1 of 2)
    got2 = read_snapshot_where(spark, t, "s = '2024-01-01 00:00:00'")
    assert len(got2.inputFiles()) == 1 and _ids(got2) == {1}
    # extraction level: typed wrapper on a string column disables,
    # plain text does not
    assert _predicate_prune_ranges("s = DATE '2024-01-01'") == {
        "s": {"typed": ("2024-01-01", "2024-01-01")}
    }


def test_typed_literal_on_string_bloom_column_keeps_files(spark, tmp_path):
    """The bloom probe must not hash a typed literal's text against a
    string column's filter (same cast-domain hazard)."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2025-05-05 00:00:00")],
        "id bigint, s string",
    )
    snapshot_append(df.repartition(2), t, bloom_cols=["s"])
    got = read_snapshot_where(spark, t, "s = DATE '2024-01-01'")
    assert _ids(got) == {1}
