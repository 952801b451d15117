"""Heavy hitters via Misra-Gries candidates + exact recount
(operators/heavy.py): output ≡ plain GROUP BY / HAVING on every
layout, completeness under adversarial spreading, MG invariants."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.operators.heavy import (
    _mg_merge,
    heavy_hitters,
)


def _plain(df, keys, threshold):
    total = df.na.drop("any", subset=keys).count()
    return {
        tuple(r[k] for k in keys): r["n"]
        for r in (
            df.na.drop("any", subset=keys)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= threshold * total)
            .collect()
        )
    }


def _got(df, keys, threshold, **kw):
    return {
        tuple(r[k] for k in keys): r["n"]
        for r in heavy_hitters(df, keys, threshold, **kw).collect()
    }


def test_equals_plain_group_by_having_across_layouts(spark):
    rng = random.Random(204721)
    # zipf-ish: key i appears ~ 3000/(i+1) times + a long unique tail
    rows = []
    for i in range(50):
        rows += [(f"k{i}",)] * (3000 // (i + 1))
    rows += [(f"tail{j}",) for j in range(5000)]
    rng.shuffle(rows)
    base = spark.createDataFrame(rows, "k string")
    for parts in (1, 7, 32):
        df = base.repartition(parts)
        for th in (0.05, 0.01, 0.002):
            assert _got(df, ["k"], th) == _plain(df, ["k"], th), (parts, th)


def test_multi_column_keys_and_long_types(spark):
    rows = [(i % 4, i % 3) for i in range(6000)] + [(99, 99)] * 10
    df = spark.createDataFrame(rows, "a long, b int").repartition(8)
    th = 0.05
    assert _got(df, ["a", "b"], th) == _plain(df, ["a", "b"], th)


def test_adversarial_thin_spread_key_is_found(spark):
    """A key BARELY above threshold, spread evenly across partitions so
    no partition sees it as locally dominant — pigeonhole + the MG
    bound must still surface it (the completeness theorem's edge)."""
    th = 0.01
    n_filler = 9_899
    hot = 101  # share 101/10000 > 0.01, by one row
    rows = [("hot",)] * hot + [(f"u{j}",) for j in range(n_filler)]
    df = spark.createDataFrame(rows, "k string").repartition(32)
    got = _got(df, ["k"], th, summary_size=100)  # tightest legal m
    assert got[("hot",)] == hot
    assert got == _plain(df, ["k"], th)


def test_null_keys_ignored_per_contract(spark):
    rows = [("a",)] * 50 + [(None,)] * 100 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k string").repartition(4)
    got = _got(df, ["k"], 0.5)  # N = 55 non-null rows; a has 50/55
    assert got == {("a",): 50}


def test_refusals(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="threshold"):
        heavy_hitters(df, ["k"], 0.0)
    with pytest.raises(ValueError, match="completeness"):
        heavy_hitters(df, ["k"], 0.01, summary_size=50)
    # STRICT bound: m + 1 == 1/threshold is NOT enough (a key exactly
    # at the threshold can be zeroed by one merge) — must refuse
    with pytest.raises(ValueError, match="completeness"):
        heavy_hitters(df, ["k"], 0.5, summary_size=1)
    with pytest.raises(ValueError, match="keys"):
        heavy_hitters(df, [], 0.1)
    with pytest.raises(ValueError, match="collides"):
        heavy_hitters(df, ["k"], 0.1, count_col="k")


def test_emptied_summary_partition_still_counts_toward_n(spark):
    """A near-uniform partition can zero out its whole MG state — the
    partition's rows must STILL reach N via a marker row, or keys from
    other partitions inflate into false-positive heavy hitters."""
    # P0: 5 unique keys (MG with m=2 empties), P1: 'a' x3.  N=8, θ=0.5
    # → cutoff 4 → NO key qualifies.  An N undercount (N=3 from P1
    # alone) would wrongly report 'a'.
    data = [(f"u{i}",) for i in range(5)] + [("a",)] * 3
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 2), "k string"
    )
    assert _got(df, ["k"], 0.5, summary_size=2) == {}
    assert _plain(df, ["k"], 0.5) == {}
    # and a key that DOES qualify alongside an emptied partition is
    # still reported with its exact count
    data2 = [(f"u{i}",) for i in range(5)] + [("a",)] * 6
    df2 = spark.createDataFrame(
        spark.sparkContext.parallelize(data2, 2), "k string"
    )
    got = _got(df2, ["k"], 0.5, summary_size=2)
    assert got == _plain(df2, ["k"], 0.5) == {("a",): 6}


def test_mg_merge_invariants():
    """Direct MG checks: the dict never exceeds m, and the undercount
    of any key is bounded by total_weight/(m+1)."""
    rng = random.Random(7)
    m = 10
    state: dict = {}
    truth: dict = {}
    total = 0
    for _ in range(200):
        batch = {}
        for _ in range(rng.randrange(1, 30)):
            k = f"k{rng.randrange(40)}"
            w = rng.randrange(1, 5)
            batch[k] = batch.get(k, 0) + w
        for k, w in batch.items():
            truth[k] = truth.get(k, 0) + w
            total += w
        _mg_merge(state, batch, m)
        assert len(state) <= m
    bound = total / (m + 1)
    for k, true_cnt in truth.items():
        est = state.get(k, 0)
        assert est <= true_cnt  # never overcounts
        assert true_cnt - est <= bound + 1e-9  # undercount bounded
    # completeness: every key above the bound is present
    for k, true_cnt in truth.items():
        if true_cnt > bound:
            assert k in state, (k, true_cnt, bound)


def test_freqitems_path_equals_mg_and_plain(spark):
    """candidates='freqItems' (JVM sketch) and 'mg' (Python sketch) feed
    the same exact recount: identical output, ≡ plain GROUP BY/HAVING,
    across layouts, thresholds, and multi-column keys."""
    rng = random.Random(11)
    rows = []
    for i in range(50):
        rows += [(f"k{i}", i % 3)] * (3000 // (i + 1))
    rows += [(f"tail{j}", j % 3) for j in range(5000)]
    rng.shuffle(rows)
    base = spark.createDataFrame(rows, "k string, g int")
    for parts in (1, 8):
        df = base.repartition(parts)
        for th in (0.05, 0.002):
            want = _plain(df, ["k"], th)
            assert _got(df, ["k"], th, candidates="freqItems") == want
            assert _got(df, ["k"], th, candidates="mg") == want
        assert _got(df, ["k", "g"], 0.02, candidates="freqItems") == _plain(
            df, ["k", "g"], 0.02
        )


def test_exact_threshold_boundary_is_kept_both_paths(spark):
    """A key whose share is EXACTLY the threshold must be kept: the
    contract is share >= threshold with the threshold read as its
    decimal spelling.  Double arithmetic computes 0.1 * 30 =
    3.0000000000000004 and would drop a 3-of-30 key — the share test
    must run in exact rational arithmetic (ADVICE r11)."""
    rows = [("h",)] * 3 + [(f"u{j}",) for j in range(27)]  # N=30, h=3/30
    df = spark.createDataFrame(rows, "k string").repartition(4)
    for cand in ("mg", "freqItems"):
        got = _got(df, ["k"], 0.1, candidates=cand)
        assert got[("h",)] == 3, (cand, got)
        # and strictly-below stays excluded (no over-inclusion drift)
        assert ("u0",) not in got
    # a second exact-boundary spelling: 0.25 of 8 rows = 2
    rows2 = [("h",)] * 2 + [(f"u{j}",) for j in range(6)]
    df2 = spark.createDataFrame(rows2, "k string").repartition(3)
    for cand in ("mg", "freqItems"):
        assert _got(df2, ["k"], 0.25, candidates=cand)[("h",)] == 2


def test_freqitems_refuses_bad_mode(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="candidates must be"):
        heavy_hitters(df, ["k"], 0.1, candidates="topk")


def test_freqitems_refuses_thresholds_below_its_support_floor(spark):
    """Spark's freqItems raises below support 1e-4 — refuse up front
    with an actionable message instead of failing mid-job."""
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="requires support"):
        heavy_hitters(df, ["k"], 4e-5, candidates="freqItems")
    # the MG path has no floor: same threshold is accepted
    assert heavy_hitters(df, ["k"], 4e-5, candidates="mg").count() == 1


def test_tiny_threshold_full_precision_mg_path_works(spark):
    """Review pass-4/7 regression: thresholds whose exact decimal form
    needs an arbitrarily large denominator (1e20, even 1e25) must stay
    EXACT and crash-free — the share bound is one Python-bigint
    ceiling computed from the checkpointed summaries' N, never in-plan
    big-number arithmetic (F.lit overflowed at 1e20; decimal(38)
    products overflowed to NULL past ~1e23·count)."""
    rows = [("hot",)] * 50 + [(f"u{j}",) for j in range(50)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    th = 7.123456789012345e-05  # denominator 1e20 in exact form
    got = _got(df, ["k"], th, summary_size=20000)
    assert got[("hot",)] == 50  # every key qualifies at this tiny θ
    # absurd precision works too (denominator 1e41): exact, no nulls
    got2 = _got(
        df, ["k"], 1.2345678901234567e-25, summary_size=10**26
    )
    assert got2[("hot",)] == 50 and len(got2) == 51
