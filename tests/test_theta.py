"""Theta-sketch distinct/overlap estimation (operators/theta.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.operators.theta import (
    quantized_theta,
    theta_distinct,
    theta_distinct_by,
    theta_keep,
    theta_overlap,
)


def test_distinct_estimate_within_binomial_error(spark):
    """50k distinct keys, each duplicated 3x (duplication must not bias
    a DISTINCT estimator): estimate within 4 standard errors."""
    n = 50_000
    theta = 0.05
    df = spark.range(n * 3).select((F.col("id") % n).alias("k"))
    row = theta_distinct(df, ["k"], theta).collect()[0]
    q = quantized_theta(theta)
    se = math.sqrt((1 - q) / (q * n))  # relative standard error
    assert abs(row["est_distinct"] - n) / n < 4 * se
    assert row["kept"] == pytest.approx(n * q, rel=4 * se)


def test_overlap_estimates_match_set_arithmetic(spark):
    """A = [0, 60k), B = [40k, 100k): true intersection 20k, union 100k,
    jaccard 0.2 — each estimate within 4 binomial standard errors."""
    theta = 0.05
    a = spark.range(0, 60_000).select(F.col("id").alias("k"))
    b = spark.range(40_000, 100_000).select(F.col("id").alias("k"))
    row = theta_overlap(a, b, ["k"], theta).collect()[0]
    q = quantized_theta(theta)

    def ok(est, true):
        se = math.sqrt((1 - q) / (q * true))
        assert abs(est - true) / true < 4 * se, (est, true)

    ok(row["est_a"], 60_000)
    ok(row["est_b"], 60_000)
    ok(row["est_intersection"], 20_000)
    ok(row["est_union"], 100_000)
    assert row["est_jaccard"] == pytest.approx(0.2, abs=0.03)


def test_per_group_estimates_and_determinism(spark):
    df = spark.range(30_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 9000).alias("k")
    )
    out1 = {r["g"]: r["est_distinct"] for r in
            theta_distinct_by(df, ["g"], ["k"], 0.1).collect()}
    out2 = {r["g"]: r["est_distinct"] for r in
            theta_distinct_by(df, ["g"], ["k"], 0.1).collect()}
    assert out1 == out2  # hash-deterministic, no rand()
    for g in (0, 1, 2):
        assert out1[g] == pytest.approx(3000, rel=0.25)


def test_filter_reaches_scan_and_bad_theta_refused(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="theta"):
        theta_keep(["k"], 0.0)
    with pytest.raises(ValueError, match="theta"):
        theta_distinct(df, ["k"], 1.5)
    # the predicate is a plain codegen filter — no exchange before it
    plan = (
        df.filter(theta_keep(["k"], 0.01))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan.split("Filter")[0]
