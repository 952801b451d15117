"""One-pass table profiling (the ``ANALYZE TABLE`` shape): per-column
null counts, distinct cardinality, min/max — the statistics a lakehouse
collects for optimizer costing, data-quality gates, and drift checks.

Scale shape: ONE scan and ONE aggregate row regardless of column count
— every statistic is an aggregate expression in the same ``agg``, then
the 1×N row is unpivoted to long form with ``stack`` (driver-sized by
construction).  ``exact_distinct=False`` (the 100 TB default) uses
``approx_count_distinct`` (HLL, single-pass, mergeable);
``exact_distinct=True`` is the oracle-checkable form — Spark plans one
expand per distinct column, acceptable for profiling runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_val, max_val) per
    column — min/max cast to string so heterogeneous column types share
    one output schema (the profiling convention)."""
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        nd = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(F.col(c), rsd)
        )
        aggs += [
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"__nulls_{i}"),
            nd.alias(f"__nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{i}"),
        ]
    row = df.agg(*aggs)
    parts = ", ".join(
        "'{}', __nulls_{}, __nd_{}, __min_{}, __max_{}".format(
            c.replace("\\", "\\\\").replace("'", "\\'"), i, i, i, i
        )
        for i, c in enumerate(cols)
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {parts}) AS (col_name, n_nulls, n_distinct, min_val, max_val)"
        ),
        F.col("__rows").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


def key_skew_profile(df, keys, include_keys: bool = False):
    """The salting decision in one row: the distribution of group sizes
    under ``keys`` — (n_groups, total_rows, max_group, p50/p99 group
    size, hot_share = max/total).  Reading: p99 ≈ p50 → uniform keys,
    plain groupBy/join is fine; max ≫ p99 (or hot_share ≳ a reducer's
    fair share 1/shuffle-partitions) → salt the aggregate or replicate
    the join (operators/skew.py).  One map-side-combined count per
    group plus an exact percentile over the |groups|-sized count table
    (at extreme cardinality swap percentile→percentile_approx).

    ``include_keys=True`` appends a ``keys`` column — the profiled key
    list as a JSON array string (JSON, not comma-joined: a column name
    may itself contain a comma) — so a CACHED profile carries its own
    provenance and ``recommend_salt(profile=...)`` can refuse a profile
    computed for different keys instead of silently replaying it.
    (Opt-in to keep the default schema stable for existing callers.)"""
    import json

    from pyspark.sql import functions as F

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    aggs = [
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("__n").alias("total_rows"),
        F.max("__n").alias("max_group"),
        F.expr("percentile(__n, 0.5)").alias("p50_group"),
        F.expr("percentile(__n, 0.99)").alias("p99_group"),
        F.round(F.max("__n") / F.sum("__n"), 6).alias("hot_share"),
    ]
    if include_keys:
        # RESOLVED names from the grouped frame, not str(k): a Column
        # key (legal for groupBy) would otherwise record repr garbage
        # and fail its own legitimate replay in recommend_salt
        names = counts.columns[:-1]  # group columns precede __n
        aggs.append(F.lit(json.dumps(names)).alias("keys"))
    return counts.agg(*aggs)
