"""Snapshot diff — CDC-style comparison of two table versions, the
"what changed since yesterday's load" primitive (feeds incremental
publishing, reconciliation reports, and change-data-capture bootstraps
when the source system has no log).

Scale shape: ONE full outer join on the key columns (the irreducible
shuffle — both sides hash-partition by key) with all compared columns
packed into a struct per side, so change detection is a single
null-safe struct equality instead of N per-column comparisons; the
per-column breakdown is a lazy array filter over the column names,
exploded only in the summary that wants it.  No window, no sort, no
driver materialization; output is row-per-key (diff) or counts
(summaries).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "table_diff",
    "diff_summary",
    "changed_column_counts",
    "apply_changes",
]


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-key diff of two snapshots: ``(keys..., diff_status,
    changed_cols)`` with status in {added, removed, changed, unchanged}
    and ``changed_cols`` the (sorted) names of columns whose values
    differ (empty array unless status = changed).

    Null-safe semantics throughout (``<=>``): a NULL→NULL column is
    unchanged, NULL→value is a change — the SQL ``IS NOT DISTINCT
    FROM`` contract, mirrored verbatim by the DuckDB oracle."""
    keys = list(keys)
    cmp_cols = sorted(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in keys]
    )
    o = old.select(
        *keys, F.struct(*[F.col(c) for c in cmp_cols]).alias("__o")
    ).withColumn("__has_o", F.lit(True))
    n = new.select(
        *keys, F.struct(*[F.col(c) for c in cmp_cols]).alias("__n")
    ).withColumn("__has_n", F.lit(True))
    j = o.join(n, on=keys, how="full_outer")
    status = (
        F.when(F.col("__has_o").isNull(), F.lit("added"))
        .when(F.col("__has_n").isNull(), F.lit("removed"))
        .when(F.col("__o").eqNullSafe(F.col("__n")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("c"),
                F.col("__o")[c].eqNullSafe(F.col("__n")[c]).alias("eq"),
            )
            for c in cmp_cols
        ]
    )
    changed = F.transform(
        F.filter(pairs, lambda p: ~p["eq"]), lambda p: p["c"]
    )
    return j.select(
        *keys,
        status.alias("diff_status"),
        F.when(status == "changed", changed)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )


def apply_changes(
    old: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """The CONSUME side of CDC: apply a change feed — rows carrying the
    new values plus an ``op`` column in {upsert, delete} — to a
    snapshot, producing the next snapshot (SCD1 merge semantics:
    upsert wins over the old row, delete removes it, untouched keys
    pass through).  ``MERGE INTO`` without a transactional table
    format: one keyed outer join, no window, no driver data.

    Duplicate keys in the feed are a contract violation (a change feed
    is per-key terminal state); they raise on detection rather than
    applying an arbitrary winner.  The check is IN the plan: the feed
    is aggregated by key (the same hash partitioning the merge join
    needs anyway, so Catalyst reuses the exchange) and a per-key count
    guards the op column with ``raise_error`` — no separate guard job,
    no extra pass over the feed on clean input; the violation surfaces
    at first execution of the merged result.

    Round-trip invariant (pytest-pinned):
    ``apply_changes(old, changes_from(table_diff(old, new), new))``
    ≡ ``new`` for any two snapshots."""
    keys = list(keys)
    val_cols = [c for c in old.columns if c not in keys]
    dup_msg = F.concat(
        F.lit("change feed carries duplicate key ("),
        F.concat_ws(
            ", ", *[F.coalesce(F.col(k).cast("string"), F.lit("NULL")) for k in keys]
        ),
        F.lit(") — a feed must hold one terminal state per key"),
    )
    ch = (
        changes.select(
            *keys,
            F.struct(
                F.col("op").alias("__op"),
                F.struct(*[F.col(c) for c in val_cols]).alias("__v"),
            ).alias("__pick"),
        )
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__cn"),
            # first, not max: value structs need not be orderable, and
            # with __cn == 1 (the only path that survives the guard)
            # first IS the unique row — deterministic.
            F.first("__pick").alias("__pick"),
        )
        .select(
            *keys,
            F.when(F.col("__cn") > 1, F.raise_error(dup_msg))
            .otherwise(F.col("__pick.__op"))
            .alias("__op"),
            F.col("__pick.__v").alias("__new"),
        )
    )
    o = old.withColumn("__old", F.struct(*[F.col(c) for c in val_cols])).select(
        *keys, "__old"
    )
    j = o.join(ch, on=keys, how="full_outer")
    kept = j.filter(F.col("__op").isNull() | (F.col("__op") == "upsert"))
    winner = F.coalesce(F.col("__new"), F.col("__old"))
    return kept.select(
        *keys, *[winner[c].alias(c) for c in val_cols]
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """(diff_status, n) — the reconciliation headline."""
    return diff.groupBy("diff_status").agg(F.count(F.lit(1)).alias("n"))


def changed_column_counts(diff: DataFrame) -> DataFrame:
    """(column, n_changed) — which columns drift; explodes only the
    CHANGED rows' column-name arrays (changes-sized, not table-sized)."""
    return (
        diff.filter(F.col("diff_status") == "changed")
        .select(F.explode("changed_cols").alias("column"))
        .groupBy("column")
        .agg(F.count(F.lit(1)).alias("n_changed"))
    )
