"""Deduplication operators (SURVEY §2.4 A8/A9).

Pandas ``drop_duplicates(keep="first")`` depends on implicit file order;
distributed execution has no such order, so ``dedup_keep_first`` requires
an explicit deterministic ordering (SURVEY §7 hard-part #3).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["dedup_keep_first", "dedup_keep_first_agg"]


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """A9: keep exactly one row per key, the first under ``order``.

    ``row_number`` over a window partitioned by the dedup keys — the
    partial sort happens within each hash partition of the key, so the
    shuffle is the same one a groupBy would need; no global sort.
    Accepts arbitrary ``Column`` orderings (desc, expressions); when the
    order is plain ascending column names, prefer
    :func:`dedup_keep_first_agg` — it map-side-combines.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_keep_first_agg(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """A9, aggregation form: ``min(struct(order..., row))`` per key.

    Row-for-row identical to :func:`dedup_keep_first` with the same
    ascending order (struct comparison is field-lexicographic and treats
    a NULL field as smallest — exactly the window's asc nulls-first), but
    executes as a hash aggregate instead of shuffle-then-sort: partial
    aggregation keeps ONE candidate row per key per map partition, so
    only |keys| rows cross the shuffle instead of ALL rows.  At 100 TB
    with any meaningful duplication that is the difference between
    shuffling the table and shuffling the distinct keys.

    ``order_cols`` are ascending column names; ties beyond them fall to
    the remaining columns' values (pass a total order — a unique
    tiebreaker column — for fully deterministic output, same contract as
    the window form).
    """
    keys = list(keys)
    tail = [c for c in df.columns if c not in keys]
    packed = F.struct(
        *[F.col(c) for c in order_cols],
        F.struct(*[F.col(c) for c in tail]).alias("__row"),
    )
    return (
        df.groupBy(*keys)
        .agg(F.min(packed).alias("__best"))
        .select(*keys, *[F.col(f"__best.__row.{c}").alias(c) for c in tail])
    )
