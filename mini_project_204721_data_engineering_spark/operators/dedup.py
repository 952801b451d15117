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

__all__ = ["dedup_keep_first"]


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """A9: keep exactly one row per key, the first under ``order``.

    ``row_number`` over a window partitioned by the dedup keys — the
    partial sort happens within each hash partition of the key, so the
    shuffle is the same one a groupBy would need; no global sort.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
