"""Incremental aggregate-view maintenance from a CDC change feed.

The reference refreshes its serving aggregates by re-reading the whole
table after every ingest (``backend/app/utils.py`` read-then-recompute
shape); at 100 TB a full recompute per batch is the difference between
minutes and a day.  This module maintains a materialized aggregate
*incrementally*: given the current aggregate state and a change feed
carrying before/after images (the Debezium envelope shape our Avro
source decodes), it produces the next aggregate state touching only
feed-sized and aggregate-sized data — the fact table is never re-read.

Semantics — classic delta maintenance for ALGEBRAIC aggregates
(sum / count, and anything derivable from them at read time: avg,
rates, weighted means):

- ``insert``  contributes ``+f(after)``  and count ``+1``
- ``delete``  contributes ``-f(before)`` and count ``-1``
- ``update``  is treated as delete(before) + insert(after), which
  makes KEY-MOVING updates (a row migrating between groups) correct
  for free.

min/max are deliberately NOT supported: they are holistic under
deletes (retracting the current minimum requires the full group), so
offering them here would be a silent wrong-answer factory.  Use the
rollup-cascade sketches or a windowed recompute for those.

Unlike :func:`..operators.diff.apply_changes` (SCD1 row merge), the
feed needs NO per-key uniqueness: contributions are additive, so any
number of ops per aggregate key — or per primary key — in one feed is
well-defined.

Scale shape: one explode (≤2 contributions per change row), one
partial-aggregated delta shuffle (aggregate-key-sized output), one
outer join against the aggregate state.  Consistency guards (unknown
op, missing image, feed deleting rows the base never saw) are IN the
plan via ``raise_error`` — no separate validation job, no extra pass.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["base_aggregate", "maintain_aggregate"]

Measure = Union[str, Callable[[Column], Column]]


def _measure_expr(img: Column, m: Measure) -> Column:
    return img[m] if isinstance(m, str) else m(img)


def base_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, Measure],
    count_col: str = "n",
) -> DataFrame:
    """Build the initial aggregate state this module maintains: per-key
    sums of each measure plus the group row count.  A measure is a
    struct field name or a callable over the row struct (e.g.
    ``lambda r: F.round(r["price"] * 100).cast("long")`` — integer
    cents keep distributed sums order-independent and exactly
    mergeable with later deltas)."""
    keys = list(keys)
    row = F.struct(*[F.col(c) for c in df.columns])
    return df.groupBy(*keys).agg(
        *[F.sum(_measure_expr(row, m)).alias(name) for name, m in measures.items()],
        F.count(F.lit(1)).alias(count_col),
    )


def maintain_aggregate(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, Measure],
    count_col: str = "n",
) -> DataFrame:
    """Apply a before/after-image change feed to an aggregate state.

    ``base``: output shape of :func:`base_aggregate` (keys + summed
    measures + ``count_col``).  ``changes``: columns ``op`` in
    {insert, update, delete}, ``before``, ``after`` — row-structs whose
    fields include the group keys and measure inputs (``before`` may be
    NULL for inserts, ``after`` for deletes; an absent *required* image
    raises in-plan).  Groups whose maintained count reaches zero are
    dropped; a count going NEGATIVE means the feed deletes rows the
    base never aggregated and raises rather than corrupting state.

    Invariant (pytest-pinned): ``maintain_aggregate(base_aggregate(S),
    feed)`` ≡ ``base_aggregate(S')`` where ``S'`` is the snapshot after
    the feed — for any feed, including key-moving updates and multiple
    ops per key in one batch."""
    keys = list(keys)
    mnames = list(measures)
    clash = (set(mnames) | {count_col}) & set(keys)
    if clash:
        raise ValueError(
            f"measure/count names {sorted(clash)} collide with key columns — "
            "rename the outputs"
        )
    if count_col in mnames:
        raise ValueError(
            f"measure name {count_col!r} collides with count_col — "
            "rename one of them"
        )

    bad_op = F.concat(
        F.lit("unknown CDC op '"),
        F.coalesce(F.col("op"), F.lit("NULL")),
        F.lit("' — expected insert/update/delete"),
    )

    def contrib(sign: int, img: str) -> Column:
        missing = F.concat(
            F.lit(f"CDC op '"), F.col("op"),
            F.lit(f"' requires a non-NULL {img} image"),
        )
        guarded = F.when(F.col(img).isNull(), F.raise_error(missing)).otherwise(
            F.lit(sign)
        )
        return F.struct(
            guarded.cast("int").alias("sign"), F.col(img).alias("img")
        )

    contribs = (
        F.when(F.col("op") == "insert", F.array(contrib(1, "after")))
        .when(F.col("op") == "delete", F.array(contrib(-1, "before")))
        .when(F.col("op") == "update", F.array(contrib(-1, "before"), contrib(1, "after")))
        .otherwise(F.raise_error(bad_op))
    )

    c = changes.select(F.explode(contribs).alias("c")).select(
        F.col("c.sign").alias("__sign"), F.col("c.img").alias("__img")
    )
    delta = c.groupBy(*[F.col(f"__img.{k}").alias(k) for k in keys]).agg(
        *[
            F.sum(F.col("__sign") * _measure_expr(F.col("__img"), measures[name])).alias(name)
            for name in mnames
        ],
        F.sum("__sign").alias(count_col),
    )

    b = base.select(
        *keys,
        F.struct(*[F.col(c_).alias(c_) for c_ in (*mnames, count_col)]).alias("__base"),
    )
    d = delta.select(
        *keys,
        F.struct(*[F.col(c_).alias(c_) for c_ in (*mnames, count_col)]).alias("__delta"),
    )
    # groupBy treats NULL as a real group, so the merge join must too:
    # a name-list join uses plain equality and would split a NULL-key
    # group into two output rows (or mis-fire the negative-count guard)
    cond = None
    for k in keys:
        c = b[k].eqNullSafe(d[k])
        cond = c if cond is None else cond & c
    j = b.join(d, cond, "full_outer").select(
        *[F.coalesce(b[k], d[k]).alias(k) for k in keys], "__base", "__delta"
    )

    def merged(col: str) -> Column:
        return F.coalesce(F.col("__base")[col], F.lit(0)) + F.coalesce(
            F.col("__delta")[col], F.lit(0)
        )

    neg_msg = F.concat(
        F.lit("change feed deletes rows absent from the base aggregate for key ("),
        F.concat_ws(
            ", ", *[F.coalesce(F.col(k).cast("string"), F.lit("NULL")) for k in keys]
        ),
        F.lit(")"),
    )
    new_n = merged(count_col)
    return (
        j.select(
            *keys,
            *[merged(m).alias(m) for m in mnames],
            F.when(new_n < 0, F.raise_error(neg_msg))
            .otherwise(new_n)
            .cast("long")
            .alias(count_col),
        )
        .filter(F.col(count_col) > 0)
    )
