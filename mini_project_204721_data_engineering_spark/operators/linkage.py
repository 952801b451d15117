"""Record linkage: fuzzy (edit-distance) join between two tables —
matching customer/part/address strings across systems without a shared
key, the classic MDM / entity-resolution primitive.

Scale shape (q-gram filtering): a naive fuzzy join is a cross join
with a per-pair Levenshtein — quadratic and unshippable.  Instead both
sides explode into positional-length-agnostic character q-grams, and
candidate pairs are the DISTINCT pairs sharing at least one q-gram —
a plain equi-join on the gram.  The q-gram count filter guarantees
completeness: two strings within edit distance ``d`` share at least
``max(len) − q + 1 − d·q`` q-grams, which is ≥ 1 whenever
``max(len) ≥ (d+1)·q`` — and every string BELOW that threshold also
carries a shared ``#short`` blocking gram, so the candidate set is
provably COMPLETE: a pair's longer member either reaches the theorem's
threshold (shared q-gram guaranteed) or both members meet in the short
bucket.  An exact ``levenshtein`` verify
(JVM codegen, no UDF) then makes the result precisely the
brute-force answer (pytest-pinned; the EXTRA oracle brute-forces it).

Hot grams are the blowup risk (the ``" wi"`` of ten million widgets):
``max_gram_df`` drops grams shared by more than that many strings per
side — the same capped-frequent-token trade as the shingle joins,
documented rather than silent (dropped grams only ever REMOVE
candidate paths; completeness then relies on the remaining rarer
grams, which is exactly how production blocking is tuned)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_join"]


def _grams(col: str, q: int, short_below: int):
    """q-grams, plus the shared ``#short`` blocking gram for strings
    below the completeness threshold ``(d+1)·q``: pairs whose LONGER
    member reaches the threshold are guaranteed a shared q-gram by the
    count-filter theorem, and pairs where both fall below it meet in
    the short bucket — so no true match is ever lost.  The short bucket
    is quadratic in the number of DISTINCT short strings (fine for
    part/product names; for huge short-string populations lower ``q``
    or pre-bucket by length, and note ``max_gram_df`` counts it like
    any other gram)."""
    base = (
        f"CASE WHEN length({col}) < {q} THEN cast(array() as array<string>) "
        f"ELSE transform(sequence(1, length({col}) - {q} + 1), "
        f"i -> substring({col}, i, {q})) END"
    )
    return F.expr(
        f"CASE WHEN length({col}) < {short_below} "
        f"THEN array_append({base}, '#short') ELSE {base} END"
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    q: int = 3,
    max_gram_df: int | None = None,
) -> DataFrame:
    """All (left, right) row pairs with
    ``levenshtein(left_col, right_col) <= max_dist``, with ``edit_dist``
    attached — exact (equals the brute-force cross join + filter; the
    ``#short`` bucket closes the below-threshold edge) unless
    ``max_gram_df`` drops the only shared gram of a pair (the
    documented blocking trade).  Column name collisions must be
    resolved by the caller."""
    short_below = (max_dist + 1) * q
    lg = left.select(
        F.col(left_col).alias("__ls"),
        F.explode(_grams(left_col, q, short_below)).alias("__g"),
    ).distinct()
    rg = right.select(
        F.col(right_col).alias("__rs"),
        F.explode(_grams(right_col, q, short_below)).alias("__g"),
    ).distinct()
    if max_gram_df is not None:
        hot = (
            lg.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_gram_df)
            .select("__g")
            .union(
                rg.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > max_gram_df)
                .select("__g")
            )
            .distinct()
        )
        lg = lg.join(hot, "__g", "left_anti")
        rg = rg.join(hot, "__g", "left_anti")
    cand = lg.join(rg, "__g").select("__ls", "__rs").distinct()
    verified = cand.withColumn(
        "edit_dist", F.levenshtein(F.col("__ls"), F.col("__rs"))
    ).filter(F.col("edit_dist") <= max_dist)
    out = left.join(verified, left[left_col] == verified["__ls"]).join(
        right, verified["__rs"] == right[right_col]
    )
    return out.drop("__ls", "__rs")
