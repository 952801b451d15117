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

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_join", "fuzzy_join_tokensort", "token_sort_key", "golden_record"]


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
    # lineage cut (lazy localCheckpoint): each gram table feeds BOTH
    # the hot-gram aggregate and the candidate join — Spark has no
    # cross-branch common-subplan elimination, and .persist() proved
    # fragile here (column pruning from the caller's extra columns
    # makes the optimized subplan no longer match the cached plan —
    # measured 7× slowdown from ONE extra input column).  The
    # checkpointed RDD is shared by construction, immune to plan
    # matching; it materializes on first use.
    lg = left.select(
        F.col(left_col).alias("__ls"),
        F.explode(_grams(left_col, q, short_below)).alias("__g"),
    ).distinct().localCheckpoint(eager=False)
    rg = right.select(
        F.col(right_col).alias("__rs"),
        F.explode(_grams(right_col, q, short_below)).alias("__g"),
    ).distinct().localCheckpoint(eager=False)
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


def token_sort_key(col: Column | str) -> Column:
    """Sorted-token normalization: split on whitespace, drop empties,
    sort, re-join with single spaces — "widget red" and "red  widget"
    share one key.  Pure codegen (split/filter/sort/concat), mirrored
    in DuckDB as
    ``array_to_string(list_sort(list_filter(regexp_split_to_array(
    trim(s), '\\s+'), x -> x != '')), ' ')``."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")
    return F.array_join(F.sort_array(toks), " ")


def fuzzy_join_tokensort(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    min_sim: float = 0.8,
    q: int = 3,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Normalized-similarity record linkage — the scoring mode plain
    edit distance gets wrong on TRANSPOSED words, the most common real
    linkage failure ("widget red" vs "red widget" is levenshtein 6+ yet
    the same entity).  Matches every (left, right) pair whose
    token-sort ratio

    ``sim = 1 − levenshtein(key_l, key_r) / max(len_l, len_r, 1)``

    (keys = :func:`token_sort_key` normalizations) is ≥ ``min_sim``,
    attaching ``similarity`` (raw double — round at the output edge).
    Word transpositions normalize away entirely (sim = 1.0); remaining
    edits are scored length-relative, so a 1-char typo in a long name
    scores higher than in a short one — the behavior linkage ranking
    wants.

    Completeness: the same q-gram count-filter theorem applied to the
    NORMALIZED keys.  ``sim ≥ min_sim`` bounds the edit distance by
    ``(1 − min_sim)·maxlen``, so keys of length ≥
    ``q / (1 − (1 − min_sim)·q)`` are guaranteed a shared q-gram, and
    every shorter key carries the ``#short`` blocking gram — provably
    no lost match (pytest + brute-force oracle).  Requires
    ``(1 − min_sim)·q < 1`` (else NO length guarantees a shared gram —
    raise ``min_sim`` or lower ``q``); same ``max_gram_df`` hot-gram
    trade as :func:`fuzzy_join`."""
    slack = (1.0 - min_sim) * q
    if slack >= 1.0:
        raise ValueError(
            f"fuzzy_join_tokensort: (1 - min_sim)*q = {slack:.2f} >= 1 — "
            "q-gram blocking has no completeness guarantee at this "
            f"looseness; raise min_sim above {1.0 - 1.0 / q:.3f} or lower q"
        )
    short_below = math.ceil(q / (1.0 - slack))
    ln = (
        left.select(F.col(left_col).alias("__ls")).distinct()
        .withColumn("__lk", token_sort_key("__ls"))
    )
    rn = (
        right.select(F.col(right_col).alias("__rs")).distinct()
        .withColumn("__rk", token_sort_key("__rs"))
    )
    # the whole candidate pipeline (gram explode → equi-join → distinct
    # → levenshtein verify) runs at the DISTINCT-NORMALIZED-KEY level:
    # the score depends only on the keys, every transposition variant
    # of a name collapses to ONE key (fewer candidates than string
    # pairs by construction), and the distinct stays two-strings-wide.
    # Surviving (key, key) pairs — matches-sized — fan back out to the
    # original strings through the two small key→string maps at the
    # end.  (Measured at 18M candidates: carrying all four strings
    # through the distinct cost 5×, re-deriving keys per candidate 9×,
    # this key-level form ~1× the plain fuzzy_join pipeline.)
    # EAGER checkpoint of the distinct-key tables (names-sized — one
    # bounded job at call time): the candidate join's planner otherwise
    # sees the keys behind two unmaterialized shuffles with no size
    # statistics and picks a plan measured 4× slower at 100k names
    # (tools/scale_probe.py linkage); with real sizes known, AQE plans
    # the gram join/distinct correctly.  fuzzy_join doesn't need this —
    # its gram tables derive directly from the caller's inputs.
    lkeys = ln.select("__lk").distinct().localCheckpoint(eager=True)
    rkeys = rn.select("__rk").distinct().localCheckpoint(eager=True)
    # lineage cut for the same cross-branch reuse reason as fuzzy_join
    # (see the measured plan-matching fragility note there)
    lg = lkeys.select(
        "__lk", F.explode(_grams("__lk", q, short_below)).alias("__g")
    ).distinct().localCheckpoint(eager=False)
    rg = rkeys.select(
        "__rk", F.explode(_grams("__rk", q, short_below)).alias("__g")
    ).distinct().localCheckpoint(eager=False)
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
    cand = lg.join(rg, "__g").select("__lk", "__rk").distinct()
    sim = F.lit(1.0) - F.levenshtein(F.col("__lk"), F.col("__rk")) / F.greatest(
        F.length("__lk"), F.length("__rk"), F.lit(1)
    ).cast("double")
    verified = cand.withColumn("similarity", sim).filter(
        F.col("similarity") >= min_sim
    )
    expanded = verified.join(ln, "__lk").join(rn, "__rk")
    out = left.join(expanded, left[left_col] == expanded["__ls"]).join(
        right, expanded["__rs"] == right[right_col]
    )
    return out.drop("__ls", "__lk", "__rs", "__rk")


def golden_record(
    df: DataFrame,
    cluster_cols: Sequence[str],
    order_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Survivorship: ONE golden row per cluster, each value column
    resolved INDEPENDENTLY to the most recent non-NULL observation —
    the step after record linkage (``fuzzy_join`` finds that three CRM
    rows are the same customer; this merges them into the master
    record, back-filling each field from the freshest row that has it).

    Per column the survivor key is ``struct(value IS NOT NULL,
    *order_cols)`` under ``max_by``: any non-NULL beats every NULL,
    then recency wins, and the caller-supplied tie-break columns (make
    the last one unique, e.g. an event/record id) pin exact-timestamp
    ties deterministically.  A column NULL in every row of a cluster
    stays NULL.

    Scale shape: ONE map-side-combinable groupBy — ``max_by`` is
    algebraic (partial maxima merge), so 100 TB of claims reduce to
    cluster-count rows with no window, no join, no second pass.  The
    reference's nearest analogue is pandas ``drop_duplicates(keep=)``
    (``backend/app/utils.py``), which keeps one WHOLE row and cannot
    back-fill per field."""
    aggs = []
    for c in value_cols:
        key = F.struct(
            F.col(c).isNotNull().alias("__nn"),
            *[F.col(o).alias(f"__o{i}") for i, o in enumerate(order_cols)],
        )
        aggs.append(F.max_by(F.col(c), key).alias(c))
    return df.groupBy(*cluster_cols).agg(*aggs)
