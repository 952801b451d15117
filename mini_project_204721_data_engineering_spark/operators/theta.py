"""Theta-sketch distinct counting over keyed streams — SET OPERATIONS
included, which HLL cannot give you without inclusion-exclusion error
stacking.

The fixed-threshold theta sketch (the simplest member of the
Datasketches theta family): hash every key uniformly, keep ONLY keys
whose hash falls below a fixed threshold θ.  The kept set is a uniform
θ-sample of the DISTINCT keys (duplicates hash identically, so
duplication never biases it), hence:

- ``|distinct| ≈ |kept| / θ``
- union of sketches = union of kept sets (still a θ-sample)
- **intersection** = intersection of kept sets — the operation that
  makes theta sketches strictly more capable than HLL: overlap of two
  audiences costs set arithmetic on two tiny samples, not a shuffle of
  either fact table.

Scale shape: the θ-filter is a codegen md5 predicate applied AT THE
SCAN (the same portable hash recipe as ``operators/sampling``), so only
the ~θ fraction of rows reaches the distinct shuffle — θ = 1% turns a
100 TB distinct into a 1 TB one with ~1/sqrt(θ·n) relative error.  The
estimates are DETERMINISTIC (hash-based, no rand()), and md5 exists in
DuckDB with identical semantics, so every estimate is value-checkable
by the oracle — a property no library sketch offers.

Standard error: |kept| is Binomial(n_distinct, θ), so the relative
standard error of the estimate is sqrt((1-θ)/(θ·n_distinct)) — pinned
statistically in tests.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.operators.sampling import hash_sample_predicate

__all__ = [
    "theta_keep",
    "theta_distinct",
    "theta_distinct_by",
    "theta_overlap",
]

_SALT = "theta"


def _key(cols: Sequence[Column | str]) -> Column:
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = cs[0].cast("string")
    for c in cs[1:]:
        key = F.concat(key, F.lit("\x1f"), c.cast("string"))
    return key


def _check_theta(theta: float) -> None:
    if not 0 < theta <= 1:
        raise ValueError(f"theta must be in (0, 1], got {theta}")
    if theta < 1.0 and int(theta * 65536) == 0:
        raise ValueError(
            f"theta={theta} quantizes to 0 at the 4-hex-digit resolution "
            "(minimum ~1.6e-5) — nothing would be kept and every estimate "
            "would be NULL; raise theta"
        )


def theta_keep(cols: Sequence[Column | str], theta: float) -> Column:
    """The θ-filter predicate over the (concatenated) key columns —
    push it at the scan.  θ is quantized to 4 hex digits (2^16 levels)
    by the shared portable-hash recipe; the ESTIMATOR must divide by
    the same quantized value (:func:`theta_distinct` does)."""
    _check_theta(theta)
    return hash_sample_predicate(_key(cols), theta, salt=_SALT)


def quantized_theta(theta: float) -> float:
    """The exact keep-fraction the 4-hex-digit threshold realizes —
    DERIVED from the same `_threshold_hex` the predicate compares
    against, so the two quantizations can never drift apart."""
    from mini_project_204721_data_engineering_spark.operators.sampling import _threshold_hex

    _check_theta(theta)
    if theta >= 1.0:
        return 1.0
    return int(_threshold_hex(theta), 16) / 65536.0


def theta_distinct(df: DataFrame, cols: Sequence[str], theta: float) -> DataFrame:
    """1-row ``(kept, est_distinct)``: distinct count estimated from the
    θ-sampled key set.  Deterministic; oracle-mirrorable verbatim."""
    kept = df.filter(theta_keep(cols, theta)).select(
        *[F.col(c) for c in cols]
    ).distinct()
    q = quantized_theta(theta)
    return kept.agg(
        F.count(F.lit(1)).alias("kept"),
        (F.count(F.lit(1)) / F.lit(q)).alias("est_distinct"),
    )


def theta_distinct_by(
    df: DataFrame, group: Sequence[str], cols: Sequence[str], theta: float
) -> DataFrame:
    """Per-group distinct estimates: ``(group..., kept, est_distinct)``.
    Only the θ-fraction of (group, key) rows crosses the shuffle."""
    q = quantized_theta(theta)
    return (
        df.filter(theta_keep(cols, theta))
        .select(*group, *cols)
        .distinct()
        .groupBy(*group)
        .agg(
            F.count(F.lit(1)).alias("kept"),
            (F.count(F.lit(1)) / F.lit(q)).alias("est_distinct"),
        )
    )


def theta_overlap(
    a: DataFrame, b: DataFrame, cols: Sequence[str], theta: float
) -> DataFrame:
    """1-row audience-overlap estimate between two keyed streams:
    ``(est_a, est_b, est_intersection, est_union, est_jaccard)`` — the
    HLL-impossible operation.  Both sides sample with the SAME salt and
    θ, so a shared key is kept on both sides or neither; the
    intersection of the kept sets is a θ-sample of the true
    intersection.  Cost: two θ-filtered distincts and one join of the
    tiny kept sets."""
    q = quantized_theta(theta)
    ka = a.filter(theta_keep(cols, theta)).select(*cols).distinct()
    kb = b.filter(theta_keep(cols, theta)).select(*cols).distinct()
    both = ka.join(kb, list(cols), "inner")
    counts = (
        ka.agg(F.count(F.lit(1)).alias("na"))
        .crossJoin(kb.agg(F.count(F.lit(1)).alias("nb")))
        .crossJoin(both.agg(F.count(F.lit(1)).alias("ni")))
    )
    return counts.select(
        (F.col("na") / F.lit(q)).alias("est_a"),
        (F.col("nb") / F.lit(q)).alias("est_b"),
        (F.col("ni") / F.lit(q)).alias("est_intersection"),
        ((F.col("na") + F.col("nb") - F.col("ni")) / F.lit(q)).alias("est_union"),
        F.when(
            F.col("na") + F.col("nb") - F.col("ni") > 0,
            F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni")),
        )
        .otherwise(F.lit(0.0))
        .alias("est_jaccard"),
    )
