"""Skew mitigation: salting for hot keys (SURVEY §4.2 scale posture).

AQE's skew-join splitting handles most runtime skew; these are the
*declarative* tools for the cases AQE can't fix:

- :func:`salted_agg` — two-phase aggregation: group on (key, salt) first
  (map-side spread of a hot key across ``n_salts`` reducers), then
  combine the partials.  Works for any algebraic aggregate; used when a
  single group (e.g. one viral user_id) exceeds a reducer.
- :func:`salted_broadcast_left` — replicate-right salted join for a
  skewed probe side joining a non-broadcastable right side: left gets a
  random-ish deterministic salt, right is exploded ``n_salts`` ways.

Salts are derived from stable columns (hash of a unique id), never
``rand()`` — results stay deterministic and retry-safe (a recomputed
task must produce identical salt assignments).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_broadcast_left"]


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_from: str,
    partials: dict[str, tuple[Column, Column]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation with deterministic salting.

    ``partials`` maps output name → (phase-1 aggregate over raw rows,
    phase-2 aggregate over the phase-1 column of the same name).  E.g.
    count: ``{"n": (F.count(F.lit(1)), F.sum("n"))}``;
    sum: ``{"s": (F.sum("x"), F.sum("s"))}``.

    The salt comes from ``pmod(hash(salt_from), n_salts)`` — stable
    across retries, spreading any single hot key over ``n_salts``
    reducers in phase 1; phase 2 reduces ``n_salts`` rows per key.
    """
    salt = F.pmod(F.hash(F.col(salt_from)), F.lit(n_salts)).alias("_salt")
    phase1 = df.groupBy(*keys, salt).agg(
        *[expr.alias(name) for name, (expr, _) in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[fin.alias(name) for name, (_, fin) in partials.items()]
    )


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join: left rows get a deterministic salt, right rows
    are replicated across all salts, the join key becomes
    (keys..., salt) — a hot left key now lands on ``n_salts`` reducers
    instead of one.  Right-side cost: ×``n_salts`` rows through the
    shuffle (use only when the right side is modest but above the
    broadcast threshold)."""
    lsalted = left.withColumn("_salt", F.pmod(F.hash(F.col(salt_from)), F.lit(n_salts)))
    rsalted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = lsalted.join(rsalted, [*on, "_salt"], how)
    return out.drop("_salt")
