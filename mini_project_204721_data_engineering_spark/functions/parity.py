"""Cross-engine float parity helpers.

Spark's ``F.round(x, d)`` rounds HALF_UP on the double's SHORTEST decimal
representation (``BigDecimal.valueOf``), while DuckDB rounds through
scaled float math — so a value whose shortest repr lands exactly on the
d-th-decimal halfway point (e.g. 33.88325 at d=4) rounds UP in Spark and
DOWN in DuckDB even when both engines hold the identical double.  Rare
(~1e-4 of rows at sf0.1) but fatal to a value-hash compare.

:func:`portable_round` makes the operation explicit — multiply, round to
integer, divide — which both engines execute with the same IEEE ops:
``round(x * 10^d) / 10^d``.  At integer scale the halfway case only
arises when the PRODUCT is exactly ``*.5`` (representable), where Spark
HALF_UP and DuckDB's away-from-zero agree.  Mirror it in oracle SQL as
``round(x * 10000.0) / 10000.0`` (same d).

Pair with exact upstream aggregation (sum 2-dp money in DECIMAL, divide
once at the end) so the doubles being rounded are bit-identical to begin
with.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["portable_round"]


def portable_round(col: Column, dp: int) -> Column:
    """Engine-portable HALF-cases rounding: ``round(col * 10^dp) / 10^dp``
    (see module docstring; mirror the same expression in oracle SQL)."""
    scale = float(10**dp)
    return F.round(col * F.lit(scale)) / F.lit(scale)
