"""Binning / conditional scalar functions (reference C4, C5, C16, C17).

All pure Column expressions — ``when/otherwise`` chains compile into
whole-stage codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "class_to_num",
    "avg_to_level",
    "estimate_probability",
    "probability_color",
    "risk_label",
]

# Thai / English risk-word → level map (reference backend/app/utils.py:256-260)
_WORD_LEVELS: dict[str, int] = {
    "ต่ำ": 1,
    "ต่ำมาก": 1,
    "low": 1,
    "very low": 1,
    "ปานกลาง": 2,
    "กลาง": 2,
    "medium": 2,
    "สูง": 3,
    "สูงมาก": 3,
    "high": 3,
    "very high": 3,
}


def class_to_num(col: Column) -> Column:
    """Reference ``class_to_num`` (``backend/app/utils.py:255-274``).

    CASE semantics:
    1. risk words (Thai/English, case-insensitive) → {1,2,3}
    2. numerics in [0,1] → tertile bins: <1/3 → 1, <2/3 → 2, else 3
    3. other numerics → round, clamp to [1,3]
    4. unparseable → null
    """
    s = F.lower(F.trim(col.cast("string")))
    # try_cast: null on unparseable input — matches pandas to_numeric
    # errors="coerce" and survives Spark 4's ANSI-mode strict cast
    num = s.try_cast("double")
    word = F.lit(None).cast("int")
    for w, lvl in _WORD_LEVELS.items():
        word = F.when(s == w.lower(), F.lit(lvl)).otherwise(word)
    tertile = (
        F.when(num < 1.0 / 3.0, 1).when(num < 2.0 / 3.0, 2).otherwise(3)
    )
    # bround = HALF_EVEN, matching the reference's Python round()
    # (int(round(val)), utils.py:268); F.round's HALF_UP would differ at 2.5
    clamped = F.least(F.greatest(F.bround(num).cast("int"), F.lit(1)), F.lit(3))
    return (
        F.when(word.isNotNull(), word)
        .when(num.isNull(), F.lit(None).cast("int"))
        .when((num >= 0.0) & (num <= 1.0), tertile)
        .otherwise(clamped)
    ).cast("int")


def avg_to_level(col: Column) -> Column:
    """Reference ``avg_to_level`` (``backend/app/utils.py:360-366``):
    mean class ≤1.5 → 1, ≤2.1 → 2, else 3; null-safe."""
    return (
        F.when(col.isNull(), F.lit(None).cast("int"))
        .when(col <= 1.5, 1)
        .when(col <= 2.1, 2)
        .otherwise(3)
    )


def estimate_probability(
    rain_mm_wmean: Column, risk_level: Column, count_of_disasters: Column
) -> Column:
    """Reference ``estimateProbability`` (``frontend/app/page.tsx:66-83``),
    promoted into the engine as the flagship derived metric.

    ``base = rain/2 + risk*10``; if incidents occurred:
    ``clamp(base + count*5, 80, 100)``, else ``min(100, base)``.
    Null inputs are treated as 0 (the frontend receives ``coalesce``-d 0s,
    reference ``backend/app/main.py:704``).
    """
    rain = F.coalesce(rain_mm_wmean, F.lit(0.0))
    risk = F.coalesce(risk_level, F.lit(0))
    cnt = F.coalesce(count_of_disasters, F.lit(0))
    base = rain / F.lit(2.0) + risk.cast("double") * F.lit(10.0)
    with_inc = F.least(F.lit(100.0), F.greatest(F.lit(80.0), base + cnt.cast("double") * F.lit(5.0)))
    without = F.least(F.lit(100.0), base)
    return F.when(cnt > 0, with_inc).otherwise(without)


def probability_color(prob: Column) -> Column:
    """Reference C17 choropleth binning (``frontend/app/page.tsx:168-173``):
    ≥75 → red, ≥50 → amber, else green."""
    return F.when(prob >= 75, F.lit("red")).when(prob >= 50, F.lit("amber")).otherwise(F.lit("green"))


def risk_label(risk_level: Column) -> Column:
    """Reference C17 legend labels (``frontend/app/page.tsx:222,241-245``)."""
    return (
        F.when(risk_level == 1, F.lit("Low"))
        .when(risk_level == 2, F.lit("Medium"))
        .when(risk_level == 3, F.lit("High"))
        .otherwise(F.lit("Unknown"))
    )
