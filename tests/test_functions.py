"""Property/boundary tests for the scalar library (SURVEY §5.3).

Boundary values chosen from the reference: class_to_num tertiles at 1/3 and
2/3 and clamp at [1,3] (``backend/app/utils.py:255-274``), avg_to_level at
1.5/2.1 (``utils.py:360-366``), estimateProbability clamp at 80/100 with
count ≷ 0 (``frontend/app/page.tsx:66-83``).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.functions.binning import (
    avg_to_level,
    class_to_num,
    estimate_probability,
)
from mini_project_204721_data_engineering_spark.functions.text import (
    clean_text,
    normalize_sheet_name,
    normalize_th,
)


def _vals(spark, data, expr):
    df = spark.createDataFrame([Row(x=v) for v in data])
    return [r[0] for r in df.select(expr(F.col("x"))).collect()]


def test_class_to_num_words(spark):
    got = _vals(spark, ["ต่ำ", "ปานกลาง", "สูง", "สูงมาก", "Low", "HIGH", "junk"], class_to_num)
    assert got == [1, 2, 3, 3, 1, 3, None]


def test_class_to_num_fraction_bins(spark):
    got = _vals(spark, ["0.0", "0.33", "0.34", "0.66", "0.67", "1.0"], class_to_num)
    assert got == [1, 1, 2, 2, 3, 3]


def test_class_to_num_clamp(spark):
    got = _vals(spark, ["5", "2", "-3", "1.4", "2.5"], class_to_num)
    # out-of-[0,1] numerics: HALF_EVEN round then clamp to [1,3]
    # (reference int(round(2.5)) == 2, utils.py:268)
    assert got == [3, 2, 1, 1, 2]


def test_avg_to_level_boundaries(spark):
    got = _vals(spark, [1.5, 1.51, 2.1, 2.11, None], avg_to_level)
    assert got == [1, 2, 2, 3, None]


def test_estimate_probability_branches(spark):
    rows = [
        # (rain, risk, count) -> expected
        (0.0, 0, 0, 0.0),          # empty everything
        (40.0, 3, 0, 50.0),        # base = 20 + 30, no incidents
        (1000.0, 3, 0, 100.0),     # min(100, base)
        (0.0, 1, 1, 80.0),         # incidents floor at 80
        (100.0, 3, 5, 100.0),      # incidents cap at 100
        (None, None, None, 0.0),   # null-safe
    ]
    df = spark.createDataFrame(
        [Row(rain=r, risk=k, cnt=c, want=w) for r, k, c, w in rows],
        "rain double, risk int, cnt int, want double",
    )
    got = df.select(
        estimate_probability(F.col("rain"), F.col("risk"), F.col("cnt")).alias("p"),
        "want",
    ).collect()
    for r in got:
        assert r["p"] == r["want"]


def test_clean_text_reference_fixes(spark):
    data = [
        "จังหวัดเชียงใหม่",
        "อำเภอ เมือง",
        "กิ่งอำเภอแม่ออน",
        "K. Muang",
        "Wieng Sa",
        "a\nb",
        None,
    ]
    got = _vals(spark, data, clean_text)
    assert got == ["เชียงใหม่", "เมือง", "แม่ออน", "Mueang", "Wiang Sa", "a b", None]


def test_clean_text_idempotent(spark):
    data = ["จังหวัดเชียงใหม่", "  x   y  ", "Muang Muang"]
    once = _vals(spark, data, clean_text)
    twice = _vals(spark, once, clean_text)
    assert once == twice


def test_normalize_th(spark):
    got = _vals(spark, ["  จ.น่าน ", "อ.เมือง  น่าน", "a   b"], normalize_th)
    assert got == ["น่าน", "เมือง น่าน", "a b"]


def test_normalize_sheet_name():
    assert normalize_sheet_name("Incidents 2566") == "incidents"
    assert normalize_sheet_name("รายงาน-2023 ") == "รายงาน"
    assert normalize_sheet_name("My Sheet!") == "mysheet"
