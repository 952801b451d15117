"""Buddhist-era (BE) → Common-era (CE) date coercion — opt-in.

The reference coerces only strict ``%Y-%m-%d`` (``backend/app/utils.py:
520-524``), and its sheet-name normalizer already strips BE years from
SHEET NAMES (`functions/text.py::normalize_sheet_name`), but real Thai
incident workbooks carry BE years in the DATA too (พ.ศ. 2566 = ค.ศ.
2023; BE = CE + 543).  These helpers convert them without touching the
strict-parse default — reference parity is preserved unless the caller
asks (`pipelines/incidents.py::ingest_incidents(be_years=True)`).

The string path does the year arithmetic on the TEXT before parsing.
That ordering is load-bearing: a BE leap day like ``2559-02-29``
(= CE 2016-02-29, valid) is NOT a valid Gregorian date under the BE
year number (2559 % 4 != 0), so parse-then-shift would coerce it to
NULL; shift-then-parse resolves it correctly.  Conversely
``2560-02-29`` (= CE 2017, not a leap year) correctly nulls.

Threshold: a 4-digit year ≥ :data:`BE_YEAR_MIN` (2400) is treated as
BE.  2400 BE = 1857 CE; no disaster-log CE year reaches 2400 for
centuries, and no BE year below 2400 appears in modern records — the
band 2100–2399 is left alone (property-tested at the 2400 boundary and
through the 2500s where real data lives).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["BE_YEAR_MIN", "BE_CE_OFFSET", "parse_be_date", "be_to_ce"]

BE_YEAR_MIN = 2400
BE_CE_OFFSET = 543


def parse_be_date(col: Column) -> Column:
    """Strict ISO ``yyyy-MM-dd`` parse accepting BOTH CE and BE years:
    a leading 4-digit year ≥ 2400 has 543 subtracted in the string
    BEFORE parsing (see module docstring for why), anything else goes
    through the same ``try_to_date`` as the strict default — malformed
    input still coerces to NULL, never throws (ANSI-safe)."""
    s = F.trim(col)
    yr = F.substring(s, 1, 4).try_cast("int")
    shifted = F.concat(
        F.lpad((yr - BE_CE_OFFSET).cast("string"), 4, "0"),
        F.substring(s, 5, 6),
    )
    return F.when(
        (yr >= BE_YEAR_MIN) & s.rlike(r"^\d{4}-\d{2}-\d{2}$"),
        F.try_to_date(shifted, "yyyy-MM-dd"),
    ).otherwise(F.try_to_date(s, "yyyy-MM-dd"))


def be_to_ce(col: Column) -> Column:
    """BE→CE for an already-TYPED date/timestamp column (a
    pandas+openpyxl read surfaces date-styled cells as datetimes): a
    year ≥ 2400 shifts back 543 years via ``add_months`` — safe here
    because a typed value can only hold dates that exist in the
    Gregorian calendar, and every Feb 29 a BE-typed value can hold maps
    to a Feb 29 in the CE year (the parser could never have produced it
    otherwise)."""
    d = col.cast("date")
    return F.when(
        F.year(d) >= BE_YEAR_MIN, F.add_months(d, -BE_CE_OFFSET * 12)
    ).otherwise(d)
