"""Incident-log ingest: normalized workbook rows → per-day counts with
idempotent append.

Reference: ``backend/app/utils.py:470-616``.  Dataflow:

1. name→id dim joins on trimmed names (J12, broadcast)
2. strict-format date parse with null coercion (C6) + year (C7)
3. drop unmapped/unparseable rows (F8)
4. count per (disaster_date, province_id, district_id) (A5)
5. anti-join against keys already in the target, range-bounded scan
   (S7 + J9 — the reference's read-then-filter becomes one plan via
   :func:`operators.joins.idempotent_append`)
6. re-attach counts, defaulting new singletons to 1 (J10,
   ``utils.py:595-596``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.operators.joins import idempotent_append

__all__ = ["ingest_incidents"]


def ingest_incidents(
    workbook_rows: DataFrame,
    province: DataFrame,
    district: DataFrame,
    existing: DataFrame | None = None,
    be_years: bool = False,
) -> DataFrame:
    """Workbook rows (`Disaster Date`, `Province`, `District` strings) →
    new incident_statistics_points rows ``(disaster_date, year,
    province_id, district_id, count_of_disasters)`` (DDL
    ``models.py:78-87``), excluding keys already in ``existing``.

    ``be_years=True`` additionally accepts Buddhist-era years (พ.ศ.
    2566 = 2023 — real Thai workbooks carry these) via
    `functions/thaidates.py`; the default stays the reference's strict
    CE-only parse (``utils.py:520-524``)."""
    prov_keyed = province.select(
        "province_id", F.trim(F.col("province_name")).alias("Province")
    )
    dist_keyed = district.select(
        "district_id", "province_id", F.trim(F.col("district_name")).alias("District")
    )

    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    # C6: strict yyyy-MM-dd parse, null on malformed — try_to_date matches
    # pandas errors="coerce" and survives ANSI mode.  A workbook read via
    # pandas+openpyxl surfaces date-styled cells as datetime columns
    # already (reference utils.py:520-524) — accept those directly.
    dd_type = workbook_rows.schema["Disaster Date"].dataType
    if isinstance(dd_type, (DateType, TimestampType, TimestampNTZType)):
        if be_years:
            from mini_project_204721_data_engineering_spark.functions.thaidates import be_to_ce

            parsed_date = be_to_ce(F.col("Disaster Date"))
        else:
            parsed_date = F.col("Disaster Date").cast("date")
    elif be_years:
        from mini_project_204721_data_engineering_spark.functions.thaidates import parse_be_date

        parsed_date = parse_be_date(F.col("Disaster Date"))
    else:
        parsed_date = F.try_to_date(F.col("Disaster Date"), "yyyy-MM-dd")
    rows = (
        workbook_rows.withColumn("Province", F.trim(F.col("Province")))
        .withColumn("District", F.trim(F.col("District")))
        .withColumn("disaster_date", parsed_date)
        .join(F.broadcast(prov_keyed), "Province", "left")
        .join(F.broadcast(dist_keyed), ["province_id", "District"], "left")
        .na.drop(subset=["disaster_date", "province_id", "district_id"])
    )

    counts = rows.groupBy("disaster_date", "province_id", "district_id").agg(
        F.count(F.lit(1)).alias("count_of_disasters")
    )

    if existing is not None:
        new_keys = idempotent_append(
            counts.select("disaster_date", "province_id", "district_id"),
            existing.select("disaster_date", "province_id", "district_id"),
            ["disaster_date", "province_id", "district_id"],
            range_col="disaster_date",
        )
        # J10: re-attach counts; a key with no count row defaults to 1
        counts = new_keys.join(
            counts, ["disaster_date", "province_id", "district_id"], "left"
        ).withColumn("count_of_disasters", F.coalesce(F.col("count_of_disasters"), F.lit(1)))

    return counts.select(
        "disaster_date",
        F.year("disaster_date").alias("year"),
        F.col("province_id").cast("int"),
        F.col("district_id").cast("int"),
        F.col("count_of_disasters").cast("int"),
    )
