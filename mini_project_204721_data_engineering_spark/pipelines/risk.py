"""Risk-table ingest: DBF rows → per-district risk levels.

Reference: ``backend/app/utils.py:286-434``.  Dataflow (same semantics,
set-based):

1. normalize Thai keys (C2) on file rows and dims
2. optional ``special_fix`` (F9): province keys not present in the dims
   are overwritten to Uttaradit (``utils.py:321-332``)
3. ``class_to_num`` (C4) with unmapped-class report (A8,
   ``utils.py:347-350``)
4. mean class per (province, district) (A4) → ``avg_to_level`` (C5)
5. match against dims (J6/J7), fill every unmatched district of an
   in-file province with risk_level=1 (J8 anti join + U1 union)
6. dedup one row per district, matched rows win (A9 — the reference's
   concat order makes ``keep="first"`` prefer matched rows; we encode
   that order explicitly)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.functions.binning import avg_to_level, class_to_num
from mini_project_204721_data_engineering_spark.functions.text import normalize_th
from mini_project_204721_data_engineering_spark.operators.dedup import dedup_keep_first_agg
from mini_project_204721_data_engineering_spark.operators.joins import anti_join

__all__ = ["ingest_risk_dbf", "unmapped_classes"]


def unmapped_classes(dbf: DataFrame) -> DataFrame:
    """A8 diagnostic: distinct class values ``class_to_num`` can't map
    (reference warning print, ``utils.py:347-350``)."""
    return (
        dbf.select(F.col("class").alias("raw_class"), class_to_num(F.col("class")).alias("n"))
        .filter(F.col("n").isNull())
        .select("raw_class")
        .distinct()
    )


def ingest_risk_dbf(
    dbf: DataFrame,
    province: DataFrame,
    district: DataFrame,
    upload_risk_id: int = 1,
    special_fix: bool = False,
) -> DataFrame:
    """DBF-shaped rows (prov_nam_t, amphoe_t, class) → risk_points rows
    ``(upload_risk_id, province_id, district_id, risk_level)``
    (storage DDL ``models.py:68-76``)."""
    prov_keyed = province.select(
        "province_id",
        normalize_th(F.col("province_name")).alias("prov_key"),
        "province_name_en",
    )
    dist_keyed = district.select(
        "district_id",
        "province_id",
        normalize_th(F.col("district_name")).alias("dist_key"),
    )

    rows = dbf.select(
        normalize_th(F.col("prov_nam_t")).alias("prov_key"),
        normalize_th(F.col("amphoe_t")).alias("dist_key"),
        class_to_num(F.col("class")).alias("class_num"),
    )

    if special_fix:
        # F9: any unknown province key → Uttaradit (utils.py:321-332)
        utt = (
            prov_keyed.filter(F.col("province_name_en") == "Uttaradit")
            .select("prov_key")
            .first()
        )
        # driver-side collect is safe BY CONTRACT: prov_keyed is the
        # province dimension (Thailand has 77 provinces; any country is
        # O(100)) — the isin literal stays a few KB at any fact scale
        known = [r["prov_key"] for r in prov_keyed.select("prov_key").collect()]
        if utt is not None:
            rows = rows.withColumn(
                "prov_key",
                F.when(~F.col("prov_key").isin(known), F.lit(utt["prov_key"])).otherwise(
                    F.col("prov_key")
                ),
            )

    # A4 + C5: mean class per (province, district) → level
    risk_by_amp = (
        rows.dropna(subset=["class_num"])
        .groupBy("prov_key", "dist_key")
        .agg(F.avg("class_num").alias("risk_avg"))
        .withColumn("risk_level", avg_to_level(F.col("risk_avg")))
    )

    # J6/J7: match to dims via (province key, district key)
    dist_with_prov = dist_keyed.join(
        F.broadcast(prov_keyed.select("province_id", F.col("prov_key").alias("prov_key_db"))),
        "province_id",
    )
    matched = risk_by_amp.join(
        F.broadcast(dist_with_prov),
        (risk_by_amp.prov_key == dist_with_prov.prov_key_db)
        & (risk_by_amp.dist_key == dist_with_prov.dist_key),
        "left",
    ).select("province_id", "district_id", "risk_level", risk_by_amp.prov_key)

    matched_ok = matched.dropna(subset=["province_id", "district_id"]).select(
        "province_id", "district_id", "risk_level"
    )

    # J8 + U1: every district of an in-file province with no match → level 1
    prov_ids_in_file = (
        risk_by_amp.select("prov_key")
        .distinct()
        .join(F.broadcast(prov_keyed.select("province_id", "prov_key")), "prov_key")
        .select("province_id")
        .distinct()
    )
    all_districts = dist_with_prov.join(
        F.broadcast(prov_ids_in_file), "province_id", "left_semi"
    ).select("province_id", "district_id")
    missing = anti_join(
        all_districts, matched_ok.select("province_id", "district_id"), ["province_id", "district_id"]
    ).withColumn("risk_level", F.lit(1))

    # A9: matched rows win over fill rows; one row per district
    result = (
        matched_ok.withColumn("_src", F.lit(0))
        .unionByName(missing.withColumn("_src", F.lit(1)))
    )
    result = dedup_keep_first_agg(
        result, ["district_id"], ["_src", "province_id"]
    ).drop("_src")
    return result.select(
        F.lit(upload_risk_id).alias("upload_risk_id"),
        F.col("province_id").cast("int"),
        F.col("district_id").cast("int"),
        F.col("risk_level").cast("int"),
    )
