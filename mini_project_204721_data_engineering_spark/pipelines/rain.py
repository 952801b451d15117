"""Rainfall-grid ingest: NetCDF long-format → daily district facts.

Reference: ``ingest_nc_north_adm2_to_db`` (``backend/app/utils.py:36-182``),
the heaviest pipeline — a full year is ~18M grid-points driver-side there;
here the same dataflow is one lazy Spark plan:

grid → lon-wrap (S2) → bbox (F1) → precip>0 (F2) → spatial join (J1)
→ area-weighted mean (A1, algebraic sum(x·w)/sum(w))
→ cell-area volume sum (A2, grid steps from A3)
→ wmean⋈sum merge (J2) → dim-key joins (J3/J4, broadcast)
→ dropna (F8) → date/year/upload_id (C7/C8/C14) → rain_points rows.

Scale notes: the spatial join is a broadcast equi-join against the
precomputed cell lookup (static grid × static polygons); both aggregates
shuffle once on (time, province, district) — Catalyst reuses the exchange
for wmean and volume since the grouping key is identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.geometry import assign_points_udf, build_cell_lookup
from mini_project_204721_data_engineering_spark.sources.netcdf import bbox_filter, positive_precip, wrap_longitude

__all__ = ["cell_weight", "ingest_rain_grid"]

KM_PER_DEG = 111.32  # reference utils.py:113


def cell_weight(lat: Column) -> Column:
    """A1 weight: cos(latitude) — the area weighting of lat/lon cells
    (reference ``utils.py:101``)."""
    return F.cos(F.radians(lat))


def ingest_rain_grid(
    grid: DataFrame,
    polygons_pdf: pd.DataFrame,
    province: DataFrame,
    district: DataFrame,
    upload_id: int = 1,
    use_lookup: bool = True,
) -> DataFrame:
    """Run the full rain pipeline; returns rain_points-shaped rows
    ``(upload_id, date, year, province_id, district_id, rain_mm_wmean,
    rainfall_mm)`` (storage DDL ``models.py:44-55``).

    ``use_lookup=True`` precomputes the (lat,lon)→district cell table and
    broadcast-joins it (SURVEY §4.3.1 preferred path); ``False`` uses the
    general ray-casting ``mapInPandas`` path.
    """
    spark = grid.sparkSession
    g = grid.withColumn("lon", wrap_longitude(F.col("lon")))
    g = bbox_filter(g)
    g = positive_precip(g)

    # ONE driver action for everything coordinate-shaped: the distinct
    # axes (tiny — nlat + nlon values, never the nlat×nlon cross product)
    # feed BOTH the broadcast cell lookup and the A3 step inference
    # (r2 verdict #5 — previously two distinct().collect() plus a third
    # axes agg; the extra jobs were pure scheduling latency).
    axes = g.agg(
        F.collect_set("lat").alias("lats"), F.collect_set("lon").alias("lons")
    ).first()

    if use_lookup:
        lookup = build_cell_lookup(spark, axes["lats"], axes["lons"], polygons_pdf)
        joined = g.join(F.broadcast(lookup), ["lat", "lon"], "inner")
    else:
        joined = assign_points_udf(g, polygons_pdf, lon_col="lon", lat_col="lat")

    def _min_step(vals) -> float:
        svals = sorted(set(vals))
        diffs = [abs(b - a) for a, b in zip(svals, svals[1:])]
        return min(diffs) if diffs else 0.05

    dlat = _min_step(axes["lats"])
    dlon = _min_step(axes["lons"])

    w = cell_weight(F.col("lat"))
    cell_area = F.lit(KM_PER_DEG * dlat * KM_PER_DEG * dlon) * w
    volume = F.col("precip") * cell_area * 1000 / 1e6

    keys = ["time", "province", "district"]
    daily = joined.groupBy(*keys).agg(
        (F.sum(F.col("precip") * w) / F.sum(w)).alias("rain_mm_wmean"),
        F.sum(volume).alias("rainfall_mm"),
    )

    prov_keyed = province.select(
        F.col("province_id"), F.col("province_name").alias("province")
    )
    dist_keyed = district.select(
        F.col("district_id"), F.col("province_id"), F.col("district_name").alias("district")
    )
    out = (
        daily.join(F.broadcast(prov_keyed), "province", "left")
        .join(F.broadcast(dist_keyed), ["province_id", "district"], "left")
        .na.drop(subset=["province_id", "district_id"])
        .select(
            F.lit(upload_id).alias("upload_id"),
            F.col("time").cast("date").alias("date"),
            F.year("time").alias("year"),
            F.col("province_id").cast("int"),
            F.col("district_id").cast("int"),
            F.col("rain_mm_wmean").cast("double"),
            F.col("rainfall_mm").cast("double"),
        )
    )
    return out
