"""Distance (radius) join — "every point within d km of a site" — the
geospatial companion to the point-in-polygon join (J1): proximity
alerting, station-to-grid matching, POI enrichment.

Scale shape (the standard grid-bucket decomposition): both sides key
into a fixed lat/lon grid whose cell edge is at least the radius, the
small side replicates to its cell plus the 8 neighbors, and the join
is a plain EQUI-join on the cell key followed by the exact haversine
filter — candidate pairs are bounded by local density, and the plan
contains no CartesianProduct / BroadcastNestedLoopJoin (plan-asserted
in tests).  The exact distance check makes grid geometry a pure
pruning concern: results are exactly the brute-force answer
(pytest-pinned), the grid only bounds how many pairs are checked.

Geometry: cell height is ``radius / 110.574`` degrees latitude; cell
width uses the cos-latitude of the WIDEST latitude in ``lat_range``,
so cells never get narrower than the radius anywhere in the declared
band.  The default band covers ±66° — pass a tighter ``lat_range``
for a denser grid, or pre-split polar/antimeridian data (the two
classic degenerate zones of any fixed-grid scheme; the reference's
Thailand extent sits comfortably inside the default).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["haversine_km", "radius_join", "knn_join"]

_EARTH_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine; codegen trig, no UDF)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlam = F.radians(lon2 - lon1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(p1) * F.cos(p2) * F.sin(dlam / 2) * F.sin(dlam / 2)
    )
    return F.lit(2 * _EARTH_KM) * F.asin(F.sqrt(a))


def radius_join(
    points: DataFrame,
    sites: DataFrame,
    radius_km: float,
    point_cols: tuple[str, str] = ("lat", "lon"),
    site_cols: tuple[str, str] = ("lat", "lon"),
    lat_range: tuple[float, float] = (-66.0, 66.0),
) -> DataFrame:
    """All (point, site) pairs within ``radius_km``, with ``dist_km``
    attached.  ``sites`` is the replicated side (9 cells per row) —
    put the smaller table there.  Column name collisions between the
    two inputs must be resolved by the caller (standard join rule)."""
    plat, plon = point_cols
    slat, slon = site_cols
    dlat = radius_km / 110.574
    widest = max(abs(lat_range[0]), abs(lat_range[1]))
    dlon = radius_km / (111.320 * math.cos(math.radians(widest)))

    def cell(lat: Column, lon: Column) -> tuple[Column, Column]:
        return (
            F.floor(lat / F.lit(dlat)).cast("long"),
            F.floor(lon / F.lit(dlon)).cast("long"),
        )

    pi, pj = cell(F.col(plat), F.col(plon))
    p = points.withColumn("__ci", pi).withColumn("__cj", pj)
    si, sj = cell(F.col(slat), F.col(slon))
    neighbors = F.expr(
        "flatten(transform(sequence(-1, 1), di -> "
        "transform(sequence(-1, 1), dj -> struct(di, dj))))"
    )
    s = (
        sites.withColumn("__si", si)
        .withColumn("__sj", sj)
        .withColumn("__n", F.explode(neighbors))
        .select(
            *sites.columns,
            (F.col("__si") + F.col("__n.di")).alias("__ci"),
            (F.col("__sj") + F.col("__n.dj")).alias("__cj"),
        )
    )
    dist = haversine_km(F.col(plat), F.col(plon), F.col(slat), F.col(slon))
    return (
        p.join(s, ["__ci", "__cj"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
        .drop("__ci", "__cj")
    )


def knn_join(
    points: DataFrame,
    sites: DataFrame,
    k: int,
    point_key: str,
    radius_km: float,
    point_cols: tuple[str, str] = ("lat", "lon"),
    site_cols: tuple[str, str] = ("lat", "lon"),
    lat_range: tuple[float, float] = (-66.0, 66.0),
    max_brute_fraction: float | None = None,
) -> DataFrame:
    """EXACT k-nearest sites per point, grid-accelerated: rank the
    9-cell-ring candidates of :func:`radius_join` and keep rank ≤ k —
    provably the true k nearest whenever the in-ring k-th distance is
    ≤ ``radius_km`` (cell geometry guarantees every site within the
    radius is a candidate).  Points that FAIL that certificate (fewer
    than k in-ring candidates, or a k-th candidate beyond the radius —
    sparse neighborhoods) fall back to a brute-force pass against the
    full site table, so the result is exact everywhere while the
    expensive path is confined to the sparse tail (pick ``radius_km``
    so a typical neighborhood holds ≥ k sites).  Ties on distance break
    on site order via the full column tuple, deterministically.
    Output: point columns + site columns + ``dist_km`` + ``knn_rank``.

    ``max_brute_fraction`` BOUNDS the fallback: when set, the starved
    fraction is measured (one counting pass over the points — an
    explicit, opt-in cost, unlike the zero-pass in-plan contract guards
    elsewhere, because a fraction is a whole-dataset aggregate) and a
    fraction above the bound raises ValueError naming the measured
    value and the radius to grow — an under-provisioned ``radius_km``
    on sparse data otherwise silently degrades toward a full cross
    join.  Leave ``None`` (default) for zero measurement overhead once
    the radius is provisioned; set it in exploratory/first runs
    (mirrors the SRP provisioning-rule guard, llm/dedup.py)."""
    from pyspark.sql.window import Window

    plat, plon = point_cols
    slat, slon = site_cols
    cand = radius_join(
        points, sites, radius_km, point_cols, site_cols, lat_range
    )
    w = Window.partitionBy(point_key).orderBy(
        F.col("dist_km").asc(), *[F.col(c).asc() for c in sites.columns]
    )
    ranked = cand.withColumn("knn_rank", F.row_number().over(w))
    topk = ranked.filter(F.col("knn_rank") <= k)
    # certificate: a point's in-ring top-k is the TRUE top-k iff it has
    # k candidates and the k-th lies within the radius (all nearer
    # sites are then guaranteed candidates)
    certified = (
        topk.groupBy(point_key)
        .agg(F.count(F.lit(1)).alias("__n"), F.max("dist_km").alias("__kth"))
        .filter((F.col("__n") == k) & (F.col("__kth") <= radius_km))
        .select(point_key)
    )
    good = topk.join(certified, point_key, "left_semi")
    starved = points.join(certified, point_key, "left_anti")
    if max_brute_fraction is not None:
        counts = (
            points.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"],
            starved.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"],
        )
        frac = counts[1] / counts[0] if counts[0] else 0.0
        if frac > max_brute_fraction:
            raise ValueError(
                f"knn_join: {counts[1]}/{counts[0]} points "
                f"({frac:.1%}) failed the exactness certificate and would "
                f"brute-force against the full site table — above "
                f"max_brute_fraction={max_brute_fraction:.1%}. Grow "
                f"radius_km (now {radius_km}) until a typical neighborhood "
                f"holds >= k={k} sites, or raise the bound if the sparse "
                "tail is acceptable"
            )
    dist = haversine_km(F.col(plat), F.col(plon), F.col(slat), F.col(slon))
    brute = (
        starved.crossJoin(sites)
        .withColumn("dist_km", dist)
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
    )
    return good.unionByName(brute)
