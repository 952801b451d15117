"""Binary ESRI .shp reader tests (S3): round-trip through write_shp the
way write_dbf round-trips the DBF reader, .dbf attribute pairing, and the
dims+rain pipeline running end-to-end from a real .shp+.dbf pair —
matching the reference's ``gpd.read_file`` usage
(``backend/app/utils.py:80``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.pipelines.dims import build_dims
from mini_project_204721_data_engineering_spark.pipelines.rain import ingest_rain_grid
from mini_project_204721_data_engineering_spark.sources.dbf import write_dbf
from mini_project_204721_data_engineering_spark.sources.geometry import parse_wkt_polygon, point_in_ring
from mini_project_204721_data_engineering_spark.sources.shapefile import (
    SHAPE_POINT,
    read_shapefile,
    read_shp,
    write_shp,
)

SQ_A = [(99.0, 18.0), (99.0, 19.0), (100.0, 19.0), (100.0, 18.0), (99.0, 18.0)]
SQ_B = [(100.0, 18.0), (100.0, 19.0), (101.0, 19.0), (101.0, 18.0), (100.0, 18.0)]
HOLE = [(99.4, 18.4), (99.6, 18.4), (99.6, 18.6), (99.4, 18.6), (99.4, 18.4)]


def test_polygon_roundtrip(tmp_path):
    p = str(tmp_path / "polys.shp")
    write_shp([[SQ_A], [SQ_B], [SQ_A, HOLE]], p)
    recs = read_shp(p)
    assert [r["shape_type"] for r in recs] == [5, 5, 5]
    assert recs[0]["parts"] == [SQ_A]
    assert recs[2]["parts"] == [SQ_A, HOLE]  # multi-part survives
    # WKT plugs into the existing geometry pipeline (outer ring)
    ring = parse_wkt_polygon(recs[0]["wkt"])
    assert ring.shape == (5, 2)
    inside = point_in_ring(np.array([99.5, 98.0]), np.array([18.5, 18.5]), ring)
    assert inside.tolist() == [True, False]
    # hole-carrying record: outer ring still comes back first
    assert parse_wkt_polygon(recs[2]["wkt"]).shape == (5, 2)


def test_polygon_holes_and_multipart_wkt(tmp_path):
    """Winding-convention grouping (r2 verdict #3 + ADVICE multi-part):
    CW ring = outer, CCW ring = hole; a second CW ring starts a new part
    → MULTIPOLYGON.  Containment is hole-aware and island-aware."""
    from mini_project_204721_data_engineering_spark.sources.geometry import (
        assign_district,
        parse_wkt_geometry,
        parse_wkt_rings,
        point_in_rings,
    )

    p = str(tmp_path / "donut.shp")
    # one record: donut (SQ_A with HOLE) + island part SQ_B
    write_shp([[SQ_A, HOLE, SQ_B]], p)
    (rec,) = read_shp(p)
    assert rec["wkt"].startswith("MULTIPOLYGON (((")
    parts = parse_wkt_geometry(rec["wkt"])
    assert [len(pt) for pt in parts] == [2, 1]  # donut part has its hole

    rings = parse_wkt_rings(rec["wkt"])
    lons = np.array([99.5, 99.1, 100.5, 50.0])
    lats = np.array([18.5, 18.5, 18.5, 18.5])
    #       in hole→out, in donut→in, in island→in, far→out
    assert point_in_rings(lons, lats, rings).tolist() == [False, True, True, False]

    prov, dist = assign_district(lons, lats, [("P", "D", rings)])
    assert dist.tolist() == [None, "D", "D", None]  # hole points UNassigned


def test_wkt_to_shp_roundtrip_with_holes_and_parts(tmp_path):
    """WKT → write_shp → read_shp → identical WKT for donut and
    multi-part geometries (winding canonicalized on write)."""
    from mini_project_204721_data_engineering_spark.sources.shapefile import wkt_to_shp_parts

    donut = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    multi = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5), (5.2 5.2, 5.4 5.2, 5.3 5.4, 5.2 5.2)))"
    p = str(tmp_path / "rt.shp")
    write_shp([wkt_to_shp_parts(donut), wkt_to_shp_parts(multi)], p)
    recs = read_shp(p)
    from mini_project_204721_data_engineering_spark.sources.geometry import (
        parse_wkt_geometry,
    )

    for orig, rec in zip((donut, multi), recs):
        got, want = parse_wkt_geometry(rec["wkt"]), parse_wkt_geometry(orig)
        assert len(got) == len(want)
        for gp, wp in zip(got, want):
            assert len(gp) == len(wp)  # same ring count per part
            for gr, wr in zip(gp, wp):
                assert set(map(tuple, gr)) == set(map(tuple, wr))  # same points


def test_parse_wkt_geometry_forms():
    from mini_project_204721_data_engineering_spark.sources.geometry import (
        parse_wkt_geometry,
    )

    single = parse_wkt_geometry("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert len(single) == 1 and len(single[0]) == 1 and single[0][0].shape == (5, 2)
    withhole = parse_wkt_geometry(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    )
    assert len(withhole[0]) == 2
    multi = parse_wkt_geometry(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5), (5.2 5.2, 5.4 5.2, 5.3 5.4, 5.2 5.2)))"
    )
    assert [len(p) for p in multi] == [1, 2]
    with pytest.raises(ValueError, match="not a WKT polygon"):
        parse_wkt_geometry("LINESTRING (0 0, 1 1)")


def test_point_roundtrip(tmp_path):
    p = str(tmp_path / "pts.shp")
    write_shp([[[(99.5, 18.5)]], [[(100.5, 18.25)]]], p, shape_type=SHAPE_POINT)
    recs = read_shp(p)
    assert [r["wkt"] for r in recs] == ["POINT (99.5 18.5)", "POINT (100.5 18.25)"]


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "junk.shp"
    p.write_bytes(b"\x00" * 120)
    with pytest.raises(ValueError, match="file code"):
        read_shp(str(p))


def _write_adm_pair(tmp_path):
    """A tiny ADM2-style .shp+.dbf pair: two Chiang Mai districts plus a
    Bangkok one (filtered by F3), raw prefixed Thai names (exercises C1)."""
    shp = str(tmp_path / "adm2.shp")
    dbf = str(tmp_path / "adm2.dbf")
    write_shp([[SQ_A], [SQ_B], [[(100.3, 13.5), (100.3, 14.0), (100.8, 14.0), (100.8, 13.5), (100.3, 13.5)]]], shp)
    attrs = pd.DataFrame(
        {
            "ADM1_EN": ["Chiang Mai", "Chiang Mai", "Bangkok"],
            "ADM1_TH": ["จังหวัดเชียงใหม่", "จังหวัดเชียงใหม่", "กรุงเทพมหานคร"],
            "ADM2_EN": ["Muang", "Mae Rim", "Dusit"],
            "ADM2_TH": ["เมือง", "แม่ริม", "ดุสิต"],
        }
    )
    write_dbf(attrs, dbf, encoding="utf-8")
    return shp, dbf


def test_read_shapefile_pairs_attributes(tmp_path):
    shp, dbf = _write_adm_pair(tmp_path)
    gdf = read_shapefile(shp, dbf, encoding="utf-8")
    assert list(gdf.columns) == ["ADM1_EN", "ADM1_TH", "ADM2_EN", "ADM2_TH", "wkt"]
    assert len(gdf) == 3
    assert gdf.loc[0, "ADM2_TH"] == "เมือง"
    assert gdf.loc[0, "wkt"].startswith("POLYGON ((99 18")


UTM47N_PRJ = (
    'PROJCS["WGS_1984_UTM_Zone_47N",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],'
    'UNIT["Degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
    'PARAMETER["False_Easting",500000.0],PARAMETER["False_Northing",0.0],'
    'PARAMETER["Central_Meridian",99.0],PARAMETER["Scale_Factor",0.9996],'
    'PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]'
)


def test_prj_crs_guard(tmp_path):
    """WGS84 (WKT1 and WKT2) and a missing .prj pass through; WGS84-datum
    UTM is now ACCEPTED (reprojected on read, r5); CRS outside that
    family still raise the clear error."""
    from mini_project_204721_data_engineering_spark.sources.shapefile import check_prj_wgs84

    shp = str(tmp_path / "adm.shp")
    write_shp([[SQ_A]], shp)
    read_shapefile(shp)  # no .prj → accepted

    prj = tmp_path / "adm.prj"
    prj.write_text(
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
    )
    read_shapefile(shp)  # ESRI WKT1 WGS84 → accepted
    prj.write_text('GEOGCRS["WGS 84",ENSEMBLE["World Geodetic System 1984 ensemble"]]')
    check_prj_wgs84(shp)  # WKT2 → accepted

    # UTM 47N on the WGS84 datum: accepted since r5 (check only — the
    # geometry here is in degrees, so just assert no raise)
    prj.write_text(UTM47N_PRJ)
    check_prj_wgs84(shp)

    # Indian 1975 (r6): recognized datum → accepted (datum-shifted on read)
    prj.write_text(
        'PROJCS["Indian_1975_UTM_Zone_47N",GEOGCS["GCS_Indian_1975",'
        'DATUM["D_Indian_1975"]],PROJECTION["Transverse_Mercator"]]'
    )
    check_prj_wgs84(shp)

    # projected CRS on an UNRECOGNIZED non-WGS84 datum with no TOWGS84:
    # still an honest hard stop
    prj.write_text(
        'PROJCS["ED50_UTM_31N",GEOGCS["GCS_European_1950",'
        'DATUM["D_European_1950"]],PROJECTION["Transverse_Mercator"]]'
    )
    with pytest.raises(ValueError, match="transverse-Mercator"):
        read_shapefile(shp)

    prj.write_text('GEOGCS["GCS_European_1950",DATUM["D_European_1950"]]')
    with pytest.raises(ValueError, match="unrecognized datum"):
        read_shapefile(shp)


def test_utm_prj_reprojects_to_wgs84(tmp_path):
    """VERDICT r5 #3 done-criterion: a UTM-47N .prj + projected
    coordinates yield geometry identical to the WGS84 fixture within
    1e-6°."""
    import numpy as np

    from mini_project_204721_data_engineering_spark.sources.crs import forward_tm

    # project the WGS84 squares into UTM 47N meters
    def project(ring):
        xs, ys = forward_tm([p[0] for p in ring], [p[1] for p in ring], lon0=99.0)
        return list(zip(xs.tolist(), ys.tolist()))

    shp = str(tmp_path / "utm.shp")
    write_shp([[project(SQ_A)], [project(SQ_B)], [project(SQ_A), project(HOLE)]], shp)
    (tmp_path / "utm.prj").write_text(UTM47N_PRJ)

    recs = read_shapefile(shp)
    wgs = str(tmp_path / "wgs.shp")
    write_shp([[SQ_A], [SQ_B], [SQ_A, HOLE]], wgs)
    expect = read_shapefile(wgs)

    from mini_project_204721_data_engineering_spark.sources.geometry import (
        parse_wkt_geometry,
    )

    for got_wkt, want_wkt in zip(recs["wkt"], expect["wkt"]):
        got = np.concatenate([np.asarray(r) for g in parse_wkt_geometry(got_wkt) for r in g])
        want = np.concatenate([np.asarray(r) for g in parse_wkt_geometry(want_wkt) for r in g])
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 1e-6


def test_utm_shapefile_through_rain_pipeline(spark, tmp_path):
    """End-to-end: UTM-projected admin boundaries + WGS84 rain grid give
    the same district-day aggregates as the WGS84 shapefile (the
    reference's to_crs-on-read semantics)."""
    import numpy as np
    from pyspark.sql import Row

    from mini_project_204721_data_engineering_spark.sources.crs import forward_tm

    def project(ring):
        xs, ys = forward_tm([p[0] for p in ring], [p[1] for p in ring], lon0=99.0)
        return list(zip(xs.tolist(), ys.tolist()))

    grids = {}
    for name, geoms in (
        ("utm", [[project(SQ_A)], [project(SQ_B)]]),
        ("wgs", [[SQ_A], [SQ_B]]),
    ):
        shp = str(tmp_path / f"{name}.shp")
        dbf = str(tmp_path / f"{name}.dbf")
        write_shp(geoms, shp)
        write_dbf(
            pd.DataFrame(
                {
                    "ADM1_TH": ["จังหวัดเชียงใหม่", "จังหวัดเชียงใหม่"],
                    "ADM1_EN": ["Chiang Mai", "Chiang Mai"],
                    "ADM2_TH": ["เมือง", "แม่ริม"],
                    "ADM2_EN": ["Muang", "Mae Rim"],
                }
            ),
            dbf,
            encoding="utf-8",
        )
        if name == "utm":
            (tmp_path / "utm.prj").write_text(UTM47N_PRJ)
        gdf = read_shapefile(shp, dbf, encoding="utf-8")

        from mini_project_204721_data_engineering_spark.pipelines.dims import build_dims
        from mini_project_204721_data_engineering_spark.pipelines.rain import (
            ingest_rain_grid,
        )
        from pyspark.sql import functions as F

        adm2 = spark.createDataFrame(gdf.drop(columns=["wkt"]))
        province, district = build_dims(adm2, north_only=True)
        polygons = pd.DataFrame(
            {
                "province": gdf["ADM1_TH"].str.replace("จังหวัด", "", regex=False),
                "district": gdf["ADM2_TH"],
                "wkt": gdf["wkt"],
            }
        )
        grid = spark.createDataFrame(
            [
                ("2023-06-01", 18.25, 99.25, 10.0),
                ("2023-06-01", 18.75, 99.75, 20.0),
                ("2023-06-01", 18.25, 100.25, 5.0),
            ],
            ["time", "lat", "lon", "precip"],
        ).withColumn("time", F.col("time").cast("timestamp"))
        out = ingest_rain_grid(grid, polygons, province, district, upload_id=3)
        names = {r["district_name"]: r["district_id"] for r in district.collect()}
        grids[name] = {
            r["district_id"]: (round(r["rain_mm_wmean"], 9), round(r["rainfall_mm"], 9))
            for r in out.collect()
        }, names
    # same district-day aggregates from UTM-projected and WGS84 boundaries
    (agg_utm, names_u), (agg_wgs, names_w) = grids["utm"], grids["wgs"]
    assert names_u == names_w
    assert agg_utm == agg_wgs and len(agg_utm) == 2
    del Row, np


def test_record_count_mismatch_raises(tmp_path):
    shp = str(tmp_path / "two.shp")
    dbf = str(tmp_path / "three.dbf")
    write_shp([[SQ_A], [SQ_B]], shp)
    write_dbf(pd.DataFrame({"a": [1, 2, 3]}), dbf, encoding="utf-8")
    with pytest.raises(ValueError, match="records"):
        read_shapefile(shp, dbf, encoding="utf-8")


def test_dims_and_rain_pipeline_from_shp_dbf_pair(spark, tmp_path):
    """The reference's ingest path end-to-end from REAL binary inputs:
    .shp+.dbf → build_dims (F3 filter + C1 clean + dense ids) →
    ingest_rain_grid spatial join + weighted aggregation."""
    shp, dbf = _write_adm_pair(tmp_path)
    gdf = read_shapefile(shp, dbf, encoding="utf-8")

    adm2 = spark.createDataFrame(gdf.drop(columns=["wkt"]))
    province, district = build_dims(adm2, north_only=True)
    assert province.count() == 1  # Bangkok filtered out

    # polygon lookup keyed by the cleaned names, as the reference builds it
    polygons = pd.DataFrame(
        {
            "province": gdf["ADM1_TH"].str.replace("จังหวัด", "", regex=False),
            "district": gdf["ADM2_TH"],
            "wkt": gdf["wkt"],
        }
    )
    grid = spark.createDataFrame(
        [
            ("2023-06-01", 18.25, 99.25, 10.0),
            ("2023-06-01", 18.75, 100.75, 20.0),
            ("2023-06-01", 13.75, 100.5, 30.0),  # Bangkok poly: dim filtered → dropped
        ],
        ["time", "lat", "lon", "precip"],
    ).withColumn("time", F.col("time").cast("timestamp"))

    out = ingest_rain_grid(grid, polygons, province, district, upload_id=3)
    rows = {r["district_id"]: r for r in out.collect()}
    names = {r["district_name"]: r["district_id"] for r in district.collect()}
    assert set(rows) == {names["เมือง"], names["แม่ริม"]}
    assert abs(rows[names["เมือง"]]["rain_mm_wmean"] - 10.0) < 1e-9


INDIAN75_47N_PRJ = (
    'PROJCS["Indian 1975 / UTM zone 47N",GEOGCS["Indian 1975",'
    'DATUM["Indian_1975",SPHEROID["Everest 1830 (1937 Adjustment)",'
    "6377276.345,300.8017]],"
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Transverse_Mercator"],'
    'PARAMETER["False_Easting",500000.0],PARAMETER["False_Northing",0.0],'
    'PARAMETER["Central_Meridian",99.0],PARAMETER["Scale_Factor",0.9996],'
    'PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]'
)


def _wgs84_to_indian1975(lon, lat):
    """Test-only inverse datum path: WGS84 lon/lat → Indian 1975
    geodetic, by negating the published EPSG:1832 translation and
    iterating geocentric→geodetic on the Everest ellipsoid."""
    import numpy as np

    a_w, invf_w = 6378137.0, 298.257223563
    f_w = 1 / invf_w
    e2_w = f_w * (2 - f_w)
    a_e, invf_e = 6377276.345, 300.8017
    f_e = 1 / invf_e
    e2_e = f_e * (2 - f_e)
    lam, phi = np.radians(np.asarray(lon, float)), np.radians(np.asarray(lat, float))
    n = a_w / np.sqrt(1 - e2_w * np.sin(phi) ** 2)
    x = n * np.cos(phi) * np.cos(lam) - 209.0
    y = n * np.cos(phi) * np.sin(lam) - 818.0
    z = n * (1 - e2_w) * np.sin(phi) - 290.0
    p = np.hypot(x, y)
    lat_e = np.arctan2(z, p * (1 - e2_e))
    for _ in range(8):
        ne = a_e / np.sqrt(1 - e2_e * np.sin(lat_e) ** 2)
        lat_e = np.arctan2(z + e2_e * ne * np.sin(lat_e), p)
    return np.degrees(np.arctan2(y, x)), np.degrees(lat_e)


def test_indian1975_prj_reprojects_to_wgs84(tmp_path):
    """VERDICT r5 missing #2 done-criterion: an EPSG:24047-style .prj
    (Indian 1975 / UTM 47N, Everest ellipsoid, published EPSG:1832
    shift) yields districts identical to the WGS84 fixture within
    1e-5° (the transformation's round-trip is exact; the tolerance is
    Bowring + series truncation, observed ~1e-9)."""
    import numpy as np

    from mini_project_204721_data_engineering_spark.sources.crs import forward_tm

    def project(ring):
        lon_e, lat_e = _wgs84_to_indian1975(
            [p[0] for p in ring], [p[1] for p in ring]
        )
        xs, ys = forward_tm(lon_e, lat_e, lon0=99.0, a=6377276.345, invf=300.8017)
        return list(zip(xs.tolist(), ys.tolist()))

    shp = str(tmp_path / "ind.shp")
    write_shp([[project(SQ_A)], [project(SQ_B)], [project(SQ_A), project(HOLE)]], shp)
    (tmp_path / "ind.prj").write_text(INDIAN75_47N_PRJ)

    recs = read_shapefile(shp)
    wgs = str(tmp_path / "wgs.shp")
    write_shp([[SQ_A], [SQ_B], [SQ_A, HOLE]], wgs)
    expect = read_shapefile(wgs)

    from mini_project_204721_data_engineering_spark.sources.geometry import (
        parse_wkt_geometry,
    )

    for got_wkt, want_wkt in zip(recs["wkt"], expect["wkt"]):
        got = np.concatenate(
            [np.asarray(r) for g in parse_wkt_geometry(got_wkt) for r in g]
        )
        want = np.concatenate(
            [np.asarray(r) for g in parse_wkt_geometry(want_wkt) for r in g]
        )
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 1e-5


def test_towgs84_clause_beats_builtin_table(tmp_path):
    """A .prj with an explicit TOWGS84 clause uses ITS parameters: a
    zero-shift TOWGS84 on the WGS84 ellipsoid must reproject exactly
    like plain WGS84 UTM even though the datum name is unknown."""
    import numpy as np

    from mini_project_204721_data_engineering_spark.sources.crs import (
        forward_tm,
        transform_from_prj,
    )

    wkt = (
        'PROJCS["Custom_UTM_47N",GEOGCS["GCS_Custom",DATUM["D_Custom",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563],'
        "TOWGS84[0,0,0,0,0,0,0]],"
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["False_Easting",500000.0],PARAMETER["Central_Meridian",99.0],'
        'PARAMETER["Scale_Factor",0.9996],PARAMETER["Latitude_Of_Origin",0.0]]'
    )
    tf = transform_from_prj(wkt)
    lon0, lat0 = np.array([99.5, 100.2]), np.array([13.7, 16.1])
    x, y = forward_tm(lon0, lat0, lon0=99.0)
    lon, lat = tf(x, y)
    assert np.abs(lon - lon0).max() < 1e-8
    assert np.abs(lat - lat0).max() < 1e-8


def test_towgs84_seven_param_foreign_datum_roundtrip(tmp_path):
    """VERDICT r7 #3 done-criterion: a .prj that spells out a full
    7-parameter TOWGS84 clause on a datum NOT in the built-in table
    (DHDN / 3-degree Gauss-Krüger zone 4 — Bessel 1841 ellipsoid,
    rotations + ppm scale) transforms with ITS parameters.  Truth is an
    independent inverse chain (WGS84 geodetic → geocentric → EXACT
    matrix inverse of the position-vector Helmert → Bessel geodetic by
    iteration → forward TM), so the assertion pins parse_prj's
    parameter pickup AND helmert_shift's convention against an
    independently-coded transform; agreement bar 1e-5° (~1.1 m),
    observed ~1e-9."""
    import numpy as np

    from mini_project_204721_data_engineering_spark.sources.crs import (
        forward_tm,
        transform_from_prj,
    )

    dhdn = (
        'PROJCS["DHDN / 3-degree Gauss-Kruger zone 4",'
        'GEOGCS["DHDN",DATUM["Deutsches_Hauptdreiecksnetz",'
        'SPHEROID["Bessel 1841",6377397.155,299.1528128],'
        "TOWGS84[598.1,73.7,418.2,0.202,0.045,-2.455,6.7]],"
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",12],'
        'PARAMETER["scale_factor",1],PARAMETER["false_easting",4500000],'
        'PARAMETER["false_northing",0],UNIT["metre",1]]'
    )
    a_w, invf_w = 6378137.0, 298.257223563
    f_w = 1 / invf_w
    e2_w = f_w * (2 - f_w)
    a_b, invf_b = 6377397.155, 299.1528128
    f_b = 1 / invf_b
    e2_b = f_b * (2 - f_b)
    dx, dy, dz, rx, ry, rz, s = 598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7
    arc = np.pi / (180.0 * 3600.0)
    m = 1.0 + s * 1e-6
    # position-vector rotation matrix as helmert_shift composes it
    R = np.array(
        [
            [1.0, -rz * arc, ry * arc],
            [rz * arc, 1.0, -rx * arc],
            [-ry * arc, rx * arc, 1.0],
        ]
    )

    def wgs84_to_dhdn(lon, lat):
        lam = np.radians(np.asarray(lon, float))
        phi = np.radians(np.asarray(lat, float))
        n = a_w / np.sqrt(1 - e2_w * np.sin(phi) ** 2)
        xyz_w = np.stack(
            [
                n * np.cos(phi) * np.cos(lam),
                n * np.cos(phi) * np.sin(lam),
                n * (1 - e2_w) * np.sin(phi),
            ]
        )
        # exact inverse of x' = T + m R x
        xyz_b = np.linalg.inv(R) @ ((xyz_w - np.array([[dx], [dy], [dz]])) / m)
        x, y, z = xyz_b
        p = np.hypot(x, y)
        lat_b = np.arctan2(z, p * (1 - e2_b))
        for _ in range(10):
            nb = a_b / np.sqrt(1 - e2_b * np.sin(lat_b) ** 2)
            lat_b = np.arctan2(z + e2_b * nb * np.sin(lat_b), p)
        return np.degrees(np.arctan2(y, x)), np.degrees(lat_b)

    lon0 = np.array([12.37, 11.58, 13.40])
    lat0 = np.array([51.34, 48.14, 52.52])
    lon_b, lat_b = wgs84_to_dhdn(lon0, lat0)
    x, y = forward_tm(
        lon_b, lat_b, lon0=12.0, k0=1.0, fe=4500000.0, fn=0.0,
        a=a_b, invf=invf_b,
    )
    tf = transform_from_prj(dhdn)
    assert tf is not None
    lon, lat = tf(x, y)
    assert np.abs(lon - lon0).max() < 1e-5
    assert np.abs(lat - lat0).max() < 1e-5


def test_towgs84_geographic_crs_foreign_datum(tmp_path):
    """The geog_shift path with an explicit foreign TOWGS84: a
    GEOGCS-only DHDN .prj (no projection) shifts lon/lat directly."""
    import numpy as np

    from mini_project_204721_data_engineering_spark.sources.crs import (
        parse_prj,
        transform_from_prj,
    )

    wkt = (
        'GEOGCS["DHDN",DATUM["Deutsches_Hauptdreiecksnetz",'
        'SPHEROID["Bessel 1841",6377397.155,299.1528128],'
        "TOWGS84[598.1,73.7,418.2,0.202,0.045,-2.455,6.7]],"
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
    )
    info = parse_prj(wkt)
    assert info["kind"] == "geog_shift"
    assert info["towgs84"] == (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)
    tf = transform_from_prj(wkt)
    lon, lat = tf(np.array([12.0]), np.array([51.0]))
    # the German shift moves coordinates ~100 m NE-ish, never degrees
    assert 1e-4 < abs(lon[0] - 12.0) < 0.01
    assert 1e-4 < abs(lat[0] - 51.0) < 0.01
