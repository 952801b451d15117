"""Dependency-free ESRI shapefile (.shp) reader/writer (S3).

The reference reads its ADM2 admin boundaries with geopandas
(``gpd.read_file(SHAPEFILE_PATH)``, ``backend/app/utils.py:80``); neither
geopandas nor pyshp is in this environment, and the shapefile main-file
layout is a small fixed public binary format (ESRI whitepaper, 1998):

- 100-byte header: big-endian file code 9994 @0 and file length (in
  16-bit words) @24; little-endian version 1000 @28, shape type @32,
  bounding box (8 doubles) @36.
- records: 8-byte big-endian header (record number, content length in
  16-bit words), then little-endian content starting with the shape
  type.  Point (1): x, y.  PolyLine (3) / Polygon (5): bbox (4 doubles),
  numParts, numPoints, parts index array, then the points.

Geometries come back as WKT strings so they plug straight into the
existing WKT pipeline (``sources/geometry.py``: parse → broadcast →
point-in-polygon).  Attribute pairing follows the shapefile convention:
the i-th .shp record matches the i-th .dbf record (``read_shapefile``
does the merge, like the reference's ``gpd.read_file``).

Driver-side by design: admin boundary files are dimension-sized (928
polygons in the reference) at any fact scale.  A 100 TB deployment
broadcasts the parsed result; the facts never touch the binary parser.
"""

from __future__ import annotations

import os
import struct

import pandas as pd

from mini_project_204721_data_engineering_spark.sources.dbf import read_dbf

__all__ = [
    "read_shp",
    "read_shapefile",
    "write_shp",
    "wkt_to_shp_parts",
    "check_prj_wgs84",
    "prj_transform",
    "SHAPE_POINT",
    "SHAPE_POLYLINE",
    "SHAPE_POLYGON",
]

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5

_FILE_CODE = 9994
_VERSION = 1000


def _ring_wkt(pts: list[tuple[float, float]]) -> str:
    return "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in pts) + ")"


def _signed_area(pts: list[tuple[float, float]]) -> float:
    """Shoelace area: positive for counter-clockwise rings."""
    a = 0.0
    n = len(pts)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        a += x1 * y2 - x2 * y1
    return a / 2.0


def _polygon_wkt(parts: list[list[tuple[float, float]]]) -> str:
    """Group a polygon record's parts into outer rings + their holes by
    the shapefile winding convention (outer = clockwise, holes =
    counter-clockwise; ESRI whitepaper p.8) and emit POLYGON or
    MULTIPOLYGON WKT.  A CCW first ring (nonconformant writer) still
    starts a polygon, so single-part files read fine regardless of
    winding."""
    polys: list[list[list[tuple[float, float]]]] = []
    for part in parts:
        if polys and _signed_area(part) > 0:
            polys[-1].append(part)  # CCW → hole of the current outer
        else:
            polys.append([part])  # CW (or first) → a new outer ring
    if len(polys) == 1:
        return "POLYGON (" + ", ".join(_ring_wkt(r) for r in polys[0]) + ")"
    return (
        "MULTIPOLYGON ("
        + ", ".join("(" + ", ".join(_ring_wkt(r) for r in p) + ")" for p in polys)
        + ")"
    )


def read_shp(path: str, transform=None) -> list[dict]:
    """Parse the .shp main file into shape records.

    Returns one dict per record: ``{"shape_type": int, "wkt": str | None,
    "parts": [[(x, y), ...], ...]}``; null shapes yield ``wkt=None``.
    Polygon parts are grouped by the spec's winding convention (clockwise
    = outer ring, counter-clockwise = hole) into POLYGON or, when a
    record holds several outer rings (island districts), MULTIPOLYGON
    WKT — downstream ``geometry.parse_wkt_rings`` + even-odd containment
    honor both holes and extra parts, matching geopandas.

    ``transform``: optional vectorized ``(x, y) → (lon, lat)`` applied to
    every coordinate as records are unpacked (``sources/crs.py`` supplies
    one for projected ``.prj`` sidecars — the reference's ``to_crs``
    parity).  Winding orientation is preserved by transverse Mercator
    (conformal), so ring grouping is unaffected.
    """
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 100:
        raise ValueError(f"not a shapefile (too short): {path}")
    (file_code,) = struct.unpack_from(">i", data, 0)
    if file_code != _FILE_CODE:
        raise ValueError(f"bad .shp file code {file_code} (want {_FILE_CODE}): {path}")
    (file_len_words,) = struct.unpack_from(">i", data, 24)
    (version, _global_type) = struct.unpack_from("<ii", data, 28)
    if version != _VERSION:
        raise ValueError(f"unsupported .shp version {version}: {path}")
    end = min(len(data), file_len_words * 2)

    records: list[dict] = []
    pos = 100
    while pos + 8 <= end:
        _recno, content_words = struct.unpack_from(">ii", data, pos)
        pos += 8
        content = data[pos : pos + content_words * 2]
        pos += content_words * 2
        (stype,) = struct.unpack_from("<i", content, 0)
        if stype == SHAPE_NULL:
            records.append({"shape_type": stype, "wkt": None, "parts": []})
        elif stype == SHAPE_POINT:
            x, y = struct.unpack_from("<dd", content, 4)
            if transform is not None:
                x, y = (float(v) for v in transform(x, y))
            records.append(
                {
                    "shape_type": stype,
                    "wkt": f"POINT ({x:.10g} {y:.10g})",
                    "parts": [[(x, y)]],
                }
            )
        elif stype in (SHAPE_POLYLINE, SHAPE_POLYGON):
            n_parts, n_points = struct.unpack_from("<ii", content, 36)
            part_idx = list(struct.unpack_from(f"<{n_parts}i", content, 44))
            pts_off = 44 + 4 * n_parts
            flat = struct.unpack_from(f"<{2 * n_points}d", content, pts_off)
            if transform is not None:
                import numpy as _np

                xs, ys = transform(
                    _np.asarray(flat[0::2]), _np.asarray(flat[1::2])
                )
                pts = list(zip(xs.tolist(), ys.tolist()))
            else:
                pts = [(flat[2 * i], flat[2 * i + 1]) for i in range(n_points)]
            bounds = part_idx + [n_points]
            parts = [pts[bounds[i] : bounds[i + 1]] for i in range(n_parts)]
            if stype == SHAPE_POLYGON:
                wkt = _polygon_wkt(parts)
            elif n_parts == 1:
                wkt = "LINESTRING " + _ring_wkt(parts[0])
            else:
                wkt = (
                    "MULTILINESTRING ("
                    + ", ".join(_ring_wkt(p) for p in parts)
                    + ")"
                )
            records.append({"shape_type": stype, "wkt": wkt, "parts": parts})
        else:
            raise ValueError(f"unsupported shape type {stype} in {path}")
    return records


def prj_transform(shp_path: str):
    """CRS handling (r2 verdict #4, upgraded to reprojection in r5): when
    a ``.prj`` sidecar exists, return ``None`` for geographic WGS84 (use
    coordinates as-is), a vectorized ``(x, y) → (lon, lat)`` transform
    for WGS84-datum transverse-Mercator projections (every UTM zone —
    ``sources/crs.py``, Snyder's public inverse series), or raise the
    clear pre-r5 error for CRS outside that family.

    This matches the reference's reproject-on-read
    (``gpd.read_file(...).to_crs("EPSG:4326")``, ``backend/app/utils.py:80``)
    for the CRS Thai agency shapefiles actually use, while still
    refusing (rather than silently mis-assigning) exotic datums.  A
    missing ``.prj`` is accepted as-is (the spec makes the sidecar
    optional; coordinates are taken as already 4326, same leniency as
    geopandas' crs=None)."""
    prj = os.path.splitext(shp_path)[0] + ".prj"
    if not os.path.exists(prj):
        return None
    with open(prj, encoding="utf-8", errors="replace") as fh:
        wkt = fh.read().strip()
    from mini_project_204721_data_engineering_spark.sources.crs import transform_from_prj

    try:
        return transform_from_prj(wkt)
    except ValueError as e:
        raise ValueError(f"{prj}: {e}") from None


def check_prj_wgs84(shp_path: str) -> None:
    """Back-compat guard: raises for unsupported CRS, accepts WGS84 and
    (since r5) anything :func:`prj_transform` can reproject."""
    prj_transform(shp_path)


def wkt_to_shp_parts(wkt: str) -> list[list[tuple[float, float]]]:
    """POLYGON/MULTIPOLYGON WKT → the flat parts list :func:`write_shp`
    takes, rings oriented to the spec's winding convention (outer
    clockwise, holes counter-clockwise) so :func:`read_shp` groups them
    back into the same geometry — the inverse completing the S3 round
    trip for hole/multi-part records."""
    from mini_project_204721_data_engineering_spark.sources.geometry import (
        parse_wkt_geometry,
    )

    out: list[list[tuple[float, float]]] = []
    for rings in parse_wkt_geometry(wkt):
        for i, ring in enumerate(rings):
            pts = [(float(x), float(y)) for x, y in ring]
            want_ccw = i > 0  # hole rings are CCW, outer rings CW
            if (_signed_area(pts) > 0) != want_ccw:
                pts = pts[::-1]
            out.append(pts)
    return out


def read_shapefile(
    shp_path: str,
    dbf_path: str | None = None,
    encoding: str = "utf-8",
    lowercase_columns: bool = False,
) -> pd.DataFrame:
    """Read a .shp (+ optional sibling .dbf attribute table) into a
    DataFrame with the attribute columns plus a ``wkt`` geometry column —
    the engine's equivalent of the reference's ``gpd.read_file``
    (``backend/app/utils.py:80``).  Records pair by file order per the
    shapefile spec.  A ``.prj`` sidecar, when present, is honored: WGS84
    passes through, WGS84-datum transverse-Mercator (UTM) coordinates
    reproject on read (:func:`prj_transform` — the reference's
    ``to_crs`` behavior), anything else raises."""
    shapes = read_shp(shp_path, transform=prj_transform(shp_path))
    geo = pd.DataFrame({"wkt": [s["wkt"] for s in shapes]})
    if dbf_path is None:
        return geo
    attrs = read_dbf(dbf_path, encoding=encoding, lowercase_columns=lowercase_columns)
    if len(attrs) != len(geo):
        raise ValueError(
            f".shp has {len(geo)} records but .dbf has {len(attrs)}: "
            f"{shp_path} / {dbf_path}"
        )
    attrs = attrs.reset_index(drop=True)
    attrs["wkt"] = geo["wkt"]
    return attrs


def write_shp(geoms: list[list[list[tuple[float, float]]]], path: str, shape_type: int = SHAPE_POLYGON) -> None:
    """Write polygon/point geometries as a .shp main file (tests/fixtures —
    gives :func:`read_shp` a real binary file to exercise, the same
    round-trip strategy as ``dbf.write_dbf``).

    ``geoms``: one entry per record; each entry is a list of parts, each
    part a list of (x, y).  For ``SHAPE_POINT`` pass one part with one
    point per record.
    """
    recs = bytearray()
    all_x: list[float] = []
    all_y: list[float] = []
    for recno, parts in enumerate(geoms, start=1):
        flat = [pt for part in parts for pt in part]
        all_x += [p[0] for p in flat]
        all_y += [p[1] for p in flat]
        if shape_type == SHAPE_POINT:
            (x, y) = flat[0]
            content = struct.pack("<idd", SHAPE_POINT, x, y)
        else:
            xs, ys = [p[0] for p in flat], [p[1] for p in flat]
            n_points = len(flat)
            part_idx = []
            acc = 0
            for part in parts:
                part_idx.append(acc)
                acc += len(part)
            content = struct.pack(
                "<i4dii", shape_type, min(xs), min(ys), max(xs), max(ys), len(parts), n_points
            )
            content += struct.pack(f"<{len(parts)}i", *part_idx)
            content += struct.pack(f"<{2 * n_points}d", *[c for pt in flat for c in pt])
        recs += struct.pack(">ii", recno, len(content) // 2)
        recs += content

    header = bytearray(100)
    struct.pack_into(">i", header, 0, _FILE_CODE)
    struct.pack_into(">i", header, 24, (100 + len(recs)) // 2)
    struct.pack_into("<ii", header, 28, _VERSION, shape_type)
    if all_x:
        struct.pack_into(
            "<4d", header, 36, min(all_x), min(all_y), max(all_x), max(all_y)
        )
    with open(path, "wb") as f:
        f.write(bytes(header) + bytes(recs))
