"""CRS parsing + transverse-Mercator reprojection (reference parity for
``gpd.read_file(...).to_crs("EPSG:4326")``, ``backend/app/utils.py:80``).

The reference silently reprojects any shapefile to WGS84 lon/lat on
read; this environment has no pyproj, but the transverse Mercator
projection (every UTM zone; the CRS Thai agency shapefiles actually
ship, e.g. EPSG:32647 "UTM zone 47N") has closed public inverse series
— Snyder, *Map Projections: A Working Manual*, USGS Professional Paper
1395 (1987), eqs. 8-17..8-25 — accurate to millimeters inside a zone,
far below the 1e-6° (≈0.11 m) parity bar.

``transform_from_prj`` reads an ESRI ``.prj`` WKT and returns ``None``
for geographic WGS84 (no work), a vectorized ``(x, y) → (lon, lat)``
callable for WGS84-datum transverse-Mercator projections (UTM or custom
parameters — parsed from the PARAMETER list, not the zone name), and
raises the same clear error as before for CRS outside that family
(exotic datums would need a datum shift this module honestly does not
do).  The callables are pure numpy — they run inside the executor-side
shapefile decode with no per-point Python loop.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["parse_prj", "transform_from_prj", "utm_lon0", "forward_tm", "inverse_tm"]

# WGS84 ellipsoid
_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_E4 = _E2 * _E2
_E6 = _E4 * _E2
_EP2 = _E2 / (1 - _E2)  # second eccentricity squared

_PARAM = re.compile(r'PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-0-9.eE+]+)\s*\]', re.I)
_UTM_NAME = re.compile(r"UTM[_ ]?ZONE[_ ]?(\d+)\s*,?\s*([NS])?", re.I)


def utm_lon0(zone: int) -> float:
    """Central meridian of a UTM zone (degrees)."""
    return zone * 6 - 183


def parse_prj(wkt: str) -> dict:
    """Classify a ``.prj`` WKT.  Returns ``{"kind": "wgs84"}``,
    ``{"kind": "tm", "lon0", "lat0", "k0", "fe", "fn"}`` (WGS84-datum
    transverse Mercator), or raises ``ValueError`` with the honest
    can't-transform message."""
    head = wkt.strip().upper()
    is_wgs_datum = ("WGS" in head and "84" in head) or "D_WGS_1984" in head
    if head.startswith(("GEOGCS", "GEOGCRS")):
        if is_wgs_datum:
            return {"kind": "wgs84"}
        raise ValueError(
            f"non-WGS84 geographic CRS: {wkt[:60]!r}... — reproject to "
            "EPSG:4326 before ingest"
        )
    if head.startswith(("PROJCS", "PROJCRS")):
        is_tm = "TRANSVERSE_MERCATOR" in head.replace(" ", "_")
        if is_tm and is_wgs_datum:
            params = {k.lower(): float(v) for k, v in _PARAM.findall(wkt)}
            out = {
                "kind": "tm",
                "lon0": params.get("central_meridian", 0.0),
                "lat0": params.get("latitude_of_origin", 0.0),
                "k0": params.get("scale_factor", 0.9996),
                "fe": params.get("false_easting", 500000.0),
                "fn": params.get("false_northing", 0.0),
            }
            if "central_meridian" not in params:
                m = _UTM_NAME.search(wkt)
                if m:
                    out["lon0"] = utm_lon0(int(m.group(1)))
                    if (m.group(2) or "N").upper() == "S":
                        out["fn"] = 10000000.0
            return out
        raise ValueError(
            f"projected CRS outside the WGS84 transverse-Mercator family: "
            f"{wkt[:60]!r}... — reproject to EPSG:4326 before ingest; "
            "datum shifts are not transformed here"
        )
    raise ValueError(f"unrecognized CRS definition: {wkt[:60]!r}...")


def _meridian_arc(phi: np.ndarray) -> np.ndarray:
    """M(φ): meridian arc length from the equator (Snyder eq. 3-21)."""
    return _A * (
        (1 - _E2 / 4 - 3 * _E4 / 64 - 5 * _E6 / 256) * phi
        - (3 * _E2 / 8 + 3 * _E4 / 32 + 45 * _E6 / 1024) * np.sin(2 * phi)
        + (15 * _E4 / 256 + 45 * _E6 / 1024) * np.sin(4 * phi)
        - (35 * _E6 / 3072) * np.sin(6 * phi)
    )


def forward_tm(lon, lat, lon0: float, lat0: float = 0.0, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0):
    """WGS84 lon/lat (deg) → transverse-Mercator easting/northing
    (Snyder eqs. 8-9..8-13).  Exists mainly to build test fixtures and
    to verify the inverse round-trips."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    dlam = np.radians(lon - lon0)
    sin, cos, tan = np.sin(phi), np.cos(phi), np.tan(phi)
    n = _A / np.sqrt(1 - _E2 * sin**2)
    t = tan**2
    c = _EP2 * cos**2
    a_ = dlam * cos
    m = _meridian_arc(phi)
    m0 = _meridian_arc(np.radians(np.float64(lat0)))
    x = fe + k0 * n * (
        a_ + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t**2 + 72 * c - 58 * _EP2) * a_**5 / 120
    )
    y = fn + k0 * (
        m - m0 + n * tan * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * _EP2) * a_**6 / 720
        )
    )
    return x, y


def inverse_tm(x, y, lon0: float, lat0: float = 0.0, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0):
    """Transverse-Mercator easting/northing → WGS84 lon/lat (deg)
    (Snyder eqs. 8-17..8-25: footpoint latitude from the rectifying
    series, then the inverse expansion)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    m = _meridian_arc(np.radians(np.float64(lat0))) + (y - fn) / k0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E4 / 64 - 5 * _E6 / 256))
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = _EP2 * cos1**2
    t1 = tan1**2
    n1 = _A / np.sqrt(1 - _E2 * sin1**2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    d = (x - fe) / (n1 * k0)
    lat = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * _EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * _EP2 - 3 * c1**2)
        * d**6 / 720
    )
    lon = np.radians(lon0) + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * _EP2 + 24 * t1**2) * d**5 / 120
    ) / cos1
    return np.degrees(lon), np.degrees(lat)


def transform_from_prj(wkt: str):
    """``.prj`` WKT → ``None`` (already WGS84 lon/lat) or a vectorized
    ``(x, y) → (lon, lat)`` callable; raises for CRS outside the
    supported family (the pre-r5 guard behavior)."""
    info = parse_prj(wkt)
    if info["kind"] == "wgs84":
        return None
    p = info

    def tf(x, y):
        return inverse_tm(x, y, p["lon0"], p["lat0"], p["k0"], p["fe"], p["fn"])

    return tf
