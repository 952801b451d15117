"""CRS parsing + transverse-Mercator reprojection (reference parity for
``gpd.read_file(...).to_crs("EPSG:4326")``, ``backend/app/utils.py:80``).

The reference silently reprojects any shapefile to WGS84 lon/lat on
read; this environment has no pyproj, but the transverse Mercator
projection (every UTM zone; the CRS Thai agency shapefiles actually
ship, e.g. EPSG:32647 "UTM zone 47N") has closed public inverse series
— Snyder, *Map Projections: A Working Manual*, USGS Professional Paper
1395 (1987), eqs. 8-17..8-25 — accurate to millimeters inside a zone,
far below the 1e-6° (≈0.11 m) parity bar.

Datum shifts (r6): Thai agency shapefiles frequently ship on the
**Indian 1975** datum (EPSG:24047/24048 — UTM on the Everest 1830
(1937 Adjustment) ellipsoid).  These are handled with the standard
geocentric (Helmert) transformation from the public EPSG registry:
inverse TM on the SOURCE ellipsoid → geodetic→geocentric (source) →
translate/rotate/scale → geocentric→geodetic (WGS84, Bowring).  The
``.prj``'s own ``TOWGS84[...]`` parameters win when present; otherwise
the published EPSG parameters for recognized datum names apply
(Indian 1975 → WGS84: EPSG:1832, +209 +818 +290 m, Thailand onshore;
Indian 1954: EPSG:1153, +217 +823 +299 m).  pyproj resolves the same
registry entries, so results agree to the transformation's stated
accuracy (~1-3 m), and well under 1e-5° against the same parameters.

``transform_from_prj`` reads an ESRI ``.prj`` WKT and returns ``None``
for geographic WGS84 (no work) or a vectorized ``(x, y) → (lon, lat)``
callable for the supported family (transverse Mercator on any parsed
ellipsoid, with an optional datum shift; geographic CRS on a shifted
datum transforms lon/lat directly), and raises a clear error for CRS
outside that family.  The callables are pure numpy — they run inside
the executor-side shapefile decode with no per-point Python loop.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "parse_prj",
    "transform_from_prj",
    "utm_lon0",
    "forward_tm",
    "inverse_tm",
    "helmert_shift",
]

# WGS84 ellipsoid
_A = 6378137.0
_INVF = 298.257223563
_F = 1 / _INVF
_E2 = _F * (2 - _F)

_PARAM = re.compile(r'PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-0-9.eE+]+)\s*\]', re.I)
_UTM_NAME = re.compile(r"UTM[_ ]?ZONE[_ ]?(\d+)\s*,?\s*([NS])?", re.I)
_SPHEROID = re.compile(
    r'(?:SPHEROID|ELLIPSOID)\s*\[\s*"([^"]+)"\s*,\s*([-0-9.eE+]+)\s*,\s*([-0-9.eE+]+)',
    re.I,
)
_TOWGS84 = re.compile(r"TOWGS84\s*\[([^\]]+)\]", re.I)

# Published EPSG geocentric translations to WGS84 for datum names that
# ship without a TOWGS84 clause (name-normalized; meters).
_DATUM_SHIFTS = {
    "INDIAN_1975": (209.0, 818.0, 290.0),  # EPSG:1832, Thailand onshore
    "INDIAN_1954": (217.0, 823.0, 299.0),  # EPSG:1153, Myanmar/Thailand
}
# Fallback ellipsoids for those datums if the WKT omits the SPHEROID
_DATUM_ELLIPSOIDS = {
    "INDIAN_1975": (6377276.345, 300.8017),  # Everest 1830 (1937 Adj.), EPSG:7015
    "INDIAN_1954": (6377276.345, 300.8017),
}


def utm_lon0(zone: int) -> float:
    """Central meridian of a UTM zone (degrees)."""
    return zone * 6 - 183


def _ell(invf: float, a: float):
    """Derived ellipsoid constants (e², e⁴, e⁶, e'²) from a, 1/f."""
    f = 1.0 / invf
    e2 = f * (2 - f)
    return e2, e2 * e2, e2 * e2 * e2, e2 / (1 - e2)


def _datum_key(wkt: str) -> str | None:
    m = re.search(r'DATUM\s*\[\s*"([^"]+)"', wkt, re.I)
    if not m:
        return None
    return re.sub(r"^D_", "", re.sub(r"[^A-Z0-9]+", "_", m.group(1).upper())).strip("_")


def parse_prj(wkt: str) -> dict:
    """Classify a ``.prj`` WKT.  Returns ``{"kind": "wgs84"}``,
    ``{"kind": "geog_shift", "ellipsoid", "towgs84"}`` (geographic CRS
    on a shifted datum), or ``{"kind": "tm", "lon0", "lat0", "k0",
    "fe", "fn", "ellipsoid", "towgs84"}`` (transverse Mercator;
    ``towgs84`` is ``None`` on the WGS84 datum), or raises
    ``ValueError`` with the honest can't-transform message."""
    head = wkt.strip().upper()
    # the WGS84-datum sniff must ignore the TOWGS84 keyword itself
    # (it literally contains "WGS"+"84", which would classify EVERY
    # datum carrying an explicit shift clause as already-WGS84 and
    # silently skip the shift)
    head_no_tow = _TOWGS84.sub("", head)
    is_wgs_datum = ("WGS" in head_no_tow and "84" in head_no_tow) or (
        "D_WGS_1984" in head_no_tow
    )
    ell = (_A, _INVF)
    m = _SPHEROID.search(wkt)
    if m:
        ell = (float(m.group(2)), float(m.group(3)))
    towgs84 = None
    if not is_wgs_datum:
        t = _TOWGS84.search(wkt)
        if t:
            vals = [float(v) for v in re.split(r"[,\s]+", t.group(1).strip()) if v]
            towgs84 = tuple(vals[:7] + [0.0] * (7 - len(vals[:7])))
        else:
            key = _datum_key(wkt)
            if key in _DATUM_SHIFTS:
                towgs84 = _DATUM_SHIFTS[key] + (0.0, 0.0, 0.0, 0.0)
                if not m:
                    ell = _DATUM_ELLIPSOIDS[key]
    if head.startswith(("GEOGCS", "GEOGCRS")):
        if is_wgs_datum:
            return {"kind": "wgs84"}
        if towgs84 is not None:
            return {"kind": "geog_shift", "ellipsoid": ell, "towgs84": towgs84}
        raise ValueError(
            f"geographic CRS on an unrecognized datum: {wkt[:60]!r}... — "
            "no TOWGS84 clause and no published shift known here; "
            "reproject to EPSG:4326 before ingest"
        )
    if head.startswith(("PROJCS", "PROJCRS")):
        is_tm = "TRANSVERSE_MERCATOR" in head.replace(" ", "_")
        if is_tm and (is_wgs_datum or towgs84 is not None):
            params = {k.lower(): float(v) for k, v in _PARAM.findall(wkt)}
            out = {
                "kind": "tm",
                "lon0": params.get("central_meridian", 0.0),
                "lat0": params.get("latitude_of_origin", 0.0),
                "k0": params.get("scale_factor", 0.9996),
                "fe": params.get("false_easting", 500000.0),
                "fn": params.get("false_northing", 0.0),
                "ellipsoid": (_A, _INVF) if is_wgs_datum and not m else ell,
                "towgs84": None if is_wgs_datum else towgs84,
            }
            if "central_meridian" not in params:
                mz = _UTM_NAME.search(wkt)
                if mz:
                    out["lon0"] = utm_lon0(int(mz.group(1)))
                    if (mz.group(2) or "N").upper() == "S":
                        out["fn"] = 10000000.0
            return out
        raise ValueError(
            f"projected CRS outside the supported transverse-Mercator "
            f"family: {wkt[:60]!r}... — reproject to EPSG:4326 before "
            "ingest; only WGS84-datum TM and TM on datums with a TOWGS84 "
            "clause or a published EPSG shift are transformed here"
        )
    raise ValueError(f"unrecognized CRS definition: {wkt[:60]!r}...")


def _meridian_arc(
    phi: np.ndarray, a: float = _A, invf: float = _INVF
) -> np.ndarray:
    """M(φ): meridian arc length from the equator (Snyder eq. 3-21)."""
    e2, e4, e6, _ = _ell(invf, a)
    return a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )


def forward_tm(lon, lat, lon0: float, lat0: float = 0.0, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0,
               a: float = _A, invf: float = _INVF):
    """Geodetic lon/lat (deg, on the given ellipsoid) → transverse-
    Mercator easting/northing (Snyder eqs. 8-9..8-13).  Exists mainly
    to build test fixtures and to verify the inverse round-trips."""
    e2, _, _, ep2 = _ell(invf, a)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    dlam = np.radians(lon - lon0)
    sin, cos, tan = np.sin(phi), np.cos(phi), np.tan(phi)
    n = a / np.sqrt(1 - e2 * sin**2)
    t = tan**2
    c = ep2 * cos**2
    a_ = dlam * cos
    m = _meridian_arc(phi, a, invf)
    m0 = _meridian_arc(np.radians(np.float64(lat0)), a, invf)
    x = fe + k0 * n * (
        a_ + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t**2 + 72 * c - 58 * ep2) * a_**5 / 120
    )
    y = fn + k0 * (
        m - m0 + n * tan * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * ep2) * a_**6 / 720
        )
    )
    return x, y


def inverse_tm(x, y, lon0: float, lat0: float = 0.0, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0,
               a: float = _A, invf: float = _INVF):
    """Transverse-Mercator easting/northing → geodetic lon/lat (deg, on
    the given ellipsoid) (Snyder eqs. 8-17..8-25: footpoint latitude
    from the rectifying series, then the inverse expansion)."""
    e2, e4, e6, ep2 = _ell(invf, a)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    m = _meridian_arc(np.radians(np.float64(lat0)), a, invf) + (y - fn) / k0
    mu = m / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = ep2 * cos1**2
    t1 = tan1**2
    n1 = a / np.sqrt(1 - e2 * sin1**2)
    r1 = a * (1 - e2) / (1 - e2 * sin1**2) ** 1.5
    d = (x - fe) / (n1 * k0)
    lat = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * ep2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * ep2 - 3 * c1**2)
        * d**6 / 720
    )
    lon = np.radians(lon0) + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * ep2 + 24 * t1**2) * d**5 / 120
    ) / cos1
    return np.degrees(lon), np.degrees(lat)


def helmert_shift(lon, lat, towgs84, a: float, invf: float):
    """Geodetic lon/lat (deg) on the SOURCE ellipsoid → WGS84 lon/lat
    via the standard 7-parameter Helmert transformation (EPSG 9606,
    position-vector convention; a 3-parameter shift is the rx=ry=rz=s=0
    special case).  h=0 on the source surface — the sub-meter horizontal
    effect of ellipsoidal height on a shapefile boundary is far below
    the transformation's own stated accuracy.

    Geocentric conversion both ways; the return trip uses Bowring's
    closed-form (1976) with one refinement pass — sub-mm for Earth
    surface points.  Pure vectorized numpy."""
    dx, dy, dz, rx, ry, rz, s = (tuple(towgs84) + (0.0,) * 7)[:7]
    e2_src = (1.0 / invf) * (2 - 1.0 / invf)
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sinp, cosp = np.sin(phi), np.cos(phi)
    n = a / np.sqrt(1 - e2_src * sinp**2)
    x = n * cosp * np.cos(lam)
    y = n * cosp * np.sin(lam)
    z = n * (1 - e2_src) * sinp
    # position-vector Helmert: rotations in arc-seconds, scale in ppm
    arc = np.pi / (180.0 * 3600.0)
    rxr, ryr, rzr = rx * arc, ry * arc, rz * arc
    m = 1.0 + s * 1e-6
    x2 = dx + m * (x - rzr * y + ryr * z)
    y2 = dy + m * (rzr * x + y - rxr * z)
    z2 = dz + m * (-ryr * x + rxr * y + z)
    # geocentric → geodetic on WGS84 (Bowring)
    b = _A * (1 - _F)
    ep2 = (_A * _A - b * b) / (b * b)
    p = np.hypot(x2, y2)
    u = np.arctan2(z2 * _A, p * b)
    lat_w = np.arctan2(
        z2 + ep2 * b * np.sin(u) ** 3, p - _E2 * _A * np.cos(u) ** 3
    )
    # one refinement pass
    u = np.arctan2((1 - _F) * np.sin(lat_w), np.cos(lat_w))
    lat_w = np.arctan2(
        z2 + ep2 * b * np.sin(u) ** 3, p - _E2 * _A * np.cos(u) ** 3
    )
    lon_w = np.arctan2(y2, x2)
    return np.degrees(lon_w), np.degrees(lat_w)


def transform_from_prj(wkt: str):
    """``.prj`` WKT → ``None`` (already WGS84 lon/lat) or a vectorized
    ``(x, y) → (lon, lat)`` callable (inverse TM on the source
    ellipsoid, composed with a Helmert datum shift when the datum is
    not WGS84); raises for CRS outside the supported family."""
    info = parse_prj(wkt)
    if info["kind"] == "wgs84":
        return None
    if info["kind"] == "geog_shift":
        ga, ginvf = info["ellipsoid"]
        gtow = info["towgs84"]

        def tf_geog(x, y):
            return helmert_shift(x, y, gtow, ga, ginvf)

        return tf_geog
    p = info
    ea, einvf = p["ellipsoid"]
    tow = p["towgs84"]

    def tf(x, y):
        lon, lat = inverse_tm(
            x, y, p["lon0"], p["lat0"], p["k0"], p["fe"], p["fn"], ea, einvf
        )
        if tow is not None:
            lon, lat = helmert_shift(lon, lat, tow, ea, einvf)
        return lon, lat

    return tf
