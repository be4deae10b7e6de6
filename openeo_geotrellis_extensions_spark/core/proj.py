"""Pure-numpy CRS transforms — the engine's reprojection math.

Scope mirrors what the reference exercises in its reproject tests
(reproject/TileRDDReproject.scala:40-419, RasterRegionReproject.scala) and
its default UTM layout (DatacubeSupport.scala:58-80):

- EPSG:4326 <-> EPSG:3857 (spherical web-Mercator): closed-form
  log/tan/atan/exp, AXIS-SEPARABLE (x' depends only on x, y' only on y)
  and strictly monotone, so 1-D pixel-center arrays transform independently
  and extent corners bound the image exactly.
- EPSG:4326 <-> EPSG:326xx/327xx (WGS84 UTM, any zone): Krueger series
  transverse Mercator on the WGS84 ellipsoid (alpha/beta series to n^4,
  ~0.1 mm accuracy inside a zone) — NOT separable (easting depends on both
  lon and lat), handled through the general point-transform API; extents
  are bounded by densified edge sampling.
- EPSG:3857 <-> UTM composes through 4326.

No proj library, no Spark imports — runs inside pandas UDFs untouched.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .grid import Extent, LayoutDefinition

#: WGS84 / spherical-Mercator earth radius (meters).
EARTH_RADIUS = 6378137.0

#: Latitude where web-Mercator y reaches the square world bound (degrees).
MAX_MERCATOR_LAT = 85.05112877980659

AxisFn = Callable[[np.ndarray], np.ndarray]


def _merc_x(lon: np.ndarray) -> np.ndarray:
    return EARTH_RADIUS * np.radians(np.asarray(lon, dtype=np.float64))


def _merc_y(lat: np.ndarray) -> np.ndarray:
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_MERCATOR_LAT, MAX_MERCATOR_LAT)
    return EARTH_RADIUS * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))


def _inv_merc_x(x: np.ndarray) -> np.ndarray:
    return np.degrees(np.asarray(x, dtype=np.float64) / EARTH_RADIUS)


def _inv_merc_y(y: np.ndarray) -> np.ndarray:
    return np.degrees(
        2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / EARTH_RADIUS))
        - np.pi / 2.0
    )


def _identity(v: np.ndarray) -> np.ndarray:
    return np.asarray(v, dtype=np.float64)


#: (src, dst) -> (fx, fy) separable transforms mapping src coords to dst.
_AXIS_TRANSFORMS: dict[tuple[str, str], tuple[AxisFn, AxisFn]] = {
    ("EPSG:4326", "EPSG:3857"): (_merc_x, _merc_y),
    ("EPSG:3857", "EPSG:4326"): (_inv_merc_x, _inv_merc_y),
}


def transform_fns(src_crs: str, dst_crs: str) -> tuple[AxisFn, AxisFn]:
    """Separable (fx, fy) mapping src-CRS coords to dst-CRS coords.
    Identity when the CRSs match; raises for non-separable pairs (UTM) —
    those go through :func:`point_transform`."""
    if src_crs == dst_crs:
        return _identity, _identity
    try:
        return _AXIS_TRANSFORMS[(src_crs, dst_crs)]
    except KeyError:
        raise NotImplementedError(
            f"CRS transform {src_crs} -> {dst_crs} is not axis-separable "
            "(or unsupported) — use point_transform"
        ) from None


# ---------------------------------------------------------------------------
# WGS84 transverse Mercator (UTM) — Krueger alpha/beta series, order n^4.
# The reference's default grid is UTM with 10 m snapping
# (DatacubeSupport.scala:58-80); series accuracy inside a zone is ~0.1 mm,
# far below any pixel size the engine handles.
# ---------------------------------------------------------------------------

#: WGS84 ellipsoid
_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_UTM_K0 = 0.9996
_UTM_E0 = 500000.0
_UTM_N0_SOUTH = 10000000.0

_E2 = _WGS84_F * (2.0 - _WGS84_F)
_E1 = float(np.sqrt(_E2))
_N = _WGS84_F / (2.0 - _WGS84_F)

#: rectifying radius A (Krueger)
_TM_A = _WGS84_A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)

#: forward series (geodetic -> TM)
_ALPHA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0 + 41.0 * _N**4 / 180.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0 + 557.0 * _N**4 / 1440.0,
    61.0 * _N**3 / 240.0 - 103.0 * _N**4 / 140.0,
    49561.0 * _N**4 / 161280.0,
)

#: inverse series (TM -> geodetic)
_BETA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 37.0 * _N**3 / 96.0 - _N**4 / 360.0,
    _N**2 / 48.0 + _N**3 / 15.0 - 437.0 * _N**4 / 1440.0,
    17.0 * _N**3 / 480.0 - 37.0 * _N**4 / 840.0,
    4397.0 * _N**4 / 161280.0,
)

#: conformal -> geodetic latitude series (chi -> phi)
_CHI_C = (
    _E2 / 2.0 + 5.0 * _E2**2 / 24.0 + _E2**3 / 12.0 + 13.0 * _E2**4 / 360.0,
    7.0 * _E2**2 / 48.0 + 29.0 * _E2**3 / 240.0 + 811.0 * _E2**4 / 11520.0,
    7.0 * _E2**3 / 120.0 + 81.0 * _E2**4 / 1120.0,
    4279.0 * _E2**4 / 161280.0,
)


def utm_crs(zone: int, south: bool = False) -> str:
    """EPSG code string for a WGS84 UTM zone (326xx north / 327xx south)."""
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone {zone} out of range 1..60")
    return f"EPSG:{(32700 if south else 32600) + zone}"


def parse_utm(crs: str) -> tuple[int, bool] | None:
    """(zone, south) for EPSG:326xx/327xx strings, else None."""
    if not crs.upper().startswith("EPSG:"):
        return None
    try:
        code = int(crs.split(":", 1)[1])
    except ValueError:
        return None
    if 32601 <= code <= 32660:
        return code - 32600, False
    if 32701 <= code <= 32760:
        return code - 32700, True
    return None


def utm_zone_for(lon: float, lat: float) -> str:
    """UTM CRS whose zone contains (lon, lat) — the reference's
    bestUtmCrs pick for its default target layout
    (DatacubeSupport.scala:58-62). Norway/Svalbard exceptions omitted (the
    reference's grid negotiation does not apply them either)."""
    zone = int((lon + 180.0) // 6.0) + 1
    return utm_crs(min(60, max(1, zone)), south=lat < 0)


def utm_forward(zone: int, south: bool):
    """(lon_deg, lat_deg) arrays -> (easting, northing) for the zone.
    Krueger forward: conformal latitude -> complex TM series."""
    lon0 = float(zone * 6 - 183)
    n0 = _UTM_N0_SOUTH if south else 0.0

    def fwd(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        s = np.sin(phi)
        with np.errstate(divide="ignore"):  # atanh(+-1) -> +-inf at the poles
            t = np.sinh(np.arctanh(s) - _E1 * np.arctanh(_E1 * s))  # limit is exact
        xi = np.arctan2(t, np.cos(lam))
        eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        X, Y = xi.copy(), eta.copy()
        for j, a in enumerate(_ALPHA, start=1):
            X += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            Y += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        return _UTM_E0 + _UTM_K0 * _TM_A * Y, n0 + _UTM_K0 * _TM_A * X

    return fwd


def utm_inverse(zone: int, south: bool):
    """(easting, northing) arrays -> (lon_deg, lat_deg) for the zone.
    Krueger inverse + conformal-to-geodetic latitude series."""
    lon0 = float(zone * 6 - 183)
    n0 = _UTM_N0_SOUTH if south else 0.0

    def inv(e: np.ndarray, n: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        xi = (np.asarray(n, dtype=np.float64) - n0) / (_UTM_K0 * _TM_A)
        eta = (np.asarray(e, dtype=np.float64) - _UTM_E0) / (_UTM_K0 * _TM_A)
        X, Y = xi.copy(), eta.copy()
        for j, b in enumerate(_BETA, start=1):
            X -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            Y -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        sh, cx = np.sinh(Y), np.cos(X)
        lam = np.arctan2(sh, cx)
        chi = np.arcsin(np.sin(X) / np.cosh(Y))
        phi = chi.copy()
        for j, c in enumerate(_CHI_C, start=1):
            phi += c * np.sin(2 * j * chi)
        return lon0 + np.degrees(lam), np.degrees(phi)

    return inv


# ---------------------------------------------------------------------------
# Polar stereographic, variant B (ellipsoidal, WGS84) — EPSG:3031 Antarctic,
# EPSG:3413 NSIDC Arctic, EPSG:3032 Australian Antarctic.  Snyder pp. 160-162
# (eqs. 21-33..21-41 / 15-9); the conformal-to-geodetic latitude series
# _CHI_C (WGS84) is shared with the UTM inverse.
# ---------------------------------------------------------------------------

#: crs -> (south aspect, true-scale latitude, lon0, false easting, northing)
_POLAR_STEREO_PARAMS: dict[str, tuple[bool, float, float, float, float]] = {
    "EPSG:3031": (True, -71.0, 0.0, 0.0, 0.0),
    "EPSG:3032": (True, -71.0, 70.0, 6000000.0, 6000000.0),
    "EPSG:3413": (False, 70.0, -45.0, 0.0, 0.0),
}


def _ps_t(phi: np.ndarray) -> np.ndarray:
    """Snyder 15-9: isometric-latitude exponential for the NORTH aspect."""
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) * (
        (1.0 + _E1 * s) / (1.0 - _E1 * s)
    ) ** (_E1 / 2.0)


def _ps_consts(crs: str) -> tuple[bool, float, float, float, float]:
    """(south, rho_factor = a*m(|lat_ts|)/t(|lat_ts|), lon0, x0, y0)."""
    south, lat_ts, lon0, x0, y0 = _POLAR_STEREO_PARAMS[crs]
    phi_f = np.radians(abs(lat_ts))
    m_f = float(
        np.cos(phi_f) / np.sqrt(1.0 - _E2 * np.sin(phi_f) ** 2)
    )
    return south, _WGS84_A * m_f / float(_ps_t(np.array(phi_f))), lon0, x0, y0


def polar_stereo_forward(crs: str):
    """(lon_deg, lat_deg) arrays -> (easting, northing) for a registered
    polar stereographic CRS (variant B: scale true at lat_ts)."""
    south, rf, lon0, x0, y0 = _ps_consts(crs)

    def fwd(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        rho = rf * _ps_t(-phi if south else phi)
        x = x0 + rho * np.sin(lam)
        y = y0 + (rho * np.cos(lam) if south else -rho * np.cos(lam))
        return x, y

    return fwd


def polar_stereo_inverse(crs: str):
    """(easting, northing) arrays -> (lon_deg, lat_deg): chi from the
    inverted t, then the shared WGS84 conformal->geodetic series."""
    south, rf, lon0, x0, y0 = _ps_consts(crs)

    def inv(e: np.ndarray, n: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        xp = np.asarray(e, dtype=np.float64) - x0
        yp = np.asarray(n, dtype=np.float64) - y0
        rho = np.hypot(xp, yp)
        t = rho / rf
        chi = np.pi / 2.0 - 2.0 * np.arctan(t)
        phi = chi.copy()
        for j, c in enumerate(_CHI_C, start=1):
            phi += c * np.sin(2 * j * chi)
        lam = np.arctan2(xp, yp) if south else np.arctan2(xp, -yp)
        if south:
            phi = -phi
        return lon0 + np.degrees(lam), np.degrees(phi)

    return inv


# ---------------------------------------------------------------------------
# Lambert azimuthal equal-area (ellipsoidal, oblique) — EPSG:3035
# (ETRS89-extended / LAEA Europe, GRS80 ellipsoid).  The reference's own test
# surface exercises EPSG:3035 (LoadStacPyramidFactoryTest.scala); formulas are
# Snyder, "Map Projections — A Working Manual", pp. 187-190 (authalic
# latitude + azimuthal equal-area on the authalic sphere).
# ---------------------------------------------------------------------------

#: GRS80 ellipsoid (ETRS89 datum of EPSG:3035)
_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101
_GRS80_E2 = _GRS80_F * (2.0 - _GRS80_F)
_GRS80_E = float(np.sqrt(_GRS80_E2))

#: authalic -> geodetic latitude series (Snyder eq. 3-18), beta -> phi
_B2P = (
    _GRS80_E2 / 3.0 + 31.0 * _GRS80_E2**2 / 180.0 + 517.0 * _GRS80_E2**3 / 5040.0,
    23.0 * _GRS80_E2**2 / 360.0 + 251.0 * _GRS80_E2**3 / 3780.0,
    761.0 * _GRS80_E2**3 / 45360.0,
)

#: crs -> (lat_0, lon_0, false easting, false northing)
_LAEA_PARAMS: dict[str, tuple[float, float, float, float]] = {
    "EPSG:3035": (52.0, 10.0, 4321000.0, 3210000.0),
}


def _authalic_q(sin_phi: np.ndarray) -> np.ndarray:
    """Snyder eq. 3-12: q(phi) such that authalic latitude
    beta = arcsin(q / q_p).  Vectorized over sin(phi)."""
    es = _GRS80_E * sin_phi
    return (1.0 - _GRS80_E2) * (
        sin_phi / (1.0 - _GRS80_E2 * sin_phi * sin_phi)
        - np.log((1.0 - es) / (1.0 + es)) / (2.0 * _GRS80_E)
    )


#: q at the pole (phi = 90 deg)
_LAEA_QP = float(_authalic_q(np.array(1.0)))
#: radius of the authalic sphere
_LAEA_RQ = _GRS80_A * float(np.sqrt(_LAEA_QP / 2.0))


def _laea_consts(crs: str) -> tuple[float, float, float, float, float, float]:
    """(sin beta1, cos beta1, D, lon0_deg, x0, y0) for a registered LAEA crs."""
    lat0, lon0, x0, y0 = _LAEA_PARAMS[crs]
    phi1 = np.radians(lat0)
    beta1 = float(np.arcsin(_authalic_q(np.sin(phi1)) / _LAEA_QP))
    m1 = float(np.cos(phi1) / np.sqrt(1.0 - _GRS80_E2 * np.sin(phi1) ** 2))
    d = _GRS80_A * m1 / (_LAEA_RQ * float(np.cos(beta1)))
    return float(np.sin(beta1)), float(np.cos(beta1)), d, lon0, x0, y0


def laea_forward(crs: str):
    """(lon_deg, lat_deg) arrays -> (easting, northing) for a registered
    ellipsoidal-LAEA CRS (Snyder eqs. 24-26..24-30, oblique aspect)."""
    sb1, cb1, d, lon0, x0, y0 = _laea_consts(crs)

    def fwd(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        beta = np.arcsin(np.clip(_authalic_q(np.sin(phi)) / _LAEA_QP, -1.0, 1.0))
        sb, cb = np.sin(beta), np.cos(beta)
        b = _LAEA_RQ * np.sqrt(2.0 / (1.0 + sb1 * sb + cb1 * cb * np.cos(lam)))
        return (
            x0 + b * d * cb * np.sin(lam),
            y0 + (b / d) * (cb1 * sb - sb1 * cb * np.cos(lam)),
        )

    return fwd


def laea_inverse(crs: str):
    """(easting, northing) arrays -> (lon_deg, lat_deg) for a registered
    ellipsoidal-LAEA CRS (Snyder eqs. 24-31..24-34 + series 3-18)."""
    sb1, cb1, d, lon0, x0, y0 = _laea_consts(crs)
    p1, p2, p3 = _B2P

    def inv(e: np.ndarray, n: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        xp = np.asarray(e, dtype=np.float64) - x0
        yp = np.asarray(n, dtype=np.float64) - y0
        rho = np.sqrt((xp / d) ** 2 + (d * yp) ** 2)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * _LAEA_RQ), -1.0, 1.0))
        sce, cce = np.sin(ce), np.cos(ce)
        with np.errstate(invalid="ignore"):  # rho=0 at the projection center
            q = _LAEA_QP * (cce * sb1 + d * yp * sce * cb1 / rho)
        q = np.where(rho == 0.0, _LAEA_QP * sb1, q)
        lam = np.arctan2(xp * sce, d * rho * cb1 * cce - d * d * yp * sb1 * sce)
        beta = np.arcsin(np.clip(q / _LAEA_QP, -1.0, 1.0))
        phi = (
            beta
            + p1 * np.sin(2.0 * beta)
            + p2 * np.sin(4.0 * beta)
            + p3 * np.sin(6.0 * beta)
        )
        return lon0 + np.degrees(lam), np.degrees(phi)

    return inv


# ---------------------------------------------------------------------------
# Lambert conformal conic, 2 standard parallels (ellipsoidal) — EPSG:2154
# (RGF93 / Lambert-93, the French national grid) and EPSG:3978 (NAD83 /
# Canada Atlas Lambert).  Snyder pp. 104-110 (eqs. 14-15, 15-1..15-11);
# the reference reaches these through geotrellis-proj4
# (reproject/TileRDDReproject.scala:40-419 accepts any proj4 CRS).  Both
# registered CRSs sit on GRS80; datum-shift-bearing legacy grids (NTF /
# NAD27 zones) are out of scope like everywhere else in this module.
# ---------------------------------------------------------------------------

#: crs -> (phi1, phi2, phi0, lon0, false easting, false northing, a, e2)
_LCC_PARAMS: dict[str, tuple[float, float, float, float, float, float, float, float]] = {
    "EPSG:2154": (44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0, _GRS80_A, _GRS80_E2),
    "EPSG:3978": (49.0, 77.0, 49.0, -95.0, 0.0, 0.0, _GRS80_A, _GRS80_E2),
}


def _chi_to_phi_coefs(e2: float) -> tuple[float, float, float, float]:
    """Conformal -> geodetic latitude series coefficients (Snyder eq. 3-5)
    for an arbitrary ellipsoid — the generalization of the WGS84-fixed
    ``_CHI_C`` tuple above."""
    return (
        e2 / 2.0 + 5.0 * e2**2 / 24.0 + e2**3 / 12.0 + 13.0 * e2**4 / 360.0,
        7.0 * e2**2 / 48.0 + 29.0 * e2**3 / 240.0 + 811.0 * e2**4 / 11520.0,
        7.0 * e2**3 / 120.0 + 81.0 * e2**4 / 1120.0,
        4279.0 * e2**4 / 161280.0,
    )


def _lcc_t(phi: np.ndarray, e: float) -> np.ndarray:
    """Snyder 15-9: t(phi) for the conic's isometric-latitude power law."""
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) * (
        (1.0 + e * s) / (1.0 - e * s)
    ) ** (e / 2.0)


def _lcc_consts(crs: str) -> tuple[float, float, float, float, float, float, float]:
    """(n, aF, rho0, lon0_deg, e0, n0, e2) for a registered LCC-2SP crs.

    n = ln(m1/m2) / ln(t1/t2), F = m1 / (n t1^n), rho(phi) = a F t^n —
    scale factor is exactly 1 on both standard parallels (the property the
    unit-scale tests pin)."""
    phi1d, phi2d, phi0d, lon0, e0, n0, a, e2 = _LCC_PARAMS[crs]
    e = float(np.sqrt(e2))
    phi1, phi2, phi0 = (np.radians(v) for v in (phi1d, phi2d, phi0d))

    def m(phi):
        return float(np.cos(phi) / np.sqrt(1.0 - e2 * np.sin(phi) ** 2))

    t1 = float(_lcc_t(np.array(phi1), e))
    t2 = float(_lcc_t(np.array(phi2), e))
    t0 = float(_lcc_t(np.array(phi0), e))
    if abs(phi1 - phi2) < 1e-12:  # 1SP: the analytic limit of the log ratio
        n = float(np.sin(phi1))
    else:
        n = float(np.log(m(phi1) / m(phi2)) / np.log(t1 / t2))
    big_f = m(phi1) / (n * t1**n)
    a_f = a * big_f
    rho0 = a_f * t0**n
    return n, a_f, rho0, lon0, e0, n0, e2


def lcc_forward(crs: str):
    """(lon_deg, lat_deg) arrays -> (easting, northing) for a registered
    LCC-2SP CRS (Snyder eqs. 14-15, 15-1..15-7)."""
    n, a_f, rho0, lon0, e0, n0, e2 = _lcc_consts(crs)
    e = float(np.sqrt(e2))

    def fwd(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        rho = a_f * _lcc_t(phi, e) ** n
        theta = n * lam
        return e0 + rho * np.sin(theta), n0 + rho0 - rho * np.cos(theta)

    return fwd


def lcc_inverse(crs: str):
    """(easting, northing) arrays -> (lon_deg, lat_deg) for a registered
    LCC-2SP CRS (Snyder eqs. 15-8..15-11 + conformal->geodetic series)."""
    n, a_f, rho0, lon0, e0, n0, e2 = _lcc_consts(crs)
    c1, c2, c3, c4 = _chi_to_phi_coefs(e2)
    sgn = 1.0 if n >= 0 else -1.0

    def inv(east: np.ndarray, north: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        xp = np.asarray(east, dtype=np.float64) - e0
        yp = rho0 - (np.asarray(north, dtype=np.float64) - n0)
        rho = sgn * np.hypot(xp, yp)
        theta = np.arctan2(sgn * xp, sgn * yp)
        with np.errstate(divide="ignore"):  # rho=0 only at the cone apex
            tp = (rho / a_f) ** (1.0 / n)
        chi = np.pi / 2.0 - 2.0 * np.arctan(tp)
        phi = (
            chi
            + c1 * np.sin(2.0 * chi)
            + c2 * np.sin(4.0 * chi)
            + c3 * np.sin(6.0 * chi)
            + c4 * np.sin(8.0 * chi)
        )
        return lon0 + np.degrees(theta / n), np.degrees(phi)

    return inv


# ---------------------------------------------------------------------------
# proj4-string CRS support — the reference accepts ANY proj4 CRS through
# geotrellis-proj4 (reproject/TileRDDReproject.scala:40-419).  This engine
# accepts "+proj=..." strings for every implemented family (longlat, merc,
# tmerc/utm, lcc, laea, stere polar aspect) on an ARBITRARY ellipsoid —
# the series coefficients above are WGS84/GRS80-fixed fast paths; the
# functions below recompute them from (a, f).  Datum SHIFTS are out of
# scope throughout this module, so a nonzero +towgs84 raises.
# ---------------------------------------------------------------------------

#: proj4 +ellps= registry entries the engine knows: name -> (a, 1/f)
_ELLPS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "clrk66": (6378206.4, 294.978698214),
    "intl": (6378388.0, 297.0),
    "krass": (6378245.0, 298.3),
    "bessel": (6377397.155, 299.1528128),
    "airy": (6377563.396, 299.3249646),
    "sphere": (6370997.0, 0.0),
}


def parse_proj4(s: str) -> dict:
    """'+k=v +flag ...' -> dict (numbers parsed, flags True). Raises on a
    nonzero +towgs84 (datum shifts are out of scope engine-wide)."""
    out: dict = {}
    for tok in s.split():
        if not tok.startswith("+"):
            raise ValueError(f"malformed proj4 token {tok!r} in {s!r}")
        body = tok[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            try:
                out[k] = float(v) if k not in ("proj", "ellps", "datum", "units", "towgs84", "zone") else v
            except ValueError:
                out[k] = v
        else:
            out[body] = True
    tw = out.get("towgs84")
    if tw is not None and any(float(x) != 0.0 for x in str(tw).split(",")):
        raise NotImplementedError(
            f"+towgs84 datum shift in {s!r} — datum transformations are out"
            " of scope (every registered CRS family here is shift-free)"
        )
    if "zone" in out:
        out["zone"] = int(float(out["zone"]))
    return out


def _proj4_ellipsoid(p: dict) -> tuple[float, float]:
    """(a, e2) from proj4 params: +a/+b, +a/+rf, +R, +ellps, or +datum."""
    if "R" in p:
        return float(p["R"]), 0.0
    if "a" in p:
        a = float(p["a"])
        if "b" in p:
            b = float(p["b"])
            f = (a - b) / a
        elif "rf" in p:
            f = 1.0 / float(p["rf"]) if float(p["rf"]) else 0.0
        else:
            f = 0.0
        return a, f * (2.0 - f)
    name = p.get("ellps") or {"WGS84": "WGS84", "NAD83": "GRS80"}.get(
        str(p.get("datum"))
    )
    if name not in _ELLPS:
        raise NotImplementedError(
            f"unknown ellipsoid for proj4 params {p!r} — pass +a/+b, +a/+rf,"
            f" +R, or +ellps in {sorted(_ELLPS)}"
        )
    a, rf = _ELLPS[name]
    f = 1.0 / rf if rf else 0.0
    return a, f * (2.0 - f)


def _tm_series(n: float) -> tuple[float, tuple, tuple]:
    """Krueger rectifying radius factor + alpha/beta series (order n^4) for
    an arbitrary third flattening ``n`` — the generalization of the
    WGS84-fixed _TM_A/_ALPHA/_BETA constants above (same polynomials)."""
    rect = 1.0 / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
    alpha = (
        n / 2.0 - 2.0 * n**2 / 3.0 + 5.0 * n**3 / 16.0 + 41.0 * n**4 / 180.0,
        13.0 * n**2 / 48.0 - 3.0 * n**3 / 5.0 + 557.0 * n**4 / 1440.0,
        61.0 * n**3 / 240.0 - 103.0 * n**4 / 140.0,
        49561.0 * n**4 / 161280.0,
    )
    beta = (
        n / 2.0 - 2.0 * n**2 / 3.0 + 37.0 * n**3 / 96.0 - n**4 / 360.0,
        n**2 / 48.0 + n**3 / 15.0 - 437.0 * n**4 / 1440.0,
        17.0 * n**3 / 480.0 - 37.0 * n**4 / 840.0,
        4397.0 * n**4 / 161280.0,
    )
    return rect, alpha, beta


def _tmerc_fns(a: float, e2: float, lat0: float, lon0: float, k0: float,
               x0: float, y0: float) -> tuple[PointFn, PointFn]:
    """General transverse Mercator (Krueger, order n^4) on an arbitrary
    ellipsoid with arbitrary natural origin — the generalization of the
    UTM fast path. A nonzero lat_0 subtracts the meridian-arc northing of
    the origin (computed through the same forward, so it cancels exactly)."""
    e1 = float(np.sqrt(e2))
    f = 1.0 - float(np.sqrt(1.0 - e2))  # f from e2
    n = f / (2.0 - f)
    rect, alpha, beta = _tm_series(n)
    big_a = a * rect
    c1, c2, c3, c4 = _chi_to_phi_coefs(e2)

    def raw_fwd(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        s = np.sin(phi)
        with np.errstate(divide="ignore"):
            t = (
                np.sinh(np.arctanh(s) - e1 * np.arctanh(e1 * s))
                if e1 > 0.0
                else np.tan(phi)
            )
        xi = np.arctan2(t, np.cos(lam))
        eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        X, Y = xi.copy(), eta.copy()
        for j, aj in enumerate(alpha, start=1):
            X += aj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            Y += aj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        return k0 * big_a * Y, k0 * big_a * X

    m0 = 0.0
    if lat0 != 0.0:
        m0 = float(raw_fwd(np.array([lon0]), np.array([lat0]))[1][0])

    def fwd(lon, lat):
        x, y = raw_fwd(lon, lat)
        return x0 + x, y0 + y - m0

    def inv(e, nn):
        xi = (np.asarray(nn, dtype=np.float64) - y0 + m0) / (k0 * big_a)
        eta = (np.asarray(e, dtype=np.float64) - x0) / (k0 * big_a)
        X, Y = xi.copy(), eta.copy()
        for j, bj in enumerate(beta, start=1):
            X -= bj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            Y -= bj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        sh, cx = np.sinh(Y), np.cos(X)
        lam = np.arctan2(sh, cx)
        chi = np.arcsin(np.sin(X) / np.cosh(Y))
        phi = chi.copy()
        for j, cj in enumerate((c1, c2, c3, c4), start=1):
            phi += cj * np.sin(2 * j * chi)
        return lon0 + np.degrees(lam), np.degrees(phi)

    return fwd, inv


def _merc_fns(a: float, e2: float, lon0: float, k0: float,
              x0: float, y0: float) -> tuple[PointFn, PointFn]:
    """Ellipsoidal Mercator (Snyder 7-7/7-8); e=0 reduces exactly to the
    spherical web-Mercator formulas (the EPSG:3857 fast path above)."""
    e1 = float(np.sqrt(e2))
    c1, c2, c3, c4 = _chi_to_phi_coefs(e2)

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(
            np.clip(np.asarray(lat, dtype=np.float64), -89.9999, 89.9999)
        )
        t = _lcc_t(phi, e1)
        return x0 + a * k0 * lam, y0 - a * k0 * np.log(t)

    def inv(e, nn):
        lam = (np.asarray(e, dtype=np.float64) - x0) / (a * k0)
        t = np.exp(-(np.asarray(nn, dtype=np.float64) - y0) / (a * k0))
        chi = np.pi / 2.0 - 2.0 * np.arctan(t)
        phi = chi.copy()
        for j, cj in enumerate((c1, c2, c3, c4), start=1):
            phi += cj * np.sin(2 * j * chi)
        return lon0 + np.degrees(lam), np.degrees(phi)

    return fwd, inv


def _lcc_fns_from(a: float, e2: float, lat1: float, lat2: float, lat0: float,
                  lon0: float, x0: float, y0: float) -> tuple[PointFn, PointFn]:
    """LCC on arbitrary params via the registered-CRS machinery: 1SP
    (lat_1 == lat_2) degenerates to n = sin(lat_1), the analytic limit of
    the 2SP log ratio."""
    key = f"PROJ4:lcc:{a}:{e2}:{lat1}:{lat2}:{lat0}:{lon0}:{x0}:{y0}"
    _LCC_PARAMS[key] = (lat1, lat2, lat0, lon0, x0, y0, a, e2)
    return lcc_forward(key), lcc_inverse(key)


def _polar_stere_fns(a: float, e2: float, lat0: float, lat_ts: float,
                     lon0: float, k0: float, x0: float, y0: float
                     ) -> tuple[PointFn, PointFn]:
    """Polar stereographic, either variant (A: +k_0, B: +lat_ts) on an
    arbitrary ellipsoid — the generalization of the EPSG-registered
    variant-B fast path above (same Snyder equations)."""
    if abs(lat0) != 90.0:
        raise NotImplementedError(
            "+proj=stere is implemented for the polar aspect only"
            " (+lat_0=90 or +lat_0=-90)"
        )
    south = lat0 < 0
    e1 = float(np.sqrt(e2))
    c1, c2, c3, c4 = _chi_to_phi_coefs(e2)
    if lat_ts is not None and abs(lat_ts) != 90.0:
        phi_f = np.radians(abs(lat_ts))
        m_f = float(np.cos(phi_f) / np.sqrt(1.0 - e2 * np.sin(phi_f) ** 2))
        rf = a * m_f / float(_lcc_t(np.array(phi_f), e1))
    else:
        # variant A (scale k0 at the pole): rho = 2 a k0 t / sqrt((1+e)^(1+e)(1-e)^(1-e))
        rf = 2.0 * a * k0 / float(
            np.sqrt((1.0 + e1) ** (1.0 + e1) * (1.0 - e1) ** (1.0 - e1))
        )

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        rho = rf * _lcc_t(-phi if south else phi, e1)
        x = x0 + rho * np.sin(lam)
        y = y0 + (rho * np.cos(lam) if south else -rho * np.cos(lam))
        return x, y

    def inv(e, nn):
        xp = np.asarray(e, dtype=np.float64) - x0
        yp = np.asarray(nn, dtype=np.float64) - y0
        rho = np.hypot(xp, yp)
        t = rho / rf
        chi = np.pi / 2.0 - 2.0 * np.arctan(t)
        phi = chi.copy()
        for j, cj in enumerate((c1, c2, c3, c4), start=1):
            phi += cj * np.sin(2 * j * chi)
        lam = np.arctan2(xp, yp) if south else np.arctan2(xp, -yp)
        if south:
            phi = -phi
        return lon0 + np.degrees(lam), np.degrees(phi)

    return fwd, inv


def _laea_fns_from(a: float, e2: float, lat0: float, lon0: float,
                   x0: float, y0: float) -> tuple[PointFn, PointFn]:
    """Ellipsoidal oblique LAEA on arbitrary params (Snyder 24-26..24-34 +
    3-18) — the generalization of the GRS80-fixed EPSG:3035 fast path
    (identical equations, coefficients recomputed from e2)."""
    e1 = float(np.sqrt(e2))

    def q_of(sin_phi):
        if e1 == 0.0:
            return 2.0 * np.asarray(sin_phi, dtype=np.float64)
        es = e1 * sin_phi
        return (1.0 - e2) * (
            sin_phi / (1.0 - e2 * sin_phi * sin_phi)
            - np.log((1.0 - es) / (1.0 + es)) / (2.0 * e1)
        )

    qp = float(q_of(np.array(1.0)))
    rq = a * float(np.sqrt(qp / 2.0))
    phi1 = np.radians(lat0)
    beta1 = float(np.arcsin(q_of(np.sin(phi1)) / qp))
    m1 = float(np.cos(phi1) / np.sqrt(1.0 - e2 * np.sin(phi1) ** 2))
    d = a * m1 / (rq * float(np.cos(beta1))) if abs(np.cos(beta1)) > 1e-12 else 1.0
    sb1, cb1 = float(np.sin(beta1)), float(np.cos(beta1))
    # authalic beta -> phi series (Snyder 3-18) for this e2
    p1 = e2 / 3.0 + 31.0 * e2**2 / 180.0 + 517.0 * e2**3 / 5040.0
    p2 = 23.0 * e2**2 / 360.0 + 251.0 * e2**3 / 3780.0
    p3 = 761.0 * e2**3 / 45360.0

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        beta = np.arcsin(np.clip(q_of(np.sin(phi)) / qp, -1.0, 1.0))
        sb, cb = np.sin(beta), np.cos(beta)
        b = rq * np.sqrt(2.0 / (1.0 + sb1 * sb + cb1 * cb * np.cos(lam)))
        return (
            x0 + b * d * cb * np.sin(lam),
            y0 + (b / d) * (cb1 * sb - sb1 * cb * np.cos(lam)),
        )

    def inv(e, nn):
        xp = np.asarray(e, dtype=np.float64) - x0
        yp = np.asarray(nn, dtype=np.float64) - y0
        rho = np.sqrt((xp / d) ** 2 + (d * yp) ** 2)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
        sce, cce = np.sin(ce), np.cos(ce)
        with np.errstate(invalid="ignore"):
            q = qp * (cce * sb1 + d * yp * sce * cb1 / rho)
        q = np.where(rho == 0.0, qp * sb1, q)
        lam = np.arctan2(xp * sce, d * rho * cb1 * cce - d * d * yp * sb1 * sce)
        beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
        phi = (
            beta
            + p1 * np.sin(2.0 * beta)
            + p2 * np.sin(4.0 * beta)
            + p3 * np.sin(6.0 * beta)
        )
        return lon0 + np.degrees(lam), np.degrees(phi)

    return fwd, inv


def proj4_fns(s: str) -> tuple[PointFn, PointFn]:
    """'+proj=...' -> (forward from EPSG:4326 lon/lat degrees, inverse back).
    Families: longlat, merc, tmerc, utm, lcc (1SP/2SP), laea, stere (polar
    aspect) — on any ellipsoid expressible as +a/+b, +a/+rf, +R, +ellps or
    +datum {WGS84, NAD83}. Anything else raises NotImplementedError."""
    p = parse_proj4(s)
    fam = p.get("proj")
    a, e2 = _proj4_ellipsoid(p)
    lat0 = float(p.get("lat_0", 0.0))
    lon0 = float(p.get("lon_0", 0.0))
    x0 = float(p.get("x_0", 0.0))
    y0 = float(p.get("y_0", 0.0))
    k0 = float(p.get("k", p.get("k_0", 1.0)))
    if fam == "longlat":
        return _point_from_axes(_identity, _identity)
    if fam == "merc":
        if "lat_ts" in p:
            ts = np.radians(float(p["lat_ts"]))
            k0 = float(np.cos(ts) / np.sqrt(1.0 - e2 * np.sin(ts) ** 2))
        return _merc_fns(a, e2, lon0, k0, x0, y0)
    if fam == "utm":
        zone = int(p["zone"])
        lon0 = float(zone * 6 - 183)
        return _tmerc_fns(
            a, e2, 0.0, lon0, 0.9996, 500000.0,
            10000000.0 if p.get("south") else 0.0,
        )
    if fam == "tmerc":
        return _tmerc_fns(a, e2, lat0, lon0, k0, x0, y0)
    if fam == "lcc":
        lat1 = float(p.get("lat_1", lat0))
        lat2 = float(p.get("lat_2", lat1))
        return _lcc_fns_from(a, e2, lat1, lat2, lat0, lon0, x0, y0)
    if fam == "laea":
        return _laea_fns_from(a, e2, lat0, lon0, x0, y0)
    if fam == "stere":
        lat_ts = float(p["lat_ts"]) if "lat_ts" in p else None
        return _polar_stere_fns(a, e2, lat0, lat_ts, lon0, k0, x0, y0)
    raise NotImplementedError(
        f"proj4 family {fam!r} not implemented (longlat, merc, tmerc, utm,"
        f" lcc, laea, polar stere are): {s!r}"
    )


def _is_proj4(crs: str) -> bool:
    return crs.lstrip().startswith("+")


PointFn = Callable[[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]]


def _point_from_axes(fx: AxisFn, fy: AxisFn) -> PointFn:
    def pt(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return fx(x), fy(y)

    return pt


def _compose(f: PointFn, g: PointFn) -> PointFn:
    def pt(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return g(*f(x, y))

    return pt


def is_separable(src_crs: str, dst_crs: str) -> bool:
    """True when the pair transforms each axis independently (identity,
    4326<->3857); UTM pairs are not."""
    return src_crs == dst_crs or (src_crs, dst_crs) in _AXIS_TRANSFORMS


def point_transform(src_crs: str, dst_crs: str) -> PointFn:
    """General (x, y) point transform between any two supported CRSs
    (identity / 4326<->3857 / 4326<->UTM / 3857<->UTM via composition).
    Arrays broadcast: works on 1-D axes and full 2-D meshgrids alike."""
    if is_separable(src_crs, dst_crs):
        return _point_from_axes(*transform_fns(src_crs, dst_crs))
    src_utm, dst_utm = parse_utm(src_crs), parse_utm(dst_crs)
    if src_utm and dst_crs == "EPSG:4326":
        return utm_inverse(*src_utm)
    if src_crs == "EPSG:4326" and dst_utm:
        return utm_forward(*dst_utm)
    if src_crs in _LAEA_PARAMS and dst_crs == "EPSG:4326":
        return laea_inverse(src_crs)
    if src_crs == "EPSG:4326" and dst_crs in _LAEA_PARAMS:
        return laea_forward(dst_crs)
    if src_crs in _POLAR_STEREO_PARAMS and dst_crs == "EPSG:4326":
        return polar_stereo_inverse(src_crs)
    if src_crs == "EPSG:4326" and dst_crs in _POLAR_STEREO_PARAMS:
        return polar_stereo_forward(dst_crs)
    if src_crs in _LCC_PARAMS and dst_crs == "EPSG:4326":
        return lcc_inverse(src_crs)
    if src_crs == "EPSG:4326" and dst_crs in _LCC_PARAMS:
        return lcc_forward(dst_crs)
    if _is_proj4(src_crs) and dst_crs == "EPSG:4326":
        return proj4_fns(src_crs)[1]
    if src_crs == "EPSG:4326" and _is_proj4(dst_crs):
        return proj4_fns(dst_crs)[0]
    # projected <-> projected (UTM/LAEA/polar-stereo/3857 in any
    # combination): hop through the 4326 geodetic hub — but only when BOTH
    # legs resolve, so unsupported codes still raise instead of recursing.
    def _hub_ok(crs, utm):
        return bool(
            utm
            or crs in _LAEA_PARAMS
            or crs in _POLAR_STEREO_PARAMS
            or crs in _LCC_PARAMS
            or crs == "EPSG:3857"
            or _is_proj4(crs)
        )

    if _hub_ok(src_crs, src_utm) and _hub_ok(dst_crs, dst_utm):
        return _compose(
            point_transform(src_crs, "EPSG:4326"),
            point_transform("EPSG:4326", dst_crs),
        )
    raise NotImplementedError(f"CRS transform {src_crs} -> {dst_crs} not supported")


def transform_extent(e: Extent, src_crs: str, dst_crs: str, densify: int = 21) -> Extent:
    """Image of ``e`` in the destination CRS. Separable monotone pairs are
    bounded exactly by their corners; non-separable pairs (UTM) sample
    ``densify`` points along each edge (the GDAL suggested-warp-output
    approach) — curvature of a TM meridian/parallel image across a tile is
    tiny, so 21 samples bound the true image to well under a pixel."""
    if is_separable(src_crs, dst_crs):
        fx, fy = transform_fns(src_crs, dst_crs)
        xs = fx(np.array([e.xmin, e.xmax]))
        ys = fy(np.array([e.ymin, e.ymax]))
        return Extent(float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))
    pt = point_transform(src_crs, dst_crs)
    tx = np.linspace(e.xmin, e.xmax, densify)
    ty = np.linspace(e.ymin, e.ymax, densify)
    bx = np.concatenate([tx, tx, np.full(densify, e.xmin), np.full(densify, e.xmax)])
    by = np.concatenate([np.full(densify, e.ymin), np.full(densify, e.ymax), ty, ty])
    ox, oy = pt(bx, by)
    return Extent(float(ox.min()), float(oy.min()), float(ox.max()), float(oy.max()))


def snap_extent(e: Extent, cell: float) -> Extent:
    """Snap an extent outward to multiples of ``cell`` — the reference's
    UTM 10 m grid snapping (DatacubeSupport.scala:58-80: aligned layouts so
    identical requests always land on identical pixel grids)."""
    return Extent(
        float(np.floor(e.xmin / cell) * cell),
        float(np.floor(e.ymin / cell) * cell),
        float(np.ceil(e.xmax / cell) * cell),
        float(np.ceil(e.ymax / cell) * cell),
    )


def utm_layout_for(
    src: LayoutDefinition,
    resolution: float = 10.0,
    dst_crs: str | None = None,
) -> LayoutDefinition:
    """Target-layout negotiation onto the best UTM zone (DatacubeSupport
    semantics): project the source extent, snap it outward to the
    ``resolution`` grid, grow to a whole number of tiles (keeping the source
    tile pixel size), so cell size is EXACTLY ``resolution`` meters and keys
    stay in [0, layout) — the grid-alignment invariant
    (OpenEOProcessesSpec.scala:581-600)."""
    import math

    if dst_crs is None:
        cx = (src.extent.xmin + src.extent.xmax) / 2.0
        cy = (src.extent.ymin + src.extent.ymax) / 2.0
        if src.crs != "EPSG:4326":
            lon, lat = point_transform(src.crs, "EPSG:4326")(
                np.array([cx]), np.array([cy])
            )
            cx, cy = float(lon[0]), float(lat[0])
        dst_crs = utm_zone_for(cx, cy)
    ext = snap_extent(transform_extent(src.extent, src.crs, dst_crs), resolution)
    layout_cols = max(1, math.ceil(ext.width / (resolution * src.tile_cols)))
    layout_rows = max(1, math.ceil(ext.height / (resolution * src.tile_rows)))
    return LayoutDefinition(
        Extent(
            ext.xmin,
            ext.ymax - layout_rows * resolution * src.tile_rows,
            ext.xmin + layout_cols * resolution * src.tile_cols,
            ext.ymax,
        ),
        layout_cols,
        layout_rows,
        src.tile_cols,
        src.tile_rows,
        dst_crs,
    )


def reproject_layout(src: LayoutDefinition, dst_crs: str) -> LayoutDefinition:
    """Target-layout negotiation (TileRDDReproject.scala:89-150 semantics,
    simplified): the reprojected source extent with the SAME tile grid
    (layout cols/rows, tile pixels), so total pixel count is preserved and
    every key stays in [0, layout) — the reference's grid-alignment invariant
    (OpenEOProcessesSpec.scala:581-600)."""
    return LayoutDefinition(
        transform_extent(src.extent, src.crs, dst_crs),
        src.layout_cols,
        src.layout_rows,
        src.tile_cols,
        src.tile_rows,
        dst_crs,
    )
