"""WGS84 polar stereographic variant B (EPSG:3031 / 3413 / 3032) —
core/proj.py.

Anchor: the IOGP Guidance Note 7-2 worked example for Polar Stereographic
variant B (EPSG:3032). Property checks: pole -> false origin, unit scale on
the true-scale parallel, conformality (isotropic local scale), round-trip.
"""

import numpy as np

from openeo_geotrellis_extensions_spark.core.proj import (
    _E2,
    _WGS84_A,
    point_transform,
    polar_stereo_forward,
    polar_stereo_inverse,
)


def test_polar_stereo_gn72_anchor():
    """IOGP GN7-2 variant-B worked example (EPSG:3032): lat 75S lon 120E ->
    E 7255380.79, N 7053389.56 — reproduces to the centimeter."""
    fwd = polar_stereo_forward("EPSG:3032")
    x, y = fwd(np.array([120.0]), np.array([-75.0]))
    assert abs(x[0] - 7255380.79) < 0.01
    assert abs(y[0] - 7053389.56) < 0.01


def test_polar_stereo_pole_and_roundtrip():
    for crs, pole_lat in [("EPSG:3031", -90.0), ("EPSG:3413", 90.0)]:
        fwd = polar_stereo_forward(crs)
        inv = polar_stereo_inverse(crs)
        x, y = fwd(np.array([123.0]), np.array([pole_lat]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6  # pole -> false origin
        sign = -1.0 if pole_lat < 0 else 1.0
        lon, lat = np.meshgrid(
            np.linspace(-180.0, 179.0, 21), sign * np.linspace(55.0, 89.9, 21)
        )
        e, n = fwd(lon, lat)
        lo2, la2 = inv(e, n)
        dl = (lo2 - lon + 180.0) % 360.0 - 180.0
        assert np.abs(dl).max() < 1e-10
        assert np.abs(la2 - lat).max() < 1e-9


def test_polar_stereo_true_scale_parallel():
    """Variant B definition: linear scale is exactly 1 on lat_ts (checked
    numerically along the meridian against the ellipsoid meridian radius)."""
    h = 1e-7
    for crs, ts in [("EPSG:3031", -71.0), ("EPSG:3413", 70.0)]:
        fwd = polar_stereo_forward(crs)
        x1, y1 = fwd(np.array([30.0]), np.array([ts - h]))
        x2, y2 = fwd(np.array([30.0]), np.array([ts + h]))
        dist = float(np.hypot(x2 - x1, y2 - y1)[0])
        phi = np.radians(ts)
        m_rad = _WGS84_A * (1 - _E2) / (1 - _E2 * np.sin(phi) ** 2) ** 1.5
        ground = m_rad * np.radians(2 * h)
        assert abs(dist / ground - 1.0) < 1e-6


def test_polar_stereo_conformal():
    """Stereographic is conformal: the local Jacobian is a scaled rotation
    (orthogonal columns, equal norms) everywhere in the domain."""
    fwd = polar_stereo_forward("EPSG:3031")
    h = 1e-6
    for lon0, lat0 in [(0.0, -75.0), (120.0, -66.0), (-90.0, -80.0)]:
        x0, y0 = fwd(np.array([lon0]), np.array([lat0]))
        xl, yl = fwd(np.array([lon0 + h]), np.array([lat0]))
        xp, yp = fwd(np.array([lon0]), np.array([lat0 + h]))
        u = np.array([xl[0] - x0[0], yl[0] - y0[0]])
        v = np.array([xp[0] - x0[0], yp[0] - y0[0]])
        # equal scale along parallel vs meridian after metric normalization
        phi = np.radians(lat0)
        nrad = _WGS84_A / np.sqrt(1 - _E2 * np.sin(phi) ** 2)
        m_rad = _WGS84_A * (1 - _E2) / (1 - _E2 * np.sin(phi) ** 2) ** 1.5
        ku = np.linalg.norm(u) / (nrad * np.cos(phi) * np.radians(h))
        kv = np.linalg.norm(v) / (m_rad * np.radians(h))
        assert abs(ku / kv - 1.0) < 1e-4
        # orthogonality
        cosang = abs(u @ v) / (np.linalg.norm(u) * np.linalg.norm(v))
        assert cosang < 1e-4


def test_point_transform_polar_composition():
    """3031 <-> 3413 and 3031 <-> 3035 compose through the 4326 hub."""
    pt = point_transform("EPSG:3031", "EPSG:3413")
    back = point_transform("EPSG:3413", "EPSG:3031")
    fwd = polar_stereo_forward("EPSG:3031")
    e, n = fwd(np.array([10.0]), np.array([-70.0]))
    x, y = pt(e, n)
    e2, n2 = back(x, y)
    assert abs(e2[0] - e[0]) < 1e-3 and abs(n2[0] - n[0]) < 1e-3
    pt2 = point_transform("EPSG:3035", "EPSG:3031")  # LAEA -> polar stereo
    x, y = pt2(np.array([4321000.0]), np.array([3210000.0]))
    lo, la = polar_stereo_inverse("EPSG:3031")(x, y)
    assert abs(lo[0] - 10.0) < 1e-9
    assert abs(la[0] - 52.0) < 1e-6
