"""proj4-string CRS support (core/proj.py proj4_fns) — the reference
accepts any proj4 CRS via geotrellis-proj4 (TileRDDReproject.scala:40-419);
this engine accepts "+proj=..." for every implemented family on an
arbitrary ellipsoid. Equivalence anchors: every proj4 form must reproduce
the matching EPSG-registered fast path bit-for-bit (or to sub-nm), and
arbitrary-parameter forms must round-trip and honor their scale factors.
"""

import numpy as np
import pytest

from openeo_geotrellis_extensions_spark.core import proj as P
from openeo_geotrellis_extensions_spark.core.grid import Extent

LON = np.linspace(-4.0, 9.0, 25)
LAT = np.linspace(42.0, 50.0, 25)


def _close(a, b, tol):
    return max(np.abs(a[0] - b[0]).max(), np.abs(a[1] - b[1]).max()) < tol


def test_proj4_matches_registered_epsg_paths():
    """The proj4 spelling of each registered CRS equals its EPSG fast path:
    Lambert-93, UTM 31N, spherical Mercator, ETRS89-LAEA, Antarctic polar
    stereographic."""
    f, _ = P.proj4_fns(
        "+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 +lon_0=3 +x_0=700000"
        " +y_0=6600000 +ellps=GRS80 +units=m +no_defs"
    )
    assert _close(f(LON, LAT), P.lcc_forward("EPSG:2154")(LON, LAT), 1e-9)

    f, _ = P.proj4_fns("+proj=utm +zone=31 +datum=WGS84")
    assert _close(f(LON, LAT), P.utm_forward(31, False)(LON, LAT), 1e-8)

    f, _ = P.proj4_fns("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0")
    assert _close(f(LON, LAT), (P._merc_x(LON), P._merc_y(LAT)), 1e-6)

    f, _ = P.proj4_fns(
        "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80"
    )
    assert _close(f(LON, LAT), P.laea_forward("EPSG:3035")(LON, LAT), 1e-9)

    f, _ = P.proj4_fns(
        "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +datum=WGS84"
    )
    slat = np.linspace(-85.0, -60.0, 25)
    assert _close(
        f(LON, slat), P.polar_stereo_forward("EPSG:3031")(LON, slat), 1e-9
    )


def test_proj4_tmerc_arbitrary_origin_and_ellipsoid():
    """General tmerc: OSGB36-style parameters (Airy ellipsoid, nonzero
    lat_0/negative y_0 — datum shift deliberately omitted): the natural
    origin maps exactly to (x_0, y_0), the scale on the central meridian is
    exactly k_0, and the round-trip closes. Explicit +proj=tmerc with UTM
    parameters equals the +proj=utm shorthand."""
    s = (
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000"
        " +y_0=-100000 +ellps=airy"
    )
    fwd, inv = P.proj4_fns(s)
    x, y = fwd(np.array([-2.0]), np.array([49.0]))
    assert abs(x[0] - 400000.0) < 1e-6 and abs(y[0] + 100000.0) < 1e-6
    # central-meridian scale == k_0 against the Airy meridian metric
    h = 1e-6
    a = 6377563.396
    f_airy = 1.0 / 299.3249646
    e2 = f_airy * (2.0 - f_airy)
    x1, y1 = fwd(np.array([-2.0]), np.array([52.0]))
    x2, y2 = fwd(np.array([-2.0]), np.array([52.0 + h]))
    phi = np.radians(52.0)
    m_mer = a * (1.0 - e2) / (1.0 - e2 * np.sin(phi) ** 2) ** 1.5
    k = float(np.hypot(x2 - x1, y2 - y1)) / (m_mer * np.radians(h))
    assert abs(k - 0.9996012717) < 1e-7
    lo, la = inv(*fwd(LON, LAT))
    assert np.abs(lo - LON).max() < 1e-11 and np.abs(la - LAT).max() < 1e-9

    f_utm, _ = P.proj4_fns("+proj=utm +zone=31 +ellps=WGS84")
    f_tm, _ = P.proj4_fns(
        "+proj=tmerc +lat_0=0 +lon_0=3 +k=0.9996 +x_0=500000 +y_0=0 +ellps=WGS84"
    )
    assert _close(f_utm(LON, LAT), f_tm(LON, LAT), 1e-9)


def test_proj4_lcc_1sp_limit():
    """lat_1 == lat_2 degenerates to the 1SP cone: n == sin(lat_1) (the
    analytic limit), scale 1 on the single standard parallel, round-trip."""
    s = (
        "+proj=lcc +lat_1=46.8 +lat_2=46.8 +lat_0=46.8"
        " +lon_0=2.337229167 +x_0=600000 +y_0=200000 +ellps=clrk66"
    )
    fwd, inv = P.proj4_fns(s)
    key = [k for k in P._LCC_PARAMS if k.startswith("PROJ4:lcc") and ":46.8:" in k]
    n = P._lcc_consts(key[0])[0]
    assert abs(n - np.sin(np.radians(46.8))) < 1e-12
    h = 1e-6
    x1, y1 = fwd(np.array([2.337229167]), np.array([46.8]))
    x2, y2 = fwd(np.array([2.337229167 + h]), np.array([46.8]))
    a, e2 = 6378206.4, (1 / 294.978698214) * (2 - 1 / 294.978698214)
    phi = np.radians(46.8)
    nu = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    k = float(np.hypot(x2 - x1, y2 - y1)) / (nu * np.cos(phi) * np.radians(h))
    assert abs(k - 1.0) < 1e-8
    lo, la = inv(*fwd(LON, LAT))
    assert np.abs(lo - LON).max() < 1e-11 and np.abs(la - LAT).max() < 1e-9


def test_proj4_stere_variant_a_pole_scale():
    """+proj=stere with +k (variant A, no lat_ts): the scale at the pole is
    exactly k_0 (checked via the conformal radius limit against variant B
    with the equivalent true-scale latitude behavior: a tiny circle around
    the pole maps with radius ratio k_0)."""
    fwd, inv = P.proj4_fns("+proj=stere +lat_0=90 +k=0.994 +lon_0=0 +ellps=WGS84")
    # near-pole point: rho / (true arc from pole) -> k0
    lat = 89.999
    x, y = fwd(np.array([0.0]), np.array([lat]))
    rho = float(np.hypot(x, y))
    a, e2 = 6378137.0, P._E2
    # meridian arc from pole ~ m_mer * dphi at the pole
    m_pole = a * (1.0 - e2) / (1.0 - e2) ** 1.5  # = a/sqrt(1-e2)
    arc = m_pole * np.radians(90.0 - lat)
    assert abs(rho / arc - 0.994) < 1e-4
    lo, la = inv(*fwd(LON, np.linspace(70, 88, 25)))
    assert np.abs(la - np.linspace(70, 88, 25)).max() < 1e-9


def test_proj4_error_paths_and_point_transform():
    """Nonzero +towgs84 raises (datum shifts out of scope); unknown family
    raises; proj4 strings compose through point_transform's 4326 hub."""
    with pytest.raises(NotImplementedError, match="towgs84"):
        P.proj4_fns("+proj=tmerc +lon_0=0 +ellps=bessel +towgs84=674.4,15.1,405.3")
    with pytest.raises(NotImplementedError, match="not implemented"):
        P.proj4_fns("+proj=omerc +lat_0=46 +ellps=bessel")
    with pytest.raises(NotImplementedError, match="polar aspect"):
        P.proj4_fns("+proj=stere +lat_0=52 +ellps=WGS84")
    # zero-valued towgs84 (a no-op shift) is accepted
    P.proj4_fns("+proj=utm +zone=31 +ellps=WGS84 +towgs84=0,0,0")

    pt = P.point_transform("+proj=utm +zone=31 +datum=WGS84", "EPSG:2154")
    x, y = pt(np.array([500000.0]), np.array([5200000.0]))
    lon, lat = P.utm_inverse(31, False)(np.array([500000.0]), np.array([5200000.0]))
    wx, wy = P.lcc_forward("EPSG:2154")(lon, lat)
    assert abs(x[0] - wx[0]) < 1e-9 and abs(y[0] - wy[0]) < 1e-9
    # transform_extent accepts proj4 targets (densified edges)
    e = P.transform_extent(
        Extent(0.0, 44.0, 2.0, 46.0),
        "EPSG:4326",
        "+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 +lon_0=3 +x_0=700000"
        " +y_0=6600000 +ellps=GRS80",
    )
    w = P.transform_extent(
        Extent(0.0, 44.0, 2.0, 46.0), "EPSG:4326", "EPSG:2154"
    )
    assert abs(e.xmin - w.xmin) < 1e-6 and abs(e.ymax - w.ymax) < 1e-6
