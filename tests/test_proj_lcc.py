"""Lambert conformal conic 2SP (EPSG:2154 Lambert-93, EPSG:3978 Canada
Atlas) — core/proj.py.

Reference parity target: the reference accepts any proj4 CRS through
geotrellis-proj4 (reproject/TileRDDReproject.scala:40-419); LCC is the last
broadly-used national-grid family the engine's registry lacked (VERDICT r4
ask #7). Formulas are Snyder USGS PP 1395 pp. 104-110 (eqs. 14-15,
15-1..15-11). Anchors: the grid-origin definition of each CRS (exact by
construction), the IOGP Guidance Note 7-2 worked example for Lambert Conic
Conformal (2SP) — NAD27 Texas South Central on Clarke 1866 — and the
projection's defining properties (unit scale on BOTH standard parallels,
conformality, straight central meridian, convergence = n*dlon).
"""

import numpy as np

from openeo_geotrellis_extensions_spark.core.grid import Extent, LayoutDefinition
from openeo_geotrellis_extensions_spark.core.proj import (
    _LCC_PARAMS,
    _lcc_consts,
    lcc_forward,
    lcc_inverse,
    point_transform,
    transform_extent,
    utm_layout_for,
)


def test_lcc_grid_origin_anchors():
    """(lon0, phi0) maps to the false easting/northing exactly (rho(phi0)
    == rho0 by construction — but only if t/n/F are internally coherent)."""
    for crs, (_, _, p0, lon0, e0, n0, _, _) in _LCC_PARAMS.items():
        x, y = lcc_forward(crs)(np.array([lon0]), np.array([p0]))
        assert abs(x[0] - e0) < 1e-6, crs
        assert abs(y[0] - n0) < 1e-6, crs


def test_lcc_gn7_2_worked_example():
    """IOGP GN7-2 'Lambert Conic Conformal (2SP)' worked example — NAD27
    Texas South Central (Clarke 1866): phiF 27°50'N, lamF 99°W, phi1
    28°23'N, phi2 30°17'N, EF 2,000,000 US ft; the test point 28°30'N
    96°00'W must give E 2,963,503.91 / N 254,759.80 US survey ft, to the
    centimeter."""
    ft_us = 1200.0 / 3937.0  # US survey foot in meters
    _LCC_PARAMS["TEST:TX27"] = (
        28.0 + 23.0 / 60.0,
        30.0 + 17.0 / 60.0,
        27.0 + 50.0 / 60.0,
        -99.0,
        2000000.0 * ft_us,
        0.0,
        6378206.4,  # Clarke 1866
        0.006768657997291094,
    )
    try:
        x, y = lcc_forward("TEST:TX27")(np.array([-96.0]), np.array([28.5]))
        assert abs(x[0] / ft_us - 2963503.91) < 0.02
        assert abs(y[0] / ft_us - 254759.80) < 0.02
        lon, lat = lcc_inverse("TEST:TX27")(
            np.array([2963503.91 * ft_us]), np.array([254759.80 * ft_us])
        )
        assert abs(lon[0] + 96.0) < 1e-7
        assert abs(lat[0] - 28.5) < 1e-7
    finally:
        del _LCC_PARAMS["TEST:TX27"]


def test_lcc_roundtrip():
    """fwd∘inv identity over each grid's full domain: lon to float ulp, lat
    to the conformal-series truncation (~1e-9 deg)."""
    domains = {
        "EPSG:2154": (np.linspace(-5, 10, 31), np.linspace(41, 51, 31)),
        "EPSG:3978": (np.linspace(-140, -50, 31), np.linspace(40, 84, 31)),
    }
    for crs, (lons, lats) in domains.items():
        lon, lat = np.meshgrid(lons, lats)
        e, n = lcc_forward(crs)(lon, lat)
        lon2, lat2 = lcc_inverse(crs)(e, n)
        assert np.abs(lon2 - lon).max() < 1e-11, crs
        assert np.abs(lat2 - lat).max() < 5e-9, crs


def test_lcc_unit_scale_on_standard_parallels():
    """The 2SP definition: point scale factor k == 1 exactly on BOTH
    standard parallels (finite-difference k against the ellipsoidal
    parallel-arc metric nu*cos(phi)*dlam)."""
    for crs, (p1, p2, _, lon0, _, _, a, e2) in _LCC_PARAMS.items():
        fwd = lcc_forward(crs)
        for sp in (p1, p2):
            dlon = 1e-6
            x1, y1 = fwd(np.array([lon0]), np.array([sp]))
            x2, y2 = fwd(np.array([lon0 + dlon]), np.array([sp]))
            phi = np.radians(sp)
            nu = a / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)
            k = float(np.hypot(x2 - x1, y2 - y1)) / (
                nu * np.cos(phi) * np.radians(dlon)
            )
            assert abs(k - 1.0) < 1e-8, (crs, sp)


def test_lcc_is_conformal():
    """Defining property: the Jacobian is a scaled rotation everywhere —
    meridian scale == parallel scale (isotropy) and the two image
    directions stay orthogonal."""
    for crs, (_, _, p0, lon0, _, _, a, e2) in _LCC_PARAMS.items():
        fwd = lcc_forward(crs)
        h = 1e-7
        for dlo, dla in [(-6.0, -3.0), (0.0, 0.0), (5.0, 4.0), (2.0, -4.5)]:
            lo, la = lon0 + dlo, p0 + dla
            x0, y0 = fwd(np.array([lo]), np.array([la]))
            xl, yl = fwd(np.array([lo + h]), np.array([la]))
            xp, yp = fwd(np.array([lo]), np.array([la + h]))
            phi = np.radians(la)
            w = 1.0 - e2 * np.sin(phi) ** 2
            m_par = a * np.cos(phi) / np.sqrt(w)  # parallel metric
            m_mer = a * (1.0 - e2) / w**1.5  # meridian metric
            k_par = float(np.hypot(xl - x0, yl - y0)) / (m_par * np.radians(h))
            k_mer = float(np.hypot(xp - x0, yp - y0)) / (m_mer * np.radians(h))
            assert abs(k_par / k_mer - 1.0) < 1e-6, crs
            dot = float((xl - x0) * (xp - x0) + (yl - y0) * (yp - y0))
            norm = float(
                np.hypot(xl - x0, yl - y0) * np.hypot(xp - x0, yp - y0)
            )
            assert abs(dot / norm) < 1e-6, crs  # orthogonal images


def test_lcc_central_meridian_and_convergence():
    """lon0's image is the vertical line E == FE; away from it the meridian
    convergence equals n * dlon (the conic constant, Snyder 14-2)."""
    for crs, (_, _, p0, lon0, e0, _, _, _) in _LCC_PARAMS.items():
        fwd = lcc_forward(crs)
        lats = np.linspace(p0 - 5.0, p0 + 5.0, 11)
        e, _n = fwd(np.full_like(lats, lon0), lats)
        assert np.abs(e - e0).max() < 1e-6, crs
        n_const = _lcc_consts(crs)[0]
        h = 1e-7
        for dlo in (-4.0, 3.0):
            x0, y0 = fwd(np.array([lon0 + dlo]), np.array([p0]))
            x1, y1 = fwd(np.array([lon0 + dlo]), np.array([p0 + h]))
            # angle of the meridian image from grid north; meridians lean
            # TOWARD the cone apex, so the tilt is -n*dlon in this frame
            gamma = float(np.arctan2(x1 - x0, y1 - y0))
            assert abs(np.degrees(gamma) + n_const * dlo) < 1e-5, crs


def test_point_transform_lcc_composition():
    """2154 <-> 3857 and 2154 <-> UTM compose through the 4326 hub; zone 31's
    central meridian (3E) is ALSO Lambert-93's lon0, so a lon0 point must
    land on E=500000 in EPSG:32631."""
    pt = point_transform("EPSG:2154", "EPSG:3857")
    back = point_transform("EPSG:3857", "EPSG:2154")
    e = np.array([700000.0, 657723.0])
    n = np.array([6600000.0, 6860444.0])
    x, y = pt(e, n)
    e2, n2 = back(x, y)
    assert np.abs(e2 - e).max() < 1e-3
    assert np.abs(n2 - n).max() < 1e-3
    fwd = lcc_forward("EPSG:2154")
    e3, n3 = fwd(np.array([3.0]), np.array([47.0]))
    x, y = point_transform("EPSG:2154", "EPSG:32631")(e3, n3)
    assert abs(x[0] - 500000.0) < 1e-3


def test_lcc_layout_negotiation_and_warp(spark):
    """Target negotiation onto EPSG:2154 (snapped grid, exact cell size)
    and an NN warp of a constant cube: keys in [0, layout), no new values
    (the reference's grid-alignment invariant)."""
    from openeo_geotrellis_extensions_spark.core.tiles import decode_tile_float
    from openeo_geotrellis_extensions_spark.operators.resample import (
        resample_spatial,
    )
    from openeo_geotrellis_extensions_spark.sources.datacube import constant_cube

    src = LayoutDefinition(Extent(1.0, 45.0, 3.0, 47.0), 2, 2, 8, 8)
    tgt = utm_layout_for(src, resolution=14000.0, dst_crs="EPSG:2154")
    assert tgt.crs == "EPSG:2154"
    assert tgt.extent.xmin % 14000.0 == 0.0 and tgt.extent.ymax % 14000.0 == 0.0
    assert abs(tgt.cell_width - 14000.0) < 1e-9
    proj_ext = transform_extent(src.extent, "EPSG:4326", "EPSG:2154")
    assert tgt.extent.xmin <= proj_ext.xmin and proj_ext.xmax <= tgt.extent.xmax

    cube = constant_cube(spark, src, band_values=[7.0], cell_type="float64")
    out = resample_spatial(cube, tgt)
    rows = out.df.collect()
    assert rows
    for r in rows:
        assert 0 <= r.col < tgt.layout_cols and 0 <= r.row < tgt.layout_rows
        tile = decode_tile_float(list(r.bands), "float64", (8, 8))[0]
        vals = tile[~np.isnan(tile)]
        assert vals.size > 0 and (vals == 7.0).all()
