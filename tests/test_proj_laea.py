"""ETRS89-LAEA Europe (EPSG:3035) — core/proj.py.

Reference parity target: the reference's own test surface exercises
EPSG:3035 (LoadStacPyramidFactoryTest.scala); formulas are Snyder's
ellipsoidal oblique Lambert azimuthal equal-area (USGS PP 1395 pp. 187-190)
on GRS80. Anchors are the official projection-center definition and the
IOGP Guidance Note 7-2 worked example for this exact CRS.
"""

import numpy as np

from openeo_geotrellis_extensions_spark.core.grid import Extent, LayoutDefinition
from openeo_geotrellis_extensions_spark.core.proj import (
    _B2P,
    _GRS80_E2,
    _LAEA_QP,
    _authalic_q,
    laea_forward,
    laea_inverse,
    point_transform,
    transform_extent,
    utm_layout_for,
)


def test_laea_anchors():
    """Projection center maps to the false easting/northing exactly;
    the IOGP GN7-2 worked example (lat 50N lon 5E -> E 3962799.45,
    N 2999718.85) reproduces to the centimeter."""
    fwd = laea_forward("EPSG:3035")
    x, y = fwd(np.array([10.0]), np.array([52.0]))
    assert abs(x[0] - 4321000.0) < 1e-6
    assert abs(y[0] - 3210000.0) < 1e-6
    x, y = fwd(np.array([5.0]), np.array([50.0]))
    assert abs(x[0] - 3962799.45) < 0.01
    assert abs(y[0] - 2999718.85) < 0.01


def test_laea_roundtrip():
    """fwd∘inv identity over a Europe-wide grid: lon to float ulp, lat to
    the authalic-series truncation (~1e-8 deg ≈ 1 mm)."""
    fwd, inv = laea_forward("EPSG:3035"), laea_inverse("EPSG:3035")
    lon, lat = np.meshgrid(np.linspace(-10, 35, 31), np.linspace(0, 72, 31))
    e, n = fwd(lon, lat)
    lon2, lat2 = inv(e, n)
    assert np.abs(lon2 - lon).max() < 1e-11
    assert np.abs(lat2 - lat).max() < 5e-8


def test_laea_center_inverse_singularity():
    """rho=0 (the projection center itself) inverts without NaN."""
    inv = laea_inverse("EPSG:3035")
    lon, lat = inv(np.array([4321000.0]), np.array([3210000.0]))
    assert abs(lon[0] - 10.0) < 1e-9
    assert abs(lat[0] - 52.0) < 1e-6


def test_laea_is_equal_area():
    """The defining property, checked against the formulas' own structure
    independently: the numerical Jacobian determinant of the forward map
    equals the GRS80 area element a^2(1-e^2)cos(phi)/(1-e^2 sin^2 phi)^2."""
    fwd = laea_forward("EPSG:3035")
    a2 = 6378137.0**2
    h = 1e-6
    for lon0, lat0 in [(2.0, 1.0), (10.0, 30.0), (25.0, 52.0), (-5.0, 65.0)]:
        x0, y0 = fwd(np.array([lon0]), np.array([lat0]))
        xl, yl = fwd(np.array([lon0 + h]), np.array([lat0]))
        xp, yp = fwd(np.array([lon0]), np.array([lat0 + h]))
        det = abs(
            (xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)
        )[0] / np.radians(h) ** 2
        p = np.radians(lat0)
        truth = a2 * (1 - _GRS80_E2) * np.cos(p) / (1 - _GRS80_E2 * np.sin(p) ** 2) ** 2
        assert abs(det / truth - 1.0) < 1e-5


def test_laea_authalic_series_vs_newton():
    """The beta->phi series (Snyder 3-18) agrees with a Newton inversion of
    the exact q(phi) relation — an independent formulation — to <5e-8 deg
    (~5 mm, the series' truncation floor; matches the round-trip bound)."""
    qp = _LAEA_QP
    for beta_deg in [1.0, 20.0, 45.0, 60.0, 70.0]:
        beta = np.radians(beta_deg)
        p1, p2, p3 = _B2P
        phi_series = (
            beta + p1 * np.sin(2 * beta) + p2 * np.sin(4 * beta) + p3 * np.sin(6 * beta)
        )
        q_target = qp * np.sin(beta)
        phi = float(beta)
        for _ in range(30):  # Newton on q(phi) = q_target
            f = float(_authalic_q(np.sin(np.array(phi)))) - q_target
            df = (
                float(_authalic_q(np.sin(np.array(phi + 1e-7))))
                - float(_authalic_q(np.sin(np.array(phi - 1e-7))))
            ) / 2e-7
            phi -= f / df
        assert abs(np.degrees(phi_series - phi)) < 5e-8


def test_point_transform_laea_composition():
    """3035 <-> 3857 and 3035 <-> UTM compose through the 4326 hub."""
    pt = point_transform("EPSG:3035", "EPSG:3857")
    back = point_transform("EPSG:3857", "EPSG:3035")
    e = np.array([4321000.0, 3962799.45])
    n = np.array([3210000.0, 2999718.85])
    x, y = pt(e, n)
    e2, n2 = back(x, y)
    assert np.abs(e2 - e).max() < 1e-3  # two authalic-series trips ~0.3 mm
    assert np.abs(n2 - n).max() < 1e-3
    pt2 = point_transform("EPSG:3035", "EPSG:32632")
    fwd = laea_forward("EPSG:3035")
    e9, n9 = fwd(np.array([9.0]), np.array([50.0]))  # zone-32 central meridian
    x, y = pt2(e9, n9)
    assert abs(x[0] - 500000.0) < 1e-3  # on the central meridian E=500000


def test_laea_layout_snapping_and_alignment():
    """European-grid target negotiation: snapped extent on the resolution
    grid, exact cell size, covers the projected source extent."""
    src = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 2, 2, 8, 8)
    tgt = utm_layout_for(src, resolution=14000.0, dst_crs="EPSG:3035")
    assert tgt.crs == "EPSG:3035"
    assert tgt.extent.xmin % 14000.0 == 0.0
    assert tgt.extent.ymax % 14000.0 == 0.0
    assert abs(tgt.cell_width - 14000.0) < 1e-9
    assert abs(tgt.cell_height - 14000.0) < 1e-9
    proj_ext = transform_extent(src.extent, "EPSG:4326", "EPSG:3035")
    assert tgt.extent.xmin <= proj_ext.xmin and proj_ext.xmax <= tgt.extent.xmax
    assert tgt.extent.ymax >= proj_ext.ymax


def test_resample_to_laea_keys_in_grid(spark):
    """Warp a constant cube 4326 -> 3035: keys in [0, layout), tiles
    non-empty, NN warp introduces no new values (the reference's
    grid-alignment invariant, OpenEOProcessesSpec.scala:581-600)."""
    from openeo_geotrellis_extensions_spark.core.tiles import decode_tile_float
    from openeo_geotrellis_extensions_spark.operators.resample import (
        resample_spatial,
    )
    from openeo_geotrellis_extensions_spark.sources.datacube import constant_cube

    src_layout = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 2, 2, 8, 8)
    cube = constant_cube(spark, src_layout, band_values=[7.0], cell_type="float64")
    tgt = utm_layout_for(src_layout, resolution=14000.0, dst_crs="EPSG:3035")
    out = resample_spatial(cube, tgt)
    rows = out.df.collect()
    assert rows, "warp produced no tiles"
    for r in rows:
        assert 0 <= r.col < tgt.layout_cols
        assert 0 <= r.row < tgt.layout_rows
        tile = decode_tile_float(list(r.bands), "float64", (8, 8))[0]
        vals = tile[~np.isnan(tile)]
        assert vals.size > 0
        assert (vals == 7.0).all()


def test_resample_bilinear_to_laea_constant(spark):
    """Bilinear warp under a NON-separable CRS (halo exchange + 2x2 weights
    through the LAEA inverse): a constant cube stays exactly constant on
    valid pixels — any halo/weight bug shows as interpolation noise."""
    from openeo_geotrellis_extensions_spark.core.tiles import decode_tile_float
    from openeo_geotrellis_extensions_spark.operators.resample import (
        resample_spatial,
    )
    from openeo_geotrellis_extensions_spark.sources.datacube import constant_cube

    src_layout = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 2, 2, 8, 8)
    cube = constant_cube(spark, src_layout, band_values=[3.5], cell_type="float64")
    tgt = utm_layout_for(src_layout, resolution=14000.0, dst_crs="EPSG:3035")
    out = resample_spatial(cube, tgt, method="bilinear")
    rows = out.df.collect()
    assert rows
    got_valid = 0
    for r in rows:
        tile = decode_tile_float(list(r.bands), "float64", (8, 8))[0]
        vals = tile[~np.isnan(tile)]
        got_valid += vals.size
        # renormalized weights: acc/tot == 3.5 up to one ulp of float algebra
        assert vals.size == 0 or np.abs(vals - 3.5).max() < 1e-9
    assert got_valid > 0
