"""WGS84 UTM (Krueger-series transverse Mercator) — core/proj.py.

Reference parity targets: the default UTM target layout with grid snapping
(DatacubeSupport.scala:58-80) and the grid-alignment invariant that every
key of a reprojected layout stays in [0, layout)
(OpenEOProcessesSpec.scala:581-600).
"""

import numpy as np
import pytest

from openeo_geotrellis_extensions_spark.core.grid import Extent, LayoutDefinition
from openeo_geotrellis_extensions_spark.core.proj import (
    _TM_A,
    _UTM_K0,
    parse_utm,
    point_transform,
    snap_extent,
    transform_extent,
    utm_crs,
    utm_forward,
    utm_inverse,
    utm_layout_for,
    utm_zone_for,
)


def _snyder_forward(lon, lat, lon0):
    """Independent cross-check implementation: Snyder (USGS PP 1395,
    eq. 8-9..8-14) ellipsoidal TM forward — completely different series from
    the engine's Krueger alpha/beta form, so agreement to sub-mm means both
    are almost surely correct."""
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)
    N_ = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    A_ = lam * np.cos(phi)
    M = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
        - (35 * e2**3 / 3072) * np.sin(6 * phi)
    )
    x = k0 * N_ * (A_ + (1 - T + C) * A_**3 / 6 + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A_**5 / 120)
    y = k0 * (
        M
        + N_ * np.tan(phi) * (
            A_**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * A_**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A_**6 / 720
        )
    )
    return x + 500000.0, y


def test_utm_anchors():
    fwd = utm_forward(31, False)
    e, n = fwd(np.array([3.0]), np.array([0.0]))
    assert abs(e[0] - 500000.0) < 1e-6 and abs(n[0]) < 1e-6
    # meridian quarter arc scaled by k0 at the pole
    e, n = fwd(np.array([3.0]), np.array([90.0]))
    assert abs(n[0] - _UTM_K0 * _TM_A * np.pi / 2) < 1e-6
    # south zone false northing
    e, n = utm_forward(31, True)(np.array([3.0]), np.array([0.0]))
    assert abs(n[0] - 10000000.0) < 1e-6


def test_utm_forward_matches_snyder():
    lons = np.linspace(0.2, 5.8, 13)
    lats = np.linspace(-79.0, 79.0, 17)
    LO, LA = np.meshgrid(lons, lats)
    ek, nk = utm_forward(31, False)(LO.ravel(), LA.ravel())
    es, ns = _snyder_forward(LO.ravel(), LA.ravel(), 3.0)
    assert np.abs(ek - es).max() < 0.005  # sub-5mm across the zone
    assert np.abs(nk - ns).max() < 0.005


def test_utm_roundtrip():
    lons = np.linspace(0.2, 5.8, 13)
    lats = np.linspace(-79.0, 79.0, 17)
    LO, LA = np.meshgrid(lons, lats)
    e, n = utm_forward(31, False)(LO, LA)
    lo, la = utm_inverse(31, False)(e, n)
    assert np.abs(lo - LO).max() < 1e-9
    assert np.abs(la - LA).max() < 1e-9


def test_zone_pick_and_parse():
    assert utm_zone_for(3.0, 50.0) == "EPSG:32631"
    assert utm_zone_for(3.0, -10.0) == "EPSG:32731"
    assert utm_zone_for(-122.3, 47.6) == "EPSG:32610"
    assert parse_utm("EPSG:32610") == (10, False)
    assert parse_utm("EPSG:32731") == (31, True)
    assert parse_utm("EPSG:4326") is None
    with pytest.raises(ValueError):
        utm_crs(61)


def test_point_transform_composition_3857_utm():
    """3857 -> UTM composes through 4326: must equal forward(inv_merc)."""
    x = np.array([111319.49, 333958.47])
    y = np.array([111325.14, 5591295.92])
    ex, ny = point_transform("EPSG:3857", "EPSG:32631")(x, y)
    lon, lat = point_transform("EPSG:3857", "EPSG:4326")(x, y)
    ex2, ny2 = utm_forward(31, False)(lon, lat)
    assert np.allclose(ex, ex2) and np.allclose(ny, ny2)


def test_transform_extent_utm_bounds_samples():
    """Densified-edge extent must contain the image of interior points."""
    e = Extent(0.0, 40.0, 6.0, 46.0)
    te = transform_extent(e, "EPSG:4326", "EPSG:32631")
    rng = np.random.default_rng(7)
    lon = rng.uniform(e.xmin, e.xmax, 500)
    lat = rng.uniform(e.ymin, e.ymax, 500)
    ex, ny = utm_forward(31, False)(lon, lat)
    assert te.xmin <= ex.min() and ex.max() <= te.xmax
    assert te.ymin <= ny.min() and ny.max() <= te.ymax


def test_utm_layout_snapping_and_alignment():
    """DatacubeSupport parity: snapped extent lands on the resolution grid,
    cell size is exactly the requested resolution, and the layout covers the
    projected source extent."""
    src = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 2, 2, 8, 8)
    tgt = utm_layout_for(src, resolution=14000.0)
    assert tgt.crs == "EPSG:32631"
    assert tgt.extent.xmin % 14000.0 == 0.0
    assert tgt.extent.ymax % 14000.0 == 0.0
    assert abs(tgt.cell_width - 14000.0) < 1e-9
    assert abs(tgt.cell_height - 14000.0) < 1e-9
    proj_ext = transform_extent(src.extent, "EPSG:4326", "EPSG:32631")
    assert tgt.extent.xmin <= proj_ext.xmin and proj_ext.xmax <= tgt.extent.xmax
    assert tgt.extent.ymax >= proj_ext.ymax
    snapped = snap_extent(Extent(13.0, -7.0, 27.0, 9.0), 10.0)
    assert snapped == Extent(10.0, -10.0, 30.0, 10.0)


def test_resample_to_utm_keys_in_grid(spark):
    """Warp a cube 4326 -> UTM: every emitted key must be in [0, layout)
    (filterNegativeSpatialKeys / OpenEOProcessesSpec.scala:581-600), tiles
    must be non-empty, and a constant cube stays constant (NN warping
    introduces no new values)."""
    from openeo_geotrellis_extensions_spark.core.tiles import decode_tile_float
    from openeo_geotrellis_extensions_spark.operators.resample import (
        resample_spatial,
    )
    from openeo_geotrellis_extensions_spark.sources.datacube import constant_cube

    src_layout = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 2, 2, 8, 8)
    cube = constant_cube(
        spark, src_layout, band_values=[7.0], cell_type="float64"
    )
    tgt = utm_layout_for(src_layout, resolution=14000.0)
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
    # round-trip UTM -> 4326 restores the constant on interior pixels
    back = resample_spatial(out, src_layout)
    for r in back.df.collect():
        tile = decode_tile_float(list(r.bands), "float64", (8, 8))[0]
        vals = tile[~np.isnan(tile)]
        assert (vals == 7.0).all()
