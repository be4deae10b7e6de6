"""Bilinear resample_spatial (TileRDDReproject ResampleMethod parity).

The reference implementation here assembles the FULL source mosaic in numpy
and bilinearly samples it directly (no tiling), so any halo-exchange bug at
tile borders shows up as a pixel mismatch.
"""

import numpy as np
import pytest

from openeo_geotrellis_extensions_spark.core.grid import Extent, LayoutDefinition
from openeo_geotrellis_extensions_spark.core.tiles import decode_tile_float
from openeo_geotrellis_extensions_spark.operators.resample import resample_spatial
from openeo_geotrellis_extensions_spark.sources.datacube import (
    arithmetic_cube,
    constant_cube,
)

LAYOUT = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 2, 2, 8, 8)
DOWN2 = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 1, 1, 8, 8)


def _mosaic(cube, date0):
    ld = cube.meta.layout
    th, tw = ld.tile_rows, ld.tile_cols
    full = np.full((ld.layout_rows * th, ld.layout_cols * tw), np.nan)
    for r in cube.df.collect():
        if str(r.time) != date0:
            continue
        stack = decode_tile_float(list(r.bands), cube.meta.cell_type, (th, tw))
        full[r.row * th : (r.row + 1) * th, r.col * tw : (r.col + 1) * tw] = stack[0]
    return full


def _bilinear_ref(full, src_ld, tgt_ld):
    """Direct whole-mosaic bilinear with ignore-nodata renormalization."""
    H, W = full.shape
    th, tw = tgt_ld.layout_rows * tgt_ld.tile_rows, tgt_ld.layout_cols * tgt_ld.tile_cols
    out = np.full((th, tw), np.nan)
    for j in range(th):
        for i in range(tw):
            xc = tgt_ld.extent.xmin + (i + 0.5) * tgt_ld.cell_width
            yc = tgt_ld.extent.ymax - (j + 0.5) * tgt_ld.cell_height
            fx = (xc - src_ld.extent.xmin) / src_ld.cell_width - 0.5
            fy = (src_ld.extent.ymax - yc) / src_ld.cell_height - 0.5
            x0, y0 = int(np.floor(fx)), int(np.floor(fy))
            wx, wy = fx - x0, fy - y0
            tot = acc = 0.0
            for dy, dx, w in (
                (0, 0, (1 - wx) * (1 - wy)),
                (0, 1, wx * (1 - wy)),
                (1, 0, (1 - wx) * wy),
                (1, 1, wx * wy),
            ):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < H and 0 <= xx < W and not np.isnan(full[yy, xx]):
                    tot += w
                    acc += w * full[yy, xx]
            if tot > 0:
                out[j, i] = acc / tot
    return out


def test_bilinear_downscale_matches_reference(spark):
    cube = arithmetic_cube(spark, LAYOUT, n_bands=1, cell_type="float64")
    date0 = str(cube.df.selectExpr("min(time)").collect()[0][0])
    full = _mosaic(cube, date0)
    out = resample_spatial(cube, DOWN2, method="bilinear")
    assert out.meta.cell_type == "float64"
    got = _mosaic(out, date0)
    want = _bilinear_ref(full, LAYOUT, DOWN2)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12, equal_nan=True)


def test_bilinear_upscale_crosses_tile_borders(spark):
    """2x UPSCALE: target pixels interpolate between source pixels of
    ADJACENT tiles — wrong/missing halos produce edge artifacts here."""
    up2 = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 4, 4, 8, 8)
    cube = arithmetic_cube(spark, LAYOUT, n_bands=1, cell_type="float64")
    date0 = str(cube.df.selectExpr("min(time)").collect()[0][0])
    full = _mosaic(cube, date0)
    out = resample_spatial(cube, up2, method="bilinear")
    got = _mosaic(out, date0)
    want = _bilinear_ref(full, LAYOUT, up2)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12, equal_nan=True)


def test_bilinear_constant_invariance(spark):
    cube = constant_cube(spark, LAYOUT, band_values=[7.0], cell_type="float64")
    out = resample_spatial(cube, DOWN2, method="bilinear")
    for r in out.df.collect():
        tile = decode_tile_float(list(r.bands), "float64", (8, 8))[0]
        vals = tile[~np.isnan(tile)]
        assert vals.size and (vals == 7.0).all()


def test_bad_method_raises(spark):
    cube = constant_cube(spark, LAYOUT, band_values=[1.0], cell_type="float64")
    with pytest.raises(ValueError, match="unknown resample method"):
        resample_spatial(cube, DOWN2, method="cubicspline")
