"""Aggregate resample methods (average/sum/min/max — geotrellis
Average/Sum/Min/Max ResampleMethod parity for resample_spatial).

Reference oracle: the FULL source mosaic reduced block-wise in numpy, so
partial-aggregate composition across source-tile borders is what's tested —
the distributed path ships per-(source-tile x target-tile) partials and
merges them, and any partial-compose bug shows as a pixel mismatch.
"""

import numpy as np
import pytest

from openeo_geotrellis_extensions_spark.core.grid import Extent, LayoutDefinition
from openeo_geotrellis_extensions_spark.core.tiles import decode_tile_float
from openeo_geotrellis_extensions_spark.operators.resample import resample_spatial
from openeo_geotrellis_extensions_spark.sources.datacube import arithmetic_cube

LAYOUT = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 2, 2, 8, 8)
#: 4x downscale: 16x16 source px -> 4x4, one target tile; each 4x4 block
#: spans a source-tile border for the middle rows/cols
DOWN4 = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 1, 1, 4, 4)
#: non-divisible tiling: 2x2 target tiles of 3x3 px => 6x6 target pixels,
#: factor 16/6 is FRACTIONAL — blocks carry 2 or 3 source pixels per axis
RAGGED = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 2, 2, 3, 3)


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


def _agg_ref(full, src_ld, tgt_ld, method):
    """Whole-mosaic reference: each target pixel aggregates the valid source
    pixels whose CENTERS fall inside it."""
    H, W = full.shape
    th = tgt_ld.layout_rows * tgt_ld.tile_rows
    tw = tgt_ld.layout_cols * tgt_ld.tile_cols
    out = np.full((th, tw), np.nan)
    xs = src_ld.extent.xmin + (np.arange(W) + 0.5) * src_ld.cell_width
    ys = src_ld.extent.ymax - (np.arange(H) + 0.5) * src_ld.cell_height
    gx = np.floor((xs - tgt_ld.extent.xmin) / tgt_ld.cell_width).astype(int)
    gy = np.floor((tgt_ld.extent.ymax - ys) / tgt_ld.cell_height).astype(int)
    fn = {
        "average": np.nanmean,
        "sum": np.nansum,
        "min": np.nanmin,
        "max": np.nanmax,
    }[method]
    for j in range(th):
        for i in range(tw):
            block = full[np.ix_(gy == j, gx == i)]
            if block.size and not np.isnan(block).all():
                out[j, i] = fn(block)
    return out


def _got(cube, tgt_ld, date0):
    th, tw = tgt_ld.tile_rows, tgt_ld.tile_cols
    full = np.full(
        (tgt_ld.layout_rows * th, tgt_ld.layout_cols * tw), np.nan
    )
    for r in cube.df.collect():
        if str(r.time) != date0:
            continue
        stack = decode_tile_float(list(r.bands), cube.meta.cell_type, (th, tw))
        full[r.row * th : (r.row + 1) * th, r.col * tw : (r.col + 1) * tw] = stack[0]
    return full


@pytest.mark.parametrize("method", ["average", "sum", "min", "max"])
@pytest.mark.parametrize("tgt", [DOWN4, RAGGED], ids=["down4", "ragged6"])
def test_aggregate_downscale_matches_mosaic_reference(spark, method, tgt):
    cube = arithmetic_cube(spark, LAYOUT, n_bands=1, cell_type="float64")
    date0 = str(cube.df.select("time").distinct().orderBy("time").first()[0])
    full = _mosaic(cube, date0)
    want = _agg_ref(full, LAYOUT, tgt, method)
    out = resample_spatial(cube, tgt, method=method)
    assert out.meta.layout == tgt
    got = _got(out, tgt, date0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12, equal_nan=True)


def test_aggregate_requires_same_crs(spark):
    cube = arithmetic_cube(spark, LAYOUT, n_bands=1, cell_type="float64")
    warped = LayoutDefinition(
        Extent(0.0, 0.0, 222000.0, 222000.0), 1, 1, 4, 4, "EPSG:32631"
    )
    with pytest.raises(ValueError, match="matching CRS"):
        resample_spatial(cube, warped, method="average")
