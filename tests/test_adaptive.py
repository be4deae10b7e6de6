"""Resolution-adaptive tiling (optimizeChunkSize analog) + zoomed layout."""

import numpy as np
import pytest

from openeo_geotrellis_extensions_spark.core.grid import (
    Extent,
    GlobalGrid,
    LayoutDefinition,
    zoomed_layout,
)
from openeo_geotrellis_extensions_spark.core.tiles import decode_tile_float
from openeo_geotrellis_extensions_spark.operators.adaptive import (
    adapt_resolution,
    optimal_tile_size,
)
from openeo_geotrellis_extensions_spark.sources.datacube import arithmetic_cube

LAYOUT = LayoutDefinition(Extent(0.0, 0.0, 8.0, 8.0), 2, 2, 32, 32)


def test_optimal_tile_size_small_request_shrinks(spark):
    cube = arithmetic_cube(spark, LAYOUT, n_bands=1)
    # tiny request (one tile's corner) -> smaller chunks for parallelism
    small = optimal_tile_size(cube, Extent(0.0, 0.0, 1.0, 1.0))
    whole = optimal_tile_size(cube, LAYOUT.extent)
    assert small < 32
    assert small <= whole  # smaller request -> at-most-equal chunk size
    # disjoint request -> no-op
    assert optimal_tile_size(cube, Extent(100.0, 100.0, 101.0, 101.0)) == 32
    # large target already satisfied -> keep size
    assert optimal_tile_size(cube, LAYOUT.extent, target_tiles=4) == 32


def test_adapt_resolution_preserves_pixels(spark):
    cube = arithmetic_cube(spark, LAYOUT, n_bands=1)
    out = adapt_resolution(cube, Extent(0.0, 0.0, 1.0, 1.0))
    assert out.meta.layout.tile_cols < 32
    # pixel plane preserved exactly (retile is pixel-preserving)
    def plane(c):
        ld = c.meta.layout
        H = ld.layout_rows * ld.tile_rows
        W = ld.layout_cols * ld.tile_cols
        full = np.full((H, W), np.nan)
        for r in c.df.collect():
            if r.time.strftime("%Y-%m-%d") != "2017-01-01":
                continue
            full[r.row * ld.tile_rows:(r.row + 1) * ld.tile_rows,
                 r.col * ld.tile_cols:(r.col + 1) * ld.tile_cols] = \
                decode_tile_float(list(r.bands), c.meta.cell_type, c.meta.tile_shape)[0]
        return full
    np.testing.assert_allclose(plane(cube), plane(out), equal_nan=True)


def test_zoomed_layout_matches_global_grid():
    ld = zoomed_layout(3, tile_size=16)
    assert (ld.layout_cols, ld.layout_rows) == GlobalGrid.n_cells(3)
    # tile key == cell (x, y) at the same zoom
    c, r = ld.key_for_point(4.3, 50.9)
    cid = int(GlobalGrid.cell_for_point(3, np.array([4.3]), np.array([50.9]))[0])
    _, x, y = (int(v) for v in GlobalGrid.decode(cid))
    assert (c, ld.layout_rows - 1 - r) == (x, y)  # row 0 top vs y 0 bottom
