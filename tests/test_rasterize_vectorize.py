"""rasterize / vectorize round-trips (VectorCubeMethods +
OpenEOProcesses.vectorize semantics, without shapely: coverage equality is
asserted by re-rasterizing the vectorized output)."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from openeo_geotrellis_extensions_spark.core.geom import parse_geometry, rasterize
from openeo_geotrellis_extensions_spark.core.grid import Extent, LayoutDefinition
from openeo_geotrellis_extensions_spark.core.tiles import decode_tile_float
from openeo_geotrellis_extensions_spark.operators.rasterize import (
    _rectangles,
    rasterize_features,
    vectorize,
)

LAYOUT = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 2, 2, 8, 8)

RECT_A = json.dumps({"type": "Polygon", "coordinates":
                     [[[0.2, 0.2], [1.3, 0.2], [1.3, 1.3], [0.2, 1.3], [0.2, 0.2]]]})
RECT_B = json.dumps({"type": "Polygon", "coordinates":
                     [[[1.0, 1.0], [1.9, 1.0], [1.9, 1.9], [1.0, 1.9], [1.0, 1.0]]]})


def test_rectangles_decomposition():
    m = np.zeros((4, 6), dtype=bool)
    m[1:3, 1:4] = True
    m[0, 5] = True
    rects = sorted(_rectangles(m))
    assert rects == [(0, 1, 5, 6), (1, 3, 1, 4)]
    # coverage equality
    back = np.zeros_like(m)
    for y0, y1, x0, x1 in rects:
        back[y0:y1, x0:x1] = True
    np.testing.assert_array_equal(m, back)


def test_rasterize_values_and_overlap(spark):
    feats = spark.createDataFrame(
        [(1, RECT_A, 10.0), (2, RECT_B, 20.0)], ["feature_index", "geojson", "value"]
    )
    cube = rasterize_features(feats, LAYOUT, value_col="value")
    tiles = {
        (r.col, r.row): decode_tile_float(list(r.bands), "int32", (8, 8))[0]
        for r in cube.df.collect()
    }
    # pixel at (0.5, 0.5): tile (0,1)? y=0.5 -> row=1; inside A only
    xs, ys = LAYOUT.pixel_centers_for_key(0, 1)
    arr = tiles[(0, 1)]
    ga = parse_geometry(RECT_A)
    in_a = rasterize(ga, xs, ys)
    np.testing.assert_array_equal(arr == 10.0, in_a & (arr != 20.0))
    # overlap zone (1.0..1.3): later feature (B=20) wins
    xs1, ys1 = LAYOUT.pixel_centers_for_key(1, 0)
    arr1 = tiles[(1, 0)]
    gb = parse_geometry(RECT_B)
    in_b = rasterize(gb, xs1, ys1)
    assert (arr1[in_b] == 20.0).all()


def test_vectorize_roundtrip_coverage(spark):
    """rasterize -> vectorize -> re-rasterize reproduces the exact pixel set."""
    feats = spark.createDataFrame([(1, RECT_A, 7.0)], ["feature_index", "geojson", "value"])
    cube = rasterize_features(feats, LAYOUT, value_col="value")
    vecs = vectorize(cube).collect()
    assert all(r.value == 7.0 for r in vecs)
    # re-rasterize all rectangles onto the full grid
    H = W = 16
    covered = np.zeros((H, W), dtype=bool)
    for r in vecs:
        g = parse_geometry(r.geojson)
        bb = g.bbox()
        x0 = int(round((bb.xmin - 0.0) / 0.125))
        x1 = int(round((bb.xmax - 0.0) / 0.125))
        y1 = int(round((2.0 - bb.ymin) / 0.125))
        y0 = int(round((2.0 - bb.ymax) / 0.125))
        covered[y0:y1, x0:x1] = True
    # expected: pixel centers inside RECT_A
    xs = (np.arange(16) + 0.5) * 0.125
    ys = 2.0 - (np.arange(16) + 0.5) * 0.125
    exp = rasterize(parse_geometry(RECT_A), xs, ys)
    np.testing.assert_array_equal(covered, exp)


def test_vectorize_sparse_keys_only(spark):
    feats = spark.createDataFrame([(1, RECT_B, 5.0)], ["feature_index", "geojson", "value"])
    cube = rasterize_features(feats, LAYOUT, value_col="value")
    # RECT_B misses tile (0,1) entirely -> sparse cube
    keys = {(r.col, r.row) for r in cube.df.select("col", "row").collect()}
    assert (0, 1) not in keys
