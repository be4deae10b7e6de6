"""Property-based invariants (hypothesis) for the core math the whole engine
rests on: grid key round-trips, cell encode/decode, cell-type promotion
algebra, PIP consistency, tile codec."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from openeo_geotrellis_extensions_spark.core.celltype import (
    cell_type_union,
    parse_cell_type,
)
from openeo_geotrellis_extensions_spark.core.geom import (
    from_geojson,
    points_in_geometry,
)
from openeo_geotrellis_extensions_spark.core.grid import (
    Extent,
    GlobalGrid,
    LayoutDefinition,
)
from openeo_geotrellis_extensions_spark.core.tiles import decode_band, encode_band

CT_NAMES = ["uint8", "uint8raw", "uint8ud255", "int8", "uint16", "int16",
            "int32", "float32", "float64"]


@given(
    st.floats(-179.99, 179.99, allow_nan=False),
    st.floats(-89.99, 89.99, allow_nan=False),
    st.integers(0, 12),
)
@settings(max_examples=200, deadline=None)
def test_cell_contains_its_point(x, y, res):
    # tolerance: a point within 1 ULP of a cell boundary may land either
    # side (inherent float grid math, same as Geotrellis mapToGrid)
    cid = int(GlobalGrid.cell_for_point(res, np.array([x]), np.array([y]))[0])
    e = GlobalGrid.cell_extent(cid)
    eps = GlobalGrid.cell_size(res) * 1e-12
    assert e.xmin - eps <= x <= e.xmax + eps
    assert e.ymin - eps <= y <= e.ymax + eps
    # parent at res-1 contains the same cell area
    if res > 0:
        pid = int(GlobalGrid.parent(cid, res - 1))
        pe = GlobalGrid.cell_extent(pid)
        assert pe.contains(e)
        assert cid in GlobalGrid.children(pid)


@given(
    st.floats(-179.99, 179.99, allow_nan=False),
    st.floats(-89.99, 89.99, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_layout_key_roundtrip(x, y):
    ld = LayoutDefinition(Extent(-180, -90, 180, 90), 36, 18, 16, 16)
    c, r = ld.key_for_point(x, y)
    e = ld.extent_for_key(c, r)
    eps = ld.tile_width * 1e-12  # 1-ULP boundary tolerance (see above)
    assert e.xmin - eps <= x <= e.xmax + eps
    assert e.ymin - eps <= y <= e.ymax + eps


@given(st.sampled_from(CT_NAMES), st.sampled_from(CT_NAMES))
@settings(max_examples=100, deadline=None)
def test_celltype_union_commutative_idempotent(a, b):
    u1 = cell_type_union(a, b)
    u2 = cell_type_union(b, a)
    assert u1 == u2
    assert cell_type_union(a, a).base == parse_cell_type(a).base
    # union absorbs both inputs (re-union is a no-op)
    assert cell_type_union(u1.name, a).base == u1.base
    assert cell_type_union(u1.name, b).base == u1.base


@given(st.sampled_from(CT_NAMES),
       st.integers(0, 250), st.integers(1, 12), st.integers(1, 12))
@settings(max_examples=100, deadline=None)
def test_tile_codec_roundtrip(ct_name, fill, h, w):
    ct = parse_cell_type(ct_name)
    arr = np.full((h, w), fill % 120, dtype=ct.dtype)
    back = decode_band(encode_band(arr, ct), ct, (h, w))
    np.testing.assert_array_equal(arr, back)


@given(
    st.lists(
        st.tuples(st.floats(-50, 50, allow_nan=False),
                  st.floats(-50, 50, allow_nan=False)),
        min_size=3, max_size=8,
    ),
    st.floats(-60, 60, allow_nan=False),
    st.floats(-60, 60, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_pip_convex_hull_consistency(pts, qx, qy):
    """A point inside a polygon is inside its bbox (PIP => bbox test)."""
    ring = pts + [pts[0]]
    g = from_geojson({"type": "Polygon", "coordinates": [[list(p) for p in ring]]})
    inside = points_in_geometry(g, np.array([qx]), np.array([qy]))[0]
    if inside:
        bb = g.bbox()
        assert bb.xmin <= qx <= bb.xmax and bb.ymin <= qy <= bb.ymax


@given(st.integers(0, 10), st.integers(0, 2**20))
@settings(max_examples=100, deadline=None)
def test_cell_encode_decode(res, seed):
    nx, ny = GlobalGrid.n_cells(res)
    x, y = seed % nx, (seed * 7) % ny
    cid = int(GlobalGrid.encode(res, x, y))
    rr, xx, yy = (int(v) for v in GlobalGrid.decode(cid))
    assert (rr, xx, yy) == (res, x, y)


@given(
    st.integers(1, 400),
    st.integers(2, 64),
    st.integers(0, 40),
    st.integers(0, 10_000),
)
@settings(max_examples=150, deadline=None)
def test_chunking_window_algebra(n_words, chunk, overlap, seed):
    """Pure window math of chunk_documents, replicated in numpy: windows
    start at multiples of (chunk - overlap); the union of windows covers
    every token; consecutive windows share exactly `overlap` tokens except
    the ragged tail; a short doc yields exactly one window."""
    if overlap >= chunk:
        return
    step = chunk - overlap
    n_chunks = max(1, -(-(max(n_words - overlap, 0)) // step))
    starts = [i * step for i in range(n_chunks)]
    ends = [min(s + chunk, n_words) for s in starts]
    # coverage: every token index is inside some window
    covered = np.zeros(n_words, dtype=bool)
    for s, e in zip(starts, ends):
        covered[s:e] = True
    assert covered.all()
    # window starts stay inside the doc (no fully-empty windows)
    assert all(s < n_words for s in starts)
    # overlap between consecutive full windows
    for (s1, e1), (s2, e2) in zip(zip(starts, ends), zip(starts[1:], ends[1:])):
        assert s2 == e1 - overlap or e1 < s1 + chunk  # ragged tail exempt
    if n_words <= chunk:
        assert n_chunks == 1


@given(
    st.integers(0, (1 << 21) - 1),
    st.integers(0, (1 << 21) - 1),
    st.integers(0, (1 << 21) - 1),
)
@settings(max_examples=300, deadline=None)
def test_zindex3_bit_exact_and_ordering(c, r, t):
    """zindex3 == per-bit interleave for arbitrary 21-bit inputs, and
    incrementing one axis (others fixed) strictly increases the key."""
    from openeo_geotrellis_extensions_spark.core.grid import zindex3

    z = int(zindex3([c], [r], [t])[0])
    want = 0
    for b in range(21):
        want |= ((c >> b) & 1) << (3 * b)
        want |= ((r >> b) & 1) << (3 * b + 1)
        want |= ((t >> b) & 1) << (3 * b + 2)
    assert z == want
    if c + 1 < (1 << 21):
        assert int(zindex3([c + 1], [r], [t])[0]) > z
    if t + 1 < (1 << 21):
        assert int(zindex3([c], [r], [t + 1])[0]) > z
