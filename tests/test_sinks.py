"""Writer round-trips — mirrors the reference's WriteRDDToGeotiffTest /
TileGridTest / NetCDFRDDWriterTest / PngTest patterns (SURVEY §5.6)."""

import json
import os

import numpy as np
import pytest

from openeo_geotrellis_extensions_spark.core.grid import Extent, LayoutDefinition
from openeo_geotrellis_extensions_spark.sinks.geotiff import (
    read_geotiff,
    save_geotiff_tiles,
    save_stitched_geotiff,
    write_geotiff,
)
from openeo_geotrellis_extensions_spark.sinks.netcdf import save_samples, write_netcdf
from openeo_geotrellis_extensions_spark.sinks.png import read_png, save_png, write_png
from openeo_geotrellis_extensions_spark.sinks.tabular import (
    save_geojson,
    save_timeseries_csv,
)
from openeo_geotrellis_extensions_spark.operators.zonal import aggregate_spatial
from openeo_geotrellis_extensions_spark.sources.datacube import (
    arithmetic_cube,
    constant_cube,
)
from openeo_geotrellis_extensions_spark.sources.interleaved import DATES

LAYOUT = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), 2, 2, 8, 8)


def test_geotiff_roundtrip_dtypes(tmp_path):
    ext = Extent(4.0, 50.0, 5.0, 51.0)
    for dt, nodata in [("uint8", 255), ("int16", -32768), ("float32", float("nan")),
                       ("int32", None), ("float64", None)]:
        rng = np.random.default_rng(1)
        arr = (rng.random((2, 16, 16)) * 100).astype(dt)
        p = str(tmp_path / f"t_{dt}.tif")
        write_geotiff(p, arr, ext, nodata=nodata)
        back, bext, bnod = read_geotiff(p)
        np.testing.assert_array_equal(arr, back)
        assert bext == pytest.approx(ext)
        if nodata is None:
            assert bnod is None
        elif isinstance(nodata, float) and np.isnan(nodata):
            assert np.isnan(bnod)
        else:
            assert bnod == nodata


def test_geotiff_header_is_valid_tiff(tmp_path):
    p = str(tmp_path / "t.tif")
    write_geotiff(p, np.zeros((1, 4, 4), dtype=np.uint8), Extent(0, 0, 1, 1))
    with open(p, "rb") as f:
        assert f.read(4) == b"II\x2a\x00"  # little-endian classic TIFF magic


def test_stitched_geotiff(spark, tmp_path):
    cube = arithmetic_cube(spark, LAYOUT, n_bands=2, cell_type="int32")
    p = save_stitched_geotiff(cube, str(tmp_path / "full.tif"), date=DATES[0])
    bands, ext, nodata = read_geotiff(p)
    assert bands.shape == (2, 16, 16)
    assert ext == pytest.approx(LAYOUT.extent)
    # pixel check vs formula (global px 10, py 3 -> tile (1,0), px 2, py 3)
    v = (2 * 3 + 3 * 5 + 1 * 13 + 0 * 7 + 0 * 11) % 97
    if (2 + 3 + 1 + 0 + 0) % 13 != 0:
        assert bands[0, 3, 10] == v


def test_geotiff_tile_grid_written_by_executors(spark, tmp_path):
    cube = arithmetic_cube(spark, LAYOUT, n_bands=1, cell_type="int32")
    idx = save_geotiff_tiles(cube, str(tmp_path / "tiles"), grid=2)
    # 2x2 layout grouped in 2x2 super-cells -> 1 file per date
    assert len(idx) == len(DATES)
    for _, row in idx.iterrows():
        bands, ext, _ = read_geotiff(row["path"])
        assert bands.shape == (1, 16, 16)


def test_png_roundtrip(tmp_path):
    img = (np.arange(64).reshape(8, 8) * 3).astype(np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(img, back)
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_png_adam7_interlace_roundtrip():
    """Adam7 decode: interlaced gray + RGB round-trip bit-exact, including
    non-multiple-of-8 dims (ragged final passes) and tiny images where some
    passes are empty."""
    import zlib

    from openeo_geotrellis_extensions_spark.sinks.png import (
        _adam7_pass_dims,
        decode_png_bytes,
        encode_png_bytes,
    )

    rng = np.random.RandomState(7)
    for shape in [(8, 8), (13, 11), (1, 1), (2, 3), (16, 5, 3), (9, 14, 3)]:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        buf = encode_png_bytes(img, interlace=True)
        np.testing.assert_array_equal(decode_png_bytes(buf), img)
        # interlaced stream is genuinely Adam7 (pass layout, not one image)
        assert buf[8 + 8 + 12] == 1  # IHDR interlace byte
    # every pixel covered exactly once by the pass grid
    w, h = 13, 11
    hits = np.zeros((h, w), dtype=int)
    for x0, y0, dx, dy, _pw, _ph in _adam7_pass_dims(w, h):
        hits[y0::dy, x0::dx] += 1
    assert (hits == 1).all()

    # filters inside interlaced passes: Sub-filter each pass scanline by
    # hand and check the decoder unfilters per-pass (not across passes)
    img = rng.randint(0, 256, size=(10, 10)).astype(np.uint8)
    parts = []
    for x0, y0, dx, dy, pw, ph in _adam7_pass_dims(10, 10):
        sub = img[y0::dy, x0::dx]
        for row in sub:
            filt = np.diff(np.concatenate([[0], row.astype(np.int64)])) & 0xFF
            parts.append(b"\x01" + filt.astype(np.uint8).tobytes())
    import struct as _struct

    from openeo_geotrellis_extensions_spark.sinks.png import _chunk

    ihdr = _struct.pack(">IIBBBBB", 10, 10, 8, 0, 0, 0, 1)
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png_bytes(buf), img)


def test_save_png_from_cube(spark, tmp_path):
    cube = constant_cube(spark, LAYOUT, band_values=[50], cell_type="uint8ud255")
    p = save_png(cube, str(tmp_path / "c.png"))
    img = read_png(p)
    assert img.shape == (16, 16)
    assert (img == 127).all()  # 50 in 0..100 -> 127.5 clipped


def test_timeseries_csv_reference_header(spark, tmp_path):
    """CSV header must be date,feature_index,<band labels>
    (AggregateSpatialTest.scala:220)."""
    cube = constant_cube(spark, LAYOUT, band_values=[10, None], cell_type="uint8ud255",
                         band_names=("TestRed", "TestGreen"))
    feats = spark.createDataFrame(
        [(0, json.dumps({"type": "Polygon", "coordinates":
                         [[[0.2, 0.2], [1.8, 0.2], [1.8, 1.8], [0.2, 1.8], [0.2, 0.2]]]}))],
        ["feature_index", "geojson"],
    )
    stats = aggregate_spatial(cube, feats)
    p = save_timeseries_csv(stats, str(tmp_path / "ts.csv"), ["TestRed", "TestGreen"])
    lines = open(p).read().strip().split("\n")
    assert lines[0] == "date,feature_index,TestRed,TestGreen"
    assert len(lines) == 1 + len(DATES)
    first = lines[1].split(",")
    assert first[0] == DATES[0] and float(first[2]) == 10.0
    assert first[3] == ""  # nodata band -> empty cell


def test_save_samples_netcdf(spark, tmp_path):
    """Samples sink emits real classic-netCDF (CDF-1) files per feature
    (NetCDFRDDWriter.saveSamples parity), written by executors."""
    from openeo_geotrellis_extensions_spark.sinks.netcdf import read_netcdf

    cube = arithmetic_cube(spark, LAYOUT, n_bands=2, cell_type="int32")
    feats = spark.createDataFrame(
        [(0, json.dumps({"type": "Polygon", "coordinates":
                         [[[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.8], [0.2, 0.2]]]})),
         (1, json.dumps({"type": "Polygon", "coordinates":
                         [[[0.2, 0.2], [1.8, 0.2], [1.8, 1.8], [0.2, 1.8], [0.2, 0.2]]]}))],
        ["feature_index", "geojson"],
    )
    idx = save_samples(cube, feats, str(tmp_path / "samples"))
    assert len(idx) == 2
    pa = idx[idx.feature_index == 0].iloc[0]["path"]
    assert pa.endswith(".nc") and open(pa, "rb").read(4) == b"CDF\x01"
    a, coords_a = read_netcdf(pa)
    assert a.shape == (4, 2, 8, 8)  # 4 dates, 2 bands, 1 tile
    assert coords_a["bands"] == ["band0", "band1"]
    b, _ = read_netcdf(idx[idx.feature_index == 1].iloc[0]["path"])
    assert b.shape == (4, 2, 16, 16)  # 2x2 tiles


def test_netcdf_roundtrip_and_cube_reload(spark, tmp_path):
    """write_netcdf/read_netcdf round-trip NaN + values exactly (float32);
    save_netcdf -> load_netcdf reloads the SAME cube pixel plane (the
    NetCDFCollection source seam, layers/NetCDFCollection.scala:118)."""
    from openeo_geotrellis_extensions_spark.sinks.netcdf import (
        load_netcdf,
        read_netcdf,
        save_netcdf,
        write_netcdf,
    )

    rng = np.random.RandomState(7)
    data = rng.rand(2, 1, 8, 8).astype(np.float32).astype(np.float64) * 50
    data = np.float32(data).astype(np.float64)
    data[0, 0, 0, :3] = np.nan
    p = str(tmp_path / "rt.nc")
    write_netcdf(p, data, {"t": ["2017-01-01", "2017-01-15"],
                           "x": np.arange(8) + 0.5, "y": 8 - np.arange(8) - 0.5})
    back, coords = read_netcdf(p)
    np.testing.assert_array_equal(back, data)
    assert coords["t"][0] == np.datetime64("2017-01-01") .astype("datetime64[s]").astype(float)

    cube = arithmetic_cube(spark, LAYOUT, n_bands=2, cell_type="int32")
    p2 = str(tmp_path / "cube.nc")
    save_netcdf(cube, p2)
    re = load_netcdf(spark, p2, LAYOUT)
    from openeo_geotrellis_extensions_spark.core.tiles import decode_tile_float

    want = {}
    for r in cube.df.collect():
        stack = decode_tile_float(list(r.bands), cube.meta.cell_type, (8, 8))
        want[(str(r.time), r.col, r.row)] = stack
    for r in re.df.collect():
        got = decode_tile_float(list(r.bands), re.meta.cell_type, (8, 8))
        np.testing.assert_array_equal(got, want[(str(r.time), r.col, r.row)])


def test_save_geojson(spark, tmp_path):
    feats = spark.createDataFrame(
        [(0, '{"type": "Point", "coordinates": [4.0, 51.0]}', 12.5)],
        ["feature_index", "geojson", "mean"],
    )
    p = save_geojson(feats, str(tmp_path / "f.geojson"))
    fc = json.load(open(p))
    assert fc["type"] == "FeatureCollection"
    assert fc["features"][0]["geometry"]["type"] == "Point"
    assert fc["features"][0]["properties"]["mean"] == 12.5


def test_geotiff_deflate_multistrip_roundtrip(tmp_path):
    """Deflate-compressed, multi-strip tiff (reference default,
    geotiff/package.scala:133) round-trips exactly and is smaller than
    uncompressed for repetitive data."""
    from openeo_geotrellis_extensions_spark.core.grid import Extent
    from openeo_geotrellis_extensions_spark.sinks.geotiff import (
        read_geotiff,
        write_geotiff,
    )

    rng = np.random.RandomState(3)
    bands = (rng.rand(2, 100, 40) * 50).astype(np.int32)
    bands[:, 40:] = 7  # compressible block
    ext = Extent(0.0, 0.0, 4.0, 10.0)
    pc = str(tmp_path / "c.tif")
    pu = str(tmp_path / "u.tif")
    write_geotiff(pc, bands, ext, nodata=255, rows_per_strip=32)  # 4 strips
    write_geotiff(pu, bands, ext, nodata=255, compression="none", rows_per_strip=32)
    back, ext2, nd = read_geotiff(pc)
    np.testing.assert_array_equal(back, bands)
    assert ext2 == ext and nd == 255
    back_u, _, _ = read_geotiff(pu)
    np.testing.assert_array_equal(back_u, bands)
    import os as _os

    assert _os.path.getsize(pc) < _os.path.getsize(pu)


def test_save_sample_geotiffs(spark, tmp_path):
    """saveSamples-as-GeoTIFF (geotiff/package.scala:748-827): one tiff per
    (feature, date), written by executors, round-trips values + extent."""
    from openeo_geotrellis_extensions_spark.sinks.geotiff import (
        read_geotiff,
        save_sample_geotiffs,
    )

    cube = arithmetic_cube(spark, LAYOUT, n_bands=2, cell_type="int32")
    feats = spark.createDataFrame(
        [(0, json.dumps({"type": "Polygon", "coordinates":
                         [[[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.8], [0.2, 0.2]]]}))],
        ["feature_index", "geojson"],
    )
    idx = save_sample_geotiffs(cube, feats, str(tmp_path / "tiffs"))
    assert len(idx) == len(DATES)  # one per date for the single feature
    p = idx[idx.date == DATES[0]].iloc[0]["path"]
    bands, ext, nd = read_geotiff(p)
    assert bands.shape == (2, 8, 8)  # one tile covers the rect
    assert ext == Extent(0.0, 0.0, 1.0, 1.0)  # tile (0,1): rect y<1 is row 1


def test_geotiff_overviews(tmp_path):
    """overviews=True chains reduced-resolution IFDs (2x nearest subsample,
    NewSubfileType=1) — geotiff/package.scala:223,354 optional overviews."""
    from openeo_geotrellis_extensions_spark.core.grid import Extent
    from openeo_geotrellis_extensions_spark.sinks.geotiff import (
        read_geotiff,
        read_geotiff_levels,
        write_geotiff,
    )

    rng = np.random.RandomState(11)
    bands = (rng.rand(1, 128, 128) * 200).astype(np.uint8)
    ext = Extent(0.0, 0.0, 4.0, 4.0)
    p = str(tmp_path / "ov.tif")
    write_geotiff(p, bands, ext, nodata=255, overviews=True)
    levels = read_geotiff_levels(p)
    assert [lv[0].shape for lv in levels] == [(1, 128, 128), (1, 64, 64), (1, 32, 32)]
    np.testing.assert_array_equal(levels[0][0], bands)
    np.testing.assert_array_equal(levels[1][0], bands[:, ::2, ::2])
    for lv in levels:
        assert lv[1] == ext and lv[2] == 255  # same georeferencing each level
    full, ext2, nd = read_geotiff(p)  # plain reader sees full res only
    np.testing.assert_array_equal(full, bands)


def test_cdf1_property_roundtrip():
    """Property test for the from-scratch CDF-1 codec: random dim sizes,
    dtypes, attribute mixes, and odd (non-4-multiple) payload lengths
    round-trip exactly."""
    from hypothesis import given, settings, strategies as st

    from openeo_geotrellis_extensions_spark.sinks.netcdf_format import (
        NcVar,
        read_cdf1,
        write_cdf1,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        ny=st.integers(1, 7),
        nx=st.integers(1, 9),
        nc_type=st.sampled_from(["int", "float", "double"]),
        seed=st.integers(0, 2**31 - 1),
        gname=st.text("abcdefgh_", min_size=1, max_size=11),
    )
    def case(ny, nx, nc_type, seed, gname):
        import tempfile

        rng = np.random.RandomState(seed)
        raw = rng.rand(ny, nx) * 100 - 50
        dt = {"int": np.int32, "float": np.float32, "double": np.float64}[nc_type]
        data = raw.astype(dt)
        atts = {"str_att": gname, "num_att": float(seed % 97), "vec_att": [1, 2, 3]}
        with tempfile.NamedTemporaryFile(suffix=".nc") as f:
            write_cdf1(
                f.name,
                [("y", ny), ("x", nx)],
                [
                    NcVar("y", "double", ["y"], np.arange(ny, dtype=np.float64)),
                    NcVar("v", nc_type, ["y", "x"], data, atts),
                ],
                {"title": gname},
            )
            back = read_cdf1(f.name)
        assert back["dims"] == [("y", ny), ("x", nx)]
        assert back["gatts"]["title"] == gname
        v = back["vars"]["v"]
        np.testing.assert_array_equal(np.asarray(v["data"], dtype=dt), data)
        assert v["atts"]["str_att"] == gname
        assert v["atts"]["num_att"] == float(seed % 97)
        np.testing.assert_array_equal(v["atts"]["vec_att"], [1, 2, 3])

    case()


def test_sparse_key_set_keeps_georeferencing(spark, tmp_path):
    """A gap in the tile key set (interior all-nodata tile dropped upstream)
    must stay a nodata hole — tiles past the gap keep their true geographic
    position in both the GeoTIFF and netCDF sinks (round-2 review finding)."""
    from pyspark.sql import functions as F

    from openeo_geotrellis_extensions_spark.sinks.geotiff import (
        read_geotiff,
        save_sample_geotiffs,
    )
    from openeo_geotrellis_extensions_spark.sinks.netcdf import (
        read_netcdf,
        save_samples,
    )

    wide = LayoutDefinition(Extent(0.0, 0.0, 3.0, 1.0), 3, 1, 8, 8)
    cube = arithmetic_cube(spark, wide, n_bands=1, cell_type="int32")
    gap = type(cube)(cube.df.where(F.col("col") != 1), cube.meta)  # drop col 1
    feats = spark.createDataFrame(
        [(0, json.dumps({"type": "Polygon", "coordinates":
                         [[[0.1, 0.1], [2.9, 0.1], [2.9, 0.9], [0.1, 0.9], [0.1, 0.1]]]}))],
        ["feature_index", "geojson"],
    )
    idx = save_sample_geotiffs(gap, feats, str(tmp_path / "tiffs"))
    bands, ext, nd = read_geotiff(idx.iloc[0]["path"])
    assert bands.shape == (1, 8, 24)          # full col 0..2 span, not collapsed
    assert ext == Extent(0.0, 0.0, 3.0, 1.0)
    assert (bands[0, :, 8:16] == nd).all()    # the gap is nodata
    assert not (bands[0, :, 16:24] == nd).all()  # col 2 data at its true x

    idx2 = save_samples(gap, feats, str(tmp_path / "ncs"))
    data, coords = read_netcdf(idx2.iloc[0]["path"])
    assert data.shape[-1] == 24
    assert np.isnan(data[0, 0, :, 8:16]).all()
    assert coords["x"][16] == 2.0 + 0.5 * (1.0 / 8)  # col-2 pixel 0 true center


def test_sample_shapes_consistent_when_boundary_tile_missing_one_date(spark, tmp_path):
    """A BOUNDARY tile dropped for one date only must not shrink that date's
    sample: all per-date files share the feature's full shape and extent
    (second-pass review finding)."""
    from pyspark.sql import functions as F

    from openeo_geotrellis_extensions_spark.sinks.geotiff import (
        read_geotiff,
        save_sample_geotiffs,
    )

    wide = LayoutDefinition(Extent(0.0, 0.0, 3.0, 1.0), 3, 1, 8, 8)
    cube = arithmetic_cube(spark, wide, n_bands=1, cell_type="int32")
    # drop the WESTMOST tile (col 0) on the first date only
    holed = type(cube)(
        cube.df.where(
            ~((F.col("col") == 0) & (F.to_date("time") == DATES[0]))
        ),
        cube.meta,
    )
    feats = spark.createDataFrame(
        [(0, json.dumps({"type": "Polygon", "coordinates":
                         [[[0.1, 0.1], [2.9, 0.1], [2.9, 0.9], [0.1, 0.9], [0.1, 0.1]]]}))],
        ["feature_index", "geojson"],
    )
    idx = save_sample_geotiffs(holed, feats, str(tmp_path / "tiffs"))
    assert len(idx) == len(DATES)
    shapes, extents = set(), set()
    for _, row in idx.iterrows():
        bands, ext, nd = read_geotiff(row["path"])
        shapes.add(bands.shape)
        extents.add(ext)
        if row["date"] == DATES[0]:
            assert (bands[0, :, 0:8] == nd).all()  # hole stays nodata
    assert shapes == {(1, 8, 24)} and extents == {Extent(0.0, 0.0, 3.0, 1.0)}


def test_netcdf_splittable_header_and_window(spark, tmp_path):
    """The distributed NetCDF source: the driver parses ONLY the header;
    per-(t, y-strip) executor window reads return byte-identical slices of
    the full array, and the load_netcdf plan is a distributed mapInPandas
    over a Range of tasks (no driver-side tile materialization)."""
    from openeo_geotrellis_extensions_spark.sinks.netcdf import (
        load_netcdf,
        read_netcdf,
        save_netcdf,
    )
    from openeo_geotrellis_extensions_spark.sinks.netcdf_format import (
        read_cdf1_header,
        read_cdf1_window,
    )

    cube = arithmetic_cube(spark, LAYOUT, n_bands=2, cell_type="int32")
    p = str(tmp_path / "cube.nc")
    save_netcdf(cube, p)

    hdr = read_cdf1_header(p)
    bands = [n for n in hdr["vars"] if n not in ("t", "x", "y")]
    assert len(bands) == 2
    full, coords = read_netcdf(p)
    nt, nb, ny, nx = full.shape
    fill = np.float64(np.float32(hdr["vars"][bands[0]]["atts"]["_FillValue"]))
    for ti in range(nt):
        for y0 in range(0, ny, 8):
            strip = read_cdf1_window(p, hdr["vars"][bands[0]], (ti,), y0, 8)
            strip = strip.astype(np.float64)
            strip = np.where(strip == fill, np.nan, strip)
            np.testing.assert_array_equal(strip, full[ti, 0, y0 : y0 + 8, :])

    out = load_netcdf(spark, p, LAYOUT)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Range" in plan, plan
    assert "LocalTableScan" not in plan  # no driver-side materialization


def test_geotiff_splittable_header_and_strips(spark, tmp_path):
    """Splittable GeoTIFF read: header-only IFD parse exposes strip byte
    ranges; per-strip reads concatenate to the full image; load_geotiff's
    plan is a distributed mapInPandas over Range (no driver materialize)."""
    from openeo_geotrellis_extensions_spark.sinks.geotiff import (
        load_geotiff,
        read_geotiff,
        read_geotiff_header,
        read_geotiff_strip,
        save_stitched_geotiff,
    )

    cube = arithmetic_cube(spark, LAYOUT, n_bands=2, cell_type="float64")
    p = str(tmp_path / "cube.tif")
    save_stitched_geotiff(cube, p, rows_per_strip=8)

    meta = read_geotiff_header(p)
    assert meta["nb"] == 2 and meta["rows_per_strip"] == 8
    assert len(meta["offs"]) == meta["h"] // 8
    full, extent, nodata = read_geotiff(p)
    got = np.concatenate(
        [read_geotiff_strip(p, meta, s) for s in range(len(meta["offs"]))], axis=0
    )
    np.testing.assert_array_equal(np.transpose(got, (2, 0, 1)), full)

    out = load_geotiff(spark, p, LAYOUT)
    assert out.meta.temporal is False
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Range" in plan and "LocalTableScan" not in plan
    # pixel equality vs the in-memory reader (nodata -> NaN)
    from openeo_geotrellis_extensions_spark.core.tiles import decode_tile_float
    fullf = full.astype(np.float64)
    for r in out.df.collect():
        stack = decode_tile_float(list(r.bands), "float64", (8, 8))
        for b in range(2):
            want = fullf[b, r.row * 8 : (r.row + 1) * 8, r.col * 8 : (r.col + 1) * 8]
            got_t = stack[b]
            both = ~(np.isnan(want) & np.isnan(got_t))
            np.testing.assert_array_equal(got_t[both], want[both])


class TestJpegCodec:
    """From-scratch baseline JPEG (sinks/jpeg.py): round-trip PSNR floors,
    odd sizes, grayscale + RGB, restart-marker decode, error paths."""

    @staticmethod
    def _psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)

    def test_roundtrip_gray_psnr(self):
        from openeo_geotrellis_extensions_spark.sinks.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = (np.add.outer(np.arange(16), np.arange(16)) * 8).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert self._psnr(img, dec) >= 35

    def test_roundtrip_rgb_odd_dims(self):
        from openeo_geotrellis_extensions_spark.sinks.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = np.zeros((24, 17, 3), np.uint8)
        img[..., 0] = np.linspace(0, 255, 24)[:, None]
        img[..., 1] = np.linspace(0, 255, 17)[None, :]
        img[..., 2] = 128
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert dec.shape == img.shape
        assert self._psnr(img, dec) >= 30

    def test_roundtrip_noise_high_quality(self):
        from openeo_geotrellis_extensions_spark.sinks.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (32, 32), dtype=np.uint8).astype(np.uint8)
        assert self._psnr(img, decode_jpeg(encode_jpeg(img, quality=95))) >= 35

    def test_flat_image_exact(self):
        from openeo_geotrellis_extensions_spark.sinks.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        img = np.full((8, 8), 200, np.uint8)
        np.testing.assert_array_equal(decode_jpeg(encode_jpeg(img, 90)), img)

    def test_quality_monotonic(self):
        from openeo_geotrellis_extensions_spark.sinks.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (24, 24), dtype=np.uint8).astype(np.uint8)
        p_lo = self._psnr(img, decode_jpeg(encode_jpeg(img, 30)))
        p_hi = self._psnr(img, decode_jpeg(encode_jpeg(img, 95)))
        assert p_hi > p_lo
        assert len(encode_jpeg(img, 30)) < len(encode_jpeg(img, 95))

    def test_rejects_non_jpeg_and_progressive(self):
        import pytest as _pytest

        from openeo_geotrellis_extensions_spark.sinks.jpeg import decode_jpeg

        with _pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG not a jpeg")
        # synthesize SOI + SOF2 (progressive) header
        bad = b"\xff\xd8" + b"\xff\xc2" + b"\x00\x0b" + b"\x08\x00\x10\x00\x10\x01\x01\x11\x00"
        with _pytest.raises(ValueError, match="baseline"):
            decode_jpeg(bad)

    def test_decode_seam_dispatch(self):
        from openeo_geotrellis_extensions_spark.pipeline.multimodal import (
            decode_image,
        )
        from openeo_geotrellis_extensions_spark.sinks.jpeg import encode_jpeg

        img = (np.add.outer(np.arange(16), np.arange(16)) * 4).astype(np.uint8)
        dec = decode_image(encode_jpeg(img, 90), "jpeg")
        assert dec.shape == img.shape


def _craft_420_jpeg(rgb, quality=90):
    """Hand-build a 4:2:0 subsampled JPEG from jpeg.py's own primitives —
    the module's encoder writes 4:4:4 only, so this exercises the decoder's
    generic MCU interleave + chroma upsample path."""
    import struct

    from openeo_geotrellis_extensions_spark.sinks import jpeg as J

    h, w = rgb.shape[:2]
    assert h % 16 == 0 and w % 16 == 0
    r, g, b = [rgb[..., i].astype(np.float64) for i in range(3)]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    cb2 = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr2 = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    q_lum = J._scaled_quant(J._Q_LUM, quality)
    q_chr = J._scaled_quant(J._Q_CHROM, quality)

    def qblocks(plane, q):
        blocks = J._blockify(plane - 128.0)
        coeffs = np.einsum("ij,njk,lk->nil", J._DCT, blocks, J._DCT)
        return np.round(coeffs / q).astype(np.int32).reshape(-1, 64)[:, J.ZIGZAG]

    yb, cbb, crb = qblocks(y, q_lum), qblocks(cb2, q_chr), qblocks(cr2, q_chr)
    ybw, cbw = w // 8, w // 16
    mcux, mcuy = w // 16, h // 16
    dc_l, ac_l = J._canonical_codes(*J._DC_LUM), J._canonical_codes(*J._AC_LUM)
    dc_c, ac_c = J._canonical_codes(*J._DC_CHROM), J._canonical_codes(*J._AC_CHROM)
    wtr = J._BitWriter()
    prev = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):
                for bx in range(2):
                    bi = (my * 2 + by) * ybw + (mx * 2 + bx)
                    prev[0] = J._encode_plane_blocks(yb[bi:bi + 1], wtr, dc_l, ac_l, prev[0])
            for plane, ci in ((cbb, 1), (crb, 2)):
                bi = my * cbw + mx
                prev[ci] = J._encode_plane_blocks(plane[bi:bi + 1], wtr, dc_c, ac_c, prev[ci])
    entropy = wtr.flush()
    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate((q_lum, q_chr)):
        zz = q.reshape(-1)[J.ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tc_th, tab in ((0x00, J._DC_LUM), (0x10, J._AC_LUM),
                       (0x01, J._DC_CHROM), (0x11, J._AC_CHROM)):
        payload = bytes([tc_th]) + bytes(tab[0]) + bytes(tab[1])
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out += entropy + b"\xff\xd9"
    return bytes(out)


def test_jpeg_420_subsampled_decode():
    from openeo_geotrellis_extensions_spark.sinks.jpeg import decode_jpeg

    rgb = np.zeros((32, 32, 3), np.uint8)
    rgb[..., 0] = np.linspace(10, 240, 32)[:, None]
    rgb[..., 1] = np.linspace(240, 10, 32)[None, :]
    rgb[..., 2] = 96
    dec = decode_jpeg(_craft_420_jpeg(rgb))
    assert dec.shape == rgb.shape
    mse = np.mean((rgb.astype(float) - dec.astype(float)) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) >= 30


def test_jpeg_roundtrip_property():
    """Hypothesis: any small uint8 image survives encode->decode with
    bounded error at quality 95 (max abs error under quant-table ceiling)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from openeo_geotrellis_extensions_spark.sinks.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    @settings(max_examples=20, deadline=None)
    @given(
        arrays(np.uint8, st.tuples(st.integers(1, 24), st.integers(1, 24))),
    )
    def inner(img):
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        if img.size >= 4:
            mse = np.mean((img.astype(float) - dec.astype(float)) ** 2)
            if mse > 0:
                assert 10 * np.log10(255 ** 2 / mse) >= 25

    inner()


def test_jpeg_fill_bytes_before_marker():
    """0xFF fill bytes before a marker are legal (T.81 B.1.1.2) and must be
    skipped."""
    from openeo_geotrellis_extensions_spark.sinks.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = (np.add.outer(np.arange(16), np.arange(16)) * 7).astype(np.uint8)
    data = encode_jpeg(img, 90)
    # inject fill bytes before the SOF0 marker
    i = data.index(b"\xff\xc0")
    padded = data[:i] + b"\xff\xff\xff" + data[i:]
    dec = decode_jpeg(padded)
    assert dec.shape == img.shape
