"""Read-seam hardening (runtime/ioretry.py) — retry-with-backoff and the
read-full-asset heuristic, mirroring FileLayerProvider.scala:68-79,142-157."""

import numpy as np
import pytest

from openeo_geotrellis_extensions_spark.runtime.ioretry import (
    dense_cover_fraction,
    with_retries,
)
from openeo_geotrellis_extensions_spark.sources.catalog import (
    product_rect_values,
    product_tile_values,
)


def test_retry_succeeds_after_transient_failures():
    calls = {"n": 0}
    retry_log = []
    sleeps = []

    def flaky(x):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise IOError(f"transient {calls['n']}")
        return x * 2

    wrapped = with_retries(
        flaky,
        retries=4,
        backoff_s=0.05,
        sleep=sleeps.append,
        on_retry=lambda i, ex: retry_log.append((i, str(ex))),
    )
    assert wrapped(21) == 42
    assert calls["n"] == 3
    assert retry_log == [(0, "transient 1"), (1, "transient 2")]
    assert sleeps == [0.05, 0.1]  # exponential backoff


def test_retry_exhaustion_raises_last_error():
    def always_fails():
        raise OSError("down")

    wrapped = with_retries(always_fails, retries=3, sleep=lambda _: None)
    with pytest.raises(OSError, match="down"):
        wrapped()


def test_retry_does_not_mask_programming_errors():
    def bug():
        raise ValueError("not transient")

    calls = []
    wrapped = with_retries(bug, retries=5, sleep=calls.append)
    with pytest.raises(ValueError):
        wrapped()
    assert calls == []  # no retry, no sleep


def test_dense_cover_fraction():
    assert dense_cover_fraction([(0, 0), (1, 0), (0, 1), (1, 1)], 0, 0, 1, 1) == 1.0
    assert dense_cover_fraction([(0, 0)], 0, 0, 1, 1) == 0.25
    assert dense_cover_fraction([(0, 0), (0, 0)], 0, 0, 0, 0) == 1.0  # dedup


def test_rect_read_matches_window_reads():
    """product_rect_values (the one-full-read path) must be byte-identical
    to tiling product_tile_values over the same keys — the heuristic changes
    IO shape, never pixels."""
    size = 16
    for p in (0, 3, 11):
        for b in range(2):
            full = product_rect_values(p, 2, 5, 3, 2, b, size)
            for dc in range(3):
                for dr in range(2):
                    win = product_tile_values(p, 2 + dc, 5 + dr, b, size)
                    np.testing.assert_array_equal(
                        full[dr * size : (dr + 1) * size, dc * size : (dc + 1) * size],
                        win,
                    )


def test_per_product_strategies_identical_with_heuristic(spark):
    """The read-full heuristic kicks in for dense covers (a bbox request IS
    a dense rect) — per_product output must remain byte-identical to
    per_key (the round-2 equivalence guarantee survives the new IO path)."""
    from openeo_geotrellis_extensions_spark.core.grid import (
        Extent,
        LayoutDefinition,
    )
    from openeo_geotrellis_extensions_spark.sources.catalog import (
        load_collection,
        synth_catalog,
    )

    layout = LayoutDefinition(Extent(-180.0, -90.0, 180.0, 90.0), 36, 18, 8, 8)
    bbox = Extent(-30.0, -20.0, 30.0, 20.0)
    cat = synth_catalog(spark, 64)
    a = load_collection(cat, layout, bbox, n_bands=2, strategy="per_key")
    b = load_collection(cat, layout, bbox, n_bands=2, strategy="per_product")
    rows_a = {
        (str(r.time), r.col, r.row): [bytes(x) for x in r.bands]
        for r in a.df.collect()
    }
    rows_b = {
        (str(r.time), r.col, r.row): [bytes(x) for x in r.bands]
        for r in b.df.collect()
    }
    assert rows_a == rows_b


def test_png_decode_all_filter_types():
    """decode_png_bytes unfilters ALL spec filter types (0-4), not just the
    writer's own filter-0 output — a test-local forward filter produces the
    encoded scanlines per the PNG spec, the decoder must invert them."""
    import struct
    import zlib

    from openeo_geotrellis_extensions_spark.sinks.png import (
        _chunk,
        _paeth,
        decode_png_bytes,
        encode_png_bytes,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)

    # forward-filter each row with a different filter type (spec 4.5.4)
    raws = []
    prev = np.zeros(7, dtype=np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[y].astype(np.int64)
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - np.concatenate([[0], cur[:-1]])) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([[0], cur[:-1]])
            enc = (cur - (left + prev) // 2) & 0xFF
        else:
            enc = cur.copy()
            for i in range(7):
                a = cur[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                enc[i] = (cur[i] - _paeth(int(a), int(b), int(c))) & 0xFF
        raws.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 7, 5, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png_bytes(png), img)

    # bytes-level round trip (gray + RGB)
    np.testing.assert_array_equal(decode_png_bytes(encode_png_bytes(img)), img)
    rgb = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png_bytes(encode_png_bytes(rgb)), rgb)


def test_decode_image_png_and_media_decode(spark):
    """decode_image('png') is real; media_decode_features equals
    media_features (the codec round-trip changes no pixel)."""
    from openeo_geotrellis_extensions_spark.pipeline.multimodal import (
        decode_image,
        fetch_media,
        media_decode_features,
        media_features,
    )
    from openeo_geotrellis_extensions_spark.sinks.png import encode_png_bytes
    from openeo_geotrellis_extensions_spark.sources.interleaved import synth_docs

    img = (np.arange(48, dtype=np.uint8) * 5 % 251).reshape(6, 8)
    np.testing.assert_array_equal(decode_image(encode_png_bytes(img), "png"), img)
    # JPEG is REAL now too (sinks/jpeg.py) — truncated input is a format
    # error; only formats with no codec in this env raise the honest stub
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"\xff\xd8\xff", "jpeg")
    with pytest.raises(NotImplementedError):
        decode_image(b"...", "webp")

    docs = synth_docs(spark, 40)
    media = fetch_media(docs)
    plain = media_features(media).toPandas().sort_values(
        ["doc_id", "span_idx"]).reset_index(drop=True)
    via_png = media_decode_features(media).toPandas().sort_values(
        ["doc_id", "span_idx"]).reset_index(drop=True)
    pd_testing = __import__("pandas").testing
    pd_testing.assert_frame_equal(plain, via_png)


def test_resize_image_nodata_box():
    from openeo_geotrellis_extensions_spark.pipeline.multimodal import resize_image

    img = np.array(
        [[10, 20, 255, 255],
         [30, 40, 255, 255],
         [255, 1, 2, 3],
         [5, 7, 4, 255]], dtype=np.uint8)
    out = resize_image(img, factor=2, nodata=255)
    assert out.shape == (2, 2)
    assert out[0, 0] == 25.0          # full block mean
    assert np.isnan(out[0, 1])        # all-nodata block -> NaN
    assert out[1, 0] == (1 + 5 + 7) / 3
    assert out[1, 1] == 3.0
    with pytest.raises(ValueError):
        resize_image(img[:3], factor=2)


def test_stream_static_enriched_stats(spark, tmp_path):
    """Broadcast stream-static join + windowed agg equals batch SQL."""
    import duckdb

    from openeo_geotrellis_extensions_spark.streaming.events import (
        run_stream_to_memory,
        stream_static_enriched_stats,
    )

    d = tmp_path / "ev_join"
    d.mkdir()
    import shutil
    shutil.copy("/root/testdata/sf0.01/events.parquet", d)
    dim = spark.createDataFrame(
        [("click", 2.0), ("view", 0.5)], ["event_type", "weight"]
    )
    out = run_stream_to_memory(
        stream_static_enriched_stats(spark, str(d), dim), name="t_join"
    ).toPandas()
    want = duckdb.connect().execute(
        "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_start, "
        "event_type, COUNT(*) AS n, "
        "ROUND(SUM(value * CASE event_type WHEN 'click' THEN 2.0 ELSE 0.5 END), 4) AS wsum "
        "FROM read_parquet('/root/testdata/sf0.01/events.parquet') "
        "WHERE event_type IN ('click','view') GROUP BY 1, 2"
    ).df()
    o = out.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    w = want.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    assert len(o) == len(w)
    assert (o["n"].astype(int).values == w["n"].astype(int).values).all()
    assert np.allclose(o["wsum"].values, w["wsum"].values)
