"""Catalog-driven load_collection — the FileLayerProvider analog.

Reference pipeline (layers/FileLayerProvider.scala:381-389, 1007-1180,
675-710; SURVEY §3.1):
  1. query the product catalog (OpenSearch/STAC) for features intersecting
     the bbox/time range;
  2. derive required tile keys from the request geometry (clipToGrid);
  3. join product footprints to keys (overlap resolution by footprint);
  4. push masks down as key semi-joins BEFORE reading pixels;
  5. read raster regions per key, drop all-nodata tiles.

Ours expresses 1-4 as DataFrame predicates/joins (Catalyst prunes the
catalog scan; the footprint->keys step reuses the quadtree cover) and step 5
as one mapInPandas whose "read" resolves deterministic synthetic pixels —
the seam where a real reader (GDAL window reads in the reference) plugs in.
Products are parquet rows; an Iceberg table would drop in unchanged (no
Iceberg runtime ships in this environment — the checkpoint manifest in
runtime/checkpoint.py is the commit-log analog).

``fixed_features_catalog`` doubles as the load_stac / FixedFeatures path
(file/FixedFeaturesOpenSearchClient.scala).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.celltype import parse_cell_type
from ..core.grid import Extent, LayoutDefinition
from ..operators.zonal import feature_tile_keys
from .datacube import CubeMeta, DataCube, cube_schema
from .interleaved import DATES


def synth_catalog(spark: SparkSession, n_products: int = 64) -> DataFrame:
    """Deterministic product catalog: rect footprints scattered over the
    world, one date + band set per product (the OpenSearch feature analog).
    Closed-form arithmetic -> SQL-oracle-able."""
    return spark.range(n_products).selectExpr(
        "format_string('prod_%04d', id) AS product_id",
        f"element_at(array({', '.join(repr(d) for d in DATES)}), CAST(id % 4 AS INT) + 1) AS date",
        # footprint: 30x20 deg rects tiling the world with drift
        "CAST(-180 + (id * 53) % 330 AS DOUBLE) AS xmin",
        "CAST(-85 + (id * 29) % 150 AS DOUBLE) AS ymin",
        "CAST(-180 + (id * 53) % 330 + 30 AS DOUBLE) AS xmax",
        "CAST(-85 + (id * 29) % 150 + 20 AS DOUBLE) AS ymax",
        "CAST(id AS INT) AS product_index",
    )


def fixed_features_catalog(spark: SparkSession, features: list[dict]) -> DataFrame:
    """load_stac fixed-feature list -> catalog DataFrame (FixedFeatures path)."""
    return spark.createDataFrame(
        [
            (
                f["product_id"],
                f["date"],
                float(f["bbox"][0]), float(f["bbox"][1]),
                float(f["bbox"][2]), float(f["bbox"][3]),
                i,
            )
            for i, f in enumerate(features)
        ],
        ["product_id", "date", "xmin", "ymin", "xmax", "ymax", "product_index"],
    )


def product_tile_values(
    product_index: int, col: int, row: int, band: int, size: int
) -> np.ndarray:
    """Deterministic 'read' of one product's pixels for one tile — the GDAL
    window-read seam. v = (p*7 + col*13 + row*17 + band*5 + py*3 + px) % 83,
    nodata where (p + px + py) % 19 == 0."""
    px = np.arange(size)[None, :]
    py = np.arange(size)[:, None]
    v = (product_index * 7 + col * 13 + row * 17 + band * 5 + py * 3 + px) % 83
    out = v.astype(np.uint8)
    out[(product_index + px + py) % 19 == 0] = 255
    return out


def product_rect_values(
    product_index: int, c0: int, r0: int, nc: int, nr: int, band: int, size: int
) -> np.ndarray:
    """ONE full read of an (nr x nc)-key rectangle of a product — the
    read-full-asset seam (FileLayerProvider.scala:142-157: when requested
    windows cover most of an asset, one range request + in-memory slicing
    beats per-window reads). Returns (nr*size, nc*size) pixels
    byte-identical to tiling product_tile_values over the same keys."""
    px = np.arange(nc * size)[None, :]
    py = np.arange(nr * size)[:, None]
    col = c0 + px // size
    row = r0 + py // size
    tpx = px % size
    tpy = py % size
    v = (product_index * 7 + col * 13 + row * 17 + band * 5 + tpy * 3 + tpx) % 83
    out = v.astype(np.uint8)
    out[(product_index + tpx + tpy) % 19 == 0] = 255
    return out


#: requested-window cover fraction above which _read_per_product switches to
#: one full-rect read (the reference flips at ~50%)
READ_FULL_THRESHOLD = 0.5


CATALOG_CELL_TYPE = "uint8ud255"


def load_collection(
    catalog: DataFrame,
    layout: LayoutDefinition,
    bbox: Extent,
    time_range: tuple[str, str] | None = None,
    n_bands: int = 2,
    mask_keys: DataFrame | None = None,
    strategy: str = "per_key",
) -> DataCube:
    """Catalog -> datacube for a bbox/time request. Overlapping products on
    the same (date, key) resolve by LOWEST product_index filling nodata of
    earlier ones (the reference resolves by footprint distance,
    FileLayerProvider.scala:1129-1180 — ours is deterministic paint order).

    ``strategy`` mirrors the reference's two read strategies:
      - 'per_key' (rasterRegionsToTiles): group tasks per (date, key); each
        task opens every overlapping product for that key. Best when few
        products cover many keys each.
      - 'per_product' (rasterRegionsToTilesLoadPerProductStrategy,
        FileLayerProvider.scala:555-673): group tasks per (product, date) so
        each asset is OPENED ONCE, emitting per-key fragments, then a second
        grouped stage merges fragments per key in paint order. Best when
        product open cost dominates (remote files, archives)."""
    # 1. catalog pushdown: bbox intersect + time range as Column predicates
    cat = catalog.where(
        (F.col("xmin") < bbox.xmax) & (F.col("xmax") > bbox.xmin)
        & (F.col("ymin") < bbox.ymax) & (F.col("ymax") > bbox.ymin)
    )
    if time_range:
        cat = cat.where(
            (F.col("date") >= time_range[0]) & (F.col("date") < time_range[1])
        )

    # 2. requested keys ∩ product footprint keys (clipToGrid analog)
    feats = cat.select(
        "product_index",
        F.format_string(
            '{"type": "Polygon", "coordinates": [[[%s, %s], [%s, %s], [%s, %s], [%s, %s], [%s, %s]]]}',
            "xmin", "ymin", "xmax", "ymin", "xmax", "ymax", "xmin", "ymax", "xmin", "ymin",
        ).alias("geojson"),
    ).withColumnRenamed("product_index", "feature_index")
    pkeys = feature_tile_keys(feats, layout).withColumnRenamed(
        "feature_index", "product_index"
    )
    req = Extent(
        max(bbox.xmin, layout.extent.xmin), max(bbox.ymin, layout.extent.ymin),
        min(bbox.xmax, layout.extent.xmax), min(bbox.ymax, layout.extent.ymax),
    )
    # requested-key restriction as four Column predicates — a continental
    # bbox on a fine layout stays a filter, never a driver-side key table
    # (round-1 scale fix: no createDataFrame of millions of keys)
    c0, r0, c1, r1 = layout.key_bounds_for_extent(req)
    tasks = pkeys.where(
        F.col("col").between(c0, c1) & F.col("row").between(r0, r1)
    ).join(cat.select("product_index", "date"), "product_index")

    # 3. mask pushdown: drop keys before any pixel is read
    # (applySpatialMask, FileLayerProvider.scala:435-458)
    if mask_keys is not None:
        tasks = tasks.join(mask_keys, ["col", "row"], "left_semi")

    # 4. read + overlap resolve
    ct = parse_cell_type(CATALOG_CELL_TYPE)
    size = layout.tile_cols

    if strategy == "per_product":
        df = _read_per_product(tasks, layout, n_bands)
        df = df.where(F.expr("exists(bands, b -> length(b) > 0)"))
        names = tuple(f"B{b}" for b in range(n_bands))
        return DataCube(df, CubeMeta(layout, CATALOG_CELL_TYPE, names, temporal=True))
    if strategy != "per_key":
        raise ValueError(f"unknown read strategy {strategy!r}")

    def read_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..runtime.ioretry import with_retries

        # transient-error insurance around the window-read seam
        # (FileLayerProvider.scala:68-79) — inert for the synthetic reader,
        # load-bearing for a GDAL/object-store reader
        read_window = with_retries(product_tile_values)
        c = int(pdf["col"].iloc[0])
        r = int(pdf["row"].iloc[0])
        date = pdf["date"].iloc[0]
        bands_out = []
        for b in range(n_bands):
            acc = np.full((size, size), 255, dtype=np.uint8)
            for p in sorted(pdf["product_index"]):
                tile = read_window(int(p), c, r, b, size)
                fill = acc == 255
                acc[fill] = tile[fill]
            bands_out.append(acc.tobytes() if (acc != 255).any() else b"")
        return pd.DataFrame(
            [(pd.Timestamp(date), c, r, bands_out)],
            columns=["time", "col", "row", "bands"],
        )

    df = tasks.groupBy("date", "col", "row").applyInPandas(
        read_group, schema=cube_schema(True)
    )
    # 5. drop all-nodata tiles (FileLayerProvider.scala:708)
    df = df.where(F.expr("exists(bands, b -> length(b) > 0)"))
    names = tuple(f"B{b}" for b in range(n_bands))
    return DataCube(df, CubeMeta(layout, CATALOG_CELL_TYPE, names, temporal=True))


def _read_per_product(tasks: DataFrame, layout: LayoutDefinition, n_bands: int) -> DataFrame:
    """Load-per-product read strategy: stage 1 groups by (product, date) —
    ONE 'open' per asset, emitting a tile fragment per covered key with the
    product index attached; stage 2 merges fragments per (date, key) in
    paint order (lowest VALID product wins per pixel). Identical results to
    the per-key strategy; the shuffle moves encoded fragments instead of
    re-opening assets per key.

    MEMORY BOUND vs per-key: read_product materializes every fragment of one
    group in one pandas DataFrame, so groups are SPATIALLY CHUNKED — the
    grouping key includes (col // chunk_keys, row // chunk_keys), capping any
    group at chunk_keys^2 tiles x n_bands regardless of product footprint
    (a whole-AOI mosaic product costs ceil(n_keys/chunk^2) opens instead of
    one, the standard memory/open-count dial). Chunks are spatially coherent,
    which keeps the read-full-rect heuristic dense. Pick per-product when
    asset open cost dominates (remote COGs); per-key when products are
    opened cheaply."""
    size = layout.tile_cols
    chunk_keys = 8  # <= 64 tiles per group (chunk_keys^2)

    frag_schema = (
        "time timestamp, col int, row int, product_index int, bands array<binary>"
    )

    def read_product(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..runtime.ioretry import dense_cover_fraction, with_retries

        p = int(pdf["product_index"].iloc[0])
        date = pdf["date"].iloc[0]
        rows = []
        keys = sorted({(int(c), int(r)) for c, r in zip(pdf["col"], pdf["row"])})
        c0 = min(k[0] for k in keys); c1 = max(k[0] for k in keys)
        r0 = min(k[1] for k in keys); r1 = max(k[1] for k in keys)
        # read-full heuristic (FileLayerProvider.scala:142-157): when the
        # requested keys cover most of their bounding rect, ONE full-rect
        # read + slicing beats per-window reads (one range request vs many)
        if dense_cover_fraction(keys, c0, r0, c1, r1) > READ_FULL_THRESHOLD:
            read_rect = with_retries(product_rect_values)
            planes = [
                read_rect(p, c0, r0, c1 - c0 + 1, r1 - r0 + 1, b, size)
                for b in range(n_bands)
            ]
            for c, r in keys:
                ro, co = (r - r0) * size, (c - c0) * size
                bands = [
                    pl[ro : ro + size, co : co + size].tobytes() for pl in planes
                ]
                rows.append((pd.Timestamp(date), c, r, p, bands))
        else:
            # sparse cover: per-key window reads, each retried
            # (FileLayerProvider.scala:68-79)
            read_window = with_retries(product_tile_values)
            for c, r in keys:
                bands = [
                    read_window(p, c, r, b, size).tobytes()
                    for b in range(n_bands)
                ]
                rows.append((pd.Timestamp(date), c, r, p, bands))
        return pd.DataFrame(
            rows, columns=["time", "col", "row", "product_index", "bands"]
        )

    chunked = tasks.withColumn(
        "_chunk_c", (F.col("col") / chunk_keys).cast("int")
    ).withColumn("_chunk_r", (F.col("row") / chunk_keys).cast("int"))
    frags = chunked.groupBy(
        "product_index", "date", "_chunk_c", "_chunk_r"
    ).applyInPandas(read_product, schema=frag_schema)

    def merge_key(pdf: pd.DataFrame) -> pd.DataFrame:
        order = pdf.sort_values("product_index")
        bands_out = []
        for b in range(n_bands):
            acc = np.full((size, size), 255, dtype=np.uint8)
            for bufs in order["bands"]:
                tile = np.frombuffer(bufs[b], dtype=np.uint8).reshape(size, size)
                fill = acc == 255
                acc[fill] = tile[fill]
            bands_out.append(acc.tobytes() if (acc != 255).any() else b"")
        first = pdf.iloc[0]
        return pd.DataFrame(
            [(first["time"], int(first["col"]), int(first["row"]), bands_out)],
            columns=["time", "col", "row", "bands"],
        )

    return frags.groupBy("time", "col", "row").applyInPandas(
        merge_key, schema=cube_schema(True)
    )


def sampled_features(
    catalog: DataFrame, layout: LayoutDefinition, bbox: Extent
) -> DataFrame:
    """Product metadata keyed by (date, col, row) WITHOUT reading pixels —
    the FileRDDFactory.loadSpatialFeatureJsonRDD analog (file/FileRDDFactory.scala:58-140)
    used by sampling jobs."""
    cat = catalog.where(
        (F.col("xmin") < bbox.xmax) & (F.col("xmax") > bbox.xmin)
        & (F.col("ymin") < bbox.ymax) & (F.col("ymax") > bbox.ymin)
    )
    feats = cat.select(
        "product_index",
        F.format_string(
            '{"type": "Polygon", "coordinates": [[[%s, %s], [%s, %s], [%s, %s], [%s, %s], [%s, %s]]]}',
            "xmin", "ymin", "xmax", "ymin", "xmax", "ymax", "xmin", "ymax", "xmin", "ymin",
        ).alias("geojson"),
    ).withColumnRenamed("product_index", "feature_index")
    pkeys = feature_tile_keys(feats, layout).withColumnRenamed(
        "feature_index", "product_index"
    )
    return pkeys.join(cat, "product_index").select(
        "date", "col", "row", "product_id", "product_index"
    )
