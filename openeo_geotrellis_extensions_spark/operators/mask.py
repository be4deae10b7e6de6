"""mask / mask_polygon — per-pixel masking by a mask cube or polygons.

Reference: ``rasterMaskGeneric`` (DatacubeSupport.scala:191-243) = join cube
with mask + per-pixel replace (mask != 0 -> replacement/nodata); spatial-mask
key pruning drops whole keys whose mask tile has no valid pixel before any
decode (DatacubeSupport.scala:279-296, applySpatialMask
FileLayerProvider.scala:435-458). Polygon mask: groupAndMaskByGeometry
(OpenEOProcesses.scala:324-386) / TiledRasterLayer.scala:86-126.

Ours: left join on key columns (mask side broadcast when small via AQE),
np.where inside one mapInPandas; the key-pruning pushdown is a left-semi join
on the mask's non-empty keys — pure DataFrame, runs before tile decode.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..core.celltype import parse_cell_type
from ..core.geom import parse_geometry, rasterize
from ..core.tiles import decode_tile_float, encode_band
from ..sources.datacube import DataCube
from .zonal import feature_tile_keys


def mask(
    cube: DataCube,
    mask_cube: DataCube,
    replacement: float | None = None,
    prune_keys: bool = True,
) -> DataCube:
    """Pixels where mask band0 != 0 (or mask is nodata) become
    ``replacement`` (None = nodata). Mask tile absent -> data unchanged
    (left join, rasterMaskGeneric semantics).

    ``prune_keys``: additionally drop cube keys whose mask tile exists and is
    ENTIRELY masked — the reference's applySpatialMask pushdown — via an
    anti-join on keys, before any data-tile decode. Keys with no mask tile
    are unaffected by pruning."""
    if mask_cube.meta.layout != cube.meta.layout:
        raise ValueError("mask requires identical layouts (resample the mask first)")
    keys = [k for k in cube.key_cols if k in mask_cube.df.columns]
    ct = cube.meta.cell_type
    mct = mask_cube.meta.cell_type
    shape = cube.meta.tile_shape
    out_ct = parse_cell_type(ct)

    m = mask_cube.df.select(*keys, F.col("bands").alias("mask_bands"))
    joined = cube.df
    if prune_keys:
        # pushdown: drop cube keys whose mask tile is FULLY masked (no zero
        # pixel) via anti-join — keys with no mask tile at all are kept, so
        # the reference's "mask absent -> data unchanged" left-join semantics
        # (DatacubeSupport.scala:191-243) still hold after pruning
        def fully_masked(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                rows = []
                for i, mb in enumerate(pdf["mask_bands"]):
                    stack = decode_tile_float([mb[0]], mct, shape)
                    if not (np.nan_to_num(stack[0], nan=1.0) == 0).any():
                        rows.append(i)
                yield pdf.iloc[rows][[*keys]]

        dead = m.mapInPandas(
            fully_masked, schema=m.select(*keys).schema
        )
        joined = joined.join(dead, keys, "left_anti")

    joined = joined.join(m, keys, "left")
    out_schema = cube.df.schema

    def apply_mask(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        repl = np.nan if replacement is None else float(replacement)
        for pdf in it:
            out = []
            for bufs, mb in zip(pdf["bands"], pdf["mask_bands"]):
                if mb is None:
                    out.append(list(bufs))
                    continue
                mask_arr = decode_tile_float([mb[0]], mct, shape)[0]
                hide = ~(np.nan_to_num(mask_arr, nan=1.0) == 0)
                stack = decode_tile_float(list(bufs), ct, shape)
                out.append(
                    [
                        encode_band(
                            out_ct.from_float_nan(np.where(hide, repl, stack[b])),
                            out_ct,
                        )
                        for b in range(stack.shape[0])
                    ]
                )
            res = pdf.drop(columns=["mask_bands"])
            res["bands"] = out
            yield res

    return cube.with_df(joined.mapInPandas(apply_mask, schema=out_schema))


def mask_polygon(
    cube: DataCube,
    features,
    replacement: float | None = None,
    inside: bool = False,
) -> DataCube:
    """Pixels OUTSIDE the union of polygons -> replacement/nodata (openEO
    mask_polygon; ``inside=True`` inverts). Keys fully outside are dropped
    (clip semantics of groupAndMaskByGeometry's stitch+crop)."""
    layout = cube.meta.layout
    ct = cube.meta.cell_type
    shape = cube.meta.tile_shape
    out_ct = parse_cell_type(ct)

    fkeys = feature_tile_keys(features, layout)
    # union over features per key: contained if any feature contains the tile
    key_info = fkeys.groupBy("col", "row").agg(
        F.max("contained").alias("contained"),
        F.collect_set("feature_index").alias("fis"),
    )
    joined = cube.df.join(F.broadcast(key_info), ["col", "row"], "inner").join(
        F.broadcast(
            features.groupBy().agg(
                F.collect_list(F.struct("feature_index", "geojson")).alias("feats")
            )
        ),
    )
    out_schema = cube.df.schema

    def apply_mask(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        repl = np.nan if replacement is None else float(replacement)
        geom_cache: dict[int, object] = {}
        mask_cache: dict[tuple, np.ndarray] = {}
        for pdf in it:
            out_rows = []
            out_bands = []
            for i, (c, r, bufs, contained, fis, feats) in enumerate(
                zip(pdf["col"], pdf["row"], pdf["bands"], pdf["contained"],
                    pdf["fis"], pdf["feats"])
            ):
                c, r = int(c), int(r)
                mk = (c, r)
                inside_mask = mask_cache.get(mk)
                if inside_mask is None:
                    if contained:
                        inside_mask = np.ones(shape, dtype=bool)
                    else:
                        inside_mask = np.zeros(shape, dtype=bool)
                        xs, ys = layout.pixel_centers_for_key(c, r)
                        for fi in fis:
                            g = geom_cache.get(int(fi))
                            if g is None:
                                gj = next(
                                    f["geojson"] for f in feats
                                    if f["feature_index"] == fi
                                )
                                g = parse_geometry(gj)
                                geom_cache[int(fi)] = g
                            inside_mask |= rasterize(g, xs, ys)
                    mask_cache[mk] = inside_mask
                hide = inside_mask if inside else ~inside_mask
                stack = decode_tile_float(list(bufs), ct, shape)
                out_rows.append(i)
                out_bands.append(
                    [
                        encode_band(
                            out_ct.from_float_nan(np.where(hide, repl, stack[b])),
                            out_ct,
                        )
                        for b in range(stack.shape[0])
                    ]
                )
            res = pdf.iloc[out_rows].drop(columns=["contained", "fis", "feats"])
            res["bands"] = out_bands
            yield res

    return cube.with_df(joined.mapInPandas(apply_mask, schema=out_schema))
