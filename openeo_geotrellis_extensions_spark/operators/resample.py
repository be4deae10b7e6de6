"""resample_spatial / retile — regrid a cube onto a new layout.

Reference: ``resampleCubeSpatial*`` (OpenEOProcesses.scala:832-880) with the
no-op short-circuit when grids already align (:833-835); the engine fork of
TileRDDReproject (reproject/TileRDDReproject.scala:40-419): buffer ->
per-tile region resample into the target grid -> merge fragments by new key;
``retile`` (OpenEOProcesses.scala:1001-1047).

Ours: each source tile emits one fragment per overlapped target key
(mapInPandas), then ``groupBy(target key)`` merges fragments — the classic
explode + shuffle + merge, expressed as DataFrame ops so AQE sizes the
shuffle. Nearest-neighbor sampling; CRS warping (EPSG:4326 <-> EPSG:3857
and WGS84 UTM zones, core/proj.py) runs through the same fragment step by
forward-projecting the source footprint and inverse-projecting the 2-D grid
of target pixel centers.
Negative/out-of-grid keys are filtered like filterNegativeSpatialKeys
(OpenEOProcesses.scala:804-830).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..core.celltype import parse_cell_type
from ..core.grid import LayoutDefinition
from ..core.tiles import decode_tile_float, encode_band
from ..sources.datacube import CubeMeta, DataCube, cube_schema


def resample_spatial(cube: DataCube, target: LayoutDefinition) -> DataCube:
    """Regrid onto ``target`` (no-op when layouts already match). When the
    target CRS differs, the SAME fragment step warps: the source tile extent
    is forward-projected to find overlapped target keys, and target pixel
    centers are inverse-projected back into source pixel space —
    nearest-neighbor through the closed-form EPSG:4326<->3857 math in
    core/proj.py (the reference's TileRDDReproject fork, re-expressed as
    explode + shuffle + merge)."""
    from ..core.proj import point_transform, transform_extent

    src = cube.meta.layout
    if src == target:
        return cube  # OpenEOProcesses.scala:833-835 short-circuit
    # validate the CRS pair up front (driver-side) so unsupported pairs fail
    # fast instead of inside executors; the general point transform covers
    # both separable (4326<->3857) and non-separable (UTM) pairs
    inv_pt = point_transform(target.crs, src.crs)

    ct = cube.meta.cell_type
    n_bands = cube.meta.n_bands
    shape = cube.meta.tile_shape
    out_ct = parse_cell_type(ct)
    temporal = cube.meta.temporal
    frag_schema = cube_schema(temporal)

    def fragments(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        th, tw = target.tile_rows, target.tile_cols
        for pdf in it:
            rows = []
            for rec in pdf.itertuples(index=False):
                c, r = int(rec.col), int(rec.row)
                stack = decode_tile_float(list(rec.bands), ct, shape)
                se = src.extent_for_key(c, r)
                # target keys overlapped by this source tile (footprint
                # forward-projected into the target CRS)
                se_t = transform_extent(se, src.crs, target.crs)
                for tc, tr in target.keys_for_extent(se_t):
                    xs, ys = target.pixel_centers_for_key(tc, tr)
                    # nearest-neighbor: inverse-project the full grid of
                    # target centers into the source CRS, then map to source
                    # pixels — 2-D because UTM warps are not axis-separable
                    # (identity/separable pairs broadcast through unchanged)
                    XS, YS = np.meshgrid(xs, ys)
                    sx, sy = inv_pt(XS, YS)
                    px = np.floor((sx - se.xmin) / src.cell_width).astype(np.int64)
                    py = np.floor((se.ymax - sy) / src.cell_height).astype(np.int64)
                    ok = (px >= 0) & (px < shape[1]) & (py >= 0) & (py < shape[0])
                    if not ok.any():
                        continue
                    frag = np.full((n_bands, th, tw), np.nan)
                    for b in range(n_bands):
                        frag[b][ok] = stack[b][py[ok], px[ok]]
                    bands = [
                        encode_band(out_ct.from_float_nan(frag[b]), out_ct)
                        for b in range(n_bands)
                    ]
                    if temporal:
                        rows.append((rec.time, tc, tr, bands))
                    else:
                        rows.append((tc, tr, bands))
            cols = (["time"] if temporal else []) + ["col", "row", "bands"]
            yield pd.DataFrame(rows, columns=cols)

    frags = cube.df.mapInPandas(fragments, schema=frag_schema)

    keys = (["time"] if temporal else []) + ["col", "row"]

    def merge_frags(pdf: pd.DataFrame) -> pd.DataFrame:
        th, tw = target.tile_rows, target.tile_cols
        acc = np.full((n_bands, th, tw), np.nan)
        for bufs in pdf["bands"]:
            frag = decode_tile_float(list(bufs), ct, (th, tw))
            acc = np.where(np.isnan(acc), frag, acc)
        bands = [
            encode_band(out_ct.from_float_nan(acc[b]), out_ct) for b in range(n_bands)
        ]
        first = pdf.iloc[0]
        row = ([first["time"]] if temporal else []) + [int(first["col"]), int(first["row"]), bands]
        return pd.DataFrame([row], columns=(["time"] if temporal else []) + ["col", "row", "bands"])

    merged = frags.groupBy(*keys).applyInPandas(merge_frags, schema=frag_schema)
    merged = merged.where(
        (F.col("col") >= 0) & (F.col("row") >= 0)
        & (F.col("col") < target.layout_cols) & (F.col("row") < target.layout_rows)
    )
    meta = CubeMeta(target, ct, cube.meta.band_names, temporal)
    return DataCube(merged, meta)


def retile(cube: DataCube, tile_cols: int, tile_rows: int) -> DataCube:
    """Re-chunk to a new tile size over the same extent/resolution
    (OpenEOProcesses.retile :1001-1047). Pixel-preserving: the target layout
    keeps the cell size, so nearest-neighbor sampling is exact."""
    src = cube.meta.layout
    total_px_x = src.layout_cols * src.tile_cols
    total_px_y = src.layout_rows * src.tile_rows
    target = LayoutDefinition(
        src.extent,
        math.ceil(total_px_x / tile_cols),
        math.ceil(total_px_y / tile_rows),
        tile_cols,
        tile_rows,
        src.crs,
    )
    if (
        target.layout_cols * tile_cols != total_px_x
        or target.layout_rows * tile_rows != total_px_y
    ):
        raise ValueError("retile size must evenly divide the pixel grid")
    return resample_spatial(cube, target)


def resample_cube_spatial(cube: DataCube, target: DataCube) -> DataCube:
    """openEO resample_cube_spatial (OpenEOProcesses.resampleCubeSpatial,
    OpenEOProcesses.scala:832-880): regrid ``cube`` onto ``target``'s layout
    (CRS warp included when their CRSs differ)."""
    return resample_spatial(cube, target.meta.layout)


def resample_spatial_resolution(
    cube: DataCube,
    resolution: float,
    projection: str | None = None,
) -> DataCube:
    """openEO resample_spatial's (resolution, projection) signature: derive
    the target layout from the requested cell size over the (reprojected)
    cube extent, keeping the tile pixel size; then regrid/warp through
    resample_spatial. ``resolution`` is in target-CRS units per pixel."""
    from ..core.proj import transform_extent

    src = cube.meta.layout
    crs = projection or src.crs
    ext = transform_extent(src.extent, src.crs, crs)
    layout_cols = max(1, math.ceil(ext.width / (resolution * src.tile_cols)))
    layout_rows = max(1, math.ceil(ext.height / (resolution * src.tile_rows)))
    # grow the extent to a whole number of tiles so cell size is EXACTLY
    # ``resolution`` (grid-alignment invariant: keys stay in [0, layout))
    target = LayoutDefinition(
        type(ext)(
            ext.xmin,
            ext.ymax - layout_rows * resolution * src.tile_rows,
            ext.xmin + layout_cols * resolution * src.tile_cols,
            ext.ymax,
        ),
        layout_cols,
        layout_rows,
        src.tile_cols,
        src.tile_rows,
        crs,
    )
    return resample_spatial(cube, target)
