"""Resolution-adaptive tiling — optimizeChunkSize analog.

Reference: DatacubeSupport.optimizeChunkSize (DatacubeSupport.scala:122-142)
drops tile size 256 -> 128 when the requested polygons cover a small
fraction of the layout (so each task reads less and parallelism rises);
the UDF path retiles to 128 before heavy callbacks
(OpenEOProcesses.scala:213-217).

Ours: pick the tile size from the request/layout area ratio, bounded to
powers of two that divide the current tile, and retile (a no-op when the
size is already optimal).
"""

from __future__ import annotations

from ..core.grid import Extent
from ..sources.datacube import DataCube
from .resample import retile


def optimal_tile_size(
    cube: DataCube, request: Extent, min_size: int = 8, target_tiles: int = 64
) -> int:
    """Choose a tile size so the request spans >= ``target_tiles`` tiles
    (more tasks for small requests), never below ``min_size`` and never
    above the current size."""
    ld = cube.meta.layout
    cur = ld.tile_cols
    inter = ld.extent.intersection(request)
    if inter is None:
        return cur
    frac = (inter.width * inter.height) / (ld.extent.width * ld.extent.height)
    n_tiles_now = max(1.0, frac * ld.layout_cols * ld.layout_rows)
    size = cur
    while size > min_size and n_tiles_now * (cur / size) ** 2 < target_tiles:
        size //= 2
    return max(size, min_size)


def adapt_resolution(cube: DataCube, request: Extent, **kw) -> DataCube:
    """Retile to the request-optimal chunk size (no-op when already optimal)."""
    size = optimal_tile_size(cube, request, **kw)
    if size == cube.meta.layout.tile_cols:
        return cube
    return retile(cube, size, size)
