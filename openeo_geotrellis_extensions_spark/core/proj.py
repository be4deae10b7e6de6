"""Pure-numpy CRS transforms — the engine's reprojection math.

Scope mirrors what the reference exercises in its reproject tests
(reproject/TileRDDReproject.scala:40-419, RasterRegionReproject.scala):
the EPSG:4326 <-> EPSG:3857 (spherical web-Mercator) pair, which needs no
proj library — closed-form log/tan/atan/exp. Both directions are
AXIS-SEPARABLE (x' depends only on x, y' only on y) and strictly monotone,
which the resample fragment step exploits: 1-D pixel-center arrays transform
independently and extent corners bound the image exactly.

No Spark imports — runs inside pandas UDFs untouched.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .grid import Extent, LayoutDefinition

#: WGS84 / spherical-Mercator earth radius (meters).
EARTH_RADIUS = 6378137.0

#: Latitude where web-Mercator y reaches the square world bound (degrees).
MAX_MERCATOR_LAT = 85.05112877980659

AxisFn = Callable[[np.ndarray], np.ndarray]


def _merc_x(lon: np.ndarray) -> np.ndarray:
    return EARTH_RADIUS * np.radians(np.asarray(lon, dtype=np.float64))


def _merc_y(lat: np.ndarray) -> np.ndarray:
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_MERCATOR_LAT, MAX_MERCATOR_LAT)
    return EARTH_RADIUS * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))


def _inv_merc_x(x: np.ndarray) -> np.ndarray:
    return np.degrees(np.asarray(x, dtype=np.float64) / EARTH_RADIUS)


def _inv_merc_y(y: np.ndarray) -> np.ndarray:
    return np.degrees(
        2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / EARTH_RADIUS))
        - np.pi / 2.0
    )


def _identity(v: np.ndarray) -> np.ndarray:
    return np.asarray(v, dtype=np.float64)


#: (src, dst) -> (fx, fy) separable transforms mapping src coords to dst.
_AXIS_TRANSFORMS: dict[tuple[str, str], tuple[AxisFn, AxisFn]] = {
    ("EPSG:4326", "EPSG:3857"): (_merc_x, _merc_y),
    ("EPSG:3857", "EPSG:4326"): (_inv_merc_x, _inv_merc_y),
}


def transform_fns(src_crs: str, dst_crs: str) -> tuple[AxisFn, AxisFn]:
    """Separable (fx, fy) mapping src-CRS coords to dst-CRS coords.
    Identity when the CRSs match; raises for unsupported pairs."""
    if src_crs == dst_crs:
        return _identity, _identity
    try:
        return _AXIS_TRANSFORMS[(src_crs, dst_crs)]
    except KeyError:
        raise NotImplementedError(
            f"CRS transform {src_crs} -> {dst_crs} not supported "
            "(EPSG:4326 <-> EPSG:3857 only)"
        ) from None


def transform_extent(e: Extent, src_crs: str, dst_crs: str) -> Extent:
    """Image of ``e`` under the (monotone, separable) transform — corners
    bound it exactly."""
    fx, fy = transform_fns(src_crs, dst_crs)
    xs = fx(np.array([e.xmin, e.xmax]))
    ys = fy(np.array([e.ymin, e.ymax]))
    return Extent(float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()))


def reproject_layout(src: LayoutDefinition, dst_crs: str) -> LayoutDefinition:
    """Target-layout negotiation (TileRDDReproject.scala:89-150 semantics,
    simplified): the reprojected source extent with the SAME tile grid
    (layout cols/rows, tile pixels), so total pixel count is preserved and
    every key stays in [0, layout) — the reference's grid-alignment invariant
    (OpenEOProcessesSpec.scala:581-600)."""
    return LayoutDefinition(
        transform_extent(src.extent, src.crs, dst_crs),
        src.layout_cols,
        src.layout_rows,
        src.tile_cols,
        src.tile_rows,
        dst_crs,
    )
