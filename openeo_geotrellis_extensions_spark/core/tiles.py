"""Tile codec: numpy 2-D band arrays <-> Spark ``binary`` columns.

The reference's ``MultibandTile`` becomes a DataFrame column
``bands: array<binary>`` where each element is the raw C-order bytes of one
(h, w) band; dtype/shape/nodata live in cube-level metadata (see
sources/datacube.py), mirroring how ``TileLayerMetadata`` is a driver-side
record in the reference (DatacubeSupport.scala:110-120).

An all-nodata band is encoded as the EMPTY marker b"" — the analog of
``EmptyMultibandTile`` (openeo-geotrellis/.../EmptyMultibandTile.scala), so
empty tiles cost ~0 bytes in shuffle/storage.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .celltype import CellType, parse_cell_type

EMPTY = b""  # zero-storage all-nodata band marker


@dataclass
class Tile:
    """Driver/UDF-side convenience wrapper; never crosses into Spark rows."""

    bands: list[np.ndarray]  # each (h, w)
    cell_type: CellType

    @property
    def shape(self) -> tuple[int, int]:
        return self.bands[0].shape


def encode_band(arr: np.ndarray | None, cell_type: CellType | str) -> bytes:
    if isinstance(cell_type, str):
        cell_type = parse_cell_type(cell_type)
    if arr is None:
        return EMPTY
    a = np.ascontiguousarray(arr, dtype=cell_type.dtype)
    if cell_type.has_nodata and not cell_type.valid_mask(a).any():
        return EMPTY
    return a.tobytes()


def decode_band(
    buf: bytes | None, cell_type: CellType | str, shape: tuple[int, int]
) -> np.ndarray:
    """Decode one band; EMPTY/None -> materialized all-nodata array."""
    if isinstance(cell_type, str):
        cell_type = parse_cell_type(cell_type)
    if buf is None or len(buf) == 0:
        nd = cell_type.nodata if cell_type.nodata is not None else 0
        return np.full(shape, nd, dtype=cell_type.dtype)
    return np.frombuffer(buf, dtype=cell_type.dtype).reshape(shape)


def is_empty_band(buf: bytes | None) -> bool:
    return buf is None or len(buf) == 0


def encode_tile(bands: list[np.ndarray | None], cell_type: CellType | str) -> list[bytes]:
    return [encode_band(b, cell_type) for b in bands]


def decode_tile(
    bufs: list[bytes | None], cell_type: CellType | str, shape: tuple[int, int]
) -> np.ndarray:
    """Decode a band list into one (nbands, h, w) stack."""
    return np.stack([decode_band(b, cell_type, shape) for b in bufs])


def decode_tiles_batch_float(
    band_lists, cell_type: CellType | str, shape: tuple[int, int], n_bands: int
) -> np.ndarray:
    """Decode a WHOLE Arrow batch of tile rows in one numpy pass ->
    (n_rows, n_bands, h, w) float64 with nodata -> NaN. Empty-band markers
    ('' / None) decode to all-NaN (or 0 for no-nodata cell types).

    This is the hot-loop replacement for per-row decode_tile_float: one
    ``b"".join`` + one ``frombuffer`` + one vectorized nodata mask over the
    entire batch instead of n_rows x n_bands small-array round trips."""
    if isinstance(cell_type, str):
        cell_type = parse_cell_type(cell_type)
    n = len(band_lists)
    nbytes = shape[0] * shape[1] * cell_type.dtype.itemsize
    zero = bytes(nbytes)
    flat: list[bytes] = []
    empties: list[tuple[int, int]] = []
    for i, bl in enumerate(band_lists):
        for b in range(n_bands):
            buf = bl[b] if bl is not None and b < len(bl) else None
            if is_empty_band(buf):
                empties.append((i, b))
                flat.append(zero)
            else:
                flat.append(buf)
    arr = np.frombuffer(b"".join(flat), dtype=cell_type.dtype).reshape(
        n, n_bands, *shape
    )
    out = cell_type.to_float_nan(arr)
    fill = np.nan if cell_type.has_nodata else 0.0
    for i, b in empties:
        out[i, b] = fill
    return out


def decode_tile_float(
    bufs: list[bytes | None], cell_type: CellType | str, shape: tuple[int, int]
) -> np.ndarray:
    """Decode to float64 with nodata -> NaN — the canonical in-UDF form."""
    if isinstance(cell_type, str):
        cell_type = parse_cell_type(cell_type)
    out = np.empty((len(bufs), *shape), dtype=np.float64)
    for i, b in enumerate(bufs):
        if is_empty_band(b):
            out[i] = np.nan if cell_type.has_nodata else 0
        else:
            out[i] = cell_type.to_float_nan(
                np.frombuffer(b, dtype=cell_type.dtype).reshape(shape)
            )
    return out
