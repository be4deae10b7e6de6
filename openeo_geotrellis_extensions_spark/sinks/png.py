"""PNG sink — pure-stdlib (zlib + struct) grayscale/RGB PNG writer.

Reference: png/package.scala:15-110 (stitch + render PNG). Ours stitches one
date on the driver (PNGs are small previews by definition) and encodes with
zlib — no imaging library required.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..core.celltype import parse_cell_type
from ..core.tiles import decode_tile_float
from ..sources.datacube import DataCube


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def write_png(path: str, img: np.ndarray) -> None:
    """img: (h, w) grayscale or (h, w, 3) RGB uint8."""
    if img.ndim == 2:
        color_type, nch = 0, 1
        data = img[:, :, None]
    else:
        color_type, nch = 2, 3
        data = img
    h, w = data.shape[:2]
    raw = b"".join(
        b"\x00" + data[y].astype(np.uint8).tobytes() for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def read_png(path: str) -> np.ndarray:
    """Minimal parser for PNGs written by write_png (round-trip tests)."""
    buf = open(path, "rb").read()
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    w = h = ctype = None
    idat = b""
    while pos < len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, _, ctype, _, _, _ = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    raw = zlib.decompress(idat)
    nch = 1 if ctype == 0 else 3
    stride = 1 + w * nch
    rows = [
        np.frombuffer(raw[y * stride + 1 : (y + 1) * stride], dtype=np.uint8)
        for y in range(h)
    ]
    img = np.stack(rows).reshape(h, w, nch)
    return img[:, :, 0] if nch == 1 else img


def save_png(cube: DataCube, path: str, date: str | None = None,
             band: int = 0, vmin: float = 0.0, vmax: float = 100.0) -> str:
    """Stitch one date's single band, linear-rescale to 0..255, write PNG
    (nodata -> 0)."""
    ld = cube.meta.layout
    ct = parse_cell_type(cube.meta.cell_type)
    df = cube.df
    if cube.meta.temporal:
        from pyspark.sql import functions as F

        date = date or str(df.agg(F.min("time")).collect()[0][0].date())
        df = df.where(F.to_date("time") == date)
    H = ld.layout_rows * ld.tile_rows
    W = ld.layout_cols * ld.tile_cols
    full = np.full((H, W), np.nan)
    for r in df.collect():
        stack = decode_tile_float(list(r.bands), ct, cube.meta.tile_shape)
        full[
            r.row * ld.tile_rows : (r.row + 1) * ld.tile_rows,
            r.col * ld.tile_cols : (r.col + 1) * ld.tile_cols,
        ] = stack[band]
    scaled = np.clip((full - vmin) / max(vmax - vmin, 1e-9) * 255, 0, 255)
    scaled = np.nan_to_num(scaled, nan=0.0).astype(np.uint8)
    write_png(path, scaled)
    return path
