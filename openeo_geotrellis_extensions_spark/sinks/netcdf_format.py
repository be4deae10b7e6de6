"""Minimal classic-NetCDF (CDF-1) binary container — writer + reader.

Dependency-free implementation of the public classic file format
(the NetCDF "CDF-1" on-disk layout: magic 'CDF\\x01', big-endian headers,
dim/att/var lists, fixed-size data section), the same way sinks/geotiff.py
implements the TIFF container. Closes the round-1 seam where
netcdf/NetCDFRDDWriter.scala:74-110,311-453 wrote real .nc files while this
repo emitted .npz stand-ins. No record dimension is used (numrecs = 0);
all variables are fixed-size.

Only what the engine writes/reads is supported: NC_CHAR / NC_INT /
NC_FLOAT / NC_DOUBLE variables over named dimensions, plus string and
numeric attributes.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"CDF\x01"
_ABSENT = b"\x00\x00\x00\x00\x00\x00\x00\x00"
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

#: nc_type -> (tag, numpy dtype, byte size)
_TYPES = {
    "char": (2, np.dtype("S1"), 1),
    "int": (4, np.dtype(">i4"), 4),
    "float": (5, np.dtype(">f4"), 4),
    "double": (6, np.dtype(">f8"), 8),
}
_TAG_TO_TYPE = {tag: name for name, (tag, _, _) in _TYPES.items()}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _att_value_bytes(value) -> tuple[int, int, bytes]:
    """-> (nc_type tag, nelems, padded bytes) for an attribute value.
    Attribute nc_type follows the value's numpy dtype (float32 -> NC_FLOAT),
    so e.g. _FillValue can match its variable's type as netCDF/CF requires."""
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return _TYPES["char"][0], len(raw), _pad4(raw)
    arr = np.atleast_1d(np.asarray(value))
    if arr.dtype.kind == "i":
        return _TYPES["int"][0], arr.size, _pad4(arr.astype(">i4").tobytes())
    if arr.dtype == np.float32:
        return _TYPES["float"][0], arr.size, _pad4(arr.astype(">f4").tobytes())
    return _TYPES["double"][0], arr.size, _pad4(arr.astype(">f8").tobytes())


def _att_list(atts: dict) -> bytes:
    if not atts:
        return _ABSENT
    out = [struct.pack(">ii", _NC_ATTRIBUTE, len(atts))]
    for k, v in atts.items():
        tag, n, raw = _att_value_bytes(v)
        out.append(_name(k) + struct.pack(">ii", tag, n) + raw)
    return b"".join(out)


@dataclass
class NcVar:
    name: str
    nc_type: str  # 'char' | 'int' | 'float' | 'double'
    dims: list[str]
    data: np.ndarray
    atts: dict = field(default_factory=dict)


def write_cdf1(
    path: str,
    dims: list[tuple[str, int]],
    variables: list[NcVar],
    global_atts: dict | None = None,
) -> str:
    """Write a classic-format (CDF-1) netCDF file. ``dims`` order defines
    dim ids; every variable's ``data`` must match its dims' shape."""
    dim_ids = {nm: i for i, (nm, _) in enumerate(dims)}
    dim_sizes = dict(dims)

    header = [_MAGIC, struct.pack(">i", 0)]  # numrecs = 0 (no record dim)
    # dim_list
    header.append(struct.pack(">ii", _NC_DIMENSION, len(dims)))
    for nm, size in dims:
        header.append(_name(nm) + struct.pack(">i", size))
    # gatt_list
    header.append(_att_list(global_atts or {}))

    # var_list: serialize metadata with placeholder begins, then fix up
    payloads: list[bytes] = []
    var_meta: list[bytes] = []
    vsizes: list[int] = []
    for v in variables:
        tag, dt, tsize = _TYPES[v.nc_type]
        shape = tuple(dim_sizes[d] for d in v.dims)
        arr = np.ascontiguousarray(v.data)
        if arr.shape != shape:
            raise ValueError(f"{v.name}: data shape {arr.shape} != dims {shape}")
        if v.nc_type == "char":
            raw = arr.astype("S1").tobytes()
        else:
            raw = arr.astype(dt).tobytes()
        padded = _pad4(raw)
        payloads.append(padded)
        vsizes.append(len(padded))
        meta = (
            _name(v.name)
            + struct.pack(">i", len(v.dims))
            + b"".join(struct.pack(">i", dim_ids[d]) for d in v.dims)
            + _att_list(v.atts)
            + struct.pack(">ii", tag, len(padded))
        )
        var_meta.append(meta)

    if variables:
        header.append(struct.pack(">ii", _NC_VARIABLE, len(variables)))
    else:
        header.append(_ABSENT)
    # begin offsets are 4-byte ints in CDF-1; compute header size first
    fixed = sum(len(h) for h in header) + sum(len(m) + 4 for m in var_meta)
    begins = []
    off = fixed
    for vs in vsizes:
        begins.append(off)
        off += vs
    if off > 2**31 - 1:
        raise ValueError("file too large for CDF-1 (32-bit offsets); shard instead")

    with open(path, "wb") as f:
        for h in header:
            f.write(h)
        for meta, begin in zip(var_meta, begins):
            f.write(meta + struct.pack(">i", begin))
        for p in payloads:
            f.write(p)
    return path


def _read_name(buf: bytes, off: int) -> tuple[str, int]:
    (n,) = struct.unpack_from(">i", buf, off)
    off += 4
    name = buf[off : off + n].decode("utf-8")
    off += n + (-n % 4)
    return name, off


def _read_atts(buf: bytes, off: int) -> tuple[dict, int]:
    tag, count = struct.unpack_from(">ii", buf, off)
    off += 8
    atts: dict = {}
    if tag == 0:
        return atts, off
    for _ in range(count):
        name, off = _read_name(buf, off)
        t, n = struct.unpack_from(">ii", buf, off)
        off += 8
        tname = _TAG_TO_TYPE[t]
        _, dt, tsize = _TYPES[tname]
        raw = buf[off : off + n * tsize]
        off += n * tsize + (-(n * tsize) % 4)
        if tname == "char":
            atts[name] = raw.decode("utf-8")
        else:
            vals = np.frombuffer(raw, dtype=dt)
            atts[name] = vals[0] if n == 1 else vals
    return atts, off


def _parse_header(buf: bytes) -> dict:
    """Parse the CDF-1 header from ``buf`` (a prefix of the file) ->
    {'dims': [(name, size)], 'gatts': {...}, 'vars': {name: {'dims', 'atts',
    'nc_type', 'shape', 'begin'}}}. Raises struct.error / IndexError when
    ``buf`` is too short (caller re-reads a larger prefix)."""
    if buf[:4] != _MAGIC:
        raise ValueError("not a CDF-1 classic netCDF file")
    off = 8  # magic + numrecs
    tag, ndims = struct.unpack_from(">ii", buf, off)
    off += 8
    dims: list[tuple[str, int]] = []
    if tag == _NC_DIMENSION:
        for _ in range(ndims):
            name, off = _read_name(buf, off)
            (size,) = struct.unpack_from(">i", buf, off)
            off += 4
            dims.append((name, size))
    gatts, off = _read_atts(buf, off)
    tag, nvars = struct.unpack_from(">ii", buf, off)
    off += 8
    out_vars: dict = {}
    if tag == _NC_VARIABLE:
        for _ in range(nvars):
            name, off = _read_name(buf, off)
            (nd,) = struct.unpack_from(">i", buf, off)
            off += 4
            dids = struct.unpack_from(f">{nd}i", buf, off) if nd else ()
            off += 4 * nd
            atts, off = _read_atts(buf, off)
            t, vsize, begin = struct.unpack_from(">iii", buf, off)
            off += 12
            tname = _TAG_TO_TYPE[t]
            out_vars[name] = {
                "dims": [dims[d][0] for d in dids],
                "atts": atts,
                "nc_type": tname,
                "shape": tuple(dims[d][1] for d in dids),
                "begin": begin,
            }
    return {"dims": dims, "gatts": gatts, "vars": out_vars}


def read_cdf1_header(path: str, initial: int = 65536) -> dict:
    """Header-only parse (no payload bytes read) — the driver-side half of a
    SPLITTABLE read: var metadata carries fixed 'begin' offsets and shapes,
    so executors can window-read byte ranges independently
    (read_cdf1_window). Reads a growing prefix until the header parses."""
    size = initial
    while True:
        with open(path, "rb") as f:
            buf = f.read(size)
        try:
            return _parse_header(buf)
        except (struct.error, IndexError):
            if len(buf) < size:  # whole file read and still short
                raise ValueError("truncated CDF-1 header") from None
            size *= 4


def read_cdf1_window(
    path: str,
    var_meta: dict,
    prefix: tuple[int, ...],
    along_start: int = 0,
    n_along: int = 1,
) -> np.ndarray:
    """Read a CONTIGUOUS window of a fixed-size variable: elements whose
    leading indices equal ``prefix``, for ``n_along`` values of the next
    dimension starting at ``along_start`` (e.g. prefix=(ti,),
    along_start=r*th, n_along=th -> a (th, nx) y-strip of a (t, y, x)
    variable). CDF-1 fixed-size variables are plain big-endian row-major
    arrays at known offsets, so this is one seek + read of exactly the
    needed bytes — the executor-side half of the splittable read."""
    _, dt, tsize = _TYPES[var_meta["nc_type"]]
    shape = var_meta["shape"]
    k = len(prefix)
    if k >= len(shape):
        raise ValueError("prefix must leave at least one free dimension")
    tail = int(np.prod(shape[k + 1 :])) if len(shape) > k + 1 else 1
    flat_start = 0
    for i, p in enumerate(prefix):
        flat_start += int(p) * int(np.prod(shape[i + 1 :]))
    flat_start += int(along_start) * tail
    count = n_along * tail
    with open(path, "rb") as f:
        f.seek(var_meta["begin"] + flat_start * tsize)
        raw = f.read(count * tsize)
    if var_meta["nc_type"] == "char":
        arr = np.frombuffer(raw, dtype="S1")
    else:
        arr = np.frombuffer(raw, dtype=dt)
    return arr.reshape((n_along,) + shape[k + 1 :])


def read_cdf1(path: str) -> dict:
    """Parse a CDF-1 file -> {'dims': [(name, size)], 'gatts': {...},
    'vars': {name: {'dims': [...], 'atts': {...}, 'data': ndarray}}}."""
    buf = open(path, "rb").read()
    hdr = _parse_header(buf)
    out_vars: dict = {}
    for name, m in hdr["vars"].items():
        _, dt, tsize = _TYPES[m["nc_type"]]
        count = int(np.prod(m["shape"])) if m["shape"] else 1
        raw = buf[m["begin"] : m["begin"] + count * tsize]
        if m["nc_type"] == "char":
            data = np.frombuffer(raw, dtype="S1").reshape(m["shape"])
        else:
            data = np.frombuffer(raw, dtype=dt).reshape(m["shape"])
        out_vars[name] = {"dims": m["dims"], "atts": m["atts"], "data": data}
    return {"dims": hdr["dims"], "gatts": hdr["gatts"], "vars": out_vars}
