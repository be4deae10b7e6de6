"""Baseline JPEG (ITU-T.81 / ISO 10918-1) encoder + decoder from scratch —
numpy only, no PIL/libjpeg in this environment.

Mirrors the PNG story (`sinks/png.py`): the engine's multimodal pipeline
(`pipeline/multimodal.py`) treats images as opaque binary columns and decodes
through this seam inside Arrow-batched ``mapInPandas``.

Scope (honest): baseline sequential DCT, 8-bit, grayscale or YCbCr
(JFIF), huffman entropy coding, restart markers, integer-ratio chroma
subsampling on decode (4:4:4 / 4:2:2 / 4:2:0). The encoder always writes
4:4:4. Progressive (SOF2), arithmetic coding, and 12-bit raise ValueError.

JPEG is lossy: round-trips are gated by PSNR in tests, and the driver oracle
for the jpeg query checks the exactly-reproducible columns (dimensions,
pixel counts), not reconstructed values.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# constants: zigzag, quantization, huffman table definitions
# --------------------------------------------------------------------------

#: zigzag scan order: ZIGZAG[k] = flat (row*8+col) index of the k-th coeff
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(ZIGZAG)

_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

_Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# (bits-per-length[1..16], values) — Annex-K-style tables. Internal
# consistency is what matters for correctness: the encoder EMBEDS these in
# DHT segments, so any conformant decoder (including ours) reads them back.
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
for _bits, _vals in (_DC_LUM, _DC_CHROM, _AC_LUM, _AC_CHROM):
    assert sum(_bits) == len(_vals), "huffman table counts inconsistent"


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    mat = 0.5 * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    mat[0, :] *= 1.0 / np.sqrt(2.0)
    return mat


_DCT = _dct_matrix()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) by canonical huffman assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# --------------------------------------------------------------------------
# bit IO
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        # destuff: 0xFF00 -> 0xFF (markers were split off by the caller)
        self.bits = np.unpackbits(
            np.frombuffer(data.replace(b"\xff\x00", b"\xff"), dtype=np.uint8)
        )
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.bits):
            raise ValueError("truncated JPEG entropy stream")
        chunk = self.bits[self.pos:end]
        self.pos = end
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid huffman code in JPEG stream")


def _receive_extend(reader: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = reader.read_bits(s)
    if v < (1 << (s - 1)):  # negative branch
        v -= (1 << s) - 1
    return v


def _magnitude(v: int) -> int:
    return int(abs(v)).bit_length()


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(h, w) padded-to-8 plane -> (n_blocks, 8, 8) in raster MCU order."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    return blocks.reshape(-1, 8, 8)


def _encode_plane_blocks(
    blocks_q: np.ndarray, writer: _BitWriter,
    dc_codes: dict, ac_codes: dict, prev_dc: int,
) -> int:
    """blocks_q: (n, 64) zigzagged quantized ints. Returns last DC."""
    for blk in blocks_q:
        diff = int(blk[0]) - prev_dc
        prev_dc = int(blk[0])
        s = _magnitude(diff)
        code, length = dc_codes[s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = int(np.nonzero(blk[1:])[0][-1]) + 1 if np.any(blk[1:]) else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            s = _magnitude(v)
            code, length = ac_codes[(run << 4) | s]
            writer.write(code, length)
            writer.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            writer.write(code, length)
    return prev_dc


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JFIF bytes
    (4:4:4, huffman tables embedded)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h,w) or (h,w,3)")
    h, w = img.shape[:2]

    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]

    q_lum = _scaled_quant(_Q_LUM, quality)
    q_chrom = _scaled_quant(_Q_CHROM, quality)
    qtabs = [q_lum] + ([q_chrom] if not gray else [])

    dc_lum_codes = _canonical_codes(*_DC_LUM)
    ac_lum_codes = _canonical_codes(*_AC_LUM)
    dc_chrom_codes = _canonical_codes(*_DC_CHROM)
    ac_chrom_codes = _canonical_codes(*_AC_CHROM)

    # quantize every component's blocks (batched DCT via einsum)
    comp_blocks = []
    for ci, plane in enumerate(planes):
        blocks = _blockify(plane - 128.0)
        coeffs = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = qtabs[min(ci, len(qtabs) - 1)]
        quant = np.round(coeffs / q).astype(np.int32)
        comp_blocks.append(quant.reshape(-1, 64)[:, ZIGZAG])

    # interleaved MCU scan: 4:4:4 means one block per component per MCU
    writer = _BitWriter()
    prev = [0] * len(planes)
    n_mcus = comp_blocks[0].shape[0]
    for m in range(n_mcus):
        for ci in range(len(planes)):
            dc = dc_lum_codes if ci == 0 else dc_chrom_codes
            ac = ac_lum_codes if ci == 0 else ac_chrom_codes
            prev[ci] = _encode_plane_blocks(
                comp_blocks[ci][m:m + 1], writer, dc, ac, prev[ci]
            )
    entropy = writer.flush()

    # ---- container ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, q in enumerate(qtabs):
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    tables = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if not gray:
        tables += [(0x01, _DC_CHROM), (0x11, _AC_CHROM)]
    for tc_th, (bits, vals) in tables:
        payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded chunks split at RSTn markers; returns (chunks, pos of
    the terminating marker's 0xFF)."""
    chunks = []
    chunk_start = start
    i = start
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= len(data):
            raise ValueError("truncated JPEG entropy stream (no terminator)")
        nxt = data[j + 1]
        if nxt == 0x00:
            i = j + 2
            continue
        if 0xD0 <= nxt <= 0xD7:  # RSTn
            chunks.append(data[chunk_start:j])
            chunk_start = j + 2
            i = j + 2
            continue
        chunks.append(data[chunk_start:j])
        return chunks, j


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes -> (h, w) uint8 or (h, w, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        # optional 0xFF fill bytes before a marker are legal (T.81 B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if pos + seglen > len(data):
            raise ValueError("truncated JPEG segment")
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64)
                tab[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, o + 1)
                qtabs[tq] = tab.reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1: o + 17])
                n = sum(bits)
                vals = list(seg[o + 17: o + 17 + n])
                htabs[(tc, th)] = _decode_table(bits, vals)
                o += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci: 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0/SOF1) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = {}
            for si in range(ns):
                cid, tt = seg[1 + 2 * si: 3 + 2 * si]
                sel[cid] = (tt >> 4, tt & 0xF)
            chunks, end = _split_entropy(data, pos + seglen)
            return _decode_scan(
                chunks, comps, sel, qtabs, htabs, h, w, restart_interval
            )
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(chunks, comps, sel, qtabs, htabs, h, w, dri) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcus = mcux * mcuy
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks across
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.float64)

    mcu = 0
    for chunk in chunks:
        reader = _BitReader(chunk)
        prev_dc = {c["id"]: 0 for c in comps}
        limit = min(n_mcus, mcu + dri) if dri else n_mcus
        while mcu < limit:
            my, mx = divmod(mcu, mcux)
            for c in comps:
                td, ta = sel[c["id"]]
                dc_tab, ac_tab = htabs[(0, td)], htabs[(1, ta)]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64)
                        s = reader.read_symbol(dc_tab)
                        prev_dc[c["id"]] += _receive_extend(reader, s)
                        blk[0] = prev_dc[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            blk[k] = _receive_extend(reader, s)
                            k += 1
                        bi = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                        c["coef"][bi] = blk
            mcu += 1
        if mcu >= n_mcus:
            break
    if mcu < n_mcus:
        raise ValueError("truncated JPEG scan")

    planes = []
    for c in comps:
        q = qtabs[c["tq"]]
        coef = np.zeros_like(c["coef"])
        coef[:, ZIGZAG] = c["coef"]  # inverse zigzag
        blocks = coef.reshape(-1, 8, 8) * q
        spatial = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT) + 128.0
        plane = (
            spatial.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise ValueError("non-integer chroma sampling ratio unsupported")
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"{len(planes)}-component JPEG unsupported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
