"""Minimal baseline-JPEG emitter — the independent second producer for
decode_jpeg goldens (same role as tests/ecma376_emitter.py for OOXML and
tests/cfb_emitter.py for MSG: built from the PUBLIC spec, ITU T.81,
sharing no code with the decoder under test).

Encodes 8-bit grayscale or RGB (4:4:4, no subsampling) as SOF0 baseline
with Huffman coding. The Huffman tables are CUSTOM canonical tables (all
12 DC size symbols at 5 bits, all 162 AC run/size symbols at 9 bits) —
legal JPEG, carried in DHT like any other table, and deliberately NOT
the Annex-K defaults so a decoder that hardcodes those fails loudly
here. Quantization defaults to all-ones (near-lossless — golden tests
can assert tight pixel bounds); pass ``quant`` for lossy realism.
Optional restart intervals exercise the RST-marker path.
"""

from __future__ import annotations

import math
import struct

_DC_BITS = [0, 0, 0, 0, 12] + [0] * 11
_DC_VALS = bytes(range(12))
# all (run 0-15, size 1-10) pairs + EOB (0x00) + ZRL (0xF0), 9 bits each
_AC_VALS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS = [0] * 8 + [len(_AC_VALS)] + [0] * 7


def _canonical_codes(bits: list[int], values: bytes) -> dict[int, tuple]:
    codes = {}
    code = 0
    k = 0
    for n in range(1, 17):
        for _ in range(bits[n - 1]):
            codes[values[k]] = (n, code)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_M = [
    [
        (math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8))
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for u in range(8)
    ]
    for x in range(8)
]


def _fdct(block: list[float]) -> list[float]:
    """coef = M^T . block . M (the exact inverse of the type-III IDCT)."""
    tmp = [0.0] * 64
    for u in range(8):
        for x in range(8):
            s = sum(_M[y][u] * block[y * 8 + x] for y in range(8))
            tmp[u * 8 + x] = s
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            out[u * 8 + v] = sum(
                tmp[u * 8 + x] * _M[x][v] for x in range(8)
            )
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.put(1, 1)  # pad with 1-bits per T.81


def _size_of(v: int) -> int:
    return v.bit_length() if v > 0 else (-v).bit_length()


def _emit_block(w: _BitWriter, zz: list[int], pred: int) -> int:
    diff = zz[0] - pred
    n = _size_of(diff)
    ln, code = _DC_CODES[n]
    w.put(code, ln)
    if n:
        w.put(diff if diff > 0 else diff + (1 << n) - 1, n)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _AC_CODES[0xF0]
            w.put(code, ln)
            run -= 16
        s = _size_of(zz[k])
        ln, code = _AC_CODES[(run << 4) | s]
        w.put(code, ln)
        v = zz[k]
        w.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ln, code = _AC_CODES[0x00]
        w.put(code, ln)
    return zz[0]


def _component_block(pixels, width, height, ox, oy, quant) -> list[int]:
    block = []
    for y in range(8):
        for x in range(8):
            # edge replication for partial blocks, per common practice
            yy = min(oy + y, height - 1)
            xx = min(ox + x, width - 1)
            block.append(pixels[yy * width + xx] - 128.0)
    coef = _fdct(block)
    return [int(round(coef[_ZZ[i]] / quant[i])) for i in range(64)]


def encode_jpeg(
    pixels,
    width: int,
    height: int,
    mode: str = "L",
    quant_value: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """``pixels``: row-major bytes/list — luma for mode 'L', interleaved
    RGB triples for mode 'RGB' (encoded 4:4:4 via the JFIF YCbCr
    transform). ``quant_value`` fills the (zigzag-order) quant table."""
    quant = [quant_value] * 64
    if mode == "RGB":
        yp, cb, cr = [], [], []
        for i in range(width * height):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            yv = 0.299 * r + 0.587 * g + 0.114 * b
            yp.append(min(255, max(0, int(round(yv)))))
            cb.append(min(255, max(0, int(round(128 - 0.168736 * r
                                               - 0.331264 * g + 0.5 * b)))))
            cr.append(min(255, max(0, int(round(128 + 0.5 * r
                                               - 0.418688 * g
                                               - 0.081312 * b)))))
        planes = [yp, cb, cr]
    else:
        planes = [list(pixels)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)  # density + no thumbnail
    # DQT (table 0, zigzag order, 8-bit precision)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(quant)
    # SOF0
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8,
                                     height, width, ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x11, 0])  # id, h=v=1, quant table 0
    # DHT: DC table 0 and AC table 0 (shared by all components)
    dht = bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS
    dht += bytes([0x10]) + bytes(_AC_BITS) + _AC_VALS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x00])
    out += b"\x00\x3f\x00"

    w = _BitWriter()
    preds = [0] * ncomp
    mcux = -(-width // 8)
    mcuy = -(-height // 8)
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_index = my * mcux + mx
            if restart_interval and mcu_index and (
                mcu_index % restart_interval == 0
            ):
                w.align()
                out += w.out
                w = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * ncomp
            for c, plane in enumerate(planes):
                zz = _component_block(
                    plane, width, height, mx * 8, my * 8, quant
                )
                preds[c] = _emit_block(w, zz, preds[c])
    w.align()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
