"""Minimal GIF89a emitter — the independent second producer for
decode_gif goldens (same pattern as tests/jpeg_emitter.py: built from
the public spec, sharing no code with the decoder under test).

Emits a single-frame GIF with a 256-entry grayscale global palette and
REAL variable-width LSB-first LZW compression. Encoding runs in
1000-pixel chunks each preceded by a CLEAR code, so the dictionary never
approaches the 4096 cap while the width-bump ("early change") points
still get exercised — the decoder must track clears, width growth, and
the KwKwK case to read it. Optional 4-pass interlace and a GCE
extension block for structural realism.
"""

from __future__ import annotations

import struct


class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _lzw_encode(indices: bytes, min_code_size: int,
                chunk: int = 1000) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    w = _LsbWriter()
    width = min_code_size + 1
    for start in range(0, len(indices), chunk):
        seg = indices[start: start + chunk]
        # the CLEAR is read at the width in force BEFORE the reset — the
        # reset takes effect for the codes after it
        w.put(clear, width)
        width = min_code_size + 1
        nxt = end + 1
        table: dict[bytes, int] = {}

        def code_of(s: bytes) -> int:
            return s[0] if len(s) == 1 else table[s]

        cur = seg[:1]
        for k in seg[1:]:
            trial = cur + bytes([k])
            if trial in table:
                cur = trial
                continue
            w.put(code_of(cur), width)
            table[trial] = nxt
            nxt += 1
            # "early change": the code AFTER the table reaches 2^width
            # is read at width+1 (mirrors the decoder's bump point)
            if nxt == (1 << width) + 1 and width < 12:
                width += 1
            cur = bytes([k])
        w.put(code_of(cur), width)
    w.put(end, width if len(indices) else min_code_size + 1)
    return w.flush()


_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(
    lumas,
    width: int,
    height: int,
    interlace: bool = False,
    with_gce: bool = True,
    frames=None,
) -> bytes:
    """``lumas``: row-major 8-bit values; the palette is the identity
    grayscale ramp, so palette-luma == pixel value exactly. ``frames``
    (animated): list of (lumas, delay_cs) APPENDED after the first
    frame, each with its own Graphic Control Extension carrying the
    delay; the first frame's GCE carries delay 0 (with_gce=True)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | 0x07, 0, 0])  # global palette, 256 entries
    for i in range(256):
        out += bytes([i, i, i])

    def emit_frame(frame_lumas, delay_cs, gce, ilace):
        if gce:  # graphic control extension (delay little-endian)
            out.extend(b"\x21\xf9\x04\x00")
            out.extend(struct.pack("<H", delay_cs))
            out.extend(b"\x00\x00")
        out.extend(b"\x2c" + struct.pack("<HHHH", 0, 0, width, height))
        out.extend(bytes([0x40 if ilace else 0x00]))
        rows = [
            bytes(frame_lumas[y * width: (y + 1) * width])
            for y in range(height)
        ]
        if ilace:
            ordered = []
            for first, step in _PASSES:
                ordered.extend(rows[first::step] if first < height else [])
            rows = ordered
        data = _lzw_encode(b"".join(rows), 8)
        out.extend(bytes([8]))  # LZW min code size
        for i in range(0, len(data), 255):
            block = data[i: i + 255]
            out.extend(bytes([len(block)]) + block)
        out.extend(b"\x00")  # block terminator

    emit_frame(lumas, 0, with_gce, interlace)
    for frame_lumas, delay_cs in frames or []:
        emit_frame(frame_lumas, delay_cs, True, False)
    out += b"\x3b"  # trailer
    return bytes(out)
