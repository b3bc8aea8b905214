"""Minimal baseline-TIFF emitter — the independent second producer for
decode_tiff goldens (TIFF 6.0 spec; no code shared with the decoder).

Writes a single-IFD strip-organized file: 8-bit grayscale or RGB, little
or big endian, uncompressed or PackBits, with a configurable
RowsPerStrip so multi-strip assembly is exercised. Values that fit in
the 4-byte IFD slot are inlined; longer arrays go to an out-of-line
value area, as real writers do.
"""

from __future__ import annotations

import struct


def _packbits_encode(row: bytes) -> bytes:
    """Greedy PackBits: runs of >=3 as repeats, else literals."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and run < 128:
            nxt = 1
            while i + nxt < n and row[i + nxt] == row[i] and nxt < 128:
                nxt += 1
            if nxt >= 3:
                break
            i += nxt
            run += nxt
            if run >= 128:
                i -= run - 128
                run = 128
                break
        out += bytes([run - 1]) + row[lit_start: lit_start + run]
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Independent TIFF 6.0 §13 LZW compressor: MSB-first bit packing,
    Clear(256)/EOI(257), 9→12-bit widths with the early-change
    convention (width grows when the next free slot is ``2^width - 1``),
    Clear emitted when the table approaches full (4094), matching
    LibTIFF-produced streams."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    buf = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(CLEAR, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        put(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        put(table[w], width)
    put(EOI, width)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _predict2(strip: bytes, width: int, spp: int) -> bytes:
    """Forward horizontal differencing (Predictor 2): each sample minus
    the one ``spp`` earlier in its row, modulo 256."""
    out = bytearray(strip)
    stride = width * spp
    for base in range(0, len(out), stride):
        for j in range(min(stride, len(out) - base) - 1, spp - 1, -1):
            out[base + j] = (out[base + j] - out[base + j - spp]) % 256
    return bytes(out)


def _predict2_samples(samps, row_width: int, spp: int, mod: int):
    """Forward horizontal differencing at SAMPLE granularity (16-bit
    rasters): each sample minus the one ``spp`` earlier in its row,
    modulo the sample range."""
    out = list(samps)
    stride = row_width * spp
    for base in range(0, len(out), stride):
        for j in range(min(stride, len(out) - base) - 1, spp - 1, -1):
            out[base + j] = (out[base + j] - out[base + j - spp]) % mod
    return out


def encode_tiff(
    pixels,
    width: int,
    height: int,
    mode: str = "L",
    byte_order: str = "<",
    packbits: bool = False,
    rows_per_strip: int | None = None,
    palette=None,
    planar: bool = False,
    lzw: bool = False,
    predictor: bool = False,
    tile: tuple[int, int] | None = None,
    bits: int = 8,
) -> bytes:
    """``pixels``: row-major luma for 'L', interleaved RGB for 'RGB' (CMYK likewise for 'CMYK'),
    8-bit palette indices for 'P' (``palette`` = 256 (r, g, b) tuples,
    16-bit channel values, emitted as the TIFF 6.0 ColorMap: all reds,
    then greens, then blues). ``planar`` (RGB only) stores each
    component in its own strips (PlanarConfiguration=2, all plane-0
    strips first per the spec). ``bits=16`` packs each sample as a
    SHORT in the file's byte order (predictor differencing then runs at
    16-bit sample granularity)."""
    assert bits in (8, 16) and (bits == 8 or mode != "P")
    spp = {"RGB": 3, "CMYK": 4}.get(mode, 1)
    rps = rows_per_strip or height
    # the raster is a flat SAMPLE sequence; bytes for 8-bit keeps the
    # historical byte-level goldens byte-identical, a list for 16-bit
    raster = bytes(pixels) if bits == 8 else list(pixels)

    def pack(samps) -> bytes:
        if bits == 8:
            return bytes(samps)
        return b"".join(
            struct.pack(f"{byte_order}H", v) for v in samps
        )

    def enc(chunk, row_width: int, chunk_spp: int) -> bytes:
        if bits == 8:
            data = bytes(chunk)
            if predictor:
                data = _predict2(data, row_width, chunk_spp)
        else:
            samps = list(chunk)
            if predictor:
                samps = _predict2_samples(
                    samps, row_width, chunk_spp, 1 << bits
                )
            data = pack(samps)
        if lzw:
            return _lzw_encode(data)
        if packbits:
            return _packbits_encode(data)
        return data

    strips = []
    if tile:
        # tiled layout (tags 322-325): every tile is tw x th samples,
        # edge tiles zero-padded; planar emits all plane-0 tiles first
        tw, th = tile
        planes = (
            [raster[p::spp] for p in range(spp)] if planar else [raster]
        )
        tile_spp = 1 if planar else spp
        for plane_raster in planes:
            for ty in range(0, height, th):
                for tx in range(0, width, tw):
                    t = (
                        bytearray(tw * th * tile_spp)
                        if bits == 8
                        else [0] * (tw * th * tile_spp)
                    )
                    rows = min(th, height - ty)
                    cols = min(tw, width - tx)
                    for r in range(rows):
                        srow = ((ty + r) * width + tx) * tile_spp
                        t[r * tw * tile_spp:
                          r * tw * tile_spp + cols * tile_spp] = (
                            plane_raster[srow: srow + cols * tile_spp]
                        )
                    # predictor/compression apply per tile with the
                    # tile's own row stride
                    strips.append(enc(t, tw, tile_spp))
    elif planar:
        assert mode in ("RGB", "CMYK"), "planar needs multi-sample pixels"
        for plane in range(spp):
            plane_raster = raster[plane::spp]
            for top in range(0, height, rps):
                rows = min(rps, height - top)
                strip = plane_raster[top * width: (top + rows) * width]
                strips.append(enc(strip, width, 1))
    else:
        for top in range(0, height, rps):
            rows = min(rps, height - top)
            strip = raster[top * width * spp: (top + rows) * width * spp]
            strips.append(enc(strip, width, spp))

    bo = byte_order
    entries = []  # (tag, type, count, packed-or-deferred value)
    deferred: list[bytearray] = []

    def entry(tag, ftype, values):
        fmt = {1: "B", 3: "H", 4: "I"}[ftype]
        raw = b"".join(struct.pack(f"{bo}{fmt}", v) for v in values)
        entries.append((tag, ftype, len(values), raw))

    entry(256, 4, [width])
    entry(257, 4, [height])
    entry(258, 3, [bits] * spp)
    entry(259, 3, [5 if lzw else (32773 if packbits else 1)])
    if predictor:
        entry(317, 3, [2])
    if mode == "P":
        entry(262, 3, [3])  # palette-color
        cm = (
            [c[0] for c in palette]
            + [c[1] for c in palette]
            + [c[2] for c in palette]
        )
        entry(320, 3, cm)
    elif mode == "CMYK":
        entry(262, 3, [5])  # separated (CMYK)
    else:
        entry(262, 3, [2 if spp == 3 else 1])  # RGB / BlackIsZero
    entry(277, 3, [spp])
    if planar:
        entry(284, 3, [2])
    # chunk offsets filled after layout; byte counts known now
    if tile:
        entry(322, 4, [tile[0]])
        entry(323, 4, [tile[1]])
        entry(324, 4, [0] * len(strips))
        entry(325, 4, [len(s) for s in strips])
        offs_tag = 324
    else:
        entry(278, 4, [rps])
        entry(273, 4, [0] * len(strips))
        entry(279, 4, [len(s) for s in strips])
        offs_tag = 273
    entries.sort(key=lambda e: e[0])

    header = struct.pack(f"{bo}2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    value_area = 8 + ifd_size
    # first pass: compute out-of-line value offsets
    out_vals = bytearray()
    offsets_map = {}
    for tag, ftype, count, raw in entries:
        if len(raw) > 4:
            offsets_map[tag] = value_area + len(out_vals)
            out_vals += raw + (b"\x00" if len(raw) % 2 else b"")
    data_start = value_area + len(out_vals)
    strip_offsets = []
    pos = data_start
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    # rebuild the chunk-offset entry with real positions
    fmt = f"{bo}I"
    rebuilt = []
    for tag, ftype, count, raw in entries:
        if tag == offs_tag:
            raw = b"".join(struct.pack(fmt, o) for o in strip_offsets)
            if len(raw) > 4:
                # keep the SAME out-of-line slot reserved in pass one
                out_vals[
                    offsets_map[offs_tag] - value_area:
                    offsets_map[offs_tag] - value_area + len(raw)
                ] = raw
        rebuilt.append((tag, ftype, count, raw))

    ifd = struct.pack(f"{bo}H", n)
    for tag, ftype, count, raw in rebuilt:
        cell = raw if len(raw) <= 4 else struct.pack(fmt, offsets_map[tag])
        cell = cell + b"\x00" * (4 - len(cell))
        ifd += struct.pack(f"{bo}HHI", tag, ftype, count) + cell
    ifd += struct.pack(fmt, 0)  # no next IFD
    return header + ifd + bytes(out_vals) + b"".join(strips)
