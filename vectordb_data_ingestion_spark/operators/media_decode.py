"""Pure-stdlib media decoders for the multimodal column convention.

PIL/ffmpeg/torchaudio are not installed in every deployment, but four
bread-and-butter formats need nothing beyond the stdlib:

- PNG  — ``zlib`` inflate of the IDAT stream + per-scanline unfiltering
  (filter types 0-4 per the PNG spec); 8- and 16-bit gray / gray+alpha
  / RGB / RGBA plus 8-bit palette (PLTE), progressive (Adam7) or not —
  each interlace pass unfilters as its own sub-image. Sub-byte depths
  raise with the "use PIL" pointer.
- BMP  — BITMAPINFOHEADER parse + bottom-up 24/32-bpp pixel rows.
- WAV  — the stdlib ``wave`` module (16-bit PCM).
- JPEG — baseline DCT (ITU T.81 SOF0/SOF1): Huffman entropy decode of
  every component for bitstream correctness, dequantize + IDCT of the
  LUMA blocks only (the feature is a luminance histogram — chroma never
  needs reconstruction), restart markers, byte unstuffing. Progressive
  (SOF2), arithmetic coding, and 12-bit precision raise with a "use
  PIL" pointer, same contract as interlaced PNG.
- GIF  — GIF87a/89a first frame: variable-width LSB-first LZW decode,
  global/local palettes, 4-pass interlace; palette entries map to luma
  the same way the RGB decoders do.
- TIFF — baseline TIFF 6.0 first IFD (both byte orders): 8- and
  16-bit gray/RGB plus 8-bit palette-color; chunky or planar; strip-
  or tile-organized (tags 322-325, padded edge tiles cropped on
  placement); uncompressed, PackBits, or LZW (early-change convention,
  Predictor 2 horizontal differencing at sample granularity); CMYK
  (photometric 5) via the profile-less separation formula;
  JPEG-in-TIFF and mask/YCbCr photometrics raise with the "use PIL"
  pointer.

Each decode yields REAL dimensions/duration plus a deterministic
``FEATURE_DIM``-dim feature: an 8-bin luminance histogram for images, an
8-segment RMS envelope for audio — honest, reproducible features that
exercise the same downstream shapes as an embedding model would.
``operators/multimodal.py::extract_features`` sniffs payload magic and
uses these when they apply; unrecognized payloads keep the documented
deterministic stub (synthetic pipelines depend on its shape). Video and
exotic codecs remain stub/lib territory.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

FEATURE_DIM = 8


def sniff_media(content: bytes) -> str | None:
    """'png' | 'bmp' | 'wav' when the payload magic matches, else None."""
    if not content:
        return None
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if content[:2] == b"BM" and len(content) >= 54:
        return "bmp"
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    if content[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    return None


def _luma_hist(lumas, n_bins: int = FEATURE_DIM) -> list[float]:
    hist = [0] * n_bins
    for v in lumas:
        hist[min(n_bins - 1, v * n_bins // 256)] += 1
    total = max(1, len(lumas))
    return [h / total for h in hist]


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 interlace passes: (x0, y0, dx, dy) — each pass is an
# independently filtered sub-image in the single IDAT stream
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def decode_png(content: bytes) -> dict:
    """IHDR dims + unfiltered pixels -> luminance histogram feature."""
    pos, idat = 8, []
    width = height = None
    channels = None
    plte = None
    bit_depth = 8
    interlace = 0
    color_type = None
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4: pos + 8]
        data = content[pos + 8: pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth not in (8, 16) or interlace not in (0, 1):
                raise ValueError(
                    f"unsupported PNG (bit depth {bit_depth}, "
                    f"interlace {interlace}) — use PIL for these"
                )
            if color_type == 3:
                if bit_depth != 8:
                    raise ValueError(
                        "sub-byte palette PNG unsupported — use PIL"
                    )
                channels = 1
            else:
                channels = _PNG_CHANNELS.get(color_type)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {color_type}")
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if color_type == 3 and (not plte or len(plte) % 3):
        raise ValueError("palette PNG missing a valid PLTE chunk")
    from vectordb_data_ingestion_spark.sources.ooxml import bounded_inflate

    # decompression-bomb guard: one crafted ~1000:1 IDAT must not OOM the
    # executor that draws it (same cap as the OOXML/PDF decode paths)
    raw = bounded_inflate(b"".join(idat))
    bps = bit_depth // 8
    px_bytes = channels * bps  # the PNG filter offset ("bpp" in spec)
    # header-vs-data consistency BEFORE any dimension-sized allocation: a
    # crafted IHDR declaring width≈2^31 would otherwise force a multi-GB
    # zero-filled buffer here regardless of how small the IDAT is — the
    # same executor-OOM class bounded_inflate exists to prevent. Zero
    # dims are invalid per the PNG spec AND would bypass the size check
    # below (height=0 makes it vacuous while width-sized line buffers
    # still allocate).
    if width < 1 or height < 1:
        raise ValueError(
            f"PNG declares zero dimension {width}x{height} — "
            "truncated or crafted header"
        )
    # pass geometry: progressive PNGs carry seven independently
    # filtered Adam7 sub-images in the one IDAT stream
    spans = []
    total = 0
    for x0, y0, dx, dy in ([(0, 0, 1, 1)] if interlace == 0 else _ADAM7):
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # tiny images skip whole Adam7 passes
        spans.append((x0, y0, dx, dy, pw, ph))
        total += ph * (1 + pw * px_bytes)
    if total > len(raw):
        raise ValueError(
            f"PNG declares {width}x{height}x{channels}@{bit_depth} "
            f"({total} filtered bytes) but IDAT inflates to only "
            f"{len(raw)} — truncated or crafted header"
        )
    lut = None
    if color_type == 3:
        n_pal = len(plte) // 3
        lut = [
            (plte[3 * i] + plte[3 * i + 1] + plte[3 * i + 2]) // 3
            for i in range(n_pal)
        ]
    lumap = [0] * (width * height)
    off = 0
    for x0, y0, dx, dy, pw, ph in spans:
        stride = pw * px_bytes
        prev = bytearray(stride)
        for r in range(ph):
            ftype = raw[off]
            line = bytearray(raw[off + 1: off + 1 + stride])
            off += 1 + stride
            for i in range(stride):
                a = line[i - px_bytes] if i >= px_bytes else 0
                b = prev[i]
                c = prev[i - px_bytes] if i >= px_bytes else 0
                if ftype == 1:
                    line[i] = (line[i] + a) & 0xFF
                elif ftype == 2:
                    line[i] = (line[i] + b) & 0xFF
                elif ftype == 3:
                    line[i] = (line[i] + (a + b) // 2) & 0xFF
                elif ftype == 4:
                    line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
            y = y0 + r * dy
            row_base = y * width + x0
            for px in range(pw):
                base = px * px_bytes
                if lut is not None:
                    idx = line[base]
                    if idx >= len(lut):
                        raise ValueError(
                            "PNG palette index outside PLTE"
                        )
                    lum = lut[idx]
                elif channels >= 3:
                    # 16-bit samples are big-endian: the sample's first
                    # byte IS the high byte the 8-bit luma needs
                    lum = (
                        line[base] + line[base + bps]
                        + line[base + 2 * bps]
                    ) // 3
                else:
                    lum = line[base]
                lumap[row_base + px * dx] = lum
            prev = line
    return {
        "width": width,
        "height": height,
        "duration_ms": None,
        "feature": _luma_hist(lumap),
    }


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def decode_bmp(content: bytes) -> dict:
    """BITMAPINFOHEADER 24/32-bpp, bottom-up, uncompressed."""
    data_offset = struct.unpack_from("<I", content, 10)[0]
    header_size = struct.unpack_from("<I", content, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp not in (24, 32) or compression != 0:
        raise ValueError(f"unsupported BMP ({bpp}bpp, comp {compression})")
    # width/height are SIGNED: a negative width (or zero dims) is a
    # crafted/corrupt header — without this check the pixel loops run
    # zero iterations and the decode "succeeds" with width=-N garbage
    # metadata instead of raising like every other malformed payload
    if width <= 0 or height == 0:
        raise ValueError(f"BMP declares invalid dimensions {width}x{height}")
    nch = bpp // 8
    row_stride = (width * nch + 3) & ~3
    lumas = []
    for row in range(abs(height)):
        off = data_offset + row * row_stride
        for px in range(width):
            base = off + px * nch
            b, g, r = content[base], content[base + 1], content[base + 2]
            lumas.append((r + g + b) // 3)
    return {
        "width": width,
        "height": abs(height),
        "duration_ms": None,
        "feature": _luma_hist(lumas),
    }


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def decode_wav(content: bytes) -> dict:
    """16-bit PCM via the stdlib wave module: real duration + an
    8-segment RMS envelope as the feature."""
    import array

    with wave.open(io.BytesIO(content), "rb") as w:
        n_frames = w.getnframes()
        rate = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(n_frames)
    if width != 2:
        raise ValueError(f"unsupported WAV sample width {width}")
    samples = array.array("h")
    samples.frombytes(frames[: (len(frames) // 2) * 2])
    if n_ch > 1:  # average channels
        mono = [
            sum(samples[i: i + n_ch]) // n_ch
            for i in range(0, len(samples) - n_ch + 1, n_ch)
        ]
    else:
        mono = list(samples)
    duration_ms = int(n_frames * 1000 / rate) if rate else 0
    seg = max(1, len(mono) // FEATURE_DIM)
    feature = []
    for k in range(FEATURE_DIM):
        chunk = mono[k * seg: (k + 1) * seg]
        if chunk:
            rms = (sum(s * s for s in chunk) / len(chunk)) ** 0.5
            feature.append(round(rms / 32768.0, 9))
        else:
            feature.append(0.0)
    return {
        "width": None,
        "height": None,
        "duration_ms": duration_ms,
        "feature": feature,
    }


# ---------------------------------------------------------------------------
# JPEG (baseline DCT, ITU T.81)
# ---------------------------------------------------------------------------

# zigzag index -> natural (row-major) index
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# pure-python IDCT is ~1.5k float ops per 8x8 block: cap decodable area
# so one huge image can't pin an executor core for minutes (PIL is the
# tier for big assets; this one exists for thumbnails/fixtures)
_JPEG_MAX_PIXELS = 2_000_000


def _build_huffman(bits: list[int], values: bytes) -> dict:
    """Canonical JPEG Huffman table: {(n_bits, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for n in range(1, 17):
        for _ in range(bits[n - 1]):
            table[(n, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _idct_matrix() -> list[list[float]]:
    import math

    return [
        [
            (math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8))
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for u in range(8)
        ]
        for x in range(8)
    ]


_IDCT_M = _idct_matrix()


def _idct_2d(coef: list[float]) -> list[int]:
    """8x8 type-III DCT (row-major in, clamped level-shifted bytes out)."""
    m = _IDCT_M
    tmp = [0.0] * 64
    for y in range(8):  # rows: tmp = coef x M^T
        base = y * 8
        row = coef[base: base + 8]
        for x in range(8):
            mx = m[x]
            tmp[base + x] = (
                row[0] * mx[0] + row[1] * mx[1] + row[2] * mx[2]
                + row[3] * mx[3] + row[4] * mx[4] + row[5] * mx[5]
                + row[6] * mx[6] + row[7] * mx[7]
            )
    out = [0] * 64
    for y in range(8):  # columns: out = M x tmp
        my = m[y]
        for x in range(8):
            s = (
                my[0] * tmp[x] + my[1] * tmp[8 + x] + my[2] * tmp[16 + x]
                + my[3] * tmp[24 + x] + my[4] * tmp[32 + x]
                + my[5] * tmp[40 + x] + my[6] * tmp[48 + x]
                + my[7] * tmp[56 + x]
            )
            v = int(round(s)) + 128
            out[y * 8 + x] = 0 if v < 0 else (255 if v > 255 else v)
    return out


class _JpegBits:
    """Entropy-segment bit reader: FF00 unstuffing; any other marker
    mid-read means a truncated/foreign stream (restart markers are
    consumed explicitly between intervals, never here)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]  # IndexError -> normalized ValueError
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt != 0x00:
                    raise ValueError(
                        f"marker 0xFF{nxt:02X} inside entropy data — "
                        "truncated scan"
                    )
                self.pos += 2
            else:
                self.pos += 1
            self.buf = b
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def huffman(self, table: dict) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy data")

    def align_restart(self, expected: int) -> None:
        """Byte-align and consume the FFD<m> restart marker."""
        self.n = 0
        if (
            self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + expected
        ):
            raise ValueError(
                f"expected restart marker RST{expected}, found "
                f"{self.data[self.pos:self.pos + 2]!r}"
            )
        self.pos += 2


def _extend(v: int, n: int) -> int:
    """T.81 EXTEND: map an n-bit magnitude to its signed value."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def decode_jpeg(content: bytes) -> dict:
    """Baseline (SOF0/SOF1) Huffman JPEG -> dims + luminance-histogram
    feature. Every component's entropy data is decoded (the bitstream
    interleaves them), but only LUMA blocks are dequantized and IDCT'd."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("JPEG missing SOI")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    scan = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, found "
                             f"{content[pos]:#x}")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI before any scan
            break
        (seg_len,) = struct.unpack_from(">H", content, pos + 2)
        body = content[pos + 4: pos + 2 + seg_len]
        if marker == 0xDB:  # DQT: one or more tables
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                if prec == 0:
                    tbl = list(body[i: i + 64])
                    i += 64
                else:
                    tbl = [
                        struct.unpack_from(">H", body, i + 2 * k)[0]
                        for k in range(64)
                    ]
                    i += 128
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT: one or more tables
            i = 0
            while i < len(body):
                tclass, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1: i + 17])
                nvals = sum(bits)
                values = body[i + 17: i + 17 + nvals]
                huff[(tclass, tid)] = _build_huffman(bits, values)
                i += 17 + nvals
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. seq.
            precision = body[0]
            if precision != 8:
                raise ValueError(
                    f"unsupported JPEG precision {precision} — use PIL"
                )
            height, width = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c: 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"width": width, "height": height, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding (SOF marker 0xFF{marker:02X}, "
                "progressive/arithmetic/lossless) — use PIL for these"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tds = body[1 + 2 * c: 3 + 2 * c]
                scan.append({"id": cs, "td": tds >> 4, "ta": tds & 0x0F})
            pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    width, height = frame["width"], frame["height"]
    if width < 1 or height < 1:
        raise ValueError(f"JPEG declares zero dimension {width}x{height}")
    if width * height > _JPEG_MAX_PIXELS:
        raise ValueError(
            f"JPEG {width}x{height} exceeds the pure-python decode cap "
            f"({_JPEG_MAX_PIXELS} px) — use PIL for large assets"
        )
    by_id = {c["id"]: c for c in frame["comps"]}
    for s in scan:
        s.update(by_id[s["id"]])
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if hmax < 1 or vmax < 1:
        raise ValueError("JPEG declares zero sampling factor")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    luma = scan[0]  # first scan component = Y by JFIF convention
    lq = qt.get(luma["tq"])
    if lq is None:
        raise ValueError(f"JPEG missing quant table {luma['tq']}")
    # Y plane, assembled block-by-block; cropped to real dims at the end
    plane_w = mcux * luma["h"] * 8
    rows = [bytearray(plane_w) for _ in range(mcuy * luma["v"] * 8)]

    reader = _JpegBits(content, pos)
    preds = {s["id"]: 0 for s in scan}
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_index = my * mcux + mx
            if restart_interval and mcu_index and (
                mcu_index % restart_interval == 0
            ):
                reader.align_restart(rst)
                rst = (rst + 1) & 7
                preds = {s["id"]: 0 for s in scan}
            for comp in scan:
                dc_tbl = huff.get((0, comp["td"]))
                ac_tbl = huff.get((1, comp["ta"]))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("JPEG missing Huffman table for scan")
                is_luma = comp["id"] == luma["id"]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = [0] * 64
                        n = reader.huffman(dc_tbl)
                        diff = _extend(reader.bits(n), n) if n else 0
                        preds[comp["id"]] += diff
                        zz[0] = preds[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.huffman(ac_tbl)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC run past block end"
                                )
                            zz[k] = _extend(reader.bits(size), size)
                            k += 1
                        if not is_luma:
                            continue  # bitstream consumed; skip IDCT
                        coef = [0.0] * 64
                        for i in range(64):
                            coef[_ZIGZAG[i]] = zz[i] * lq[i]
                        px = _idct_2d(coef)
                        oy = (my * comp["v"] + by) * 8
                        ox = (mx * comp["h"] + bx) * 8
                        for r8 in range(8):
                            rows[oy + r8][ox: ox + 8] = bytes(
                                px[r8 * 8: r8 * 8 + 8]
                            )
    # crop the Y plane to the component's real extent and histogram it
    luma_w = -(-width * luma["h"] // hmax)
    luma_h = -(-height * luma["v"] // vmax)
    lumas = []
    for r in range(luma_h):
        lumas.extend(rows[r][:luma_w])
    return {
        "width": width,
        "height": height,
        "duration_ms": None,
        "feature": _luma_hist(lumas),
    }


# ---------------------------------------------------------------------------
# GIF (87a/89a, first frame)
# ---------------------------------------------------------------------------

_GIF_MAX_PIXELS = 16_000_000  # LZW is cheap; cap crafted-header allocs


def _gif_subblocks(content: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a data-sub-block chain; returns (data, pos_after)."""
    parts = []
    while True:
        size = content[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        parts.append(content[pos: pos + size])
        if len(parts[-1]) != size:
            raise ValueError("GIF sub-block truncated")
        pos += size


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """Variable-width LSB-first GIF LZW (up to 12-bit codes)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit cursor over data, LSB-first
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            raise ValueError("GIF LZW stream truncated")
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    table: dict[int, bytes] = {}
    width = min_code_size + 1
    next_free = end + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            table.clear()
            width = min_code_size + 1
            next_free = end + 1
            prev = None
            continue
        if code == end:
            break
        if code < clear:
            entry = bytes([code])
        elif code in table:
            entry = table[code]
        elif code == next_free and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW invalid code {code}")
        out.extend(entry)
        if prev is not None and next_free < 4096:
            table[next_free] = prev + entry[:1]
            next_free += 1
            if next_free == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_pixels]


def decode_gif(content: bytes) -> dict:
    """First image frame -> dims + palette-luma histogram feature."""
    if len(content) < 13:
        raise ValueError("GIF header truncated")
    screen_w, screen_h = struct.unpack_from("<HH", content, 6)
    flags = content[10]
    pos = 13
    global_palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_palette = content[pos: pos + 3 * n]
        pos += 3 * n
    total_delay_cs = 0
    while pos < len(content):
        block = content[pos]
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-block chain
            label = content[pos + 1] if pos + 1 < len(content) else 0
            pos += 2
            data, pos = _gif_subblocks(content, pos)
            if label == 0xF9 and len(data) >= 4:
                # Graphic Control: delay in centiseconds (little-endian)
                total_delay_cs += data[1] | (data[2] << 8)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block {block:#x}")
        left, top, w, h = struct.unpack_from("<HHHH", content, pos + 1)
        iflags = content[pos + 9]
        pos += 10
        palette = global_palette
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            palette = content[pos: pos + 3 * n]
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF frame has no palette")
        if w < 1 or h < 1:
            raise ValueError(f"GIF declares zero dimension {w}x{h}")
        if w * h > _GIF_MAX_PIXELS:
            raise ValueError(
                f"GIF {w}x{h} exceeds the decode cap "
                f"({_GIF_MAX_PIXELS} px)"
            )
        min_code = content[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"GIF LZW min code size {min_code} invalid")
        data, pos = _gif_subblocks(content, pos)
        indices = _lzw_decode(data, min_code, w * h)
        if len(indices) < w * h:
            raise ValueError("GIF pixel data short of declared raster")
        # palette index -> luma (same (r+g+b)//3 rule as BMP/PNG-RGB)
        n_pal = len(palette) // 3
        pal_luma = [
            (palette[3 * i] + palette[3 * i + 1] + palette[3 * i + 2]) // 3
            for i in range(n_pal)
        ]
        if iflags & 0x40:  # 4-pass interlace: reorder rows
            order = (
                list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2))
            )
            rows = [None] * h
            for src, dst in enumerate(order):
                rows[dst] = indices[src * w: (src + 1) * w]
            indices = bytearray().join(bytes(r) for r in rows)
        try:
            lumas = [pal_luma[i] for i in indices]
        except IndexError:
            raise ValueError("GIF pixel index outside palette") from None
        # animated metadata: BEST-EFFORT scan of the remaining blocks
        # for more frames + their Graphic Control delays — the first
        # frame already decoded, so a malformed tail degrades to
        # single-frame metadata instead of failing the whole payload
        n_frames = 1
        try:
            while pos < len(content):
                block = content[pos]
                if block == 0x3B:
                    break
                if block == 0x21:
                    label = (
                        content[pos + 1] if pos + 1 < len(content) else 0
                    )
                    pos += 2
                    data, pos = _gif_subblocks(content, pos)
                    if label == 0xF9 and len(data) >= 4:
                        total_delay_cs += data[1] | (data[2] << 8)
                    continue
                if block != 0x2C:
                    break
                fflags = content[pos + 9]
                pos += 10
                if fflags & 0x80:
                    pos += 3 * (2 << (fflags & 0x07))
                pos += 1  # LZW min code size
                _, pos = _gif_subblocks(content, pos)
                n_frames += 1
        except (ValueError, IndexError, struct.error):
            pass
        return {
            # the FRAME raster is what was decoded; screen dims can be
            # larger (frame offsets) — report the screen like real
            # viewers do, falling back to the frame when absent
            "width": screen_w or w,
            "height": screen_h or h,
            # animated GIFs report the loop's total play time; still
            # images keep the image convention (None)
            "duration_ms": (
                total_delay_cs * 10 if n_frames > 1 else None
            ),
            "feature": _luma_hist(lumas),
        }
    raise ValueError("GIF contains no image frame")


# ---------------------------------------------------------------------------
# TIFF (baseline 6.0, first IFD)
# ---------------------------------------------------------------------------

_TIFF_MAX_PIXELS = 16_000_000

# field type -> byte size (the ones baseline files use)
_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _packbits(data: bytes, expect: int) -> bytearray:
    """TIFF PackBits (Apple RLE): n in 0..127 -> copy n+1 literal bytes;
    n in -127..-1 -> repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i: i + n + 1]
            if i + n + 1 > len(data):
                raise ValueError("PackBits literal run truncated")
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("PackBits repeat run truncated")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return out


def _tiff_lzw(data: bytes, expect: int) -> bytearray:
    """TIFF 6.0 §13 LZW: MSB-first bit packing, ClearCode 256, EOI 257,
    first multi-byte code 258, 9→12-bit widths with the EARLY-CHANGE
    convention every real writer (LibTIFF) uses — the code width grows
    when the NEXT table slot to be assigned is ``2^width - 1``, one
    code earlier than a literal reading of the spec (the documented
    LibTIFF off-by-one that became the de-facto format)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None
    i = 0
    while len(out) < expect:
        while nbits < width:
            if i >= len(data):
                raise ValueError("TIFF LZW stream truncated")
            buf = (buf << 8) | data[i]
            nbits += 8
            i += 1
        code = (buf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == EOI:
            break
        if code == CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if code < len(table) and (code < 256 or code > 257):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"TIFF LZW code {code} out of sequence")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # EARLY CHANGE: the encoder's table is always ONE entry ahead
        # (it assigns the entry for code k when emitting k; the decoder
        # can only build it after reading k+1), and the encoder widens
        # when ITS next slot hits 2^width - 1 — so the decoder widens at
        # len(table) == 2^width - 2, one code before table parity says.
        # This deliberate off-by-one IS the "early change" convention
        # every real writer follows. 12-bit tables stop growing
        # (writers emit Clear at 4094).
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    return out


def _tiff_predictor2(
    strip: bytearray, width: int, n_rows: int, spp: int
) -> bytearray:
    """TIFF Predictor 2 (tag 317): horizontal differencing — each
    sample stores the delta to the sample ``spp`` positions earlier in
    its row; undo by a running per-channel sum, modulo 256."""
    stride = width * spp
    for r in range(n_rows):
        base = r * stride
        for j in range(spp, stride):
            strip[base + j] = (strip[base + j] + strip[base + j - spp]) % 256
    return strip


def _tiff_predictor2_16(
    strip: bytearray, width: int, n_rows: int, spp: int, byteorder: str
) -> bytearray:
    """Predictor 2 for 16-bit samples: differencing operates on SAMPLE
    values (mod 65536), so it must be undone at 16-bit granularity — in
    the file's byte order — before any downscale to 8 bits."""
    stride = width * spp
    for r in range(n_rows):
        base = r * stride
        for j in range(spp, stride):
            o = (base + j) * 2
            po = (base + j - spp) * 2
            v = (
                int.from_bytes(strip[o: o + 2], byteorder)
                + int.from_bytes(strip[po: po + 2], byteorder)
            ) & 0xFFFF
            strip[o: o + 2] = v.to_bytes(2, byteorder)
    return strip


def decode_tiff(content: bytes) -> dict:
    """First IFD, strip-organized 8-bit gray/RGB/palette-color, chunky
    or planar, compression none/LZW/PackBits, predictor none/horizontal
    -> dims + luminance-histogram feature."""
    if content[:4] == b"II*\x00":
        bo = "<"
    elif content[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("TIFF missing byte-order header")
    (ifd_off,) = struct.unpack_from(f"{bo}I", content, 4)
    if ifd_off + 2 > len(content):
        raise ValueError("TIFF IFD offset past EOF")
    (n_entries,) = struct.unpack_from(f"{bo}H", content, ifd_off)
    tags: dict[int, list[int]] = {}
    for e in range(n_entries):
        off = ifd_off + 2 + 12 * e
        tag, ftype, count = struct.unpack_from(f"{bo}HHI", content, off)
        size = _TIFF_TYPE_SIZE.get(ftype)
        if size is None:
            continue  # exotic field types: irrelevant to the raster tags
        total = size * count
        if total <= 4:
            voff = off + 8
        else:
            (voff,) = struct.unpack_from(f"{bo}I", content, off + 8)
        if voff + total > len(content):
            raise ValueError(f"TIFF tag {tag} value past EOF")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I", 5: "II"}[ftype]
        if ftype == 5:  # rational: keep the numerator, enough for dims
            vals = [
                struct.unpack_from(f"{bo}II", content, voff + 8 * i)[0]
                for i in range(count)
            ]
        else:
            vals = [
                struct.unpack_from(f"{bo}{fmt}", content, voff + size * i)[0]
                for i in range(count)
            ]
        tags[tag] = vals

    def one(tag: int, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    width = one(256)
    height = one(257)
    if not width or not height:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    if width * height > _TIFF_MAX_PIXELS:
        raise ValueError(
            f"TIFF {width}x{height} exceeds the decode cap "
            f"({_TIFF_MAX_PIXELS} px)"
        )
    compression = one(259, 1)
    if compression not in (1, 5, 32773):
        raise ValueError(
            f"unsupported TIFF compression {compression} — use PIL"
        )
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise ValueError(
            f"unsupported TIFF predictor {predictor} — use PIL"
        )
    tiled = any(t in tags for t in (322, 323, 324, 325))
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if (
        not bits
        or any(b != bits[0] for b in bits)
        or bits[0] not in (8, 16)
        or spp not in (1, 3, 4)
    ):
        raise ValueError(
            f"unsupported TIFF sample layout (bits {bits}, {spp} spp) "
            "— use PIL"
        )
    bps = bits[0] // 8  # bytes per sample (8- or 16-bit, uniform)
    # PlanarConfiguration (284): 1 = chunky (RGBRGB...), 2 = planar
    # (each strip holds ONE component; all plane-0 strips first). For
    # spp=1 the two are identical. Anything else refuses loudly — the
    # strip reader would mis-interpret it into a silently wrong
    # luminance otherwise.
    planar = one(284, 1)
    if planar not in (1, 2):
        raise ValueError(
            f"TIFF planar configuration {planar} unsupported — use PIL"
        )
    planar = planar == 2 and spp > 1
    photometric = one(262, 1)
    if photometric not in (0, 1, 2, 3, 5):
        raise ValueError(
            f"unsupported TIFF photometric {photometric} "
            "(mask/YCbCr) — use PIL"
        )
    if photometric == 5 and spp != 4:
        raise ValueError(
            f"CMYK TIFF with {spp} samples per pixel — use PIL"
        )
    colormap = None
    if photometric == 3:
        # TIFF 6.0 palette-color: spp=1, ColorMap (tag 320) holds
        # 3 * 2^bits SHORTs — all reds, then all greens, then all
        # blues, each 0..65535
        colormap = tags.get(320)
        if (
            spp != 1 or bps != 1 or colormap is None
            or len(colormap) < 3 * 256
        ):
            raise ValueError(
                "palette TIFF without a full 8-bit ColorMap — use PIL"
            )
    # chunky: a single interleaved raster; planar: one raster per
    # component plane (all plane-0 chunks come first in the table)
    strip_spp = 1 if planar else spp
    n_planes = spp if planar else 1
    byteorder = "big" if bo == ">" else "little"

    def decompress(chunk: bytes, expect: int, idx: int) -> bytes:
        if compression == 32773:
            chunk = _packbits(chunk, expect)
        elif compression == 5:
            chunk = _tiff_lzw(chunk, expect)
        if len(chunk) < expect:
            raise ValueError(f"TIFF chunk {idx} short of declared size")
        return chunk[:expect]

    def unpredict(chunk: bytes, cwidth: int, crows: int) -> bytes:
        if predictor != 2:
            return chunk
        if bps == 2:
            return _tiff_predictor2_16(
                bytearray(chunk), cwidth, crows, strip_spp, byteorder
            )
        return _tiff_predictor2(bytearray(chunk), cwidth, crows, strip_spp)

    if tiled:
        tw, th = one(322), one(323)
        toffs = tags.get(324)
        tcounts = tags.get(325)
        if (
            not tw or not th or not toffs or not tcounts
            or len(toffs) != len(tcounts)
        ):
            raise ValueError("tiled TIFF missing/mismatched tile tables")
        across = -(-width // tw)
        down = -(-height // th)
        if (across * tw) * (down * th) > _TIFF_MAX_PIXELS:
            raise ValueError(
                f"tiled TIFF {across * tw}x{down * th} padded grid "
                f"exceeds the decode cap ({_TIFF_MAX_PIXELS} px)"
            )
        per_plane = across * down
        if len(toffs) != n_planes * per_plane:
            raise ValueError(
                f"tiled TIFF tile table does not cover {n_planes} "
                f"planes x {per_plane} tiles"
            )
        rasters = [
            bytearray(width * height * strip_spp * bps)
            for _ in range(n_planes)
        ]
        # tiles are ALWAYS tw x th samples — edge tiles carry padding
        # that is decoded then cropped on placement
        for t, (so, sc) in enumerate(zip(toffs, tcounts)):
            if so + sc > len(content):
                raise ValueError(f"TIFF tile {t} past EOF")
            tile = decompress(
                content[so: so + sc], tw * th * strip_spp * bps, t
            )
            tile = unpredict(tile, tw, th)
            ty, tx = divmod(t % per_plane, across)
            y0, x0 = ty * th, tx * tw
            rows = min(th, height - y0)
            cols = min(tw, width - x0)
            if rows <= 0 or cols <= 0:
                raise ValueError(f"TIFF tile {t} outside the image grid")
            dst = rasters[t // per_plane]
            sb = strip_spp * bps  # bytes per pixel within this chunk
            for r in range(rows):
                srow = r * tw * sb
                drow = ((y0 + r) * width + x0) * sb
                dst[drow: drow + cols * sb] = tile[srow: srow + cols * sb]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF missing/mismatched strip tables")
        rows_per_strip = one(278, height)
        strips_per_plane = -(-height // max(1, rows_per_strip))
        if planar and len(offsets) != spp * strips_per_plane:
            raise ValueError(
                "planar TIFF strip table does not cover "
                f"{spp} planes x {strips_per_plane} strips"
            )
        rasters = [bytearray() for _ in range(n_planes)]
        expect_plane = width * height * strip_spp * bps
        for s, (so, sc) in enumerate(zip(offsets, counts)):
            if so + sc > len(content):
                raise ValueError(f"TIFF strip {s} past EOF")
            block = s % strips_per_plane if planar else s
            n_rows = min(rows_per_strip, height - block * rows_per_strip)
            strip = decompress(
                content[so: so + sc], width * n_rows * strip_spp * bps, s
            )
            # horizontal differencing undone per strip row; in a planar
            # strip each row holds ONE component, so the delta stride is
            # the strip's samples-per-pixel, not the image's
            strip = unpredict(strip, width, n_rows)
            rasters[s // strips_per_plane if planar else 0] += strip
        if any(len(r) < expect_plane for r in rasters):
            raise ValueError("TIFF strips short of declared raster")
    if bps == 2:
        # 16-bit samples downscale to their high byte (the luminance
        # feature is 8-bit); predictors were already undone at 16-bit
        # sample granularity above
        hi = 0 if bo == ">" else 1
        rasters = [bytearray(r[hi::2]) for r in rasters]
    raster = rasters[0]
    expect_total = width * height * spp
    lumas = []
    if colormap is not None:
        # 16-bit palette channels -> 8-bit mean luma per index, built
        # once (256 entries), then a table lookup per pixel
        lut = [
            (colormap[i] + colormap[256 + i] + colormap[512 + i]) // 3 >> 8
            for i in range(256)
        ]
        lumas = [lut[v] for v in raster]
    elif spp == 1:
        lumas = list(raster)
        if photometric == 0:  # WhiteIsZero: invert
            lumas = [255 - v for v in lumas]
    elif photometric == 5:
        # CMYK (no ICC profile): R = (255-C)(255-K)/255 etc.; luma is
        # the RGB mean — the same naive conversion PIL uses without a
        # profile
        def cmyk_luma(c, m, y, k):
            kk = 255 - k
            return (
                (255 - c) * kk // 255
                + (255 - m) * kk // 255
                + (255 - y) * kk // 255
            ) // 3

        if planar:
            pc, pm, py, pk = rasters[:4]
            lumas = [
                cmyk_luma(pc[i], pm[i], py[i], pk[i])
                for i in range(width * height)
            ]
        else:
            for i in range(0, expect_total, 4):
                lumas.append(
                    cmyk_luma(
                        raster[i], raster[i + 1],
                        raster[i + 2], raster[i + 3],
                    )
                )
    elif planar:
        r, g, b = rasters[0], rasters[1], rasters[2]
        lumas = [
            (r[i] + g[i] + b[i]) // 3 for i in range(width * height)
        ]
    else:
        for i in range(0, expect_total, spp):
            lumas.append(
                (raster[i] + raster[i + 1] + raster[i + 2]) // 3
            )
    return {
        "width": width,
        "height": height,
        "duration_ms": None,
        "feature": _luma_hist(lumas),
    }


_DECODERS = {
    "png": decode_png,
    "bmp": decode_bmp,
    "wav": decode_wav,
    "jpeg": decode_jpeg,
    "gif": decode_gif,
    "tiff": decode_tiff,
}


def decode_media(content: bytes) -> dict | None:
    """Real decode when the payload magic matches a supported format,
    else None (caller falls back to its stub/lib tier). Malformed or
    truncated payloads of a recognized format raise ValueError (parse
    errors are normalized so callers need one except clause)."""
    kind = sniff_media(content)
    if kind is None:
        return None
    try:
        return _DECODERS[kind](content)
    except ValueError:
        raise
    except Exception as e:  # noqa: BLE001 - decoder boundary: the stdlib
        # modules raise a zoo of types on truncated payloads (wave.Error,
        # EOFError, and RuntimeError from chunk alignment; zlib.error;
        # struct.error; IndexError past a short scanline) — normalize ALL
        # of them so callers keep the documented one-except contract
        raise ValueError(f"malformed {kind} payload: {e}") from e
