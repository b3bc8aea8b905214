"""Pure-stdlib media decoders for the multimodal column convention.

PIL/ffmpeg/torchaudio are not installed in every deployment, but three
bread-and-butter formats need nothing beyond the stdlib:

- PNG  — ``zlib`` inflate of the IDAT stream + per-scanline unfiltering
  (filter types 0-4 per the PNG spec); 8-bit gray / gray+alpha / RGB /
  RGBA, non-interlaced.
- BMP  — BITMAPINFOHEADER parse + bottom-up 24/32-bpp pixel rows.
- WAV  — the stdlib ``wave`` module (16-bit PCM).

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


def decode_png(content: bytes) -> dict:
    """IHDR dims + unfiltered pixels -> luminance histogram feature."""
    pos, idat = 8, []
    width = height = None
    channels = None
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4: pos + 8]
        data = content[pos + 8: pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (bit depth {bit_depth}, "
                    f"interlace {interlace}) — use PIL for these"
                )
            channels = _PNG_CHANNELS.get(color_type)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {color_type}")
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    from vectordb_data_ingestion_spark.sources.ooxml import bounded_inflate

    # decompression-bomb guard: one crafted ~1000:1 IDAT must not OOM the
    # executor that draws it (same cap as the OOXML/PDF decode paths)
    raw = bounded_inflate(b"".join(idat))
    stride = width * channels
    # header-vs-data consistency BEFORE any dimension-sized allocation: a
    # crafted IHDR declaring width≈2^31 would otherwise force a multi-GB
    # zero-filled bytearray here regardless of how small the IDAT is —
    # the same executor-OOM class bounded_inflate exists to prevent.
    # zero dims are invalid per the PNG spec AND would bypass the
    # height-scaled check below (height=0 makes it vacuous while the
    # width-sized line buffers still allocate)
    if width < 1 or height < 1:
        raise ValueError(
            f"PNG declares zero dimension {width}x{height} — "
            "truncated or crafted header"
        )
    if height * (stride + 1) > len(raw):
        raise ValueError(
            f"PNG declares {width}x{height}x{channels} "
            f"({height * (stride + 1)} filtered bytes) but IDAT inflates "
            f"to only {len(raw)} — truncated or crafted header"
        )
    prev = bytearray(stride)
    lumas = []
    for row in range(height):
        off = row * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1: off + 1 + stride])
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ftype == 1:
                line[i] = (line[i] + a) & 0xFF
            elif ftype == 2:
                line[i] = (line[i] + b) & 0xFF
            elif ftype == 3:
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif ftype == 4:
                line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
        for px in range(width):
            base = px * channels
            if channels >= 3:
                lum = (line[base] + line[base + 1] + line[base + 2]) // 3
            else:
                lum = line[base]
            lumas.append(lum)
        prev = line
    return {
        "width": width,
        "height": height,
        "duration_ms": None,
        "feature": _luma_hist(lumas),
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


_DECODERS = {"png": decode_png, "bmp": decode_bmp, "wav": decode_wav}


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
