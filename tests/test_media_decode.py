"""Golden tests for the pure-stdlib media decoders
(operators/media_decode.py): PNG/BMP/WAV fixtures are synthesized
in-test with the stdlib (a tiny PNG encoder with per-row filters, a
24bpp BMP writer, the wave module), so real decode runs in every
environment — no PIL/ffmpeg."""

import io
import struct
import wave
import zlib

import pytest

from vectordb_data_ingestion_spark.operators.media_decode import (
    decode_bmp,
    decode_media,
    decode_png,
    decode_wav,
    sniff_media,
)


def make_png(pixels, color_type=2, filters=None):
    """pixels: rows of (r,g,b[,a]) tuples or ints (gray)."""
    height = len(pixels)
    width = len(pixels[0])
    nch = {0: 1, 2: 3, 6: 4}[color_type]
    raw = bytearray()
    for r, row in enumerate(pixels):
        ftype = (filters or [0] * height)[r]
        flat = bytearray()
        for px in row:
            flat.extend(px if isinstance(px, (tuple, list)) else (px,))
        if ftype == 0:
            filtered = flat
        elif ftype == 1:  # Sub
            filtered = bytearray(
                (flat[i] - (flat[i - nch] if i >= nch else 0)) & 0xFF
                for i in range(len(flat))
            )
        elif ftype == 2:  # Up
            prev = raw_rows[r - 1] if r else bytearray(len(flat))
            filtered = bytearray(
                (flat[i] - prev[i]) & 0xFF for i in range(len(flat))
            )
        else:
            raise NotImplementedError
        raw.append(ftype)
        raw.extend(filtered)
        if r == 0:
            raw_rows = {0: flat}
        else:
            raw_rows[r] = flat

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


_ADAM7_EMIT = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def make_png_adv(sample_rows, color_type, bit_depth=8, interlace=0,
                 palette=None):
    """Independent producer for the advanced PNG shapes: 16-bit samples
    (big-endian), Adam7 interlace (each pass serialized as its own
    filtered sub-image), and palette (color type 3 + PLTE). Every
    second row of each pass uses the Sub filter so per-pass filter
    state is actually exercised."""
    height, width = len(sample_rows), len(sample_rows[0])
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bps = bit_depth // 8
    px_bytes = nch * bps

    def flat_row(row):
        out = bytearray()
        for px in row:
            vals = px if isinstance(px, (tuple, list)) else (px,)
            for v in vals:
                out += int(v).to_bytes(bps, "big")
        return out

    def serialize(rows_subset):
        raw = bytearray()
        for i, row in enumerate(rows_subset):
            flat = flat_row(row)
            if i % 2:  # Sub filter
                raw.append(1)
                raw += bytearray(
                    (flat[j] - (flat[j - px_bytes] if j >= px_bytes
                                else 0)) & 0xFF
                    for j in range(len(flat))
                )
            else:
                raw.append(0)
                raw += flat
        return raw

    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7_EMIT:
            sub = [
                [sample_rows[y][x] for x in range(x0, width, dx)]
                for y in range(y0, height, dy)
            ]
            sub = [r for r in sub if r]
            if sub:
                raw += serialize(sub)
    else:
        raw = serialize(sample_rows)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace
    )
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(
            b"PLTE",
            b"".join(bytes(rgb) for rgb in palette),
        )
    return (
        out
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def make_bmp(pixels):
    """24bpp bottom-up BMP from rows of (r,g,b)."""
    height, width = len(pixels), len(pixels[0])
    stride = (width * 3 + 3) & ~3
    body = bytearray()
    for row in pixels:  # stored bottom-up; luma is order-invariant here
        line = bytearray()
        for r, g, b in row:
            line.extend((b, g, r))
        line.extend(b"\x00" * (stride - len(line)))
        body.extend(line)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835,
        0, 0,
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    )
    return header + info + bytes(body)


def make_wav(samples, rate=8000, channels=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(struct.pack("<h", s) for s in samples)
        )
    return buf.getvalue()


def test_sniff_magic():
    assert sniff_media(make_wav([0] * 10)) == "wav"
    assert sniff_media(make_bmp([[(0, 0, 0)]])) == "bmp"
    assert sniff_media(make_png([[(0, 0, 0)]])) == "png"
    assert sniff_media(b"plain text payload") is None
    assert sniff_media(b"") is None


def test_png_decode_dims_filters_and_histogram():
    # 4x2 RGB: one black row (filter Sub), one white row (filter Up)
    png = make_png(
        [[(0, 0, 0)] * 4, [(255, 255, 255)] * 4], filters=[1, 2]
    )
    meta = decode_png(png)
    assert (meta["width"], meta["height"]) == (4, 2)
    assert meta["duration_ms"] is None
    # half the pixels in the darkest bin, half in the brightest
    assert meta["feature"][0] == pytest.approx(0.5)
    assert meta["feature"][-1] == pytest.approx(0.5)
    # grayscale color type decodes too
    gray = make_png([[0, 128], [128, 255]], color_type=0)
    g = decode_png(gray)
    assert (g["width"], g["height"]) == (2, 2)
    assert sum(g["feature"]) == pytest.approx(1.0)


def test_bmp_decode():
    bmp = make_bmp([[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]])
    meta = decode_bmp(bmp)
    assert (meta["width"], meta["height"]) == (2, 2)
    # three mid-luma pixels (85) and one white
    assert meta["feature"][2] == pytest.approx(0.75)
    assert meta["feature"][-1] == pytest.approx(0.25)


def test_wav_decode_duration_and_rms_envelope():
    # 0.5 s at 8 kHz: silence then a loud square wave
    samples = [0] * 2000 + [16384, -16384] * 1000
    meta = decode_wav(make_wav(samples, rate=8000))
    assert meta["duration_ms"] == 500
    assert meta["width"] is None
    assert meta["feature"][0] == pytest.approx(0.0)    # silent start
    assert meta["feature"][-1] == pytest.approx(0.5, abs=1e-6)  # square RMS
    # stereo averages to mono
    stereo = make_wav([1000, 1000] * 100, rate=8000, channels=2)
    assert decode_wav(stereo)["duration_ms"] == 12


def test_decode_media_dispatch_and_errors():
    assert decode_media(b"not media") is None
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40)
    with pytest.raises(ValueError):
        # 16-bit depth unsupported -> ValueError from the decoder itself
        bad_ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
        chunk = (
            struct.pack(">I", len(bad_ihdr)) + b"IHDR" + bad_ihdr
            + struct.pack(
                ">I", zlib.crc32(b"IHDR" + bad_ihdr) & 0xFFFFFFFF
            )
        )
        decode_media(b"\x89PNG\r\n\x1a\n" + chunk)


def test_png_crafted_header_rejected_before_allocation():
    """A tiny PNG declaring ~2^30 x 2^30 RGBA must raise on the
    header/data consistency check instead of allocating multi-GB
    dimension-sized buffers on the executor (advice r5 — the same OOM
    class the decompression-bomb guard covers)."""
    ihdr = struct.pack(">IIBBBBB", 1 << 30, 1 << 30, 8, 6, 0, 0, 0)
    idat = zlib.compress(b"\x00\x00\x00\x00\x00")  # 1 filtered byte + px
    png = b"\x89PNG\r\n\x1a\n"
    for ctype, data in ((b"IHDR", ihdr), (b"IDAT", idat), (b"IEND", b"")):
        png += (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )
    with pytest.raises(ValueError, match="truncated or crafted"):
        decode_png(png)


def test_png_zero_height_huge_width_rejected():
    """height=0 makes the height-scaled consistency check vacuous while
    the width-sized line buffers still allocate — a crafted
    2^31-wide x 0-tall RGBA header must be rejected outright (zero dims
    are invalid per the PNG spec)."""
    ihdr = struct.pack(">IIBBBBB", (1 << 31) - 1, 0, 8, 6, 0, 0, 0)
    idat = zlib.compress(b"")
    png = b"\x89PNG\r\n\x1a\n"
    for ctype, data in ((b"IHDR", ihdr), (b"IDAT", idat), (b"IEND", b"")):
        png += (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )
    with pytest.raises(ValueError, match="zero dimension"):
        decode_png(png)


def test_extract_features_real_and_stub_paths(spark):
    """The mapInPandas featurizer serves REAL dims/features for media
    payloads and the deterministic stub for everything else, in one
    batch."""
    from vectordb_data_ingestion_spark.operators.multimodal import (
        _stub_decode,
        extract_features,
    )

    png = make_png([[(0, 0, 0)] * 3, [(255, 255, 255)] * 3])
    wav = make_wav([0] * 800, rate=8000)
    blob = b"synthetic payload, not a media container"
    assets = spark.createDataFrame(
        [(1, "image", png), (2, "audio", wav), (3, "image", blob)],
        "asset_id long, modality string, content binary",
    )
    rows = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (3, 2)
    assert rows[2]["duration_ms"] == 100
    stub = _stub_decode(blob, "image")
    assert rows[3]["width"] == stub["width"]
    assert list(rows[3]["feature"]) == pytest.approx(stub["feature"])


def test_bmp_invalid_dimensions_raise():
    """A crafted header declaring negative width (or zero dims) must raise
    like any other malformed payload — before the r6 guard the pixel loops
    ran zero iterations and decode 'succeeded' with width=-N metadata."""
    good = bytearray(make_bmp([[(1, 2, 3)]]))
    neg_w = bytearray(good)
    struct.pack_into("<i", neg_w, 18, -4)
    zero_h = bytearray(good)
    struct.pack_into("<i", zero_h, 22, 0)
    for bad in (neg_w, zero_h):
        with pytest.raises(ValueError, match="invalid dimensions"):
            decode_bmp(bytes(bad))


# ---------------------------------------------------------------------------
# JPEG (baseline) — goldens from the independent emitter (tests/jpeg_emitter)
# ---------------------------------------------------------------------------


def _hist8(lumas):
    hist = [0] * 8
    for v in lumas:
        hist[min(7, v * 8 // 256)] += 1
    t = max(1, len(lumas))
    return [h / t for h in hist]


def _l1(a, b):
    return sum(abs(x - y) for x, y in zip(a, b))


def test_jpeg_gray_roundtrip_near_lossless():
    """Q=1 grayscale: dims exact, luminance histogram within a tight L1
    of the source's (the only loss is FDCT/IDCT float rounding)."""
    from tests.jpeg_emitter import encode_jpeg
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
        sniff_media,
    )

    w, h = 32, 24
    pixels = [(x * 8 + y * 3) % 256 for y in range(h) for x in range(w)]
    payload = encode_jpeg(pixels, w, h, mode="L", quant_value=1)
    assert sniff_media(payload) == "jpeg"
    meta = decode_media(payload)
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["duration_ms"] is None
    assert abs(sum(meta["feature"]) - 1.0) < 1e-9
    assert _l1(meta["feature"], _hist8(pixels)) < 0.02


def test_jpeg_flat_image_exact_histogram():
    from tests.jpeg_emitter import encode_jpeg
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    payload = encode_jpeg([200] * (16 * 16), 16, 16, mode="L")
    meta = decode_media(payload)
    assert meta["feature"][200 * 8 // 256] == 1.0
    assert sum(meta["feature"]) == 1.0


def test_jpeg_rgb_and_odd_dims():
    """RGB 4:4:4 through the JFIF YCbCr transform, dims not multiples of
    8 (partial edge blocks cropped out of the histogram)."""
    from tests.jpeg_emitter import encode_jpeg
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    w, h = 21, 13
    rgb = []
    lum = []
    for y in range(h):
        for x in range(w):
            r, g, b = (x * 11) % 256, (y * 17) % 256, ((x + y) * 7) % 256
            rgb += [r, g, b]
            lum.append(
                min(255, max(0, round(0.299 * r + 0.587 * g + 0.114 * b)))
            )
    payload = encode_jpeg(rgb, w, h, mode="RGB", quant_value=1)
    meta = decode_media(payload)
    assert (meta["width"], meta["height"]) == (w, h)
    assert _l1(meta["feature"], _hist8(lum)) < 0.03


def test_jpeg_restart_markers():
    """A DRI interval forces RST markers mid-scan: the decoder must
    byte-align, consume them, and reset DC predictions."""
    from tests.jpeg_emitter import encode_jpeg
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    w, h = 40, 16  # 5x2 MCUs -> several restarts at interval 2
    pixels = [(x * 5 + y * 9) % 256 for y in range(h) for x in range(w)]
    plain = encode_jpeg(pixels, w, h, mode="L", quant_value=1)
    with_rst = encode_jpeg(
        pixels, w, h, mode="L", quant_value=1, restart_interval=2
    )
    assert b"\xff\xd0" in with_rst  # the path really exercises RSTs
    a = decode_media(plain)
    b = decode_media(with_rst)
    assert a["feature"] == b["feature"]
    assert (b["width"], b["height"]) == (w, h)


def test_jpeg_lossy_quant_still_close():
    from tests.jpeg_emitter import encode_jpeg
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    w, h = 24, 24
    # smooth ramp: quantization ringing must not smear a gradient's
    # histogram (a sharp sawtooth would legitimately shift bin-boundary
    # pixels — that is lossy JPEG working as specified, not a bug)
    pixels = [
        (x * 255 // (w - 1) + y * 64 // (h - 1)) * 255 // 319
        for y in range(h) for x in range(w)
    ]
    payload = encode_jpeg(pixels, w, h, mode="L", quant_value=16)
    meta = decode_media(payload)
    assert (meta["width"], meta["height"]) == (w, h)
    assert _l1(meta["feature"], _hist8(pixels)) < 0.15


def test_jpeg_malformed_and_unsupported():
    import pytest as _pt

    from tests.jpeg_emitter import encode_jpeg
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    good = encode_jpeg([128] * 64, 8, 8, mode="L")
    with _pt.raises(ValueError):
        decode_media(good[: len(good) // 2])  # truncated mid-scan
    # progressive SOF2 refuses with the lib pointer
    prog = bytearray(good)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    with _pt.raises(ValueError, match="use PIL"):
        decode_media(bytes(prog))
    # a crafted SOF declaring a huge raster refuses BEFORE allocating
    big = bytearray(good)
    sof = big.index(b"\xff\xc0")
    import struct as _s
    _s.pack_into(">HH", big, sof + 5, 30_000, 30_000)
    with _pt.raises(ValueError, match="cap"):
        decode_media(bytes(big))


# ---------------------------------------------------------------------------
# GIF — goldens from the independent emitter (tests/gif_emitter)
# ---------------------------------------------------------------------------


def test_gif_roundtrip_exact():
    """Grayscale-identity palette + lossless LZW: the decoded luminance
    histogram must EQUAL the source's (GIF is lossless, unlike JPEG)."""
    from tests.gif_emitter import encode_gif
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
        sniff_media,
    )

    w, h = 37, 23  # odd dims; content crosses several LZW width bumps
    lumas = [(x * 7 + y * 13) % 256 for y in range(h) for x in range(w)]
    payload = encode_gif(lumas, w, h)
    assert sniff_media(payload) == "gif"
    meta = decode_media(payload)
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["duration_ms"] is None
    assert meta["feature"] == _hist8(lumas)


def test_gif_interlaced_matches_progressive():
    from tests.gif_emitter import encode_gif
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    w, h = 16, 19
    lumas = [(x * 31 + y * 3) % 256 for y in range(h) for x in range(w)]
    plain = decode_media(encode_gif(lumas, w, h, interlace=False))
    laced = decode_media(encode_gif(lumas, w, h, interlace=True))
    assert plain["feature"] == laced["feature"] == _hist8(lumas)


def test_gif_long_run_exercises_dictionary_growth():
    """A large smooth image pushes LZW through many width bumps and
    chunked clears; losslessness must hold bit-exactly."""
    from tests.gif_emitter import encode_gif
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    w, h = 100, 60
    lumas = [((x // 3) * 2 + (y // 5)) % 256 for y in range(h)
             for x in range(w)]
    meta = decode_media(encode_gif(lumas, w, h))
    assert meta["feature"] == _hist8(lumas)


def test_gif_malformed():
    import pytest as _pt

    from tests.gif_emitter import encode_gif
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    good = encode_gif([128] * 64, 8, 8)
    with _pt.raises(ValueError):
        decode_media(good[:20])  # truncated past the header
    # no image frame at all: header + trailer only
    no_frame = good[:13 + 768] + b"\x3b"
    with _pt.raises(ValueError, match="no image frame"):
        decode_media(no_frame)
    # crafted frame dims past the cap refuse before allocation; the
    # descriptor sits structurally after header(13) + palette(768) +
    # GCE(8) — searching for 0x2C would hit palette bytes first
    big = bytearray(good)
    frame = 13 + 768 + 8
    assert big[frame] == 0x2C
    import struct as _s
    _s.pack_into("<HH", big, frame + 5, 50_000, 50_000)
    with _pt.raises(ValueError, match="cap"):
        decode_media(bytes(big))


# ---------------------------------------------------------------------------
# TIFF — goldens from the independent emitter (tests/tiff_emitter)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("packbits", [False, True])
def test_tiff_gray_roundtrip_exact(bo, packbits):
    """Lossless format: histogram equality, both byte orders, both
    compressions, multi-strip assembly (rows_per_strip=5 on h=13)."""
    from tests.tiff_emitter import encode_tiff
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
        sniff_media,
    )

    w, h = 19, 13
    lumas = [(x * 9 + y * 31) % 256 for y in range(h) for x in range(w)]
    payload = encode_tiff(
        lumas, w, h, mode="L", byte_order=bo, packbits=packbits,
        rows_per_strip=5,
    )
    assert sniff_media(payload) == "tiff"
    meta = decode_media(payload)
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["feature"] == _hist8(lumas)


def test_tiff_rgb_and_runs():
    """RGB samples average to luma; long flat runs exercise PackBits
    repeat coding specifically."""
    from tests.tiff_emitter import encode_tiff
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    w, h = 16, 8
    rgb, lum = [], []
    for y in range(h):
        for x in range(w):
            r, g, b = (200 if x < 8 else 10), (y * 30) % 256, 77
            rgb += [r, g, b]
            lum.append((r + g + b) // 3)
    meta = decode_media(
        encode_tiff(rgb, w, h, mode="RGB", packbits=True, rows_per_strip=3)
    )
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["feature"] == _hist8(lum)


@pytest.mark.parametrize("bo", ["<", ">"])
def test_tiff_palette_roundtrip_exact(bo):
    """TIFF 6.0 palette-color (photometric 3, tag 320): indices map
    through the 16-bit-per-channel ColorMap; luma = channel mean shifted
    to 8 bits. Golden from the independent emitter, both byte orders,
    multi-strip, plus the no-ColorMap refusal."""
    from tests.tiff_emitter import encode_tiff
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
        sniff_media,
    )

    # a palette that exercises the full 16-bit range unevenly
    palette = [
        ((i * 257) % 65536, (i * 513) % 65536, (65535 - i * 129) % 65536)
        for i in range(256)
    ]
    w, h = 17, 9
    idx = [(x * 7 + y * 13) % 256 for y in range(h) for x in range(w)]
    payload = encode_tiff(
        idx, w, h, mode="P", byte_order=bo, rows_per_strip=4,
        palette=palette,
    )
    assert sniff_media(payload) == "tiff"
    meta = decode_media(payload)
    assert (meta["width"], meta["height"]) == (w, h)
    expect = [
        (palette[v][0] + palette[v][1] + palette[v][2]) // 3 >> 8
        for v in idx
    ]
    assert meta["feature"] == _hist8(expect)

    # photometric 3 with no ColorMap must refuse, not guess
    import struct as _s

    bad = bytearray(encode_tiff([5] * 16, 4, 4, byte_order="<"))
    n = _s.unpack_from("<H", bad, 8)[0]
    for e in range(n):
        off = 10 + 12 * e
        if _s.unpack_from("<H", bad, off)[0] == 262:
            _s.pack_into("<H", bad, off + 8, 3)
    with pytest.raises(ValueError, match="use PIL"):
        decode_media(bytes(bad))


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("packbits", [False, True])
def test_tiff_planar_rgb_roundtrip_exact(bo, packbits):
    """PlanarConfiguration=2: each component in its own strips, all
    plane-0 strips first. Same pixels as the chunky form must produce
    the identical luminance histogram — golden from the independent
    emitter, both byte orders, both compressions, multi-strip (the
    strip table carries spp x strips-per-plane entries). A planar file
    whose strip table is short of full plane coverage refuses."""
    from tests.tiff_emitter import encode_tiff
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    w, h = 11, 7
    rgb, lum = [], []
    for y in range(h):
        for x in range(w):
            r, g, b = (x * 23) % 256, (y * 41) % 256, (x * y * 7) % 256
            rgb += [r, g, b]
            lum.append((r + g + b) // 3)
    planar = encode_tiff(
        rgb, w, h, mode="RGB", byte_order=bo, packbits=packbits,
        rows_per_strip=3, planar=True,
    )
    chunky = encode_tiff(
        rgb, w, h, mode="RGB", byte_order=bo, packbits=packbits,
        rows_per_strip=3,
    )
    m = decode_media(planar)
    assert (m["width"], m["height"]) == (w, h)
    assert m["feature"] == _hist8(lum)
    assert m["feature"] == decode_media(chunky)["feature"]

    # a planar strip table that does not cover spp x strips-per-plane
    # refuses instead of mis-assembling planes
    import struct as _s

    bad = bytearray(planar)
    n = _s.unpack_from(f"{bo}H", bad, 8)[0]
    for e in range(n):
        off = 10 + 12 * e
        if _s.unpack_from(f"{bo}H", bad, off)[0] == 278:
            # claim 1-row strips: strips-per-plane no longer matches
            _s.pack_into(f"{bo}I", bad, off + 8, 1)
    with pytest.raises(ValueError):
        decode_media(bytes(bad))


def test_tiff_lzw_stream_differential():
    """The decoder against the independent compressor at the STREAM
    level: random and highly-repetitive inputs large enough to walk
    every code width (9→12), the KwKwK case, and the Clear-on-full
    reset must round-trip byte-exact."""
    import random

    from tests.tiff_emitter import _lzw_encode
    from vectordb_data_ingestion_spark.operators.media_decode import (
        _tiff_lzw,
    )

    rng = random.Random(42)
    cases = [
        b"",
        b"\x00",
        b"abababababab" * 4,  # KwKwK-shaped
        bytes(rng.randrange(256) for _ in range(20_000)),  # table reset
        bytes((i * 7) % 256 for i in range(5000)),
        bytes(rng.choice(b"ab") for _ in range(8000)),
    ]
    for data in cases:
        enc = _lzw_encode(data)
        assert _tiff_lzw(enc, len(data)) == data
    # truncated stream refuses rather than returning short data
    big = bytes(rng.randrange(256) for _ in range(1000))
    with pytest.raises(ValueError, match="truncated"):
        _tiff_lzw(_lzw_encode(big)[:20], 1000)


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("predictor", [False, True])
def test_tiff_lzw_roundtrip_exact(bo, predictor):
    """Compression 5 end-to-end: gray, RGB, palette, and planar-RGB
    variants under LZW (with and without Predictor 2 horizontal
    differencing) must match their uncompressed twins' histograms."""
    from tests.tiff_emitter import encode_tiff
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    w, h = 13, 9
    lum = [(x * 11 + y * 29) % 256 for y in range(h) for x in range(w)]
    rgb = []
    for y in range(h):
        for x in range(w):
            rgb += [(x * 23) % 256, (y * 41) % 256, (x + y) % 256]
    palette = [(i * 257, (i * 3) % 65536, (i * 7) % 65536)
               for i in range(256)]
    idx = [(x + y * 5) % 256 for y in range(h) for x in range(w)]

    variants = [
        (dict(mode="L"), lum),
        (dict(mode="RGB"), rgb),
        (dict(mode="RGB", planar=True), rgb),
        (dict(mode="P", palette=palette), idx),
    ]
    for kw, pixels in variants:
        plain = decode_media(
            encode_tiff(pixels, w, h, byte_order=bo, rows_per_strip=4, **kw)
        )
        lzw = decode_media(
            encode_tiff(pixels, w, h, byte_order=bo, rows_per_strip=4,
                        lzw=True, predictor=predictor, **kw)
        )
        assert lzw["feature"] == plain["feature"], kw
        assert (lzw["width"], lzw["height"]) == (w, h)


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("comp", ["none", "packbits", "lzw", "lzw+pred"])
def test_tiff_tiled_roundtrip_exact(bo, comp):
    """Tiled layout (tags 322-325): tiles are ALWAYS TileWidth x
    TileLength samples with edge tiles zero-padded, placed on a grid;
    planar images emit all plane-0 tiles first. Tile sizes chosen NOT to
    divide the image dims so the padding/crop path runs. Every variant
    must match its stripped twin's histogram."""
    from tests.tiff_emitter import encode_tiff
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    kw = {
        "none": {},
        "packbits": dict(packbits=True),
        "lzw": dict(lzw=True),
        "lzw+pred": dict(lzw=True, predictor=True),
    }[comp]
    w, h = 13, 9  # 5x4 tiles -> 3x3 grid with ragged edges
    lum = [(x * 17 + y * 23) % 256 for y in range(h) for x in range(w)]
    rgb = []
    for y in range(h):
        for x in range(w):
            rgb += [(x * 31) % 256, (y * 57) % 256, (x ^ y) % 256]
    palette = [((i * 999) % 65536, i * 257, (i * 13) % 65536)
               for i in range(256)]

    variants = [
        (dict(mode="L"), lum),
        (dict(mode="RGB"), rgb),
        (dict(mode="RGB", planar=True), rgb),
        (dict(mode="P", palette=palette), lum),
    ]
    for vkw, pixels in variants:
        plain = decode_media(
            encode_tiff(pixels, w, h, byte_order=bo, rows_per_strip=4,
                        **vkw)
        )
        tiled = decode_media(
            encode_tiff(pixels, w, h, byte_order=bo, tile=(5, 4),
                        **kw, **vkw)
        )
        assert (tiled["width"], tiled["height"]) == (w, h)
        assert tiled["feature"] == plain["feature"], (vkw, comp)

    # a tile table that does not cover the grid refuses
    import struct as _s

    bad = bytearray(
        encode_tiff(lum, w, h, byte_order="<", tile=(5, 4))
    )
    n = _s.unpack_from("<H", bad, 8)[0]
    for e in range(n):
        off = 10 + 12 * e
        if _s.unpack_from("<H", bad, off)[0] == 322:
            _s.pack_into("<I", bad, off + 8, 4)  # grid now 4x3 ≠ table
    with pytest.raises(ValueError):
        decode_media(bytes(bad))


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("comp", ["none", "lzw", "lzw+pred"])
def test_tiff_16bit_roundtrip_exact(bo, comp):
    """16-bit samples: each SHORT (file byte order) downscales to its
    high byte for the luminance feature; Predictor 2 differencing is
    undone at 16-bit sample granularity BEFORE the downscale (undoing
    it on bytes would corrupt every sample whose delta crosses a byte
    boundary). Gray, RGB, planar, strip and tiled variants against
    expected histograms computed independently here."""
    from tests.tiff_emitter import encode_tiff
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    kw = {
        "none": {},
        "lzw": dict(lzw=True),
        "lzw+pred": dict(lzw=True, predictor=True),
    }[comp]
    w, h = 13, 9
    lum16 = [(x * 1553 + y * 7919) % 65536
             for y in range(h) for x in range(w)]
    rgb16 = []
    for y in range(h):
        for x in range(w):
            rgb16 += [(x * 4099) % 65536, (y * 9973) % 65536,
                      (x * y * 257) % 65536]

    def hi(vals):
        return [v >> 8 for v in vals]

    lum_expect = _hist8(hi(lum16))
    rgb_expect = _hist8(
        [(rgb16[i] // 256 + rgb16[i + 1] // 256 + rgb16[i + 2] // 256) // 3
         for i in range(0, len(rgb16), 3)]
    )
    variants = [
        (dict(mode="L", rows_per_strip=4), lum16, lum_expect),
        (dict(mode="RGB", rows_per_strip=4), rgb16, rgb_expect),
        (dict(mode="RGB", planar=True, rows_per_strip=4), rgb16,
         rgb_expect),
        (dict(mode="RGB", tile=(5, 4)), rgb16, rgb_expect),
    ]
    for vkw, pixels, expect in variants:
        m = decode_media(
            encode_tiff(pixels, w, h, byte_order=bo, bits=16, **kw, **vkw)
        )
        assert (m["width"], m["height"]) == (w, h)
        assert m["feature"] == expect, (vkw, comp)


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("layout", ["chunky", "planar", "tiled"])
def test_tiff_cmyk_roundtrip_exact(bo, layout):
    """CMYK (photometric 5, spp=4): with K=0 and C/M/Y = 255-R/G/B the
    naive profile-less conversion reduces EXACTLY to the original RGB,
    so a CMYK-of-RGB golden must match its plain-RGB twin's histogram;
    a nonzero-K golden checks the (255-c)(255-k)/255 term against
    in-test arithmetic. CMYK with the wrong sample count refuses."""
    from tests.tiff_emitter import encode_tiff
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    kw = {
        "chunky": dict(rows_per_strip=4),
        "planar": dict(planar=True, rows_per_strip=4),
        "tiled": dict(tile=(5, 4)),
    }[layout]
    w, h = 13, 9
    rgb, cmyk0 = [], []
    for y in range(h):
        for x in range(w):
            r, g, b = (x * 31) % 256, (y * 57) % 256, (x ^ y) % 256
            rgb += [r, g, b]
            cmyk0 += [255 - r, 255 - g, 255 - b, 0]
    plain = decode_media(
        encode_tiff(rgb, w, h, mode="RGB", byte_order=bo,
                    rows_per_strip=4)
    )
    got = decode_media(
        encode_tiff(cmyk0, w, h, mode="CMYK", byte_order=bo, lzw=True,
                    **kw)
    )
    assert (got["width"], got["height"]) == (w, h)
    assert got["feature"] == plain["feature"]

    # nonzero K: expected luma from independent in-test arithmetic
    cmyk = []
    expect = []
    for y in range(h):
        for x in range(w):
            c, m, yy, k = (x * 7) % 256, (y * 11) % 256, 200, (x + y) % 256
            cmyk += [c, m, yy, k]
            kk = 255 - k
            expect.append(
                ((255 - c) * kk // 255 + (255 - m) * kk // 255
                 + (255 - yy) * kk // 255) // 3
            )
    got2 = decode_media(
        encode_tiff(cmyk, w, h, mode="CMYK", byte_order=bo, **kw)
    )
    assert got2["feature"] == _hist8(expect)

    # photometric 5 with spp != 4 refuses
    import struct as _s

    bad = bytearray(
        encode_tiff(rgb, w, h, mode="RGB", byte_order="<",
                    rows_per_strip=4)
    )
    n = _s.unpack_from("<H", bad, 8)[0]
    for e in range(n):
        off = 10 + 12 * e
        if _s.unpack_from("<H", bad, off)[0] == 262:
            _s.pack_into("<H", bad, off + 8, 5)
    with pytest.raises(ValueError, match="use PIL"):
        decode_media(bytes(bad))


@pytest.mark.parametrize("dims", [(13, 9), (3, 2), (1, 1), (16, 16)])
def test_png_adam7_interlace_roundtrip(dims):
    """Adam7: seven independently filtered sub-images reassemble to the
    same histogram as the non-interlaced twin — odd dims exercise
    partial and EMPTY passes (1x1 hits five empty ones)."""
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    w, h = dims
    rows_rgb = [
        [((x * 31) % 256, (y * 57) % 256, (x ^ y) % 256)
         for x in range(w)]
        for y in range(h)
    ]
    rows_gray = [[(x * 7 + y * 13) % 256 for x in range(w)]
                 for y in range(h)]
    for ct, rows in ((2, rows_rgb), (0, rows_gray)):
        plain = decode_media(make_png_adv(rows, ct))
        inter = decode_media(make_png_adv(rows, ct, interlace=1))
        assert (inter["width"], inter["height"]) == (w, h)
        assert inter["feature"] == plain["feature"], (ct, dims)


def test_png_16bit_and_palette_roundtrip():
    """16-bit samples (big-endian SHORTs; luma = high byte) — plain and
    interlaced — and palette PNGs (color type 3 + PLTE; luma through
    the channel-mean LUT). Out-of-range palette indices refuse."""
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    w, h = 11, 7
    rows16 = [
        [((x * 4099) % 65536, (y * 9973) % 65536, (x * y * 257) % 65536)
         for x in range(w)]
        for y in range(h)
    ]
    expect16 = _hist8(
        [(r // 256 + g // 256 + b // 256) // 3
         for row in rows16 for (r, g, b) in row]
    )
    got = decode_media(make_png_adv(rows16, 2, bit_depth=16))
    assert got["feature"] == expect16
    got_i = decode_media(make_png_adv(rows16, 2, bit_depth=16,
                                      interlace=1))
    assert got_i["feature"] == expect16

    gray16 = [[(x * 653 + y * 31) % 65536 for x in range(w)]
              for y in range(h)]
    expect_g = _hist8([v >> 8 for row in gray16 for v in row])
    assert decode_media(
        make_png_adv(gray16, 0, bit_depth=16)
    )["feature"] == expect_g

    palette = [((i * 3) % 256, (i * 7) % 256, (255 - i) % 256)
               for i in range(64)]
    idx_rows = [[(x + y * 5) % 64 for x in range(w)] for y in range(h)]
    expect_p = _hist8(
        [sum(palette[i]) // 3 for row in idx_rows for i in row]
    )
    assert decode_media(
        make_png_adv(idx_rows, 3, palette=palette)
    )["feature"] == expect_p

    # palette index beyond PLTE refuses rather than mis-mapping
    bad_rows = [[63 for _ in range(w)] for _ in range(h)]
    payload = make_png_adv(bad_rows, 3, palette=palette[:32])
    with pytest.raises(ValueError, match="PLTE"):
        decode_media(payload)


def test_gif_animated_duration_and_stills():
    """Animated GIFs report the loop's total play time (sum of every
    Graphic Control delay, centiseconds -> ms); single-frame GIFs keep
    duration_ms None; the first frame's histogram is unaffected by the
    extra frames; a malformed tail after a good first frame degrades to
    single-frame metadata instead of failing the payload."""
    from tests.gif_emitter import encode_gif
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    w, h = 10, 8
    f1 = [(x * 13) % 256 for x in range(w * h)]
    f2 = [(x * 29) % 256 for x in range(w * h)]
    f3 = [255 - v for v in f1]

    still = decode_media(encode_gif(f1, w, h))
    assert still["duration_ms"] is None

    anim = decode_media(
        encode_gif(f1, w, h, frames=[(f2, 12), (f3, 25)])
    )
    assert anim["duration_ms"] == (12 + 25) * 10
    assert anim["feature"] == still["feature"]  # first frame only

    # a torn tail (truncated second frame) keeps the good first frame
    payload = bytearray(encode_gif(f1, w, h, frames=[(f2, 50)]))
    torn = decode_media(bytes(payload[: len(payload) - 30]))
    assert torn["feature"] == still["feature"]


def test_tiff_unsupported_and_malformed():
    import pytest as _pt

    from tests.tiff_emitter import encode_tiff
    from vectordb_data_ingestion_spark.operators.media_decode import (
        decode_media,
    )

    good = encode_tiff([100] * 64, 8, 8)
    with _pt.raises(ValueError):
        decode_media(good[:24])  # truncated IFD
    # JPEG-in-TIFF compression refuses with the lib pointer (LZW=5
    # decodes for real since r10)
    import struct as _s
    bad = bytearray(good)
    # find the compression entry (tag 259) in the IFD and set value 7
    n = _s.unpack_from("<H", bad, 8)[0]
    for e in range(n):
        off = 10 + 12 * e
        if _s.unpack_from("<H", bad, off)[0] == 259:
            _s.pack_into("<H", bad, off + 8, 7)
    with _pt.raises(ValueError, match="use PIL"):
        decode_media(bytes(bad))
    # crafted dims past the cap refuse before strip assembly
    huge = bytearray(good)
    for e in range(n):
        off = 10 + 12 * e
        if _s.unpack_from("<H", huge, off)[0] in (256, 257):
            _s.pack_into("<I", huge, off + 8, 50_000)
    with _pt.raises(ValueError, match="cap"):
        decode_media(bytes(huge))
    # ADVICE r9 (low): layouts the strip reader would read without error
    # but mis-interpret must refuse with the lib pointer instead —
    # palette lacking its ColorMap (real palette files decode since the
    # same-round upgrade) and out-of-spec planar values (planar=2
    # itself decodes since the same-round upgrade; on gray it is
    # spec-identical to chunky)
    pal = bytearray(good)
    for e in range(n):
        off = 10 + 12 * e
        if _s.unpack_from("<H", pal, off)[0] == 262:
            _s.pack_into("<H", pal, off + 8, 3)
    with _pt.raises(ValueError, match="use PIL"):
        decode_media(bytes(pal))
    planar = bytearray(good)
    for e in range(n):
        off = 10 + 12 * e
        # repurpose the RowsPerStrip slot (single-strip image: the
        # default rps=height is equivalent) as PlanarConfiguration
        if _s.unpack_from("<H", planar, off)[0] == 278:
            _s.pack_into("<HHI", planar, off, 284, 3, 1)
            _s.pack_into("<H", planar, off + 8, 2)
    # gray + planar=2: spec-identical to chunky, decodes
    assert decode_media(bytes(planar))["width"] == 8
    bad_planar = bytearray(planar)
    for e in range(n):
        off = 10 + 12 * e
        if _s.unpack_from("<H", bad_planar, off)[0] == 284:
            _s.pack_into("<H", bad_planar, off + 8, 3)  # out of spec
    with _pt.raises(ValueError, match="use PIL"):
        decode_media(bytes(bad_planar))
