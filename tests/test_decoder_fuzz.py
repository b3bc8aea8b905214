"""Fuzz the binary-decoder boundary: at 100 TB a corpus WILL contain
corrupt, truncated, and mislabeled payloads, and the contract of every
decoder entry point is *degrade, never raise* (a single bad file must not
abort the ingestion job — reference parsers.py prints-and-continues).

Three mutation families drive each boundary:
  * arbitrary bytes (mislabeled / garbage files),
  * a golden payload with one byte flipped (bit-rot / partial overwrite),
  * a golden payload truncated mid-structure (interrupted upload).

Contracts pinned here (see the docstrings at each boundary):
  * ``files.parse_bytes(content, kind)`` -> str | None, never raises for a
    registered kind.
  * ``files._pdf_tables`` / ``files._attachments`` -> [] on undecodable
    input (stub opt-in excluded), never raise.
  * ``media_decode.decode_media`` -> dict | None, or ValueError ONLY (all
    parse errors are normalized so callers need one except clause).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.gif_emitter import encode_gif
from tests.jpeg_emitter import encode_jpeg
from tests.tiff_emitter import encode_tiff
from tests.test_cfb import golden_msg
from tests.test_media_decode import (make_bmp, make_png,
                                    make_png_adv, make_wav)
from tests.test_ooxml import golden_docx, golden_pdf, golden_xlsx
from vectordb_data_ingestion_spark.operators.media_decode import decode_media
from vectordb_data_ingestion_spark.sources import files

FUZZ = settings(
    max_examples=150,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# built once at import: golden payloads per kind (pptx shares the zip+XML
# shape with docx via a renamed part, which is exactly what a mislabeled
# upload looks like — the dispatch must still not raise)
_GOLDEN = {
    "docx": golden_docx(),
    "pptx": golden_docx(),
    "xlsx": golden_xlsx(),
    "pdf": golden_pdf(),
    "msg": golden_msg(),
    "png": make_png([[(10, 20, 30), (40, 50, 60)]] * 2),
    "png-adam7": make_png_adv(
        [[(x * 31 % 256, x * 7 % 256, x % 256) for x in range(10)]] * 9,
        2, interlace=1,
    ),
    "png-16bit": make_png_adv(
        [[(x * 653) % 65536 for x in range(10)]] * 9, 0, bit_depth=16,
    ),
    "png-palette": make_png_adv(
        [[x % 16 for x in range(10)]] * 9, 3,
        palette=[(i, i * 2 % 256, i * 3 % 256) for i in range(16)],
    ),
    "bmp": make_bmp([[(10, 20, 30), (40, 50, 60)]] * 2),
    "wav": make_wav([0, 1000, -1000, 32000]),
    "jpeg": encode_jpeg([(x * 16) % 256 for x in range(100)], 10, 10),
    "gif": encode_gif([(x * 16) % 256 for x in range(100)], 10, 10),
    "gif-anim": encode_gif(
        [(x * 16) % 256 for x in range(100)], 10, 10,
        frames=[([(x * 5) % 256 for x in range(100)], 10)],
    ),
    "tiff": encode_tiff([(x * 16) % 256 for x in range(100)], 10, 10,
                        packbits=True, rows_per_strip=4),
    "tiff-palette": encode_tiff(
        [(x * 7) % 256 for x in range(100)], 10, 10,
        palette=[(i * 257, i * 257, i * 257) for i in range(256)],
        mode="P",
    ),
    "tiff-planar": encode_tiff(
        [(x * 5) % 256 for x in range(300)], 10, 10, mode="RGB",
        planar=True, rows_per_strip=4,
    ),
    "tiff-lzw": encode_tiff(
        [(x * 3) % 256 for x in range(300)], 10, 10, mode="RGB",
        lzw=True, predictor=True, rows_per_strip=4,
    ),
    "tiff-tiled": encode_tiff(
        [(x * 9) % 256 for x in range(300)], 10, 10, mode="RGB",
        tile=(4, 3), lzw=True,
    ),
    "tiff-16bit": encode_tiff(
        [(x * 653) % 65536 for x in range(100)], 10, 10, bits=16,
        lzw=True, predictor=True, rows_per_strip=4,
    ),
    "tiff-cmyk": encode_tiff(
        [(x * 3) % 256 for x in range(400)], 10, 10, mode="CMYK",
        lzw=True, rows_per_strip=4,
    ),
}

_PARSE_KINDS = sorted(files.registered_kinds())


def _mutate(payload: bytes, choice: int, offset: int, length: int) -> bytes:
    """One deterministic corruption: 0=flip a byte, 1=truncate, 2=insert
    junk mid-stream, 3=leave intact (the control arm)."""
    if not payload:
        return payload
    if choice == 0:
        i = offset % len(payload)
        return payload[:i] + bytes([payload[i] ^ 0xFF]) + payload[i + 1 :]
    if choice == 1:
        return payload[: offset % len(payload)]
    if choice == 2:
        i = offset % len(payload)
        return payload[:i] + b"\x00\xff" * (1 + length % 8) + payload[i:]
    return payload


mutations = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=1 << 30),
    st.integers(min_value=0, max_value=1 << 10),
)


@FUZZ
@given(kind=st.sampled_from(_PARSE_KINDS), data=st.binary(max_size=2048))
def test_parse_bytes_never_raises_on_garbage(kind, data):
    out = files.parse_bytes(data, kind)
    assert out is None or isinstance(out, str)


@FUZZ
@given(
    kind=st.sampled_from(sorted(k for k in _GOLDEN if k in _PARSE_KINDS)),
    label=st.sampled_from(_PARSE_KINDS),
    mut=mutations,
)
def test_parse_bytes_never_raises_on_corrupted_golden(kind, label, mut):
    # a golden payload of one kind, possibly corrupted, possibly labeled
    # as a DIFFERENT kind (mislabeled upload) — still no raise
    payload = _mutate(_GOLDEN[kind], *mut)
    out = files.parse_bytes(payload, label)
    assert out is None or isinstance(out, str)


@FUZZ
@given(data=st.binary(max_size=2048), mut=mutations)
def test_pdf_tables_garbage_yields_empty(data, mut):
    for payload in (data, _mutate(_GOLDEN["pdf"], *mut)):
        out = files._pdf_tables(payload)
        assert isinstance(out, list)
        assert all(isinstance(r, str) for r in out)


@FUZZ
@given(data=st.binary(max_size=2048), mut=mutations)
def test_msg_attachments_garbage_yields_empty(data, mut):
    for payload in (data, _mutate(_GOLDEN["msg"], *mut)):
        out = files._attachments(payload)
        assert isinstance(out, list)
        assert all(
            isinstance(n, str) and isinstance(b, bytes) for n, b in out
        )


@FUZZ
@given(
    kind=st.sampled_from(["png", "png-adam7", "png-16bit",
                           "png-palette", "bmp", "wav", "jpeg", "gif", "gif-anim",
                           "tiff", "tiff-palette", "tiff-planar",
                           "tiff-lzw", "tiff-tiled",
                           "tiff-16bit", "tiff-cmyk"]),
    mut=mutations,
    data=st.binary(max_size=2048),
)
def test_decode_media_valueerror_only(kind, mut, data):
    # arbitrary bytes: dict | None | ValueError — nothing else escapes
    for payload in (data, _mutate(_GOLDEN[kind], *mut)):
        try:
            out = decode_media(payload)
        except ValueError:
            continue
        assert out is None or isinstance(out, dict)


@FUZZ
@given(data=st.binary(max_size=2048), text=st.text(max_size=512))
def test_html_to_text_never_raises(data, text):
    """Malformed markup (unclosed tags, broken charrefs, CDATA, NULs)
    must convert without raising — the HTML field compose runs over
    whatever a portal export contains."""
    from vectordb_data_ingestion_spark.functions.html import html_to_text

    for payload in (data.decode("latin-1"), text, "<table>" + text):
        out = html_to_text(payload)
        assert isinstance(out, str)


# ---------------------------------------------------------------------------
# emitter <-> reader property: every container the independent [MS-CFB]
# emitter can express round-trips byte-exactly through sources/cfb.py —
# random stream trees (arbitrary nesting), sizes straddling the 4096-byte
# mini cutoff, both container versions. The two sides share no code, so a
# surviving run is structural agreement on the spec, not self-consistency.
# ---------------------------------------------------------------------------

_seg = st.text(
    alphabet=st.characters(min_codepoint=0x30, max_codepoint=0x7A),
    min_size=1,
    max_size=12,
)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    version=st.sampled_from([3, 4]),
    streams=st.dictionaries(
        st.lists(_seg, min_size=1, max_size=3).map(tuple),
        st.binary(max_size=9000),
        min_size=1,
        max_size=8,
    ),
)
def test_cfb_emitter_reader_roundtrip_property(version, streams):
    from tests.cfb_emitter import emit_cfb
    from vectordb_data_ingestion_spark.sources.cfb import CfbFile

    # a path may not also be a storage prefix of another path (a name
    # can't be both a stream and a storage in one directory)
    paths = list(streams)
    for p in paths:
        for q in paths:
            if p is not q and q[: len(p)] == p:
                return  # skip degenerate draw
    cfb = CfbFile(emit_cfb(list(streams.items()), version=version))
    for path, data in streams.items():
        assert cfb.read_stream(path) == data
