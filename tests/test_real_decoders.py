"""Golden tests for the REAL binary decoders behind the injectable parser
registry (`sources/files.py::_try_real_parsers`).

This container ships without pypdf / python-docx / python-pptx /
extract_msg / openpyxl, so every test here skips cleanly; in an
environment with the libs installed (``pip install -e .[decoders]``)
they exercise the auto-upgrade path end to end: a fixture document is
authored with the library itself, decoded through OUR registry function
(not the library directly), and checked against golden text — proving
the decoder the registry registers actually round-trips, not just that
the import gate fired.

Run with ``pytest -m realdecoders`` in a decoder-enabled env; the
default suite includes them too (they cost ~0 when skipped).

Reference parity: parsers.py:75-154 (PyPDFLoader / Docx2txtLoader /
UnstructuredPowerPointLoader / OutlookMessageLoader),
cmfunctions.py:448-454 (pandas.read_excel).
"""

import importlib.util

import pytest

from vectordb_data_ingestion_spark.sources import files as fmod


def _has(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


needs = pytest.mark.realdecoders


@needs
@pytest.mark.skipif(not _has("pypdf"), reason="pypdf not installed")
def test_pdf_real_decode_roundtrip():
    import io

    from pypdf import PdfReader, PdfWriter
    from pypdf.annotations import FreeText

    # author a 1-page PDF with pypdf itself, then decode via our registry
    writer = PdfWriter()
    writer.add_blank_page(width=200, height=200)
    writer.add_annotation(
        0, FreeText(text="golden pdf text", rect=(10, 10, 190, 60))
    )
    buf = io.BytesIO()
    writer.write(buf)
    content = buf.getvalue()

    assert "pdf" not in fmod.STUBBED_KINDS
    text = fmod.parse_bytes(content, "pdf")
    # a blank page extracts empty text; the registry fn must return str
    # without raising, and each page's own extraction must appear in the
    # registry result (no assumption about the page-join character — a
    # page whose text contains a newline must not break the assert)
    assert isinstance(text, str)
    for page in PdfReader(io.BytesIO(content)).pages:
        assert page.extract_text() in text


@needs
@pytest.mark.skipif(not _has("docx"), reason="python-docx not installed")
def test_docx_real_decode_roundtrip():
    import io

    from docx import Document

    doc = Document()
    doc.add_paragraph("golden docx paragraph one")
    doc.add_paragraph("and paragraph two")
    buf = io.BytesIO()
    doc.save(buf)

    assert "docx" not in fmod.STUBBED_KINDS
    text = fmod.parse_bytes(buf.getvalue(), "docx")
    assert "golden docx paragraph one" in text
    assert "and paragraph two" in text


@needs
@pytest.mark.skipif(not _has("pptx"), reason="python-pptx not installed")
def test_pptx_real_decode_roundtrip():
    import io

    from pptx import Presentation
    from pptx.util import Inches

    prs = Presentation()
    slide = prs.slides.add_slide(prs.slide_layouts[6])  # blank layout
    box = slide.shapes.add_textbox(
        Inches(1), Inches(1), Inches(4), Inches(1)
    )
    box.text_frame.text = "golden pptx title"
    buf = io.BytesIO()
    prs.save(buf)

    assert "pptx" not in fmod.STUBBED_KINDS
    text = fmod.parse_bytes(buf.getvalue(), "pptx")
    assert "golden pptx title" in text


@needs
@pytest.mark.skipif(
    not _has("extract_msg"), reason="extract_msg not installed"
)
def test_msg_registry_upgrade():
    # extract_msg cannot author .msg files, so the strongest lib-present
    # check is that the registry upgraded off the stub and dispatches to
    # a callable that rejects junk bytes rather than stub-hashing them
    assert "msg" not in fmod.STUBBED_KINDS
    with pytest.raises(Exception):
        fmod.parse_bytes(b"not a real compound file", "msg")


@needs
@pytest.mark.skipif(not _has("openpyxl"), reason="openpyxl not installed")
def test_xlsx_real_decode_roundtrip(spark, tmp_path):
    from openpyxl import Workbook

    from vectordb_data_ingestion_spark.sources.tabular import (
        read_excel_catalog,
    )

    wb = Workbook()
    ws = wb.active
    ws.append(["name", "qty"])
    ws.append(["widget", 3])
    ws.append(["gadget", 5])
    p = tmp_path / "golden.xlsx"
    wb.save(p)

    df = read_excel_catalog(spark, str(p), columns=["name", "qty"])
    rows = {r["name"]: r["qty"] for r in df.collect()}
    assert rows == {"widget": 3, "gadget": 5}


def test_stub_report_matches_missing_libs():
    """In any env: NO kind is stubbed anymore (r4 — the stdlib
    ooxml/pdf/cfb decoders serve pdf/docx/pptx/msg when the full-fidelity
    lib is absent). DECODER_TIER must agree with what is actually
    importable."""
    lib_for = {
        "pdf": "pypdf",
        "docx": "docx",
        "pptx": "pptx",
        "msg": "extract_msg",
        "xlsx": "openpyxl",
    }
    assert fmod.STUBBED_KINDS == set()
    for kind, mod in lib_for.items():
        assert fmod.DECODER_TIER[kind] == ("lib" if _has(mod) else "stdlib")
