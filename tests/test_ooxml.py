"""Golden tests for the pure-stdlib OOXML/PDF decoders (sources/ooxml.py)
— fixtures are hand-built zip+XML / PDF bytes, so these run in EVERY
environment (no pypdf/python-docx/python-pptx/openpyxl needed), unlike
the lib-gated legs in test_real_decoders.py."""

import io
import zipfile
import zlib

import pytest

from vectordb_data_ingestion_spark.sources import files as fmod
from vectordb_data_ingestion_spark.sources.ooxml import (
    docx_to_text,
    pdf_to_text,
    pptx_to_text,
    xlsx_rows,
)

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
A = "http://schemas.openxmlformats.org/drawingml/2006/main"
S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def make_zip(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in entries.items():
            z.writestr(name, data)
    return buf.getvalue()


def golden_docx():
    return make_zip({"word/document.xml": f"""<?xml version="1.0"?>
<w:document xmlns:w="{W}"><w:body>
<w:p><w:r><w:t>hello</w:t></w:r><w:r><w:t xml:space="preserve"> world</w:t></w:r></w:p>
<w:p><w:r><w:t>second</w:t><w:tab/><w:t>para</w:t></w:r></w:p>
<w:p/>
</w:body></w:document>"""})


def test_docx_stdlib_decode():
    assert docx_to_text(golden_docx()) == "hello world\nsecond\tpara\n"


def test_pptx_stdlib_decode_slide_order():
    # slide10 vs slide2: numeric (not lexicographic) slide ordering
    def slide(text):
        return (
            f'<p:sld xmlns:a="{A}" xmlns:p="x"><p:txBody>'
            f"<a:p><a:r><a:t>{text}</a:t></a:r></a:p></p:txBody></p:sld>"
        )

    pptx = make_zip({
        "ppt/slides/slide10.xml": slide("ten"),
        "ppt/slides/slide2.xml": slide("two"),
        "ppt/slides/slide1.xml": slide("one"),
    })
    assert pptx_to_text(pptx) == "one\ntwo\nten"


def golden_xlsx():
    return make_zip({
        "xl/sharedStrings.xml": (
            f'<sst xmlns="{S}"><si><t>name</t></si><si><t>widget</t></si>'
            "<si><r><t>gad</t></r><r><t>get</t></r></si></sst>"
        ),
        "xl/worksheets/sheet1.xml": f"""<worksheet xmlns="{S}"><sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="str"><v>qty</v></c></row>
<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>3</v></c></row>
<row r="3"><c r="A3" t="s"><v>2</v></c><c r="C3"><v>5.5</v></c></row>
<row r="4"><c r="A4" t="inlineStr"><is><t>inline</t></is></c><c r="B4" t="b"><v>1</v></c></row>
</sheetData></worksheet>"""})


def test_xlsx_stdlib_rows_typed_and_gap_padded():
    rows = xlsx_rows(golden_xlsx())
    assert rows == [
        ("name", "qty", None),
        ("widget", 3, None),          # integral numeric -> int
        ("gadget", None, 5.5),        # column gap preserved as None
        ("inline", True, None),       # inline string + boolean
    ]
    with pytest.raises(IndexError):
        xlsx_rows(golden_xlsx(), sheet=1)


def test_xlsx_to_text_chunkable_render():
    """The document-pipeline rendering: tab-joined cells, newline-joined
    rows, integral floats rendered as ints, gaps as empty cells — and the
    kind is REGISTERED, so a mixed catalog holding .xlsx parses instead
    of aborting on an unregistered kind."""
    from vectordb_data_ingestion_spark.sources import files as fmod
    from vectordb_data_ingestion_spark.sources.ooxml import xlsx_to_text

    text = xlsx_to_text(golden_xlsx())
    assert text == (
        "name\tqty\t\n"
        "widget\t3\t\n"
        "gadget\t\t5.5\n"
        "inline\tTrue\t"
    )
    assert fmod.parse_bytes(golden_xlsx(), "xlsx") == text
    assert fmod.DECODER_TIER["xlsx"] == "stdlib"
    assert "xlsx" not in fmod.STUBBED_KINDS


def test_read_excel_catalog_stdlib_tier(spark, tmp_path):
    """The XLSX scan is real without openpyxl: stdlib decode -> header
    skip -> DataFrame (the reference's min_row=2 iteration)."""
    from vectordb_data_ingestion_spark.sources.tabular import (
        read_excel_catalog,
    )

    p = tmp_path / "cat.xlsx"
    p.write_bytes(make_zip({
        "xl/sharedStrings.xml": (
            f'<sst xmlns="{S}"><si><t>name</t></si><si><t>qty</t></si>'
            "<si><t>widget</t></si><si><t>gadget</t></si></sst>"
        ),
        "xl/worksheets/sheet1.xml": f"""<worksheet xmlns="{S}"><sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>3</v></c></row>
<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>5</v></c></row>
</sheetData></worksheet>"""}))
    df = read_excel_catalog(spark, str(p), columns=["name", "qty"])
    assert {r["name"]: r["qty"] for r in df.collect()} == {
        "widget": 3, "gadget": 5,
    }


def test_read_excel_catalog_named_sheet_stdlib(spark, tmp_path):
    """read_excel_catalog(sheet="Catalog") works WITHOUT openpyxl (r5 —
    the sheet-name→part map comes from xl/workbook.xml + rels)."""
    from vectordb_data_ingestion_spark.sources.tabular import (
        read_excel_catalog,
    )

    p = tmp_path / "named.xlsx"
    p.write_bytes(make_zip({
        "xl/workbook.xml": (
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets>'
            '<sheet name="Notes" sheetId="1" r:id="rId1"/>'
            '<sheet name="Catalog" sheetId="2" r:id="rId2"/>'
            "</sheets></workbook>"
        ),
        "xl/_rels/workbook.xml.rels": (
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>'
            '<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>'
            "</Relationships>"
        ),
        "xl/worksheets/sheet1.xml": f'<worksheet xmlns="{S}"><sheetData>'
            '<row r="1"><c r="A1" t="str"><v>scratch</v></c></row>'
            "</sheetData></worksheet>",
        "xl/worksheets/sheet2.xml": f"""<worksheet xmlns="{S}"><sheetData>
<row r="1"><c r="A1" t="str"><v>name</v></c><c r="B1" t="str"><v>qty</v></c></row>
<row r="2"><c r="A2" t="str"><v>widget</v></c><c r="B2"><v>3</v></c></row>
</sheetData></worksheet>""",
    }))
    df = read_excel_catalog(
        spark, str(p), columns=["name", "qty"], sheet="Catalog"
    )
    assert [(r["name"], r["qty"]) for r in df.collect()] == [("widget", 3)]


def golden_pdf():
    raw = b"BT /F1 12 Tf 72 700 Td (Hello) Tj (, PDF!) Tj ET"
    flate = zlib.compress(
        b"BT [(kern)-20(ed fragments )](one run) Tj <776f726b> Tj ET"
    )
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Length " + str(len(raw)).encode() + b" >>\nstream\n"
        + raw + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(flate)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + flate + b"\nendstream\nendobj\n%%EOF"
    )


def test_pdf_stdlib_decode_raw_flate_hex_and_escapes():
    text = pdf_to_text(golden_pdf())
    assert "Hello , PDF!" in text          # raw stream, two Tj ops
    assert "kerned fragments " in text     # TJ array concatenated
    assert "one run" in text
    assert "work" in text                  # hex string
    # escapes: \( \) \\ and octal
    esc = pdf_to_text(
        b"stream\nBT (a\\(b\\)c\\\\d\\101) Tj ET\nendstream"
    )
    assert esc == "a(b)c\\dA"
    # junk / streamless bytes: lenient empty result, never a raise
    assert pdf_to_text(b"%PDF-1.4 fake payload") == ""
    assert pdf_to_text(b"") == ""


def test_registry_serves_stdlib_tier_when_libs_absent():
    """parse_bytes dispatches pdf/docx/pptx to the stdlib decoders when
    the full-fidelity libs are absent (DECODER_TIER reports which); the
    output is REAL text, not the stub's pseudo-text."""
    for kind, payload, expect in (
        ("docx", golden_docx(), "hello world\nsecond\tpara\n"),
        ("pdf", golden_pdf(), None),
    ):
        if fmod.DECODER_TIER[kind] != "stdlib":
            pytest.skip("full-fidelity lib installed; stdlib tier idle")
        text = fmod.parse_bytes(payload, kind)
        assert not text.startswith("[stub:")
        if expect is not None:
            assert text == expect
        else:
            assert "Hello" in text


def test_xlsx_phonetic_runs_excluded():
    """Review r6: si.iter() collected <t> inside <rPh> phonetic runs, so
    furigana-annotated cells rendered '東京とうきょう' where Excel and
    openpyxl show '東京' — shared AND inline strings must skip rPh."""
    pkg = make_zip({
        "xl/sharedStrings.xml": (
            f'<sst xmlns="{S}"><si><t>東京</t>'
            '<rPh sb="0" eb="2"><t>とうきょう</t></rPh>'
            "<phoneticPr fontId='1'/></si></sst>"
        ),
        "xl/worksheets/sheet1.xml": f"""<worksheet xmlns="{S}"><sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c>
<c r="B1" t="inlineStr"><is><t>大阪</t>
<rPh sb="0" eb="2"><t>おおさか</t></rPh></is></c></row>
</sheetData></worksheet>""",
    })
    assert xlsx_rows(pkg) == [("東京", "大阪")]


def test_xlsx_chartsheet_not_counted_as_worksheet():
    """Review r6: <sheets> lists chartsheets too; counting them shifted
    integer indexing off openpyxl's wb.worksheets — sheet=0 on a
    [Chart1, Data] workbook silently returned the empty chartsheet."""
    wb = (
        f'<workbook xmlns="{S}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"><sheets>'
        '<sheet name="Chart1" sheetId="1" r:id="rId1"/>'
        '<sheet name="Data" sheetId="2" r:id="rId2"/>'
        "</sheets></workbook>"
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="chartsheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="t" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    pkg = make_zip({
        "xl/workbook.xml": wb,
        "xl/_rels/workbook.xml.rels": rels,
        "xl/chartsheets/sheet1.xml": f'<chartsheet xmlns="{S}"/>',
        "xl/worksheets/sheet1.xml": f"""<worksheet xmlns="{S}"><sheetData>
<row r="1"><c r="A1" t="str"><v>hello</v></c></row>
</sheetData></worksheet>""",
    })
    assert xlsx_rows(pkg, sheet=0) == [("hello",)]
    assert xlsx_rows(pkg, sheet="Data") == [("hello",)]


def test_pdf_tables_positioned_heuristic():
    """Positioned-text table heuristic: rows cluster by y, cells order by
    x, single-cell lines (titles, footers) never join a table, and two
    separate >=2x2 regions yield two tables."""
    from vectordb_data_ingestion_spark.sources.ooxml import pdf_tables

    pdf = (
        b"stream\nBT "
        b"1 0 0 1 72 720 Tm (Report Title) Tj "
        b"1 0 0 1 72 700 Tm (h1) Tj 1 0 0 1 200 700 Tm (h2) Tj "
        b"1 0 0 1 72 680 Tm (a1) Tj 1 0 0 1 200 680 Tm (b1) Tj "
        b"1 0 0 1 72 600 Tm (lone footer) Tj "
        b"1 0 0 1 72 500 Tm (x1) Tj 1 0 0 1 150 500 Tm (y1) Tj "
        b"1 0 0 1 300 500 Tm (z1) Tj "
        b"1 0 0 1 72 480 Tm (x2) Tj 1 0 0 1 150 480 Tm (y2) Tj "
        b"1 0 0 1 300 480 Tm (z2) Tj "
        b"ET\nendstream"
    )
    assert pdf_tables(pdf) == ["h1|h2|a1|b1", "x1|y1|z1|x2|y2|z2"]
    # Td-relative positioning clusters the same way
    td = (
        b"stream\nBT 72 700 Td (c1) Tj 128 0 Td (c2) Tj "
        b"-128 -20 Td (d1) Tj 128 0 Td (d2) Tj ET\nendstream"
    )
    assert pdf_tables(td) == ["c1|c2|d1|d2"]
    assert pdf_tables(b"stream\nBT (just a line) Tj ET\nendstream") == []
    assert pdf_tables(b"no streams at all") == []


def test_pdf_tables_ruled_lattice():
    """Ruled-table reconstruction (r5 — the former 'partial' in the
    reference's tabula coverage, parsers.py:127-137): rule lines drawn
    with m/l (and thin-re) path operators define the grid; text buckets
    into cells by coordinate. The decisive case over the stream
    heuristic: an EMPTY cell is preserved as an empty field, and a
    multi-chunk cell joins in x order."""
    from vectordb_data_ingestion_spark.sources.ooxml import pdf_tables

    # 3 columns x 2 rows: verticals at x=70,190,310; horizontals at
    # y=710,690,670. Cell (0,1) holds two chunks; cell (1,1) is EMPTY.
    pdf = (
        b"stream\n"
        b"70 710 m 310 710 l S 70 690 m 310 690 l S 70 670 m 310 670 l S "
        b"70 670 m 70 710 l S 190 670 m 190 710 l S 310 670 m 310 710 l S "
        b"BT "
        b"1 0 0 1 80 700 Tm (name) Tj "
        b"1 0 0 1 200 700 Tm (unit) Tj 1 0 0 1 240 700 Tm (price) Tj "
        b"1 0 0 1 80 675 Tm (widget) Tj "
        b"ET\nendstream"
    )
    assert pdf_tables(pdf) == ["name|unit price|widget|"]

    # thin rectangles as rules (the other common drawing idiom)
    thin = (
        b"stream\n"
        b"70 710 240 0.8 re f 70 690 240 0.8 re f 70 670 240 0.8 re f "
        b"70 670 0.8 40 re f 190 670 0.8 40 re f 310 670 0.8 40 re f "
        b"BT 1 0 0 1 80 700 Tm (a) Tj 1 0 0 1 200 700 Tm (b) Tj "
        b"1 0 0 1 80 675 Tm (c) Tj 1 0 0 1 200 675 Tm (d) Tj "
        b"ET\nendstream"
    )
    assert pdf_tables(thin) == ["a|b|c|d"]

    # text outside the grid still goes through the stream heuristic,
    # and a page with rules but no 2x2 grid falls back entirely
    mixed = (
        b"stream\n"
        b"70 710 m 310 710 l S "  # a single rule: not a grid
        b"BT 1 0 0 1 72 600 Tm (p1) Tj 1 0 0 1 200 600 Tm (q1) Tj "
        b"1 0 0 1 72 580 Tm (p2) Tj 1 0 0 1 200 580 Tm (q2) Tj "
        b"ET\nendstream"
    )
    assert pdf_tables(mixed) == ["p1|q1|p2|q2"]


def test_pdf_tables_rules_only_stream_feeds_adjacent_text_stream():
    """Regression (ADVICE r5): a page whose ruled lines live in a
    graphics-only content stream (no BT) separate from its text stream
    lost its lattice table — the per-stream restructure skipped BT-less
    streams entirely. Rules-only streams must contribute their geometry
    to the adjacent text stream (following first, else preceding)."""
    from vectordb_data_ingestion_spark.sources.ooxml import pdf_tables

    grid = (
        b"stream\n"
        b"70 710 m 310 710 l S 70 690 m 310 690 l S 70 670 m 310 670 l S "
        b"70 670 m 70 710 l S 190 670 m 190 710 l S 310 670 m 310 710 l S\n"
        b"endstream"
    )
    text = (
        b"stream\nBT "
        b"1 0 0 1 80 700 Tm (name) Tj 1 0 0 1 200 700 Tm (price) Tj "
        b"1 0 0 1 80 675 Tm (widget) Tj "
        b"ET\nendstream"
    )
    # grid stream BEFORE the text stream (the common producer order)
    assert pdf_tables(grid + b"\n" + text) == ["name|price|widget|"]
    # grid stream AFTER the text stream attaches to the preceding one
    assert pdf_tables(text + b"\n" + grid) == ["name|price|widget|"]
    # a grid with no text stream anywhere yields nothing (no cells)
    assert pdf_tables(grid) == []

    # review r6 (confirmed repro): two text-then-grid pages — each grid
    # sits BETWEEN two text streams, and pure index order would weld
    # page 1's grid onto page 2's text. The bbox-overlap rule attaches
    # each grid to the page whose text lies inside it.
    def textpage(a: bytes, b: bytes, c: bytes) -> bytes:
        return (
            b"stream\nBT "
            b"1 0 0 1 80 700 Tm (" + a + b") Tj "
            b"1 0 0 1 200 700 Tm (" + b + b") Tj "
            b"1 0 0 1 80 675 Tm (" + c + b") Tj "
            b"ET\nendstream"
        )

    two = (
        textpage(b"sku", b"qty", b"gadget") + b"\n" + grid + b"\n"
        + textpage(b"name", b"price", b"widget") + b"\n" + grid
    )
    assert pdf_tables(two) == [
        "sku|qty|gadget|", "name|price|widget|"
    ]
    # ...and the mirror-image grid-then-text producer pairs forward
    two_rev = (
        grid + b"\n" + textpage(b"sku", b"qty", b"gadget") + b"\n"
        + grid + b"\n" + textpage(b"name", b"price", b"widget")
    )
    assert pdf_tables(two_rev) == [
        "sku|qty|gadget|", "name|price|widget|"
    ]


def test_pdf_tables_per_page_and_newline_ops():
    """Review r5 pins: (a) each content stream (≈ page) gets its OWN
    grid — two pages with same-coordinate ruled tables must yield two
    tables, not one garbled merge; stream-mode runs must not join
    across page boundaries either. (b) Path operators separated by
    newlines instead of spaces (TeX/Ghostscript emit one op per line)
    must still trigger rule scanning."""
    from vectordb_data_ingestion_spark.sources.ooxml import pdf_tables

    def page(a: bytes, b: bytes, c: bytes, d: bytes) -> bytes:
        return (
            b"stream\n"
            b"70 710 m 310 710 l S 70 690 m 310 690 l S "
            b"70 670 m 310 670 l S "
            b"70 670 m 70 710 l S 190 670 m 190 710 l S "
            b"310 670 m 310 710 l S "
            b"BT "
            b"1 0 0 1 80 700 Tm (" + a + b") Tj "
            b"1 0 0 1 200 700 Tm (" + b + b") Tj "
            b"1 0 0 1 80 675 Tm (" + c + b") Tj "
            b"1 0 0 1 200 675 Tm (" + d + b") Tj "
            b"ET\nendstream"
        )

    two_pages = page(b"a", b"b", b"c", b"d") + b"\n" + page(
        b"e", b"f", b"g", b"h"
    )
    assert pdf_tables(two_pages) == ["a|b|c|d", "e|f|g|h"]

    # unruled rows on two pages: runs must not merge across the boundary
    def textpage(r1: bytes, r2: bytes) -> bytes:
        return (
            b"stream\nBT "
            b"1 0 0 1 72 700 Tm (" + r1 + b"1) Tj "
            b"1 0 0 1 200 700 Tm (" + r1 + b"2) Tj "
            b"1 0 0 1 72 680 Tm (" + r2 + b"1) Tj "
            b"1 0 0 1 200 680 Tm (" + r2 + b"2) Tj "
            b"ET\nendstream"
        )

    assert pdf_tables(textpage(b"a", b"b") + b"\n" + textpage(b"c", b"d")) \
        == ["a1|a2|b1|b2", "c1|c2|d1|d2"]

    # newline-separated path operators (no ' m'/' l' byte substrings:
    # the separator BEFORE each operator is a newline, valid PDF syntax)
    nl = (
        b"stream\n"
        b"70 710\nm\n310 710\nl\nS\n70 690\nm\n310 690\nl\nS\n"
        b"70 670\nm\n310 670\nl\nS\n"
        b"70 670\nm\n70 710\nl\nS\n190 670\nm\n190 710\nl\nS\n"
        b"310 670\nm\n310 710\nl\nS\n"
        b"BT "
        b"1 0 0 1 80 700 Tm (a) Tj 1 0 0 1 200 700 Tm (b) Tj "
        b"1 0 0 1 80 675 Tm (c) Tj 1 0 0 1 200 675 Tm (d) Tj "
        b"ET\nendstream"
    )
    assert pdf_tables(nl) == ["a|b|c|d"]


def test_review_r4_regressions():
    """Pin the review fixes: \\8 and \\9 are NOT octal escapes (backslash
    dropped, char kept — never a raise); corrupt payloads through the
    registry yield null text instead of aborting the job; xlsx sheet
    index follows WORKBOOK order, not part-filename order."""
    from vectordb_data_ingestion_spark.sources.ooxml import pdf_to_text

    assert pdf_to_text(b"stream\nBT (a\\89b\\101) Tj ET\nendstream") == (
        "a89bA"
    )
    # corrupt docx (truncated zip) -> null text, not BadZipFile
    assert fmod.parse_bytes(b"PK\x03\x04 truncated junk", "docx") is None
    # xlsx: workbook.xml order wins over filename order
    reordered = make_zip({
        "xl/workbook.xml": (
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets>'
            '<sheet name="Second" sheetId="2" r:id="rId2"/>'
            '<sheet name="First" sheetId="1" r:id="rId1"/>'
            "</sheets></workbook>"
        ),
        "xl/_rels/workbook.xml.rels": (
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>'
            '<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>'
            "</Relationships>"
        ),
        "xl/worksheets/sheet1.xml": f'<worksheet xmlns="{S}"><sheetData>'
            '<row r="1"><c r="A1" t="str"><v>part-one</v></c></row>'
            "</sheetData></worksheet>",
        "xl/worksheets/sheet2.xml": f'<worksheet xmlns="{S}"><sheetData>'
            '<row r="1"><c r="A1" t="str"><v>part-two</v></c></row>'
            "</sheetData></worksheet>",
    })
    # display order: Second (sheet2.xml) first, First (sheet1.xml) second
    assert xlsx_rows(reordered, sheet=0) == [("part-two",)]
    assert xlsx_rows(reordered, sheet=1) == [("part-one",)]
    # named-sheet lookup (r5: the last stdlib-tier NotImplementedError gone)
    assert xlsx_rows(reordered, sheet="Second") == [("part-two",)]
    assert xlsx_rows(reordered, sheet="First") == [("part-one",)]
    with pytest.raises(KeyError, match="Budget"):
        xlsx_rows(reordered, sheet="Budget")


def test_xlsx_absolute_and_parent_rel_targets():
    """Workbook rel Targets may be package-absolute ("/xl/worksheets/
    sheet1.xml" — some producers emit these) — they must normalize to
    the member path instead of doubling to "xl/xl/..." and KeyErroring
    on a valid workbook (advice r5)."""
    wb = (
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Only" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    sheet = (
        f'<worksheet xmlns="{S}"><sheetData>'
        '<row r="1"><c r="A1" t="str"><v>abs-target</v></c></row>'
        "</sheetData></worksheet>"
    )

    def rels(target):
        return (
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            f'<Relationship Id="rId1" Type="t" Target="{target}"/>'
            "</Relationships>"
        )

    for target in ("/xl/worksheets/sheet1.xml", "../xl/worksheets/sheet1.xml"):
        z = make_zip({
            "xl/workbook.xml": wb,
            "xl/_rels/workbook.xml.rels": rels(target),
            "xl/worksheets/sheet1.xml": sheet,
        })
        assert xlsx_rows(z, sheet=0) == [("abs-target",)], target


def test_decompression_bombs_refused():
    """A kilobyte of crafted DEFLATE inflating to gigabytes must be
    refused with ValueError at every inflate site — one such file in a
    100 TB corpus must not OOM its executor. parse_bytes degrades it to
    null text like any other corrupt payload."""
    import zlib as _zlib

    from vectordb_data_ingestion_spark.sources import files as fmod
    from vectordb_data_ingestion_spark.sources.ooxml import (
        _MAX_INFLATE,
        bounded_inflate,
    )

    bomb_payload = _zlib.compress(b"\x00" * (_MAX_INFLATE + 1024), 9)
    assert len(bomb_payload) < 1 << 20  # the whole point: tiny on disk
    with pytest.raises(ValueError, match="inflates past"):
        bounded_inflate(bomb_payload)
    # inside a PDF content stream -> decoder refuses, parse degrades
    bomb_pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode >>\nstream\n"
        + bomb_payload + b"\nendstream\nendobj\n%%EOF"
    )
    assert fmod.parse_bytes(bomb_pdf, "pdf") is None
    # a zip member declaring a bomb-sized payload -> refused pre-read
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("word/document.xml", b"\x00" * 2048)
    data = bytearray(buf.getvalue())
    # fake the declared sizes in both headers (local + central directory)
    import struct as _struct

    for off in range(len(data) - 4):
        if data[off:off + 4] in (b"PK\x03\x04", b"PK\x01\x02"):
            size_off = off + (22 if data[off + 3] == 4 else 24)
            _struct.pack_into("<I", data, size_off, _MAX_INFLATE + 1)
    with zipfile.ZipFile(io.BytesIO(bytes(data))) as z:
        assert z.getinfo("word/document.xml").file_size > _MAX_INFLATE
    assert fmod.parse_bytes(bytes(data), "docx") is None


def test_zip_member_lying_small_size_stays_bounded():
    """Review r6 (confirmed by memory probe): the declared-size gate is
    attacker-controlled, and CPython's whole-member z.read() inflates the
    full DEFLATE stream before noticing the lie — a member DECLARING 100
    bytes but inflating to gigabytes sailed past the gate and ballooned.
    _read_member now streams via z.open() in 1 MB chunks, so peak
    allocation tracks the cap, not the stream."""
    import struct as _struct
    import tracemalloc

    from vectordb_data_ingestion_spark.sources.ooxml import _read_member

    real = 64 * (1 << 20)  # 64 MB of zeros -> tiny on disk
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("word/document.xml", b"\x00" * real)
    data = bytearray(buf.getvalue())
    for off in range(len(data) - 4):
        if data[off:off + 4] in (b"PK\x03\x04", b"PK\x01\x02"):
            size_off = off + (22 if data[off + 3] == 4 else 24)
            _struct.pack_into("<I", data, size_off, 100)  # the lie

    with zipfile.ZipFile(io.BytesIO(bytes(data))) as z:
        assert z.getinfo("word/document.xml").file_size == 100
        tracemalloc.start()
        try:
            out = _read_member(z, "word/document.xml")
        except (ValueError, zipfile.BadZipFile):
            out = b""  # refusing is equally acceptable — just not OOM
        _cur, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
    # pre-fix this peaked at ~the full inflated size (64 MB+);
    # streaming keeps it near the chunk size
    assert peak < 16 * (1 << 20), f"peak {peak} bytes — bomb not bounded"
    assert len(out) <= 100


def test_xml_entity_bomb_refused():
    """expat expands internal DTD entities, so a billion-laughs
    word/document.xml must be REFUSED (legit OOXML never declares a DTD)
    and degrade to null text through parse_bytes — never expand."""
    ents = "".join(
        f'<!ENTITY e{i} "&e{i-1};&e{i-1};&e{i-1};&e{i-1};&e{i-1};'
        f'&e{i-1};&e{i-1};&e{i-1};&e{i-1};&e{i-1};">'
        for i in range(1, 10)
    )
    bomb_xml = (
        '<?xml version="1.0"?><!DOCTYPE w [<!ENTITY e0 "lol">'
        + ents
        + f']><w:document xmlns:w="{W}"><w:body>'
        "<w:p><w:r><w:t>&e9;</w:t></w:r></w:p></w:body></w:document>"
    )
    bomb = make_zip({"word/document.xml": bomb_xml})
    with pytest.raises(ValueError, match="DTD"):
        docx_to_text(bomb)
    assert fmod.parse_bytes(bomb, "docx") is None


def test_bounded_inflate_mirrors_zlib_semantics():
    """Truncated and checksum-corrupt streams must still raise zlib.error
    (silent partial text is the failure mode); trailing junk after a
    complete stream stays tolerated; only the bomb raises ValueError."""
    from vectordb_data_ingestion_spark.sources.ooxml import bounded_inflate

    good = zlib.compress(b"hello world" * 100)
    assert bounded_inflate(good) == b"hello world" * 100
    assert bounded_inflate(good + b"\r\n") == b"hello world" * 100
    with pytest.raises(zlib.error):
        bounded_inflate(good[:-8])          # truncated
    with pytest.raises(zlib.error):
        bounded_inflate(good[:-2] + b"\x00\x00")  # corrupt adler32


def test_dtd_string_inside_comment_not_refused():
    """'<!DOCTYPE' inside a legal XML comment is NOT a DTD — the document
    must parse (a real DTD cannot live inside a comment)."""
    docx = make_zip({"word/document.xml": f"""<?xml version="1.0"?>
<!-- converted; original had <!DOCTYPE html in it -->
<w:document xmlns:w="{W}"><w:body>
<w:p><w:r><w:t>ok</w:t></w:r></w:p></w:body></w:document>"""})
    assert docx_to_text(docx) == "ok"
