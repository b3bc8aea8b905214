"""Pure-stdlib decoders for OOXML containers (docx/pptx/xlsx) and simple
PDFs — no third-party libraries.

The reference parses these with langchain loaders / openpyxl
(parsers.py:75-154, cmfunctions.py:448-454); those libs are not installed
in every deployment, and this engine previously fell back to a clearly
marked deterministic stub. But the OOXML formats are just zip archives of
XML (ECMA-376) and PDF text streams are zlib-deflated content streams —
all decodable with ``zipfile``/``xml.etree``/``zlib`` alone. These
decoders are the middle tier of the parser registry
(``sources/files.py``): a real importable library still wins (full
fidelity: ruled tables, encodings, CID fonts), the stdlib decoder
replaces the stub everywhere else (``sources/cfb.py`` covers ``msg``).
``pdf_tables`` adds heuristic table extraction from positioned text
(``Tm``/``Td`` interpretation) in the reference's pipe-joined shape.

Fidelity limits (documented, not silent):
- docx: body paragraphs (``w:p`` -> concatenated ``w:t`` runs, tabs and
  breaks normalized); table cell paragraphs are included in document
  order (python-docx's ``.paragraphs`` skips tables).
- pptx: per-slide ``a:p`` paragraphs in slide-number order.
- xlsx: shared/inline strings, numbers (int when integral), booleans;
  formulas yield their cached value; no date coercion (raw serial).
- pdf: FlateDecode/raw content streams only, simple-font ``Tj``/``TJ``/
  ``'``/``\"`` text operators, PDFDocEncoding-approximate (latin-1)
  string decode. CID/Type0-encoded text comes out garbled and
  encrypted PDFs yield '' — use pypdf (auto-upgraded when importable)
  for those.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from xml.etree import ElementTree as ET


def _local(tag: str) -> str:
    """Strip the XML namespace: '{ns}p' -> 'p'."""
    return tag.rsplit("}", 1)[-1]


# Decompression-bomb guard for executor-side decode: a kilobyte of
# crafted DEFLATE can inflate to gigabytes (~1000:1), and one such file
# in a 100 TB corpus would OOM the executor that drew it. 256 MB of
# decoded XML/stream text per member is far beyond any legitimate
# document part.
_MAX_INFLATE = 1 << 28


def _read_member(z: zipfile.ZipFile, name: str) -> bytes:
    """Bounded zip-member read. The declared file_size is
    attacker-controlled AND CPython's ``z.read()`` inflates the whole
    DEFLATE stream before noticing the size lie (review r6, measured:
    a member declaring 100 bytes still allocated the full inflated
    stream) — so the real guard is streaming via ``z.open()`` and
    cutting off one chunk past the cap; the declared-size check stays
    as the cheap fast path."""
    info = z.getinfo(name)
    if info.file_size > _MAX_INFLATE:
        raise ValueError(
            f"zip member {name!r} declares {info.file_size} bytes "
            f"(> {_MAX_INFLATE}); refusing to inflate"
        )
    out = bytearray()
    with z.open(name) as fh:
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            out.extend(chunk)
            if len(out) > _MAX_INFLATE:
                raise ValueError(
                    f"zip member {name!r} inflates past {_MAX_INFLATE} "
                    "bytes despite its declared size; refusing to continue"
                )
    return bytes(out)


def _parse_xml(data: bytes) -> ET.Element:
    """ET.fromstring with a DTD rejection: expat expands internal
    entities (verified on this build), so a billion-laughs docx part
    would blow up executor memory. Legitimate OOXML parts never declare
    a DTD — refuse rather than expand. Comments are stripped before the
    scan (a provenance comment may legally CONTAIN the string
    '<!DOCTYPE'; an actual DTD cannot live inside a comment) — but only
    on the rare hit path, so the common case costs one substring scan
    and zero copies."""
    if b"<!DOCTYPE" in data or b"<!ENTITY" in data:
        scan = re.sub(rb"<!--.*?-->", b"", data, flags=re.S)
        if b"<!DOCTYPE" in scan or b"<!ENTITY" in scan:
            raise ValueError("XML part declares a DTD/entities; refusing")
    return ET.fromstring(data)


def bounded_inflate(data: bytes, limit: int = _MAX_INFLATE) -> bytes:
    """``zlib.decompress`` with an output cap — raises ValueError instead
    of ballooning on a crafted bomb. Otherwise mirrors zlib.decompress
    semantics exactly (pinned by test): truncated or checksum-corrupt
    streams raise ``zlib.error`` (so decoder fallbacks keep working and
    partial data is never silently returned), trailing junk after a
    complete stream is tolerated."""
    d = zlib.decompressobj()
    out = d.decompress(data, limit)
    if d.unconsumed_tail:
        raise ValueError(
            f"compressed stream inflates past {limit} bytes; "
            "refusing to continue"
        )
    if not d.eof:
        raise zlib.error(
            "Error -5 while decompressing data: incomplete or truncated "
            "stream"
        )
    return out


# ---------------------------------------------------------------------------
# DOCX
# ---------------------------------------------------------------------------

def docx_to_text(content: bytes) -> str:
    """word/document.xml -> one line per paragraph (``w:p``), runs
    (``w:t``) concatenated, ``w:tab``/``w:br`` normalized to tab/newline —
    the same text python-docx's ``'\\n'.join(p.text)`` yields for body
    paragraphs (reference parsers.py:75-80 semantics)."""
    with zipfile.ZipFile(io.BytesIO(content)) as z:
        root = _parse_xml(_read_member(z, "word/document.xml"))
    paras = []
    for p in root.iter():
        if _local(p.tag) != "p":
            continue
        runs = []
        for node in p.iter():
            ln = _local(node.tag)
            if ln == "t":
                runs.append(node.text or "")
            elif ln == "tab":
                runs.append("\t")
            elif ln == "br":
                runs.append("\n")
        paras.append("".join(runs))
    return "\n".join(paras)


# ---------------------------------------------------------------------------
# PPTX
# ---------------------------------------------------------------------------

def pptx_to_text(content: bytes) -> str:
    """ppt/slides/slideN.xml in slide order -> one line per text
    paragraph (``a:p``, runs ``a:t`` concatenated) — the text
    python-pptx surfaces via shape text_frames (parsers.py:89-93)."""
    with zipfile.ZipFile(io.BytesIO(content)) as z:
        slides = sorted(
            (n for n in z.namelist()
             if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"slide(\d+)\.xml", n).group(1)),
        )
        lines = []
        for name in slides:
            root = _parse_xml(_read_member(z, name))
            for p in root.iter():
                if _local(p.tag) != "p":
                    continue
                text = "".join(
                    node.text or ""
                    for node in p.iter()
                    if _local(node.tag) == "t"
                )
                lines.append(text)
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# XLSX
# ---------------------------------------------------------------------------

def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27 (0-based column index)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _rich_text(el) -> str:
    """Concatenated ``t`` text of a rich-text container (``si``/``is``),
    SKIPPING ``rPh`` phonetic-run subtrees: furigana annotations are
    display hints, not cell text — a blind ``.iter()`` rendered
    '東京とうきょう' where Excel and openpyxl show '東京' (review r6)."""
    parts = []
    for node in el:
        ln = _local(node.tag)
        if ln == "rPh":
            continue
        if ln == "t":
            parts.append(node.text or "")
        else:
            parts.append(_rich_text(node))
    return "".join(parts)


def _cell_value(cell, shared: list[str]):
    t = cell.get("t", "n")
    v_node = None
    is_node = None
    for node in cell:
        ln = _local(node.tag)
        if ln == "v":
            v_node = node
        elif ln == "is":
            is_node = node
    if t == "inlineStr":
        if is_node is None:
            return None
        return _rich_text(is_node)
    if v_node is None or v_node.text is None:
        return None
    raw = v_node.text
    if t == "s":
        return shared[int(raw)]
    if t == "str":
        return raw
    if t == "b":
        return raw.strip() == "1"
    # numeric: int when integral (openpyxl parity for the common case)
    try:
        f = float(raw)
    except ValueError:
        return raw
    return int(f) if f.is_integer() and "e" not in raw.lower() else f


def _sheet_parts(z: zipfile.ZipFile) -> list[tuple[str | None, str]]:
    """(display name, worksheet part) pairs in WORKBOOK order
    (xl/workbook.xml sheet sequence resolved through the rels map) — part
    FILENAMES do not follow display order once sheets are reordered in
    Excel, so a filename sort can silently return the wrong worksheet for
    an index (openpyxl follows workbook order; so must we). The display
    name enables named-sheet lookup (``xlsx_rows(sheet="Budget")``).
    Falls back to the numeric filename sort — names None — only when the
    workbook/rels parts are absent."""
    try:
        rels_root = _parse_xml(_read_member(z, "xl/_rels/workbook.xml.rels"))
        rel_target = {}
        for rel in rels_root:
            rid = rel.get("Id")
            target = rel.get("Target", "")
            if target and rid:
                # rel Targets are normally relative to xl/ ("worksheets/
                # sheet1.xml") but may be package-absolute ("/xl/worksheets/
                # sheet1.xml") or climb out ("../foo") — normalize BEFORE
                # the xl/ check, else an absolute target doubles to
                # "xl/xl/..." and a valid workbook KeyErrors.
                norm = target.lstrip("/")
                if norm.startswith("../"):
                    norm = norm[3:]  # relative to xl/; ../ is package root
                elif not norm.startswith("xl/"):
                    norm = "xl/" + norm
                rel_target[rid] = norm
        wb_root = _parse_xml(_read_member(z, "xl/workbook.xml"))
        ordered = []
        for node in wb_root.iter():
            if _local(node.tag) != "sheet":
                continue
            rid = next(
                (v for k, v in node.attrib.items() if k.endswith("}id")),
                None,
            )
            # WORKSHEETS only: <sheets> also lists chartsheets, whose
            # inclusion shifts integer indexing off openpyxl's
            # wb.worksheets and silently returns an empty sheet
            # (review r6)
            if (
                rid
                and rid in rel_target
                and rel_target[rid].startswith("xl/worksheets/")
            ):
                ordered.append((node.get("name"), rel_target[rid]))
        if ordered:
            return ordered
    except KeyError:
        pass
    return [
        (None, n)
        for n in sorted(
            (n for n in z.namelist()
             if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"sheet(\d+)\.xml", n).group(1)),
        )
    ]


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = _parse_xml(_read_member(z, "xl/sharedStrings.xml"))
        for si in root:
            if _local(si.tag) != "si":
                continue
            shared.append(_rich_text(si))
    return shared


def _sheet_rows(root, shared: list[str]) -> list[tuple]:
    rows: list[list] = []
    for row in root.iter():
        if _local(row.tag) != "row":
            continue
        vals: list = []
        for cell in row:
            if _local(cell.tag) != "c":
                continue
            ref = cell.get("r", "")
            col = _col_index(ref) if ref else len(vals)
            while len(vals) < col:
                vals.append(None)
            vals.append(_cell_value(cell, shared))
        rows.append(vals)
    width = max((len(r) for r in rows), default=0)
    return [tuple(r + [None] * (width - len(r))) for r in rows]


def xlsx_rows(content: bytes, sheet: int | str = 0) -> list[tuple]:
    """Worksheet rows as tuples of typed values, column gaps preserved as
    None and short rows right-padded to the sheet's max width — the shape
    ``openpyxl.iter_rows`` yields, feeding ``excel_rows_to_df``
    (reference cmfunctions.py:448-454). ``sheet`` addresses worksheets by
    workbook-order index or by display NAME (openpyxl ``wb["Budget"]``
    parity; names live in xl/workbook.xml, resolved by _sheet_parts)."""
    with zipfile.ZipFile(io.BytesIO(content)) as z:
        shared = _shared_strings(z)
        sheets = _sheet_parts(z)
        if isinstance(sheet, str):
            names = [n for n, _p in sheets]
            if sheet not in names:
                raise KeyError(
                    f"no worksheet named {sheet!r} (have: "
                    f"{[n for n in names if n is not None]})"
                )
            part = sheets[names.index(sheet)][1]
        else:
            if sheet >= len(sheets):
                raise IndexError(f"sheet {sheet} of {len(sheets)}")
            part = sheets[sheet][1]
        root = _parse_xml(_read_member(z, part))
    return _sheet_rows(root, shared)


def _fmt_cell(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def xlsx_to_text(content: bytes) -> str:
    """Workbook rendered as chunkable text: tab-joined cells,
    newline-joined rows, blank line between sheets. This is the
    document-pipeline rendering of the reference's Excel ingestion
    (cmfunctions.py:448-454 reads sheets into rows); the typed tabular
    shape lives in ``sources/tabular.py`` — this render exists so a
    mixed SharePoint catalog containing ``.xlsx`` entries flows through
    ``parse_documents`` instead of aborting on an unregistered kind."""
    with zipfile.ZipFile(io.BytesIO(content)) as z:
        shared = _shared_strings(z)
        roots = [
            _parse_xml(_read_member(z, p)) for _n, p in _sheet_parts(z)
        ]
    return "\n\n".join(
        "\n".join(
            "\t".join(_fmt_cell(v) for v in r)
            for r in _sheet_rows(root, shared)
        )
        for root in roots
    )


# ---------------------------------------------------------------------------
# PDF (simple text extraction)
# ---------------------------------------------------------------------------

_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_literal(data: bytes, start: int) -> tuple[bytes, int]:
    """Decode a PDF literal string starting at the '(' in ``data[start]``;
    returns (decoded bytes, index after the closing ')')."""
    out = bytearray()
    depth = 1
    i = start + 1
    while i < len(data) and depth:
        ch = data[i:i + 1]
        if ch == b"\\":
            nxt = data[i + 1:i + 2]
            if nxt in _PDF_ESCAPES:
                out += _PDF_ESCAPES[nxt]
                i += 2
            elif nxt and nxt in b"01234567":  # \ooo octal (1-3 digits;
                # 8/9 are NOT octal — int(..., 8) on them would raise and
                # break the never-raise contract)
                j = i + 1
                while (
                    j < min(i + 4, len(data))
                    and data[j:j + 1] in b"01234567"
                ):
                    j += 1
                out.append(int(data[i + 1:j], 8) & 0xFF)
                i = j
            elif nxt in (b"\r", b"\n", b""):
                i += 2  # line continuation: both chars dropped
            else:
                # unknown escape: per spec the backslash is ignored and
                # the character kept
                out += nxt
                i += 2
        elif ch == b"(":
            depth += 1
            out += ch
            i += 1
        elif ch == b")":
            depth -= 1
            if depth:
                out += ch
            i += 1
        else:
            out += ch
            i += 1
    return bytes(out), i


def _pdf_stream_text(stream: bytes) -> list[str]:
    """Text shown by a decoded content stream: every string operand of a
    ``Tj``/``'``/``\"`` and every string element of a ``TJ`` array, in
    order. Strings are decoded latin-1 (PDFDocEncoding-approximate)."""
    texts: list[str] = []
    array: list[str] | None = None  # inside a TJ [ ... ] operand
    i = 0
    n = len(stream)
    while i < n:
        ch = stream[i:i + 1]
        if ch == b"(":
            # every string literal in a BT-bearing content stream is (or
            # belongs to) a show-text operand: Tj/'/" take one string, TJ
            # arrays interleave strings with kern numbers — collect all
            raw, i = _pdf_literal(stream, i)
            s = raw.decode("latin-1", "replace")
            (texts if array is None else array).append(s)
        elif ch == b"<" and stream[i + 1:i + 2] != b"<":
            m = re.match(rb"<([0-9A-Fa-f\s]*)>", stream[i:])
            if m:
                hexstr = re.sub(rb"\s", b"", m.group(1))
                if len(hexstr) % 2:
                    hexstr += b"0"
                s = bytes.fromhex(hexstr.decode("ascii")).decode(
                    "latin-1", "replace"
                )
                (texts if array is None else array).append(s)
                i += m.end()
            else:
                i += 1
        elif ch == b"[":
            array = []
            i += 1
        elif ch == b"]":
            # TJ fragments are one shown run — kern numbers between them
            # adjust spacing, not word boundaries: concatenate
            if array:
                texts.append("".join(array))
            array = None
            i += 1
        else:
            i += 1
    return [t for t in texts if t]


def pdf_to_text(content: bytes) -> str:
    """Text of a simple PDF: every ``stream``/``endstream`` block is
    inflated (FlateDecode via ``zlib``, or taken raw), blocks containing
    text-begin markers (``BT``) contribute their ``Tj``/``TJ`` strings.
    Lenient by design: junk or streamless bytes yield '' rather than
    raising (the dispatch contract for unparseable payloads)."""
    if not content:
        return ""
    chunks: list[str] = []
    for m in re.finditer(rb"stream\r?\n(.*?)endstream", content, re.DOTALL):
        data = m.group(1)
        decoded = None
        try:
            decoded = bounded_inflate(data)
        except zlib.error:
            # raw (uncompressed) stream, or trailing EOL junk
            try:
                decoded = bounded_inflate(data.rstrip(b"\r\n"))
            except zlib.error:
                decoded = data
        if b"BT" in decoded:
            parts = _pdf_stream_text(decoded)
            if parts:
                chunks.append(" ".join(parts))
    return "\n".join(chunks)


# ---------------------------------------------------------------------------
# PDF positioned text + table heuristic
# ---------------------------------------------------------------------------

_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


def _pdf_positioned(stream: bytes) -> list[tuple[float, float, str]]:
    """(x, y, text) per shown string, by interpreting the text-positioning
    operators (``Tm``/``Td``/``TD``/``TL``/``T*``) of a decoded content
    stream. Glyph-width advancement is approximated (6pt/char) — good
    enough to cluster rows and order cells, not for exact kerning."""
    out: list[tuple[float, float, str]] = []
    operands: list = []
    x = y = line_x = line_y = 0.0
    leading = 0.0
    i, n = 0, len(stream)

    def nums(k):
        vals = [v for v in operands if isinstance(v, float)]
        return vals[-k:] if len(vals) >= k else [0.0] * k

    def emit(s: str):
        nonlocal x
        out.append((x, y, s))
        x += 6.0 * len(s)

    while i < n:
        ch = stream[i:i + 1]
        if ch in b" \t\r\n\x00[]":
            i += 1
        elif ch == b"%":
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif ch == b"(":
            raw, i = _pdf_literal(stream, i)
            operands.append(raw.decode("latin-1", "replace"))
        elif ch == b"<" and stream[i + 1:i + 2] != b"<":
            m = re.match(rb"<([0-9A-Fa-f\s]*)>", stream[i:])
            if m:
                h = re.sub(rb"\s", b"", m.group(1))
                if len(h) % 2:
                    h += b"0"
                operands.append(
                    bytes.fromhex(h.decode("ascii")).decode(
                        "latin-1", "replace"
                    )
                )
                i += m.end()
            else:
                i += 1
        elif ch == b"/":
            m = re.match(rb"/[^\s\[\]()<>/]*", stream[i:])
            i += m.end() if m else 1
        elif _NUM_RE.match(stream[i:i + 24]) and not stream[
            i:i + 1
        ].isalpha():
            m = _NUM_RE.match(stream, i)
            operands.append(float(m.group()))
            i = m.end()
        else:
            m = re.match(rb"[A-Za-z'\"*]+", stream[i:])
            if not m:
                i += 1
                continue
            op = m.group()
            i += m.end()
            if op == b"BT":
                x = y = line_x = line_y = 0.0
            elif op == b"Tm":
                e, f = nums(6)[-2:]
                x = line_x = e
                y = line_y = f
            elif op in (b"Td", b"TD"):
                tx, ty = nums(2)
                line_x += tx
                line_y += ty
                x, y = line_x, line_y
                if op == b"TD":
                    leading = -ty
            elif op == b"TL":
                leading = nums(1)[0]
            elif op == b"T*":
                line_y -= leading
                x, y = line_x, line_y
            elif op in (b"Tj", b"'", b'"'):
                strs = [v for v in operands if isinstance(v, str)]
                if op != b"Tj":
                    line_y -= leading
                    x, y = line_x, line_y
                if strs:
                    emit(strs[-1])
            elif op == b"TJ":
                for v in operands:
                    if isinstance(v, str):
                        emit(v)
            operands = []
    return out


def _pdf_rules(
    stream: bytes,
) -> tuple[list[tuple[float, float, float]], list[tuple[float, float, float]]]:
    """Axis-aligned rule lines from a decoded content stream's path
    operators: horizontal segments as ``(y, x0, x1)`` and vertical as
    ``(x, y0, y1)``. Sources: ``m``/``l`` stroked polylines and ``re``
    rectangles — a THIN rect (common way to draw a 1pt rule) collapses
    to its centerline; a box rect contributes its four edges. Curves
    only advance the current point. Strings/hex/names are skipped with
    the same lexers as the text interpreter, so digits inside shown text
    never masquerade as coordinates."""
    h: list[tuple[float, float, float]] = []
    v: list[tuple[float, float, float]] = []
    operands: list[float] = []
    cur: tuple[float, float] | None = None

    def seg(x0: float, y0: float, x1: float, y1: float) -> None:
        if abs(y1 - y0) <= 0.5 and abs(x1 - x0) > 0.5:
            h.append(((y0 + y1) / 2, min(x0, x1), max(x0, x1)))
        elif abs(x1 - x0) <= 0.5 and abs(y1 - y0) > 0.5:
            v.append(((x0 + x1) / 2, min(y0, y1), max(y0, y1)))

    i, n = 0, len(stream)
    while i < n:
        ch = stream[i:i + 1]
        if ch in b" \t\r\n\x00[]":
            i += 1
        elif ch == b"%":
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif ch == b"(":
            _raw, i = _pdf_literal(stream, i)
        elif ch == b"<" and stream[i + 1:i + 2] != b"<":
            m = re.match(rb"<[0-9A-Fa-f\s]*>", stream[i:])
            i += m.end() if m else 1
        elif ch == b"/":
            m = re.match(rb"/[^\s\[\]()<>/]*", stream[i:])
            i += m.end() if m else 1
        elif _NUM_RE.match(stream[i:i + 24]) and not ch.isalpha():
            m = _NUM_RE.match(stream, i)
            operands.append(float(m.group()))
            i = m.end()
        else:
            m = re.match(rb"[A-Za-z'\"*]+", stream[i:])
            if not m:
                i += 1
                continue
            op = m.group()
            i += m.end()
            if op == b"m" and len(operands) >= 2:
                cur = (operands[-2], operands[-1])
            elif op == b"l" and len(operands) >= 2 and cur is not None:
                nxt = (operands[-2], operands[-1])
                seg(cur[0], cur[1], nxt[0], nxt[1])
                cur = nxt
            elif op in (b"c", b"v", b"y") and len(operands) >= 2:
                cur = (operands[-2], operands[-1])
            elif op == b"re" and len(operands) >= 4:
                rx, ry, rw, rh = operands[-4:]
                if abs(rh) <= 2.0 and abs(rw) > 2.0:
                    h.append((ry + rh / 2, min(rx, rx + rw), max(rx, rx + rw)))
                elif abs(rw) <= 2.0 and abs(rh) > 2.0:
                    v.append((rx + rw / 2, min(ry, ry + rh), max(ry, ry + rh)))
                else:
                    x0, x1 = min(rx, rx + rw), max(rx, rx + rw)
                    y0, y1 = min(ry, ry + rh), max(ry, ry + rh)
                    h.extend([(y0, x0, x1), (y1, x0, x1)])
                    v.extend([(x0, y0, y1), (x1, y0, y1)])
            operands = []
    return h, v


def _cluster(vals: list[float], tol: float = 1.5) -> list[float]:
    """Sorted representative values with near-equal neighbors merged."""
    out: list[float] = []
    for val in sorted(vals):
        if out and val - out[-1] <= tol:
            continue
        out.append(val)
    return out


def _lattice_table(
    chunks: list[tuple[float, float, str]],
    hlines: list[tuple[float, float, float]],
    vlines: list[tuple[float, float, float]],
) -> tuple[str | None, tuple[float, float, float, float] | None]:
    """Reconstruct ONE ruled table from the grid the rule lines draw:
    clustered horizontal-line ys are row boundaries, vertical-line xs
    column boundaries; positioned text buckets into cells by coordinate.
    Returns (pipe-joined row-major table, grid bbox) or (None, None)
    when the lines don't form a >=2x2-cell grid. One grid per content
    stream — side-by-side ruled tables on the same page merge
    (documented limit)."""
    ys = _cluster([y for y, _x0, _x1 in hlines])
    xs = _cluster([x for x, _y0, _y1 in vlines])
    if len(ys) < 3 or len(xs) < 3:
        return None, None
    ys = ys[::-1]  # PDF y grows upward: top boundary first
    n_rows, n_cols = len(ys) - 1, len(xs) - 1
    cells: list[list[list[tuple[float, str]]]] = [
        [[] for _ in range(n_cols)] for _ in range(n_rows)
    ]
    for cx, cy, text in chunks:
        if not (xs[0] <= cx <= xs[-1] and ys[-1] <= cy <= ys[0]):
            continue
        col = next(
            (j for j in range(n_cols) if cx < xs[j + 1]), n_cols - 1
        )
        row = next(
            (k for k in range(n_rows) if cy > ys[k + 1]), n_rows - 1
        )
        cells[row][col].append((cx, text))
    flat = [
        " ".join(t for _x, t in sorted(cell)).strip()
        for row in cells
        for cell in row
    ]
    if not any(flat):
        return None, None
    bbox = (xs[0], ys[-1], xs[-1], ys[0])
    return "|".join(flat), bbox


# a path operator token anywhere in the stream: delimited by anything
# that cannot extend an operator name (operators may be preceded by
# newlines, not just spaces — TeX/Ghostscript emit one op per line).
# False positives (an 'm' inside shown text) just run the cheap lexer,
# which skips string literals properly; false negatives would silently
# drop ruled tables.
_RULE_OP_RE = re.compile(rb"(?<![A-Za-z'\"*])(?:re|l|m)(?![A-Za-z'\"*])")


def pdf_tables(content: bytes, y_tol: float = 2.0) -> list[str]:
    """Table extraction from a simple PDF, tabula's two modes re-expressed
    (reference ``process_pdf_table``, parsers.py:127-137 — one
    pipe-joined string per table):

    - **lattice** (r5): rule lines drawn with ``m``/``l``/``re`` path
      operators form a grid; clustered boundaries define cells and
      positioned text buckets into them — empty cells are preserved as
      empty fields, which the unruled heuristic cannot know about.
    - **stream**: positioned strings cluster into rows by y (tolerance
      ``y_tol``); a TABLE is a maximal run of >=2 consecutive rows that
      each hold >=2 cells. Runs on the text OUTSIDE any detected grid.

    Each content stream (≈ one page in the simple tier) is processed
    INDEPENDENTLY: pooling pages would merge same-coordinate tables from
    different pages into one garbled grid and join stream-mode runs
    across page boundaries. A page whose TEXT is split across several
    streams is handled per-stream (documented limit); a stream holding
    only rule geometry (no ``BT`` / no positioned text — some producers
    emit the grid and the text as separate content streams) contributes
    its rules to an ADJACENT text stream instead of being dropped:
    between the nearest preceding and following text streams, the one
    whose positioned text actually falls inside the rules' bounding box
    wins (content beats order — producers emit grid-then-text AND
    text-then-grid, and index order alone would weld one page's grid
    onto the next page's text); with no overlap either side, the
    following one.

    Scanned (raster) documents stay out of scope — there is no text or
    vector geometry to interpret; that needs OCR."""
    streams: list[tuple[list, list, list]] = []
    for m in re.finditer(rb"stream\r?\n(.*?)endstream", content, re.DOTALL):
        data = m.group(1)
        try:
            decoded = bounded_inflate(data)
        except zlib.error:
            try:
                decoded = bounded_inflate(data.rstrip(b"\r\n"))
            except zlib.error:
                decoded = data
        chunks = _pdf_positioned(decoded) if b"BT" in decoded else []
        if _RULE_OP_RE.search(decoded):
            hlines, vlines = _pdf_rules(decoded)
        else:
            hlines, vlines = [], []
        if chunks or hlines or vlines:
            streams.append((chunks, list(hlines), list(vlines)))

    # rules-only streams: attach their geometry to the adjacent text
    # stream whose text actually lies inside the rules' bounding box
    text_idx = [i for i, (c, _h, _v) in enumerate(streams) if c]
    if text_idx:
        for i, (chunks, h, v) in enumerate(streams):
            if chunks or not (h or v):
                continue
            xs = [x for _y, x0, x1 in h for x in (x0, x1)] + [
                x for x, _y0, _y1 in v
            ]
            ys = [y for y, _x0, _x1 in h] + [
                y for _x, y0, y1 in v for y in (y0, y1)
            ]
            bbox = (min(xs), min(ys), max(xs), max(ys))

            def overlap(t: int) -> int:
                return sum(
                    1
                    for cx, cy, _txt in streams[t][0]
                    if bbox[0] <= cx <= bbox[2] and bbox[1] <= cy <= bbox[3]
                )

            after = next((t for t in text_idx if t > i), None)
            before = next(
                (t for t in reversed(text_idx) if t < i), None
            )
            ovr_a = overlap(after) if after is not None else -1
            ovr_b = overlap(before) if before is not None else -1
            if ovr_a != ovr_b:
                target = after if ovr_a > ovr_b else before
            else:
                # overlap ties (every page drawing its table at the same
                # coordinates): infer the producer's order from the first
                # stream — a document that OPENS with text is a
                # text-then-grid producer, so the grid belongs to the
                # preceding page; one that opens with geometry is
                # grid-then-text.
                prefer_before = bool(streams[0][0]) and before is not None
                target = before if prefer_before else after
            streams[target][1].extend(h)
            streams[target][2].extend(v)

    tables: list[str] = []
    for chunks, hlines, vlines in streams:
        if not chunks:
            continue
        lattice, bbox = _lattice_table(chunks, hlines, vlines)
        if lattice is not None:
            tables.append(lattice)
            x0, y0, x1, y1 = bbox
            chunks = [
                c for c in chunks
                if not (x0 <= c[0] <= x1 and y0 <= c[1] <= y1)
            ]

        rows: list[list[tuple[float, str]]] = []
        for cx, cy, text in sorted(chunks, key=lambda c: (-c[1], c[0])):
            if rows and abs(rows[-1][0][0] - cy) <= y_tol:
                rows[-1].append((cy, (cx, text)))  # type: ignore[arg-type]
            else:
                rows.append([(cy, (cx, text))])  # type: ignore[list-item]
        # normalize: row -> cells sorted by x
        norm = [
            [t for _y, (_x, t) in sorted(r, key=lambda e: e[1][0])]
            for r in rows
        ]
        run: list[list[str]] = []
        for cells in norm + [[]]:
            if len(cells) >= 2:
                run.append(cells)
            else:
                if len(run) >= 2:
                    tables.append("|".join(c for row in run for c in row))
                run = []
    return tables
