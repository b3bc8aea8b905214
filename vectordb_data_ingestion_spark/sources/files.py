"""Binary-file ingestion -> T1 file catalog + parsed text.

Replaces the reference's download-to-disk + per-file parser loop
(sharepointutils.py:73-101, parsers.py:75-154) with Spark's ``binaryFile``
source: one distributed scan produces (path, modificationTime, length,
content) rows; the catalog projection and parser dispatch are columnar
transformations on top. At 100 TB the scan parallelizes by file and
``pathGlobFilter``/``modifiedAfter`` push listing-level pruning into the
source (the reference's delta predicate, done by the connector).

Parser tiers (`make_parser_udf` snapshots the injectable ``PARSERS``
registry — see :func:`register_parser`; ``DECODER_TIER`` reports which
tier serves each kind in this interpreter):
- ``txt``            : real - utf-8 decode (lossy-safe).
- ``html``           : real - the stdlib extractor (functions.html).
- ``eml``            : real - stdlib ``email`` package (headers + text parts).
- pdf/docx/pptx/msg  : full-fidelity decoders auto-registered when pypdf /
  python-docx / python-pptx / extract_msg are importable; otherwise the
  PURE-STDLIB decoders in ``sources/ooxml.py`` / ``sources/cfb.py``
  (OOXML is zip+XML, simple PDF text is zlib content streams, ``.msg``
  is an [MS-CFB] compound file) — real text, documented fidelity limits.
  ``STUBBED_KINDS`` reports kinds currently stubbed (none, unless a
  deployment unregisters a decoder); :func:`_stub_parse` remains for the
  attachment fallback on non-OLE2 payloads and for injection tests.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    StringType,
    StructField,
    StructType,
)

from vectordb_data_ingestion_spark.functions.html import html_to_text
from vectordb_data_ingestion_spark.operators.catalog import file_type

# Parser registry: file_type -> Callable[[bytes], str]. Built below with the
# decoders available in this environment; deployments drop real decoders in
# with :func:`register_parser` (or ship them importable — pypdf/python-docx/
# python-pptx/extract_msg are picked up automatically when present).
ParserFn = Callable[[bytes], str]
PARSERS: dict[str, ParserFn] = {}
STUBBED_KINDS: set[str] = set()  # kinds currently served by the stub
#: kind -> which tier serves it: "lib" (third-party), "stdlib", "stub",
#: or "custom" (deployment-injected via register_parser)
DECODER_TIER: dict[str, str] = {}


def register_parser(kind: str, fn: ParserFn) -> None:
    """Install (or replace) the decoder for one file_type.
    :func:`parse_documents` snapshots the registry into the UDF closure at
    plan-build time, so driver-side registration is enough — the snapshot
    ships to executors by value with the task (cloudpickle), not via module
    re-import."""
    kind = kind.lower()
    PARSERS[kind] = fn
    STUBBED_KINDS.discard(kind)
    # deployment-injected decoders are their own tier; the default
    # registry builder overwrites this with lib/stdlib/stub as it runs
    DECODER_TIER[kind] = "custom"


def registered_kinds() -> set[str]:
    return set(PARSERS)


def read_binary_catalog(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    modified_after: str | None = None,
) -> DataFrame:
    """Scan files under ``path`` into the T1 catalog shape
    (sharepointutils.py:119-145): file_id, name, url, file_type,
    modified_dt, plus size + raw content."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if modified_after:
        # listing-level pruning - the connector-side delta predicate
        reader = reader.option("modifiedAfter", modified_after)
    df = reader.load(path)
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    return df.select(
        F.sha2(F.col("path"), 256).alias("file_id"),
        name.alias("name"),
        F.col("path").alias("url"),
        file_type(name).alias("file_type"),
        F.col("modificationTime").alias("modified_dt"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
    )


def _stub_parse(content: bytes, kind: str) -> str:
    """DETERMINISTIC STUB - stands in for the pdf/docx/pptx/msg decoders
    that are unavailable here (parsers.py:75-144 use langchain loaders).
    Produces reproducible pseudo-text from the payload so the downstream
    pipeline (chunk/token/embed) is exercised with realistic shapes."""
    digest = hashlib.sha256(content or b"").hexdigest()
    n_words = 20 + int(digest[:2], 16) % 40
    words = [f"{kind}w{digest[i % 60 : i % 60 + 3]}" for i in range(n_words)]
    return f"[stub:{kind}] " + " ".join(words)


def _parse_txt(content: bytes) -> str:
    return content.decode("utf-8", errors="ignore")


def _parse_html(content: bytes) -> str:
    return html_to_text(content.decode("utf-8", errors="ignore"))


def _parse_eml(content: bytes) -> str:
    """REAL eml decode via the stdlib email package (no external dep) —
    subject/from/to headers plus every text/* body part, the same fields
    UnstructuredEmailLoader surfaces (parsers.py:120-124)."""
    import email
    import email.policy

    msg = email.message_from_bytes(content, policy=email.policy.default)
    parts = [
        f"{h}: {msg[h]}" for h in ("Subject", "From", "To") if msg[h]
    ]
    for part in msg.walk():
        if part.get_content_maintype() == "text":
            try:
                parts.append(part.get_content().strip())
            except Exception:
                payload = part.get_payload(decode=True)
                if payload:
                    parts.append(payload.decode("utf-8", "ignore").strip())
    return "\n".join(p for p in parts if p)


def _try_real_parsers() -> dict[str, ParserFn]:
    """Decoders whose libraries may or may not be installed. Each is
    import-gated; absent libs fall back to the deterministic stub."""
    real: dict[str, ParserFn] = {}
    try:
        import io

        from pypdf import PdfReader  # noqa: F401

        def _parse_pdf(content: bytes) -> str:
            reader = PdfReader(io.BytesIO(content))
            return "\n".join(page.extract_text() or "" for page in reader.pages)

        real["pdf"] = _parse_pdf
    except ImportError:
        pass
    try:
        import io

        from docx import Document as _Docx  # noqa: F401

        def _parse_docx(content: bytes) -> str:
            return "\n".join(
                p.text for p in _Docx(io.BytesIO(content)).paragraphs
            )

        real["docx"] = _parse_docx
    except ImportError:
        pass
    try:
        import io

        from pptx import Presentation  # noqa: F401

        def _parse_pptx(content: bytes) -> str:
            prs = Presentation(io.BytesIO(content))
            texts = []
            for slide in prs.slides:
                for shape in slide.shapes:
                    if getattr(shape, "has_text_frame", False):
                        texts.append(shape.text_frame.text)
            return "\n".join(texts)

        real["pptx"] = _parse_pptx
    except ImportError:
        pass
    try:
        import extract_msg  # noqa: F401

        def _parse_msg(content: bytes) -> str:
            import io

            msg = extract_msg.Message(io.BytesIO(content))
            return "\n".join(
                filter(None, (msg.subject, msg.sender, msg.to, msg.body))
            )

        real["msg"] = _parse_msg
    except ImportError:
        pass
    try:
        import io

        from openpyxl import load_workbook  # noqa: F401

        def _parse_xlsx(content: bytes) -> str:
            # same rendering contract as ooxml.xlsx_to_text (tab-joined
            # cells, blank line between sheets) with openpyxl's richer
            # value coercion (dates, cached formula results)
            wb = load_workbook(
                io.BytesIO(content), read_only=True, data_only=True
            )
            sheets = []
            for ws in wb.worksheets:
                sheets.append(
                    "\n".join(
                        "\t".join(
                            "" if v is None else str(v) for v in row
                        )
                        for row in ws.iter_rows(values_only=True)
                    )
                )
            return "\n\n".join(sheets)

        real["xlsx"] = _parse_xlsx
    except ImportError:
        pass
    return real


def _stdlib_parsers() -> dict[str, ParserFn]:
    """Middle tier (round 4): OOXML containers are zip+XML, simple PDF
    text is zlib content streams, and ``.msg`` is an [MS-CFB] compound
    file — all decodable with the stdlib alone (``sources/ooxml.py``,
    ``sources/cfb.py``). Full-fidelity libraries still win the tier when
    importable (tables, CID fonts, encodings, RTF bodies)."""
    from vectordb_data_ingestion_spark.sources.cfb import msg_to_text
    from vectordb_data_ingestion_spark.sources.ooxml import (
        docx_to_text,
        pdf_to_text,
        pptx_to_text,
        xlsx_to_text,
    )

    return {
        "pdf": pdf_to_text,
        "docx": docx_to_text,
        "pptx": pptx_to_text,
        "msg": msg_to_text,
        "xlsx": xlsx_to_text,
    }


def _build_default_registry() -> None:
    register_parser("txt", _parse_txt)
    register_parser("html", _parse_html)
    register_parser("eml", _parse_eml)
    for k in ("txt", "html", "eml"):
        DECODER_TIER[k] = "stdlib"
    real = _try_real_parsers()
    stdlib = _stdlib_parsers()
    for kind in ("pdf", "docx", "pptx", "msg", "xlsx"):
        if kind in real:
            register_parser(kind, real[kind])
            DECODER_TIER[kind] = "lib"
        elif kind in stdlib:
            register_parser(kind, stdlib[kind])
            DECODER_TIER[kind] = "stdlib"
        else:
            PARSERS[kind] = lambda c, k=kind: _stub_parse(c, k)
            STUBBED_KINDS.add(kind)
            DECODER_TIER[kind] = "stub"


_build_default_registry()


# parse-failure dedup for the executor log channel: one WARNING per
# (kind, exception type) per interpreter, so a systematically broken
# decoder announces itself without a million-line log flood
_LOGGED_PARSE_FAILURES: set[tuple[str, str]] = set()


def _dispatch_full(
    parsers: dict[str, ParserFn], content, kind, strict: bool = True
) -> tuple[str | None, str | None]:
    """Decode one payload -> (text, error). ``error`` carries the
    exception type+message when the decoder raised (text is null then);
    a 100%-null decode run must be diagnosable as a CODE bug (e.g. a
    broken deployment-injected decoder raising NameError) rather than
    silently indistinguishable from mass-corrupt payloads — fetch_content
    already records a per-row error string; this is the same contract.

    ``strict``: direct callers get the documented loud
    NotImplementedError for an unregistered kind; the batched UDF passes
    strict=False because Spark evaluates a pandas UDF inside F.when()
    for EVERY row of the batch — one .wav row in a text catalog must not
    abort a 100 TB job just because the when() gate would have nulled
    its result anyway (review r6, confirmed live)."""
    kind = (kind or "").lower()
    if content is None:
        # null content = nothing was fetched (fetch_content records its
        # own error string): null text, NOT '' — '' means decoded-but-
        # empty, and a corpus of failed fetches must not read as a
        # corpus of clean empty documents
        return None, "no content (fetch failed or empty payload)"
    fn = parsers.get(kind)
    if fn is None:
        if strict:
            raise NotImplementedError(f"no parser for file_type={kind!r}")
        return None, f"no parser for file_type={kind!r}"
    try:
        return fn(content), None
    except Exception as exc:  # noqa: BLE001 - decoder boundary
        # a corrupt / truncated / mislabeled payload must not abort a
        # 100 TB ingestion job (the reference prints-and-continues);
        # null text marks the row undecodable, distinguishable from ""
        # (decoded-but-empty). Unregistered kinds still raise above.
        err = f"{type(exc).__name__}: {exc}"
        key = (kind, type(exc).__name__)
        if key not in _LOGGED_PARSE_FAILURES:
            _LOGGED_PARSE_FAILURES.add(key)
            import logging

            logging.getLogger(__name__).warning(
                "parser for file_type=%r failed with %s "
                "(further failures of this shape suppressed)", kind, err
            )
        return None, err


def _dispatch(parsers: dict[str, ParserFn], content, kind) -> str | None:
    return _dispatch_full(parsers, content, kind, strict=False)[0]


def parse_bytes(content: bytes | None, kind: str | None) -> str:
    # direct API keeps the documented LOUD failure for unregistered
    # kinds; only the batched UDF path is lenient (it cannot choose its
    # rows — F.when() gates results, not evaluation)
    return _dispatch_full(PARSERS, content, kind, strict=True)[0]


_PARSE_RESULT = StructType(
    [
        StructField("text", StringType()),
        StructField("parse_error", StringType()),
    ]
)


def make_parser_udf(
    parsers: dict[str, ParserFn] | None = None, with_errors: bool = False
):
    """Arrow-batched parser-dispatch UDF over a registry SNAPSHOT — the
    dict of decoder callables is captured by value in the closure, so
    driver-side :func:`register_parser` calls (and per-call overrides) are
    visible on every executor without module re-import tricks.

    ``with_errors=True`` returns ``struct<text, parse_error>`` instead of
    a bare string, exposing the per-row decoder exception."""
    # keys lowercased: register_parser lowercases, but a caller-passed
    # dict ({'PDF': fn}) would otherwise never match the lowercased
    # dispatched kind (review r6)
    snapshot = {
        k.lower(): v
        for k, v in (PARSERS if parsers is None else parsers).items()
    }

    if with_errors:

        @F.pandas_udf(_PARSE_RESULT)
        def _udf_err(content: pd.Series, kind: pd.Series) -> pd.DataFrame:
            pairs = [
                _dispatch_full(snapshot, c, k, strict=False)
                for c, k in zip(content, kind)
            ]
            return pd.DataFrame(
                {
                    "text": pd.Series([p[0] for p in pairs], dtype="object"),
                    "parse_error": pd.Series(
                        [p[1] for p in pairs], dtype="object"
                    ),
                }
            )

        return _udf_err

    @F.pandas_udf(StringType())
    def _udf(content: pd.Series, kind: pd.Series) -> pd.Series:
        return pd.Series(
            [_dispatch(snapshot, c, k) for c, k in zip(content, kind)],
            dtype="object",
        )

    return _udf


def parse_documents(
    catalog: DataFrame,
    parsers: dict[str, ParserFn] | None = None,
    errors: bool = False,
) -> DataFrame:
    """Attach extracted ``text`` to a binary catalog via parser dispatch.
    Unknown types yield null text (filter upstream with
    ``file_type IN ...`` so the scan prunes them). ``parsers`` overrides
    the module registry for this call (injection point for deployments
    with real pdf/docx/... decoders). ``errors=True`` additionally
    attaches a ``parse_error`` column (exception type+message for rows
    whose decoder raised, null otherwise) — the audit channel for "is
    this corpus corrupt or is my decoder broken". Decoder exceptions are
    also WARNING-logged once per (kind, exception type) per executor in
    both modes."""
    effective = {
        k.lower(): v
        for k, v in (PARSERS if parsers is None else parsers).items()
    }
    udf = make_parser_udf(effective, with_errors=errors)
    # case-insensitive gate: file_type preserves the filename's case
    # (reference identify_filetype semantics), but 'REPORT.PDF' must not
    # silently skip the registry — _dispatch_full lowercases the kind
    in_registry = F.lower(F.col("file_type")).isin(list(effective))
    if errors:
        parsed = catalog.withColumn(
            "_parsed",
            F.when(in_registry, udf(F.col("content"), F.col("file_type"))),
        )
        return parsed.withColumns(
            {
                "text": F.col("_parsed.text"),
                "parse_error": F.col("_parsed.parse_error"),
            }
        ).drop("_parsed")
    return catalog.withColumn(
        "text",
        F.when(in_registry, udf(F.col("content"), F.col("file_type"))),
    )


# --- PDF table extraction (parsers.py:127-137) -----------------------------


def _stub_pdf_tables(content: bytes) -> list[str]:
    """DETERMINISTIC STUB for table extraction of NON-PDF payloads (keeps
    synthetic pipelines' explode shapes). Emits 0-2 pipe-joined
    pseudo-tables in the reference's flattened shape (process_pdf_table
    joins each table's CSV with '|')."""
    digest = hashlib.sha256(content or b"").hexdigest()
    n = int(digest[2], 16) % 3
    return [
        f"h1|h2|r{digest[i]}1|r{digest[i]}2" for i in range(n)
    ]


def _pdf_tables(content: bytes, allow_stub: bool = False) -> list[str]:
    """REAL heuristic table extraction (r4): ``sources/ooxml.py::
    pdf_tables`` interprets the positioned text operators and clusters
    rows/cells — the reference's tabula pipe-joined shape
    (parsers.py:127-137). The PDF header may legally sit up to 1024
    bytes into the file, so the sniff searches, not prefixes. An
    undecodable payload yields [] — NEVER fabricated rows — unless the
    caller explicitly opts into the deterministic stub (synthetic
    pipelines that need non-empty explode shapes)."""
    from vectordb_data_ingestion_spark.sources.ooxml import pdf_tables

    if content and b"%PDF" in content[:1028]:  # 4-byte marker may START
        # anywhere in the first 1024 bytes — a 1024 slice truncates it
        try:
            return pdf_tables(content)
        except Exception:  # noqa: BLE001 - decoder boundary
            return []
    return _stub_pdf_tables(content) if allow_stub else []


def _pdf_tables_udf(allow_stub: bool):
    @F.pandas_udf(ArrayType(StringType()))
    def _udf(content: pd.Series) -> pd.Series:
        return pd.Series(
            [_pdf_tables(c, allow_stub) for c in content], dtype="object"
        )

    return _udf


def extract_pdf_tables(
    catalog: DataFrame, allow_stub: bool = False
) -> DataFrame:
    """One row per (pdf, table) with the table flattened to pipe-joined
    text — the reference builds one langchain Document per table
    (process_pdf_table, parsers.py:127-137). Undecodable payloads yield
    no rows unless ``allow_stub`` (synthetic-pipeline shapes)."""
    pdfs = catalog.filter(F.lower(F.col("file_type")) == "pdf")
    return pdfs.select(
        "url",
        F.posexplode(_pdf_tables_udf(allow_stub)(F.col("content"))).alias(
            "table_index", "table_text"
        ),
    )


# --- MSG attachment extraction (parsers.py:103-109) ------------------------

_ATTACHMENT_SCHEMA = ArrayType(
    StructType(
        [
            StructField("attachment_name", StringType()),
            StructField("attachment_content", BinaryType()),
        ]
    )
)


def _stub_attachments(content: bytes) -> list[tuple[str, bytes]]:
    """DETERMINISTIC STUB for attachment decode of payloads that are not
    OLE2 containers. Derives 0-3 pseudo-attachments from the payload hash
    so the explode/fan-out plumbing is exercised with realistic shapes."""
    digest = hashlib.sha256(content or b"").digest()
    n = digest[0] % 4
    return [
        (f"attachment_{i}.bin", digest[i : i + 8]) for i in range(n)
    ]


def _attachments(
    content: bytes, allow_stub: bool = False
) -> list[tuple[str, bytes]]:
    """REAL attachment rows via the stdlib CFB reader (r4) — filename +
    payload per ``__attach_version1.0_#N`` storage, matching what
    extract_msg surfaces (reference parsers.py:103-109 writes these to
    disk). An undecodable payload (non-OLE2 OR a corrupt/truncated real
    .msg) yields [] — fabricated attachments must never enter real
    data — unless the caller explicitly opts into the deterministic
    stub (synthetic pipelines that need non-empty explode shapes)."""
    from vectordb_data_ingestion_spark.sources.cfb import msg_attachments

    try:
        return msg_attachments(content or b"")
    except Exception:  # noqa: BLE001 - decoder boundary, same contract as
        # _dispatch: a corrupt container must degrade to no rows, whatever
        # exception type the reader surfaces
        return _stub_attachments(content) if allow_stub else []


def _attachments_udf(allow_stub: bool):
    @F.pandas_udf(_ATTACHMENT_SCHEMA)
    def _udf(content: pd.Series) -> pd.Series:
        return pd.Series(
            [_attachments(c, allow_stub) for c in content], dtype="object"
        )

    return _udf


def extract_attachments(
    catalog: DataFrame, allow_stub: bool = False
) -> DataFrame:
    """One row per (msg file, attachment) — the reference writes attachments
    to local disk (``save_email_attachments`` parsers.py:103-109); here they
    become rows of ``(path, attachment_name, attachment_content)`` so
    downstream parsing/chunking stays distributed instead of re-scanning a
    shared filesystem. Undecodable payloads yield no rows unless
    ``allow_stub``."""
    msgs = catalog.filter(F.lower(F.col("file_type")) == "msg")
    exploded = msgs.select(
        "url",
        F.explode(_attachments_udf(allow_stub)(F.col("content"))).alias("att"),
    )
    return exploded.select(
        "url",
        F.col("att.attachment_name").alias("attachment_name"),
        F.col("att.attachment_content").alias("attachment_content"),
    )


def parse_attachments(catalog: DataFrame) -> DataFrame:
    """Attachments THROUGH the parser registry (r4): the reference saves
    each .msg attachment to disk and re-scans it through the same
    per-filetype parsers (parsers.py:103-109 + :197-263); here the
    attachment rows from :func:`extract_attachments` flow straight back
    into the registry dispatch — the attachment's extension picks its
    decoder, unknown kinds yield null text. One distributed plan end to
    end: no disk round-trip, no re-listing."""
    atts = extract_attachments(catalog)
    return parse_documents(
        atts.select(
            "url",
            "attachment_name",
            # lowercase: 'Report.PDF' must hit the registry's lowercase
            # keys in parse_documents' isin gate (review r4)
            F.lower(file_type(F.col("attachment_name"))).alias("file_type"),
            F.col("attachment_content").alias("content"),
        )
    ).select(
        "url", "attachment_name", "file_type", "text"
    )
