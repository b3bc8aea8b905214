"""Binary-file ingestion -> T1 file catalog + parsed text.

Replaces the reference's download-to-disk + per-file parser loop
(sharepointutils.py:73-101, parsers.py:75-154) with Spark's ``binaryFile``
source: one distributed scan produces (path, modificationTime, length,
content) rows; the catalog projection and parser dispatch are columnar
transformations on top. At 100 TB the scan parallelizes by file and
``pathGlobFilter``/``modifiedAfter`` push listing-level pruning into the
source (the reference's delta predicate, done by the connector).

Parser tiers (``parse_text_udf``):
- ``txt``            : real - utf-8 decode (lossy-safe).
- ``html``           : real - the stdlib extractor (functions.html).
- pdf/docx/pptx/msg/eml: the decode libraries (pypdf, python-docx, ...)
  are not available in this environment, so these dispatch to
  :func:`_stub_parse` - a clearly-marked deterministic stub that derives
  reproducible pseudo-text from the payload hash. The Spark-side plumbing
  (binary column, dispatch, Arrow batching, schema) is real and tested;
  swap ``_stub_parse`` for the real decoder where the libs exist.
"""

from __future__ import annotations

import hashlib

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

REAL_PARSERS = {"txt", "html"}
STUBBED_PARSERS = {"pdf", "docx", "pptx", "msg", "eml"}


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


def parse_bytes(content: bytes | None, kind: str | None) -> str:
    kind = (kind or "").lower()
    if content is None:
        return ""
    if kind == "txt":
        return content.decode("utf-8", errors="ignore")
    if kind == "html":
        return html_to_text(content.decode("utf-8", errors="ignore"))
    if kind in STUBBED_PARSERS:
        return _stub_parse(content, kind)
    raise NotImplementedError(f"no parser for file_type={kind!r}")


@F.pandas_udf(StringType())
def parse_text_udf(content: pd.Series, kind: pd.Series) -> pd.Series:
    return pd.Series(
        [parse_bytes(c, k) for c, k in zip(content, kind)], dtype="object"
    )


def parse_documents(catalog: DataFrame) -> DataFrame:
    """Attach extracted ``text`` to a binary catalog via parser dispatch.
    Unknown types yield null text (filter upstream with
    ``file_type IN ...`` so the scan prunes them)."""
    known = list(REAL_PARSERS | STUBBED_PARSERS)
    return catalog.withColumn(
        "text",
        F.when(
            F.col("file_type").isin(known),
            parse_text_udf(F.col("content"), F.col("file_type")),
        ),
    )


# --- PDF table extraction (parsers.py:127-137) -----------------------------


def _stub_pdf_tables(content: bytes) -> list[str]:
    """DETERMINISTIC STUB for tabula table extraction (needs a JVM-side
    tabula install). Emits 0-2 pipe-joined pseudo-tables in the reference's
    flattened shape (process_pdf_table joins each table's CSV with '|')."""
    digest = hashlib.sha256(content or b"").hexdigest()
    n = int(digest[2], 16) % 3
    return [
        f"h1|h2|r{digest[i]}1|r{digest[i]}2" for i in range(n)
    ]


@F.pandas_udf(ArrayType(StringType()))
def extract_pdf_tables_udf(content: pd.Series) -> pd.Series:
    return pd.Series([_stub_pdf_tables(c) for c in content], dtype="object")


def extract_pdf_tables(catalog: DataFrame) -> DataFrame:
    """One row per (pdf, table) with the table flattened to pipe-joined
    text — the reference builds one langchain Document per table
    (process_pdf_table, parsers.py:127-137)."""
    pdfs = catalog.filter(F.col("file_type") == "pdf")
    return pdfs.select(
        "url",
        F.posexplode(extract_pdf_tables_udf(F.col("content"))).alias(
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
    """DETERMINISTIC STUB for extract_msg attachment decode (the library is
    unavailable here). Derives 0-3 pseudo-attachments from the payload hash
    so the explode/fan-out plumbing is exercised with realistic shapes."""
    digest = hashlib.sha256(content or b"").digest()
    n = digest[0] % 4
    return [
        (f"attachment_{i}.bin", digest[i : i + 8]) for i in range(n)
    ]


@F.pandas_udf(_ATTACHMENT_SCHEMA)
def extract_attachments_udf(content: pd.Series) -> pd.Series:
    return pd.Series([_stub_attachments(c) for c in content], dtype="object")


def extract_attachments(catalog: DataFrame) -> DataFrame:
    """One row per (msg file, attachment) — the reference writes attachments
    to local disk (``save_email_attachments`` parsers.py:103-109); here they
    become rows of ``(path, attachment_name, attachment_content)`` so
    downstream parsing/chunking stays distributed instead of re-scanning a
    shared filesystem."""
    msgs = catalog.filter(F.col("file_type") == "msg")
    exploded = msgs.select(
        "url", F.explode(extract_attachments_udf(F.col("content"))).alias("att")
    )
    return exploded.select(
        "url",
        F.col("att.attachment_name").alias("attachment_name"),
        F.col("att.attachment_content").alias("attachment_content"),
    )
