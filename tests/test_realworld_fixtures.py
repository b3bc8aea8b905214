"""Real-world golden fixtures for the stdlib decoder tier (verdict r4
item 4): files produced by ACTUAL third-party toolchains (TeX / DocBook
PDF generators shipped with Debian docs), not synthesized by this repo's
own tests — the anchor that the connector layer decodes documents it has
never seen the shape of.

The fixtures live where the OS ships them (/usr/share/doc); they are NOT
committed (GFDL/GPL-licensed documentation — referencing beats
redistributing). Each test skips cleanly on hosts without the package,
so the suite stays hermetic-green everywhere while this container runs
the leg for real. No real-world .docx/.pptx/.msg exists in this
container (no Office toolchain); the OOXML/CFB decoders keep their
spec-vector + fuzz coverage (test_ooxml.py / test_cfb.py) until a
deployment contributes genuine files.
"""

import os

import pytest

LIBTASN1 = "/usr/share/doc/libtasn1-doc/libtasn1.pdf"
MIMESPEC = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"

realworld = pytest.mark.realworld


@realworld
@pytest.mark.parametrize(
    "path,min_len,anchors",
    [
        pytest.param(
            LIBTASN1,
            60_000,
            # TeX output: kerning-based word gaps are a documented
            # fidelity limit of the stdlib tier, so anchors are
            # intra-word-exact, cross-word-agnostic
            ["Libtasn1", "AbstractSyntaxNotationOne", "help-libtasn1@gnu.org"],
            id="libtasn1-texinfo-pdf",
        ),
        pytest.param(
            MIMESPEC,
            35_000,
            ["SharedMIME-infoDatabase", "XDesktopGroup", "Introduction"],
            id="shared-mime-info-docbook-pdf",
        ),
    ],
)
def test_stdlib_pdf_decodes_real_toolchain_output(path, min_len, anchors):
    if not os.path.exists(path):
        pytest.skip(f"real-world fixture not on this host: {path}")
    from vectordb_data_ingestion_spark.sources.ooxml import pdf_to_text

    text = pdf_to_text(open(path, "rb").read())
    assert text is not None and len(text) >= min_len
    for anchor in anchors:
        assert anchor in text, f"missing {anchor!r} in decoded {path}"


@realworld
def test_registry_parses_real_pdf_catalog(spark, tmp_path):
    """End-to-end through the Spark path: a binaryFile catalog over the
    real PDFs -> parse_documents -> non-null text with the same anchors.
    Proves the registry/UDF plumbing, not just the bare decoder."""
    import shutil

    from pyspark.sql import functions as F

    from vectordb_data_ingestion_spark.sources.files import (
        parse_documents,
        read_binary_catalog,
    )

    present = [p for p in (LIBTASN1, MIMESPEC) if os.path.exists(p)]
    if not present:
        pytest.skip("no real-world fixtures on this host")
    d = tmp_path / "realpdf"
    d.mkdir()
    for p in present:
        shutil.copy(p, d / os.path.basename(p))
    cat = read_binary_catalog(spark, str(d) + "/**")
    rows = {
        r["name"]: r["text"]
        for r in parse_documents(cat, errors=True)
        .filter(F.col("parse_error").isNull())
        .collect()
    }
    assert len(rows) == len(present)
    if LIBTASN1 in present:
        assert "Libtasn1" in rows["libtasn1.pdf"]
    if MIMESPEC in present:
        assert "XDesktopGroup" in rows["shared-mime-info-spec.pdf"]
