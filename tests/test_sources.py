"""Sources: binaryFile catalog, parser dispatch, lister connector,
partition-parallel fetch."""

import os

import pytest
from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.sources.files import (
    parse_bytes,
    parse_documents,
    read_binary_catalog,
)
from vectordb_data_ingestion_spark.sources.sharepoint import (
    catalog_from_lister,
    fetch_content,
    local_dir_lister,
    local_file_fetcher,
)


@pytest.fixture()
def doc_dir(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.txt").write_text("hello spark world")
    (tmp_path / "b.html").write_text('<p>para</p><a href="https://x.io/d">doc</a>')
    (tmp_path / "sub" / "c.pdf").write_bytes(b"%PDF-1.4 fake payload")
    return str(tmp_path)


def test_binary_catalog_shape(spark, doc_dir):
    cat = read_binary_catalog(spark, doc_dir + "/**")
    rows = {r["name"]: r for r in cat.collect()}
    assert set(rows) == {"a.txt", "b.html", "c.pdf"}
    assert rows["a.txt"]["file_type"] == "txt"
    assert rows["c.pdf"]["file_type"] == "pdf"
    assert rows["a.txt"]["n_bytes"] == len("hello spark world")
    assert rows["b.html"]["modified_dt"] is not None
    assert len(rows["a.txt"]["file_id"]) == 64


def test_parse_dispatch(spark, doc_dir):
    cat = read_binary_catalog(spark, doc_dir + "/**")
    parsed = {r["name"]: r["text"] for r in parse_documents(cat).collect()}
    assert parsed["a.txt"] == "hello spark world"
    assert parsed["b.html"] == "para doc (https://x.io/d)"
    # stubbed decoder: deterministic, clearly marked
    assert parsed["c.pdf"].startswith("[stub:pdf] ")
    assert parsed["c.pdf"] == parse_bytes(b"%PDF-1.4 fake payload", "pdf")


def test_parse_unknown_type_raises():
    with pytest.raises(NotImplementedError):
        parse_bytes(b"RIFF....", "wav")


def test_lister_catalog_and_fetch(spark, doc_dir):
    cat = catalog_from_lister(spark, local_dir_lister(doc_dir))
    assert cat.count() == 3
    row = cat.filter(F.col("name") == "a.txt").collect()[0]
    assert row["file_type"] == "txt"
    assert row["modified_dt"] is not None

    fetched = fetch_content(cat, local_file_fetcher, num_partitions=2)
    got = {r["name"]: r for r in fetched.collect()}
    assert bytes(got["a.txt"]["content"]) == b"hello spark world"
    assert got["c.pdf"]["error"] is None


def test_fetch_captures_errors(spark, doc_dir):
    cat = catalog_from_lister(spark, local_dir_lister(doc_dir))
    broken = cat.withColumn(
        "url", F.concat(F.col("url"), F.lit(".missing"))
    )
    fetched = fetch_content(broken, local_file_fetcher)
    errs = [r["error"] for r in fetched.collect()]
    assert all(e and "FileNotFoundError" in e for e in errs)

def test_extract_attachments(spark, tmp_path):
    from vectordb_data_ingestion_spark.sources.files import (
        _stub_attachments,
        extract_attachments,
    )

    msg_dir, txt_dir = tmp_path / "msgs", tmp_path / "txts"
    msg_dir.mkdir(), txt_dir.mkdir()
    (msg_dir / "m.msg").write_bytes(b"msg payload one")
    (txt_dir / "a.txt").write_text("no attachments here")
    cat = read_binary_catalog(spark, str(msg_dir) + "/**")
    rows = extract_attachments(cat).collect()
    expected = _stub_attachments(b"msg payload one")
    assert len(rows) == len(expected)
    for r, (name, content) in zip(sorted(rows, key=lambda r: r["attachment_name"]), expected):
        assert r["attachment_name"] == name
        assert bytes(r["attachment_content"]) == content
    # non-msg files contribute no attachment rows
    assert (
        extract_attachments(read_binary_catalog(spark, str(txt_dir) + "/**")).count()
        == 0
    )


def test_csv_catalog_scan(spark, tmp_path):
    from vectordb_data_ingestion_spark.sources.tabular import read_csv_catalog

    p = tmp_path / "kb.csv"
    p.write_bytes("id,text\n1,caf\xe9 latin1\n2,plain\n".encode("latin1"))
    df = read_csv_catalog(spark, str(p))
    rows = {r["id"]: r["text"] for r in df.collect()}
    assert rows == {"1": "caf\xe9 latin1", "2": "plain"}


def test_excel_rows_header_skip(spark):
    from vectordb_data_ingestion_spark.sources.tabular import (
        excel_rows_to_df,
        read_excel_catalog,
    )

    rows = [("Title", "Desc"), ("svc one", "d1"), ("svc two", "d2")]
    df = excel_rows_to_df(spark, rows, ["title", "description"])
    assert [tuple(r) for r in df.orderBy("title").collect()] == [
        ("svc one", "d1"),
        ("svc two", "d2"),
    ]
    with pytest.raises(NotImplementedError):
        read_excel_catalog(spark, "/nope.xlsx", ["a"])
