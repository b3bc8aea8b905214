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
    from vectordb_data_ingestion_spark.sources.files import STUBBED_KINDS

    cat = read_binary_catalog(spark, doc_dir + "/**")
    parsed = {r["name"]: r["text"] for r in parse_documents(cat).collect()}
    assert parsed["a.txt"] == "hello spark world"
    assert parsed["b.html"] == "para doc (https://x.io/d)"
    if "pdf" in STUBBED_KINDS:
        # stubbed decoder: deterministic, clearly marked
        assert parsed["c.pdf"].startswith("[stub:pdf] ")
    assert parsed["c.pdf"] == parse_bytes(b"%PDF-1.4 fake payload", "pdf")


def test_parse_unknown_type_raises():
    with pytest.raises(NotImplementedError):
        parse_bytes(b"RIFF....", "wav")


def test_parser_registry_injection(spark, tmp_path):
    """Deployments drop real decoders in via register_parser; the pandas
    UDF dispatch picks them up (verifies the injectable-registry contract)."""
    from vectordb_data_ingestion_spark.sources import files as fmod

    d = tmp_path / "wavs"
    d.mkdir()
    (d / "x.wav").write_bytes(b"RIFF....")
    prior = dict(fmod.PARSERS)
    try:
        fmod.register_parser("wav", lambda c: f"decoded {len(c)} bytes")
        assert parse_bytes(b"RIFF....", "wav") == "decoded 8 bytes"
        cat = read_binary_catalog(spark, str(d) + "/**")
        rows = parse_documents(cat).collect()
        assert rows[0]["text"] == "decoded 8 bytes"
    finally:
        fmod.PARSERS.clear()
        fmod.PARSERS.update(prior)


def test_eml_real_parse():
    """eml decode is REAL (stdlib email), not a stub."""
    raw = (
        b"Subject: weekly sync\r\nFrom: a@example.com\r\nTo: b@example.com\r\n"
        b"MIME-Version: 1.0\r\nContent-Type: text/plain\r\n\r\n"
        b"agenda: ship the release\r\n"
    )
    text = parse_bytes(raw, "eml")
    assert "Subject: weekly sync" in text
    assert "agenda: ship the release" in text
    assert not text.startswith("[stub:")


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
    # DEFAULT: real-only — a non-OLE2 payload yields no fabricated rows
    assert extract_attachments(cat).count() == 0
    rows = extract_attachments(cat, allow_stub=True).collect()
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
    # r4: the stdlib zip+XML tier makes the XLSX scan real without
    # openpyxl — a missing file is a plain FileNotFoundError; r5: named
    # -sheet lookup works in BOTH tiers (no NotImplementedError left),
    # so the missing file dominates regardless of the sheet argument
    with pytest.raises(FileNotFoundError):
        read_excel_catalog(spark, "/nope.xlsx", ["a"])
    with pytest.raises(FileNotFoundError):
        read_excel_catalog(spark, "/nope.xlsx", ["a"], sheet="Named")


def test_document_catalog_datasource(spark, tmp_path):
    import time

    from vectordb_data_ingestion_spark.sources.datasource import (
        DocumentCatalogDataSource,
    )

    root = tmp_path / "ds"
    (root / "sub").mkdir(parents=True)
    (root / "a.txt").write_text("alpha")
    (root / "sub" / "b.pdf").write_bytes(b"%PDF fake")
    spark.dataSource.register(DocumentCatalogDataSource)

    df = (
        spark.read.format("document_catalog")
        .option("path", str(root))
        .option("files_per_partition", "1")
        .load()
    )
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"a.txt", "b.pdf"}
    assert bytes(rows["a.txt"]["content"]) == b"alpha"
    assert rows["b.pdf"]["file_type"] == "pdf"
    assert rows["a.txt"]["n_bytes"] == 5
    assert df.rdd.getNumPartitions() == 2  # one file per partition

    # listing-level pruning: a future cutoff yields an empty catalog
    future = time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime(time.time() + 3600))
    pruned = (
        spark.read.format("document_catalog")
        .option("path", str(root))
        .option("modified_after", future)
        .load()
    )
    assert pruned.count() == 0


def test_onprem_lister_odata_parsing(spark):
    from vectordb_data_ingestion_spark.sources.sharepoint import (
        onprem_sharepoint_lister,
    )

    def fake_fetch(url):
        return {
            "d": {
                "results": [
                    {
                        "Name": "kb1.docx",
                        "ServerRelativeUrl": "/kb/kb1.docx",
                        "TimeLastModified": "2024-03-01T10:00:00Z",
                    },
                    {"Name": "kb2.pdf", "ServerRelativeUrl": "/kb/kb2.pdf",
                     "TimeLastModified": "2024-03-02T11:30:00Z"},
                ]
            }
        }

    lister = onprem_sharepoint_lister(
        ["https://sp.local/_api/folder1"], "u", "p", fetch_json=fake_fetch
    )
    cat = catalog_from_lister(spark, lister)
    rows = {r["name"]: r for r in cat.collect()}
    assert set(rows) == {"kb1.docx", "kb2.pdf"}
    assert rows["kb1.docx"]["file_type"] == "docx"
    assert rows["kb2.pdf"]["modified_dt"] is not None


def test_onprem_lister_bare_list_and_unknown_shape(spark):
    """A payload whose ``d`` is a bare list (a continuation shape _paged
    itself accepts) must yield its rows, not silently zero files; an
    unrecognized first-page shape must raise instead of truncating
    (advice r5 — the loud-failure contract)."""
    from vectordb_data_ingestion_spark.sources.sharepoint import (
        onprem_sharepoint_lister,
    )

    row = {
        "Name": "kb1.docx",
        "ServerRelativeUrl": "/kb/kb1.docx",
        "TimeLastModified": "2024-03-01T10:00:00Z",
    }
    lister = onprem_sharepoint_lister(
        ["https://sp.local/_api/f"], "u", "p",
        fetch_json=lambda url: {"d": [row]},
    )
    assert [n for n, _, _ in lister()] == ["kb1.docx"]

    bad = onprem_sharepoint_lister(
        ["https://sp.local/_api/f"], "u", "p",
        fetch_json=lambda url: {"d": {"unexpected": 1}},
    )
    with pytest.raises(ValueError, match="refusing"):
        list(bad())


def test_parse_documents_error_column(spark, tmp_path):
    """errors=True attaches per-row parse_error (exception type+message)
    so a 100%-null decode run is diagnosable as a code bug vs corrupt
    data (advice r5); default mode keeps the bare-string schema."""
    from vectordb_data_ingestion_spark.sources import files as fmod

    d = tmp_path / "docs"
    d.mkdir()
    (d / "ok.txt").write_bytes(b"fine")
    (d / "boom.qqq").write_bytes(b"payload")
    prior = dict(fmod.PARSERS)
    try:
        def _broken(content):
            raise NameError("decoder deployed broken")

        fmod.register_parser("qqq", _broken)
        cat = read_binary_catalog(spark, str(d) + "/**")
        rows = {
            r["name"]: r
            for r in parse_documents(cat, errors=True).collect()
        }
        assert rows["ok.txt"]["text"] == "fine"
        assert rows["ok.txt"]["parse_error"] is None
        assert rows["boom.qqq"]["text"] is None
        assert (
            rows["boom.qqq"]["parse_error"]
            == "NameError: decoder deployed broken"
        )
        # default mode: schema unchanged (no parse_error column)
        assert "parse_error" not in parse_documents(cat).columns
    finally:
        fmod.PARSERS.clear()
        fmod.PARSERS.update(prior)


def test_parse_documents_unregistered_extension_yields_null(spark, tmp_path):
    """Review r6 (confirmed live): Spark evaluates the pandas UDF inside
    F.when() for EVERY row of the batch, so one row with an unregistered
    extension (a .wav in a text corpus, an extensionless file) raised
    NotImplementedError and aborted the whole job — the docstring's
    'unknown types yield null text' contract now actually holds. Direct
    _dispatch_full callers keep the loud strict failure."""
    from vectordb_data_ingestion_spark.sources import files as fmod

    d = tmp_path / "mixed"
    d.mkdir()
    (d / "ok.txt").write_bytes(b"fine")
    (d / "noise.wav").write_bytes(b"RIFF....WAVE")
    (d / "noext").write_bytes(b"???")
    cat = read_binary_catalog(spark, str(d) + "/**")
    rows = {r["name"]: r["text"] for r in parse_documents(cat).collect()}
    assert rows == {"ok.txt": "fine", "noise.wav": None, "noext": None}
    err = {
        r["name"]: r["parse_error"]
        for r in parse_documents(cat, errors=True).collect()
    }
    assert err["ok.txt"] is None
    # gated rows read null structs — no crash is the contract

    with pytest.raises(NotImplementedError, match="no parser"):
        fmod._dispatch_full(dict(fmod.PARSERS), b"x", "wav")


def test_parse_documents_caller_parsers_keys_normalized(spark, tmp_path):
    """Review r6: a caller-injected parsers dict with upper-case keys
    ({'PDF': fn}) never matched the lowercased dispatch kind — every PDF
    read null text. Keys are normalized at both injection points."""
    d = tmp_path / "inj"
    d.mkdir()
    (d / "a.pdf").write_bytes(b"payload")
    cat = read_binary_catalog(spark, str(d) + "/**")
    out = parse_documents(
        cat, parsers={"PDF": lambda b: f"decoded {len(b)}"}
    ).collect()
    assert [r["text"] for r in out] == ["decoded 7"]


def test_extract_pdf_tables(spark, tmp_path):
    from vectordb_data_ingestion_spark.sources.files import (
        _stub_pdf_tables,
        extract_pdf_tables,
    )

    d = tmp_path / "pdfs"
    d.mkdir()
    # REAL path (r4): a %PDF payload with 2x2 positioned cells extracts
    # the actual table via the positioned-text heuristic
    real_pdf = (
        b"%PDF-1.4\nstream\nBT "
        b"1 0 0 1 72 700 Tm (h1) Tj 1 0 0 1 200 700 Tm (h2) Tj "
        b"1 0 0 1 72 680 Tm (a1) Tj 1 0 0 1 200 680 Tm (b1) Tj "
        b"ET\nendstream\n%%EOF"
    )
    (d / "real.pdf").write_bytes(real_pdf)
    # stub fallback: a non-PDF payload whose stub yields >0 tables
    payload = next(
        bytes([i]) * 4 for i in range(64) if _stub_pdf_tables(bytes([i]) * 4)
    )
    (d / "t.pdf").write_bytes(payload)
    cat = read_binary_catalog(spark, str(d) + "/**")
    # DEFAULT: real-only — an undecodable payload claimed as pdf yields
    # NO rows (fabricated tables must never enter real data, review r4)
    default_rows = extract_pdf_tables(cat).collect()
    assert {r["url"].rsplit("/", 1)[-1] for r in default_rows} == {
        "real.pdf"
    }
    # synthetic pipelines opt into the deterministic stub explicitly
    rows = extract_pdf_tables(cat, allow_stub=True).collect()
    by_file = {}
    for r in sorted(rows, key=lambda r: r["table_index"]):
        by_file.setdefault(r["url"].rsplit("/", 1)[-1], []).append(
            r["table_text"]
        )
    assert by_file["real.pdf"] == ["h1|h2|a1|b1"]
    assert by_file["t.pdf"] == _stub_pdf_tables(payload)
    assert all("|" in r["table_text"] for r in rows)


def test_document_catalog_stream_reader(spark, tmp_path):
    """Streaming catalog: batch 1 reads the initial files, batch 2 (same
    checkpoint) picks up ONLY the file that appeared after the committed
    offset — the reference's modified_dt > load_dt incremental predicate
    driven by the stream's offset log instead of a hand-rolled state row."""
    import os

    from vectordb_data_ingestion_spark.sources.datasource import (
        DocumentCatalogDataSource,
    )

    root = tmp_path / "stream_ds"
    root.mkdir()
    f1 = root / "a.txt"
    f1.write_text("alpha")
    spark.dataSource.register(DocumentCatalogDataSource)
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")

    def run_batch():
        q = (
            spark.readStream.format("document_catalog")
            .option("path", str(root))
            .option("grace_seconds", "0")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_batch()
    first = {r["name"] for r in spark.read.parquet(out).collect()}
    assert first == {"a.txt"}

    # created AFTER batch 1's scan, so its natural mtime sits inside
    # batch 2's window (grace 0 keeps the test free of wall-clock races)
    f2 = root / "b.txt"
    f2.write_text("beta")
    run_batch()
    rows = spark.read.parquet(out).collect()
    names = sorted(r["name"] for r in rows)
    # a.txt must NOT replay: its mtime is at-or-before the committed offset
    assert names == ["a.txt", "b.txt"]
    got = {r["name"]: bytes(r["content"]) for r in rows}
    assert got["b.txt"] == b"beta"


def test_parse_json_quarantine_routes_bad_rows(spark):
    from vectordb_data_ingestion_spark.operators.catalog import (
        parse_json_quarantine,
    )

    rows = [
        (1, '{"k": 5, "tag": "x"}'),
        (2, "{not json"),
        (3, None),
        (4, '{"k": 7}'),
    ]
    df = spark.createDataFrame(rows, ["id", "props"])
    out = parse_json_quarantine(df, "props", "k long, tag string")
    good = {
        r["id"]: (r["props_parsed"]["k"], r["props_parsed"]["tag"])
        for r in out.filter(F.col("_corrupt").isNull()
                            & F.col("props_parsed").isNotNull()).collect()
    }
    bad = {r["id"]: r["_corrupt"] for r in out.filter(
        F.col("_corrupt").isNotNull()).collect()}
    assert good == {1: (5, "x"), 4: (7, None)}
    assert bad == {2: "{not json"}
    # NULL input is neither parsed nor quarantined (no payload to recover)
    null_row = out.filter(F.col("id") == 3).collect()[0]
    assert null_row["props_parsed"] is None and null_row["_corrupt"] is None


def test_rest_sharepoint_lister_recursive_walk(spark):
    """The no-office365 cloud tier (r4): recursive REST folder walk via
    injected fetch_json; files from nested folders surface, hidden
    folders are skipped, and the catalog derives the usual columns."""
    from vectordb_data_ingestion_spark.sources.sharepoint import (
        catalog_from_lister,
        rest_sharepoint_lister,
    )

    site = "https://example.sharepoint.com/sites/kb"

    def fake_fetch(url):
        if "'/kb'" in url:
            return {"d": {
                "Files": {"results": [{
                    "Name": "root.txt",
                    "ServerRelativeUrl": "/kb/root.txt",
                    "TimeLastModified": "2026-02-01T00:00:00Z",
                }]},
                "Folders": {"results": [
                    {"Name": "sub", "ServerRelativeUrl": "/kb/sub"},
                    {"Name": "_hidden", "ServerRelativeUrl": "/kb/_hidden"},
                ]},
            }}
        if "'/kb/sub'" in url:
            return {"d": {
                "Files": {"results": [{
                    "Name": "nested.pdf",
                    "ServerRelativeUrl": "/kb/sub/nested.pdf",
                    "TimeLastModified": "2026-02-02T00:00:00Z",
                }]},
                "Folders": {"results": []},
            }}
        raise AssertionError(f"unexpected fetch {url}")

    lister = rest_sharepoint_lister(site, "/kb", fetch_json=fake_fetch)
    cat = catalog_from_lister(spark, lister)
    rows = {r["name"]: r for r in cat.collect()}
    assert set(rows) == {"root.txt", "nested.pdf"}
    assert rows["nested.pdf"]["file_type"] == "pdf"
    assert rows["nested.pdf"]["url"] == "/kb/sub/nested.pdf"


def test_rest_sharepoint_lister_follows_next_pages(spark):
    """Server-paged collections (SharePoint caps every response at the
    list-view threshold) must be exhausted via __next links — a walk that
    reads only the first page silently truncates the catalog exactly when
    the corpus gets big. Covers both continuation shapes: a bare
    collection under d, and one re-wrapped under the expanded property."""
    from vectordb_data_ingestion_spark.sources.sharepoint import (
        catalog_from_lister,
        rest_sharepoint_lister,
    )

    site = "https://example.sharepoint.com/sites/kb"

    def file_row(i):
        return {
            "Name": f"f{i}.txt",
            "ServerRelativeUrl": f"/kb/f{i}.txt",
            "TimeLastModified": "2026-02-01T00:00:00Z",
        }

    def fake_fetch(url):
        if "'/kb'" in url:
            return {"d": {
                "Files": {
                    "results": [file_row(0), file_row(1)],
                    "__next": f"{site}/_api/files?page=2",
                },
                "Folders": {
                    "results": [],
                    "__next": f"{site}/_api/folders?page=2",
                },
            }}
        if url.endswith("files?page=2"):
            # continuation as a bare collection under d
            return {"d": {"results": [file_row(2)],
                          "__next": f"{site}/_api/files?page=3"}}
        if url.endswith("files?page=3"):
            return {"d": {"results": [file_row(3)]}}
        if url.endswith("folders?page=2"):
            # continuation re-wrapped under the expanded property
            return {"d": {"Folders": {"results": [
                {"Name": "late", "ServerRelativeUrl": "/kb/late"},
            ]}}}
        if "'/kb/late'" in url:
            return {"d": {
                "Files": {"results": [{
                    "Name": "deep.pdf",
                    "ServerRelativeUrl": "/kb/late/deep.pdf",
                    "TimeLastModified": "2026-02-02T00:00:00Z",
                }]},
                "Folders": {"results": []},
            }}
        raise AssertionError(f"unexpected fetch {url}")

    lister = rest_sharepoint_lister(site, "/kb", fetch_json=fake_fetch)
    names = {r["name"] for r in catalog_from_lister(spark, lister).collect()}
    assert names == {"f0.txt", "f1.txt", "f2.txt", "f3.txt", "deep.pdf"}


def test_onprem_lister_follows_next_pages(spark):
    """The on-prem OData walk pages identically: a folder over the
    list-view threshold must be exhausted via __next, not truncated."""
    from vectordb_data_ingestion_spark.sources.sharepoint import (
        onprem_sharepoint_lister,
    )

    def fake_fetch(url):
        if url == "http://sp.local/_api/folder/files":
            return {"d": {
                "results": [{"Name": "a.txt",
                             "ServerRelativeUrl": "/f/a.txt",
                             "TimeLastModified": "2026-01-01T00:00:00Z"}],
                "__next": "http://sp.local/_api/folder/files?page=2",
            }}
        if url.endswith("page=2"):
            return {"d": {"results": [
                {"Name": "b.txt", "ServerRelativeUrl": "/f/b.txt",
                 "TimeLastModified": "2026-01-01T00:00:00Z"},
            ]}}
        raise AssertionError(f"unexpected fetch {url}")

    lister = onprem_sharepoint_lister(
        ["http://sp.local/_api/folder/files"], "u", "p",
        fetch_json=fake_fetch,
    )
    assert [n for n, _u, _m in lister()] == ["a.txt", "b.txt"]


def test_paged_guards_loops_and_unknown_shapes():
    """_paged must fail LOUD, not wrong: a repeated __next raises instead
    of spinning the driver; an unrecognizable continuation raises instead
    of silently truncating; a multi-collection continuation feeds only the
    property being paged; a bare-list d is accepted."""
    import pytest as _pytest

    from vectordb_data_ingestion_spark.sources.sharepoint import _paged

    loop = {"results": [{"n": 1}], "__next": "u1"}
    with _pytest.raises(ValueError, match="paging loop"):
        list(_paged(loop, lambda u: {"d": loop}))

    start = {"results": [], "__next": "u1"}
    with _pytest.raises(ValueError, match="continuation shape"):
        list(_paged(start, lambda u: {"d": {"value": []}}, "Files"))

    # multi-collection continuation: only the paged property is consumed
    multi = {"d": {
        "Folders": {"results": [{"Name": "WRONG"}]},
        "Files": {"results": [{"Name": "right"}]},
    }}
    out = list(_paged(start, lambda u: multi, "Files"))
    assert out == [{"Name": "right"}]

    # bare-list continuation (older / non-verbose shape)
    out = list(_paged(start, lambda u: {"d": [{"Name": "x"}]}))
    assert out == [{"Name": "x"}]


def test_distributed_catalog_from_folders(spark):
    """Executor-side listing: the folder list is distributed, each
    partition lists its own folders (factory built per partition, like
    fetch_content's fetcher_factory), and the derived catalog matches the
    driver-side path row for row."""
    from vectordb_data_ingestion_spark.sources.sharepoint import (
        catalog_from_lister,
        distributed_catalog_from_folders,
    )

    folders = [f"/site/f{i}" for i in range(7)]

    def rows_for(folder):
        i = folder.rsplit("f", 1)[1]
        return [
            (f"doc{i}_{j}.pdf", f"{folder}/doc{i}_{j}.pdf",
             "2026-03-01T00:00:00Z")
            for j in range(3)
        ]

    def factory():
        return rows_for

    dist = distributed_catalog_from_folders(
        spark, folders, factory, num_partitions=4
    )

    def driver_lister():
        for f in folders:
            yield from rows_for(f)

    drv = catalog_from_lister(spark, driver_lister)
    key = lambda r: r["url"]  # noqa: E731
    got = sorted(dist.collect(), key=key)
    want = sorted(drv.collect(), key=key)
    assert len(got) == 21
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    assert got[0]["file_type"] == "pdf"
    assert got[0]["file_id"] == want[0]["file_id"]


def test_fetch_content_retries_transient_failures(spark, tmp_path):
    """A fetch that fails transiently must succeed on retry (with the
    attempt count visible via a side file, since the fetcher runs in an
    executor process); a fetch that always fails records its FINAL error
    after exhausting retries."""
    from vectordb_data_ingestion_spark.sources.sharepoint import (
        fetch_content,
    )

    marker = str(tmp_path / "attempts")
    os.makedirs(marker)
    cat = spark.createDataFrame(
        [("flaky.txt", "flaky", "2026-01-01", "txt"),
         ("dead.txt", "dead", "2026-01-01", "txt")],
        "name string, url string, last_modified string, file_type string",
    )

    def factory():
        def fetch(url):
            # per-url attempt counter on the shared tmp filesystem
            n = len(os.listdir(marker)) if url == "flaky" else 0
            if url == "flaky":
                open(os.path.join(marker, f"a{n}"), "w").close()
                if n == 0:
                    raise OSError("transient 503")
                return b"recovered"
            raise OSError("permanently gone")

        return fetch

    out = {r["url"]: r for r in fetch_content(
        cat, factory, num_partitions=1, retries=2, backoff_s=0.01
    ).collect()}
    assert out["flaky"]["content"] == b"recovered"
    assert out["flaky"]["error"] is None
    assert out["dead"]["content"] is None
    assert "permanently gone" in out["dead"]["error"]
    assert len(os.listdir(marker)) == 2  # first attempt + one retry


def test_fetch_content_retryable_predicate_stops_permanent_errors(
    spark, tmp_path
):
    """retries are opt-in and gated by the retryable predicate: a
    permanent error (here FileNotFoundError) must be attempted exactly
    once even with retries enabled."""
    from vectordb_data_ingestion_spark.sources.sharepoint import (
        fetch_content,
    )

    marker = str(tmp_path / "attempts")
    os.makedirs(marker)
    cat = spark.createDataFrame(
        [("gone.txt", "gone", "2026-01-01", "txt")],
        "name string, url string, last_modified string, file_type string",
    )

    def factory():
        def fetch(url):
            open(os.path.join(marker, f"a{len(os.listdir(marker))}"),
                 "w").close()
            raise FileNotFoundError(url)

        return fetch

    out = fetch_content(
        cat, factory, retries=3, backoff_s=0.01,
        retryable=lambda e: not isinstance(e, FileNotFoundError),
    ).collect()
    assert "FileNotFoundError" in out[0]["error"]
    assert len(os.listdir(marker)) == 1  # no retry on a permanent error


def test_paged_exhausts_arbitrary_page_chains():
    """Property: however the server splits N items across __next pages
    (including empty middle pages), _paged yields exactly the N items in
    order, fetching each continuation once."""
    import random

    from vectordb_data_ingestion_spark.sources.sharepoint import _paged

    rng = random.Random(9)
    for _trial in range(50):
        n = rng.randrange(0, 30)
        items = [{"i": k} for k in range(n)]
        # random split points -> pages (some possibly empty)
        cuts = sorted(rng.randrange(0, n + 1) for _ in range(rng.randrange(0, 5)))
        pages, prev = [], 0
        for c in cuts + [n]:
            pages.append(items[prev:c])
            prev = c
        urls = [f"u{k}" for k in range(1, len(pages))]
        book = {}
        for k, page in enumerate(pages):
            d = {"results": page}
            if k < len(urls):
                d["__next"] = urls[k]
            book[urls[k - 1] if k > 0 else "__start__"] = d
        fetched = []

        def fetch(url, book=book, fetched=fetched):
            fetched.append(url)
            return {"d": book[url]}

        got = list(_paged(book["__start__"], fetch))
        assert got == items
        assert fetched == urls  # each continuation fetched exactly once


def test_distributed_listing_fails_loud_on_lister_error(spark):
    """A lister exception must FAIL the catalog job (documented
    contract): a catalog quietly missing a folder's files is the
    silent-truncation failure mode."""
    from vectordb_data_ingestion_spark.sources.sharepoint import (
        distributed_catalog_from_folders,
    )

    def factory():
        def list_folder(folder):
            if folder.endswith("bad"):
                raise PermissionError("403 on " + folder)
            yield "a.txt", f"{folder}/a.txt", "2026-01-01T00:00:00Z"

        return list_folder

    cat = distributed_catalog_from_folders(
        spark, ["/ok", "/bad"], factory, num_partitions=1
    )
    with pytest.raises(Exception, match="403 on /bad"):
        cat.collect()


def test_uppercase_extensions_parse_and_extract(spark):
    """Review r5: file_type preserves the filename's case (reference
    identify_filetype semantics), but every downstream gate must be
    case-insensitive — 'REPORT.PDF' used to silently get null text and
    skip table/attachment extraction."""
    from pyspark.sql import functions as F

    from vectordb_data_ingestion_spark.sources.files import (
        extract_pdf_tables,
        parse_documents,
    )

    pdf = (
        b"stream\nBT 1 0 0 1 72 700 Tm (hi) Tj 1 0 0 1 200 700 Tm (lo) Tj "
        b"1 0 0 1 72 680 Tm (a) Tj 1 0 0 1 200 680 Tm (b) Tj ET\nendstream"
    )
    cat = spark.createDataFrame(
        [("REPORT.PDF", "u1", "PDF", bytearray(b"%PDF-1.4\n" + pdf)),
         ("notes.txt", "u2", "txt", bytearray(b"plain text"))],
        "name string, url string, file_type string, content binary",
    )
    parsed = {r["url"]: r["text"] for r in parse_documents(cat).collect()}
    assert parsed["u2"] == "plain text"
    assert parsed["u1"] is not None and "hi" in parsed["u1"]
    assert extract_pdf_tables(cat).count() == 1


def test_excel_rows_to_df_empty_and_blank_columns(spark):
    """Review r5: a header-only sheet and an entirely-blank column both
    crashed Spark's schema inference (ValueError); typed columns keep
    their types, blank columns fall back to string."""
    from vectordb_data_ingestion_spark.sources.tabular import (
        excel_rows_to_df,
    )

    empty = excel_rows_to_df(spark, [("name", "qty")], ["name", "qty"])
    assert empty.count() == 0 and empty.columns == ["name", "qty"]

    blank_col = excel_rows_to_df(
        spark,
        [("name", "qty", "notes"), ("w", 3, None), ("g", 5, None)],
        ["name", "qty", "notes"],
    )
    rows = {r["name"]: (r["qty"], r["notes"]) for r in blank_col.collect()}
    assert rows == {"w": (3, None), "g": (5, None)}


def test_excel_rows_to_df_datetime_backtick_and_mixed(spark):
    """Regression (ADVICE r5): the inference fallback (triggered by a
    blank column alongside others) built DDL that (a) broke on a header
    cell containing a backtick and (b) mapped datetime columns to
    'string', making the typed createDataFrame raise on the values.
    Datetimes now type as timestamp/date; residual mixed-type columns
    str()-coerce instead of raising."""
    import datetime as dt

    from vectordb_data_ingestion_spark.sources.tabular import (
        excel_rows_to_df,
    )

    rows = [
        ("when", "day", "qty `backtick`", "mixed", "blank"),
        (dt.datetime(2024, 1, 2, 3, 4), dt.date(2024, 1, 2), 3, "x", None),
        (dt.datetime(2024, 5, 6, 7, 8), dt.date(2024, 5, 6), 5, 7, None),
    ]
    df = excel_rows_to_df(
        spark, rows, ["when", "day", "qty `backtick`", "mixed", "blank"]
    )
    assert dict(df.dtypes) == {
        "when": "timestamp",
        "day": "date",
        "qty `backtick`": "bigint",
        "mixed": "string",
        "blank": "string",
    }
    out = sorted(df.collect(), key=lambda r: r["when"])
    assert out[0]["when"] == dt.datetime(2024, 1, 2, 3, 4)
    assert out[0]["day"] == dt.date(2024, 1, 2)
    assert [r["mixed"] for r in out] == ["x", "7"]


def test_excel_rows_to_df_rows_narrower_than_columns(spark):
    """Review r6 (confirmed live): a sheet whose trailing DECLARED column
    has no cells yields rows padded only to the used width; the fallback
    then raised IndexError on r[i]. Narrow rows now right-pad to the
    declared width and the blank column types as string."""
    from vectordb_data_ingestion_spark.sources.tabular import (
        excel_rows_to_df,
    )

    df = excel_rows_to_df(
        spark,
        [("a", "b"), ("x", 1), ("y", 2)],  # used width 2
        ["a", "b", "c"],  # declared width 3
    )
    assert dict(df.dtypes) == {"a": "string", "b": "bigint", "c": "string"}
    assert sorted((r["a"], r["b"], r["c"]) for r in df.collect()) == [
        ("x", 1, None), ("y", 2, None),
    ]


def test_excel_rows_to_df_mixed_numeric_column(spark):
    """Review r6 (confirmed live): a column mixing ints and floats — the
    most ordinary spreadsheet column there is — raised PySparkTypeError
    [CANNOT_MERGE_TYPE] (a TypeError, which the ValueError-only except
    let through), and even via the fallback a 'double' column rejected
    raw ints. Both paths must land on double; bool+int mixes land on
    string via str() coercion."""
    from vectordb_data_ingestion_spark.sources.tabular import (
        excel_rows_to_df,
    )

    df = excel_rows_to_df(
        spark,
        [("qty", "flag"), (3, True), (2.5, 1)],
        ["qty", "flag"],
    )
    assert dict(df.dtypes) == {"qty": "double", "flag": "string"}
    rows = sorted(df.collect(), key=lambda r: r["qty"])
    assert [r["qty"] for r in rows] == [2.5, 3.0]
    assert [r["flag"] for r in rows] == ["1", "True"]


def test_datasource_modified_dt_instant_survives_session_timezone(
    tmp_path, spark
):
    """Review r6 (confirmed live): the reader emitted UTC wall-clock
    stripped to tz-naive, which Spark read in the SESSION zone — under
    America/New_York the stored instant was 5 h off, skewing every
    modified_dt > load_dt watermark. Emitting tz-aware datetimes makes
    unix_timestamp(modified_dt) equal the file's real st_mtime under any
    session timezone."""
    import os

    from vectordb_data_ingestion_spark.sources.datasource import (
        DocumentCatalogDataSource,
    )

    d = tmp_path / "tzdocs"
    d.mkdir()
    (d / "a.txt").write_text("x")
    mtime = int(os.stat(d / "a.txt").st_mtime)
    spark.dataSource.register(DocumentCatalogDataSource)
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        row = (
            spark.read.format("document_catalog")
            .option("path", str(d))
            .load()
            .select(F.unix_timestamp("modified_dt").alias("epoch"))
            .collect()[0]
        )
        assert abs(row["epoch"] - mtime) <= 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_datasource_stream_skips_unreadable_entry(tmp_path):
    """Review r6: the stream reader caught only FileNotFoundError, so any
    other OSError (symlink loop, permissions, stale NFS handle) wedged
    the stream forever — the offset never advanced past the bad file.
    One poisoned entry must be skipped while its siblings flow."""
    import os

    from vectordb_data_ingestion_spark.sources.datasource import (
        DocumentCatalogStreamReader,
    )

    d = tmp_path / "streamdocs"
    d.mkdir()
    (d / "good.txt").write_text("fine")
    os.symlink(str(d / "loop.lnk"), str(d / "loop.lnk"))  # ELOOP on stat
    reader = DocumentCatalogStreamReader(
        {"path": str(d), "grace_seconds": "0"}
    )
    rows, end = reader.read(reader.initialOffset())
    names = [r[0] for r in rows]
    assert names == ["good.txt"]
    assert end["mtime_ns"] > 0  # offset advanced despite the bad entry


def test_local_dir_lister_skips_dangling_symlink(tmp_path, spark):
    """Review r6: one dangling symlink anywhere under root crashed the
    whole catalog build (os.path.getmtime raised through the walk)."""
    import os

    from vectordb_data_ingestion_spark.sources.sharepoint import (
        catalog_from_lister,
        local_dir_lister,
    )

    d = tmp_path / "cat"
    d.mkdir()
    (d / "real.txt").write_text("x")
    os.symlink(str(d / "gone.txt"), str(d / "dangle.txt"))
    cat = catalog_from_lister(spark, local_dir_lister(str(d)))
    assert [r["name"] for r in cat.collect()] == ["real.txt"]


def test_datasource_modified_after_is_utc_and_vanish_safe(tmp_path, spark):
    """Review r5: a tz-naive modified_after cutoff is UTC (the emitted
    modified_dt is UTC, and incremental loaders feed max(modified_dt)
    straight back); a broken symlink in the walk must be skipped, not
    abort the scan."""
    import os

    d = tmp_path / "docs"
    d.mkdir()
    (d / "old.txt").write_text("old")
    os.utime(d / "old.txt", (1e9, 1e9))  # 2001
    (d / "new.txt").write_text("new")
    os.utime(d / "new.txt", (2e9, 2e9))  # 2033
    os.symlink(str(d / "gone.txt"), str(d / "dangling.txt"))

    from vectordb_data_ingestion_spark.sources.datasource import (
        DocumentCatalogReader,
    )

    reader = DocumentCatalogReader(
        {
            "path": str(d),
            # between the two mtimes; naive ISO == UTC regardless of TZ
            "modified_after": "2010-01-01T00:00:00",
        },
    )
    names = sorted(
        n for part in reader.partitions() for (n, *_rest) in part.files
    )
    assert names == ["new.txt"]


def test_declared_schemas_match_producers(spark):
    """schemas.py is the engine's declared data model (T1 catalog, T4
    multimodal) — review r5 found nothing consumed it, so drift against
    what the builders actually produce was invisible. Pin the producer
    outputs to the declared StructTypes."""
    from vectordb_data_ingestion_spark.schemas import (
        FILE_CATALOG_SCHEMA,
        MULTIMODAL_SCHEMA,
    )
    from vectordb_data_ingestion_spark.sources.sharepoint import (
        catalog_from_lister,
    )

    def lister(folder="/"):
        yield "a.pdf", "https://h/a.pdf", "2026-01-01T00:00:00Z"

    cat = catalog_from_lister(spark, lister)
    declared = [(f.name, f.dataType) for f in FILE_CATALOG_SCHEMA.fields]
    produced = [(f.name, f.dataType) for f in cat.schema.fields]
    assert produced == declared

    # a MULTIMODAL_SCHEMA frame feeds extract_features directly: the
    # declared schema and the operator's expected input cannot drift
    from vectordb_data_ingestion_spark.operators.multimodal import (
        extract_features,
    )

    mm = spark.createDataFrame(
        [(1, "image", bytearray(b"x"), "image/png", {"w": "2"})],
        MULTIMODAL_SCHEMA,
    )
    feats = extract_features(mm).collect()
    assert len(feats) == 1 and feats[0]["asset_id"] == 1
