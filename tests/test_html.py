"""Golden tests for the stdlib HTML -> text extractor against the
reference's soup semantics (cmfunctions.py:269-321)."""

from vectordb_data_ingestion_spark.functions.html import html_to_text


def test_plain_text_passthrough():
    assert html_to_text("<p>hello world</p>") == "hello world"


def test_absolute_link_rewrite():
    # process_tag: "<a>" -> "text (href)"  (cmfunctions.py:272-273)
    out = html_to_text('see <a href="https://x.com/a">the docs</a> now')
    assert out == "see the docs (https://x.com/a) now"


def test_relative_link_portal_prefix():
    # relative hrefs prefixed with the portal domain (cmfunctions.py:275)
    out = html_to_text('<a href="kb?id=1">KB</a>')
    assert out == "KB (https://example.service-now.com/kb?id=1)"


def test_table_flatten():
    # process_table: "Table: " + " | "-joined rows + " Table ends here"
    # (cmfunctions.py:280-288)
    html = (
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
    )
    out = html_to_text(html)
    assert out == "Table: \nh1 | h2\na | b\n Table ends here"


def test_style_dropped():
    # process_soup removes <style> content (cmfunctions.py:314-317)
    out = html_to_text("<style>.x{color:red}</style><p>kept</p>")
    assert out == "kept"


def test_table_text_not_duplicated():
    # text inside table cells must not re-appear as free text
    # (process_descendants skips table/td/th/tr strings)
    html = "<p>before</p><table><tr><td>cell</td></tr></table><p>after</p>"
    out = html_to_text(html)
    assert out.count("cell") == 1
    assert out.startswith("before")
    assert out.endswith("after")


def test_nested_tags_and_none():
    assert html_to_text("<div><b>bold</b> and <i>italic</i></div>") == (
        "bold and italic"
    )
    assert html_to_text(None) == ""
    assert html_to_text("") == ""


def test_entities_resolved():
    assert html_to_text("<p>a &amp; b</p>") == "a & b"
