"""HTML -> text extraction (stdlib, no bs4 dependency).

Reimplements the reference's soup pipeline semantics
(cmfunctions.py:269-321):

- ``process_tag``      : ``<a href>`` becomes ``"text (href)"``; relative
  hrefs are prefixed with a configurable portal domain
  (cmfunctions.py:275 hardcodes its service-now host).
- ``process_table``    : ``<table>`` flattens to ``"Table: "`` + one
  ``" | "``-joined line per row + ``" Table ends here"``.
- ``process_descendants/process_soup`` : document-order text walk that skips
  text already consumed by table flattening, drops ``<style>`` content, and
  joins parts with single spaces.

Implemented as a streaming ``html.parser.HTMLParser`` (no DOM build) wrapped
in an Arrow-batched pandas UDF. Whitespace segmentation of text nodes may
differ from bs4 on exotic markup; the golden tests in tests/test_html.py
define the supported surface.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

DEFAULT_PORTAL_DOMAIN = "https://example.service-now.com/"


class _TextExtractor(HTMLParser):
    def __init__(self, portal_domain: str = DEFAULT_PORTAL_DOMAIN):
        super().__init__(convert_charrefs=True)
        self.portal = portal_domain
        self.parts: list[str] = []
        self._style_depth = 0
        self._table_depth = 0
        self._table_rows: list[list[str]] = []
        self._cell: list[str] | None = None
        self._a_href: str | None = None
        self._a_text: list[str] = []

    # -- tag events ---------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == "style":
            self._style_depth += 1
        elif tag == "table":
            self._table_depth += 1
            if self._table_depth == 1:
                self._table_rows = []
        elif self._table_depth > 0:
            if tag == "tr":
                self._table_rows.append([])
            elif tag in ("td", "th"):
                self._cell = []
        elif tag == "a":
            self._a_href = dict(attrs).get("href", "")
            self._a_text = []

    def handle_endtag(self, tag):
        if tag == "style" and self._style_depth > 0:
            self._style_depth -= 1
        elif tag == "table" and self._table_depth > 0:
            self._table_depth -= 1
            if self._table_depth == 0:
                lines = ["Table: "]
                for row in self._table_rows:
                    lines.append(" | ".join(row))
                lines.append(" Table ends here")
                self.parts.append("\n".join(lines))
        elif self._table_depth > 0 and tag in ("td", "th"):
            if self._cell is not None:
                self._table_rows and self._table_rows[-1].append(
                    "".join(self._cell).strip()
                )
                self._cell = None
        elif tag == "a" and self._a_href is not None:
            text = "".join(self._a_text)
            href = self._a_href
            if href.startswith("http"):
                self.parts.append(f"{text} ({href})")
            else:
                self.parts.append(f"{text} ({self.portal}{href})")
            self._a_href = None

    def handle_data(self, data):
        if self._style_depth > 0:
            return
        if self._table_depth > 0:
            if self._cell is not None:
                self._cell.append(data)
            return
        if self._a_href is not None:
            self._a_text.append(data)
            return
        self.parts.append(data.strip())

    def text(self) -> str:
        return " ".join(self.parts).strip()


def html_to_text(html: str | None, portal_domain: str = DEFAULT_PORTAL_DOMAIN) -> str:
    if html is None:
        return ""
    p = _TextExtractor(portal_domain)
    p.feed(str(html))
    return p.text()


@F.pandas_udf(StringType())
def html_to_text_udf(html: pd.Series) -> pd.Series:
    return html.map(html_to_text)
