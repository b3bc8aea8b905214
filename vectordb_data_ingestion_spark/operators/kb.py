"""KB-article / service-catalog ETL operators.

Parity targets: ``process_kb_articles`` (cmfunctions.py:358-438),
``process_service_catalog`` (cmfunctions.py:446-486), and ``split_kbs``
(cmfunctions.py:329-355). The reference walks pandas rows one at a time and
re-appends to a DataFrame (O(n^2)); here each is a single whole-DataFrame
expression (narrow, JVM-side) - token-limit splitting is an explode, not a
Python loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.functions.text import token_count


def _present(c: Column) -> Column:
    """The reference's null-ish guard: value is not None and != 'nan'
    (cmfunctions.py:370-377)."""
    return c.isNotNull() & (c != "nan")


def _present_trim(c: Column) -> Column:
    """Guard used for Category/Metadata suffixes: str(x).strip() not in
    ('', 'nan') (cmfunctions.py:409-412)."""
    t = F.trim(c)
    return c.isNotNull() & (t != "") & (t != "nan")


def compose_kb_article(
    df: DataFrame,
    article_col: str,
    issue_col: str,
    resolution_col: str,
    question_col: str,
    instruction_col: str,
    category_col: str,
    metadata_col: str,
    short_desc_col: str,
    kb_number_col: str,
    portal_url_prefix: str,
    out_text: str = "extracted_text",
    out_url: str = "url",
) -> DataFrame:
    """Labelled concatenation of the KB fields with the reference's guard
    semantics (cmfunctions.py:379-421). Inputs are assumed already
    HTML-extracted (pipe through functions.html.html_to_text_udf first when
    the source columns are raw HTML)."""

    def seg(label: str, col: str) -> Column:
        c = F.col(col)
        return F.when(_present(c), F.concat(F.lit(label), c)).otherwise(F.lit(""))

    body = F.concat(
        F.coalesce(F.col(article_col), F.lit("")),
        seg(" Related Issue: ", issue_col),
        seg(" Resolution: ", resolution_col),
        seg(" Question: ", question_col),
        seg(" Instruction: ", instruction_col),
    )
    body = F.concat(
        body,
        F.when(
            _present_trim(F.col(category_col)),
            F.concat(F.lit(" Category: "), F.col(category_col)),
        ).otherwise(F.lit("")),
        F.when(
            _present_trim(F.col(metadata_col)),
            F.concat(F.lit(" Metadata: "), F.col(metadata_col)),
        ).otherwise(F.lit("")),
    )
    # coalesce the two unguarded reference fields: the reference's pandas
    # form CRASHES on a NaN short_description/kb_number ("str" + float),
    # and bare concat here would instead NULL the whole article/url so it
    # silently vanished downstream — '' keeps the composed body (review r5)
    text = F.concat(
        F.lit("Short Description : "),
        F.coalesce(F.col(short_desc_col), F.lit("")),
        F.lit(" Full Article: "),
        body,
    )
    url = F.concat(
        F.lit(portal_url_prefix), F.coalesce(F.col(kb_number_col), F.lit(""))
    )
    return df.withColumn(out_text, text).withColumn(out_url, url)


def compose_service_catalog(
    df: DataFrame,
    title_col: str,
    short_desc_col: str,
    long_desc_col: str,
    metadata_col: str,
    out_text: str = "extracted_text",
) -> DataFrame:
    """Markdown-ish compose with blank-guards (cmfunctions.py:454-475)."""

    def seg(label: str, col: str) -> Column:
        c = F.col(col)
        return F.when(
            c.isNotNull() & (F.trim(c) != ""), F.concat(F.lit(label), c)
        ).otherwise(F.lit(""))

    text = F.concat(
        F.lit("\n\n**Title**: "),
        F.coalesce(F.col(title_col), F.lit("")),  # see compose_kb_article
        seg("\n\n**Short Description**: ", short_desc_col),
        seg("\n\n**Long Description**: ", long_desc_col),
        seg("\n\n**Metadata**: ", metadata_col),
    )
    return df.withColumn(out_text, text)


def split_long_rows(
    df: DataFrame,
    text_col: str = "extracted_text",
    url_col: str = "url",
    token_limit: int = 6000,
    out_text: str = "extracted_text",
    out_tokens: str = "n_tokens",
) -> DataFrame:
    """Token-limit row splitting with ``split_kbs`` semantics
    (cmfunctions.py:329-355):

    - rows within the limit pass through with their token count;
    - over-limit rows split into ceil(tokens/limit) even word-ranges; the
      final range absorbs the remainder;
    - parts after the first are prefixed with
      ``text.split('Full Article:')[0] + ' Part Article: '``;
    - the emitted ``n_tokens`` is the word-range length (end - start),
      faithfully matching the reference (which reports word counts, not
      re-tokenized counts, for split rows).

    Explode-based: one narrow pass, no Python loop, no shuffle.
    """
    tokens = token_count(F.col(text_col))
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.size(words)
    # ONE path for both shapes (within-limit rows get __ns = 1): the old
    # two-filter union re-executed the upstream scan and the hot
    # token_count regex once per branch — double the dominant cost at
    # corpus scale (review r5)
    num_splits = F.when(
        tokens > token_limit,
        F.ceil(tokens / F.lit(token_limit)).cast("int"),
    ).otherwise(F.lit(1))
    wps = F.floor(n_words / num_splits).cast("int")  # words_per_split
    prefix = F.element_at(F.split(F.col(text_col), "Full Article:"), 1)

    staged = df.select(
        "*",
        tokens.alias("__tok"),
        words.alias("__words"),
        n_words.alias("__nw"),
        num_splits.alias("__ns"),
        wps.alias("__wps"),
        prefix.alias("__prefix"),
    )

    i = F.col("__i")
    start = i * F.col("__wps")
    end = F.when(i < F.col("__ns") - 1, (i + 1) * F.col("__wps")).otherwise(
        F.col("__nw")
    )
    part = F.array_join(F.slice(F.col("__words"), start + 1, end - start), " ")
    part_text = F.when(
        i > 0, F.concat(F.col("__prefix"), F.lit(" Part Article: "), part)
    ).otherwise(part)

    exploded = (
        staged.withColumn(
            "__i", F.explode(F.sequence(F.lit(0), F.col("__ns") - 1))
        )
        .withColumn(
            "__out_text",
            F.when(F.col("__ns") == 1, F.col(text_col)).otherwise(part_text),
        )
        .withColumn(
            "__out_tokens",
            F.when(F.col("__ns") == 1, F.col("__tok"))
            .otherwise(end - start)
            .cast("int"),
        )
    )
    keep = [c for c in df.columns if c not in (text_col, out_tokens)]
    return exploded.select(
        *keep,
        F.col("__out_text").alias(out_text),
        F.col("__out_tokens").alias(out_tokens),
    )
