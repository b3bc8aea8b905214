"""Hypothesis property tests: the JVM-side text expressions vs independent
pure-Python references for the documented semantics (parsers.py:25-37 word
split, :170-194 cleanup, tokenizer regex). One Spark job per example batch
— hypothesis drives LISTS of texts so shrinking still isolates a minimal
failing string without a Spark roundtrip per case."""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.functions.text import (
    TOKEN_PATTERN,
    clean_text,
    token_count,
    word_split,
)

# text with whitespace runs, escapes, unicode, punctuation — clean_text
# ascii-strips first, so the full unicode space is fair game for it
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="\x00"
        ),
        max_size=80,
    ),
    min_size=1,
    max_size=25,
)

# word_split / token_count define whitespace as the explicit ASCII class
# [ \x09-\x0D] (cross-engine exact; see functions/text.py) — Python's \s
# additionally matches \x1c-\x1f and unicode spaces, so the property
# compares on the domain where the contracts coincide: ASCII without the
# C0 separator block.
ASCII_TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            min_codepoint=1, max_codepoint=0x7F,
            exclude_characters="\x1c\x1d\x1e\x1f",
        ),
        max_size=80,
    ),
    min_size=1,
    max_size=25,
)


def _ref_clean(s: str) -> str:
    # the reference's remove_unicode + clean_documents chain
    # (parsers.py:170-194): drop literal newlines/CRs, ascii-encode-ignore,
    # drop \r \n \t escape pairs then stray backslashes, collapse \s+
    s = s.replace("\n", "").replace("\r", "")
    s = s.encode("ascii", "ignore").decode("ascii")
    s = re.sub(r"\\[rnt]?", "", s)
    s = re.sub(r"\s+", " ", s)
    return s


def _ref_word_split(s: str) -> list[str]:
    return re.sub(r"\s+", " ", s).split(" ")


def _run_column(spark, texts, col):
    df = spark.createDataFrame(
        list(enumerate(texts)), "i long, text string"
    )
    return [
        r["out"] for r in df.select("i", col.alias("out")).orderBy("i").collect()
    ]


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=TEXTS)
def test_clean_text_matches_reference_semantics(spark, texts):
    got = _run_column(spark, texts, clean_text(F.col("text")))
    want = [_ref_clean(t) for t in texts]
    assert got == want


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=ASCII_TEXTS)
def test_word_split_matches_re_split(spark, texts):
    got = _run_column(spark, texts, word_split(F.col("text")))
    want = [_ref_word_split(t) for t in texts]
    assert got == want


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=ASCII_TEXTS)
def test_token_count_matches_re_findall(spark, texts):
    got = _run_column(spark, texts, token_count(F.col("text")))
    want = [len(re.findall(TOKEN_PATTERN, t)) for t in texts]
    assert got == want
