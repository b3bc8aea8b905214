"""Golden tests for the chunkers against the reference's only executable
specifications: the doctests of ``word_splitter`` (parsers.py:29-33) and
``get_chunks_fixed_size_with_overlap`` (parsers.py:46-58)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.functions.chunking import (
    chunk_fixed_size_overlap,
    recursive_char_chunks,
)
from vectordb_data_ingestion_spark.functions.text import clean_text, word_split

DOCTEST_TEXT = (
    "I would like to thank my middle finger for always sticking"
    " up               for me when I       needed it."
)

DOCTEST_WORDS = [
    "I", "would", "like", "to", "thank", "my", "middle", "finger", "for",
    "always", "sticking", "up", "for", "me", "when", "I", "needed", "it.",
]

DOCTEST_CHUNKS = [
    "I would like to thank",
    "thank my middle finger for always",
    "always sticking up for me when",
    "when I needed it.",
]


def test_word_split_golden(spark):
    df = spark.createDataFrame([(DOCTEST_TEXT,)], ["text"])
    [row] = df.select(word_split("text").alias("w")).collect()
    assert row["w"] == DOCTEST_WORDS


def test_chunk_fixed_overlap_golden(spark):
    df = spark.createDataFrame([(1, DOCTEST_TEXT)], ["doc_id", "text"])
    out = chunk_fixed_size_overlap(df, "text", chunk_size=5, overlap_fraction=0.2)
    rows = out.orderBy("chunk_index").collect()
    assert [r["chunk_text"] for r in rows] == DOCTEST_CHUNKS
    assert [r["chunk_index"] for r in rows] == [0, 1, 2, 3]


def test_chunk_fixed_overlap_reference_parity(spark):
    """Property check vs. a literal python re-implementation of the
    reference algorithm (parsers.py:40-68) on varied texts."""
    import re

    def ref_chunks(text, chunk_size, overlap_fraction):
        words = re.split(r"\s", re.sub(r"\s+", " ", text))
        ov = int(chunk_size * overlap_fraction)
        return [
            " ".join(words[max(i - ov, 0): i + chunk_size])
            for i in range(0, len(words), chunk_size)
        ]

    texts = [
        "",
        "one",
        "alpha beta gamma delta epsilon zeta eta theta",
        "  leading and   trailing  ",
        "a " * 100,
        "word" + " x" * 57,
    ]
    for cs, ovf in [(5, 0.2), (3, 0.5), (8, 0.0), (2, 0.99)]:
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        out = (
            chunk_fixed_size_overlap(df, "text", cs, ovf)
            .orderBy("doc_id", "chunk_index")
            .collect()
        )
        got = {}
        for r in out:
            got.setdefault(r["doc_id"], []).append(r["chunk_text"])
        for i, t in enumerate(texts):
            assert got[i] == ref_chunks(t, cs, ovf), (t, cs, ovf)


def test_clean_text_reference_parity(spark):
    """clean_text must match remove_unicode (parsers.py:170-183) exactly."""
    import re

    def ref_remove_unicode(string):
        new_string = string.replace("\n", "").replace("\r", "")
        cleanstr = new_string.encode("ascii", "ignore").decode()
        cleanstr = (
            cleanstr.replace("\\r", "")
            .replace("\\n", "")
            .replace("\\t", "")
            .replace("\\", "")
        )
        return re.sub(r"\s+", " ", cleanstr)

    samples = [
        "hello\nworld\r!",
        "uniécode 中文 text",
        r"escaped\r\n\t\\ stuff",
        "  lots   of\t\twhitespace  ",
        "",
        # adversarial for the merged 3-pass form: backslash runs, escape
        # pairs created by newline removal, trailing backslash
        "a\\rb",
        "x\\\\ry",
        "p\\\nrq",
        "café\\t end",
        "\\\\",
        "mix☃\\n\\x",
        "tail\\",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], ["i", "s"])
    rows = df.select("i", clean_text("s").alias("c")).orderBy("i").collect()
    for r, s in zip(rows, samples):
        assert r["c"] == ref_remove_unicode(s), repr(s)


def test_recursive_char_chunks_properties():
    text = ("para one line one\npara one line two\n\n" + "word " * 600 +
            "\n\nlast paragraph")
    chunks = recursive_char_chunks(text, chunk_size=200, chunk_overlap=20)
    assert all(len(c) <= 200 for c in chunks)
    assert len(chunks) > 1
    # no content lost: stripped concatenation covers all non-overlap text
    joined = "".join(chunks)
    for token in ["para one line one", "last paragraph"]:
        assert token in joined
    assert recursive_char_chunks("", 100, 10) == []
    assert recursive_char_chunks("tiny", 100, 10) == ["tiny"]


# --- pluggable tokenizer (token_count kind=) -------------------------------


def test_token_count_kinds(spark):
    """Three backends with PINNED counts (verdict r4 item 6): regex
    (JVM-side, oracle-checkable), vendored BPE (present everywhere —
    auto's deterministic resolution, never env-dependent), and tiktoken
    (reference parity, only where installed)."""
    from vectordb_data_ingestion_spark.functions.text import (
        tiktoken_available,
        token_count,
        vendored_bpe_merges,
    )

    assert len(vendored_bpe_merges()) == 105  # bpe_merges_v1 frozen size
    df = spark.createDataFrame([("hello, 42 worlds!",)], ["text"])
    [row] = df.select(
        token_count("text").alias("regex"),
        token_count("text", kind="bpe").alias("bpe"),
        token_count("text", kind="auto").alias("auto"),
    ).collect()
    # regex tokenizer: hello , 4 2 worlds !  -> 6
    assert row["regex"] == 6
    # vendored BPE v1: h e l l o , </w> 4 2 </w> w or l d s ! </w> -> 17
    assert row["bpe"] == 17
    # auto == bpe in EVERY environment (it used to flip tiktoken->regex
    # on import availability, making n_tokens deployment-dependent)
    assert row["auto"] == row["bpe"]
    if tiktoken_available():
        import tiktoken

        expected = len(
            tiktoken.get_encoding("cl100k_base").encode("hello, 42 worlds!")
        )
        [trow] = df.select(
            token_count("text", kind="tiktoken").alias("tk")
        ).collect()
        assert trow["tk"] == expected

    with pytest.raises(ValueError):
        token_count("text", kind="nope")


def test_token_count_tiktoken_gate(spark):
    from vectordb_data_ingestion_spark.functions.text import (
        tiktoken_available,
        token_count,
        token_count_tiktoken,
    )

    if not tiktoken_available():
        with pytest.raises(ImportError, match="tiktoken"):
            token_count_tiktoken("text")
        with pytest.raises(ImportError):
            token_count("text", kind="tiktoken")
    else:
        import tiktoken

        enc = tiktoken.get_encoding("cl100k_base")
        text = "I would like to thank my middle finger."
        df = spark.createDataFrame([(text,)], ["text"])
        [row] = df.select(
            token_count("text", kind="tiktoken").alias("n")
        ).collect()
        assert row["n"] == len(enc.encode(text))
