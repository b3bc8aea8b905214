"""Chunking operators.

Two chunkers, mirroring the reference's two algorithms:

1. :func:`chunk_fixed_size_overlap` - fixed-size word windows with fractional
   overlap, exact semantics of ``get_chunks_fixed_size_with_overlap``
   (parsers.py:40-68, doctest-golden). Implemented entirely with Spark
   higher-order functions (split / sequence / slice / array_join) so chunking
   60M documents never leaves the JVM: the plan is scan -> project -> explode,
   no shuffle, no Python.

2. :func:`recursive_char_chunks` - character-budget chunking with overlap in
   the spirit of langchain's ``RecursiveCharacterTextSplitter`` as used by
   ``format_text`` (parsers.py:161-166) with chunk_size=2000 / overlap=50
   (data_ingestion.py:41-42). Reimplemented from its published semantics
   (split on ['\\n\\n', '\\n', ' ', ''] recursively, greedily merge splits
   back up to the budget, carrying overlap). Exposed as an Arrow-batched
   pandas UDF because the recursion is genuinely not expressible with
   built-ins.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from vectordb_data_ingestion_spark.functions.text import word_split


def overlap_words(chunk_size: int, overlap_fraction: float) -> int:
    """int(chunk_size * overlap_fraction) - reference parsers.py:61."""
    return int(chunk_size * overlap_fraction)


def chunk_fixed_size_overlap(
    df: DataFrame,
    text_col: str,
    chunk_size: int,
    overlap_fraction: float,
    chunk_col: str = "chunk_text",
    index_col: str = "chunk_index",
) -> DataFrame:
    """Explode each row into its fixed-size word chunks.

    Exact parity with ``get_chunks_fixed_size_with_overlap``
    (parsers.py:40-68): words = whitespace-collapsed split; for every start
    ``i`` in ``range(0, len(words), chunk_size)`` the chunk is
    ``words[max(i - overlap, 0) : i + chunk_size]`` joined by single spaces.

    All columns of ``df`` are preserved; two new columns are added:
    ``index_col`` (0-based chunk ordinal) and ``chunk_col``.

    Plan shape: project (split) -> explode (sequence of starts) -> project
    (slice + array_join). Narrow only - scales linearly with input bytes.
    """
    ov = overlap_words(chunk_size, overlap_fraction)
    words = word_split(F.col(text_col))
    df = df.withColumn("__words", words)
    # range(0, len(words), chunk_size); len >= 1 always because split('')
    # yields [''] - same as the reference, where ''.split pattern yields [''].
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__words") - 1, F.lit(0)), F.lit(chunk_size)
    )
    df = df.withColumn("__start", F.explode(starts))
    begin0 = F.greatest(F.col("__start") - F.lit(ov), F.lit(0))  # 0-based
    length = F.col("__start") + F.lit(chunk_size) - begin0
    chunk = F.array_join(F.slice(F.col("__words"), begin0 + 1, length), " ")
    return (
        df.withColumn(index_col, (F.col("__start") / F.lit(chunk_size)).cast("int"))
        .withColumn(chunk_col, chunk)
        .drop("__words", "__start")
    )


def chunk_fixed_size_overlap_sql(
    table: str,
    text_col: str,
    chunk_size: int,
    overlap_fraction: float,
    id_cols: str,
) -> str:
    """DuckDB oracle SQL with identical semantics to
    :func:`chunk_fixed_size_overlap` (list slicing is 1-based inclusive, so
    python ``words[a:b]`` == duckdb ``words[a+1:b]``)."""
    ov = overlap_words(chunk_size, overlap_fraction)
    return f"""
WITH w AS (
  SELECT {id_cols},
         string_split(regexp_replace({text_col}, '\\s+', ' ', 'g'), ' ') AS words
  FROM {table}
),
s AS (
  SELECT {id_cols}, words,
         unnest(range(0, greatest(len(words), 1), {chunk_size})) AS start
  FROM w
)
SELECT {id_cols},
       CAST(start / {chunk_size} AS INTEGER) AS chunk_index,
       array_to_string(words[greatest(start - {ov}, 0) + 1 : start + {chunk_size}], ' ')
         AS chunk_text
FROM s
"""


# ---------------------------------------------------------------------------
# Recursive character splitter (pandas UDF path)
# ---------------------------------------------------------------------------

_SEPARATORS = ["\n\n", "\n", " ", ""]


def _split_with_separator(text: str, sep: str) -> list[str]:
    if sep == "":
        return list(text)
    parts = text.split(sep)
    # keep the separator attached to the preceding piece (langchain keeps
    # separators so merged chunks reconstruct the original spacing)
    out = []
    for i, p in enumerate(parts):
        out.append(p + sep if i < len(parts) - 1 else p)
    return [p for p in out if p]


def recursive_char_chunks(
    text: str, chunk_size: int = 2000, chunk_overlap: int = 50, _sep_idx: int = 0
) -> list[str]:
    """Recursively split ``text`` into chunks of at most ``chunk_size``
    characters, preferring paragraph then line then word boundaries, merging
    adjacent small pieces and carrying ``chunk_overlap`` trailing characters
    between consecutive chunks. Oversized pieces recurse with the *next*
    separator (never the same one - that can loop on a piece that re-splits
    to itself, e.g. text ending in the separator)."""
    if len(text) <= chunk_size:
        return [text] if text else []

    # find the first remaining separator that actually splits the text
    pieces: list[str] = [text]
    next_idx = len(_SEPARATORS) - 1
    for i in range(_sep_idx, len(_SEPARATORS)):
        sep = _SEPARATORS[i]
        if sep == "" or sep in text:
            pieces = _split_with_separator(text, sep)
            next_idx = i + 1
            break

    # recursively break any oversized piece with finer separators
    atomic: list[str] = []
    for p in pieces:
        if len(p) > chunk_size and next_idx < len(_SEPARATORS):
            # carry the SAME overlap into the recursion (langchain splits
            # with one instance, so _chunk_overlap applies at every
            # level); passing 0 here made sub-chunks of any oversized
            # piece lose their overlap entirely (review r5)
            atomic.extend(
                recursive_char_chunks(p, chunk_size, chunk_overlap, next_idx)
            )
        elif len(p) > chunk_size:
            # character-level fallback: hard slice
            atomic.extend(
                p[j : j + chunk_size] for j in range(0, len(p), chunk_size)
            )
        else:
            atomic.append(p)

    # greedy merge up to chunk_size, with overlap carried from previous chunk
    chunks: list[str] = []
    cur = ""
    for p in atomic:
        if cur and len(cur) + len(p) > chunk_size:
            chunks.append(cur)
            tail = cur[-chunk_overlap:] if chunk_overlap > 0 else ""
            cur = tail if len(tail) + len(p) <= chunk_size else ""
        cur += p
    if cur:
        chunks.append(cur)
    return chunks


def recursive_char_chunks_udf(chunk_size: int = 2000, chunk_overlap: int = 50):
    """Arrow-batched wrapper; pair with ``posexplode`` for (index, chunk).
    Defaults are the reference's CHUNK_SIZE/CHUNK_OVERLAP_SIZE
    (data_ingestion.py:41-42)."""

    @F.pandas_udf(ArrayType(StringType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: recursive_char_chunks(t or "", chunk_size, chunk_overlap)
        )

    return _udf


def chunk_recursive(
    df: DataFrame,
    text_col: str,
    chunk_col: str = "chunk_text",
    index_col: str = "chunk_index",
    chunk_size: int = 2000,
    chunk_overlap: int = 50,
) -> DataFrame:
    """Explode rows into recursive-character chunks (2000/50 defaults from
    data_ingestion.py:41-42)."""
    arr = recursive_char_chunks_udf(chunk_size, chunk_overlap)(F.col(text_col))
    return df.select(
        "*", F.posexplode(arr).alias(index_col, chunk_col)
    )
