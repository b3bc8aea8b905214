"""Text-cleaning / tokenization expressions.

Parity targets in the reference (semantics only, re-expressed as Spark
column expressions so they run JVM-side inside whole-stage codegen):

- ``remove_unicode``      -> :func:`clean_text`   (parsers.py:170-183)
- ``word_splitter``       -> :func:`word_split`   (parsers.py:25-37)
- tiktoken token counting -> :func:`token_count`  (sharepointutils.py:364,379)

The reference counts tokens with tiktoken ``cl100k_base``. That tokenizer is
not available here (and a per-row Python tokenizer would be the slow path at
100 TB anyway), so the engine defines a deterministic regex "wordpiece-ish"
tokenizer: runs of letters, single digits, or single non-alphanumeric
characters. It is fully expressible in both Spark SQL and ANSI SQL
(``regexp_extract_all``), making every downstream token statistic
oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Runs of letters | single digit | any single non-alnum, non-space char.
# Mirrors the shape of BPE-style tokenization (words, digits, punctuation)
# while staying regex-expressible in both Spark and DuckDB.
#
# Whitespace is the EXPLICIT class [ \x09-\x0D] (space, \t, \n, \v, \f,
# \r) rather than ``\s``: Java's \s is exactly that set, but RE2's (DuckDB)
# omits \x0B, so ``\s`` silently diverges between the engine and its oracle
# on vertical tabs. Spelling the class out makes both engines bit-identical.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \x09-\x0D]"

# Whitespace-collapse pattern for word_split (Java-\s-equivalent, explicit).
_WS = r"[ \x09-\x0D]+"

# clean_text's collapse additionally treats the C0 separator block
# \x1C-\x1F as whitespace: the reference collapses with PYTHON's \s
# (parsers.py:181), which matches those — and after the ascii-strip these
# are the only whitespace-ish code points Python recognises beyond
# [ \x09-\x0D]. Property-tested against the pure-Python reference.
_WS_CLEAN = r"[ \x09-\x0D\x1C-\x1F]+"


def word_split(col: Column | str) -> Column:
    """Split text on whitespace after collapsing runs, mirroring the
    reference's ``word_splitter`` (parsers.py:25-37): collapse ``\\s+`` to a
    single space, then split on single spaces. Leading/trailing whitespace
    yields empty-string tokens, exactly as ``re.split`` does."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.regexp_replace(c, _WS, " "), " ")


def token_count(col: Column | str, kind: str = "regex") -> Column:
    """Token count with a pluggable tokenizer backend.

    ``kind``:

    - ``"regex"`` (default): the deterministic regex tokenizer (see module
      docstring). JVM-side ``regexp_count`` counts matches without
      materializing them into an array (~25% faster than
      size(regexp_extract_all) on the chunk spine — it is the hot
      expression at corpus scale), and the identical regex runs in DuckDB,
      so every downstream token statistic is oracle-checkable.
    - ``"tiktoken"``: exact reference parity (sharepointutils.py:364,379
      counts with tiktoken ``cl100k_base``) via an Arrow-batched pandas
      UDF. Raises ``ImportError`` at plan-build time when tiktoken is not
      installed — the cl100k merges table is proprietary-licensed data we
      cannot vendor, so parity is available exactly where the reference's
      own dependency is.
    - ``"bpe"``: real BPE counts from the VENDORED merge table
      (``functions/bpe_merges_v1.json`` — trained by this engine's own
      deterministic trainer, ``operators/bpe.py::bpe_train``, on the
      synthetic corpus; no third-party license attaches). Arrow-batched
      pandas UDF with a per-executor word cache
      (:func:`token_count_bpe`). Present in EVERY environment.
    - ``"auto"``: resolves to ``"bpe"`` unconditionally — the one
      BPE-semantics backend that exists everywhere, so ``auto`` never
      silently changes counting semantics between environments (it used
      to flip tiktoken→regex on import availability, which made
      ``n_tokens`` deployment-dependent). Ask for ``"tiktoken"``
      explicitly when you want exact cl100k parity and accept the
      dependency.

    The backends count different tokens (regex has no BPE merges; the
    vendored table is not cl100k), so ``n_tokens`` and the 6000-token
    ``split_kbs`` boundary (cmfunctions.py:329) differ between them on
    the same document. Pick one per deployment and keep it fixed — mixed
    counts would make incremental re-chunking non-idempotent.
    """
    c = F.col(col) if isinstance(col, str) else col
    if kind == "auto":
        kind = "bpe"
    if kind == "regex":
        return F.regexp_count(c, F.lit(TOKEN_PATTERN)).cast("int")
    if kind == "tiktoken":
        return token_count_tiktoken(c)
    if kind == "bpe":
        return token_count_bpe(c)
    raise ValueError(f"unknown tokenizer kind: {kind!r}")


def tiktoken_available() -> bool:
    try:
        import tiktoken  # noqa: F401

        return True
    except ImportError:
        return False


def token_count_tiktoken(
    col: Column | str, encoding_name: str = "cl100k_base"
) -> Column:
    """Reference-parity token count: ``len(tiktoken.get_encoding(
    'cl100k_base').encode(text))`` (sharepointutils.py:364,379), batched
    through Arrow with one encoder instance per executor interpreter.
    ``encode_ordinary_batch`` releases the GIL across the Rust core, so a
    whole Arrow batch tokenizes in parallel — this is NOT a row-at-a-time
    Python UDF. Raises ImportError where tiktoken is absent."""
    if not tiktoken_available():
        raise ImportError(
            "tiktoken is not installed; use token_count(col, kind='regex') "
            "(deterministic, oracle-checkable) or install tiktoken for "
            "reference cl100k_base parity"
        )

    @F.pandas_udf("int")
    def _count(texts: pd.Series) -> pd.Series:
        import tiktoken

        enc = tiktoken.get_encoding(encoding_name)
        filled = texts.fillna("").astype(str).tolist()
        return pd.Series(
            [len(t) for t in enc.encode_ordinary_batch(filled)], dtype="int32"
        )

    c = F.col(col) if isinstance(col, str) else col
    return _count(c)


_VENDORED_MERGES: list[tuple[str, str]] | None = None


def vendored_bpe_merges() -> list[tuple[str, str]]:
    """The packaged merge table (``bpe_merges_v1.json``): trained once by
    ``tools/train_vendored_bpe.py`` with this engine's own deterministic
    trainer on the synthetic corpus — permissively shippable, unlike the
    cl100k table. Versioned: regenerating with a different corpus/merge
    count must bump the filename, so deployed counts never silently
    shift."""
    global _VENDORED_MERGES
    if _VENDORED_MERGES is None:
        import json
        import os

        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bpe_merges_v1.json"
        )
        with open(path) as fh:
            payload = json.load(fh)
        _VENDORED_MERGES = [(l, r) for l, r in payload["merges"]]
    return _VENDORED_MERGES


def make_word_tokenizer(
    merge_pairs: list[tuple[str, str]],
    end_token: str = "</w>",
    max_cache: int = 1_000_000,
):
    """The ONE greedy merges-in-training-order word tokenizer, shared by
    ``token_count_bpe`` and ``operators/bpe.py::bpe_segment_vectorized``
    so the count backend can never drift from the segmenter it claims
    parity with. Build it on the driver and capture the returned closure
    in a UDF: cloudpickle ships nested closures by value, so each task
    deserializes ONE ``cache`` that persists across every Arrow batch of
    that task — word frequency is Zipf, so after the first few batches
    almost every occurrence is a dict hit and only first-seen words pay
    the O(merges·len) scan. ``max_cache`` bounds a pathological
    vocabulary (e.g. unique random strings) on a huge partition: the
    cache clears rather than growing without limit."""

    cache: dict[str, list[str]] = {}

    def tokenize(word: str) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [end_token]
        for left, right in merge_pairs:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        if len(cache) >= max_cache:
            cache.clear()
        cache[word] = syms
        return syms

    return tokenize


def token_count_bpe(col: Column | str) -> Column:
    """BPE token count over the vendored merge table: whitespace-split
    words -> chars+``</w>`` -> merges in training order, counted —
    ``len`` over the same :func:`make_word_tokenizer` closure the
    segmenter uses, so count and segmentation cannot diverge. The merge
    list ships in the UDF closure — no join, no shuffle, a pure narrow
    map; the word cache persists across Arrow batches within a task."""
    import re

    ws = re.compile(_WS)
    tokenize = make_word_tokenizer(vendored_bpe_merges())

    @F.pandas_udf("int")
    def _count(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                sum(
                    len(tokenize(w))
                    for w in ws.sub(" ", t if isinstance(t, str) else "")
                    .split(" ")
                    if w
                )
                for t in texts
            ],
            dtype="int32",
        )

    c = F.col(col) if isinstance(col, str) else col
    return _count(c)


# DuckDB-equivalent SQL snippet for oracle queries (same semantics).
def token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\x09-\\x0D]'))"


def clean_text(col: Column | str) -> Column:
    """Unicode/whitespace cleanup with the reference's ``remove_unicode``
    semantics (parsers.py:170-183), in order:

    1. drop literal newline/carriage-return characters
    2. drop all non-ASCII characters (``encode('ascii','ignore')``)
    3. drop the two-character escape sequences ``\\r`` ``\\n`` ``\\t`` and
       any remaining backslash
    4. collapse whitespace runs to a single space (no trim - the reference
       does not trim either)

    Implemented as 3 regex passes, not 5: steps 1+2 are a single char-class
    union (single-char drops can't interact), and ``\\[rnt]?`` is provably
    equivalent to dropping escape pairs then stray backslashes (both scans
    are left-to-right; equivalence covered by unit + corpus tests).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[\n\r]|[^\x00-\x7F]", "")
    c = F.regexp_replace(c, r"\\[rnt]?", "")
    c = F.regexp_replace(c, _WS_CLEAN, " ")
    return c


def clean_text_sql(expr: str) -> str:
    """DuckDB SQL with identical semantics to :func:`clean_text`.

    DuckDB ``regexp_replace`` replaces only the first match unless the ``'g'``
    flag is passed - Spark's replaces all - so every step sets ``'g'``.
    """
    e = f"regexp_replace({expr}, '[\\n\\r]|[^\\x00-\\x7F]', '', 'g')"
    e = f"regexp_replace({e}, '\\\\[rnt]?', '', 'g')"
    e = f"regexp_replace({e}, '[ \\x09-\\x0D\\x1C-\\x1F]+', ' ', 'g')"
    return e


def ascii_ratio(col: Column | str) -> Column:
    """Fraction of characters that are printable ASCII (text-quality signal)."""
    c = F.col(col) if isinstance(col, str) else col
    kept = F.length(F.regexp_replace(c, r"[^\x20-\x7E]", ""))
    return F.when(F.length(c) > 0, kept / F.length(c)).otherwise(F.lit(1.0))

# stopword counting lives in operators/textanalysis.py (lang_score) — a
# duplicate helper here was removed in r5 so the two copies cannot drift.
