"""Training-corpus management operators.

The reference pipeline stops at "chunk -> embed -> upsert"
(data_ingestion.py:60-100); a production training-data pipeline also has to
*curate* the corpus. This module adds the curation layer as Spark-first
operators, each deterministic and therefore DuckDB-oracle-checkable:

- :func:`deterministic_split`   train/val/test assignment by id hash
- :func:`vocabulary`            corpus vocabulary with counts (top-k)
- :func:`ngram_counts`          word n-gram LM counts (with multiplicity)
- :func:`pii_scrub`             regex redaction of emails / phones / IPs
- :func:`decontaminate`         benchmark n-gram-overlap contamination flags
- :func:`kmv_distinct`          k-minimum-values distinct-count sketch
- :func:`cap_per_group`         per-source document quota (top-n per group)

Scale notes (100 TB / 1000-executor design):

- ``deterministic_split`` and ``pii_scrub`` are pure narrow projections -
  no shuffle, whole-stage codegen, trivially parallel.
- ``vocabulary`` / ``ngram_counts`` are explode -> groupBy: Spark plants a
  map-side partial aggregate before the exchange, so the shuffle carries one
  row per distinct term per task, not one per token occurrence. The top-k
  tail is ``TakeOrderedAndProject`` (per-partition heap + driver merge of k
  rows), never a global sort.
- ``decontaminate`` broadcasts the benchmark gram set (benchmarks are MBs,
  corpora are TBs) so the contamination check is a broadcast semi-join - the
  100 TB side never shuffles.
- ``kmv_distinct`` replaces an exact COUNT(DISTINCT) - a full shuffle of
  every distinct term - with a bounded sketch: per-partition k smallest
  hashes, merged on the driver (k rows per partition). The estimate is the
  classic KMV/bottom-k estimator (Bar-Yossef et al. 2002): with h uniform on
  [0, 2^32), E[h_(k)] ~ k * 2^32 / (D + 1), so D ~ (k-1) * 2^32 / h_(k).
  Unlike HLL, the sketch is deterministic given the hash, so the estimate is
  reproducible cross-engine (the oracle computes the same number).
- ``cap_per_group`` is one hash-partitioned window (rank over group) -
  the standard per-domain-quota shape (C4/RefinedWeb style repetition
  control). Skewed groups split via AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vectordb_data_ingestion_spark.functions.hashing import (
    md5_hash32,
    md5_hash32_seeded,
    md5_hash32_seeded_sql,
    md5_hash32_sql,
)
from vectordb_data_ingestion_spark.functions.text import word_split

_HASH_SPACE = float(1 << 32)


# --- deterministic train/val/test split -----------------------------------

def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashing its id - stable across
    runs, executors, and data order (unlike ``randomSplit``, which depends on
    partitioning). Adding documents later never moves an existing document
    between splits - the property training pipelines need to avoid
    train/test leakage across dataset versions."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = md5_hash32_seeded(F.col(id_col).cast("string"), seed) % 10_000
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = bucket < int(round(acc * 10_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def deterministic_split_sql(
    id_expr: str,
    weights: dict[str, float] | None = None,
    seed: int = 0,
) -> str:
    """DuckDB CASE expression matching :func:`deterministic_split`."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = f"({md5_hash32_seeded_sql(f'CAST({id_expr} AS VARCHAR)', seed)} % 10000)"
    parts, acc = [], 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        parts.append(f"WHEN {bucket} < {int(round(acc * 10_000))} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{items[-1][0]}' END"


# --- vocabulary / n-gram statistics ---------------------------------------

def _tokens(text_col: str) -> Column:
    """Non-empty whitespace tokens, with multiplicity."""
    return F.filter(word_split(F.col(text_col)), lambda w: w != "")


_TOKENS_SQL = (
    "list_filter(string_split(regexp_replace({e}, '\\s+', ' ', 'g'), ' '), "
    "w -> w <> '')"
)


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    top_n: int | None = None,
) -> DataFrame:
    """Corpus vocabulary: (word, n_occurrences, n_docs), optionally capped
    at the ``top_n`` most frequent (count desc, word asc - deterministic).
    Map-side partial agg means the shuffle carries distinct words only."""
    toks = df.select(F.explode(_tokens(text_col)).alias("word"))
    out = (
        toks.groupBy("word")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    if top_n is not None:
        out = out.orderBy(F.desc("n_occurrences"), F.asc("word")).limit(top_n)
    return out


def vocabulary_sql(
    table: str,
    text_col: str = "text",
    min_count: int = 1,
    top_n: int | None = None,
) -> str:
    toks = _TOKENS_SQL.format(e=text_col)
    q = f"""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM (SELECT unnest({toks}) AS word FROM {table})
    GROUP BY word HAVING COUNT(*) >= {min_count}
    """
    if top_n is not None:
        q += f" ORDER BY n_occurrences DESC, word ASC LIMIT {top_n}"
    return q


def word_ngrams(text_col: str, n: int) -> Column:
    """Consecutive word n-grams WITH multiplicity (LM counts need
    repeats; contrast ``dedup.shingles`` which distincts for set
    similarity). Rows shorter than n words yield no grams."""
    words = _tokens(text_col)
    starts = F.when(
        F.size(words) >= n, F.sequence(F.lit(0), F.size(words) - n)
    ).otherwise(F.array())
    return F.transform(
        starts, lambda i: F.array_join(F.slice(words, i + 1, n), " ")
    )


def word_ngrams_sql(text_col: str, n: int) -> str:
    toks = _TOKENS_SQL.format(e=text_col)
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(0, len({toks}) - {n} + 1), "
        f"i -> array_to_string({toks}[i + 1 : i + {n}], ' ')) "
        f"ELSE [] END"
    )


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    min_count: int = 1,
    top_n: int | None = None,
) -> DataFrame:
    """Word n-gram language-model counts over the corpus (same plan shape
    as :func:`vocabulary`: explode -> partial agg -> shuffle of distinct
    grams -> TakeOrdered top-k)."""
    grams = df.select(F.explode(word_ngrams(text_col, n)).alias("ngram"))
    out = (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    if top_n is not None:
        out = out.orderBy(F.desc("n_occurrences"), F.asc("ngram")).limit(top_n)
    return out


def ngram_counts_sql(
    table: str,
    text_col: str = "text",
    n: int = 2,
    min_count: int = 1,
    top_n: int | None = None,
) -> str:
    grams = word_ngrams_sql(text_col, n)
    q = f"""
    SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM (SELECT unnest({grams}) AS ngram FROM {table})
    GROUP BY ngram HAVING COUNT(*) >= {min_count}
    """
    if top_n is not None:
        q += f" ORDER BY n_occurrences DESC, ngram ASC LIMIT {top_n}"
    return q


# --- PII scrubbing ---------------------------------------------------------

# Shared RE2/Java-regex-compatible patterns (no lookaround, no backrefs).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    (r"\+?[0-9][0-9-]{5,}[0-9]", "[PHONE]"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Redact emails, IPv4 addresses, and phone-like digit runs, and count
    redactions per kind. Pure projection (chained ``regexp_replace`` /
    ``regexp_count``), fully codegen'd - the cheapest possible shape for a
    full-corpus scrub pass. Order matters: emails first (they contain
    digits), then IPs (dots disqualify them from the phone pattern), then
    phones."""
    out_col = out_col or text_col
    scrubbed = F.col(text_col)
    counts = []
    for pat, token in PII_PATTERNS:
        counts.append(
            F.regexp_count(scrubbed, F.lit(pat)).alias(
                f"n_{token.strip('[]').lower()}"
            )
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    keep = [c for c in df.columns if c != text_col or out_col != text_col]
    return df.select(*keep, *counts, scrubbed.alias(out_col))


def pii_scrub_sql(expr: str) -> dict[str, str]:
    """Column expressions (scrub + per-kind counts) for the DuckDB oracle.
    Counts are taken at the same stage of the chain as in :func:`pii_scrub`
    (i.e. after the previous patterns have already been replaced)."""
    out: dict[str, str] = {}
    scrubbed = expr
    for pat, token in PII_PATTERNS:
        p = pat.replace("'", "''")
        out[f"n_{token.strip('[]').lower()}"] = (
            f"CAST(len(regexp_extract_all({scrubbed}, '{p}')) AS INTEGER)"
        )
        scrubbed = f"regexp_replace({scrubbed}, '{p}', '{token}', 'g')"
    out["scrubbed"] = scrubbed
    return out


# --- benchmark decontamination --------------------------------------------

def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_n: int = 13,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag corpus documents sharing any word ``gram_n``-gram with a
    benchmark set (the standard LM eval-decontamination rule; 13-grams per
    GPT-3 appendix C). The benchmark's distinct gram hashes are broadcast
    (benchmarks are MBs, corpora TBs); the corpus side explodes to
    (doc, gram-hash), left-semi-joins the broadcast set to get contaminated
    ids, then a broadcast left join marks the flags - the corpus is scanned
    once and never shuffled."""
    gram_hash = lambda c: md5_hash32(c)  # noqa: E731
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(word_ngrams(text_col, gram_n))).alias("__g")
        )
        .select(gram_hash(F.col("__g")).alias("__gh"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(text_col, gram_n))).alias("__g"),
    ).select(id_col, gram_hash(F.col("__g")).alias("__gh"))
    contaminated = (
        corpus_grams.join(bench_grams, "__gh", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return corpus.join(F.broadcast(contaminated), id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("__hit"), F.lit(False))
    ).drop("__hit")


def decontaminate_sql(
    corpus_sql: str,
    benchmark_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_n: int = 13,
    select: str = "*",
) -> str:
    grams = word_ngrams_sql(text_col, gram_n)
    gh = md5_hash32_sql("g")
    return f"""
    WITH corpus AS ({corpus_sql}),
    benchmark AS ({benchmark_sql}),
    bg AS (
      SELECT DISTINCT {gh} AS gh
      FROM (SELECT unnest(list_distinct({grams})) AS g FROM benchmark)
    ),
    hits AS (
      SELECT DISTINCT {id_col} FROM (
        SELECT {id_col}, {gh} AS gh
        FROM (SELECT {id_col}, unnest(list_distinct({grams})) AS g FROM corpus)
      ) cg SEMI JOIN bg USING (gh)
    )
    SELECT {select}, ({id_col} IN (SELECT {id_col} FROM hits)) AS contaminated
    FROM corpus
    """


# --- KMV distinct sketch ---------------------------------------------------

def kmv_distinct(
    df: DataFrame,
    col: Column | str,
    k: int = 256,
) -> DataFrame:
    """K-minimum-values distinct-count estimate of an exploded column.
    One row out: (k_used, kth_min_hash, est_distinct). est_distinct =
    (k_used - 1) * 2^32 / kth_min when the sketch is full; when fewer than
    ``k`` distinct hashes exist the count is exact (= k_used).

    The k smallest hashes are collected via per-partition top-k
    (TakeOrderedAndProject) - k rows cross the wire per partition, never the
    distinct set itself."""
    c = F.col(col) if isinstance(col, str) else col
    hashes = df.select(md5_hash32(c).alias("__h")).distinct()
    smallest = hashes.orderBy(F.asc("__h")).limit(k)
    return smallest.agg(
        F.count("*").cast("int").alias("k_used"),
        F.max("__h").alias("kth_min_hash"),
    ).select(
        "k_used",
        "kth_min_hash",
        F.round(
            F.when(
                F.col("k_used") < k, F.col("k_used").cast("double")
            ).otherwise(
                (F.col("k_used") - 1) * F.lit(_HASH_SPACE) / F.col("kth_min_hash")
            ),
            2,
        ).alias("est_distinct"),
    )


def kmv_distinct_sql(values_sql: str, value_expr: str, k: int = 256) -> str:
    """Oracle for :func:`kmv_distinct`; ``values_sql`` yields the exploded
    rows, ``value_expr`` the column to sketch."""
    h = md5_hash32_sql(value_expr)
    return f"""
    WITH hashes AS (SELECT DISTINCT {h} AS h FROM ({values_sql})),
    smallest AS (SELECT h FROM hashes ORDER BY h ASC LIMIT {k})
    SELECT CAST(COUNT(*) AS INTEGER) AS k_used,
           MAX(h) AS kth_min_hash,
           ROUND(CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                 ELSE (COUNT(*) - 1) * {_HASH_SPACE} / MAX(h) END, 2)
             AS est_distinct
    FROM smallest
    """


# --- per-group quota -------------------------------------------------------

def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_by: list[Column] | None = None,
    n: int = 1000,
) -> DataFrame:
    """Keep at most ``n`` rows per group, preferring rows first in
    ``order_by`` (must be deterministic - include a unique tiebreaker).
    The C4/RefinedWeb-style per-domain quota: one hash-partitioned window,
    skew split by AQE."""
    if order_by is None:
        order_by = [F.col(c) for c in df.columns if c != group_col][:1]
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
