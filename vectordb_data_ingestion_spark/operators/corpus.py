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
- :func:`pack_sequences`        pack chunks into fixed token-budget sequences
- :func:`weighted_sample`       per-source deterministic mixture sampling
- :func:`dedup_paragraphs`      intra-document repeated-paragraph removal
- :func:`assign_shards`         deterministic global shuffle -> training shards

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
- ``pack_sequences`` packs per *group* (shard/source), not globally: a
  global packing order would be a total sort of the corpus. Real training
  pipelines pack within shards, which is one hash-partitioned window here.
- ``weighted_sample`` and ``assign_shards`` are narrow projections off an
  id hash - no shuffle for the sample, one key shuffle (by design - that IS
  the global shuffle) for shard materialization.
- ``dedup_paragraphs`` is a pure array-expression projection (split ->
  first-occurrence filter -> rejoin), whole-stage codegen, no Python.
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
    md5_hash60,
    md5_hash60_sql,
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
    esc = lambda n: n.replace("'", "''")  # noqa: E731 - SQL literal escape
    for name, w in items[:-1]:
        acc += w / total
        parts.append(
            f"WHEN {bucket} < {int(round(acc * 10_000))} THEN '{esc(name)}'"
        )
    return "CASE " + " ".join(parts) + f" ELSE '{esc(items[-1][0])}' END"


# --- vocabulary / n-gram statistics ---------------------------------------

def _tokens(text_col: str) -> Column:
    """Non-empty whitespace tokens, with multiplicity."""
    return F.filter(word_split(F.col(text_col)), lambda w: w != "")


_TOKENS_SQL = (
    "list_filter(string_split(regexp_replace({e}, '[ \\x09-\\x0D]+', ' ', 'g'), ' '), "
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

    # bind the token array as a lambda variable before the per-start
    # slices - referencing `words` inside the lambda body re-runs the
    # tokenizer once per gram start (O(words²) per doc; same fix as
    # dedup.shingles / winnowing_fingerprint)
    def grams(w: Column) -> Column:
        starts = F.when(
            F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
        ).otherwise(F.array())
        return F.transform(
            starts, lambda i: F.array_join(F.slice(w, i + 1, n), " ")
        )

    return F.flatten(F.transform(F.array(words), grams))


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
    once and never shuffled.

    Gram hashes are 60-bit (r5): at 32 bits a clean 2000-gram document
    checked against a 1M-gram benchmark set is FALSELY flagged with
    probability ~2000*1e6/2^32 ≈ 37% — corpus-scale decontamination would
    discard huge clean swaths. 60 bits cut the per-gram rate by 2^28."""
    gram_hash = lambda c: md5_hash60(c)  # noqa: E731
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
    # NOT force-broadcast (r5): contaminated ids grow with hit mass — a
    # benchmark that leaked wholesale into the corpus (the very case
    # decontamination exists for) would make a forced broadcast OOM; AQE
    # broadcasts while the set is small and shuffles when it is not.
    return corpus.join(contaminated, id_col, "left").withColumn(
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
    gh = md5_hash60_sql("g")
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

    The k smallest DISTINCT hashes are found with a per-partition
    k-smallest-distinct prefilter (one Arrow pass, numpy unique) so at
    most k rows cross the wire per partition — the global distinct +
    TakeOrdered then runs on <= k * n_partitions rows, never the distinct
    set itself (a plain ``.distinct()`` first would shuffle every
    distinct value, the exact COUNT(DISTINCT) exchange the sketch exists
    to avoid; any global k-smallest-distinct hash is necessarily among
    its own partition's k smallest distinct, so the prefilter is
    lossless)."""
    import pandas as pd

    c = F.col(col) if isinstance(col, str) else col
    # NULL inputs hash to NULL; drop them BEFORE the Arrow prefilter. In
    # pandas a NULL int64 arrives as NaN (float64), survives np.unique when
    # a partition holds < k distinct hashes, and the unsafe Arrow cast back
    # to 'long' turns NaN into INT64_MIN — a phantom global minimum that
    # skews kth_min/est_distinct (or raises under convertToArrowArraySafely).
    hashed = df.select(md5_hash32(c).alias("__h")).filter(
        F.col("__h").isNotNull()
    )

    def part_k_smallest(batches):
        import numpy as np

        best = None
        for pdf in batches:
            vals = pdf["__h"].to_numpy()
            merged = (
                vals if best is None else np.concatenate([best, vals])
            )
            best = np.unique(merged)[:k]  # unique() sorts ascending
        if best is not None and len(best):
            yield pd.DataFrame({"__h": best})

    local = hashed.mapInPandas(part_k_smallest, schema="__h long")
    smallest = local.distinct().orderBy(F.asc("__h")).limit(k)
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
    # NULL values are excluded from the sketch (mirrors the Spark side's
    # isNotNull prefilter; without it a NULL sorts last in DuckDB and can
    # inflate k_used by one on a sub-k sketch).
    return f"""
    WITH hashes AS (SELECT DISTINCT {h} AS h FROM ({values_sql})
                    WHERE {value_expr} IS NOT NULL),
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


# --- sequence packing -------------------------------------------------------

def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    budget: int = 2048,
    group_col: str | None = None,
    order_by: list[Column] | None = None,
    seq_col: str = "seq_id",
    offset_col: str = "seq_offset",
) -> DataFrame:
    """Pack chunks into fixed token-budget training sequences
    (concatenate-and-split packing, the GPT-style pretraining layout):
    lay the chunks out in a deterministic order, and assign each chunk to
    the sequence containing its *start* offset - ``seq_id =
    floor(exclusive_cumsum(tokens) / budget)``. A chunk that straddles a
    boundary belongs to the sequence it starts in (the trainer truncates or
    spills the tail), so a sequence's token sum can exceed ``budget`` by at
    most one chunk's overhang - the tradeoff that keeps assignment a single
    window expression instead of a sequential first-fit scan.

    ``group_col`` scopes packing (and the window shuffle) to a shard/source:
    a *global* pack order would be a total sort of the corpus, which no
    100 TB pipeline does - they pack per shard. Within the group the order
    must be deterministic (pass a unique ``order_by``). Also emits
    ``offset_col``: the chunk's token start offset within its sequence."""
    if order_by is None:
        order_by = [F.col(c) for c in df.columns if c != token_col][:1]
    # explicit ROWS frame: Spark's default frame with an ORDER BY is RANGE,
    # which sums all peer rows tied on the ordering key into the cumsum —
    # rows-frame semantics (and the SQL oracle's explicit ROWS BETWEEN)
    # count each row once regardless of ties
    w = (
        (
            Window.partitionBy(group_col) if group_col is not None
            else Window.partitionBy()
        )
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.coalesce(
        F.sum(F.col(token_col)).over(w) - F.col(token_col), F.lit(0)
    )
    return df.withColumn(seq_col, F.floor(start / budget)).withColumn(
        offset_col, (start % budget).cast("long")
    )


def pack_sequences_sql(
    token_expr: str,
    budget: int,
    group_expr: str | None,
    order_sql: str,
) -> dict[str, str]:
    """DuckDB window expressions matching :func:`pack_sequences`."""
    part = f"PARTITION BY {group_expr} " if group_expr else ""
    start = (
        f"(SUM({token_expr}) OVER ({part}ORDER BY {order_sql} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - {token_expr})"
    )
    return {
        "seq_id": f"CAST(FLOOR({start} / {budget}) AS BIGINT)",
        "seq_offset": f"CAST({start} % {budget} AS BIGINT)",
    }


# --- weighted source mixing -------------------------------------------------

def weighted_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-source mixture sampling (Pile/ROOTS-style source
    weighting, rates from e.g. temperature scaling): keep a row iff
    ``hash(id) / 2^32 < rate[source]``. Hash-gated rather than
    ``df.sample`` so membership is a pure function of the row id - stable
    across runs, partitionings, and dataset growth, and the same documents
    survive when the corpus is re-processed (reproducible training sets).
    Narrow projection: no shuffle, whole-stage codegen."""
    rate = None
    for name, r in rates.items():
        cond = F.col(group_col) == name
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = F.lit(default_rate) if rate is None else rate.otherwise(default_rate)
    u = md5_hash32_seeded(F.col(id_col).cast("string"), seed) / F.lit(_HASH_SPACE)
    return df.filter(u < rate)


def weighted_sample_sql(
    rates: dict[str, float],
    group_expr: str = "source",
    id_expr: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> str:
    """DuckDB WHERE predicate matching :func:`weighted_sample`."""
    whens = " ".join(
        f"WHEN '{name.replace(chr(39), chr(39) * 2)}' "
        f"THEN CAST({r} AS DOUBLE)"
        for name, r in rates.items()
    )
    rate = f"CASE {group_expr} {whens} ELSE CAST({default_rate} AS DOUBLE) END"
    h = md5_hash32_seeded_sql(f"CAST({id_expr} AS VARCHAR)", seed)
    return f"({h} / {_HASH_SPACE}) < {rate}"


# --- intra-document repetition removal --------------------------------------

def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    sep: str = "\n",
    out_col: str | None = None,
) -> DataFrame:
    """Remove *repeated paragraphs within each document*, keeping the first
    occurrence in order (boilerplate/navigation repetition is a known
    quality drag on web-scraped training text). Pure array expression -
    split on ``sep``, keep element i iff its first occurrence index is i,
    rejoin - so the whole pass is a codegen'd projection with no shuffle
    and no Python. Also emits ``n_paragraphs`` (before), ``n_dropped``, and
    ``dup_ratio`` = dropped / before as quality-filter signals."""
    out_col = out_col or text_col
    parts = F.split(F.col(text_col), F.lit(sep), -1)
    kept = F.filter(
        parts, lambda x, i: F.array_position(parts, x) == i + F.lit(1)
    )
    n_before = F.size(parts)
    n_after = F.size(kept)
    keep_cols = [c for c in df.columns if c != text_col or out_col != text_col]
    return df.select(
        *keep_cols,
        n_before.alias("n_paragraphs"),
        (n_before - n_after).alias("n_dropped"),
        F.round(
            (n_before - n_after) / F.greatest(n_before, F.lit(1)).cast("double"),
            4,
        ).alias("dup_ratio"),
        F.array_join(kept, sep).alias(out_col),
    )


def dedup_paragraphs_sql(text_expr: str, sep: str = "\n") -> dict[str, str]:
    """DuckDB expressions matching :func:`dedup_paragraphs` (DuckDB lambda
    index ``i`` and ``list_position`` are both 1-based, so the
    first-occurrence condition is ``list_position(parts, x) = i``)."""
    sep_sql = _sep_lit(sep)
    parts = f"string_split({text_expr}, {sep_sql})"
    kept = f"list_filter({parts}, (x, i) -> list_position({parts}, x) = i)"
    return {
        "n_paragraphs": f"CAST(len({parts}) AS INTEGER)",
        "n_dropped": f"CAST(len({parts}) - len({kept}) AS INTEGER)",
        "dup_ratio": (
            f"ROUND((len({parts}) - len({kept})) / "
            f"CAST(GREATEST(len({parts}), 1) AS DOUBLE), 4)"
        ),
        "text": f"array_to_string({kept}, {sep_sql})",
    }


def _sep_lit(sep: str) -> str:
    """A DuckDB string expression for a separator that may hold newlines."""
    out, buf = [], []
    for ch in sep:
        if ch == "\n":
            if buf:
                out.append("'" + "".join(buf).replace("'", "''") + "'")
                buf = []
            out.append("chr(10)")
        else:
            buf.append(ch)
    if buf:
        out.append("'" + "".join(buf).replace("'", "''") + "'")
    return " || ".join(out) if out else "''"


# --- training-shard export --------------------------------------------------

def assign_shards(
    df: DataFrame,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards:
    ``shard = hash(id) % n`` (an id-keyed hash, so placement is stable
    across runs and independent of input partitioning - unlike
    ``repartition``'s round-robin) and ``pos`` = the row's rank within its
    shard ordered by the same hash (then id) - a per-shard pseudorandom
    read order, which is exactly what sequential training-data readers
    need. One key shuffle; that shuffle IS the product."""
    h = md5_hash32_seeded(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy(shard_col).orderBy(F.col("__h"), F.col(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn(shard_col, F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
        .withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("__h")
    )


def assign_shards_sql(
    n_shards: int, id_expr: str = "doc_id", seed: int = 0
) -> dict[str, str]:
    h = md5_hash32_seeded_sql(f"CAST({id_expr} AS VARCHAR)", seed)
    shard = f"CAST({h} % {n_shards} AS INTEGER)"
    return {
        "shard": shard,
        "pos": (
            f"CAST(ROW_NUMBER() OVER (PARTITION BY {shard} "
            f"ORDER BY {h}, {id_expr}) AS BIGINT)"
        ),
    }


def write_training_shards(
    df: DataFrame, path: str, n_shards: int = 1024, id_col: str = "doc_id"
) -> None:
    """Materialize :func:`assign_shards` as a shard-partitioned parquet
    layout (one directory per shard, rows sorted by ``pos`` within each
    file) - the read layout for a sequential training loader."""
    out = assign_shards(df, n_shards=n_shards, id_col=id_col)
    (
        out.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


# --- n-gram LM perplexity scoring (CCNet-style quality filter) -------------

def lm_perplexity_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document negative log-likelihood under an add-one-smoothed
    word n-gram LM trained on the corpus itself (the CCNet recipe scores
    against a reference-domain LM; self-training is the hermetic variant -
    swap the count tables to change the reference domain). Returns
    ``(id, n_ngrams, avg_neg_log_prob)`` - high scores mark documents the
    corpus model finds surprising (gibberish, boilerplate, wrong language);
    low scores mark degenerate repetition. Documents with fewer than ``n``
    words yield no n-grams and are omitted.

    ``p(w | ctx) = (C_n(ctx w) + 1) / (C_{n-1}(ctx) + V)``.

    Shuffle profile: two count aggregations (partial map-side), then the
    doc-gram stream joins the count tables on the gram string - plain
    hash-partitioned equi-joins that AQE sizes; the per-doc mean is one
    final partial-summed aggregate. Stopword-heavy grams skew the join key
    distribution - plans.layout.salted_join handles the heavy hitters.
    """
    grams = df.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    ).withColumn("ctx", F.regexp_replace("gram", r" [^ ]+$", ""))
    # grams feeds BOTH the n-gram counts and the scoring join — checkpoint
    # so the corpus-scale explode runs once (same multi-consumer shape
    # tfidf_topk checkpoints against)
    grams = grams.localCheckpoint()
    cn = grams.groupBy("gram").agg(F.count("*").alias("c_n"))
    ctxs = df.select(
        F.explode(word_ngrams(text_col, n - 1)).alias("ctx")
    ).groupBy("ctx").agg(F.count("*").alias("c_ctx"))
    # vocabulary size rides the plan as a broadcast 1-row aggregate: an
    # eager .collect() here would run a separate driver-blocking corpus
    # scan before the real job even starts
    v_agg = (
        df.select(F.explode(_tokens(text_col)).alias("w"))
        .agg(F.countDistinct("w").alias("__v"))
    )
    scored = (
        grams.join(cn, "gram")
        .join(ctxs, "ctx")
        .crossJoin(F.broadcast(v_agg))
        .select(
            id_col,
            (
                -F.log(
                    (F.col("c_n") + 1) / (F.col("c_ctx") + F.col("__v"))
                )
            ).alias("nlp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_ngrams"),
        F.round(F.avg("nlp"), 6).alias("avg_neg_log_prob"),
    )


# --- stratified (equalizing) sampling ---------------------------------------

def stratified_sample(
    df: DataFrame,
    target_per_group: int | None = None,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Stratified downsampling with rates DERIVED FROM THE DATA: each group
    is hash-gated at ``rate_g = min(1, target / count_g)`` where ``target``
    defaults to the smallest group's size — the equalize-sources step of a
    mixture pipeline when no external weights are given (contrast
    :func:`weighted_sample`, which takes the rates as input).

    Membership stays a pure function of the row id (same md5 gate), so the
    sample is reproducible across runs and partitionings. Cost: one
    map-side-combinable count per group (tiny result), broadcast back —
    the corpus itself never shuffles."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("__cnt"))
    if target_per_group is None:
        tgt = counts.agg(F.min("__cnt").alias("__tgt"))
    else:
        tgt = df.sparkSession.range(1).select(
            F.lit(int(target_per_group)).alias("__tgt")
        )
    rate = F.least(F.lit(1.0), F.col("__tgt") / F.col("__cnt"))
    u = md5_hash32_seeded(F.col(id_col).cast("string"), seed) / F.lit(_HASH_SPACE)
    return (
        df.join(F.broadcast(counts), group_col)
        .crossJoin(F.broadcast(tgt))
        .filter(u < rate)
        .drop("__cnt", "__tgt")
    )


def stratified_sample_sql(
    table: str,
    target_per_group: int | None = None,
    group_expr: str = "source",
    id_expr: str = "doc_id",
    seed: int = 0,
) -> str:
    """DuckDB fragment (FROM-clause subquery) matching
    :func:`stratified_sample` row-for-row."""
    tgt = (
        "(SELECT MIN(cnt) FROM counts)"
        if target_per_group is None
        else str(int(target_per_group))
    )
    h = md5_hash32_seeded_sql(f"CAST(t.{id_expr} AS VARCHAR)", seed)
    return f"""
    WITH counts AS (
      SELECT {group_expr} AS g, COUNT(*) AS cnt FROM {table} GROUP BY 1
    )
    SELECT t.* FROM {table} t JOIN counts c ON t.{group_expr} = c.g
    WHERE ({h} / {_HASH_SPACE}) < least(1.0, CAST({tgt} AS DOUBLE) / c.cnt)
    """


# --- temperature-scaled mixture weighting -----------------------------------

def temperature_mixture(
    df: DataFrame,
    group_col: str = "source",
    target_docs: int = 1000,
    micro: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled source weights — the multilingual-LM sampling rule
    (mT5 / XLM-R style): sample group ``g`` proportionally to
    ``n_g ** alpha`` with ``alpha`` fixed at 0.5, i.e. ``sqrt``, because
    IEEE-754 requires ``sqrt`` to be correctly rounded (``pow`` is not), so
    Spark and the DuckDB oracle compute bit-identical weights. Everything
    downstream is integer arithmetic:

    - ``weight_micro = floor(sqrt(n_g) * micro)``
    - ``share_ppm   = (weight_micro * 1e6) div total_micro``
    - ``rate_ppm    = min(1e6, (target_docs * share_ppm) div n_g)``

    so the result is exactly reproducible cross-engine (no float summation
    order anywhere — the one float op, ``sqrt(count) * micro``, has a single
    deterministic rounding on both engines).

    Cost: one map-side-combinable count per group (|groups| rows), then a
    global window over that tiny table — the corpus itself never shuffles.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    counts = counts.withColumn(
        "weight_micro", F.floor(F.sqrt(F.col("n_docs")) * micro).cast("long")
    )
    total = Window.partitionBy()
    return (
        counts.withColumn("__total", F.sum("weight_micro").over(total))
        .withColumn("share_ppm", F.expr("weight_micro * 1000000L div __total"))
        .withColumn(
            "rate_ppm",
            F.expr(
                f"least(1000000L, ({int(target_docs)}L * share_ppm) div n_docs)"
            ),
        )
        .drop("__total")
    )


def temperature_mixture_sql(
    table: str,
    group_expr: str = "source",
    target_docs: int = 1000,
    micro: int = 1_000_000,
) -> str:
    """DuckDB query matching :func:`temperature_mixture` bit-for-bit."""
    return f"""
    WITH counts AS (
      SELECT {group_expr} AS grp, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM {table} GROUP BY 1
    ), w AS (
      SELECT grp, n_docs,
             CAST(FLOOR(SQRT(n_docs) * {micro}) AS BIGINT) AS weight_micro
      FROM counts
    ), s AS (
      SELECT grp, n_docs, weight_micro,
             (weight_micro * 1000000)
               // CAST(SUM(weight_micro) OVER () AS BIGINT) AS share_ppm
      FROM w
    )
    SELECT grp AS {group_expr}, n_docs, weight_micro, share_ppm,
           least(1000000, ({int(target_docs)} * share_ppm) // n_docs)
             AS rate_ppm
    FROM s
    """


def temperature_sample(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    target_docs: int = 1000,
    seed: int = 0,
) -> DataFrame:
    """Apply :func:`temperature_mixture` rates *in-plan*: the |groups|-row
    rates table broadcasts back onto the corpus and each row is hash-gated
    at its group's rate — no driver-side collect of the rates (contrast
    :func:`weighted_sample`, which takes externally supplied rates). The
    sample is a pure function of ``(id, seed)``: stable across runs,
    partitionings, and corpus growth within a group."""
    rates = temperature_mixture(df, group_col, target_docs).select(
        group_col, "rate_ppm"
    )
    u = md5_hash32_seeded(F.col(id_col).cast("string"), seed) / F.lit(_HASH_SPACE)
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(u < F.col("rate_ppm") / F.lit(1e6))
        .drop("rate_ppm")
    )


def temperature_sample_sql(
    table: str,
    group_expr: str = "source",
    id_expr: str = "doc_id",
    target_docs: int = 1000,
    seed: int = 0,
) -> str:
    """DuckDB FROM-clause subquery matching :func:`temperature_sample`
    row-for-row (same integer rates, same md5 gate)."""
    rates = temperature_mixture_sql(table, group_expr, target_docs)
    h = md5_hash32_seeded_sql(f"CAST(t.{id_expr} AS VARCHAR)", seed)
    return f"""
    WITH rates AS ({rates})
    SELECT t.* FROM {table} t
    JOIN rates r ON t.{group_expr} = r.{group_expr}
    WHERE ({h} / {_HASH_SPACE}) < (r.rate_ppm / 1e6)
    """


# --- cross-source vocabulary overlap ----------------------------------------

def source_vocab_overlap(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the diversity /
    redundancy diagnostic a mixture designer reads before setting weights
    (two sources with near-identical vocabularies add less diversity than
    their combined size suggests). Returns one row per unordered source
    pair: ``(g1, g2, inter, n1, n2, jaccard_ppm)`` with
    ``jaccard_ppm = (|A∩B| * 1e6) div |A∪B|`` — integer, oracle-exact.

    Scale shape: the self-join runs on the *distinct (group, word)* table,
    which is vocabulary-sized (Zipf-bounded), never corpus-sized; the join
    key is the word, and each word fans out to at most |groups|² pairs, so
    the shuffle is O(vocab × G²) with G ~ tens. The corpus itself is
    touched once (explode → distinct with map-side partial aggregation)."""
    vocab = (
        df.select(
            F.col(group_col).alias("g"), F.explode(_tokens(text_col)).alias("w")
        )
        .distinct()
    )
    sizes = vocab.groupBy("g").agg(F.count("*").alias("n"))
    pairs = (
        vocab.alias("a")
        .join(vocab.alias("b"), "w")
        .filter(F.col("a.g") < F.col("b.g"))
        .groupBy(F.col("a.g").alias("g1"), F.col("b.g").alias("g2"))
        .agg(F.count("*").cast("long").alias("inter"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("g").alias("g1"), F.col("n").alias("n1"))),
            "g1",
        )
        .join(
            F.broadcast(sizes.select(F.col("g").alias("g2"), F.col("n").alias("n2"))),
            "g2",
        )
        .withColumn(
            "jaccard_ppm", F.expr("inter * 1000000L div (n1 + n2 - inter)")
        )
        .select("g1", "g2", "inter", "n1", "n2", "jaccard_ppm")
    )


def source_vocab_overlap_sql(
    table: str, text_expr: str = "text", group_expr: str = "source"
) -> str:
    """DuckDB query matching :func:`source_vocab_overlap`."""
    return f"""
    WITH vocab AS (
      SELECT DISTINCT {group_expr} AS g, w
      FROM {table}, unnest({_TOKENS_SQL.format(e=text_expr)}) AS t(w)
    ), sizes AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM vocab GROUP BY 1
    ), pairs AS (
      SELECT a.g AS g1, b.g AS g2, CAST(COUNT(*) AS BIGINT) AS inter
      FROM vocab a JOIN vocab b ON a.w = b.w AND a.g < b.g
      GROUP BY 1, 2
    )
    SELECT p.g1, p.g2, p.inter, s1.n AS n1, s2.n AS n2,
           (p.inter * 1000000) // (s1.n + s2.n - p.inter) AS jaccard_ppm
    FROM pairs p
    JOIN sizes s1 ON p.g1 = s1.g
    JOIN sizes s2 ON p.g2 = s2.g
    """


# --- token-budgeted quality fill ---------------------------------------------

def token_budget_fill(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    group_col: str = "source",
    order_by: list[Column] | None = None,
    keep_col: str = "cum_before",
) -> DataFrame:
    """Fill a per-group token budget best-first: lay the group's documents
    out in quality order (``order_by``, best first — pass a deterministic
    total order) and keep each document whose cumulative token count
    *before* it is still under ``budget`` — the quality-quota step of a
    mixture pipeline ("take the best N tokens per source", DoReMi/quality-
    filter style), as one hash-partitioned window per group. The boundary
    document that straddles the budget is kept (start-based rule, same
    convention as :func:`pack_sequences`), so each group overshoots by at
    most one document. Also emits ``keep_col``: the tokens consumed before
    this document within its group."""
    if order_by is None:
        order_by = [F.col(token_col).desc()]
    # explicit ROWS frame (see pack_sequences): the default RANGE frame
    # sums ordering-key peers together, so ties would each see their whole
    # peer group in cum_before and be wrongly dropped
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.coalesce(
        F.sum(F.col(token_col)).over(w) - F.col(token_col), F.lit(0)
    ).cast("long")
    return (
        df.withColumn(keep_col, before)
        .filter(F.col(keep_col) < budget)
    )


def token_budget_fill_sql(
    table: str,
    budget: int,
    token_expr: str = "n_tokens",
    group_expr: str = "source",
    order_sql: str = "n_tokens DESC",
) -> str:
    """DuckDB FROM-clause subquery matching :func:`token_budget_fill`."""
    return f"""
    SELECT * FROM (
      SELECT *,
             CAST(COALESCE(SUM({token_expr}) OVER (
               PARTITION BY {group_expr} ORDER BY {order_sql}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - {token_expr}, 0) AS BIGINT) AS cum_before
      FROM {table}
    ) WHERE cum_before < {budget}
    """


# --- training-order interleave manifest --------------------------------------

def interleave_order(
    df: DataFrame,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Global training-order manifest over :func:`assign_shards`: a
    round-robin interleave of the shards (``global_pos = (pos-1)*n_shards
    + shard``) so a sequential reader visiting positions 0,1,2,… cycles
    through shards — every window of the training stream mixes all shards,
    the property data-ordering studies want from a "well-shuffled" corpus,
    without ever materializing a global sort (the order is a pure
    expression off the per-shard rank)."""
    sharded = assign_shards(df, n_shards=n_shards, id_col=id_col, seed=seed)
    return sharded.withColumn(
        "global_pos",
        ((F.col("pos") - 1) * n_shards + F.col("shard")).cast("long"),
    )


def interleave_order_sql(
    n_shards: int, id_expr: str = "doc_id", seed: int = 0
) -> dict[str, str]:
    """DuckDB expressions matching :func:`interleave_order` (compose with
    :func:`assign_shards_sql`'s shard/pos)."""
    exprs = assign_shards_sql(n_shards, id_expr, seed)
    exprs["global_pos"] = (
        f"CAST((({exprs['pos']}) - 1) * {n_shards} + ({exprs['shard']}) AS BIGINT)"
    )
    return exprs


# --- exact-k weighted sampling (Efraimidis–Spirakis) --------------------------

def weighted_reservoir_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    group_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Exact-k sampling with probability proportional to ``weight_col``
    (A-ES / Efraimidis–Spirakis): each row gets key ``u^(1/w)`` with ``u``
    a deterministic uniform from the id hash, and the k largest keys win.
    Computed as ``ln(u)/w`` (monotone in u^(1/w) for the top-k order, no
    overflow for tiny u). Membership is a pure function of (id, seed) —
    reproducible across runs and partitionings, unlike ``df.sample``.

    Per ``group_col``: one hash-partitioned window per group. Global:
    ``orderBy().limit(k)`` — a TakeOrdered per-partition heap + k-row
    driver merge, never a full sort.

    Cross-engine note: the key involves ``ln`` (≤1 ulp libm error, not
    IEEE-mandated exact), so the oracle can disagree only if two keys sit
    within ~1e-15 of each other AND straddle rank k — negligible, and the
    id tiebreak fixes exact ties.

    Rows with ``weight_col <= 0`` are excluded up front (P∝w means they
    have zero selection mass; without the filter w=0 yields ±Inf/NaN keys
    that Spark and DuckDB order differently, and negative weights would
    silently invert the ranking)."""
    df = df.filter(F.col(weight_col) > 0)
    u = (
        md5_hash32_seeded(F.col(id_col).cast("string"), seed) + 1
    ) / F.lit(_HASH_SPACE)
    key = F.log(u) / F.col(weight_col)
    if group_col is None:
        return df.orderBy(F.desc(key), F.asc(id_col)).limit(k)
    w = Window.partitionBy(group_col).orderBy(F.desc(key), F.asc(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_reservoir_sample_sql(
    table: str,
    k: int,
    weight_expr: str,
    id_expr: str = "doc_id",
    group_expr: str | None = None,
    seed: int = 0,
) -> str:
    """DuckDB FROM-clause subquery matching :func:`weighted_reservoir_sample`."""
    h = md5_hash32_seeded_sql(f"CAST({id_expr} AS VARCHAR)", seed)
    key = f"(ln(({h} + 1) / {_HASH_SPACE}) / {weight_expr})"
    guarded = f"(SELECT * FROM {table} WHERE {weight_expr} > 0)"
    if group_expr is None:
        return (
            f"SELECT * FROM {guarded} "
            f"ORDER BY {key} DESC, {id_expr} ASC LIMIT {k}"
        )
    return f"""
    SELECT * EXCLUDE (__rn) FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {group_expr} ORDER BY {key} DESC, {id_expr} ASC
      ) AS __rn
      FROM {guarded}
    ) WHERE __rn <= {k}
    """
