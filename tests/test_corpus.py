"""Unit tests for training-corpus management operators (operators/corpus.py):
properties the oracle compare can't see - split stability under reordering,
planted-PII redaction, planted contamination, sketch error bounds, quotas."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectordb_data_ingestion_spark.operators import corpus as cp


def _ids(rows, col="doc_id"):
    return sorted(r[col] for r in rows)


# --- deterministic split ---------------------------------------------------

def test_split_stable_under_partitioning_and_order(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = cp.deterministic_split(df).select("doc_id", "split").collect()
    shuffled = df.orderBy(F.desc("doc_id")).repartition(7)
    b = cp.deterministic_split(shuffled).select("doc_id", "split").collect()
    assert {r["doc_id"]: r["split"] for r in a} == {
        r["doc_id"]: r["split"] for r in b
    }


def test_split_growth_never_moves_existing_rows(spark):
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    grown = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"]
         for r in cp.deterministic_split(small).collect()}
    b = {r["doc_id"]: r["split"]
         for r in cp.deterministic_split(grown).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_split_weights_approximately_honored(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    counts = {
        r["split"]: r["n"]
        for r in cp.deterministic_split(df)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert 0.88 <= counts["train"] / 10_000 <= 0.92
    assert 0.035 <= counts["val"] / 10_000 <= 0.065
    assert 0.035 <= counts["test"] / 10_000 <= 0.065


# --- PII scrub -------------------------------------------------------------

def test_pii_scrub_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io now"),
            (2, "server 192.168.0.1 then call +1-555-0123"),
            (3, "digits 123 stay, 1.2 stays, version 1.2.3.4 is an ip"),
            (4, "clean text only"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in cp.pii_scrub(df).collect()}
    assert rows[1]["text"] == "mail [EMAIL] now"
    assert rows[1]["n_email"] == 1 and rows[1]["n_phone"] == 0
    assert rows[2]["text"] == "server [IP] then call [PHONE]"
    assert rows[2]["n_ip"] == 1 and rows[2]["n_phone"] == 1
    assert rows[3]["text"] == "digits 123 stay, 1.2 stays, version [IP] is an ip"
    assert rows[4]["text"] == "clean text only"
    assert rows[4]["n_email"] == rows[4]["n_ip"] == rows[4]["n_phone"] == 0


# --- decontamination -------------------------------------------------------

def test_decontaminate_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words entirely here now"),
            (3, "prefix quick brown fox suffix tail words"),
        ],
        ["doc_id", "text"],
    )
    benchmark = spark.createDataFrame(
        [("quick brown fox appears in this benchmark",)], ["text"]
    )
    out = cp.decontaminate(corpus, benchmark, gram_n=3)
    flags = {r["doc_id"]: r["contaminated"] for r in out.collect()}
    assert flags == {1: True, 2: False, 3: True}


def test_decontaminate_no_false_positives_on_short_docs(spark):
    corpus = spark.createDataFrame([(1, "too short")], ["doc_id", "text"])
    benchmark = spark.createDataFrame([("too short",)], ["text"])
    # both sides shorter than gram_n -> no grams -> nothing flagged
    out = cp.decontaminate(corpus, benchmark, gram_n=3)
    assert [r["contaminated"] for r in out.collect()] == [False]


# --- KMV sketch ------------------------------------------------------------

def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [(f"w{i}",) for i in range(40)], ["word"]
    )
    row = cp.kmv_distinct(df, "word", k=64).collect()[0]
    assert row["k_used"] == 40
    assert row["est_distinct"] == 40.0


def test_kmv_estimate_within_tolerance(spark):
    n = 5000
    df = spark.range(0, n * 3).select(
        (F.col("id") % n).cast("string").alias("word")
    )
    row = cp.kmv_distinct(df, "word", k=256).collect()[0]
    assert row["k_used"] == 256
    # KMV relative error ~ 1/sqrt(k) ~ 6%; allow 3 sigma
    assert abs(row["est_distinct"] - n) / n < 0.2


# --- per-group quota -------------------------------------------------------

def test_cap_per_group_quota_and_preference(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 10 else "b", float(i)) for i in range(14)],
        ["doc_id", "grp", "score"],
    )
    out = cp.cap_per_group(
        df, "grp", order_by=[F.desc("score"), F.asc("doc_id")], n=3
    )
    by_grp = {}
    for r in out.collect():
        by_grp.setdefault(r["grp"], []).append(r["doc_id"])
    assert sorted(by_grp["a"]) == [7, 8, 9]  # top-3 scores in group a
    assert sorted(by_grp["b"]) == [11, 12, 13]


# --- n-gram multiplicity ---------------------------------------------------

def test_ngram_counts_keep_multiplicity(spark):
    df = spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"])
    out = {
        r["ngram"]: r["n_occurrences"]
        for r in cp.ngram_counts(df, n=2).collect()
    }
    assert out == {"a b": 3, "b a": 2}


def test_vocabulary_min_count_filter(spark):
    df = spark.createDataFrame(
        [(1, "x x y"), (2, "x z")], ["doc_id", "text"]
    )
    out = {r["word"]: r["n_occurrences"]
           for r in cp.vocabulary(df, min_count=2).collect()}
    assert out == {"x": 3}
