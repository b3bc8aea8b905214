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


def test_kmv_null_values_excluded(spark):
    # regression (ADVICE r5): md5_hash32(NULL) reached the Arrow prefilter
    # as NaN and, on a sub-k partition, was unsafely cast back to long as
    # INT64_MIN — a phantom global-minimum hash. NULLs must not count.
    df = spark.createDataFrame(
        [("w0",), (None,), ("w1",), (None,), ("w2",)],
        "word string",
    )
    row = cp.kmv_distinct(df, "word", k=64).collect()[0]
    assert row["k_used"] == 3
    assert row["est_distinct"] == 3.0
    assert row["kth_min_hash"] > 0  # INT64_MIN would be negative


def test_kmv_all_null_input(spark):
    df = spark.createDataFrame([(None,), (None,)], "word string")
    row = cp.kmv_distinct(df, "word", k=64).collect()[0]
    assert row["k_used"] == 0


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


# --- sequence packing ------------------------------------------------------

def test_pack_sequences_contiguous_and_bounded(spark):
    # per-group pack: chunks fill each sequence in order; a sequence's sum
    # can exceed budget only by the overhang of its last (straddling) chunk
    rows = [(i, "g", 10 + (i * 7) % 25) for i in range(200)]
    df = spark.createDataFrame(rows, ["chunk_id", "grp", "n_tokens"])
    out = cp.pack_sequences(
        df, token_col="n_tokens", budget=100, group_col="grp",
        order_by=[F.asc("chunk_id")],
    ).collect()
    by_seq: dict[int, list] = {}
    for r in sorted(out, key=lambda r: r["chunk_id"]):
        by_seq.setdefault(r["seq_id"], []).append(r)
    seq_ids = sorted(by_seq)
    assert seq_ids == list(range(len(seq_ids)))  # dense, contiguous
    for sid in seq_ids:
        chunks = by_seq[sid]
        total = sum(r["n_tokens"] for r in chunks)
        # all but the last chunk start strictly inside the budget
        assert all(r["seq_offset"] < 100 for r in chunks)
        # overhang bound: sum < budget + last chunk's tokens
        assert total < 100 + chunks[-1]["n_tokens"]
    # offsets are the exclusive running sum within the sequence
    first = by_seq[0]
    assert first[0]["seq_offset"] == 0


def test_pack_sequences_independent_per_group(spark):
    df = spark.createDataFrame(
        [(1, "a", 60), (2, "a", 60), (3, "b", 60)],
        ["chunk_id", "grp", "n_tokens"],
    )
    out = {
        r["chunk_id"]: (r["seq_id"], r["seq_offset"])
        for r in cp.pack_sequences(
            df, token_col="n_tokens", budget=100, group_col="grp",
            order_by=[F.asc("chunk_id")],
        ).collect()
    }
    assert out[1] == (0, 0)
    assert out[2] == (0, 60)  # starts at offset 60, straddles into seq 1
    assert out[3] == (0, 0)   # group b packs from scratch


# --- weighted source mixing ------------------------------------------------

def test_weighted_sample_deterministic_and_rate_accurate(spark):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "heavy").otherwise("light").alias("source"),
    )
    rates = {"heavy": 0.8, "light": 0.1}
    a = _ids(cp.weighted_sample(df, rates).collect())
    b = _ids(cp.weighted_sample(df.repartition(13).orderBy(F.desc("doc_id")),
                                rates).collect())
    assert a == b  # membership is a pure function of the id
    kept = cp.weighted_sample(df, rates).groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in kept}
    assert 0.76 <= by_src["heavy"] / 5000 <= 0.84
    assert 0.07 <= by_src["light"] / 5000 <= 0.13


def test_weighted_sample_unknown_source_uses_default(spark):
    df = spark.createDataFrame(
        [(1, "known"), (2, "mystery")], ["doc_id", "source"]
    )
    kept = cp.weighted_sample(df, {"known": 1.0}, default_rate=0.0).collect()
    assert _ids(kept) == [1]
    all_kept = cp.weighted_sample(df, {"known": 1.0}, default_rate=1.0).collect()
    assert _ids(all_kept) == [1, 2]


# --- intra-document paragraph dedup ----------------------------------------

def test_dedup_paragraphs_keeps_first_occurrence_in_order(spark):
    df = spark.createDataFrame(
        [(1, "nav\nbody one\nnav\nbody two\nnav"), (2, "a\nb\nc")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in cp.dedup_paragraphs(df).collect()}
    assert rows[1]["text"] == "nav\nbody one\nbody two"
    assert rows[1]["n_paragraphs"] == 5
    assert rows[1]["n_dropped"] == 2
    assert rows[1]["dup_ratio"] == 0.4
    assert rows[2]["text"] == "a\nb\nc"
    assert rows[2]["n_dropped"] == 0


def test_dedup_paragraphs_single_paragraph_untouched(spark):
    df = spark.createDataFrame([(1, "only one paragraph")], ["doc_id", "text"])
    row = cp.dedup_paragraphs(df).collect()[0]
    assert row["text"] == "only one paragraph"
    assert row["dup_ratio"] == 0.0


# --- shard assignment ------------------------------------------------------

def test_assign_shards_partition_of_corpus_and_dense_positions(spark):
    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    out = cp.assign_shards(df, n_shards=8).collect()
    assert len(out) == 3000  # every row lands in exactly one shard
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # roughly balanced (hash-uniform): no shard more than 2x the mean
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) < 2 * (3000 / 8)


def test_assign_shards_stable_under_partitioning(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in cp.assign_shards(df, n_shards=4).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in cp.assign_shards(
             df.repartition(11).orderBy(F.desc("doc_id")), n_shards=4
         ).collect()}
    assert a == b


def test_write_training_shards_layout(spark, tmp_path):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "shards")
    cp.write_training_shards(df, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert {r["shard"] for r in back.select("shard").distinct().collect()} == {
        0, 1, 2, 3
    }
    # within a shard file, rows are sorted by pos (sequential-reader layout)
    one = spark.read.parquet(f"{path}/shard=0").select("pos").collect()
    positions = [r["pos"] for r in one]
    assert positions == sorted(positions)


def test_repetition_signals_golden(spark):
    """Hand-computed Gopher repetition metrics on crafted docs."""
    from vectordb_data_ingestion_spark.operators.textanalysis import (
        repetition_signals,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x x x x")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    r1 = out[1]
    assert r1["n_words"] == 5
    assert r1["dup_word_fraction"] == 0.4          # 1 - 3/5
    assert r1["top_bigram_char_fraction"] == round(6 / 9, 6)   # "a b" x2, len 3
    assert r1["dup_trigram_char_fraction"] == 0.0
    r2 = out[2]
    assert r2["n_words"] == 4
    assert r2["dup_word_fraction"] == 0.75
    assert r2["top_bigram_char_fraction"] == round(9 / 7, 6)   # "x x" x3
    assert r2["dup_trigram_char_fraction"] == round(10 / 7, 6) # "x x x" x2


def test_repetition_signals_most_frequent_not_highest_coverage(spark):
    """Review r6: the Gopher rule (Rae et al. A1.1) scores the MOST
    FREQUENTLY occurring bigram's character share; the old max(cnt*len)
    picked the highest-COVERAGE bigram instead, over-weighting long rare
    bigrams — both engines agreed, so the driver gate couldn't see it."""
    from vectordb_data_ingestion_spark.operators.textanalysis import (
        repetition_signals,
    )

    # "x y" x3 (cnt 3, 9 chars) vs "w1long w2long" x2 (cnt 2, 26 chars)
    text = "x y x y x y w1long w2long q w1long w2long"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = repetition_signals(docs).collect()[0]
    assert row["top_bigram_char_fraction"] == round(9 / len(text), 6)


def test_repetition_signals_sub_n_docs(spark):
    """Review r5: a doc with fewer than n words has NO n-grams — the old
    gram builder emitted one degenerate sub-n gram, scoring every 1-word
    doc top_bigram_char_fraction 1.0 (a Gopher-style gate would drop all
    short documents as maximally repetitive). Tiny docs keep their output
    row with zero repetition fractions."""
    from vectordb_data_ingestion_spark.operators.textanalysis import (
        repetition_signals,
    )

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "two words"), (3, "a b a b c")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert set(out) == {1, 2, 3}  # sub-n docs keep their row
    assert out[1]["top_bigram_char_fraction"] == 0.0
    assert out[1]["dup_trigram_char_fraction"] == 0.0
    # a 2-word doc HAS one bigram but no trigrams
    assert out[2]["top_bigram_char_fraction"] == round(9 / 9, 6)
    assert out[2]["dup_trigram_char_fraction"] == 0.0


def test_lm_perplexity_score_vs_reference(spark):
    """Add-one trigram NLL vs a direct Counter-based reference."""
    import math
    from collections import Counter

    from vectordb_data_ingestion_spark.operators.corpus import (
        lm_perplexity_score,
    )

    texts = {
        1: "a b c a b c a b",
        2: "a a a a a",
        3: "c b a c b a",
        4: "x y",  # < 3 words -> omitted
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in lm_perplexity_score(docs).collect()}

    def grams(t, n):
        w = t.split()
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    c3 = Counter(g for t in texts.values() for g in grams(t, 3))
    c2 = Counter(g for t in texts.values() for g in grams(t, 2))
    v = len({w for t in texts.values() for w in t.split()})
    for doc_id, t in texts.items():
        tri = grams(t, 3)
        if not tri:
            assert doc_id not in out
            continue
        nll = [
            -math.log((c3[g] + 1) / (c2[g.rsplit(" ", 1)[0]] + v))
            for g in tri
        ]
        assert out[doc_id]["n_ngrams"] == len(tri)
        assert out[doc_id]["avg_neg_log_prob"] == round(sum(nll) / len(nll), 6)
    # degenerate repetition scores LOWER (more predictable) than varied text
    assert (
        out[2]["avg_neg_log_prob"] < out[1]["avg_neg_log_prob"]
    )


def test_stratified_sample_equalizes_and_is_deterministic(spark):
    from vectordb_data_ingestion_spark.operators.corpus import stratified_sample

    rows = [(i, "big" if i < 400 else "small", f"t{i}") for i in range(440)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    kept = stratified_sample(df, group_col="source", id_col="doc_id")
    counts = {r["source"]: r["n"] for r in kept.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    # small group (40 rows) keeps everything; big is gated near 40/400 = 10%
    assert counts["small"] == 40
    assert 20 <= counts["big"] <= 70
    # membership is a pure function of doc_id: identical on rerun
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(7), group_col="source", id_col="doc_id"
        ).collect()
    )
    assert ids1 == ids2


def test_stratified_sample_explicit_target(spark):
    from vectordb_data_ingestion_spark.operators.corpus import stratified_sample

    rows = [(i, "a" if i % 2 else "b", "x") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    kept = stratified_sample(
        df, target_per_group=10, group_col="source", id_col="doc_id"
    )
    counts = {r["source"]: r["n"] for r in kept.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    # hash gate at rate 0.1 of 100 rows per group: binomial around 10
    assert all(2 <= c <= 25 for c in counts.values())


def test_duplicate_window_stats_detects_shared_spans(spark):
    from vectordb_data_ingestion_spark.operators.dedup import (
        duplicate_window_stats,
    )

    shared = "one two three four five six seven eight"  # exactly 8 words
    docs = spark.createDataFrame(
        [
            (1, shared + " tail a b c"),
            (2, "prefix x y z " + shared),
            (3, "totally different words with no overlap at all here"),
            (4, "short doc"),  # < 8 words -> 0 windows
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in duplicate_window_stats(docs, window_words=8).collect()
    }
    # the shared 8-word span appears in docs 1 and 2 -> >=1 dup window each
    assert got[1][1] >= 1 and got[2][1] >= 1
    assert got[3] == (got[3][0], 0) and got[3][0] > 0
    assert got[4] == (0, 0)


def test_duplicate_window_stats_within_doc_repetition(spark):
    from vectordb_data_ingestion_spark.operators.dedup import (
        duplicate_window_stats,
    )

    span = "a b c d"
    docs = spark.createDataFrame(
        [(1, f"{span} zz {span} yy")], ["doc_id", "text"]
    )
    [r] = duplicate_window_stats(docs, window_words=4).collect()
    # the 4-word span recurs inside one document -> counted twice
    assert r["n_dup_windows"] >= 2
    assert 0 < r["dup_ratio"] <= 1.0


def test_gopher_document_filter_rules(spark):
    """Each Gopher rule must independently trip the keep verdict: too-short
    docs, absurd mean word length, symbol-heavy docs, and stopword-free
    docs all drop; a normal English paragraph keeps."""
    from vectordb_data_ingestion_spark.operators.textanalysis import (
        gopher_document_filter,
    )

    good = "the quick brown fox jumps over the lazy dog and runs away " * 6
    docs = spark.createDataFrame(
        [
            (0, good),  # keeps: 60+ words, sane lengths, stopwords present
            (1, "short text only"),  # too few words
            (2, ("a " * 60).strip()),  # mean word len 1 < 3
            (3, ("the supercalifragilisticexpialidocious " * 30).strip()),  # mean len > 10
            (4, ("word ... " * 60).strip()),  # symbol ratio 0.5 > 0.1
            (5, ("zzz qqq xxx " * 25).strip()),  # no stopword hits
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_document_filter(docs).collect()
    }
    assert out[0]["keep"] == 1
    assert out[1]["keep"] == 0 and out[1]["n_words"] == 3
    assert out[2]["keep"] == 0 and out[2]["mean_word_len"] < 3
    assert out[3]["keep"] == 0 and out[3]["mean_word_len"] > 10
    assert out[4]["keep"] == 0 and out[4]["symbol_word_ratio"] > 0.1
    assert out[5]["keep"] == 0 and out[5]["stop_hits"] < 2


def test_remove_duplicate_spans_semantics(spark):
    """First occurrence survives, later cross-doc and intra-doc repeats of
    a window are cut, spans merge when overlapping, and sub-window docs
    pass through untouched."""
    from vectordb_data_ingestion_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = spark.createDataFrame(
        [
            (0, f"intro words {shared} outro words"),
            (1, f"prefix {shared} suffix"),  # loses the shared run
            (2, f"{shared} {shared}"),  # intra-doc repeat: 2nd run cut
            (3, "tiny doc"),  # shorter than the window
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicate_spans(docs, window_words=8).collect()
    }
    assert out[0]["n_removed"] == 0 and shared in out[0]["clean_text"]
    assert shared not in out[1]["clean_text"]
    assert out[1]["clean_text"].startswith("prefix")
    assert out[1]["clean_text"].endswith("suffix")
    assert out[1]["n_removed"] == 8
    # doc2: first 8-word run is a later occurrence of doc0's windows -> both
    # runs cut entirely
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 16
    assert out[3]["clean_text"] == "tiny doc" and out[3]["n_removed"] == 0


def test_remove_duplicate_spans_string_and_huge_ids(spark):
    """Review r5: the occurrence total-order used numeric packing
    (id*1e9+pos), which silently no-ops for STRING doc ids (cast ->
    NULL -> no window ever marked) and wraps negative for ids >= ~9.2e9.
    Struct ordering must cut the later occurrence for both id types."""
    from vectordb_data_ingestion_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    sdocs = spark.createDataFrame(
        [("chunk-a", f"x {shared} y"), ("chunk-b", f"p {shared} q")],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicate_spans(sdocs, window_words=8).collect()
    }
    assert out["chunk-a"]["n_removed"] == 0
    assert shared in out["chunk-a"]["clean_text"]
    assert out["chunk-b"]["n_removed"] == 8
    assert shared not in out["chunk-b"]["clean_text"]

    big = 10_000_000_000  # id*1e9 would overflow a long
    ndocs = spark.createDataFrame(
        [(big, f"x {shared} y"), (big + 1, f"p {shared} q")],
        "doc_id long, text string",
    )
    nout = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicate_spans(ndocs, window_words=8).collect()
    }
    assert nout[big]["n_removed"] == 0
    assert nout[big + 1]["n_removed"] == 8


def test_lsh_simhash_parameter_validation(spark):
    """Review r5: degenerate banding parameters silently became a full
    O(n^2) cross join (bands > num_hashes -> every band hash is md5('');
    bits < max_hamming+1 -> every segment value is 0) or silently
    weakened the LSH (num_hashes % bands != 0 drops trailing signature
    elements). All three must refuse at plan-build time."""
    import pytest

    from vectordb_data_ingestion_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(docs, num_hashes=16, bands=20)
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(docs, num_hashes=16, bands=5)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, bits=4, max_hamming=4)


def test_new_ops_null_and_empty_inputs(spark):
    """Null text, empty text, and empty corpora must not crash the round-2
    operators, and Spark/DuckDB null semantics stay aligned (pinned here
    so a refactor can't silently diverge from the oracles)."""
    from vectordb_data_ingestion_spark.operators.bpe import (
        bpe_segment_vectorized,
    )
    from vectordb_data_ingestion_spark.operators.dedup import (
        remove_duplicate_spans,
    )
    from vectordb_data_ingestion_spark.operators.textanalysis import (
        gopher_document_filter,
    )

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "real words here")],
        "doc_id long, text string",
    )
    g = {r["doc_id"]: r.asDict() for r in gopher_document_filter(docs).collect()}
    assert g[1]["n_words"] == 0 and g[1]["keep"] == 0
    assert g[2]["n_words"] == 0 and g[2]["keep"] == 0
    assert g[0]["n_words"] is None  # null text propagates null, like SQL

    s = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicate_spans(docs, window_words=2).collect()
    }
    assert s[3]["clean_text"] == "real words here" and s[3]["n_removed"] == 0
    assert s[1]["clean_text"] == "" and s[1]["n_words"] == 0

    seg = {
        r["doc_id"]: r["bpe_tokens"] and list(r["bpe_tokens"])
        for r in bpe_segment_vectorized(docs, [("r", "e", 2)]).collect()
    }
    # NULL text -> NULL tokens (fold-form parity, r5); empty/whitespace
    # text -> empty token list
    assert seg[0] is None
    assert seg[1] == [] and seg[2] == []
    assert seg[3][0] == "re"

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert gopher_document_filter(empty).count() == 0
    assert remove_duplicate_spans(empty).count() == 0


# --- temperature mixture ----------------------------------------------------

def test_temperature_mixture_flattens_skew(spark):
    """sqrt weighting upweights small sources relative to proportional
    sampling: share ratio between a 900-doc and a 100-doc source must be
    3 (sqrt(9)), not 9; rates are capped at 1e6 ppm."""
    rows = [(i, "big" if i < 900 else "small", "x") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        r["source"]: r
        for r in cp.temperature_mixture(df, target_docs=400).collect()
    }
    assert out["big"]["n_docs"] == 900 and out["small"]["n_docs"] == 100
    ratio = out["big"]["share_ppm"] / out["small"]["share_ppm"]
    assert abs(ratio - 3.0) < 0.01
    assert all(r["rate_ppm"] <= 1_000_000 for r in out.values())
    # expected kept docs ~ target * share: small keeps a larger FRACTION
    assert out["small"]["rate_ppm"] > out["big"]["rate_ppm"]


def test_temperature_sample_subset_and_deterministic(spark):
    rows = [(i, "a" if i % 3 else "b", "x") for i in range(600)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    kept1 = _ids(cp.temperature_sample(df, target_docs=100).collect())
    kept2 = _ids(
        cp.temperature_sample(df.repartition(5), target_docs=100).collect()
    )
    assert kept1 == kept2
    assert set(kept1) <= set(range(600))
    assert 40 <= len(kept1) <= 180  # hash-gated around the 100-doc target


def test_source_vocab_overlap_bounds(spark):
    rows = [
        (0, "s1", "alpha beta gamma"),
        (1, "s2", "alpha beta gamma"),
        (2, "s3", "delta epsilon"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {(r["g1"], r["g2"]): r for r in cp.source_vocab_overlap(df).collect()}
    # identical vocabularies -> jaccard 1e6 exactly
    assert out[("s1", "s2")]["jaccard_ppm"] == 1_000_000
    # disjoint pairs appear only via the inner join when inter >= 1
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_token_budget_fill_boundary_semantics(spark):
    rows = [
        (1, "a", 40), (2, "a", 30), (3, "a", 20), (4, "a", 10),
        (5, "b", 100),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    kept = {
        r["doc_id"]: r["cum_before"]
        for r in cp.token_budget_fill(
            df, budget=75, token_col="n_chars", group_col="source",
            order_by=[F.col("n_chars").desc(), F.col("doc_id").asc()],
        ).collect()
    }
    # a: 40 (before=0) + 30 (before=40) + 20 (before=70 < 75, straddles,
    # kept) + 10 (before=90, dropped); b: single doc over budget still kept
    assert kept == {1: 0, 2: 40, 3: 70, 5: 0}


def test_weighted_reservoir_bias_and_determinism(spark):
    """Heavier rows must win more often across seeds, and membership is
    partition-invariant."""
    rows = [(i, "g", 1000 if i < 10 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "w"])
    heavy_wins = 0
    for seed in range(5):
        got = {
            r["doc_id"]
            for r in cp.weighted_reservoir_sample(
                df, k=10, weight_col="w", group_col="source", seed=seed
            ).collect()
        }
        heavy_wins += len(got & set(range(10)))
    # 10 rows carry 1000x the weight of the other 990: they dominate
    assert heavy_wins >= 35  # out of 50 slots
    a = {r["doc_id"] for r in cp.weighted_reservoir_sample(
        df, k=10, weight_col="w", group_col="source").collect()}
    b = {r["doc_id"] for r in cp.weighted_reservoir_sample(
        df.repartition(7), k=10, weight_col="w", group_col="source").collect()}
    assert a == b
    # global (no-group) path returns exactly k via TakeOrdered
    g = cp.weighted_reservoir_sample(df, k=10, weight_col="w").collect()
    assert len(g) == 10


def test_interleave_order_mixes_shards(spark):
    df = spark.range(0, 256).withColumnRenamed("id", "doc_id")
    out = cp.interleave_order(df, n_shards=8).collect()
    # global_pos is unique and the first 8 positions hit 8 distinct shards
    pos = sorted(r["global_pos"] for r in out)
    assert len(set(pos)) == len(pos)
    first = sorted(out, key=lambda r: r["global_pos"])[:8]
    assert len({r["shard"] for r in first}) == 8


def test_token_budget_fill_ties_use_rows_frame(spark):
    """Ordering-key ties must NOT pool their peers into cum_before (the
    default RANGE frame would): two 60-token docs under a 50 budget keep
    exactly the boundary doc, matching the SQL oracle's ROWS frame."""
    df = spark.createDataFrame(
        [(1, "a", 60), (2, "a", 60)], ["doc_id", "source", "n_chars"]
    )
    kept = cp.token_budget_fill(
        df, budget=50, token_col="n_chars", group_col="source"
    ).collect()
    assert len(kept) == 1 and kept[0]["cum_before"] == 0


def test_pack_sequences_ties_use_rows_frame(spark):
    df = spark.createDataFrame(
        [(1, "s", 60), (2, "s", 60)], ["chunk_id", "shard", "n_tokens"]
    )
    out = {
        r["chunk_id"]: (r["seq_id"], r["seq_offset"])
        for r in cp.pack_sequences(
            df, budget=100, group_col="shard",
            order_by=[F.col("n_tokens").desc()],  # deliberately tied order
        ).collect()
    }
    # rows frame: one chunk starts at 0 (seq 0), the other at 60 (seq 0);
    # a RANGE frame would give both start=60
    assert sorted(v[1] for v in out.values()) == [0, 60]


def test_weighted_reservoir_nonpositive_weights_excluded(spark):
    """w<=0 rows have zero selection mass and must never be sampled: w=0
    produced ±Inf/NaN keys ordered differently by Spark and DuckDB, and
    negative weights inverted the ranking. Both engine forms filter them."""
    import duckdb

    rows = [(i, "g", float(i % 7) - 2.0) for i in range(60)]  # w in [-2, 4]
    df = spark.createDataFrame(rows, ["doc_id", "source", "w"])
    got = cp.weighted_reservoir_sample(df, k=15, weight_col="w").collect()
    assert all(r["w"] > 0 for r in got)
    assert len(got) == 15

    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, source VARCHAR, w DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql = cp.weighted_reservoir_sample_sql("t", 15, "w")
    oracle = {r[0] for r in con.execute(sql).fetchall()}
    assert {r["doc_id"] for r in got} == oracle
