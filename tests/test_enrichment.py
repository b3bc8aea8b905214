"""Embedding-API enrichment: hermetic transport, batching, backoff,
newline normalization (reference: cmfunctions.py:43-71,489-519)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_data_ingestion_spark.operators.enrichment import (
    _hash_vector,
    call_with_backoff,
    deterministic_fake_transport,
    embed_via_api,
)


def _docs(spark, n=50):
    return (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .limit(n)
    )


def test_embed_appends_vector_and_keeps_columns(spark):
    df = _docs(spark)
    out = embed_via_api(
        df, deterministic_fake_transport(dim=8), text_col="text", batch_size=7
    )
    assert out.columns == ["doc_id", "text", "vector"]
    rows = out.collect()
    assert len(rows) == df.count()
    assert all(len(r["vector"]) == 8 for r in rows)


def test_embed_deterministic_and_normalized(spark):
    df = _docs(spark, n=10)
    fac = deterministic_fake_transport(dim=16)
    a = {r["doc_id"]: r["vector"] for r in embed_via_api(df, fac, "text").collect()}
    b = {r["doc_id"]: r["vector"] for r in embed_via_api(df, fac, "text").collect()}
    assert a == b
    for vec in a.values():
        assert abs(sum(x * x for x in vec) - 1.0) < 1e-5


def test_hash_vector_distinguishes_raw_texts():
    # the fake transport itself sees normalized text; raw hashes differ
    assert _hash_vector("a b", 8) != _hash_vector("a\nb", 8)


def test_newline_normalization_in_plan(spark):
    # "a\nb" must embed identically to "a b" (cmfunctions.py:497).
    df = spark.createDataFrame(
        [("1", "alpha beta"), ("2", "alpha\nbeta")], ["doc_id", "text"]
    )
    rows = embed_via_api(
        df, deterministic_fake_transport(dim=8), text_col="text"
    ).collect()
    vecs = {r["doc_id"]: r["vector"] for r in rows}
    assert vecs["1"] == vecs["2"]


def test_backoff_retries_then_succeeds():
    calls = {"n": 0}
    delays = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return "ok"

    out = call_with_backoff(flaky, max_retries=5, base_delay=0.5, sleep=delays.append)
    assert out == "ok"
    assert calls["n"] == 3
    assert delays == [0.5, 1.0]  # expo: base * 2^attempt


def test_backoff_reraises_after_max():
    def always_fails():
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        call_with_backoff(always_fails, max_retries=3, base_delay=0, sleep=lambda _: None)


def test_transport_size_mismatch_raises(spark):
    df = _docs(spark, n=5)

    def bad_factory():
        return lambda texts: [[0.0]]  # wrong cardinality

    with pytest.raises(Exception, match="vectors"):
        embed_via_api(df, bad_factory, text_col="text", max_retries=1).collect()


def test_annotate_via_api_batching_and_backoff(spark):
    """The annotator batches requests, retries transient failures, and
    appends (label, score) without disturbing input columns."""
    from vectordb_data_ingestion_spark.operators.enrichment import (
        ANNOTATE_LABELS,
        annotate_via_api,
        deterministic_fake_annotator,
    )

    inner = deterministic_fake_annotator()

    def flaky_factory():
        base = inner()
        state = {"fail_left": 1}  # per-transport (per-partition) failure

        def annotate(texts):
            if state["fail_left"] > 0:
                state["fail_left"] -= 1
                raise ConnectionError("transient")
            return base(texts)

        return annotate

    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(10)],
        "doc_id long, text string",
    ).coalesce(1)
    out = annotate_via_api(
        docs, flaky_factory, text_col="text", batch_size=4, base_delay=0.01
    ).collect()
    # success despite each partition's first request failing == backoff works
    assert len(out) == 10
    assert all(r["label"] in ANNOTATE_LABELS for r in out)
    assert all(0.0 <= r["label_score"] <= 1.0 for r in out)
    # labels match the direct fake (batching/ordering preserved)
    direct = inner()([f"text number {i}" for i in range(10)])
    got = {r["doc_id"]: (r["label"], r["label_score"]) for r in out}
    for i in range(10):
        assert got[i][0] == direct[i][0]
        assert abs(got[i][1] - direct[i][1]) < 1e-6


def test_transport_ragged_dimension_raises(spark):
    """A transport that returns a short vector mid-stream must fail loud:
    zip_with truncates to the shorter side downstream, so a silently
    stored 3-dim vector in a 4-dim corpus poisons every cosine score."""
    df = _docs(spark, n=6).coalesce(1)

    def ragged_factory():
        def embed(texts):
            # first batch vector establishes the stream dim; the last
            # one comes back short (real texts, so key off position)
            return [
                [0.1, 0.2, 0.3] if i == len(texts) - 1
                else [0.1, 0.2, 0.3, 0.4]
                for i, _t in enumerate(texts)
            ]

        return embed

    with pytest.raises(Exception, match="dim"):
        embed_via_api(
            df, ragged_factory, text_col="text", max_retries=1
        ).collect()


def test_annotator_malformed_row_raises_cleanly(spark):
    df = _docs(spark, n=3).coalesce(1)
    from vectordb_data_ingestion_spark.operators.enrichment import (
        annotate_via_api,
    )

    def bad_factory():
        return lambda texts: [["ok", 0.5]] * (len(texts) - 1) + [["no-score"]]

    with pytest.raises(Exception, match="malformed row"):
        annotate_via_api(df, bad_factory, max_retries=1).collect()


def test_null_text_raises_instead_of_embedding_none(spark):
    """astype(str) renders a NULL text as the literal 'None' — before the
    r6 guard that string was silently embedded/labeled as real content
    (the reference crashes on None.replace, cmfunctions.py:497, so loud
    is also parity)."""
    from vectordb_data_ingestion_spark.operators.enrichment import (
        annotate_via_api,
        deterministic_fake_annotator,
    )

    df = spark.createDataFrame(
        [(1, "real text"), (2, None)], "id long, text string"
    )
    with pytest.raises(Exception, match="NULL 'text'"):
        embed_via_api(
            df, deterministic_fake_transport(4), text_col="text"
        ).collect()
    with pytest.raises(Exception, match="NULL 'text'"):
        annotate_via_api(
            df, deterministic_fake_annotator(), text_col="text"
        ).collect()
