"""VectorCollection facade: the reference consumer's query surface
(nearVector / where / bm25 / hybrid / rerank) composed over one corpus."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_data_ingestion_spark.collection import VectorCollection
from vectordb_data_ingestion_spark.config import VectorClassConfig
from vectordb_data_ingestion_spark.operators.search import (
    deterministic_fake_cross_encoder,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMALL)


def _corpus(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    return docs.join(emb, docs["doc_id"] == emb["vec_id"]).select(
        "doc_id", "text", "lang", "source", "embedding"
    ).cache()


def _vec(corpus, doc_id):
    return [
        float(x)
        for x in corpus.filter(F.col("doc_id") == doc_id).collect()[0][
            "embedding"
        ]
    ]


def test_near_vector_self_retrieval_and_threshold(spark):
    corpus = _corpus(spark)
    col = VectorCollection(corpus, id_col="doc_id", certainty=0.9)
    qv = _vec(corpus, 7)
    hits = col.near_vector(qv, k=3).collect()
    assert hits[0]["doc_id"] == 7 and hits[0]["certainty"] == 1.0
    # the class-config default threshold applies when not overridden
    assert all(r["certainty"] >= 0.9 for r in hits)
    # explicit threshold loosens it
    loose = col.near_vector(qv, k=3, certainty=0.0).collect()
    assert len(loose) == 3


def test_near_vector_where_filters_before_scoring(spark):
    corpus = _corpus(spark)
    col = VectorCollection(corpus, id_col="doc_id")
    qv = _vec(corpus, 7)
    only = col.near_vector(qv, k=50, where=F.col("doc_id") % 2 == 0).collect()
    assert only and all(r["doc_id"] % 2 == 0 for r in only)


def test_bm25_finds_term_documents(spark):
    corpus = _corpus(spark)
    col = VectorCollection(corpus, id_col="doc_id")
    hits = col.bm25("vector", k=5).collect()
    assert hits
    ids = [r["doc_id"] for r in hits]
    texts = {
        r["doc_id"]: r["text"]
        for r in corpus.filter(F.col("doc_id").isin(ids)).collect()
    }
    assert all("vector" in texts[i] for i in ids)


def test_hybrid_fuses_both_lists(spark):
    corpus = _corpus(spark)
    col = VectorCollection(corpus, id_col="doc_id")
    qv = _vec(corpus, 7)
    fused = col.hybrid("vector table", qv, k=5, alpha=0.5).collect()
    assert len(fused) == 5
    # alpha=1 -> pure dense: the query vector's own doc must lead
    dense_only = col.hybrid("vector table", qv, k=5, alpha=1.0).collect()
    assert dense_only[0]["doc_id"] == 7


def test_rerank_over_recall_candidates(spark):
    corpus = _corpus(spark)
    col = VectorCollection(corpus, id_col="doc_id")
    qv = _vec(corpus, 7)
    cand = col.near_vector(qv, k=20, certainty=0.0).join(
        corpus.select("doc_id", "text"), "doc_id"
    )
    out = col.rerank("table scan", cand, deterministic_fake_cross_encoder(), k=3)
    rows = out.collect()
    assert len(rows) == 3
    assert all(0.0 <= r["ce_score"] <= 1.0 for r in rows)
    # deterministic: rerun identical
    again = col.rerank(
        "table scan", cand, deterministic_fake_cross_encoder(), k=3
    ).collect()
    assert [(r["doc_id"], r["ce_score"]) for r in rows] == [
        (r["doc_id"], r["ce_score"]) for r in again
    ]


def test_from_class_config_binds_threshold(spark):
    corpus = _corpus(spark)
    cfg = VectorClassConfig.from_dict(
        {"label": "kb", "class": "KBChunks", "top_by_certainty": 0.95}
    )
    col = VectorCollection.from_class_config(
        corpus, cfg, id_col="doc_id"
    )
    assert col.certainty == 0.95


def test_build_context_token_budget_and_order(spark):
    """Budget packing: best-first contiguous prefix under the budget, the
    top hit always kept, sources in rank order."""
    from vectordb_data_ingestion_spark.operators.context import build_context

    hits = spark.createDataFrame(
        [(0, "c1", 0.9), (0, "c2", 0.8), (0, "c3", 0.7), (1, "c4", 0.99)],
        "q_id long, chunk_id string, certainty double",
    )
    chunks = spark.createDataFrame(
        [
            ("c1", "first", "u1", 50),
            ("c2", "second", "u2", 60),
            ("c3", "third", "u3", 10),   # would fit alone, but prefix broke
            ("c4", "huge", "u4", 999),   # over budget, still kept (top hit)
        ],
        "chunk_id string, text string, url string, n_tokens int",
    )
    out = {r["q_id"]: r for r in build_context(
        hits, chunks, max_tokens=115).collect()}
    assert out[0]["context"] == "first\n\nsecond"   # c3 cut: prefix only
    assert out[0]["sources"] == ["u1", "u2"]
    assert out[0]["n_chunks"] == 2 and out[0]["n_tokens"] == 110
    assert out[1]["context"] == "huge"              # top hit always fits
    assert out[1]["n_tokens"] == 999


def test_retrieve_context_end_to_end(spark):
    corpus = _corpus(spark)
    col = VectorCollection(corpus, id_col="doc_id")
    qv = _vec(corpus, 7)
    row = col.retrieve_context(qv, k=3, certainty=0.0).collect()[0]
    # the query doc's own text leads the context
    own = corpus.filter(F.col("doc_id") == 7).collect()[0]["text"]
    assert row["context"].startswith(own)
    assert row["n_chunks"] == 3


def test_near_vector_string_ids(spark):
    """The facade must accept non-numeric (UUID-style) chunk ids end to end:
    the vectorized top-k preserves the corpus id dtype instead of assuming
    bigint (ADVICE round 1)."""
    corpus = _corpus(spark).withColumn(
        "chunk_id", F.concat(F.lit("chunk-"), F.format_string("%04d", "doc_id"))
    )
    col = VectorCollection(corpus, id_col="chunk_id", certainty=0.0)
    qv = _vec(corpus, 7)
    hits = col.near_vector(qv, k=3).collect()
    assert hits[0]["chunk_id"] == "chunk-0007"
    assert hits[0]["certainty"] == 1.0
    assert len(hits) == 3
    # hybrid + retrieve_context route the same id column through bm25/rrf
    fused = col.hybrid("vector data", qv, k=5).collect()
    assert fused and all(isinstance(r["chunk_id"], str) for r in fused)


def test_near_text_roundtrip_with_ingest_transport(spark):
    """near_text embeds the query through the SAME transport the ingest
    side used, so querying with a document's exact text must return that
    document as the top hit with certainty 1.0."""
    from vectordb_data_ingestion_spark.collection import VectorCollection
    from vectordb_data_ingestion_spark.operators.enrichment import (
        deterministic_fake_transport,
        embed_via_api,
    )

    docs = spark.createDataFrame(
        [(1, "reset your password"), (2, "configure the vpn"),
         (3, "request new hardware")],
        ["chunk_id", "text"],
    )
    corpus = embed_via_api(
        docs, deterministic_fake_transport(dim=16), text_col="text",
        vec_col="vector",
    )
    col = VectorCollection(
        corpus, id_col="chunk_id", text_col="text", vec_col="vector"
    )
    rows = col.near_text("configure the vpn", k=2).collect()
    assert rows[0]["chunk_id"] == 2
    assert abs(rows[0]["certainty"] - 1.0) < 1e-6

    # dim inferred from the corpus when no transport given; a where filter
    # composes before scoring
    from pyspark.sql import functions as F

    rows = col.near_text(
        "configure the vpn", k=2, where=F.col("chunk_id") != 2
    ).collect()
    assert rows and all(r["chunk_id"] != 2 for r in rows)


def test_near_object_excludes_anchor(spark):
    """nearObject = look up the anchor's stored vector, run nearVector,
    anchor excluded; parity with near_vector on the same vector minus the
    anchor row."""
    corpus = _corpus(spark)
    col = VectorCollection(corpus, id_col="doc_id")
    hits = col.near_object(7, k=3, certainty=0.0).collect()
    assert all(r["doc_id"] != 7 for r in hits)
    via_vec = (
        col.near_vector(
            _vec(corpus, 7), k=4, certainty=0.0
        )
        .filter(F.col("doc_id") != 7)
        .collect()[:3]
    )
    assert [r["doc_id"] for r in hits] == [r["doc_id"] for r in via_vec]
    try:
        col.near_object(10**9)
        raise AssertionError("expected KeyError for a missing anchor id")
    except KeyError:
        pass


def test_aggregate_counts_and_means(spark):
    corpus = _corpus(spark).withColumn("n_chars", F.length("text"))
    col = VectorCollection(corpus, id_col="doc_id")
    out = {
        r["lang"]: r
        for r in col.aggregate(group_by="lang", mean_cols=["n_chars"]).collect()
    }
    expected = {
        r["lang"]: (r["c"], r["m"])
        for r in corpus.groupBy("lang")
        .agg(F.count("*").alias("c"), F.round(F.avg("n_chars"), 6).alias("m"))
        .collect()
    }
    assert {k: (v["count"], v["mean_n_chars"]) for k, v in out.items()} == expected
    total = col.aggregate().collect()[0]
    assert total["count"] == corpus.count()
    filtered = col.aggregate(where=F.col("lang") == "en").collect()[0]
    assert filtered["count"] == corpus.filter("lang = 'en'").count()
