"""Weaviate-style query facade: the surface a reference user queries today
(cfg.toml:21-55 - class + near_vector + where + hybrid + top_by_certainty),
composed from this engine's operators over any DataFrame corpus.

The reference never executes queries itself - it only *declares* them as
config consumed by a chatbot. This facade makes them executable:

    col = VectorCollection(corpus, id_col="chunk_id", text_col="text",
                           vec_col="vector", certainty=0.9)
    col.near_vector(qvec, k=3)                       # nearVector
    col.near_text("reset password", k=3)             # nearText (ingest transport)
    col.near_vector(qvec, k=3, where=F.col("source") == "kb")   # + where
    col.bm25("reset password", k=10)                 # keyword
    col.hybrid("reset password", qvec, k=10, alpha=0.5)         # fusion
    col.rerank("reset password", candidates, transport, k=3)    # precision

Every method returns a lazy DataFrame - composition with the rest of a plan
(joins, writes) stays in Catalyst's hands; nothing collects except the tiny
query-side inputs the operators broadcast anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.config import VectorClassConfig


class VectorCollection:
    """One queryable vector class over a DataFrame corpus."""

    def __init__(
        self,
        corpus: DataFrame,
        id_col: str = "vec_id",
        text_col: str = "text",
        vec_col: str = "embedding",
        certainty: float | None = None,
    ):
        self.corpus = corpus
        self.id_col = id_col
        self.text_col = text_col
        self.vec_col = vec_col
        self.certainty = certainty
        self._dim: int | None = None

    def _corpus_dim(self) -> int:
        """Embedding width, measured once and cached — every dim-less
        near_text used to launch a fresh driver job per call, and an
        empty corpus crashed with 'NoneType is not subscriptable'
        instead of a clear error (review r5)."""
        if self._dim is None:
            row = self.corpus.select(self.vec_col).first()
            if row is None or row[self.vec_col] is None:
                raise ValueError(
                    "cannot infer embedding dim from an empty corpus — "
                    "pass near_text(..., dim=...) explicitly"
                )
            self._dim = len(row[self.vec_col])
        return self._dim

    @classmethod
    def from_class_config(
        cls, corpus: DataFrame, cfg: VectorClassConfig, **kw
    ) -> "VectorCollection":
        """Bind a cfg.toml vector-class entry (T4) to a corpus: the class's
        ``top_by_certainty`` becomes the default retrieval threshold."""
        return cls(corpus, certainty=cfg.top_by_certainty, **kw)

    def _filtered(self, where: Column | None) -> DataFrame:
        # predicate joins BEFORE scoring: non-matching rows are never
        # scored, and a partitioned layout prunes the scan itself
        return self.corpus.filter(where) if where is not None else self.corpus

    def near_vector(
        self,
        vector: list[float],
        k: int = 3,
        certainty: float | None = None,
        where: Column | None = None,
    ) -> DataFrame:
        """Weaviate nearVector (+ optional where): top-k by certainty
        ``(1+cos)/2`` meeting the threshold. Single corpus scan, broadcast
        query, map-side top-k."""
        from vectordb_data_ingestion_spark.operators.similarity import (
            topk_by_certainty_vectorized,
        )

        t = certainty if certainty is not None else (self.certainty or 0.0)
        return topk_by_certainty_vectorized(
            self._filtered(where),
            [(0, list(vector))],
            k=k,
            threshold=t,
            corpus_vec=self.vec_col,
            corpus_id=self.id_col,
        ).drop("q_id")

    def near_text(
        self,
        query: str,
        k: int = 3,
        certainty: float | None = None,
        where: Column | None = None,
        transport_factory=None,
        dim: int | None = None,
    ) -> DataFrame:
        """Weaviate nearText: embed the query text through the same
        transport the ingest side used (operators/enrichment.py — the
        reference's LLM-gateway call, cmfunctions.py:43-71), then
        nearVector. The single query string embeds driver-side (one tiny
        call); the corpus-side plan is identical to :meth:`near_vector`.
        Defaults to the deterministic hermetic transport so tests and
        oracles reproduce; pass ``http_transport_factory(...)`` in a real
        deployment."""
        from vectordb_data_ingestion_spark.operators.enrichment import (
            deterministic_fake_transport,
        )

        if transport_factory is None:
            if dim is None:
                dim = self._corpus_dim()
            transport_factory = deterministic_fake_transport(dim=dim)
        [qvec] = transport_factory()(
            [query.replace("\n", " ")]  # the reference's newline normalize
        )
        return self.near_vector(qvec, k=k, certainty=certainty, where=where)

    def near_object(
        self,
        object_id,
        k: int = 3,
        certainty: float | None = None,
        where: Column | None = None,
    ) -> DataFrame:
        """Weaviate-style nearObject: retrieve by similarity to an
        EXISTING object — look up its stored vector by id (one
        indexed/pruned point read), then run the nearVector plan.

        Deliberate deviation from Weaviate: the anchor object itself is
        EXCLUDED here (Weaviate returns it as the distance-0 top hit).
        Callers of this facade almost always want neighbors, not the
        anchor echoed back; drop the exclusion by calling
        ``near_vector(stored_vector, ...)`` directly if parity matters."""
        row = (
            self.corpus.filter(F.col(self.id_col) == F.lit(object_id))
            .select(self.vec_col)
            .first()
        )
        if row is None:
            raise KeyError(f"no object with {self.id_col}={object_id!r}")
        anchor_excluded = F.col(self.id_col) != F.lit(object_id)
        combined = (
            anchor_excluded if where is None else (where & anchor_excluded)
        )
        return self.near_vector(
            list(row[self.vec_col]), k=k, certainty=certainty, where=combined
        )

    def bm25(
        self, query: str, k: int = 10, where: Column | None = None
    ) -> DataFrame:
        """Weaviate bm25 keyword mode: Okapi BM25 over the text column."""
        from vectordb_data_ingestion_spark.operators.search import bm25_topk

        terms = [t for t in query.lower().split() if t]
        return bm25_topk(
            self._filtered(where),
            [(0, terms)],
            k=k,
            text_col=self.text_col,
            id_col=self.id_col,
        ).drop("q_id")

    def hybrid(
        self,
        query: str,
        vector: list[float],
        k: int = 10,
        alpha: float = 0.5,
        where: Column | None = None,
        k_rrf: int = 60,
    ) -> DataFrame:
        """Weaviate hybrid mode: dense + BM25 lists fused with weighted
        reciprocal rank (``alpha`` weights the dense list, ``1 - alpha``
        the keyword list, both recall stages bounded to 2k candidates)."""
        from vectordb_data_ingestion_spark.operators.search import (
            bm25_topk,
            rrf_fuse,
        )
        from vectordb_data_ingestion_spark.operators.similarity import (
            topk_by_certainty_vectorized,
        )
        from pyspark.sql.window import Window

        base = self._filtered(where)
        dense = topk_by_certainty_vectorized(
            base,
            [(0, list(vector))],
            k=2 * k,
            threshold=0.0,
            corpus_vec=self.vec_col,
            corpus_id=self.id_col,
        ).withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("certainty"), F.asc(self.id_col)
                )
            ),
        )
        terms = [t for t in query.lower().split() if t]
        keyword = bm25_topk(
            base, [(0, terms)], k=2 * k, text_col=self.text_col,
            id_col=self.id_col,
        )
        return rrf_fuse(
            dense,
            keyword,
            id_col=self.id_col,
            k_rrf=k_rrf,
            weight_a=alpha,
            weight_b=1.0 - alpha,
            k=k,
        ).drop("q_id")

    def rerank(
        self,
        query: str,
        candidates: DataFrame,
        transport_factory,
        k: int = 3,
    ) -> DataFrame:
        """Precision stage over any recall result that still carries the
        text column: pairwise (query, text) scoring, top-k."""
        from vectordb_data_ingestion_spark.operators.search import (
            cross_encoder_rerank,
        )

        cand = candidates.withColumn("__query", F.lit(query)).withColumn(
            "__q_id", F.lit(0)
        )
        return (
            cross_encoder_rerank(
                cand,
                transport_factory,
                k=k,
                query_col="__query",
                text_col=self.text_col,
                query_id="__q_id",
                doc_id=self.id_col,
            )
            .drop("__query", "__q_id")
        )


    def retrieve_context(
        self,
        vector: list[float],
        k: int = 3,
        max_tokens: int | None = None,
        certainty: float | None = None,
        where: Column | None = None,
        url_col: str | None = None,
        tokens_col: str = "n_tokens",
    ) -> DataFrame:
        """The full consumer path in one call (cfg.toml context_top_n +
        as_context semantics): nearVector top-k, then token-budgeted
        context packing with rank-ordered sources. Returns one row:
        (context, n_chunks[, sources][, n_tokens])."""
        from vectordb_data_ingestion_spark.operators.context import (
            build_context,
        )

        hits = self.near_vector(
            vector, k=k, certainty=certainty, where=where
        ).withColumn("q_id", F.lit(0))
        return build_context(
            hits,
            self.corpus,
            max_tokens=max_tokens,
            id_col=self.id_col,
            text_col=self.text_col,
            url_col=url_col,
            tokens_col=tokens_col,
        ).drop("q_id")

    def aggregate(
        self,
        group_by: str | list[str] | None = None,
        where: Column | None = None,
        mean_cols: list[str] | None = None,
    ) -> DataFrame:
        """Weaviate-style ``aggregate``: object counts (optionally per
        ``group_by`` metadata field) with optional per-column means, over
        the predicate-filtered corpus. The filter rides the scan
        (pushdown), the count is one map-side-combinable aggregate —
        metadata analytics never touch the vector column."""
        base = self._filtered(where)
        aggs = [F.count(F.lit(1)).alias("count")]
        for c in mean_cols or []:
            aggs.append(F.round(F.avg(c), 6).alias(f"mean_{c}"))
        if group_by is None:
            return base.agg(*aggs)
        keys = [group_by] if isinstance(group_by, str) else list(group_by)
        return base.groupBy(*keys).agg(*aggs)
