"""Product quantization: the compression tier between int8 scalar
quantization (functions/vectors.py) and raw vectors.

Split each d-dim vector into ``m`` subvectors, quantize each subvector to
its nearest codeword in a per-subspace codebook (k codewords, trained with
k-means over the subvectors), and store only the ``m`` small code ids -
d*4 bytes becomes m bytes at k<=256. Query-time scoring is ADC (asymmetric
distance computation): the query stays un-quantized, per-subspace lookup
tables give the distance from the query's subvector to every codeword, and
a vector's approximate distance is the sum of its codes' table entries.
(Jegou et al., "Product Quantization for Nearest Neighbor Search", TPAMI
2011 - public literature; nothing like it exists in the reference, which
stores raw 1536-d ada-002 vectors, cfg.toml:19.)

Scale shape:
- codebooks are tiny (m * k rows) -> always broadcast; encoding is one
  narrow pass over the corpus + a groupBy on the vector id whose rows are
  (id, sub, code) triples - the shuffle carries codes, never vectors;
- ADC scoring joins the (sub, code) lookup table (m * k rows, broadcast)
  against the exploded code table and sums per id: no corpus shuffle
  beyond the m-row-per-vector partial-summed aggregation. With the codes
  kept as an array column the same score is a pure projection
  (aggregate over a LUT array literal) - zero shuffle - at the cost of
  rebuilding the plan per query; the join form is used here because it is
  engine-agnostic enough to oracle-check bit-for-bit.

All distances use the dot-product expansion ``|x-y|^2 = x.x - 2x.y + y.y``
rounded to 6dp on BOTH engines, so nearest-codeword ties break identically
in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from vectordb_data_ingestion_spark.functions.vectors import (
    dot_product,
    to_double_array,
)


def _l2sq(a: Column, b: Column) -> Column:
    """Rounded squared L2 via the dot expansion (cross-engine stable)."""
    return F.round(
        dot_product(a, a) - 2 * dot_product(a, b) + dot_product(b, b), 6
    )


def subvectors(vec: Column, m: int, dim: int) -> Column:
    """Array of ``m`` contiguous subvectors of a ``dim``-dim vector."""
    dsub = dim // m
    return F.array(
        *[F.slice(vec, j * dsub + 1, dsub) for j in range(m)]
    )


def pq_train(
    corpus: DataFrame,
    m: int,
    dim: int,
    k: int = 16,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Train per-subspace codebooks: split every corpus vector into ``m``
    subvectors and run the deterministic :func:`kmeans_fit` independently in
    each subspace (the subvector stream for subspace j is just another
    corpus). Returns ``(sub, code, sv)`` with dense codes 0..k-1 per sub.
    """
    from vectordb_data_ingestion_spark.operators.similarity import kmeans_fit

    subs = corpus.select(
        F.col(id_col),
        F.posexplode(subvectors(to_double_array(F.col(vec_col)), m, dim)).alias(
            "sub", "sv"
        ),
    )
    books = []
    for j in range(m):
        one = subs.filter(F.col("sub") == j).select(
            F.col(id_col).alias("vec_id"), F.col("sv").alias("embedding")
        )
        trained = kmeans_fit(one, k=k, iterations=iterations)
        w = Window.orderBy("c_id")
        books.append(
            trained.select(
                F.lit(j).alias("sub"),
                (F.row_number().over(w) - 1).cast("long").alias("code"),
                F.col("c_embedding").alias("sv"),
            )
        )
    out = books[0]
    for b in books[1:]:
        out = out.unionByName(b)
    return out


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, pq_codes: array<long>) - each vector's nearest codeword per
    subspace (min rounded L2^2, ties -> lowest code). Codebooks broadcast;
    the only shuffle carries (id, sub, code) triples."""
    best = pq_assign(corpus, codebooks, m, dim, vec_col=vec_col, id_col=id_col)
    return best.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s["code"],
        ).alias("pq_codes")
    )


def pq_assign(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, sub, code): nearest codeword per (vector, subspace) - the
    normalized form of :func:`pq_encode`, and the direct input to ADC."""
    subs = corpus.select(
        F.col(id_col),
        F.posexplode(subvectors(to_double_array(F.col(vec_col)), m, dim)).alias(
            "sub", "sv"
        ),
    )
    cb = broadcast(codebooks.select("sub", "code", F.col("sv").alias("cv")))
    scored = subs.join(cb, "sub").select(
        id_col, "sub", "code", _l2sq(F.col("sv"), F.col("cv")).alias("d")
    )
    w = Window.partitionBy(id_col, "sub").orderBy(F.asc("d"), F.asc("code"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "sub", "code")
    )


def adc_lookup_table(
    codebooks: DataFrame, query_vector: list[float], m: int, dim: int
) -> DataFrame:
    """(sub, code, d): rounded squared L2 from the query's j-th subvector to
    every codeword of subspace j. m*k rows - broadcast it."""
    dsub = dim // m
    qsub = F.array(
        *[
            F.array(
                *[
                    F.lit(float(query_vector[j * dsub + i]))
                    for i in range(dsub)
                ]
            )
            for j in range(m)
        ]
    )
    return codebooks.select(
        "sub",
        "code",
        _l2sq(F.element_at(qsub, F.col("sub") + 1), F.col("sv")).alias("d"),
    )


def pq_adc_topk(
    assigned: DataFrame,
    codebooks: DataFrame,
    query_vector: list[float],
    k: int,
    m: int,
    dim: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k by ADC: per-vector score = sum over subspaces of
    the lookup-table entry for its code. One broadcast join on (sub, code),
    a partial-summed groupBy on the id (m rows in per id), TakeOrdered k.
    """
    lut = broadcast(adc_lookup_table(codebooks, query_vector, m, dim))
    scored = assigned.join(lut, ["sub", "code"]).groupBy(id_col).agg(
        F.round(F.sum("d"), 6).alias("adc")
    )
    return scored.orderBy(F.asc("adc"), F.asc(id_col)).limit(k)
