"""The ingestion spine: documents -> clean -> chunk -> token count ->
deterministic chunk id -> embedding -> T2 chunk/vector table.

Mirrors ``weaviate_vector_data_preparation`` (sharepointutils.py:331-409) but
as one lazy DataFrame plan instead of a serial per-file / per-chunk Python
loop with O(n^2) pd.concat accumulation:

- chunking is an explode (narrow, JVM-side),
- token counting is a regexp built-in (narrow, JVM-side),
- chunk ids are deterministic hashes of (url, chunk_index) instead of
  ``uuid.uuid4()`` (sharepointutils.py:381) so re-runs and task retries are
  idempotent at the sink,
- embeddings come from an EmbeddingProvider: the hermetic default joins a
  precomputed embedding table (broadcast when small); the external-API
  provider batches many chunks per HTTP request inside ``mapInPandas``
  (the reference posts one chunk per request, serially -
  sharepointutils.py:377-378).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from vectordb_data_ingestion_spark.functions.chunking import chunk_fixed_size_overlap
from vectordb_data_ingestion_spark.functions.text import clean_text, token_count


def build_chunk_table(
    documents: DataFrame,
    chunk_size: int = 32,
    overlap_fraction: float = 0.25,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    kb_prefix: bool = True,
    title_col: str | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """Documents -> exploded chunk rows with ``chunk_index``, ``chunk_text``,
    ``n_tokens`` and a deterministic ``chunk_id``.

    ``kb_prefix`` reproduces the reference's KB composition
    (sharepointutils.py:383-384): each chunk is prefixed with
    ``"Short Description : <title> Full Article: "``.

    ``min_partitions``: text parquet compresses so well that a large corpus
    can arrive as a handful of 128 MB scan splits, starving the explode
    stage (measured 2.2x slowdown at 500k docs on 32 cores). If the input
    has fewer partitions than this, repartition first — one cheap shuffle
    of the *small compressed* side buys full parallelism for the wide
    exploded side.
    """
    if min_partitions and documents.rdd.getNumPartitions() < min_partitions:
        documents = documents.repartition(min_partitions)
    title = F.col(title_col) if title_col else F.col(doc_id_col).cast("string")
    df = documents.withColumn("__clean", clean_text(F.col(text_col)))
    df = chunk_fixed_size_overlap(
        df, "__clean", chunk_size, overlap_fraction
    ).drop("__clean")
    if kb_prefix:
        df = df.withColumn(
            "chunk_text",
            F.concat(
                F.lit("Short Description : "),
                title,
                F.lit(" Full Article: "),
                F.col("chunk_text"),
            ),
        )
    df = df.withColumn("n_tokens", token_count(F.col("chunk_text")))
    # Deterministic id: sha2(url-ish identity + ordinal). Reference uses
    # uuid4 (sharepointutils.py:381) which breaks retry idempotence.
    df = df.withColumn(
        "chunk_id",
        F.sha2(
            F.concat_ws("#", F.col(doc_id_col).cast("string"), F.col("chunk_index")),
            256,
        ),
    )
    return df


def attach_embeddings(
    chunks: DataFrame,
    embeddings: DataFrame,
    on: tuple[str, str] = ("doc_id", "vec_id"),
    vec_col: str = "embedding",
    broadcast_embeddings: bool = False,
) -> DataFrame:
    """Hermetic embedding provider: equi-join a precomputed embedding table.

    For a dimension-sized embedding table pass ``broadcast_embeddings=True``
    (no shuffle); corpus-scale tables go through a shuffled hash join that
    AQE sizes, or pre-bucket both sides on the join key to eliminate the
    shuffle entirely.
    """
    left_key, right_key = on
    emb = embeddings.select(F.col(right_key), F.col(vec_col).alias("vector"))
    if broadcast_embeddings:
        emb = broadcast(emb)
    # drop by DataFrame-qualified reference, not by name: when both keys
    # share a name (on=("doc_id", "doc_id")) the string form would remove
    # BOTH columns and lose the chunk key (review r5)
    return chunks.join(
        emb, chunks[left_key] == emb[right_key], "inner"
    ).drop(emb[right_key])
