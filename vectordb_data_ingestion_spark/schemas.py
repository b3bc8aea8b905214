"""Fixed StructType schemas for the engine's tables.

The reference's schemas are conventions encoded in column-name dicts
(data_ingestion.py:22-34, sharepointutils.py:136). Here they are explicit
StructTypes: T1 file catalog (sharepointutils.py:119-145), T2 chunk/vector
table (data_ingestion.py:22-34, rows built sharepointutils.py:386-402), and
T3 extracted-text table (cmfunctions.py:363-364). Stringly-typed dates in the
reference become real TimestampType columns.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# T1 - file catalog: one row per source document.
FILE_CATALOG_SCHEMA = StructType(
    [
        StructField("file_id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("url", StringType(), False),
        StructField("last_modified", StringType(), True),   # raw form, pre-cast
        StructField("file_type", StringType(), True),       # derived (regexp)
        StructField("modified_dt", TimestampType(), True),  # cast of last_modified
    ]
)

# T2 - chunk/vector table: one row per text chunk.
CHUNK_VECTOR_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("url", StringType(), True),
        StructField("modified_dt", TimestampType(), True),
        StructField("index", IntegerType(), False),         # chunk ordinal
        StructField("text", StringType(), True),
        StructField("vector", ArrayType(FloatType()), True),
        StructField("n_tokens", IntegerType(), True),
        StructField("chunk_id", StringType(), False),       # deterministic id
        StructField("load_dt", TimestampType(), True),
        StructField("source", StringType(), True),
        StructField("title", StringType(), True),
    ]
)

# T3 - extracted-text table (KB-article / service-catalog ETL intermediate).
EXTRACTED_TEXT_SCHEMA = StructType(
    [
        StructField("extracted_text", StringType(), True),
        StructField("url", StringType(), True),
        StructField("n_tokens", IntegerType(), True),
    ]
)

# Multimodal document: opaque binary payload + typed metadata. The decode /
# feature-extraction path treats ``content`` as the only large column so
# column pruning keeps metadata-only queries cheap.
MULTIMODAL_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),       # image|audio|video|text
        StructField("content", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)
