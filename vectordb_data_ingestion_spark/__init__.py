"""PySpark-native analytics engine with the capabilities of the
``amd-srautmar/vectordb_data_ingestion`` reference pipeline, re-expressed
Spark-first.

The reference is a single-node pandas ETL for a RAG knowledge base
(SharePoint scrape -> parse -> chunk -> token count -> embed -> vector DB).
This package provides the same data model and operators as lazy, distributed
DataFrame transformations designed for 100 TB scale, plus the
LLM-training-data operators (dedup, similarity search, multimodal columns,
text analysis) a modern pipeline needs.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``schemas``    : fixed StructType schemas for the catalog/chunk/vector tables
- ``functions``  : column-expression library (chunking, tokens, cleaning,
                   vectors, hashing) - built-in-function compositions that stay
                   inside whole-stage codegen wherever possible
- ``operators``  : DataFrame -> DataFrame operators (catalog diff, dedup,
                   similarity, text analysis, chunk pipeline)
- ``sources``    : file/binary ingestion and catalog listing connectors
- ``sinks``      : vector-store sinks (parquet vector table; batched
                   foreachPartition writer with retry + predicate delete)
- ``streaming``  : incremental refresh via Structured Streaming foreachBatch
"""

__version__ = "0.1.0"
