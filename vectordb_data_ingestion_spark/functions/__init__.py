"""Column-expression library.

Everything here is built from `pyspark.sql.functions` compositions (JVM-side,
whole-stage-codegen-friendly). Pandas UDFs exist only where semantics can't be
expressed declaratively (recursive character splitting, HTML parsing, external
embedding calls) and are Arrow-batched.
"""

from vectordb_data_ingestion_spark.functions.text import (
    clean_text,
    token_count,
    word_split,
    TOKEN_PATTERN,
)
from vectordb_data_ingestion_spark.functions.vectors import (
    cosine_similarity,
    certainty,
    dot_product,
    l2_norm,
    to_double_array,
)
from vectordb_data_ingestion_spark.functions.hashing import md5_hash32, md5_hash32_seeded

__all__ = [
    "clean_text",
    "token_count",
    "word_split",
    "TOKEN_PATTERN",
    "cosine_similarity",
    "certainty",
    "dot_product",
    "l2_norm",
    "to_double_array",
    "md5_hash32",
    "md5_hash32_seeded",
]
