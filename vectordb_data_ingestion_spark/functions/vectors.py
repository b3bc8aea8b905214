"""Vector math over ``array<float>`` embedding columns.

All pure higher-order-function compositions (``zip_with`` + ``aggregate``) -
JVM-side, no UDF, so a 100 TB scan of embeddings never crosses into Python.
The reference stores 1536-d ada-002 vectors (cfg.toml:19) and its query-side
config uses Weaviate "certainty" = (1 + cosine) / 2 with a 0.9 threshold
(cfg.toml:48); :func:`certainty` reproduces that exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> -> array<double> so fold arithmetic is IEEE double
    on both the engine and oracle sides."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Left-to-right fold of elementwise products (matches DuckDB
    ``list_dot_product`` evaluation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b); null when either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)


def certainty(a: Column, b: Column) -> Column:
    """Weaviate-style certainty = (1 + cosine) / 2  (cfg.toml:48 semantics)."""
    return (F.lit(1.0) + cosine_similarity(a, b)) / F.lit(2.0)


# --- DuckDB oracle snippets (identical math) -------------------------------

def cosine_sql(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    )


def certainty_sql(a: str, b: str) -> str:
    return f"((1.0 + {cosine_sql(a, b)}) / 2.0)"


def to_double_array_sql(col: str) -> str:
    return f"list_transform({col}, x -> CAST(x AS DOUBLE))"
