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


# --- int8 scalar quantization ----------------------------------------------

def quantize_scale(a: Column) -> Column:
    """Per-vector int8 quantization scale ``127 / max(|x|)`` (symmetric
    scalar quantization - the storage-compression mode vector DBs ship for
    4x memory reduction). Null for the all-zero vector."""
    max_abs = F.array_max(F.transform(a, F.abs))
    return F.when(max_abs > 0, F.lit(127.0) / max_abs)


def quantize_int8(a: Column, scale: Column) -> Column:
    """``round(x * scale)`` per element as array<int> in [-127, 127].
    Both engines round half away from zero (Java HALF_UP / C++ round), so
    the arrays agree bit-for-bit."""
    return F.transform(a, lambda x: F.round(x * scale).cast("int"))


def dequantize(q: Column, scale: Column) -> Column:
    """Reconstruct array<double> from the int8 codes."""
    return F.transform(q, lambda x: x.cast("double") / scale)


def quantize_scale_sql(a: str) -> str:
    # CAST both sides to DOUBLE: DuckDB parses 127.0 as DECIMAL and a
    # DECIMAL / FLOAT division loses precision vs Spark's double arithmetic
    m = f"CAST(list_max(list_transform({a}, x -> abs(x))) AS DOUBLE)"
    return f"CASE WHEN {m} > 0 THEN CAST(127.0 AS DOUBLE) / {m} END"


def quantize_int8_sql(a: str, scale: str) -> str:
    return f"list_transform({a}, x -> CAST(ROUND(x * {scale}) AS INTEGER))"


def dequantize_sql(q: str, scale: str) -> str:
    return f"list_transform({q}, x -> CAST(x AS DOUBLE) / {scale})"


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


# --- binary (sign-bit) quantization ----------------------------------------

def binary_quantize(a: Column, dim: int, word_bits: int = 32) -> Column:
    """Sign-bit binary quantization: 1 bit per dimension (``x > 0``),
    packed little-endian into ``array<bigint>`` words of ``word_bits``
    bits — the 32x memory-compression mode (a 1536-d float vector becomes
    48 32-bit words) used for first-pass candidate generation, rescored
    by exact cosine. 32-bit words keep every packed value well inside
    BIGINT so Spark and DuckDB integer arithmetic agree exactly.

    Pure higher-order folds (descending ``acc*2 + bit``), JVM-side, no
    UDF; a 100 TB embedding scan packs at codegen speed."""
    nwords = -(-dim // word_bits)
    return F.transform(
        F.sequence(F.lit(0), F.lit(nwords - 1)),
        lambda w: F.aggregate(
            F.sequence(F.lit(word_bits - 1), F.lit(0), F.lit(-1)),
            F.lit(0).cast("long"),
            # try_element_at: the last word probes past the array end when
            # dim is not a multiple of word_bits — plain element_at throws
            # INVALID_ARRAY_INDEX under ANSI mode (Spark 4 default), while
            # the DuckDB twin pads out-of-range bits with 0. NULL > 0 is
            # NULL, so the otherwise() pads identically.
            lambda acc, j: acc * 2
            + F.when(
                F.try_element_at(
                    a, (w * F.lit(word_bits) + j + 1).cast("int")
                )
                > 0,
                F.lit(1).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )


def hamming_distance(a: Column, b: Column) -> Column:
    """Hamming distance between two packed sign-bit vectors: popcount of
    the per-word XOR, summed. ``bit_count`` and ``^`` are JVM intrinsics
    — the entire distance is one codegen expression per pair."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def binary_quantize_sql(a: str, dim: int, word_bits: int = 32) -> str:
    """DuckDB form of :func:`binary_quantize` (identical packed words):
    per word, sum of ``1 << j`` over the set bits."""
    nwords = -(-dim // word_bits)
    return (
        "[list_sum([CASE WHEN "
        f"{a}[w * {word_bits} + j + 1] > 0 "
        "THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END "
        f"FOR j IN range({word_bits})]) FOR w IN range({nwords})]"
    )


def hamming_distance_sql(a: str, b: str, nwords: int) -> str:
    terms = " + ".join(
        f"bit_count(xor({a}[{w + 1}], {b}[{w + 1}]))" for w in range(nwords)
    )
    return f"CAST({terms} AS INTEGER)"
