"""Deterministic cross-engine hashing.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` are different algorithms,
so every hash that must be oracle-checkable is defined as *the first 8 hex
chars of md5, read as an unsigned 32-bit integer*:

- Spark : ``conv(substring(md5(x), 1, 8), 16, 10)::long``
- DuckDB: ``('0x' || substr(md5(x), 1, 8))::BIGINT``

Both are built-in, both run vectorized, and both agree bit-for-bit. Seeded
variants concatenate a seed suffix before hashing (for minhash families).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash32(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def md5_hash32_seeded(col: Column | str, seed: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return md5_hash32(F.concat(c, F.lit(f"#s{seed}")))


def md5_hash32_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def md5_hash32_seeded_sql(expr: str, seed: int) -> str:
    # || not concat(): DuckDB's concat() SKIPS NULL arguments (returning
    # the hash of '#s<seed>'), while Spark's concat — and || in both
    # engines — propagates NULL, so the twins agree on NULL input
    return md5_hash32_sql(f"({expr} || '#s{seed}')")


def md5_hash60(col: Column | str) -> Column:
    """First 15 hex chars of md5 as an unsigned 60-bit integer - for
    signatures needing more than 32 informative bits (e.g. wide SimHash).
    60 bits keep the value positive in both Spark longs and DuckDB BIGINTs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_hash60_seeded(col: Column | str, seed: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return md5_hash60(F.concat(c, F.lit(f"#s{seed}")))


def md5_hash60_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def md5_hash60_seeded_sql(expr: str, seed: int) -> str:
    return md5_hash60_sql(f"({expr} || '#s{seed}')")  # || : see 32-bit twin
