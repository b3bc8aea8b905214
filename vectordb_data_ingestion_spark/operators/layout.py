"""Data-layout operators: Z-order (Morton) clustering keys.

A 100 TB fact table queried by two independent dimensions (user AND
time, lat AND lon) can't be range-partitioned to serve both; interleaving
the bits of the two quantized dimensions into one Morton key and
range-clustering on it gives every file a tight bounding rectangle in
BOTH dimensions, so min/max file statistics prune either predicate —
the layout trick behind Delta/Iceberg ``ZORDER BY``.

The key is a pure bitwise expression (generated shift/mask/or terms, all
literal shift amounts), so computing it over a 100 TB scan is one
whole-stage-codegen projection; the actual clustering is then
``repartitionByRange(zkey)`` before the write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit ``j`` of ``x`` lands at position ``2j``, bit ``j`` of ``y`` at
    ``2j+1`` — exactly ``plans.layout.zorder_key([x, y], bits)``
    (position ``i*n+j`` with n=2), so THE ONE n-dimensional
    implementation is the source of truth and a bit-order or validation
    fix cannot miss this 2-d convenience wrapper (review r5)."""
    from vectordb_data_ingestion_spark.plans.layout import zorder_key

    return zorder_key([x, y], bits)


def morton_key_sql(x: str, y: str, bits: int) -> str:
    """DuckDB mirror of :func:`morton_key` (delegates like it)."""
    from vectordb_data_ingestion_spark.plans.layout import zorder_key_sql

    return zorder_key_sql([x, y], bits)


def zorder_cluster(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 8,
    n_files: int = 64,
) -> DataFrame:
    """Attach the Morton key and range-cluster the frame into ``n_files``
    contiguous z-ranges (what a clustered write would put in one file
    each). Use as ``zorder_cluster(df, ...).write.parquet(...)`` — the
    range partitioner gives each output file a tight z-interval, hence a
    tight bounding box in both source dimensions."""
    keyed = df.withColumn("zkey", morton_key(x, y, bits))
    return keyed.repartitionByRange(n_files, F.col("zkey"))


def zone_map(df: DataFrame, file_col: str, stat_cols: list[str]) -> DataFrame:
    """Per-file min/max statistics ("zone map") for the given columns —
    the file-skipping metadata a lakehouse keeps per parquet file. One
    map-side-combined aggregate on the file id; output is
    files x stats, tiny by construction."""
    aggs = []
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.groupBy(file_col).agg(*aggs)
