"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ingestion-spine query. ``queries()`` maps
operator names (SURVEY.md §2 inventory) to (spark, sf_dir) -> DataFrame
callables; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for each.
Column names and rounding are aligned on both sides because the driver's
compare hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vectordb_data_ingestion_spark import queries_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents -> clean -> chunk(overlap) -> token count ->
    deterministic chunk ids -> embedding join -> top-k by certainty."""
    return queries_catalog.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_catalog.SPARK_QUERIES


def oracle_sql() -> dict[str, str]:
    return queries_catalog.ORACLE_SQL
