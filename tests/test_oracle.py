"""Mirror of the driver's correctness gate: every registered query's Spark
result must match its DuckDB oracle (row count + columns + multiset of
normalized values) on the driver's parquet tables."""

import os

import pytest

from tests.conftest import SF_MED, SF_SMALL, assert_matches_oracle
from vectordb_data_ingestion_spark import queries_catalog

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMALL)

ORACLE_KEYS = sorted(queries_catalog.ORACLE_SQL.keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, name):
    assert_matches_oracle(
        spark,
        name,
        queries_catalog.SPARK_QUERIES[name],
        queries_catalog.ORACLE_SQL[name],
        SF_DIR,
    )


def test_all_queries_have_callables():
    for name in queries_catalog.ORACLE_SQL:
        assert name in queries_catalog.SPARK_QUERIES


def test_flagship_entry(spark):
    df = queries_catalog.flagship(spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"q_id", "chunk_id", "certainty"}
