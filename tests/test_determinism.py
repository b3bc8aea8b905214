"""Partition-invariance sweep: the driver runs every query under ITS OWN
session config (different shuffle-partition count, different input-split
sizing), so a query whose result multiset depends on partitioning would pass
the local oracle mirror and still fail the driver's hash compare. Run every
registered query under two shuffle-partition settings and require identical
result multisets — catches limit-without-total-order, first()/head-style
picks, and accidental reliance on task ordering.

Float columns are compared exactly (not rounded): a float whose VALUE depends
on partition count (summation-order-sensitive aggregation) is itself a bug —
every aggregate here is designed to accumulate in integers or round after a
deterministic reduction.
"""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_SMALL
from vectordb_data_ingestion_spark import queries_catalog


def test_all_queries_partition_invariant(spark):
    original = spark.conf.get("spark.sql.shuffle.partitions")
    offenders = []
    try:
        for name, fn in queries_catalog.SPARK_QUERIES.items():
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = Counter(tuple(r) for r in fn(spark, SF_SMALL).collect())
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = Counter(tuple(r) for r in fn(spark, SF_SMALL).collect())
            if a != b:
                offenders.append(name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert offenders == [], f"partition-dependent results: {offenders}"
