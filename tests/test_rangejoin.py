"""Binned range join: window boundary semantics and the no-cross-product
plan guarantee (the oracle test covers the events path against a DuckDB
inequality join)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.operators.rangejoin import range_join_binned


def _ts(s):
    return datetime.fromisoformat(s)


def _pairs(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "id long, k long, ts timestamp")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, v double")
    out = range_join_binned(left, right, key_cols=["k"], **kw)
    return sorted((r["l_id"], r["r_v"]) for r in out.collect())


def test_inclusive_window_boundaries(spark):
    got = _pairs(
        spark,
        [(1, 7, _ts("2024-01-01 10:05:00"))],
        [
            (7, _ts("2024-01-01 09:59:59"), 1.0),  # 301s before: out
            (7, _ts("2024-01-01 10:00:00"), 2.0),  # exactly 300s: in
            (7, _ts("2024-01-01 10:03:00"), 3.0),  # inside
            (7, _ts("2024-01-01 10:05:00"), 4.0),  # equal ts: in (after=0)
            (7, _ts("2024-01-01 10:05:01"), 5.0),  # after: out
        ],
        before_seconds=300,
    )
    assert got == [(1, 2.0), (1, 3.0), (1, 4.0)]


def test_symmetric_window_and_key_isolation(spark):
    got = _pairs(
        spark,
        [(1, 7, _ts("2024-01-01 10:00:00")), (2, 8, _ts("2024-01-01 10:00:00"))],
        [
            (7, _ts("2024-01-01 09:59:30"), 1.0),
            (7, _ts("2024-01-01 10:00:30"), 2.0),
            (8, _ts("2024-01-01 09:59:30"), 3.0),
        ],
        before_seconds=60,
        after_seconds=60,
    )
    assert got == [(1, 1.0), (1, 2.0), (2, 3.0)]


def test_bins_never_triplicate_pairs(spark):
    # a right row exactly on a bin edge must appear once, not per probed bin
    got = _pairs(
        spark,
        [(1, 7, _ts("2024-01-01 10:05:00"))],
        [(7, _ts("2024-01-01 10:05:00"), 1.0)],
        before_seconds=300,
    )
    assert got == [(1, 1.0)]


def test_zero_span_rejected(spark):
    left = spark.createDataFrame([], "id long, k long, ts timestamp")
    with pytest.raises(ValueError):
        range_join_binned(left, left, ["k"], before_seconds=0, after_seconds=0)


def test_plan_is_equi_join(spark):
    left = spark.createDataFrame([(1, 7, _ts("2024-01-01 10:00:00"))], "id long, k long, ts timestamp")
    right = spark.createDataFrame([(7, _ts("2024-01-01 09:59:00"), 1.0)], "k long, ts timestamp, v double")
    plan = (
        range_join_binned(left, right, ["k"], before_seconds=300)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_matches_naive(spark):
    """Binned canonical-bin plan vs the naive theta join on intervals that
    span multiple bins, touch at exact boundaries, and nest — every pair
    exactly once."""
    from vectordb_data_ingestion_spark.operators.rangejoin import (
        interval_overlap_join_binned,
    )

    left = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:00:00", "2024-01-03 12:00:00"),  # 3 bins
            (1, 11, "2024-01-05 00:00:00", "2024-01-05 01:00:00"),
            (2, 20, "2024-01-02 00:00:00", "2024-01-02 00:00:01"),
        ],
        "user_id long, l_id long, s string, e string",
    ).select(
        "user_id",
        "l_id",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    right = spark.createDataFrame(
        [
            (1, 100, "2024-01-02 06:00:00", "2024-01-04 00:00:00"),  # overlaps 10
            (1, 101, "2024-01-03 12:00:00", "2024-01-03 13:00:00"),  # touches 10's end
            (1, 102, "2024-01-05 01:00:00", "2024-01-05 02:00:00"),  # touches 11's end
            (1, 103, "2024-01-06 00:00:00", "2024-01-07 00:00:00"),  # no overlap
            (2, 200, "2024-01-01 00:00:00", "2024-01-09 00:00:00"),  # spans 20
        ],
        "user_id long, r_id long, s string, e string",
    ).select(
        "user_id",
        "r_id",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    got = sorted(
        (r["user_id"], r["l_l_id"], r["r_r_id"])
        for r in interval_overlap_join_binned(
            left, right, ["user_id"], "s", "e", "s", "e", bin_seconds=86400
        ).collect()
    )
    l, r = left.alias("l"), right.alias("r")
    naive = sorted(
        (row["user_id"], row["l_id"], row["r_id"])
        for row in l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("l.s") <= F.col("r.e"))
            & (F.col("r.s") <= F.col("l.e")),
        )
        .select(F.col("l.user_id"), "l_id", "r_id")
        .collect()
    )
    assert got == naive
    assert (1, 10, 100) in got and (1, 10, 101) in got
    assert (1, 11, 102) in got and (2, 20, 200) in got
    assert all(p[2] != 103 for p in got)
