"""Binned range join: window boundary semantics and the no-cross-product
plan guarantee (the oracle test covers the events path against a DuckDB
inequality join)."""

from datetime import datetime

import pytest

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
