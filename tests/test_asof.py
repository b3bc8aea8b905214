"""As-of join semantics: inclusive backward match, left-outer nulls,
tolerance, and per-key isolation (the oracle test covers the events-table
path against DuckDB's native ASOF JOIN)."""

from datetime import datetime

from vectordb_data_ingestion_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _run(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "id long, k long, ts timestamp")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, v double")
    out = asof_join(left, right, key_cols=["k"], **kw)
    return {r["id"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}


def test_backward_inclusive_match(spark):
    got = _run(
        spark,
        [(1, 7, _ts("2024-01-01 10:00:00")), (2, 7, _ts("2024-01-01 12:00:00"))],
        [
            (7, _ts("2024-01-01 09:00:00"), 1.0),
            (7, _ts("2024-01-01 10:00:00"), 2.0),  # ties with left id=1: inclusive
            (7, _ts("2024-01-01 11:00:00"), 3.0),
        ],
    )
    assert got[1] == (_ts("2024-01-01 10:00:00"), 2.0)
    assert got[2] == (_ts("2024-01-01 11:00:00"), 3.0)


def test_no_prior_row_is_null(spark):
    got = _run(
        spark,
        [(1, 7, _ts("2024-01-01 08:00:00"))],
        [(7, _ts("2024-01-01 09:00:00"), 1.0)],
    )
    assert got[1] == (None, None)


def test_keys_do_not_leak(spark):
    got = _run(
        spark,
        [(1, 7, _ts("2024-01-01 10:00:00")), (2, 8, _ts("2024-01-01 10:00:00"))],
        [(7, _ts("2024-01-01 09:00:00"), 1.0)],
    )
    assert got[1] == (_ts("2024-01-01 09:00:00"), 1.0)
    assert got[2] == (None, None)


def test_tolerance_nulls_stale_matches(spark):
    got = _run(
        spark,
        [(1, 7, _ts("2024-01-01 10:00:00")), (2, 7, _ts("2024-01-02 10:00:00"))],
        [(7, _ts("2024-01-01 09:30:00"), 1.0)],
        tolerance_seconds=3600,
    )
    assert got[1] == (_ts("2024-01-01 09:30:00"), 1.0)  # 30 min old: kept
    assert got[2] == (None, None)  # >1h old: nulled


def test_plan_has_no_inequality_join(spark):
    """The whole point: one key shuffle, zero join nodes in the plan."""
    left = spark.createDataFrame([(1, 7, _ts("2024-01-01 10:00:00"))], "id long, k long, ts timestamp")
    right = spark.createDataFrame([(7, _ts("2024-01-01 09:00:00"), 1.0)], "k long, ts timestamp, v double")
    plan = asof_join(left, right, key_cols=["k"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_forward_inclusive_match(spark):
    got = _run(
        spark,
        [(1, 7, _ts("2024-01-01 10:00:00")), (2, 7, _ts("2024-01-01 11:30:00"))],
        [
            (7, _ts("2024-01-01 10:00:00"), 1.0),  # ties with left id=1: inclusive
            (7, _ts("2024-01-01 12:00:00"), 2.0),
        ],
        direction="forward",
    )
    assert got[1] == (_ts("2024-01-01 10:00:00"), 1.0)
    assert got[2] == (_ts("2024-01-01 12:00:00"), 2.0)


def test_forward_no_later_row_is_null(spark):
    got = _run(
        spark,
        [(1, 7, _ts("2024-01-01 13:00:00"))],
        [(7, _ts("2024-01-01 12:00:00"), 1.0)],
        direction="forward",
    )
    assert got[1] == (None, None)


def test_nearest_picks_closer_side_and_ties_backward(spark):
    right = [
        (7, _ts("2024-01-01 09:00:00"), 1.0),
        (7, _ts("2024-01-01 12:00:00"), 2.0),
    ]
    got = _run(
        spark,
        [
            (1, 7, _ts("2024-01-01 09:30:00")),  # closer to 09:00 backward
            (2, 7, _ts("2024-01-01 11:45:00")),  # closer to 12:00 forward
            (3, 7, _ts("2024-01-01 10:30:00")),  # equidistant -> backward
            (4, 7, _ts("2024-01-01 08:00:00")),  # only forward exists
        ],
        right,
        direction="nearest",
    )
    assert got[1] == (_ts("2024-01-01 09:00:00"), 1.0)
    assert got[2] == (_ts("2024-01-01 12:00:00"), 2.0)
    assert got[3] == (_ts("2024-01-01 09:00:00"), 1.0)
    assert got[4] == (_ts("2024-01-01 09:00:00"), 1.0)


def test_nearest_tolerance_each_direction(spark):
    got = _run(
        spark,
        [(1, 7, _ts("2024-01-01 10:00:00")), (2, 7, _ts("2024-01-03 10:00:00"))],
        [
            (7, _ts("2024-01-01 09:30:00"), 1.0),
            (7, _ts("2024-01-04 12:00:00"), 2.0),
        ],
        direction="nearest",
        tolerance_seconds=3600,
    )
    assert got[1] == (_ts("2024-01-01 09:30:00"), 1.0)  # within 1h backward
    assert got[2] == (None, None)  # both candidates out of tolerance


def test_asof_null_right_values_are_matched_not_skipped(spark):
    """A matched right row whose value is legitimately NULL must yield
    NULL (pandas merge_asof parity), not resurrect a stale value from an
    older right row (the per-column last(ignorenulls) bug)."""
    from datetime import datetime

    from vectordb_data_ingestion_spark.operators.asof import asof_join

    t0, t1 = datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 11, 0)
    l_mid, l_late = datetime(2024, 1, 1, 10, 30), datetime(2024, 1, 1, 11, 30)
    right = spark.createDataFrame([(1, t0, 5.0), (1, t1, None)], ["k", "ts", "v"])
    left = spark.createDataFrame([(1, l_mid), (1, l_late)], ["k", "ts"])

    out_b = {
        r["ts"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(left, right, ["k"]).collect()
    }
    assert out_b[l_mid] == (t0, 5.0)
    assert out_b[l_late] == (t1, None)  # NOT (t1, 5.0)

    out_f = {
        r["ts"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(left, right, ["k"], direction="forward").collect()
    }
    assert out_f[l_mid] == (t1, None)

    out_n = {
        r["ts"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(left, right, ["k"], direction="nearest").collect()
    }
    assert out_n[l_late] == (t1, None)
    assert out_n[l_mid] == (t0, 5.0)  # tie -> backward
