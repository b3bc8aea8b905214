"""Gap-based sessionization over event streams and tables.

The reference has no event analytics at all (SURVEY.md §2.8 — nothing
beyond config-declared top-k), but a training-data pipeline needs user/doc
activity sessionization (e.g. to weight documents by engagement or build
per-session training examples). Two implementations with matching
semantics (both 1-based session indices; one documented streaming
approximation: a within-watermark late event EXTENDS the open session's
span, because state keeps a span rather than the event list — the batch
form is exact):

- :func:`sessionize` (batch): lag -> new-session flag -> running sum,
  all JVM window functions over one ``user_id`` shuffle. Scales linearly:
  partitions are per-user independent, AQE splits skewed users' *aggregate*
  phase, and nothing ever sits in Python.
- :func:`sessionize_stream` (streaming): the same gap rule as an
  ``applyInPandasWithState`` stateful operator — sessions close when the
  event-time gap exceeds ``gap_seconds`` or the watermark times the state
  out. This is the operator shape Structured Streaming cannot express with
  built-in windows (session windows with per-key custom aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """One row per (user, session): a session is a maximal run of events
    where consecutive gaps are <= ``gap_seconds``."""
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w_user = Window.partitionBy(user_col).orderBy(*order)
    w_run = w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w_user)
    is_new = F.when(
        prev_us.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev_us) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    flagged = events.withColumn("__new", is_new).withColumn(
        "session_idx", F.sum("__new").over(w_run).cast("int")
    )
    return flagged.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.round(F.sum(value_col), 4).alias("total_value"),
    )


def sessionize_sql(gap_seconds: int = 1800) -> str:
    """DuckDB oracle with identical semantics (epoch-microsecond gap test,
    same tiebreak ordering)."""
    gap_us = f"CAST({gap_seconds} AS BIGINT) * 1000000"
    return f"""
    WITH o AS (
      SELECT user_id, ts, event_id, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    f AS (
      SELECT *, CASE WHEN prev IS NULL
                     OR epoch_us(ts) - epoch_us(prev) > {gap_us}
                THEN 1 ELSE 0 END AS is_new
      FROM o
    ),
    s AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_idx
      FROM f
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, session_idx,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           ROUND(SUM(value), 4) AS total_value
    FROM s GROUP BY user_id, session_idx
    """


SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("start_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("session_idx", IntegerType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_idx", IntegerType()),
        StructField("n_events", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("total_value", DoubleType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``: per-user
    state carries the open session; a closed session is emitted when a gap
    exceeds ``gap_seconds`` within the data, or when the event-time timeout
    fires (watermark passed the open session's horizon)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state):
        user_id = key[0]
        if state.exists:
            last_us, start_us, n, total, idx = state.get
        else:
            # 1-based like the batch form's running-sum index
            last_us, start_us, n, total, idx = None, None, 0, 0.0, 1

        closed = []

        def close():
            nonlocal start_us, n, total, idx
            closed.append((user_id, idx, n, start_us, last_us, round(total, 4)))
            idx += 1
            n, total = 0, 0.0

        if state.hasTimedOut:
            if n:
                close()
            # KEEP the state (idx only): removing it restarted the next
            # session at the same index, emitting duplicate
            # (user_id, session_idx) keys that overwrite/double-join in
            # keyed sinks. Cost: ~40 bytes/user for the stream's
            # lifetime — the price of globally unique session keys.
            state.update((last_us, start_us, 0, 0.0, idx))
        else:
            batches = list(pdfs)
            rows = pd.concat(batches) if batches else pd.DataFrame()
            if not rows.empty:
                rows = rows.sort_values(["ts", "event_id"])
                for ts, value in zip(rows["ts"], rows["value"]):
                    us = int(ts.value // 1_000)  # pandas ns -> us
                    if last_us is not None and n and us - last_us > gap_us:
                        close()
                    if not n:
                        start_us = us
                        last_us = us
                    else:
                        # a within-watermark LATE event extends the open
                        # session's span — it must never regress last_us
                        # (which emitted session_end < session_start) or
                        # split the session on a negative "gap". State
                        # keeps a span, not the event list, so a late
                        # event older than start-gap merges instead of
                        # forming its own session (documented
                        # approximation; the batch form is exact).
                        start_us = min(start_us, us)
                        last_us = max(last_us, us)
                    n += 1
                    total += float(value)
            state.update((last_us, start_us, n, total, idx))
            if last_us is not None:
                state.setTimeoutTimestamp(
                    last_us // 1_000 + gap_seconds * 1_000
                )

        if closed:
            out = pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_idx",
                    "n_events",
                    "session_start",
                    "session_end",
                    "total_value",
                ],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
