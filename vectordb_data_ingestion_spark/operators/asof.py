"""Point-in-time (as-of) join.

The reference's incremental refresh compares file timestamps row-by-row
(sharepointutils.py:169-186); the general shape a training-data pipeline
needs is the *as-of join*: for every left row, the single most recent right
row with the same key at-or-before the left row's timestamp (feature lookups,
"state as of event time", slowly-changing-dimension reads).

Spark has no ASOF JOIN operator. The naive encoding
``left.join(right, key AND right.ts <= left.ts)`` + window-top-1 explodes:
every left row pairs with its *entire* right history before the filter, and
an inequality predicate forces a broadcast-nested-loop or unbounded
sort-merge-range join.

This implementation never builds those pairs. Both sides are tagged and
unioned, then a single window per key - ordered by (ts, side) with right
rows sorting first at equal timestamps, so the match is inclusive like
DuckDB/pandas ``merge_asof(direction='backward')`` - carries the last
non-null right payload forward (``last(..., ignorenulls=True)`` over
``rowsBetween(unboundedPreceding, currentRow)``). Cost: ONE shuffle of
left+right on the key, O(n log n) per partition sort, no pair blowup -
the same plan shape whether the right history has 10 or 10M rows per key.
Skewed keys split via AQE like any other single-key shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row: columns of the most recent right row with equal
    ``key_cols`` and ``right_ts <= left_ts`` (inclusive), or nulls when no
    such row exists (left-outer semantics).

    ``right`` must be unique per (key, ts) - pre-aggregate if it is not,
    otherwise the match at one instant is ambiguous. Matched columns are
    ``{prefix}ts`` plus ``{prefix}{col}`` for each of ``right_value_cols``.
    ``tolerance_seconds`` nulls out matches older than the window (pandas
    ``merge_asof(tolerance=...)`` semantics).
    """
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in (*key_cols, right_ts)
        ]

    r = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    l = left.select(
        "*", F.col(left_ts).alias("__ts"), F.lit(1).alias("__side")
    )
    merged = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched_ts = F.last(
        F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
    ).over(w)
    out = merged.withColumn(f"{prefix}ts", matched_ts)
    for c in right_value_cols:
        out = out.withColumn(
            f"{prefix}{c}",
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w),
        )

    if tolerance_seconds is not None:
        # materialize the flag BEFORE nulling: the first null-out rewrites
        # {prefix}ts, which the predicate reads
        out = out.withColumn(
            "__stale",
            F.col(f"{prefix}ts")
            < F.col("__ts") - F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS"),
        )
        for c in [f"{prefix}ts", *[f"{prefix}{c}" for c in right_value_cols]]:
            out = out.withColumn(
                c, F.when(F.col("__stale"), F.lit(None)).otherwise(F.col(c))
            )
        out = out.drop("__stale")

    return out.filter(F.col("__side") == 1).drop(
        "__ts", "__side", *[f"__r_{c}" for c in right_value_cols]
    )
