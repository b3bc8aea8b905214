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
right payload forward as ONE struct (``last(struct, ignorenulls=True)``
over ``rowsBetween(unboundedPreceding, currentRow)`` - null only for left
rows, so a matched row's own NULL fields ride inside the struct instead of
being skipped for a stale older value). Cost: ONE shuffle of
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
    direction: str = "backward",
) -> DataFrame:
    """For each left row: columns of the single matching right row with
    equal ``key_cols``, or nulls when no such row exists (left-outer
    semantics). ``direction`` picks the match (pandas ``merge_asof``
    parity):

    - ``"backward"`` (default): most recent right row with
      ``right_ts <= left_ts`` (inclusive).
    - ``"forward"``: earliest right row with ``right_ts >= left_ts`` —
      the same one-shuffle union-window plan with the ordering reversed.
    - ``"nearest"``: whichever of the two is closer in absolute time;
      exact ties go to the backward match (pandas tie rule). Costs the
      same single shuffle — both directional windows run over one
      partitioning/sort pass (the forward window's reversed sort is a
      second in-partition sort, not a second exchange).

    ``right`` must be unique per (key, ts) - pre-aggregate if it is not,
    otherwise the match at one instant is ambiguous. Matched columns are
    ``{prefix}ts`` plus ``{prefix}{col}`` for each of ``right_value_cols``.
    ``tolerance_seconds`` nulls out matches farther than the window (pandas
    ``merge_asof(tolerance=...)`` semantics, applied in the match
    direction).
    """
    if direction == "nearest":
        return _asof_nearest(
            left, right, key_cols, left_ts, right_ts, right_value_cols,
            tolerance_seconds, prefix,
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in (*key_cols, right_ts)
        ]

    merged = _tag_union(left, right, key_cols, left_ts, right_ts, right_value_cols)
    w = _directional_window(key_cols, direction)
    # the matched row travels as ONE struct: per-column
    # last(value, ignorenulls) would skip a matched right row whose value
    # is legitimately NULL and resurrect a STALE value from an older row,
    # decoupling it from the matched ts (pandas merge_asof returns NaN).
    # The struct is non-null exactly for right rows, so ignorenulls skips
    # left rows only and NULL fields ride inside the match atomically.
    matched = F.last(
        F.when(F.col("__side") == 0, _payload(right_value_cols)),
        ignorenulls=True,
    ).over(w)
    out = merged.withColumn("__m", matched)
    out = out.withColumn(f"{prefix}ts", F.col("__m.ts"))
    for c in right_value_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"__m.{c}"))
    out = out.drop("__m")

    if tolerance_seconds is not None:
        # materialize the flag BEFORE nulling: the first null-out rewrites
        # {prefix}ts, which the predicate reads
        interval = F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
        stale = (
            F.col(f"{prefix}ts") < F.col("__ts") - interval
            if direction == "backward"
            else F.col(f"{prefix}ts") > F.col("__ts") + interval
        )
        out = out.withColumn("__stale", stale)
        for c in [f"{prefix}ts", *[f"{prefix}{c}" for c in right_value_cols]]:
            out = out.withColumn(
                c, F.when(F.col("__stale"), F.lit(None)).otherwise(F.col(c))
            )
        out = out.drop("__stale")

    return out.filter(F.col("__side") == 1).drop(
        "__ts", "__side", *[f"__r_{c}" for c in right_value_cols]
    )


def _payload(right_value_cols):
    return F.struct(
        F.col("__ts").alias("ts"),
        *[F.col(f"__r_{c}").alias(c) for c in right_value_cols],
    )


def _tag_union(left, right, key_cols, left_ts, right_ts, right_value_cols):
    r = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    l = left.select(
        "*", F.col(left_ts).alias("__ts"), F.lit(1).alias("__side")
    )
    return l.unionByName(r, allowMissingColumns=True)


def _directional_window(key_cols, direction):
    order = (
        [F.col("__ts").asc(), F.col("__side").asc()]
        if direction == "backward"
        # forward: scan from the future toward the past; right rows first
        # at equal ts keeps the match inclusive in both directions
        else [F.col("__ts").desc(), F.col("__side").asc()]
    )
    return (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def _asof_nearest(
    left, right, key_cols, left_ts, right_ts, right_value_cols,
    tolerance_seconds, prefix,
):
    """Nearest-match as-of: backward and forward candidates from TWO windows
    over the SAME (key) partitioning — one exchange, two in-partition sorts
    — then a per-row pick of the closer candidate (ties -> backward)."""
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in (*key_cols, right_ts)
        ]
    merged = _tag_union(left, right, key_cols, left_ts, right_ts, right_value_cols)
    wb = _directional_window(key_cols, "backward")
    wf = _directional_window(key_cols, "forward")

    out = merged
    for tag, w in (("b", wb), ("f", wf)):
        # struct payload (see asof_join): the match is atomic, so a NULL
        # value field never decouples from its matched ts
        out = out.withColumn(
            f"__{tag}",
            F.last(
                F.when(F.col("__side") == 0, _payload(right_value_cols)),
                ignorenulls=True,
            ).over(w),
        )
        out = out.withColumn(f"__{tag}_ts", F.col(f"__{tag}.ts"))
        for c in right_value_cols:
            out = out.withColumn(f"__{tag}_{c}", F.col(f"__{tag}.{c}"))
        out = out.drop(f"__{tag}")

    if tolerance_seconds is not None:
        interval = F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
        b_bad = F.col("__b_ts") < F.col("__ts") - interval
        f_bad = F.col("__f_ts") > F.col("__ts") + interval
        for tag, bad in (("b", b_bad), ("f", f_bad)):
            cols = [f"__{tag}_ts", *[f"__{tag}_{c}" for c in right_value_cols]]
            flag = f"__{tag}_stale"
            out = out.withColumn(flag, bad)
            for c in cols:
                out = out.withColumn(
                    c, F.when(F.col(flag), F.lit(None)).otherwise(F.col(c))
                )
            out = out.drop(flag)

    use_backward = F.when(F.col("__f_ts").isNull(), F.lit(True)).otherwise(
        F.when(F.col("__b_ts").isNull(), F.lit(False)).otherwise(
            # tie -> backward, the pandas merge_asof(nearest) rule;
            # unix_micros, not cast(long): the cast truncates to seconds
            (F.unix_micros("__ts") - F.unix_micros("__b_ts"))
            <= (F.unix_micros("__f_ts") - F.unix_micros("__ts"))
        )
    )
    out = out.withColumn("__use_b", use_backward)
    out = out.withColumn(
        f"{prefix}ts",
        F.when(F.col("__use_b"), F.col("__b_ts")).otherwise(F.col("__f_ts")),
    )
    for c in right_value_cols:
        out = out.withColumn(
            f"{prefix}{c}",
            F.when(F.col("__use_b"), F.col(f"__b_{c}")).otherwise(
                F.col(f"__f_{c}")
            ),
        )
    drop = (
        ["__ts", "__side", "__use_b"]
        + [f"__r_{c}" for c in right_value_cols]
        + [f"__{t}_ts" for t in ("b", "f")]
        + [f"__{t}_{c}" for t in ("b", "f") for c in right_value_cols]
    )
    return out.filter(F.col("__side") == 1).drop(*drop)
