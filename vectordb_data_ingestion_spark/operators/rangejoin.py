"""Binned (bucketed) range join.

"Right rows within a time window around each left row" - the pair-generating
sibling of the as-of join (operators/asof.py picks ONE most-recent row; this
keeps ALL rows in the interval). Needed for context windows ("clicks in the
5 minutes before each error"), interval containment, and temporal feature
aggregation.

Spark executes ``l JOIN r ON key AND r.ts BETWEEN l.ts - b AND l.ts + a`` as
an equi-join on key followed by a per-key *cross product* filtered late - a
hot key with 1M rows on both sides builds 10^12 pairs. The fix is the
standard binning trick (DuckDB/Photon "IEJoin"-adjacent, Databricks range-
join hints): quantize timestamps into fixed-width bins of exactly the window
width, equi-join on (key, bin) - each left row probes at most 2 bins - then
apply the exact BETWEEN on the tiny candidate set. Work scales with rows per
(key, bin), i.e. with data density in the window, never with per-key row
counts squared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    before_seconds: int = 300,
    after_seconds: int = 0,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with equal ``key_cols`` and
    ``right_ts`` in ``[left_ts - before_seconds, left_ts + after_seconds]``
    (inclusive). Output columns: keys, then left/right columns under their
    prefixes (timestamps as ``{prefix}ts``).

    Bin width is the full window span so each left row expands to at most 2
    bins; the right side is never duplicated.
    """
    width = int(before_seconds + after_seconds)
    if width <= 0:
        raise ValueError("window must have positive span")

    l_epoch = F.unix_timestamp(F.col(left_ts))
    r_epoch = F.unix_timestamp(F.col(right_ts))

    l_cols = [c for c in left.columns if c not in key_cols]
    r_cols = [c for c in right.columns if c not in key_cols]
    lhs = left.select(
        *key_cols,
        *[F.col(c).alias(f"{left_prefix}{c}" if c != left_ts else f"{left_prefix}ts") for c in l_cols],
        F.explode(
            F.sequence(
                F.floor((l_epoch - before_seconds) / width),
                F.floor((l_epoch + after_seconds) / width),
            )
        ).alias("__bin"),
    )
    rhs = right.select(
        *key_cols,
        *[F.col(c).alias(f"{right_prefix}{c}" if c != right_ts else f"{right_prefix}ts") for c in r_cols],
        F.floor(r_epoch / width).alias("__bin"),
    )
    lo = F.col(f"{left_prefix}ts") - F.expr(f"INTERVAL {int(before_seconds)} SECONDS")
    hi = F.col(f"{left_prefix}ts") + F.expr(f"INTERVAL {int(after_seconds)} SECONDS")
    return (
        lhs.join(rhs, [*key_cols, "__bin"])
        .filter(F.col(f"{right_prefix}ts").between(lo, hi))
        .drop("__bin")
    )


def interval_overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_seconds: int = 86400,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with equal ``key_cols`` whose time intervals
    overlap: ``left_start <= right_end AND right_start <= left_end``
    (inclusive) — the interval×interval sibling of :func:`range_join_binned`
    (point-in-window). Needed for session×incident attribution, campaign
    windows, and validity-interval reconciliation.

    Scale shape: a naive theta join is a per-key cross product. Here each
    side explodes its interval into the fixed-width time bins it covers and
    the join is an equi-join on ``(key, bin)``; work scales with co-located
    rows per bin, never per-key rows squared. An overlapping pair shares
    every bin between the later start and the earlier end, so to emit it
    exactly ONCE (without a distinct shuffle) we keep only the canonical
    shared bin — the later of the two start bins, which both sides cover
    whenever the intervals overlap. Exact overlap is then re-checked on the
    candidate set. Bin width trades duplication (long intervals explode
    into span/width bins) against candidate density; pick ~the typical
    interval span."""
    w = int(bin_seconds)
    if w <= 0:
        raise ValueError("bin_seconds must be positive")
    w_us = w * 1_000_000  # bins on epoch-µs so exact tests share the clock

    def bins(start: str, end: str):
        return F.sequence(
            F.floor(F.unix_micros(F.col(start)) / w_us),
            F.floor(F.unix_micros(F.col(end)) / w_us),
        )

    def prefixed(df: DataFrame, prefix: str):
        return [
            F.col(c).alias(f"{prefix}{c}")
            for c in df.columns
            if c not in key_cols
        ]

    lhs = left.select(
        *key_cols,
        *prefixed(left, left_prefix),
        F.explode(bins(left_start, left_end)).alias("__bin"),
    )
    rhs = right.select(
        *key_cols,
        *prefixed(right, right_prefix),
        F.explode(bins(right_start, right_end)).alias("__bin"),
    )
    ls = F.unix_micros(F.col(f"{left_prefix}{left_start}"))
    le = F.unix_micros(F.col(f"{left_prefix}{left_end}"))
    rs = F.unix_micros(F.col(f"{right_prefix}{right_start}"))
    re_ = F.unix_micros(F.col(f"{right_prefix}{right_end}"))
    return (
        lhs.join(rhs, [*key_cols, "__bin"])
        .filter(
            (
                F.col("__bin")
                == F.greatest(F.floor(ls / w_us), F.floor(rs / w_us))
            )
            & (ls <= re_)
            & (rs <= le)
        )
        .drop("__bin")
    )
