"""Streaming joins: stream-stream interval join and stream-static
enrichment.

The reference's pipeline is batch-only; at scale the same click/purchase
correlation and catalog enrichment run continuously. Two shapes matter:

- :func:`stream_stream_interval_join` — both sides are streams; Spark keeps
  per-key state for the interval and needs BOTH a watermark on each side
  and a time-range join condition to know when state can be dropped
  (without the range bound the state grows forever — the classic
  stream-join OOM). This is the streaming form of the batch range join
  (operators/rangejoin.py).
- :func:`stream_static_enrich` — a stream joined to a (small) static
  dimension; Spark broadcasts the dim into every micro-batch, no state at
  all. The streaming form of the broadcast dim join every batch plan uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_seconds: int = 3600,
    watermark_delay: str = "10 minutes",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join each left event to the right-side events with the same ``key``
    whose timestamp falls in ``[left_ts - lookback, left_ts]`` — the
    "purchase within an hour before the click" correlation.

    Both sides are watermarked and the join condition carries the time
    range, so Spark bounds the per-key state to the lookback + watermark
    window and garbage-collects it as event time advances — the plan that
    runs forever without growing.
    """
    r = right.select(
        F.col(key).alias(f"{right_prefix}{key}"),
        F.col(right_ts).alias(f"{right_prefix}ts"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    )
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = r.withWatermark(f"{right_prefix}ts", watermark_delay)
    cond = (
        (F.col(key) == F.col(f"{right_prefix}{key}"))
        & (F.col(f"{right_prefix}ts") <= F.col(left_ts))
        & (
            F.col(f"{right_prefix}ts")
            >= F.col(left_ts) - F.expr(f"INTERVAL {int(lookback_seconds)} SECONDS")
        )
    )
    return lw.join(rw, cond, "inner").drop(f"{right_prefix}{key}")


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension table: the dim broadcasts
    into every micro-batch (stateless — nothing to watermark). Use for
    catalog/config lookups; re-start the query to pick up a new dim
    snapshot, or swap to foreachBatch + a refreshed view for hot reload."""
    return stream.join(broadcast(dim), key, how)
