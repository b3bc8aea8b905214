"""Cluster/shuffle sizing advisor.

At 100 TB the two knobs that decide whether a job runs or spills are
``spark.sql.shuffle.partitions`` (post-shuffle partition count) and
``spark.sql.files.maxPartitionBytes`` (scan split size). AQE coalesces
*down* at runtime, but it cannot split an under-partitioned exchange without
``advisoryPartitionSizeInBytes`` headroom, and the scan side is fixed at
planning time — so a job still needs a sane starting point derived from the
data volume, not a hardcoded 200.

:func:`recommend` turns (input bytes, executor memory/cores) into concrete
conf values using the standard rules of thumb:

- post-shuffle partitions sized so each holds ``target_partition_bytes``
  (default 128 MiB) of *shuffle* data (estimated via ``shuffle_ratio`` of
  input — joins/aggs usually move less than they read after pushdown and
  partial aggregation),
- never fewer than ``2 x total cores`` (keep every core busy through
  stragglers) and never so many that per-task overhead dominates,
- scan splits sized so one split's decompressed working set (~3x the
  on-disk parquet bytes for typical text/snappy) fits the per-core memory
  share with a 4x safety factor.

:func:`table_bytes` reads the real on-disk size; :func:`apply` sets the
runtime-settable confs on the live session. Everything is a pure
deterministic function of its inputs — unit-testable without a cluster.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

_MIB = 1 << 20


@dataclass(frozen=True)
class SizingPlan:
    shuffle_partitions: int
    max_partition_bytes: int
    advisory_partition_bytes: int
    est_shuffle_bytes: int
    notes: str


def table_bytes(paths: str | list[str]) -> int:
    """Total on-disk bytes of the given parquet file/dir paths."""
    if isinstance(paths, str):
        paths = [paths]
    total = 0
    for p in paths:
        if os.path.isfile(p):
            total += os.path.getsize(p)
        else:
            for root, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
    return total


def recommend(
    input_bytes: int,
    total_cores: int,
    executor_mem_bytes: int,
    cores_per_executor: int = 4,
    target_partition_bytes: int = 128 * _MIB,
    shuffle_ratio: float = 0.5,
    decompress_factor: float = 3.0,
    mem_safety: float = 4.0,
    max_task_waves: int = 2000,
) -> SizingPlan:
    """Derive shuffle/scan sizing from data volume and cluster shape.

    ``shuffle_ratio`` estimates shuffled bytes as a fraction of input after
    column pruning / pushdown / map-side partial aggregation; use 1.0 for a
    raw repartition of everything, ~0.1 for a heavily pre-aggregated rollup.

    The partition count is clamped to ``max_task_waves × total_cores``
    (scheduler/launch overhead of ~10 ms/task dominates past a few thousand
    waves); when the ceiling binds, each partition simply carries more than
    ``target_partition_bytes`` and the note says so — the honest alternative
    is a bigger cluster, not a million micro-tasks.
    """
    if input_bytes < 0 or total_cores <= 0 or executor_mem_bytes <= 0:
        raise ValueError("sizes and cores must be positive")
    est_shuffle = int(input_bytes * shuffle_ratio)

    by_volume = max(1, -(-est_shuffle // target_partition_bytes))
    floor_parts = 2 * total_cores
    ceiling = max_task_waves * total_cores
    shuffle_parts = max(min(by_volume, ceiling), floor_parts)

    # scan split: one task's decompressed split must fit its memory share
    per_core_mem = executor_mem_bytes / max(1, cores_per_executor)
    mem_cap = int(per_core_mem / (decompress_factor * mem_safety))
    max_split = max(8 * _MIB, min(target_partition_bytes, mem_cap))

    capped = " (CAPPED at max_task_waves x cores — partitions oversize)" if by_volume > ceiling else ""
    notes = (
        f"volume wants {by_volume} post-shuffle partitions{capped}, "
        f"core floor is {floor_parts}; split capped at "
        f"{max_split // _MIB} MiB so a ~{decompress_factor:.0f}x decompressed "
        f"split stays under 1/{mem_safety:.0f} of the per-core share"
    )
    return SizingPlan(
        shuffle_partitions=shuffle_parts,
        max_partition_bytes=max_split,
        advisory_partition_bytes=target_partition_bytes,
        est_shuffle_bytes=est_shuffle,
        notes=notes,
    )


def apply(spark: SparkSession, plan: SizingPlan) -> None:
    """Set the runtime-settable confs from a :class:`SizingPlan` (scan split
    size is read at planning time of the NEXT query, shuffle partitions at
    its first exchange; AQE keeps the advisory size for runtime coalesce)."""
    spark.conf.set("spark.sql.shuffle.partitions", str(plan.shuffle_partitions))
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(plan.max_partition_bytes)
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        str(plan.advisory_partition_bytes),
    )
