"""Read a DataFrame's physical plan as data, so tests can pin the plans
that matter at scale (a broadcast join silently degrading to sort-merge, a
pruned scan silently widening, a map-side top-k disappearing) instead of
only pinning result values."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The (pre-AQE-final) executed plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def has_node(df: DataFrame, node: str) -> bool:
    """True if the physical plan contains ``node`` (e.g. 'BroadcastHashJoin',
    'WindowGroupLimit', 'Exchange')."""
    return node in physical_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges). Every one
    is a full network re-distribution at scale — fewer is better."""
    plan = physical_plan(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange SinglePartition", plan))


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each FileScan — the column-pruning
    ground truth. A 2-column projection reading 10 columns is a bug."""
    plan = physical_plan(df)
    out = []
    for m in re.finditer(r"FileScan \w+ \[([^\]]*)\]", plan):
        cols = [c.split("#")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """DataFilters/PushedFilters entries per scan (predicate-pushdown ground
    truth)."""
    plan = physical_plan(df)
    return re.findall(r"(?:Pushed|Data)Filters: \[([^\]]*)\]", plan)


def scan_schemas(df: DataFrame) -> list[list[str]]:
    """Exact column lists every parquet scan reads FROM DATA FILES, taken
    from the scan NODE's ``requiredSchema`` object — not the printed plan
    (the printer truncates long ReadSchema lines mid-struct and any text
    parser then miscounts: the round-3 PLANS.md width artifact), and not
    the node's output schema (which appends partition-directory and
    ``_metadata`` columns that cost no file I/O). Falls back to the output
    schema for scan nodes without ``requiredSchema`` (DSv2 BatchScan).
    Order matches plan traversal; use for pinning pruning in tests."""
    leaves = df._jdf.queryExecution().sparkPlan().collectLeaves()
    out = []
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if "Scan parquet" in leaf.nodeName():
            try:
                schema = leaf.requiredSchema()
            except Exception:
                schema = leaf.schema()
            out.append(
                [schema.apply(j).name() for j in range(schema.size())]
            )
    return out


def scan_widths(df: DataFrame) -> list[int]:
    """Column count per parquet scan — see :func:`scan_schemas`."""
    return [len(c) for c in scan_schemas(df)]
