"""Physical-plan introspection and data-layout helpers.

The reference executes eagerly with no plan at all (SURVEY.md §4); in this
engine the physical plan IS the performance contract, so we make it a
first-class, testable object: ``inspect`` reads executed plans (broadcast
vs. shuffle joins, map-side window group limits, scan column pruning,
pushed filters) and ``layout`` shapes data so the best plans stay available
at 100 TB (bucketed writes for shuffle-free joins, salting for skew).
"""

from vectordb_data_ingestion_spark.plans.inspect import (
    count_exchanges,
    has_node,
    physical_plan,
    scan_columns,
)
from vectordb_data_ingestion_spark.plans.sizing import (
    SizingPlan,
    recommend,
    table_bytes,
)
from vectordb_data_ingestion_spark.plans.layout import (
    salted_agg,
    salted_join,
    write_bucketed,
)

__all__ = [
    "physical_plan",
    "count_exchanges",
    "has_node",
    "scan_columns",
    "salted_agg",
    "salted_join",
    "write_bucketed",
    "SizingPlan",
    "recommend",
    "table_bytes",
]
