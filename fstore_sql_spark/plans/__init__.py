"""Physical-plan inspection and assertion helpers.

The reference delegates physical planning to PostgreSQL (SURVEY.md §4); on
Spark the analogous guarantees — filters reaching the parquet scan, small
dimensions broadcast, bounded shuffle counts, whole-stage codegen coverage —
are properties of the Catalyst physical plan.  This module makes those
properties *testable* so every operator's scale posture is pinned by a unit
test instead of being re-checked by hand with ``.explain()``.
"""

from fstore_sql_spark.plans.inspect import (
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    formatted_plan,
    pushed_filters,
    scan_columns,
    shuffle_exchange_count,
    sort_merge_join_count,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "scan_columns",
    "exchange_count",
    "shuffle_exchange_count",
    "broadcast_join_count",
    "sort_merge_join_count",
    "codegen_span_count",
]
