"""Scalar function library — Spark equivalents of every scalar function the
reference uses (SURVEY.md §2.2 scalar table), as composable Column helpers.

All JVM-side built-ins (no Python UDFs): each helper returns a Column
expression that stays inside whole-stage codegen.
"""

from fstore_sql_spark.functions.scalars import (
    deterministic_uuid,
    epoch_seconds,
    json_get,
    json_object,
    lease_until,
    new_uuid,
)

__all__ = [
    "deterministic_uuid",
    "new_uuid",
    "json_get",
    "json_object",
    "lease_until",
    "epoch_seconds",
]
