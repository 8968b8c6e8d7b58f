"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``fstore_sql_spark.queries`` (analytics + event-store
operator surface) and ``fstore_sql_spark.operators`` (dedup / similarity /
text-analysis pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q1-shaped
    pricing summary (scan → codegen hash aggregate)."""
    from fstore_sql_spark.queries import QUERIES

    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import fstore_sql_spark.operators  # noqa: F401  (registers operator queries)
    from fstore_sql_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    import fstore_sql_spark.operators  # noqa: F401
    from fstore_sql_spark.queries import ORACLES

    return dict(ORACLES)
