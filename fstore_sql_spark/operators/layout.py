"""Data-layout operators — multi-dimensional clustering (Z-order) and the
locality statistics that justify it.

At 100 TB the dominant cost of every query is how much of the table the
scan can SKIP.  One-dimensional sort keys (the reference's B-tree
`decider_index`, /root/reference/schema.sql:56) prune one predicate
dimension; interleaving the bits of two key columns (Morton / Z-order)
gives every file tight min/max ranges on BOTH dimensions at once, so
parquet row-group stats prune 2-D predicates (customer × date, decider ×
offset) without a second copy of the data.

Everything here is integer bit arithmetic — expressible identically in
Spark SQL and the DuckDB oracle (both support `>>`, `<<`, `&`), so the
layout math itself is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fstore_sql_spark.queries import load, query

_BITS = 16


def _interleave_sql(x: str, y: str, bits: int = _BITS) -> str:
    """Morton interleave as a SQL expression string valid in BOTH Spark SQL
    and DuckDB: z = Σᵢ ((x>>i)&1)<<2i  |  ((y>>i)&1)<<2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_key(x: str, y: str, bits: int = _BITS):
    """Z-order (Morton) key column from two non-negative integer columns —
    the portable form of clustered multi-dim layout: write with
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` and every
    parquet row-group gets bounded ranges in BOTH source dimensions."""
    return F.expr(_interleave_sql(x, y, bits))


_ZSQL = _interleave_sql("o_custkey % 65536", "day_nr % 65536")


@query(
    "zorder_bucket_stats",
    f"""
    WITH o AS (
        SELECT o_custkey,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                   AS day_nr
        FROM orders
    ),
    z AS (
        SELECT o_custkey, day_nr, {_ZSQL} AS zkey FROM o
    )
    SELECT CAST(zkey >> 16 AS BIGINT) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_custkey) AS BIGINT) AS min_cust,
           CAST(MAX(o_custkey) AS BIGINT) AS max_cust,
           CAST(MIN(day_nr) AS BIGINT) AS min_day,
           CAST(MAX(day_nr) AS BIGINT) AS max_day
    FROM z GROUP BY 1
    """,
)
def zorder_bucket_stats(spark, sf_dir):
    """Z-order locality report: bucket orders by the high bits (>>16) of the
    Morton key of (customer, order-day) and report each bucket's min/max
    in BOTH dimensions — the numbers a layout job checks before committing
    a rewrite (tight per-bucket ranges ⇒ row-group stats will prune both
    customer and date predicates).  The interleave is 32 add/shift/mask
    terms of whole-stage-codegen integer math on the scan side; one hash
    aggregate total."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("day_nr"),
    )
    z = o.withColumn("zkey", zorder_key("o_custkey % 65536", "day_nr % 65536"))
    return z.groupBy(
        F.shiftright("zkey", 16).cast("long").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_custkey").alias("min_cust"),
        F.max("o_custkey").alias("max_cust"),
        F.min("day_nr").alias("min_day"),
        F.max("day_nr").alias("max_day"),
    )


def write_zordered(
    df: DataFrame, path: str, x: str, y: str, n_files: int, mode: str = "overwrite"
) -> None:
    """Write a table Z-ordered on (x, y): range-partition by the Morton
    key (contiguous z-ranges per file), sort within each file, so parquet
    min/max stats on BOTH x and y are tight per row-group."""
    zed = df.withColumn("__zkey", zorder_key(x, y))
    (
        zed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
