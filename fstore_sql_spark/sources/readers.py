"""Ingest readers for client-supplied event batches + a rate-source
generator for streaming tests.

The reference's only ingress is the SQL wire protocol (README.md:46); a
Spark engine additionally ingests files.  An *event batch* file carries the
client-supplied half of the events schema (SURVEY.md §2.1 A2 signature) —
the engine assigns ``offset``, ``created_at`` and ``transaction_id`` at
append time, so those columns never appear in ingest files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def event_batch_schema() -> StructType:
    """The client-supplied columns of ``append_event`` (schema.sql:336-343):
    everything the API takes, nothing the engine assigns."""
    return StructType(
        [
            StructField("event", StringType(), False),
            StructField("event_id", StringType(), False),
            StructField("event_version", LongType(), True),
            StructField("decider", StringType(), False),
            StructField("decider_id", StringType(), False),
            StructField("data", StringType(), True),
            StructField("command_id", StringType(), True),
            StructField("previous_id", StringType(), True),
            StructField("final", BooleanType(), True),
        ]
    )


def read_event_batches_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines event batches with the fixed schema (no inference pass);
    malformed rows are quarantined in ``_corrupt_record`` rather than
    failing the batch (PERMISSIVE), so one bad producer row can't poison a
    100 TB ingest."""
    schema = event_batch_schema().add("_corrupt_record", StringType(), True)
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_event_batches_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    return (
        spark.read.schema(event_batch_schema())
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def rate_events(
    spark: SparkSession,
    rows_per_second: int = 10,
    n_partitions: int = 8,
    decider: str = "rate",
) -> DataFrame:
    """Synthetic streaming event source built on the built-in ``rate``
    source — deterministic shape, no external dependency; used to exercise
    streaming operators without testdata.  ``decider_id`` hashes the
    monotonically increasing value over ``n_partitions`` streams."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return rate.select(
        F.lit("tick").alias("event"),
        F.expr("uuid()").alias("event_id"),
        F.lit(1).cast("long").alias("event_version"),
        F.lit(decider).alias("decider"),
        F.concat(F.lit("p"), (F.col("value") % n_partitions).cast("string")).alias(
            "decider_id"
        ),
        F.to_json(F.struct(F.col("value").alias("n"))).alias("data"),
        F.expr("uuid()").alias("command_id"),
        F.lit(None).cast("string").alias("previous_id"),
        F.lit(False).alias("final"),
        F.col("timestamp").alias("created_at"),
    )


def read_event_batches_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC event batches — the other columnar format Spark ships natively
    (some upstream producers emit ORC; the engine accepts it without a
    conversion hop).  Schema is enforced, not inferred, like the JSON/CSV
    readers; ORC predicate pushdown and column pruning work the same as
    parquet's."""
    return spark.read.schema(event_batch_schema()).orc(path)
