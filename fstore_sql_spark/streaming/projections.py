"""Streaming CQRS projections — materialized view models over the event
log (the README-style read-model the reference leaves to its consumers,
built here as a Structured Streaming job; SURVEY.md §7.7 north star).

A projection folds events into per-stream state: for each ``decider_id``,
the running event count, last event type/offset, and a JSON-payload
aggregate.  The fold runs incrementally in ``foreachBatch`` — each
micro-batch's partial aggregate is MERGEd into a versioned state snapshot
(the same storage discipline as the engine's ``locks`` state), so the
projection survives restarts and reads are always a complete snapshot.

Scale: each micro-batch shuffles only its own rows (partial aggregate by
decider_id); the merge joins batch-partials against current state on the
same key.  State size is O(#streams), not O(#events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from fstore_sql_spark.storage import ParquetStore
from fstore_sql_spark.streaming.windows import streaming_events

PROJECTION_SCHEMA = StructType(
    [
        StructField("decider_id", StringType(), False),
        StructField("n_events", LongType(), True),
        StructField("last_offset", LongType(), True),
        StructField("last_event", StringType(), True),
        StructField("total_value", LongType(), True),
    ]
)

_TABLE = "projection"


class StreamProjection:
    """A restartable streaming view model over an EventStore's log."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        projection_path: str,
        value_json_key: str | None = None,
    ):
        self.spark = spark
        self.store_path = store_path
        self.value_json_key = value_json_key
        self.state = ParquetStore(spark, projection_path)
        self.state.init_state(_TABLE, PROJECTION_SCHEMA)

    # ------------------------------------------------------------------ #

    def _fold_batch(self, batch: DataFrame) -> DataFrame:
        """Partial aggregate of one micro-batch, keyed by decider_id."""
        val = (
            F.get_json_object(F.col("data"), f"$.{self.value_json_key}").cast("long")
            if self.value_json_key
            else F.lit(0)
        )
        return batch.groupBy("decider_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("offset").alias("last_offset"),
            F.max_by("event", "offset").alias("last_event"),
            F.sum(val).alias("total_value"),
        )

    def _merge(self, partial: DataFrame, _batch_id: int) -> None:
        """MERGE the batch partial into the snapshot: matched rows fold
        (count/value add, last-* overwritten by the newer offset),
        unmatched insert.

        Replay-idempotent: the snapshot's global ``max(last_offset)`` is a
        fold watermark (the same guard ``MaterializedRollup`` uses).  The
        log is consumed in offset order and micro-batch replay after a
        crash re-presents an identical batch, so trimming folded offsets
        out of the partial makes a replayed batch a no-op instead of
        double-counting the additive measures."""
        cur = self.state.read_state(_TABLE, PROJECTION_SCHEMA)
        wm_row = cur.agg(F.max("last_offset").alias("wm")).collect()[0]
        if wm_row["wm"] is not None:
            partial = partial.filter(F.col("last_offset") > F.lit(wm_row["wm"]))
        if partial.isEmpty():
            return
        p = partial.select(
            F.col("decider_id"),
            F.col("n_events").alias("p_n"),
            F.col("last_offset").alias("p_off"),
            F.col("last_event").alias("p_ev"),
            F.col("total_value").alias("p_val"),
        )
        merged = (
            cur.join(p, "decider_id", "full_outer")
            .select(
                "decider_id",
                (F.coalesce("n_events", F.lit(0)) + F.coalesce("p_n", F.lit(0))).alias(
                    "n_events"
                ),
                F.greatest(
                    F.coalesce("last_offset", F.lit(0)), F.coalesce("p_off", F.lit(0))
                ).alias("last_offset"),
                F.when(
                    F.coalesce(F.col("p_off"), F.lit(-1))
                    >= F.coalesce(F.col("last_offset"), F.lit(0)),
                    F.col("p_ev"),
                )
                .otherwise(F.col("last_event"))
                .alias("last_event"),
                (
                    F.coalesce("total_value", F.lit(0)) + F.coalesce("p_val", F.lit(0))
                ).alias("total_value"),
            )
        )
        self.state.write_state(_TABLE, merged)

    # ------------------------------------------------------------------ #

    def start(self, trigger_seconds: int | None = None, available_now: bool = False,
              checkpoint: str | None = None) -> StreamingQuery:
        stream = streaming_events(self.spark, self.store_path)
        writer = stream.writeStream.foreachBatch(
            lambda df, bid: self._merge(self._fold_batch(df), bid)
        ).queryName("projection")
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()

    def read(self) -> DataFrame:
        """The current view model — always a complete snapshot."""
        return self.state.read_state(_TABLE, PROJECTION_SCHEMA)


ROLLUP_SCHEMA = StructType(
    [
        StructField("group_key", StringType(), False),
        StructField("n_events", LongType(), True),
        StructField("total_value", LongType(), True),
        StructField("max_offset", LongType(), True),
    ]
)

_ROLLUP_TABLE = "rollup"


class MaterializedRollup:
    """Incrementally-maintained continuous aggregate over the event log —
    the BATCH sibling of ``StreamProjection`` and the engine-side form of
    the `two_level_rollup_reuse` query pattern (TimescaleDB-style
    continuous aggregates; the reference leaves read models entirely to
    consumers).

    ``refresh()`` folds ONLY the log suffix appended since the last
    refresh: the snapshot's global ``max(max_offset)`` is the watermark,
    and because the log is written in offset order, the ``offset > wm``
    predicate prunes every already-folded parquet file via min/max
    footer stats — a refresh after appending N events costs O(N), not
    O(log).  Measures are restricted to commutative folds (count, sum),
    which is what makes snapshot+delta re-aggregation exact.
    """

    def __init__(
        self,
        spark: SparkSession,
        store,
        rollup_path: str,
        value_json_key: str | None = None,
        group_col: str = "decider",
    ):
        self.spark = spark
        self.store = store
        self.group_col = group_col
        self.value_json_key = value_json_key
        self.state = ParquetStore(spark, rollup_path)
        self.state.init_state(_ROLLUP_TABLE, ROLLUP_SCHEMA)

    def _watermark(self) -> int:
        row = (
            self.state.read_state(_ROLLUP_TABLE, ROLLUP_SCHEMA)
            .agg(F.max("max_offset").alias("wm"))
            .collect()[0]
        )
        return row["wm"] if row["wm"] is not None else -1

    def refresh(self) -> int:
        """Fold the new log suffix into the snapshot; returns the number
        of newly folded events."""
        wm = self._watermark()
        delta = self.store.events().filter(F.col("offset") > F.lit(wm))
        val = (
            F.get_json_object(F.col("data"), f"$.{self.value_json_key}").cast("long")
            if self.value_json_key
            else F.lit(0)
        )
        partial = delta.groupBy(
            F.col(self.group_col).alias("group_key")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(val).alias("total_value"),
            F.max("offset").alias("max_offset"),
        )
        n_new = partial.agg(F.sum("n_events")).collect()[0][0] or 0
        if n_new == 0:
            return 0
        cur = self.state.read_state(_ROLLUP_TABLE, ROLLUP_SCHEMA)
        merged = (
            cur.unionByName(partial)
            .groupBy("group_key")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("total_value").alias("total_value"),
                F.max("max_offset").alias("max_offset"),
            )
        )
        self.state.write_state(_ROLLUP_TABLE, merged)
        return int(n_new)

    def read(self) -> DataFrame:
        """The current rollup — always a complete snapshot."""
        return self.state.read_state(_ROLLUP_TABLE, ROLLUP_SCHEMA)
