"""Streaming ingestion — file-drop event batches into the validated
append path.

The reference ingests through per-call ``append_event`` SQL
(/root/reference/schema.sql:336-343); its perf suite batches those calls
in loops (tests/performance/load-tests/test_high_volume_events.sql:38-60).
The Spark-native equivalent of "clients keep sending batches" is a
Structured Streaming file source watching a drop directory: every JSONL
file that lands is one client batch, and ``foreachBatch`` funnels each
micro-batch through ``EventStore.append_batch`` — the FULL §2.3
validation program + contiguous offset assignment, identical to the
synchronous API path.

Exactly-once ingestion: the file source's checkpoint records which files
a committed micro-batch consumed, and the store append is idempotent at
the batch level ONLY through the checkpoint (a crash between append and
checkpoint commit re-appends the batch; C1 event_id uniqueness then
rejects the duplicates — at-least-once delivery, exactly-once effect,
provided batches carry client event_ids).  ``on_error`` lets operators
route a poison batch (validation failure) to a dead-letter callback
instead of killing the stream.

Scale: maxFilesPerTrigger bounds per-batch work; the validated append is
set-based, so a 1M-row drop file costs one validation pass, not 1M row
trips.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from fstore_sql_spark.sources.readers import event_batch_schema
from fstore_sql_spark.store import EventStore


class IngestionPipeline:
    """Watch ``drop_dir`` for JSONL event-batch files and append them.

    Each line: {"event", "event_id", "decider", "decider_id", "data",
    "command_id", "previous_id", "event_version", "final", "seq"} —
    the ``sources.readers.event_batch_schema`` contract.
    """

    def __init__(
        self,
        store: EventStore,
        drop_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 16,
        on_error: Callable[[Exception, DataFrame], None] | None = None,
    ):
        self.store = store
        self.drop_dir = drop_dir
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.on_error = on_error
        self._query: StreamingQuery | None = None

    def _append_batch(self, batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        # Apply the append_event API defaults (schema.sql:336-343) to
        # columns the drop file omitted — JSON nulls, not missing columns,
        # so _as_candidates' column-level defaults don't see them.
        batch = (
            batch.withColumn(
                "event_version",
                F.coalesce("event_version", F.lit(1).cast("long")),
            )
            .withColumn("data", F.coalesce("data", F.lit("{}")))
            .withColumn("final", F.coalesce("final", F.lit(False)))
            .withColumn("command_id", F.coalesce("command_id", F.expr("uuid()")))
        )
        # Deterministic intra-batch order: client seq, then event_id as a
        # tiebreak across files that reuse seq ranges.
        ordered = batch.withColumn(
            "seq",
            F.row_number()
            .over(Window.orderBy(F.col("seq").asc_nulls_last(), "event_id"))
            .cast("long"),
        )
        try:
            # on_conflict="ignore" is the at-least-once recovery mode: a
            # crash between append and checkpoint commit replays this
            # micro-batch, and the already-committed event_ids are dropped
            # instead of raising DuplicateEventIdError (which would either
            # poison-loop the stream or falsely dead-letter a fully
            # committed batch).  Genuine validation failures still raise.
            self.store.append_batch(ordered, on_conflict="ignore")
        except Exception as exc:  # noqa: BLE001 — poison-batch routing
            if self.on_error is None:
                raise
            self.on_error(exc, batch)

    def start(self, available_now: bool = False) -> StreamingQuery:
        from pyspark.sql.types import LongType

        # client-supplied columns + optional explicit intra-batch order
        schema = event_batch_schema().add("seq", LongType(), True)
        stream = (
            self.store.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(self.max_files_per_trigger))
            .json(self.drop_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self._append_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName("fstore-ingest")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        self._query = writer.start()
        return self._query

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None
