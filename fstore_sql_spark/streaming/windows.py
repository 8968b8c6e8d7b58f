"""Event-time windowed aggregation over the event log — the Spark-native
capability the reference lacks (SURVEY.md §2.5/§7.7, BASELINE.json north
star: "Structured Streaming + event-time windows").

``streaming_events`` opens the store's append-only parquet log as a file
source; the windowed aggregations put watermarks on ``created_at`` so state
is bounded and late events beyond the watermark are dropped — semantics the
transactional reference simply doesn't define.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fstore_sql_spark.schemas import EVENTS_SCHEMA
from fstore_sql_spark.storage import current_log_dir


def streaming_events(spark: SparkSession, store_path: str) -> DataFrame:
    """readStream over the event log (file source discovers each committed
    append batch; at cluster scale the same code reads a Delta source).

    The path resolves to the log's *current generation* directory
    (compaction writes a new generation and flips a pointer — see
    ``ParquetStore.compact_log``).  A running stream is pinned to the
    generation it started on; restart streams after compacting, exactly as
    a file-source stream over a table rewritten by OPTIMIZE would be.
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(current_log_dir(store_path, "events"))
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) event-time counts per
    decider type.  Works identically on a batch DataFrame (window() is the
    same expression in both engines' plans)."""
    w = (
        F.window("created_at", window, slide)
        if slide
        else F.window("created_at", window)
    )
    src = events
    if events.isStreaming:
        src = events.withWatermark("created_at", watermark)
    return src.groupBy(w.alias("win"), F.col("decider")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("decider_id").alias("approx_partitions"),
    )


def sessionized_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows (inactivity gap) per decider stream —
    ``session_window`` keeps per-key state until watermark + gap expiry."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("created_at", watermark)
    return src.groupBy(
        F.session_window("created_at", gap).alias("session"),
        F.col("decider_id"),
    ).agg(F.count(F.lit(1)).alias("n_events"))


def deduped_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """At-least-once delivery → effectively-once processing: drop
    ``event_id`` duplicates within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` holds per-key state only until the
    watermark passes it — bounded memory at any scale, unlike a plain
    ``dropDuplicates`` on a stream, whose state grows with the full key
    history.  This is the Spark-native form of the reference's
    ``event_id UNIQUE`` constraint (/root/reference/schema.sql:32) applied
    to a redelivering consumer."""
    return events.withWatermark("created_at", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def causation_join(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream self-join materializing the causation edge: each
    event paired with its predecessor (``previous_id`` → ``event_id``,
    /root/reference/schema.sql:43-44) as both arrive.

    The event-time range bound (parent within ``lookback`` before the
    child) is what keeps both join-state buffers finite — Spark evicts a
    buffered parent once the child-side watermark passes its latest
    possible match.  An unbounded-condition stream-stream join would
    buffer forever."""
    parents = events.select(
        F.col("event_id").alias("parent_id"),
        F.col("created_at").alias("parent_at"),
    )
    children = events.filter(F.col("previous_id").isNotNull()).select(
        "event_id", "previous_id", "decider_id", "created_at"
    )
    if events.isStreaming:
        parents = parents.withWatermark("parent_at", watermark)
        children = children.withWatermark("created_at", watermark)
    return children.join(
        parents,
        (F.col("previous_id") == F.col("parent_id"))
        & (F.col("parent_at") <= F.col("created_at"))
        & (F.col("parent_at") >= F.col("created_at") - F.expr(f"INTERVAL {lookback}")),
    )


def enriched_stream(events: DataFrame, deciders: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each streaming event picks up its
    registry metadata (the ``deciders`` description, schema.sql:13-25) —
    the canonical fact-stream ⋈ dimension-table shape.

    The static side is re-read per micro-batch (so registry updates are
    visible without restarting) and broadcast: with a dimension of
    registry size, no micro-batch ever shuffles.  Left join keeps events
    whose registration is missing — delivery must not silently drop them
    (C3 already guarantees registered-only at append time; the guard is
    for logs predating a registry rebuild)."""
    dim = F.broadcast(
        deciders.select(
            "decider",
            F.col("event").alias("_reg_event"),
            F.col("event_version").alias("_reg_version"),
            "description",
        )
    )
    return events.join(
        dim,
        (events["decider"] == dim["decider"])
        & (events["event"] == dim["_reg_event"])
        & (events["event_version"] == dim["_reg_version"]),
        "left",
    ).drop("_reg_event", "_reg_version").drop(dim["decider"])


def batch_trending(
    events: DataFrame, k: int = 3, window: str = "1 hour"
) -> DataFrame:
    """Top-k decider types per event-time window — the batch form of the
    'trending now' query (identical expression tree to what the streaming
    snapshot ranks per micro-batch, so stream and batch agree)."""
    from pyspark.sql import Window as W

    counts = windowed_event_counts(events, window=window)
    rank_w = W.partitionBy("win").orderBy(F.desc("n_events"), F.col("decider"))
    return (
        counts.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("win", "decider", "n_events", "rank")
    )


def start_trending(
    spark: SparkSession,
    store_path: str,
    out_dir: str,
    checkpoint: str,
    k: int = 3,
    window: str = "1 hour",
    watermark: str = "10 minutes",
):
    """Streaming 'trending now' snapshot: watermarked windowed counts
    maintained by the engine, top-k ranking applied per micro-batch in
    ``foreachBatch`` (rank is not stream-expressible — the counts ARE tiny
    by then: |windows|·|types| rows, so the batch-side window function is
    the right plan), snapshot overwritten atomically each trigger.

    This is the reference's push-delivery idea (extensions.sql: cron +
    POST the latest) inverted into a continuously-maintained materialized
    ranking — a CQRS read model the reference cannot express."""
    agg = windowed_event_counts(
        streaming_events(spark, store_path), window=window, watermark=watermark
    )

    def emit(batch_df: DataFrame, _batch_id: int) -> None:
        from pyspark.sql import Window as W

        rank_w = W.partitionBy("win").orderBy(
            F.desc("n_events"), F.col("decider")
        )
        (
            batch_df.withColumn("rank", F.row_number().over(rank_w))
            .filter(F.col("rank") <= k)
            .select("win", "decider", "n_events", "rank")
            .write.mode("overwrite")
            .parquet(out_dir)
        )

    return (
        agg.writeStream.foreachBatch(emit)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
