"""Structured-Streaming surface: push delivery (A10/T8-T10) and
event-time windowed aggregation (the Spark-native extension, SURVEY.md §7.7).
"""

from fstore_sql_spark.streaming.ingest import IngestionPipeline
from fstore_sql_spark.streaming.projections import MaterializedRollup, StreamProjection
from fstore_sql_spark.streaming.push import PushDelivery
from fstore_sql_spark.streaming.stateful import chain_monitor
from fstore_sql_spark.streaming.windows import (
    batch_trending,
    sessionized_counts,
    start_trending,
    streaming_events,
    windowed_event_counts,
)

__all__ = [
    "IngestionPipeline",
    "PushDelivery",
    "StreamProjection",
    "MaterializedRollup",
    "streaming_events",
    "windowed_event_counts",
    "sessionized_counts",
    "batch_trending",
    "start_trending",
    "chain_monitor",
]
