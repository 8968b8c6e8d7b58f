"""Sources — schema'd ingest readers and synthetic stream generators.

Everything reads with an *explicit* schema: schema inference is a full
extra pass over the data at 100 TB and can silently drift types between
runs.  The fixed StructTypes come from ``fstore_sql_spark.schemas``.
"""

from fstore_sql_spark.sources.readers import (
    event_batch_schema,
    rate_events,
    read_event_batches_csv,
    read_event_batches_json,
)

__all__ = [
    "event_batch_schema",
    "read_event_batches_json",
    "read_event_batches_csv",
    "rate_events",
]
