"""Sources & sinks — schema'd ingest readers, synthetic stream generators,
and layout-aware dataset exporters.

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
from fstore_sql_spark.sources.writers import write_clustered, write_partitioned

__all__ = [
    "event_batch_schema",
    "read_event_batches_json",
    "read_event_batches_csv",
    "rate_events",
    "write_partitioned",
    "write_clustered",
]
