"""Fixed StructTypes for the four engine tables.

Type mapping from the reference DDL (SURVEY.md §1.2):

- TEXT → StringType, BIGINT/BIGSERIAL → LongType, UUID → StringType
  (canonical lowercase hex), JSONB → StringType carrying JSON,
  TIMESTAMPTZ → TimestampType (session TZ UTC), XID8 → LongType
  (mapped to the engine's commit/batch id — nothing in the reference
  reads it back, SURVEY.md §1.2).

Reference DDL: deciders /root/reference/schema.sql:10-21, events
schema.sql:27-54, views schema.sql:157-175, locks schema.sql:180-200.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Registry of (decider, event, event_version) a decider may publish.
# PK (decider, event, event_version) — /root/reference/schema.sql:20
DECIDERS_SCHEMA = StructType(
    [
        StructField("decider", StringType(), nullable=False),
        StructField("event", StringType(), nullable=False),
        StructField("event_version", LongType(), nullable=False),
        StructField("description", StringType(), nullable=False),
    ]
)

# Append-only event log — /root/reference/schema.sql:27-54.
# "offset" is engine-assigned (BIGSERIAL analogue, SURVEY.md §7.4);
# transaction_id carries the engine commit id (XID8 analogue).
EVENTS_SCHEMA = StructType(
    [
        StructField("event", StringType(), nullable=False),
        StructField("event_id", StringType(), nullable=False),
        StructField("event_version", LongType(), nullable=False),
        StructField("decider", StringType(), nullable=False),
        StructField("decider_id", StringType(), nullable=False),
        StructField("data", StringType(), nullable=False),
        StructField("command_id", StringType(), nullable=False),
        StructField("previous_id", StringType(), nullable=True),
        StructField("final", BooleanType(), nullable=False),
        StructField("created_at", TimestampType(), nullable=False),
        StructField("offset", LongType(), nullable=False),
        StructField("transaction_id", LongType(), nullable=False),
    ]
)

# Consumer/subscription registry — /root/reference/schema.sql:157-175.
VIEWS_SCHEMA = StructType(
    [
        StructField("view", StringType(), nullable=False),
        StructField("start_at", TimestampType(), nullable=False),
        StructField("lock_timeout_s", LongType(), nullable=False),
        StructField("pooling_delay_s", LongType(), nullable=True),
        StructField("edge_function_url", StringType(), nullable=True),
        StructField("created_at", TimestampType(), nullable=False),
        StructField("updated_at", TimestampType(), nullable=False),
    ]
)

# Consumer offsets & leases, PK (view, decider_id) —
# /root/reference/schema.sql:180-200.
#
# Per SURVEY.md §7.5 the engine persists ONLY genuine consumer state
# (last_offset, locked_until); the high-watermark columns ("offset",
# offset_final) are a pure function of `events` and are recomputed at read
# time — this removes the events↔locks dual-write atomicity problem.  The
# full reference-shaped row (with offset/offset_final) is what
# `EventStore.locks()` returns.
LOCKS_STATE_SCHEMA = StructType(
    [
        StructField("view", StringType(), nullable=False),
        StructField("decider_id", StringType(), nullable=False),
        StructField("last_offset", LongType(), nullable=False),
        StructField("locked_until", TimestampType(), nullable=False),
        StructField("created_at", TimestampType(), nullable=False),
        StructField("updated_at", TimestampType(), nullable=False),
    ]
)

# Reference-shaped locks row (what the reference's `locks` table contains).
LOCKS_SCHEMA = StructType(
    [
        StructField("view", StringType(), nullable=False),
        StructField("decider_id", StringType(), nullable=False),
        StructField("offset", LongType(), nullable=False),
        StructField("last_offset", LongType(), nullable=False),
        StructField("locked_until", TimestampType(), nullable=False),
        StructField("offset_final", BooleanType(), nullable=False),
        StructField("created_at", TimestampType(), nullable=False),
        StructField("updated_at", TimestampType(), nullable=False),
    ]
)


# Versioned payload schema registry (engine extension, SURVEY.md §1.3:
# "per-event-type payload schemas can optionally be registered … applied
# at query time via from_json").  One row per (event, event_version);
# ``ddl`` is the Spark DDL string of the payload StructType; ``renames``
# (r6, nullable) is a JSON object {new_field: previous_field} recording
# which fields this version renamed relative to the previous one — parquet
# snapshots written before r6 simply read the column as NULL (schema-on-
# read fills missing columns), i.e. "no renames".
PAYLOAD_SCHEMAS_SCHEMA = StructType(
    [
        StructField("event", StringType(), nullable=False),
        StructField("event_version", LongType(), nullable=False),
        StructField("ddl", StringType(), nullable=False),
        StructField("renames", StringType(), nullable=True),
        StructField("created_at", TimestampType(), nullable=False),
    ]
)
