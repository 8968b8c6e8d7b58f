"""Versioned payload schema registry + typed upcast view (SURVEY.md §1.3
schema-on-read; the reference keeps payloads opaque JSONB,
/root/reference/schema.sql:37)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from fstore_sql_spark import errors


def _seed(store):
    store.register_decider_event("order", "created", "v1 payload", 1)
    store.register_decider_event("order", "created", "v2 payload", 2)
    store.register_payload_schema("created", 1, "amount BIGINT")
    store.register_payload_schema(
        "created",
        2,
        StructType(
            [
                StructField("amount", LongType()),
                StructField("currency", StringType()),
            ]
        ),
    )
    store.append_event(
        "created", "e1", "order", "A", '{"amount": 5}', event_version=1
    )
    store.append_event(
        "created",
        "e2",
        "order",
        "A",
        '{"amount": 7, "currency": "EUR"}',
        previous_id="e1",
        event_version=2,
    )


class TestTypedPayload:
    def test_mixed_versions_upcast_to_latest(self, store):
        _seed(store)
        t = store.events_typed("created").orderBy("offset")
        # typed to the LATEST version's shape
        payload_type = t.schema["payload"].dataType
        assert [f.name for f in payload_type.fields] == ["amount", "currency"]
        assert payload_type["amount"].dataType.simpleString() == "bigint"
        rows = t.select("event_id", "event_version", "payload.*").collect()
        assert [(r["event_id"], r["amount"], r["currency"]) for r in rows] == [
            ("e1", 5, None),  # v1 upcast: currency is a typed NULL
            ("e2", 7, "EUR"),
        ]

    def test_unregistered_event_raises(self, store):
        with pytest.raises(errors.UnregisteredSchemaError, match="no payload schema"):
            store.events_typed("never_registered")

    def test_unregistered_version_in_log_raises(self, store):
        _seed(store)
        store.register_decider_event("order", "created", "v3 payload", 3)
        store.append_event(
            "created",
            "e3",
            "order",
            "A",
            '{"amount": 9, "currency": "USD", "tax": 1}',
            previous_id="e2",
            event_version=3,
        )
        with pytest.raises(errors.UnregisteredSchemaError, match="version 3"):
            store.events_typed("created")

    def test_duplicate_schema_registration_raises(self, store):
        _seed(store)
        with pytest.raises(errors.DuplicateSchemaError):
            store.register_payload_schema("created", 1, "amount BIGINT")

    def test_schemas_survive_reopen(self, spark, store):
        _seed(store)
        from fstore_sql_spark import EventStore

        reopened = EventStore(spark, store.storage.root)
        rows = reopened.events_typed("created").select("payload.amount").collect()
        assert sorted(r["amount"] for r in rows) == [5, 7]

    def test_malformed_json_yields_null_payload_not_error(self, store):
        store.register_decider_event("order", "created", "v1", 1)
        store.register_payload_schema("created", 1, "amount BIGINT")
        store.append_event("created", "bad1", "order", "B", "not json{", event_version=1)
        row = (
            store.events_typed("created")
            .filter(F.col("event_id") == "bad1")
            .select("payload")
            .collect()[0]
        )
        # from_json semantics: malformed input -> NULL struct (PERMISSIVE),
        # mirroring how the reference's consumers would fail per-row, not
        # per-query
        assert row["payload"] is None or row["payload"]["amount"] is None
