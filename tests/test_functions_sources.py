"""Unit tests for the scalar function library and ingest sources."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from fstore_sql_spark.functions import (
    deterministic_uuid,
    epoch_seconds,
    json_get,
    json_object,
    lease_until,
    new_uuid,
)
from fstore_sql_spark.sources import (
    rate_events,
    read_event_batches_csv,
    read_event_batches_json,
)

UUID_RE = r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"


class TestScalars:
    def test_deterministic_uuid_stable_and_shaped(self, spark):
        df = spark.range(3).select(
            deterministic_uuid(F.col("id").cast("string")).alias("u")
        )
        a = [r["u"] for r in df.collect()]
        b = [r["u"] for r in df.collect()]
        assert a == b  # stable across runs (retry-safe)
        assert len(set(a)) == 3
        import re

        assert all(re.match(UUID_RE, u) for u in a)

    def test_new_uuid_unique(self, spark):
        rows = spark.range(10).select(new_uuid().alias("u")).collect()
        assert len({r["u"] for r in rows}) == 10

    def test_json_roundtrip(self, spark):
        df = spark.range(1).select(
            json_object(
                view=F.lit("v1"), offset=F.lit(7).cast("long")
            ).alias("j")
        )
        j = df.collect()[0]["j"]
        assert json.loads(j) == {"view": "v1", "offset": 7}
        back = df.select(json_get("j", "offset").alias("o")).collect()[0]["o"]
        assert back == "7"

    def test_lease_until_and_epoch(self, spark):
        row = spark.range(1).select(
            (epoch_seconds(lease_until(300)) - epoch_seconds(F.current_timestamp()))
            .alias("delta")
        ).collect()[0]
        assert 299 <= row["delta"] <= 301


class TestIngestReaders:
    def _write_jsonl(self, tmp_path, rows):
        p = tmp_path / "batch.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        return str(p)

    def test_json_reader_fixed_schema(self, spark, tmp_path):
        path = self._write_jsonl(
            tmp_path,
            [
                {
                    "event": "e1",
                    "event_id": "11111111-1111-1111-1111-111111111111",
                    "decider": "d",
                    "decider_id": "p1",
                    "data": "{\"n\":1}",
                }
            ],
        )
        df = read_event_batches_json(spark, path)
        row = df.collect()[0]
        assert row["event"] == "e1" and row["decider_id"] == "p1"
        assert row["_corrupt_record"] is None
        assert dict(df.dtypes)["event_version"] == "bigint"

    def test_json_reader_quarantines_corrupt_rows(self, spark, tmp_path):
        p = tmp_path / "bad.jsonl"
        p.write_text('{"event": "ok", "event_id": "x", "decider": "d", "decider_id": "p"}\nnot json at all\n')
        df = read_event_batches_json(spark, str(p)).cache()
        assert df.count() == 2
        bad = df.filter(F.col("_corrupt_record").isNotNull()).collect()
        assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]

    def test_csv_reader(self, spark, tmp_path):
        p = tmp_path / "batch.csv"
        p.write_text(
            "event,event_id,event_version,decider,decider_id,data,command_id,previous_id,final\n"
            "e1,u1,1,d,p1,,c1,,false\n"
        )
        row = read_event_batches_csv(spark, str(p)).collect()[0]
        assert row["event"] == "e1" and row["final"] is False

    def test_rate_source_shape(self, spark):
        df = rate_events(spark, rows_per_second=5, n_partitions=4)
        assert df.isStreaming
        cols = [c for c, _ in df.dtypes]
        for needed in ("event_id", "decider_id", "data", "created_at"):
            assert needed in cols
