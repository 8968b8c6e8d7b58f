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


class TestPartitionedExport:
    def test_partitioned_write_gets_directory_pruning(self, spark, tmp_path):
        from fstore_sql_spark.plans import inspect as P
        from fstore_sql_spark.queries import load
        from fstore_sql_spark.sources.writers import write_partitioned

        out = str(tmp_path / "docs_by_lang")
        docs = load(spark, "/root/testdata/sf0.001", "documents")
        write_partitioned(docs, out, ["lang"])

        back = spark.read.parquet(out).filter(F.col("lang") == "en")
        # the lang predicate must become a PartitionFilter (directory
        # pruning), NOT a data filter evaluated per row.
        assert any("lang" in f for f in P.partition_filters(back))
        assert back.count() == docs.filter(F.col("lang") == "en").count()
        # layout check: Hive-style lang=<value> directories exist.
        import os

        assert any(d.startswith("lang=") for d in os.listdir(out))

    def test_clustered_write_prunes_row_groups(self, spark, tmp_path):
        from fstore_sql_spark.plans import inspect as P
        from fstore_sql_spark.queries import load
        from fstore_sql_spark.sources.writers import write_clustered

        out = str(tmp_path / "events_clustered")
        ev = load(spark, "/root/testdata/sf0.001", "events")
        write_clustered(ev, out, "user_id", n_files=4)

        back = spark.read.parquet(out).filter(F.col("user_id") == 7)
        assert any("user_id" in f for f in P.pushed_filters(back))
        assert back.count() == ev.filter(F.col("user_id") == 7).count()


class TestEnrichedStream:
    def test_stream_static_join_broadcasts_registry(self, spark, tmp_path):
        """Stream-static enrichment: every delivered micro-batch row carries
        registry metadata; the static side broadcasts (no shuffle)."""
        import uuid

        from fstore_sql_spark import EventStore
        from fstore_sql_spark.streaming.windows import (
            enriched_stream,
            streaming_events,
        )

        store = EventStore(spark, str(tmp_path / "store"))
        store.register_decider_event("acct", "opened", "account opened")
        for pid in ("a1", "a2"):
            store.append_event(
                event="opened", event_id=str(uuid.uuid4()),
                decider="acct", decider_id=pid,
            )

        stream = streaming_events(spark, str(tmp_path / "store"))
        enriched = enriched_stream(stream, store.deciders())
        qname = f"enrich_{uuid.uuid4().hex[:8]}"
        q = (
            enriched.writeStream.format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        rows = spark.sql(f"SELECT * FROM {qname}").collect()
        assert len(rows) == 2
        assert all(r["description"] == "account opened" for r in rows)


class TestOrcAndZorder:
    def test_orc_roundtrip_with_pushdown(self, spark, tmp_path):
        from fstore_sql_spark.sources.readers import read_event_batches_orc
        from fstore_sql_spark.sources.writers import write_orc_clustered
        from fstore_sql_spark.queries import load

        src = (
            load(spark, "/root/testdata/sf0.001", "events")
            .limit(200)
            .selectExpr(
                "event_type AS event",
                "CAST(event_id AS STRING) AS event_id",
                "CAST(1 AS LONG) AS event_version",
                "'user' AS decider",
                "CAST(user_id AS STRING) AS decider_id",
                "props AS data",
                "uuid() AS command_id",
                "CAST(NULL AS STRING) AS previous_id",
                "false AS final",
            )
        )
        path = str(tmp_path / "batches_orc")
        write_orc_clustered(src, path, "decider_id", 4)
        back = read_event_batches_orc(spark, path)
        assert back.count() == 200
        assert back.schema["event_version"].dataType.typeName() == "long"
        # ORC scan honors filter pushdown on the cluster key
        one = back.filter(F.col("decider_id") == "7")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "decider_id" in plan

    def test_zorder_write_bounds_both_dims(self, spark, tmp_path):
        from fstore_sql_spark.operators.layout import write_zordered
        from fstore_sql_spark.queries import load

        orders = load(spark, "/root/testdata/sf0.001", "orders").select(
            "o_orderkey", "o_custkey",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("day_nr"),
        )
        path = str(tmp_path / "orders_z")
        write_zordered(orders, path, "o_custkey", "day_nr", n_files=8)
        back = spark.read.parquet(path)
        assert back.count() == orders.count()
        # per-file spans must be tighter than the global span in BOTH dims
        import pyspark.sql.functions as SF

        spans = (
            back.groupBy(SF.input_file_name().alias("f"))
            .agg(
                (SF.max("o_custkey") - SF.min("o_custkey")).alias("cust_span"),
                (SF.max("day_nr") - SF.min("day_nr")).alias("day_span"),
            )
            .collect()
        )
        g = orders.agg(
            (SF.max("o_custkey") - SF.min("o_custkey")).alias("cs"),
            (SF.max("day_nr") - SF.min("day_nr")).alias("ds"),
        ).collect()[0]
        assert len(spans) >= 4
        avg_cust = sum(r.cust_span for r in spans) / len(spans)
        avg_day = sum(r.day_span for r in spans) / len(spans)
        assert avg_cust < g.cs and avg_day < g.ds, (avg_cust, g.cs, avg_day, g.ds)


class TestLoadMemo:
    """r15: load() memoizes the lazy DataFrame handle per session keyed on
    (path, table, file mtime) — metadata amortization only.  The contract:
    same table twice = same handle (no repeated listing/inference); a
    REPLACED file (mtime change) must drop the memo so a session never
    serves a stale file list."""

    def test_same_table_returns_memoized_handle(self, spark, sf_dir):
        from fstore_sql_spark.queries import load

        a = load(spark, sf_dir, "orders")
        b = load(spark, sf_dir, "orders")
        assert a is b

    def test_mtime_change_invalidates(self, spark, sf_dir, tmp_path):
        import os
        import shutil

        from fstore_sql_spark.queries import load

        src = os.path.join(sf_dir, "orders.parquet")
        dst = tmp_path / "orders.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
        a = load(spark, str(tmp_path), "orders")
        n1 = a.count()
        # replace the file: new mtime => memo must miss and re-read
        os.utime(dst, None)
        b = load(spark, str(tmp_path), "orders")
        assert b is not a
        assert b.count() == n1  # same bytes, fresh handle

    def test_results_not_cached(self, spark, sf_dir):
        # the memo holds a LAZY plan: every action recomputes from parquet
        # (spot-check: no InMemoryRelation in the memoized frame's plan)
        from fstore_sql_spark.plans.inspect import formatted_plan
        from fstore_sql_spark.queries import load

        df = load(spark, sf_dir, "orders")
        assert "InMemoryRelation" not in formatted_plan(df)
        assert "InMemoryTableScan" not in formatted_plan(df)
