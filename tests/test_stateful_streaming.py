"""chain_monitor: custom stateful streaming operator
(applyInPandasWithState) — state carries across micro-batches."""

from __future__ import annotations

import uuid
from datetime import datetime

from pyspark.sql import functions as F

from fstore_sql_spark.schemas import EVENTS_SCHEMA
from fstore_sql_spark.streaming import chain_monitor


def _event(offset, decider_id, event_id, previous_id, final=False):
    return (
        "e",              # event
        event_id,
        1,                # event_version
        "d",              # decider
        decider_id,
        "{}",             # data
        str(uuid.uuid4()),  # command_id
        previous_id,
        final,
        datetime(2024, 1, 1, 0, 0, offset),
        offset,
        0,                # transaction_id
    )


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_stream(spark, src_path, ckpt, qname):
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file = one micro-batch
        .parquet(src_path)
    )
    q = (
        chain_monitor(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_chain_monitor_tracks_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "events")
    a1, a2, a3 = (str(uuid.uuid4()) for _ in range(3))
    b1, b2 = (str(uuid.uuid4()) for _ in range(2))

    # batch 1: stream A starts cleanly; stream B starts cleanly
    _write_batch(
        spark, src,
        [_event(1, "A", a1, None), _event(2, "B", b1, None)],
    )
    # batch 2: A chains correctly (a2→a1, a3→a2); B breaks (previous_id
    # points at a non-head event id)
    _write_batch(
        spark, src,
        [
            _event(3, "A", a2, a1),
            _event(4, "A", a3, a2),
            _event(5, "B", b2, str(uuid.uuid4())),  # broken link
        ],
    )

    _run_stream(spark, src, str(tmp_path / "ckpt"), "chain_out")
    # last update per stream (memory sink keeps every update row)
    out = (
        spark.sql("select * from chain_out")
        .groupBy("decider_id")
        .agg(
            F.max_by("chain_ok", "n_events").alias("chain_ok"),
            F.max("n_events").alias("n_events"),
            F.max("max_offset").alias("max_offset"),
            F.max_by("last_event_id", "n_events").alias("last_event_id"),
        )
        .collect()
    )
    by_id = {r["decider_id"]: r for r in out}
    assert by_id["A"]["chain_ok"] is True
    assert by_id["A"]["n_events"] == 3
    assert by_id["A"]["max_offset"] == 4
    assert by_id["A"]["last_event_id"] == a3
    assert by_id["B"]["chain_ok"] is False  # break detected across batches
    assert by_id["B"]["n_events"] == 2


def test_chain_monitor_flags_non_null_first_previous(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_batch(
        spark, src,
        [_event(1, "C", str(uuid.uuid4()), str(uuid.uuid4()))],  # T2 violation
    )
    _run_stream(spark, src, str(tmp_path / "ckpt"), "chain_out2")
    rows = spark.sql(
        "select * from chain_out2 where decider_id = 'C'"
    ).collect()
    assert rows and rows[-1]["chain_ok"] is False
