"""Custom stateful streaming operator: per-stream chain monitor.

The reference enforces the previous_id chain at write time with row
triggers (T1-T3, /root/reference/schema.sql:75-146).  In a streaming
deployment the mirror concern is *read-side*: as events flow, track each
decider stream's high-watermark and verify the optimistic-lock chain stays
intact across micro-batches.  No built-in Spark operator holds per-key
state of this shape across batches — this is exactly the
``applyInPandasWithState`` case (SURVEY.md custom-operator ladder (b)).

State per decider_id (kept in the state store, bounded by processing-time
timeout): last_event_id, max_offset, n_events, chain_ok.  Each incoming
batch's rows are checked in offset order: a row whose ``previous_id``
doesn't match the stream's last ``event_id`` marks the stream broken
(chain_ok = false) — the streaming analogue of the T3 trigger's error.

Scale: state is O(#active streams) × ~100 bytes, partitioned by
decider_id's hash — the same partitioning the events table already has, so
the stateful exchange is the only shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CHAIN_STATE_SCHEMA = StructType(
    [
        StructField("last_event_id", StringType(), True),
        StructField("max_offset", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("chain_ok", BooleanType(), True),
    ]
)

CHAIN_OUTPUT_SCHEMA = StructType(
    [
        StructField("decider_id", StringType(), False),
        StructField("max_offset", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("chain_ok", BooleanType(), True),
        StructField("last_event_id", StringType(), True),
    ]
)


def _make_monitor(idle_timeout_ms: int | None):
    def _monitor(
        key: tuple[str, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (decider_id,) = key
        if idle_timeout_ms is not None and state.hasTimedOut:
            # idle stream: drop its state (bounded-state guarantee) and
            # emit nothing — the whole point of the timeout
            state.remove()
            return
        if state.exists:
            last_event_id, max_offset, n_events, chain_ok = state.get
        else:
            last_event_id, max_offset, n_events, chain_ok = None, None, 0, True

        for pdf in pdfs:
            pdf = pdf.sort_values("offset")
            for row in pdf.itertuples(index=False):
                prev: Any = row.previous_id
                prev = None if (prev is None or (isinstance(prev, float) and pd.isna(prev))) else prev
                if n_events == 0:
                    # T2: first event must have previous_id NULL
                    if prev is not None:
                        chain_ok = False
                elif prev != last_event_id:
                    # T3/C2: must chain to the stream head, exactly once
                    chain_ok = False
                last_event_id = row.event_id
                max_offset = int(row.offset)
                n_events += 1

        state.update((last_event_id, max_offset, n_events, chain_ok))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "decider_id": decider_id,
                    "max_offset": max_offset,
                    "n_events": n_events,
                    "chain_ok": chain_ok,
                    "last_event_id": last_event_id,
                }
            ]
        )

    return _monitor


def chain_monitor(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Streaming per-stream high-watermark + chain-integrity tracker.

    Input: a streaming events DataFrame (``streaming_events``) with at
    least (decider_id, event_id, previous_id, offset).  Output: one update
    row per touched stream per micro-batch.

    ``idle_timeout_ms`` (e.g. 3600_000 for long-running deployments)
    expires idle stream state via a processing-time timeout, bounding the
    state store to active streams.  Default is NO timeout: a registered
    processing-time timeout makes Spark keep scheduling no-data batches
    ("no new data but cleaning up state"), which never terminates under
    ``Trigger.AvailableNow`` — batch-style catch-up runs (and the test
    suite) would hang until awaitTermination gives up (measured: 3 min
    per run).  Continuous deployments with ProcessingTime triggers should
    opt in."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select("decider_id", "event_id", "previous_id", "offset")
        .groupBy("decider_id")
        .applyInPandasWithState(
            _make_monitor(idle_timeout_ms),
            outputStructType=CHAIN_OUTPUT_SCHEMA,
            stateStructType=CHAIN_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
