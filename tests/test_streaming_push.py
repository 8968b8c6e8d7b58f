"""Push-delivery (A10/T8-T10) and event-time window tests —
/root/reference/extensions.sql semantics on Structured Streaming."""

import time
import uuid
from datetime import datetime, timedelta, timezone

from fstore_sql_spark.streaming import (
    PushDelivery,
    sessionized_counts,
    streaming_events,
    windowed_event_counts,
)


def uid() -> str:
    return str(uuid.uuid4())


def past() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None) - timedelta(hours=1)


def wait_until(cond, timeout=60, step=0.5) -> bool:
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(step)
    return False


def test_push_delivery_posts_and_redelivers(store):
    store.register_decider_event("d", "e", "x")
    store.register_view(
        "push_view",
        start_at=past(),
        pooling_delay_s=1,
        edge_function_url="http://example.invalid/webhook",
    )
    store.append_event("e", uid(), "d", "p1", data='{"n":1}')

    posts = []

    def fake_post(url, payload):
        posts.append((url, payload))
        # edge function acks (the reference's contract: consumer acks back)
        store.ack_event(payload["view"], payload["decider_id"], payload["offset"])
        return 200

    svc = PushDelivery(store, post=fake_post)
    try:
        q = svc.start("push_view")
        assert q.isActive
        assert wait_until(lambda: len(posts) >= 1), "no push within timeout"
        url, payload = posts[0]
        assert url == "http://example.invalid/webhook"
        assert payload["view"] == "push_view"
        assert payload["decider_id"] == "p1"
        assert payload["data"] == '{"n":1}'
        # second event is delivered on a later tick after the first ack
        store.append_event(
            "e", uid(), "d", "p1",
            previous_id=store.get_last_event("p1", "d").collect()[0]["event_id"],
        )
        assert wait_until(lambda: len(posts) >= 2), "second push not delivered"
    finally:
        svc.stop_all()


def test_push_sync_reconciles(store):
    store.register_decider_event("d", "e", "x")
    store.register_view("pull_view", start_at=past())  # no pooling delay
    store.register_view(
        "push_a", start_at=past(), pooling_delay_s=1,
        edge_function_url="http://example.invalid/a",
    )
    svc = PushDelivery(store, post=lambda u, p: 200)
    try:
        actions = svc.sync()
        assert actions == {"push_a": "started"}  # T8: only push views start
        # T9: switching to NULL pooling stops the query on next sync
        store.register_view("push_a", start_at=past())
        actions = svc.sync()
        assert actions == {"push_a": "stopped"}
    finally:
        svc.stop_all()


def test_streaming_windowed_counts(store, spark, tmp_path):
    """Real Structured Streaming run: readStream over the store's log,
    watermarked tumbling window, availableNow trigger into a memory sink."""
    store.register_decider_event("d", "e", "x")
    rows = []
    prev = None
    for i in range(6):
        eid = uid()
        rows.append(
            {"event": "e", "event_id": eid, "decider": "d",
             "decider_id": "p1", "previous_id": prev}
        )
        prev = eid
    store.append_batch(rows)

    stream = streaming_events(spark, store.storage.root)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from win_counts").collect()
    assert len(out) == 1  # all 6 events share one created_at hour bucket
    assert out[0]["n_events"] == 6
    assert out[0]["decider"] == "d"


def test_batch_session_window_matches_streaming_shape(store):
    """session_window works on the batch log too (same expression)."""
    store.register_decider_event("d", "e", "x")
    store.append_event("e", uid(), "d", "p1")
    out = sessionized_counts(store.events()).collect()
    assert len(out) == 1 and out[0]["n_events"] == 1
