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


def test_push_slow_endpoint_does_not_stall_other_partitions(store):
    """Async POST pool (pg_net analogue, extensions.sql:44-47): one dead
    endpoint call must not block the tick — other partitions keep
    delivering on the same view."""
    import threading

    store.register_decider_event("d", "e", "x")
    store.register_view(
        "push_slow", start_at=past(), pooling_delay_s=1,
        edge_function_url="http://example.invalid/slow",
    )
    store.append_event("e", uid(), "d", "stuck")
    store.append_event("e", uid(), "d", "flowing")

    release = threading.Event()
    posted: list[str] = []

    def post(url, payload):
        if payload["decider_id"] == "stuck":
            release.wait(30)  # a hung endpoint call
        else:
            posted.append(payload["decider_id"])
            store.ack_event(payload["view"], payload["decider_id"], payload["offset"])
        return 200

    svc = PushDelivery(store, post=post, batch_limit=10)
    try:
        svc.start("push_slow")
        # the flowing partition delivers (and its next events keep coming)
        assert wait_until(lambda: len(posted) >= 1), "stalled by slow endpoint"
        last = store.get_last_event("flowing", "d").collect()[0]["event_id"]
        store.append_event("e", uid(), "d", "flowing", previous_id=last)
        assert wait_until(lambda: len(posted) >= 2), "tick blocked by hung POST"
    finally:
        release.set()
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


def test_stream_projection_folds_and_restarts(store, spark, tmp_path):
    """CQRS view model via foreachBatch: folds incrementally, and a
    restarted query resumes from the checkpoint without double-counting."""
    from fstore_sql_spark.streaming.projections import StreamProjection

    store.register_decider_event("d", "e", "x")
    prev = {}
    for i in range(4):
        part = f"p{i % 2}"
        eid = uid()
        store.append_event(
            "e", eid, "d", part, data=f'{{"amt": {i + 1}}}',
            previous_id=prev.get(part),
        )
        prev[part] = eid

    proj = StreamProjection(
        spark, store.storage.root, str(tmp_path / "proj"), value_json_key="amt"
    )
    ckpt = str(tmp_path / "ckpt")
    q = proj.start(available_now=True, checkpoint=ckpt)
    q.awaitTermination(120)

    got = {r["decider_id"]: r for r in proj.read().collect()}
    assert got["p0"]["n_events"] == 2 and got["p1"]["n_events"] == 2
    assert got["p0"]["total_value"] == 1 + 3  # amts 1,3
    assert got["p1"]["total_value"] == 2 + 4
    assert got["p0"]["last_event"] == "e"

    # append more, restart from the same checkpoint: only the new batch folds
    store.append_event("e", uid(), "d", "p0", data='{"amt": 10}',
                       previous_id=prev["p0"])
    q2 = proj.start(available_now=True, checkpoint=ckpt)
    q2.awaitTermination(120)
    got2 = {r["decider_id"]: r for r in proj.read().collect()}
    assert got2["p0"]["n_events"] == 3
    assert got2["p0"]["total_value"] == 14
    assert got2["p1"]["n_events"] == 2  # untouched stream unchanged


def test_streaming_dedup_within_watermark(store, spark, tmp_path):
    """Redelivered (duplicate event_id) rows collapse to one — bounded
    dedup state via dropDuplicatesWithinWatermark."""
    from fstore_sql_spark.streaming.windows import deduped_stream

    store.register_decider_event("d", "e", "x")
    eid = uid()
    store.append_event("e", eid, "d", "p1")
    stream = streaming_events(spark, store.storage.root)
    # simulate at-least-once redelivery: the same log read twice
    dup = stream.union(stream)
    q = (
        deduped_stream(dup)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select event_id from dedup_out").collect()
    assert [r["event_id"] for r in out] == [eid]


def test_streaming_causation_join(store, spark, tmp_path):
    """Stream-stream self-join pairs each event with its predecessor."""
    from fstore_sql_spark.streaming.windows import causation_join

    store.register_decider_event("d", "e", "x")
    e1, e2, e3 = uid(), uid(), uid()
    store.append_batch(
        [
            {"event": "e", "event_id": e1, "decider": "d", "decider_id": "p1",
             "previous_id": None},
            {"event": "e", "event_id": e2, "decider": "d", "decider_id": "p1",
             "previous_id": e1},
            {"event": "e", "event_id": e3, "decider": "d", "decider_id": "p1",
             "previous_id": e2},
        ]
    )
    stream = streaming_events(spark, store.storage.root)
    q = (
        causation_join(stream)
        .writeStream.format("memory")
        .queryName("causation_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_causation"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select event_id, previous_id from causation_out").collect()
    got = {(r["event_id"], r["previous_id"]) for r in out}
    assert got == {(e2, e1), (e3, e2)}
    # batch form of the same expression agrees
    batch = causation_join(store.events()).select("event_id", "previous_id").collect()
    assert {(r["event_id"], r["previous_id"]) for r in batch} == got


def test_ingestion_pipeline_drains_drop_dir(store, spark, tmp_path):
    """File-drop ingestion: JSONL batches land in a watched directory and
    flow through the FULL validated append path (offsets assigned, chains
    checked).  A second availableNow run over the same checkpoint must be
    a no-op (the file source's commit log skips consumed files)."""
    import json as _json

    from fstore_sql_spark.streaming.ingest import IngestionPipeline

    store.register_decider_event("d", "e", "x")
    drop = tmp_path / "drop"
    drop.mkdir()
    e1, e2, e3 = uid(), uid(), uid()
    (drop / "batch1.jsonl").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"event": "e", "event_id": e1, "decider": "d",
                 "decider_id": "p0", "data": "{}", "seq": 0},
                {"event": "e", "event_id": e2, "decider": "d",
                 "decider_id": "p0", "data": "{}", "previous_id": e1,
                 "seq": 1},
            ]
        )
    )
    (drop / "batch2.jsonl").write_text(
        _json.dumps(
            {"event": "e", "event_id": e3, "decider": "d",
             "decider_id": "p1", "data": "{}", "seq": 0}
        )
    )

    pipe = IngestionPipeline(store, str(drop), str(tmp_path / "ckpt"))
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    pipe.stop()

    ev = store.events().orderBy("offset").collect()
    assert [r["event_id"] for r in ev if r["decider_id"] == "p0"] == [e1, e2]
    assert len(ev) == 3
    offsets = [r["offset"] for r in ev]
    assert offsets == sorted(offsets) and len(set(offsets)) == 3

    # re-run over the same checkpoint: nothing new to consume
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    pipe.stop()
    assert store.events().count() == 3


def test_ingestion_pipeline_routes_poison_batch(store, spark, tmp_path):
    """A batch that fails validation (unregistered event type) goes to the
    on_error dead-letter callback; the stream completes and the store
    stays clean."""
    import json as _json

    from fstore_sql_spark.streaming.ingest import IngestionPipeline

    store.register_decider_event("d", "e", "x")
    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "bad.jsonl").write_text(
        _json.dumps(
            {"event": "NOT_REGISTERED", "event_id": uid(), "decider": "d",
             "decider_id": "p0", "seq": 0}
        )
    )
    dead: list[str] = []
    pipe = IngestionPipeline(
        store, str(drop), str(tmp_path / "ckpt"),
        on_error=lambda exc, df: dead.append(type(exc).__name__),
    )
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    pipe.stop()
    assert dead == ["UnregisteredEventError"]
    assert store.events().count() == 0


def test_streaming_trending_topk_matches_batch(store, spark, tmp_path):
    """Streaming 'trending now' snapshot == the batch top-k ranking."""
    from fstore_sql_spark.streaming import batch_trending, start_trending

    for d, n in (("d1", 5), ("d2", 3), ("d3", 1)):
        store.register_decider_event(d, "e", "x")
        prev = None
        rows = []
        for _ in range(n):
            eid = uid()
            rows.append(
                {"event": "e", "event_id": eid, "decider": d,
                 "decider_id": f"p_{d}", "previous_id": prev}
            )
            prev = eid
        store.append_batch(rows)

    out = str(tmp_path / "trend_out")
    q = start_trending(
        spark, store.storage.root, out, str(tmp_path / "trend_ckpt"), k=2
    )
    q.awaitTermination(120)

    got = sorted(
        (r["decider"], r["n_events"], r["rank"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["decider"], r["n_events"], r["rank"])
        for r in batch_trending(store.events(), k=2).collect()
    )
    assert got == want
    assert [g[0] for g in got] == ["d1", "d2"]  # top-2 by count


def test_housekeeping_prunes_run_details_and_compacts(store):
    """T8's daily cleanup cron analogue (extensions.sql:69-70): old run
    records are pruned, recent ones kept, and the store-side compaction
    hook runs (skipping below the file threshold)."""
    svc = PushDelivery(store)
    now = time.time()
    svc.run_details.append(("v_old", now - 90_000, 1))  # > 1 day old
    svc.run_details.append(("v_new", now - 10, 1))
    out = svc.housekeeping(older_than_s=86_400)
    assert out["pruned_runs"] == 1
    assert [r[0] for r in svc.run_details] == ["v_new"]
    # fresh store is far below the fragmentation threshold → skip
    assert out["compacted_to_files"] is None


def test_housekeeping_streaming_query_ticks(store):
    store.register_decider_event("d", "e", "x")
    svc = PushDelivery(store)
    svc.run_details.append(("v_old", time.time() - 90_000, 1))
    try:
        q = svc.start_housekeeping(interval_s=1)
        assert q.isActive
        assert wait_until(lambda: len(svc.run_details) == 0, timeout=30), (
            "housekeeping tick never pruned the stale run record"
        )
        # sync() must not kill the maintenance job (it is not a view)
        svc.sync()
        assert svc._queries[svc._HOUSEKEEPING].isActive
    finally:
        svc.stop_all()


def test_push_start_rejects_null_url_and_reserved_name(store):
    store.register_decider_event("d", "e", "x")
    store.register_view("pull_only", start_at=past(), pooling_delay_s=1)
    svc = PushDelivery(store)
    try:
        import pytest

        with pytest.raises(ValueError, match="edge_function_url"):
            svc.start("pull_only")
        with pytest.raises(ValueError, match="reserved"):
            svc.start(svc._HOUSEKEEPING)
    finally:
        svc.stop_all()


def test_push_sync_restarts_on_config_update(store):
    """T9 (extensions.sql:84-110): updating a push view's URL must
    re-create its query — membership alone kept posting to the
    decommissioned endpoint."""
    store.register_decider_event("d", "e", "x")
    store.register_view(
        "v9", start_at=past(), pooling_delay_s=60,
        edge_function_url="http://a.invalid/hook",
    )
    posts = []
    svc = PushDelivery(store, post=lambda url, p: posts.append(url) or 200)
    try:
        assert svc.sync() == {"v9": "started"}
        assert svc.sync() == {}  # steady state: no churn
        store.register_view(  # UPDATE: new URL (upsert semantics)
            "v9", start_at=past(), pooling_delay_s=60,
            edge_function_url="http://b.invalid/hook",
        )
        assert svc.sync() == {"v9": "restarted"}
        assert svc._configs["v9"][1] == "http://b.invalid/hook"
    finally:
        svc.stop_all()


def test_push_deliver_survives_store_error(store):
    """A transient claim failure must not terminate the StreamingQuery —
    the next tick retries (the reference's cron fires regardless)."""
    store.register_decider_event("d", "e", "x")
    store.register_view(
        "vboom", start_at=past(), pooling_delay_s=1,
        edge_function_url="http://x.invalid/hook",
    )
    store.append_event("e", uid(), "d", "p1", data='{"n":1}')
    posts = []

    def flaky_post(url, payload):
        posts.append(payload)
        store.ack_event(payload["view"], payload["decider_id"], payload["offset"])
        return 200

    svc = PushDelivery(store, post=flaky_post)
    orig = store.stream_events
    calls = {"n": 0}

    def boom_then_ok(view, limit=1, seconds=300):
        calls["n"] += 1
        if calls["n"] == 1:
            raise TimeoutError("sibling held the shard lock")
        return orig(view, limit=limit, seconds=seconds)

    store.stream_events = boom_then_ok
    try:
        q = svc.start("vboom")
        assert wait_until(lambda: len(posts) >= 1), "query died on first-tick error"
        assert q.isActive
    finally:
        store.stream_events = orig
        svc.stop_all()


class _Sink:
    """Local HTTP sink (the 'edge function'): records every POST body.
    Used by the executor-mode tests — executor-side POSTs run in separate
    python worker processes, so an in-process closure can't observe them;
    a real localhost server can."""

    def __init__(self):
        import http.server
        import json as _json
        import threading

        sink = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = _json.loads(self.rfile.read(n))
                with sink._lock:
                    sink.received.append(body)
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):
                pass

        self.received: list[dict] = []
        self._lock = threading.Lock()
        self._srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.url = f"http://127.0.0.1:{self._srv.server_address[1]}/hook"
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()

    def close(self):
        self._srv.shutdown()


def _seed_fanout(store, view, url, n=6):
    store.register_decider_event("d", "e", "x")
    store.register_view(
        view, start_at=past(), pooling_delay_s=1, edge_function_url=url
    )
    for i in range(n):
        store.append_event("e", uid(), "d", f"part-{i}", data=f'{{"i":{i}}}')


def test_push_executor_mode_delivers_and_acks(store):
    """Executor fan-out (r6, VERDICT r5 #6): POSTs run on Spark python
    workers via mapPartitions; 2xx sends are acked back in one batched
    ack_events per tick.  Asserts delivery through a REAL local HTTP
    sink and full consumption (all leases acked)."""
    sink = _Sink()
    svc = PushDelivery(store, mode="executor", batch_limit=10, fanout_partitions=3)
    try:
        _seed_fanout(store, "push_exec", sink.url)
        svc.start("push_exec")
        assert wait_until(
            lambda: len({b["decider_id"] for b in sink.received}) >= 6, timeout=90
        ), f"executor mode delivered only {sink.received}"
        # ack parity: every delivered offset was acked (nothing redelivers)
        assert wait_until(
            lambda: store.locks()
            .filter("view = 'push_exec' AND last_offset < offset")
            .count()
            == 0,
            timeout=60,
        ), "executor mode did not ack delivered events"
        bodies = {b["decider_id"]: b for b in sink.received}
        assert bodies["part-3"]["data"] == '{"i":3}'
        assert bodies["part-3"]["view"] == "push_exec"
    finally:
        svc.stop_all()
        sink.close()


def test_push_executor_job_failure_is_observed(store):
    """Review r6: an executor-mode delivery job dying inside the pool
    (here: a custom post whose closure cloudpickle cannot ship — the
    exact hazard the exec_post comment warns about) must surface in
    ``job_errors`` + the log instead of vanishing in an unobserved
    Future, and must not kill the StreamingQuery."""
    import threading

    lk = threading.Lock()  # _thread.lock is unpicklable by cloudpickle

    def bad_post(url, payload):
        with lk:
            return 200

    svc = PushDelivery(store, mode="executor", batch_limit=10, post=bad_post)
    try:
        _seed_fanout(store, "push_badjob", "http://x.invalid/hook", n=3)
        q = svc.start("push_badjob")
        assert wait_until(lambda: len(svc.job_errors) >= 1, timeout=90), (
            "failed delivery job was not observed"
        )
        view, err = svc.job_errors[0]
        assert view == "push_badjob" and err
        assert q.isActive, "job failure killed the StreamingQuery"
        # nothing was acked — all 3 partitions remain unconsumed
        assert (
            store.locks()
            .filter("view = 'push_badjob' AND last_offset < offset")
            .count()
            == 3
        )
    finally:
        svc.stop_all()


def test_push_executor_no_ack_redelivers_on_lease_expiry(store):
    """r7 (VERDICT r6 wrong #2): ``mode="executor", ack_on_success=False``
    restores the reference's ack contract (extensions.sql:44-47 — the
    service never acks; the edge function acks back): 2xx sends must NOT
    consume, leases must redeliver on expiry exactly as driver mode, and
    an API-side ack then consumes for real."""
    from datetime import datetime, timezone

    sink = _Sink()
    svc = PushDelivery(
        store, mode="executor", batch_limit=10, ack_on_success=False
    )
    try:
        _seed_fanout(store, "push_noack", sink.url, n=3)
        svc.start("push_noack")
        assert wait_until(
            lambda: len({b["decider_id"] for b in sink.received}) >= 3, timeout=90
        ), f"executor no-ack mode delivered only {sink.received}"
        # 2xx responses did NOT ack: every partition remains unconsumed
        assert (
            store.locks()
            .filter("view = 'push_noack' AND last_offset < offset")
            .count()
            == 3
        ), "ack_on_success=False still consumed on 2xx"
        # expire the leases: the events must REDELIVER (at-least-once,
        # same recovery as driver mode)
        first_count = len(sink.received)
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        for i in range(3):
            store.ledger.set_locked_until(
                "push_noack", f"part-{i}", now - timedelta(seconds=1), now
            )
        assert wait_until(
            lambda: len(sink.received) >= first_count + 3, timeout=90
        ), "expired leases did not redeliver"
        # the edge function acks back through the API → consumed
        for b in list(sink.received):
            store.ack_event("push_noack", b["decider_id"], b["offset"])
        assert (
            store.locks()
            .filter("view = 'push_noack' AND last_offset < offset")
            .count()
            == 0
        )
    finally:
        svc.stop_all()
        sink.close()


def test_push_modes_deliver_identical_payload_sets(spark, store, tmp_path):
    """Driver vs executor delivery parity (the VERDICT r5 #6 done
    criterion): same events, same view config, one real HTTP sink each —
    the delivered payload sets must be identical."""
    from fstore_sql_spark import EventStore

    sink_d, sink_e = _Sink(), _Sink()
    store_e = EventStore(spark, str(tmp_path / "exec_store"))
    svc_d = PushDelivery(store, batch_limit=10)  # driver mode
    svc_e = PushDelivery(store_e, mode="executor", batch_limit=10)
    try:
        # StreamingQuery names are session-global: one view name per store
        _seed_fanout(store, "push_par_d", sink_d.url)
        _seed_fanout(store_e, "push_par_e", sink_e.url)
        svc_d.start("push_par_d")
        svc_e.start("push_par_e")
        # driver mode never acks (reference contract) — the "edge
        # function" acks back; emulate that from the sink's records
        def driver_acked():
            for b in list(sink_d.received):
                store.ack_event("push_par_d", b["decider_id"], b["offset"])
            return len({b["decider_id"] for b in sink_d.received}) >= 6

        assert wait_until(driver_acked, timeout=90), "driver mode incomplete"
        assert wait_until(
            lambda: len({b["decider_id"] for b in sink_e.received}) >= 6, timeout=90
        ), "executor mode incomplete"
        key = lambda b: (b["decider_id"], b["offset"], b["data"])  # noqa: E731
        assert {key(b) for b in sink_d.received} == {key(b) for b in sink_e.received}
        assert {b["view"] for b in sink_d.received} == {"push_par_d"}
        assert {b["view"] for b in sink_e.received} == {"push_par_e"}
    finally:
        svc_d.stop_all()
        svc_e.stop_all()
        sink_d.close()
        sink_e.close()
