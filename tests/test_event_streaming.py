"""Event-streaming tests, mirroring
/root/reference/tests/unit/event-streaming/*.sql and
 tests/integration/*. Pull-delivery semantics (SURVEY.md §2.5):
one event per partition per call, distinct partitions, at-least-once,
ack commits the consumer offset."""

import uuid
from datetime import datetime, timedelta, timezone


def uid() -> str:
    return str(uuid.uuid4())


def now_utc() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


def seed(store, n_partitions=3, events_per=2):
    store.register_decider_event("d", "e", "x")
    rows = []
    prev: dict[str, str] = {}
    for i in range(n_partitions * events_per):
        part = f"p{i % n_partitions}"
        eid = uid()
        rows.append(
            {
                "event": "e",
                "event_id": eid,
                "decider": "d",
                "decider_id": part,
                "previous_id": prev.get(part),
            }
        )
        prev[part] = eid
    store.append_batch(rows)


def test_register_view(store):
    out = store.register_view("v1", lock_timeout_s=60).collect()
    assert out[0]["view"] == "v1"
    assert out[0]["lock_timeout_s"] == 60
    # upsert on duplicate (test_register_view.sql:74-110)
    out2 = store.register_view("v1", lock_timeout_s=120).collect()
    assert out2[0]["lock_timeout_s"] == 120
    assert store.views().count() == 1


def test_backfill_before_events(store):
    """View registered before events exist: T6 gives new partitions
    last_offset=0 → everything is delivered."""
    store.register_view("v1")
    seed(store, n_partitions=2, events_per=1)
    locks = store.locks().orderBy("decider_id").collect()
    assert [r["last_offset"] for r in locks] == [0, 0]
    assert [r["offset"] for r in locks] == [1, 2]


def test_backfill_after_events_start_past(store):
    """View registered after events with start_at in the past: T7 sets
    last_offset = first offset after start_at − 1 ⇒ full replay."""
    seed(store, n_partitions=2, events_per=2)
    store.register_view("v1", start_at=now_utc() - timedelta(hours=1))
    locks = {r["decider_id"]: r for r in store.locks().collect()}
    # p0 events at offsets 1,3 — last_offset = 0; p1 at 2,4 — last_offset = 1
    assert locks["p0"]["last_offset"] == 0
    assert locks["p1"]["last_offset"] == 1


def test_backfill_start_future_marks_consumed(store):
    """start_at after all events ⇒ last_offset = partition max ⇒ nothing
    delivered (/root/reference/schema.sql:275-287 COALESCE else-branch)."""
    seed(store, n_partitions=2, events_per=2)
    store.register_view("v1", start_at=now_utc() + timedelta(hours=1))
    assert store.stream_events("v1", limit=10).count() == 0


def test_stream_basic_and_ordering(store):
    seed(store, n_partitions=3, events_per=2)
    store.register_view("v1", start_at=now_utc() - timedelta(hours=1))
    # one event per partition per call, distinct partitions
    got = store.stream_events("v1", limit=10).collect()
    assert len(got) == 3
    assert len({r["decider_id"] for r in got}) == 3
    # each is the FIRST unread of its partition (offsets 1,2,3 for p0,p1,p2)
    assert sorted(r["offset"] for r in got) == [1, 2, 3]


def test_stream_limit_and_lease(store):
    seed(store, n_partitions=3, events_per=1)
    store.register_view("v1", start_at=now_utc() - timedelta(hours=1))
    first = store.stream_events("v1", limit=1).collect()
    assert len(first) == 1
    # claimed partition is leased: a second call must pick a different one
    second = store.stream_events("v1", limit=1).collect()
    assert len(second) == 1
    assert second[0]["decider_id"] != first[0]["decider_id"]


def test_empty_view_streams_nothing(store):
    # test_stream_events.sql:81-100
    seed(store)
    store.register_view("v_empty", start_at=now_utc() + timedelta(hours=1))
    assert store.stream_events("v_empty", limit=5).count() == 0


def test_ack_advances_and_releases(store):
    seed(store, n_partitions=1, events_per=3)
    store.register_view("v1", start_at=now_utc() - timedelta(hours=1))
    e1 = store.stream_events("v1", limit=1).collect()[0]
    assert e1["offset"] == 1
    # unacked: partition leased, nothing redelivered
    assert store.stream_events("v1", limit=1).count() == 0
    store.ack_event("v1", e1["decider_id"], e1["offset"])
    e2 = store.stream_events("v1", limit=1).collect()[0]
    assert e2["offset"] == 2
    store.ack_event("v1", e2["decider_id"], e2["offset"])
    e3 = store.stream_events("v1", limit=1).collect()[0]
    assert e3["offset"] == 3
    store.ack_event("v1", e3["decider_id"], e3["offset"])
    assert store.stream_events("v1", limit=1).count() == 0


def test_nack_redelivers(store):
    # test_acknowledgment_functions.sql:14-119
    seed(store, n_partitions=1, events_per=1)
    store.register_view("v1", start_at=now_utc() - timedelta(hours=1))
    e1 = store.stream_events("v1", limit=1).collect()[0]
    assert store.stream_events("v1", limit=1).count() == 0  # leased
    store.nack_event("v1", e1["decider_id"])
    redelivered = store.stream_events("v1", limit=1).collect()[0]
    assert redelivered["offset"] == e1["offset"]  # at-least-once


def test_schedule_nack_delays(store):
    seed(store, n_partitions=1, events_per=1)
    store.register_view("v1", start_at=now_utc() - timedelta(hours=1))
    e1 = store.stream_events("v1", limit=1).collect()[0]
    store.schedule_nack_event("v1", e1["decider_id"], milliseconds=3_600_000)
    # still leased for another hour
    assert store.stream_events("v1", limit=1).count() == 0


def test_multiple_views_independent(store):
    # test_multi_decider_scenarios / test_lock_contention shape
    seed(store, n_partitions=2, events_per=1)
    past = now_utc() - timedelta(hours=1)
    store.register_view("v1", start_at=past)
    store.register_view("v2", start_at=past)
    a = store.stream_events("v1", limit=10).collect()
    b = store.stream_events("v2", limit=10).collect()
    assert len(a) == 2 and len(b) == 2  # leases are per-view


def test_new_partition_after_registration_delivered(store):
    """T6 insert branch: partitions born after registration get
    last_offset=0 even with a future start_at
    (/root/reference/schema.sql:244-252)."""
    store.register_decider_event("d", "e", "x")
    store.register_view("v1", start_at=now_utc() + timedelta(hours=1))
    store.append_event("e", uid(), "d", "newpart")
    got = store.stream_events("v1", limit=5).collect()
    assert len(got) == 1 and got[0]["decider_id"] == "newpart"


def test_unregister_view_cascades_locks(store):
    """T10 + FK cascade (/root/reference/schema.sql:199): deleting a view
    removes its locks; other views' locks survive."""
    from datetime import datetime, timedelta, timezone

    import uuid as _uuid

    past = datetime.now(timezone.utc).replace(tzinfo=None) - timedelta(hours=1)
    store.register_decider_event("d", "e", "x")
    store.append_event("e", str(_uuid.uuid4()), "d", "p1")
    store.register_view("gone", start_at=past)
    store.register_view("stays", start_at=past)
    assert store.locks().filter("view = 'gone'").count() == 1

    deleted = store.unregister_view("gone")
    assert [r["view"] for r in deleted.collect()] == ["gone"]
    assert store.views().filter("view = 'gone'").count() == 0
    assert store.locks().filter("view = 'gone'").count() == 0
    assert store.locks().filter("view = 'stays'").count() == 1
    # idempotent: deleting again returns empty, changes nothing
    assert store.unregister_view("gone").count() == 0


def test_ack_events_batch_commits_multiple_partitions(store):
    seed(store, n_partitions=3, events_per=2)
    store.register_view("vb", start_at=now_utc() - timedelta(days=1))
    batch = store.stream_events("vb", limit=3).collect()
    assert len(batch) == 3
    store.ack_events("vb", [(r["decider_id"], r["offset"]) for r in batch])
    # every partition's consumer offset advanced; next call delivers the
    # second event of each partition, not a redelivery.
    again = store.stream_events("vb", limit=3).collect()
    assert {(r["decider_id"], r["offset"]) for r in again}.isdisjoint(
        {(r["decider_id"], r["offset"]) for r in batch}
    )
    assert len(again) == 3
    store.ack_events("vb", [(r["decider_id"], r["offset"]) for r in again])
    assert store.stream_events("vb", limit=3).collect() == []


def test_ack_events_empty_is_noop(store):
    seed(store, n_partitions=1, events_per=1)
    store.register_view("ve", start_at=now_utc() - timedelta(days=1))
    assert store.ack_events("ve", []).collect() == []
    assert len(store.stream_events("ve", limit=1).collect()) == 1


def test_three_views_full_drain_at_least_once(store):
    """The reference's concurrent-consumer load shape
    (/root/reference/tests/performance/load-tests/
    test_concurrent_consumer_performance.sql:36-68): N events over
    several partitions, 3 registered views, each independently drained
    claim→deliver→ack.  Every view must see EVERY event exactly once
    (single consumer per view, acks commit), with per-partition offset
    order preserved within each view's delivery sequence."""
    seed(store, n_partitions=4, events_per=3)
    past = now_utc() - timedelta(hours=1)
    views = ["va", "vb", "vc"]
    for v in views:
        store.register_view(v, start_at=past)
    for v in views:
        seen: list[tuple[str, int]] = []
        while True:
            rows = store.stream_events(v, limit=10).collect()
            if not rows:
                break
            store.ack_events(v, [(r["decider_id"], r["offset"]) for r in rows])
            seen.extend((r["decider_id"], r["offset"]) for r in rows)
        assert len(seen) == 12, f"{v}: {len(seen)}"
        assert len(set(seen)) == 12  # no duplicate deliveries after ack
        per_part: dict[str, list[int]] = {}
        for part, off in seen:
            per_part.setdefault(part, []).append(off)
        for part, offs in per_part.items():
            assert offs == sorted(offs), (part, offs)


def test_prefetch_hit_rate_steady_state(store):
    """Read-ahead observability (VERDICT r3 #6): draining a view whose
    windows fit one refill must serve almost every round from the cache
    — one refill job, first-round misses only.  A collapsed hit rate is
    the signature of the sf1 warm-order bug class, caught here instead
    of as silently slow delivery."""
    seed(store, n_partitions=4, events_per=5)
    store.register_view("v1", start_at=now_utc() - timedelta(hours=1))
    drained = 0
    while True:
        rows = store.stream_events("v1", limit=4).collect()
        if not rows:
            break
        store.ack_events("v1", [(r["decider_id"], r["offset"]) for r in rows])
        drained += len(rows)
    assert drained == 20
    pf = store.prefetch_counters
    assert pf["refills"] == 1, pf
    # 4 first-round misses, everything after from cache
    assert pf["hits"] / (pf["hits"] + pf["misses"]) >= 0.75, pf


def test_prefetch_deep_windows_for_missed_partitions(store):
    """r12 (VERDICT r11 #3, the real mechanism): the residual sf1 tail
    refills were SYNCHRONIZED WINDOW EXHAUSTION — the claim re-picks the
    same ~limit partitions every tick, one event each, so all their
    16-deep windows exhaust together every 16 ticks.  Partitions that
    MISS have demonstrated demand and must get PREFETCH_DEPTH_HOT-deep
    windows on refill; a 20-event partition then fits ONE window (20 <=
    64) and the whole drain pays exactly one refill job, where the
    shallow depth would exhaust at 16 and pay a second."""
    seed(store, n_partitions=2, events_per=20)
    store.register_view("v1", start_at=now_utc() - timedelta(hours=1))
    rows = store.stream_events("v1", limit=2).collect()
    assert len(rows) == 2
    for part in ("p0", "p1"):
        win = store._prefetch[("v1", part)]
        assert win["complete"], win  # whole history fetched in one window
        assert len(win["rows"]) == 20, (part, len(win["rows"]))
    drained = 2
    while True:
        store.ack_events(
            "v1", [(r["decider_id"], r["offset"]) for r in rows]
        )
        rows = store.stream_events("v1", limit=2).collect()
        if not rows:
            break
        drained += len(rows)
    assert drained == 40
    assert store.prefetch_counters["refills"] == 1, store.prefetch_counters


def test_union_eligible_pairs_warms_in_walk_order():
    """r12 (VERDICT r11 #3, the named prefetch drift lever): the warm
    set must follow the LEDGER's upcoming claim order — shards in walk
    order from the sticky shard, (hwm offset, last_offset) within a
    shard, with each foreign shard's HEAD candidate first in fairness-
    rotor order.  The r11 form sorted candidates GLOBALLY by hwm
    offset, spreading the budget evenly over all shards while the walk
    drained the sticky shard in full first — so the walk crossed into
    unwarmed batches of its own shard every ~PREFETCH_DEPTH ticks (the
    sf1 residual 9/48 tail refills).  Spark-free: synthetic ledger
    frames, unbound call."""
    import pandas as pd

    from fstore_sql_spark.ledger import ShardedLocksLedger
    from fstore_sql_spark.store import EventStore

    class Shard:
        def __init__(self, ids, hwm_base):
            self._df = pd.DataFrame(
                {"last_offset": [0] * len(ids)},
                index=pd.MultiIndex.from_tuples(
                    [("v", d) for d in ids], names=["view", "decider_id"]
                ),
            )
            self.hwm = pd.DataFrame(
                {"offset": range(hwm_base, hwm_base + len(ids))}, index=ids
            )

    # shard 0 holds the GLOBALLY lowest hwm offsets — the r11 global
    # sort would spend the whole budget there; the walk starts at 1.
    shards = [
        Shard(["a0", "a1", "a2", "a3"], hwm_base=1),
        Shard(["b0", "b1", "b2", "b3"], hwm_base=100),
        Shard(["c0", "c1", "c2", "c3"], hwm_base=200),
    ]

    class Ledger:
        n_shards = 3
        _sticky = 1
        _rotor = 2
        upcoming_walk_order = ShardedLocksLedger.upcoming_walk_order
        upcoming_probe_order = ShardedLocksLedger.upcoming_probe_order

        def __init__(self):
            self.shards = shards

    class Hwm:
        def for_shard(self, k):
            return shards[k].hwm

    class Fake:
        PREFETCH_PARTITIONS = 7
        ledger = Ledger()
        _prefetch = {}

    got = [d for d, _ in EventStore._union_eligible_pairs(Fake(), "v", [], Hwm())]
    # probe heads first (rotor order 2,0 — sticky 1 skipped), then the
    # walk stream (shard 1 in full, then shard 2 minus the taken head)
    assert got == ["c0", "a0", "b0", "b1", "b2", "b3", "c1"], got

    # missing pairs are mandatory and already-warm partitions skipped
    Fake._prefetch = {("v", "b1"): {}}
    got = [
        d
        for d, _ in EventStore._union_eligible_pairs(
            Fake(), "v", [("c3", 0)], Hwm()
        )
    ]
    assert got[0] == "c3" and "b1" not in got and len(got) == 7, got


def test_prefetch_eviction_is_true_lru(store):
    """r11 (found by the b3 tail window at sf1): the evictor pops from
    the FRONT of the insertion-ordered dict, but plain dict assignment
    to an existing key keeps its original position — so a re-warmed or
    just-served window stayed at the front and the evictor killed the
    hottest (stickiest-claimed) partitions first.  Past the row cap
    every tick missed → refilled → was evicted again: 48/48 tail
    refills at sf1, 1.16 s/tick vs 39 ms on a hit.  The serve path must
    therefore TOUCH (move-to-end) windows it reads, making eviction
    order true LRU."""
    store._prefetch.clear()

    def mk(n):
        return {
            "lo": 0,
            "rows": [{"offset": i + 1} for i in range(n)],
            "complete": False,
        }

    store._prefetch[("v", "hot")] = mk(2)
    store._prefetch[("v", "cold1")] = mk(2)
    store._prefetch[("v", "cold2")] = mk(2)
    served, missing, drained = store._serve_from_prefetch("v", [("hot", 0)])
    assert [r["offset"] for r in served] == [1] and not missing
    # the served window moved behind the untouched ones
    assert list(store._prefetch) == [("v", "cold1"), ("v", "cold2"), ("v", "hot")]
    store.PREFETCH_MAX_ROWS = 4  # instance shadow; forces one eviction
    store._evict_prefetch()
    assert ("v", "hot") in store._prefetch          # survived: hottest
    assert ("v", "cold1") not in store._prefetch    # evicted: coldest
    assert ("v", "cold2") in store._prefetch
