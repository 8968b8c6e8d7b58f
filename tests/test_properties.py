"""Property-based tests (hypothesis) for the append-path invariants and a
compaction round-trip — beyond the reference's example-based corpus
(SURVEY.md §5.2 notes the reference has no property testing)."""

import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fstore_sql_spark import EventStore

# property sweeps run many Spark jobs per example — full tier only
pytestmark = pytest.mark.slow


def uid() -> str:
    return str(uuid.uuid4())


_counter = [0]


def fresh_chained_batch(shape):
    """A valid chained batch: one fresh stream per entry in ``shape``, with
    that many linked events."""
    rows = []
    for n in shape:
        _counter[0] += 1
        stream = f"s-{_counter[0]}"
        prev = None
        for _ in range(n):
            eid = uid()
            rows.append(
                {
                    "event": "e",
                    "event_id": eid,
                    "decider": "d",
                    "decider_id": stream,
                    "previous_id": prev,
                }
            )
            prev = eid
    return rows


stream_shapes = st.lists(st.integers(min_value=1, max_value=4), min_size=1, max_size=4)


@pytest.fixture(scope="module")
def pstore(spark, tmp_path_factory):
    store = EventStore(spark, str(tmp_path_factory.mktemp("prop_store")))
    store.register_decider_event("d", "e", "x")
    return store


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(shape=stream_shapes)
def test_append_invariants_hold(pstore, shape):
    """After any sequence of valid appends: offsets are globally unique and
    monotone with commit order; every stream's previous_id chain is intact
    with exactly one null-previous head (the invariants asserted by
    /root/reference/tests/utils/assertions.sql:285-326)."""
    before = {r["offset"] for r in pstore.events().select("offset").collect()}
    pstore.append_batch(fresh_chained_batch(shape))
    rows = pstore.events().orderBy("offset").collect()
    offsets = [r["offset"] for r in rows]
    assert len(offsets) == len(set(offsets))
    assert offsets == sorted(offsets)
    assert before <= set(offsets)
    by_stream = {}
    for r in rows:
        by_stream.setdefault((r["decider_id"], r["decider"]), []).append(r)
    for chain in by_stream.values():
        assert chain[0]["previous_id"] is None
        ids = [c["event_id"] for c in chain]
        for i, ev in enumerate(chain[1:], start=1):
            assert ev["previous_id"] == ids[i - 1]


def test_compaction_preserves_log(store):
    store.register_decider_event("d", "e", "x")
    for _ in range(5):
        store.append_batch(fresh_chained_batch([2, 1]))
    before_files = store.storage.log_file_count("events")
    before = sorted((r["offset"], r["event_id"]) for r in store.events().collect())
    n_files = store.compact(target_partitions=2)
    after = sorted((r["offset"], r["event_id"]) for r in store.events().collect())
    assert after == before
    assert n_files <= before_files
    # appends continue on the new generation
    store.append_event("e", uid(), "d", "post-compact")
    assert store.get_events("post-compact", "d").count() == 1


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=900), min_size=1, max_size=60),
    width=st.sampled_from([1, 3, 8, 1 << 16]),
)
def test_two_phase_pack_positions_equal_global_cumsum(spark, toks, width):
    """pack_positions' distributed two-phase cumsum must be IDENTICAL to
    the naive single-task global window for every token distribution and
    bucket width — including widths that put everything in one bucket and
    widths that give every row its own."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fstore_sql_spark.operators.sampling import pack_positions

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "id long, tok long"
    )
    got = {
        r["id"]: r["start"]
        for r in pack_positions(df, "id", F.col("tok"), bucket_width=width).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["id"]: r["start"]
        for r in df.select(
            "id", F.coalesce(F.sum("tok").over(w), F.lit(0)).alias("start")
        ).collect()
    }
    assert got == want


# --------------------------------------------------------------------- #
# Ledger state-machine property (r4): the positional fast paths
# (searchsorted/iloc claim+ack, in-place delta apply, delta-chain
# reload) must agree with a naive dict model AND with a cold reader
# reconstructing the same state from disk after every operation
# sequence.
# --------------------------------------------------------------------- #

ledger_ops = st.lists(
    st.one_of(
        st.tuples(st.just("insert"), st.integers(0, 30), st.integers(1, 8)),
        st.tuples(st.just("claim"), st.integers(1, 10), st.just(0)),
        st.tuples(st.just("ack_next"), st.integers(1, 10), st.just(0)),
        st.tuples(st.just("nack"), st.integers(0, 30), st.just(0)),
        st.tuples(st.just("delete_view"), st.just(0), st.just(0)),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=ledger_ops)
def test_ledger_state_machine_matches_model_and_cold_reader(tmp_path_factory, ops):
    import shutil as _shutil
    from datetime import datetime, timedelta

    import pandas as pd

    from fstore_sql_spark.ledger import ShardedLocksLedger
    from fstore_sql_spark.storage import ParquetStore

    root = str(tmp_path_factory.mktemp("ledger_prop"))
    try:
        ledger = ShardedLocksLedger(ParquetStore(None, root))
        model: dict[str, dict] = {}  # decider_id -> {lo, locked_until}
        hwm_rows: dict[str, int] = {}
        clock = datetime(2026, 1, 1)
        past = clock - timedelta(hours=1)
        view = "v"
        leased: list[tuple[str, int]] = []  # last claim result

        def hwm_frame():
            return pd.DataFrame(
                {
                    "decider_id": list(hwm_rows),
                    "offset": [hwm_rows[d] for d in hwm_rows],
                    "offset_final": False,
                }
            ).set_index("decider_id")

        for op, a, b in ops:
            clock += timedelta(seconds=1)
            if op == "insert":
                dids = [f"p{(a + k) % 40:03d}" for k in range(b)]
                rows = pd.DataFrame(
                    {
                        "view": view,
                        "decider_id": dids,
                        "last_offset": 0,
                        "locked_until": pd.Timestamp(past),
                        "created_at": pd.Timestamp(past),
                        "updated_at": pd.Timestamp(past),
                    }
                )
                ledger.insert_missing(rows)
                for d in dids:
                    model.setdefault(d, {"lo": 0, "lu": past})
                    hwm_rows.setdefault(d, 3)
            elif op == "claim" and hwm_rows:
                lease = clock + timedelta(seconds=300)
                got = ledger.claim(view, hwm_frame(), a, clock, lease)
                # post-conditions: within limit, distinct, all eligible
                assert len(got) <= a
                assert len({d for d, _ in got}) == len(got)
                for d, lo in got:
                    m = model[d]
                    assert m["lu"] < clock, (d, m)
                    assert m["lo"] < hwm_rows[d]
                    assert lo == m["lo"]
                    m["lu"] = lease
                leased = got
            elif op == "ack_next" and leased:
                acks = [(d, lo + 1) for d, lo in leased[:a]]
                ledger.ack(view, acks, clock)
                for d, o in acks:
                    model[d]["lo"] = o
                    model[d]["lu"] = clock
                leased = leased[a:]
            elif op == "nack":
                d = f"p{a % 40:03d}"
                if d in model:
                    ledger.set_locked_until(view, d, clock, clock)
                    model[d]["lu"] = clock
            elif op == "delete_view":
                ledger.delete_view(view)
                model.clear()
                leased = []
        # live frame == model
        live = ledger.to_pandas().set_index("decider_id")
        assert len(live) == len(model)
        for d, m in model.items():
            assert int(live.loc[d, "last_offset"]) == m["lo"], d
            assert live.loc[d, "locked_until"] == pd.Timestamp(m["lu"]), d
        # cold reader reconstructing from disk == live frame
        cold = ShardedLocksLedger(ParquetStore(None, root))
        a_ = ledger.to_pandas().sort_values(["view", "decider_id"]).reset_index(drop=True)
        b_ = cold.to_pandas().sort_values(["view", "decider_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a_, b_)
    finally:
        _shutil.rmtree(root, ignore_errors=True)
