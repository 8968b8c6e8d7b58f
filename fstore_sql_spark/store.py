"""EventStore — the engine facade (SURVEY.md §2.1 A1–A9).

Every API function of the reference (``/root/reference/schema.sql:325-468``)
is re-expressed as a declarative DataFrame program:

==========================  =================================================
reference function          engine method
==========================  =================================================
register_decider_event A1   EventStore.register_decider_event
append_event           A2   EventStore.append_event / append_batch
get_events             A3   EventStore.get_events
get_last_event         A4   EventStore.get_last_event
register_view          A5   EventStore.register_view
stream_events          A6   EventStore.stream_events
ack_event              A7   EventStore.ack_event
nack_event             A8   EventStore.nack_event
schedule_nack_event    A9   EventStore.schedule_nack_event
==========================  =================================================

Design decisions (SURVEY.md §7):

- **Set-based validation** (§2.3): the reference fires three plpgsql row
  triggers + three constraints per inserted row; we validate a whole batch
  with semi/anti joins against the log snapshot plus window functions for
  intra-batch chain checks — strictly better asymptotics for bulk appends.
- **Offset assignment** (§7.4): appends are serialized through the single
  committer; ``offset = manifest.max_offset + row_number() OVER (ORDER BY
  seq)``.  Unique, globally monotonic in commit order, per-stream ascending
  — exactly BIGSERIAL minus rollback gaps (gaps are permitted; the
  reference's tests assert only monotonicity).
- **Derive, don't dual-write** (§7.5): the ``locks`` table's high-watermark
  columns (``offset``, ``offset_final``) are a pure function of ``events``
  and are recomputed at read time; only genuine consumer state
  (``last_offset``, ``locked_until``) is persisted.  An append is visible to
  streaming the moment the log commit lands — no events↔locks atomicity gap.
- **NOW() freezing** (§7.3 item 6): Postgres freezes NOW() per transaction;
  each engine API call computes one timestamp on the driver and injects it
  as a literal, so a call behaves like one reference transaction.
"""

from __future__ import annotations

import threading
import time
import uuid as _uuid
from contextlib import contextmanager
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import os

import json

from fstore_sql_spark import errors
from fstore_sql_spark.hwm import ShardedHwm
from fstore_sql_spark.ledger import ProcessLock, ShardedLocksLedger
from fstore_sql_spark.functions.typed_payload import (
    as_struct_type,
    is_widening,
    typed_payload_column,
    validate_evolution,
)
from fstore_sql_spark.schemas import (
    DECIDERS_SCHEMA,
    EVENTS_SCHEMA,
    PAYLOAD_SCHEMAS_SCHEMA,
    VIEWS_SCHEMA,
)
from fstore_sql_spark.storage import Manifest, ParquetStore

_EVENTS = "events"
_DECIDERS = "deciders"
_VIEWS = "views"
_LOCKS = "locks"
_PAYLOAD = "payload_schemas"

# Default unlock instant: NOW() - 1ms (/root/reference/schema.sql:190-191).
_UNLOCK_DELTA = timedelta(milliseconds=1)


def _utcnow() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


class EventStore:
    """A PySpark-native event store rooted at ``path``.

    One instance is the single committer for its path (SURVEY.md §7.3/§7.5);
    reads are safe from anywhere.
    """

    # Read-ahead depth of the delivery cache: one refill Spark job fetches
    # the next K unread events per claimed partition; the following K-1
    # claims of that partition are served driver-side (see stream_events).
    PREFETCH_DEPTH = 16
    # Demand-aware window depth (r12, VERDICT r11 #3): the r11 "claim-
    # rotation drift" hypothesis was WRONG — instrumentation (BASELINE.md
    # r12 tail section) showed the residual sf1 tail refills are
    # SYNCHRONIZED WINDOW EXHAUSTION: the claim re-picks the same ~limit
    # hot partitions every tick (lowest (hwm, last_offset) of the sticky
    # shard until drained), each tick consumes exactly one event per
    # partition, so all ~100 windows exhaust together every
    # PREFETCH_DEPTH ticks — a mass miss at ticks 16/32/48, plus phase-
    # shifted stragglers.  Partitions that MISS have demonstrated demand:
    # they get 4x-deep windows on refill, stretching the mass cadence to
    # PREFETCH_DEPTH_HOT ticks, while the speculative top-up (most of
    # which is never claimed before the next commit clears the cache)
    # stays shallow.  DEEP_CAP bounds the extra rows per refill so the
    # two-generation cap invariant stays computable.
    PREFETCH_DEPTH_HOT = 64
    PREFETCH_DEEP_CAP = 512
    # Partitions covered per refill job: bounds the windows fetched to
    # PREFETCH_PARTITIONS * PREFETCH_DEPTH (+ the deep-window surplus)
    # rows per job.
    PREFETCH_PARTITIONS = 2000
    # Total cached event rows across (view, partition) windows before LRU
    # eviction — bounds driver memory like any client-side cursor buffer.
    # Sized to hold TWO refill generations (one generation = the shallow
    # budget plus the deep-window surplus), so the cap can never FORCE
    # eviction of live windows mid-cycle (the old 50k was smaller than
    # two generations).  Computed, not hardcoded (ADVICE r11): retuning
    # any constant keeps the two-generation invariant.  ~10s of MB of
    # driver dicts at worst — the same order as one collected delivery
    # batch.
    PREFETCH_MAX_ROWS = 2 * (
        PREFETCH_PARTITIONS * PREFETCH_DEPTH
        + PREFETCH_DEEP_CAP * (PREFETCH_DEPTH_HOT - PREFETCH_DEPTH)
    )

    # Auto paging budget (r7, VERDICT r6 #4): with ``expected_partitions``
    # given and no explicit residency choice, cap driver-resident consumer
    # state at this many shard frames — 16 × TARGET_ROWS_PER_SHARD ≈ 512k
    # rows (~40 MB), a plateau independent of the store's partition count.
    # BASELINE.md measured the r6 evict-cache's worst-case paging tax at
    # 8-11%, which made paging "a reasonable DEFAULT posture"; this makes
    # it the actual default for stores that declare their scale.
    AUTO_MAX_RESIDENT_SHARDS = 16

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        cache_log: bool = True,
        max_resident_shards: "int | str | None" = None,
        expected_partitions: int | None = None,
        expected_consumers: int | None = None,
    ):
        """``expected_partitions`` (r6, VERDICT r5 #3) sizes the initial
        consumer-state shard count when this open CREATES the store
        (``ShardedLocksLedger.shards_for``: next power of two keeping
        shards ≤ ~32k partitions, the tick-latency sizing rule in
        BASELINE.md).  Ignored for existing stores — the on-disk marker
        pins the layout; grow later with ``tools/resize_shards.py``
        (the ledger logs a p95-tick warning when that becomes due).

        ``expected_consumers`` (r13, VERDICT r12 #3) adds the OTHER
        measured sizing rule to the same creation-time hint: concurrent
        claim throughput collapses once workers outnumber shards (the
        r11 scaling knee, BASELINE.md — ~5x/worker LOSS past the knee),
        and the partition-based rule under-shards for concurrency (8
        shards at 200k partitions; the knee wants shards >= workers).
        The layout is created with ``max(shards_for(expected_partitions),
        next_pow2(expected_consumers))``, both clamped to the supported
        range.  Like ``expected_partitions`` it is a hint: an existing
        on-disk marker wins, and it never changes delivered semantics —
        only the shard count a FRESH store is laid out with.

        Giving ``expected_partitions`` also enables the RECOMMENDED
        production posture (r7, VERDICT r6 #4): LRU shard paging with a
        ``min(shards_for(N), AUTO_MAX_RESIDENT_SHARDS)`` residency budget,
        so a store that declares its scale gets O(active shards) driver
        memory by default.  Opt out with ``max_resident_shards="all"``
        (keep every shard resident — the pre-r7 default), or override
        with an explicit integer budget."""
        self.spark = spark
        self.storage = ParquetStore(spark, path)
        self._commit_lock = threading.RLock()
        self._cache_log = cache_log
        self._events_cached: DataFrame | None = None
        self._state_cached: dict[str, DataFrame] = {}
        # (view, decider_id) -> {"lo": fetch-time last_offset, "rows":
        # [Row sorted by offset], "complete": window reached hwm}
        self._prefetch: dict[tuple[str, str], dict] = {}
        # read-ahead cache observability (VERDICT r3 #6): the cache is
        # load-bearing for delivery perf, so hit/miss/refill are counted
        # and surfaced via stats() / asserted in bench + tests — a
        # silent ordering regression (the sf1 warm-order bug) would show
        # as a collapsed hit rate instead of just slow rounds.
        self.prefetch_counters = {"hits": 0, "misses": 0, "refills": 0}
        # per-phase wall times of the most recent append_batch (b1
        # profile, VERDICT r3 #3): candidates/validate/t6/commit
        self.last_append_profile: dict[str, float] = {}
        self.storage.init_log(_EVENTS, EVENTS_SCHEMA)
        self.storage.init_state(_DECIDERS, DECIDERS_SCHEMA)
        self.storage.init_state(_VIEWS, VIEWS_SCHEMA)
        self.storage.init_state(_PAYLOAD, PAYLOAD_SCHEMAS_SCHEMA)
        # Consumer-state authority: in-memory + pyarrow-flushed snapshots +
        # per-shard cross-process lease locks (the row-lock-granularity
        # SKIP LOCKED analogue) — see ledger.py module doc.  Sharded by
        # hash(decider_id) so concurrent consumer processes claiming
        # different partitions don't serialize on one mutex; mutations
        # self-guard and never run Spark jobs.
        # ``max_resident_shards`` bounds driver-resident consumer state
        # (LRU shard paging, VERDICT r4 #2): None keeps all shards loaded
        # (right up to ~10M partitions on an 8 GiB driver — BASELINE.md
        # scale-ceiling table); an explicit budget makes residency
        # O(active shards) for the 10^8-partition regime.
        if max_resident_shards is None:
            env = os.environ.get("FSTORE_MAX_RESIDENT_SHARDS")
            if env:
                max_resident_shards = env if env == "all" else None
                if max_resident_shards is None:
                    try:
                        max_resident_shards = int(env)
                    except ValueError:
                        raise ValueError(
                            "FSTORE_MAX_RESIDENT_SHARDS must be an integer "
                            f">= 1 or 'all', got {env!r}"
                        ) from None
        if isinstance(max_resident_shards, str):
            if max_resident_shards != "all":
                raise ValueError(
                    "max_resident_shards must be an integer >= 1, None, or "
                    f"'all', got {max_resident_shards!r}"
                )
            max_resident_shards = None  # explicit keep-everything-resident
        elif max_resident_shards is None and expected_partitions is not None:
            # the recommended posture (r7, VERDICT r6 #4): a declared scale
            # turns paging ON with a budget that plateaus regardless of N —
            # small stores get a budget >= their shard count (all resident,
            # zero tax), big ones get O(active shards) residency
            max_resident_shards = max(
                2,
                min(
                    self.AUTO_MAX_RESIDENT_SHARDS,
                    ShardedLocksLedger.shards_for(int(expected_partitions)),
                ),
            )
        if max_resident_shards is not None and max_resident_shards < 1:
            # 0 would silently enable evict-everything-per-tick (ADVICE r5)
            raise ValueError(
                "max_resident_shards (or FSTORE_MAX_RESIDENT_SHARDS) must be "
                f">= 1, got {max_resident_shards}"
            )
        self.ledger = ShardedLocksLedger(
            self.storage,
            _LOCKS,
            max_resident=max_resident_shards,
            expected_partitions=expected_partitions,
            expected_consumers=expected_consumers,
        )
        # Cross-process single-committer enforcement (VERDICT r4 #1): the
        # reference gets multi-connection producer safety from
        # ``previous_id UNIQUE`` + row locks (/root/reference/schema.sql:44,
        # tests/integration/concurrency/test_concurrent_producers.sql); here
        # every events-log mutation (append, compaction) holds this flock so
        # two producer PROCESSES serialize instead of racing the manifest's
        # last-writer-wins os.replace.  Held across validation too, so the
        # second writer's §2.3 checks see the first writer's committed
        # events (the row-lock-wait analogue).  Crash recovery is the
        # kernel's: flock drops when the holder dies.
        self._committer = ProcessLock(
            os.path.join(self.storage.root, f"{_EVENTS}_COMMITTER.lock")
        )
        self._committer_depth = threading.local()
        self._state_seen_ver: dict[str, int] = {}
        # Sharded + paged per-partition high-watermark (r6, VERDICT r5
        # #1): same crc32 shard routing and LRU budget as the ledger, so
        # a paged store's TOTAL driver residency — consumer state AND
        # watermark — is O(active shards).  See hwm.py module doc.
        self._hwm_shards = ShardedHwm(
            self.storage,
            spark,
            self.ledger.n_shards,
            self.events,
            max_resident=max_resident_shards,
        )
        self._seen_commit_id = self.storage.read_published(_EVENTS)
        self._seen_log_gen = self.storage._log_gen(_EVENTS)
        self._sql_view_prefixes: set[str] = set()

    # ------------------------------------------------------------------ #
    # table accessors
    # ------------------------------------------------------------------ #

    def events(self) -> DataFrame:
        """The append-only event log (/root/reference/schema.sql:27-54).

        The log DataFrame is persisted (MEMORY_AND_DISK_DESER) between
        mutations: every read-path API call — ``stream_events``' watermark
        join, ``get_events``, T7 backfill — re-derives from the log, and
        without the cache each call re-lists and re-scans parquet.  Spark
        manages eviction, so at cluster scale the hot tail stays in memory
        and cold partitions spill or recompute; correctness never depends
        on residency.  Own appends and compaction invalidate directly; a
        SIBLING process's commits are caught by ``_refresh_external``,
        which keys on the post-append ``_PUBLISHED`` marker — never on the
        pre-append allocation manifest — so the cache is never rebuilt
        from a log mid-append (ADVICE r2).  ``cache_log=False`` opts out
        entirely."""
        if not self._cache_log:
            return self.storage.read_log(_EVENTS, EVENTS_SCHEMA)
        # Sibling-commit check on EVERY cached read, not just the claim
        # path: without it a reader process served an indefinitely stale
        # log from get_events/get_last_event/stats — and could crash
        # outright once the committer's compactions GC'd the generation
        # its cached plan still referenced (review r4).  Cost: one tiny
        # marker-file read; under the commit lock so a concurrent
        # mutator can't race the cache swap.
        with self._commit_lock:
            self._refresh_external()
            if self._events_cached is None:
                self._events_cached = self.storage.read_log(
                    _EVENTS, EVENTS_SCHEMA
                ).persist()
            return self._events_cached

    def _invalidate_log_cache(self) -> None:
        if self._events_cached is not None:
            self._events_cached.unpersist()
            self._events_cached = None
        # NOTE: the sharded hwm is NOT invalidated here — it is keyed on
        # the published commit id (sync), so a compaction (same commits,
        # new layout) keeps it, a commit advances it incrementally
        # (merge_batch), and an external commit re-syncs on next access.
        # Append-only log ⇒ cached windows stay VALID within a commit
        # generation; a new commit may extend a window marked complete, so
        # drop on every invalidation (cheap — it's a read-ahead cache).
        self._prefetch.clear()

    def _hwm_view(self) -> ShardedHwm:
        """The sharded watermark, synced to the same published commit the
        cached log serves — what the claim path reads per shard, and the
        full-table surfaces (``locks()``, T7) read via ``.full()``.
        Derived (never dual-written): one Spark rebuild on first need (or
        after an unmaintained external commit), then folded incrementally
        from each committed batch's own aggregate (``_commit``), so steady
        ingest+deliver never re-aggregates the log."""
        self._hwm_shards.sync(self._seen_commit_id)
        return self._hwm_shards

    def _hwm_pandas(self) -> pd.DataFrame:
        """Whole-watermark frame (index decider_id; columns offset,
        offset_final) — kept for the full-table read surfaces; per-shard
        consumers use ``_hwm_view().for_shard(k)`` instead (paging)."""
        return self._hwm_view().full()

    def _refresh_external(self) -> None:
        """Cross-process read freshness: if ANOTHER committer PUBLISHED a
        commit since our caches were built, drop them so claims see the
        new events.  Keys on the post-append published marker, not the
        pre-append allocation manifest: a sibling mid-append (manifest
        advanced, log files still landing) must NOT trigger a rebuild —
        that would cache a partial batch and mark it fresh, stalling or
        (worse) skipping events (ADVICE r2, high).  One tiny file read
        per call."""
        commit = self.storage.read_published(_EVENTS)
        # Orphaned-commit roll-forward for PURE READERS (r5): if every
        # writer died between manifest advance and marker publish, the
        # marker only moves again at the next committer-guard acquisition
        # — which a read-only process never performs, leaving a complete
        # on-disk batch invisible to it forever.  published < manifest is
        # the tell; a NON-BLOCKING try_acquire disambiguates the two
        # causes: acquired ⇒ no live committer exists (flock died with
        # it) ⇒ roll the marker forward exactly as _committer_guard
        # would; busy ⇒ a live committer is mid-append ⇒ normal, skip.
        # Cost on the hot read path: one extra tiny file read, and the
        # flock attempt only in the (rare) lag window.
        if commit < self.storage.read_manifest(_EVENTS).commit_id and not getattr(
            self._committer_depth, "n", 0
        ):
            if self._committer.try_acquire():
                self._committer_depth.n = 1
                try:
                    self._recover_unpublished()
                finally:
                    self._committer_depth.n = 0
                    self._committer.release()
                commit = self.storage.read_published(_EVENTS)
        # the generation pointer catches a sibling's COMPACTION, which
        # rewrites the log layout without minting a commit id — a reader
        # keyed on the commit alone kept a plan over the old generation
        # until its GC turned reads into FileNotFoundError (review r4)
        gen = self.storage._log_gen(_EVENTS)
        if commit != self._seen_commit_id or gen != self._seen_log_gen:
            self._invalidate_log_cache()
            self._seen_commit_id = commit
            self._seen_log_gen = gen
            self._rebind_sql_views()

    def deciders(self) -> DataFrame:
        """Registry state, persisted between registrations: C3 validation
        reads it on EVERY append, and the registry only changes on
        register_decider_event — the textbook cache.  Same invalidation
        discipline as the log cache (single committer; locks state is NOT
        cached — delivery rewrites it constantly)."""
        return self._cached_state(_DECIDERS, DECIDERS_SCHEMA)

    def views(self) -> DataFrame:
        return self._cached_state(_VIEWS, VIEWS_SCHEMA)

    def _cached_state(self, table: str, schema) -> DataFrame:
        if not self._cache_log:
            return self.storage.read_state(table, schema)
        # Sibling-process freshness (same discipline as _refresh_external
        # for the log): a registration committed by ANOTHER process flips
        # the table's _LATEST pointer; serving the cached frame past that
        # would let C3 validation reject events the sibling registered.
        # Cost: one tiny pointer-file read per call.
        ver = self.storage.state_version(table)
        if table in self._state_cached and self._state_seen_ver.get(table) != ver:
            self._invalidate_state_cache(table)
        if table not in self._state_cached:
            self._state_cached[table] = self.storage.read_state(
                table, schema
            ).persist()
            self._state_seen_ver[table] = ver
        return self._state_cached[table]

    def _invalidate_state_cache(self, table: str) -> None:
        self._state_seen_ver.pop(table, None)
        df = self._state_cached.pop(table, None)
        if df is not None:
            df.unpersist()
        self._rebind_sql_views()

    def locks(self) -> DataFrame:
        """Reference-shaped ``locks`` rows (/root/reference/schema.sql:180-200).

        Persisted consumer state joined with high-watermarks derived from the
        log: ``offset`` = partition max offset, ``offset_final`` = final flag
        of the partition's last event — exactly what trigger T6 maintains
        eagerly in the reference (/root/reference/schema.sql:240-263), but
        computed instead of dual-written (SURVEY.md §7.5).

        .. warning:: The RESULT is full-table by contract — O(#partitions
           × #views) rows materialized on the DRIVER at the moment of the
           merge, even on a paged store (resident shard frames still
           respect the budget during the walk; the concatenated result
           does not).  On a 10⁸-partition store that is a multi-GB frame:
           operational tooling at that scale should use ``locks_iter()``
           (one shard-sized frame at a time) instead.
        """
        # Per-partition high-watermark: max offset + final flag of last event.
        # max_by == DISTINCT ON (decider_id) ... ORDER BY offset DESC
        # (/root/reference/schema.sql:290-294).  Both sides are
        # driver-resident (ledger + hwm frame), so the reference-shaped
        # join is a pandas merge — no Spark job to expose the table.
        # under the commit lock: the read rebinds shard frames, which
        # must not race an in-flight mutator thread (claim/ack/T6);
        # to_pandas itself refreshes each shard (sibling freshness) and
        # re-enforces the paging budget when it returns (ADVICE r5)
        with self._commit_lock:
            self._refresh_external()
            state = self.ledger.to_pandas()
            hwm = self._hwm_pandas().reset_index()
        schema = (
            "view string, decider_id string, offset long, last_offset long, "
            "locked_until timestamp, offset_final boolean, "
            "created_at timestamp, updated_at timestamp"
        )
        merged = state.merge(hwm, on="decider_id", how="inner")[self._LOCKS_COLS]
        if merged.empty:
            return self.spark.createDataFrame([], schema)
        return self.spark.createDataFrame(merged, schema=schema)

    _LOCKS_COLS = [
        "view",
        "decider_id",
        "offset",
        "last_offset",
        "locked_until",
        "offset_final",
        "created_at",
        "updated_at",
    ]

    def locks_iter(self):
        """Shard-batched variant of ``locks()`` for operational tooling on
        huge-partition stores (r7, VERDICT r6 wrong #3): yields one
        reference-shaped PANDAS frame per consumer-state shard, so peak
        driver residency is one shard (~TARGET_ROWS_PER_SHARD rows under
        the sizing rule), never the whole table.  Rows across all yielded
        frames equal ``locks()``; within a frame, ordering is the shard's
        (sorted by key).  Each shard is read under the commit lock (same
        freshness discipline as ``locks()``); the iterator itself holds
        no lock between yields, so a concurrent mutator may advance later
        shards — the same read-skew any shard-at-a-time scan of live
        consumer state has."""
        with self._commit_lock:
            self._refresh_external()
            n = self.ledger.n_shards
        for k in range(n):
            with self._commit_lock:
                state = self.ledger.shard_frame(k)
                hwm_k = self._hwm_view().for_shard(k).reset_index()
            merged = state.merge(hwm_k, on="decider_id", how="inner")
            if len(merged):
                yield merged[self._LOCKS_COLS]

    def compact(self, target_partitions: int | None = None) -> int:
        """OPTIMIZE analogue: rewrite the event log clustered by
        ``decider_id`` and sorted by (decider_id, offset) within files, so
        parquet min/max stats prune stream replays like the reference's
        ``decider_index`` B-tree (/root/reference/schema.sql:56).  Run
        periodically after many small appends (each append batch writes its
        own files).  Returns the new file count.

        Readers are snapshot-safe (generation-pointer flip); concurrent
        APPENDS must be quiesced — the commit lock enforces that in-process
        and the cross-process committer flock across processes.
        """
        with self._commit_lock, self._committer_guard():
            events = self.events()
            if target_partitions is None:
                n = events.count()
                target_partitions = max(1, n // 2_000_000)
            compacted = events.repartition(target_partitions, "decider_id").sortWithinPartitions(
                "decider_id", "offset"
            )
            self.storage.compact_log(_EVENTS, compacted)
            self._invalidate_log_cache()
            return self.storage.log_file_count(_EVENTS)

    def maybe_compact(
        self, max_files: int = 64, target_partitions: int | None = None
    ) -> int | None:
        """Opportunistic OPTIMIZE: compact the event log only when its
        current-generation file count exceeds ``max_files`` (each append
        batch writes its own files, so continuous small appends fragment
        the log and slow scans).  Returns the new file count, or None when
        skipped.  Synchronous full rewrite — call between batches from an
        ingest loop (the auto-compaction analogue) or from a maintenance
        window; readers stay snapshot-safe via the generation pointer."""
        if self.storage.log_file_count(_EVENTS) <= max_files:
            return None
        return self.compact(target_partitions)

    def register_sql_views(self, prefix: str = "") -> None:
        """Expose all four tables as temp views so ``spark.sql`` works over
        the store (SURVEY.md §7.1 step 7).

        Temp views freeze the DataFrame they were created from; a view
        bound once would keep serving the pre-append log (and break after
        a compaction GC'd its generation).  The prefix is therefore
        remembered and the views re-bound whenever a cache invalidation
        gives any table a new DataFrame (review r4)."""
        self._sql_view_prefixes.add(prefix)
        self._rebind_sql_views()

    def _rebind_sql_views(self) -> None:
        for prefix in self._sql_view_prefixes:
            self.events().createOrReplaceTempView(f"{prefix}events")
            self.deciders().createOrReplaceTempView(f"{prefix}deciders")
            self.views().createOrReplaceTempView(f"{prefix}views")
            self.locks().createOrReplaceTempView(f"{prefix}locks")

    # ------------------------------------------------------------------ #
    # A1 register_decider_event  (/root/reference/schema.sql:325-332)
    # ------------------------------------------------------------------ #

    def register_decider_event(
        self,
        decider: str,
        event: str,
        description: str,
        event_version: int = 1,
    ) -> DataFrame:
        """INSERT into deciders RETURNING; duplicate PK ⇒ error (C4).

        Under the committer flock: write_state is a read-modify-write of
        the whole snapshot, so two registering PROCESSES would otherwise
        lose one row (last-writer-wins)."""
        with self._commit_lock, self._committer_guard():
            existing = self.deciders()
            dup = (
                existing.filter(
                    (F.col("decider") == decider)
                    & (F.col("event") == event)
                    & (F.col("event_version") == event_version)
                ).count()
                > 0
            )
            if dup:
                raise errors.DuplicateRegistrationError(decider, event, event_version)
            row = self.spark.createDataFrame(
                [(decider, event, int(event_version), description)], DECIDERS_SCHEMA
            )
            self.storage.write_state(_DECIDERS, existing.unionByName(row))
            self._invalidate_state_cache(_DECIDERS)
            return row

    # ------------------------------------------------------------------ #
    # Versioned payload schemas + typed view (engine extension,
    # SURVEY.md §1.3 schema-on-read; VERDICT r4 #4)
    # ------------------------------------------------------------------ #

    def payload_schemas(self) -> DataFrame:
        """The (event, event_version) → payload StructType registry."""
        return self._cached_state(_PAYLOAD, PAYLOAD_SCHEMAS_SCHEMA)

    def register_payload_schema(
        self,
        event: str,
        event_version: int,
        schema,
        renamed_from: "dict[str, str] | None" = None,
    ) -> DataFrame:
        """Register the payload StructType (or DDL string) for one
        (event, event_version).  Immutable once registered — evolution is
        a NEW version, never a rewrite (the R1/R2 discipline applied to
        schemas); ``events_typed`` upcasts older versions at read time.

        ``renamed_from`` (r6, VERDICT r5 #5) maps new field name → the
        PREVIOUS version's name for fields this version renames; the
        typed view then routes old rows' values into the new name.
        Nested fields address by DOTTED PATH (r7: ``{"meta.k_id":
        "meta.k"}``); a renamed struct re-roots its nested paths, and a
        rename may not cross struct boundaries.  Evolution against the
        previous registered version is validated recursively: only
        additions, explicit renames, and numeric widening (at any depth)
        pass (``SchemaEvolutionError`` otherwise) — so every historical
        row upcasts losslessly.  Versions must register in INCREASING
        order (ADVICE r6): inserting a middle version would retroactively
        rewire higher versions' rename walks."""
        st = as_struct_type(schema)
        ddl = ",".join(f"{f.name} {f.dataType.simpleString()}" for f in st.fields)
        with self._commit_lock, self._committer_guard():
            now = _utcnow()
            existing = self.payload_schemas()
            reg = existing.filter(F.col("event") == event).collect()
            if any(int(r["event_version"]) == int(event_version) for r in reg):
                raise errors.DuplicateSchemaError(event, event_version)
            prior = [r for r in reg if int(r["event_version"]) < int(event_version)]
            if len(prior) < len(reg):
                # ADVICE r6: out-of-order registration (v3 then v2) would
                # validate v2 only against v1 — never v3-against-v2 — and
                # a middle version's renames would retroactively change
                # the rename walk of already-registered higher versions,
                # silently breaking their typed views.  Versions must
                # register in increasing order.
                newest = max(int(r["event_version"]) for r in reg)
                raise errors.SchemaEvolutionError(
                    event,
                    event_version,
                    [
                        f"version {int(event_version)} is below the highest "
                        f"registered version {newest}: payload schema "
                        "versions must be registered in increasing order"
                    ],
                )
            if prior:
                prev = max(prior, key=lambda r: int(r["event_version"]))
                problems = validate_evolution(
                    as_struct_type(prev["ddl"]), st, renamed_from
                )
                if problems:
                    raise errors.SchemaEvolutionError(event, event_version, problems)
            elif renamed_from:
                raise errors.SchemaEvolutionError(
                    event,
                    event_version,
                    ["renamed_from given but no previous version is registered"],
                )
            row = self.spark.createDataFrame(
                [
                    (
                        event,
                        int(event_version),
                        ddl,
                        json.dumps(renamed_from) if renamed_from else None,
                        now,
                    )
                ],
                PAYLOAD_SCHEMAS_SCHEMA,
            )
            self.storage.write_state(_PAYLOAD, existing.unionByName(row))
            self._invalidate_state_cache(_PAYLOAD)
            return row

    def _payload_registry(self, event: str):
        """(schemas, renames) maps for one event from the registry rows —
        raises when the event has no registered schema at all."""
        reg = self.payload_schemas().filter(F.col("event") == event).collect()
        if not reg:
            raise errors.UnregisteredSchemaError(event)
        schemas = {int(r["event_version"]): r["ddl"] for r in reg}
        renames = {
            int(r["event_version"]): json.loads(r["renames"])
            for r in reg
            if r["renames"]
        }
        return schemas, renames

    def events_typed(self, event: str) -> DataFrame:
        """Schema-on-read typed view of one event type: every row's
        ``data`` JSON parsed with ITS version's registered schema and
        upcast to the latest version's shape in a ``payload`` struct
        column (missing fields → typed NULLs; renamed fields routed via
        the registry's ``renamed_from`` maps; numeric widenings cast).
        Raises ``UnregisteredSchemaError`` when the log holds a version
        with no registered schema — a silent NULL payload would
        masquerade as a parse failure.

        SNAPSHOT SEMANTICS (ADVICE r5): the view captures the registry
        AND the pre-validated version set at CONSTRUCTION time.  Rows of
        an unregistered version appended after construction fail loudly
        at evaluation (``raise_error`` in the dispatch CASE) rather than
        flowing through as NULL payloads — rebuild the view after
        registering the new version.

        Cost: the version check is one distinct over the (tiny)
        version column of the filtered scan; the typed projection itself
        is from_json + CASE — pure codegen, no shuffle, 100 TB-clean."""
        schemas, renames = self._payload_registry(event)
        ev = self.events().filter(F.col("event") == event)
        present = [
            int(r["event_version"])
            for r in ev.select("event_version").distinct().collect()
        ]
        for v in present:
            if v not in schemas:
                raise errors.UnregisteredSchemaError(event, v)
        return ev.withColumn(
            "payload",
            typed_payload_column(
                F.col("data"),
                F.col("event_version"),
                schemas,
                renames=renames,
                unmatched="error",
            ),
        )

    def events_typed_many(self, events: "list[str]") -> DataFrame:
        """Multi-event typed view (VERDICT r5 #5): the UNION of several
        event types' typed views under ONE merged payload shape — the
        union of every requested event's latest-version fields, with
        same-named fields across events required to agree up to numeric
        widening (the widest type wins; anything else raises
        ``SchemaEvolutionError`` — a cross-event name collision with
        incompatible types has no lossless merged shape).

        One scan, one projection: the dispatch is a single CASE over
        (event, event_version) pairs — not one sub-DataFrame per event —
        so the plan stays a codegen filter+project at any log size.
        Same snapshot semantics and loud-unmatched contract as
        ``events_typed``."""
        if not events:
            raise ValueError("events_typed_many needs at least one event type")
        per_event: dict[str, tuple] = {}
        merged_fields: dict[str, "tuple[str, object]"] = {}  # name -> (event, type)
        problems: list[str] = []
        for e in events:
            schemas, renames = self._payload_registry(e)
            per_event[e] = (schemas, renames)
            latest = as_struct_type(schemas[max(schemas)])
            for f in latest.fields:
                if f.name not in merged_fields:
                    merged_fields[f.name] = (e, f.dataType)
                else:
                    other_event, other = merged_fields[f.name]
                    if is_widening(other, f.dataType):
                        merged_fields[f.name] = (e, f.dataType)
                    elif not is_widening(f.dataType, other):
                        problems.append(
                            f"field {f.name!r}: {other.simpleString()} "
                            f"({other_event!r}) vs {f.dataType.simpleString()} "
                            f"({e!r}) have no common widening"
                        )
        if problems:
            raise errors.SchemaEvolutionError(events[0], -1, problems)
        from pyspark.sql.types import StructField, StructType

        target = StructType(
            [StructField(n, t, True) for n, (_, t) in merged_fields.items()]
        )
        ev = self.events().filter(F.col("event").isin(list(events)))
        present = [
            (r["event"], int(r["event_version"]))
            for r in ev.select("event", "event_version").distinct().collect()
        ]
        for e, v in present:
            if v not in per_event[e][0]:
                raise errors.UnregisteredSchemaError(e, v)
        # one CASE keyed on event: each arm is that event's own
        # version-dispatch column upcast to the merged target shape
        expr = None
        for e, (schemas, renames) in per_event.items():
            branch = typed_payload_column(
                F.col("data"),
                F.col("event_version"),
                schemas,
                renames=renames,
                target_schema=target,
                unmatched="error",
            )
            cond = F.col("event") == F.lit(e)
            expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
        return ev.withColumn("payload", expr)

    # ------------------------------------------------------------------ #
    # A2 append_event  (/root/reference/schema.sql:336-343 + §2.3 triggers)
    # ------------------------------------------------------------------ #

    def append_event(
        self,
        event: str,
        event_id: str,
        decider: str,
        decider_id: str,
        data: str = "{}",
        command_id: str | None = None,
        previous_id: str | None = None,
        event_version: int = 1,
        final: bool = False,
    ) -> DataFrame:
        """Append one event, running every §2.3 invariant.  Returns the
        inserted row (RETURNING * analogue) including assigned offset.

        ``final`` is an engine extension: the reference's ``append_event``
        cannot set the flag (its tests INSERT finals directly); exposing it
        keeps the column reachable through the API.
        """
        return self.append_batch(
            [
                {
                    "event": event,
                    "event_id": event_id,
                    "event_version": int(event_version),
                    "decider": decider,
                    "decider_id": decider_id,
                    "data": data,
                    "command_id": command_id or str(_uuid.uuid4()),
                    "previous_id": previous_id,
                    "final": bool(final),
                }
            ]
        )

    def append_batch(
        self, rows_or_df, validate: bool = True, on_conflict: str = "error"
    ) -> DataFrame:
        """Append a batch of events in client order (the micro-batch write
        path, SURVEY.md §3.1 'Spark design').

        Accepts a list of dicts or a DataFrame with columns
        (event, event_id, event_version, decider, decider_id, data,
        command_id, previous_id, final) and an optional ``seq`` long column
        giving intra-batch order.  List input defaults to list order; a
        DataFrame WITHOUT ``seq`` has no defined row order (Spark
        semantics), so the engine assigns DETERMINISTIC HASH ORDER
        (``xxhash64(event_id)`` — stable across task retries).  Callers
        appending intra-batch previous_id CHAINS from a DataFrame must
        supply ``seq`` explicitly.

        Validation program (all set-based — SURVEY.md §2.3):
          T1 stream-finalized, T2 first-event-null-previous,
          T3 previous-id-in-same-decider, C1 event_id unique,
          C2 previous_id unique (the optimistic lock), C3 registry FK.

        ``on_conflict="ignore"`` is the at-least-once recovery mode
        (ON CONFLICT DO NOTHING on the C1 key): candidates whose
        ``event_id`` is already in the log are dropped BEFORE validation,
        so replaying a partially-committed producer batch appends only
        the missing suffix.  Everything else still validates strictly —
        this forgives redelivery, not corruption.
        """
        if on_conflict not in ("error", "ignore"):
            raise ValueError(f"on_conflict must be 'error' or 'ignore': {on_conflict!r}")
        with self._commit_lock, self._committer_guard():
            now = _utcnow()
            cand = self._as_candidates(rows_or_df)
            if on_conflict == "ignore":
                seen = self.events().select("event_id")
                cand = cand.join(seen, "event_id", "leftanti")
            cand = cand.persist()
            prof = self.last_append_profile = {}
            _t = time.monotonic()
            try:
                n = cand.count()  # materialize the cache once, up front
                prof["candidates_s"] = round(time.monotonic() - _t, 3)
                if n == 0:
                    return self.events().limit(0)
                with self._shuffle_sized_for(n):
                    _t = time.monotonic()
                    if validate:
                        self._validate_batch(cand)
                    prof["validate_s"] = round(time.monotonic() - _t, 3)
                    manifest = self.storage.read_manifest(_EVENTS)
                    # T6: lock rows for partitions born in this batch
                    # (/root/reference/schema.sql:240-263).  Runs BEFORE
                    # the log append so its anti-join against the log
                    # evaluates on the pre-batch snapshot (post-commit the
                    # invalidated log cache would re-list and find every
                    # candidate stream "existing"; persisting doesn't help
                    # — unpersisting the log cache cascades to dependents).
                    # Crash-safe: a seeded lock row is invisible through
                    # the derived locks() inner-join until the partition's
                    # events actually land, and last_offset=0 is exactly
                    # what T6 would write on retry.
                    _t = time.monotonic()
                    self._t6_new_partition_locks(self._new_stream_keys(cand), now)
                    prof["t6_locks_s"] = round(time.monotonic() - _t, 3)
                    appended = self._commit(cand, manifest, now, n=n)
                return appended
            finally:
                cand.unpersist()

    # How long a blocked producer waits for a sibling process's append or
    # compaction to finish before raising TimeoutError.  Generous: an sf1
    # bulk append holds the lock for ~10 s; genuine deadlock is impossible
    # (single lock, no nesting across locks).
    COMMITTER_LOCK_TIMEOUT_S = 300.0

    @contextmanager
    def _committer_guard(self):
        """Hold the cross-process committer flock (reentrant per thread —
        ProcessLock itself is deliberately non-reentrant, so depth is
        tracked here).  Always taken INSIDE ``_commit_lock``, never the
        reverse, so lock order is fixed."""
        depth = getattr(self._committer_depth, "n", 0)
        if depth:
            self._committer_depth.n = depth + 1
            try:
                yield
            finally:
                self._committer_depth.n -= 1
            return
        self._committer.acquire(timeout_s=self.COMMITTER_LOCK_TIMEOUT_S)
        self._committer_depth.n = 1
        try:
            self._recover_unpublished()
            yield
        finally:
            self._committer_depth.n = 0
            self._committer.release()

    def _recover_unpublished(self) -> None:
        """Crash recovery at the committer-lock safe point: a committer
        that died between the manifest advance and the ``_PUBLISHED``
        marker write leaves ``published < manifest.commit_id``.  Holding
        the flock proves no LIVE committer is mid-append (the kernel
        released the dead holder's lock).  The manifest's ``pending_rows``
        (written with the allocation) makes recovery VERIFIED, not
        assumed (ADVICE r5 medium) — the three crash windows:

        - log append never ran → 0 of pending_rows on disk; the
          allocation is burned; publishing records only an offset gap
          (BIGSERIAL rollback-gap semantics, SURVEY.md §7.4);
        - log append completed → the batch's files (parquet footers with
          transaction_id == commit_id) sum to exactly pending_rows;
          publishing makes it visible, and a producer replay with
          ``on_conflict='ignore'`` dedups against it (the at-least-once
          recovery contract);
        - log append INTERRUPTED MID-JOB-COMMIT → a strict subset of the
          batch's files is in the log dir.  Publishing that would break
          batch atomicity and intra-batch previous_id chains for readers,
          so the partial files are QUARANTINED (moved into the log dir's
          ``_quarantine/txn_<id>/`` — r7, ADVICE r6: MOVED, never
          unlinked, so even a misconfigured flock-less mount cannot make
          this path destroy bytes unrecoverably — together with the dead
          job's ``_temporary`` staging cleared so the next job commit
          cannot resurrect them) and the allocation is burned like the
          never-ran window; the producer's replay re-appends the whole
          batch under a fresh commit.

        Power-loss-TORN parquet files (rename persisted, data pages lost
        — unreadable footers) are quarantined in every window (ADVICE
        r6): left in place they would fail all subsequent log reads.

        SAFETY CONTRACT: this path mutates the log layout and is only
        sound under the committer flock (``_committer_guard`` holds it at
        both call sites); on mounts where flock is a no-op (the
        documented ProcessLock limitation, see errors.py) a concurrent
        reader could quarantine a LIVE committer's in-flight batch —
        recoverable from ``_quarantine/`` but still an operational
        incident; such mounts are unsupported for multi-process use.

        Pre-r6 manifests carry no ``pending_rows`` → legacy blind
        roll-forward (both old windows behave as before, except torn
        files are quarantined rather than left behind).
        """
        manifest = self.storage.read_manifest(_EVENTS)
        if self.storage.read_published(_EVENTS) < manifest.commit_id:
            files, landed, torn = self.storage.txn_log_files(
                _EVENTS, manifest.commit_id
            )
            if (
                manifest.pending_rows is not None
                and landed != manifest.pending_rows
            ):
                self.storage.quarantine_log_files(
                    _EVENTS, manifest.commit_id, files
                )
                self.storage.clear_append_staging(_EVENTS)
            if torn:
                self.storage.quarantine_log_files(
                    _EVENTS, manifest.commit_id, torn
                )
            self.storage.write_published(_EVENTS, manifest.commit_id)
            self._invalidate_log_cache()
            self._seen_commit_id = manifest.commit_id
            self._seen_log_gen = self.storage._log_gen(_EVENTS)
            self._rebind_sql_views()

    # Target rows per shuffle task on the write path: micro-batches don't
    # need (and pay scheduling overhead for) the session-wide shuffle
    # width sized for full-table analytics.
    ROWS_PER_SHUFFLE_TASK = 25_000

    @contextmanager
    def _shuffle_sized_for(self, n_rows: int):
        """Clamp ``spark.sql.shuffle.partitions`` to the committed batch
        size for the duration of one append (never raising it above the
        session setting, so cluster-sized batches are untouched).  Safe
        under the single-committer rule: appends are serialized by
        ``_commit_lock``; concurrent *readers* never depend on shuffle
        width for correctness."""
        conf = self.spark.conf
        prev = conf.get("spark.sql.shuffle.partitions")
        target = max(1, min(int(prev), n_rows // self.ROWS_PER_SHUFFLE_TASK + 1))
        if target >= int(prev):
            yield
            return
        conf.set("spark.sql.shuffle.partitions", str(target))
        try:
            yield
        finally:
            conf.set("spark.sql.shuffle.partitions", prev)

    def _as_candidates(self, rows_or_df) -> DataFrame:
        self._last_seq_was_hashed = False
        if isinstance(rows_or_df, DataFrame):
            df = rows_or_df
            if "seq" not in df.columns:
                self._last_seq_was_hashed = True
                # A distributed DataFrame has NO defined row order, so a
                # caller omitting ``seq`` gets DETERMINISTIC HASH ORDER
                # (documented in append_batch).  xxhash64(event_id) is
                # stable across task retries — the previous
                # row_number-over-monotonically_increasing_id derivation
                # was banned by SURVEY §7.4 exactly because a retry could
                # renumber the batch — and costs zero shuffle/window
                # (VERDICT r4 'what's wrong' #1).  Hash ties are broken by
                # event_id in every seq ordering; a chained pair colliding
                # on the hash (2^-64) is rejected by T3 like any
                # equal-seq pair — callers appending intra-batch chains
                # supply explicit seq.
                df = df.withColumn("seq", F.xxhash64("event_id"))
            if "final" not in df.columns:
                df = df.withColumn("final", F.lit(False))
            if "event_version" not in df.columns:
                df = df.withColumn("event_version", F.lit(1).cast("long"))
            return df.select(
                "event",
                "event_id",
                F.col("event_version").cast("long").alias("event_version"),
                "decider",
                "decider_id",
                "data",
                "command_id",
                "previous_id",
                F.col("final").cast("boolean").alias("final"),
                F.col("seq").cast("long").alias("seq"),
            )
        prepared = []
        for i, r in enumerate(rows_or_df):
            prepared.append(
                (
                    r["event"],
                    r["event_id"],
                    int(r.get("event_version", 1)),
                    r["decider"],
                    r["decider_id"],
                    r.get("data", "{}"),
                    r.get("command_id") or str(_uuid.uuid4()),
                    r.get("previous_id"),
                    bool(r.get("final", False)),
                    int(r.get("seq", i)),
                )
            )
        return self.spark.createDataFrame(
            prepared,
            "event string, event_id string, event_version long, decider string, "
            "decider_id string, data string, command_id string, previous_id string, "
            "final boolean, seq long",
        )

    def _stream_tails(self, cand: DataFrame) -> DataFrame:
        """Per existing (decider_id, decider) stream touched by the batch:
        the tail event_id, final flag and event count.  The semi join
        restricts the log scan to relevant partitions — the pushdown
        analogue of the reference's ``decider_index`` probe
        (/root/reference/schema.sql:56)."""
        keys = cand.select("decider_id", "decider").distinct()
        relevant = self.events().join(F.broadcast(keys), ["decider_id", "decider"], "leftsemi")
        return relevant.groupBy("decider_id", "decider").agg(
            F.max("offset").alias("tail_offset"),
            F.max_by("event_id", "offset").alias("tail_event_id"),
            F.max_by("final", "offset").alias("tail_final"),
            F.count(F.lit(1)).alias("n_existing"),
        )

    def _new_stream_keys(self, cand: DataFrame) -> DataFrame:
        """Partitions born in this batch, as a DataFrame — never collected
        (a 100 TB backfill batch can open millions of streams)."""
        keys = cand.select("decider_id", "decider").distinct()
        # Empty-log fast path (r14, same manifest proof as
        # ``_validate_batch``): with no committed rows every candidate
        # stream is new — the semi+anti probe of the log is the identity.
        if self.storage.read_manifest(_EVENTS).max_offset == 0:
            return keys
        existing = (
            self.events()
            .join(F.broadcast(keys), ["decider_id", "decider"], "leftsemi")
            .select("decider_id", "decider")
            .distinct()
        )
        return keys.join(existing, ["decider_id", "decider"], "leftanti")

    def _validate_batch(self, cand: DataFrame) -> None:
        """The §2.3 invariants as ONE annotated-candidates program.

        Every check becomes a boolean flag column on the candidate rows
        (window counts for intra-batch uniqueness, left joins against
        column-pruned event scans for global uniqueness/predecessor
        checks), folded by a single aggregate — one Spark action for the
        whole validation instead of one per rule.  Violations are raised
        in the reference's trigger firing order (alphabetical trigger
        names then constraints, SURVEY.md §3.1): T1, T2, T3, C1, C2, C3.
        """
        # EMPTY-LOG FAST PATH (r14, guide §2.4 — remove shuffles outright):
        # the first bulk load into a fresh store (the 100 TB bootstrap
        # shape, and exactly bench b1) validated against FOUR probes of an
        # empty log — the tails aggregate + three existing-event scans —
        # each still costing AQE stage rounds and join planning.  The
        # manifest is already consistent under the committer flock, and
        # max_offset is monotone (append-only log, no deleting verb), so
        # ``max_offset == 0`` ⟺ the log has never committed a row; every
        # probe provably returns no matches and is replaced by its
        # no-match literal (null flag columns — bit-identical to what the
        # left joins produce).  The non-empty path is byte-unchanged.
        log_empty = self.storage.read_manifest(_EVENTS).max_offset == 0

        # event_id tiebreaker: caller-supplied seq may tie; hash-derived
        # seq (no-seq DF path) can tie on collisions.  The extra key makes
        # every rank/lag deterministic either way (C1 guarantees unique
        # event_id, so the composite order is total).
        w = Window.partitionBy("decider_id", "decider").orderBy("seq", "event_id")
        ann = cand.withColumn("rn", F.row_number().over(w)).withColumn(
            "prev_batch_final", F.lag("final").over(w)
        )
        if log_empty:
            ann = ann.withColumn(
                "tail_event_id", F.lit(None).cast("string")
            ).withColumn("tail_final", F.lit(None).cast("boolean"))
        else:
            tails = self._stream_tails(cand)
            ann = ann.join(F.broadcast(tails), ["decider_id", "decider"], "left")

        # …or earlier in the batch (event_id intra-batch unique per C1).
        earlier = cand.select(
            "decider_id",
            "decider",
            F.col("event_id").alias("previous_id"),
            F.col("seq").alias("pred_seq"),
        )
        registry = F.broadcast(
            self.deciders()
            .select("decider", "event", "event_version")
            .withColumn("registered", F.lit(True))
        )

        if log_empty:
            flagged = (
                ann.withColumn("eid_exists", F.lit(None).cast("boolean"))
                .withColumn("pid_exists", F.lit(None).cast("boolean"))
                .withColumn("pred_in_log", F.lit(None).cast("boolean"))
                .join(earlier, ["decider_id", "decider", "previous_id"], "left")
                .join(registry, ["decider", "event", "event_version"], "left")
            )
        else:
            events = self.events()
            # Existing-event probes, all column-pruned scans joined as
            # flags.  event_id / previous_id are unique in the log (C1/C2
            # invariants we maintain), so each left join matches at most
            # one row.
            ex_eid = events.select("event_id").withColumn(
                "eid_exists", F.lit(True)
            )
            ex_pid = (
                events.filter(F.col("previous_id").isNotNull())
                .select("previous_id")
                .withColumn("pid_exists", F.lit(True))
            )
            # T3: predecessor present in the same existing stream…
            ex_pred = events.select(
                "decider_id", "decider", F.col("event_id").alias("previous_id")
            ).withColumn("pred_in_log", F.lit(True))
            flagged = (
                ann.join(ex_eid, "event_id", "left")
                .join(ex_pid, "previous_id", "left")
                .join(ex_pred, ["decider_id", "decider", "previous_id"], "left")
                .join(earlier, ["decider_id", "decider", "previous_id"], "left")
                .join(registry, ["decider", "event", "event_version"], "left")
            )

        nonnull_pid = F.col("previous_id").isNotNull()
        t1_viol = F.when(
            F.col("rn") == 1, F.coalesce(F.col("tail_final"), F.lit(False))
        ).otherwise(F.coalesce(F.col("prev_batch_final"), F.lit(False)))
        t2_viol = F.col("previous_id").isNull() & (
            (F.col("rn") > 1) | F.col("tail_event_id").isNotNull()
        )
        t3_viol = nonnull_pid & ~(
            F.coalesce(F.col("pred_in_log"), F.lit(False))
            | F.coalesce(F.col("pred_seq") < F.col("seq"), F.lit(False))
        )
        c1e = F.coalesce(F.col("eid_exists"), F.lit(False))
        c2e = nonnull_pid & F.coalesce(F.col("pid_exists"), F.lit(False))
        c3 = ~F.coalesce(F.col("registered"), F.lit(False))

        # Intra-batch duplicates (C1/C2 batch halves) via count vs distinct
        # inside the same aggregate — no per-key window shuffle; the
        # offending value is looked up lazily only on the (rare) failure.
        v = flagged.agg(
            F.max(t1_viol).alias("t1"),
            F.max(t2_viol).alias("t2"),
            F.max(t3_viol).alias("t3"),
            # in-batch predecessor that hash order placed AT/AFTER its
            # successor — the tell for the no-seq scrambled-chain case
            # (ADVICE r5: raise the targeted "supply seq" error, not a
            # bare T3)
            F.max(
                t3_viol & F.col("pred_seq").isNotNull()
            ).alias("t3_inbatch"),
            F.count("event_id").alias("n_eid"),
            F.count_distinct("event_id").alias("n_eid_distinct"),
            F.count("previous_id").alias("n_pid"),
            F.count_distinct("previous_id").alias("n_pid_distinct"),
            F.max(F.when(c1e, F.col("event_id"))).alias("c1_eid"),
            F.max(F.when(c2e, F.col("previous_id"))).alias("c2_pid"),
            F.max(
                F.when(c3, F.struct("decider", "event", "event_version"))
            ).alias("c3_row"),
        ).collect()[0]

        if v["t1"]:
            raise errors.StreamFinalizedError()
        if v["t2"]:
            raise errors.FirstEventError()
        if v["t3"]:
            if v["t3_inbatch"] and getattr(self, "_last_seq_was_hashed", False):
                # the predecessor IS in the batch but deterministic hash
                # order scrambled it after its successor — tell the caller
                # the actual fix instead of a bare T3 (ADVICE r5)
                raise errors.PreviousIdError(
                    errors.PreviousIdError.MESSAGE
                    + " (an intra-batch previous_id chain was appended from "
                    "a DataFrame without a 'seq' column; DataFrames have no "
                    "defined row order, so supply an explicit 'seq' long "
                    "column giving the intended intra-batch order)"
                )
            raise errors.PreviousIdError()
        if v["n_eid"] != v["n_eid_distinct"]:
            dup = (
                cand.groupBy("event_id").count().filter(F.col("count") > 1).first()
            )
            raise errors.DuplicateEventIdError(dup["event_id"])
        if v["c1_eid"] is not None:
            raise errors.DuplicateEventIdError(v["c1_eid"])
        if v["n_pid"] != v["n_pid_distinct"]:
            dup = (
                cand.filter(F.col("previous_id").isNotNull())
                .groupBy("previous_id")
                .count()
                .filter(F.col("count") > 1)
                .first()
            )
            raise errors.OptimisticLockError(dup["previous_id"])
        if v["c2_pid"] is not None:
            raise errors.OptimisticLockError(v["c2_pid"])
        if v["c3_row"] is not None:
            r = v["c3_row"]
            raise errors.UnregisteredEventError(
                r["decider"], r["event"], r["event_version"]
            )

    # Batches above this many rows use the parallel two-phase numbering;
    # below it, a plain global-window row_number (one small single-task
    # sort beats the extra exchange + cache for micro-batches).  Tests
    # lower it to force the parallel path on small data.
    OFFSET_PARALLEL_THRESHOLD = 1_000_000

    def _assign_offsets(self, cand: DataFrame, base_offset: int) -> DataFrame:
        """Contiguous offsets in global ``seq`` order WITHOUT a
        single-partition sort (SURVEY.md §7.4, the BIGSERIAL analogue).

        Two-phase numbering: range-partition by ``seq`` (partition ids are
        then ordered by seq range), count rows per partition, turn the
        counts into per-partition base offsets (a window over the tiny
        counts table), and add a partition-local row_number.  Every stage
        is parallel — a 10⁹-row backfill batch numbers at full cluster
        width, where ``row_number() OVER (ORDER BY seq)`` would funnel all
        rows through one task.
        """
        ranged = cand.repartitionByRange("seq", "event_id").sortWithinPartitions(
            "seq", "event_id"
        )
        # MUST be materialized before the plan forks: the counts branch and
        # the main branch would otherwise re-execute the range exchange
        # independently, and AQE may coalesce them to DIFFERENT partition
        # counts — _pid spaces then disagree and the inner join silently
        # drops rows.  The persist pins one physical partitioning that both
        # branches read.  (Caller unpersists via the returned handle.)
        withpid = ranged.withColumn("_pid", F.spark_partition_id()).persist()
        counts = withpid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
        wb = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        bases = counts.select(
            "_pid",
            F.coalesce(F.sum("_cnt").over(wb), F.lit(0)).cast("long").alias("_base"),
        )
        wl = Window.partitionBy("_pid").orderBy("seq", "event_id")
        assigned = (
            withpid.join(F.broadcast(bases), "_pid")
            .withColumn(
                "offset",
                (F.lit(base_offset) + F.col("_base") + F.row_number().over(wl)).cast(
                    "long"
                ),
            )
            .drop("_pid", "_base")
        )
        return assigned, withpid

    def _commit(
        self, cand: DataFrame, manifest: Manifest, now: datetime, n: int | None = None
    ) -> DataFrame:
        """Assign offsets + commit metadata, append to the log.  Appends
        are serialized through the committer (single-writer, SURVEY.md
        §7.5), so ``base_offset`` is exact and the result is gap-free."""
        txn = manifest.commit_id + 1
        if n is None:
            n = cand.count()
        pinned = None
        if n > self.OFFSET_PARALLEL_THRESHOLD:
            assigned, pinned = self._assign_offsets(cand, manifest.max_offset)
        else:
            w = Window.orderBy("seq", "event_id")
            assigned = cand.withColumn(
                "offset",
                (F.lit(manifest.max_offset) + F.row_number().over(w)).cast("long"),
            )
        finished = (
            assigned.withColumn("created_at", F.lit(now))
            .withColumn("transaction_id", F.lit(txn).cast("long"))
            .select([f.name for f in EVENTS_SCHEMA.fields])
        )
        finished = finished.persist()
        prof = self.last_append_profile
        try:
            _t = time.monotonic()
            committed = finished.count()
            if committed != n:  # not assert: must survive python -O
                raise RuntimeError(
                    f"offset assignment produced {committed} rows for a "
                    f"{n}-row batch — aborting before the manifest commits "
                    "a gap/collision"
                )
            prof["offset_number_s"] = round(time.monotonic() - _t, 3)
            # Incremental high-watermark maintenance: aggregate THIS batch
            # (already persisted) and fold it into the sharded watermark
            # (memory + per-shard deltas + meta — hwm.merge_batch), so
            # steady ingest+deliver never re-aggregates the log, and a
            # CONSUMER PROCESS reloads our folded deltas instead of
            # rebuilding (r6).  Skipped when no claim path has ever
            # materialized the watermark (meta absent — the pure-producer
            # b1 workload pays nothing).
            batch_hwm = None
            _t = time.monotonic()
            if self._hwm_shards.is_active() or self._hwm_shards._read_meta() is not None:
                batch_hwm = (
                    finished.groupBy("decider_id")
                    .agg(
                        F.max("offset").alias("offset"),
                        F.max_by("final", "offset").alias("offset_final"),
                    )
                    .toPandas()
                    .set_index("decider_id")
                )
            prof["hwm_merge_s"] = round(time.monotonic() - _t, 3)
            # Compare-and-swap gate (VERDICT r4 #1, defense in depth under
            # the committer flock): if the on-disk manifest moved since this
            # append read it, a second committer raced us past the lock —
            # abort LOUDLY before allocating colliding offsets.  Nothing has
            # been written yet, so the batch can simply be retried.
            disk = self.storage.read_manifest(_EVENTS)
            if disk.commit_id != manifest.commit_id:
                raise errors.ConcurrentCommitError(manifest.commit_id, disk.commit_id)
            # Crash-atomicity: advance the manifest BEFORE the log append.
            # A crash between the two then yields only an offset gap (which
            # BIGSERIAL permits — rollback gaps, SURVEY.md §7.4), never
            # duplicate offsets: rows are visible in the log only after a
            # completed append (Spark's parquet committer stages task files
            # in _temporary until job commit), and the next committer reads
            # the already-advanced max_offset.  The reference gets this
            # from the Postgres transaction; manifest-first is the
            # log-shipping equivalent.
            # pending_rows rides the allocation (ADVICE r5 medium): if we
            # die before the marker publish, recovery can verify whether
            # the batch's files landed COMPLETELY instead of assuming so.
            self.storage.write_manifest(
                _EVENTS,
                Manifest(
                    max_offset=manifest.max_offset + n,
                    commit_id=txn,
                    pending_rows=n,
                ),
            )
            _t = time.monotonic()
            self.storage.append_log(_EVENTS, finished, cluster_by="decider_id")
            prof["parquet_write_s"] = round(time.monotonic() - _t, 3)
            _t = time.monotonic()
            # VISIBILITY marker: written only after the append completed,
            # so sibling processes' _refresh_external never rebuilds from
            # a log missing this batch (ADVICE r2, high).
            self.storage.write_published(_EVENTS, txn)
            prof["marker_publish_s"] = round(time.monotonic() - _t, 3)
            self._invalidate_log_cache()
            self._seen_commit_id = txn
            self._seen_log_gen = self.storage._log_gen(_EVENTS)
            self._rebind_sql_views()
            if batch_hwm is not None:
                _t = time.monotonic()
                self._hwm_shards.merge_batch(
                    batch_hwm, prev_commit=manifest.commit_id, new_commit=txn
                )
                prof["hwm_merge_s"] = round(
                    prof.get("hwm_merge_s", 0.0) + time.monotonic() - _t, 3
                )
        finally:
            finished.unpersist()
            if pinned is not None:
                pinned.unpersist()
        # RETURNING * analogue — a lazy offset-range view of the committed
        # log (never collects the batch to the driver; 100 TB-clean).
        lo, hi = manifest.max_offset + 1, manifest.max_offset + n
        return self.events().filter(
            (F.col("offset") >= lo) & (F.col("offset") <= hi)
        )

    def _t6_new_partition_locks(self, new_streams: DataFrame, now: datetime) -> None:
        """T6 insert branch (/root/reference/schema.sql:244-252): one lock
        row per registered view for each partition born in this batch, with
        ``last_offset = 0`` and unlocked lease.  The update branch
        (refresh of offset/offset_final) is derived at read time instead
        (SURVEY.md §7.5).  Collects only the DISTINCT new-stream keys (not
        event rows) into the driver-side ledger — bounded by the batch's
        new-partition count, the same cardinality the reference INSERTs."""
        # Fast path: most appends extend existing streams — skip the locks
        # state write entirely when the batch opened no new partitions.
        if new_streams.first() is None:
            return
        views_pdf = self.views().select("view").toPandas()
        if views_pdf.empty:  # no consumers registered — T6 is a no-op
            return
        ids = new_streams.select("decider_id").distinct().toPandas()
        rows = views_pdf.merge(ids, how="cross")
        rows["last_offset"] = 0
        rows["locked_until"] = pd.Timestamp(now - _UNLOCK_DELTA)
        rows["created_at"] = pd.Timestamp(now)
        rows["updated_at"] = pd.Timestamp(now)
        self.ledger.insert_missing(rows)

    # ------------------------------------------------------------------ #
    # A3 get_events / A4 get_last_event (/root/reference/schema.sql:348-367)
    # ------------------------------------------------------------------ #

    def get_events(
        self, decider_id: str, decider: str, as_of: int | None = None
    ) -> DataFrame:
        """Replay one entity stream in offset order — a pushdown-filtered
        scan + sort, the index-scan analogue (SURVEY.md §3.2).

        ``as_of`` replays the stream as it stood at that commit (see
        ``events_as_of``) — rebuilding an aggregate against a historical
        snapshot, e.g. to debug a decision the decider made last week."""
        src = self.events() if as_of is None else self.events_as_of(as_of)
        return (
            src
            .filter((F.col("decider_id") == decider_id) & (F.col("decider") == decider))
            .orderBy("offset")
        )

    def get_events_many(
        self, streams: list[tuple[str, str]], as_of: int | None = None
    ) -> DataFrame:
        """Replay MANY entity streams in one job — the set-based form of
        A3 (/root/reference/schema.sql:348-356) for rebuilding a fleet of
        aggregates: a command handler warming 10k deciders issues ONE scan
        with a broadcast semi-join on the (decider_id, decider) pairs
        instead of 10k point queries.  Result is ordered (decider_id,
        offset): each stream's events are contiguous and in replay order,
        ready for ``groupBy(decider_id).applyInPandas``-style folding."""
        src = self.events() if as_of is None else self.events_as_of(as_of)
        pairs = self.spark.createDataFrame(
            streams, schema="decider_id string, decider string"
        )
        return (
            src.join(F.broadcast(pairs), ["decider_id", "decider"], "leftsemi")
            .orderBy("decider_id", "offset")
        )

    def current_transaction_id(self) -> int:
        """The commit counter after the latest append — the engine's XID8
        analogue (SURVEY.md §7.6: a monotone snapshot marker)."""
        return self.storage.read_manifest(_EVENTS).commit_id

    def events_as_of(self, transaction_id: int) -> DataFrame:
        """Snapshot (time-travel) read: the log exactly as it stood after
        commit ``transaction_id``.  Appends are whole-batch commits by a
        single committer, so ``transaction_id <= t`` is a CONSISTENT
        prefix: no torn batches, per-stream chains intact.  The predicate
        reaches the parquet scan (min/max row-group stats prune old
        files), so a recent-snapshot read doesn't scan recent-only data
        backwards — it prunes forward files instead.  This is what the
        reference's XID8 column exists for (snapshot gap-detection,
        /root/reference/schema.sql:50-52), generalized to full time
        travel."""
        return self.events().filter(F.col("transaction_id") <= int(transaction_id))

    def get_last_event(self, decider_id: str, decider: str) -> DataFrame:
        """Last event of a stream.  Faithful quirk: the reference body
        filters ONLY on decider_id despite taking v_decider
        (/root/reference/schema.sql:359-367, SURVEY.md §2.1 A4) — it matters
        when two decider types share a decider_id."""
        return (
            self.events()
            .filter(F.col("decider_id") == decider_id)
            .orderBy(F.col("offset").desc())
            .limit(1)
        )

    # ------------------------------------------------------------------ #
    # A5 register_view + T7 backfill (/root/reference/schema.sql:376-393,
    #                                 268-309)
    # ------------------------------------------------------------------ #

    def register_view(
        self,
        view: str,
        start_at: datetime | str | None = None,
        lock_timeout_s: int = 300,
        pooling_delay_s: int | None = None,
        edge_function_url: str | None = None,
    ) -> DataFrame:
        """UPSERT into views (ON CONFLICT DO UPDATE analogue), then run the
        T7 lock backfill for every existing partition. ``start_at`` accepts an
        ISO-8601 string (the TEXT→TIMESTAMP cast Postgres applies to literals)."""
        with self._commit_lock, self._committer_guard():
            now = _utcnow()
            if isinstance(start_at, str):
                start_at = datetime.fromisoformat(start_at)
            start_at = start_at or now
            existing = self.views()
            prior = existing.filter(F.col("view") == view).collect()
            created_at = prior[0]["created_at"] if prior else now
            row = self.spark.createDataFrame(
                [
                    (
                        view,
                        start_at,
                        int(lock_timeout_s),
                        int(pooling_delay_s) if pooling_delay_s is not None else None,
                        edge_function_url,
                        created_at,
                        now,  # T4: updated_at auto-bump (/root/reference/schema.sql:206-220)
                    )
                ],
                VIEWS_SCHEMA,
            )
            merged = existing.filter(F.col("view") != view).unionByName(row)
            self.storage.write_state(_VIEWS, merged)
            self._invalidate_state_cache(_VIEWS)
            self._t7_backfill(view, start_at, now)
            return row

    def _t7_backfill(self, view: str, start_at: datetime, now: datetime) -> None:
        """T7 (/root/reference/schema.sql:268-309), decorrelated
        (SURVEY.md §2.4): for every existing partition
        ``last_offset = COALESCE((first offset with created_at >= start_at) - 1,
        partition max offset)`` — i.e. start from event-time position
        ``start_at``, or mark fully consumed if nothing is newer.

        ONE Spark aggregation (the event-time aggregate over the log, with
        the ``created_at`` predicate pushed to the scan); the COALESCE
        against the high-watermark and the merge are driver-side frame
        ops.  Result cardinality = #partitions — the inherent write size
        of T7.  On a PAGED store (r6) the backfill runs SHARD-AT-A-TIME:
        the aggregate is written ONCE as a shard-partitioned parquet
        staging (the same layout trick as ``ShardedHwm._rebuild``) and
        each ``shard=k`` directory is then read directly with pyarrow —
        O(|aggregate|) total scan work (ADVICE r6: the previous
        filter-the-persisted-DF-per-shard loop ran one Spark job over the
        WHOLE aggregate per shard, quadratic at the 4096-shard layouts
        ``shards_for``/resize enable), and the transient driver frame is
        one shard, not the whole table."""
        first_after_df = (
            self.events()
            .filter(F.col("created_at") >= F.lit(start_at))
            .groupBy("decider_id")
            .agg(F.min("offset").alias("first_after"))
        )
        hwm = self._hwm_view()
        if self.ledger.max_resident is None:
            first_after = first_after_df.toPandas().set_index("decider_id")
            self._t7_upsert_slice(view, first_after, hwm.full(), now)
            return
        import shutil

        shard = F.pmod(
            F.crc32(F.col("decider_id").cast("binary")),
            F.lit(self.ledger.n_shards),
        ).cast("int")
        staging = os.path.join(
            self.storage.root, f"t7_BACKFILL.tmp.{os.getpid()}"
        )
        shutil.rmtree(staging, ignore_errors=True)
        try:
            (
                first_after_df.withColumn("shard", shard)
                .repartition(self.ledger.n_shards, "shard")
                .write.mode("overwrite")
                .partitionBy("shard")
                .parquet(staging)
            )
            for k in range(self.ledger.n_shards):
                hwm_k = hwm.for_shard(k)
                if hwm_k.empty:
                    continue
                src = os.path.join(staging, f"shard={k}")
                if os.path.isdir(src):
                    fa_k = pd.read_parquet(src).set_index("decider_id")
                else:  # no backfill rows routed to this shard
                    fa_k = pd.DataFrame(
                        {"first_after": pd.Series(dtype="int64")},
                        index=pd.Index([], name="decider_id"),
                    )
                self._t7_upsert_slice(view, fa_k, hwm_k, now)
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def _t7_upsert_slice(
        self,
        view: str,
        first_after: pd.DataFrame,
        hwm: pd.DataFrame,
        now: datetime,
    ) -> None:
        if hwm.empty:
            return
        last = (first_after["first_after"] - 1).reindex(hwm.index)
        rows = pd.DataFrame(
            {
                "view": view,
                "decider_id": hwm.index,
                "last_offset": last.fillna(hwm["offset"]).astype("int64").values,
                "locked_until": pd.Timestamp(now - _UNLOCK_DELTA),
                "created_at": pd.Timestamp(now),
                "updated_at": pd.Timestamp(now),
            }
        )
        self.ledger.upsert(rows)

    # ------------------------------------------------------------------ #
    # A6 stream_events (/root/reference/schema.sql:402-430)
    # ------------------------------------------------------------------ #

    def stream_events(self, view: str, limit: int = 1, seconds: int = 300) -> DataFrame:
        """The delivery kernel: claim ≤ ``limit`` unlocked partitions with
        unread events, lease them for ``seconds``, return the next unread
        event of each (≤ 1 event per partition, distinct partitions,
        /root/reference/schema.sql:399-400).

        Reference-parity quirk, kept deliberately: the lease duration is
        THIS CALL's ``seconds`` argument (default 300), NOT the view's
        stored ``lock_timeout_s`` — the reference stores that column
        (schema.sql:165) but its ``stream_events`` and push cron never
        read it either (schema.sql:402-417, extensions.sql:40-42).
        Callers wanting per-view timeouts pass them here explicitly.

        Claim concurrency — the ``FOR UPDATE SKIP LOCKED`` analogue
        (/root/reference/schema.sql:411): threads serialize on the commit
        lock, PROCESSES on the ledger's filesystem lease lock, under which
        the ledger reloads any sibling process's flushed leases before
        picking — so concurrent claimers always get disjoint partitions.

        Cost model (the b3 hot path): the claim+lease is driver-side
        (pandas over the ledger + hwm frames, one pyarrow snapshot flush)
        — no Spark job.  Delivery reads through a READ-AHEAD cache: one
        refill Spark job fetches the next ``PREFETCH_DEPTH_HOT`` unread
        events per MISSED partition and ``PREFETCH_DEPTH`` per
        speculatively-warmed one (broadcast the claimed pairs + depths
        against one scan of the cached log, per-partition row_number ≤
        depth); the next K−1 claims of those partitions are then served
        from the driver buffer with no cluster work.  The delivered result is
        driver-bound by contract anyway (the consumer collects ≤limit
        single events), so buffering it driver-side is exactly a DB
        cursor's read-ahead, not a scale compromise; the buffer is LRU
        capped at ``PREFETCH_MAX_ROWS``.  Append-only log + per-commit
        invalidation keep the cache trivially coherent.  The reference's
        plan (schema.sql:418-428) does a B-tree probe per partition; this
        does one batched probe per K rounds."""
        with self._commit_lock:
            now = _utcnow()
            self._refresh_external()
            hwm = self._hwm_view()  # sharded: the claim walk reads per-shard
            claimed = self.ledger.claim(
                view, hwm, int(limit), now, now + timedelta(seconds=int(seconds))
            )
            if not claimed:
                return self.events().limit(0)
            served, missing, drained = self._serve_from_prefetch(view, claimed)
            if missing:
                # Warm the windows for ALL of the view's unread
                # partitions (bounded), not just this round's claims: the
                # refill is ONE Spark job either way, and covering the
                # whole eligible set makes the cache hit regardless of
                # which partitions the sharded claim rotation picks next.
                self._refill_prefetch(
                    view,
                    self._union_eligible_pairs(view, missing, hwm),
                    hot=[d for d, _ in missing],
                )
                more, _, drained2 = self._serve_from_prefetch(
                    view, missing, count=False
                )
                served.extend(more)
                drained.extend(drained2)
            # Drained-claim release (r6): a claim whose window is complete
            # and empty has NOTHING readable in our log view — possible
            # when the disk-backed watermark is microseconds NEWER than
            # the log cache (hwm.py module doc).  Leaving it leased would
            # stall that partition for the full lease; release it now so
            # the next tick (with a caught-up log) redelivers.
            for decider_id, _lo in drained:
                self.ledger.set_locked_until(
                    view, decider_id, now - _UNLOCK_DELTA, now
                )
        if not served:
            return self.events().limit(0)
        served.sort(key=lambda r: r["offset"])
        # pandas → Arrow ⇒ a true LocalRelation: .collect() is then a
        # driver-local read (~10ms), where a tuple-list DataFrame would be
        # RDD-backed and pay a full job per collect (~300ms measured).
        cols = [f.name for f in EVENTS_SCHEMA.fields]
        pdf = pd.DataFrame(served, columns=cols)
        return self.spark.createDataFrame(pdf, schema=EVENTS_SCHEMA)

    def _serve_from_prefetch(
        self, view: str, claimed: list[tuple[str, int]], count: bool = True
    ) -> tuple[list, list[tuple[str, int]], list[tuple[str, int]]]:
        """Split claims into rows servable from cached windows, claims
        needing a refill, and DRAINED claims (complete window, nothing
        above the claim position — the hwm-ahead-of-log case the caller
        releases).  A window fetched at consumer position ``lo`` covers
        offsets (lo, last-row] completely (``complete`` = it reached the
        partition watermark), so for a claim at position L ≥ lo the first
        cached row above L IS the next unread event.  ``count=False``
        (the post-refill retry) keeps the hit/miss counters measuring
        only FIRST-attempt serves — the cache's steady-state hit rate."""
        served, missing, drained = [], [], []
        for decider_id, last_offset in claimed:
            key = (view, decider_id)
            win = self._prefetch.get(key)
            row = None
            if win is not None and last_offset >= win["lo"]:
                # prune rows at or below the committed position
                rows = win["rows"] = [
                    r for r in win["rows"] if r["offset"] > last_offset
                ]
                win["lo"] = last_offset
                if rows:
                    row = rows[0]
                elif win["complete"]:
                    row = False  # definitively drained (hwm-stale claim)
            if row is None:
                if win is not None and last_offset < win["lo"]:
                    # Stale window (claim regressed below the fetched
                    # range, e.g. a nack rewound the consumer): it can
                    # never serve this consumer again — drop it rather
                    # than let the miss path leave it parked in the LRU
                    # (ADVICE r11: a promoted-on-miss stale window read
                    # as hot and shielded itself from eviction).
                    del self._prefetch[key]
                missing.append((decider_id, last_offset))
                if count:
                    self.prefetch_counters["misses"] += 1
            else:
                # True-LRU touch ON HIT ONLY: move the window that just
                # served to the END of the insertion-ordered dict the
                # evictor pops from the front of.  Without any touch
                # (r11 tail-window find), a re-warmed window KEPT its
                # original dict position — Python dict assignment to an
                # existing key does not move it — so the evictor
                # preferentially killed the hottest (stickiest-claimed)
                # partitions the moment the row cap tripped: at sf1
                # (>2000-partition view) every post-cap tick missed,
                # refilled, and was evicted again (48/48 tail refills,
                # 1.16 s/tick vs 39 ms on a hit).  Touching BEFORE the
                # serveability check (the r11 form) promoted misses too,
                # making "the front is the coldest" false for stale or
                # drained windows (ADVICE r11) — now only serves promote.
                self._prefetch[key] = self._prefetch.pop(key)
                if count:
                    self.prefetch_counters["hits"] += 1
                if row is not False:
                    served.append(row)
                else:
                    drained.append((decider_id, last_offset))
        return served, missing, drained

    def _union_eligible_pairs(
        self,
        view: str,
        missing: list[tuple[str, int]],
        hwm: ShardedHwm,
    ) -> list[tuple[str, int]]:
        """The round's missing pairs plus (up to the cap) the view's other
        unread partitions, ordered the way the LEDGER WALK will actually
        claim them (r12, VERDICT r11 #3): shards in upcoming walk order
        (sticky first), within a shard by (hwm offset, last_offset) — the
        shard claim's own sort key.  The r11 form sorted candidates
        GLOBALLY by hwm offset, which spreads the warm budget evenly
        across all shards while the walk drains the sticky shard in
        full first — so every ~PREFETCH_DEPTH ticks the walk crossed
        into an unwarmed batch of its own shard and paid a refill (the
        sf1 residual 9/48 tail refills; hit p50 35 ms vs refill p50
        1.23 s).  Before the walk stream, each foreign shard's single
        HEAD candidate is warmed in fairness-rotor order: the every-8th-
        tick fairness probe claims exactly that partition, and 6 of 48
        tail ticks are probe ticks — n_shards slots buy those too.
        Leased partitions are included — their windows are wanted as
        soon as the ack lands.  Driver-frame scan only; no Spark work.
        Per-shard watermark frames (r6): ledger shard k's candidates
        only need hwm shard k, and non-resident ledger shards are
        skipped outright — a paged store's refill never faults in the
        whole table."""
        pairs = dict(missing)
        budget = self.PREFETCH_PARTITIONS - len(pairs)
        if budget <= 0:
            return list(pairs.items())
        per_shard: dict[int, list[tuple[int, int, str]]] = {}
        for k, s in enumerate(self.ledger.shards):
            df = s._df
            if df.empty or view not in df.index.get_level_values(0):
                continue
            sub = df.xs(view, level=0, drop_level=True)
            hk = hwm.for_shard(k)
            offs = hk["offset"].reindex(sub.index)
            el = sub[offs.notna() & (sub["last_offset"] < offs)]
            cands = sorted(
                (int(o), int(lo), str(d))
                for o, d, lo in zip(
                    offs.loc[el.index], el.index, el["last_offset"]
                )
            )
            if cands:
                per_shard[k] = cands

        def take(cand: tuple[int, int, str]) -> None:
            nonlocal budget
            _, lo, d = cand
            if d not in pairs and (view, d) not in self._prefetch:
                pairs[d] = lo
                budget -= 1

        for k in self.ledger.upcoming_probe_order():  # fairness heads
            if budget <= 0:
                break
            if k in per_shard:
                take(per_shard[k][0])
        for k in self.ledger.upcoming_walk_order():  # the claim stream
            for cand in per_shard.get(k, ()):
                if budget <= 0:
                    return list(pairs.items())
                take(cand)
        return list(pairs.items())

    def _refill_prefetch(
        self,
        view: str,
        pairs: list[tuple[str, int]],
        hot: list[str] | None = None,
    ) -> None:
        """ONE Spark job: next K unread events for every partition in
        ``pairs``.  Broadcast join + per-partition topK — the batched
        index-probe analogue of schema.sql:418-423.

        ``hot`` partitions (this round's actual MISSES — demonstrated
        demand, see PREFETCH_DEPTH_HOT) get a PREFETCH_DEPTH_HOT-deep
        window, capped at PREFETCH_DEEP_CAP partitions; the speculative
        remainder stays PREFETCH_DEPTH-shallow.  The per-partition depth
        rides the broadcast pairs frame, so the job shape is unchanged:
        one scan, one broadcast join, one windowed topK."""
        self.prefetch_counters["refills"] += 1
        k = self.PREFETCH_DEPTH
        deep = set(list(hot or ())[: self.PREFETCH_DEEP_CAP])
        depth_of = {
            d: (self.PREFETCH_DEPTH_HOT if d in deep else k) for d, _ in pairs
        }
        events = self.events()
        pairs_df = F.broadcast(
            self.spark.createDataFrame(
                [(d, lo, depth_of[d]) for d, lo in pairs],
                "decider_id string, last_offset long, __depth int",
            )
        )
        min_last = min(lo for _, lo in pairs)
        w = Window.partitionBy("decider_id").orderBy("offset")
        cols = [f.name for f in EVENTS_SCHEMA.fields]
        fetched = (
            events.filter(F.col("offset") > F.lit(min_last))
            .join(pairs_df, "decider_id")
            .filter(F.col("offset") > F.col("last_offset"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= F.col("__depth"))
            .select(*cols)
            .toPandas()  # Arrow transfer; rows cached as plain dicts
        )
        by_part: dict[str, list] = {}
        for r in fetched.to_dict("records"):
            by_part.setdefault(r["decider_id"], []).append(r)
        for decider_id, last_offset in pairs:
            rows = sorted(by_part.get(decider_id, []), key=lambda r: r["offset"])
            # move-to-end on re-warm (true LRU; see _serve_from_prefetch)
            self._prefetch.pop((view, decider_id), None)
            self._prefetch[(view, decider_id)] = {
                "lo": last_offset,
                "rows": rows,
                # fewer rows than asked ⇒ the window reached the watermark
                "complete": len(rows) < depth_of[decider_id],
            }
        self._evict_prefetch()

    def _evict_prefetch(self) -> None:
        total = sum(len(w["rows"]) for w in self._prefetch.values())
        if total <= self.PREFETCH_MAX_ROWS:
            return
        for key in list(self._prefetch):  # dict order = true LRU (touch on
            # serve + move-to-end on re-warm), so the front IS the coldest
            total -= len(self._prefetch.pop(key)["rows"])
            if total <= self.PREFETCH_MAX_ROWS:
                return

    # ------------------------------------------------------------------ #
    # A7/A8/A9 ack / nack / schedule_nack
    # (/root/reference/schema.sql:436-468)
    # ------------------------------------------------------------------ #

    _LOCKS_VIEW_SCHEMA = (
        "view string, decider_id string, offset long, last_offset long, "
        "locked_until timestamp, offset_final boolean, "
        "created_at timestamp, updated_at timestamp"
    )

    def _locks_rows(self, view: str, decider_ids: list[str]) -> DataFrame:
        """RETURNING-clause analogue: reference-shaped lock rows for the
        touched keys, built from the driver frames (no Spark job, no full
        table materialization — and on a paged store, touching ONLY the
        keys' ledger + hwm shards, r6)."""
        with self._commit_lock:  # see locks(): reads must not race mutators
            state = self.ledger.rows_for(view, decider_ids)
            hwm_reset = self._hwm_view().lookup(decider_ids).reset_index()
        merged = state.merge(
            hwm_reset, on="decider_id", how="inner"
        )[
            [
                "view",
                "decider_id",
                "offset",
                "last_offset",
                "locked_until",
                "offset_final",
                "created_at",
                "updated_at",
            ]
        ]
        if merged.empty:
            return self.spark.createDataFrame([], self._LOCKS_VIEW_SCHEMA)
        return self.spark.createDataFrame(merged, schema=self._LOCKS_VIEW_SCHEMA)

    def ack_event(self, view: str, decider_id: str, offset: int) -> DataFrame:
        """Commit + release: last_offset = offset, locked_until = NOW()
        (/root/reference/schema.sql:436-446)."""
        now = _utcnow()
        # RETURNING built inside the same critical section as the ack —
        # releasing the lock first let a delivery tick re-lease the
        # partition before the read, so the returned row showed a fresh
        # lease instead of the released state the ack just wrote
        # (review r4; _commit_lock is reentrant).
        with self._commit_lock:
            self.ledger.ack(view, [(decider_id, int(offset))], now)
            return self._locks_rows(view, [decider_id])

    def ack_events(
        self, view: str, acks: list[tuple[str, int]], returning: bool = True
    ) -> DataFrame | None:
        """Batch commit: ONE ledger mutation + ONE snapshot flush for a
        micro-batch of (decider_id, offset) acks — the consumer-side
        analogue of ``append_batch``.  Per-pair semantics match
        ``ack_event`` (/root/reference/schema.sql:436-446); at cluster
        scale the per-commit latency, not the row count, is the cost.

        ``returning=False`` skips building the RETURNING DataFrame and
        returns None — the Kafka-commit-style void ack for delivery loops
        that never read it (building a DataFrame costs a py4j round trip
        even when unused)."""
        if not acks:
            return self.locks().filter(F.lit(False)) if returning else None
        now = _utcnow()
        with self._commit_lock:
            self.ledger.ack(view, [(d, int(o)) for d, o in acks], now)
            if not returning:
                return None
            return self._locks_rows(view, [d for d, _ in acks])

    def nack_event(self, view: str, decider_id: str) -> DataFrame:
        """Release without committing ⇒ immediate redelivery
        (/root/reference/schema.sql:449-457)."""
        return self.schedule_nack_event(view, decider_id, 0)

    def schedule_nack_event(self, view: str, decider_id: str, milliseconds: int = 0) -> DataFrame:
        """Delayed retry: locked_until = NOW() + interval
        (/root/reference/schema.sql:460-468)."""
        now = _utcnow()
        with self._commit_lock:
            self.ledger.set_locked_until(
                view,
                decider_id,
                now + timedelta(milliseconds=int(milliseconds)),
                now,
            )
            return self._locks_rows(view, [decider_id])

    # ------------------------------------------------------------------ #
    # unregister_view — DELETE FROM views + FK ON DELETE CASCADE on locks
    # (/root/reference/schema.sql:199; extensions T10,
    #  /root/reference/extensions.sql:113-126)
    # ------------------------------------------------------------------ #

    def unregister_view(self, view: str) -> DataFrame:
        """Delete a consumer registration and cascade-delete its locks in
        one logical operation (the reference gets the cascade from the
        ``locks.view → views.view ON DELETE CASCADE`` FK).  Returns the
        deleted view rows (RETURNING analogue).  Any push-delivery query
        for the view should be stopped by the caller (T10's
        cron.unschedule ⇔ ``PushDelivery.stop`` / ``sync``)."""
        with self._commit_lock, self._committer_guard():
            deleted = self.views().filter(F.col("view") == view).cache()
            deleted.count()  # materialize before the state flip
            self.storage.write_state(
                _VIEWS, self.views().filter(F.col("view") != view)
            )
            self._invalidate_state_cache(_VIEWS)
            self.ledger.delete_view(view)
            return deleted

    # ------------------------------------------------------------------ #
    # R1-R4 immutability rules (/root/reference/schema.sql:58-72)
    # ------------------------------------------------------------------ #

    def delete_events(self, *_args, **_kwargs) -> int:
        """R3 ``ignore_delete_events``: DELETE on the event log is a
        SILENT no-op (``DO INSTEAD NOTHING``), not an error — the log is
        immutable.  Returns 0 (rows affected), matching what a Postgres
        client observes through the rule."""
        return 0

    def update_events(self, *_args, **_kwargs) -> int:
        """R4 ``ignore_update_events``: UPDATE on events — silent no-op."""
        return 0

    def delete_decider_events(self, *_args, **_kwargs) -> int:
        """R1 ``ignore_delete_decider_events``: DELETE on the registry —
        silent no-op (registrations are permanent)."""
        return 0

    def update_decider_events(self, *_args, **_kwargs) -> int:
        """R2 ``ignore_update_decider_events``: UPDATE on the registry —
        silent no-op."""
        return 0

    # ------------------------------------------------------------------ #
    # Operational introspection
    # ------------------------------------------------------------------ #

    def stats(self) -> dict:
        """Store health snapshot (the pg_stat_* analogue an operator
        would poll): log row/partition/file counts, the committed
        high-watermark offset and transaction id, registry sizes, and
        state snapshot versions.  One cached-log aggregate + metadata
        reads — safe to call frequently."""
        manifest = self.storage.read_manifest(_EVENTS)
        agg = self.events().agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("decider_id").alias("p"),
        ).collect()[0]
        return {
            "n_events": agg["n"],
            "n_partitions": agg["p"],
            "max_offset": manifest.max_offset,
            "commit_id": manifest.commit_id,
            "log_files": self.storage.log_file_count(_EVENTS),
            "n_registered_events": self.deciders().count(),
            "n_views": self.views().count(),
            "prefetch": dict(self.prefetch_counters),
            "last_append_profile": dict(self.last_append_profile),
            "ledger_resident_shards": self.ledger.resident_shards(),
            "ledger_resident_bytes": self.ledger.resident_bytes(),
            "ledger_max_resident": self.ledger.max_resident,
            "hwm_resident_shards": self._hwm_shards.resident_shards(),
            "hwm_resident_bytes": self._hwm_shards.resident_bytes(),
            "hwm_rebuilds": self._hwm_shards.rebuild_count,
            "state_versions": {
                **{
                    t: self.storage.state_version(t)
                    for t in (_DECIDERS, _VIEWS, _PAYLOAD)
                },
                **{
                    s.table: self.storage.state_version(s.table)
                    for s in self.ledger.shards
                },
            },
        }
