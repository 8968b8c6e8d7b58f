"""sf100 (1000x sf0.1, ~16 GB) scale bench (r8, VERDICT r7 next-round #1).

The fourth measured decade.  This is the first pool where the shard
sizing rule (``ShardedLocksLedger.shards_for``, ledger.py) leaves the
8-shard floor for real: at 2M partitions it picks a 64-shard layout, so
the sizing rule, the paged high-watermark, and the sticky-shard claim
path run under REAL load for the first time rather than by design
argument.  Scope (driver-box budget: one run ~30-60 min):

- ~20 analytics queries (r9: the union of the sf0.1/sf1/sf10
  top-expensive rankings plus one representative per previously
  unmeasured family) with ratios vs the same round family's sf10
  measurement — linear scaling reads ~10x; >15x flags superlinear;
- B1: bulk append of the FULL 100M-event table through validation +
  offset assignment;
- B3c: the concurrent claim/ack harness at 2M partitions under the
  sizing rule's 64-shard layout (``size_by_parts=True``), 4 workers vs 1.

Writes ``BENCH_SF100_r{N}.json``.

Usage: python tools/bench_sf100.py [--sf /root/repo/testdata_sf100]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _shards_for(parts: int) -> int:
    from fstore_sql_spark.ledger import ShardedLocksLedger

    return ShardedLocksLedger.shards_for(parts)


#: Probe fields copied verbatim into each ``noise_passes`` entry so the
#: per-pass box context survives multi-pass composition (ADVICE r12).
#: Includes the r13/r14 epoch fields (pagefault bracket, env fingerprint,
#: skip reason): without them a later pass overwrites the top-level
#: values and the earlier pass's epoch context is lost from the artifact
#: — the same orphaning the list exists to prevent (ADVICE r13).
_NOISE_PASS_KEYS = (
    "noise_index", "noise_probe_start", "noise_probe_end",
    "noise_probe_skipped_reason",
    "engine_noise_index", "engine_probe_start_sec", "engine_probe_end_sec",
    "pagefault_us_per_4k", "pagefault_us_per_4k_start",
    "pagefault_us_per_4k_end", "pagefault_us_per_4k_max",
    "env",
)


def _noise_pass_entry(artifact: dict) -> dict:
    return {k: artifact[k] for k in _NOISE_PASS_KEYS if k in artifact}

# Top-8 of the sf10 per-query ranking (BENCH_SF10_r07.json), the
# dedup/text/skew flagships the 100 TB posture leans on.
TOP_QUERIES = [
    "dedup_prefix_filter_pairs",
    "skew_salted_hot_revenue",  # r9: targeted-salt flagship (VERDICT r8 #1)
    "q1_pricing_summary",
    "q5_nation_revenue",
    "dedup_minhash_lsh_pairs",
    "text_fingerprint",
    "triangle_count",
    "multimodal_features",
    # r9 (VERDICT r8 #3): widened from 8 to ~20 — the union of the
    # sf0.1/sf1/sf10 top-expensive rankings plus one representative per
    # previously unmeasured family.  The r8 sweep's 32-shuffle-partition
    # lesson: unmeasured queries can hide config-scale bugs.
    "q3_top_orders",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    "dedup_simhash",
    "top_customers_per_nation",
    "benchmark_contamination",
    "q8_market_share",
    "trailing_7d_active_users",
    "vocab_top_terms",
    "es_ingest_mapping",
    "user_sessions",
    "ann_blocked_topk",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata_sf100")
    ap.add_argument("--b3c-parts", type=int, default=2_000_000)
    ap.add_argument("--skip-b1", action="store_true")
    ap.add_argument("--skip-b3c", action="store_true")
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    args = ap.parse_args()

    # The sf100 methodology is a 48g heap (BASELINE.md r8-r10: every
    # decade artifact; b1's 100M-event columnar build OOMs a default-8g
    # driver, measured r12).  Default it HERE rather than trusting the
    # caller's environment — an unset var silently produced a
    # differently-configured, incomparable artifact once.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

    import fstore_sql_spark.operators  # noqa: F401  (registers queries)
    from pyspark.sql import functions as F

    from fstore_sql_spark import EventStore, get_spark
    from fstore_sql_spark.queries import QUERIES, load

    # Shuffle partitions SIZED to the sf (the brief's spill-aware rule:
    # a shuffle partition should fit executor memory — at sf100 the
    # heavy-shuffle plans move ~2B rows, and the sf0.1-sized default of
    # 32 meant ~19M-row/1-2GB sort partitions that spilled; measured:
    # dedup_minhash_lsh_pairs 82.7s -> 44.8s at 256).  AQE coalesces
    # small exchanges back down, so light queries are unaffected.
    spark = get_spark(app_name="fstore-bench-sf100", shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # --queries "" runs NO analytics queries (b-benches only): the box
    # has ~45-60 GB of free disk and the 20-query sweep plus B1's own
    # shuffle volume (validation joins + offset numbering over 100M
    # rows) no longer fit one session's spill budget — passes compose
    # into one artifact via the merge below.
    names = (
        [n for n in args.queries.split(",") if n]
        if args.queries is not None
        else TOP_QUERIES
    )
    timings: dict[str, float] = {}
    # Noise attribution (r12, VERDICT r11 #5): bracket the sweep with the
    # pinned sf0.1 analytics probes + the Spark-free engine probe so a
    # cross-round sf100 delta is classifiable box-vs-code from the
    # artifact alone.
    from bench import (
        engine_noise_probe,
        memory_fault_probe,
        noise_probe_draw,
        scale_noise_fields,
    )

    probes_start = noise_probe_draw(spark)
    eng_start = engine_noise_probe()
    # Start-of-sweep fault sample (r14, VERDICT r13 #2): the regime is
    # bursty, so "calm window" needs a bracket, not a single shot.
    fault_start = memory_fault_probe()
    # Warm pass: full-column read of every table the query set touches.
    # This decade's working set (~16 GB) fits the box's RAM, and the
    # dimension under test is the ENGINE's scaling (plan + shuffle +
    # compute), not the VM's ~100 MB/s virtio cold-read throughput — the
    # audited cold-scan numbers are pinned in BASELINE.md's r08 section
    # (e.g. q1 134.7s cold vs 23-28s warm for the same plan).  A real
    # cluster reads 16 GB across executors in seconds.
    for t in ("lineitem", "orders", "documents", "events", "embeddings"):
        load(spark, args.sf, t).write.format("noop").mode("overwrite").save()

    for name in names:
        t0 = time.time()
        force(QUERIES[name](spark, args.sf))
        timings[name] = round(time.time() - t0, 3)
        print(f"{name}: {timings[name]}s", flush=True)
        # ppjoin auto-persists its tok table at this tier (r12 size
        # gate, tens of GB DISK_ONLY at sf100); drop it before the
        # disk-budget-sensitive queries that follow.
        spark.catalog.clearCache()
        # Free finished-query shuffle files NOW (r9): Spark's
        # ContextCleaner only deletes them when the JVM garbage-collects
        # the shuffle dependency, and a 48g heap running 20 sf100
        # queries can fill the box's ~60 GB free disk with dead spill
        # before a natural GC happens (measured: the first widened sweep
        # died on ENOSPC with 18 GB of orphaned blockmgr files).  On a
        # real cluster the external shuffle service + per-app dirs make
        # this a non-issue; single-box decades need the nudge.
        spark.sparkContext._jvm.System.gc()

    # B1 — bulk append with full validation (the sf100 events table:
    # 100M events).  expected_partitions declares scale, so the store
    # runs the production posture: sized shard layout + LRU paging.
    b1_eps = None
    b1_profile = {}
    if not args.skip_b1:
        tmp = tempfile.mkdtemp(prefix="bench_sf100_store_")
        try:
            src0 = QUERIES["es_ingest_mapping"](spark, args.sf)
            n_parts_hint = src0.select("decider_id").distinct().count()
            print(f"b1 partitions: {n_parts_hint}", flush=True)
            store = EventStore(spark, tmp, expected_partitions=n_parts_hint)
            for ev in ("click", "view", "purchase", "signup", "error"):
                store.register_decider_event("user", ev, f"testdata event {ev}")
            src = QUERIES["es_ingest_mapping"](spark, args.sf)
            batch = src.select(
                "event",
                F.col("event_uuid").alias("event_id"),
                "event_version",
                "decider",
                "decider_id",
                F.lit("{}").alias("data"),
                F.col("event_uuid").alias("command_id"),
                "previous_id",
                F.col("offset").alias("seq"),
            )
            n = batch.count()
            t0 = time.time()
            store.append_batch(batch)
            b1 = time.time() - t0
            timings["b1_append_validate"] = round(b1, 3)
            b1_eps = round(n / b1, 1)
            b1_profile = dict(store.last_append_profile)
            print(f"b1: {b1:.1f}s ({b1_eps} ev/s, n={n})", flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # B3c — concurrent claim/ack at 2M partitions: shards_for(2M) = 64,
    # the first non-floor layout ever measured under load.  per_part=1
    # (2M-event pool); the dimension under test is the 64-shard routing +
    # per-shard claim-scan cost, not pool depth.
    b3c1_eps = b3c_eps = None
    if not args.skip_b3c:
        from tests._ledger_worker import run_claim_ack_harness

        b3c1_eps, b3c1_el = run_claim_ack_harness(
            1, args.b3c_parts, 1, size_by_parts=True, join_timeout_s=1800
        )
        print(f"b3c single: {b3c1_eps} ev/s ({b3c1_el:.0f}s)", flush=True)
        b3c_eps, b3c_elapsed = run_claim_ack_harness(
            4, args.b3c_parts, 1, size_by_parts=True, join_timeout_s=1800
        )
        timings["b3c_concurrent_deliver_ack"] = round(b3c_elapsed, 3)
        print(f"b3c: {b3c_eps} ev/s agg vs {b3c1_eps} single", flush=True)

    # ratios vs the newest sf10 measurement of the same query set
    sf10 = {}
    sf10_file = None
    sf10_files = sorted(
        fn for fn in os.listdir(HERE) if re.match(r"BENCH_SF10_r\d+\.json$", fn)
    )
    if sf10_files:
        sf10_file = sf10_files[-1]
        with open(os.path.join(HERE, sf10_file), encoding="utf-8") as f:
            sf10 = json.load(f).get("queries", {})
    ratios = {
        k: round(v / sf10[k], 2) for k, v in timings.items() if sf10.get(k)
    }

    rounds = [
        int(m.group(1))
        for fn in os.listdir(HERE)
        if (m := re.match(r"BENCH_r(\d+)\.json$", fn))
    ]
    rnd = (max(rounds) + 1) if rounds else 1
    out = {
        "metric": "sf100_spotcheck_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": "100",
        "queries": timings,
        "ratio_vs_sf10": ratios,
        # the sf10 artifact the ratios were computed against (ADVICE r9:
        # without this, a composed multi-pass run could silently rebase
        # earlier passes' ratios onto a newer sf10 file at merge time)
        "sf10_baseline_file": sf10_file,
        "superlinear": {k: r for k, r in ratios.items() if r > 15.0},
        "b1_events_per_sec": b1_eps,
        "b1_append_profile": b1_profile,
        "b3_concurrent_events_per_sec": b3c_eps,
        "b3_concurrent_single_worker_events_per_sec": b3c1_eps,
        "b3_concurrent_scaling": (
            round(b3c_eps / b3c1_eps, 2) if b3c1_eps else None
        ),
        "b3c_partitions": args.b3c_parts,
        # derived, not hardcoded (ADVICE r8): a run with a different
        # --b3c-parts must record the layout the sizing rule actually used
        "b3c_shards": _shards_for(args.b3c_parts),
        "config": {
            "shuffle_partitions": 256,
            "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
            "warm_page_cache": True,
        },
        **scale_noise_fields(spark, probes_start, eng_start, fault_start),
    }
    path = os.path.join(HERE, f"BENCH_SF100_r{rnd:02d}.json")
    # Compose multi-pass runs (query sweep / b-benches in separate
    # sessions for disk headroom) into ONE artifact: merge timings and
    # keep any field this pass did not measure.
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            prev = json.load(f)
        merged_q = {**prev.get("queries", {}), **out["queries"]}
        for k, v in out.items():
            if v in (None, {}, []) and k in prev:
                out[k] = prev[k]
        out["queries"] = merged_q
        # Per-pass noise context must SURVIVE composition (r12: the b-
        # bench pass's mild probes overwrote the query pass's 1.84x
        # engine reading, orphaning the sweep's attribution).
        # noise_passes holds EVERY pass's probe fields INCLUDING the
        # current one (ADVICE r12: the old append-prev-only scheme left
        # the final pass's context only in the top-level fields, so a
        # consumer iterating noise_passes silently missed it).  The
        # prev entry is skipped when prev already recorded itself —
        # pre-r13 artifacts carried only their predecessors.
        prev_entry = _noise_pass_entry(prev)
        passes = list(prev.get("noise_passes", []))
        if prev_entry and (not passes or passes[-1] != prev_entry):
            passes.append(prev_entry)
        out["noise_passes"] = passes + [_noise_pass_entry(out)]
        # Composed passes must share ONE declared baseline (ADVICE r9):
        # if a newer sf10 artifact landed between passes, re-load the one
        # the FIRST pass recorded instead of silently rebasing its ratios.
        prev_base = prev.get("sf10_baseline_file")
        if prev_base and prev_base != sf10_file:
            prev_path = os.path.join(HERE, prev_base)
            if os.path.exists(prev_path):
                with open(prev_path, encoding="utf-8") as f:
                    sf10 = json.load(f).get("queries", {})
                out["sf10_baseline_file"] = prev_base
        out["ratio_vs_sf10"] = {
            k: round(v / sf10[k], 2)
            for k, v in merged_q.items() if sf10.get(k)
        }
        out["superlinear"] = {
            k: r for k, r in out["ratio_vs_sf10"].items() if r > 15.0
        }
        out["value"] = round(sum(merged_q.values()), 3)
    else:
        out["noise_passes"] = [_noise_pass_entry(out)]
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    print("written:", path)


if __name__ == "__main__":
    main()
