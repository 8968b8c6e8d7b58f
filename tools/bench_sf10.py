"""sf10 (100x sf0.1) spot-check bench (VERDICT r4 #3).

Runs the most expensive queries from the r4 per-query details (union of
the sf0.1 and sf1 top-10 rankings, b-benches excluded) plus the B1 bulk
append and B3c concurrent claim/ack harness against the sf10 composition
(``tools/make_sf1.py --replicas 100``), and writes
``BENCH_SF10_r{N}.json`` with each query's wall time and its ratio to the
sf1 measurement — the superlinearity detector one decade above the
per-round scale point.  A ratio ≈ 10 is linear scaling; materially above
that is a plan bug to audit in BASELINE.md.

Usage: python tools/bench_sf10.py [--sf /root/repo/testdata_sf10]
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

# Union of the sf0.1 and sf1 top-10 per-query rankings (BENCH_DETAIL.json
# r4 tails), b-benches excluded (measured separately below).
TOP_QUERIES = [
    "dedup_prefix_filter_pairs",
    "skew_salted_hot_revenue",  # r9: targeted-salt flagship (VERDICT r8 #1)
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "triangle_count",
    "text_fingerprint",
    "multimodal_features",
    "top_customers_per_nation",
    # r9 (VERDICT r8 #3): widened to ~20 — the union of the sf0.1/sf1/
    # sf10 top-expensive lists plus one representative per previously
    # unmeasured family (ingest mapping, sessionization, ANN, text
    # stats) so config-scale bugs can't hide in unmeasured families.
    "benchmark_contamination",
    "q8_market_share",
    "trailing_7d_active_users",
    "vocab_top_terms",
    "es_ingest_mapping",
    "user_sessions",
    "ann_blocked_topk",
    # r15 (VERDICT r14 #4): the four r14-optimized similarity entries the
    # sf0.1 bench ADDED — tracked at the next decade so the norm-hoist +
    # guarded dot expansion + spread-floor wins have an at-scale point
    # (spread must no-op here: sf10 inputs are multi-file).
    "embedding_neardup_pairs",
    "embedding_contamination",
    "knn_label_accuracy",
    "ann_ivf_kmeans_topk",
]


def main() -> None:
    # Same convention as the sf100 tools (BASELINE.md "sf100 decade
    # refresh"): at this tier the 8g session default silently produces an
    # incomparable artifact (extra spill) or a broadcast-build OOM — the
    # r15 first attempt died exactly there.  48g on the 128 GiB box.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata_sf10")
    ap.add_argument("--b3c-parts", type=int, default=200_000)
    args = ap.parse_args()

    import fstore_sql_spark.operators  # noqa: F401  (registers queries)
    from pyspark.sql import functions as F

    from fstore_sql_spark import EventStore, get_spark
    from fstore_sql_spark.queries import QUERIES, load

    spark = get_spark(app_name="fstore-bench-sf10")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # Noise attribution (r12, VERDICT r11 #5): bracket the sweep with the
    # pinned sf0.1 analytics probes + the Spark-free engine probe so a
    # cross-round sf10 delta is classifiable box-vs-code from the
    # artifact alone (the r11 +45% wall was not).
    from bench import (
        engine_noise_probe,
        memory_fault_probe,
        noise_probe_draw,
        scale_noise_fields,
    )

    timings: dict[str, float] = {}
    load(spark, args.sf, "lineitem").count()  # warm listing/JVM
    probes_start = noise_probe_draw(spark)
    eng_start = engine_noise_probe()
    # Start-of-sweep fault sample (r14, VERDICT r13 #2): bursty regime,
    # so the calm-window claim rides a bracket, not a single shot.
    fault_start = memory_fault_probe()

    for name in TOP_QUERIES:
        t0 = time.time()
        force(QUERIES[name](spark, args.sf))
        timings[name] = round(time.time() - t0, 3)
        print(f"{name}: {timings[name]}s", flush=True)
        # ppjoin auto-persists its tok table at this tier (r12 size
        # gate); drop it so each sweep entry pays its own cost and the
        # DISK_ONLY cache doesn't shadow later queries' disk budget.
        spark.catalog.clearCache()

    # B1 — bulk append with full validation (the sf10 events table).
    tmp = tempfile.mkdtemp(prefix="bench_sf10_store_")
    b1_eps = None
    try:
        store = EventStore(spark, tmp)
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

    # B3c — concurrent claim/ack at the sf10 partition count (200k locks
    # rows: 10x the sf1 scale point).  per_part=2 keeps the drain inside
    # the harness's 300s worker window — the dimension under test is the
    # LEDGER FRAME SIZE (claim scan + delta replay cost per tick), not
    # the pool depth.
    from tests._ledger_worker import run_claim_ack_harness

    b3c1_eps, _ = run_claim_ack_harness(1, args.b3c_parts, 2)
    b3c_eps, b3c_elapsed = run_claim_ack_harness(4, args.b3c_parts, 2)
    timings["b3c_concurrent_deliver_ack"] = round(b3c_elapsed, 3)
    print(f"b3c: {b3c_eps} ev/s agg vs {b3c1_eps} single", flush=True)

    # ratios vs the sf1 measurement of the same round family
    sf1_detail = {}
    for fn in ("BENCH_DETAIL_SF1.json",):
        p = os.path.join(HERE, fn)
        if os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                sf1_detail = json.load(f).get("queries", {})
    ratios = {
        k: round(v / sf1_detail[k], 2)
        for k, v in timings.items()
        if sf1_detail.get(k)
    }

    rounds = [
        int(m.group(1))
        for fn in os.listdir(HERE)
        if (m := re.match(r"BENCH_r(\d+)\.json$", fn))
    ]
    rnd = (max(rounds) + 1) if rounds else 1
    out = {
        "metric": "sf10_spotcheck_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": "10",
        "queries": timings,
        "ratio_vs_sf1": ratios,
        "superlinear": {k: r for k, r in ratios.items() if r > 15.0},
        "b1_events_per_sec": b1_eps,
        "b1_append_profile": b1_profile,
        "b3_concurrent_events_per_sec": b3c_eps,
        "b3_concurrent_single_worker_events_per_sec": b3c1_eps,
        "b3_concurrent_scaling": (
            round(b3c_eps / b3c1_eps, 2) if b3c1_eps else None
        ),
        "b3c_partitions": args.b3c_parts,
        **scale_noise_fields(spark, probes_start, eng_start, fault_start),
    }
    path = os.path.join(HERE, f"BENCH_SF10_r{rnd:02d}.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    print("written:", path)


if __name__ == "__main__":
    main()
