"""Interleaved A/B of the engine b-benches across two git trees (r10,
VERDICT r9 #1 — the r6/r7 method, applied to b1/b3/b3c).

The r9 driver artifact read b3 816 ev/s vs r8's 1,230 with no
delivery-path code change, and nothing in the artifact could say whether
that was code or box.  This tool checks out two commits into temporary
git worktrees and runs the SAME standalone b1/b3/b3c measurement from
each, interleaved (A B A B ...), in fresh subprocesses with PYTHONPATH
pointed at the tree under test — so slow-drifting box noise hits both
arms equally and a persistent inter-arm gap is attributable to code.

Usage:
  python tools/ab_engine_bench.py REF_A REF_B [--draws 2]
      [--sf /root/testdata/sf0.1] [--b3c-parts 20000]

Prints one JSON line per (arm, draw) and a final SUMMARY line with
per-metric medians and the A/B ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Standalone re-statement of bench.py's b1/b3/b3c measurement, run with
# PYTHONPATH=<tree>.  Kept IDENTICAL for both arms (this file's copy, not
# the tree's bench.py) so the measurement itself cannot differ — only the
# engine code under it.
_CHILD = r"""
import json, os, shutil, sys, tempfile, time

# Everything under a __main__ guard: run_claim_ack_harness spawns worker
# processes with the spawn context, which re-imports this script as
# __mp_main__ — unguarded top-level code would re-run the whole bench in
# every worker.
def _ab_main():
    tree, sf_dir, b3c_parts = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sys.path.insert(0, tree)
    import fstore_sql_spark.operators  # noqa: F401
    from fstore_sql_spark import EventStore, get_spark
    from fstore_sql_spark.queries import QUERIES, load
    from pyspark.sql import functions as F

    spark = get_spark(app_name="ab-engine")
    spark.sparkContext.setLogLevel("ERROR")
    load(spark, sf_dir, "lineitem").count()  # warm JVM + listing

    out = {}
    tmp = tempfile.mkdtemp(prefix="ab_store_")
    try:
        src0 = QUERIES["es_ingest_mapping"](spark, sf_dir)
        n_parts_hint = src0.select("decider_id").distinct().count()
        store = EventStore(spark, tmp, expected_partitions=n_parts_hint)
        for ev in ("click", "view", "purchase", "signup", "error"):
            store.register_decider_event("user", ev, f"testdata event {ev}")
        batch = src0.select(
            "event", F.col("event_uuid").alias("event_id"), "event_version",
            "decider", "decider_id", F.lit("{}").alias("data"),
            F.col("event_uuid").alias("command_id"), "previous_id",
            F.col("offset").alias("seq"),
        )
        n = batch.count()
        t0 = time.time()
        store.append_batch(batch)
        b1 = time.time() - t0
        out["b1_s"] = round(b1, 3)
        out["b1_eps"] = round(n / b1, 1)

        store.register_view("ab_view", start_at="1990-01-01 00:00:00")
        delivered, round_times = 0, []
        t0 = time.time()
        for _ in range(EventStore.PREFETCH_DEPTH):
            t1 = time.time()
            rows = store.stream_events("ab_view", limit=100).collect()
            store.ack_events(
                "ab_view",
                [(r["decider_id"], r["offset"]) for r in rows],
                returning=False,
            )
            round_times.append(time.time() - t1)
            delivered += len(rows)
        b3 = time.time() - t0
        out["b3_s"] = round(b3, 3)
        out["b3_eps"] = round(delivered / b3, 1) if b3 else 0.0
        out["b3_p50_s"] = round(sorted(round_times)[len(round_times) // 2], 4)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()

    sys.path.insert(0, os.path.join(tree))
    from tests._ledger_worker import run_claim_ack_harness
    out["b3c1_eps"], _ = run_claim_ack_harness(1, b3c_parts, 8)
    out["b3c4_eps"], _ = run_claim_ack_harness(4, b3c_parts, 8)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    _ab_main()
"""

METRICS = ("b1_eps", "b3_eps", "b3_p50_s", "b3c1_eps", "b3c4_eps")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_a")
    ap.add_argument("ref_b")
    ap.add_argument("--draws", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--b3c-parts", type=int, default=20_000)
    args = ap.parse_args()

    trees: dict[str, str] = {}
    results: dict[str, dict[str, list]] = {
        args.ref_a: {m: [] for m in METRICS},
        args.ref_b: {m: [] for m in METRICS},
    }
    try:
        for ref in (args.ref_a, args.ref_b):
            path = tempfile.mkdtemp(prefix=f"ab_tree_{ref[:7]}_")
            subprocess.run(
                ["git", "-C", HERE, "worktree", "add", "--detach", path, ref],
                check=True, capture_output=True,
            )
            trees[ref] = path
        child = os.path.join(tempfile.gettempdir(), "ab_engine_child.py")
        with open(child, "w", encoding="utf-8") as f:
            f.write(_CHILD)
        for draw in range(args.draws):
            for ref in (args.ref_a, args.ref_b):  # interleave
                p = subprocess.run(
                    [sys.executable, child, trees[ref], args.sf,
                     str(args.b3c_parts)],
                    capture_output=True, text=True, timeout=1800,
                )
                line = [
                    ln for ln in p.stdout.splitlines()
                    if ln.startswith("RESULT ")
                ]
                if not line:
                    print(json.dumps({
                        "ref": ref, "draw": draw, "error": "no RESULT",
                        "stderr_tail": p.stderr[-500:],
                    }), flush=True)
                    continue
                rec = json.loads(line[-1][len("RESULT "):])
                for m in METRICS:
                    results[ref][m].append(rec[m])
                print(json.dumps({"ref": ref, "draw": draw, **rec}),
                      flush=True)
    finally:
        for path in trees.values():
            subprocess.run(
                ["git", "-C", HERE, "worktree", "remove", "--force", path],
                capture_output=True,
            )

    summary = {"a": args.ref_a, "b": args.ref_b, "draws": args.draws}
    for m in METRICS:
        va, vb = results[args.ref_a][m], results[args.ref_b][m]
        if va and vb:
            ma, mb = statistics.median(va), statistics.median(vb)
            summary[m] = {
                "a_draws": va, "b_draws": vb,
                "a_median": ma, "b_median": mb,
                "b_over_a": round(mb / ma, 3) if ma else None,
            }
    print("SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
