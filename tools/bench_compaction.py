"""Measure the ``maybe_compact`` policy (r8, VERDICT r7 next-round #7).

``EventStore.maybe_compact(max_files=N)`` existed since r5 but its trigger
threshold had no measurement behind it.  This soaks a stream of SMALL
append ticks (the fragmentation-generating workload: each append batch
writes its own parquet files) against two stores:

- **baseline** — never compacted: the file count grows one-or-more files
  per tick and every ``get_events`` replay pays the full listing + footer
  overhead;
- **policy** — ``maybe_compact(max_files=M)`` called between batches (the
  auto-OPTIMIZE cadence the docstring recommends): the count sawtooths
  below ~M and replay latency stays flat; the price is the periodic
  synchronous rewrite, measured separately.

Prints a per-probe table (file count + single-partition replay latency
for both arms) and ONE JSON line; BASELINE.md pins the recommended
cadence from these numbers.

Usage: python tools/bench_compaction.py [--ticks 120] [--max-files 64]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_soak(
    spark,
    ticks: int,
    batch: int,
    probe_every: int,
    max_files: int | None,
) -> dict:
    """One soak arm.  ``max_files=None`` = never compact; else call
    ``maybe_compact(max_files)`` after every append tick.  Returns the
    probe curve + totals."""
    from pyspark.sql import functions as F

    from fstore_sql_spark import EventStore

    root = tempfile.mkdtemp(prefix="bench_compact_")
    try:
        store = EventStore(spark, root)
        store.register_decider_event("probe", "tick", "soak event")
        probe_decider = "probe_partition"
        probes = []
        compact_s = 0.0
        n_compactions = 0
        prev_id = None
        t_start = time.time()
        for t in range(ticks):
            # one chained event on the PROBE partition (so its replay
            # grows realistically) + (batch-1) one-event partitions
            eid = f"t{t:05d}_probe"
            rows = [("tick", eid, 1, "probe", probe_decider, "{}", eid,
                     prev_id, None)]
            rows += [
                ("tick", f"t{t:05d}_{i:03d}", 1, "probe", f"d{t:05d}_{i:03d}",
                 "{}", f"t{t:05d}_{i:03d}", None, None)
                for i in range(batch - 1)
            ]
            df = spark.createDataFrame(
                rows,
                "event string, event_id string, event_version long, "
                "decider string, decider_id string, data string, "
                "command_id string, previous_id string, seq long",
            ).drop("seq")
            store.append_batch(df)
            prev_id = eid
            if max_files is not None:
                c0 = time.time()
                if store.maybe_compact(max_files=max_files) is not None:
                    n_compactions += 1
                compact_s += time.time() - c0
            if (t + 1) % probe_every == 0 or t == ticks - 1:
                files = store.storage.log_file_count("events")
                r0 = time.time()
                n = store.get_events(probe_decider, "probe").count()
                replay = time.time() - r0
                assert n == t + 1, (n, t)
                probes.append(
                    {"tick": t + 1, "files": files,
                     "replay_s": round(replay, 3)}
                )
                print(
                    f"  tick {t+1:4d}: {files:4d} files, "
                    f"replay {replay:.3f}s", flush=True,
                )
        return {
            "probes": probes,
            "total_s": round(time.time() - t_start, 1),
            "compact_s": round(compact_s, 1),
            "n_compactions": n_compactions,
            "final_files": probes[-1]["files"],
            "final_replay_s": probes[-1]["replay_s"],
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=120)
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--probe-every", type=int, default=20)
    ap.add_argument("--max-files", type=int, default=64)
    args = ap.parse_args()

    from fstore_sql_spark import get_spark

    spark = get_spark(app_name="bench-compaction")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"baseline arm (never compacted), {args.ticks} ticks:", flush=True)
    base = run_soak(spark, args.ticks, args.batch, args.probe_every, None)
    print(f"policy arm (maybe_compact(max_files={args.max_files})):", flush=True)
    pol = run_soak(
        spark, args.ticks, args.batch, args.probe_every, args.max_files
    )
    out = {
        "metric": "compaction_policy_soak",
        "ticks": args.ticks,
        "batch": args.batch,
        "max_files": args.max_files,
        "baseline": base,
        "policy": pol,
        "replay_ratio_final": (
            round(base["final_replay_s"] / pol["final_replay_s"], 2)
            if pol["final_replay_s"]
            else None
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
