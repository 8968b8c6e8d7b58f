"""Measure the LRU shard-paging tax (BASELINE.md companion to the r5
residency bound): single-consumer claim/ack drain throughput with the
ledger unpaged (all shards resident) vs paged to a 2-shard budget.

Steady-state sticky claiming stays on one shard, so the expected paged
cost is near zero once warm; the drain's tail (walking to other shards)
pays the evict/reload cycle.  Spark-free.

Run: python tools/bench_paging.py [--parts 20000]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from datetime import datetime, timedelta, timezone

import pandas as pd

sys.path.insert(0, ".")

from fstore_sql_spark.ledger import ShardedLocksLedger  # noqa: E402
from fstore_sql_spark.storage import ParquetStore  # noqa: E402


def _now():
    return datetime.now(timezone.utc).replace(tzinfo=None)


def drain(max_resident: int | None, parts: int, per_part: int) -> dict:
    root = tempfile.mkdtemp(prefix="paging_bench_")
    try:
        past = _now() - timedelta(hours=1)
        seeder = ShardedLocksLedger(ParquetStore(None, root))
        seeder.insert_missing(
            pd.DataFrame(
                {
                    "view": "v",
                    "decider_id": [f"p{i:06d}" for i in range(parts)],
                    "last_offset": 0,
                    "locked_until": pd.Timestamp(past),
                    "created_at": pd.Timestamp(past),
                    "updated_at": pd.Timestamp(past),
                }
            )
        )
        hwm = pd.DataFrame(
            {
                "decider_id": [f"p{i:06d}" for i in range(parts)],
                "offset": per_part,
                "offset_final": False,
            }
        ).set_index("decider_id")
        ledger = ShardedLocksLedger(
            ParquetStore(None, root), max_resident=max_resident
        )
        total = 0
        pend: list[tuple[str, int]] = []
        t0 = time.time()
        while True:
            now = _now()
            got = ledger.ack_and_claim(
                "v",
                [(d, lo + 1) for d, lo in pend],
                hwm,
                50,
                now,
                now + timedelta(seconds=300),
            )
            total += len(pend)
            pend = got
            if not got:
                break
        elapsed = time.time() - t0
        return {
            "max_resident": max_resident,
            "events": total,
            "elapsed_s": round(elapsed, 2),
            "events_per_sec": round(total / elapsed, 1),
            "resident_shards_end": ledger.resident_shards(),
            "resident_bytes_end": ledger.resident_bytes(),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=int, default=20_000)
    ap.add_argument("--per-part", type=int, default=4)
    ap.add_argument(
        "--tick-curve",
        action="store_true",
        help="measure per-tick claim latency at 20k/200k/1M partitions "
        "instead of the paging drain comparison",
    )
    args = ap.parse_args()
    if args.tick_curve:
        print(json.dumps(
            {"tick_latency": [tick_latency(n) for n in (20_000, 200_000, 1_000_000)]},
            indent=2,
        ))
        return
    out = {
        "parts": args.parts,
        "unpaged": drain(None, args.parts, args.per_part),
        "paged_2": drain(2, args.parts, args.per_part),
        "paged_1": drain(1, args.parts, args.per_part),
    }
    out["paging_tax_pct_2shards"] = round(
        100
        * (1 - out["paged_2"]["events_per_sec"] / out["unpaged"]["events_per_sec"]),
        1,
    )
    print(json.dumps(out, indent=2))




def tick_latency(parts: int, ticks: int = 200) -> dict:
    """p50/p95 ack_and_claim tick latency at a given partition count,
    unpaged — characterizes the O(shard rows) numpy eligibility scan the
    claim path pays per tick (BASELINE.md scale table)."""
    root = tempfile.mkdtemp(prefix="tick_bench_")
    try:
        past = _now() - timedelta(hours=1)
        ledger = ShardedLocksLedger(ParquetStore(None, root))
        step = 250_000
        for lo in range(0, parts, step):
            hi = min(lo + step, parts)
            ledger.insert_missing(
                pd.DataFrame(
                    {
                        "view": "v",
                        "decider_id": [f"p{i:07d}" for i in range(lo, hi)],
                        "last_offset": 0,
                        "locked_until": pd.Timestamp(past),
                        "created_at": pd.Timestamp(past),
                        "updated_at": pd.Timestamp(past),
                    }
                )
            )
        hwm = pd.DataFrame(
            {
                "decider_id": [f"p{i:07d}" for i in range(parts)],
                "offset": 1,
                "offset_final": False,
            }
        ).set_index("decider_id")
        lat = []
        pend: list[tuple[str, int]] = []
        for _ in range(ticks):
            now = _now()
            t0 = time.perf_counter()
            got = ledger.ack_and_claim(
                "v", [(d, lo + 1) for d, lo in pend], hwm, 50, now,
                now + timedelta(seconds=300),
            )
            lat.append(time.perf_counter() - t0)
            pend = got
            if not got:
                break
        lat.sort()
        return {
            "parts": parts,
            "ticks": len(lat),
            "p50_ms": round(lat[len(lat) // 2] * 1000, 2),
            "p95_ms": round(lat[int(len(lat) * 0.95)] * 1000, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
