"""Standalone b3c micro-bench: N claim/ack worker processes on one
sharded ledger path (the bench.py B3c harness, runnable in isolation
while iterating on the ledger).  Usage:

    python tools/bench_b3c.py [n_parts] [per_part] [repeat]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
from datetime import datetime, timedelta, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from fstore_sql_spark.ledger import ShardedLocksLedger
from fstore_sql_spark.storage import ParquetStore
from tests._ledger_worker import bench_claim_ack_worker


def run(n_workers: int, n_parts: int, per_part: int) -> float:
    mp_root = tempfile.mkdtemp(prefix="bench_mp_")
    try:
        past = datetime.now(timezone.utc).replace(tzinfo=None) - timedelta(hours=1)
        ledger = ShardedLocksLedger(ParquetStore(None, mp_root))
        seed = pd.DataFrame(
            {
                "view": "v",
                "decider_id": [f"p{i:05d}" for i in range(n_parts)],
                "last_offset": 0,
                "locked_until": pd.Timestamp(past),
                "created_at": pd.Timestamp(past),
                "updated_at": pd.Timestamp(past),
            }
        )
        ledger.insert_missing(seed)
        pd.DataFrame(
            {
                "decider_id": seed["decider_id"],
                "offset": per_part,
                "offset_final": False,
            }
        ).to_parquet(os.path.join(mp_root, "hwm.parquet"))
        ctx = mp.get_context("spawn")
        outs = [os.path.join(mp_root, f"out_{i}.json") for i in range(n_workers)]
        procs = [
            ctx.Process(target=bench_claim_ack_worker, args=(mp_root, o, 50))
            for o in outs
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join(300)
        all_acks: list[tuple] = []
        worker_elapsed = 0.0
        for o in outs:
            with open(o, encoding="utf-8") as f:
                d = json.load(f)
            all_acks.extend(tuple(a) for a in d["acked"])
            worker_elapsed = max(worker_elapsed, d["elapsed"])
        expected = n_parts * per_part
        assert len(all_acks) == len(set(all_acks)) == expected, (
            f"disjointness violated: {len(all_acks)} acks, "
            f"{len(set(all_acks))} unique, want {expected}"
        )
        return round(expected / worker_elapsed, 1)
    finally:
        shutil.rmtree(mp_root, ignore_errors=True)


if __name__ == "__main__":
    n_parts = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    per_part = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    for _ in range(repeat):
        one = run(1, n_parts, per_part)
        four = run(4, n_parts, per_part)
        print(
            json.dumps(
                {
                    "one_worker_eps": one,
                    "four_worker_eps": four,
                    "scaling": round(four / one, 2),
                }
            )
        )
