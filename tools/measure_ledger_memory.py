"""Quantify driver-resident consumer state (VERDICT r4 #2; hwm r6).

Measures, Spark-free, the two driver-central frames at 1M partitions:

- the sharded locks ledger (`ShardedLocksLedger` shard frames: MultiIndex
  (view, decider_id) + last_offset/locked_until/created_at/updated_at),
- the sharded high-watermark (`ShardedHwm` shard-frame shape since r6:
  index decider_id, columns offset int64 + offset_final bool — measured
  here as the all-resident total, i.e. what an UNPAGED store holds; a
  paged store holds ``max_resident/n_shards`` of it),

and prints bytes/partition plus extrapolated ceilings.  The numbers are
pinned in BASELINE.md ("Driver-resident state ceiling").

Run: python tools/measure_ledger_memory.py [--n 1000000]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
from datetime import datetime, timedelta, timezone

import pandas as pd

sys.path.insert(0, ".")

from fstore_sql_spark.ledger import ShardedLocksLedger  # noqa: E402
from fstore_sql_spark.storage import ParquetStore  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()
    n = args.n
    past = datetime.now(timezone.utc).replace(tzinfo=None) - timedelta(hours=1)
    ids = [f"p{i:09d}" for i in range(n)]

    root = tempfile.mkdtemp(prefix="ledger_mem_")
    try:
        ledger = ShardedLocksLedger(ParquetStore(None, root))
        step = 250_000
        for lo in range(0, n, step):
            ledger.insert_missing(
                pd.DataFrame(
                    {
                        "view": "v",
                        "decider_id": ids[lo : lo + step],
                        "last_offset": 0,
                        "locked_until": pd.Timestamp(past),
                        "created_at": pd.Timestamp(past),
                        "updated_at": pd.Timestamp(past),
                    }
                )
            )
        ledger_bytes = ledger.resident_bytes()
        per_shard = ledger_bytes / ledger.n_shards

        # sharded hwm, all shards resident (the r6 in-memory shape)
        from fstore_sql_spark.ledger import shard_of

        shards = pd.Series([shard_of(d, ledger.n_shards) for d in ids])
        hwm_bytes = 0
        base = pd.DataFrame(
            {"decider_id": ids, "offset": 1_000_000_000, "offset_final": False}
        )
        for _k, part in base.groupby(shards.values):
            f = part.set_index("decider_id").sort_index()
            hwm_bytes += int(f.memory_usage(deep=True).sum())

        out = {
            "n_partitions": n,
            "ledger_bytes": ledger_bytes,
            "ledger_bytes_per_partition": round(ledger_bytes / n, 1),
            "ledger_bytes_per_shard": int(per_shard),
            "n_shards": ledger.n_shards,
            "hwm_bytes": hwm_bytes,
            "hwm_bytes_per_partition": round(hwm_bytes / n, 1),
            "total_bytes_per_partition": round((ledger_bytes + hwm_bytes) / n, 1),
            "partitions_at_64GiB_all_resident": int(
                64 * 2**30 / ((ledger_bytes + hwm_bytes) / n)
            ),
        }
        print(json.dumps(out, indent=2))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
