"""Standalone b3c micro-bench: N claim/ack worker processes on one
sharded ledger path — the SAME harness bench.py's B3c runs
(tests/_ledger_worker.run_claim_ack_harness), runnable in isolation while
iterating on the ledger.  Defaults match the bench's sf0.1 regime
(8k partitions x 8 = 64k events) so numbers are directly comparable.

Usage:

    python tools/bench_b3c.py [n_parts] [per_part] [repeat]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests._ledger_worker import run_claim_ack_harness


if __name__ == "__main__":
    n_parts = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000
    per_part = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    for _ in range(repeat):
        one, _ = run_claim_ack_harness(1, n_parts, per_part)
        four, _ = run_claim_ack_harness(4, n_parts, per_part)
        print(
            json.dumps(
                {
                    "one_worker_eps": one,
                    "four_worker_eps": four,
                    "scaling": round(four / one, 2),
                }
            )
        )
