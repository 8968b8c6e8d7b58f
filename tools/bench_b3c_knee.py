"""Consumer-scaling KNEE sweep (r11, VERDICT r10 #3).

b3c had only ever been measured at 1 and 4 workers; every decade cleared
the >=2.5x bar, but the knee — the worker count where added consumers stop
adding aggregate throughput — was unmeasured, and that knee is the
single-store delivery ceiling a large deployment plans around (beyond it,
shard the store by view/decider-hash).

Sweeps tests/_ledger_worker.run_claim_ack_harness (the SAME harness
bench.py's gate runs — one definition, no regime drift) across worker
counts on one pool, best-of-N draws per arm because the metric divides by
the slowest worker's clock (measured ~2x single-draw spread at identical
code, BASELINE.md "B3c noise").

The claim/ack path serializes on one flock+fsync per tick per SHARD, so
the expected mechanism is flock convoy: aggregate ev/s should rise until
workers ~ effective shards actually touched per tick, then flatten/dip.
Per-worker ev/s (aggregate / n) falling faster than 1/n past the knee is
the convoy signature; the tool prints both.

Usage:
    python tools/bench_b3c_knee.py [n_parts] [per_part] [draws] [workers..]
    # VERDICT r10 #3 regime: 200k-partition pool
    python tools/bench_b3c_knee.py 200000 8 2 1 2 4 8 16
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests._ledger_worker import run_claim_ack_harness


def main() -> None:
    n_parts = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    per_part = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    draws = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    workers = [int(w) for w in sys.argv[4:]] or [1, 2, 4, 8, 16]

    curve = []
    base = None
    for n in workers:
        runs = [run_claim_ack_harness(n, n_parts, per_part) for _ in range(draws)]
        eps, elapsed = max(runs, key=lambda t: t[0])
        if base is None:
            base = eps
        point = {
            "workers": n,
            "agg_events_per_sec": eps,
            "per_worker_events_per_sec": round(eps / n, 1),
            "scaling_vs_1": round(eps / base, 2),
            "slowest_worker_s": round(elapsed, 2),
            "draws": [round(e, 1) for e, _ in runs],
        }
        curve.append(point)
        print(json.dumps(point), flush=True)

    # knee: first point whose marginal gain over the previous arm is
    # under 20% of the previous throughput (added workers no longer
    # buying meaningful aggregate) — reported, not asserted.
    knee = None
    for prev, cur in zip(curve, curve[1:]):
        gain = cur["agg_events_per_sec"] / prev["agg_events_per_sec"] - 1.0
        if gain < 0.2:
            knee = prev["workers"]
            break
    print(
        json.dumps(
            {
                "pool_partitions": n_parts,
                "pool_events": n_parts * per_part,
                "knee_workers": knee,
                "curve": curve,
            }
        )
    )


if __name__ == "__main__":
    main()
