"""Warm-isolated fresh-session audit of q5_nation_revenue at sf100
(r14, VERDICT r13 #1 — the one remaining `superlinear` entry).

r13's sweep drew q5 at 132.9 s (15.93x vs sf10), diagnosed as the
post-boot page-fault epoch tax on the sweep's largest-shuffle join —
but unlike the other two r13 flags (`top_customers_per_nation`,
`skew_salted_hot_revenue`, both settled by fresh-session re-draws), q5
never got the fresh-session treatment, and its in-sweep draw carried a
CALM single-shot fault probe (2.08 µs/page) that can miss a burst
inside a 133 s query.  This tool applies the exact protocol the other
flags got, plus the r14 bracket: for each draw, a FRESH 48 g
subprocess session (private scratch dir, reclaimed synchronously —
BASELINE.md "sf100 b1 attribution" (d)) that samples
``bench.memory_fault_probe`` immediately BEFORE and AFTER the timed
query, with a warm pass over exactly the tables q5 reads first.

Adjudication (BASELINE.md r14 provenance convention): draws ~5-9x with
calm brackets → linear, lift the weak grade; ≥~12x WITH calm brackets
on both sides → plan investigation (AQE shuffle shape at 256
partitions).  Reference anchor: the §2.2 star-join family
(/root/reference/schema.sql:421-423 shape at scale); the plan under
audit is ``queries.py`` ``q5_nation_revenue`` (broadcast dims, one
shuffle).

Writes ``AUDIT_Q5_SF100_r{N}.json``.  Usage:
    python tools/audit_q5_sf100.py [--draws 3] [--sf .../testdata_sf100]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

#: The audited query and the tables its plan scans (warm pass reads
#: these full-column, mirroring tools/bench_sf100.py's methodology so
#: the draw measures the ENGINE, not virtio cold-read throughput).
QUERY = "q5_nation_revenue"
WARM_TABLES = ("lineitem", "orders", "customer", "nation", "region")

_CHILD = """
import json, os, sys, time

sys.path.insert(0, {here!r})
from bench import memory_fault_probe

import fstore_sql_spark.operators  # noqa: F401
from fstore_sql_spark import get_spark
from fstore_sql_spark.queries import QUERIES, load

sf = sys.argv[1]
spark = get_spark(app_name="audit-q5-sf100", shuffle_partitions=256)
spark.sparkContext.setLogLevel("ERROR")
for t in {warm!r}:
    load(spark, sf, t).write.format("noop").mode("overwrite").save()
fault_before = memory_fault_probe()
t0 = time.perf_counter()
QUERIES[{query!r}](spark, sf).write.format("noop").mode("overwrite").save()
elapsed = round(time.perf_counter() - t0, 3)
fault_after = memory_fault_probe()
print("DRAW_JSON " + json.dumps({{
    "elapsed_s": elapsed,
    "pagefault_us_per_4k_before": fault_before,
    "pagefault_us_per_4k_after": fault_after,
}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--draws", type=int, default=3)
    ap.add_argument("--sf", default=os.path.join(HERE, "testdata_sf100"))
    ap.add_argument("--timeout", type=int, default=2400)
    args = ap.parse_args()

    from bench import env_fingerprint

    fd, child = tempfile.mkstemp(prefix="audit_q5_child_", suffix=".py")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        f.write(_CHILD.format(here=HERE, warm=WARM_TABLES, query=QUERY))

    draws: list[dict] = []
    try:
        for i in range(args.draws):
            scratch = tempfile.mkdtemp(prefix="audit_q5_scratch_")
            env = dict(
                os.environ,
                SPARK_LOCAL_DIRS=scratch,
                SPARK_DRIVER_MEMORY="48g",
            )
            try:
                p = subprocess.run(
                    [sys.executable, child, args.sf],
                    capture_output=True, text=True,
                    timeout=args.timeout, env=env,
                )
            finally:
                shutil.rmtree(scratch, ignore_errors=True)
            m = re.search(r"DRAW_JSON (\{.*\})", p.stdout)
            if p.returncode != 0 or not m:
                sys.exit(
                    f"draw {i} failed (rc={p.returncode}):\n"
                    f"{p.stderr[-2000:]}"
                )
            rec = json.loads(m.group(1))
            rec["draw"] = i
            draws.append(rec)
            print(json.dumps(rec), flush=True)
            time.sleep(5)
    finally:
        try:
            os.unlink(child)
        except OSError:
            pass

    # denominator: the newest sf10 artifact's q5 draw, the same rebasing
    # rule the sf100 sweep uses
    sf10_files = sorted(
        fn for fn in os.listdir(HERE) if re.match(r"BENCH_SF10_r\d+\.json$", fn)
    )
    sf10_q5 = None
    if sf10_files:
        with open(os.path.join(HERE, sf10_files[-1]), encoding="utf-8") as f:
            sf10_q5 = json.load(f).get("queries", {}).get(QUERY)

    rounds = [
        int(m.group(1))
        for fn in os.listdir(HERE)
        if (m := re.match(r"BENCH_r(\d+)\.json$", fn))
    ]
    rnd = (max(rounds) + 1) if rounds else 1
    times = sorted(d["elapsed_s"] for d in draws)
    med = times[len(times) // 2]
    out = {
        "metric": "q5_sf100_warm_isolated_audit",
        "query": QUERY,
        "draws": draws,
        "median_s": med,
        "min_s": times[0],
        "sf10_baseline_file": sf10_files[-1] if sf10_files else None,
        "sf10_q5_s": sf10_q5,
        "median_ratio_vs_sf10": (
            round(med / sf10_q5, 2) if sf10_q5 else None
        ),
        "min_ratio_vs_sf10": (
            round(times[0] / sf10_q5, 2) if sf10_q5 else None
        ),
        "config": {"shuffle_partitions": 256, "driver_memory": "48g"},
        "env": env_fingerprint(),
    }
    path = os.path.join(HERE, f"AUDIT_Q5_SF100_r{rnd:02d}.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "draws"}))
    print("written:", path)


if __name__ == "__main__":
    main()
