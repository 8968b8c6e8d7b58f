"""Per-row state bound for ``text_fingerprint`` (r9, VERDICT r8 #4).

``text_fingerprint`` is per-row compute (no aggregation across rows, no
shuffle), so its scale story is the PER-ROW transient, which grows with
document LENGTH — the quantity that also explains the query's cross-decade
ratios (the synthetic corpus's avg doc grows 297 → 453 → 508 chars across
sf1 → sf10 → sf100, so sf10 → sf100 total chars is 11.2x, not 10x).

Three candidate plans, identical results on ASCII corpora (oracle-gated):

- ``digest_array`` — ``array_min(transform(idx, i -> md5(substring(text,
  i, 8))))``: materializes one 32-hex digest per char position AND pays
  char-indexed substring.
- ``char_fold`` — running ``aggregate`` min over char-indexed substrings:
  O(1) live digests, but ``substring(text, i, 8)`` on a UTF8 string must
  SCAN from the start to locate char i (variable-width encoding), so the
  whole fingerprint is O(len²) per doc — the measured wall: ~170 s for a
  single 250k-char doc, regardless of heap.
- ``byte_fold`` — the SHIPPED form: running min over BYTE-indexed
  slices of ``text.cast("binary")`` (O(1) slicing).  O(len) total,
  O(1) live digests: 0.75 s at 250k chars, 3.3 s at 4M (226x/linear).
  r10 digests ``md5(hex(slice))`` instead of ``md5(slice)`` (ADVICE r9
  — hex is always-ASCII so the DuckDB oracle can hash the identical
  string on non-ASCII corpora); same O(1)-per-position shape.

This tool measures all three on single synthetic documents of growing
length inside a FIXED small JVM heap, sampling JVM used-heap from a
polling thread — the measurement behind BASELINE.md's "text_fingerprint
per-row cost" section.

Usage: python tools/bench_fingerprint_state.py [--heap 1g]
         [--chars 250000,1000000,4000000] [--timeout 300]
Each (form, length) runs in a fresh subprocess so heap settings and JVM
state are clean per point.  Writes one JSON line per point to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, threading, time
sys.path.insert(0, {here!r})
from pyspark.sql import SparkSession, functions as F

form, n_chars = {form!r}, {n_chars}
spark = (
    SparkSession.builder.master("local[1]")
    .appName("fp-state")
    .config("spark.driver.memory", {heap!r})
    .config("spark.sql.shuffle.partitions", "1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
rt = spark._jvm.java.lang.Runtime.getRuntime()

peak = [0]
stop = threading.Event()
def poll():
    while not stop.is_set():
        peak[0] = max(peak[0], rt.totalMemory() - rt.freeMemory())
        time.sleep(0.02)
t = threading.Thread(target=poll, daemon=True); t.start()

# one synthetic doc of n_chars, built JVM-side: repeat a 64-char block
# (8-gram md5s still vary across the block, which is all the min needs)
block = "".join(chr(97 + (i * 7) % 26) for i in range(61)) + "xyz"
reps = max(n_chars // 64, 1)
doc = spark.range(1).select(
    F.col("id").alias("doc_id"),
    F.repeat(F.lit(block), reps).alias("text"),
)
idx = F.sequence(F.lit(1), F.greatest(F.length("text") - 6, F.lit(1)))
if form == "digest_array":
    fp = F.array_min(
        F.transform(idx, lambda i: F.md5(F.substring(F.col("text"), i, 8)))
    )
elif form == "char_fold":
    fp = F.aggregate(
        idx, F.lit("g"),
        lambda acc, i: F.least(acc, F.md5(F.substring(F.col("text"), i, 8))),
    )
else:  # byte_fold — the shipped form
    b = F.col("text").cast("binary")
    idx_b = F.sequence(F.lit(1), F.greatest(F.length(b) - 6, F.lit(1)))
    # r10: md5 over the HEX of the slice — the shipped form (ADVICE r9:
    # hex is always-ASCII, so the DuckDB oracle can hash the identical
    # string on non-ASCII corpora); still O(1) per position.
    fp = F.aggregate(
        idx_b, F.lit("g"),
        lambda acc, i: F.least(acc, F.md5(F.hex(F.substring(b, i, 8)))),
    )
t0 = time.time()
try:
    row = doc.select(fp.alias("f")).collect()[0]
    ok, err = True, None
except Exception as e:  # OOM/heap wall
    ok, err = False, type(e).__name__
el = time.time() - t0
stop.set(); t.join(timeout=1)
print("RESULT " + json.dumps({{
    "form": form, "n_chars": n_chars, "ok": ok, "err": err,
    "sec": round(el, 2), "jvm_peak_used_mb": round(peak[0] / 2**20, 1),
}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--heap", default="1g")
    ap.add_argument("--chars", default="250000,1000000,4000000")
    ap.add_argument("--timeout", type=int, default=300)
    ap.add_argument(
        "--forms", default="digest_array,char_fold,byte_fold"
    )
    args = ap.parse_args()
    lengths = [int(c) for c in args.chars.split(",")]
    results = []
    for form in args.forms.split(","):
        for n in lengths:
            code = _CHILD.format(here=HERE, form=form, n_chars=n, heap=args.heap)
            env = dict(os.environ)
            try:
                p = subprocess.run(
                    [sys.executable, "-c", code],
                    capture_output=True, text=True,
                    timeout=args.timeout, env=env,
                )
            except subprocess.TimeoutExpired:
                # a GC-thrashing heap wall IS the measurement: the form
                # could not finish this length in the budget
                rec = {
                    "form": form, "n_chars": n, "ok": False,
                    "err": f"timeout>{args.timeout}s (heap thrash)",
                }
                results.append(rec)
                print(json.dumps(rec), flush=True)
                continue
            line = next(
                (ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")),
                None,
            )
            if line is None:
                rec = {
                    "form": form, "n_chars": n, "ok": False,
                    "err": "child_died", "rc": p.returncode,
                    "tail": p.stderr.strip().splitlines()[-1:] if p.stderr else [],
                }
            else:
                rec = json.loads(line[len("RESULT "):])
            results.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"heap": args.heap, "points": results}))


if __name__ == "__main__":
    main()
