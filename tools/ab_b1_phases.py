"""Interleaved A/B of the B1 bulk-append PHASES across two git trees
(r13, VERDICT r12 #1 — the ab_engine_bench method, pointed at the sf100
write-path regression).

Context: BENCH_SF100_r12 read b1 142.8k ev/s vs r10's 350.8k with
near-neutral b-bench probes, and the r12 localization stopped at "the
candidates phase is the ingest-mapping plan evaluation + one cache
write" — r10's 0.35 µs/row for nominally the same work stayed open, and
validate_s (81→204 s) / offset_number_s (117→208 s) grew too.  This tool
produces the attribution evidence VERDICT r12 asks for:

1. ``--explain-only``: print the full optimized/physical plan of the
   candidates batch from each tree on the same corpus and diff them —
   if the plans are bit-identical, Catalyst is exonerated without
   burning an hour of interleaved execution.
2. Interleaved execution arms (A B A B ...), fresh subprocess + fresh
   JVM per draw, same corpus, bench_sf100's exact session config
   (shuffle=256, SPARK_DRIVER_MEMORY setdefault 48g): per-phase wall
   times from ``store.last_append_profile``, per-row µs, total JVM GC
   time across the append, and the code-frozen engine probe bracketing
   every draw so each measurement carries its own box context.

Static prior, recorded so the A/B's expected outcome is explicit:
``git diff r10..HEAD`` is EMPTY on every file in the b1 execution path
(store.py append code, storage.py, functions/, queries.py's
es_ingest_mapping, session.py) — the r10→r12 changes touch only the
delivery path and the dedup/text/sampling operators.  A persistent
inter-arm gap would therefore be a harness artifact; the interesting
output is the ABSOLUTE per-phase law vs the r10 artifact's
(34.6 / 81.2 / 117.1 s), measured in a window whose probes are on
record.

Usage:
  python tools/ab_b1_phases.py REF_A REF_B [--draws 2]
      [--sf /root/repo/testdata_sf100] [--explain-only]
"""

from __future__ import annotations

import argparse
import difflib
import json
import os
import statistics
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Standalone restatement of bench_sf100.py's B1 measurement (this file's
# copy runs for BOTH arms so the harness cannot differ — only the engine
# code under it).  Emits one RESULT json line.
_CHILD = r"""
import json, os, shutil, sys, tempfile, time


def _gc_ms(spark):
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def _ab_main():
    tree, sf_dir, mode = sys.argv[1], sys.argv[2], sys.argv[3]
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    sys.path.insert(0, tree)
    import fstore_sql_spark.operators  # noqa: F401
    from fstore_sql_spark import EventStore, get_spark
    from fstore_sql_spark.queries import QUERIES, load
    from pyspark.sql import functions as F

    spark = get_spark(app_name="ab-b1-phases", shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")

    src0 = QUERIES["es_ingest_mapping"](spark, sf_dir)
    batch = src0.select(
        "event", F.col("event_uuid").alias("event_id"), "event_version",
        "decider", "decider_id", F.lit("{}").alias("data"),
        F.col("event_uuid").alias("command_id"), "previous_id",
        F.col("offset").alias("seq"),
    )

    if mode == "explain":
        # the EXACT frame append_batch persists (_as_candidates output):
        # replicate its column normalization so the compared plan is the
        # cached one, not the raw select
        cand = batch
        if "final" not in cand.columns:
            cand = cand.withColumn("final", F.lit(False))
        cand = cand.select(
            "event", "event_id",
            F.col("event_version").cast("long").alias("event_version"),
            "decider", "decider_id", "data", "command_id", "previous_id",
            F.col("final").cast("boolean").alias("final"),
            F.col("seq").cast("long").alias("seq"),
        )
        qe = cand._jdf.queryExecution()
        print("PLAN_BEGIN")
        print(qe.optimizedPlan().toString())
        print("---PHYSICAL---")
        print(qe.executedPlan().toString())
        print("PLAN_END")
        spark.stop()
        return

    # warm the source listing + page cache the way the sweep does
    load(spark, sf_dir, "events").write.format("noop").mode("overwrite").save()

    out = {"heap_max_gb": round(
        spark._jvm.java.lang.Runtime.getRuntime().maxMemory() / 2**30, 1)}
    tmp = tempfile.mkdtemp(prefix="ab_b1_store_")
    try:
        n_parts_hint = src0.select("decider_id").distinct().count()
        store = EventStore(spark, tmp, expected_partitions=n_parts_hint)
        for ev in ("click", "view", "purchase", "signup", "error"):
            store.register_decider_event("user", ev, f"testdata event {ev}")
        n = batch.count()
        gc0 = _gc_ms(spark)
        t0 = time.time()
        store.append_batch(batch)
        b1 = time.time() - t0
        out.update(
            n=n,
            b1_s=round(b1, 3),
            b1_eps=round(n / b1, 1),
            gc_s=round((_gc_ms(spark) - gc0) / 1000.0, 1),
            us_per_row=round(b1 / n * 1e6, 3),
            profile=dict(store.last_append_profile),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    _ab_main()
"""

PHASES = ("candidates_s", "validate_s", "offset_number_s", "parquet_write_s")


def _engine_probe() -> float:
    sys.path.insert(0, HERE)
    from bench import engine_noise_probe

    return engine_noise_probe()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_a")
    ap.add_argument("ref_b")
    ap.add_argument("--draws", type=int, default=2)
    ap.add_argument("--sf", default=os.path.join(HERE, "testdata_sf100"))
    ap.add_argument("--explain-only", action="store_true")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    trees: dict[str, str] = {}
    # Per-run child path (ADVICE r13): a fixed name let two concurrent
    # invocations (or a stale older harness) clobber each other's child
    # script mid-run — the A/B would then time two copies of ONE tree.
    fd, child = tempfile.mkstemp(prefix="ab_b1_child_", suffix=".py")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        f.write(_CHILD)
    results: dict[str, list[dict]] = {args.ref_a: [], args.ref_b: []}
    plans: dict[str, str] = {}
    try:
        for ref in (args.ref_a, args.ref_b):
            path = tempfile.mkdtemp(prefix=f"ab_b1_{ref[:7]}_")
            subprocess.run(
                ["git", "-C", HERE, "worktree", "add", "--detach", path, ref],
                check=True, capture_output=True,
            )
            trees[ref] = path

        if args.explain_only:
            for ref in (args.ref_a, args.ref_b):
                p = subprocess.run(
                    [sys.executable, child, trees[ref], args.sf, "explain"],
                    capture_output=True, text=True, timeout=600,
                )
                # A crashed child (missing corpus, import error) emits no
                # PLAN_BEGIN, and two such crashes would both collapse to
                # the same empty string — printing "PLANS IDENTICAL", a
                # false exoneration of Catalyst in the exact attribution
                # workflow this tool exists for (ADVICE r13).  Die loudly
                # instead of comparing garbage.
                if p.returncode != 0 or "PLAN_BEGIN" not in p.stdout:
                    sys.exit(
                        f"explain child [{ref}] failed "
                        f"(rc={p.returncode}, PLAN_BEGIN "
                        f"{'present' if 'PLAN_BEGIN' in p.stdout else 'ABSENT'})"
                        f":\n{p.stderr[-2000:]}"
                    )
                body = p.stdout.split("PLAN_BEGIN", 1)[-1].split("PLAN_END")[0]
                plans[ref] = body
                print(f"--- plan [{ref}]: {len(body.splitlines())} lines")
            a, b = plans[args.ref_a], plans[args.ref_b]
            if a == b:
                print("PLANS IDENTICAL (byte-for-byte)")
            else:
                diff = list(difflib.unified_diff(
                    a.splitlines(), b.splitlines(),
                    fromfile=args.ref_a, tofile=args.ref_b, lineterm="",
                ))
                print("\n".join(diff[:200]))
                print(f"PLANS DIFFER: {len(diff)} diff lines")
            return

        for draw in range(args.draws):
            for ref in (args.ref_a, args.ref_b):  # interleave
                eng = _engine_probe()
                # Per-draw scratch dir, reclaimed SYNCHRONOUSLY by the
                # parent after the child exits: a 100M-row b1 draw spills
                # ~30-35 GB of blockmgr, and Spark's shutdown-hook rm is
                # asynchronous (and absent entirely when the draw dies on
                # ENOSPC) — the first run of this tool lost all four
                # draws to the PREVIOUS draws' orphaned spill.
                scratch = tempfile.mkdtemp(prefix="ab_b1_scratch_")
                env = dict(os.environ, SPARK_LOCAL_DIRS=scratch)
                p = subprocess.run(
                    [sys.executable, child, trees[ref], args.sf, "run"],
                    capture_output=True, text=True, timeout=args.timeout,
                    env=env,
                )
                subprocess.run(["rm", "-rf", scratch])
                line = [ln for ln in p.stdout.splitlines()
                        if ln.startswith("RESULT ")]
                if not line:
                    print(json.dumps({
                        "ref": ref, "draw": draw, "error": "no RESULT",
                        "stderr_tail": p.stderr[-500:],
                    }), flush=True)
                    continue
                rec = json.loads(line[-1][len("RESULT "):])
                rec["engine_probe_sec"] = eng
                results[ref].append(rec)
                print(json.dumps({"ref": ref, "draw": draw, **rec}),
                      flush=True)
    finally:
        for path in trees.values():
            subprocess.run(
                ["git", "-C", HERE, "worktree", "remove", "--force", path],
                capture_output=True,
            )
        try:
            os.unlink(child)
        except OSError:
            pass

    summary = {"a": args.ref_a, "b": args.ref_b}
    for ref, recs in results.items():
        if not recs:
            continue
        key = "a" if ref == args.ref_a else "b"
        summary[f"{key}_b1_s"] = [r["b1_s"] for r in recs]
        summary[f"{key}_gc_s"] = [r["gc_s"] for r in recs]
        for ph in PHASES:
            summary[f"{key}_{ph}"] = [r["profile"].get(ph) for r in recs]
    ra, rb = results[args.ref_a], results[args.ref_b]
    if ra and rb:
        ma = statistics.median([r["b1_s"] for r in ra])
        mb = statistics.median([r["b1_s"] for r in rb])
        summary["b_over_a_b1"] = round(mb / ma, 3) if ma else None
    print("SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
