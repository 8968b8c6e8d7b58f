"""PPJoin ``max_df`` stop-list measurement on a corpus where it BITES
(r11, VERDICT r10 #2).

The honest sf100 corpus prunes nothing at max_df=1000 (BASELINE.md
"PPJoin stop-list"), so the lever's recall/cost trade was documented but
evidence-free.  This tool synthesizes the degenerate corpus the lever
exists for — boilerplate/templated text where even a document's 2 RAREST
shingles are shared by hundreds-to-thousands of documents — and measures
pair count, recall vs the exact (max_df=None) run, wall time, and
spill/shuffle bytes at each stop-list setting.

Corpus (deterministic, no RNG — built from expressions over doc_id):
- 30% boilerplate: a fixed 30-word template + a pooled suffix token, the
  templated-error-page / legal-disclaimer shape.  Two tiers so each
  max_df level prunes one:
    tier A: 50 suffix variants -> same-text groups of n*0.3*0.5/50
            (rare-shingle doc_freq ~300 at n=50k)
    tier B: 2  suffix variants -> groups of ~1200 (doc_freq ~1200)
  Same-suffix docs are EXACT text duplicates — which is the real shape:
  a corpus that skipped digest dedup and hits ppjoin with templated text.
- 70% organic: 25-word salads over a 20k vocabulary; shingle doc_freq ~1,
  contributing no pairs (the healthy corpus the sf100 sweep measured).

Because the stop-list only REMOVES candidate-generating shingles and the
verify step is unchanged, every max_df output is a SUBSET of the exact
output — recall is exactly pair_count(max_df) / pair_count(None).

Usage: python tools/bench_maxdf.py [n_docs] [max_df...]
       python tools/bench_maxdf.py 50000 1000 100
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEMPLATE = " ".join(f"tpl{i}" for i in range(30))


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode("utf-8"))


def _stage_window_bytes(spark, after_stage: int) -> dict:
    """Spill/shuffle bytes summed over stages completed after a mark."""
    out = {"memory_spill_b": 0, "disk_spill_b": 0, "shuffle_write_b": 0}
    try:
        stages = _rest(spark, "/stages?status=complete")
    except Exception:
        return out
    for s in stages:
        if s["stageId"] <= after_stage:
            continue
        out["memory_spill_b"] += s.get("memoryBytesSpilled", 0)
        out["disk_spill_b"] += s.get("diskBytesSpilled", 0)
        out["shuffle_write_b"] += s.get("shuffleWriteBytes", 0)
    return out


def _max_stage_id(spark) -> int:
    try:
        return max((s["stageId"] for s in _rest(spark, "/stages")), default=-1)
    except Exception:
        return -1


def build_corpus(spark, n_docs: int):
    from pyspark.sql import functions as F

    n_boiler = int(n_docs * 0.3)
    n_a = int(n_boiler * 5 / 6)  # tier A: pool of 50
    # tier B: pool of 2 (the rest of the boilerplate)
    salad = (
        "concat_ws(' ', transform(sequence(0, 24),"
        " j -> concat('w', cast((id * 31 + j * 7919) % 20000 as string))))"
    )
    d = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_a,
            F.concat(F.lit(TEMPLATE + " sfx"), (F.col("id") % 50).cast("string")),
        )
        .when(
            F.col("id") < n_boiler,
            F.concat(F.lit(TEMPLATE + " big"), (F.col("id") % 2).cast("string")),
        )
        .otherwise(F.expr(salad))
        .alias("text"),
    )
    return d, n_a, n_boiler


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    levels = [int(x) for x in sys.argv[2:]] or [1000, 100]

    from fstore_sql_spark import get_spark
    from fstore_sql_spark.operators.dedup import prefix_filter_pairs

    spark = get_spark(
        app_name="bench-maxdf", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="maxdf_")
    try:
        d, n_a, n_boiler = build_corpus(spark, n_docs)
        d.write.mode("overwrite").parquet(os.path.join(tmp, "corpus"))
        corpus = spark.read.parquet(os.path.join(tmp, "corpus"))
        ga = n_a // 50
        gb = (n_boiler - n_a) // 2
        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "tier_a": {"docs": n_a, "group": ga, "rare_doc_freq": ga},
                    "tier_b": {
                        "docs": n_boiler - n_a,
                        "group": gb,
                        "rare_doc_freq": gb,
                    },
                }
            ),
            flush=True,
        )

        results = []
        exact_pairs = None
        for md in [None] + levels:
            mark = _max_stage_id(spark)
            t0 = time.time()
            cnt = prefix_filter_pairs(corpus, max_df=md).count()
            wall = round(time.time() - t0, 2)
            io = _stage_window_bytes(spark, mark)
            # Drop the auto-persisted DISK_ONLY tok cache between arms
            # (ADVICE r11): plan-level cache matching would otherwise let
            # later arms silently reuse the first arm's cache, skewing
            # exactly the wall/spill numbers this sweep exists to measure.
            spark.catalog.clearCache()
            if md is None:
                exact_pairs = cnt
            row = {
                "max_df": md,
                "pairs": cnt,
                "recall": round(cnt / exact_pairs, 4) if exact_pairs else None,
                "wall_s": wall,
                "memory_spill_gb": round(io["memory_spill_b"] / 2**30, 2),
                "disk_spill_gb": round(io["disk_spill_b"] / 2**30, 2),
                "shuffle_write_gb": round(io["shuffle_write_b"] / 2**30, 2),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        print(json.dumps({"corpus": "boilerplate-degenerate", "results": results}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
