"""Warm-isolated PPJoin measurement + stop-list lever (r10, VERDICT r9 #3).

`dedup_prefix_filter_pairs` is the sf100 sweep's single biggest line
(369 s / 9.37x in-sweep at r9) and its ~25 GB spill is the named
page-cache-churn mechanism behind both residual superlinear flags — yet
ppjoin itself was never warm-isolated.  This tool:

1. runs the registry query once to warm (page cache, JIT), then times a
   clean draw — the warm-isolated number the r9 audit recorded for
   q1/skew but not for ppjoin itself;
2. sums the draw's spill (memory+disk bytes, shuffle write) from the
   Spark UI REST API;
3. repeats with the ``max_df`` stop-list engaged and records the honest
   trade: wall, spill, AND the pair-count delta (a pair whose only
   shared prefix shingle is stop-listed is missed).

Run with the same session shape as the sf100 sweep
(SPARK_DRIVER_MEMORY=48g, shuffle_partitions=256).

Usage: python tools/bench_ppjoin_sf100.py [--sf testdata_sf100]
         [--max-df 1000] [--sf10-sec 39.398]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}",
                                timeout=60) as r:
        return json.loads(r.read().decode("utf-8"))


def _max_stage(spark) -> int:
    try:
        return max((s["stageId"] for s in _rest(spark, "/stages")), default=-1)
    except Exception:
        return -1


def _stage_totals(spark, after: int) -> dict:
    tot = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0,
           "shuffleWriteBytes": 0}
    try:
        stages = _rest(spark, "/stages?status=complete")
    except Exception:
        return tot
    for s in stages:
        if s["stageId"] <= after:
            continue
        tot["memoryBytesSpilled"] += s.get("memoryBytesSpilled", 0)
        tot["diskBytesSpilled"] += s.get("diskBytesSpilled", 0)
        tot["shuffleWriteBytes"] += s.get("shuffleWriteBytes", 0)
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(HERE, "testdata_sf100"))
    ap.add_argument("--max-df", type=int, default=1000)
    ap.add_argument("--sf10-sec", type=float, default=None,
                    help="sf10 in-sweep seconds for the ratio (default: "
                    "read newest BENCH_SF10_r*.json)")
    args = ap.parse_args()

    import re

    import fstore_sql_spark.operators  # noqa: F401
    # 48g is this tool's documented methodology (docstring) — default it
    # rather than trusting the caller's environment (see bench_sf100.py).
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from fstore_sql_spark import get_spark
    from fstore_sql_spark.operators.dedup import _corpus, prefix_filter_pairs

    sf10_sec = args.sf10_sec
    sf10_file = None
    if sf10_sec is None:
        files = sorted(fn for fn in os.listdir(HERE)
                       if re.match(r"BENCH_SF10_r\d+\.json$", fn))
        if files:
            sf10_file = files[-1]
            with open(os.path.join(HERE, sf10_file), encoding="utf-8") as f:
                sf10_sec = json.load(f)["queries"].get(
                    "dedup_prefix_filter_pairs")

    spark = get_spark(
        app_name="ppjoin-warm-sf100",
        shuffle_partitions=256,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = _corpus(spark, args.sf)

    def run(max_df, count_pairs=False):
        mark = _max_stage(spark)
        t0 = time.time()
        df = prefix_filter_pairs(corpus, max_df=max_df)
        if count_pairs:
            n = df.count()
        else:
            n = None
            df.write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 3)
        io = _stage_totals(spark, mark)
        # Each draw must pay its own explode: drop the auto-persisted
        # DISK_ONLY tok cache (tens of GB at sf100) so arms stay
        # independent and the disk doesn't accumulate one cache per draw
        # (ADVICE r11).
        spark.catalog.clearCache()
        return {"wall_s": wall, "n_pairs": n,
                "spill_disk_gb": round(io["diskBytesSpilled"] / 2**30, 2),
                "spill_mem_gb": round(io["memoryBytesSpilled"] / 2**30, 2),
                "shuffle_write_gb": round(io["shuffleWriteBytes"] / 2**30, 2)}

    out = {"sf": args.sf, "sf10_sec": sf10_sec, "sf10_file": sf10_file,
           "max_df": args.max_df}
    print(json.dumps({"phase": "warmup"}), flush=True)
    out["cold"] = run(None)
    print(json.dumps({"cold": out["cold"]}), flush=True)
    out["warm"] = run(None)
    out["warm"]["ratio_vs_sf10"] = (
        round(out["warm"]["wall_s"] / sf10_sec, 2) if sf10_sec else None
    )
    print(json.dumps({"warm": out["warm"]}), flush=True)
    out["warm_stoplist"] = run(args.max_df)
    print(json.dumps({"warm_stoplist": out["warm_stoplist"]}), flush=True)
    # honest recall accounting: exact pair counts with and without
    out["n_pairs_exact"] = run(None, count_pairs=True)["n_pairs"]
    out["n_pairs_stoplist"] = run(args.max_df, count_pairs=True)["n_pairs"]
    print("SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
