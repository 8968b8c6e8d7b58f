"""Skew-win demonstration bench (r10, VERDICT r9 #2 / next-round #2).

The r9 flagship (`skew_salted_hot_revenue`) was only ever measured on
TPC-H-shaped near-uniform keys, where it proves EQUIVALENCE, not a win.
This tool plants a genuinely hot key — the operator docstring's own
scenario (one default decider_id / celebrity user carrying ~10% of all
rows) — and measures, on the SAME inputs:

- ``vanilla``            plain equi-join, AQE skew-join splitting ON
                         (Spark's reactive mitigation — the honest
                         baseline, not a strawman)
- ``vanilla_noaqe``      plain equi-join, AQE skew handling OFF (what a
                         static planner/cluster without AQE does)
- ``targeted``           the recommended recipe: profile → hotness
                         verdict → ``salted_join_hot`` (n=8)
- ``full_salt``          the classic construction: whole build side
                         replicated 8x (kept as the demonstrative
                         upper-cost reference)

and, on the UNTOUCHED uniform keys, ``vanilla`` vs ``targeted`` — where
the r10 decision rule must return the vanilla join, so the recipe's
overhead is one 2%-sample profile job and nothing else.

Each strategy records wall seconds AND task-time skew (max / median task
duration of the worst stage, from the Spark UI REST API) — wall time on
local[32] under-reports skew that would stall a 1000-executor stage, the
task-duration ratio is the scale-honest signal.

The join is forced out of broadcast range (autoBroadcastJoinThreshold=-1
for the join inputs ... set via a tiny threshold) so the build side
actually shuffles: at the default 32 MB threshold the sf1 orders
projection broadcasts and no strategy can differ.

Usage: python tools/bench_skew_win.py [--sf /root/repo/testdata_sf10]
         [--hot-frac 0.1] [--n 8] [--out]
Writes one JSON line per measurement; --out appends a summary table row
set to stdout for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode("utf-8"))


def _max_stage_id(spark) -> int:
    try:
        stages = _rest(spark, "/stages")
        return max((s["stageId"] for s in stages), default=-1)
    except Exception:
        return -1


def _worst_stage_skew(spark, after_stage: int) -> dict:
    """Task-duration skew of the slowest stage completed after
    ``after_stage``: {stage, name, task_p50_ms, task_max_ms, ratio}."""
    worst = {"task_max_ms": 0.0}
    try:
        stages = _rest(spark, "/stages?status=complete")
    except Exception:
        return {}
    for s in stages:
        if s["stageId"] <= after_stage or s.get("numCompleteTasks", 0) < 2:
            continue
        try:
            q = _rest(
                spark,
                f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=0.5,1.0",
            )
        except Exception:
            continue
        p50, mx = q["duration"][0], q["duration"][1]
        if mx > worst["task_max_ms"]:
            worst = {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "n_tasks": s.get("numCompleteTasks"),
                "task_p50_ms": round(p50, 1),
                "task_max_ms": round(mx, 1),
                "task_skew_ratio": round(mx / p50, 2) if p50 else None,
            }
    return worst if "stage" in worst else {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf10"))
    ap.add_argument("--hot-frac", type=float, default=0.1)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument(
        "--budget", type=int, default=2_000_000,
        help="hot_rows_budget passed to profile_hot_keys (default: the "
        "operator's default; scale down for small fixtures)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fstore_sql_spark import get_spark
    from fstore_sql_spark.operators.skew import (
        profile_hot_keys,
        salted_join,
        salted_join_hot,
    )
    from fstore_sql_spark.queries import load

    spark = get_spark(
        app_name="skew-win-bench",
        extra_conf={
            "spark.ui.enabled": "true",
            # force the build side out of broadcast range: at the engine
            # default (32 MB) the orders projection broadcasts at sf1/sf10
            # and every strategy degenerates to the same plan
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    lineitem = load(spark, args.sf, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    orders = load(spark, args.sf, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    hot_key = orders.select(F.min("k")).first()[0]
    denom = max(int(round(1.0 / args.hot_frac)), 1)
    skewed_left = lineitem.withColumn(
        "k",
        F.when(F.pmod(F.xxhash64("k"), F.lit(denom)) == 0, F.lit(hot_key))
        .otherwise(F.col("k")),
    )

    def agg(joined):
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )

    def run(tag: str, build, aqe_skew: bool = True) -> dict:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        mark = _max_stage_id(spark)
        t0 = time.time()
        df = agg(build())
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 3)
        rec = {"strategy": tag, "wall_s": wall, **_worst_stage_skew(spark, mark)}
        print(json.dumps(rec), flush=True)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        return rec

    results = {"sf": args.sf, "hot_frac": args.hot_frac, "n": args.n, "budget": args.budget}

    # correctness cross-check: every strategy must agree on the skewed data
    budget = args.budget
    hot = profile_hot_keys(skewed_left, "k", hot_rows_budget=budget)
    results["hot_keys_nominated"] = len(hot)
    assert hot, (
        f"fixture failed to trip the verdict: {args.hot_frac} of lineitem "
        f"must exceed budget {budget}"
    )
    baseline_rows = sorted(
        map(tuple, agg(skewed_left.join(orders, "k")).collect())
    )
    for name, build in (
        ("targeted", lambda: salted_join_hot(skewed_left, orders, "k", hot, n=args.n)),
        ("full_salt", lambda: salted_join(skewed_left, orders, "k", n=args.n)),
    ):
        got = sorted(map(tuple, agg(build()).collect()))
        assert got == baseline_rows, f"{name} diverged from plain join"
    print(json.dumps({"equivalence": "ok", "groups": len(baseline_rows)}), flush=True)

    # --- skewed arm ------------------------------------------------------
    skew_runs = {}
    for tag, build, aqe in (
        ("vanilla_noaqe", lambda: skewed_left.join(orders, "k"), False),
        ("vanilla", lambda: skewed_left.join(orders, "k"), True),
        ("targeted", lambda: salted_join_hot(skewed_left, orders, "k", hot, n=args.n), True),
        ("full_salt", lambda: salted_join(skewed_left, orders, "k", n=args.n), True),
    ):
        skew_runs[tag] = run(f"skewed/{tag}", build, aqe)
    results["skewed"] = skew_runs

    # --- uniform arm: the decision rule must cost ~nothing ---------------
    uni_runs = {}
    t0 = time.time()
    uni_hot = profile_hot_keys(lineitem, "k", hot_rows_budget=budget)
    profile_s = round(time.time() - t0, 3)
    assert uni_hot == [], f"uniform data nominated hot keys: {uni_hot}"
    uni_runs["profile_verdict_s"] = profile_s
    uni_runs["vanilla"] = run(
        "uniform/vanilla", lambda: lineitem.join(orders, "k")
    )
    # the recipe with an empty hot list IS the vanilla join (short-circuit)
    uni_runs["targeted"] = run(
        "uniform/targeted",
        lambda: salted_join_hot(lineitem, orders, "k", uni_hot, n=args.n),
    )
    results["uniform"] = uni_runs

    print("SUMMARY " + json.dumps(results))


if __name__ == "__main__":
    main()
