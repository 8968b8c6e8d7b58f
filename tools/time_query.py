"""Isolate one (or more) registry queries with the noop sink (guide §1.4).

Usage: python tools/time_query.py [--sf DIR] [--draws N] name [name...]

Times each query N times in ONE warm session (first draw listed separately
— it carries codegen/JIT warmup), printing per-draw seconds and the median
of the warm draws.  This is the operator-isolation harness for the r14
optimization round: bench.py numbers include cold-start and run-position
effects; plan-change A/Bs should compare warm medians from this tool.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--draws", type=int, default=4)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import fstore_sql_spark.operators  # noqa: F401
    from fstore_sql_spark import get_spark
    from fstore_sql_spark.queries import QUERIES, load

    spark = get_spark(app_name="time-query")
    spark.sparkContext.setLogLevel("ERROR")
    load(spark, args.sf, "lineitem").count()  # session warmup, like bench.py

    for name in args.names:
        draws = []
        for i in range(args.draws):
            # Per-draw cache isolation: operators that persist an
            # intermediate (triangle_count edges, ppjoin tok) would
            # otherwise serve draw 2+ from draw 1's cache via logical-plan
            # matching, under-reporting the real per-run cost.
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} draw {i}")
            t0 = time.time()
            QUERIES[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            draws.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        warm = draws[1:] or draws
        print(
            f"{name}: draws={draws} warm_median={statistics.median(warm):.3f}"
        )


if __name__ == "__main__":
    main()
