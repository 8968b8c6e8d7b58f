"""Dump ``explain("formatted")`` for every HEADLINE bench entry (and any
extra names given on the command line) into plans/r14/<query>_<tag>.txt.

Usage: python tools/dump_r14_plans.py before|after [names...]

The optimization-round evidence convention: the judge cannot run Spark, so
plan claims in OPTIMIZATION_r14.md are checked against these files.  Plans
are captured at the BENCH tier (sf0.1) on the same session config bench.py
uses, so Exchange counts / join strategies match the timed runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    extra = sys.argv[2:]

    import fstore_sql_spark.operators  # noqa: F401
    from fstore_sql_spark import get_spark
    from fstore_sql_spark.queries import QUERIES
    from bench import HEADLINE

    spark = get_spark(app_name="dump-r14-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(out_dir, exist_ok=True)

    # names on the command line → dump ONLY those; none → the full sweep
    names = extra if extra else list(HEADLINE)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
