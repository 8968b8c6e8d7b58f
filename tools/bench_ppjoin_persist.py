"""A/B: persist(DISK_ONLY) on ppjoin's exploded (doc, shingle) table
(r11, VERDICT r10 #7 / r10 "what's wrong" #2).

``prefix_filter_pairs`` materializes ``tok`` three times (doc-frequency
aggregate + both sides of the verify join); each use re-explodes the
corpus.  The r10 broadcast-semi experiment was A/B'd and rejected with
numbers; this closes the other open question the same way: does caching
the exploded table to local disk beat recomputing the explode?

Interleaved arms (no-persist, persist, no-persist, persist, ...) so a
box-noise drift cannot masquerade as a code effect — the same discipline
as tools/ab_engine_bench.py.  Cache is cleared between draws; each draw
is a full count() of the final pair set.

Usage: python tools/bench_ppjoin_persist.py [sf_dir] [draws_per_arm]
       python tools/bench_ppjoin_persist.py /root/repo/testdata_sf10 3
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf10"
    draws = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from fstore_sql_spark import get_spark
    from fstore_sql_spark.operators.dedup import _corpus, prefix_filter_pairs

    spark = get_spark(app_name="ppjoin-persist-ab")
    spark.sparkContext.setLogLevel("ERROR")

    walls: dict[bool, list[float]] = {False: [], True: []}
    counts: dict[bool, int] = {}
    for i in range(2 * draws):
        arm = bool(i % 2)  # interleaved: F, T, F, T, ...
        corpus = _corpus(spark, sf_dir)
        t0 = time.time()
        cnt = prefix_filter_pairs(corpus, persist_tok=arm).count()
        wall = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        walls[arm].append(wall)
        counts[arm] = cnt
        print(json.dumps({"persist_tok": arm, "wall_s": wall, "pairs": cnt}),
              flush=True)

    assert counts[False] == counts[True], counts  # lever must not change results
    med = {k: sorted(v)[len(v) // 2] for k, v in walls.items()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "pairs": counts[False],
                "no_persist_walls": walls[False],
                "persist_walls": walls[True],
                "median_no_persist_s": med[False],
                "median_persist_s": med[True],
                "persist_speedup": round(med[False] / med[True], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
