"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then compares:
row count, sorted-by-name column list, and an order-insensitive value hash.
Floats are canonicalized via repr of float64; query authors should make
aggregates deterministic (decimal casts) so engines agree bit-for-bit.

TYPE-FAITHFUL since r12 (VERDICT r11 #2): the r11 driver-gate failures were
a pure DuckDB-type artifact (``SUM(BIGINT)`` returns HUGEINT = int128) that
this harness could not see because ``canon()`` stringified Python values —
``Decimal(5)`` and ``5`` both became ``"5"``.  The fix is two-fold:

1. DuckDB results are fetched via **Arrow** (``cur.arrow().to_pylist()``),
   the same path the driver uses, so HUGEINT surfaces as
   ``decimal128(38,0)`` -> Python ``Decimal`` instead of being silently
   widened to Python ``int`` by the native fetchall path.
2. ``canon()`` **type-tags** every value (``i:`` int, ``d:`` Decimal,
   ``f:`` float, ...), so a cross-engine divergence in the value's Python
   type after the engines' own client conversions fails the hash even when
   the string forms agree.

Verified against the r11 regression: with the operator-side CAST fixes
stashed, this harness fails exactly the three queries the driver failed
(``sample_deterministic_counts``, ``packed_bin_stats``,
``text_bpe_token_counts``) and no others.

Usage: python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    """Canonical string for one value, TYPE-TAGGED by the value's Python
    type after the engine's own client conversion.  ``Decimal(5)`` canons
    to ``d:5`` while ``5`` canons to ``i:5`` — the r11 HUGEINT-vs-BIGINT
    driver failure class is a hash mismatch here, not a silent pass."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "b:" + str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return "f:" + repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return "d:" + str(v)
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, datetime.datetime):
        return "ts:" + v.isoformat()
    if isinstance(v, datetime.date):
        return "dt:" + v.isoformat()
    if isinstance(v, bytes):
        return "x:" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):  # Arrow struct / map rows surface as dicts
        return "{" + ",".join(f"{k}={canon(v[k])}" for k in sorted(v)) + "}"
    return "s:" + str(v)


def value_hash(rows: list[tuple], col_order: list[int]) -> str:
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in col_order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def build_doc_subcorpus(sf_dir: str, mod: int) -> str:
    """Materialize a deterministically SAMPLED copy of ``sf_dir`` for the
    dedup-family sf10 oracle (r11, VERDICT r10 #1): documents are filtered
    to ``doc_id % mod == 0 OR doc_id % 1_000_000 < 25`` and written once;
    every other table is symlinked.  Both engines then read the SAME
    physical subset, so no cross-engine hash predicate has to agree.

    The predicate preserves the planted-duplicate structure by
    construction: the dedup gates plant pairs at query time by re-keying
    docs with ``doc_id < 25`` to ``doc_id + 100_000`` (operators/dedup.py
    ``_corpus``), so keeping every replica's 25 lowest per-replica ids
    (replica offset is 1_000_000 in make_sf1.py) keeps the planted
    sources, and the ``% mod`` slice carries the corpus bulk — including
    the within-replica multi-byte near-dup families the r11 adversarial
    slice plants (the slice lives at ``doc_id % 20 == 7``, and same-base-
    text family members are 20·k ids apart, so residue 7 keeps whole
    families and the sampled subcorpus carries multi-byte text through
    the dedup oracle too)."""
    import duckdb

    out = os.path.normpath(sf_dir) + f"_docsample{mod}"
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        if t == "documents":
            continue
        src = os.path.join(os.path.abspath(sf_dir), f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    dst = os.path.join(out, "documents.parquet")
    if not os.path.exists(dst):
        src = os.path.join(sf_dir, "documents.parquet")
        if os.path.isdir(src):
            src = os.path.join(src, "*.parquet")
        duckdb.connect().execute(
            f"COPY (SELECT * FROM read_parquet('{src}') "
            f"WHERE doc_id % {mod} IN (0, 7) OR doc_id % 1000000 < 25 "
            f"ORDER BY doc_id) TO '{dst}' (FORMAT PARQUET)"
        )
    return out


#: The sf10 SCALE-EXPOSED oracle subset, canonicalized r14 (VERDICT r13
#: #7 ratchet): r11 established it as two ad-hoc passes (37 + 29,
#: BASELINE.md "r10 ratchet" section) whose exact names lived only in
#: prose — from r14 the list is code, runnable verbatim each round via
#: ``--scale-exposed``.  Selection rule (unchanged from r11): every
#: family where a SCALE-dependent wrongness class can appear —
#: tie-breaks, decimal→double ULP drift past 2^53 (the ols find),
#: sampling determinism, window frames, sketch thresholds — and whose
#: oracle DuckDB can finish single-threaded at sf10 (60M lineitem /
#: 10M events); the shingle-explode documents families are excluded
#: here and covered by the ``--doc-sample-mod 20`` subcorpus instead.
SCALE_EXPOSED = [
    # TPC-H join/agg family
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q12_priority_shipping", "q13_order_distribution",
    "q14_promo_effect", "q17_small_quantity_revenue",
    "q21_waiting_suppliers", "top_customers_per_nation",
    # windows / sessions / time
    "window_function_family", "user_sessions", "session_window_rollup",
    "cohort_retention", "funnel_conversion", "scd2_state_at_cutoff",
    "weekly_revenue_growth", "rolling_7d_median_revenue",
    "trailing_7d_active_users", "equi_depth_histogram",
    "winsorized_value_stats",
    # sampling determinism
    "sample_deterministic_counts", "stratified_sample_by_lang",
    "weighted_reservoir_sample", "shuffle_positions",
    # skew constructions
    "skew_salted_revenue", "skew_salted_hot_revenue",
    # event-store kernels
    "es_get_events", "es_stream_next_offset", "es_high_watermark",
    "es_t7_backfill", "es_ordering_lag",
    # ANN / embeddings
    "ann_topk_bruteforce", "ann_blocked_topk",
    # hash-heavy text/dedup gates (non-shingle)
    "vocab_top_terms", "text_fingerprint", "dedup_exact", "dedup_simhash",
    # stats / profiling (the family that produced the ols ULP find)
    "ols_price_model", "regr_price_on_quantity", "corr_quantity_price",
    "mad_quantity", "quantity_percentiles", "approx_value_percentiles",
    "approx_distinct_users", "zscore_outlier_counts",
    "weighted_median_price", "value_histogram", "benford_price_digits",
    "gini_revenue_by_nation", "chi2_lang_source",
    "autocorr_daily_revenue", "source_decile_profile",
    "interevent_gap_histogram",
    # rollup family
    "rollup_order_stats", "dow_quarter_rollup", "grouping_sets_sales",
    "cube_lineitem_stats", "two_level_rollup_reuse", "value_band_rollup",
    "hourly_event_rollup", "sliding_window_rollup",
    # heavy hitters / layout
    "frequent_words_mg", "zorder_bucket_stats",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--doc-sample-mod",
        type=int,
        default=None,
        help="run on a deterministic documents subcorpus (doc_id %% N == 0 "
        "plus each replica's 25 planted-pair sources) materialized next to "
        "--sf; gives DuckDB a tractable shingle workload at sf10 while "
        "both engines read the same physical subset (VERDICT r10 #1). "
        "This is the general recipe for ORACLE-BOUND families above sf1: "
        "the engine scales but single-threaded DuckDB does not, so instead "
        "of dropping to a rows-only check, shrink the INPUT once and keep "
        "the full three-way compare. Precedent: the dedup family "
        "(minhash/jaccard/ppjoin/clusters) runs 4/4 at sf10 via "
        "--doc-sample-mod 20 (~125k docs); the same flag unlocks any "
        "documents-driven family (text_*, vocab, contamination), and the "
        "build_doc_subcorpus pattern (filter one table, symlink the rest) "
        "extends to lineitem/orders-bound families if a scale-wrongness "
        "hunt ever needs it (see BASELINE.md 'Subcorpus oracle recipe')",
    )
    ap.add_argument(
        "--scale-exposed",
        action="store_true",
        help="run the canonical sf10 scale-exposed subset (SCALE_EXPOSED, "
        f"{len(SCALE_EXPOSED)} queries) — the set where scale-dependent "
        "wrongness classes can appear and DuckDB still finishes at sf10; "
        "pair with --sf testdata_sf10",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    if args.scale_exposed:
        args.names = SCALE_EXPOSED + args.names

    if args.doc_sample_mod:
        args.sf = build_doc_subcorpus(args.sf, args.doc_sample_mod)
        print(f"subcorpus: {args.sf}")

    import duckdb

    import __spark_entry__ as entrymod
    from fstore_sql_spark import get_spark

    spark = get_spark(app_name="correctness-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.isdir(path):  # Spark-written dataset directory
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(queries)

    ok = fail = skipped = 0
    for name in names:
        fn = queries[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            srows = [tuple(r) for r in sdf.collect()]
            scols = [c.lower() for c in sdf.columns]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only): {len(srows)} rows  [{t_spark:.1f}s]")
            skipped += 1
            continue
        try:
            # Arrow fetch (r12, VERDICT r11 #2): the driver's path.  The
            # native fetchall() widens HUGEINT to Python int and hides the
            # exact type class that broke the r11 gate; Arrow surfaces it
            # as decimal128(38,0) -> Decimal, which canon() type-tags.
            tbl = con.execute(oracles[name]).arrow()
            dcols = [c.lower() for c in tbl.column_names]
            dtypes = [str(t) for t in tbl.schema.types]
            drows = [
                tuple(col[i] for col in cols_py)
                for cols_py in [[c.to_pylist() for c in tbl.columns]]
                for i in range(tbl.num_rows)
            ]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema: spark={sorted(scols)} duckdb={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount: spark={len(srows)} duckdb={len(drows)}")
        if not problems:
            s_order = [scols.index(c) for c in sorted(scols)]
            d_order = [dcols.index(c) for c in sorted(dcols)]
            sh = value_hash(srows, s_order)
            dh = value_hash(drows, d_order)
            if sh != dh:
                problems.append("value-hash mismatch")
                print(f"        duckdb arrow types: {dict(zip(dcols, dtypes))}")
                print(f"        spark schema:       {sdf.schema.simpleString()[:300]}")
                # show a few differing lines to debug
                sset = {
                    "\x1f".join(canon(r[i]) for i in s_order) for r in srows
                }
                dset = {
                    "\x1f".join(canon(r[i]) for i in d_order) for r in drows
                }
                for line in list(sset - dset)[:3]:
                    print(f"        spark-only: {line[:200]}")
                for line in list(dset - sset)[:3]:
                    print(f"        duck-only:  {line[:200]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            fail += 1
        else:
            print(f"OK    {name}: {len(srows)} rows  [{t_spark:.1f}s]")
            ok += 1

    print(f"\n{ok} ok, {fail} fail, {skipped} rows-only, of {len(names)}")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
