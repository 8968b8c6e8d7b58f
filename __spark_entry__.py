"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``fstore_sql_spark.queries`` (analytics + event-store
operator surface) and ``fstore_sql_spark.operators`` (dedup / similarity /
text-analysis pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q1-shaped
    pricing summary (scan → codegen hash aggregate)."""
    from fstore_sql_spark.queries import QUERIES

    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# Registry prefix: one-or-two high-value operators from EVERY family
# (event store, TPC-H, windows, as-of, dedup, graph, multimodal, sampling,
# ANN, skew, stats, text), so any sampled prefix of the gate exercises the
# full operator surface, not just the first-registered family.
PRIORITY = [
    "es_get_events", "es_stream_next_offset", "es_high_watermark",
    "es_t7_backfill", "es_ingest_mapping", "es_ordering_lag",
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "q13_order_distribution",
    "user_sessions", "window_function_family", "sliding_window_rollup",
    "session_window_rollup",
    "hourly_event_rollup", "cohort_retention", "funnel_conversion",
    "asof_last_event_before", "asof_click_purchase_tol",
    "dedup_exact", "dedup_minhash_lsh_pairs", "dedup_jaccard_verified",
    "dedup_simhash", "dedup_clusters", "dedup_prefix_filter_pairs",
    "pagerank_top_words", "triangle_count",
    "multimodal_features", "multimodal_frame_grid",
    "sample_deterministic_counts", "stratified_sample_by_lang",
    "shuffle_positions", "packed_bin_stats", "weighted_reservoir_sample",
    "ann_topk_bruteforce", "ann_blocked_topk", "embedding_neardup_pairs",
    "ann_blocked_recall",
    "skew_salted_revenue",
    "equi_depth_histogram", "mad_quantity", "ols_price_model",
    "scd2_state_at_cutoff", "dq_assertion_suite", "winsorized_value_stats",
    "text_quality_by_source", "text_fingerprint", "text_bpe_token_counts",
    "vocab_top_terms", "benchmark_contamination",
]


def _ordered(full: dict) -> dict:
    head = {n: full[n] for n in PRIORITY if n in full}
    return {**head, **{n: v for n, v in full.items() if n not in head}}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import fstore_sql_spark.operators  # noqa: F401  (registers operator queries)
    from fstore_sql_spark.queries import QUERIES

    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    import fstore_sql_spark.operators  # noqa: F401
    from fstore_sql_spark.queries import ORACLES

    return _ordered(dict(ORACLES))
