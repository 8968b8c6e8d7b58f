"""Physical-plan assertions — the scale posture of every headline operator,
pinned as tests (SURVEY.md §4: what the reference gets from Postgres indexes
and the planner, we must get from Catalyst — verifiably).

These tests inspect the plan, not the data, so they are fast and their
guarantees are scale-independent: a filter that reaches PushedFilters at
sf0.001 reaches it at 100 TB; a plan with one shuffle at sf0.001 has one
shuffle at 100 TB.
"""

from __future__ import annotations

import pytest

import fstore_sql_spark.operators  # noqa: F401  (registers operator queries)
from fstore_sql_spark.plans import inspect as P
from fstore_sql_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def q(spark, name):
    return QUERIES[name](spark, SF)


class TestPushdown:
    def test_point_lookup_pushes_filter_to_scan(self, spark):
        # A3 get_events: the decider_id equality must reach the parquet scan
        # (the analogue of the reference's decider_index, schema.sql:56).
        pushed = P.pushed_filters(q(spark, "es_get_events"))
        assert any("user_id" in f for f in pushed), pushed

    def test_point_lookup_prunes_columns(self, spark):
        # 5-column projection must not read the 6-column events table.
        cols = P.scan_columns(q(spark, "es_get_events"))
        assert cols and all("props" not in c for c in cols), cols

    def test_q6_all_predicates_pushed(self, spark):
        # Q6's conjunctive range predicates all reach the scan.
        pushed = P.pushed_filters(q(spark, "q6_forecast_revenue"))
        assert any("l_shipdate" in f for f in pushed), pushed
        assert any("l_discount" in f for f in pushed), pushed
        assert any("l_quantity" in f for f in pushed), pushed

    def test_q1_reads_only_needed_columns(self, spark):
        cols = P.scan_columns(q(spark, "q1_pricing_summary"))
        assert cols, "expected a file scan"
        for scan in cols:
            assert "l_orderkey" not in scan, scan  # not referenced by Q1


class TestJoinStrategy:
    def test_q3_broadcasts_dimension(self, spark):
        # customer (filtered dim) must broadcast; no sort-merge join.
        df = q(spark, "q3_top_orders")
        assert P.broadcast_join_count(df) >= 1
        assert P.sort_merge_join_count(df) == 0

    def test_q5_star_join_single_shuffle(self, spark):
        # All dims broadcast ⇒ the only shuffle is the final group-by.
        df = q(spark, "q5_nation_revenue")
        assert P.broadcast_join_count(df) >= 2
        assert P.shuffle_exchange_count(df) == 1

    def test_stream_next_offset_broadcasts_locks_side(self, spark):
        # A6 delivery kernel: the derived locks side is tiny vs events —
        # must be a broadcast join, never a shuffle of the events table
        # beyond its own aggregation.
        df = q(spark, "es_stream_next_offset")
        assert P.broadcast_join_count(df) >= 1
        assert P.shuffle_exchange_count(df) <= 2


class TestShuffleBudget:
    """Each operator's shuffle count is its dominant scale cost — pin it."""

    @pytest.mark.parametrize(
        ("name", "max_shuffles"),
        [
            # one partial→final agg exchange + the spread() parallelism
            # floor (r14, measured -25 %; vanishes on at-scale inputs —
            # TestSpreadFloor pins that the extra one IS the floor)
            ("q1_pricing_summary", 2),
            ("q6_forecast_revenue", 1),    # single-row agg
            ("user_sessions", 1),          # 3 windows + agg share one hash partitioning
            ("es_ingest_mapping", 1),      # lag window: one hash partitioning
            ("hourly_event_rollup", 1),
            ("es_high_watermark", 1),
            ("es_t7_backfill", 1),
        ],
    )
    def test_shuffle_budget(self, spark, name, max_shuffles):
        assert P.shuffle_exchange_count(q(spark, name)) <= max_shuffles


class TestSpreadFloor:
    """The r14 spread() sites add exactly ONE round-robin
    REPARTITION_BY_NUM exchange (the parallelism floor for single-row-
    group local files) and nothing else: no hash shuffle appears, and on
    inputs that already have >= defaultParallelism partitions spread() is
    a no-op by construction (queries.spread returns the frame unchanged),
    so the floor is not a scale cost."""

    @pytest.mark.parametrize(
        "name",
        [
            "q1_pricing_summary",
            "cube_lineitem_stats",
            "payload_schema_evolution_nested",
            "payload_schema_evolution_array",
            "payload_schema_evolution_map",
        ],
    )
    def test_spread_floor_is_single_round_robin(self, spark, name):
        # Encode the no-op CONTRACT, not the local fixture shape (ADVICE
        # r14): all five sites are starved_only spreads, which fire only
        # when the scan has <= 2 partitions AND fewer than the session's
        # defaultParallelism.  On a 1-core runner (or multi-file data)
        # spread is a no-op and the floor exchange must be ABSENT.
        from fstore_sql_spark.queries import load

        tbl = (
            "lineitem"
            if name in ("q1_pricing_summary", "cube_lineitem_stats")
            else "events"
        )
        parts = load(spark, SF, tbl).rdd.getNumPartitions()
        target = spark.sparkContext.defaultParallelism
        expected = 1 if (parts < target and parts <= 2) else 0
        df = q(spark, name)
        assert P.spread_exchange_count(df) == expected, P.simple_plan(df)

    def test_starved_only_gate(self, spark):
        """spread(df, starved_only=True) fires ONLY on the <=2-partition
        pathology (single-row-group local files): a 16-partition frame —
        the sf1 shape where the heavy-row exchange measured a loss — must
        pass through untouched, while the default mode still lifts it to
        full parallelism."""
        from fstore_sql_spark.queries import spread

        target = spark.sparkContext.defaultParallelism
        sixteen = spark.range(1000).repartition(16)
        assert spread(sixteen, starved_only=True) is sixteen
        if target > 16:
            assert spread(sixteen).rdd.getNumPartitions() == target
        one = spark.range(1000).coalesce(1)
        assert spread(one, starved_only=True).rdd.getNumPartitions() == target
        assert spread(one).rdd.getNumPartitions() == target

    def test_q1_pushdown_survives_spread(self, spark):
        # the shipdate predicate must still reach the parquet scan
        # through the repartition (guide §6: pushdown is load-bearing)
        pushed = P.pushed_filters(q(spark, "q1_pricing_summary"))
        assert any("l_shipdate" in f for f in pushed), pushed


class TestTopK:
    def test_get_last_event_is_top_k_not_global_sort(self, spark):
        # A4 (schema.sql:359-367): ORDER BY offset DESC LIMIT 1 must plan
        # as TakeOrderedAndProject — per-partition top-k, driver merge —
        # never a full sort of the stream.
        assert P.has_take_ordered(q(spark, "es_get_last_event"))

    def test_q3_limit_is_top_k(self, spark):
        assert P.has_take_ordered(q(spark, "q3_top_orders"))


class TestBatch3Plans:
    def test_q13_outer_join_single_shuffle_pair(self, spark):
        # outer join shuffles on custkey; second agg is tiny — ≤ 3 total
        df = q(spark, "q13_order_distribution")
        assert P.shuffle_exchange_count(df) <= 3

    def test_q15_reuses_revenue_aggregate(self, spark):
        # scalar-subquery decorrelation: revenue computed once, max broadcast
        df = q(spark, "q15_top_supplier")
        assert P.broadcast_join_count(df) >= 2
        assert P.sort_merge_join_count(df) == 0

    def test_q17_threshold_join_shuffles_on_partkey_only(self, spark):
        df = q(spark, "q17_small_quantity_revenue")
        # self-agg + join + final single-row agg: ≤ 3 exchanges
        assert P.shuffle_exchange_count(df) <= 3

    def test_pivot_is_single_aggregate(self, spark):
        df = q(spark, "pivot_daily_event_counts")
        assert P.shuffle_exchange_count(df) <= 1

    def test_window_family_single_sort(self, spark):
        # six analytic functions over ONE window spec: one exchange
        df = q(spark, "window_function_family")
        assert P.shuffle_exchange_count(df) <= 1

    def test_levenshtein_filter_not_pushed_but_block_join_broadcast(self, spark):
        df = q(spark, "dedup_levenshtein_pairs")
        # doc_id < 150 must reach both scans
        pushed = P.pushed_filters(df)
        assert any("doc_id" in f for f in pushed), pushed


class TestTpchFamilyPlans:
    def test_q7_broadcasts_both_nation_roles(self, spark):
        df = q(spark, "q7_volume_shipping")
        assert P.broadcast_join_count(df) >= 2
        assert P.sort_merge_join_count(df) == 0

    def test_q9_single_fact_shuffle(self, spark):
        df = q(spark, "q9_product_profit")
        # part + supplier⋈nation broadcast; lineitem⋈orders + final agg
        assert P.broadcast_join_count(df) >= 2
        assert P.shuffle_exchange_count(df) <= 2

    def test_q10_topk_and_pushdown(self, spark):
        df = q(spark, "q10_returned_items")
        assert P.has_take_ordered(df)
        assert any("l_returnflag" in f for f in P.pushed_filters(df))


class TestBatch4TpchPlans:
    """Q2/Q8/Q11/Q12/Q16/Q20/Q21/Q22 shapes — budgets measured at add time
    (sf0.001: q2=3/q8=1/q11=3/q12=1/q16=2/q20=3/q21=1/q22=2 exchanges)."""

    @pytest.mark.parametrize(
        ("name", "max_shuffles"),
        [
            ("q2_min_cost_supplier", 3),    # (part,supp) agg + per-part min + join-back
            ("q8_market_share", 2),         # fact join + year agg
            ("q11_important_parts", 3),     # per-part agg + global 1-row agg
            ("q12_priority_shipping", 2),   # fact⋈fact + year agg
            ("q16_supplier_variety", 2),    # distinct-expand + final agg
            ("q20_part_promotion", 3),      # (part,supp) agg + per-part total + semi
            ("q21_waiting_suppliers", 3),   # semi/anti on orderkey + name agg
            ("q22_dormant_customers", 2),   # 1-row threshold + anti + nation agg
        ],
    )
    def test_shuffle_budget(self, spark, name, max_shuffles):
        assert P.shuffle_exchange_count(q(spark, name)) <= max_shuffles

    def test_q2_broadcasts_region_chain_and_best(self, spark):
        # supplier→nation→region collapses to one broadcast dim; the
        # per-part min (≤ |part| rows) broadcasts back — never sort-merge.
        df = q(spark, "q2_min_cost_supplier")
        assert P.broadcast_join_count(df) >= 3
        assert P.sort_merge_join_count(df) == 0

    def test_q8_star_stays_broadcast(self, spark):
        df = q(spark, "q8_market_share")
        assert P.broadcast_join_count(df) >= 3
        assert P.sort_merge_join_count(df) == 0

    def test_q16_blacklist_is_broadcast_anti(self, spark):
        df = q(spark, "q16_supplier_variety")
        assert P.broadcast_join_count(df) >= 2

    def test_q22_threshold_broadcasts(self, spark):
        df = q(spark, "q22_dormant_customers")
        assert P.broadcast_join_count(df) >= 1
        assert P.sort_merge_join_count(df) == 0


class TestCorpusOperatorPlans:
    """Vocabulary / n-gram / contamination / shuffle operators — the
    training-data corpus surface (budgets measured at add time)."""

    @pytest.mark.parametrize(
        ("name", "max_shuffles"),
        [
            ("vocab_top_terms", 1),          # explode combines map-side, one agg
            ("bigram_counts", 1),
            ("stratified_sample_by_lang", 1),  # one per-stratum window
            ("term_doc_stats", 3),           # tf agg + distinct + df agg (broadcast join)
            ("benchmark_contamination", 3),  # bench distinct + semi + per-source agg
            ("shuffle_positions", 3),        # bucket window + offsets + broadcast join
        ],
    )
    def test_shuffle_budget(self, spark, name, max_shuffles):
        assert P.shuffle_exchange_count(q(spark, name)) <= max_shuffles

    def test_vocab_topk_never_global_sort(self, spark):
        assert P.has_take_ordered(q(spark, "vocab_top_terms"))
        assert P.has_take_ordered(q(spark, "bigram_counts"))

    def test_contamination_bench_side_broadcasts(self, spark):
        # the benchmark shingle set must broadcast — the train side is the
        # 100 TB scan and must not shuffle for the semi-join.
        assert P.broadcast_join_count(q(spark, "benchmark_contamination")) >= 1

    def test_shuffle_positions_offsets_broadcast(self, spark):
        # two-phase global rank: the 256-row offset table broadcasts.
        assert P.broadcast_join_count(q(spark, "shuffle_positions")) >= 1


class TestRepetitionPackingSessionPlans:
    """Batch-5 additions: repetition stats, sequence packing, native
    session windows, tf-idf (budgets measured at add time)."""

    @pytest.mark.parametrize(
        ("name", "max_shuffles"),
        [
            # pure narrow map: sort+fold the bigram array inside the
            # projection — the whole corpus scan stays embarrassingly
            # parallel, no exchange at any scale.
            ("doc_repetition_stats", 0),
            # two-phase cumsum: bucket window + offsets agg + offsets
            # single-partition window (bucket-count rows, tiny) + final
            # per-bin agg; the offsets side broadcasts into the corpus.
            ("packed_bin_stats", 4),
            # one hash partition on user_id feeding MergingSessionsExec.
            ("session_window_rollup", 1),
            # tf agg + df distinct (partial+final) + scalar doc count
            # (1-row) + per-source rank window; df broadcasts.
            ("tfidf_top_terms", 5),
        ],
    )
    def test_shuffle_budget(self, spark, name, max_shuffles):
        assert P.shuffle_exchange_count(q(spark, name)) <= max_shuffles

    def test_repetition_stats_is_scan_only(self, spark):
        # zero exchanges of ANY kind — scan, project, done.
        assert P.exchange_count(q(spark, "doc_repetition_stats")) == 0

    def test_session_window_uses_native_merging(self, spark):
        assert "MergingSessions" in P.simple_plan(q(spark, "session_window_rollup"))

    def test_packing_offsets_broadcast(self, spark):
        # the per-bucket offset table must broadcast against the corpus.
        assert P.broadcast_join_count(q(spark, "packed_bin_stats")) >= 1
        assert P.sort_merge_join_count(q(spark, "packed_bin_stats")) == 0


class TestListaggBandJoinPlans:
    def test_type_sequence_single_shuffle(self, spark):
        # collect_list + post-agg array_sort: one partial→final exchange;
        # the per-user sort never becomes a shuffle-wide ORDER BY.
        assert P.shuffle_exchange_count(q(spark, "user_type_sequence")) <= 1

    def test_band_join_broadcasts_interval_table(self, spark):
        # non-equi containment join: the 4-row band table broadcasts into
        # a BroadcastNestedLoopJoin — the fact side must never shuffle or
        # sort-merge for the range predicate.
        df = q(spark, "value_band_rollup")
        assert "BroadcastNestedLoopJoin" in P.simple_plan(df)
        assert P.sort_merge_join_count(df) == 0
        assert P.shuffle_exchange_count(df) <= 1  # final band agg only


class TestBehavioralAnalyticsPlans:
    @pytest.mark.parametrize(
        ("name", "max_shuffles"),
        [
            # lag window on user_id + (prev, next) count agg.
            ("event_transition_counts", 2),
            # cohort MIN agg + distinct-days agg share user_id
            # partitioning with the join; final (cohort, offset) agg.
            ("cohort_retention", 3),
            # one user_id agg + single-row final reduce.
            ("funnel_conversion", 2),
        ],
    )
    def test_shuffle_budget(self, spark, name, max_shuffles):
        assert P.shuffle_exchange_count(q(spark, name)) <= max_shuffles

    def test_funnel_has_no_self_join(self, spark):
        # the naive funnel is an N-way self-join; ours must stay join-free.
        plan = P.simple_plan(q(spark, "funnel_conversion"))
        assert "Join" not in plan

    def test_doc_chunking_is_scan_only(self, spark):
        # sliding-window chunking expands array-side: zero exchanges.
        assert P.exchange_count(q(spark, "doc_chunks_sliding")) == 0


class TestRuntimeBloomFilter:
    """Catalyst's runtime bloom-filter injection (the dynamic semi-join
    reduction a 100 TB star join needs): with a selective dimension filter
    and a shuffle join, the fact scan must gain a
    ``might_contain(bloom_filter_agg(...))`` pre-filter, cutting shuffle
    input to ~selectivity × |fact|.  Enabled by default
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``); the size
    thresholds are what gate it locally — at sf0.001 the fact side is far
    below the 10 GB application-side threshold, so this test lowers the
    threshold to simulate at-scale sizes.  The assertion is threshold-
    independent plan structure, valid at any data size."""

    def test_bloom_filter_injected_on_shuffle_join(self, spark):
        from pyspark.sql import functions as F

        broadcast_before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        thresh_key = (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        thresh_before = spark.conf.get(thresh_key)
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(thresh_key, "0")
            li = spark.read.parquet(f"{SF}/lineitem.parquet")
            part = spark.read.parquet(f"{SF}/part.parquet").filter(
                F.col("p_type").startswith("PROMO")
            )
            df = (
                li.join(part, li.l_partkey == part.p_partkey)
                .groupBy("p_type")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "bloom_filter_agg" in plan, plan[:2000]
            assert "might_contain" in plan, plan[:2000]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcast_before)
            spark.conf.set(thresh_key, thresh_before)


class TestStatsOperatorPlans:
    """Scale posture of the stats/profiling operators."""

    @pytest.mark.parametrize(
        ("name", "max_shuffles"),
        [
            ("corr_quantity_price", 1),      # one combinable co-moment agg
            ("regr_price_on_quantity", 1),
            ("embedding_norm_stats", 1),     # fold is zero-shuffle, one agg
            ("unpivot_event_metrics", 1),    # melt adds no exchange
            ("dow_quarter_rollup", 1),
            ("value_direction_changes", 1),  # window + agg share user_id
            ("time_weighted_value", 1),
            ("two_level_rollup_reuse", 2),   # hourly partials + daily reagg
            ("lang_entropy_by_source", 2),   # agg + tiny source window
            ("zscore_outlier_counts", 2),    # moments agg + count-back agg
            ("mad_quantity", 2),             # median agg + deviation agg
            ("peak_concurrency_daily", 3),   # day windows + carry + max agg
        ],
    )
    def test_shuffle_budget(self, spark, name, max_shuffles):
        assert P.shuffle_exchange_count(q(spark, name)) <= max_shuffles

    def test_weighted_reservoir_is_topk(self, spark):
        # A-ES top-k must plan as TakeOrderedAndProject, not a global sort.
        df = q(spark, "weighted_reservoir_sample")
        assert P.has_take_ordered(df)
        assert P.shuffle_exchange_count(df) == 0

    def test_zscore_broadcasts_stats_back(self, spark):
        # the tiny per-type moments join back via broadcast, never SMJ.
        df = q(spark, "zscore_outlier_counts")
        assert P.broadcast_join_count(df) >= 1
        assert P.sort_merge_join_count(df) == 0

    def test_vocab_overlap_no_sort_merge(self, spark):
        # intersections come from the word-level set aggregate, so no
        # token-stream self sort-merge-join survives in the plan.
        assert P.sort_merge_join_count(q(spark, "source_vocab_overlap")) == 0


class TestAnalyticsSurfacePlans:
    @pytest.mark.parametrize(
        ("name", "max_shuffles"),
        [
            ("grouping_sets_sales", 1),       # expand + one aggregate
            ("locf_value_fill", 1),           # per-user running window
            ("revenue_share_by_nation", 2),   # agg + 25-row window
            # distinct + band join + distinct-agg (activity set, not raw log)
            ("trailing_7d_active_users", 4),
        ],
    )
    def test_shuffle_budget(self, spark, name, max_shuffles):
        assert P.shuffle_exchange_count(q(spark, name)) <= max_shuffles

    def test_trailing_dau_broadcasts_day_spine(self, spark):
        df = q(spark, "trailing_7d_active_users")
        assert P.broadcast_join_count(df) >= 1
        assert P.sort_merge_join_count(df) == 0


class TestAggregatePushdown:
    """Parquet footer-statistics aggregation (metadata-only COUNT/MIN/MAX):
    with the DataSource V2 parquet reader, a bare aggregate compiles to a
    PushedAggregation scan that reads row-group footers, not data pages —
    at 100 TB a table-level MIN/MAX/COUNT costs one footer read per file.
    The engine keeps V1 as the session default (bucketed-table reads and
    the streaming file sink are V1 paths); analytics jobs that want
    metadata-only aggregates opt in per-query, exactly as pinned here."""

    def test_min_max_count_served_from_footers(self, spark):
        from pyspark.sql import functions as F

        key = "spark.sql.sources.useV1SourceList"
        before = spark.conf.get(key)
        try:
            spark.conf.set(key, "")
            spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
            df = spark.read.parquet(f"{SF}/orders.parquet").agg(
                F.count(F.lit(1)).alias("n"),
                F.min("o_orderdate").alias("lo"),
                F.max("o_orderdate").alias("hi"),
            )
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "PushedAggregation" in plan, plan[:1500]
        finally:
            spark.conf.set(key, before)
            spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")


class TestIntegrityOperatorPlans:
    @pytest.mark.parametrize(
        ("name", "max_shuffles"),
        [
            ("events_content_checksum", 1),        # pure map + tiny reduce
            ("user_recent_types_digest", 1),       # one collect_list agg
            ("user_ewma_value", 1),                # one grouped-map shuffle
            ("order_lineitem_reconciliation", 2),  # per-order agg + join agg
            ("event_type_drift_tvd", 2),           # contingency agg + window
            ("lang_source_mutual_info", 2),
            ("profile_documents_columns", 2),      # count_distinct expand
        ],
    )
    def test_shuffle_budget(self, spark, name, max_shuffles):
        assert P.shuffle_exchange_count(q(spark, name)) <= max_shuffles

    def test_reconciliation_no_sort_merge(self, spark):
        assert P.sort_merge_join_count(q(spark, "order_lineitem_reconciliation")) == 0


class TestCurationAnalyticsPlans:
    """Scale posture of the skew/robust-stats/dedup-policy/ANN-eval batch."""

    @pytest.mark.parametrize(
        ("name", "max_shuffles"),
        [
            ("approx_value_percentiles", 1),   # mergeable sketch, one agg
            ("winsorized_value_stats", 2),     # percentiles + clipped agg
            ("rolling_7d_median_revenue", 2),  # daily agg + band-join agg
            ("dup_group_size_histogram", 2),   # digest agg + size agg
            ("interevent_gap_histogram", 2),   # per-user window + rollup
            ("user_event_flags", 2),           # count_distinct expansion
            ("ann_blocked_recall", 2),         # two windowed rankings
            ("join_key_skew_report", 3),       # key agg + rollup + top-k
        ],
    )
    def test_shuffle_budget(self, spark, name, max_shuffles):
        assert P.shuffle_exchange_count(q(spark, name)) <= max_shuffles

    def test_skew_hot_flagship_decides_vanilla_on_uniform(self, spark):
        """skew_salted_hot_revenue (r10, VERDICT r9 #2): the profile
        step now emits a hotness VERDICT (estimated rows-per-key > one
        shuffle task's budget) instead of always salting.  TPC-H
        ``l_orderkey`` is near-uniform (≤7 lineitems/order), so on the
        fixture the verdict is "no skew" and the flagship must take the
        SINGLE vanilla join: no Generate (no salt replication), no
        two-branch union, exactly one shuffle (the final group-by —
        the join broadcasts at fixture scale)."""
        df = q(spark, "skew_salted_hot_revenue")
        plan = P.simple_plan(df)
        assert P._count_nodes(df, "Generate") == 0, plan
        assert "Union" not in plan, plan
        assert P.shuffle_exchange_count(df) == 1, plan

    def test_skew_hot_construction_replicates_only_hot_side(self, spark):
        """The targeted construction itself (hot keys forced, the plan
        the flagship takes when the verdict IS hot — r9's pin, kept on
        an explicit hot list): the explode (salt replication) must sit
        above a hot-key-FILTERED build side — never the full table (the
        full-salt construction's n x |right| replication wrote ~50 GB of
        shuffle at sf100) — with the hot-key IN list pushed to every
        scan, and the whole query needs exactly ONE shuffle (the final
        group-by; both branch joins broadcast at fixture scale)."""
        from pyspark.sql import functions as F

        from fstore_sql_spark.operators import skew as S
        from fstore_sql_spark.queries import load

        l = load(spark, SF, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        o = load(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
        hot = [r["o_orderkey"] for r in S.profile_frame(l, "o_orderkey").collect()]
        df = (
            S.salted_join_hot(l, o, on="o_orderkey", hot_keys=hot, n=8)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"))
        )
        plan = P.simple_plan(df)
        assert P._count_nodes(df, "Generate") == 1, plan
        assert P.shuffle_exchange_count(df) == 1, plan
        # the hot-key membership filter reaches the parquet scans
        assert "INSET" in plan or "In(o_orderkey" in plan, plan

    def test_skew_profile_step_plan(self, spark):
        """The profile step (r10, VERDICT r9 #6 — the flagship's one
        previously unpinned stage): sampled scan → partial agg → ONE
        exchange → TakeOrderedAndProject(16).  The sample must be
        scan-side (only 2% of (key, count) pairs shuffle) and the top-k
        must never global-sort."""
        from fstore_sql_spark.operators import skew as S
        from fstore_sql_spark.queries import load

        l = load(spark, SF, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        df = S.profile_frame(l, "o_orderkey")
        plan = P.simple_plan(df)
        assert "Sample" in plan, plan
        assert P.shuffle_exchange_count(df) == 1, plan
        assert P.has_take_ordered(df), plan

    def test_skew_report_is_topk(self, spark):
        # the report ends in a top-10: TakeOrderedAndProject, no global sort.
        assert P.has_take_ordered(q(spark, "join_key_skew_report"))

    def test_winsorize_broadcasts_percentiles_back(self, spark):
        # 5-row per-type percentile table must broadcast, never SMJ.
        df = q(spark, "winsorized_value_stats")
        assert P.broadcast_join_count(df) >= 1
        assert P.sort_merge_join_count(df) == 0

    def test_rolling_median_band_join_broadcasts(self, spark):
        # the daily spine self-join is broadcast-nested-loop, never a
        # cartesian of fact rows.
        df = q(spark, "rolling_7d_median_revenue")
        assert P.broadcast_join_count(df) >= 1
        assert P.sort_merge_join_count(df) == 0

    def test_ann_recall_no_sort_merge(self, spark):
        # aliased self-lineage join stays broadcast (30-row sides).
        assert P.sort_merge_join_count(q(spark, "ann_blocked_recall")) == 0

    def test_prefix_filter_no_sort_merge(self, spark):
        # every verify-side join on the bounded candidate set broadcasts.
        df = q(spark, "dedup_prefix_filter_pairs")
        assert P.sort_merge_join_count(df) == 0
        assert P.shuffle_exchange_count(df) <= 14


class TestLayoutTemporalGraphPlans:
    @pytest.mark.parametrize(
        ("name", "max_shuffles"),
        [
            ("zorder_bucket_stats", 1),      # interleave is scan-side math
            ("running_distinct_types", 1),   # both windows share user_id
            ("ols_price_model", 1),          # one co-moment aggregate
            ("scd2_state_at_cutoff", 2),     # user window + tiny rollup
            ("weekly_revenue_growth", 2),    # weekly agg + spine window
        ],
    )
    def test_shuffle_budget(self, spark, name, max_shuffles):
        assert P.shuffle_exchange_count(q(spark, name)) <= max_shuffles

    def test_triangle_joins_broadcast(self, spark):
        # the oriented edge list is top-k bounded: all joins broadcast.
        assert P.sort_merge_join_count(q(spark, "triangle_count")) == 0


class TestR4CurationOps:
    """r4 statistical-curation operators: the LM/dedup/DSIR models are
    vocabulary-bounded and must BROADCAST into their corpus-sized
    scoring joins — a sort-merge join here would shuffle the whole
    corpus per model application."""

    def test_bigram_lm_model_joins_broadcast(self, spark):
        df = q(spark, "bigram_lm_source_scores")
        assert P.broadcast_join_count(df) >= 2  # counts + firsts
        assert P.sort_merge_join_count(df) == 0

    def test_dsir_weight_join_broadcasts(self, spark):
        df = q(spark, "dsir_importance_weights")
        assert P.broadcast_join_count(df) >= 1
        assert P.sort_merge_join_count(df) == 0

    def test_repeated_ngram_gram_keyed_equi_join(self, spark):
        # gram-keyed equi join only; no pairwise/cartesian anywhere
        df = q(spark, "repeated_ngram_stats")
        assert P.sort_merge_join_count(df) + P.broadcast_join_count(df) >= 1


class TestR4RetrievalAndScrubOps:
    """r4 additions: BM25 retrieval, PII scrub, Gopher rules."""

    def test_bm25_is_takeordered_with_broadcast_stats(self, spark):
        df = q(spark, "bm25_topk")
        # top-k must be heap-based, never a global sort
        assert P.has_take_ordered(df)
        # df + corpus stats are vocabulary/1-row sized: broadcast both
        assert P.broadcast_join_count(df) >= 2

    def test_pii_redaction_is_single_shuffle_hash_agg(self, spark):
        df = q(spark, "pii_redaction_stats")
        # regex scrub is scan-side map work; the only exchange is the
        # 20-group aggregate.  The md5 checksum is folded to a BIGINT so
        # the aggregate buffer stays fixed-width → HashAggregate with
        # map-side partials, never the string-buffer SortAggregate.
        # (No codegen-span assertion: regexp_extract_all is a
        # CodegenFallback expression in Spark 4.)
        assert P.shuffle_exchange_count(df) == 1
        plan = P.formatted_plan(df)
        assert "HashAggregate" in plan and "SortAggregate" not in plan

    def test_gopher_rules_single_shuffle(self, spark):
        df = q(spark, "gopher_quality_rules")
        assert P.shuffle_exchange_count(df) == 1

    def test_embedding_contamination_broadcasts_benchmark(self, spark):
        # the benchmark side is small by definition: must broadcast, and
        # the corpus must never hit a sort-merge or shuffled cartesian
        df = q(spark, "embedding_contamination")
        assert P.broadcast_join_count(df) >= 1
        assert P.sort_merge_join_count(df) == 0


class TestR5TypedPayload:
    def test_payload_upcast_is_zero_shuffle_codegen_projection(self, spark):
        """payload_schema_upcast: version-dispatched from_json + CASE must
        stay a pure scan+project — zero exchanges, one codegen span (the
        100 TB posture: a typed view costs the same as any projection)."""
        df = q(spark, "payload_schema_upcast")
        assert P.shuffle_exchange_count(df) == 0, P.simple_plan(df)
        assert P.codegen_span_count(df) >= 1
        # column pruning: only the columns the projection needs are read
        cols = P.scan_columns(df)
        assert cols and all("value" not in c for c in cols), cols

    def test_payload_evolution_is_zero_shuffle_codegen_projection(self, spark):
        """payload_schema_evolution (r6): the rename-walk + widen chain
        adds CASE arms, not plan structure — still a pure scan+project
        with zero exchanges (renames are resolved at expression-build
        time, never at runtime)."""
        df = q(spark, "payload_schema_evolution")
        assert P.shuffle_exchange_count(df) == 0, P.simple_plan(df)
        assert P.codegen_span_count(df) >= 1

    def test_nested_evolution_is_zero_shuffle_codegen_projection(self, spark):
        """payload_schema_evolution_nested (r7): dotted-path renames and
        nested widening recurse at expression-BUILD time into struct
        rebuilds — runtime plan structure is unchanged: a pure
        scan+project, zero data shuffles (the only exchange permitted is
        the spread() parallelism floor, r14 — absent on at-scale inputs)."""
        df = q(spark, "payload_schema_evolution_nested")
        assert P.data_shuffle_count(df) == 0, P.simple_plan(df)
        # AQE (entered via the spread floor exchange) hides codegen ids in
        # the static explain; pin the structure instead — nothing but
        # scan, the floor exchange, and pure projections.
        names = {n.split(" [")[0] for n in P.plan_node_names(df)}
        assert names <= {"Scan parquet", "Exchange", "Project",
                        "AdaptiveSparkPlan"}, names

    def test_array_evolution_is_zero_shuffle_codegen_projection(self, spark):
        """payload_schema_evolution_array (r8): the F.transform
        elementwise rebuild of array-of-struct payloads is still pure
        expression work — renames re-root at the element at
        expression-BUILD time, so the runtime plan stays a scan+project
        with zero exchanges."""
        df = q(spark, "payload_schema_evolution_array")
        assert P.data_shuffle_count(df) == 0, P.simple_plan(df)
        # AQE (entered via the spread floor exchange) hides codegen ids in
        # the static explain; pin the structure instead — nothing but
        # scan, the floor exchange, and pure projections.
        names = {n.split(" [")[0] for n in P.plan_node_names(df)}
        assert names <= {"Scan parquet", "Exchange", "Project",
                        "AdaptiveSparkPlan"}, names

    def test_map_evolution_is_zero_shuffle_codegen_projection(self, spark):
        """payload_schema_evolution_map (r9): the F.transform_values
        value-struct rebuild of map payloads is still pure expression
        work — renames re-root at the value struct at expression-BUILD
        time, so the runtime plan stays a scan+project with zero
        exchanges."""
        df = q(spark, "payload_schema_evolution_map")
        assert P.data_shuffle_count(df) == 0, P.simple_plan(df)
        # AQE (entered via the spread floor exchange) hides codegen ids in
        # the static explain; pin the structure instead — nothing but
        # scan, the floor exchange, and pure projections.
        names = {n.split(" [")[0] for n in P.plan_node_names(df)}
        assert names <= {"Scan parquet", "Exchange", "Project",
                        "AdaptiveSparkPlan"}, names
