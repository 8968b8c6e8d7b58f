"""Bucketed co-located join — the SURVEY.md §1.4 layout claim, proven.

Writing both join sides bucketed by the join key (same bucket count)
lets Spark plan the join with ZERO Exchange operators: each task reads
bucket i of both tables.  This is the layout that makes the reference's
`decider_id`-keyed access patterns shuffle-free at 100 TB.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fstore_sql_spark.plans import inspect as P
from fstore_sql_spark.queries import load


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # managed tables land in the session's warehouse dir; DROP TABLE below
    # removes the data (warehouse.dir is a static conf — can't be set here)
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bkt_orders")
    )
    (
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bkt_lineitem")
    )
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    joined = (
        spark.table(t_lineitem)
        .join(spark.table(t_orders).hint("merge"), "o_orderkey")
        .select("o_orderkey", "l_extendedprice", "o_orderpriority")
    )
    # co-located: the sort-merge join consumes bucket files directly
    assert P.shuffle_exchange_count(joined) == 0, P.formatted_plan(joined)
    assert P.sort_merge_join_count(joined) == 1


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_tables):
    _, t_lineitem = bucketed_tables
    agg = (
        spark.table(t_lineitem)
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert P.shuffle_exchange_count(agg) == 0, P.formatted_plan(agg)


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    bucketed_n = (
        spark.table(t_lineitem).join(spark.table(t_orders), "o_orderkey").count()
    )
    plain_n = (
        load(spark, sf_dir, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(load(spark, sf_dir, "orders"), "o_orderkey")
        .count()
    )
    assert bucketed_n == plain_n
