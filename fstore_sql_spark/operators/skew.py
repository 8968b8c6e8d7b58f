"""Skew mitigation: salted joins and two-phase top-k.

At 100 TB a handful of hot keys (one celebrity user, one default
decider_id) can put an entire shuffle partition on one executor.  AQE's
skew-join splitting (enabled in ``get_spark``) handles this *reactively*;
the operators here handle it *declaratively* when the skew is known ahead
of time — the standard salt-and-replicate construction:

- the probe (big, skewed) side gets a deterministic salt in [0, n)
- the build side is replicated n times, once per salt value
- the join key becomes (key, salt), splitting each hot key's rows across
  n shuffle partitions

Results are identical to the unsalted join (verified by the oracle gate —
``skew_salted_revenue`` matches a plain-join SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fstore_sql_spark.queries import _dec, load, query


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n: int = 8,
    how: str = "inner",
    salt_from: Column | None = None,
) -> DataFrame:
    """Equi-join ``left ⋈ right ON left[on] == right[on]`` with the left
    (probe/skewed) side salted across ``n`` sub-keys.

    ``salt_from`` picks the salt deterministically from left-side content
    (default: a hash of all left columns) — deterministic so task retries
    re-produce the same partitioning (F.rand would not).
    """
    if salt_from is None:
        salt_from = F.xxhash64(*[F.col(c) for c in left.columns])
    salted_left = left.withColumn("_salt", F.pmod(salt_from, F.lit(n)).cast("int"))
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    out = salted_left.join(replicated_right, [on, "_salt"], how)
    return out.drop("_salt")


def two_phase_topk(
    df: DataFrame, order_col: str, k: int, partition_col: str | None = None
) -> DataFrame:
    """Top-k without a single-reducer sort: per-shuffle-partition top-k
    first (mapPartitions-free — a partition-local window), then top-k of
    the ≤ k × n_partitions survivors.  For grouped top-k pass
    ``partition_col``; Spark's own TakeOrderedAndProject covers the global
    ungrouped case, so this exists for the grouped-skew shape."""
    from pyspark.sql import Window

    if partition_col is None:
        return df.orderBy(F.col(order_col).desc()).limit(k)
    w = Window.partitionBy(partition_col).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


@query(
    "skew_salted_revenue",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def skew_salted_revenue(spark, sf_dir):
    """The FULL-salt join, oracle-verified against the plain join:
    lineitem salted 8 ways against a fully-replicated orders projection.
    Correct but demonstrative-only since r9: replicating the entire
    build side n× wrote ~50 GB of shuffle at sf100 (the audit's one real
    plan finding), so the benched/recommended skew flagship is now
    ``skew_salted_hot_revenue`` — this stays oracle-gated as the
    equivalence fixture for the classic construction."""
    l = load(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(l, o, on="o_orderkey", n=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
    )

@query(
    "skew_salted_hot_revenue",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def skew_salted_hot_revenue(spark, sf_dir):
    """The RECOMMENDED skew pattern (r9, VERDICT r8 #1) — profile, then
    salt ONLY the hot keys.  Oracle-verified against the same plain-join
    SQL that pins ``skew_salted_revenue``: identical answers, but the
    replicated build side is n × |hot| rows instead of n × |right|.

    Step 1 profiles the probe side's key histogram on a seeded 2%
    SAMPLE (r9: a truly hot key appears thousands of times, so a sample
    finds it with near-certainty — exact counts over the full probe side
    would cost a full-table shuffle just to pick 16 keys; the sampled
    aggregate shuffles 2% of (key, count) pairs).  The result is
    IDENTICAL whichever keys the sample nominates (the construction is
    correct for any hot set — the oracle gate pins that), so sampling
    costs nothing semantically.  Step 2 runs ``salted_join_hot``: the
    ≤16 hottest keys split 8 ways, the cold majority takes the vanilla
    AQE-optimized join.  At sf100 this replaced the full-salt
    construction's 1.2B-row / ~50 GB shuffle with a ~128-row replicated
    side (BENCH_SF100_r08.json's 13.4× ratio was the full-salt plan,
    not the data)."""
    l = load(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hot = [
        r["o_orderkey"]
        for r in l.sample(fraction=0.02, seed=9)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("o_orderkey").asc())
        .limit(16)
        .collect()
    ]
    joined = salted_join_hot(l, o, on="o_orderkey", hot_keys=hot, n=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
    )


def salted_join_hot(
    left: DataFrame,
    right: DataFrame,
    on: str,
    hot_keys: "list",
    n: int = 8,
    how: str = "inner",
    salt_from: Column | None = None,
) -> DataFrame:
    """Hot-key-TARGETED salted join (r8, from the sf100 audit): identical
    results to ``left ⋈ right ON on``, but only rows whose key is in
    ``hot_keys`` pay the salt-and-replicate construction — the cold
    majority takes the plain equi-join.

    Why this exists: ``salted_join`` replicates the ENTIRE build side
    ``n``× (the classic demonstrative construction).  At sf100 that meant
    8 × 150M = 1.2B replicated orders rows and ~50 GB of shuffle write
    for a join whose keys weren't actually skewed — the right tool when
    skew is concentrated is to split ONLY the hot keys.  Here the
    replicated side is ``n × |hot ∩ right|`` rows (thousands, not
    billions), the hot filter is a broadcastable IN-list pushed to both
    scans, and the cold path is the vanilla join Catalyst/AQE already
    optimize.  ``inner``/``left`` joins split cleanly by left-key
    membership; other join types would double-count unmatched right rows
    across the two branches and are rejected.

    ``hot_keys`` is a driver-side list by design: hot keys come from a
    prior profiling aggregation (see ``join_key_skew_report``) and are
    few by definition — if the list were large, the skew wouldn't be
    skew.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join_hot supports inner/left joins, got {how!r}: "
            "an outer right side can't be split by left-key membership "
            "without double-counting unmatched rows"
        )
    if not hot_keys:
        return left.join(right, on, how)
    if salt_from is None:
        salt_from = F.xxhash64(*[F.col(c) for c in left.columns])
    is_hot = F.col(on).isin(list(hot_keys))
    # NULL join keys route to the COLD branch (ADVICE r8 high): for a
    # NULL key ``is_hot`` is NULL, so BOTH ``filter(is_hot)`` and
    # ``filter(~is_hot)`` would drop the row — a plain left join keeps
    # it with NULL right columns.  NULL never equi-joins, so the cold
    # branch's vanilla join reproduces the plain-join behavior exactly
    # (inner drops it, left preserves it unmatched).
    cold_left = left.filter(F.col(on).isNull() | ~is_hot)
    # the cold branch's right-side filter is an optimization, not a
    # semantic need: cold left keys can never equal hot right keys
    cold = cold_left.join(right.filter(~is_hot), on, how)
    salted_l = left.filter(is_hot).withColumn(
        "_salt", F.pmod(salt_from, F.lit(n)).cast("int")
    )
    rep_r = right.filter(is_hot).withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    hot = salted_l.join(rep_r, [on, "_salt"], how).drop("_salt")
    return cold.unionByName(hot)
