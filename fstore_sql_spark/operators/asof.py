"""As-of join — "most recent right-side fact at or before each left row".

The reference engine replays a stream *as of* one cutoff
(/root/reference/schema.sql:348-356 ``get_events`` + SURVEY.md §2.2
point-in-time lookup); the general operator behind that — every LEFT row
matched to the latest RIGHT row with ``right.ts <= left.ts`` per key — is
what time-series engines ship as ASOF JOIN.  Spark has no native ASOF
join, and the naive formulations do not scale:

  * band join (``l.ts >= r.ts``) + rank-1 filter → O(n·m) pairs per key
    before the filter — explodes on hot keys;
  * correlated scalar subquery → decorrelates into the same band join.

The scale-path implementation here is the **merge-sorted union + LOCF**
form: tag both inputs, union them (no join at all), and carry the last
right-side payload forward with one ``last(..., ignorenulls=True)``
window per key.  Cost is ONE hash shuffle of (|L| + |R|) rows on the key
plus a per-key sort — the same price as a co-partitioned join, with zero
pair blow-up, and AQE-splittable because a key's window never crosses
partitions.  Ties (equal ts) sort right-before-left so an equal-time
fact is visible, and right rows tie-break by ``right_order`` so the
winner is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fstore_sql_spark.queries import load, query  # noqa: F401


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str = "ts",
    right_ts: str | None = None,
    right_order: str | None = None,
    carry: list[str] | None = None,
    prefix: str = "asof_",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of join: for every LEFT row, attach ``carry`` columns
    from the latest RIGHT row with ``right.ts <= left.ts`` on the same
    ``on`` key (NULLs when no prior right row exists).

    ``right_order`` breaks ties among right rows sharing a timestamp
    (highest wins); ``tolerance_s`` nulls matches older than the given
    number of seconds (pandas ``merge_asof(tolerance=...)`` semantics).
    Carried columns come back as ``{prefix}{col}`` plus ``{prefix}ts``.
    """
    right_ts = right_ts or ts
    carry = carry or [c for c in right.columns if c not in (*on, right_ts)]
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in carry]
    )
    # Tiebreaker keeps its NATIVE type: Window.orderBy sorts any orderable
    # column, and casting (say) string UUIDs or >2^53 int64 ids to double
    # would null/collide them and make the "highest wins" promise
    # nondeterministic.  Left rows carry a NULL of the same type (their
    # __ord is never compared against right rows — __is_right DESC sorts
    # all equal-ts rights first).
    if right_order:
        ord_type = right.schema[right_order].dataType
        r_ord = F.col(right_order)
        l_ord = F.lit(None).cast(ord_type)
    else:
        r_ord = F.lit(0)
        l_ord = F.lit(0)
    r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        r_ord.alias("__ord"),
        payload.alias("__p"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        *on,
        F.col(ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        l_ord.alias("__ord"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__is_right").desc(), F.col("__ord"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        l.unionByName(r)
        .withColumn("__last", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__is_right") == 0)
    )
    if tolerance_s is not None:
        in_tol = (
            F.col("__t").cast("long") - F.col("__last.__ts").cast("long")
        ) <= F.lit(int(tolerance_s))
        carried = carried.withColumn(
            "__last", F.when(in_tol, F.col("__last"))
        )
    out = carried.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__last.__ts").alias(f"{prefix}ts"),
        *[F.col(f"__last.{c}").alias(f"{prefix}{c}") for c in carry],
    )
    return out


@query(
    "asof_click_purchase",
    """
    WITH tagged AS (
        SELECT user_id, ts, event_id, 1 AS is_right FROM events
        WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, event_id, 0 AS is_right FROM events
        WHERE event_type = 'click'
    ),
    carried AS (
        SELECT user_id, ts, event_id, is_right,
               LAST_VALUE(CASE WHEN is_right = 1 THEN event_id END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, is_right DESC, event_id
                   ROWS UNBOUNDED PRECEDING) AS purchase_id,
               LAST_VALUE(CASE WHEN is_right = 1 THEN ts END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, is_right DESC, event_id
                   ROWS UNBOUNDED PRECEDING) AS purchase_ts
        FROM tagged
    )
    SELECT event_id AS click_id, user_id, ts AS click_ts,
           purchase_id, purchase_ts,
           CAST(FLOOR(EPOCH(ts)) - FLOOR(EPOCH(purchase_ts)) AS BIGINT)
               AS lag_s
    FROM carried
    WHERE is_right = 0
    """,
)
def asof_click_purchase(spark, sf_dir):
    """Attribution as-of join: every click matched to the same user's most
    recent purchase at or before it (NULL when none yet).  Exercises the
    general ``asof_join`` operator — one shuffle on ``user_id``, no band
    join, no pair explosion; the oracle is the engine-neutral
    merge-sorted-union + IGNORE-NULLS-LOCF formulation of the same
    semantics.  ``lag_s`` floors both epochs, matching Spark's
    timestamp→long cast."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        ts="click_ts",
        right_ts="ts",
        right_order="purchase_id",
        carry=["purchase_id"],
        prefix="p_",
    )
    # right side enters the union under the LEFT ts column name
    return joined.select(
        "click_id", "user_id", "click_ts",
        F.col("p_purchase_id").alias("purchase_id"),
        F.col("p_ts").alias("purchase_ts"),
        (F.col("click_ts").cast("long") - F.col("p_ts").cast("long")).alias("lag_s"),
    )


@query(
    "asof_click_purchase_tol",
    """
    WITH tagged AS (
        SELECT user_id, ts, event_id, 1 AS is_right FROM events
        WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, event_id, 0 AS is_right FROM events
        WHERE event_type = 'click'
    ),
    carried AS (
        SELECT user_id, ts, event_id, is_right,
               LAST_VALUE(CASE WHEN is_right = 1 THEN event_id END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, is_right DESC, event_id
                   ROWS UNBOUNDED PRECEDING) AS purchase_id,
               LAST_VALUE(CASE WHEN is_right = 1 THEN ts END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, is_right DESC, event_id
                   ROWS UNBOUNDED PRECEDING) AS purchase_ts
        FROM tagged
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_clicks,
           CAST(COUNT(CASE WHEN FLOOR(EPOCH(ts)) - FLOOR(EPOCH(purchase_ts))
                                <= 86400 THEN purchase_id END) AS BIGINT)
               AS n_attributed_1d,
           CAST(MAX(CASE WHEN FLOOR(EPOCH(ts)) - FLOOR(EPOCH(purchase_ts))
                              <= 86400
                         THEN FLOOR(EPOCH(ts)) - FLOOR(EPOCH(purchase_ts))
                    END) AS BIGINT) AS max_lag_s
    FROM carried
    WHERE is_right = 0
    """,
)
def asof_click_purchase_tol(spark, sf_dir):
    """Tolerance-bounded variant (pandas ``merge_asof(tolerance=1d)``):
    clicks attributed only when the prior purchase is within 24h.  Runs
    the SAME single-shuffle operator with ``tolerance_s`` and reduces to
    attribution coverage counts."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        ts="click_ts",
        right_ts="ts",
        right_order="purchase_id",
        carry=["purchase_id"],
        prefix="p_",
        tolerance_s=86400,
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("p_purchase_id").alias("n_attributed_1d"),
        F.max(
            F.col("click_ts").cast("long") - F.col("p_ts").cast("long")
        ).alias("max_lag_s"),
    )
