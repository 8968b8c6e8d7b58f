"""Grouped-map (``applyInPandas``) custom aggregation — the (b)-tier of
SURVEY.md's custom-operator ladder: used only where the per-group logic is
genuinely imperative; here it is deliberately paired with an exact SQL
oracle so the Arrow grouped-map path itself is correctness-gated.

Scale posture: ``applyInPandas`` shuffles once on the group key and streams
each group through Arrow; output is one narrow row per group.  Skewed keys
are the hazard (one giant group = one task) — for the event log the group
key is ``user_id``/``decider_id``, the same partition axis as the store.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fstore_sql_spark.queries import load, query

GAP_SCHEMA = "user_id long, max_gap_s long, n_gaps long"


def longest_gap(events: DataFrame) -> DataFrame:
    """Per-user longest inactivity gap between consecutive events.

    The per-group sort + diff is the imperative kernel; everything before
    it (filter, projection) stays declarative so pushdown still applies.
    Emits nothing for single-event users, matching the SQL LAG form.
    """

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        secs = pdf["ts"].astype("int64") // 10**9
        gaps = secs.diff().dropna()
        if gaps.empty:
            return pd.DataFrame(columns=["user_id", "max_gap_s", "n_gaps"])
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "max_gap_s": [int(gaps.max())],
                "n_gaps": [int(len(gaps))],
            }
        )

    return events.select("user_id", "ts", "event_id").groupBy("user_id").applyInPandas(
        per_group, GAP_SCHEMA
    )


@query(
    "user_longest_gap",
    """
    SELECT user_id,
           CAST(MAX(date_diff('second', prev_ts, ts)) AS BIGINT) AS max_gap_s,
           CAST(COUNT(*) AS BIGINT) AS n_gaps
    FROM (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events WHERE user_id < 50)
    WHERE prev_ts IS NOT NULL
    GROUP BY 1
    """,
)
def user_longest_gap(spark, sf_dir):
    """The applyInPandas grouped-map path under an exact oracle: the SQL
    LAG-window form computes identical integer gap seconds (testdata
    timestamps are whole-second, so every definition of 'difference in
    seconds' coincides)."""
    return longest_gap(
        load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    )


EWMA_SCHEMA = "user_id long, n_events long, ewma_value double"
EWMA_ALPHA = 0.2


def ewma_last(events: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """Per-user exponentially-weighted moving average of ``value``, seeded
    with the first observation: ewma₁ = x₁, ewmaₜ = α·xₜ + (1−α)·ewmaₜ₋₁.

    The recurrence is inherently sequential per group — the textbook case
    for the Arrow grouped-map tier.  The fold performs the IDENTICAL IEEE
    operation sequence as the oracle's ``list_reduce`` (same literals, same
    order), so even this floating-point recursion hash-matches across
    engines."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        vals = pdf["value"].to_numpy()
        acc = float(vals[0])
        for x in vals[1:]:
            acc = alpha * float(x) + (1.0 - alpha) * acc
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [int(len(vals))],
                "ewma_value": [acc],
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(per_group, EWMA_SCHEMA)
    )


@query(
    "user_ewma_value",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           list_reduce(list(value ORDER BY ts, event_id),
                       (acc, x) -> 0.2 * x + 0.8 * acc) AS ewma_value
    FROM events
    GROUP BY 1
    """,
)
def user_ewma_value(spark, sf_dir):
    """Sequential EWMA per user — custom grouped-map operator #2, gated by
    an exact fold oracle (list_reduce seeds with the first element, exactly
    like the Python fold)."""
    return ewma_last(load(spark, sf_dir, "events"))


# --------------------------------------------------------------------- #
# Misra–Gries heavy hitters: mergeable sketch prune + exact verify
# --------------------------------------------------------------------- #

MG_K = 50
MG_SCHEMA = "word string"


def _mg_candidates(tokens: DataFrame, k: int = MG_K) -> DataFrame:
    """Per-partition Misra–Gries(k) candidate sets via ``mapInPandas``.

    Guarantee used downstream: any word with GLOBAL count > n/k has
    count > n_p/k in at least one partition (pigeonhole), and per-
    partition MG(k) retains every such word — so the union of partition
    candidates is a superset of the true heavy hitters.  Each partition
    emits ≤ k rows regardless of input size: constant-memory, mergeable,
    the sketch shape that survives 100 TB."""

    def per_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for w in pdf["word"]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < k:
                    counters[w] = 1
                else:
                    for key in list(counters):
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
        yield pd.DataFrame({"word": list(counters)})

    return tokens.mapInPandas(per_partition, MG_SCHEMA)


@query(
    "frequent_words_mg",
    f"""
    WITH tokens AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM tokens)
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tokens CROSS JOIN tot
    GROUP BY word, tot.n
    HAVING COUNT(*) > n / {MG_K}
    """,
)
def frequent_words_mg(spark, sf_dir):
    """Heavy hitters by SKETCH-PRUNE + EXACT-VERIFY: per-partition
    Misra–Gries(k) sketches nominate a candidate set (≤ k·partitions
    words, no false negatives for count > n/k), then one semi-join +
    exact recount keeps precisely the true frequent words — so a
    constant-memory streaming sketch ends in an EXACTLY oracle-checkable
    answer (the DuckDB oracle is the plain GROUP BY ... HAVING).  At
    100 TB the exact recount aggregates only candidate words: the
    shuffle carries |candidates| keys, not |vocabulary|."""
    tokens = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
    )
    cand = _mg_candidates(tokens).distinct()
    total = tokens.agg(F.count(F.lit(1)).alias("n"))
    return (
        tokens.join(F.broadcast(cand), "word", "leftsemi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("n") / MG_K)
        .select("word", "cnt")
    )
