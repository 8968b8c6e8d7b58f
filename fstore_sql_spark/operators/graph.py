"""Graph operators — iterative algorithms as unrolled DataFrame plans.

The reference has no graph surface; this is beyond-reference coverage for
the training-data pipeline (link analysis over co-occurrence / citation /
dedup-cluster graphs).  The interesting engineering is making an
ITERATIVE, FLOATING-POINT algorithm exactly reproducible across engines:

- fixed iteration count → the loop unrolls into one static logical plan
  (no driver-side convergence polling; Catalyst sees the whole pipeline);
- every per-edge contribution is rounded to a fixed decimal scale BEFORE
  the cross-row sum, so the reduction is order-independent — the same
  trick the stats operators use for entropy, applied per iteration;
- the graph itself derives from exact counts (top-k vocabulary by
  (count, word) tiebreak, distinct co-occurrence pairs), so both engines
  iterate over the identical edge set.

Scale: each iteration is one shuffle (contributions aggregated by dst) +
one broadcast join of the rank vector (|nodes| rows) back onto edges.
Rank vectors are small even for 10⁹-node graphs relative to the edge
list; the edge list partitioning by dst is reused across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fstore_sql_spark.queries import load, query

DAMPING = 0.85
N_ITER = 3
TOP_WORDS = 50


def _word_graph(d: DataFrame):
    """Top-k vocabulary nodes + distinct same-document co-occurrence
    edges (both directions), from exact counts."""
    tokens = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    top = (
        tokens.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(TOP_WORDS)
        .select("word")
    )
    doc_words = tokens.join(F.broadcast(top), "word").select("doc_id", "word").distinct()
    a, b = doc_words.alias("a"), doc_words.alias("b")
    edges = (
        a.join(b, "doc_id")
        .filter(F.col("a.word") != F.col("b.word"))
        .select(F.col("a.word").alias("src"), F.col("b.word").alias("dst"))
        .distinct()
    )
    return top, edges


def pagerank_words(d: DataFrame) -> DataFrame:
    """PageRank over the top-word co-occurrence graph: r⁰ = 1/N;
    rᵗ⁺¹(w) = (1−d)/N + d·Σ round(rᵗ(v)/outdeg(v), 12) over edges v→w.
    Dangling nodes keep the teleport term only (no co-occurring top words
    ⇒ no outgoing edges ⇒ contributes nothing — mirrored in the oracle).
    """
    nodes, edges = _word_graph(d)
    # The unrolled iterations reference the graph N_ITER+1 times — persist
    # it so the token explode runs once (iterative-workload rule #1; at
    # cluster scale this is the edges-in-memory-or-disk cache every Pregel
    # implementation keeps).
    nodes = nodes.persist()
    n_nodes = nodes.count()  # tiny (TOP_WORDS); drives literal constants
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranked_edges = edges.join(F.broadcast(outdeg), "src").persist()

    rank = nodes.select(
        F.col("word"), (F.lit(1.0) / F.lit(float(n_nodes))).alias("rank")
    )
    for _ in range(N_ITER):
        contrib = (
            ranked_edges.join(
                F.broadcast(rank.withColumnRenamed("word", "src")), "src"
            )
            .select(
                F.col("dst").alias("word"),
                F.round(F.col("rank") / F.col("outdeg"), 12)
                .cast("decimal(20,12)")
                .alias("c"),
            )
            .groupBy("word")
            .agg(F.sum("c").cast("double").alias("inflow"))
        )
        rank = (
            nodes.join(contrib, "word", "left")
            .select(
                "word",
                (
                    F.lit((1.0 - DAMPING) / float(n_nodes))
                    + F.lit(DAMPING) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return rank


@query(
    "pagerank_top_words",
    f"""
    WITH tokens AS (
        SELECT doc_id, w.word
        FROM documents, UNNEST(string_split(text, ' ')) AS w(word)
    ),
    top AS (
        SELECT word FROM (
            SELECT word, COUNT(*) AS cnt FROM tokens GROUP BY 1
        ) ORDER BY cnt DESC, word LIMIT {TOP_WORDS}
    ),
    dw AS (
        SELECT DISTINCT doc_id, word FROM tokens
        WHERE word IN (SELECT word FROM top)
    ),
    edges AS (
        SELECT DISTINCT a.word AS src, b.word AS dst
        FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.word <> b.word
    ),
    outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM top),
    r0 AS (SELECT word, 1.0 / (SELECT n FROM n) AS rank FROM top),
    r1 AS (
        SELECT t.word,
               0.15 / (SELECT n FROM n)
                 + 0.85 * COALESCE(CAST(SUM(CAST(ROUND(r.rank / o.outdeg, 12)
                       AS DECIMAL(20,12))) AS DOUBLE), 0.0) AS rank
        FROM top t
        LEFT JOIN edges e ON e.dst = t.word
        LEFT JOIN r0 r ON r.word = e.src
        LEFT JOIN outdeg o ON o.src = e.src
        GROUP BY 1
    ),
    r2 AS (
        SELECT t.word,
               0.15 / (SELECT n FROM n)
                 + 0.85 * COALESCE(CAST(SUM(CAST(ROUND(r.rank / o.outdeg, 12)
                       AS DECIMAL(20,12))) AS DOUBLE), 0.0) AS rank
        FROM top t
        LEFT JOIN edges e ON e.dst = t.word
        LEFT JOIN r1 r ON r.word = e.src
        LEFT JOIN outdeg o ON o.src = e.src
        GROUP BY 1
    ),
    r3 AS (
        SELECT t.word,
               0.15 / (SELECT n FROM n)
                 + 0.85 * COALESCE(CAST(SUM(CAST(ROUND(r.rank / o.outdeg, 12)
                       AS DECIMAL(20,12))) AS DOUBLE), 0.0) AS rank
        FROM top t
        LEFT JOIN edges e ON e.dst = t.word
        LEFT JOIN r2 r ON r.word = e.src
        LEFT JOIN outdeg o ON o.src = e.src
        GROUP BY 1
    )
    SELECT word, rank FROM r3
    """,
)
def pagerank_top_words(spark, sf_dir):
    """3-iteration PageRank over the top-50-word co-occurrence graph —
    iterative link analysis as ONE unrolled static plan, exactly
    reproducible across engines (per-edge contributions rounded to
    decimal before each cross-row sum)."""
    return pagerank_words(load(spark, sf_dir, "documents"))


@query(
    "triangle_count",
    f"""
    WITH tokens AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    top AS (
        SELECT word FROM (
            SELECT word, COUNT(*) AS cnt FROM tokens GROUP BY word
            ORDER BY cnt DESC, word LIMIT {TOP_WORDS}
        )
    ),
    doc_words AS (
        SELECT DISTINCT t.doc_id, t.word
        FROM tokens t JOIN top USING (word)
    ),
    edges AS (
        SELECT DISTINCT a.word AS u, b.word AS v
        FROM doc_words a JOIN doc_words b
          ON a.doc_id = b.doc_id AND a.word < b.word
    ),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM top) AS BIGINT) AS n_nodes
    """,
)
def triangle_count(spark, sf_dir):
    """Triangle counting on the word co-occurrence graph — the clustering-
    coefficient numerator and the standard 'can your engine do graph
    analytics' primitive.  Uses the ORIENTED-edge trick that makes the
    join tractable at scale: store each undirected edge once as u<v, then
    count paths e1:(a<b), e2:(b<c) closed by e3:(a,c) — every triangle
    found exactly once, and the self-join never explodes beyond
    Σ deg(v)² on the oriented (lower-degree-first) adjacency.  Two
    broadcast-able self-joins on a |top-k|² -bounded edge list."""
    d = load(spark, sf_dir, "documents")
    top, edges_bidir = _word_graph(d)
    # The closure below references the edge list four times (e1/e2/e3 +
    # n_edges) and the node set once more; unpersisted, every reference
    # re-derived the whole explode→top→doc_words subtree (r14: 39
    # Exchanges, ~13 corpus explodes in one plan).  The oriented edge
    # list is ≤ TOP_WORDS²/2 rows and top is ≤ TOP_WORDS rows — persist
    # both (trivially scale-safe) so the corpus is exploded once for the
    # top-k aggregate and once for doc_words, and nothing else.
    top = top.persist()
    edges = (
        edges_bidir.filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .persist()
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    # the oriented edge list is top-k bounded (≤ TOP_WORDS²/2 rows): hint
    # broadcast so the closure joins never sort-merge the path table.
    tri = (
        e1.join(F.broadcast(e2), F.col("b") == F.col("b2"))
        .join(F.broadcast(e3), (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
    )
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_edge = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_node = top.agg(F.count(F.lit(1)).alias("n_nodes"))
    return n_tri.crossJoin(F.broadcast(n_edge)).crossJoin(F.broadcast(n_node))
