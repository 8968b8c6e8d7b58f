"""Similarity search over an embedding column (``array<float>``).

Two strategies (the build brief's baseline + scale path):

- **Brute-force cosine top-k** — exact; cosine computed with built-in
  higher-order functions (zip_with + aggregate fold), entirely JVM-side.
  At scale this is one broadcast of the query vector and a
  TakeOrderedAndProject — no shuffle of the corpus at all.
- **Blocked / IVF-style ANN** — restrict the pairwise search to a coarse
  cell (here the ``label`` column stands in for an IVF centroid
  assignment; a real deployment computes it with a k-means fit).  The
  per-cell self-join bounds cost to Σ|cell|² ≪ |corpus|².

All math is done in float64 after an explicit cast (the parquet column is
float32) so Spark and the DuckDB oracle agree; scores are rounded to 6
decimals before ranking to keep cross-engine top-k selection stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fstore_sql_spark.queries import load, query


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Σ aᵢ·bᵢ as a left-fold — sequential summation, deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_bruteforce(
    corpus: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``query_vec`` (single row) against the corpus:
    broadcast nested-loop against the 1-row side + TakeOrderedAndProject."""
    q = F.broadcast(query_vec.select(F.col(vec_col).alias("qvec"), F.col(id_col).alias("qid")))
    scored = (
        corpus.crossJoin(q)
        .filter(F.col(id_col) != F.col("qid"))
        .select(
            id_col,
            F.round(cosine(_as_double(F.col(vec_col)), _as_double(F.col("qvec"))), 6).alias(
                "cos_sim"
            ),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


@query(
    "ann_topk_bruteforce",
    """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 1)
    SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qvec), 6) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id != 1
    ORDER BY cos_sim DESC, e.vec_id LIMIT 10
    """,
)
def ann_topk_bruteforce(spark, sf_dir):
    """Top-10 cosine neighbors of vec_id=1 — the exact baseline."""
    emb = load(spark, sf_dir, "embeddings")
    return topk_bruteforce(emb, emb.filter(F.col("vec_id") == 1), k=10)


@query(
    "ann_blocked_topk",
    """
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT qid, vec_id, cos_sim FROM (
        SELECT a.vec_id AS qid, b.vec_id AS vec_id,
               ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY ROUND(list_cosine_similarity(a.v, b.v), 6) DESC, b.vec_id
               ) AS rn
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id != b.vec_id
        WHERE a.vec_id < 10
    ) WHERE rn <= 3
    """,
)
def ann_blocked_topk(spark, sf_dir):
    """IVF-style ANN: search only within the coarse cell (label) of each
    query vector — per-cell equi-join + windowed top-3.  The join shuffles
    on the cell key, so cost scales with Σ|cell|², not |corpus|²."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    )
    a = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"), F.col("v").alias("qv")
    )
    joined = a.join(e, (F.col("qlabel") == F.col("label")) & (F.col("qid") != F.col("vec_id")))
    scored = joined.select(
        "qid", "vec_id", F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "embedding_neardup_pairs",
    """
    WITH corpus AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 100000, label, CAST(embedding AS DOUBLE[]) FROM embeddings
        WHERE vec_id < 25
    )
    SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM corpus a JOIN corpus b
        ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.995
    """,
)
def embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate detection (planted duplicates, label
    as the blocking key): the embedding-space analogue of MinHash dedup."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    )
    planted = e.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "label", "v"
    )
    corpus = e.unionByName(planted)
    a = corpus.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("la"), F.col("v").alias("va")
    )
    b = corpus.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"), F.col("v").alias("vb")
    )
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .select(
            "vec_a", "vec_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= 0.995)
    )
