"""Large-scale data-pipeline operators (BASELINE.json north star).

Modules register their driver-gate queries into
``fstore_sql_spark.queries.QUERIES/ORACLES`` on import:

    dedup       — exact / normalized / MinHash+LSH / n-gram Jaccard / SimHash
    similarity  — brute-force cosine top-k + IVF-style blocked ANN
    text        — token stats, quality scoring, fingerprinting, language-ID
    multimodal  — binary media columns: schema + Arrow-batched UDF plumbing
"""

from fstore_sql_spark.operators import dedup, multimodal, similarity, text  # noqa: F401
