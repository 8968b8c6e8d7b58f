"""Large-scale data-pipeline operators (BASELINE.json north star).

Modules register their driver-gate queries into
``fstore_sql_spark.queries.QUERIES/ORACLES`` on import:

    asof        — general as-of join (merge-sorted union + LOCF, 1 shuffle)
    dedup       — exact / normalized / MinHash+LSH / n-gram Jaccard / SimHash
    grouped     — applyInPandas grouped-map custom aggregation (oracle-gated)
    similarity  — brute-force cosine top-k + IVF-style blocked ANN
    text        — token stats, quality scoring, fingerprinting, language-ID
    multimodal  — binary media columns: schema + Arrow-batched UDF plumbing
    skew        — salted joins + two-phase top-k for hot-key mitigation
    sampling    — deterministic content-hash sampling / splits / mixing
    stats       — profiling: equi-depth histograms, z-score outliers,
                  exact-sum correlation, entropy, rollup reuse
    layout      — Z-order (Morton) multi-dim clustering + locality stats
"""

from fstore_sql_spark.operators import (  # noqa: F401
    asof,
    dedup,
    graph,
    layout,
    grouped,
    multimodal,
    sampling,
    similarity,
    skew,
    stats,
    text,
)
