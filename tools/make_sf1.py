"""Generate a local sf1 scale point (~10x sf0.1) for the scale-validation
bench run (VERDICT r2 next-round #2).

The driver ships sf0.001/0.01/0.1 only; the 100x-scale posture claims need
at least one empirical point above sf0.1.  This derives sf1 from the
driver's own sf0.1 tables (never synthesizing new distributions): 10
replicas with DISJOINT KEY SPACES, foreign keys remapped consistently so
every join in the query registry keeps its selectivity shape:

- region/nation: single copy (shared dimensions, like real deployments)
- customer/supplier/part/orders/lineitem: keys offset per replica, FKs
  (o_custkey, l_orderkey, l_partkey, l_suppkey) remapped to match
- events: event_id/user_id offset (per-user session structure preserved,
  10x event density in the same time window)
- documents: doc_id offset; text word-order permuted per replica
  (reverse + rotate-by-i — a bijection for any length) so replicas are
  NOT shingle-level near-duplicates of each other: without this every
  doc gains 9 planted near-dups and the MinHash/LSH workloads degenerate
  into a quadratic planted-pair benchmark instead of a scaled corpus.
  n_chars is recomputed from the permuted text (operators assert
  n_chars == length(text)).  Replica 0 is the identity copy.
- embeddings: vec_id offset, vectors/labels unchanged

Usage: python tools/make_sf1.py [--out /root/repo/testdata_sf1]

sf10 (VERDICT r4 #3) is the same composition run at 100 replicas of the
SAME sf0.1 source.  At high replica counts BOTH corpus-disjointness flags
are REQUIRED (r15, measured): the reverse+rotate-by-i permutations are
mutual ROTATIONS of each other (perm_i(x) = rot_{i-j}(perm_j(x))), which
share ~95% of their 3-shingles — so untagged documents plant an
R²-quadratic near-dup corpus (measured Jaccard 0.949-0.974 between
replicas; ppjoin ran 14+ min at R=100 untagged vs ~2 min tagged) — and
verbatim embedding replication plants the same artifact in the
label-blocked pair operators (neardup 18.9x, contamination 36.5x
superlinear at R=100).  The canonical sf10 recipe:

    python tools/make_sf1.py --replicas 100 --tag-doc-tokens \
        --disjoint-embeddings --out /root/repo/testdata_sf10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# key offsets: comfortably above each table's sf0.1 key range
OFF = {
    "custkey": 100_000,
    "suppkey": 10_000,
    "partkey": 100_000,
    "orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/testdata_sf1")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument(
        "--tag-doc-tokens",
        action="store_true",
        help="suffix every document token with its replica id, making "
        "replica vocabularies DISJOINT.  Required at high replica counts: "
        "word-order permutation alone preserves token SETS, so set-"
        "similarity operators (PPJoin prefix filter, token Jaccard) see "
        "every base doc duplicated R times — at R=100 that plants ~R²/2 "
        "candidate pairs per base doc and turns a linear workload "
        "quadratic (a data artifact, not a plan property).  Tagging makes "
        "the corpus scale as R disjoint corpora — the honest 100x shape.",
    )
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of tables to (re)generate",
    )
    ap.add_argument(
        "--disjoint-embeddings",
        action="store_true",
        help="make each embedding replica a DISJOINT corpus (replica 0 "
        "stays the identity copy) — the embedding analogue of "
        "--tag-doc-tokens, required at high replica counts.  Plain "
        "replication copies vectors AND labels verbatim, so at R replicas "
        "every vector has R-1 exact duplicates (cosine 1.0) inside an "
        "R-times-bigger label block: the label-blocked pair operators "
        "(neardup, contamination) evaluate R^2 the pairs — measured r15 "
        "at R=100: neardup 18.9x, contamination 36.5x SUPERLINEAR, and a "
        "sign flip alone does not help because the candidate count is "
        "driven by the label blocks, not the cosine values.  Two changes "
        "per replica r>=1: (a) a deterministic per-replica ±1 sign "
        "vector — a diagonal isometry, so norms and every WITHIN-replica "
        "dot product are preserved EXACTLY ((s⊙v)·(s⊙w)=v·w since "
        "s_k²=1) while cross-replica cosines decorrelate; (b) labels "
        "move to a per-replica namespace (label + r*1000), so label "
        "blocks keep their source size and the pair workloads scale "
        "R-linearly — R disjoint corpora, the honest Rx shape.  The "
        "label==0 benchmark set (contamination) stays replica 0's: one "
        "benchmark, an R-times-bigger training corpus.",
    )
    ap.add_argument(
        "--no-adversarial-slice",
        action="store_true",
        help="skip the r11 multi-byte document slice (VERDICT r10 #6): by "
        "default 5%% of SOURCE documents (doc_id >= 150 AND doc_id %% 20 "
        "== 7) have their text replaced by the adversarial multi-byte "
        "corpus (tests/_adversarial_corpus.multibyte_slice_texts) before "
        "replication, so every generated decade carries UTF-8/CJK/emoji/"
        "RTL text through the FULL 186-query registry.  doc_id, lang and "
        "source are untouched (group keys stay stable); n_chars is "
        "recomputed.  doc_id >= 150 keeps the slice out of "
        "dedup_levenshtein_pairs, the one byte-vs-codepoint-divergent "
        "oracle.",
    )
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None
    REPLICAS = args.replicas
    SRC = args.src
    # output file counts scale with data volume (sf1 keeps its r03 layout)
    fscale = max(1, REPLICAS // 10)

    from pyspark.sql import functions as F

    from fstore_sql_spark import get_spark

    spark = get_spark(app_name="make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    def read(t: str):
        return spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))

    def nf(n_files: int) -> int:
        return n_files * fscale if n_files > 1 else n_files

    def write(t: str, df, n_files: int = 8, pre_partitioned: bool = False):
        if only is not None and t not in only:
            return
        out = df if pre_partitioned else df.repartition(nf(n_files))
        out.write.mode("overwrite").parquet(
            os.path.join(args.out, f"{t}.parquet")
        )
        print(f"{t}: {df.count()} rows", flush=True)

    # shared dims — single copy
    write("region", read("region"), 1)
    write("nation", read("nation"), 1)

    def replicate(df, shifts: dict[str, int], extra=None, parts: int = 8):
        """Fan each row out into REPLICAS copies with per-replica key
        shifts.  r8: a crossJoin against a broadcast ``range(REPLICAS)``
        (one scan, one plan node) replaced the original per-replica
        unionByName loop — at ``--replicas 1000`` (sf100) a 1000-branch
        union plan took longer to ANALYZE than to run.  The SMALL source
        is repartitioned to the OUTPUT file count BEFORE the expansion
        (the broadcast crossJoin preserves the left side's partitioning):
        splitting a 3-split parquet source after expansion meant 3 tasks
        carrying 600M rows each through a full shuffle — pre-splitting
        gives the expansion full parallelism and the expanded table never
        shuffles at all (callers pass ``pre_partitioned=True`` to write).
        ``extra`` (the documents text permutation) is expression-based
        over the ``_rep`` column; the emitted strings are identical to
        the union path's, so sf1/sf10 regenerated here are
        byte-equivalent row sets."""
        reps = spark.range(REPLICAS).withColumnRenamed("id", "_rep")
        r = df.repartition(parts).crossJoin(F.broadcast(reps))
        for col, off in shifts.items():
            r = r.withColumn(
                col, (F.col(col) + F.col("_rep") * F.lit(off)).cast("long")
            )
        if extra is not None:
            r = extra(r)
        return r.drop("_rep")

    write(
        "customer",
        replicate(read("customer"), {"c_custkey": OFF["custkey"]}, parts=nf(8)),
        pre_partitioned=True,
    )
    write(
        "supplier",
        replicate(read("supplier"), {"s_suppkey": OFF["suppkey"]}, parts=nf(8)),
        pre_partitioned=True,
    )
    write(
        "part",
        replicate(read("part"), {"p_partkey": OFF["partkey"]}, parts=nf(8)),
        pre_partitioned=True,
    )
    write(
        "orders",
        replicate(
            read("orders"),
            {"o_orderkey": OFF["orderkey"], "o_custkey": OFF["custkey"]},
            parts=nf(8),
        ),
        pre_partitioned=True,
    )
    write(
        "lineitem",
        replicate(
            read("lineitem"),
            {
                "l_orderkey": OFF["orderkey"],
                "l_partkey": OFF["partkey"],
                "l_suppkey": OFF["suppkey"],
            },
            parts=nf(16),
        ),
        n_files=16,
        pre_partitioned=True,
    )
    write(
        "events",
        replicate(
            read("events"),
            {"event_id": OFF["event_id"], "user_id": OFF["user_id"]},
            parts=nf(16),
        ),
        n_files=16,
        pre_partitioned=True,
    )

    def permute_text(r):
        # replica 0 stays the identity copy; every other replica gets a
        # per-replica text rewrite (expressions reference the outer _rep
        # column from inside the higher-order lambdas)
        if args.tag_doc_tokens:
            # disjoint vocabulary per replica (see --tag-doc-tokens help)
            expr = (
                "array_join(transform(split(text, ' '), "
                "w -> concat(w, '~', cast(_rep as string))), ' ')"
            )
        else:
            # reverse + rotate-by-_rep over the word array: a bijection
            # for any word count, destroying shingle identity between
            # replicas (token SETS stay identical — fine at small replica
            # counts, quadratic for set-similarity ops at high ones)
            expr = (
                "array_join(transform(sequence(0, size(split(text, ' ')) - 1), "
                "j -> element_at(split(text, ' '), cast("
                "((size(split(text, ' ')) - 1 - j + _rep) % size(split(text, ' '))) + 1 as int))), ' ')"
            )
        return r.withColumn(
            "text",
            F.when(F.col("_rep") == 0, F.col("text")).otherwise(F.expr(expr)),
        ).withColumn("n_chars", F.length("text").cast("long"))

    docs_src = read("documents")
    if not args.no_adversarial_slice:
        # r11 multi-byte slice (VERDICT r10 #6): rewrite 5% of SOURCE
        # docs with the adversarial texts whose oracle parity the r10
        # fixture proved, BEFORE replication — replica 0 keeps the slice
        # verbatim, replicas >= 1 permute/tag it like any other text.
        # The pick is deterministic (doc_id % |texts|), so regeneration
        # is byte-stable.
        from tests._adversarial_corpus import multibyte_slice_texts

        adv = multibyte_slice_texts()
        arr = F.array(*[F.lit(t) for t in adv])
        # a per-doc token suffix keeps every slice doc's text UNIQUE:
        # without it every 20th source doc with equal doc_id % len(adv)
        # would be an EXACT copy (~15-doc planted clusters per text —
        # a workload-shape change, not a slice).  Same-base-text docs
        # remain NEAR-dups (differ in one trailing token), so the dedup
        # family gets genuine multi-byte near-dup structure.
        pick = F.concat(
            F.element_at(arr, (F.col("doc_id") % len(adv)).cast("int") + 1),
            F.lit(" §"),
            F.col("doc_id").cast("string"),
        )
        in_slice = (F.col("doc_id") >= 150) & (F.col("doc_id") % 20 == 7)
        docs_src = docs_src.withColumn(
            "text", F.when(in_slice, pick).otherwise(F.col("text"))
        ).withColumn("n_chars", F.length("text").cast("long"))
    write(
        "documents",
        replicate(
            docs_src,
            {"doc_id": OFF["doc_id"]},
            extra=permute_text,
            parts=nf(8),
        ),
        pre_partitioned=True,
    )
    def disjoint_embeddings(r):
        # per-replica diagonal ±1 isometry + label namespace (see
        # --disjoint-embeddings): sign_k = +1 iff xxhash64(_rep, k) is
        # even — deterministic, so regeneration is byte-stable.  FLOAT
        # negation is exact (sign-bit flip), so replica geometry is
        # bit-identical to the source.
        expr = (
            "transform(embedding, (x, j) -> CASE WHEN "
            "pmod(xxhash64(_rep, j), 2) = 0 THEN x ELSE -x END)"
        )
        return r.withColumn(
            "embedding",
            F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                F.expr(expr)
            ),
        ).withColumn(
            "label",
            (F.col("label") + F.col("_rep") * F.lit(1000)).cast("int"),
        )

    write(
        "embeddings",
        replicate(
            read("embeddings"),
            {"vec_id": OFF["vec_id"]},
            extra=disjoint_embeddings if args.disjoint_embeddings else None,
            parts=nf(8),
        ),
        pre_partitioned=True,
    )
    print("sf1 written to", args.out)


if __name__ == "__main__":
    main()
