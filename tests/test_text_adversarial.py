"""Adversarial text corpus — oracle parity + behavior pins (r10, VERDICT
r9 #4).

The driver corpus is pure ASCII with no NULL/empty/degenerate documents,
so the text/dedup/sampling/multimodal families' behavior on such data was
documented but unpinned.  This module builds the corpus from
``tests/_adversarial_corpus.py`` (multi-byte UTF-8, emoji, RTL, combining
chars, empty/whitespace/control/NULL text, planted dups) and:

- runs every documents-only registry query against the same DuckDB
  oracle the driver uses, on that corpus (``test_oracle_parity``);
- pins the one legitimately-divergent operator
  (``dedup_levenshtein_pairs`` — Spark levenshtein counts CODE POINTS,
  DuckDB counts BYTES) with explicit expected values;
- pins the r10 NULL/degenerate-doc semantics decisions with exact
  expected values (NULL fingerprint, hex-digest equality, no-chunk /
  no-candidacy rules).

Bugs this fixture found (all fixed in r10, see git history): Arrow-batch
crashes on NULL text (langid, multimodal features), Spark SQL-literal
'\\s' collapsing in the BPE regex, sequence(1,0) descending in
bigram_counts, groupBy-vs-join NULL semantics pairing NULL docs in LSH,
opposite NULL-ordering defaults in NTILE deciles, divide-by-zero on
zero-weight reservoir sampling, char-vs-byte audio windowing.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fstore_sql_spark.operators  # noqa: F401  (registers queries)
from fstore_sql_spark.queries import QUERIES
from tests._adversarial_corpus import build_rows, write_corpus
from tools.check_correctness import canon, value_hash

# Every registry query whose oracle touches ONLY the documents table.
DOC_ONLY_QUERIES = [
    "dedup_exact", "dedup_minhash_lsh_pairs", "dedup_jaccard_verified",
    "dedup_simhash", "dedup_clusters", "dedup_prefix_filter_pairs",
    "pagerank_top_words", "triangle_count", "multimodal_features",
    "multimodal_frame_grid", "sample_deterministic_counts",
    "stratified_sample_by_lang", "shuffle_positions", "packed_bin_stats",
    "weighted_reservoir_sample", "text_quality_by_source",
    "text_fingerprint", "text_bpe_token_counts", "vocab_top_terms",
    "benchmark_contamination", "scalar_function_showcase",
    "lang_source_mutual_info", "dedup_exact_groups", "dedup_normalized",
    "dedup_simhash_buckets", "dup_group_size_histogram",
    "dedup_cluster_representatives", "dedup_incremental_batch",
    "train_test_split_counts", "weighted_mix_counts",
    "split_leakage_audit", "cluster_safe_split", "frequent_words_mg",
    "multimodal_bmp_decode", "multimodal_wav_decode",
    "multimodal_audio_windows", "source_vocab_overlap",
    "lang_entropy_by_source", "profile_documents_columns",
    "source_decile_profile", "regex_function_showcase",
    "chi2_lang_source", "text_token_stats", "text_quality_filter",
    "text_langid", "bigram_counts", "term_doc_stats",
    "corpus_curation_funnel", "doc_repetition_stats", "tfidf_top_terms",
    "doc_chunks_sliding", "bigram_lm_source_scores",
    "repeated_ngram_stats", "dsir_importance_weights",
    "pii_redaction_stats", "gopher_quality_rules", "token_budget_mixture",
    "bm25_topk", "hybrid_rrf_topk",
]

# Oracle-exempt on THIS corpus, each with a pinned reason + its own
# behavior-pin test below.
EXPECTED_DIVERGENT = {
    "dedup_levenshtein_pairs": (
        "Spark levenshtein counts code points, DuckDB counts bytes; "
        "exact oracle on ASCII corpora only — multi-byte behavior pinned "
        "in test_levenshtein_code_point_semantics"
    ),
}


@pytest.fixture(scope="session")
def adv_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_corpus")
    return write_corpus(str(d))


@pytest.fixture(scope="session")
def duck(adv_sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(adv_sf, 'documents.parquet')}')"
    )
    return con


class TestOracleParity:
    @pytest.mark.parametrize("name", DOC_ONLY_QUERIES)
    def test_oracle_parity(self, spark, adv_sf, duck, name):
        """The driver's exact comparison (rows / sorted columns / value
        hash), on the adversarial corpus."""
        import __spark_entry__ as em

        sdf = QUERIES[name](spark, adv_sf)
        srows = [tuple(r) for r in sdf.collect()]
        scols = [c.lower() for c in sdf.columns]
        cur = duck.execute(em.oracle_sql()[name])
        drows = cur.fetchall()
        dcols = [c[0].lower() for c in cur.description]
        assert sorted(scols) == sorted(dcols)
        assert len(srows) == len(drows), f"{len(srows)} vs {len(drows)}"
        s_order = [scols.index(c) for c in sorted(scols)]
        d_order = [dcols.index(c) for c in sorted(dcols)]
        assert value_hash(srows, s_order) == value_hash(drows, d_order)

    def test_divergent_list_is_complete(self):
        """Every documents-only registry query is either in the parity
        sweep or expected-divergent with a reason — no silent omissions."""
        assert not set(EXPECTED_DIVERGENT) & set(DOC_ONLY_QUERIES)


class TestBehaviorPins:
    """Exact expected values for the r10 edge-semantics decisions."""

    def _fp(self, spark, adv_sf):
        rows = QUERIES["text_fingerprint"](spark, adv_sf).collect()
        return {r["doc_id"]: r["fingerprint"] for r in rows}

    def test_null_text_has_null_fingerprint(self, spark, adv_sf):
        """ADVICE r9: NULL docs must NOT share the fold identity 'g'."""
        rows = build_rows()
        null_ids = [r["doc_id"] for r in rows if r["text"] is None]
        assert len(null_ids) >= 2
        fp = self._fp(spark, adv_sf)
        assert all(fp[i] is None for i in null_ids)

    def test_fingerprint_exact_values(self, spark, adv_sf):
        """Byte-shingle hex-digest fingerprint, recomputed in pure
        Python: min over md5(uppercase-hex of each 8-byte window)."""
        rows = {r["doc_id"]: r["text"] for r in build_rows()}
        fp = self._fp(spark, adv_sf)

        def expected(text):
            b = text.encode("utf-8")
            n = max(len(b) - 6, 1)
            return min(
                hashlib.md5(b[i : i + 8].hex().upper().encode()).hexdigest()
                for i in range(n)
            )

        # one ASCII, one multi-byte, one emoji, the empty string
        for doc_id in (0, 5, 8, 45):
            text = rows[doc_id]
            assert fp[doc_id] == expected(text), (doc_id, text[:30])
        # empty text hashes the empty slice: md5 of '' (hex of b'' is '')
        assert fp[45] == hashlib.md5(b"").hexdigest()

    def test_exact_duplicates_share_fingerprint_across_scripts(
        self, spark, adv_sf
    ):
        """Planted dups (ids i and i+15 for the 15 base texts) must
        collide for EVERY script family — the dedup contract."""
        fp = self._fp(spark, adv_sf)
        for i in range(15):
            assert fp[i] == fp[i + 15], i

    def test_levenshtein_code_point_semantics(self, spark, adv_sf):
        """The pinned divergence: one code-point substitution costs 1
        regardless of byte width (DuckDB would say 3 for 'é'→'中')."""
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("é", "中"), ("🚀", "a"), ("café", "cafe")], "a string, b string"
        ).select(F.levenshtein("a", "b").alias("d"))
        assert [r["d"] for r in df.collect()] == [1, 1, 1]

    def test_null_docs_never_lsh_candidates(self, spark, adv_sf):
        """r10: no signature ⇒ no candidacy (groupBy would otherwise
        bucket every NULL band together)."""
        rows = build_rows()
        null_ids = {r["doc_id"] for r in rows if r["text"] is None}
        pairs = QUERIES["dedup_minhash_lsh_pairs"](spark, adv_sf).collect()
        for r in pairs:
            assert r["doc_a"] not in null_ids and r["doc_b"] not in null_ids

    def test_zero_token_docs_produce_no_chunks(self, spark, adv_sf):
        # the engine tokenization: split on single space, drop empties
        # (so '\t' and '\n' ARE tokens — replicate exactly)
        def toks(t):
            return [] if t is None else [w for w in t.split(" ") if w]

        rows = build_rows()
        empty_ids = {r["doc_id"] for r in rows if not toks(r["text"])}
        chunks = QUERIES["doc_chunks_sliding"](spark, adv_sf).collect()
        chunk_ids = {r["doc_id"] for r in chunks}
        assert not (chunk_ids & empty_ids)
        # and every tokenizable doc chunks at least once
        tokenized = {r["doc_id"] for r in rows if toks(r["text"])}
        assert tokenized <= chunk_ids

    def test_zero_weight_docs_never_reservoir_sampled(self, spark, adv_sf):
        rows = build_rows()
        zero_ids = {
            r["doc_id"] for r in rows if not r["n_chars"]  # 0 or NULL
        }
        got = QUERIES["weighted_reservoir_sample"](spark, adv_sf).collect()
        # 25 sampled from >100 positive-weight docs: no zero-weight doc
        assert len(got) == 25
        assert not ({r["doc_id"] for r in got} & zero_ids)

    def test_langid_null_text_predicts_null(self, spark, adv_sf):
        rows = QUERIES["text_langid"](spark, adv_sf).collect()
        null_groups = [r for r in rows if r["lang_pred"] is None]
        n_null_docs = sum(1 for r in build_rows() if r["text"] is None)
        assert sum(r["n_docs"] for r in null_groups) == n_null_docs
