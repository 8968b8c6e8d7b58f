"""Unit tests for the data-pipeline operator APIs (generic entry points,
not just the driver-gate queries)."""

import pytest
from pyspark.sql import functions as F

from fstore_sql_spark.operators import dedup, multimodal, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the sleepy dog"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "short doc"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_lsh_finds_planted_dups(docs):
    sigs = dedup.minhash_signatures(docs)
    assert sigs.count() == 5
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in pairs  # exact dup always collides on every band
    assert all(a < b for a, b in pairs)


def test_jaccard_verify_scores(docs):
    cands = docs.sparkSession.createDataFrame(
        [(1, 2), (1, 4)], ["doc_a", "doc_b"]
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_verify(docs, cands, threshold=0.0).collect()
    }
    assert out[(1, 2)] == 1.0  # identical docs
    assert (1, 4) not in out or out[(1, 4)] < 0.1  # disjoint shingles


def test_simhash_identical_docs_collide(docs):
    out = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert out[1] == out[2]
    assert out[1] != out[4]
    # near-dup within small hamming distance
    ham = bin(out[1] ^ out[3]).count("1")
    assert ham <= 10


def test_cosine_topk(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # closest to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),  # opposite
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = similarity.topk_bruteforce(emb, emb.filter("vec_id = 1"), k=2)
    got = [r["vec_id"] for r in out.collect()]
    assert got == [2, 3]


def test_multimodal_feature_extraction(spark):
    rows = [(1, "image", bytearray(b"payload-one")), (2, "image", bytearray(b"payload-two"))]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = multimodal.extract_features(media).collect()
    assert len(out) == 2
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == len(b"payload-one")
    assert len(by_id[1]["feature"]) == multimodal.FEATURE_DIM
    assert all(0.0 <= f < 1.0 for f in by_id[1]["feature"])
    # deterministic across invocations
    again = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    assert again[1] == by_id[1]["feature"]


def test_multimodal_decode_is_stubbed(spark):
    media = spark.createDataFrame([], multimodal.MEDIA_SCHEMA)
    with pytest.raises(NotImplementedError, match="codecs"):
        multimodal.decode_image(media)


def test_frame_sample_grid(spark):
    rows = [(1, "video", bytearray(b"x"), None, None, None, 3500)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.frame_sample(media, every_ms=1000).collect()
    assert [(r["frame_idx"], r["ts_ms"]) for r in out] == [(0, 0), (1, 1000), (2, 2000)]
