"""Semantic tests for the training-data-pipeline extensions (dedup,
similarity, text, multimodal) beyond the oracle parity suite."""

from __future__ import annotations

import pytest

from music_streaming_etl_glue_spark.operators import dedup, multimodal, similarity
from music_streaming_etl_glue_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF_SMOKE, "embeddings").cache()


def test_minhash_pairs_subset_of_exact(docs):
    """Verified LSH pairs are exact-Jaccard filtered, so they must be a
    subset of the exhaustive shingle-join pairs at the same threshold."""
    exact = {
        (r.doc_id_a, r.doc_id_b)
        for r in dedup.ngram_jaccard_pairs(docs).collect()
    }
    lsh = {
        (r.doc_id_a, r.doc_id_b)
        for r in dedup.minhash_dedup_pairs(docs).collect()
    }
    assert lsh <= exact
    # With planted near-dups and b=3/r=2 banding, recall shouldn't be zero.
    if exact:
        assert len(lsh) > 0


def test_normalized_dedup_catches_shuffles(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b b c"), (4, "x y z")],
        "doc_id long, text string",
    )
    out = dedup.dedup_normalized(df).collect()
    # docs 1-3 share the token set {a,b,c} → one group of 3, plus {x,y,z}
    counts = sorted(r.dup_count for r in out)
    assert counts == [1, 3]


def test_simhash_identical_token_sets_collide(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c a b c")], "doc_id long, text string"
    )
    sigs = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(df).collect()}
    assert sigs[1] == sigs[2]


def test_ann_topk_excludes_query_and_is_ranked(embs):
    rows = similarity.ann_topk_bruteforce(embs, k=5).collect()
    assert len(rows) == 5
    assert all(r.vec_id != similarity.QUERY_VEC_ID for r in rows)
    sims = [r.similarity for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]


def test_pandas_topk_matches_bruteforce(embs):
    a = [(r.vec_id, r.similarity) for r in similarity.ann_topk_bruteforce(embs).collect()]
    b = [(r.vec_id, r.similarity) for r in similarity.ann_topk_pandas(embs).collect()]
    assert a == b


def test_multimodal_features_deterministic(docs):
    binary = multimodal.attach_binary(docs)
    feats = {r.doc_id: r for r in multimodal.extract_features(binary).collect()}
    raw = {r.doc_id: r.text.encode() for r in docs.collect()}
    assert set(feats) == set(raw)
    some = list(raw)[:20]
    for d in some:
        expect = multimodal._fake_features(raw[d])
        got = feats[d]
        assert (got.byte_len, got.first_byte, got.last_byte, got.checksum) == expect


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG...")


def test_jaccard_pipeline_cap_drops_hot_shingles(spark):
    """The pipeline entry point caps shingle document frequency: boilerplate
    shingles shared by every doc must not generate candidate pairs."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_pipeline,
    )

    boiler = "subscribe to our newsletter for updates"
    rows = [
        (i, f"{boiler} unique{i}a unique{i}b unique{i}c unique{i}d")
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped: the shared boilerplate shingles create pairs at low threshold
    uncapped = ngram_jaccard_pairs(docs, threshold=0.1)
    assert uncapped.count() > 0
    # capped at df<=5 the ubiquitous (df=6) shingles drop; docs share nothing
    capped = ngram_jaccard_pairs_pipeline(docs, threshold=0.1, max_shingle_df=5)
    assert capped.count() == 0
    # default pipeline cap (10k) is a no-op on this tiny corpus
    default_cap = ngram_jaccard_pairs_pipeline(docs, threshold=0.1)
    assert default_cap.count() == uncapped.count()
