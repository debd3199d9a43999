"""Zipf-vocabulary corpus twin (VERDICT r7 item #6): deterministic,
engine-portable, Zipf-shaped, with planted near-duplicates — so the
prefix-filtered pair joins are benched (and oracled) in their design
regime instead of the stock fixture's near-uniform worst case."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import dedup as D

from tests.conftest import SF_SMOKE
from tests.oracle_util import duckdb_con, assert_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def zipf(spark, docs):
    return D.zipf_documents(docs).localCheckpoint()


def test_zipf_deterministic_and_length_preserving(docs, zipf):
    again = {r["doc_id"]: r["text"] for r in D.zipf_documents(docs).collect()}
    src_len = {
        r["doc_id"]: r["n"]
        for r in docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    rows = zipf.collect()
    # each source doc seeds ZIPF_FANOUT corpus docs, lengths preserved
    assert {r["doc_id"] for r in rows} == {
        d * D.ZIPF_FANOUT + j
        for d in src_len
        for j in range(D.ZIPF_FANOUT)
    }
    for r in rows:
        assert r["text"] == again[r["doc_id"]]
        assert (
            len(r["text"].split(" "))
            == src_len[r["doc_id"] // D.ZIPF_FANOUT]
        )


def test_zipf_shape(zipf):
    """Token frequencies must actually be Zipf-ish: the head word takes
    a large share and the top-10 dominate the tail half of the vocab."""
    freq = (
        zipf.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    by_word = {r["w"]: r["count"] for r in freq}
    total = sum(by_word.values())
    # expected share of w1 is K/T ≈ 15%; allow generous sampling slack
    assert by_word["w1"] / total > 0.10
    top10 = sum(
        by_word.get(f"w{r}", 0) for r in range(1, 11)
    )
    tail_half = sum(
        by_word.get(f"w{r}", 0)
        for r in range(D.ZIPF_VOCAB // 2, D.ZIPF_VOCAB + 1)
    )
    # analytic ratio at V=200: top-10 mass ≈ 2927/T vs tail-half ≈
    # 1000·ln2/T → ≈ 4.2×; pin well above uniform (where it would be
    # 10/101 ≈ 0.1×) but below the analytic value
    assert top10 > 3 * max(tail_half, 1)


def test_zipf_planted_dups_are_found_and_twins_agree(spark, docs, zipf):
    """Every planted (base, base+7) pair must surface well above the
    Jaccard threshold, and the prefix-filtered join must return the
    EXACT same pair set as the naive join on this fixture."""
    naive = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(zipf).collect()
    }
    prefix = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in D.jaccard_pairs_prefix(zipf).collect()
    }
    assert prefix == naive
    ids = {r["doc_id"] for r in zipf.select("doc_id").collect()}
    planted = {
        (d - D.ZIPF_DUP_RES, d)
        for d in ids
        if d % D.ZIPF_DUP_MOD == D.ZIPF_DUP_RES
        and d - D.ZIPF_DUP_RES in ids
    }
    found_planted = planted & set(naive)
    # ~3% token edits keep most planted pairs above τ=0.5; docs shorter
    # than the shingle width or with skewed lengths may drop out
    assert len(found_planted) >= 0.3 * len(planted)
    assert all(naive[p] >= D.JACCARD_THRESHOLD for p in found_planted)


def test_zipf_prefix_filter_prunes_candidates(zipf):
    """The design-regime claim itself: on the Zipf corpus the prefix
    join must examine far fewer candidate pairs than the naive Σdf²."""
    stats: dict = {}
    D.jaccard_pairs_prefix(zipf, candidate_stats=stats).count()
    sh = D.shingles(zipf).groupBy("shingle").count()
    naive_candidates = sh.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c")
    ).head()["c"]
    assert stats["candidates"] < 0.2 * naive_candidates


def test_zipf_oracles(spark, docs, con):
    assert_matches_oracle(
        D.zipf_documents(docs), con, D.ZIPF_DOCUMENTS_SQL
    )


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_SMOKE)


def test_containment_prefix_exact_parity_and_pruning(spark, zipf):
    """The one-sided prefix bound loses nothing: identical ordered pair
    set (values included) to the naive containment join on the Zipf
    fixture, at a fraction of the candidates."""
    naive = {
        (r["contained_doc"], r["container_doc"]): r["containment"]
        for r in D.containment_pairs(zipf).collect()
    }
    stats: dict = {}
    prefix = {
        (r["contained_doc"], r["container_doc"]): r["containment"]
        for r in D.containment_pairs_prefix(
            zipf, candidate_stats=stats
        ).collect()
    }
    assert prefix == naive and len(naive) > 0
    sh = D.shingles(zipf).groupBy("shingle").count()
    naive_candidates = sh.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c")
    ).head()["c"]
    assert stats["candidates"] < 0.2 * naive_candidates


def test_containment_prefix_finds_doc_in_doc(spark):
    """The quote-amplification mode containment exists for: a 4-token
    'tweet' fully embedded in a 40-token 'article' has Jaccard ~0.05
    (invisible to the symmetric rung) but containment 1.0 — and the
    tweet's rare-shingle prefix must surface it."""
    tweet = "quux corge grault garply"
    filler = " ".join(f"tok{i}" for i in range(36))
    rows = [
        (1, tweet, "en", "s0", len(tweet)),
        (2, filler + " " + tweet, "en", "s0", 100),
        (3, "unrelated words entirely different", "en", "s0", 30),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r["contained_doc"], r["container_doc"]): r["containment"]
        for r in D.containment_pairs_prefix(docs).collect()
    }
    assert got[(1, 2)] == 1.0
    assert (2, 1) not in got  # direction matters
    jac = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in D.ngram_jaccard_pairs(docs).collect()
    }
    assert (1, 2) not in jac  # symmetric Jaccard misses it
