"""Round-6 operators: SoftDeDup reweighting, quality-aware near-dedup
representative selection, LSH-pruned multi-query knn + its recall audit.
Each op gets a semantic property test plus the DuckDB-oracle parity check
(the same compare the driver's correctness gate runs)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import clusters as C
from music_streaming_etl_glue_spark.operators import dedup as D
from music_streaming_etl_glue_spark.operators import similarity as S
from music_streaming_etl_glue_spark.operators.text import text_quality

from tests.conftest import SF_SMOKE
from tests.oracle_util import duckdb_con, assert_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_SMOKE)


# ---------------------------------------------------------------------------
# soft_dedup_weights
# ---------------------------------------------------------------------------

def test_soft_dedup_mass_preservation(spark, docs):
    """Every distinct text contributes total weight 1 — the defining
    SoftDeDup invariant — and every source row survives."""
    out = D.soft_dedup_weights(docs)
    n_rows = docs.count()
    assert out.count() == n_rows
    total_w = out.agg(F.round(F.sum("weight"), 6).alias("w")).head()[0]
    n_distinct = docs.select(F.md5("text")).distinct().count()
    assert total_w == pytest.approx(n_distinct, abs=1e-4)


def test_soft_dedup_duplicated_text_downweighted(spark):
    rows = [(1, "alpha beta", "en", "s0", 10),
            (2, "alpha beta", "en", "s0", 10),
            (3, "gamma", "en", "s1", 5)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["doc_id"]: r for r in D.soft_dedup_weights(df).collect()}
    assert got[1]["dup_count"] == 2 and got[1]["weight"] == 0.5
    assert got[2]["weighted_chars"] == 5.0
    assert got[3]["dup_count"] == 1 and got[3]["weight"] == 1.0


def test_soft_dedup_oracle(docs, con):
    assert_matches_oracle(
        D.soft_dedup_weights(docs), con, D.SOFT_DEDUP_WEIGHTS_SQL
    )


# ---------------------------------------------------------------------------
# near_dedup_apply_best
# ---------------------------------------------------------------------------

def test_near_dedup_best_picks_max_quality(spark, docs):
    """The kept doc_id per cluster is the argmax of rounded quality_score
    (ties → min doc_id), verified against an independent join."""
    best = C.near_dedup_apply_best(docs)
    clusters = C.dedup_clusters(docs)
    q = text_quality(docs).select(
        "doc_id", F.round("quality_score", 9).alias("q")
    )
    members = clusters.join(q, "doc_id")
    expected = (
        members.groupBy("cluster_id")
        .agg(F.max_by("doc_id", F.struct(F.col("q"), -F.col("doc_id"))).alias(
            "want_doc"
        ))
    )
    joined = best.join(expected, "cluster_id")
    assert joined.filter(F.col("doc_id") != F.col("want_doc")).count() == 0
    # exactly one representative per cluster
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert best.count() == n_clusters


def test_near_dedup_best_oracle(docs, con):
    assert_matches_oracle(
        C.near_dedup_apply_best(docs), con, C.NEAR_DEDUP_APPLY_BEST_SQL
    )


# ---------------------------------------------------------------------------
# knn_join_lsh + knn_recall_audit
# ---------------------------------------------------------------------------

def test_knn_lsh_is_subset_with_exact_scores(spark, embs):
    """Every LSH-knn hit scores identically to the exact scorer (the LSH
    stage prunes candidates, never perturbs similarities), per-query
    result size is ≤ k, and ranks are 1..n without gaps."""
    lsh = S.knn_join_lsh(embs).collect()
    per_q: dict[int, list] = {}
    for r in lsh:
        per_q.setdefault(r["query_id"], []).append(r)
    exact_scores = {
        (r["query_id"], r["vec_id"]): r["similarity"]
        for r in S.knn_join(embs, k=10**6).collect()
    }
    for qid, rows in per_q.items():
        assert len(rows) <= S.KNN_K
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        for r in rows:
            assert r["similarity"] == exact_scores[(qid, r["vec_id"])]


def test_knn_recall_audit_consistency(spark, embs):
    """n_hits equals the independently computed overlap of the exact and
    approximate id sets; recall is n_hits/n_exact in [0, 1]."""
    audit = {r["query_id"]: r for r in S.knn_recall_audit(embs).collect()}
    exact = S.knn_join(embs).collect()
    approx = S.knn_join_lsh(embs).collect()
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    overlap: dict[int, int] = {}
    for r in exact:
        if (r["query_id"], r["vec_id"]) in ap:
            overlap[r["query_id"]] = overlap.get(r["query_id"], 0) + 1
    assert len(audit) == S.KNN_N_QUERIES
    for qid, row in audit.items():
        assert row["n_hits"] == overlap.get(qid, 0)
        assert 0.0 <= row["recall_at_k"] <= 1.0
        assert row["n_hits"] <= row["n_exact"]


def test_knn_lsh_oracle(embs, con):
    assert_matches_oracle(S.knn_join_lsh(embs), con, S.KNN_JOIN_LSH_SQL)


def test_knn_recall_audit_oracle(embs, con):
    assert_matches_oracle(
        S.knn_recall_audit(embs), con, S.KNN_RECALL_AUDIT_SQL
    )

# ---------------------------------------------------------------------------
# join_skew_report
# ---------------------------------------------------------------------------

def test_join_skew_report_semantics(spark):
    from music_streaming_etl_glue_spark.plans.layout import join_skew_report

    rows = [(i, "hot" if i < 80 else f"k{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, user_id string")
    out = join_skew_report(df, "user_id", top_n=3).collect()
    assert len(out) == 3
    top = out[0]
    assert top["key"] == "hot" and top["key_rows"] == 80
    assert top["row_share"] == pytest.approx(0.8)
    # 21 keys, mean 100/21 ≈ 4.76, skew = 80/4.76 = 16.8 → salt 17
    assert top["skew_ratio"] == pytest.approx(16.8)
    assert top["recommended_salt"] == 17
    # the ratio columns repeat identically on every row
    assert {r["recommended_salt"] for r in out} == {17}


def test_join_skew_report_oracle(spark, con):
    from music_streaming_etl_glue_spark.plans.layout import (
        JOIN_SKEW_REPORT_SQL,
        join_skew_report,
    )

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert_matches_oracle(
        join_skew_report(events, "user_id"), con, JOIN_SKEW_REPORT_SQL
    )


# ---------------------------------------------------------------------------
# bpe_roundtrip
# ---------------------------------------------------------------------------

def test_bpe_roundtrip_all_ok(spark, docs):
    """BPE merges only concatenate adjacent symbols — decode must be the
    identity on every document."""
    from music_streaming_etl_glue_spark.operators.text import bpe_roundtrip

    out = bpe_roundtrip(docs)
    assert out.filter(~F.col("roundtrip_ok")).count() == 0
    assert out.count() == docs.count()
    # merged symbols mean strictly fewer symbols than characters for at
    # least some docs (the merges fire), never more
    bad = out.join(
        docs.select("doc_id", F.length("text").alias("n_chars_t")), "doc_id"
    ).filter(F.col("n_symbols") > F.col("n_chars_t"))
    assert bad.count() == 0


def test_bpe_roundtrip_oracle(docs, con):
    from music_streaming_etl_glue_spark.operators.text import (
        BPE_ROUNDTRIP_SQL,
        bpe_roundtrip,
    )

    assert_matches_oracle(bpe_roundtrip(docs), con, BPE_ROUNDTRIP_SQL)


# ---------------------------------------------------------------------------
# nb_source_classifier
# ---------------------------------------------------------------------------

def test_nb_classifier_matches_sklearn_style_reference(spark):
    """Hand-computable corpus: NB must assign each training doc to the
    source whose token distribution it matches, and the smoothed
    log-likelihood must equal the closed-form value."""
    import math

    rows = [
        (1, "cat cat dog", "en", "pets", 11),
        (2, "cat cat cat", "en", "pets", 11),
        (3, "stock bond stock", "en", "finance", 16),
        (4, "bond bond yield", "en", "finance", 15),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from music_streaming_etl_glue_spark.operators.text import (
        nb_source_classifier,
    )

    got = {r["doc_id"]: r for r in nb_source_classifier(df).collect()}
    assert got[1]["predicted_source"] == "pets" and got[1]["correct"]
    assert got[3]["predicted_source"] == "finance" and got[3]["correct"]
    # closed form for doc 1 under 'pets': V=5, tot=6;
    # ln(P) = 2*ln((5+1)/(6+5)) + ln((1+1)/(6+5)) + ln(2/4)
    want = round(
        2 * round(math.log(6 / 11), 12)
        + round(math.log(2 / 11), 12)
        + round(math.log(2 / 4), 12),
        6,
    )
    assert got[1]["score"] == pytest.approx(want, abs=1e-6)


def test_nb_classifier_all_docs_classified_once(spark, docs):
    from music_streaming_etl_glue_spark.operators.text import (
        nb_source_classifier,
    )

    out = nb_source_classifier(docs)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_nb_classifier_oracle(docs, con):
    from music_streaming_etl_glue_spark.operators.text import (
        NB_SOURCE_CLASSIFIER_SQL,
        nb_source_classifier,
    )

    assert_matches_oracle(
        nb_source_classifier(docs), con, NB_SOURCE_CLASSIFIER_SQL
    )


# ---------------------------------------------------------------------------
# split_leakage_audit
# ---------------------------------------------------------------------------

def test_split_leakage_detects_planted_dup(spark):
    """A doc whose text duplicates a train-split doc must flag
    exact_leak; a fully novel-vocabulary eval doc must not."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        dataset_split,
        split_leakage_audit,
    )

    # find ids landing in train vs eval under the hash split
    base = [(i, f"w{i}a w{i}b w{i}c w{i}d", "en", "s", 20) for i in range(40)]
    df0 = spark.createDataFrame(
        base, "doc_id long, text string, lang string, source string, n_chars long"
    )
    splits = {r["doc_id"]: r["split"] for r in dataset_split(df0).collect()}
    train_ids = [i for i, s in splits.items() if s == "train"]
    eval_ids = [i for i, s in splits.items() if s != "train"]
    assert train_ids and len(eval_ids) >= 2
    # plant: eval_ids[0] copies a train doc's text; eval_ids[1] keeps
    # its unique vocabulary
    rows = []
    for i, text, lang, src, nc in base:
        if i == eval_ids[0]:
            text = base[train_ids[0]][1]
        rows.append((i, text, lang, src, nc))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["doc_id"]: r for r in split_leakage_audit(df).collect()}
    assert set(got) == set(eval_ids)
    assert got[eval_ids[0]]["exact_leak"] and got[eval_ids[0]]["leaky"]
    assert got[eval_ids[0]]["shared_shingles"] > 0
    clean = got[eval_ids[1]]
    assert not clean["exact_leak"] and clean["shared_shingles"] == 0
    assert not clean["leaky"]


def test_split_leakage_oracle(docs, con):
    from music_streaming_etl_glue_spark.operators.dedup import (
        SPLIT_LEAKAGE_AUDIT_SQL,
        split_leakage_audit,
    )

    assert_matches_oracle(
        split_leakage_audit(docs), con, SPLIT_LEAKAGE_AUDIT_SQL
    )


# ---------------------------------------------------------------------------
# bpe_fertility
# ---------------------------------------------------------------------------

def test_bpe_fertility_semantics(spark):
    """Closed-form corpus: with no applicable merges fertility equals
    chars per word; with a full-word merge it drops to 1 symbol/word."""
    from music_streaming_etl_glue_spark.operators.text import bpe_fertility

    rows = [(1, "ab ab", "en", "s0", 5), (2, "cd", "en", "s1", 2)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["source"]: r for r in bpe_fertility(df, merges=(("a", "b"),)).collect()}
    # 'ab' merges to one symbol -> fertility 1.0; 'cd' stays 2 chars
    assert got["s0"]["n_words"] == 2 and got["s0"]["fertility"] == 1.0
    assert got["s0"]["chars_per_symbol"] == 2.0
    assert got["s1"]["n_words"] == 1 and got["s1"]["fertility"] == 2.0
    assert got["s1"]["chars_per_symbol"] == 1.0


def test_bpe_fertility_oracle(docs, con):
    from music_streaming_etl_glue_spark.operators.text import (
        BPE_FERTILITY_SQL,
        bpe_fertility,
    )

    assert_matches_oracle(bpe_fertility(docs), con, BPE_FERTILITY_SQL)


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------

def test_containment_catches_doc_in_doc(spark):
    """A short doc quoted inside a long one has near-zero Jaccard but
    containment 1.0 — the directional metric must flag it, in the
    contained->container direction only."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta"
    filler = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, short, "en", "s", 22),
        (2, f"{filler} {short}", "en", "s", 200),
        (3, "x1 x2 x3 x4 x5", "en", "s", 14),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = containment_pairs(df).collect()
    pairs = {(r["contained_doc"], r["container_doc"]): r["containment"] for r in got}
    assert pairs[(1, 2)] == 1.0            # every shingle of 1 is in 2
    assert (2, 1) not in pairs             # the long doc is not contained
    assert (3, 1) not in pairs and (1, 3) not in pairs
    # symmetric Jaccard misses the same pair at its default threshold
    j = ngram_jaccard_pairs(df).collect()
    assert not any({r["doc_id_a"], r["doc_id_b"]} == {1, 2} for r in j)


def test_containment_oracle(docs, con):
    from music_streaming_etl_glue_spark.operators.dedup import (
        CONTAINMENT_PAIRS_SQL,
        containment_pairs,
    )

    assert_matches_oracle(
        containment_pairs(docs), con, CONTAINMENT_PAIRS_SQL
    )


def test_containment_shingle_df_cap(spark):
    """The hot-shingle cap drops corpus-boilerplate shingles before the
    pair join; capped containment is computed over the FILTERED sets."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        containment_pairs,
    )

    hot = "the quick brown"  # one shared 3-shingle across every doc
    rows = [(i, f"{hot} u{i}a u{i}b", "en", "s", 30) for i in range(6)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # uncapped: every pair shares the hot shingle -> containment 1/3 < 0.8,
    # no pairs pass; with threshold 0.3 all ordered pairs appear
    assert containment_pairs(df, threshold=0.3).count() == 30
    # cap df at 5: the 6-doc hot shingle is dropped, no candidates remain
    assert containment_pairs(df, threshold=0.3, max_shingle_df=5).count() == 0


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------

def test_winnowing_guarantee(spark):
    """MOSS guarantee: two docs sharing a substring of length >= w+k-1
    (= 11 chars at the defaults) must share at least one fingerprint;
    density stays near 2/(w+1)."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnowing_fingerprints,
    )

    shared_run = "zqxjvwpbyk mf"  # 13 chars > w+k-1, vocab-disjoint
    rows = [
        (1, f"aaaa bbbb {shared_run} cccc", "en", "s", 30),
        (2, f"dddd eeee ffff {shared_run}", "en", "s", 30),
        (3, "gggg hhhh iiii jjjj kkkk llll", "en", "s", 30),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fps = winnowing_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    # density: selected fingerprints per k-gram position ~ 2/(w+1),
    # loose upper bound 2x to stay robust on short strings
    n_kgrams = len(rows[2][1]) - (WINNOW_K - 1)
    assert len(by_doc[3]) <= 2 * (2 / (WINNOW_W + 1)) * n_kgrams


def test_winnow_near_dups_selective(spark, docs):
    """On the boilerplate-heavy synthetic corpus the normalized-overlap
    miner must flag a tiny fraction of all pairs, and every flagged pair
    must meet the threshold."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        WINNOW_OVERLAP_THRESHOLD,
        winnow_near_dups,
    )

    pairs = winnow_near_dups(docs).collect()
    n = docs.count()
    assert 0 < len(pairs) < 0.01 * n * (n - 1) / 2
    assert all(r["overlap"] >= WINNOW_OVERLAP_THRESHOLD for r in pairs)


def test_winnowing_oracle(docs, con):
    from music_streaming_etl_glue_spark.operators.dedup import (
        WINNOWING_FINGERPRINTS_SQL,
        WINNOW_NEAR_DUPS_SQL,
        winnow_near_dups,
        winnowing_fingerprints,
    )

    assert_matches_oracle(
        winnowing_fingerprints(docs), con, WINNOWING_FINGERPRINTS_SQL
    )
    assert_matches_oracle(winnow_near_dups(docs), con, WINNOW_NEAR_DUPS_SQL)


# ---------------------------------------------------------------------------
# hostile inputs for the round-6 ops (empty relations, degenerate docs)
# ---------------------------------------------------------------------------

FULL_DOCS_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def test_round6_ops_on_empty_docs(spark):
    from music_streaming_etl_glue_spark.operators.text import (
        bpe_fertility,
        bpe_roundtrip,
        nb_source_classifier,
    )
    from music_streaming_etl_glue_spark.plans.layout import join_skew_report

    empty = spark.createDataFrame([], FULL_DOCS_DDL)
    assert D.soft_dedup_weights(empty).count() == 0
    assert D.containment_pairs(empty).count() == 0
    assert D.winnowing_fingerprints(empty).count() == 0
    assert D.winnow_near_dups(empty).count() == 0
    assert D.split_leakage_audit(empty).count() == 0
    assert bpe_roundtrip(empty).count() == 0
    assert bpe_fertility(empty).count() == 0
    assert nb_source_classifier(empty).count() == 0
    assert join_skew_report(empty, "source").count() == 0


def test_round6_ops_on_degenerate_docs(spark):
    """Single doc, text shorter than the k-gram/shingle widths: every op
    must return a sane (usually empty-pairs) result, never crash."""
    from music_streaming_etl_glue_spark.operators.text import (
        bpe_fertility,
        bpe_roundtrip,
    )

    tiny = spark.createDataFrame(
        [(1, "ab", "en", "s0", 2)], FULL_DOCS_DDL
    )
    assert D.winnowing_fingerprints(tiny).count() == 0  # < k chars
    assert D.winnow_near_dups(tiny).count() == 0
    assert D.containment_pairs(tiny).count() == 0       # < n tokens
    w = D.soft_dedup_weights(tiny).head()
    assert w["dup_count"] == 1 and w["weight"] == 1.0
    rt = bpe_roundtrip(tiny).head()
    assert rt["roundtrip_ok"]
    f = bpe_fertility(tiny).head()
    assert f["n_words"] == 1


# ---------------------------------------------------------------------------
# knn_join_ivfpq + knn_ivfpq_recall_audit
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ivfpq_path(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ivfpq_knn") / "layout")


def test_knn_ivfpq_contract(spark, embs, ivfpq_path):
    """Per-query result size <= k, gapless ranks, rescored similarities
    equal the exact scorer's (the funnel prunes, never perturbs the
    final scores)."""
    out = S.knn_join_ivfpq(spark, embs, ivfpq_path).collect()
    per_q: dict[int, list] = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    exact_scores = {
        (r["query_id"], r["vec_id"]): r["similarity"]
        for r in S.knn_join(embs, k=10**6).collect()
    }
    for qid, rows in per_q.items():
        assert len(rows) <= S.KNN_K
        assert sorted(r["rank"] for r in rows) == list(
            range(1, len(rows) + 1)
        )
        for r in rows:
            assert r["similarity"] == exact_scores[(qid, r["vec_id"])]


def test_knn_ivfpq_recall_consistency(spark, embs, ivfpq_path):
    audit = {
        r["query_id"]: r
        for r in S.knn_ivfpq_recall_audit(spark, embs, ivfpq_path).collect()
    }
    assert len(audit) == S.KNN_N_QUERIES
    for row in audit.values():
        assert 0.0 <= row["recall_at_k"] <= 1.0
        assert row["n_hits"] <= row["n_exact"]


def test_knn_ivfpq_oracle(spark, embs, ivfpq_path, con):
    assert_matches_oracle(
        S.knn_join_ivfpq(spark, embs, ivfpq_path),
        con,
        S.KNN_JOIN_IVFPQ_SQL,
    )
    assert_matches_oracle(
        S.knn_ivfpq_recall_audit(spark, embs, ivfpq_path),
        con,
        S.KNN_IVFPQ_RECALL_AUDIT_SQL,
    )


def test_round6_ops_tolerate_null_text(spark):
    """A NULL text row must degrade gracefully (drop out of token and
    shingle streams), never crash a round-6 op."""
    from music_streaming_etl_glue_spark.operators.text import (
        bpe_fertility,
        bpe_roundtrip,
        nb_source_classifier,
    )

    rows = [(1, None, "en", "s0", 0),
            (2, "alpha beta gamma delta", "en", "s0", 22)]
    df = spark.createDataFrame(rows, FULL_DOCS_DDL)
    assert D.soft_dedup_weights(df).count() == 2
    assert D.containment_pairs(df).count() == 0
    assert D.winnow_near_dups(df).count() == 0
    # the NULL doc has no tokens: it vanishes from token-stream ops
    assert bpe_roundtrip(df).count() == 1
    assert bpe_fertility(df).count() == 1
    assert nb_source_classifier(df).count() == 1
    assert D.split_leakage_audit(df).count() <= 2


def test_nb_holdout_trains_only_on_train_split(spark, docs):
    """The holdout accuracy must come from a model that never saw the
    eval docs: totals are over eval docs only, accuracy in [0,1], and
    every eval-split source appears exactly once."""
    from music_streaming_etl_glue_spark.operators.dedup import dataset_split
    from music_streaming_etl_glue_spark.operators.text import (
        nb_holdout_accuracy,
    )

    out = nb_holdout_accuracy(docs).collect()
    split = dataset_split(docs).select("doc_id", "split")
    eval_docs = docs.join(split, "doc_id").filter(F.col("split") != "train")
    eval_by_source = {
        r["source"]: r["n"]
        for r in eval_docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert {r["actual_source"] for r in out} == set(eval_by_source)
    for r in out:
        assert r["n_docs"] == eval_by_source[r["actual_source"]]
        assert 0 <= r["n_correct"] <= r["n_docs"]
        assert abs(r["accuracy"] - r["n_correct"] / r["n_docs"]) < 1e-6


def test_nb_holdout_oracle(docs, con):
    from music_streaming_etl_glue_spark.operators.text import (
        NB_HOLDOUT_ACCURACY_SQL,
        nb_holdout_accuracy,
    )

    assert_matches_oracle(
        nb_holdout_accuracy(docs), con, NB_HOLDOUT_ACCURACY_SQL
    )


# ---------------------------------------------------------------------------
# hashed_doc_vectors + text_ann_topk
# ---------------------------------------------------------------------------

def test_hashed_vectors_match_python_reference(spark):
    """The hashed vector must equal the hand-computed count-sketch on a
    closed corpus, and identical texts must collide exactly."""
    import hashlib

    from music_streaming_etl_glue_spark.operators.text import (
        HASH_VEC_DIMS,
        hashed_doc_vectors,
    )

    rows = [(1, "apple banana apple", "en", "s", 18),
            (2, "apple banana apple", "en", "s", 18),
            (3, "cherry", "en", "s", 6)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    def ref(text):
        v = [0.0] * HASH_VEC_DIMS
        for tok in text.split(" "):
            h = hashlib.md5(tok.encode()).hexdigest()
            d = int(h[:15], 16) % HASH_VEC_DIMS
            v[d] += 1 if int(h[31], 16) % 2 == 1 else -1
        return v

    got = {r["doc_id"]: list(r["embedding"])
           for r in hashed_doc_vectors(df).collect()}
    assert got[1] == ref("apple banana apple")
    assert got[1] == got[2]
    assert got[3] == ref("cherry")


def test_text_ann_finds_near_duplicate_first(spark):
    """A near-identical document must rank 1 with similarity ~1."""
    from music_streaming_etl_glue_spark.operators.text import text_ann_topk

    filler = [(i, " ".join(f"z{i}w{j}" for j in range(10)), "en", "s", 50)
              for i in range(3, 10)]
    rows = [(0, "alpha beta gamma delta epsilon", "en", "s", 30),
            (1, "alpha beta gamma delta epsilon", "en", "s", 30),
            (2, "alpha beta something else here", "en", "s", 30)] + filler
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = text_ann_topk(df, query_doc=0, k=3).collect()
    assert out[0]["doc_id"] == 1 and out[0]["similarity"] == 1.0
    assert out[0]["rank"] == 1


def test_hashed_vectors_oracle(docs, con):
    from music_streaming_etl_glue_spark.operators.text import (
        HASHED_DOC_VECTORS_SQL,
        TEXT_ANN_TOPK_SQL,
        hashed_doc_vectors_packed,
        text_ann_topk,
    )

    assert_matches_oracle(
        hashed_doc_vectors_packed(docs), con, HASHED_DOC_VECTORS_SQL
    )
    assert_matches_oracle(text_ann_topk(docs), con, TEXT_ANN_TOPK_SQL)


def test_text_semantic_pairs_finds_planted_dups(spark):
    """Exact duplicate texts have identical hashed vectors (cosine 1.0):
    planted dup pairs must be mined; a vocabulary-disjoint doc must not
    pair with them."""
    from music_streaming_etl_glue_spark.operators.text import (
        text_semantic_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, base, "en", "s", 40),
        (1, base, "en", "s", 40),
        (2, base + " iota", "en", "s", 45),   # near-dup
        (3, "one two three four five six", "en", "s", 27),
    ] + [
        # diverse filler so the corpus mean is not dominated by the dup
        # cluster (centered similarity needs a representative mean)
        (i, " ".join(f"z{i}w{j}" for j in range(10)), "en", "s", 50)
        for i in range(4, 11)
    ]
    df = spark.createDataFrame(
        rows, FULL_DOCS_DDL
    )
    mined = {
        (r["doc_id_a"], r["doc_id_b"]): r["similarity"]
        for r in text_semantic_pairs(df).collect()
    }
    # exact dups keep centered cosine exactly 1.0 (identical vectors
    # shift identically under the mean)
    assert mined[(0, 1)] == 1.0
    # the vocabulary-disjoint doc never pairs at the default threshold
    assert not any(3 in p for p in mined)
    # the near-dup (one added word) survives a looser threshold but on a
    # 4-doc corpus centering is dominated by the dup cluster, so its
    # centered similarity sits BELOW the exact-dup band — exactly the
    # separation centered similarity is for
    loose = {
        (r["doc_id_a"], r["doc_id_b"]): r["similarity"]
        for r in text_semantic_pairs(df, threshold=0.8).collect()
    }
    assert (0, 2) in loose and loose[(0, 2)] < 1.0
    assert not any(3 in p for p in loose)


def test_text_semantic_pairs_oracle(docs, con):
    from music_streaming_etl_glue_spark.operators.text import (
        TEXT_SEMANTIC_PAIRS_SQL,
        text_semantic_pairs,
    )

    assert_matches_oracle(
        text_semantic_pairs(docs), con, TEXT_SEMANTIC_PAIRS_SQL
    )
