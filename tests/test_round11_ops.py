"""Round-11 extension semantics: curriculum ordering, session training
pairs, cluster-balanced sampling."""

from __future__ import annotations

from datetime import datetime

from music_streaming_etl_glue_spark.operators import behavior as B
from music_streaming_etl_glue_spark.operators import similarity as S
from music_streaming_etl_glue_spark.operators import text as T


# ---------------------------------------------------------------------------
# curriculum_order
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curriculum_phases_follow_quality_terciles(spark):
    # 3 quality tiers x 3 docs: long diverse text with stopwords (high),
    # medium, and a one-word stutter (low)
    hi = "the quick brown fox jumps over a lazy dog and then it runs far " * 4
    mid = "some words repeat here some words repeat here extra tail"
    lo = "spam spam spam spam"
    rows = [(i, hi) for i in range(3)]
    rows += [(10 + i, mid) for i in range(3)]
    rows += [(20 + i, lo) for i in range(3)]
    out = T.curriculum_order(_docs(spark, rows)).collect()
    phase = {r["doc_id"]: r["phase"] for r in out}
    assert {phase[i] for i in range(3)} == {1}
    assert {phase[10 + i] for i in range(3)} == {2}
    assert {phase[20 + i] for i in range(3)} == {3}


def test_curriculum_order_is_append_stable_within_shard(spark):
    base = [(i, f"alpha beta gamma delta {i} of the and to in") for i in range(40)]
    first = {
        (r["phase"], r["shard"]): []
        for r in T.curriculum_order(_docs(spark, base)).collect()
    }
    for r in sorted(
        T.curriculum_order(_docs(spark, base)).collect(),
        key=lambda r: (r["phase"], r["shard"], r["pos"]),
    ):
        first[(r["phase"], r["shard"])].append(r["doc_id"])
    # appending new docs must not reorder existing docs relative to each
    # other inside any (phase, shard)
    extra = base + [
        (100 + i, f"alpha beta gamma delta {i} of the and to in")
        for i in range(10)
    ]
    second = {k: [] for k in first}
    for r in sorted(
        T.curriculum_order(_docs(spark, extra)).collect(),
        key=lambda r: (r["phase"], r["shard"], r["pos"]),
    ):
        second.setdefault((r["phase"], r["shard"]), []).append(r["doc_id"])
    for k, order in first.items():
        survivors = [d for d in second.get(k, []) if d < 100]
        assert survivors == order


# ---------------------------------------------------------------------------
# session_training_pairs
# ---------------------------------------------------------------------------

def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 12, minute, second)


def test_session_pairs_context_never_crosses_session_boundary(spark):
    rows = [
        (1, _ts(0), 7, "view"),
        (2, _ts(1), 7, "click"),
        (3, _ts(2), 7, "purchase"),
        # 40-min gap -> new session: context restarts
        (4, _ts(42), 7, "view"),
        (5, _ts(43), 7, "error"),
    ]
    out = {
        r["example_id"]: r
        for r in B.session_training_pairs(_events(spark, rows)).collect()
    }
    # first event of each session has no context -> no example
    assert set(out) == {2, 3, 5}
    assert out[2]["context"] == "view" and out[2]["label"] == "click"
    assert out[3]["context"] == "view click" and out[3]["label"] == "purchase"
    assert out[5]["context"] == "view" and out[5]["label"] == "error"
    assert out[5]["session_seq"] == 2


def test_session_pairs_context_is_capped_at_k(spark):
    rows = [
        (i, _ts(0, i), 7, t)
        for i, t in enumerate(["a", "b", "c", "d", "e"], start=1)
    ]
    out = {
        r["example_id"]: r["context"]
        for r in B.session_training_pairs(_events(spark, rows), k=3).collect()
    }
    assert out[5] == "b c d"  # only the 3 nearest predecessors
    assert out[2] == "a"


# ---------------------------------------------------------------------------
# cluster_balanced_sample
# ---------------------------------------------------------------------------

def _embs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_cluster_balanced_sample_caps_every_cell(spark):
    # two well-separated cells: label 0 near (0,0), label 1 near (9,9);
    # cell 0 is 6x oversubscribed, cell 1 under the cap
    rows = [(i, [0.0 + (i % 3) * 0.01, 0.0], 0) for i in range(30)]
    rows += [(100 + i, [9.0, 9.0 + (i % 2) * 0.01], 1) for i in range(3)]
    out = S.cluster_balanced_sample(_embs(spark, rows), cap=5).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["assigned_label"], []).append(r)
    assert len(by_cell[0]) == 5  # capped
    assert len(by_cell[1]) == 3  # kept whole
    assert {r["cluster_size"] for r in by_cell[0]} == {30}
    assert sorted(r["samp_rank"] for r in by_cell[0]) == [1, 2, 3, 4, 5]


def test_cluster_balanced_sample_is_deterministic(spark):
    rows = [(i, [float(i % 4), float(i % 7)], i % 2) for i in range(40)]
    a = sorted(
        (r["vec_id"], r["samp_rank"])
        for r in S.cluster_balanced_sample(_embs(spark, rows), cap=8).collect()
    )
    b = sorted(
        (r["vec_id"], r["samp_rank"])
        for r in S.cluster_balanced_sample(_embs(spark, rows), cap=8).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# purchase_attribution
# ---------------------------------------------------------------------------

def test_purchase_attribution_credits_session_first_and_last_touch(spark):
    rows = [
        (1, _ts(0), 7, "view"),
        (2, _ts(1), 7, "click"),
        (3, _ts(2), 7, "purchase"),
        # new session: purchase is its FIRST event -> no attribution
        (4, _ts(50), 7, "purchase"),
        (5, _ts(51), 7, "click"),
        (6, _ts(52), 7, "purchase"),
    ]
    out = {
        r["purchase_event_id"]: r
        for r in B.purchase_attribution(_events(spark, rows)).collect()
    }
    assert set(out) == {3, 6}  # event 4 opened its session: excluded
    assert out[3]["first_touch"] == "view"
    assert out[3]["last_touch"] == "click"
    assert out[3]["steps_to_purchase"] == 2
    # second session's first-touch is the earlier purchase itself
    assert out[6]["first_touch"] == "purchase"
    assert out[6]["last_touch"] == "click"


# ---------------------------------------------------------------------------
# quality_kill_report
# ---------------------------------------------------------------------------

def test_quality_kill_report_counts_sole_kills(spark):
    ok = "the quick brown fox jumps over a lazy dog and then it runs far " * 2
    # fails ONLY the repetition rule: enough tokens, stopwords, and sane
    # token lengths, but one token dominating > 20% of the document
    rep = ("the and of to in is it " + "spam " * 12 + "alpha beta gamma "
           "delta epsilon zeta eta theta iota kappa")
    docs = _docs(spark, [(1, ok), (2, ok), (3, rep)])
    rows = {r["rule"]: r for r in T.quality_kill_report(docs).collect()}
    assert set(rows) == {
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_stopwords",
        "rule_repetition",
    }
    assert rows["rule_repetition"]["kills"] == 1
    assert rows["rule_repetition"]["sole_kills"] == 1
    assert all(r["keep_rate"] == rows["rule_repetition"]["keep_rate"]
               for r in rows.values())


# ---------------------------------------------------------------------------
# source forensics (operators.dedup)
# ---------------------------------------------------------------------------

def _src_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_source_overlap_matrix_catches_verbatim_cross_feed_content(spark):
    from music_streaming_etl_glue_spark.operators import dedup as D

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, shared, "feed_a"),
        (2, shared + " eta theta", "feed_b"),       # verbatim overlap
        (3, "one two three four five six", "feed_c"),  # disjoint
    ]
    out = {
        (r["source_a"], r["source_b"]): r
        for r in D.source_overlap_matrix(_src_docs(spark, rows)).collect()
    }
    ab = out[("feed_a", "feed_b")]
    assert ab["shared_shingles"] == 4  # the 4 shingles of the shared span
    assert ab["jaccard"] > 0.5
    assert ("feed_a", "feed_c") not in out  # zero overlap -> no row


def test_near_dup_rate_by_source_flags_the_syndicating_feed(spark):
    from music_streaming_etl_glue_spark.operators import dedup as D

    rows = [
        (1, "unique text number one here", "clean"),
        (2, "unique text number two here", "clean"),
        (3, "the same syndicated story", "spammy"),
        (4, "the same syndicated story", "spammy"),   # internal dup
        (5, "the same syndicated story", "clean"),    # cross-feed dup
    ]
    out = {r["source"]: r for r in
           D.near_dup_rate_by_source(_src_docs(spark, rows)).collect()}
    assert out["spammy"]["n_dup_docs"] == 2
    assert out["spammy"]["n_cross_source_dup_docs"] == 2
    assert out["clean"]["n_docs"] == 3
    assert out["clean"]["n_dup_docs"] == 1  # doc 5 sits in the dup group
    assert out["clean"]["dup_rate"] == 0.333333


def test_minhash_blocking_audit_detects_a_planted_miss(spark):
    from music_streaming_etl_glue_spark.operators import dedup as D

    # near-dup pair (high jaccard) + unrelated docs
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = a + " extra"
    rows = [(1, a), (2, b)] + [
        (10 + i, f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f") for i in range(8)
    ]
    row = D.minhash_blocking_audit(_docs(spark, rows)).collect()[0]
    assert row["n_true_pairs"] == 1
    assert row["pair_recall"] == 1.0  # bands must surface the planted pair
    assert row["n_candidates"] < 45  # far below C(10,2) exhaustive
    assert row["reduction_ratio"] > 0.0
