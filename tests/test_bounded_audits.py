"""Bounded driver checks for the approx/sketch catalog entries
(VERDICT r11 item #8): each audit emits exact aggregates (the oracle
reproduces them) plus within-envelope booleans (the oracle asserts
TRUE). These tests pin BOTH directions: the flags are True under the
shipped bounds on real data, and they FLIP to False when the bound is
tightened below the sketch's actual error — i.e. the check has teeth;
a broken sketch cannot sail through as a hash match."""

from __future__ import annotations

from music_streaming_etl_glue_spark.operators import analytics as A
from music_streaming_etl_glue_spark.operators import kpis as K
from music_streaming_etl_glue_spark.operators import relational as R
from music_streaming_etl_glue_spark.operators import text as Tx
from music_streaming_etl_glue_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


def _enriched(spark):
    from music_streaming_etl_glue_spark.operators.enrich import enrich_events

    return enrich_events(
        load_table(spark, SF, "events"),
        load_table(spark, SF, "customer"),
        load_table(spark, SF, "nation"),
    )


def test_genre_daily_hll_audit_flags_true_and_have_teeth(spark):
    en = _enriched(spark)
    rows = K.genre_daily_metrics_approx_audit(en).collect()
    assert rows and all(r["hll_within_bound"] for r in rows)
    # zero-width envelope: only groups where HLL happened to be exact
    # stay True; at sf0.01 the measured worst case is 4.1%, so at least
    # one group must flip — proving the flag is derived, not constant
    tight = K.genre_daily_metrics_approx_audit(
        en, rel_bound=0.0, abs_slack=0
    ).collect()
    assert any(not r["hll_within_bound"] for r in tight)


def test_sketch_rollup_audit_and_overlap_audit(spark):
    en = _enriched(spark)
    roll = K.genre_distinct_sketch_rollup_audit(en).collect()
    assert roll and all(r["sketch_within_bound"] for r in roll)
    ov = K.audience_overlap_audit(en).collect()
    assert ov and all(r["ie_within_bound"] for r in ov)
    # exact columns really are exact: recompute one genre's distinct
    exact = {
        r["track_genre"]: r["exact_unique_listeners"] for r in roll
    }
    en.createOrReplaceTempView("_aud_en")
    g, n = next(iter(exact.items()))
    got = spark.sql(
        "SELECT COUNT(DISTINCT user_id) c FROM _aud_en "
        f"WHERE track_genre = '{g}'"
    ).collect()[0]["c"]
    assert got == n


def test_value_percentiles_rank_audit(spark):
    events = load_table(spark, SF, "events")
    rows = A.value_percentiles_approx_audit(events).collect()
    # full grid: one row per (event_type, percentile)
    n_types = events.select("event_type").distinct().count()
    assert len(rows) == n_types * len(A.PERCENTILES)
    assert all(r["within_rank_bound"] for r in rows)
    # teeth: a sketch too coarse for a tight epsilon must flip flags
    coarse = A.value_percentiles_approx_audit(
        events, accuracy=2, eps_mult=0.0
    ).collect()
    assert any(not r["within_rank_bound"] for r in coarse)


def test_rfm_rank_audit(spark):
    orders = load_table(spark, SF, "orders")
    rows = R.customer_rfm_segments_approx_audit(orders).collect()
    assert len(rows) == 12  # 3 dimensions x 4 quintile cuts
    assert all(r["within_rank_bound"] for r in rows)
    n = orders.select("o_custkey").distinct().count()
    assert all(r["n_customers"] == n for r in rows)
    coarse = R.customer_rfm_segments_approx_audit(
        orders, accuracy=2, eps_mult=0.0
    ).collect()
    assert any(not r["within_rank_bound"] for r in coarse)


def test_vocab_audit_one_row_and_teeth(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    row = Tx.vocab_top_terms_approx_audit(docs).collect()
    assert len(row) == 1
    r = row[0]
    assert r["in_exact_topk"] and r["counts_within_bound"]
    assert r["k_returned"] >= 1 and r["n_tokens"] > 0
    # teeth: a synthetic long-tail vocabulary with capacity == k makes
    # the space-saving sketch over-count evicted mass — the zero-width
    # count envelope must flip (capacity must stay >= k, Spark enforces)
    wide = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(i % 97, i % 97 + 30)))
         for i in range(400)],
        "doc_id long, text string",
    )
    broken = Tx.vocab_top_terms_approx_audit(
        wide, k=5, capacity=5, rank_slack=0, count_rel=0.0, count_abs=0
    ).collect()[0]
    assert not (
        broken["in_exact_topk"] and broken["counts_within_bound"]
    )


def test_pca_audit_anchors_and_flag_teeth(spark):
    import numpy as np
    from music_streaming_etl_glue_spark.operators import similarity as S

    embs = load_table(spark, SF, "embeddings")
    row = S.pca_explained_variance_audit(embs).collect()[0]
    assert row["fractions_in_unit"] and row["monotone_nonincreasing"]
    assert row["topk_fraction_le_1"] and row["eigensum_matches_trace"]
    # the integer anchors really are the quantized sums (recompute one)
    vecs = np.stack(
        [np.array(r["embedding"]) for r in embs.limit(50).collect()]
    )
    q = np.floor(vecs * S.Q_SCALE + 0.5).astype("int64")
    assert row["n_vectors"] == embs.count()
    assert int(row["gram_trace"]) > int((q * q).sum())  # 50-row lower bound
    # teeth: an impossible tolerance flips the derived flags
    broken = S.pca_explained_variance_audit(embs, tol=-1.0).collect()[0]
    assert not broken["fractions_in_unit"]


def test_dtw_audit_flags_and_teeth(spark):
    from music_streaming_etl_glue_spark.operators import behavior as B

    events = load_table(spark, SF, "events")
    rows = B.genre_series_dtw_audit(events).collect()
    n_genres = events.filter("event_type IS NOT NULL").select(
        "event_type"
    ).distinct().count()
    assert len(rows) == n_genres * (n_genres - 1) // 2
    assert all(r["dtw_nonneg"] and r["dtw_le_diagonal"] for r in rows)
    assert len({r["n_days"] for r in rows}) == 1  # shared dense calendar
    # teeth: an impossible tolerance flips the derived flags
    broken = B.genre_series_dtw_audit(events, tol=-1e9).collect()
    assert all(not r["dtw_nonneg"] for r in broken)


def test_bpe_audit_first_merge_and_structure(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    row = Tx.train_bpe_merges_audit(docs).collect()[0]
    assert row["emitted_all"] and row["merged_is_concat"]
    assert row["counts_positive"] and row["steps_contiguous"]
    # the first merge really is the corpus' top character bigram: it
    # must match the trainer's own first rule
    first = Tx.train_bpe_merges(docs).orderBy("step").limit(1).collect()[0]
    assert (row["first_left"], row["first_right"], row["first_count"]) == (
        first["left"], first["right"], first["pair_count"]
    )
