"""Round-7 operators: OHLC downsampling, MAD outlier audit, session
transition matrix, RFM segmentation, order-backlog timeline — handcrafted
semantics pins beyond the DuckDB parity the catalog gate provides."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_events_minute_ohlc_picks_by_ts_then_event_id(spark):
    """open/close come from (ts, event_id) ordering — same-timestamp ties
    break on event_id, so the bars are deterministic."""
    from music_streaming_etl_glue_spark.operators.analytics import (
        events_minute_ohlc,
    )

    t = datetime.datetime(2024, 3, 1, 10, 5, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        # same first-second tie: event 2 < 3 → open is 7.0
        (3, t, 9.0),
        (2, t, 7.0),
        (5, t + 30 * s, 1.0),
        # same last-second tie: event 9 > 8 → close is 4.0
        (8, t + 59 * s, 2.0),
        (9, t + 59 * s, 4.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    ).repartition(3)
    [bar] = events_minute_ohlc(events).collect()
    assert bar.open == 7.0
    assert bar.close == 4.0
    assert bar.high == 9.0
    assert bar.low == 1.0
    assert bar.n_events == 5
    # no window sort anywhere: the bar is one hash aggregate
    assert "Window" not in _plan(events_minute_ohlc(events))


def test_mad_outlier_audit_catches_planted_spike(spark):
    """A single huge value among tight ones is an outlier under the MAD
    gate (the case a mean/stddev gate self-masks), and a constant group
    yields mad=0 with no outliers beyond the cut."""
    from music_streaming_etl_glue_spark.operators.analytics import (
        mad_outlier_audit,
    )

    tight = [(i, "a", 10.0 + (i % 3) * 0.1) for i in range(30)]
    spike = [(100, "a", 1e6)]
    const = [(200 + i, "b", 5.0) for i in range(10)]
    events = spark.createDataFrame(
        tight + spike + const, "event_id long, event_type string, value double"
    )
    out = {r.event_type: r for r in mad_outlier_audit(events).collect()}
    assert out["a"].n_outliers == 1
    assert out["a"].n == 31
    assert out["b"].mad == 0.0
    # spike in a constant group: every deviation 0 except none — no rows
    # beyond 0 cut except deviating ones; here all equal → 0 outliers
    assert out["b"].n_outliers == 0


def test_session_transition_matrix_respects_session_gap(spark):
    """Transitions never cross the 30-min idle gap, and probabilities
    row-normalize per from_type."""
    from music_streaming_etl_glue_spark.operators.behavior import (
        session_transition_matrix,
    )

    t = datetime.datetime(2024, 3, 1, 8, 0, 0)
    m = datetime.timedelta(minutes=1)
    rows = [
        # user 1, one session: view -> click -> view
        (1, 1, "view", t),
        (2, 1, "click", t + m),
        (3, 1, "view", t + 2 * m),
        # 2-hour gap: NOT a transition (view -> purchase would be wrong)
        (4, 1, "purchase", t + 122 * m),
        # user 2: view -> view
        (5, 2, "view", t),
        (6, 2, "view", t + m),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {
        (r.from_type, r.to_type): r
        for r in session_transition_matrix(events).collect()
    }
    assert ("view", "purchase") not in out
    assert out[("view", "click")].n_transitions == 1
    assert out[("view", "view")].n_transitions == 1
    assert out[("view", "click")].p == 0.5
    assert out[("click", "view")].p == 1.0


def test_customer_rfm_segments_scores_and_labels(spark):
    """5=best on every axis: the frequent/recent/big spender scores 555
    and is labelled champion; the stale small customer scores low."""
    from music_streaming_etl_glue_spark.operators.relational import (
        customer_rfm_segments,
    )

    d0 = datetime.datetime(2024, 1, 1)
    day = datetime.timedelta(days=1)
    rows = []
    # customers 1..5: customer k orders k times, last order day k*30,
    # each order worth k*100 — strictly increasing on every metric
    key = 0
    for c in range(1, 6):
        for i in range(c):
            key += 1
            rows.append((key, c, float(c * 100), d0 + (c * 30 + i) * day))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp"
    )
    out = {r.custkey: r for r in customer_rfm_segments(orders).collect()}
    assert (out[5].r_score, out[5].f_score, out[5].m_score) == (5, 5, 5)
    assert out[5].segment == "champion"
    assert out[5].rfm == 555
    assert (out[1].r_score, out[1].f_score, out[1].m_score) == (1, 1, 1)
    assert out[1].segment == "lost"
    assert out[3].monetary == 900.0


def test_orders_backlog_timeline_cumulative_and_parallel_plan(spark):
    """Backlog = cumulative(opened − closed); the cumulative window runs
    after an explicit SinglePartition exchange (daily agg stays
    parallel)."""
    from music_streaming_etl_glue_spark.operators.relational import (
        orders_backlog_timeline,
    )

    d = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    orders = spark.createDataFrame(
        [
            (1, d("2024-01-01")),
            (2, d("2024-01-01")),
            (3, d("2024-01-03")),
        ],
        "o_orderkey long, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [
            (1, d("2024-01-02")),  # order 1 ships fully on Jan 2
            (2, d("2024-01-02")),
            (2, d("2024-01-05")),  # order 2's last line ships Jan 5
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    df = orders_backlog_timeline(orders, lineitem)
    rows = {str(r.day): r for r in df.collect()}
    assert rows["2024-01-01"].backlog == 2  # two opened
    assert rows["2024-01-02"].backlog == 1  # order 1 closed
    assert rows["2024-01-03"].backlog == 2  # order 3 opened (3 never ships)
    assert rows["2024-01-05"].backlog == 1  # order 2 closed
    plan = _plan(df)
    assert "SinglePartition" in plan
    assert "Coalesce" not in plan


def test_perplexity_buckets_orders_rare_word_docs_into_tail(spark):
    """Docs made of corpus-rare tokens have high unigram perplexity and
    must land in 'tail'; the all-common-word doc lands in 'head'."""
    from music_streaming_etl_glue_spark.operators.text import (
        perplexity_buckets,
    )

    common = " ".join(["the quick brown fox"] * 5)
    docs = [(i, common) for i in range(6)]
    docs.append((100, "zxq wvut mlkj"))  # three singleton tokens
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in perplexity_buckets(df).collect()}
    assert out[100].bucket == "tail"
    assert out[0].bucket == "head"
    assert out[100].ppl > out[0].ppl


def test_collocations_pmi_surfaces_planted_phrase(spark):
    """A phrase that always co-occurs ('hong kong') outranks pairs of
    independently-frequent words; pairs under min_count never appear."""
    from music_streaming_etl_glue_spark.operators.text import (
        collocations_pmi,
    )

    # filler words recur but in rotated orders, so no filler bigram is
    # as tight as the planted phrase
    fillers = ["a b c d e f g h"[2 * i:] + " " + "a b c d e f g h"[: 2 * i]
               for i in range(8)]
    docs = [(i, f"hong kong {fillers[i].strip()}") for i in range(8)]
    docs.append((99, "rare pair"))  # n_pair = 1 < min_count
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = collocations_pmi(df, min_count=5, k=10).collect()
    assert rows[0].t1 == "hong" and rows[0].t2 == "kong"
    assert all((r.t1, r.t2) != ("rare", "pair") for r in rows)
    assert all(r.n_pair >= 5 for r in rows)


def test_bloom_probe_no_false_negatives_and_prefilter_equivalence(spark):
    """Every corpus member must be a bloom candidate (no false
    negatives), and the bloom-prefiltered incremental dedup must equal
    the plain exact anti-join bit for bit."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        bloom_build,
        bloom_probe,
        dedup_incremental_bloom,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i % 7}") for i in range(70)],
        "doc_id long, text string",
    )
    hashes = docs.select(F.md5("text").alias("text_hash")).distinct()
    bloom = bloom_build(hashes)
    members = docs.select("doc_id", F.md5("text").alias("text_hash"))
    flags = bloom_probe(members, bloom)
    assert all(r.bloom_candidate for r in flags.collect())

    out = {r.doc_id: r for r in dedup_incremental_bloom(docs).collect()}
    # corpus = doc_id % 5 == 0 holds texts 'text 0/5/1/6/3' (mod 7 of
    # multiples of 5) — every batch doc with a text in that set is a dup
    corpus_texts = {f"text {i % 7}" for i in range(0, 70, 5)}
    for i in range(70):
        if i % 5 == 0:
            assert i not in out  # corpus rows are not output
        else:
            assert out[i].exact_dup == (f"text {i % 7}" in corpus_texts)
            assert out[i].keep != out[i].exact_dup


def test_mmr_rerank_prefers_diverse_over_redundant(spark):
    """Candidate B is a near-copy of top hit A; a plain top-2 returns
    (A, B) but MMR's second pick must be the diverse C."""
    from music_streaming_etl_glue_spark.operators.similarity import (
        mmr_rerank,
    )

    # query spans two axes; A sits on axis 1, C on axis 2 (diverse but
    # equally relevant), B is a near-duplicate of A, D is irrelevant
    rows = [
        (0, [1.0, 1.0, 0.0, 0.0], 0),    # query
        (1, [1.0, 0.01, 0.0, 0.0], 0),   # A: top relevance
        (2, [1.0, -0.02, 0.0, 0.0], 0),  # B: near-duplicate of A
        (3, [0.0, 1.0, 0.0, 0.0], 0),    # C: diverse, same relevance
        (4, [0.0, 0.0, 1.0, 0.0], 0),    # D: irrelevant
    ]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = mmr_rerank(embs, k=2, pool=4, lam=0.5)
    got = [r.vec_id for r in out.orderBy("rank").collect()]
    assert got[0] == 1  # highest relevance first
    assert got[1] == 3  # diversity beats the near-duplicate


def test_genre_rolling_median_ignores_single_spike(spark):
    """One spike day shifts the 7-day moving average but leaves the
    rolling median untouched — the robustness the operator exists for."""
    import datetime

    from music_streaming_etl_glue_spark.operators.kpis import (
        genre_daily_moving_avg,
        genre_rolling_median,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    day = datetime.timedelta(days=1)
    rows = []
    eid = 0
    for d in range(10):
        # 10 listens/day, except day 5 spikes to 100
        n = 100 if d == 5 else 10
        for i in range(n):
            eid += 1
            rows.append((eid, 1, "rock", 3.0, t0 + d * day))
    enriched = spark.createDataFrame(
        rows,
        "event_id long, track_id long, track_genre string,"
        " listening_time double, timestamp timestamp",
    ).withColumn("user_id", F.col("event_id") % 7)
    med = {
        str(r.date): r.median_7d_listens
        for r in genre_rolling_median(enriched).collect()
    }
    avg = {
        str(r.date): r.avg_7d_listens
        for r in genre_daily_moving_avg(enriched).collect()
    }
    # day 8's trailing window covers days 2-8: median unmoved, avg not
    assert med["2024-01-09"] == 10.0
    assert avg["2024-01-09"] > 20.0


def test_mmr_rerank_multi_matches_single_query_kernel(spark):
    """The fan-out form agrees with the single-query kernel for the
    query it shares (same pool, same λ), and returns k rows per query."""
    from music_streaming_etl_glue_spark.operators.similarity import (
        mmr_rerank,
        mmr_rerank_multi,
    )

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], 0) for i in range(40)
    ]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    multi = mmr_rerank_multi(embs, n_queries=3, k=3, pool=8).collect()
    by_q = {}
    for r in multi:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    assert all(len(v) == 3 for v in by_q.values())

    # query 0 must agree with the single-query kernel at the same pool —
    # EXCEPT mmr_rerank pools via ann_topk_bruteforce(query_vec_id=0)
    # which is identical to knn_join's per-query ranking
    single = mmr_rerank(embs, k=3, pool=8, query_vec_id=0).collect()
    assert [r.vec_id for r in sorted(single, key=lambda r: r.rank)] == [
        r.vec_id for r in sorted(by_q[0], key=lambda r: r.rank)
    ]


def test_value_equiheight_histogram_balances_mass(spark):
    """Quantile-cut buckets hold ~equal mass even under heavy skew, the
    property equi-width binning loses; shares sum to 1."""
    from music_streaming_etl_glue_spark.operators.analytics import (
        value_equiheight_histogram,
    )

    # 90% of mass crammed below 1.0, a long thin tail to 1000
    vals = [i / 1000.0 for i in range(900)] + [
        float(1 + i) for i in range(100)
    ]
    events = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "event_id long, value double"
    )
    rows = value_equiheight_histogram(events).collect()
    assert len(rows) == 10
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-6
    counts = [r.n for r in rows]
    assert max(counts) <= 2 * min(counts)  # balanced despite skew
    assert max(r.hi for r in rows) == 100.0


def test_audience_overlap_estimate_tracks_exact(spark, sf_smoke_enriched=None):
    """HLL inclusion-exclusion overlap stays within a loose relative
    error of the exact self-join on planted overlapping audiences."""
    from music_streaming_etl_glue_spark.operators.kpis import (
        audience_overlap,
    )

    rows = []
    eid = 0
    # rock users 0..999; pop users 500..1499 → exact overlap 500
    for g, lo in (("rock", 0), ("pop", 500)):
        for u in range(lo, lo + 1000):
            eid += 1
            rows.append((eid, g, u))
    enriched = spark.createDataFrame(
        rows, "event_id long, track_genre string, user_id long"
    )
    [r] = audience_overlap(enriched).collect()
    assert (r.genre_a, r.genre_b) == ("pop", "rock")
    assert r.exact_overlap == 500
    assert r.rel_err < 0.1  # HLL default precision is ~2-3% at this n


def test_bitmap_rollup_exact_and_merge_invariant(spark):
    """The bitmap partial rollup equals plain COUNT(DISTINCT) exactly
    (not approximately), and the word-keyed bitmap overlap equals the
    exact set intersection — on data with heavy per-user duplication
    and users spread across many bitmap words."""
    import random

    from music_streaming_etl_glue_spark.operators.kpis import (
        audience_overlap_bitmap,
        genre_distinct_bitmap_rollup,
    )

    rng = random.Random(11)
    rows = []
    eid = 0
    users = {"rock": set(), "pop": set()}
    t0 = datetime.datetime(2024, 1, 1)
    for _ in range(3000):
        g = rng.choice(["rock", "pop"])
        u = rng.randrange(5000)  # sparse across ~157 words
        users[g].add(u)
        eid += 1
        rows.append(
            (eid, g, u, t0 + datetime.timedelta(hours=rng.randrange(720)))
        )
    enriched = spark.createDataFrame(
        rows,
        "event_id long, track_genre string, user_id long,"
        " timestamp timestamp",
    )
    got = {
        r.track_genre: r.unique_listeners
        for r in genre_distinct_bitmap_rollup(enriched).collect()
    }
    assert got == {g: len(u) for g, u in users.items()}

    [ov] = audience_overlap_bitmap(enriched).collect()
    assert (ov.genre_a, ov.genre_b) == ("pop", "rock")
    assert ov.shared_listeners == len(users["rock"] & users["pop"])


def test_neyman_sample_allocates_by_variance(spark):
    """A small but volatile stratum receives more of the budget than an
    equally-sized constant one (σ = 0 → quota 0), and the kept set is
    invariant under repartitioning."""
    from music_streaming_etl_glue_spark.operators.dedup import neyman_sample

    rows = []
    # stratum 'flat': 400 rows, constant value → sigma 0 → quota 0
    for i in range(400):
        rows.append((i, "flat", 10.0))
    # stratum 'wild': 400 rows, alternating extremes → big sigma
    for i in range(400):
        rows.append((1000 + i, "wild", 0.0 if i % 2 else 100.0))
    # stratum 'mild': 400 rows, small jitter
    for i in range(400):
        rows.append((2000 + i, "mild", 10.0 + (i % 5) * 0.1))
    events = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    out = neyman_sample(events, budget=100).collect()
    by_type = {}
    for r in out:
        by_type[r.event_type] = by_type.get(r.event_type, 0) + 1
    assert "flat" not in by_type          # zero-variance stratum starved
    assert by_type["wild"] > by_type.get("mild", 0) * 10  # σ-dominated
    assert sum(by_type.values()) == 100

    again = neyman_sample(events.repartition(7), budget=100).collect()
    assert sorted(r.event_id for r in again) == sorted(
        r.event_id for r in out
    )


def test_events_hourly_interpolated_semantics(spark):
    """Grid cells read exact at observation-aligned hours, linear
    interpolation between neighbors, locf past the last observation and
    backfill before the first."""
    from music_streaming_etl_glue_spark.operators.behavior import (
        events_hourly_interpolated,
    )

    t = datetime.datetime(2024, 1, 1, 10, 0, 0)
    h = datetime.timedelta(hours=1)
    rows = [
        # type 'a': obs at 10:00 (4.0) and 12:00 (8.0)
        (1, "a", t, 4.0),
        (2, "a", t + 2 * h, 8.0),
        # type 'b': single obs at 11:30 → everything locf/backfill
        (3, "b", t + 1.5 * h, 42.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    out = {
        (r.event_type, str(r.hour)): r
        for r in events_hourly_interpolated(events).collect()
    }
    a10 = out[("a", "2024-01-01 10:00:00")]
    a11 = out[("a", "2024-01-01 11:00:00")]
    a12 = out[("a", "2024-01-01 12:00:00")]
    assert (a10.value, a10.basis) == (4.0, "exact")
    assert (a11.value, a11.basis) == (6.0, "interp")
    assert (a12.value, a12.basis) == (8.0, "exact")
    b10 = out[("b", "2024-01-01 10:00:00")]
    b12 = out[("b", "2024-01-01 12:00:00")]
    assert (b10.value, b10.basis) == (42.0, "backfill")
    assert (b12.value, b12.basis) == (42.0, "locf")


def test_knn_label_classifier_separable_clusters(spark):
    """On linearly-separable clusters the classifier is perfect; ties
    break deterministically on the smaller label."""
    from music_streaming_etl_glue_spark.operators.similarity import (
        knn_label_classifier,
    )

    import random

    rng = random.Random(3)
    rows = []
    # two tight clusters on orthogonal axes: label 0 near e1, 1 near e2
    for i in range(60):
        lab = i % 2
        base = [1.0, 0.0, 0.0] if lab == 0 else [0.0, 1.0, 0.0]
        vec = [b + rng.uniform(-0.05, 0.05) for b in base]
        rows.append((i, vec, lab))
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = knn_label_classifier(embs, k=5).collect()
    assert len(out) == 12  # vec_id % 5 == 0
    assert all(r.correct for r in out)
    assert all(r.predicted_label == r.true_label for r in out)


def test_genre_trend_slopes_detects_planted_trend(spark):
    """A genre with listens growing ~3/day labels rising with slope ≈ 3;
    a constant genre labels flat with slope 0."""
    from music_streaming_etl_glue_spark.operators.kpis import (
        genre_trend_slopes,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    day = datetime.timedelta(days=1)
    rows = []
    eid = 0
    for d in range(10):
        for _ in range(10 + 3 * d):  # rising
            eid += 1
            rows.append((eid, 1, "up", 1.0, t0 + d * day))
        for _ in range(20):  # flat
            eid += 1
            rows.append((eid, 2, "steady", 1.0, t0 + d * day))
    enriched = spark.createDataFrame(
        rows,
        "event_id long, track_id long, track_genre string,"
        " listening_time double, timestamp timestamp",
    ).withColumn("user_id", F.col("event_id") % 5)
    out = {r.track_genre: r for r in genre_trend_slopes(enriched).collect()}
    assert out["up"].trend == "rising"
    assert abs(out["up"].slope - 3.0) < 1e-6
    assert out["steady"].trend == "flat"
    assert out["steady"].slope == 0.0


def test_genre_country_chi2_zero_under_independence(spark):
    """A perfectly independent contingency table yields chi2 terms of 0
    in every cell; a planted association concentrates the statistic."""
    from music_streaming_etl_glue_spark.operators.kpis import (
        genre_country_chi2,
    )

    rows = []
    eid = 0
    # independent: every (genre, country) cell has exactly 10 events
    for g in ("rock", "pop"):
        for c in ("US", "DE"):
            for _ in range(10):
                eid += 1
                rows.append((eid, g, c))
    enriched = spark.createDataFrame(
        rows, "event_id long, track_genre string, user_country string"
    )
    terms = genre_country_chi2(enriched).collect()
    assert all(r.chi2_term == 0.0 for r in terms)

    # planted association: rock only in US, pop only in DE
    rows2 = [(i, "rock", "US") for i in range(20)] + [
        (100 + i, "pop", "DE") for i in range(20)
    ]
    enriched2 = spark.createDataFrame(
        rows2, "event_id long, track_genre string, user_country string"
    )
    terms2 = genre_country_chi2(enriched2).collect()
    assert sum(r.chi2_term for r in terms2) > 10


def test_session_path_topk_respects_gaps_and_ordering(spark):
    """Trigram paths never span a session gap; ranking is count-desc
    with a lexicographic tiebreak."""
    from music_streaming_etl_glue_spark.operators.behavior import (
        session_path_topk,
    )

    t = datetime.datetime(2024, 2, 1, 9, 0, 0)
    m = datetime.timedelta(minutes=1)
    rows = []
    eid = 0
    # user 1 runs view->click->purchase twice in-session
    for rep in range(2):
        base = t + rep * 10 * m
        for i, typ in enumerate(("view", "click", "purchase")):
            eid += 1
            rows.append((eid, 1, typ, base + i * m))
    # user 2: view->click then a 2h gap then purchase (no full trigram)
    eid += 1
    rows.append((eid, 2, "view", t))
    eid += 1
    rows.append((eid, 2, "click", t + m))
    eid += 1
    rows.append((eid, 2, "purchase", t + 130 * m))
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = session_path_topk(events, k=5).collect()
    top = got[0]
    assert (top.step1, top.step2, top.step3) == ("view", "click", "purchase")
    assert top.n_paths == 2
    # user 2's gap-broken path must not appear
    assert all(
        not (r.step1 == "view" and r.step3 == "purchase" and r.n_paths > 2)
        for r in got
    )


def test_markov_next_event_accuracy_learns_deterministic_chain(spark):
    """A perfectly deterministic A→B chain in both halves scores
    accuracy 1.0; the train/test split keeps the second half honest."""
    from music_streaming_etl_glue_spark.operators.behavior import (
        markov_next_event_accuracy,
    )

    t = datetime.datetime(2024, 2, 1, 0, 0, 0)
    m = datetime.timedelta(minutes=5)
    rows = []
    eid = 0
    # one user, alternating A/B forever: every A is followed by B and
    # vice versa, across both timeline halves
    for i in range(40):
        eid += 1
        rows.append((eid, 1, "A" if i % 2 == 0 else "B", t + i * m))
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r.from_type: r for r in markov_next_event_accuracy(events).collect()}
    assert out["A"].predicted == "B" and out["A"].accuracy == 1.0
    assert out["B"].predicted == "A" and out["B"].accuracy == 1.0
    assert out["A"].n_test + out["B"].n_test < 39  # only the 2nd half


def test_view_to_purchase_latency_in_session_only(spark):
    """Latency measures the most recent view of the SAME user inside the
    session cutoff; purchases with no in-session view don't count."""
    from music_streaming_etl_glue_spark.operators.behavior import (
        view_to_purchase_latency,
    )

    t = datetime.datetime(2024, 3, 5, 9, 0, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        (1, 1, "view", t),
        (2, 1, "purchase", t + 120 * s),      # 120s conversion
        (3, 2, "view", t),
        (4, 2, "view", t + 300 * s),          # newer view wins
        (5, 2, "purchase", t + 360 * s),      # 60s conversion
        (6, 3, "purchase", t),                # no view at all → excluded
        (7, 4, "view", t),
        (8, 4, "purchase", t + 7200 * s),     # 2h gap → excluded
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    [row] = view_to_purchase_latency(events).collect()
    assert row.n_conversions == 2
    assert row.p50_latency_s == 90.0  # interpolated between 60 and 120


def test_track_play_gini_extremes(spark):
    """Perfectly uniform plays score ~0; total concentration on one
    track approaches 1."""
    from music_streaming_etl_glue_spark.operators.behavior import (
        track_play_gini,
    )

    import json

    def ev(eid, key):
        return (eid, json.dumps({"k": key}))

    uniform = [ev(i, f"t{i % 10}") for i in range(100)]
    df_u = spark.createDataFrame(uniform, "event_id long, props string")
    [r] = track_play_gini(df_u).collect()
    assert abs(r.gini) < 0.01
    assert r.n == 10 and r.total_plays == 100

    skewed = [ev(i, "hot") for i in range(96)] + [
        ev(100 + i, f"cold{i}") for i in range(4)
    ]
    df_s = spark.createDataFrame(skewed, "event_id long, props string")
    [r2] = track_play_gini(df_s).collect()
    assert r2.gini > 0.7


def test_daily_new_vs_returning_decomposition(spark):
    """Day 1 actives are all new; a day-2 repeat visitor counts as
    returning while a fresh face counts as new; the split sums to the
    actives."""
    from music_streaming_etl_glue_spark.operators.behavior import (
        daily_new_vs_returning,
    )

    t = datetime.datetime(2024, 4, 1, 10, 0, 0)
    day = datetime.timedelta(days=1)
    rows = [
        (1, 1, t), (2, 2, t),              # day 1: users 1, 2 (new)
        (3, 1, t + day), (4, 3, t + day),  # day 2: 1 returns, 3 is new
        (5, 1, t + day),                   # duplicate activity, same day
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    out = {str(r.day): r for r in daily_new_vs_returning(events).collect()}
    d1, d2 = out["2024-04-01"], out["2024-04-02"]
    assert (d1.active_users, d1.new_users, d1.returning_users) == (2, 2, 0)
    assert (d2.active_users, d2.new_users, d2.returning_users) == (2, 1, 1)
    assert d2.returning_share == 0.5
