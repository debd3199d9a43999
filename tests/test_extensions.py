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


def test_multimodal_features_from_decoded_pixels(docs):
    """r9 rebase: features are integer aggregates of the DECODED image
    (brightness/contrast/horizontal gradient), verified against a
    direct numpy computation on the synth pixel field — not on the
    payload bytes."""
    import numpy as np

    binary = multimodal.synth_bmp_payloads(docs)
    feats = {
        r.doc_id: r for r in multimodal.extract_features(binary).collect()
    }
    ids = sorted(feats)[:20]
    for d in ids:
        arr = multimodal._synth_pixels(int(d)).astype(np.int64)
        h, w, _ = arr.shape
        got = feats[d]
        assert (got.width, got.height) == (w, h)
        assert got.byte_len == 54 + h * ((3 * w + 3) // 4 * 4)
        assert got.px_sum == int(arr.sum())
        assert got.px_sq_sum == int((arr * arr).sum())
        assert got.grad_sum == int(
            np.abs(arr[:, 1:, :] - arr[:, :-1, :]).sum()
        )


def test_decode_rejects_non_bmp():
    """Unsupported formats fail loudly, never decode garbage: the BMP
    decoder is real (see test_image_decode.py); anything else — wrong
    magic, compressed BMP, truncated payload — is a ValueError."""
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\x89PNG..." + bytes(64))


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


def test_cosine_pairs_guard_blocks_large_inputs(spark):
    import pytest

    from music_streaming_etl_glue_spark.operators.similarity import cosine_pairs
    from music_streaming_etl_glue_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    embs = load_table(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError, match="O\\(n²\\) baseline"):
        cosine_pairs(embs, max_rows=10)
    # bypass restores the baseline behavior
    assert cosine_pairs(embs.limit(30), max_rows=None).count() >= 0


def test_chunk_documents_covers_all_tokens_with_overlap(spark):
    from music_streaming_etl_glue_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(80))), (2, "a b c")],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, window=32, stride=24).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 80 tokens -> chunks at offsets 0/24/48 (ceil((80-32)/24)+1 = 3)
    one = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in one] == [0, 1, 2]
    assert one[0].chunk_tokens == 32 and one[-1].chunk_tokens == 32
    covered = set()
    for r in one:
        covered.update(r.chunk_text.split(" "))
    assert covered == {f"t{i}" for i in range(80)}  # every token in a chunk
    # consecutive chunks overlap by window - stride = 8 tokens
    assert set(one[0].chunk_text.split(" ")) & set(one[1].chunk_text.split(" "))
    # short doc: single whole-document chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "a b c"


def test_session_window_native_boundary_semantics(spark):
    """Native session_window merges an event at EXACTLY gap_s distance
    (splits only on > gap_s) and compares at microsecond precision; the
    manual lag-based user_sessions compares second-truncated timestamps,
    so a 1800.000001 s gap splits natively but not manually."""
    import datetime as dt

    from music_streaming_etl_glue_spark.operators.analytics import (
        user_session_windows,
        user_sessions,
    )

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp, event_type string,"
            " value double, props string",
        )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    exact = mk(
        [
            (1, 7, t0, "click", 0.0, "{}"),
            (2, 7, t0 + dt.timedelta(seconds=1800), "click", 0.0, "{}"),
        ]
    )
    native = user_session_windows(exact, gap_s=1800).collect()
    assert len(native) == 1  # exact-gap event still merges
    assert native[0].session_end == t0 + dt.timedelta(seconds=3600)

    hairline = mk(
        [
            (1, 7, t0, "click", 0.0, "{}"),
            (2, 7, t0 + dt.timedelta(seconds=1800, microseconds=1), "c", 0.0, "{}"),
        ]
    )
    assert len(user_session_windows(hairline, gap_s=1800).collect()) == 2
    # manual sessionization truncates to whole seconds → still one session
    assert user_sessions(hairline, gap_s=1800).collect()[0].n_sessions == 1


def test_kmeans_refine_inertia_non_increasing(spark):
    """Lloyd iterations seeded from label centroids: inertia must not
    increase (up to the 6-decimal distance rounding), and the final
    assignment covers every vector exactly once."""
    from music_streaming_etl_glue_spark.operators.similarity import kmeans_refine
    from music_streaming_etl_glue_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    embs = load_table(spark, SF_SMOKE, "embeddings")
    assign, inertias = kmeans_refine(embs, iters=3)
    assert len(inertias) == 3
    for prev, nxt in zip(inertias, inertias[1:]):
        assert nxt <= prev + 1e-3, inertias
    assert assign.count() == embs.count()
    assert assign.select("vec_id").distinct().count() == embs.count()


def test_stratified_sample_threshold_rounds_not_truncates(spark):
    """0.57 * 10000 is 5699.999… in binary; the Spark threshold must round
    to 5700 (as the generated oracle SQL does), not truncate to 5699."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        _hash_bucket,
        stratified_sample,
    )

    events = load_table(spark, SF_SMOKE, "events")
    got = stratified_sample(events, fractions=(("click", 0.57),)).count()
    expected = (
        events.filter("event_type = 'click'")
        .withColumn("b", _hash_bucket("event_id", 10_000))
        .filter("b < 5700")
        .count()
    )
    assert got == expected


def test_fuzzy_dedup_catches_planted_typo_duplicate(spark):
    """A single-character typo copy must be flagged by the edit-distance
    verifier (and missed by exact dedup) — the operator's reason to
    exist."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        dedup_exact,
        fuzzy_dedup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base.replace("quick", "quicc")),  # one edit
        (3, "completely different text about spark shuffles and joins"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    flagged = {
        (r.doc_id_a, r.doc_id_b)
        for r in fuzzy_dedup_pairs(docs).collect()
    }
    assert (1, 2) in flagged
    assert all(3 not in pair for pair in flagged)
    # exact dedup sees three distinct texts
    assert dedup_exact(docs).count() == 3


def test_rebalance_fractional_tracks_quota_and_is_deterministic(spark):
    """The shuffle-free fractional rebalance must land within sampling
    noise of the exact quotas and pick an identical set on rerun."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        rebalance_sources,
        rebalance_sources_fractional,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table
    from tests.conftest import SF_CORRECT

    docs = load_table(spark, SF_CORRECT, "documents")
    exact = {
        r.source: r.n
        for r in rebalance_sources(docs)
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    frac = rebalance_sources_fractional(docs)
    got = {
        r.source: r.n
        for r in frac.groupBy("source").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert set(got) == set(exact)
    for src, quota in exact.items():
        # 25-doc sources: allow generous hash-uniformity noise
        assert abs(got[src] - quota) <= max(3, quota // 2), (src, got, exact)
    ids_a = {r.doc_id for r in frac.collect()}
    ids_b = {
        r.doc_id for r in rebalance_sources_fractional(docs).collect()
    }
    assert ids_a == ids_b


def test_funnel_requires_stage_order(spark):
    """A click BEFORE the first view must not count as a conversion —
    the strict-ordering contract that separates a funnel from three
    independent counts."""
    import datetime as dt

    from music_streaming_etl_glue_spark.operators.behavior import (
        conversion_funnel,
    )

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # user 1: click(1) -> view(2): click precedes view, no conversion
        (1, t(1), 1, "click", 1.0, "{}"),
        (2, t(2), 1, "view", 1.0, "{}"),
        # user 2: view(1) -> click(2) -> purchase(3): full conversion
        (3, t(1), 2, "view", 1.0, "{}"),
        (4, t(2), 2, "click", 1.0, "{}"),
        (5, t(3), 2, "purchase", 1.0, "{}"),
        # user 3: view(1) -> purchase(2) with no click: purchase must NOT
        # count (needs a click after the view first)
        (6, t(1), 3, "view", 1.0, "{}"),
        (7, t(2), 3, "purchase", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = conversion_funnel(events).collect()[0]
    assert r.n_users == 3
    assert r.n_viewed == 3
    assert r.n_clicked == 1   # only user 2's post-view click
    assert r.n_purchased == 1  # only user 2


def test_sample_per_group_stable_under_repartition(spark):
    from music_streaming_etl_glue_spark.operators.behavior import (
        sample_per_group,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events")
    a = {(r.event_type, r.event_id) for r in sample_per_group(events).collect()}
    b = {
        (r.event_type, r.event_id)
        for r in sample_per_group(events.repartition(17)).collect()
    }
    assert a == b and len(a) > 0


def test_rebalance_exact_rank_is_two_level(spark):
    """The exact rebalance must NOT sort each source in one full-width
    task: its data-level row_number window has to partition on
    (source, md5-prefix bucket), with only the tiny per-bucket count
    aggregate windowing on source alone (round-2 verdict item #3)."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        rebalance_sources,
    )
    from tests.conftest import SF_CORRECT

    docs = load_table(spark, SF_CORRECT, "documents")
    plan = (
        rebalance_sources(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "row_number" in line:
            # the rank window is keyed by source AND the range bucket
            assert "__b" in line, line
    # and ranks are still the dense global per-source sequence 1..quota
    rows = rebalance_sources(docs).collect()
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r.src_rank)
    for source, ranks in by_source.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), source


def test_pack_chunks_fills_examples_to_budget(spark):
    """Concat-stream packing invariants: example ids are contiguous from
    0, and every example except the last fills to the token budget
    within one chunk of slack (a chunk straddling the boundary belongs
    to the bin its start offset falls in)."""
    from music_streaming_etl_glue_spark.operators.text import (
        CHUNK_TOKENS,
        PACK_TARGET_TOKENS,
        pack_chunks,
    )
    from tests.conftest import SF_CORRECT

    docs = load_table(spark, SF_CORRECT, "documents")
    rows = pack_chunks(docs).collect()
    per_example: dict[int, int] = {}
    for r in rows:
        per_example[r.example_id] = (
            per_example.get(r.example_id, 0) + r.chunk_tokens
        )
    ids = sorted(per_example)
    assert ids == list(range(len(ids)))
    last = ids[-1]
    for eid, total in per_example.items():
        if eid != last:
            assert (
                PACK_TARGET_TOKENS - CHUNK_TOKENS
                < total
                <= PACK_TARGET_TOKENS + CHUNK_TOKENS - 1
            ), (eid, total)


def test_user_value_quartiles_matches_ntile(spark):
    """The two-level-rank quartile assignment must be bit-identical to
    NTILE(4) OVER (ORDER BY total DESC, user_id) for every n mod 4 and
    for heavy value ties spanning bucket cutoffs, including n < 4 and
    few distinct values (empty buckets)."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from music_streaming_etl_glue_spark.operators.behavior import (
        user_value_quartiles,
    )

    t0 = dt.datetime(2024, 1, 1)
    for n in (1, 2, 3, 4, 5, 6, 7, 8, 11, 37):
        rows = [
            # values repeat mod 3 → heavy total ties, and with buckets=4
            # the approx cutoffs land ON tied values
            (i, t0, i, "play", float(i % 3), "{}")
            for i in range(1, n + 1)
        ]
        events = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        got = {
            r.user_id: r.quartile
            for r in user_value_quartiles(events, buckets=4).collect()
        }
        totals = events.groupBy("user_id").agg(
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_value")
        )
        w = Window.orderBy(
            F.col("total_value").desc(), F.col("user_id").asc()
        )
        want = {
            r.user_id: r.quartile
            for r in totals.withColumn(
                "quartile", F.ntile(4).over(w).cast("long")
            ).collect()
        }
        assert got == want, f"n={n}: {got} != {want}"


def test_redact_pii_patterns_and_counts(spark):
    """Every PII category is replaced by its tag and counted from the
    ORIGINAL text; clean text passes through byte-identical."""
    from music_streaming_etl_glue_spark.operators.text import redact_pii

    rows = [
        (1, "mail a.b+c@ex-ample.co.uk and x@y.org end"),
        (2, "ip 10.0.3.1 ssn 123-45-6789 ph 555-123-4567 or 555.123.4567"),
        (3, "nothing sensitive here 12345"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert got[1].redacted_text == "mail [EMAIL] and [EMAIL] end"
    assert got[1].n_email == 2 and got[1].n_ipv4 == 0
    assert got[2].redacted_text == "ip [IPV4] ssn [SSN] ph [PHONE] or [PHONE]"
    assert (got[2].n_ipv4, got[2].n_ssn, got[2].n_phone) == (1, 1, 2)
    assert got[3].redacted_text == rows[2][1]
    assert got[3].n_email == got[3].n_phone == 0


def test_suppliers_who_kept_waiting_semantics(spark):
    """Q21 decorrelation contract: count only (order, supplier) where the
    order is finished, multi-supplier, the supplier shipped late, and NO
    other supplier did — and count each order once even with several
    late lines from the same supplier."""
    import datetime as dt

    from music_streaming_etl_glue_spark.operators.relational import (
        suppliers_who_kept_waiting,
    )

    d0 = dt.datetime(1995, 1, 1)
    late = dt.datetime(1995, 6, 1)   # > 60 days after order date
    ontime = dt.datetime(1995, 1, 15)
    orders = spark.createDataFrame(
        [
            (1, 1, "F", 1.0, d0, "1-URGENT"),  # A late, B ok  -> A waits
            (2, 1, "F", 1.0, d0, "1-URGENT"),  # A late, B late -> nobody
            (3, 1, "F", 1.0, d0, "1-URGENT"),  # only A, late   -> nobody
            (4, 1, "O", 1.0, d0, "1-URGENT"),  # open order     -> excluded
            (5, 1, "F", 1.0, d0, "1-URGENT"),  # A late twice, B ok -> A once
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    L = lambda ok, sk, ship: (ok, 1, sk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship)  # noqa: E731
    lineitem = spark.createDataFrame(
        [
            L(1, 10, late), L(1, 20, ontime),
            L(2, 10, late), L(2, 20, late),
            L(3, 10, late),
            L(4, 10, late), L(4, 20, ontime),
            L(5, 10, late), L(5, 10, late), L(5, 20, ontime),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(10, "Supp A", 0, 0.0), (20, "Supp B", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    got = {
        r.s_suppkey: r.numwait
        for r in suppliers_who_kept_waiting(supplier, orders, lineitem).collect()
    }
    assert got == {10: 2}


def test_train_bpe_merges_matches_reference_bpe(spark):
    """The distributed trainer must reproduce the exact merge-rule
    sequence of a straightforward single-machine BPE (greedy-left
    application, (count desc, pair asc) tiebreak) on the same corpus."""
    from collections import Counter

    from music_streaming_etl_glue_spark.operators.text import (
        train_bpe_merges,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "low new low new",
    ]

    def reference_bpe(texts, n):
        words = Counter(w for t in texts for w in t.split(" "))
        vocab = {tuple(w): c for w, c in words.items()}
        rules = []
        for step in range(n):
            pc = Counter()
            for syms, c in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += c
            if not pc:
                break
            (a, b), cnt = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            rules.append((step, a, b, a + b, cnt))
            new_vocab = {}
            for syms, c in vocab.items():
                out, pending = [], None
                for s in syms:
                    if pending == a and s == b:
                        out.append(a + b)
                        pending = None
                    else:
                        if pending is not None:
                            out.append(pending)
                        pending = s
                if pending is not None:
                    out.append(pending)
                key = tuple(out)
                new_vocab[key] = new_vocab.get(key, 0) + c
            vocab = new_vocab
        return rules

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in train_bpe_merges(docs, n_merges=6)
        .orderBy("step")
        .collect()
    ]
    assert got == reference_bpe(texts, 6)


def test_apply_bpe_roundtrip_and_compression(spark):
    """Encoding with learned rules must (a) concatenate back to the
    original token (lossless), (b) never increase symbol count, and
    (c) actually merge something the rules cover."""
    from music_streaming_etl_glue_spark.operators.text import (
        apply_bpe,
        train_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newest low")],
        "doc_id long, text string",
    )
    rules = [
        (r.left, r.right)
        for r in train_bpe_merges(docs, n_merges=4).orderBy("step").collect()
    ]
    enc = apply_bpe(docs, rules).collect()
    assert enc
    for r in enc:
        assert "".join(r.symbols) == r.token
        assert r.n_symbols <= r.n_chars
    assert any(r.n_symbols < r.n_chars for r in enc)


def test_customer_status_history_intervals(spark):
    """SCD2 collapse: versions partition each customer's timeline —
    intervals chain (valid_to == next valid_from), runs alternate status,
    and n_orders sums back to the customer's order count."""
    from music_streaming_etl_glue_spark.operators.relational import (
        customer_status_history,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    hist = customer_status_history(orders).collect()
    by_cust = {}
    for r in hist:
        by_cust.setdefault(r.o_custkey, []).append(r)
    n_orders = orders.count()
    assert sum(r.n_orders for r in hist) == n_orders
    for runs in by_cust.values():
        runs.sort(key=lambda r: r.version)
        assert [r.version for r in runs] == list(range(1, len(runs) + 1))
        for prev, nxt in zip(runs, runs[1:]):
            # consecutive runs differ in status and chain exactly
            assert prev.status != nxt.status
            assert prev.valid_to == nxt.valid_from
        assert runs[-1].valid_to is None


def test_cms_never_underestimates(spark):
    """The count-min guarantee: every estimate >= the exact count, and on
    a sketch much wider than the key cardinality the overestimate is 0
    for virtually all keys (collision probability ~ n_keys/width)."""
    from music_streaming_etl_glue_spark.operators.analytics import (
        cms_track_estimates,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = cms_track_estimates(
        load_table(spark, SF_SMOKE, "events"), top_k=10_000
    ).collect()
    assert rows, "expected at least one tracked key"
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.est_plays >= r.exact_plays for r in rows)
    clean = sum(1 for r in rows if r.overestimate == 0)
    assert clean / len(rows) >= 0.9


def test_dedup_incremental_flags_planted_dups(spark):
    """A new doc that copies a corpus doc exactly -> exact_dup; a new doc
    with one token changed -> near_dup (minhash rung); a fresh doc ->
    keep."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        dedup_incremental,
    )

    corpus_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, corpus_text, "en", "s0", len(corpus_text)),  # corpus (id%5==0)
        (5, "one two three four five six seven eight nine ten", "en", "s0", 49),
        (1, corpus_text, "en", "s1", len(corpus_text)),  # exact copy
        (2, corpus_text.replace("kappa", "lambda"), "en", "s1", 59),  # near
        (3, "completely different text with no overlap at all here now",
         "en", "s1", 57),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.doc_id: r for r in dedup_incremental(docs).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].exact_dup and not got[1].keep
    assert got[2].near_dup and not got[2].exact_dup and not got[2].keep
    assert got[3].keep and not got[3].exact_dup and not got[3].near_dup


def test_genre_series_dtw_matches_reference(spark):
    """The mapInPandas DTW must equal a pure-Python reference DP on the
    same dense series, and DTW of a series with itself is 0."""
    import math

    from music_streaming_etl_glue_spark.operators.behavior import (
        DTW_BAND,
        _genre_daily_series,
        genre_series_dtw,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events")
    series = {r.genre: list(r.xs) for r in _genre_daily_series(events).collect()}

    def znorm(v):
        n = len(v)
        m = sum(v) / n
        s = math.sqrt(sum((x - m) ** 2 for x in v) / n)
        return [(x - m) / s for x in v] if s > 0 else [0.0] * n

    def ref_dtw(x, y, w):
        n, inf = len(x), float("inf")
        d = [[inf] * (n + 1) for _ in range(n + 1)]
        d[0][0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(1, i - w), min(n, i + w) + 1):
                c = (x[i - 1] - y[j - 1]) ** 2
                d[i][j] = c + min(d[i - 1][j], d[i][j - 1], d[i - 1][j - 1])
        return math.sqrt(d[n][n])

    got = {
        (r.genre_a, r.genre_b): r.dtw_distance
        for r in genre_series_dtw(events).collect()
    }
    assert len(got) == len(series) * (len(series) - 1) // 2
    for (ga, gb), dist in got.items():
        expect = ref_dtw(znorm(series[ga]), znorm(series[gb]), DTW_BAND)
        assert abs(dist - round(expect, 6)) < 1e-9, (ga, gb)
        # self-distance sanity on one side
    g0 = next(iter(series))
    assert ref_dtw(znorm(series[g0]), znorm(series[g0]), DTW_BAND) == 0.0


# ---------------------------------------------------------------------------
# Gopher-style quality rules
# ---------------------------------------------------------------------------

def test_quality_filter_rules_flags_each_rule(spark):
    from music_streaming_etl_glue_spark.operators.text import (
        quality_filter_rules,
    )

    good = "the quick brown fox jumps over a lazy dog near " + " ".join(
        f"word{i}" for i in range(21)
    )  # 31 tokens, stopwords {the, a}, varied
    short = "the a tiny"  # fails word count
    repeated = "the a " + " ".join(["zz"] * 28)  # top ratio 28/30
    symbols = "the a " + " ".join(["w!!"] * 28)  # 56 symbols / 30 tokens
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, repeated), (4, symbols)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in quality_filter_rules(docs).collect()}
    assert got[1]["keep"] is True
    assert all(
        got[1][k]
        for k in (
            "rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
            "rule_stopwords", "rule_repetition",
        )
    )
    assert got[2]["rule_word_count"] is False and got[2]["keep"] is False
    assert got[3]["rule_repetition"] is False and got[3]["keep"] is False
    assert got[4]["rule_symbol_ratio"] is False and got[4]["keep"] is False
    # the symbol doc passes the unrelated rules, so the kill is attributable
    assert got[4]["rule_word_count"] is True
    assert got[4]["rule_stopwords"] is True


# ---------------------------------------------------------------------------
# boilerplate span removal
# ---------------------------------------------------------------------------

def test_remove_boilerplate_strips_hot_spans_only(spark):
    from music_streaming_etl_glue_spark.operators.text import (
        boilerplate_shingles,
        remove_boilerplate,
    )

    rows = [
        (i, f"u{i}a u{i}b alpha beta gamma u{i}c u{i}d") for i in range(6)
    ]
    rows.append((100, "solo doc"))  # shorter than the 3-token window
    rows.append((101, "only unique tokens here nothing repeats at all"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hot = {r.shingle: r.df for r in boilerplate_shingles(docs).collect()}
    assert hot == {"alpha beta gamma": 6}
    got = {r.doc_id: r for r in remove_boilerplate(docs).collect()}
    for i in range(6):
        assert got[i].n_removed == 3
        assert got[i].clean_text == f"u{i}a u{i}b u{i}c u{i}d"
    assert got[100].n_removed == 0 and got[100].clean_text == "solo doc"
    assert got[101].n_removed == 0
    assert got[101].clean_text == "only unique tokens here nothing repeats at all"


def test_remove_boilerplate_masks_overlapping_spans(spark):
    from music_streaming_etl_glue_spark.operators.text import (
        remove_boilerplate,
    )

    # "a b c d" repeated in 5 docs: hot 3-grams "a b c" AND "b c d"
    # overlap; the union of covered positions is all four tokens, not six.
    rows = [(i, f"x{i} a b c d y{i}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_boilerplate(docs, min_df=5).collect()}
    for i in range(5):
        assert got[i].n_removed == 4
        assert got[i].clean_text == f"x{i} y{i}"


# ---------------------------------------------------------------------------
# temperature-based source mixing
# ---------------------------------------------------------------------------

def test_temperature_mix_quotas_follow_sqrt_counts(spark):
    from music_streaming_etl_glue_spark.operators.dedup import (
        temperature_mix,
    )

    rows = []
    did = 0
    for src, n in (("a", 4), ("b", 16), ("c", 64), ("d", 100)):
        for _ in range(n):
            rows.append((did, f"t{did}", "en", src, 1))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = temperature_mix(docs, alpha=0.5, sample_frac=0.5)
    quotas = {
        r.source: r.quota for r in out.select("source", "quota").distinct().collect()
    }
    # total=184, weights sqrt(n)=2/4/8/10 (sum 24), T=92:
    # raw quotas floor(92*w/24) = 7/15/30/38; source a caps at its size 4.
    assert quotas == {"a": 4, "b": 15, "c": 30, "d": 38}
    # without replacement: kept counts equal quotas
    from pyspark.sql import functions as F

    kept = {
        r.source: r.cnt
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert kept == quotas
    # alpha=1 reproduces the natural share: quotas = floor(n/2)
    nat = temperature_mix(docs, alpha=1.0, sample_frac=0.5)
    quotas_nat = {
        r.source: r.quota
        for r in nat.select("source", "quota").distinct().collect()
    }
    assert quotas_nat == {"a": 2, "b": 8, "c": 32, "d": 50}


def test_temperature_mix_partition_invariant(spark):
    from music_streaming_etl_glue_spark.operators.dedup import (
        temperature_mix,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = sorted(
        (r.doc_id, r.src_rank) for r in temperature_mix(docs).collect()
    )
    shuffled = sorted(
        (r.doc_id, r.src_rank)
        for r in temperature_mix(docs.repartition(7)).collect()
    )
    assert base == shuffled and len(base) > 0


def test_source_divergence_zero_for_identical_distribution(spark):
    from music_streaming_etl_glue_spark.operators.text import (
        source_divergence,
    )

    # two sources with IDENTICAL token multisets: each q_s equals the
    # corpus p exactly, so both KLs are 0; a third skewed source is > 0
    rows = [
        (1, "a b c d", "en", "s1", 1),
        (2, "a b c d", "en", "s2", 1),
        (3, "a a a a", "en", "s3", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.source: r for r in source_divergence(docs).collect()}
    assert got["s1"].kl_vs_corpus == got["s2"].kl_vs_corpus
    assert got["s3"].kl_vs_corpus > 0
    assert all(r.kl_vs_corpus >= 0 for r in got.values())
    assert got["s3"].n_distinct_terms == 1 and got["s3"].n_tokens == 4


def test_packing_efficiency_audit_consistent_with_packer(spark):
    from pyspark.sql import functions as F

    from music_streaming_etl_glue_spark.operators.text import (
        PACK_TARGET_TOKENS,
        packing_efficiency,
        pack_chunks,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eff = packing_efficiency(docs)
    rows = eff.collect()
    # start-offset assignment: overflow is bounded by one chunk's tokens
    from music_streaming_etl_glue_spark.operators.text import CHUNK_TOKENS

    assert all(r.padding_tokens > -CHUNK_TOKENS for r in rows)
    assert all(
        0 < r.fill_ratio < 1 + CHUNK_TOKENS / PACK_TARGET_TOKENS for r in rows
    )
    assert all(
        r.example_tokens + r.padding_tokens == PACK_TARGET_TOKENS for r in rows
    )
    # audit totals reconcile with the raw packing assignment
    total = pack_chunks(docs).agg(F.sum("chunk_tokens")).first()[0]
    assert sum(r.example_tokens for r in rows) == total


def test_prefix_filter_exact_and_reduces_candidates(docs):
    """PPJoin prefix filtering must (a) return exactly the naive join's
    pairs and (b) generate FEWER candidate pairs than the naive shingle
    join's Σ df·(df−1)/2 — losslessness and the point of the filter."""
    from pyspark.sql import functions as F

    naive = {
        (r.doc_id_a, r.doc_id_b, round(r.jaccard, 9))
        for r in dedup.ngram_jaccard_pairs(docs).collect()
    }
    stats: dict = {}
    pref = {
        (r.doc_id_a, r.doc_id_b, round(r.jaccard, 9))
        for r in dedup.jaccard_pairs_prefix(docs, candidate_stats=stats).collect()
    }
    assert pref == naive
    naive_candidates = (
        dedup.shingles(docs)
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("c"))
        .collect()[0]
        .c
    )
    assert stats["candidates"] < naive_candidates


def test_vocab_approx_matches_exact_within_tie_boundary(docs):
    """approx_top_k with capacity ≥ vocabulary: every returned count is
    the exact count, and the returned set contains every term strictly
    above the k-th count (only boundary ties may differ)."""
    from music_streaming_etl_glue_spark.operators.text import (
        vocab_top_terms,
        vocab_top_terms_approx,
    )

    full = {
        r.term: r.term_count
        for r in vocab_top_terms(docs, k=1_000_000).collect()
    }
    exact = dict(sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:50])
    approx = {
        r.term: r.term_count
        for r in vocab_top_terms_approx(docs, k=50).collect()
    }
    assert len(approx) == len(exact)
    # capacity >> vocabulary ⇒ every sketch count is the exact count
    for term, cnt in approx.items():
        assert full[term] == cnt
    kth = min(exact.values())
    must_have = {t for t, c in exact.items() if c > kth}
    assert must_have <= set(approx)


def test_corpus_shuffle_is_append_stable(docs):
    """Adding documents must not move any existing doc's relative order
    within its shard (stable lottery: md5 keys don't change, new rows
    only insert between existing ones)."""
    full = dedup.corpus_shuffle(docs)
    half = dedup.corpus_shuffle(docs.limit(docs.count() // 2))
    # relative order of surviving docs per shard is preserved
    def order(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.shard, []).append((r.pos, r.doc_id))
        return {s: [d for _, d in sorted(v)] for s, v in out.items()}

    half_ids = {r.doc_id for r in half.select("doc_id").collect()}
    full_o, half_o = order(full), order(half)
    for shard, seq in half_o.items():
        projected = [d for d in full_o.get(shard, []) if d in half_ids]
        assert projected == seq


def test_token_budget_sample_respects_budget_and_stability(docs):
    from pyspark.sql import functions as F

    budget = 80
    kept = dedup.token_budget_sample(docs, budget=budget)
    rows = kept.collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
    for src, rs in per_source.items():
        assert max(r.cum_tokens for r in rs) <= budget
    # append stability: the kept set of a subset corpus is a superset
    # restricted to surviving docs — an earlier winner is never evicted
    # by REMOVING other docs (dropping rows only frees budget)
    sub = docs.filter(F.col("doc_id") % 3 != 0)
    kept_sub = {
        r.doc_id for r in dedup.token_budget_sample(sub, budget=budget).collect()
    }
    kept_full = {r.doc_id for r in rows}
    surviving_winners = {d for d in kept_full if d % 3 != 0}
    assert surviving_winners <= kept_sub


def test_interleave_sources_is_proportional_permutation(docs):
    """Closed-form stride ranks must form an exact permutation 1..N, and
    every rank-prefix must hold each source within 1 item of its
    proportional share (the stride-scheduling guarantee)."""
    rows = dedup.interleave_sources(docs).collect()
    n = len(rows)
    ranks = sorted(r.global_rank for r in rows)
    assert ranks == list(range(1, n + 1))
    counts: dict = {}
    for r in rows:
        counts[r.source] = counts.get(r.source, 0) + 1
    seen: dict = {}
    for r in sorted(rows, key=lambda r: r.global_rank):
        seen[r.source] = seen.get(r.source, 0) + 1
        k = r.global_rank
        for s, tot in counts.items():
            expected = k * tot / n
            assert abs(seen.get(s, 0) - expected) <= 1.0 + 1e-9, (
                k, s, seen.get(s, 0), expected)


def test_phash_is_the_decoded_pixel_ahash_lane(spark, docs):
    """r9 unification: phash_* are aliases of the decoded-pixel aHash
    family — identical hash values under the legacy column name, and
    the planted ~3%-pixel-edit BMP dups surface within the banded
    radius exactly as on the image_ahash rung."""
    from music_streaming_etl_glue_spark.operators.multimodal import (
        BMP_DUP_MOD,
        BMP_DUP_RES,
        PHASH_MAX_HAMMING,
        image_ahash,
        phash_fingerprints,
        phash_near_dups,
    )

    sample = docs.orderBy("doc_id").limit(40)
    ph = {
        r.doc_id: r.phash for r in phash_fingerprints(sample).collect()
    }
    ah = {r.doc_id: r.ahash for r in image_ahash(sample).collect()}
    assert ph == ah, "phash must be the aHash values under the alias"

    near = {
        (r.doc_id_a, r.doc_id_b): r.hamming
        for r in phash_near_dups(sample).collect()
    }
    planted = [
        (d - BMP_DUP_RES, d)
        for d in ph
        if d % BMP_DUP_MOD == BMP_DUP_RES and d >= BMP_DUP_RES
    ]
    assert planted, "sample must contain planted BMP dups"
    for pair in planted:
        assert pair in near and near[pair] <= PHASH_MAX_HAMMING, pair


def test_pca_is_deterministic_orthonormal_and_reconstructive(embs):
    """Exact-Gram PCA: repeated training is bit-identical, components are
    orthonormal, eigenvalues descend, and a full-rank projection
    reconstructs every centered vector."""
    import numpy as np

    from music_streaming_etl_glue_spark.operators.similarity import (
        pca_explained_variance,
        pca_project,
        pca_train,
    )

    c1, w1, m1 = pca_train(embs, k=8)
    c2, w2, m2 = pca_train(embs, k=8)
    assert np.array_equal(c1, c2) and np.array_equal(w1, w2)
    assert np.array_equal(m1, m2)

    assert np.allclose(c1 @ c1.T, np.eye(8), atol=1e-9)
    assert all(w1[i] >= w1[i + 1] - 1e-12 for i in range(7))

    ev = pca_explained_variance(embs, k=8).collect()
    fr = [r.explained_fraction for r in sorted(ev, key=lambda r: r.component)]
    assert all(f > 0 for f in fr) and sum(fr) <= 1.0 + 1e-9

    # full-rank reconstruction on a sample
    dims = len(m1)
    cfull, _, mu = pca_train(embs, k=dims)
    sample = embs.limit(20).collect()
    proj = {
        r.vec_id: np.array(r.proj)
        for r in pca_project(embs.limit(20), cfull, mu).collect()
    }
    for r in sample:
        x = np.array(r.embedding, dtype="float64") - mu
        back = proj[r.vec_id] @ cfull
        assert np.allclose(back, x, atol=1e-6)


def test_gram_partials_are_additive_for_incremental_pca(embs):
    """The exact integer Gram is additive: Gram(A ∪ B) = Gram(A) +
    Gram(B) bit-for-bit — so PCA state maintains incrementally with the
    same merge shape as the KPI partials (no full-corpus rescan to
    refresh components after an append)."""
    import numpy as np

    from pyspark.sql import functions as F

    from music_streaming_etl_glue_spark.operators.similarity import (
        _dims,
        _exact_gram,
    )

    dims = _dims(embs)
    half_a = embs.filter(F.col("vec_id") % 2 == 0)
    half_b = embs.filter(F.col("vec_id") % 2 == 1)
    g, n, c = _exact_gram(embs, dims)
    ga, na, ca = _exact_gram(half_a, dims)
    gb, nb, cb = _exact_gram(half_b, dims)
    assert n == na + nb
    assert np.array_equal(g, ga + gb)
    assert np.array_equal(c, ca + cb)


def test_bigram_surprisal_flags_shuffled_word_order(spark):
    """A document whose words are common but whose ORDER is novel must
    out-score the same words in their corpus-typical order — the signal
    bigram surprisal adds over the unigram proxy."""
    from music_streaming_etl_glue_spark.operators.text import (
        bigram_surprisal,
    )

    normal = "the quick brown fox jumps over the lazy dog"
    rows = [(i, normal) for i in range(20)]
    rows.append((100, "dog the over fox lazy brown jumps quick the"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    s = {r.doc_id: r.avg_surprisal for r in bigram_surprisal(docs).collect()}
    typical = sum(v for k, v in s.items() if k != 100) / 20
    assert s[100] > 2 * typical, (s[100], typical)


def test_bpe_pinned_merges_match_trainer_at_sf001(spark):
    """BPE_PINNED_MERGES is the committed tokenizer artifact: the
    trainer re-run on the sf0.01 documents corpus must reproduce it
    verbatim — if the corpus or trainer changes, this fails loudly
    instead of the bpe_encode catalog entry silently encoding with a
    stale artifact."""
    from music_streaming_etl_glue_spark.operators.text import (
        BPE_PINNED_MERGES,
        train_bpe_merges,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    trained = tuple(
        (r.left, r.right)
        for r in train_bpe_merges(docs, n_merges=len(BPE_PINNED_MERGES))
        .orderBy("step")
        .collect()
    )
    assert trained == BPE_PINNED_MERGES


def test_bpe_encode_lossless_and_vocab_ids_consistent(spark):
    """bpe_encode invariants: symbols concatenate back to each token
    (lossless), sym_idx is dense 0..n-1 per token, and sym_id is a
    consistent bijection with the symbol across the whole corpus."""
    from music_streaming_etl_glue_spark.operators.text import bpe_encode

    docs = spark.createDataFrame(
        [(1, "lower in the western tower"), (2, "low stern matter")],
        "doc_id long, text string",
    )
    rows = bpe_encode(docs).collect()
    assert rows
    per_token: dict = {}
    sym_to_id: dict = {}
    for r in rows:
        per_token.setdefault((r.doc_id, r.token_idx), []).append(
            (r.sym_idx, r.symbol)
        )
        assert sym_to_id.setdefault(r.symbol, r.sym_id) == r.sym_id
    # ids are 1..|vocab| in lexicographic symbol order
    vocab = sorted(sym_to_id)
    assert [sym_to_id[s] for s in vocab] == list(range(1, len(vocab) + 1))
    texts = {1: "lower in the western tower", 2: "low stern matter"}
    for (doc_id, tidx), syms in per_token.items():
        syms.sort()
        assert [i for i, _ in syms] == list(range(len(syms)))
        token = texts[doc_id].split(" ")[tidx]
        assert "".join(s for _, s in syms) == token
    # the pinned rules actually fire on this corpus ("er", "in", "st"...)
    assert any(len(s) > 1 for s in sym_to_id)
