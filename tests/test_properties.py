"""Property-based tests for the engine's determinism contracts:
partition-count invariance of the decimal-accumulator sums and
shuffle-invariance of ranked results."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.functions.numeric import exact_sum

two_dp_doubles = st.lists(
    st.integers(min_value=-10_000_00, max_value=10_000_00).map(lambda c: c / 100.0),
    min_size=1,
    max_size=200,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=two_dp_doubles, parts=st.integers(min_value=1, max_value=9))
def test_exact_sum_partition_invariant(spark, values, parts):
    """exact_sum must be bit-identical regardless of partitioning — the
    property raw double sums do NOT have."""
    df = spark.createDataFrame([(v,) for v in values], "v double")
    a = df.coalesce(1).agg(exact_sum("v").alias("s")).head()["s"]
    b = df.repartition(parts).agg(exact_sum("v").alias("s")).head()["s"]
    assert a == b
    # and it equals the exact decimal sum computed in Python
    from decimal import Decimal

    expect = float(sum(Decimal(f"{v:.2f}") for v in values))
    assert a == expect


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(parts=st.integers(min_value=1, max_value=16))
def test_dense_rank_partition_invariant(spark, parts):
    rows = [(g, i % 5) for g in ("a", "b") for i in range(20)]
    df = spark.createDataFrame(rows, "g string, v int").repartition(parts)
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.col("v").desc())
    out = sorted(
        map(tuple, df.withColumn("r", F.dense_rank().over(w)).collect())
    )
    base = sorted(
        map(
            tuple,
            spark.createDataFrame(rows, "g string, v int")
            .withColumn("r", F.dense_rank().over(w))
            .collect(),
        )
    )
    assert out == base


# ---------------------------------------------------------------------------
# round-2 kernels vs naive Python references on random instances
# ---------------------------------------------------------------------------

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_connected_components_matches_union_find(spark, edges):
    from music_streaming_etl_glue_spark.operators.clusters import (
        connected_components,
    )

    n = 15
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min vertex of the component
    expected = {}
    for v in range(n):
        root = find(v)
        expected.setdefault(root, []).append(v)
    want = {v: min(members) for members in expected.values() for v in members}

    vertices = spark.range(n).select(F.col("id"))
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r.id: r.cluster_id
        for r in connected_components(vertices, edf).collect()
    }
    assert got == want


interval_instances = st.tuples(
    st.lists(st.integers(min_value=0, max_value=500), min_size=0, max_size=20),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=480),
            st.integers(min_value=1, max_value=120),
        ),
        min_size=0,
        max_size=8,
    ),
    st.sampled_from([7, 50, 128]),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(inst=interval_instances)
def test_interval_join_bucketed_matches_naive(spark, inst):
    """For any points, intervals, and bucket size: the chunked equi-join
    must produce exactly the naive O(n·m) half-open containment matches,
    each exactly once."""
    from music_streaming_etl_glue_spark.operators.asof import (
        interval_join_bucketed,
    )

    points, raw_intervals, bucket = inst
    intervals = [(i, s, s + ln) for i, (s, ln) in enumerate(raw_intervals)]
    want = sorted(
        (pid, iid)
        for pid, p in enumerate(points)
        for iid, s, e in intervals
        if s <= p < e
    )
    pdf = spark.createDataFrame(list(enumerate(points)), "pid int, p bigint")
    idf = spark.createDataFrame(intervals, "iid int, s bigint, e bigint")
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join_bucketed(
            pdf, idf, "p", "s", "e", bucket
        ).collect()
    )
    assert got == want


asof_instances = st.tuples(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=12),
    st.lists(st.integers(min_value=0, max_value=100), min_size=0, max_size=12),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(inst=asof_instances)
def test_asof_directions_match_sorted_reference(spark, inst):
    """Backward picks the greatest right_ts <= left_ts, forward the
    smallest right_ts >= left_ts — verified against bisect on the sorted
    right list for random instances."""
    import bisect
    import datetime as dt

    from music_streaming_etl_glue_spark.operators.asof import asof_join

    left_ts, right_ts = inst
    base = dt.datetime(2024, 1, 1)
    to_ts = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    left = spark.createDataFrame(
        [(i, 1, to_ts(s)) for i, s in enumerate(left_ts)],
        "lid int, k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, to_ts(s), float(s)) for s in set(right_ts)],
        "k int, ts timestamp, value double",
    )
    rs = sorted(set(right_ts))

    for direction in ("backward", "forward"):
        got = {
            r.lid: r.asof_ts
            for r in asof_join(
                left, right, key="k", right_values=["value"],
                direction=direction,
            ).collect()
        }
        for i, s in enumerate(left_ts):
            if direction == "backward":
                j = bisect.bisect_right(rs, s) - 1
                want = to_ts(rs[j]) if j >= 0 else None
            else:
                j = bisect.bisect_left(rs, s)
                want = to_ts(rs[j]) if j < len(rs) else None
            assert got[i] == want, (direction, i, s, got[i], want)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=39),
            st.integers(min_value=0, max_value=39),
        ),
        max_size=60,
    )
)
def test_two_phase_cc_matches_union_find(spark, edges):
    """Both CC kernels must label every vertex with its component's
    minimum id on arbitrary random graphs (self-loops, parallel edges,
    cycles included) — checked against a Python union-find."""
    from music_streaming_etl_glue_spark.operators.clusters import (
        connected_components_two_phase,
    )

    n = 40
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in range(n)}
    # canonicalize: label = min id in component
    comp_min: dict[int, int] = {}
    for v, r in expected.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {v: comp_min[find(v)] for v in range(n)}

    verts = spark.range(n).select(F.col("id"))
    edf = spark.createDataFrame(
        edges or [(0, 0)], "src bigint, dst bigint"
    )
    got = {
        r.id: r.cluster_id
        for r in connected_components_two_phase(verts, edf).collect()
    }
    assert got == expected


def test_two_level_operators_are_partition_invariant(spark):
    """The two-level running-sum/rank operators must produce identical
    assignments regardless of physical partitioning — their order is the
    md5 key, never the shuffle layout."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        rebalance_sources,
    )
    from music_streaming_etl_glue_spark.operators.text import pack_chunks
    from music_streaming_etl_glue_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    for fn in (pack_chunks, rebalance_sources):
        a = {tuple(r) for r in fn(docs.coalesce(1)).collect()}
        b = {tuple(r) for r in fn(docs.repartition(7)).collect()}
        assert a == b, fn.__name__


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=12), min_size=1, max_size=5
    )
)
def test_interleave_closed_form_matches_naive_sort(spark, sizes):
    """The pointwise stride-rank formula must equal the rank a naive
    global sort by (p/n as exact fraction, source, doc_id) produces, for
    arbitrary source-size mixes — including the all-equal-counts case
    where every key ties across sources."""
    from fractions import Fraction

    from music_streaming_etl_glue_spark.operators.dedup import (
        interleave_sources,
    )

    rows, doc_id = [], 0
    for si, n in enumerate(sizes):
        for _ in range(n):
            rows.append((doc_id, f"s{si}"))
            doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r.doc_id: r.global_rank
        for r in interleave_sources(docs.withColumn("text", F.lit("x"))).collect()
    }

    # naive reference: per-source md5 order -> exact-fraction keys -> sort
    import hashlib

    per_source: dict = {}
    for d, s in rows:
        per_source.setdefault(s, []).append(d)
    keyed = []
    for s, ids in per_source.items():
        ordered = sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        n = len(ordered)
        for p, d in enumerate(ordered, start=1):
            keyed.append((Fraction(p, n), s, d))
    expected = {
        d: i + 1
        for i, (_, _, d) in enumerate(sorted(keyed))
    }
    assert got == expected


def test_sampling_family_is_partition_invariant(spark):
    """corpus_shuffle, token_budget_sample, and interleave_sources must
    be bit-identical under different partitionings — the determinism
    contract that makes reruns and repartitions free."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        corpus_shuffle,
        interleave_sources,
        token_budget_sample,
    )

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 50}" for j in range(10 + i % 5)),
         f"s{i % 3}")
        for i in range(120)
    ]
    base = spark.createDataFrame(rows, "doc_id long, text string, source string")
    for fn in (
        corpus_shuffle,
        lambda d: token_budget_sample(d, budget=60),
        interleave_sources,
    ):
        a = sorted(map(tuple, fn(base.repartition(1)).collect()))
        b = sorted(map(tuple, fn(base.repartition(13)).collect()))
        assert a == b


def test_interleave_all_equal_counts_is_exact_permutation(spark):
    """The maximal-tie pattern: every source has the SAME count, so every
    key p/n collides across all sources and the rank leans entirely on
    the tie-break arm. The closed form must still emit a permutation of
    1..N that matches the exact-fraction sort oracle."""
    from fractions import Fraction
    import hashlib

    from music_streaming_etl_glue_spark.operators.dedup import (
        interleave_sources,
    )

    n_sources, per = 6, 8
    rows = [
        (si * per + j, f"src{si}")
        for si in range(n_sources)
        for j in range(per)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string"
    ).withColumn("text", F.lit("x"))
    got = {r.doc_id: r.global_rank for r in interleave_sources(docs).collect()}
    assert sorted(got.values()) == list(range(1, n_sources * per + 1))

    per_source: dict = {}
    for d, s in rows:
        per_source.setdefault(s, []).append(d)
    keyed = []
    for s, ids in per_source.items():
        ordered = sorted(
            ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )
        for p, d in enumerate(ordered, start=1):
            keyed.append((Fraction(p, per), s, d))
    expected = {d: i + 1 for i, (_, _, d) in enumerate(sorted(keyed))}
    assert got == expected


def test_interleave_rank_expr_exact_at_int64_boundaries(spark):
    """The closed-form rank's integer arithmetic (remainder-subtracted
    decimal division) must stay EXACT for products p·n2 right up against
    2^63 — the regime where a double-based floor-div silently rounds.
    Ground truth is Python bigint: #smaller = Σ min(n2, (p·n2−1)//n),
    plus the divisibility tie arm, computed with unbounded integers."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        interleave_rank_expr,
    )

    M = 2**63 - 1
    # (p, n, source, [(s, n2), ...]) — own source included, as in the
    # production __sources array
    cases = [
        # max product p·n2 = 2^63−1 (rank stays in-domain: a corpus of
        # 2^63 rows would make the RANK itself overflow legitimately)
        (1, 2, "b", [("a", M), ("b", 2)]),
        # product = 3·((2^63−1)//3) — one below the largest multiple of 3
        (3, 7, "b", [("a", (M // 3)), ("b", 7)]),
        # divisibility-tie arm at scale: 4·n2 ≡ 0 (mod 4), s < source
        (4, 4, "z", [("a", M // 4), ("z", 4)]),
        # all-equal huge counts: every key ties, p small
        (2, 2**61, "b", [("a", 2**61), ("b", 2**61)]),
        # off-by-one sweep around an exact multiple of n
        (5, 9, "b", [("a", (M // 5) - 1), ("b", 9)]),
        (5, 9, "b", [("a", M // 5), ("b", 9)]),
        # small, brute-force verifiable control
        (4, 6, "b", [("a", 10), ("b", 6), ("c", 7)]),
    ]

    def expected(p, n, source, sources):
        smaller = sum(min(n2, (p * n2 - 1) // n) for _s, n2 in sources)
        ties = sum(
            1
            for s, n2 in sources
            if s < source
            and (p * n2) % n == 0
            and 1 <= (p * n2) // n <= n2
        )
        return smaller + ties + 1

    # independent brute force for the small control row
    p, n, src, srcs = cases[-1]
    brute_smaller = sum(
        sum(1 for pp in range(1, n2 + 1) if pp * n < p * n2)
        for _s, n2 in srcs
    )
    brute_ties = sum(
        sum(1 for pp in range(1, n2 + 1) if s < src and pp * n == p * n2)
        for s, n2 in srcs
    )
    assert expected(p, n, src, srcs) == brute_smaller + brute_ties + 1

    df = spark.createDataFrame(
        [
            (i, p, n, source, [{"s": s, "n2": n2} for s, n2 in sources])
            for i, (p, n, source, sources) in enumerate(cases)
        ],
        "case int, p long, n long, source string, "
        "__sources array<struct<s string, n2 long>>",
    )
    got = {
        r.case: r.rank
        for r in df.select(
            "case", interleave_rank_expr().alias("rank")
        ).collect()
    }
    want = {
        i: expected(*case) for i, case in enumerate(cases)
    }
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet="abcdefgh XY",  # small alphabet forces collisions
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_winnowing_matches_python_reference(spark, texts):
    """The winnowed fingerprint SET must equal a from-scratch Python
    replication of the scheme (same md5-derived hashes, same window-min
    selection) on arbitrary corpora, including sub-k-gram strings."""
    import hashlib

    from music_streaming_etl_glue_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnowing_fingerprints,
    )

    def ref(text: str) -> set[int]:
        k, w = WINNOW_K, WINNOW_W
        hs = [
            int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:15], 16)
            for i in range(len(text) - k + 1)
        ]
        return {
            min(hs[j : j + w]) for j in range(len(hs) - w + 1)
        }

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnowing_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in enumerate(texts):
        assert got.get(i, set()) == ref(t), f"doc {i}: {t!r}"


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=0,
            max_size=12,
        ).map(" ".join),
        min_size=2,
        max_size=10,
    )
)
def test_containment_matches_python_reference(spark, texts):
    """Directional containment must equal the brute-force set arithmetic
    on arbitrary tiny-vocab corpora (maximal collision pressure)."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        SHINGLE_N,
        containment_pairs,
    )

    def sh(text: str) -> set[str]:
        toks = text.split(" ")
        return {
            " ".join(toks[i : i + SHINGLE_N])
            for i in range(len(toks) - SHINGLE_N + 1)
        } if len(toks) >= SHINGLE_N else set()

    sets = {i: sh(t) for i, t in enumerate(texts)}
    expect = set()
    for a in sets:
        for b in sets:
            if a != b and sets[a] and len(sets[a] & sets[b]) / len(sets[a]) >= 0.8:
                expect.add((a, b))
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r["contained_doc"], r["container_doc"])
        for r in containment_pairs(df).collect()
    }
    assert got == expect


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    dups=st.lists(st.integers(min_value=1, max_value=5), min_size=1, max_size=6)
)
def test_soft_dedup_weights_exact(spark, dups):
    """weight is exactly 1/multiplicity and total mass equals the number
    of distinct texts, for arbitrary planted multiplicities."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        soft_dedup_weights,
    )

    rows, did = [], 0
    for g, mult in enumerate(dups):
        for _ in range(mult):
            rows.append((did, f"text number {g}", "en", "s", 10))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = soft_dedup_weights(df).collect()
    by_doc = {r["doc_id"]: r for r in out}
    did = 0
    for g, mult in enumerate(dups):
        for _ in range(mult):
            assert by_doc[did]["dup_count"] == mult
            assert by_doc[did]["weight"] == round(1.0 / mult, 9)
            did += 1
    total = sum(r["weight"] for r in out)
    assert abs(total - len(dups)) < 1e-6


# ---------------------------------------------------------------------------
# round-7 kernels
# ---------------------------------------------------------------------------


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    member_mod=st.integers(min_value=2, max_value=9),
    n=st.integers(min_value=10, max_value=120),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_bloom_probe_never_false_negative(spark, member_mod, n, seed):
    """For ANY corpus the Bloom word-relation is the OR of member masks,
    so every member must probe as a candidate — zero false negatives is
    a structural guarantee, not a tuning outcome."""
    import random

    from pyspark.sql import functions as F

    from music_streaming_etl_glue_spark.operators.dedup import (
        bloom_build,
        bloom_probe,
    )

    rng = random.Random(seed)
    texts = [f"doc {rng.randrange(1_000_000)} {i % member_mod}" for i in range(n)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    keys = docs.select(F.md5("text").alias("text_hash"))
    bloom = bloom_build(keys.distinct())
    flags = bloom_probe(
        docs.select("doc_id", F.md5("text").alias("text_hash")), bloom
    )
    assert all(r.bloom_candidate for r in flags.collect())


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=2**31),
    n=st.integers(min_value=25, max_value=120),
)
def test_equiheight_histogram_invariants(spark, seed, n):
    """Counts conserve the input, shares sum to 1, bucket [lo, hi]
    ranges are disjoint and ordered by bucket id."""
    import random

    from music_streaming_etl_glue_spark.operators.analytics import (
        value_equiheight_histogram,
    )

    rng = random.Random(seed)
    vals = [rng.expovariate(0.2) for _ in range(n)]  # skewed
    events = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "event_id long, value double"
    )
    rows = sorted(
        value_equiheight_histogram(events).collect(), key=lambda r: r.bucket
    )
    assert sum(r.n for r in rows) == n
    # shares are 6dp-rounded: the sum can drift by buckets * 5e-7
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-5
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo + 1e-12
        assert a.bucket < b.bucket


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(min_value=0, max_value=2**31))
def test_mmr_selection_properties(spark, seed):
    """Rank 1 is always the relevance argmax; the chosen set is distinct
    and drawn from the candidate pool; every greedy pick's MMR objective
    matches a pure-Python replay."""
    import random

    from music_streaming_etl_glue_spark.operators.similarity import (
        MMR_LAMBDA,
        ROUND,
        ann_topk_bruteforce,
        mmr_rerank,
    )

    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(6)], 0) for i in range(25)
    ]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    pool_rows = ann_topk_bruteforce(embs, 8, 0).collect()
    got = sorted(mmr_rerank(embs, k=4, pool=8).collect(), key=lambda r: r.rank)
    ids = [r.vec_id for r in got]
    assert len(set(ids)) == 4
    pool_ids = {r.vec_id for r in pool_rows}
    assert set(ids) <= pool_ids
    # rank 1 = relevance argmax with vec_id tiebreak
    best = sorted(pool_rows, key=lambda r: (-r.similarity, r.vec_id))[0]
    assert ids[0] == best.vec_id

    # pure-Python replay of the greedy loop over the same rounded inputs
    import numpy as np

    vecs = {i: np.asarray(v, dtype="float64") for i, v, _ in rows}
    rel = {r.vec_id: r.similarity for r in pool_rows}
    cand = sorted(pool_ids)

    def sim(a, b):
        va, vb = vecs[a], vecs[b]
        return round(
            float(va @ vb / (np.sqrt(va @ va) * np.sqrt(vb @ vb))), ROUND
        )

    chosen = []
    for _ in range(4):
        best_id, best_obj = None, None
        for c in cand:
            if c in chosen:
                continue
            obj = MMR_LAMBDA * rel[c] - (
                (1 - MMR_LAMBDA) * max(sim(c, s) for s in chosen)
                if chosen
                else 0.0
            )
            if best_obj is None or obj > best_obj:
                best_id, best_obj = c, obj
        chosen.append(best_id)
    assert ids == chosen


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_property(h, w, seed):
    """encode_bmp/decode_image roundtrip pixel-exactly for ANY dims —
    including the padding-relevant widths (w mod 4 residues) and 1-pixel
    edges the synth fixture never hits."""
    import numpy as np

    from music_streaming_etl_glue_spark.operators import multimodal as M

    rng = np.random.RandomState(seed % (2**31 - 1))
    arr = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    payload = M.encode_bmp(arr)
    assert payload[:2] == b"BM"
    assert len(payload) == 54 + h * ((3 * w + 3) // 4 * 4)
    assert np.array_equal(M.decode_image(payload), arr)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=16),
            st.integers(min_value=1, max_value=16),
            st.integers(min_value=0, max_value=2**31 - 1),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=25, deadline=None)
def test_video_container_roundtrip_property(dims):
    """The MSEV container seeks any frame of any mixed-dims clip
    byte-exactly; the index walk never depends on other frames."""
    import numpy as np

    from music_streaming_etl_glue_spark.operators import multimodal as M

    frames = [
        np.random.RandomState(seed % (2**31 - 1))
        .randint(0, 256, size=(h, w, 3))
        .astype(np.uint8)
        for h, w, seed in dims
    ]
    payload = M.encode_video(frames)
    assert M.video_frame_count(payload) == len(frames)
    # random-access order, not sequential — the seek contract
    for i in reversed(range(len(frames))):
        assert np.array_equal(M.decode_video_frame(payload, i), frames[i])


@given(
    st.integers(min_value=0, max_value=2**64 - 1),
    st.sets(st.integers(min_value=0, max_value=63), max_size=12),
)
@settings(max_examples=300, deadline=None)
def test_band_specs_pigeonhole_property(base, flips):
    """For ANY pair within Hamming 12, at least one of the 13
    AHASH_BAND_SPECS band values is equal — the pure-arithmetic form of
    the banded join's exact-recall guarantee (the Spark/DuckDB joins
    both key on exactly these (offset, mask) extractions)."""
    from music_streaming_etl_glue_spark.operators.multimodal import (
        AHASH_BAND_SPECS,
    )

    other = base
    for bit in flips:
        other ^= 1 << bit
    shared = any(
        (base >> off) & mask == (other >> off) & mask
        for off, mask in AHASH_BAND_SPECS
    )
    assert shared
