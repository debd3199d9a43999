"""Banded multi-bit sign-LSH: recall on planted pairs, sub-quadratic
candidate volume on the real sf0.1 embeddings, and hot-bucket skew
protection — the round-2 verdict's acceptance tests for replacing the
single 4-bit band (similarity SIGN_BITS) with md5-seeded banded
Rademacher hyperplanes.

Everything here is deterministic: hyperplanes are md5-derived and the
synthetic corpora use fixed numpy seeds, so each assertion is a fixed
fact about the chosen (bands, bits), not a flaky sample.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators.similarity import (
    CONTAMINATION_THRESHOLD,
    LSH_BANDS,
    LSH_BITS,
    cosine_pairs_lsh,
    lsh_candidate_stats,
    semantic_contamination,
    semantic_contamination_lsh,
)

SF01 = "/root/testdata/sf0.1"
SF_CORRECT = "/root/testdata/sf0.01"
DIMS = 64


def _unit(v: np.ndarray) -> np.ndarray:
    return v / np.sqrt(v @ v)


def _planted_corpus(
    n_background: int, planted: list[tuple[float, int]], seed: int = 7
):
    """Random background vectors plus planted pairs at given cosines.

    ``planted`` = [(target_cosine, count)]. Returns (rows, pairs) where
    pairs maps (lo_id, hi_id) -> target cosine. Pair construction:
    b = c·a + sqrt(1−c²)·w with w ⊥ a, so cos(a, b) = c exactly (up to
    float eps)."""
    rng = np.random.RandomState(seed)
    vecs = [rng.randn(DIMS) for _ in range(n_background)]
    pairs: dict[tuple[int, int], float] = {}
    for cos_target, count in planted:
        for _ in range(count):
            a = _unit(rng.randn(DIMS))
            w = rng.randn(DIMS)
            w = _unit(w - (w @ a) * a)
            b = cos_target * a + np.sqrt(1.0 - cos_target**2) * w
            ia, ib = len(vecs), len(vecs) + 1
            vecs.append(a * 2.0)  # arbitrary scales: cosine is scale-free
            vecs.append(b * 0.5)
            pairs[(ia, ib)] = cos_target
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return rows, pairs


def _make_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_planted_pairs_recall(spark):
    """Near-dup pairs (cosine ≈ 0.95) are ALWAYS found; cosine ≈ 0.5
    pairs are found at ≥ the s-curve rate (theoretical 0.77 for
    128 bands × 11 bits). The round-2 single 4-bit band found ≈ 31% at
    0.5 — this is the regression fence against going back."""
    rows, pairs = _planted_corpus(
        300, [(0.95, 3), (0.55, 10), (0.5, 20)]
    )
    df = _make_df(spark, rows)
    got = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in cosine_pairs_lsh(df, threshold=0.45).collect()
    }
    near_dups = [p for p, c in pairs.items() if c >= 0.9]
    mids = [p for p, c in pairs.items() if c < 0.9]
    assert all(p in got for p in near_dups)
    found_mid = sum(p in got for p in mids)
    assert found_mid / len(mids) >= 0.6, f"{found_mid}/{len(mids)} mid pairs"


def test_found_pairs_are_verified(spark):
    """Every emitted pair passed exact verification: similarity ≥
    threshold and matches the numpy cosine to 6dp — LSH affects recall
    only, never precision."""
    rows, _ = _planted_corpus(150, [(0.6, 5)])
    df = _make_df(spark, rows)
    vec_by_id = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    for r in cosine_pairs_lsh(df, threshold=0.45).collect():
        a = vec_by_id[r["vec_id_a"]]
        b = vec_by_id[r["vec_id_b"]]
        exact = (a @ b) / np.sqrt((a @ a) * (b @ b))
        assert r["similarity"] >= 0.45
        assert abs(r["similarity"] - exact) < 2e-6


def test_candidate_volume_sub_quadratic_sf01(spark):
    """On the real sf0.1 embeddings the banded miner generates FEWER
    distinct candidates than the n²/16 of the single-4-bit-band design
    it replaced — the verdict's telemetry gate."""
    embs = spark.read.parquet(f"{SF01}/embeddings.parquet")
    stats = lsh_candidate_stats(embs)
    assert stats["n"] > 0
    assert stats["candidate_pairs"] < stats["quadratic_bound"], stats
    # and the raw per-band work is in the same regime (dedup isn't doing
    # the heavy lifting for a pathological banding)
    assert stats["bucket_pairs"] < 2 * stats["quadratic_bound"], stats


def test_hot_bucket_cap_bounds_candidates(spark):
    """Boilerplate-cluster skew: 100 near-identical vectors form one hot
    bucket in every band (m²/2 ≈ 5k pairs). The capped pipeline variant
    drops oversized buckets — bounding the quadratic blowup — while
    still finding a planted near-dup pair outside the hot cluster."""
    rng = np.random.RandomState(11)
    hot = _unit(rng.randn(DIMS))
    vecs = [hot + 1e-4 * rng.randn(DIMS) for _ in range(100)]
    vecs += [rng.randn(DIMS) for _ in range(100)]
    a = _unit(rng.randn(DIMS))
    b = 0.97 * a + np.sqrt(1 - 0.97**2) * _unit(
        rng.randn(DIMS) - a * (rng.randn(DIMS) @ a)
    )
    planted = (len(vecs), len(vecs) + 1)
    vecs += [a, b]
    df = _make_df(
        spark, [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    )

    uncapped = cosine_pairs_lsh(df, threshold=0.45)
    capped = cosine_pairs_lsh(df, threshold=0.45, max_bucket_size=20)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    # uncapped pays (and emits) the full hot clique
    assert n_uncapped >= 100 * 99 // 2
    # capped: clique buckets exceed the cap in every band -> excluded
    assert n_capped < 100
    got_capped = {
        (r["vec_id_a"], r["vec_id_b"]) for r in capped.collect()
    }
    assert planted in got_capped


def test_contamination_exact_is_recall_one(spark):
    """The default semantic screen is exhaustive: it reports exactly the
    set of (corpus, bench) pairs whose cosine ≥ threshold per numpy —
    recall 1.0, the property the round-2 LSH screen lacked. The LSH twin
    must be a subset (it only pre-screens candidates)."""
    embs = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    rows = embs.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    unit = mat / np.sqrt((mat * mat).sum(1, keepdims=True))
    sims = unit @ unit.T
    is_bench = ids % 20 == 0
    expected = set()
    for i in range(len(ids)):
        if is_bench[i]:
            continue
        for j in range(len(ids)):
            if not is_bench[j]:
                continue
            if round(sims[i, j], 6) >= CONTAMINATION_THRESHOLD:
                expected.add((int(ids[i]), int(ids[j])))

    exact = {
        (r["vec_id"], r["bench_vec_id"])
        for r in semantic_contamination(embs).collect()
    }
    assert exact == expected

    lsh = {
        (r["vec_id"], r["bench_vec_id"])
        for r in semantic_contamination_lsh(embs).collect()
    }
    assert lsh <= exact
    # measured recall of the pre-screen stays above the s-curve estimate
    assert len(lsh) / max(1, len(exact)) >= 0.8


def test_defaults_match_docstring_scurve():
    """The committed defaults must stay on the recall/cost trade the
    docstrings advertise; changing LSH_BANDS/LSH_BITS requires re-deriving
    both."""
    import math

    def recall(c: float, bands: int, bits: int) -> float:
        p = 1.0 - math.acos(c) / math.pi
        return 1.0 - (1.0 - p**bits) ** bands

    assert recall(0.5, LSH_BANDS, LSH_BITS) > 0.7
    assert recall(0.7, LSH_BANDS, LSH_BITS) > 0.95
    # expected random-pair candidate fraction stays under the old n²/16
    assert LSH_BANDS / 2**LSH_BITS / 2 < 1 / 16


def test_derive_banding_matches_scaling_experiment():
    """derive_banding must reproduce the measured scaling-experiment
    anchors (SCALE.md table): the committed default at n=2k and the
    re-derived banding that beat it at 10x rows — plus the clamp (small
    corpora keep the oracle's banding) and the broadcast cap."""
    from music_streaming_etl_glue_spark.operators.similarity import (
        derive_banding,
    )

    assert derive_banding(2_000) == (128, 11)
    assert derive_banding(20_000) == (512, 14)
    # clamp: every sub-2k corpus (all test sfs) bands like the oracle SQL
    for n in (1, 50, 500, 2_000):
        assert derive_banding(n) == (LSH_BANDS, LSH_BITS)
    # monotone growth, bounded broadcast
    b1, _ = derive_banding(200_000)
    b2, _ = derive_banding(10**9)
    assert 512 <= b1 <= 4096 and b1 <= b2 <= 4096


def test_hot_cone_cap_keeps_far_pair_recall(spark):
    """Adversarial skew at 30%: 300 of 1000 vectors sit in one tight
    cone (every band hashes the cone to one bucket → ~45k clique pairs
    uncapped). With the cap ON, total candidate volume must stay near
    the background level AND every planted far pair — well outside the
    cone — must still be found: the cap may only drop oversized
    buckets, never the selective ones that carry real signal."""
    rng = np.random.RandomState(23)
    apex = _unit(rng.randn(DIMS))
    vecs = [apex + 3e-4 * rng.randn(DIMS) for _ in range(300)]
    vecs += [rng.randn(DIMS) for _ in range(680)]
    planted = []
    for _ in range(10):
        a = _unit(rng.randn(DIMS))
        # keep plants away from the cone so cap-drops can't mask a miss
        while abs(a @ apex) > 0.2:
            a = _unit(rng.randn(DIMS))
        w = rng.randn(DIMS)
        w = _unit(w - (w @ a) * a)
        b = 0.9 * a + np.sqrt(1 - 0.9**2) * w
        ia, ib = len(vecs), len(vecs) + 1
        vecs += [a, b]
        planted.append((ia, ib))
    df = _make_df(
        spark, [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    ).repartition(8)

    capped = cosine_pairs_lsh(df, threshold=0.45, max_bucket_size=30)
    got = {(r["vec_id_a"], r["vec_id_b"]) for r in capped.collect()}
    for pair in planted:
        assert pair in got, f"cap dropped planted far pair {pair}"
    # the cone's ~45k-pair clique must NOT dominate the output: without
    # the cap every band emits the full clique; with it the survivors
    # are background-scale
    assert len(got) < 2_000, len(got)


def test_corpus_count_memoized_per_file_signature(spark, tmp_path):
    """derive_banding's corpus count must run ONE count() action per
    (plan, file-signature) identity — repeat calls over the same parquet
    hit the memo, a rewrite of the same path misses it, and a filtered
    plan over the same files keys separately (different cardinality)."""
    import os

    from music_streaming_etl_glue_spark.operators import similarity as sim

    path = str(tmp_path / "emb.parquet")
    spark.range(40).selectExpr(
        "id AS vec_id", "array(CAST(id AS float), 1.0f) AS embedding"
    ).write.parquet(path)

    df = spark.read.parquet(path)
    key = sim._corpus_uid(df)
    assert key is not None
    assert sim._corpus_count(df) == 40
    assert sim._corpus_count_cache[key] == 40

    # memo hit: even a poisoned cache value is returned verbatim,
    # proving no count() action re-ran
    sim._corpus_count_cache[key] = 41
    assert sim._corpus_count(spark.read.parquet(path)) == 41
    sim._corpus_count_cache[key] = 40

    # a different plan over the SAME files must not collide
    filtered = spark.read.parquet(path).filter("vec_id < 10")
    assert sim._corpus_uid(filtered) != key
    assert sim._corpus_count(filtered) == 10

    # rewriting the path invalidates via (mtime_ns, size)
    spark.range(7).selectExpr(
        "id AS vec_id", "array(CAST(id AS float), 1.0f) AS embedding"
    ).write.mode("overwrite").parquet(path)
    df2 = spark.read.parquet(path)
    assert sim._corpus_uid(df2) != key
    assert sim._corpus_count(df2) == 7
