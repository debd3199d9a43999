"""Product quantization: encoding validity and recall bounds."""

from __future__ import annotations

from music_streaming_etl_glue_spark.operators import similarity as sim
from music_streaming_etl_glue_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_pq_codes_shape_and_range(spark):
    embs = load_table(spark, SF_SMOKE, "embeddings")
    rows = sim.pq_codes(embs).collect()
    assert len(rows) == embs.count()
    for r in rows:
        assert len(r.codes) == sim.PQ_SUBSPACES
        assert all(0 <= c < sim.PQ_CODES for c in r.codes)


def test_pq_codebook_is_complete(spark):
    """Every (subspace, code) cell exists with a full-width vector —
    including cells no vector mapped to (seed fallback)."""
    embs = load_table(spark, SF_SMOKE, "embeddings")
    rows = sim.pq_codebooks(embs).collect()
    assert len(rows) == sim.PQ_SUBSPACES * sim.PQ_CODES * sim.PQ_SUBDIM
    cells = {(r.s, r.code) for r in rows}
    assert len(cells) == sim.PQ_SUBSPACES * sim.PQ_CODES


def test_pq_adc_recall(spark):
    """ADC alone finds a plurality of the exact top-20 on the isotropic
    test corpus (worst case for PQ — neighbors barely separated); the
    shortlist+rerank path must recover most of it. Measured: 0.45 / 0.90
    at sf0.01, similar at smoke scale; bounds are set loose."""
    embs = load_table(spark, SF_SMOKE, "embeddings")
    exact = {r.vec_id for r in sim.ann_topk_bruteforce(embs).collect()}
    adc = {r.vec_id for r in sim.ann_topk_pq(embs).collect()}
    rerank = {r.vec_id for r in sim.ann_topk_pq_rerank(embs).collect()}
    assert len(exact & adc) / len(exact) >= 0.25
    assert len(exact & rerank) / len(exact) >= 0.6
    # rerank similarities are exact cosines -> subset agrees with brute
    brute = {
        r.vec_id: r.similarity for r in sim.ann_topk_bruteforce(embs, k=200).collect()
    }
    for r in sim.ann_topk_pq_rerank(embs).collect():
        if r.vec_id in brute:
            assert abs(r.similarity - brute[r.vec_id]) < 1e-9


def test_pq_cached_layout_matches_pure_forms(spark, tmp_path):
    """The persisted PQ index must serve byte-identical results to the
    training-inline forms (training is deterministic)."""
    path = str(tmp_path / "pq_layout")
    embs = load_table(spark, SF_SMOKE, "embeddings")
    pure = {(r.s, r.code, r.d): r.value for r in sim.pq_codebooks(embs).collect()}
    cached = {
        (r.s, r.code, r.d): r.value
        for r in sim.pq_codebooks_cached(spark, embs, path).collect()
    }
    assert pure == cached
    pure_codes = {r.vec_id: list(r.codes) for r in sim.pq_codes(embs).collect()}
    cached_codes = {
        r.vec_id: list(r.codes)
        for r in sim.pq_codes_cached(spark, embs, path).collect()
    }
    assert pure_codes == cached_codes
    a = [tuple(r) for r in sim.ann_topk_pq(embs).collect()]
    b = [tuple(r) for r in sim.ann_topk_pq_cached(spark, embs, path).collect()]
    assert a == b
    ar = [tuple(r) for r in sim.ann_topk_pq_rerank(embs).collect()]
    br = [
        tuple(r)
        for r in sim.ann_topk_pq_rerank_cached(spark, embs, path).collect()
    ]
    assert ar == br


def test_pq_codes_partition_invariant(spark):
    """Training + encoding decisions are md5/rounding-deterministic, so
    repartitioning the corpus must not move a single code."""
    embs = load_table(spark, SF_SMOKE, "embeddings")
    a = {
        r.vec_id: list(r.codes)
        for r in sim.pq_codes(embs.repartition(7)).collect()
    }
    b = {
        r.vec_id: list(r.codes)
        for r in sim.pq_codes(embs.repartition(3, "label")).collect()
    }
    assert a == b


def test_ivfpq_recall_and_exact_rerank(spark, tmp_path):
    """IVF-PQ = cell pruning ON TOP of PQ: recall drops vs the full-scan
    rerank (unprobed cells lose their true neighbors — on the isotropic
    test corpus, PQ's worst case, measured 0.45-0.55 @ nprobe=3) but
    every returned similarity is an exact cosine (rerank contract)."""
    embs = load_table(spark, SF_SMOKE, "embeddings")
    exact = {
        r.vec_id: r.similarity
        for r in sim.ann_topk_bruteforce(embs, k=500).collect()
    }
    got = sim.ann_topk_ivfpq(spark, embs, str(tmp_path / "idx")).collect()
    assert len(got) == sim.TOP_K
    hits = sum(1 for r in got if r.vec_id in set(list(exact)[: sim.TOP_K]))
    assert hits / sim.TOP_K >= 0.3
    for r in got:
        if r.vec_id in exact:
            assert abs(r.similarity - exact[r.vec_id]) < 1e-9


def test_ivfpq_incremental_refresh_appends_with_pinned_codebook(
    spark, tmp_path
):
    """Append path (VERDICT item #6): build the IVF-PQ layout on a base
    corpus, snapshot-diff in a 40-vector batch, and assert (a) the
    codebook and centroids on disk are STILL the base-trained artifact,
    (b) every corpus vector is encoded exactly once, (c) the refreshed
    layout serves ann_topk_ivfpq with exact-cosine reranks vs brute
    force, and (d) a same-snapshot re-run is a no-op."""
    from pyspark.sql import functions as F

    from music_streaming_etl_glue_spark.plans.snapshot_diff import (
        incremental_index_update,
    )

    embs = load_table(spark, SF_SMOKE, "embeddings")
    ids = sorted(r.vec_id for r in embs.select("vec_id").collect())
    held = ids[-40:]
    base = embs.filter(~F.col("vec_id").isin(held))
    path = str(tmp_path / "idx")

    audit = incremental_index_update(spark, base, embs, path)
    assert audit["added"] == 40
    assert audit["encoded"] == 40
    assert audit["unchanged"] == len(ids) - 40

    # (a) the on-disk codebook is the BASE-trained one, bit-for-bit
    base_cb = {
        (r.s, r.code, tuple(r.cvec))
        for r in sim._pq_codebook(base).collect()
    }
    disk_cb = {
        (r.s, r.code, tuple(r.cvec))
        for r in spark.read.parquet(path + "/_codebook").collect()
    }
    assert disk_cb == base_cb

    # (b) one packed row per corpus vector, appended codes included,
    # and each appended row's codes equal encoding against the PINNED
    # codebook (not a retrained one)
    packed = spark.read.parquet(path)
    assert packed.count() == len(ids)
    assert packed.select("vec_id").distinct().count() == len(ids)
    appended = embs.filter(F.col("vec_id").isin(held))
    expect_codes = {
        r.vec_id: tuple(r.codes)
        for r in sim._pq_assign(
            sim._pq_subvectors(appended), sim._pq_codebook(base)
        )
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("s", "code"))),
                lambda t: t["code"],
            ).alias("codes")
        )
        .collect()
    }
    got_codes = {
        r.vec_id: tuple(r.codes)
        for r in packed.filter(F.col("vec_id").isin(held)).collect()
    }
    assert got_codes == expect_codes

    # (c) the refreshed layout serves the probe; reranked sims are
    # exact cosines and recall holds at the suite's ivfpq floor
    exact = {
        r.vec_id: r.similarity
        for r in sim.ann_topk_bruteforce(embs, k=500).collect()
    }
    got = sim.ann_topk_ivfpq(spark, embs, path).collect()
    assert len(got) == sim.TOP_K
    for r in got:
        if r.vec_id in exact:
            assert abs(r.similarity - exact[r.vec_id]) < 1e-9
    hits = sum(1 for r in got if r.vec_id in set(list(exact)[: sim.TOP_K]))
    assert hits / sim.TOP_K >= 0.3

    # (d) idempotent on an unchanged snapshot
    audit2 = incremental_index_update(spark, embs, embs, path)
    assert audit2["encoded"] == 0
    assert spark.read.parquet(path).count() == len(ids)


def test_pq_reconstruction_error_nonneg_and_matches_numpy(spark):
    """sq_err is the exact per-vector quantization error: non-negative,
    and equal (to rounding) to a numpy recomputation — reconstruct each
    normalized vector from its assigned codebook entries and measure
    squared L2. Also exercises the drift-gate form (explicit pinned
    codebook arg)."""
    import numpy as np

    embs = load_table(spark, SF_SMOKE, "embeddings").limit(60)
    cb_df = sim._pq_codebook(embs)
    errs = {
        r.vec_id: r.sq_err
        for r in sim.pq_reconstruction_error(embs, codebook=cb_df).collect()
    }
    assert errs and all(e >= 0 for e in errs.values())

    cb = {
        (r.s, r.code): np.asarray(r.cvec, dtype=np.float64)
        for r in cb_df.collect()
    }
    codes = {
        (r.vec_id, r.s): r.code
        for r in sim._pq_assign(sim._pq_subvectors(embs), cb_df).collect()
    }
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in embs.collect()
    }
    sub = sim.PQ_SUBDIM
    for vec_id, v in vecs.items():
        nv = v / np.sqrt(v @ v)
        total = 0.0
        for s in range(sim.PQ_SUBSPACES):
            seg = nv[s * sub : (s + 1) * sub]
            c = cb[(s, codes[(vec_id, s)])]
            # mirror the engine's rounded per-subspace distances
            total += round(
                float(seg @ seg + c @ c - 2 * (seg @ c)), sim.PQ_DIST_ROUND
            )
        assert abs(errs[vec_id] - round(total, 6)) < 1e-6
