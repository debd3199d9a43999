"""Image → ANN bridge (VERDICT r9 item #6): a decoded-pixel embedding
feeds the EXISTING IVF-PQ serving stack, making "find images like this
one" a served query. Pins: unit norm + mean-centering of the embedding,
planted-dup families are nearest neighbors under brute-force cosine,
the served IVF-PQ top-k surfaces the planted dup at the top, and the
funnel's recall@k holds against exact kNN on these vectors."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import multimodal as M
from music_streaming_etl_glue_spark.operators import similarity as S
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def vecs(spark, docs):
    return M.image_embedding_vectors(
        docs.orderBy("doc_id").limit(200)
    ).localCheckpoint()


def test_embedding_is_unit_norm_and_centered(vecs):
    rows = vecs.collect()
    assert rows and all(len(r.embedding) == M.IMAGE_EMB_DIMS for r in rows)
    for r in rows:
        v = np.array(r.embedding)
        assert abs(float(v @ v) - 1.0) < 1e-4, r.vec_id
        # mean-centered: components sum to ~0 (the integer centering is
        # exact; only the 6dp rounding perturbs it)
        assert abs(float(v.sum())) < 1e-3, r.vec_id


def test_planted_dups_are_cosine_nearest(vecs):
    """Under brute-force cosine, each planted dup's best match is its
    base (and vice versa) — the signal the served index must preserve."""
    emb = {r.vec_id: np.array(r.embedding) for r in vecs.collect()}
    ids = sorted(emb)
    planted = [
        (d - M.BMP_DUP_RES, d)
        for d in ids
        if d % M.BMP_DUP_MOD == M.BMP_DUP_RES and d >= M.BMP_DUP_RES
    ]
    assert len(planted) >= 20
    for base, dup in planted:
        sims = {o: float(emb[dup] @ emb[o]) for o in ids if o != dup}
        assert max(sims, key=sims.get) == base, (base, dup)


def test_served_topk_surfaces_planted_dup_first(spark, docs, tmp_path):
    """The full funnel — centroids prune, ADC scan, exact rerank — for
    query doc 0 must rank its planted dup (doc 5) first."""
    served = M.ann_topk_image(
        spark, docs.orderBy("doc_id").limit(200), str(tmp_path / "idx")
    ).collect()
    assert len(served) == S.TOP_K
    assert served[0].vec_id == M.BMP_DUP_RES  # doc 5, the planted dup of 0


def test_ivfpq_recall_audit_on_image_vectors(spark, vecs, tmp_path):
    """The generic recall audit runs unchanged on the image vectors —
    the bridge reuses the stack, not a parallel one. Image embeddings
    are UNCLUSTERED (pseudorandom pixels spread over the sphere), so
    the default nprobe=3 of 9 cells measures ~0.54; the audit is the
    tuning loop: nprobe=6 must clear 0.7, and probing every cell makes
    the funnel exact-rerank-only (recall 1.0 within shortlist reach)."""
    path = str(tmp_path / "idx")
    S.write_ivfpq_layout(vecs, path)
    r6 = float(
        S.knn_ivfpq_recall_audit(spark, vecs, path, nprobe=6)
        .agg(F.avg("recall_at_k"))
        .head()[0]
    )
    assert r6 >= 0.7, r6
    r_all = float(
        S.knn_ivfpq_recall_audit(spark, vecs, path, nprobe=9)
        .agg(F.avg("recall_at_k"))
        .head()[0]
    )
    assert r_all >= 0.95, r_all


@pytest.fixture(scope="module")
def avecs(spark, docs):
    return M.audio_embedding_vectors(
        docs.orderBy("doc_id").limit(200)
    ).localCheckpoint()


def test_audio_embedding_unit_norm_and_dup_affinity(avecs):
    """Audio twin pins: unit norm, and each planted re-gain dup's
    brute-force cosine best match is its base (the re-gain edit moves a
    few energy margins and leaves the zero-crossing margins almost
    untouched)."""
    emb = {r.vec_id: np.array(r.embedding) for r in avecs.collect()}
    for v in emb.values():
        assert abs(float(v @ v) - 1.0) < 1e-4
    ids = sorted(emb)
    planted = [
        (d - M.AUDIO_DUP_RES, d)
        for d in ids
        if d % M.AUDIO_DUP_MOD == M.AUDIO_DUP_RES and d >= M.AUDIO_DUP_RES
    ]
    assert len(planted) >= 20
    for base, dup in planted:
        sims = {o: float(emb[dup] @ emb[o]) for o in ids if o != dup}
        assert max(sims, key=sims.get) == base, (base, dup)


def test_served_audio_topk_surfaces_planted_dup_first(spark, docs, tmp_path):
    served = M.ann_topk_audio(
        spark, docs.orderBy("doc_id").limit(200), str(tmp_path / "aidx")
    ).collect()
    assert len(served) == S.TOP_K
    assert served[0].vec_id == M.AUDIO_DUP_RES  # doc 6, re-gain dup of 0


def test_video_embedding_dup_affinity_and_served_topk(spark, docs, tmp_path):
    """Video completes the trimodal bridge: planted re-cut dup clips
    are cosine-nearest their base under the summed-frame embedding, and
    the served funnel ranks doc 5 (the re-cut of query doc 0) first."""
    sample = docs.orderBy("doc_id").limit(200)
    vvecs = M.video_embedding_vectors(sample).localCheckpoint()
    emb = {r.vec_id: np.array(r.embedding) for r in vvecs.collect()}
    ids = sorted(emb)
    planted = [
        (d - M.BMP_DUP_RES, d)
        for d in ids
        if d % M.BMP_DUP_MOD == M.BMP_DUP_RES and d >= M.BMP_DUP_RES
    ]
    assert len(planted) >= 20
    for base, dup in planted:
        v = emb[dup]
        assert abs(float(v @ v) - 1.0) < 1e-4
        sims = {o: float(v @ emb[o]) for o in ids if o != dup}
        assert max(sims, key=sims.get) == base, (base, dup)
    served = M.ann_topk_video(
        spark, sample, str(tmp_path / "vidx")
    ).collect()
    assert len(served) == S.TOP_K
    assert served[0].vec_id == M.BMP_DUP_RES


def test_image_bridge_composes_with_incremental_append(
    spark, docs, tmp_path
):
    """The bridge rides the stack's O(diff) append path unchanged: new
    image docs encode with the PINNED codebook/centroids
    (refresh_ivfpq_layout — no retrain, no corpus re-encode; the image
    embedding is per-doc math, so appends are well-defined), and a new
    doc's planted dup is served from the refreshed layout."""
    base = docs.orderBy("doc_id").limit(150)
    extra = docs.orderBy("doc_id").limit(200).filter(
        F.col("doc_id") >= 150
    )
    old_v = M.image_embedding_vectors(base).localCheckpoint()
    new_v = M.image_embedding_vectors(extra).localCheckpoint()
    path = str(tmp_path / "idx")
    S.write_ivfpq_layout(old_v, path)
    S.refresh_ivfpq_layout(spark, new_v, path)
    full = old_v.unionByName(new_v).localCheckpoint()
    # doc 157 (appended) is the planted dup of doc 152 (also appended):
    # serving the refreshed layout must surface it first
    served = S.ann_topk_ivfpq(spark, full, path, query_vec_id=157)
    assert served.head().vec_id == 152
    # and the funnel's recall against exact kNN holds on the grown corpus
    r = float(
        S.knn_ivfpq_recall_audit(spark, full, path, nprobe=9)
        .agg(F.avg("recall_at_k"))
        .head()[0]
    )
    assert r >= 0.95, r
