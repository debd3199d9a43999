"""Real BMP codec lane (VERDICT r7 item #3): the pure-numpy
encoder/decoder roundtrip is pixel-exact across every row-padding
residue, honors top-down vs bottom-up row order, rejects malformed
payloads, and the catalog's ``image_decode_meta`` stats hash-match the
closed-form DuckDB replay that never sees the bytes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import multimodal as M

from tests.conftest import SF_SMOKE
from tests.oracle_util import duckdb_con, assert_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_SMOKE)


def _rand_pixels(h, w, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 8])  # every stride residue
@pytest.mark.parametrize("h", [1, 3, 7])
def test_roundtrip_pixel_exact(w, h):
    pix = _rand_pixels(h, w, seed=31 * w + h)
    payload = M.encode_bmp(pix)
    assert payload[:2] == b"BM"
    # spec: file size == 54-byte header + padded rows
    assert len(payload) == 54 + h * ((3 * w + 3) // 4 * 4)
    out = M.decode_image(payload)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, pix)


def test_decode_top_down_variant():
    """Negative biHeight means top-down rows — a decoder that always
    flips would mirror the image vertically."""
    pix = _rand_pixels(4, 5, seed=7)
    payload = bytearray(M.encode_bmp(pix[::-1]))  # rows stored as written
    payload[22:26] = (-4).to_bytes(4, "little", signed=True)
    out = M.decode_image(bytes(payload))
    # encoder wrote pix[::-1] bottom-up => file rows are pix top-down;
    # declaring top-down must return them unflipped
    assert np.array_equal(out, pix)


def test_decode_honors_pixel_offset():
    """Pixel data starts where the header says, not at byte 54."""
    pix = _rand_pixels(2, 3, seed=11)
    payload = bytearray(M.encode_bmp(pix))
    gap = b"\xAB" * 10
    moved = bytearray(payload[:54]) + gap + payload[54:]
    moved[10:14] = (64).to_bytes(4, "little")
    assert np.array_equal(M.decode_image(bytes(moved)), pix)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:40],                                 # too short
        lambda b: b"XX" + b[2:],                          # bad magic
        lambda b: b[:28] + (8).to_bytes(2, "little") + b[30:],   # 8bpp
        lambda b: b[:30] + (1).to_bytes(4, "little") + b[34:],   # RLE
        lambda b: b[:-5],                                 # truncated rows
    ],
)
def test_decode_rejects_malformed(mutate):
    payload = M.encode_bmp(_rand_pixels(3, 4, seed=3))
    with pytest.raises(ValueError):
        M.decode_image(mutate(payload))


def test_synth_payloads_are_real_bmps(spark, docs):
    rows = M.synth_bmp_payloads(docs.limit(20)).collect()
    assert len(rows) == 20
    for r in rows:
        arr = M.decode_image(r["content"])
        assert np.array_equal(arr, M._synth_pixels(r["doc_id"]))


def test_image_decode_meta_oracle(spark, docs, con):
    assert_matches_oracle(
        M.image_decode_meta(docs), con, M.IMAGE_DECODE_META_SQL
    )


def test_image_ahash_planted_dups_within_radius(spark, docs):
    """Every planted ~3%-pixel-edit image must land within the Hamming
    radius of its base, and unrelated images must sit far outside it
    (the random-hash expectation is 32 bits)."""
    fp = {r["doc_id"]: r["ahash"] for r in M.image_ahash(docs).collect()}
    planted = [
        (d - M.BMP_DUP_RES, d)
        for d in fp
        if d % M.BMP_DUP_MOD == M.BMP_DUP_RES and d - M.BMP_DUP_RES in fp
    ]
    assert planted
    for base, dup in planted:
        ham = bin((fp[base] ^ fp[dup]) & ((1 << 64) - 1)).count("1")
        assert ham <= M.AHASH_MAX_HAMMING, (base, dup, ham)
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in M.image_ahash_near_dups(docs).collect()
    }
    for base, dup in planted:
        assert (base, dup) in pairs
    # the join returns only in-radius pairs and is a small fraction of
    # the 125k possible — unrelated synth images do NOT collide en masse
    assert all(h <= M.AHASH_MAX_HAMMING for h in pairs.values())
    n = len(fp)
    assert len(pairs) < 0.005 * n * (n - 1) / 2


def test_image_ahash_is_brightness_invariant():
    """The defining aHash property, checked through the real codec: a
    constant brightness shift (no wrap) leaves the hash unchanged."""
    import numpy as np

    rng = np.random.RandomState(7)
    pix = rng.randint(60, 180, size=(9, 11, 3)).astype(np.uint8)

    def ahash(arr):
        arr = arr.astype(np.int64)
        h, w, _ = arr.shape
        ys = (np.arange(64) // 8) * h // 8
        xs = (np.arange(64) % 8) * w // 8
        lumas = arr[ys, xs].sum(axis=1) // 3
        total = int(lumas.sum())
        return tuple(int(l) * 64 > total for l in lumas)

    decoded = M.decode_image(M.encode_bmp(pix))
    brighter = M.decode_image(M.encode_bmp(pix + 40))
    assert ahash(decoded) == ahash(brighter)


def test_video_container_roundtrip_and_seek():
    """Frames come back pixel-exact THROUGH the container index, and
    single-frame reads touch only the indexed byte range."""
    frames = [_rand_pixels(5, 7, seed=i) for i in range(4)]
    payload = M.encode_video(frames)
    assert M.video_frame_count(payload) == 4
    for i, f in enumerate(frames):
        assert np.array_equal(M.decode_video_frame(payload, i), f)
    with pytest.raises(ValueError):
        M.decode_video_frame(payload, 4)
    with pytest.raises(ValueError):
        M.decode_video_frame(b"XXXX" + payload[4:], 0)
    with pytest.raises(ValueError):
        M.decode_video_frame(payload[:-10], 3)  # truncated last frame


def test_video_frames_meta_shape(spark, docs):
    out = M.video_frames_meta(docs.limit(20)).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rows in by_doc.items():
        assert len(rows) == 2 + d % M.VIDEO_F_MOD
        assert sorted(r["frame_idx"] for r in rows) == list(
            range(len(rows))
        )
        for r in rows:
            expect = M._pixels_for_key(
                M._synth_frame_key(d, r["frame_idx"])
            )
            assert (r["height"], r["width"]) == expect.shape[:2]
            assert r["px_sum"] == int(expect.sum())


def test_image_dedup_clusters_collapse_planted_families(spark, docs):
    """Each planted dup image must share a component with its base;
    docs in no near-dup pair label themselves."""
    from music_streaming_etl_glue_spark.operators.clusters import (
        image_dedup_clusters,
    )

    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in image_dedup_clusters(docs.limit(200)).collect()
    }
    assert len(labels) == 200
    paired = {
        d for r in M.image_ahash_near_dups(docs.limit(200)).collect()
        for d in (r["doc_id_a"], r["doc_id_b"])
    }
    planted = [
        d for d in labels
        if d % M.BMP_DUP_MOD == M.BMP_DUP_RES and d - M.BMP_DUP_RES in labels
    ]
    assert planted
    for d in planted:
        assert labels[d] == labels[d - M.BMP_DUP_RES]
    for d, lab in labels.items():
        if d not in paired:
            assert lab == d  # singletons label themselves


def test_video_near_dups_are_exactly_the_planted_clip_pairs(spark, docs):
    """Planted dup docs replay their base's frame keys, so every
    (base, dup) pair shares min(n_frames) ≥ 2 identical frames and
    must surface; unrelated clips have disjoint DERIVED frame keys
    (7k+3f+1 is injective for f < 7) and the planted boilerplate cards
    (r10) are suppressed by the df cap at this corpus size, so the
    output is exactly the planted edge set."""
    sample = docs.orderBy("doc_id").limit(80)
    pairs = {
        (r.doc_id_a, r.doc_id_b): r.shared_frames
        for r in M.video_near_dups(sample).collect()
    }
    ids = {r.doc_id for r in sample.select("doc_id").collect()}
    planted = {
        (d - M.BMP_DUP_RES, d)
        for d in ids
        if d % M.BMP_DUP_MOD == M.BMP_DUP_RES and d >= M.BMP_DUP_RES
    }
    assert set(pairs) == planted
    for (base, dup), shared in pairs.items():
        n_base = 2 + base % M.VIDEO_F_MOD
        n_dup = 2 + dup % M.VIDEO_F_MOD
        assert shared == min(n_base, n_dup), (base, dup, shared)


def test_video_df_cap_kills_boilerplate_edges_only(spark, docs):
    """The frequent-frame-hash guard (VERDICT r9 item #4): with the cap
    DISABLED, the planted intro+outro boilerplate cards manufacture a
    false clique among the % 8 == 1 clips (each pair shares the 2 card
    hashes) on top of the k² hot-key candidate blowup; with the default
    cap the output is exactly the planted dup edge set — the cap
    removes boilerplate edges and ONLY boilerplate edges."""
    sample = docs.orderBy("doc_id").limit(80)
    capped = {
        (r.doc_id_a, r.doc_id_b)
        for r in M.video_near_dups(sample).collect()
    }
    uncapped = {
        (r.doc_id_a, r.doc_id_b)
        for r in M.video_near_dups(sample, max_df=10**9).collect()
    }
    ids = sorted(r.doc_id for r in sample.select("doc_id").collect())
    boiler = [
        d for d in ids if d % M.VIDEO_BOILER_MOD == M.VIDEO_BOILER_BOTH_RES
    ]
    assert len(boiler) >= 5, "fixture must plant a real clique"
    clique = {
        (a, b) for i, a in enumerate(boiler) for b in boiler[i + 1:]
    }
    assert capped <= uncapped
    assert uncapped - capped == clique, "cap must remove exactly the clique"
    planted = {
        (d - M.BMP_DUP_RES, d)
        for d in ids
        if d % M.BMP_DUP_MOD == M.BMP_DUP_RES and d >= M.BMP_DUP_RES
    }
    assert planted <= capped, "the cap must preserve genuine dup edges"


def test_video_frame_hashes_match_image_kernel(spark, docs):
    """Each frame's hash equals _ahash_of_array of the directly
    rendered frame pixels — one hash kernel across modalities."""
    sample = docs.orderBy("doc_id").limit(12)
    got = {
        (r.doc_id, r.frame_idx): r.fhash
        for r in M.video_frame_hashes(sample).collect()
    }
    for (d, f), hv in got.items():
        arr = M._pixels_for_key(M._synth_frame_key(int(d), int(f)))
        assert hv == M._ahash_of_array(arr.astype("uint8")), (d, f)


def test_frame_sample_seeks_only_sampled_frames(spark, docs):
    """r9 rebase: sampling decodes the (j·n)//k indexed frames through
    the container index; stats equal direct rendering of those frames,
    and longer clips genuinely subsample (5-frame clips pick 0,1,3)."""
    import numpy as np

    sample = docs.orderBy("doc_id").limit(24)
    rows = M.frame_sample(sample).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, rs in by_doc.items():
        n = 2 + int(d) % M.VIDEO_F_MOD
        k = min(M.N_FRAMES, n)
        assert [r.sample_idx for r in sorted(rs, key=lambda r: r.sample_idx)] == list(range(k))
        for r in rs:
            assert r.frame_idx == (r.sample_idx * n) // k
            arr = M._pixels_for_key(
                M._synth_frame_key(int(d), int(r.frame_idx))
            ).astype(np.int64)
            assert r.px_sum == int(arr.sum())
            assert r.corner_tl == int(arr[0, 0, 0])
        if n == 5:
            assert sorted(r.frame_idx for r in rs) == [0, 1, 3]


def test_resize_payload_is_true_nn_resample_roundtripped(spark, docs):
    """r9 rebase: resize decodes, nearest-neighbor resamples to 8×8,
    re-encodes through real BMP bytes and decodes back — stats equal
    the direct numpy resample, and byte_len is the canonical fixed-dims
    BMP size for every row."""
    import numpy as np

    sample = docs.orderBy("doc_id").limit(20)
    got = {r.doc_id: r for r in M.resize_payload(sample).collect()}
    expected_len = 54 + M.RESIZE_H * ((3 * M.RESIZE_W + 3) // 4 * 4)
    for d, r in got.items():
        arr = M._synth_pixels(int(d))
        h, w, _ = arr.shape
        ys = (np.arange(M.RESIZE_H) * h) // M.RESIZE_H
        xs = (np.arange(M.RESIZE_W) * w) // M.RESIZE_W
        rt = arr[np.ix_(ys, xs)].astype(np.int64)
        idx = np.arange(rt.size).reshape(rt.shape)
        assert (r.width, r.height, r.byte_len) == (
            M.RESIZE_W, M.RESIZE_H, expected_len,
        )
        assert r.px_sum == int(rt.sum())
        assert r.px_weighted == int((rt * idx).sum())
        assert r.corner_tl == int(rt[0, 0, 0])
        assert r.corner_br == int(rt[-1, -1, -1])


def test_video_dedup_clusters_group_planted_clip_families(spark, docs):
    """The video component step: every planted (base, dup) clip pair
    shares a cluster; docs with no shared frames stay singletons."""
    from music_streaming_etl_glue_spark.operators.clusters import (
        video_dedup_clusters,
    )

    sample = docs.orderBy("doc_id").limit(60)
    cl = {
        r.doc_id: r.cluster_id
        for r in video_dedup_clusters(sample).collect()
    }
    planted = [
        (d - M.BMP_DUP_RES, d)
        for d in cl
        if d % M.BMP_DUP_MOD == M.BMP_DUP_RES and d >= M.BMP_DUP_RES
    ]
    assert planted
    dup_members = {x for pair in planted for x in pair}
    for base, dup in planted:
        assert cl[base] == cl[dup] == base
    for d, c in cl.items():
        if d not in dup_members:
            assert c == d, (d, c)


def test_mih_twin_matches_banded_join_exactly(spark, docs):
    """Multi-index-hashing (the r10 DEFAULT): identical pair set to the
    13-band formulation (both exact at radius 12) on a planted-dup
    sample — the prefix-filter-style parity discipline for the Hamming
    family."""
    sample = docs.orderBy("doc_id").limit(80)
    banded = set(
        map(tuple, M.image_ahash_near_dups_banded(sample).collect())
    )
    default = set(map(tuple, M.image_ahash_near_dups(sample).collect()))
    mih = set(map(tuple, M.image_ahash_near_dups_mih(sample).collect()))
    assert default == mih == banded and banded


def test_mih_cross_matches_parity_with_banded_cross(spark, docs):
    """Cross-relation (streaming probe vs landed corpus) form: the MIH
    ball-probe join the handlers ride since r10 must flag exactly the
    probe docs the 13-band cross join flags — including at the AUDIO
    radius 10 (ball 2), the other live configuration."""
    fp = M.image_ahash(docs.orderBy("doc_id").limit(120)).localCheckpoint()
    corpus = fp.filter(F.col("doc_id") % 2 == 0)
    probes = fp.filter(F.col("doc_id") % 2 == 1)
    for radius in (M.AHASH_MAX_HAMMING, 10):
        banded = {
            r.doc_id
            for r in M.ahash_cross_matches(probes, corpus, radius).collect()
        }
        mih = {
            r.doc_id
            for r in M.mih_cross_matches(probes, corpus, radius).collect()
        }
        assert mih == banded and banded, radius


def test_mih_ball_covers_radius_by_pigeonhole():
    """Pure arithmetic: any ≤12-flip pair leaves some 16-bit band
    within Hamming 3, so the 697-mask ball probe finds it."""
    from itertools import combinations

    masks = M._mih_masks()
    assert len(masks) == 697
    base = 0x0123456789ABCDEF
    # adversarial: 12 flips spread 3 per band — every band at exactly
    # Hamming 3, the worst case the ball still covers
    flips = [0, 5, 10, 16, 21, 26, 32, 37, 42, 48, 53, 58]
    other = base
    for bit in flips:
        other ^= 1 << bit
    found = False
    for b in range(M.MIH_BANDS):
        va = (base >> (16 * b)) & 0xFFFF
        vb = (other >> (16 * b)) & 0xFFFF
        if bin(va ^ vb).count("1") <= M.MIH_BALL_RADIUS:
            found = True
    assert found


def test_modality_apply_rungs_drop_planted_dups(spark, docs):
    """The per-modality APPLY rungs ship canonical survivors: every
    planted dup doc is gone, its base carries the family size, and
    singletons pass through with n_members == 1."""
    from music_streaming_etl_glue_spark.operators.clusters import (
        audio_near_dedup_apply,
        image_near_dedup_apply,
        video_near_dedup_apply,
    )

    sample = docs.orderBy("doc_id").limit(80)
    for apply_fn, dup_res in (
        (image_near_dedup_apply, M.BMP_DUP_RES),
        (audio_near_dedup_apply, M.AUDIO_DUP_RES),
        (video_near_dedup_apply, M.BMP_DUP_RES),
    ):
        kept = {r.doc_id: r.n_members for r in apply_fn(sample).collect()}
        dups = [
            d for d in range(80) if d % 8 == dup_res and d >= dup_res
        ]
        assert dups
        for d in dups:
            assert d not in kept, (apply_fn.__name__, d)
            assert kept[d - dup_res] >= 2, (apply_fn.__name__, d)
        # singletons pass through (some docs sit in no near-dup pair)
        assert 1 in set(kept.values()), apply_fn.__name__
