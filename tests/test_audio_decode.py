"""Real WAV codec lane: the pure-numpy RIFF/WAVE PCM encoder/decoder
roundtrips sample-exactly, the chunk walker tolerates real-world extra
chunks, malformed payloads fail loudly, and audio_decode_meta
hash-matches the closed-form DuckDB replay that never sees the bytes."""

from __future__ import annotations

import numpy as np
import pytest

from music_streaming_etl_glue_spark.operators import multimodal as M

from tests.conftest import SF_SMOKE
from tests.oracle_util import duckdb_con, assert_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_SMOKE)


@pytest.mark.parametrize("n", [1, 2, 63, 64, 200])
def test_wav_roundtrip_sample_exact(n):
    rng = np.random.RandomState(n)
    pcm = rng.randint(-32768, 32768, size=n).astype(np.int16)
    payload = M.encode_wav(pcm, rate=44100)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert len(payload) == 44 + 2 * n
    out, rate = M.decode_wav(payload)
    assert rate == 44100
    assert np.array_equal(out, pcm)


def test_wav_decoder_walks_extra_chunks():
    """Real encoders emit LIST/fact/cue chunks around fmt and data —
    the decoder must walk to the ones it needs, honoring the odd-size
    word-alignment rule."""
    pcm = np.array([100, -200, 300], dtype=np.int16)
    payload = bytearray(M.encode_wav(pcm))
    # splice an odd-sized LIST chunk between WAVE and fmt
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    spliced = bytes(payload[:12]) + extra + bytes(payload[12:])
    spliced = (
        spliced[:4]
        + (len(spliced) - 8).to_bytes(4, "little")
        + spliced[8:]
    )
    out, rate = M.decode_wav(spliced)
    assert np.array_equal(out, pcm) and rate == M.AUDIO_RATE


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:20],                                  # too short
        lambda b: b"RIFX" + b[4:],                         # bad magic
        lambda b: b[:8] + b"AVI " + b[12:],                # not WAVE
        lambda b: b[:20] + (2).to_bytes(2, "little") + b[22:],  # stereo
        lambda b: b[:-3],                                  # truncated data
    ],
)
def test_wav_decoder_rejects_malformed(mutate):
    payload = M.encode_wav(np.array([1, -1, 2, -2], dtype=np.int16))
    with pytest.raises(ValueError):
        M.decode_wav(mutate(payload))


def test_synth_wavs_are_real(spark, docs):
    rows = M.synth_wav_payloads(docs.limit(10)).collect()
    for r in rows:
        s, rate = M.decode_wav(r["content"])
        assert rate == M.AUDIO_RATE
        assert np.array_equal(s, M._synth_samples(r["doc_id"]))


def test_audio_decode_meta_oracle(spark, docs, con):
    assert_matches_oracle(
        M.audio_decode_meta(docs), con, M.AUDIO_DECODE_META_SQL
    )


def test_audio_fingerprint_matches_direct_numpy(spark, docs):
    """The mapInPandas fingerprint equals a direct numpy computation on
    the synth waveform — per-window |amp| mean vs global, per-window
    zero-crossing rate vs global, 32 windows × 2 bits."""
    sample = docs.orderBy("doc_id").limit(30)
    got = {r.doc_id: r.afp for r in M.audio_fingerprint(sample).collect()}
    W = M.AUDIO_FP_WINDOWS
    for d in sorted(got):
        s64 = M._synth_samples(int(d)).astype(np.int64)
        n = len(s64)
        aa = np.abs(s64)
        total = int(aa.sum())
        wi = np.arange(n) * W // n
        e = np.bincount(wi, weights=aa, minlength=W).astype(np.int64)
        ln = np.bincount(wi, minlength=W)
        sign = s64 >= 0
        crossed = (sign[1:] != sign[:-1]).astype(np.int64)
        m = n - 1
        zi = np.arange(m) * W // m
        z = np.bincount(zi, weights=crossed, minlength=W).astype(np.int64)
        lz = np.bincount(zi, minlength=W)
        tz = int(crossed.sum())
        hv = 0
        for w in range(W):
            if int(e[w]) * n > total * int(ln[w]):
                hv |= 1 << (2 * w)
            if int(z[w]) * m > tz * int(lz[w]):
                hv |= 1 << (2 * w + 1)
        if hv >= 1 << 63:
            hv -= 1 << 64
        assert got[d] == hv, d


def test_audio_planted_dups_surface_and_cluster(spark, docs):
    """Every planted re-gain dup lands within the near-dup radius and
    shares a cluster with its base; unrelated docs stay far (spot-check
    the fingerprint distance distribution)."""
    sample = docs.orderBy("doc_id").limit(80)
    near = {
        (r.doc_id_a, r.doc_id_b): r.hamming
        for r in M.audio_fp_near_dups(sample).collect()
    }
    fp = {r.doc_id: r.afp for r in M.audio_fingerprint(sample).collect()}
    planted = [
        (d - M.AUDIO_DUP_RES, d)
        for d in fp
        if d % M.AUDIO_DUP_MOD == M.AUDIO_DUP_RES and d >= M.AUDIO_DUP_RES
    ]
    assert planted
    for pair in planted:
        assert pair in near, pair
        assert near[pair] <= M.AUDIO_FP_MAX_HAMMING

    from music_streaming_etl_glue_spark.operators.clusters import (
        audio_dedup_clusters,
    )

    cl = {
        r.doc_id: r.cluster_id
        for r in audio_dedup_clusters(sample).collect()
    }
    for base, dup in planted:
        assert cl[base] == cl[dup], (base, dup)
    # unrelated fingerprints sit far out in Hamming space on average
    ids = sorted(fp)
    dists = [
        bin((fp[a] ^ fp[b]) & ((1 << 64) - 1)).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if (a, b) not in planted
    ]
    assert sum(dists) / len(dists) > 20


def test_audio_mih_twin_matches_banded_join_exactly(spark, docs):
    """Audio MIH (the r10 default; ball radius ⌊10/4⌋ = 2): identical
    pair set to the 13-band formulation on a planted-dup sample."""
    sample = docs.orderBy("doc_id").limit(80)
    banded = set(
        map(tuple, M.audio_fp_near_dups_banded(sample).collect())
    )
    default = set(map(tuple, M.audio_fp_near_dups(sample).collect()))
    mih = set(map(tuple, M.audio_fp_near_dups_mih(sample).collect()))
    assert default == mih == banded and banded
