"""Real BMP codec lane (VERDICT r7 item #3): the pure-numpy
encoder/decoder roundtrip is pixel-exact across every row-padding
residue, honors top-down vs bottom-up row order, rejects malformed
payloads, and the catalog's ``image_decode_meta`` stats hash-match the
closed-form DuckDB replay that never sees the bytes."""

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
