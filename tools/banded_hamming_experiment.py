"""Candidate-volume / recall scaling for the 13-band Hamming joins
(image aHash + audio waveform fingerprint) — the multimodal twin of
``prefix_filter_experiment.py``. Runs the CLOSED-FORM fingerprint
kernels offline (numpy, no Spark) at several corpus sizes and reports,
per size:

* planted-dup Hamming distribution (max must stay ≤ the join radius);
* pairs within the radius (the CC edge count) and the candidate ROWS
  the 13-band join would emit (Σ per-(band, val) bucket C(k,2)) vs the
  naive n²/2 — the number that must grow sub-quadratically for the
  rung to survive 100 TB;
* recall at the radius (pigeonhole-exact by construction — asserted).

Usage: python tools/banded_hamming_experiment.py [sizes...]
"""

from __future__ import annotations

import sys
from collections import Counter

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from music_streaming_etl_glue_spark.operators import multimodal as M


def image_fp(doc_id: int) -> int:
    return M._ahash_of_array(M._synth_pixels(doc_id)) & (2**64 - 1)


def audio_fp(doc_id: int) -> int:
    s64 = M._synth_samples(doc_id).astype(np.int64)
    n = len(s64)
    W = M.AUDIO_FP_WINDOWS
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
    return hv


def run(lane: str, fp_fn, dup_mod: int, dup_res: int, radius: int, n: int):
    fps = [fp_fn(d) for d in range(n)]
    arr = np.array(fps, dtype=np.uint64)
    dup_pairs = [
        (d - dup_res, d) for d in range(dup_res, n, dup_mod)
    ]
    dup_h = [bin(fps[a] ^ fps[b]).count("1") for a, b in dup_pairs]
    # pairs within radius (exact, brute force)
    within = 0
    for i in range(n):
        x = arr[i] ^ arr[i + 1 :]
        within += int(
            (np.vectorize(lambda v: bin(int(v)).count("1"))(x) <= radius)
            .sum()
        ) if len(x) else 0
    # banded candidate rows = Σ buckets C(k, 2) summed over bands
    cand = 0
    for off, mask in M.AHASH_BAND_SPECS:
        buckets = Counter((int(v) >> off) & mask for v in fps)
        cand += sum(k * (k - 1) // 2 for k in buckets.values())
    # MIH candidate rows = Σ_band unordered pairs whose 16-bit band
    # values are within the ball radius ⌊r/4⌋ (each such pair is hit by
    # exactly one probe mask on the doc_id< side of the join)
    ball = radius // M.MIH_BANDS
    masks = M._mih_masks(ball)
    cand_mih = 0
    for b in range(M.MIH_BANDS):
        c = Counter(
            (int(v) >> (b * M.MIH_BAND_BITS))
            & ((1 << M.MIH_BAND_BITS) - 1)
            for v in fps
        )
        for u, ku in c.items():
            for m in masks:
                v = u ^ m
                if m == 0:
                    cand_mih += ku * (ku - 1) // 2
                elif v > u and v in c:
                    cand_mih += ku * c[v]
    naive = n * (n - 1) // 2
    assert max(dup_h) <= radius, (lane, n, max(dup_h))
    print(
        f"{lane:6s} n={n:5d}  dup_h max={max(dup_h):2d} "
        f"mean={sum(dup_h)/len(dup_h):4.1f}  pairs<=r={within:6d} "
        f"(planted {len(dup_pairs)})  band-candidates={cand:>10d} "
        f"mih-candidates={cand_mih:>9d} naive={naive:>10d}  "
        f"ratio={cand/naive:.3f}  mih-ratio={cand_mih/naive:.3f}"
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1000, 2000, 5000]
    for n in sizes:
        run("image", image_fp, M.BMP_DUP_MOD, M.BMP_DUP_RES,
            M.AHASH_MAX_HAMMING, n)
    for n in sizes:
        run("audio", audio_fp, M.AUDIO_DUP_MOD, M.AUDIO_DUP_RES,
            M.AUDIO_FP_MAX_HAMMING, n)


if __name__ == "__main__":
    main()
