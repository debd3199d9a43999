"""Empirical check of the banded-LSH scaling claim in SCALE.md: at 10×
the rows, keeping the sf0.1 banding (128×11) lets candidates grow ~n²,
while re-deriving (bands, bits) from the s-curve (bits ≈ log₂ n, bands ∝
n^ρ) holds the candidate FRACTION down and the recall UP — the n^(1+ρ)
story made concrete. Synthesizes iid-normal vectors (the worst case for
angular LSH: no cluster structure to exploit) with planted cosine-0.5
pairs, and measures candidate volume, recall, and wall time.

Run: python tools/lsh_scaling_experiment.py   (~2-3 min; prints a table)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def synth(n: int, dims: int = 64, n_planted: int = 30, seed: int = 3):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dims)
    pairs = []
    for i in range(n_planted):
        a = vecs[2 * i] / np.linalg.norm(vecs[2 * i])
        w = rng.randn(dims)
        w = w - (w @ a) * a
        w /= np.linalg.norm(w)
        vecs[2 * i + 1] = 0.5 * a + np.sqrt(1 - 0.25) * w
        pairs.append((2 * i, 2 * i + 1))
    return vecs, set(pairs)


def main() -> None:
    from pyspark.sql import functions as F

    from music_streaming_etl_glue_spark.operators import similarity as S
    from music_streaming_etl_glue_spark.session import get_spark

    spark = get_spark(
        "lsh_scaling", extra_conf={"spark.driver.memory": "24g"}
    )
    print(f"{'n':>7} {'bands':>5} {'bits':>4} {'cand':>10} {'n2/16':>11} "
          f"{'frac':>6} {'recall@0.5':>10} {'sec':>6}")
    for n, bands, bits in [
        (2_000, 128, 11),   # the committed sf0.1 default
        (20_000, 128, 11),  # naive: same banding at 10x rows
        (20_000, 512, 14),  # re-derived: bits ~ log2 n, bands ~ n^rho
    ]:
        vecs, planted = synth(n)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        ).repartition(32).cache()
        df.count()
        t0 = time.perf_counter()
        stats = S.lsh_candidate_stats(df, bands, bits)
        got = {
            (r["vec_id_a"], r["vec_id_b"])
            for r in S.cosine_pairs_lsh(
                df, threshold=0.45, bands=bands, bits=bits
            ).collect()
        }
        dt = time.perf_counter() - t0
        recall = len(got & planted) / len(planted)
        bound = stats["quadratic_bound"]
        print(
            f"{n:>7} {bands:>5} {bits:>4} {stats['candidate_pairs']:>10} "
            f"{bound:>11} {stats['candidate_pairs'] / bound:>6.2f} "
            f"{recall:>10.2f} {dt:>6.1f}"
        )
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
