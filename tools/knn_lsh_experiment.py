"""Empirical scaling check for knn_join_lsh (SCALE.md): the LSH-pruned
multi-query knn should score a small, roughly constant FRACTION of the
n·Q exact-join pairs while keeping recall@k high for genuinely-near
neighbors — and re-deriving the banding at 10× rows should hold the
fraction down exactly as it does for cosine_pairs_lsh.

Synthesizes iid-normal vectors (worst case for angular LSH) and plants
3 cosine-0.6 neighbors per query, then measures scored-candidate volume
and recall@5 of the LSH list against the exact knn_join ground truth.

Run: python tools/knn_lsh_experiment.py   (~2-3 min; prints a table)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

N_QUERIES = 20
K = 5


def synth(n: int, dims: int = 64, seed: int = 7):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dims)
    # plant 3 cosine-0.6 neighbors for each query id q < N_QUERIES,
    # parked at ids beyond the query block so they never act as queries
    for q in range(N_QUERIES):
        a = vecs[q] / np.linalg.norm(vecs[q])
        for j in range(3):
            w = rng.randn(dims)
            w = w - (w @ a) * a
            w /= np.linalg.norm(w)
            vecs[N_QUERIES + q * 3 + j] = 0.6 * a + np.sqrt(1 - 0.36) * w
    return vecs


def main() -> None:
    from pyspark.sql import functions as F

    from music_streaming_etl_glue_spark.operators import similarity as S
    from music_streaming_etl_glue_spark.session import get_spark

    spark = get_spark(
        "knn_lsh_scaling", extra_conf={"spark.driver.memory": "24g"}
    )
    print(f"{'n':>7} {'bands':>5} {'bits':>4} {'scored':>10} {'nQ':>9} "
          f"{'frac':>7} {'recall@5':>8} {'sec':>6}")
    for n, bands, bits in [
        (2_000, 128, 11),   # the committed default (test-SF clamp)
        (20_000, 128, 11),  # naive: same banding at 10x rows
        (20_000, 512, 14),  # re-derived: bits ~ log2 n, bands from s-curve
    ]:
        vecs = synth(n)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        ).repartition(32).cache()
        df.count()
        t0 = time.perf_counter()
        # scored-candidate volume: the distinct (query, vec) collision set
        buckets = S.lsh_band_buckets(df, bands, bits).localCheckpoint()
        qb = buckets.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("band").alias("qband"),
            F.col("band_hash").alias("qhash"),
        )
        scored = (
            buckets.join(
                qb,
                (F.col("band") == F.col("qband"))
                & (F.col("band_hash") == F.col("qhash"))
                & (F.col("vec_id") != F.col("query_id")),
            )
            .select("query_id", "vec_id")
            .distinct()
            .count()
        )
        approx = {
            (r["query_id"], r["vec_id"])
            for r in S.knn_join_lsh(
                df, n_queries=N_QUERIES, k=K, bands=bands, bits=bits
            ).collect()
        }
        sec = time.perf_counter() - t0
        exact = {
            (r["query_id"], r["vec_id"])
            for r in S.knn_join(df, n_queries=N_QUERIES, k=K).collect()
        }
        recall = len(exact & approx) / len(exact)
        nq = n * N_QUERIES
        print(f"{n:>7} {bands:>5} {bits:>4} {scored:>10} {nq:>9} "
              f"{scored / nq:>7.3f} {recall:>8.2f} {sec:>6.1f}")
        df.unpersist()


if __name__ == "__main__":
    main()
