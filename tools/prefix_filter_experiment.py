"""Empirical check of the AllPairs/PPJoin prefix-filter claim in
SCALE.md: on a Zipf-shingled corpus (the realistic case — a few
boilerplate shingles in most docs, a long rare tail), the prefix join's
candidate-pair count grows far slower than the naive shingle join's
Σ df·(df−1)/2, and the gap WIDENS with corpus size. The repo's synthetic
documents table has a ~120-word vocabulary (nearly uniform shingle df),
which is the prefix filter's worst case — this experiment supplies the
distribution the technique is actually for.

Synthesizes documents whose tokens are drawn Zipf(1.2) from a 5k-word
vocabulary, at two corpus sizes, and measures:
  * naive candidates  = Σ df·(df−1)/2 over all shingles
  * prefix candidates = the measured candidate-pair count
  * result parity     = prefix output == naive output (losslessness)

Run: python tools/prefix_filter_experiment.py   (~2 min; prints a table)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def synth_docs(n_docs: int, seed: int = 11):
    """Zipf-token documents with planted near-duplicate pairs."""
    rng = np.random.RandomState(seed)
    vocab = 5_000
    # Zipf(1.2) over the vocabulary
    ranks = np.arange(1, vocab + 1, dtype="float64")
    probs = ranks ** -1.2
    probs /= probs.sum()
    rows = []
    for i in range(n_docs):
        length = 30 + int(rng.rand() * 20)
        toks = rng.choice(vocab, size=length, p=probs)
        rows.append((i, " ".join(f"w{t}" for t in toks)))
    # plant 20 near-dup pairs: copy with one token changed
    for j in range(20):
        src = rows[j][1].split(" ")
        src[len(src) // 2] = "w0"
        rows.append((n_docs + j, " ".join(src)))
    return rows


def main() -> None:
    from pyspark.sql import functions as F

    from music_streaming_etl_glue_spark.operators import dedup
    from music_streaming_etl_glue_spark.session import get_spark

    spark = get_spark("prefix_experiment", shuffle_partitions=16)
    print(f"{'n_docs':>8} {'naive_cand':>12} {'prefix_cand':>12} "
          f"{'ratio':>7} {'pairs':>6} {'parity':>7}")
    for n_docs in (1_000, 4_000):
        docs = spark.createDataFrame(
            synth_docs(n_docs), "doc_id long, text string"
        ).repartition(16)
        naive_cand = (
            dedup.shingles(docs)
            .groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("c"))
            .collect()[0]
            .c
        )
        stats: dict = {}
        pref = {
            (r.doc_id_a, r.doc_id_b)
            for r in dedup.jaccard_pairs_prefix(
                docs, candidate_stats=stats
            ).collect()
        }
        naive = {
            (r.doc_id_a, r.doc_id_b)
            for r in dedup.ngram_jaccard_pairs(docs).collect()
        }
        ratio = stats["candidates"] / naive_cand
        print(
            f"{n_docs:>8} {int(naive_cand):>12} {stats['candidates']:>12} "
            f"{ratio:>7.3f} {len(pref):>6} {str(pref == naive):>7}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
