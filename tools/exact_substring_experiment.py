"""Measure the ExactSubstr pass' scale behavior (the measured-not-guessed
discipline behind SCALE.md): gram-relation size, duplicated-position
volume, span counts, and — the declared risk — hot-gram skew in the
rank window, with and without a prior remove_boilerplate pass.

Usage: python tools/exact_substring_experiment.py [sf_dir ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from music_streaming_etl_glue_spark.operators import text as T  # noqa: E402
from music_streaming_etl_glue_spark.operators.dedup import (  # noqa: E402
    EXACT_SUBSTR_K,
    _dup_windows,
    _kgram_occurrences,
    exact_substring_spans,
)
from music_streaming_etl_glue_spark.session import get_spark  # noqa: E402


def profile(spark, sf_dir: str, label: str, docs) -> None:
    occ = _kgram_occurrences(docs, EXACT_SUBSTR_K).localCheckpoint()
    n_occ = occ.count()
    if n_occ == 0:
        # on the tiny-vocab synthetic corpus remove_boilerplate's FIXED
        # min_df=5 saturates as docs grow (every 3-gram goes corpus-
        # frequent) and guts the text — the SCALE.md rule "raise min_df
        # with corpus size" demonstrated; report rather than crash
        print(f"{label:28s} positions=0 (no >= K-token text left)")
        return
    per_gram = occ.groupBy("gh").agg(F.count("*").alias("n"))
    stats = per_gram.agg(
        F.count("*").alias("distinct_grams"),
        F.max("n").alias("hottest_gram"),
        F.sum(F.when(F.col("n") >= 2, F.col("n"))).alias("rows_in_rank"),
    ).head()
    dups = _dup_windows(docs, EXACT_SUBSTR_K).count()
    spans = exact_substring_spans(docs, EXACT_SUBSTR_K)
    span_stats = spans.agg(
        F.count("*").alias("spans"),
        F.sum("span_len").alias("tokens_removed"),
        F.max("span_len").alias("longest"),
    ).head()
    print(
        f"{label:28s} positions={n_occ:>9,} distinct={stats.distinct_grams:>9,} "
        f"hottest={stats.hottest_gram:>6,} rank_rows={stats.rows_in_rank or 0:>8,} "
        f"dup_pos={dups:>8,} spans={span_stats.spans:>6,} "
        f"removed_tokens={span_stats.tokens_removed or 0:>8,} "
        f"longest={span_stats.longest or 0}"
    )


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark(
        "exact_substring_experiment",
        extra_conf={"spark.driver.memory": "16g"},
    )
    for sf in sf_dirs:
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        profile(spark, sf, f"{sf.rsplit('/', 1)[-1]} raw", docs)
        # the documented mitigation for hot boilerplate grams: scrub
        # corpus-frequent short n-grams FIRST, then run ExactSubstr
        bp = T.remove_boilerplate(docs).select(
            "doc_id", F.col("clean_text").alias("text")
        ).filter(F.length("text") > 0)
        profile(spark, sf, f"{sf.rsplit('/', 1)[-1]} post-boilerplate", bp)
    spark.stop()


if __name__ == "__main__":
    main()
