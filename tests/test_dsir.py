"""DSIR importance-resampling semantics (operators.text.dsir_*)."""

from __future__ import annotations

from music_streaming_etl_glue_spark.operators import text as T


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_dsir_weights_prefer_target_like_docs(spark):
    # target domain speaks "alpha beta"; pool docs either mimic it or
    # speak an unrelated vocabulary — the mimics must outweigh them
    rows = [
        (1, "alpha beta alpha beta alpha", "tgt"),
        (2, "beta alpha beta alpha beta", "tgt"),
        (10, "alpha beta alpha beta", "web"),  # target-like
        (11, "gamma delta gamma delta", "web"),  # off-domain
        (12, "alpha beta gamma delta", "web"),  # mixed
    ]
    w = {
        r["doc_id"]: r["logw"]
        for r in T.dsir_weights(
            _docs(spark, rows), target_sources=("tgt",)
        ).collect()
    }
    assert set(w) == {10, 11, 12}  # pool only — target docs never scored
    assert w[10] > w[12] > w[11]


def test_dsir_sample_is_gumbel_topk_of_pool(spark):
    rows = [(0, "alpha beta", "tgt")] + [
        (i, f"alpha tok{i} beta", "web") for i in range(1, 21)
    ]
    sample = T.dsir_sample(
        _docs(spark, rows), target_sources=("tgt",), keep_frac=0.25
    ).collect()
    assert len(sample) == 5  # floor(0.25 * 20)
    ranks = sorted(r["sel_rank"] for r in sample)
    assert ranks == [1, 2, 3, 4, 5]
    # keys are the selection order: descending with the kept set
    by_rank = sorted(sample, key=lambda r: r["sel_rank"])
    keys = [r["gumbel_key"] for r in by_rank]
    assert keys == sorted(keys, reverse=True)


def test_dsir_weights_gramless_doc_scores_zero(spark):
    rows = [
        (1, "alpha beta", "tgt"),
        (2, "", "web"),
        (3, "alpha", "web"),
    ]
    w = {
        r["doc_id"]: r["logw"]
        for r in T.dsir_weights(
            _docs(spark, rows), target_sources=("tgt",)
        ).collect()
    }
    assert w[2] == 0.0
    assert w[3] != 0.0
