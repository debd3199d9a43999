"""Regression tests for the four ADVICE.md defects (VERDICT r4/r5 item
#3): float-fragile prefix ceil in jaccard_pairs_prefix, zero-width PSI
bins on a constant baseline, PCA covariance with n < 2, and parquet
row-group stats lacking min/max."""

import math

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import dedup


def _boundary_corpus(spark):
    """Two docs engineered so the ONLY shared shingle sits exactly at
    doc A's prefix boundary under τ=0.07, |A|=100 shingles:
    exact ⌈0.07·100⌉ = 7 → prefix 94, but the float product is
    7.000000000000001 → ⌈⌉ = 8 → prefix 93, which cuts the first shared
    shingle out of the prefix AND the length filter (τ·100 > 7 = |B|)
    drops the pair a second way. Jaccard = 7/100 = 0.07 ≥ τ, so the
    naive join keeps it — the prefix path must too."""
    a_words = [f"a{i:03d}" for i in range(93)] + [
        f"z{i}" for i in range(9)
    ]
    b_words = a_words[-9:]
    docs = spark.createDataFrame(
        [(1, " ".join(a_words)), (2, " ".join(b_words))],
        "doc_id long, text string",
    )
    # sanity: the construction yields the intended set sizes / overlap
    sh = dedup.shingles(docs)
    sizes = {
        r.doc_id: r.n
        for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {1: 100, 2: 7}
    return docs


def test_prefix_ceil_keeps_float_boundary_pair(spark):
    docs = _boundary_corpus(spark)
    naive = {
        (r.doc_id_a, r.doc_id_b, round(r.jaccard, 9))
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.07).collect()
    }
    assert naive == {(1, 2, 0.07)}
    pref = {
        (r.doc_id_a, r.doc_id_b, round(r.jaccard, 9))
        for r in dedup.jaccard_pairs_prefix(docs, threshold=0.07).collect()
    }
    assert pref == naive


def test_psi_constant_baseline_detects_drift(spark):
    """A constant baseline column used to zero the bin width, NULLing
    every bin and silently reporting ~0 drift. It must (a) still score 0
    when the new snapshot is identical and (b) fire the alert when every
    value moved."""
    from music_streaming_etl_glue_spark.plans.quality import (
        PSI_ALERT,
        psi_drift,
    )

    const = spark.createDataFrame(
        [(i, 5.0) for i in range(200)], "id long, v double"
    )
    terms_same = psi_drift(const, const, "v").collect()
    assert len(terms_same) > 0
    assert all(math.isfinite(r.psi_term) for r in terms_same)
    assert abs(sum(r.psi_term for r in terms_same)) < 1e-9

    shifted = spark.createDataFrame(
        [(i, 9.0) for i in range(200)], "id long, v double"
    )
    terms_up = psi_drift(const, shifted, "v").collect()
    assert all(math.isfinite(r.psi_term) for r in terms_up)
    assert sum(r.psi_term for r in terms_up) > PSI_ALERT

    below = spark.createDataFrame(
        [(i, 1.0) for i in range(200)], "id long, v double"
    )
    terms_down = psi_drift(const, below, "v").collect()
    assert sum(r.psi_term for r in terms_down) > PSI_ALERT


def test_pca_raises_on_single_vector(spark):
    """n=1 makes the Bessel (n−1) denominator zero; the trainer must
    raise instead of feeding NaNs to eigh."""
    from music_streaming_etl_glue_spark.operators.similarity import (
        pca_explained_variance,
        pca_train,
    )

    one = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="at least 2"):
        pca_train(one, k=2)
    with pytest.raises(ValueError, match="at least 2"):
        pca_explained_variance(one, k=2)


def test_row_group_stats_survive_missing_min_max(tmp_path):
    """Parquet footers can carry a statistics object WITHOUT min/max
    (e.g. an all-NaN double column). row_group_stats must report those
    groups as stats-less instead of raising, and skipping_fraction must
    treat them as unprunable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from music_streaming_etl_glue_spark.plans.layout import (
        row_group_stats,
        skipping_fraction,
    )

    path = str(tmp_path / "nanstats")
    import os

    os.makedirs(path)
    table = pa.table({"x": pa.array([float("nan")] * 8, pa.float64())})
    pq.write_table(table, os.path.join(path, "part-0.parquet"))
    st = (
        pq.ParquetFile(os.path.join(path, "part-0.parquet"))
        .metadata.row_group(0)
        .column(0)
        .statistics
    )
    # precondition for the regression: stats exist but min/max do not
    assert st is not None and not st.has_min_max

    stats = row_group_stats(path, "x")
    assert stats == [
        {
            "file": "part-0.parquet",
            "row_group": 0,
            "rows": 8,
            "min": None,
            "max": None,
        }
    ]
    assert skipping_fraction(stats, 0.0, 1.0) == 0.0
