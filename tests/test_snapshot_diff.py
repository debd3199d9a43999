"""Snapshot-diff semantics: status classification, key coverage, and
summary arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.plans.snapshot_diff import (
    dataset_diff,
    diff_summary,
    documents_diff_summary,
    perturbed_documents,
)
from music_streaming_etl_glue_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_dataset_diff_classifies_all_four_states(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "id long, v string"
    )
    got = {r.id: r.status for r in dataset_diff(old, new, "id", ["v"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_dataset_diff_null_semantics(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    new = spark.createDataFrame([(1, None), (2, "x")], "id long, v string")
    got = {r.id: r.status for r in dataset_diff(old, new, "id", ["v"]).collect()}
    assert got == {1: "unchanged", 2: "changed"}


def test_documents_diff_summary_accounts_for_every_key(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    n_old = docs.count()
    n_new = perturbed_documents(docs).count()
    s = {r.status: r.n for r in documents_diff_summary(docs).collect()}
    # every old key is removed/changed/unchanged; every new key is
    # added/changed/unchanged — the two identities pin the rollup
    assert s.get("removed", 0) + s.get("changed", 0) + s.get("unchanged", 0) == n_old
    assert s.get("added", 0) + s.get("changed", 0) + s.get("unchanged", 0) == n_new
    assert s.get("added", 0) >= 1 and s.get("removed", 0) >= 1
    assert s.get("changed", 0) >= 1


def test_incremental_corpus_update_admits_and_rejects(spark):
    """Composite refresh: unchanged docs carry over untouched, a novel
    doc is admitted, and a fresh doc that exactly duplicates a carried
    corpus doc is rejected by the asymmetric dedup."""
    from music_streaming_etl_glue_spark.plans.snapshot_diff import (
        incremental_corpus_update,
    )

    old = spark.createDataFrame(
        [(i, f"stable document number {i} alpha beta gamma delta")
         for i in range(10)],
        "doc_id long, text string",
    )
    new_rows = (
        # 0..8 unchanged; 9 dropped; 20 = novel; 21 = copy of doc 3
        [(i, f"stable document number {i} alpha beta gamma delta")
         for i in range(9)]
        + [(20, "a genuinely novel document with fresh words entirely")]
        + [(21, "stable document number 3 alpha beta gamma delta")]
    )
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    corpus, audit = incremental_corpus_update(old, new)
    ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert ids == set(range(9)) | {20}
    assert audit["unchanged"] == 9
    assert audit["added"] == 2
    assert audit["fresh"] == 2
    assert audit["admitted"] == 1
    assert audit["rejected_dup"] == 1
