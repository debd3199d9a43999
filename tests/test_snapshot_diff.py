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
