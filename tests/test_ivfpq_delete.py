"""IVF-PQ delete/update path (VERDICT r7 item #2): a snapshot diff with
REMOVED and CHANGED vectors is absorbed by the persisted index via a
touched-cell rewrite + pinned-codebook re-encode — never a retrain or a
corpus re-encode. The done-signals pinned here: the deleted id vanishes
from both sides of the knn join, the re-embedded id is served with its
NEW vector, untouched cell partitions stay byte-identical, nothing is
double-encoded, the recall audit holds on the post-update index, and
the whole served result hash-matches the DuckDB replay."""

from __future__ import annotations

import glob
import hashlib
import os

import pytest

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import similarity as S
from music_streaming_etl_glue_spark.plans.snapshot_diff import (
    incremental_index_update,
)

from tests.conftest import SF_SMOKE
from tests.oracle_util import duckdb_con, assert_matches_oracle


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_SMOKE)


def _data_files(path: str) -> dict[str, str]:
    """relpath -> md5 for every cell data file (pinned ``_centroids`` /
    ``_codebook`` artifacts excluded — they must never move, which
    test_training_artifacts_pinned checks separately)."""
    out = {}
    for f in glob.glob(os.path.join(path, "assigned_label=*", "*.parquet")):
        with open(f, "rb") as fh:
            out[os.path.relpath(f, path)] = hashlib.md5(fh.read()).hexdigest()
    return out


@pytest.fixture(scope="module")
def updated(spark, embs, tmp_path_factory):
    """Build the index on the ORIGINAL corpus, snapshot its files, apply
    the perturbed snapshot's diff, and hand tests the before/after
    evidence."""
    path = str(tmp_path_factory.mktemp("ivfpq_del") / "layout")
    old = embs.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    new = S.perturbed_embeddings(embs)
    S.write_ivfpq_layout(old, path)
    pre_files = _data_files(path)
    pre_artifacts = {
        os.path.relpath(f, path): hashlib.md5(open(f, "rb").read()).hexdigest()
        for sub in ("_centroids", "_codebook")
        for f in glob.glob(os.path.join(path, sub, "*.parquet"))
    }
    touched = {
        r["assigned_label"]
        for r in spark.read.parquet(path)
        .join(
            new,
            "vec_id",
            "left_anti",  # removed old rows...
        )
        .select("assigned_label")
        .union(
            spark.read.parquet(path)  # ...plus changed old rows' cells
            .join(
                old.filter(
                    F.col("vec_id") % S.EMB_EDIT_MOD == S.EMB_EDIT_RES
                ).select("vec_id"),
                "vec_id",
            )
            .select("assigned_label")
        )
        .distinct()
        .collect()
    }
    audit = incremental_index_update(spark, old, new, path)
    return {
        "path": path,
        "old": old,
        "new": new,
        "audit": audit,
        "pre_files": pre_files,
        "pre_artifacts": pre_artifacts,
        "touched": touched,
    }


def test_audit_counts(spark, updated):
    a = updated["audit"]
    assert a.get("removed", 0) > 0 and a.get("changed", 0) > 0
    assert a["dropped"] == a["removed"] + a["changed"]
    assert a["encoded"] == a.get("added", 0) + a["changed"]
    assert a["cells_rewritten"] >= 1
    assert a["cells_rewritten"] == len(updated["touched"])


def test_layout_equals_encode_of_new_corpus(spark, updated):
    """The post-update index holds EXACTLY the perturbed corpus — every
    surviving vec_id once per subspace, no tombstone missed, no change
    double-encoded."""
    layout = spark.read.parquet(updated["path"])
    got_ids = {r["vec_id"] for r in layout.select("vec_id").distinct().collect()}
    want_ids = {r["vec_id"] for r in updated["new"].select("vec_id").collect()}
    assert got_ids == want_ids
    assert (
        layout.groupBy("vec_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )


def test_untouched_cells_byte_identical(updated):
    """Cells the diff never hit are not opened for write: their standing
    files survive byte-for-byte (appends only ever ADD files)."""
    post = _data_files(updated["path"])
    untouched_pre = {
        rel: md5
        for rel, md5 in updated["pre_files"].items()
        if rel.split(os.sep)[0].split("=", 1)[1] not in {
            str(lab) for lab in updated["touched"]
        }
    }
    assert untouched_pre  # the fixture must exercise standing cells
    for rel, md5 in untouched_pre.items():
        assert post.get(rel) == md5, f"standing cell file rewritten: {rel}"


def test_training_artifacts_pinned(updated):
    """The codebook and centroids never move on a refresh — retraining
    is a quality decision, not part of the delete path."""
    for sub in ("_centroids", "_codebook"):
        for f in glob.glob(os.path.join(updated["path"], sub, "*.parquet")):
            rel = os.path.relpath(f, updated["path"])
            assert (
                hashlib.md5(open(f, "rb").read()).hexdigest()
                == updated["pre_artifacts"][rel]
            ), f"training artifact rewritten: {rel}"


def test_served_knn_reflects_delete_and_reembed(spark, embs, updated):
    """vec_id 3 (3 % 97 == 3) is deleted: it appears as neither query
    nor neighbor. vec_id 5 (5 % 89 == 5) is re-embedded: it still
    queries, and with the NEGATED vector (its exact-cosine neighborhood
    flips sign, so the serve must run on the new vector to hash-match
    the exact scorer on the perturbed corpus)."""
    out = S.knn_join_ivfpq(
        spark, updated["new"], updated["path"]
    ).collect()
    qids = {r["query_id"] for r in out}
    assert 3 not in qids
    assert 5 in qids
    assert qids == set(range(S.KNN_N_QUERIES)) - {3}
    assert all(r["vec_id"] != 3 for r in out)
    exact = {
        (r["query_id"], r["vec_id"]): r["similarity"]
        for r in S.knn_join(updated["new"], k=10**6).collect()
    }
    for r in out:
        assert r["similarity"] == exact[(r["query_id"], r["vec_id"])]


def test_recall_audit_holds_after_update(spark, updated):
    audit = S.knn_ivfpq_recall_audit(
        spark, updated["new"], updated["path"]
    ).collect()
    assert len(audit) == S.KNN_N_QUERIES - 1  # query 3 deleted
    for row in audit:
        assert 0.0 <= row["recall_at_k"] <= 1.0
        assert row["n_hits"] <= row["n_exact"]


def test_after_delete_oracle(spark, embs, con, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq_del_oracle") / "layout")
    assert_matches_oracle(
        S.knn_join_ivfpq_after_delete(spark, embs, path),
        con,
        S.KNN_JOIN_IVFPQ_AFTER_DELETE_SQL,
    )
