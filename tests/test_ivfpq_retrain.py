"""IVF-PQ codebook retrain + migrate (VERDICT r8 item #7): the drift
gate now has an ACTION — when reconstruction error under the pinned
codebook exceeds the threshold, a fresh layout trains side-by-side,
must pass the recall audit against exact kNN, and only then swaps in
atomically. The old index stays byte-identical until cutover."""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import similarity as S
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _drifted(embs):
    """A corpus that has moved away from the trained cells: even
    dimensions collapse to 5% scale, concentrating the (renormalized)
    mass in the odd dims — an anisotropy the isotropically-trained
    codebook prices badly. Measured on sf0.001: pinned-codebook mean
    sq_err 0.356 → 0.406 (1.14×), while a retrain reaches 0.131 — the
    gap the gate exists to close. (Pure rotations do NOT drift: the
    data is isotropic, so error is rotation-invariant — that was the
    first fixture attempt.)"""
    return embs.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " (x, i) -> CASE WHEN i % 2 = 0 THEN x * 0.05 ELSE x END)"
        ).alias("embedding"),
        "label",
    )


def _files(path: str) -> dict[str, str]:
    out = {}
    for f in glob.glob(os.path.join(path, "**", "*"), recursive=True):
        if os.path.isfile(f):
            with open(f, "rb") as fh:
                out[os.path.relpath(f, path)] = hashlib.md5(
                    fh.read()
                ).hexdigest()
    return out


def _no_debris(parent: str):
    return [
        p
        for p in os.listdir(parent)
        if ".retrain-" in p or ".pre-retrain-" in p
    ]


def test_gate_holds_without_drift(spark, embs, tmp_path):
    """On the corpus the codebook was trained on, the gate must not
    trip: no candidate is trained, the layout is untouched."""
    path = str(tmp_path / "idx")
    S.write_ivfpq_layout(embs, path)
    before = _files(path)
    cb = spark.read.parquet(os.path.join(path, "_codebook"))
    base_err = float(
        S.pq_reconstruction_error(embs, codebook=cb)
        .agg(F.avg("sq_err"))
        .head()[0]
    )
    audit = S.retrain_ivfpq_layout(
        spark, embs, path, max_mean_sq_err=base_err * 1.5
    )
    assert audit == {
        "mean_sq_err": pytest.approx(base_err, abs=1e-6),
        "threshold": base_err * 1.5,
        "retrained": False,
        "cutover": False,
    }
    assert _files(path) == before
    assert not _no_debris(str(tmp_path))


def test_drift_trips_gate_and_cutover_after_recall_audit(
    spark, embs, tmp_path
):
    """Drifted corpus: error under the pinned codebook exceeds the
    baseline-derived threshold, a candidate trains, passes the recall
    audit, and swaps in — after which the drifted corpus' error under
    the NEW pinned codebook is back at baseline scale and serving works
    from the migrated index."""
    path = str(tmp_path / "idx")
    S.write_ivfpq_layout(embs, path)
    cb = spark.read.parquet(os.path.join(path, "_codebook"))
    drifted = _drifted(embs)
    base_err = float(
        S.pq_reconstruction_error(embs, codebook=cb)
        .agg(F.avg("sq_err"))
        .head()[0]
    )
    drift_err = float(
        S.pq_reconstruction_error(drifted, codebook=cb)
        .agg(F.avg("sq_err"))
        .head()[0]
    )
    assert drift_err > base_err * 1.1, "fixture must actually drift"

    audit = S.retrain_ivfpq_layout(
        spark, drifted, path, max_mean_sq_err=base_err * 1.1,
        min_recall=0.5,
    )
    assert audit["retrained"] and audit["cutover"]
    assert audit["mean_sq_err"] == pytest.approx(drift_err, abs=1e-6)
    assert audit["candidate_mean_recall"] >= 0.5
    assert not _no_debris(str(tmp_path))

    # the migrated index is a genuine retrain: drifted corpus' error
    # under the NEW codebook is back at (small multiple of) baseline
    new_cb = spark.read.parquet(os.path.join(path, "_codebook"))
    new_err = float(
        S.pq_reconstruction_error(drifted, codebook=new_cb)
        .agg(F.avg("sq_err"))
        .head()[0]
    )
    assert new_err < drift_err / 1.5, (new_err, drift_err)
    # and serving from the migrated layout works end-to-end
    served = S.knn_join_ivfpq(spark, drifted, path).limit(5).collect()
    assert served


def test_failed_recall_audit_keeps_old_index_byte_identical(
    spark, embs, tmp_path
):
    """An impossible recall bar: the candidate trains but must NOT swap
    in — the live layout's every file stays byte-identical and the
    candidate directory is cleaned up."""
    path = str(tmp_path / "idx")
    S.write_ivfpq_layout(embs, path)
    before = _files(path)
    audit = S.retrain_ivfpq_layout(
        spark, _drifted(embs), path, max_mean_sq_err=0.0,
        min_recall=1.01,
    )
    assert audit["retrained"] and not audit["cutover"]
    assert audit["reason"] == "recall_audit_failed"
    assert _files(path) == before
    assert not _no_debris(str(tmp_path))


def test_self_heal_restores_parked_index_after_hard_crash(
    spark, embs, tmp_path
):
    """Simulate a process kill between the two cutover renames (live
    path gone, old layout parked, candidate still beside it): the next
    retrain call must restore the parked layout and clean the
    pre-cutover candidate debris before gating."""
    import shutil

    path = str(tmp_path / "idx")
    S.write_ivfpq_layout(embs, path)
    before = _files(path)
    # manufacture the crash window
    os.rename(path, path + ".pre-retrain-deadbeef")
    shutil.copytree(
        path + ".pre-retrain-deadbeef", path + ".retrain-deadbeef"
    )
    audit = S.retrain_ivfpq_layout(
        spark, embs, path, max_mean_sq_err=1e9
    )
    assert not audit["retrained"]
    assert _files(path) == before, "self-heal must restore the layout"
    assert not _no_debris(str(tmp_path))


# ---------------------------------------------------------------------------
# lake-backed registry path (VERDICT r11 item #7): one state layer —
# cutover is a registry snapshot commit, not a dir rename
# ---------------------------------------------------------------------------


def test_lake_registry_gate_holds_and_pins_versions(spark, embs, tmp_path):
    reg = str(tmp_path / "registry")
    root = str(tmp_path / "layouts")
    v1, p1 = S.commit_ivfpq_layout(spark, embs, reg, root)
    assert v1 == 1 and S.current_ivfpq_layout(spark, reg) == p1
    before = _files(p1)
    cb = spark.read.parquet(os.path.join(p1, "_codebook"))
    base_err = float(
        S.pq_reconstruction_error(embs, codebook=cb)
        .agg(F.avg("sq_err"))
        .head()[0]
    )
    audit = S.retrain_ivfpq_lake(
        spark, embs, reg, root, max_mean_sq_err=base_err * 1.5
    )
    assert not audit["retrained"] and not audit["cutover"]
    assert audit["registry_version"] == 1
    assert _files(p1) == before  # live layout never touched


def test_lake_registry_cutover_is_a_commit_with_time_travel(
    spark, embs, tmp_path
):
    reg = str(tmp_path / "registry")
    root = str(tmp_path / "layouts")
    _, p1 = S.commit_ivfpq_layout(spark, embs, reg, root)
    before = _files(p1)
    cb = spark.read.parquet(os.path.join(p1, "_codebook"))
    drifted = _drifted(embs)
    base_err = float(
        S.pq_reconstruction_error(embs, codebook=cb)
        .agg(F.avg("sq_err"))
        .head()[0]
    )
    audit = S.retrain_ivfpq_lake(
        spark, drifted, reg, root,
        max_mean_sq_err=base_err * 1.1, min_recall=0.5,
    )
    assert audit["retrained"] and audit["cutover"]
    assert audit["registry_version"] == 2
    p2 = S.current_ivfpq_layout(spark, reg)
    assert p2 != p1
    # the OLD layout is byte-identical and still served via time travel
    assert _files(p1) == before
    assert S.current_ivfpq_layout(spark, reg, version=1) == p1
    # serving from the new layout works
    served = S.knn_join_ivfpq(spark, drifted, p2).limit(5).collect()
    assert served
    # vacuum: keep only the newest version -> p1's directory sweeps,
    # p2 survives
    deleted = S.vacuum_ivfpq_layouts(
        spark, reg, root, keep_versions=1, min_age_s=0.0
    )
    assert [os.path.realpath(d) for d in deleted] == [os.path.realpath(p1)]
    assert not os.path.exists(p1) and os.path.exists(p2)


def test_lake_registry_failed_audit_leaves_pointer_and_candidate_for_vacuum(
    spark, embs, tmp_path
):
    reg = str(tmp_path / "registry")
    root = str(tmp_path / "layouts")
    _, p1 = S.commit_ivfpq_layout(spark, embs, reg, root)
    audit = S.retrain_ivfpq_lake(
        spark, _drifted(embs), reg, root,
        max_mean_sq_err=0.0, min_recall=1.01,
    )
    assert audit["retrained"] and not audit["cutover"]
    assert audit["reason"] == "recall_audit_failed"
    # pointer untouched; no park/heal debris concept exists at all —
    # the failed candidate was removed eagerly, and even a crashed one
    # would just be an unreferenced dir for vacuum
    assert S.current_ivfpq_layout(spark, reg) == p1
    assert os.listdir(root) == [os.path.basename(p1)]
    # a crashed trainer's orphan: fabricate one and vacuum it
    orphan = os.path.join(root, "ivfpq-orphan")
    os.makedirs(orphan)
    deleted = S.vacuum_ivfpq_layouts(
        spark, reg, root, keep_versions=2, min_age_s=0.0
    )
    assert deleted == [orphan]


def test_cli_ann_bootstrap_retrain_vacuum_flow(spark, tmp_path, capsys):
    """The operational story — bootstrap → (drift-forced) retrain with
    1-row-commit cutover → reference-counted layout vacuum — drivable
    end to end through the CLI `ann` verbs (VERDICT r12 item #8), the
    same way `lake scrub` is."""
    import json

    from music_streaming_etl_glue_spark.__main__ import main

    reg = str(tmp_path / "registry")
    root = str(tmp_path / "layouts")
    base = ["ann", "--registry", reg, "--layouts-root", root,
            "--sf-dir", SF_SMOKE]

    def last_json():
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert main([*base, "bootstrap"]) == 0
    boot = last_json()
    assert boot["registry_version"] == 1 and os.path.isdir(
        boot["layout_path"]
    )
    # current resolves the pointer
    assert main([*base, "current"]) == 0
    assert last_json()["layout_path"] == boot["layout_path"]
    # forced retrain (gate 0.0 => any error drifts) cuts over via one
    # registry commit
    assert main([*base, "retrain", "--max-mean-sq-err", "0.0"]) == 0
    audit = last_json()
    assert audit["retrained"] and audit["cutover"]
    assert audit["registry_version"] == 2
    # vacuum: keep only the newest registry version; the bootstrap
    # layout dir is now unreferenced and sweeps
    assert main(
        [*base, "vacuum-layouts", "--keep-versions", "1",
         "--min-age-s", "0"]
    ) == 0
    assert last_json()["deleted"] == [boot["layout_path"]]
    # the new layout still serves
    assert main([*base, "current"]) == 0
    served = last_json()["layout_path"]
    assert served != boot["layout_path"] and os.path.isdir(served)
    # arg validation: retrain/bootstrap/vacuum-layouts need a root
    assert main(["ann", "--registry", reg, "retrain"]) == 2
