"""Round-10 regression pins for the ADVICE r9 items: hard-crash
self-heal in ``rewrite_ivfpq_cells`` (a kill between the two swap
renames previously left the cell missing with no heal on the next
call), monotonic parked-name ordering + stale-debris cleanup in
``retrain_ivfpq_layout``, and the audio synth docstring alignment."""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import similarity as S
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _files(path: str) -> dict[str, str]:
    out = {}
    for f in glob.glob(os.path.join(path, "**", "*"), recursive=True):
        if os.path.isfile(f):
            with open(f, "rb") as fh:
                out[os.path.relpath(f, path)] = hashlib.md5(
                    fh.read()
                ).hexdigest()
    return out


def _labels(path: str) -> list[str]:
    return sorted(
        p.split("=", 1)[1]
        for p in os.listdir(path)
        if p.startswith("assigned_label=")
    )


def test_rewrite_heals_cell_missing_after_hard_crash(
    spark, embs, tmp_path
):
    """Kill window between rename(dst→old) and rename(src→dst): the
    live layout is missing one cell, its full copy parked at .old-*.
    The NEXT rewrite_ivfpq_cells call must restore it on entry, even
    when the new delete batch touches nothing."""
    path = str(tmp_path / "idx")
    S.write_ivfpq_layout(embs, path)
    before = _files(path)
    lab = _labels(path)[0]
    os.rename(
        os.path.join(path, f"assigned_label={lab}"),
        os.path.join(path, f".old-{lab}-1111"),
    )
    nothing = spark.createDataFrame([(-1,)], "vec_id long")
    assert S.rewrite_ivfpq_cells(spark, path, nothing) == []
    assert _files(path) == before, "heal must restore the parked cell"


def test_rewrite_clears_parked_debris_when_cell_live(
    spark, embs, tmp_path
):
    """Kill window AFTER rename(src→dst) but before rmtree(old): the
    live cell is complete and the parked copy is superseded debris —
    the next call must drop it, not resurrect it."""
    path = str(tmp_path / "idx")
    S.write_ivfpq_layout(embs, path)
    before = _files(path)
    lab = _labels(path)[0]
    shutil.copytree(
        os.path.join(path, f"assigned_label={lab}"),
        os.path.join(path, f".old-{lab}-2222"),
    )
    nothing = spark.createDataFrame([(-1,)], "vec_id long")
    S.rewrite_ivfpq_cells(spark, path, nothing)
    assert not glob.glob(os.path.join(path, ".old-*"))
    assert _files(path) == before


def test_retrain_heal_restores_newest_of_two_parked(
    spark, embs, tmp_path
):
    """Two parked layouts (a double mid-cutover crash): the heal must
    restore the NEWEST — previously sorted()[-1] on random-uuid
    suffixes picked an arbitrary one."""
    path = str(tmp_path / "idx")
    S.write_ivfpq_layout(embs, path)
    want = _files(path)
    stale = path + ".pre-retrain-1000"
    shutil.copytree(path, stale)
    # make the stale copy distinguishable and OLDER by mtime
    open(os.path.join(stale, "stale-marker"), "w").close()
    past = 1_000_000_000
    os.utime(stale, (past, past))
    os.rename(path, path + ".pre-retrain-2000")
    audit = S.retrain_ivfpq_layout(
        spark, embs, path, max_mean_sq_err=1e9
    )
    assert not audit["retrained"]
    assert _files(path) == want, "newest parked layout must be restored"
    assert not glob.glob(path + ".pre-retrain-*"), (
        "the stale parked copy is debris and must be cleared"
    )


def test_retrain_clears_stale_parked_debris_when_live_exists(
    spark, embs, tmp_path
):
    """Crash after cutover but before rmtree(parked): the live path is
    the NEW layout and the parked copy is stale. Previously only
    .retrain-* debris was cleaned — a later mid-cutover crash could
    then restore the stale layout."""
    path = str(tmp_path / "idx")
    S.write_ivfpq_layout(embs, path)
    before = _files(path)
    shutil.copytree(path, path + ".pre-retrain-3000")
    audit = S.retrain_ivfpq_layout(
        spark, embs, path, max_mean_sq_err=1e9
    )
    assert not audit["retrained"]
    assert _files(path) == before
    assert not glob.glob(path + ".pre-retrain-*")


def test_audio_synth_docstrings_match_code():
    """ADVICE r9 (low): the edit-gain prose must state the
    clip-multiplied 2 + doc_id % AUDIO_EDIT_GAINS edit, not the stale
    '2 + doc_id % 3' / '(raw + doc_id) mod 65536' descriptions."""
    from music_streaming_etl_glue_spark.operators import multimodal as M

    assert M.AUDIO_EDIT_GAINS == 2
    assert "AUDIO_EDIT_GAINS" in M._synth_samples.__doc__
    assert "% 3" not in M._synth_samples.__doc__
    src = open(M.__file__).read()
    assert "(raw + doc_id) mod 65536" not in src
