"""Streaming ANN index maintenance (r11): the IVF-PQ layout absorbs
embedding micro-batches — artifacts pinned by the first epoch, O(batch)
encode afterwards, dynamic-partition-overwrite replay safety, and exact
parity with the proven batch build+refresh path."""

from __future__ import annotations

import glob
import hashlib
import os

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import similarity as S
from music_streaming_etl_glue_spark.streaming.file_pipeline import (
    _ann_ingest_batch_handler,
    ingest_ann_indexed,
)
from tests.conftest import SF_SMOKE


def _batches(spark, n=3):
    """Split the smoke embeddings into n deterministic vec_id slices."""
    embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    return [embs.filter(F.col("vec_id") % n == i).localCheckpoint() for i in range(n)]


def _write_file(df, path: str, order: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = df.collect()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r.vec_id for r in rows], pa.int64()),
                "embedding": pa.array(
                    [list(r.embedding) for r in rows],
                    pa.list_(pa.float64()),
                ),
                "label": pa.array([r.label for r in rows], pa.int64()),
            }
        ),
        path,
    )
    t = os.path.getmtime(path) + 10 * order
    os.utime(path, (t, t))


def _files(path: str) -> dict[str, str]:
    out = {}
    for f in glob.glob(os.path.join(path, "**", "*"), recursive=True):
        if os.path.isfile(f) and not f.endswith(".crc"):
            with open(f, "rb") as fh:
                out[os.path.relpath(f, path)] = hashlib.md5(
                    fh.read()
                ).hexdigest()
    return out


def _codes_rowset(spark, path: str):
    return sorted(
        (r.vec_id, tuple(r.codes), r.assigned_label)
        for r in spark.read.parquet(path)
        .select("vec_id", "codes", "assigned_label")
        .collect()
    )


def test_stream_matches_batch_build_plus_refresh(spark, tmp_path):
    """End-to-end: streaming three embedding files yields EXACTLY the
    codes the batch path produces (write_ivfpq_layout over batch 1 +
    refresh_ivfpq_layout for batches 2 and 3), and the layout serves
    through the existing funnel."""
    b = _batches(spark)
    src = tmp_path / "in"
    src.mkdir()
    for i, df in enumerate(b):
        _write_file(df, str(src / f"b{i}.parquet"), i)
    idx = str(tmp_path / "idx")
    ingest_ann_indexed(
        spark, str(src), idx, str(tmp_path / "ck"), str(tmp_path / "state"),
        files_per_trigger=1,
    )

    ref = str(tmp_path / "ref")
    S.write_ivfpq_layout(b[0], ref)
    S.refresh_ivfpq_layout(spark, b[1], ref)
    S.refresh_ivfpq_layout(spark, b[2], ref)
    assert _codes_rowset(spark, idx) == _codes_rowset(spark, ref)

    # the streamed layout serves through the unmodified funnel
    vecs = spark.read.parquet(
        os.path.join(str(tmp_path / "state"), "vecs")
    ).select("vec_id", "embedding", "label")
    served = S.ann_topk_ivfpq(spark, vecs, idx)
    assert served.count() == served.select("vec_id").distinct().count() > 0

    # drift metrics: one row per epoch, finite error
    drift = spark.read.parquet(
        os.path.join(str(tmp_path / "state"), "drift")
    )
    assert drift.count() == 3
    assert drift.filter(F.col("mean_sq_err") < 0).count() == 0


def test_epoch_replay_is_byte_idempotent(spark, tmp_path):
    """A foreachBatch retry of an epoch (after its writes committed)
    must rewrite the same bytes — never double-append codes."""
    b = _batches(spark)
    idx = str(tmp_path / "idx")
    state = str(tmp_path / "state")
    handler = _ann_ingest_batch_handler(spark, idx, state)
    def _parts(path):
        return {
            os.path.dirname(k)
            for k in _files(path)
            if "assigned_label=" in k
        }

    handler(b[0], 0)
    handler(b[1], 1)
    before = _codes_rowset(spark, idx)
    parts_before = _parts(idx)
    arts_before = {
        k: v for k, v in _files(idx).items()
        if k.startswith(("_centroids", "_codebook"))
    }
    handler(b[1], 1)  # retry
    # same rows, same (assigned_label, epoch) partition set — the part
    # files are rewritten under fresh names, but nothing double-appends
    assert _codes_rowset(spark, idx) == before
    assert _parts(idx) == parts_before
    handler(b[0], 0)  # late replay of the PINNING epoch: artifacts stay
    assert _codes_rowset(spark, idx) == before
    assert {
        k: v for k, v in _files(idx).items()
        if k.startswith(("_centroids", "_codebook"))
    } == arts_before


def test_append_never_touches_other_epochs(spark, tmp_path):
    """The standing corpus' code files are immutable: epoch 1's landing
    leaves every epoch-0 file byte-identical."""
    b = _batches(spark)
    idx = str(tmp_path / "idx")
    handler = _ann_ingest_batch_handler(spark, idx, str(tmp_path / "state"))
    handler(b[0], 0)
    epoch0 = {
        k: v for k, v in _files(idx).items() if "epoch=0" in k
    }
    assert epoch0
    handler(b[1], 1)
    after = _files(idx)
    assert {k: v for k, v in after.items() if "epoch=0" in k} == epoch0
    assert any("epoch=1" in k for k in after)


def test_compaction_collapses_epochs_and_preserves_serving(spark, tmp_path):
    """compact_ivfpq_epochs: every cell's epoch files collapse to one
    partition at the horizon, rowsets are unchanged, the layout still
    serves, and a later stream epoch appends cleanly on top."""
    b = _batches(spark)
    idx = str(tmp_path / "idx")
    handler = _ann_ingest_batch_handler(spark, idx, str(tmp_path / "state"))
    handler(b[0], 0)
    handler(b[1], 1)
    before = _codes_rowset(spark, idx)
    touched = S.compact_ivfpq_epochs(spark, idx)
    assert touched  # at least one cell held sub-horizon files
    assert _codes_rowset(spark, idx) == before
    # compacted cells hold exactly one epoch dir (=1, the horizon) and
    # one data file in it
    for lab in touched:
        cell = os.path.join(idx, f"assigned_label={lab}")
        eps = [p for p in os.listdir(cell) if p.startswith("epoch=")]
        assert eps == ["epoch=1"]
        files = [
            f for f in os.listdir(os.path.join(cell, eps[0]))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1
    assert not glob.glob(os.path.join(idx, ".old-*"))
    # a later epoch appends on top of the compacted layout
    handler(b[2], 2)
    assert len(_codes_rowset(spark, idx)) == len(before) + b[2].count()


def test_delete_path_preserves_epoch_partitioning(spark, tmp_path):
    """rewrite_ivfpq_cells on a STREAMED layout must keep the epoch
    partition level — a flat rewrite of one cell would give the layout
    mixed directory depths and break partition discovery."""
    b = _batches(spark)
    idx = str(tmp_path / "idx")
    handler = _ann_ingest_batch_handler(spark, idx, str(tmp_path / "state"))
    handler(b[0], 0)
    handler(b[1], 1)
    before = _codes_rowset(spark, idx)
    victims = [r[0] for r in before[:3]]
    drop = spark.createDataFrame([(v,) for v in victims], "vec_id long")
    touched = S.rewrite_ivfpq_cells(spark, idx, drop)
    assert touched
    after = _codes_rowset(spark, idx)  # discovery still works
    assert {r[0] for r in after} == {r[0] for r in before} - set(victims)
    # every rewritten cell still has only epoch= subdirs
    for lab in touched:
        cell = os.path.join(idx, f"assigned_label={lab}")
        assert all(p.startswith("epoch=") for p in os.listdir(cell))
