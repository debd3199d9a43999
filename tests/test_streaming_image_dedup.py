"""Streaming image near-dedup (VERDICT r8 item #8): the image lane's
decode→aHash→banded-join discipline inside foreachBatch, with
epoch-partitioned fingerprint state — cross-batch duplicate IMAGES drop
in-stream, converging to the batch ``image_dedup_clusters`` survivor
set, and an epoch replay re-admits instead of self-anti-joining."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.streaming.file_pipeline import (
    _image_dedup_batch_handler,
    ingest_image_deduplicated,
)

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

# planted image structure (operators.multimodal): doc_id % 8 == 5
# renders doc_id-5's image with a ~3%-pixel edit. Three micro-batches
# with CROSS-batch dup arrivals: 5 dups 0 (b1->b2), 13 dups 8 (b1->b3),
# 21 dups 16 (b2->b3).
B1 = [0, 1, 8]
B2 = [5, 9, 16]
B3 = [13, 21, 24]


def _rows(ids):
    return [(i, f"text {i}", "en", "s0", 7) for i in ids]


def _write_batch(path, ids, order: int):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = _rows(ids)
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(cols[0], pa.int64()),
                "text": pa.array(cols[1], pa.string()),
                "lang": pa.array(cols[2], pa.string()),
                "source": pa.array(cols[3], pa.string()),
                "n_chars": pa.array(cols[4], pa.int64()),
            }
        ),
        path,
    )
    t = os.path.getmtime(path) + 10 * order
    os.utime(path, (t, t))


def _landed(spark, out):
    return {
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    }


def test_stream_converges_to_batch_cluster_survivors(spark, tmp_path):
    from music_streaming_etl_glue_spark.operators.clusters import (
        image_dedup_clusters,
    )

    src = tmp_path / "in"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), B1, 0)
    _write_batch(str(src / "b2.parquet"), B2, 1)
    _write_batch(str(src / "b3.parquet"), B3, 2)
    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)

    ingest_image_deduplicated(
        spark, str(src), out, str(tmp_path / "ck"), state,
        files_per_trigger=1,
    )

    # batch ground truth: CC survivor set (min doc_id per cluster) over
    # the SAME corpus
    all_docs = spark.createDataFrame(_rows(B1 + B2 + B3), DOC_COLS)
    clusters = image_dedup_clusters(all_docs)
    survivors = {
        r.doc_id
        for r in clusters.filter(
            F.col("doc_id") == F.col("cluster_id")
        ).collect()
    }
    assert _landed(spark, out) == survivors
    # and the planted dups are exactly what got dropped
    assert set(B1 + B2 + B3) - survivors == {5, 13, 21}


def test_epoch_replay_readmits_landed_images(spark, tmp_path):
    """Replaying an epoch AFTER its fingerprint state committed (the
    foreachBatch retry) must converge to the same landed set — the
    cross-batch join excludes the epoch's own fp partition."""
    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)
    handler = _image_dedup_batch_handler(spark, out, state)

    b1 = spark.createDataFrame(_rows(B1), DOC_COLS)
    b2 = spark.createDataFrame(_rows(B2), DOC_COLS)
    handler(b1, 0)
    handler(b2, 1)
    before = _landed(spark, out)
    assert before == {0, 1, 8, 9, 16}  # 5 dropped as dup of 0

    handler(b2, 1)  # retry after fp state committed
    assert _landed(spark, out) == before
    handler(b1, 0)
    assert _landed(spark, out) == before


def test_audio_stream_converges_to_batch_cluster_survivors(spark, tmp_path):
    """Audio twin: cross-batch re-gained dup clips drop in-stream and
    the landed set equals the batch audio_dedup_clusters survivor set
    (the planted audio structure is doc_id % 8 == 6 replaying
    doc_id - 6's waveform)."""
    from music_streaming_etl_glue_spark.operators.clusters import (
        audio_dedup_clusters,
    )
    from music_streaming_etl_glue_spark.streaming.file_pipeline import (
        ingest_audio_deduplicated,
    )

    # planted audio dups: 6 dups 0 (b1->b2), 14 dups 8 (b1->b3)
    a1, a2, a3 = [0, 1, 8], [6, 9, 16], [14, 25, 33]
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), a1, 0)
    _write_batch(str(src / "b2.parquet"), a2, 1)
    _write_batch(str(src / "b3.parquet"), a3, 2)
    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)

    ingest_audio_deduplicated(
        spark, str(src), out, str(tmp_path / "ck"), state,
        files_per_trigger=1,
    )

    all_docs = spark.createDataFrame(_rows(a1 + a2 + a3), DOC_COLS)
    survivors = {
        r.doc_id
        for r in audio_dedup_clusters(all_docs)
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .collect()
    }
    assert _landed(spark, out) == survivors
    assert {6, 14} <= set(a1 + a2 + a3) - survivors


def test_audio_epoch_replay_readmits(spark, tmp_path):
    from music_streaming_etl_glue_spark.streaming.file_pipeline import (
        _audio_dedup_batch_handler,
    )

    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)
    handler = _audio_dedup_batch_handler(spark, out, state)
    b1 = spark.createDataFrame(_rows([0, 1, 8]), DOC_COLS)
    b2 = spark.createDataFrame(_rows([6, 9, 16]), DOC_COLS)
    handler(b1, 0)
    handler(b2, 1)
    before = _landed(spark, out)
    assert 6 not in before  # dup of 0 dropped cross-batch
    handler(b2, 1)
    assert _landed(spark, out) == before


def test_video_stream_converges_to_batch_cluster_survivors(spark, tmp_path):
    """Video twin: a re-cut re-upload (planted clip dup) arriving in a
    later batch drops in-stream; landed set equals the batch
    video_dedup_clusters survivor set."""
    from music_streaming_etl_glue_spark.operators.clusters import (
        video_dedup_clusters,
    )
    from music_streaming_etl_glue_spark.streaming.file_pipeline import (
        ingest_video_deduplicated,
    )

    # planted clip dups (doc_id % 8 == 5 replays doc_id-5's frame
    # keys): 5 dups 0 (b1->b2), 13 dups 8 (b1->b3), 21 dups 16 (b2->b3).
    # Docs 1 and 9 (% 8 == 1) carry the planted intro+outro boilerplate
    # cards (r10): with only two such clips in this corpus the cards
    # stay under the df cap, so 9 legitimately pairs with 1 (2 shared
    # frames) and drops cross-batch — in BOTH the batch ground truth
    # and the stream.
    v1, v2, v3 = [0, 1, 8], [5, 9, 16], [13, 21, 24]
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), v1, 0)
    _write_batch(str(src / "b2.parquet"), v2, 1)
    _write_batch(str(src / "b3.parquet"), v3, 2)
    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)

    ingest_video_deduplicated(
        spark, str(src), out, str(tmp_path / "ck"), state,
        files_per_trigger=1,
    )

    all_docs = spark.createDataFrame(_rows(v1 + v2 + v3), DOC_COLS)
    survivors = {
        r.doc_id
        for r in video_dedup_clusters(all_docs)
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .collect()
    }
    assert _landed(spark, out) == survivors
    assert set(v1 + v2 + v3) - survivors == {5, 9, 13, 21}


def test_video_epoch_replay_readmits(spark, tmp_path):
    from music_streaming_etl_glue_spark.streaming.file_pipeline import (
        _video_dedup_batch_handler,
    )

    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)
    handler = _video_dedup_batch_handler(spark, out, state)
    b1 = spark.createDataFrame(_rows([0, 1, 8]), DOC_COLS)
    b2 = spark.createDataFrame(_rows([5, 9, 16]), DOC_COLS)
    handler(b1, 0)
    handler(b2, 1)
    before = _landed(spark, out)
    assert 5 not in before  # shares both of clip 0's frames
    handler(b2, 1)
    assert _landed(spark, out) == before
    handler(b1, 0)
    assert _landed(spark, out) == before


def test_video_cross_batch_drop_is_per_pair(spark, tmp_path):
    """ADVICE r9 (medium): a probe clip sharing ONE frame each with TWO
    different landed clips must be ADMITTED — batch ``video_near_dups``
    counts shared frames per pair, and the old cross-batch form pooled
    the two singleton overlaps across the landed corpus into
    n_shared=2 and wrongly dropped it. A probe sharing two frames with
    a SINGLE landed clip still drops. Handcrafted hash sets via the
    injectable frame_hash_fn (the synth video corpus cannot express
    one-shared-frame overlaps between unrelated clips)."""
    from music_streaming_etl_glue_spark.streaming.file_pipeline import (
        _video_dedup_batch_handler,
    )

    HASHES = {
        1: [101, 11],       # landed clip L1
        2: [102, 12],       # landed clip L2
        3: [101, 102, 13],  # probe: 1 shared with EACH of L1/L2 -> ADMIT
        4: [101, 11, 14],   # probe: 2 shared with L1 alone -> DROP
    }

    def fake_hashes(docs):
        ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
        rows = [
            (d, i, h) for d in ids for i, h in enumerate(HASHES[d])
        ]
        return spark.createDataFrame(
            rows, "doc_id long, frame_idx int, fhash long"
        )

    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)
    handler = _video_dedup_batch_handler(
        spark, out, state, frame_hash_fn=fake_hashes
    )
    handler(spark.createDataFrame(_rows([1, 2]), DOC_COLS), 0)
    handler(spark.createDataFrame(_rows([3, 4]), DOC_COLS), 1)
    assert _landed(spark, out) == {1, 2, 3}
