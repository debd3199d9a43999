"""Streaming Bloom-masked exact dedup (VERDICT r7 item #8): the
``dedup_incremental_bloom`` probe-mask discipline inside the
foreachBatch ingest, so late-arriving duplicate documents are dropped
with state bounded by the Bloom size — across micro-batches and with a
corpus-wide horizon (no watermark expiry)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators.dedup import BLOOM_BITS
from music_streaming_etl_glue_spark.streaming.file_pipeline import (
    DOCUMENTS_FILE_SCHEMA,
    ingest_bloom_deduplicated,
)


def _write_batch(spark, path, rows, order: int = 0):
    """One single-FILE parquet per micro-batch (the file source lists
    plain files, like the testdata landing zone — not Spark output
    directories). ``order`` sets a distinct mtime: the file source
    sequences micro-batches by modification time, and files written in
    the same millisecond tie — the stream would then ingest them in
    arbitrary order and a different first-occurrence winner would
    survive (a real property of racing ingest, but not what this test
    pins)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

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


def _doc(i, text):
    return (i, text, "en", "s0", len(text))


def test_bloom_stream_matches_batch_survivors(spark, tmp_path):
    """3 micro-batches with planted cross-batch (and within-batch) exact
    dups: the landed corpus must be exactly the first-occurrence
    survivor set — the same set batch exact dedup keeps — and the
    persisted filter must stay within its bits/64 row bound."""
    src = tmp_path / "in"
    src.mkdir()
    b1 = [_doc(0, "alpha beta gamma"), _doc(1, "delta epsilon zeta"),
          _doc(2, "eta theta iota")]
    # batch 2: one dup of b1 doc 0, one within-batch dup pair, one new
    b2 = [_doc(10, "alpha beta gamma"), _doc(11, "kappa lambda mu"),
          _doc(12, "kappa lambda mu"), _doc(13, "nu xi omicron")]
    # batch 3: dup of b1 doc 2, dup of b2's new doc, one new
    b3 = [_doc(20, "eta theta iota"), _doc(21, "nu xi omicron"),
          _doc(22, "pi rho sigma")]
    _write_batch(spark, str(src / "b1.parquet"), b1, order=0)
    _write_batch(spark, str(src / "b2.parquet"), b2, order=1)
    _write_batch(spark, str(src / "b3.parquet"), b3, order=2)

    out = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ck")
    state = str(tmp_path / "state")
    os.makedirs(state)
    ingest_bloom_deduplicated(
        spark, str(src), out, ckpt, state, files_per_trigger=1
    )

    landed = spark.read.parquet(out)
    got = {r["doc_id"] for r in landed.select("doc_id").collect()}
    # first occurrence per text across the whole stream
    all_rows = b1 + b2 + b3
    seen: dict[str, int] = {}
    for i, text, *_ in all_rows:
        seen.setdefault(text, i)
    assert got == set(seen.values())
    # landed corpus has one row per distinct text
    assert landed.select("text").distinct().count() == landed.count()
    # the epoch partitions reflect per-batch admissions
    assert landed.count() == len(seen)

    # state bound: the persisted filter is a word->bitmap relation with
    # at most bits/64 rows, regardless of corpus size
    bloom = spark.read.parquet(os.path.join(state, "bloom"))
    assert bloom.count() <= BLOOM_BITS // 64
    assert bloom.columns == ["word", "bitmap"]
    # and it is tiny on disk (single coalesced file)
    files = glob.glob(os.path.join(state, "bloom", "*.parquet"))
    assert len(files) == 1


def test_bloom_stream_incremental_rerun_and_late_dups(spark, tmp_path):
    """A later run (new files after the first query finished) must
    still drop duplicates of documents admitted in the FIRST run — the
    corpus-wide horizon dropDuplicatesWithinWatermark cannot give —
    and a rerun with no new files is a no-op."""
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(
        spark,
        str(src / "b1.parquet"),
        [_doc(0, "alpha beta"), _doc(1, "gamma delta")],
    )
    out, ckpt = str(tmp_path / "clean"), str(tmp_path / "ck")
    state = str(tmp_path / "state")
    os.makedirs(state)
    ingest_bloom_deduplicated(spark, str(src), out, ckpt, state)
    assert spark.read.parquet(out).count() == 2

    # no new files -> no new epochs, corpus unchanged
    ingest_bloom_deduplicated(spark, str(src), out, ckpt, state)
    assert spark.read.parquet(out).count() == 2

    # a LATE duplicate (hours/days later in wall-clock terms) of an
    # admitted doc plus one new doc
    _write_batch(
        spark,
        str(src / "b2.parquet"),
        [_doc(10, "alpha beta"), _doc(11, "epsilon zeta")],
    )
    ingest_bloom_deduplicated(spark, str(src), out, ckpt, state)
    landed = spark.read.parquet(out)
    assert landed.count() == 3
    assert {r["doc_id"] for r in landed.collect()} == {0, 1, 11}
