"""Streaming ExactSubstr scrub (r11): batches arriving in corpus order
land BIT-IDENTICALLY to the batch exact_substring_dedup over the full
corpus — keep-first with corpus-wide horizon, replay-safe state."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import dedup as D
from music_streaming_etl_glue_spark.streaming.file_pipeline import (
    _substring_scrub_batch_handler,
    ingest_substring_scrubbed,
)

K = 4
DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

# corpus-ordered batches with planted cross-batch, within-batch and
# third-upload shared spans (vocab per family is disjoint so nothing
# collides by accident):
#  - doc 1's w-run reappears in doc 12 (cross-batch) and AGAIN in doc 21
#    (third upload — the state must remember RAW grams, not scrubbed)
#  - docs 10/11 share an r-run within one batch (later one scrubs)
#  - doc 22 repeats its own a-run intra-doc
TEXTS = {
    1: "w1 w2 w3 w4 w5 x1 x2 x3",
    2: "u1 u2 u3 u4 u5 u6 u7 u8",
    10: "r1 r2 r3 r4 r5 m1 m2 m3",
    11: "n1 n2 r1 r2 r3 r4 r5 n3",
    12: "y1 y2 w1 w2 w3 w4 w5 y3",
    20: "z1 z2 z3 z4 z5 z6 z7 z8",
    21: "q1 w1 w2 w3 w4 w5 q2 q3",
    22: "a1 a2 a3 a4 t1 a1 a2 a3 a4",
}
BATCHES = [[1, 2], [10, 11, 12], [20, 21, 22]]


def _rows(ids):
    return [(i, TEXTS[i], "en", "s0", len(TEXTS[i])) for i in ids]


def _write_batch(path, ids, order):
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
                "n_chars": pa.array([int(x) for x in cols[4]], pa.int64()),
            }
        ),
        path,
    )
    t = os.path.getmtime(path) + 10 * order
    os.utime(path, (t, t))


def _landed(spark, out):
    return {
        (r.doc_id, r.n_tokens, r.n_removed, r.clean_text)
        for r in spark.read.parquet(out)
        .select("doc_id", "n_tokens", "n_removed", "clean_text")
        .collect()
    }


def _batch_truth(spark):
    all_docs = spark.createDataFrame(
        _rows([i for b in BATCHES for i in b]), DOC_COLS
    )
    return {
        (r.doc_id, r.n_tokens, r.n_removed, r.clean_text)
        for r in D.exact_substring_dedup(all_docs, K).collect()
    }


def test_stream_converges_to_batch_exact_substring(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    for i, ids in enumerate(BATCHES):
        _write_batch(str(src / f"b{i}.parquet"), ids, i)
    out = str(tmp_path / "clean")
    ingest_substring_scrubbed(
        spark, str(src), out, str(tmp_path / "ck"), str(tmp_path / "state"),
        k=K, files_per_trigger=1,
    )
    landed = _landed(spark, out)
    assert landed == _batch_truth(spark)
    by_id = {t[0]: t for t in landed}
    # planted expectations hold: cross-batch scrub, third upload too
    assert by_id[12][3] == "y1 y2 y3"
    assert by_id[21][3] == "q1 q2 q3"
    assert by_id[11][3] == "n1 n2 n3"
    assert by_id[22][3] == "a1 a2 a3 a4 t1"
    assert by_id[1][2] == 0 and by_id[10][2] == 0


def test_epoch_replay_readmits(spark, tmp_path):
    """Retrying an epoch AFTER its gram state committed must scrub
    against the LANDED horizon only — the state read excludes the
    epoch's own partition, so nothing self-anti-joins."""
    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)
    handler = _substring_scrub_batch_handler(spark, out, state, k=K)
    b0 = spark.createDataFrame(_rows(BATCHES[0]), DOC_COLS)
    b1 = spark.createDataFrame(_rows(BATCHES[1]), DOC_COLS)
    handler(b0, 0)
    handler(b1, 1)
    before = _landed(spark, out)
    handler(b1, 1)  # retry after state committed
    assert _landed(spark, out) == before
    handler(b0, 0)  # replay of the FIRST epoch: nothing self-scrubs
    assert _landed(spark, out) == before
