"""Streaming SEMANTIC near-dedup (r10): the embedding tier of the
dedup ladder in streaming form — a reworded/token-reordered re-upload
of a landed document drops in-stream via the banded sign-LSH + exact
cosine discipline of batch ``text_semantic_pairs``, with
epoch-partitioned vector state and replay-safe epoch exclusion."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.streaming.file_pipeline import (
    _semantic_dedup_batch_handler,
    ingest_semantic_deduplicated,
)

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

# Three semantic families + unrelated singletons (disjoint vocabularies
# so unrelated cosines sit near 0 after centering):
#  - 1 / 11 / 21: identical text, then a pure token REORDER of it (the
#    hashed bag-of-words vector is order-invariant → cosine exactly 1;
#    the normalized-fingerprint streaming tier would also catch the
#    reorder, but NOT a near-paraphrase — which LSH+cosine handles the
#    same way, just at <1 similarity)
#  - 2 / 12: identical other text
TEXTS = {
    1: "alpha beta gamma delta epsilon zeta eta theta",
    11: "alpha beta gamma delta epsilon zeta eta theta",
    21: "theta eta zeta epsilon delta gamma beta alpha",
    2: "one two three four five six seven eight nine",
    12: "one two three four five six seven eight nine",
    3: "lorem ipsum dolor sit amet consectetur",
    4: "spark catalyst tungsten arrow parquet shuffle",
    5: "oak maple birch cedar spruce willow",
    6: "crimson azure emerald amber violet indigo",
}


def _rows(ids):
    return [(i, TEXTS[i], "en", "s0", len(TEXTS[i])) for i in ids]


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


B1 = [1, 2, 3]
B2 = [11, 4, 12]  # 11 dups 1, 12 dups 2 — both cross-batch
B3 = [21, 5, 6]   # 21 reorders 1 — cross-batch vs a doc landed 2 epochs ago


def test_semantic_stream_converges_to_batch_cc_survivors(spark, tmp_path):
    from music_streaming_etl_glue_spark.operators.clusters import (
        connected_components_two_phase,
    )
    from music_streaming_etl_glue_spark.operators.text import (
        text_semantic_pairs,
    )

    src = tmp_path / "in"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), B1, 0)
    _write_batch(str(src / "b2.parquet"), B2, 1)
    _write_batch(str(src / "b3.parquet"), B3, 2)
    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)

    ingest_semantic_deduplicated(
        spark, str(src), out, str(tmp_path / "ck"), state,
        files_per_trigger=1,
    )

    # batch ground truth: CC survivor set over text_semantic_pairs
    # edges of the SAME corpus (corpus-mean centering; the fixture's
    # pairs sit at cosine 1.0 or near 0, so horizon-vs-corpus mean
    # cannot flip any edge)
    all_docs = spark.createDataFrame(_rows(B1 + B2 + B3), DOC_COLS)
    edges = text_semantic_pairs(all_docs).select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    )
    vertices = all_docs.select(F.col("doc_id").alias("id"))
    comp = connected_components_two_phase(vertices, edges)
    survivors = {
        r.id
        for r in comp.filter(F.col("id") == F.col("cluster_id")).collect()
    }
    assert _landed(spark, out) == survivors
    # and the planted semantic dups are exactly what dropped
    assert set(B1 + B2 + B3) - survivors == {11, 12, 21}


def test_semantic_epoch_replay_readmits(spark, tmp_path):
    """Replaying an epoch AFTER its vector state committed (the
    foreachBatch retry) must converge to the same landed set — the
    union read excludes the epoch's own state partition."""
    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)
    handler = _semantic_dedup_batch_handler(spark, out, state)
    b1 = spark.createDataFrame(_rows(B1), DOC_COLS)
    b2 = spark.createDataFrame(_rows(B2), DOC_COLS)
    handler(b1, 0)
    handler(b2, 1)
    before = _landed(spark, out)
    assert before == {1, 2, 3, 4}  # 11, 12 dropped against landed 1, 2
    handler(b2, 1)  # retry after vector state committed
    assert _landed(spark, out) == before
    handler(b1, 0)
    assert _landed(spark, out) == before


def test_landed_bucket_state_is_never_rewritten_without_repin(
    spark, tmp_path
):
    """The scale contract: later epochs must NOT re-center/re-sign the
    landed corpus — epoch 0's bucket and vector partitions stay
    byte-identical while epoch 1 only adds its own partitions."""
    import glob
    import hashlib

    def _files(path):
        out = {}
        for f in glob.glob(os.path.join(path, "**", "*"), recursive=True):
            if os.path.isfile(f) and not f.endswith(".crc"):
                with open(f, "rb") as fh:
                    out[os.path.relpath(f, path)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
        return out

    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)
    handler = _semantic_dedup_batch_handler(
        spark, out, state, max_mean_sq_drift=1e18
    )
    handler(spark.createDataFrame(_rows(B1), DOC_COLS), 0)
    bkt0 = _files(os.path.join(state, "buckets", "epoch=0"))
    mean0 = _files(os.path.join(state, "mean"))
    assert bkt0 and mean0
    handler(spark.createDataFrame(_rows(B2), DOC_COLS), 1)
    assert _files(os.path.join(state, "buckets", "epoch=0")) == bkt0
    assert _files(os.path.join(state, "mean")) == mean0, (
        "no re-pin under an infinite drift gate"
    )
    assert os.path.exists(os.path.join(state, "buckets", "epoch=1"))


def test_drift_gate_repins_and_rebuilds_buckets(spark, tmp_path):
    """A zero drift budget trips the gate on every mean movement: the
    pinned mean is rewritten and the landed bucket state rebuilds under
    it — and the dedup answer stays the same as the un-gated run."""
    import glob

    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)
    handler = _semantic_dedup_batch_handler(
        spark, out, state, max_mean_sq_drift=0.0
    )
    handler(spark.createDataFrame(_rows(B1), DOC_COLS), 0)
    mean0 = sorted(
        r.m for r in spark.read.parquet(
            os.path.join(state, "mean")
        ).collect()
    )
    handler(spark.createDataFrame(_rows(B2), DOC_COLS), 1)
    mean1 = sorted(
        r.m for r in spark.read.parquet(
            os.path.join(state, "mean")
        ).collect()
    )
    assert mean1 != mean0, "the gate must re-pin on drift"
    assert not glob.glob(os.path.join(state, ".old-*")), "no swap debris"
    assert _landed(spark, out) == {1, 2, 3, 4}


def test_mean_swap_heals_after_hard_crash(spark, tmp_path):
    """Kill window between park and rename-in: the live mean dir is
    missing, the old artifact parked. The next batch must restore it
    before gating (the rewrite_ivfpq_cells heal discipline on state
    dirs)."""
    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)
    handler = _semantic_dedup_batch_handler(
        spark, out, state, max_mean_sq_drift=1e18
    )
    handler(spark.createDataFrame(_rows(B1), DOC_COLS), 0)
    mean_dir = os.path.join(state, "mean")
    os.rename(mean_dir, os.path.join(state, ".old-mean-123"))
    handler(spark.createDataFrame(_rows(B2), DOC_COLS), 1)
    assert os.path.exists(mean_dir)
    assert _landed(spark, out) == {1, 2, 3, 4}


def _bucket_rowset(df):
    return sorted(
        (r.vec_id, r.band, r.band_hash)
        for r in df.select("vec_id", "band", "band_hash").collect()
    )


def test_repin_crash_between_swaps_heals_on_rerun(
    spark, tmp_path, monkeypatch
):
    """Kill window BETWEEN the drift re-pin's two artifact swaps, then
    re-run the epoch (the driver retry). The pin swap must be the
    COMMIT POINT — buckets first, pin last — so the crash leaves drift
    high and the retry redoes the re-sign. Under the reverse order
    (pin first) the retry reads drift≈0 against stale signatures and
    the landed bucket state stays signed under the dead mean forever:
    the consistency assertion below fails."""
    import pytest

    import music_streaming_etl_glue_spark.streaming.file_pipeline as fp
    from music_streaming_etl_glue_spark.operators.similarity import (
        LSH_BANDS,
        LSH_BITS,
        lsh_band_buckets,
    )

    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)
    handler = fp._semantic_dedup_batch_handler(
        spark, out, state, max_mean_sq_drift=0.0
    )
    handler(spark.createDataFrame(_rows(B1), DOC_COLS), 0)

    real = fp._swap_in_dir

    def crash_after_first_swap(live, build_fn):
        real(live, build_fn)
        raise RuntimeError("injected crash between re-pin swaps")

    monkeypatch.setattr(fp, "_swap_in_dir", crash_after_first_swap)
    b2 = spark.createDataFrame(_rows(B2), DOC_COLS)
    with pytest.raises(RuntimeError, match="injected crash"):
        handler(b2, 1)  # budget 0 → drift gate trips, dies mid-re-pin
    monkeypatch.setattr(fp, "_swap_in_dir", real)

    handler(b2, 1)  # the driver retry of the same epoch

    # invariant: every persisted landed signature is signed under the
    # LIVE pin — recompute the bucket relation from the vector state
    # and the pinned mean and demand exact agreement
    mu = {
        r.d: r.m
        for r in spark.read.parquet(os.path.join(state, "mean")).collect()
    }
    mean_lit = F.array(*[F.lit(mu[d]) for d in sorted(mu)])
    vecs = spark.read.parquet(os.path.join(state, "vecs")).select(
        "vec_id",
        F.zip_with(
            F.col("embedding"), mean_lit, lambda a, b: a - b
        ).alias("embedding"),
    )
    expected = lsh_band_buckets(vecs, LSH_BANDS, LSH_BITS)
    persisted = spark.read.parquet(os.path.join(state, "buckets"))
    assert _bucket_rowset(persisted) == _bucket_rowset(expected), (
        "landed bucket state signed under a mean other than the pin"
    )
    # and the stream still lands the right survivor set
    assert _landed(spark, out) == {1, 2, 3, 4}


def test_orphaned_build_dirs_are_swept(spark, tmp_path):
    """A crash during _swap_in_dir's build_fn leaves a
    ``<live>.build-<ns>`` temp dir; the next epoch's heal pass must
    sweep it (ADVICE r10) instead of accumulating debris forever."""
    out = str(tmp_path / "clean")
    state = str(tmp_path / "state")
    os.makedirs(state)
    handler = _semantic_dedup_batch_handler(
        spark, out, state, max_mean_sq_drift=1e18
    )
    handler(spark.createDataFrame(_rows(B1), DOC_COLS), 0)
    orphan = os.path.join(state, "mean.build-4242")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-junk"), "w") as f:
        f.write("debris")
    handler(spark.createDataFrame(_rows(B2), DOC_COLS), 1)
    assert not os.path.exists(orphan)
    assert _landed(spark, out) == {1, 2, 3, 4}
