"""Pins for the four ADVICE r13 findings:

1. (medium) a BATCH read with emit_changes=true used to return a plain
   snapshot with all-NULL _change_type/_commit_version in non-nullable
   fields; it now refuses with a pointer at readStream / lake_cdf.
2. (low) snapshot_changes on a never-committed table surfaced a raw
   manifest FileNotFoundError via max(to_v, 1); it now raises the same
   "no committed snapshot" shape read_snapshot uses.
3. (low) commit_delete_mor's docstring claimed z-order refuses while
   MoR deletes are outstanding; the actual (safe) contract is that
   compact AND compact_zordered read through the deletes and clear
   them — pinned here by behavior.
4. (low) commit_upsert eagerly localCheckpoint()ed every batch,
   pinning it in executor block storage until GC; it now persists for
   the span of the merge and FREES the blocks at exit.
"""

from __future__ import annotations

import pytest

from music_streaming_etl_glue_spark.plans import lake_cdf as C
from music_streaming_etl_glue_spark.plans import lakehouse as L


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s string").coalesce(1)


def _rowset(df):
    return sorted((r["id"], r["s"]) for r in df.collect())


def test_batch_read_with_emit_changes_refuses(spark, tmp_path):
    from music_streaming_etl_glue_spark.sources import lake_source

    lake_source.register(spark)
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a")]), t)
    df = (
        spark.read.format("lake")
        .option("table", t)
        .option("emit_changes", "true")
        .load()
    )
    # the Python DataSource surfaces reader() errors at plan/execute
    # time wrapped by the JVM bridge — match on the message
    with pytest.raises(Exception, match="streaming option"):
        df.collect()
    # plain batch read unaffected
    got = spark.read.format("lake").option("table", t).load()
    assert _rowset(got) == [(1, "a")]


def test_snapshot_changes_on_empty_table_raises_cleanly(spark, tmp_path):
    t = str(tmp_path / "never-committed")
    with pytest.raises(FileNotFoundError, match="no committed snapshot"):
        C.snapshot_changes(spark, t, 0)


def test_snapshot_changes_explicit_empty_range_is_empty_feed(
    spark, tmp_path
):
    """to_version=0 on a COMMITTED table is the empty range (0, 0] — a
    cursoring consumer's first no-op poll — not a missing-table error."""
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a")]), t)
    got = C.snapshot_changes(spark, t, 0, to_version=0)
    assert got.count() == 0
    assert C.CHANGE_TYPE in got.columns and "id" in got.columns


def test_compact_zordered_materializes_outstanding_mor_deletes(
    spark, tmp_path
):
    t = str(tmp_path / "tbl")
    L.commit_append(
        _df(spark, [(i, f"r{i}") for i in range(8)]), t
    )
    L.commit_delete_mor(spark, t, "id", [2, 5])
    v = L.compact_zordered(spark, t, ["id"], target_files=1)
    man = L._load_manifest(t, v, resolve=False)
    # deletes cleared, exact row count, deleted keys gone from the data
    assert "deletes" not in man and man["n_rows"] == 6
    assert sorted(
        r["id"] for r in L.read_snapshot(spark, t, v).collect()
    ) == [0, 1, 3, 4, 6, 7]
    # cleared: a CoW rewrite is allowed again
    L.commit_delete(spark, t, "id", [0])
    assert sorted(
        r["id"] for r in L.read_snapshot(spark, t).collect()
    ) == [1, 3, 4, 6, 7]


def test_commit_upsert_frees_its_persisted_blocks(spark, tmp_path):
    import os

    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)
    L.commit_upsert(_df(spark, [(2, "up"), (3, "new")]), t, keys=["id"])
    assert _rowset(L.read_snapshot(spark, t)) == [
        (1, "a"), (2, "up"), (3, "new"),
    ]
    # the updates batch is pinned ON DISK (txn-dir staging), never in
    # executor block storage (the old eager localCheckpoint held it
    # until the DataFrame was GC'd) — and the staging dir is removed
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after <= before
    data_root = os.path.join(t, "data")
    for txn in os.listdir(data_root):
        names = os.listdir(os.path.join(data_root, txn))
        assert not any("upsert-updates" in n for n in names)


def test_commit_upsert_empty_batch_still_works(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a")]), t)
    L.commit_upsert(
        spark.createDataFrame([], "id long, s string"), t, keys=["id"]
    )
    assert _rowset(L.read_snapshot(spark, t)) == [(1, "a")]
