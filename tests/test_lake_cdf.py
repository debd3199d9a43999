"""Row-level change data feed over the commit log (plans.lake_cdf):
inserts from appends, RETRACTIONS from merge-on-read deletes, nothing
from metadata-only commits — and the self-check property that folding
the feed from version 0 reproduces the live snapshot exactly."""

from __future__ import annotations

import pytest

from music_streaming_etl_glue_spark.plans import lake_cdf as C
from music_streaming_etl_glue_spark.plans import lakehouse as L


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s string").coalesce(1)


def _rowset(df):
    return sorted((r["id"], r["s"]) for r in df.collect())


def _changes(df):
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["s"])
        for r in df.collect()
    )


def test_appends_emit_inserts_mor_emits_deletes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)      # v1
    L.commit_delete_mor(spark, t, "id", [1])                  # v2
    L.commit_append(_df(spark, [(1, "new"), (3, "c")]), t)    # v3
    got = _changes(C.snapshot_changes(spark, t, 0))
    assert got == [
        (1, "insert", 1, "a"),
        (1, "insert", 2, "b"),
        (2, "delete", 1, "a"),   # retracted AS IT WAS
        (3, "insert", 1, "new"),
        (3, "insert", 3, "c"),
    ]
    # a sub-range sees only its own commits
    assert _changes(C.snapshot_changes(spark, t, 2)) == [
        (3, "insert", 1, "new"),
        (3, "insert", 3, "c"),
    ]


def test_stacked_mor_deletes_never_re_retract(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    L.commit_delete_mor(spark, t, "id", [1, 2])  # v2
    L.commit_delete_mor(spark, t, "id", [2, 3])  # v3: 2 already hidden
    got = _changes(C.snapshot_changes(spark, t, 1))
    assert got == [
        (2, "delete", 1, "a"),
        (2, "delete", 2, "b"),
        (3, "delete", 3, "c"),  # NOT (3, 'delete', 2, 'b') again
    ]


def test_rewrite_manifests_emits_nothing(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(L, "MANIFEST_INLINE_LIMIT", 2)
    monkeypatch.setattr(L, "MANIFEST_GROUP_TARGET", 4)
    t = str(tmp_path / "tbl")
    for i in range(3):
        L.commit_append(_df(spark, [(i, f"r{i}")]), t)
    v_rw = L.rewrite_manifests(t)
    assert v_rw is not None
    got = C.snapshot_changes(spark, t, 3)  # only the rewrite in range
    assert got.count() == 0
    assert C.CHANGE_TYPE in got.columns  # schema present even when empty
    # the full feed still carries every append across the rewrite
    assert len(_changes(C.snapshot_changes(spark, t, 0))) == 3


def test_unrepresentable_actions_raise(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)
    L.compact(spark, t, target_files=1)
    with pytest.raises(ValueError, match="cannot represent"):
        C.snapshot_changes(spark, t, 1)
    # starting AFTER the compaction is fine
    L.commit_append(_df(spark, [(3, "c")]), t)
    assert _changes(C.snapshot_changes(spark, t, 2)) == [
        (3, "insert", 3, "c"),
    ]


def test_fold_reproduces_live_snapshot(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(i, f"r{i}") for i in range(8)]), t)
    L.commit_delete_mor(spark, t, "id", [2, 5])
    L.commit_append(_df(spark, [(2, "back"), (9, "nine")]), t)
    L.commit_delete_mor(spark, t, "id", [9, 7])
    changes = C.snapshot_changes(spark, t, 0)
    folded = C.fold_changes(changes, ["id"])
    assert _rowset(folded) == _rowset(L.read_snapshot(spark, t))


def test_fold_on_format2_table(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(L, "MANIFEST_INLINE_LIMIT", 2)
    monkeypatch.setattr(L, "MANIFEST_GROUP_TARGET", 2)
    t = str(tmp_path / "tbl")
    for lo in (0, 10, 20):
        L.commit_append(
            _df(spark, [(lo, f"r{lo}"), (lo + 1, f"r{lo+1}")]), t
        )
    L.commit_delete_mor(spark, t, "id", [10, 21])
    L.rewrite_manifests(t)
    L.commit_append(_df(spark, [(10, "back")]), t)
    changes = C.snapshot_changes(spark, t, 0)
    folded = C.fold_changes(changes, ["id"])
    assert _rowset(folded) == _rowset(L.read_snapshot(spark, t))


def test_cli_lake_changes_verb(spark, tmp_path, capsys):
    import json

    from music_streaming_etl_glue_spark.__main__ import main

    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)
    L.commit_delete_mor(spark, t, "id", [1])
    assert main(["lake", "--table", t, "changes"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {
        "from_version": 0, "to_version": 2, "inserts": 2, "deletes": 1,
    }
    assert main(
        ["lake", "--table", t, "changes", "--from-version", "1"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["inserts"] == 0 and out["deletes"] == 1


def test_streaming_change_feed_emits_inserts_and_retractions(
    spark, tmp_path
):
    """emit_changes=true streams the CDF: the same history that
    snapshot_changes describes arrives as micro-batches with
    _change_type/_commit_version — including retraction rows from MoR
    deletes — exactly once across restarts (offsets are versions)."""
    from music_streaming_etl_glue_spark.sources import lake_source

    lake_source.register(spark)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    L.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)   # v1
    L.commit_delete_mor(spark, t, "id", [1])               # v2

    collected = []

    def run():
        q = (
            spark.readStream.format("lake")
            .option("table", t)
            .option("emit_changes", "true")
            .load()
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, eid: collected.extend(
                    (r["_commit_version"], r["_change_type"], r["id"], r["s"])
                    for r in df.collect()
                )
            )
            .start()
        )
        q.awaitTermination()

    run()
    assert sorted(collected) == [
        (1, "insert", 1, "a"),
        (1, "insert", 2, "b"),
        (2, "delete", 1, "a"),
    ]
    # new commits after the checkpoint: only the delta arrives
    collected.clear()
    L.commit_append(_df(spark, [(1, "new")]), t)           # v3
    L.commit_delete_mor(spark, t, "id", [2])               # v4
    run()
    assert sorted(collected) == [
        (3, "insert", 1, "new"),
        (4, "delete", 2, "b"),
    ]
    # nothing new: an empty run, no replay
    collected.clear()
    run()
    assert collected == []


def test_streamed_feed_folds_to_snapshot(spark, tmp_path):
    """The r14 driver-gate shape (lake_cdf_stream_fold): stream the
    change feed (emit_changes + AvailableNow) into a parquet sink, fold
    it with fold_changes — the net state must equal the live snapshot,
    including across a second incremental run."""
    from music_streaming_etl_glue_spark.sources import lake_source

    lake_source.register(spark)
    t = str(tmp_path / "tbl")
    feed, ckpt = str(tmp_path / "feed"), str(tmp_path / "ckpt")
    L.commit_append(_df(spark, [(i, f"r{i}") for i in range(8)]), t)
    L.commit_delete_mor(spark, t, "id", [2, 5])
    L.commit_append(_df(spark, [(2, "back")]), t)

    def run():
        q = (
            spark.readStream.format("lake")
            .option("table", t)
            .option("emit_changes", "true")
            .load()
            .writeStream.trigger(availableNow=True)
            .format("parquet")
            .option("path", feed)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    run()
    folded = C.fold_changes(spark.read.parquet(feed), ["id"])
    assert _rowset(folded) == _rowset(L.read_snapshot(spark, t))
    # more history lands; the resumed stream appends only the delta and
    # the fold still reproduces the (new) snapshot
    L.commit_delete_mor(spark, t, "id", [7])
    L.commit_append(_df(spark, [(11, "k")]), t)
    run()
    folded = C.fold_changes(spark.read.parquet(feed), ["id"])
    assert _rowset(folded) == _rowset(L.read_snapshot(spark, t))


def test_streaming_change_feed_raises_on_rewrite(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from music_streaming_etl_glue_spark.sources import lake_source

    lake_source.register(spark)
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)
    L.compact(spark, t, target_files=1)
    q = (
        spark.readStream.format("lake")
        .option("table", t)
        .option("emit_changes", "true")
        .load()
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda df, eid: df.collect())
        .start()
    )
    with pytest.raises(StreamingQueryException, match="not representable"):
        q.awaitTermination()
