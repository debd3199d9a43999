"""The `lake` Python DataSource: snapshot batch reads + version-offset
streaming (change-feed) over the lakehouse commit log."""

from __future__ import annotations

from music_streaming_etl_glue_spark.plans import lakehouse as L
from music_streaming_etl_glue_spark.sources.lake_source import register


def _df(spark, ids):
    return spark.createDataFrame(
        [(i, f"r{i}") for i in ids], "id long, s string"
    )


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_batch_read_resolves_snapshots_and_versions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1, 2]), t)
    L.commit_append(_df(spark, [3]), t)
    register(spark)
    cur = spark.read.format("lake").option("table", t).load()
    assert _ids(cur) == [1, 2, 3]
    v1 = (
        spark.read.format("lake")
        .option("table", t)
        .option("version", 1)
        .load()
    )
    assert _ids(v1) == [1, 2]


def test_stream_reads_each_commit_exactly_once_across_restarts(
    spark, tmp_path
):
    t = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    L.commit_append(_df(spark, [1, 2]), t)
    L.commit_append(_df(spark, [3]), t)
    register(spark)

    seen: list[tuple[int, list[int]]] = []

    def run():
        def sink(batch_df, epoch_id):
            rows = _ids(batch_df)
            if rows:
                seen.append((epoch_id, rows))
                batch_df.write.mode("append").parquet(out)

        q = (
            spark.readStream.format("lake")
            .option("table", t)
            .load()
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination()

    run()
    assert _ids(spark.read.parquet(out)) == [1, 2, 3]

    # nothing new -> a restart emits no rows (offset is checkpointed)
    run()
    assert _ids(spark.read.parquet(out)) == [1, 2, 3]

    # a new commit lands -> only its delta streams
    L.commit_append(_df(spark, [4, 5]), t)
    run()
    assert _ids(spark.read.parquet(out)) == [1, 2, 3, 4, 5]
    assert all(set(rows) <= {1, 2, 3, 4, 5} for _, rows in seen)


def test_stream_refuses_rewrites_unless_opted_in(spark, tmp_path):
    import pytest

    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    L.commit_append(_df(spark, [1]), t)
    L.commit_overwrite(_df(spark, [9]), t)
    L.commit_append(_df(spark, [10]), t)
    register(spark)

    got: list[int] = []

    def run(skip):
        q = (
            spark.readStream.format("lake")
            .option("table", t)
            .option("skip_rewrites", skip)
            .load()
            .writeStream.trigger(availableNow=True)
            .option(
                "checkpointLocation", f"{ckpt}_{skip}"
            )
            .foreachBatch(lambda df, eid: got.extend(_ids(df)))
            .start()
        )
        q.awaitTermination()

    with pytest.raises(Exception, match="overwrite"):
        run("false")
    got.clear()
    run("true")  # appends-only change feed: 1 (v1 append) + 10 (v3 append)
    assert sorted(got) == [1, 10]


def test_lake_to_lake_pipeline_bronze_to_silver(spark, tmp_path):
    """The medallion composition: stream table A's change feed, transform,
    land each epoch as a snapshot commit in table B — both directions of
    the lake integration (source + sink) in one exactly-once pipeline."""
    from music_streaming_etl_glue_spark.streaming.file_pipeline import (
        _lake_epoch_committer,
    )

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    L.commit_append(_df(spark, [1, 2, 3, 4]), bronze)
    register(spark)

    def run():
        commit = _lake_epoch_committer(silver)

        def sink(batch_df, epoch_id):
            if batch_df.isEmpty():
                return
            commit(batch_df.filter("id % 2 = 0"), epoch_id)

        q = (
            spark.readStream.format("lake")
            .option("table", bronze)
            .load()
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination()

    run()
    assert _ids(L.read_snapshot(spark, silver)) == [2, 4]
    L.commit_append(_df(spark, [5, 6]), bronze)
    run()
    assert _ids(L.read_snapshot(spark, silver)) == [2, 4, 6]
    # silver's history is one snapshot per landed epoch
    assert [h["action"] for h in L.history(silver)] == ["append", "append"]


def test_stream_can_start_from_latest_on_a_vacuumed_table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    for i in range(3):
        L.commit_append(_df(spark, [i]), t)
    L.vacuum(t, keep_versions=1, min_age_s=0.0)  # v1-2 manifests gone
    register(spark)
    got: list[int] = []

    def run():
        q = (
            spark.readStream.format("lake")
            .option("table", t)
            .option("start_from", "latest")
            .load()
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, eid: got.extend(_ids(df)))
            .start()
        )
        q.awaitTermination()

    run()
    assert got == []  # latest: history before the start is not replayed
    L.commit_append(_df(spark, [7]), t)
    run()
    assert got == [7]  # only the post-start commit streams


def test_epoch_committer_auto_compacts_and_feed_skips_rewrites(
    spark, tmp_path
):
    from music_streaming_etl_glue_spark.streaming.file_pipeline import (
        _lake_epoch_committer,
    )

    t = str(tmp_path / "tbl")
    commit = _lake_epoch_committer(t, auto_compact_files=6, compact_target=2)
    for e in range(4):  # 4 epochs x 4-file batches -> crosses the bound
        commit(_df(spark, [10 * e + i for i in range(4)]).repartition(4), e)
    hist = L.history(t)
    assert "compact" in {h["action"] for h in hist}
    assert hist[-1]["n_files"] <= 6  # the bound holds after maintenance
    expect = sorted(10 * e + i for e in range(4) for i in range(4))
    assert _ids(L.read_snapshot(spark, t)) == expect
    # the downstream change feed still works in appends-only mode
    register(spark)
    got: list[int] = []
    q = (
        spark.readStream.format("lake")
        .option("table", t)
        .option("skip_rewrites", "true")
        .load()
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(lambda df, eid: got.extend(_ids(df)))
        .start()
    )
    q.awaitTermination()
    # every pre-compaction append that survives as an append-delta file
    # is emitted exactly once; nothing duplicates through the rewrite
    assert sorted(got) == sorted(set(got))
    assert set(got) <= set(expect)
