"""Custom stateful streaming operator: state accumulates across
micro-batches and survives via the checkpoint."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.sources.catalog import load_table
from music_streaming_etl_glue_spark.streaming.file_pipeline import stream_events
from music_streaming_etl_glue_spark.streaming.stateful import running_user_totals
from tests.conftest import SF_SMOKE


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "b1.parquet")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "snapshots")

    def run_batch():
        q = (
            running_user_totals(stream_events(spark, str(src)))
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, epoch: df.withColumn("epoch", F.lit(epoch))
                .write.mode("append")
                .parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def latest_totals():
        snaps = spark.read.parquet(out)
        last = snaps.groupBy("user_id").agg(
            F.max_by("n_events_total", "epoch").alias("n")
        )
        return {r.user_id: r.n for r in last.collect()}

    run_batch()
    events = load_table(spark, SF_SMOKE, "events")
    expect = {
        r.user_id: r.n
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert latest_totals() == expect

    # second batch of the same events → per-user totals double: the state
    # store recovered from the checkpoint and kept accumulating
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "b2.parquet")
    run_batch()
    assert latest_totals() == {u: 2 * n for u, n in expect.items()}
