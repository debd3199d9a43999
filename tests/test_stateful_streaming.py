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


def test_streaming_session_windows_match_batch(spark, tmp_path):
    """Closed sessions emitted by the streaming session_window aggregation
    must equal the batch user_session_windows rows for the same events.
    Later files advance the watermark, which finalizes + emits the earlier
    sessions (append mode emits exactly once, on finalization)."""
    from music_streaming_etl_glue_spark.operators.analytics import (
        user_session_windows,
    )
    from music_streaming_etl_glue_spark.streaming.stateful import (
        streaming_user_sessions,
    )

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "b1.parquet")
    ckpt = str(tmp_path / "ck_sess")
    out = str(tmp_path / "sessions")

    def run_batch():
        q = (
            streaming_user_sessions(stream_events(spark, str(src)))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, epoch: df.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_batch()  # batch 1: watermark still at epoch start, nothing final

    # Push the watermark far past every b1 session with later-ts files.
    # The file-stream source lists the input dir NON-recursively, so each
    # pushed file must be a plain part file, not a Spark-written directory.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    year_ns = 365 * 86_400 * 1_000_000_000
    # ts is long nanos for TIMESTAMP(NANOS) testdata, a timestamp for
    # TIMESTAMP(MICROS) testdata — shift in the file's own domain so the
    # pushed file keeps the source layout
    from pyspark.sql import types as T

    ts_is_long = isinstance(raw.schema["ts"].dataType, T.LongType)

    def _shift(years: int) -> F.Column:
        if ts_is_long:
            return F.col("ts") + F.lit(years * year_ns)
        return F.col("ts") + F.expr(f"INTERVAL {years * 365} DAYS")

    def push_file(name: str, years: int) -> None:
        staged = tmp_path / f"stage_{name}"
        raw.withColumn("ts", _shift(years)).limit(
            50
        ).coalesce(1).write.parquet(str(staged))
        part = next(staged.glob("part-*.parquet"))
        shutil.copy(part, src / name)

    push_file("b2.parquet", 1)
    run_batch()  # batch 2: processes b2, watermark advances past b1
    push_file("b3.parquet", 2)
    run_batch()  # batch 3: emits every finalized b1 session

    import datetime as dt

    emitted = spark.read.parquet(out).filter(
        F.col("session_start") < dt.datetime(2024, 6, 1)  # b1 sessions only
    )
    expected = user_session_windows(load_table(spark, SF_SMOKE, "events"))
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in emitted.collect()
    }
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in expected.collect()
    }
    assert got == want  # every batch session emitted exactly once, no extras


def test_tws_totals_match_legacy_state_api(spark, tmp_path):
    """transformWithStateInPandas (typed state store) and
    applyInPandasWithState (legacy tuple state) must produce identical
    running totals for the same input — the migration contract.

    The TWS state-server protocol needs google.protobuf in the Python
    workers; skip where the container lacks it (the operator itself is
    plain Spark 4 API and runs on any standard cluster)."""
    import shutil as _sh

    import pytest

    pytest.importorskip("google.protobuf.descriptor")

    from music_streaming_etl_glue_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    src = tmp_path / "in_tws"
    src.mkdir()
    _sh.copy(f"{SF_SMOKE}/events.parquet", src / "b1.parquet")
    out = str(tmp_path / "tws_out")
    q = (
        running_user_totals_tws(stream_events(spark, str(src)))
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "tws_ck"))
        .foreachBatch(
            lambda df, epoch: df.write.mode("append").parquet(out)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.n_events_total, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    events = load_table(spark, SF_SMOKE, "events")
    expect = {
        (r.user_id, r.n, round(r.t, 2))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == expect
