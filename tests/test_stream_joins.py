"""Stream-stream recovery join vs its batch twin."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators.asof import (
    error_recovery_clicks,
)
from music_streaming_etl_glue_spark.sources.catalog import load_table
from music_streaming_etl_glue_spark.streaming.file_pipeline import (
    stream_events,
)
from music_streaming_etl_glue_spark.streaming.joins import (
    split_event_streams,
    stream_error_recovery,
    stream_error_recovery_outer,
)
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple(str(x) for x in t),
    )


def _run_available_now(joined, out_dir, ckpt_dir):
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


def test_stream_inner_recovery_matches_batch(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "events.parquet")

    errors, clicks = split_event_streams(stream_events(spark, str(src)))
    out = str(tmp_path / "out")
    _run_available_now(
        stream_error_recovery(errors, clicks), out, str(tmp_path / "ckpt")
    )

    streamed = spark.read.parquet(out)
    batch = error_recovery_clicks(load_table(spark, SF_SMOKE, "events"))
    # inner-join rows are emitted on match (the watermark only bounds
    # state), so one availableNow replay reproduces the batch join exactly
    assert _rows(streamed) == _rows(batch)
    assert streamed.count() > 0


def test_stream_outer_recovery_nulls_are_proven(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    # two files split on the median ts -> at least two micro-batches
    # (maxFilesPerTrigger=16 but distinct files commit watermark steps),
    # so the final watermark advances past the early errors' windows
    ev = load_table(spark, SF_SMOKE, "events")
    n = ev.count()
    ts_mid = ev.orderBy("ts").limit(n // 2).agg(F.max("ts")).first()[0]
    for name, half in (
        ("half1", ev.filter(F.col("ts") <= F.lit(ts_mid))),
        ("half2", ev.filter(F.col("ts") > F.lit(ts_mid))),
    ):
        staged = tmp_path / f"stage_{name}"
        half.coalesce(1).write.parquet(str(staged))
        part = next(staged.glob("part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    stream = stream_events(spark, str(src)).repartition(4)
    errors, clicks = split_event_streams(stream)
    out = str(tmp_path / "out")
    _run_available_now(
        stream_error_recovery_outer(errors, clicks),
        out,
        str(tmp_path / "ckpt"),
    )

    streamed = spark.read.parquet(out)
    matched = streamed.filter(F.col("click_ts").isNotNull())
    nulls = streamed.filter(F.col("click_ts").isNull())

    batch = error_recovery_clicks(ev)
    # matched rows are exactly the inner join
    assert _rows(matched) == _rows(batch)
    # every emitted null is a genuinely unmatched error (no false nulls —
    # the watermark must prove the window closed before emitting)
    batch_matched_ids = {r.event_id for r in batch.select("event_id").collect()}
    null_ids = {r.event_id for r in nulls.select("event_id").collect()}
    assert not (null_ids & batch_matched_ids)
