"""Streaming KPI → serving pipeline: partial-aggregate landing +
compaction must reproduce the batch KPI numbers exactly, and reruns must
not double-count."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators.enrich import enrich_events
from music_streaming_etl_glue_spark.sources.catalog import load_table
from music_streaming_etl_glue_spark.streaming.serving_pipeline import (
    compact_serving,
    stream_kpis_available_now,
)
from tests.conftest import SF_SMOKE


def _batch_expected(spark):
    enriched = enrich_events(
        load_table(spark, SF_SMOKE, "events"),
        load_table(spark, SF_SMOKE, "customer"),
        load_table(spark, SF_SMOKE, "nation"),
    )
    return (
        enriched.groupBy(
            "track_genre", F.col("timestamp").cast("date").alias("date")
        )
        .agg(
            F.count("*").alias("plays"),
            F.sum(F.col("listening_time").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_listening_time"),
        )
    )


def test_streamed_partials_compact_to_batch_kpis(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "b1.parquet")
    partials = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")
    customer = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")

    assert (
        stream_kpis_available_now(
            spark, str(src), customer, nation, partials, ckpt
        )
        >= 1
    )
    got = compact_serving(spark, partials)
    expected = _batch_expected(spark)
    assert got.count() == expected.count()
    diff = got.join(
        expected, ["track_genre", "date", "plays", "total_listening_time"]
    )
    assert diff.count() == expected.count()

    # rerun with nothing new: checkpoint skips everything, numbers hold
    assert (
        stream_kpis_available_now(
            spark, str(src), customer, nation, partials, ckpt
        )
        == 0
    )
    assert compact_serving(spark, partials).count() == expected.count()
