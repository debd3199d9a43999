"""Streaming trending: watermarked sliding-window play counts.

Batch trending (``operators/kpis.py``) computes "max plays in any 24h
window" with a range frame over full history — unbounded state in a
stream. The streaming form is the standard re-expression: sliding
event-time windows (24h window, 1h slide) + a watermark bounding state and
admitting bounded late data. The reference has no streaming surface and
silently ignores late arrivals (SURVEY §2.9); the watermark makes that
contract explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.functions.numeric import exact_sum


def trending_windowed(
    events: DataFrame,
    window: str = "24 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per (sliding window, track): plays, listening time, unique users.

    Works on both a streaming frame (append mode after watermark close)
    and a batch frame (for parity testing) — same plan either way.
    """
    track = F.get_json_object("props", "$.k").cast("long").alias("track_id")
    base = events.select(
        F.col("ts"), track, F.col("user_id"), F.col("value").alias("listening_time")
    )
    if base.isStreaming:
        base = base.withWatermark("ts", watermark)
    return (
        base.groupBy(F.window("ts", window, slide).alias("win"), "track_id")
        .agg(
            F.count("track_id").alias("plays"),
            exact_sum("listening_time").alias("total_listening_time_minutes"),
            F.approx_count_distinct("user_id").alias("unique_listeners"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "track_id",
            "plays",
            "total_listening_time_minutes",
            "unique_listeners",
        )
    )


def trending_top_tracks(windowed: DataFrame) -> DataFrame:
    """Batch view over the windowed counts: max sliding-window plays per
    track — the streaming analogue of the batch trending KPI."""
    return windowed.groupBy("track_id").agg(
        F.max("plays").alias("plays_24h_max"),
        F.sum("plays").alias("window_plays_total"),
    )
