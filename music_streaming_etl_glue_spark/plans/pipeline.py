"""End-to-end batch pipeline: validate → enrich → KPIs → serve.

Replaces the reference's Airflow DAG + three Glue jobs
(``/root/reference/dags/music_streaming_pipeline.py``) with a plain Python
orchestration over lazy DataFrame plans. Key differences, all
deliberate (SURVEY §4):

* The enriched frame is **cached once** and fanned out to all KPI queries
  — the reference rebuilds the 3-way join for every KPI table and every
  logging ``count()`` (its single biggest waste).
* KPI outputs are written ``partitionBy(date)`` where a date key exists,
  so downstream reads get partition pruning; the reference writes flat
  directories.
* Fact writes append, dimension/KPI writes overwrite — same contract as
  the reference (``validate_data.py:316-318``).
* Serving-item shaping happens in the plan (no collect), and the KV write
  is the distributed ``foreachPartition`` sink.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from music_streaming_etl_glue_spark.operators import kpis as K
from music_streaming_etl_glue_spark.operators.enrich import enrich_events
from music_streaming_etl_glue_spark.operators.serving import serving_items
from music_streaming_etl_glue_spark.sources.catalog import load_table
from music_streaming_etl_glue_spark.sources.kv_sink import (
    write_kv,
    write_serving_parquet,
)


@dataclass
class PipelineResult:
    kpi_rows: dict[str, int]
    serving_rows: int
    output_dir: str


def run_batch_pipeline(
    spark: SparkSession,
    sf_dir: str,
    output_dir: str,
    batch_ts: str = "2026-01-01T00:00:00",
    kv_writer_factory: Callable[[], Callable[[list[dict[str, Any]]], None]]
    | None = None,
) -> PipelineResult:
    """Full run against a testdata directory; writes parquet KPI tables +
    the serving table (and optionally a KV backend) under ``output_dir``."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    enriched = enrich_events(events, customer, nation).cache()

    kpi_frames: dict[str, DataFrame] = {
        "user_kpis": K.user_kpis(enriched),
        "genre_daily_metrics": K.genre_daily_metrics(enriched),
        "genre_top_songs": K.genre_top_songs(enriched),
        "genre_top_genres": K.genre_top_genres(enriched),
        "trending_tracks": K.trending_tracks(enriched),
    }

    kpi_rows: dict[str, int] = {}
    for name, df in kpi_frames.items():
        path = os.path.join(output_dir, name)
        writer = df.write.mode("overwrite")
        if "date" in df.columns:
            writer = writer.partitionBy("date")
        writer.parquet(path)
        kpi_rows[name] = spark.read.parquet(path).count()

    items = serving_items(enriched, batch_ts)
    write_serving_parquet(items, os.path.join(output_dir, "serving_items"))
    serving_rows = spark.read.parquet(
        os.path.join(output_dir, "serving_items")
    ).count()
    if kv_writer_factory is not None:
        write_kv(items, kv_writer_factory)

    enriched.unpersist()
    return PipelineResult(
        kpi_rows=kpi_rows, serving_rows=serving_rows, output_dir=output_dir
    )
