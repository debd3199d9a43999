"""Streaming KPI → serving pipeline: the Structured-Streaming twin of the
batch ``run_batch_pipeline`` serving step (reference cadence: recompute
KPIs, load the serving store — ``scripts/compute_kpis.py`` +
``scripts/load_dynamodb.py`` — on a schedule).

Design: micro-batches land RE-AGGREGABLE partial aggregates (count / sum
— the merge-safe half of the KPI surface) into epoch-partitioned parquet;
a compaction re-aggregates the partials into the serving frame. This is
the standard streaming-warehouse split:

* **Exactly-once** comes from the file-source checkpoint (no file is
  processed twice across runs) plus epoch-partitioned OVERWRITE writes (a
  replayed epoch rewrites its own partition rather than appending a
  duplicate) — the same contract the ingestion pipeline proves in
  test_streaming.
* **Mergeability** is why the partials carry plays + listening-time sums
  and NOT distinct-user counts: COUNT(DISTINCT) does not compose across
  epochs. The streaming path's distinct-user story is the HLL sketch
  (``genre_daily_metrics_approx``) or the stateful operator
  (``streaming/stateful.py``); the exact number stays a batch concern.
* The stream enriches against STATIC dims via a broadcast stream-static
  join — dims are re-read per micro-batch, so a dim change is picked up
  at the next trigger without restarting the query.

At 100 TB/day this shape holds: partials are tiny (one row per
genre × day × epoch), compaction reads partials only (never raw events),
and the serving write stays partition-pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators.enrich import enrich_events
from music_streaming_etl_glue_spark.streaming.file_pipeline import (
    stream_events,
)


def _partial_kpis(enriched: DataFrame) -> DataFrame:
    """Per (genre, day) merge-safe partials for one micro-batch."""
    return enriched.groupBy(
        F.col("track_genre"),
        F.col("timestamp").cast("date").alias("date"),
    ).agg(
        F.count("*").alias("plays"),
        F.sum(F.col("listening_time").cast("decimal(28,6)")).alias(
            "listening_dec"
        ),
    )


def stream_kpis_available_now(
    spark: SparkSession,
    input_dir: str,
    customer: DataFrame,
    nation: DataFrame,
    partials_dir: str,
    checkpoint_dir: str,
) -> int:
    """Process every new fact file once: enrich the micro-batch against
    the static dims and land its per-(genre, day) partial aggregates under
    ``epoch=N`` (overwrite → replay-safe). Returns micro-batch count."""
    stream = stream_events(spark, input_dir)
    batches = 0

    def land_partials(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal batches
        batches += 1
        enriched = enrich_events(batch_df, customer, nation)
        _partial_kpis(enriched).write.mode("overwrite").parquet(
            f"{partials_dir}/epoch={epoch_id}"
        )

    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(land_partials)
        .start()
    )
    q.awaitTermination()
    return batches


def compact_serving(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Merge all landed partials into the serving frame: one re-aggregate
    over (genre, day) — decimal sums compose exactly, so the result equals
    the batch KPI regardless of how the epochs split the data.

    A run that never saw a fact file lands no partials (the directory may
    not exist at all) — that compacts to an EMPTY serving frame, not a
    read error."""
    import os

    if not os.path.exists(partials_dir):
        return spark.createDataFrame(
            [],
            "track_genre string, date date, plays bigint,"
            " total_listening_time double",
        )
    partials = spark.read.parquet(partials_dir)
    return (
        partials.groupBy("track_genre", "date")
        .agg(
            F.sum("plays").alias("plays"),
            F.sum("listening_dec").cast("double").alias(
                "total_listening_time"
            ),
        )
    )
