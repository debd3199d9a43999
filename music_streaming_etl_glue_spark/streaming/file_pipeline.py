"""Checkpointed incremental file ingestion.

The reference discovers new fact files by diffing an S3 listing against a
JSON ledger it maintains by hand
(``/root/reference/dags/music_streaming_pipeline.py:302-350, 433-482``).
Structured Streaming's file source + checkpoint gives the same
exactly-once file tracking natively; ``Trigger.AvailableNow`` turns it
into a batch-increment run (process everything new, then stop) — the same
cadence as the reference's scheduled DAG, minus the bookkeeping code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Parquet-on-disk schema of the events table (ts is TIMESTAMP(NANOS),
#: read as long nanoseconds — see sources/catalog.py).
EVENTS_FILE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of listen events (nanos → timestamp applied)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def ingest_deduplicated(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    key: str = "event_id",
    watermark: str = "1 hour",
) -> None:
    """Batch-increment ingestion with streaming deduplication on ``key``:
    replayed/duplicated events are dropped across micro-batches, with the
    watermark bounding dedup state (the reference has no duplicate
    handling at all — replayed files double-count)."""
    stream = (
        stream_events(spark, input_dir)
        .withWatermark("ts", watermark)
        .dropDuplicates([key])
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda df, epoch: df.write.mode("append").parquet(output_dir)
        )
        .start()
    )
    q.awaitTermination()


def ingest_available_now(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str
) -> int:
    """One batch-increment run: append every not-yet-processed file to the
    validated parquet fact table, exactly once, then stop.

    Returns the number of micro-batches executed (0 → nothing new)."""
    stream = stream_events(spark, input_dir)
    batches = 0

    def count_batches(df: DataFrame, epoch_id: int) -> None:
        nonlocal batches
        batches += 1
        df.write.mode("append").parquet(output_dir)

    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(count_batches)
        .start()
    )
    q.awaitTermination()
    return batches
