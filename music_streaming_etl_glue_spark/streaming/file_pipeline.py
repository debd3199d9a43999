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
from pyspark.sql import types as T

from music_streaming_etl_glue_spark.sources.catalog import convert_nanos_ts

def _events_file_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


#: Declared schema for events files whose ``ts`` is parquet
#: TIMESTAMP(NANOS) — surfaced as long nanoseconds under ``nanosAsLong``
#: (see sources/catalog.py). Kept for callers with known-nanos inputs.
EVENTS_FILE_SCHEMA = _events_file_schema(T.LongType())


def stream_events(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of listen events.

    A stream needs a DECLARED schema, and the right declaration for
    ``ts`` depends on how the files were written: TIMESTAMP(NANOS) must
    be declared long (``nanosAsLong``) and divided down, while
    TIMESTAMP(MICROS) files must be declared timestamp — declaring long
    over a micros file makes Spark silently cast and every event lands
    in 1970. So the schema is taken from a one-time driver-side footer
    peek of the files already in ``input_dir`` (empty dir → timestamp,
    today's writer layout); batch reads infer per-file and never hit
    this."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        inferred = spark.read.parquet(input_dir).schema["ts"].dataType
    except Exception:
        inferred = T.TimestampNTZType()
    raw = (
        spark.readStream.schema(_events_file_schema(inferred))
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    raw = convert_nanos_ts(raw, "ts")
    # watermarks demand TIMESTAMP (not NTZ); the session runs UTC, so the
    # cast is value-preserving and batch twins compare equal
    return raw.withColumn("ts", raw["ts"].cast("timestamp"))


def _idempotent_epoch_writer(output_dir: str):
    """foreachBatch sink that overwrites an epoch-keyed partition instead
    of blind-appending: a replayed epoch (failure between the write and
    the checkpoint commit, or a foreachBatch retry) rewrites the same
    partition rather than duplicating rows — this is what upgrades the
    file-source's at-least-once foreachBatch contract to exactly-once."""

    def write(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{output_dir}/epoch={epoch_id}")

    return write


def ingest_deduplicated(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    key: str = "event_id",
    watermark: str = "1 hour",
) -> None:
    """Batch-increment ingestion with streaming deduplication on ``key``:
    replayed/duplicated events are dropped across micro-batches.
    ``dropDuplicatesWithinWatermark`` is what actually bounds the dedup
    state (a plain ``dropDuplicates([key])`` keeps one entry per key
    forever even under a watermark); duplicates arriving later than the
    watermark horizon are out of contract. The reference has no duplicate
    handling at all — replayed files double-count."""
    stream = (
        stream_events(spark, input_dir)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark([key])
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_idempotent_epoch_writer(output_dir))
        .start()
    )
    q.awaitTermination()


def ingest_available_now(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str
) -> int:
    """One batch-increment run: land every not-yet-processed file in the
    validated parquet fact table, exactly once, then stop.

    Exactly-once = checkpointed file tracking (no reprocessing across
    runs) + idempotent epoch-partitioned writes (no duplicates when an
    epoch replays after a failure mid-commit).

    Returns the number of micro-batches executed (0 → nothing new)."""
    stream = stream_events(spark, input_dir)
    batches = 0
    epoch_writer = _idempotent_epoch_writer(output_dir)

    def count_batches(df: DataFrame, epoch_id: int) -> None:
        nonlocal batches
        batches += 1
        epoch_writer(df, epoch_id)

    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(count_batches)
        .start()
    )
    q.awaitTermination()
    return batches


DOCUMENTS_FILE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def stream_documents(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of documents (the training-data landing zone):
    each micro-batch is a set of newly-landed parquet files. An
    ``ingest_ts`` processing-time column is attached at read — documents
    carry no event time, and the near-dedup state bound needs one."""
    from pyspark.sql import functions as F

    raw = (
        spark.readStream.schema(DOCUMENTS_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    return raw.withColumn("ingest_ts", F.current_timestamp())


def ingest_near_deduplicated(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> None:
    """Streaming NEAR-duplicate dedup — the dedup ladder's streaming
    rung: documents whose normalized token-set fingerprint
    (``text.fingerprints``: order- and duplication-invariant, the
    ladder's 'normalized' tier) was already admitted within the
    watermark horizon are dropped in-stream; only the fingerprint (not
    the document) is held in state, and
    ``dropDuplicatesWithinWatermark`` expires it past the horizon —
    bounded state at any throughput. Batch twins
    (``dedup.dedup_normalized`` …) dedup the corpus at rest; this keeps
    an APPEND-ONLY landing zone clean as files arrive, with the same
    epoch-idempotent exactly-once sink as ``ingest_deduplicated``.
    Cross-horizon duplicates are out of contract (re-run the batch
    ladder for full-history dedup)."""
    from music_streaming_etl_glue_spark.operators.text import (
        normalized_fingerprint,
    )

    stream = (
        stream_documents(spark, input_dir)
        .withColumn("normalized_fp", normalized_fingerprint())
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["normalized_fp"])
        .drop("ingest_ts")
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_idempotent_epoch_writer(output_dir))
        .start()
    )
    q.awaitTermination()


def stream_enriched(
    spark: SparkSession,
    input_dir: str,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Stream-static enrichment: the flagship star join
    (:func:`..operators.enrich.enrich_events`) applied to the event
    STREAM — each micro-batch left-joins the static dimension frames,
    which Spark re-resolves per batch (so a dim refresh is picked up on
    the next trigger without restarting the query). The dims ride the
    same explicit ``broadcast()`` as the batch twin: a stream-static
    broadcast join keeps the stream side shuffle-free, which is the
    whole latency story at production rates. The batch and stream
    plans share ONE implementation, so enrichment semantics cannot
    drift between the nightly job and the live path."""
    from music_streaming_etl_glue_spark.operators.enrich import (
        enrich_events,
    )

    return enrich_events(stream_events(spark, input_dir), customer, nation)


def stream_kpi_maintenance(
    spark: SparkSession,
    input_dir: str,
    customer: DataFrame,
    nation: DataFrame,
    state_path: str,
    checkpoint_dir: str,
):
    """Streaming incremental KPI maintenance: each micro-batch of events
    is enriched (stream-static broadcast join), reduced to mergeable
    (date, genre) partials, and MERGED into the persisted KPI partial
    table (``plans.incremental.merge_genre_daily`` — additive counters +
    HLL sketch union). The lambda-architecture collapse: the nightly
    recompute, the incremental batch merge, and the live stream all run
    the SAME partial/merge code, so they cannot disagree. State on disk
    is O(date × genre), never event-scale; the checkpoint makes
    reprocessing resume-safe (an epoch replay re-merges the same batch —
    counts would double, so the writer records applied epoch ids next to
    the state and skips replays, the foreachBatch idempotence contract).

    Returns the started StreamingQuery (AvailableNow trigger)."""
    import json
    import os

    from music_streaming_etl_glue_spark.operators.enrich import enrich_events
    from music_streaming_etl_glue_spark.plans.incremental import (
        genre_daily_partials,
        merge_genre_daily,
    )

    applied_path = os.path.join(checkpoint_dir, "applied_epochs.json")

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        applied = set()
        if os.path.exists(applied_path):
            with open(applied_path) as fh:
                applied = set(json.load(fh))
        if epoch_id in applied:
            return
        enriched = enrich_events(batch_df, customer, nation)
        merge_genre_daily(spark, genre_daily_partials(enriched), state_path)
        applied.add(epoch_id)
        tmp = applied_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(sorted(applied), fh)
        os.replace(tmp, applied_path)

    os.makedirs(checkpoint_dir, exist_ok=True)
    return (
        stream_events(spark, input_dir)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "ck"))
        .trigger(availableNow=True)
        .start()
    )
