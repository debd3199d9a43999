"""JSONL corpus ingestion with a corrupt-record quarantine channel.

Web-scale text corpora ship as newline-delimited JSON (one document per
line, often millions of files); this is the documents-table ingestion
front door the parquet catalog sits behind. Mirrors the CSV validation
contract (``plans/contracts.read_csv_validated`` — reference
``validate_data.py``, with the dead corrupt-record channel fixed): a
declared schema, PERMISSIVE parsing with the corrupt column, a clean/
quarantine split in ONE pass, and per-file provenance.

Scale shape: a JSONL read is a parallel line-oriented scan (splittable
unless compressed with a non-splittable codec); schema is DECLARED, so
no sampling pass runs; the quarantine predicate is a narrow filter. At
100 TB the only knob is file count/size — pair with
``plans.layout.compact_parquet`` after conversion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from music_streaming_etl_glue_spark.plans.contracts import (
    CORRUPT_COL,
    ValidationResult,
    validate_columns,
)

#: the documents-table contract (TESTDATA.md schema)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def read_jsonl_documents(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType = DOCUMENTS_SCHEMA,
    required: list[str] | None = None,
    with_provenance: bool = True,
) -> ValidationResult:
    """Read JSONL documents against a declared schema; malformed lines
    land in the quarantine frame instead of silently becoming all-null
    rows. ``with_provenance`` adds ``source_file`` (the per-line input
    file) — the lineage column a takedown/audit request needs."""
    read_schema = T.StructType(
        list(schema.fields)
        + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    raw = (
        spark.read.schema(read_schema)
        .options(mode="PERMISSIVE", columnNameOfCorruptRecord=CORRUPT_COL)
        .json(paths)
        # provenance must be projected BEFORE the cache: input_file_name()
        # is a scan-context function and returns '' once the cached rows
        # are detached from the file scan
        .withColumn("source_file", F.input_file_name())
        # PERMISSIVE + corrupt column requires referencing parsed and
        # corrupt columns together via a cache (same as the CSV path)
        .cache()
    )
    if required:
        validate_columns(raw, required, name=",".join(paths))
    corrupt = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    keep = [F.col(f.name).cast(f.dataType) for f in schema.fields]
    if with_provenance:
        keep.append(F.col("source_file"))
    clean = raw.filter(F.col(CORRUPT_COL).isNull()).select(*keep)
    return ValidationResult(
        clean=clean, corrupt=corrupt, source_paths=list(paths)
    )


def jsonl_to_documents_table(
    spark: SparkSession,
    paths: list[str],
    output_dir: str,
    quarantine_dir: str | None = None,
) -> dict[str, int]:
    """The ingestion composite: JSONL → validated documents parquet +
    quarantine side-output. Returns the audit counts a pipeline run
    records. Parquet lands partitioned by ``source`` (the catalog's
    pruning column for per-domain reads)."""
    from music_streaming_etl_glue_spark.plans.contracts import (
        quarantine_corrupt,
    )

    res = read_jsonl_documents(spark, paths)
    clean = res.clean.drop("source_file")
    clean.write.mode("overwrite").partitionBy("source").parquet(output_dir)
    n_corrupt = res.corrupt.count()
    if quarantine_dir is not None:
        quarantine_corrupt(res.corrupt, quarantine_dir)
    return {"clean": clean.count(), "corrupt": n_corrupt}


def stream_jsonl_documents(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming twin of :func:`read_jsonl_documents`: a file-source
    stream over a JSONL landing zone with the SAME declared schema and
    corrupt-record channel — each micro-batch is the set of newly-landed
    files, malformed lines surface as ``_corrupt_record`` rows the
    foreachBatch sink routes to quarantine (the split itself runs
    per-batch; a streaming filter cannot fork two sinks from one read).
    Pair with ``streaming.file_pipeline``'s epoch-idempotent writer for
    the exactly-once parquet conversion."""
    read_schema = T.StructType(
        list(DOCUMENTS_SCHEMA.fields)
        + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    return (
        spark.readStream.schema(read_schema)
        .options(mode="PERMISSIVE", columnNameOfCorruptRecord=CORRUPT_COL)
        .option("maxFilesPerTrigger", 16)
        .json(input_dir)
    )


def ingest_jsonl_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
) -> None:
    """AvailableNow JSONL ingestion: drains the landing zone once,
    writing clean rows to parquet and corrupt lines to the JSON
    quarantine per micro-batch, then stops. Restart-safe via the
    checkpoint (a re-run re-reads nothing already committed)."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.cache()
        try:
            (
                batch.filter(F.col(CORRUPT_COL).isNull())
                .select(
                    *[
                        F.col(f.name).cast(f.dataType)
                        for f in DOCUMENTS_SCHEMA.fields
                    ]
                )
                .write.mode("append")
                .parquet(output_dir)
            )
            corrupt = batch.filter(F.col(CORRUPT_COL).isNotNull()).select(
                CORRUPT_COL
            )
            if not corrupt.isEmpty():
                corrupt.write.mode("append").json(quarantine_dir)
        finally:
            batch.unpersist()

    q = (
        stream_jsonl_documents(spark, input_dir)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )
    q.awaitTermination()
