"""State Data Source: offline audit of a streaming aggregation's
checkpointed state matches the batch aggregate."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.sources.catalog import load_table
from music_streaming_etl_glue_spark.streaming.file_pipeline import (
    stream_events,
)
from music_streaming_etl_glue_spark.streaming.state_inspect import (
    aggregation_state_counts,
    state_metadata,
    state_rows,
)
from tests.conftest import SF_SMOKE


def _run_counting_query(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "events.parquet")
    ckpt = str(tmp_path / "ckpt")
    counts = stream_events(spark, str(src)).groupBy("user_id").count()
    q = (
        counts.writeStream.format("memory")
        .queryName("state_audit_counts")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return ckpt


def test_statestore_reader_matches_batch_aggregate(spark, tmp_path):
    ckpt = _run_counting_query(spark, tmp_path)

    meta = state_metadata(spark, ckpt)
    ops = meta.select("operatorId", "operatorName").collect()
    assert len(ops) == 1 and ops[0].operatorName == "stateStoreSave"

    raw = state_rows(spark, ckpt)
    assert {"key", "value", "partition_id"} <= set(raw.columns)

    audited = {
        (r.user_id, r["count"])
        for r in aggregation_state_counts(spark, ckpt).collect()
    }
    batch = {
        (r.user_id, r.n)
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert audited == batch
