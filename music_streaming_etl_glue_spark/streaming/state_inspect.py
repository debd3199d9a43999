"""Offline inspection of Structured Streaming state checkpoints.

When a stateful query misbehaves in production (state growing without
bound, a key stuck with a stale aggregate), restarting it with debug
logging is not an option at 100 TB. Spark 4's State Data Source reads
the checkpointed state store AS A DATAFRAME — offline, while the query
runs or after it stopped — so state audits are ordinary queries:

* ``state-metadata``: one row per stateful operator in the checkpoint
  (operator id/name, partition count, batch id range) — the map of what
  state exists.
* ``statestore``: the actual key/value rows of one operator's store at
  the last (or a chosen) committed batch.

No reference counterpart (its pipeline keeps no operator state); this is
the ops surface any streaming deployment of this engine needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator inventory of a checkpoint: operatorId, operatorName,
    stateStoreName, numPartitions, minBatchId, maxBatchId."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_rows(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    batch_id: int | None = None,
) -> DataFrame:
    """(key, value, partition_id) state rows of one operator's store —
    by default the LAST committed batch, or a specific ``batch_id`` for
    point-in-time forensics (any batch still inside the checkpoint's
    retention window)."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint)


def aggregation_state_counts(
    spark: SparkSession, checkpoint: str
) -> DataFrame:
    """Flattened (key struct fields..., count-ish value fields...) view
    of a streaming aggregation's store — the query you actually run when
    auditing 'which keys hold state and how much'."""
    st = state_rows(spark, checkpoint)
    return st.select("partition_id", "key.*", "value.*")
