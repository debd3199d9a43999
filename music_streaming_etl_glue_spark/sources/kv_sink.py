"""Distributed key-value serving sink.

The reference's serving load is a driver-side ``collect()`` over every KPI
table followed by boto3 batch writes
(``/root/reference/scripts/load_dynamodb.py:125-181, 229-343``) — full
materialization on one node, the pipeline's scalability cliff. Here the
write runs on the executors via ``foreachPartition``: each partition batches
its rows (default 25, the DynamoDB batch-write limit the reference uses),
dedupes within a batch on the (id, timestamp) composite key, and retries
throttled batches with capped exponential backoff.

The backend is pluggable: any callable ``(batch: list[dict]) -> None``.
``LocalDirBackend`` (ndjson file per partition) stands in for DynamoDB in
tests; a real deployment passes a client-wrapping callable created *inside*
``writer_factory`` so nothing unpicklable is captured in the closure.
"""

from __future__ import annotations

import json
import os
import random
import time
from collections.abc import Callable, Iterable, Iterator
from typing import Any

from pyspark import TaskContext
from pyspark.sql import DataFrame

BATCH_SIZE = 25  # reference load_dynamodb.py:134
MAX_RETRIES = 5  # reference load_dynamodb.py:135
BACKOFF_BASE_S = 1.0  # reference load_dynamodb.py:138


class RetryableWriteError(Exception):
    """Backend signal for a throttled/temporarily-failed batch."""


def _dedupe(batch: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Last-wins dedupe on (id, timestamp) — a DynamoDB BatchWriteItem
    rejects duplicate keys in one request (reference :140)."""
    seen: dict[tuple[Any, Any], dict[str, Any]] = {}
    for item in batch:
        seen[(item.get("id"), item.get("timestamp"))] = item
    return list(seen.values())


def _write_with_retry(
    write_batch: Callable[[list[dict[str, Any]]], None],
    batch: list[dict[str, Any]],
    max_retries: int = MAX_RETRIES,
    backoff_base_s: float = BACKOFF_BASE_S,
) -> None:
    attempt = 0
    while True:
        try:
            write_batch(batch)
            return
        except RetryableWriteError:
            if attempt >= max_retries:
                raise
            sleep = backoff_base_s * (2**attempt) * (0.5 + random.random() / 2)
            time.sleep(sleep)
            attempt += 1


def write_kv(
    df: DataFrame,
    writer_factory: Callable[[], Callable[[list[dict[str, Any]]], None]],
    batch_size: int = BATCH_SIZE,
    max_retries: int = MAX_RETRIES,
    backoff_base_s: float = BACKOFF_BASE_S,
) -> None:
    """Write every row of ``df`` through a per-partition batch writer.

    ``writer_factory`` is called once per partition *on the executor* and
    must return the batch-write callable — connections are created
    executor-side, never pickled from the driver. If the returned callable
    carries a ``finalize`` attribute it is invoked once after the
    partition's last batch (the commit hook backends use for atomic
    task-retry-safe output).
    """
    columns = df.columns
    # The (id, timestamp) in-batch dedupe exists for the DynamoDB composite
    # key; for frames without those columns every key would collapse to
    # (None, None) and each batch would silently shrink to one row.
    has_kv_key = "id" in columns and "timestamp" in columns
    dedupe = _dedupe if has_kv_key else (lambda batch: batch)

    def handle_partition(rows: Iterator[Any]) -> None:
        write_batch = writer_factory()
        batch: list[dict[str, Any]] = []
        for row in rows:
            batch.append({c: row[c] for c in columns})
            if len(batch) >= batch_size:
                _write_with_retry(
                    write_batch, dedupe(batch), max_retries, backoff_base_s
                )
                batch = []
        if batch:
            _write_with_retry(write_batch, dedupe(batch), max_retries, backoff_base_s)
        finalize = getattr(write_batch, "finalize", None)
        if finalize is not None:
            finalize()

    df.foreachPartition(handle_partition)


def local_dir_backend(
    out_dir: str, clean: bool = True,
) -> Callable[[], Callable[[list[dict[str, Any]]], None]]:
    """ndjson-per-partition stand-in backend (for tests / local serving).

    Idempotent under task retry AND speculative re-execution: each ATTEMPT
    writes its own tmp file (suffixed with the task attempt id, so two
    live attempts of one partition never share a file handle) and commits
    with an atomic rename onto the partition-id-named final file —
    whichever attempt finalizes last wins wholesale, and ``read_kv_dir``
    only sees fully-written ``.ndjson`` files, never a partial attempt.

    ``clean`` (default on) clears previously committed files when the
    backend is constructed (driver-side, once per run): without it a rerun
    that produces FEWER partitions would overwrite only the low-numbered
    files and serve the stale remainder alongside the new data.

    SINGLE-WRITER contract: one pipeline run owns ``out_dir``. The
    pipeline's concurrency slots bound how many runs execute, not which
    directories they write — two concurrent runs sharing an ``out_dir``
    would clean/commit over each other's partition files. Concurrent
    runs must target distinct ``out_dir``s (e.g. a per-run subdirectory
    the caller promotes on success); a shared-prefix multi-writer
    serving store is the real KV backend's job (DynamoDB puts are
    per-item upserts), not this local stand-in's.
    """
    if clean and os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.endswith(".ndjson") or ".ndjson.tmp" in name:
                try:
                    os.remove(os.path.join(out_dir, name))
                except OSError:
                    pass

    def factory() -> Callable[[list[dict[str, Any]]], None]:
        os.makedirs(out_dir, exist_ok=True)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        final_path = os.path.join(out_dir, f"part-{pid:05d}.ndjson")
        tmp_path = f"{final_path}.tmp-{attempt}"
        fh = open(tmp_path, "w", encoding="utf-8")

        def write_batch(batch: list[dict[str, Any]]) -> None:
            for item in batch:
                fh.write(json.dumps(item, default=str) + "\n")
            fh.flush()

        def finalize() -> None:
            fh.close()
            os.replace(tmp_path, final_path)

        write_batch.finalize = finalize  # type: ignore[attr-defined]
        return write_batch

    return factory


def write_serving_parquet(items: DataFrame, path: str) -> None:
    """Columnar serving table with the same id/timestamp/GSI-key layout —
    partitioned by kpi_type so point-family scans prune."""
    items.write.mode("overwrite").partitionBy("kpi_type").parquet(path)


def serving_lookup(spark, serving_path: str, item_id: str, kpi_type: str | None = None):
    """Point lookup on the local serving table (the reference's DynamoDB
    GetItem). With ``kpi_type`` the partition column prunes the scan to one
    directory; the ``id`` predicate pushes to the parquet row groups."""
    df = spark.read.parquet(serving_path)
    if kpi_type is not None:
        df = df.filter(df["kpi_type"] == kpi_type)
    return df.filter(df["id"] == item_id)


def write_serving_gsi_genre_date(items: DataFrame, path: str) -> None:
    """Secondary (GSI) layout of the serving table keyed genre→date,
    mirroring the reference's GenreDateIndex
    (``create_dynamodb_table.py:40-48``). DynamoDB GSIs are sparse — only
    items carrying both key attributes are indexed — so rows missing
    ``track_genre`` or ``date`` are dropped, and the two keys become the
    partition directories: a (genre, date-range) query prunes to one
    ``track_genre=`` directory and the matching ``date=`` leaves instead of
    scanning every ``kpi_type`` partition of the primary layout."""
    items.filter(
        items["track_genre"].isNotNull() & items["date"].isNotNull()
    ).write.mode("overwrite").partitionBy("track_genre", "date").parquet(path)


def serving_gsi_lookup(
    spark, gsi_path: str, genre: str, date_from: str, date_to: str
):
    """Range read on the GSI layout (the reference's GenreDateIndex Query):
    both predicates hit partition columns, so the scan is pruned to the
    genre directory and the date sub-range — no data files outside the
    window are opened."""
    df = spark.read.parquet(gsi_path)
    return df.filter(
        (df["track_genre"] == genre) & df["date"].between(date_from, date_to)
    )


def read_kv_dir(out_dir: str) -> Iterable[dict[str, Any]]:
    """Read back everything a ``local_dir_backend`` run wrote."""
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".ndjson"):
            with open(os.path.join(out_dir, name), encoding="utf-8") as fh:
                for line in fh:
                    yield json.loads(line)
