"""Custom connector on the Spark 4 Python DataSource API.

The reference ships hand-rolled connectors for systems Spark has no
built-in source for (its KV store writer, its listing-diff file feed).
The idiomatic PySpark counterpart is the ``pyspark.sql.datasource`` API:
a ``DataSource`` subclass declares schema + options, a
``DataSourceReader`` plans *partitions* on the driver and generates rows
*on the executors* (Arrow-batched back to the JVM), and a
``DataSourceStreamReader`` adds offset bookkeeping for exactly-once
micro-batches. No JVM code, and the reader parallelism is real — each
``InputPartition`` becomes one Spark task.

The synthetic source here is the connector contract under test: every
row is a pure function of its row index (md5-derived fields), so a
DuckDB ``generate_series`` twin reproduces the full relation and the
driver's hash gate verifies the connector byte-for-byte — the same
standard every other operator in this repo is held to.

Determinism note: ``read()`` may be re-executed on task retry or
speculative duplicates; a generator that draws from RNG state would
produce different rows per attempt. Deriving each row from (index) alone
makes retries idempotent — the property that matters when a 100 TB
backfill reruns a stage.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SOURCE_NAME = "synthetic_events"

#: Row-contract knobs — shared verbatim by the DuckDB twin below.
SYNTH_USERS = 500
SYNTH_SPAN_S = 30 * 86_400
SYNTH_EPOCH = datetime(2024, 1, 1)
SYNTH_TYPES = ("play", "click", "error", "purchase")

SYNTH_SCHEMA = (
    "event_id BIGINT, user_id BIGINT, event_type STRING,"
    " value DOUBLE, ts TIMESTAMP"
)

#: Defaults for the catalog query (small enough to hash-check at the
#: gate, wide enough that every partition emits rows).
SYNTH_ROWS = 1_000
SYNTH_PARTITIONS = 8


def _h(tag: str, i: int) -> int:
    return int(hashlib.md5(f"{tag}|{i}".encode()).hexdigest()[:8], 16)


def synth_row(i: int) -> tuple:
    """The row contract: every field a pure md5 function of the index."""
    return (
        i,
        _h("u", i) % SYNTH_USERS,
        SYNTH_TYPES[_h("t", i) % len(SYNTH_TYPES)],
        (_h("v", i) % 100_000) / 100.0,
        SYNTH_EPOCH + timedelta(seconds=_h("s", i) % SYNTH_SPAN_S),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _split(start: int, end: int, n_parts: int) -> list[_RangePartition]:
    """Contiguous row-index ranges, one per task; sizes differ by ≤1."""
    total = end - start
    n_parts = max(1, min(n_parts, total)) if total else 1
    bounds = [start + (total * k) // n_parts for k in range(n_parts + 1)]
    return [
        _RangePartition(a, b)
        for a, b in zip(bounds, bounds[1:])
        if b > a or total == 0
    ]


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", SYNTH_ROWS))
        self.n_parts = int(options.get("partitions", SYNTH_PARTITIONS))

    def partitions(self):
        return _split(0, self.n_rows, self.n_parts)

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch reader: the offset is simply the next unread row
    index, advanced ``batch_rows`` per trigger up to ``max_rows``. The
    (start, end) range of each batch is re-derivable from the checkpointed
    offsets alone, so a restarted query replays identical batches —
    the exactly-once contract the file-source pipelines already test."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("max_rows", SYNTH_ROWS))
        self.n_parts = int(options.get("partitions", 4))

    def initialOffset(self):
        return {"index": 0}

    # NOTE on restart: latestOffset's advance counter is in-memory, so a
    # restarted query re-advances from 0 while the checkpoint may sit
    # higher; batches only resume once the counter passes it (rows are
    # always derived from the checkpointed (start, end), so no data is
    # wrong — the connector just idles a few triggers). A production
    # connector would consult the external system's high watermark here
    # instead of a counter.

    def latestOffset(self):
        # advance one batch per trigger; a real connector would consult
        # the external system's high watermark here
        nxt = min(self._last_seen() + self.batch_rows, self.max_rows)
        self._latest = nxt
        return {"index": nxt}

    def _last_seen(self) -> int:
        return getattr(self, "_latest", 0)

    def partitions(self, start, end):
        return _split(start["index"], end["index"], self.n_parts)

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield synth_row(i)

    def commit(self, end):
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return SOURCE_NAME

    def schema(self):
        return SYNTH_SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration; after this,
    ``spark.read.format("synthetic_events")`` works anywhere in the
    session (including a vanilla driver session)."""
    spark.dataSource.register(SyntheticEventsDataSource)


def synthetic_events(spark, rows: int = SYNTH_ROWS, partitions: int = SYNTH_PARTITIONS):
    register(spark)
    return (
        spark.read.format(SOURCE_NAME)
        .option("rows", rows)
        .option("partitions", partitions)
        .load()
    )


def _dd_h(tag: str) -> str:
    """DuckDB twin of :func:`_h` — '0x'+first-8-hex-of-md5 cast."""
    return f"CAST(('0x' || substring(md5('{tag}|' || i), 1, 8)) AS BIGINT)"


SYNTHETIC_EVENTS_SQL = f"""
SELECT i AS event_id,
       {_dd_h('u')} % {SYNTH_USERS} AS user_id,
       list_extract(['play','click','error','purchase'],
                    CAST({_dd_h('t')} % 4 AS INTEGER) + 1) AS event_type,
       ({_dd_h('v')} % 100000) / 100.0 AS value,
       TIMESTAMP '2024-01-01 00:00:00'
         + to_seconds({_dd_h('s')} % {SYNTH_SPAN_S}) AS ts
FROM generate_series(0, {SYNTH_ROWS - 1}) t(i)
"""
