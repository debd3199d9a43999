"""Custom stateful streaming operator: per-user running aggregates via
``applyInPandasWithState``.

This is the escape hatch for stateful logic Spark's built-in streaming
aggregations can't express (per-key custom state machines, decaying
counters, fraud scores). State is a tiny per-key tuple managed by the
engine's state store — checkpointed, recoverable, and partitioned by the
group key, so it scales with keys, not events. Arrow batches flow through
pandas once per key per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events_total", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 2)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events_total": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running (count, value-total): one output row per
    user per micro-batch with the post-batch totals."""
    return events_stream.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_user_sessions(
    events_stream: DataFrame, gap_s: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming sessionization with the NATIVE ``session_window``
    aggregate: the state store keeps one mergeable interval per open
    session; the watermark finalizes and EVICTS sessions whose end falls
    behind it, so state is bounded by active sessions, not history.

    The exact operator the batch ``analytics.user_session_windows`` uses —
    a closed session here is bit-identical to its batch row, so backfill
    (batch) and live (stream) paths cannot disagree. Append output mode
    emits each session exactly once, on finalization.
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", f"{gap_s} seconds"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


try:  # Spark 4 typed-state API; absent on older runtimes
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]


class UserTotalsProcessor(StatefulProcessor):
    """``transformWithState`` processor: same per-user running totals as
    :func:`running_user_totals`, on the Spark 4 typed-state API. State
    lives in a named ``ValueState`` inside the operator's state store —
    composable with other state variables (lists, maps, timers, TTL) in
    one processor, which is what the legacy single-tuple
    ``applyInPandasWithState`` cannot do. Module-level class: processor
    instances are pickled to the Python state workers, so the class must
    be importable by reference."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, total = (
            tuple(self._totals.get()) if self._totals.exists() else (0, 0.0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, round(total, 2)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events_total": [n],
                "total_value": [round(total, 2)],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events_stream: DataFrame) -> DataFrame:
    """:func:`running_user_totals` on ``transformWithStateInPandas`` —
    output rows are identical (same keys, same totals per micro-batch),
    so the two state APIs are interchangeable for this contract and the
    test asserts exactly that. Runtime needs: RocksDB state store
    provider + google.protobuf in the Python workers (standard on real
    clusters; the test skips where the container lacks protobuf)."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
