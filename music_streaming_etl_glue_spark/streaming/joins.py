"""Stream-stream joins with watermark-bounded state.

The reference's monitoring path correlates error events with follow-up
user actions in scheduled batch sweeps (the DAG re-joins the full day's
facts each run). Structured Streaming's stream-stream join does the same
correlation continuously: both sides are watermarked, the join condition
carries an explicit event-time bound, and the state store holds ONLY rows
still inside the bound — state is O(traffic in the window), not O(history).

Inner join: a matched (error, click) pair is emitted as soon as both rows
have arrived. Left-outer: unmatched errors are additionally emitted with
null click columns, but only once the watermark passes the end of their
window (the earliest moment "no recovery click" is provable).

Batch twin (same projection, same rows):
:func:`~..operators.asof.error_recovery_clicks` — tested equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators.asof import RECOVERY_WINDOW_S

#: Watermark delay for both sides of the recovery join. At 100 TB this is
#: the knob that bounds state: delay × per-user event rate rows per key.
RECOVERY_WATERMARK = "1 hour"


def split_event_streams(
    events_stream: DataFrame, watermark: str = RECOVERY_WATERMARK
) -> tuple[DataFrame, DataFrame]:
    """(errors, clicks) filtered from one events stream, each with its
    own watermark. A self-join of a single stream is legal, but each
    side must declare the watermark on ITS branch — the join planner
    reads the watermark per input, not per source."""
    errors = (
        events_stream.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", watermark)
    )
    clicks = (
        events_stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    return errors, clicks


def _recovery_condition(window_s: int):
    return (
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("ts"))
        & (
            F.col("click_ts")
            <= F.col("ts") + F.expr(f"INTERVAL {window_s} SECONDS")
        )
    )


def stream_error_recovery(
    errors: DataFrame,
    clicks: DataFrame,
    window_s: int = RECOVERY_WINDOW_S,
) -> DataFrame:
    """Inner stream-stream join: every click by the same user within
    ``window_s`` seconds after an error. The two event-time range
    predicates are what make the state evictable: an error row can be
    dropped once the click watermark passes ``ts + window_s``, a click
    row once the error watermark passes ``click_ts`` — without them the
    join would be correct but its state unbounded (Spark warns and keeps
    everything)."""
    return errors.join(clicks, _recovery_condition(window_s), "inner").select(
        "event_id", "user_id", "ts", "click_ts", "click_value"
    )


def stream_error_recovery_outer(
    errors: DataFrame,
    clicks: DataFrame,
    window_s: int = RECOVERY_WINDOW_S,
) -> DataFrame:
    """Left-outer variant: errors with NO recovery click inside the
    window also appear, click columns null — the alerting shape ("errors
    the user never recovered from"). Null rows are emitted only after
    the watermark proves the window closed empty, so in ``availableNow``
    replays the tail of errors younger than the final watermark stays
    pending (exactly the late-data contract, and the test asserts it)."""
    return errors.join(
        clicks, _recovery_condition(window_s), "left_outer"
    ).select("event_id", "user_id", "ts", "click_ts", "click_value")
