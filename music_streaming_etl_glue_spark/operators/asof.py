"""As-of (most-recent-match) join — an operator Spark has no native form
of, composed entirely from built-ins: tag the two sides, union them,
and carry the right side's values forward with ``last(..., ignorenulls)``
over a per-key event-time window. One shuffle on (key), no UDF, no
per-group pandas — the union trick keeps it linear and whole-stage
codegen'd, where a naive approach would be a per-key sort inside
``applyInPandas`` (Arrow round-trip) or an O(n·m) range join.

Semantics: for each left row, the right row with the greatest
``right_ts <= left_ts`` for the same key (LEFT as-of: unmatched left rows
survive with nulls). Ties between right rows at identical timestamps are
broken by the highest tiebreaker column — deterministic, and mirrored in
the DuckDB ``ASOF LEFT JOIN`` oracle by pre-deduplicating the right side
the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str] | None = None,
    tiebreaker: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """LEFT as-of join via the union + carry-forward-window composition.

    ``right_values`` are the right columns to attach (prefixed
    ``asof_``); ``tiebreaker`` (a right column) resolves duplicate
    right timestamps per key deterministically (max wins).
    ``direction``: "backward" (greatest right_ts <= left_ts, the default)
    or "forward" (smallest right_ts >= left_ts) — same kernel, the event
    stream is just scanned in the opposite order.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    right_values = right_values or []
    out_cols = {f"asof_{c}" for c in right_values} | {"asof_ts"}
    clash = (out_cols | {"__key", "__ts", "__side"}) & set(left.columns)
    if clash:
        raise ValueError(f"asof_join: left columns clash with internals: {clash}")

    extra = [tiebreaker] if tiebreaker and tiebreaker not in right_values else []
    r = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in right_values + extra],
    )
    if tiebreaker is not None:
        w_dedup = Window.partitionBy("__key", "__ts").orderBy(
            F.col(tiebreaker).desc()
        )
        r = (
            r.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn", *extra)
        )
    # Every left column rides through the union (nulls on right-side rows),
    # so no join-back is needed afterwards — joining on a generated row id
    # would silently mis-align when the left plan's row order is
    # nondeterministic across recomputation.
    left_fields = left.schema.fields
    # All carried fields travel in ONE struct so every asof_* output comes
    # from the same (most recent) right row — carrying columns separately
    # with last(ignorenulls) would skip a legitimately-NULL value on the
    # matched row and splice in an older row's value instead.
    rside = r.select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left_fields],
        "__key",
        "__ts",
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c).alias(f"asof_{c}") for c in right_values],
            F.col("__ts").alias("asof_ts"),
        ).alias("__carry"),
    )
    marker = left.select(
        *[F.col(f.name) for f in left_fields],
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rside.schema["__carry"].dataType).alias("__carry"),
    )

    # right rows sort before left rows at equal timestamps (side 0 < 1), so
    # a right event exactly at left_ts IS matched ("<=" / ">=" inclusive).
    # Backward scans time ascending (carry = greatest right_ts <= left_ts);
    # forward scans descending (carry = smallest right_ts >= left_ts).
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy("__key")
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = rside.unionByName(marker).withColumn(
        "__carry", F.last("__carry", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *[F.col(f.name) for f in left_fields],
            *[F.col(f"__carry.asof_{c}").alias(f"asof_{c}") for c in right_values],
            F.col("__carry.asof_ts").alias("asof_ts"),
        )
    )


def _error_click_joined(events: DataFrame, direction: str) -> DataFrame:
    """Shared error↔click as-of wiring (both directions use the same
    filters, dedup tiebreaker, and key)."""
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    return asof_join(
        errors,
        clicks,
        key="user_id",
        right_values=["value"],
        tiebreaker="event_id",
        direction=direction,
    )


def error_click_asof(events: DataFrame) -> DataFrame:
    """For every error event: the same user's most recent click at or
    before it (the monitoring/attribution query shape)."""
    out = _error_click_joined(events, "backward")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("click_ts"),
        F.col("asof_value").alias("click_value"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    how: str = "left",
) -> DataFrame:
    """Range join: each point row matched to interval rows of the same key
    containing it (``start <= ts <= end``).

    With an equi-key present, Catalyst plans the equi part as the join key
    and applies the range predicate as a join condition — shuffle on the
    key, no cross product. (Keyless interval joins need bucketization on
    time; not required by this surface.)
    """
    p = points.alias("__p")
    i = intervals.alias("__i")
    cond = (
        (F.col(f"__p.{key}") == F.col(f"__i.{key}"))
        & (F.col(f"__p.{point_ts}") >= F.col(f"__i.{start_ts}"))
        & (F.col(f"__p.{point_ts}") <= F.col(f"__i.{end_ts}"))
    )
    return p.join(i, cond, how).drop(F.col(f"__i.{key}"))


def events_in_busy_sessions(
    events: DataFrame, gap_s: int = 14_400, min_events: int = 3
) -> DataFrame:
    """Which high-activity session (if any) does each error event fall in?

    Sessions are derived by gap-based sessionization, reduced to
    (start, end) intervals, filtered to busy ones, then interval-joined
    back to the error events — points outside any busy window keep nulls.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = events.withColumn(
        "new_session", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("session_events"),
        )
        .filter(F.col("session_events") >= min_events)
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    return interval_join(
        errors, sessions, key="user_id", point_ts="ts",
        start_ts="session_start", end_ts="session_end",
    ).select(
        "event_id", "user_id", "ts",
        "session_id", "session_start", "session_end", "session_events",
    )


EVENTS_IN_BUSY_SESSIONS_SQL = """
WITH gaps AS (
    SELECT event_id, user_id, ts, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR CAST(floor(epoch(ts)) AS BIGINT)
                        - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 14400
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
flagged AS (
    SELECT event_id, user_id, ts, event_type,
           SUM(new_session)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               ::BIGINT AS session_id
    FROM gaps
),
sessions AS (
    SELECT user_id, session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS session_events
    FROM flagged
    GROUP BY user_id, session_id
    HAVING count(*) >= 3
)
SELECT e.event_id, e.user_id, e.ts,
       s.session_id, s.session_start, s.session_end, s.session_events
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN sessions s
  ON e.user_id = s.user_id
 AND e.ts >= s.session_start AND e.ts <= s.session_end
"""


def _error_click_sql(op: str, ts_alias: str, value_alias: str) -> str:
    """One SQL template for both as-of directions — the dedup CTE and key
    condition can never drift between them."""
    return f"""
WITH errors AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
clicks AS (
    SELECT user_id, ts, value
    FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
    ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts,
       c.ts AS {ts_alias}, c.value AS {value_alias}
FROM errors e
ASOF LEFT JOIN clicks c
  ON e.user_id = c.user_id AND e.ts {op} c.ts
"""


ERROR_CLICK_ASOF_SQL = _error_click_sql(">=", "click_ts", "click_value")


# ---------------------------------------------------------------------------
# keyless range join via time-bucket chunking (no nested-loop join)
# ---------------------------------------------------------------------------

BURST_BUCKET_S = 900  # 15-minute grid
BURST_MIN_ERRORS = 5


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_s: str,
    start_s: str,
    end_s: str,
    bucket_s: int,
) -> DataFrame:
    """Range join WITHOUT a join key — the case Catalyst can only plan as
    a BroadcastNestedLoopJoin (one task per probe partition × every
    interval). Instead: chunk time into ``bucket_s``-second cells,
    replicate each interval to the cells it overlaps, bucket each point
    into its single cell, and equi-join on the cell id with the exact
    half-open containment (``start <= p < end``) as a residual predicate.

    Shuffle volume is |points| + Σ interval-spans/bucket — linear, keyed,
    AQE-planable — and each (point, interval) match is produced exactly
    once because a point lives in exactly one cell. Pick ``bucket_s``
    near the median interval length: too small replicates intervals, too
    large funnels many points per cell (both still correct).

    Epoch-second BIGINT columns in, same columns out; no timestamp math
    inside the join.
    """
    i = intervals.withColumn(
        "__chunk",
        F.explode(
            F.sequence(
                F.floor(F.col(start_s) / bucket_s).cast("long"),
                F.floor((F.col(end_s) - 1) / bucket_s).cast("long"),
            )
        ),
    )
    p = points.withColumn(
        "__chunk", F.floor(F.col(point_s) / bucket_s).cast("long")
    )
    cond = (
        (p["__chunk"] == i["__chunk"])
        & (p[point_s] >= i[start_s])
        & (p[point_s] < i[end_s])
    )
    return p.join(i, cond, "inner").drop("__chunk")


def error_bursts(
    events: DataFrame,
    bucket_s: int = BURST_BUCKET_S,
    min_errors: int = BURST_MIN_ERRORS,
) -> DataFrame:
    """Maximal runs of contiguous 15-min cells each holding ≥ min_errors
    error events (gaps-and-islands with the bucket − row_number trick).
    The island window is global-ordered but runs over the AGGREGATED busy
    cells (one row per busy quarter-hour), never the raw events — small
    by construction at any scale."""
    busy = (
        events.filter(F.col("event_type") == "error")
        .groupBy(
            F.floor(F.unix_timestamp("ts") / bucket_s)
            .cast("long")
            .alias("bucket")
        )
        .agg(F.count("*").alias("n_errors"))
        .filter(F.col("n_errors") >= min_errors)
    )
    # the islands window is inherently global; the relation is one row
    # per busy quarter-hour (small by construction), so declare the
    # single partition explicitly instead of warning into the gate log.
    # repartition(1) (an explicit exchange) rather than coalesce(1): the
    # latter would collapse the bucket-agg reduce stage above to ONE task.
    grp = F.col("bucket") - F.row_number().over(
        Window.partitionBy(F.spark_partition_id()).orderBy("bucket")
    )
    return (
        busy.repartition(1).withColumn("grp", grp)
        .groupBy("grp")
        .agg(
            (F.min("bucket") * bucket_s).alias("burst_start_s"),
            ((F.max("bucket") + 1) * bucket_s).alias("burst_end_s"),
            F.sum("n_errors").alias("n_errors"),
        )
        .drop("grp")
    )


def events_in_error_bursts(
    events: DataFrame,
    bucket_s: int = BURST_BUCKET_S,
    min_errors: int = BURST_MIN_ERRORS,
) -> DataFrame:
    """Every event (any type) falling inside a system-wide error burst —
    the keyless interval match, planned as a chunked equi-join via
    :func:`interval_join_bucketed` (plan contains no
    BroadcastNestedLoopJoin; see test_asof plan assertion)."""
    bursts = error_bursts(events, bucket_s, min_errors)
    points = events.select(
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("event_s"),
    )
    return interval_join_bucketed(
        points, bursts, "event_s", "burst_start_s", "burst_end_s", bucket_s
    ).select(
        "event_id", "event_type", "event_s",
        "burst_start_s", "burst_end_s", "n_errors",
    )


EVENTS_IN_ERROR_BURSTS_SQL = f"""
WITH busy AS (
    SELECT CAST(floor(epoch(ts)) AS BIGINT) // {BURST_BUCKET_S} AS bucket,
           COUNT(*) AS n_errors
    FROM events WHERE event_type = 'error'
    GROUP BY 1
    HAVING COUNT(*) >= {BURST_MIN_ERRORS}
),
islands AS (
    SELECT bucket, n_errors,
           bucket - row_number() OVER (ORDER BY bucket) AS grp
    FROM busy
),
bursts AS (
    SELECT MIN(bucket) * {BURST_BUCKET_S} AS burst_start_s,
           (MAX(bucket) + 1) * {BURST_BUCKET_S} AS burst_end_s,
           SUM(n_errors)::BIGINT AS n_errors
    FROM islands GROUP BY grp
)
SELECT e.event_id, e.event_type,
       CAST(floor(epoch(e.ts)) AS BIGINT) AS event_s,
       b.burst_start_s, b.burst_end_s, b.n_errors
FROM events e
JOIN bursts b
  ON CAST(floor(epoch(e.ts)) AS BIGINT) >= b.burst_start_s
 AND CAST(floor(epoch(e.ts)) AS BIGINT) <  b.burst_end_s
"""


def error_next_click(events: DataFrame) -> DataFrame:
    """Forward as-of: for every error event, the same user's FIRST click
    at-or-after it (time-to-recovery attribution). Same union+carry
    kernel as the backward join, scanned in reverse."""
    out = _error_click_joined(events, "forward")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("next_click_ts"),
        F.col("asof_value").alias("next_click_value"),
    )


ERROR_NEXT_CLICK_SQL = _error_click_sql("<=", "next_click_ts", "next_click_value")


def error_click_asof_cogroup(events: DataFrame) -> DataFrame:
    """:func:`error_click_asof` on the COGROUPED pandas API
    (``groupBy().cogroup().applyInPandas``): both sides shuffle on
    user_id once, and each co-group becomes a pair of pandas frames
    merged with ``pd.merge_asof`` — the Arrow escape hatch for per-key
    two-sided logic the expression kernel can't express. Here it CAN
    (the union + carry-forward window in :func:`asof_join`), which is
    the point: identical output, shared oracle, so the cogroup path is
    hash-verified rather than trusted. State per task is one co-group,
    so memory scales with the largest key, not the table."""
    import pandas as pd

    # Explicit hash repartitioning on the group key: the per-group
    # pandas calls are the cost here, and AQE otherwise coalesces the
    # small shuffle to ONE partition, serializing every group through a
    # single Python worker (measured 12s -> ~1s at sf0.1 with the
    # explicit 32-way split). An explicit repartition is respected by
    # AQE; the cogroup reuses it, so no extra exchange appears.
    # r15: size-adaptive width (per-group pandas merges are the cost;
    # a few thousand event rows per task keep every core busy at scale
    # while a kilobyte fixture stops paying 32 task launches)
    from music_streaming_etl_glue_spark.operators.width import spread_width

    n_parts = spread_width(events, rows_per_task=2048)
    errors = (
        events.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts")
        .repartition(n_parts, "user_id")
    )
    # Both co-group sides derive from the SAME events scan; the right
    # side's columns are re-aliased to fresh attributes or Catalyst's
    # attribute deduplication prunes the shared (ts, event_id) out of the
    # right frame entirely (self-cogroup pitfall — the pandas function
    # would receive only [user_id, value]).
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
            F.col("event_id").alias("c_event_id"),
        )
        .repartition(n_parts, "user_id")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "ts", "click_ts", "click_value"]
            )
        left = left.sort_values(["ts", "event_id"])
        if right.empty:
            out = left.copy()
            out["click_ts"] = pd.NaT
            out["click_value"] = None
            return out[["event_id", "user_id", "ts", "click_ts", "click_value"]]
        # tiebreak duplicate click timestamps: max event_id wins (same
        # contract as asof_join(tiebreaker="event_id"))
        right = (
            right.sort_values(["c_ts", "c_event_id"])
            .groupby("c_ts", as_index=False)
            .last()
        )
        out = pd.merge_asof(
            left,
            right[["c_ts", "c_value"]].rename(
                columns={"c_ts": "click_ts", "c_value": "click_value"}
            ),
            left_on="ts",
            right_on="click_ts",
            direction="backward",
            allow_exact_matches=True,
        )
        return out[["event_id", "user_id", "ts", "click_ts", "click_value"]]

    return (
        errors.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            lambda left, right: merge(left, right),
            schema=(
                "event_id long, user_id long, ts timestamp,"
                " click_ts timestamp, click_value double"
            ),
        )
    )


# ---------------------------------------------------------------------------
# bounded-window recovery join (the batch twin of the stream-stream join)
# ---------------------------------------------------------------------------

#: 6 hours: the testdata's click cadence is hours apart per user, so a
#: literal 60 s "recovery" window matches nothing at any sf; the shape
#: (equi-key + bounded time range) is what's under test, not the knob.
RECOVERY_WINDOW_S = 21_600


def error_recovery_clicks(
    events: DataFrame, window_s: int = RECOVERY_WINDOW_S
) -> DataFrame:
    """Every (error, click) pair where the same user clicked within
    ``window_s`` seconds AFTER the error — the attribution query whose
    live form is :func:`~..streaming.joins.stream_error_recovery`.
    Unlike the as-of join (first click only) this keeps EVERY recovery
    click in the window, so it is a plain inner equi-join with a range
    residual.

    Scale: Catalyst plans the ``user_id`` equality as the join key (one
    hash shuffle per side, no cross product) and evaluates the time-range
    residual post-match. The time bound is the same predicate that lets
    the streaming twin evict state, so batch backfill and live output
    agree row-for-row.
    """
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    return errors.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("ts"))
        & (
            F.col("click_ts")
            <= F.col("ts") + F.expr(f"INTERVAL {window_s} SECONDS")
        ),
        "inner",
    ).select("event_id", "user_id", "ts", "click_ts", "click_value")


ERROR_RECOVERY_CLICKS_SQL = f"""
SELECT e.event_id, e.user_id, e.ts, c.ts AS click_ts, c.value AS click_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id
 AND c.ts >= e.ts
 AND c.ts <= e.ts + INTERVAL {RECOVERY_WINDOW_S} SECOND
"""
