"""Round-7 operators: OHLC downsampling, MAD outlier audit, session
transition matrix, RFM segmentation, order-backlog timeline — handcrafted
semantics pins beyond the DuckDB parity the catalog gate provides."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_events_minute_ohlc_picks_by_ts_then_event_id(spark):
    """open/close come from (ts, event_id) ordering — same-timestamp ties
    break on event_id, so the bars are deterministic."""
    from music_streaming_etl_glue_spark.operators.analytics import (
        events_minute_ohlc,
    )

    t = datetime.datetime(2024, 3, 1, 10, 5, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        # same first-second tie: event 2 < 3 → open is 7.0
        (3, t, 9.0),
        (2, t, 7.0),
        (5, t + 30 * s, 1.0),
        # same last-second tie: event 9 > 8 → close is 4.0
        (8, t + 59 * s, 2.0),
        (9, t + 59 * s, 4.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    ).repartition(3)
    [bar] = events_minute_ohlc(events).collect()
    assert bar.open == 7.0
    assert bar.close == 4.0
    assert bar.high == 9.0
    assert bar.low == 1.0
    assert bar.n_events == 5
    # no window sort anywhere: the bar is one hash aggregate
    assert "Window" not in _plan(events_minute_ohlc(events))


def test_mad_outlier_audit_catches_planted_spike(spark):
    """A single huge value among tight ones is an outlier under the MAD
    gate (the case a mean/stddev gate self-masks), and a constant group
    yields mad=0 with no outliers beyond the cut."""
    from music_streaming_etl_glue_spark.operators.analytics import (
        mad_outlier_audit,
    )

    tight = [(i, "a", 10.0 + (i % 3) * 0.1) for i in range(30)]
    spike = [(100, "a", 1e6)]
    const = [(200 + i, "b", 5.0) for i in range(10)]
    events = spark.createDataFrame(
        tight + spike + const, "event_id long, event_type string, value double"
    )
    out = {r.event_type: r for r in mad_outlier_audit(events).collect()}
    assert out["a"].n_outliers == 1
    assert out["a"].n == 31
    assert out["b"].mad == 0.0
    # spike in a constant group: every deviation 0 except none — no rows
    # beyond 0 cut except deviating ones; here all equal → 0 outliers
    assert out["b"].n_outliers == 0


def test_session_transition_matrix_respects_session_gap(spark):
    """Transitions never cross the 30-min idle gap, and probabilities
    row-normalize per from_type."""
    from music_streaming_etl_glue_spark.operators.behavior import (
        session_transition_matrix,
    )

    t = datetime.datetime(2024, 3, 1, 8, 0, 0)
    m = datetime.timedelta(minutes=1)
    rows = [
        # user 1, one session: view -> click -> view
        (1, 1, "view", t),
        (2, 1, "click", t + m),
        (3, 1, "view", t + 2 * m),
        # 2-hour gap: NOT a transition (view -> purchase would be wrong)
        (4, 1, "purchase", t + 122 * m),
        # user 2: view -> view
        (5, 2, "view", t),
        (6, 2, "view", t + m),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {
        (r.from_type, r.to_type): r
        for r in session_transition_matrix(events).collect()
    }
    assert ("view", "purchase") not in out
    assert out[("view", "click")].n_transitions == 1
    assert out[("view", "view")].n_transitions == 1
    assert out[("view", "click")].p == 0.5
    assert out[("click", "view")].p == 1.0


def test_customer_rfm_segments_scores_and_labels(spark):
    """5=best on every axis: the frequent/recent/big spender scores 555
    and is labelled champion; the stale small customer scores low."""
    from music_streaming_etl_glue_spark.operators.relational import (
        customer_rfm_segments,
    )

    d0 = datetime.datetime(2024, 1, 1)
    day = datetime.timedelta(days=1)
    rows = []
    # customers 1..5: customer k orders k times, last order day k*30,
    # each order worth k*100 — strictly increasing on every metric
    key = 0
    for c in range(1, 6):
        for i in range(c):
            key += 1
            rows.append((key, c, float(c * 100), d0 + (c * 30 + i) * day))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp"
    )
    out = {r.custkey: r for r in customer_rfm_segments(orders).collect()}
    assert (out[5].r_score, out[5].f_score, out[5].m_score) == (5, 5, 5)
    assert out[5].segment == "champion"
    assert out[5].rfm == 555
    assert (out[1].r_score, out[1].f_score, out[1].m_score) == (1, 1, 1)
    assert out[1].segment == "lost"
    assert out[3].monetary == 900.0


def test_orders_backlog_timeline_cumulative_and_parallel_plan(spark):
    """Backlog = cumulative(opened − closed); the cumulative window runs
    after an explicit SinglePartition exchange (daily agg stays
    parallel)."""
    from music_streaming_etl_glue_spark.operators.relational import (
        orders_backlog_timeline,
    )

    d = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    orders = spark.createDataFrame(
        [
            (1, d("2024-01-01")),
            (2, d("2024-01-01")),
            (3, d("2024-01-03")),
        ],
        "o_orderkey long, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [
            (1, d("2024-01-02")),  # order 1 ships fully on Jan 2
            (2, d("2024-01-02")),
            (2, d("2024-01-05")),  # order 2's last line ships Jan 5
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    df = orders_backlog_timeline(orders, lineitem)
    rows = {str(r.day): r for r in df.collect()}
    assert rows["2024-01-01"].backlog == 2  # two opened
    assert rows["2024-01-02"].backlog == 1  # order 1 closed
    assert rows["2024-01-03"].backlog == 2  # order 3 opened (3 never ships)
    assert rows["2024-01-05"].backlog == 1  # order 2 closed
    plan = _plan(df)
    assert "SinglePartition" in plan
    assert "Coalesce" not in plan
