"""As-of join semantics: <= boundary, unmatched nulls, tiebreaks."""

from __future__ import annotations

import datetime as dt

from music_streaming_etl_glue_spark.operators.asof import asof_join
from tests.conftest import SF_SMOKE

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_basic_boundary_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(4)), (3, 20, _ts(1)), (4, 30, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(10), 1.0), (10, _ts(5), 2.0), (20, _ts(2), 3.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof_join(
            left, right, key="user_id", right_values=["value"]
        ).collect()
    }
    assert out[1] == (_ts(10), 1.0)  # exact-equal timestamp IS matched (<=)
    assert out[2] == (None, None)  # earliest right for key 10 is later → null
    assert out[3] == (None, None)  # right event after left → unmatched
    assert out[4] == (None, None)  # key 30 has no right rows at all
    assert len(out) == 4  # every left row survives (LEFT semantics)


def test_asof_picks_most_recent_and_tiebreaks(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(60))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, _ts(30), 1.0, 100), (7, _ts(50), 2.0, 101), (7, _ts(50), 9.0, 102)],
        "user_id long, ts timestamp, value double, rid long",
    )
    row = asof_join(
        left, right, key="user_id", right_values=["value"], tiebreaker="rid"
    ).collect()[0]
    # most recent right ts wins; within the tied ts, max tiebreaker wins
    assert row.asof_ts == _ts(50)
    assert row.asof_value == 9.0


def test_asof_null_value_on_matched_row_is_carried(spark):
    # The matched (most recent) right row has value=NULL — the join must
    # report that NULL, not splice in an older row's non-null value.
    left = spark.createDataFrame(
        [(1, 7, _ts(60))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, _ts(30), 1.0), (7, _ts(50), None)],
        "user_id long, ts timestamp, value double",
    )
    row = asof_join(left, right, key="user_id", right_values=["value"]).collect()[0]
    assert row.asof_ts == _ts(50)
    assert row.asof_value is None


def test_interval_join_bucketed_matches_each_point_once(spark):
    points = spark.createDataFrame(
        [(1, 100), (2, 950), (3, 1799), (4, 1800), (5, 5000)],
        "pid int, p bigint",
    )
    # interval spanning 2 chunks (900s grid) + a disjoint later one
    intervals = spark.createDataFrame(
        [(10, 900, 1800), (11, 4500, 5400)], "iid int, s bigint, e bigint"
    )
    from music_streaming_etl_glue_spark.operators.asof import (
        interval_join_bucketed,
    )

    got = sorted(
        (r.pid, r.iid)
        for r in interval_join_bucketed(
            points, intervals, "p", "s", "e", 900
        ).collect()
    )
    assert got == [(2, 10), (3, 10), (5, 11)]


def test_events_in_error_bursts_plan_has_no_nested_loop(spark):
    from music_streaming_etl_glue_spark.operators.asof import (
        events_in_error_bursts,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table

    df = events_in_error_bursts(load_table(spark, SF_SMOKE, "events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
