"""Semantic unit tests for the KPI operators on tiny hand-built frames:
dense_rank tie behavior, left-join null paths, trending window direction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators.kpis import (
    genre_top_songs,
    trending_tracks,
    trending_tracks_reference_exact,
)


def _enriched_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "user_id long, user_name string, user_country string, track_id long, "
        "track_genre string, timestamp timestamp, listening_time double",
    )


TS = dt.datetime(2024, 6, 25, 12, 0, 0)


def test_dense_rank_ties_can_exceed_k(spark):
    # Four tracks: plays 3,2,2,1 → dense ranks 1,2,2,3 → top-3 keeps all 4.
    rows = []
    for track, n in [(1, 3), (2, 2), (3, 2), (4, 1)]:
        for i in range(n):
            rows.append((10, "u", "c", track, "rock", TS, 1.0))
    out = genre_top_songs(_enriched_rows(spark, rows), k=3).collect()
    assert len(out) == 4
    ranks = {r.track_id: r.rank for r in out}
    assert ranks == {1: 1, 2: 2, 3: 2, 4: 3}


def test_left_join_nulls_group_together(spark):
    # Null user_name (unmatched dim) must form its own group, not be dropped.
    rows = [
        (1, None, None, 7, "rock", TS, 2.0),
        (1, None, None, 8, "rock", TS, 4.0),
    ]
    from music_streaming_etl_glue_spark.operators.kpis import user_kpis

    out = user_kpis(_enriched_rows(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].total_songs_played == 2
    assert out[0].total_listening_time_minutes == 6.0


def test_trending_trailing_vs_forward(spark):
    # Track 1 plays: t0, t0+1h, t0+30h. Trailing-24h max = 2 (t0 & t0+1h).
    rows = [
        (1, "u", "c", 1, "rock", TS, 1.0),
        (1, "u", "c", 1, "rock", TS + dt.timedelta(hours=1), 1.0),
        (2, "u", "c", 1, "rock", TS + dt.timedelta(hours=30), 1.0),
    ]
    df = _enriched_rows(spark, rows)
    trailing = {r.track_id: r.plays_last_24h for r in trending_tracks(df).collect()}
    forward = {
        r.track_id: r.plays_last_24h
        for r in trending_tracks_reference_exact(df).collect()
    }
    assert trailing == {1: 2}
    # forward-looking frame anchored at t0 also sees t0+1h → same max here
    assert forward == {1: 2}


def test_trending_window_is_range_not_rows(spark):
    # Two plays 25h apart: never in the same 24h range frame → max 1.
    rows = [
        (1, "u", "c", 5, "pop", TS, 1.0),
        (1, "u", "c", 5, "pop", TS + dt.timedelta(hours=25), 1.0),
    ]
    out = trending_tracks(_enriched_rows(spark, rows)).collect()
    assert out[0].plays_last_24h == 1


def test_approx_distinct_within_rsd_bound(spark):
    """genre_daily_metrics_approx: every group's HLL++ estimate must sit
    within 4×rsd of the exact distinct count (and the exact columns must be
    identical), so the approx query is bounded, not merely runnable."""
    from music_streaming_etl_glue_spark.operators.enrich import enrich_events
    from music_streaming_etl_glue_spark.operators.kpis import (
        genre_daily_metrics,
        genre_daily_metrics_approx,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rsd = 0.02
    enriched = enrich_events(
        load_table(spark, SF_SMOKE, "events"),
        load_table(spark, SF_SMOKE, "customer"),
        load_table(spark, SF_SMOKE, "nation"),
    ).cache()
    exact = {
        (r.date, r.track_genre): (
            r.unique_listeners,
            r.listen_count,
            r.total_listening_time_minutes,
        )
        for r in genre_daily_metrics(enriched).collect()
    }
    approx = genre_daily_metrics_approx(enriched, rsd=rsd).collect()
    assert len(approx) == len(exact)
    for r in approx:
        ex_distinct, ex_count, ex_time = exact[(r.date, r.track_genre)]
        tol = max(2.0, 4 * rsd * ex_distinct)
        assert abs(r.unique_listeners - ex_distinct) <= tol, (
            r.date, r.track_genre, r.unique_listeners, ex_distinct)
        assert r.listen_count == ex_count
        assert r.total_listening_time_minutes == ex_time
    enriched.unpersist()


def test_percentile_approx_within_rank_error(spark):
    """value_percentiles_approx: each sketch estimate must be an actual
    data value whose rank sits within the 1/accuracy rank-error bound of
    the requested percentile (the KLL guarantee), checked per group."""
    from music_streaming_etl_glue_spark.operators.analytics import (
        PERCENTILES,
        value_percentiles_approx,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table
    from tests.conftest import SF_CORRECT

    accuracy = 1000
    events = load_table(spark, SF_CORRECT, "events")
    approx = {
        r["event_type"]: r
        for r in value_percentiles_approx(events, accuracy).collect()
    }
    rows = events.select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for etype, values in by_type.items():
        values.sort()
        n = len(values)
        for p in PERCENTILES:
            est = approx[etype][f"p{int(p * 100)}"]
            lo = max(0, int((p - 1.0 / accuracy) * n) - 1)
            hi = min(n - 1, int((p + 1.0 / accuracy) * n) + 1)
            assert values[lo] - 1e-6 <= est <= values[hi] + 1e-6, (
                etype, p, est, values[lo], values[hi],
            )


def test_hll_sketch_rollup_error_bound(spark):
    """Merged per-day HLL partials estimate per-genre distinct listeners
    within the sketch's relative error (default lgConfigK=12 -> ~1.6%
    std error; bound set at 5%), and the merge result must dominate any
    single day's distinct count."""
    import __spark_entry__ as entry_mod
    from music_streaming_etl_glue_spark.operators.kpis import (
        genre_distinct_sketch_rollup,
    )
    from tests.conftest import SF_SMOKE

    rows = genre_distinct_sketch_rollup(
        entry_mod._enriched(spark, SF_SMOKE)
    ).collect()
    assert rows
    for r in rows:
        exact = r.exact_unique_listeners
        assert exact > 0
        assert abs(r.est_unique_listeners - exact) / exact <= 0.05
