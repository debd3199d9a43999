"""Hostile-input hardening: every operator family must handle an EMPTY
input relation (0 rows, correct schema) without crashing — the shape a
partition-pruned read or an off-hours incremental batch produces."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import analytics, dedup, kpis, text
from music_streaming_etl_glue_spark.operators.asof import asof_join
from music_streaming_etl_glue_spark.operators.enrich import enrich_events
from music_streaming_etl_glue_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
DOCS_DDL = "doc_id long, text string"


def _empty(spark, ddl):
    return spark.createDataFrame([], ddl)


def test_kpis_on_empty_events(spark):
    events = _empty(spark, EVENTS_DDL)
    customer = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")
    enriched = enrich_events(events, customer, nation)
    assert enriched.count() == 0
    assert kpis.user_kpis(enriched).count() == 0
    assert kpis.genre_daily_metrics(enriched).count() == 0
    assert kpis.genre_top_songs(enriched).count() == 0
    assert kpis.trending_tracks(enriched).count() == 0
    assert kpis.genre_daily_moving_avg(enriched).count() == 0


def test_sessionization_on_empty_events(spark):
    events = _empty(spark, EVENTS_DDL)
    assert analytics.user_sessions(events).count() == 0
    assert analytics.user_session_windows(events).count() == 0
    assert analytics.value_histogram(events).count() == 0
    assert analytics.value_percentiles(events).count() == 0


def test_text_and_dedup_on_empty_docs(spark):
    docs = _empty(spark, DOCS_DDL)
    assert text.token_counts(docs).count() == 0
    assert text.repetition_metrics(docs).count() == 0
    assert text.chunk_documents(docs).count() == 0
    assert text.contamination_flags(docs).count() == 0
    assert dedup.dedup_exact(docs).count() == 0
    assert dedup.minhash_dedup_pairs(docs).count() == 0
    assert dedup.simhash_near_dups(docs).count() == 0
    assert dedup.ngram_jaccard_pairs(docs).count() == 0


def test_asof_with_empty_right_keeps_left(spark):
    import datetime as dt

    left = spark.createDataFrame(
        [(1, 7, dt.datetime(2024, 1, 1))],
        "event_id long, user_id long, ts timestamp",
    )
    right = _empty(spark, "user_id long, ts timestamp, value double")
    rows = asof_join(left, right, key="user_id", right_values=["value"]).collect()
    assert len(rows) == 1
    assert rows[0].asof_value is None and rows[0].asof_ts is None


def test_skyline_on_empty_part(spark):
    part = _empty(spark, "p_partkey long, p_size int, p_retailprice double")
    assert analytics.skyline_parts(part).count() == 0
