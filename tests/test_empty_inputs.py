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


def test_round2_operators_on_empty_inputs(spark):
    from music_streaming_etl_glue_spark.operators import behavior, relational
    from music_streaming_etl_glue_spark.operators.asof import (
        events_in_error_bursts,
    )
    from music_streaming_etl_glue_spark.operators.clusters import (
        connected_components,
        pagerank,
    )

    events = _empty(spark, EVENTS_DDL)
    assert behavior.user_retention_cohorts(events).count() == 0
    assert behavior.events_rollup(events).count() == 0
    assert behavior.sample_per_group(events).count() == 0
    assert behavior.view_days_without_purchase(events).count() == 0
    assert behavior.user_first_last_event(events).count() == 0
    assert events_in_error_bursts(events).count() == 0
    # funnel on empty input: one row of zero counts, rate null
    row = behavior.conversion_funnel(events).collect()[0]
    assert row.n_users == 0 and row.n_purchased == 0

    lineitem = _empty(
        spark,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_linestatus string,"
        " l_shipdate timestamp",
    )
    orders = _empty(
        spark,
        "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    part = _empty(
        spark, "p_partkey long, p_brand string, p_type string, p_size int"
    )
    assert relational.line_priority_counts(lineitem, orders).count() == 0
    assert relational.small_quantity_revenue(lineitem, part).count() == 1

    # graph kernels on empty graphs
    verts = _empty(spark, "id long")
    edges = _empty(spark, "src long, dst long")
    assert connected_components(verts, edges).count() == 0
    assert pagerank(verts, edges).count() == 0


def test_round3_operators_on_empty_inputs(spark):
    import pytest

    from music_streaming_etl_glue_spark.operators.clusters import (
        connected_components_two_phase,
    )
    from music_streaming_etl_glue_spark.operators.dedup import (
        rebalance_sources,
    )
    from music_streaming_etl_glue_spark.operators.similarity import (
        cosine_pairs_lsh,
    )
    from music_streaming_etl_glue_spark.operators.text import (
        ngram_decontamination,
        pack_chunks,
    )

    docs = _empty(
        spark,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert pack_chunks(docs).count() == 0
    assert ngram_decontamination(docs).count() == 0
    assert rebalance_sources(docs).count() == 0

    # two-phase CC with no edges: every vertex is its own cluster
    verts = spark.range(4).select(F.col("id"))
    edges = _empty(spark, "src long, dst long")
    got = {
        r.id: r.cluster_id
        for r in connected_components_two_phase(verts, edges).collect()
    }
    assert got == {i: i for i in range(4)}

    # similarity ops need a known dimensionality — clear error, not a
    # NoneType crash
    embs = _empty(spark, "vec_id long, embedding array<float>, label int")
    with pytest.raises(ValueError, match="empty"):
        cosine_pairs_lsh(embs)


def test_round4_second_wave_on_empty_inputs(spark):
    """Triangles, SCD2 collapse, CMS, geomean UDAF, and PQ training must
    survive 0-row inputs (PQ trains an empty codebook and encodes zero
    vectors — subspace slicing uses static dims, so nothing dereferences
    a first row)."""
    from music_streaming_etl_glue_spark.operators import (
        clusters,
        relational,
        similarity,
    )

    events = _empty(spark, EVENTS_DDL)
    assert analytics.cms_track_estimates(events).count() == 0
    assert analytics.geomean_value_by_type(events).count() == 0

    edges = _empty(spark, "src long, dst long")
    row = clusters.triangle_stats(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (0, 0, 0)
    assert row.transitivity == 0.0

    orders = _empty(
        spark,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_orderdate date",
    )
    assert relational.customer_status_history(orders).count() == 0

    embs = _empty(spark, "vec_id long, embedding array<float>, label string")
    assert similarity.pq_codes(embs).count() == 0
    assert similarity.pq_codebooks(embs).count() == 0


def test_third_wave_on_empty_inputs(spark):
    """Series similarity/DTW, DAU/WAU, power curve, incremental dedup,
    and decay scoring on 0-row inputs: empty results, no crashes (the
    null min/max calendar bounds must collapse to an empty spine)."""
    from music_streaming_etl_glue_spark.operators import behavior, dedup

    events = _empty(spark, EVENTS_DDL)
    assert behavior.rolling_active_users(events).count() == 0
    assert behavior.power_user_curve(events).count() == 0
    assert behavior.genre_series_similarity(events).count() == 0
    assert behavior.genre_series_dtw(events).count() == 0
    docs = _empty(spark, "doc_id long, text string, lang string, source string, n_chars long")
    assert dedup.dedup_incremental(docs).count() == 0


def test_fourth_wave_on_empty_inputs(spark):
    docs = _empty(
        spark,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert text.quality_filter_rules(docs).count() == 0
    assert text.boilerplate_shingles(docs).count() == 0
    assert text.remove_boilerplate(docs).count() == 0
    assert dedup.temperature_mix(docs).count() == 0


def test_fifth_wave_on_empty_inputs(spark):
    """Recovery join, strongest-neighbor edges, and recursive-CTE reach
    on 0-row inputs: the BFS anchor (MIN over an empty edge set) must
    yield an empty reachability relation, not a null seed row."""
    from music_streaming_etl_glue_spark.operators import clusters
    from music_streaming_etl_glue_spark.operators.asof import (
        error_recovery_clicks,
    )
    from music_streaming_etl_glue_spark.operators.enrich import enrich_events

    events = _empty(spark, EVENTS_DDL)
    assert error_recovery_clicks(events).count() == 0

    customer = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")
    enriched = enrich_events(events, customer, nation)
    assert clusters.strongest_neighbor_edges(enriched).count() == 0
    assert clusters.track_reach(enriched).count() == 0


def test_sixth_wave_on_empty_inputs(spark):
    """Bigram scorer, schedule/shuffle/budget samplers, phash rungs,
    nested aggregation, diff, and PSI on 0-row inputs: empty (or
    all-smoothing) results, no crashes."""
    from music_streaming_etl_glue_spark.operators import (
        dedup,
        multimodal,
        relational,
    )
    from music_streaming_etl_glue_spark.operators.text import bigram_surprisal
    from music_streaming_etl_glue_spark.plans.quality import psi_drift
    from music_streaming_etl_glue_spark.plans.snapshot_diff import dataset_diff

    docs = _empty(
        spark,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert bigram_surprisal(docs).count() == 0
    assert dedup.corpus_shuffle(docs).count() == 0
    assert dedup.token_budget_sample(docs).count() == 0
    assert dedup.interleave_sources(docs).count() == 0
    assert multimodal.phash_fingerprints(docs).count() == 0
    assert multimodal.phash_near_dups(docs).count() == 0

    li = _empty(
        spark,
        "l_orderkey long, l_partkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double",
    )
    assert relational.nested_order_lines(li).count() == 0

    assert dataset_diff(docs, docs, "doc_id", ["text"]).count() == 0
    # degenerate PSI: both sides empty -> smoothing-only bins, zero drift
    drift = psi_drift(docs.selectExpr("doc_id", "n_chars as v"),
                      docs.selectExpr("doc_id", "n_chars as v"), "v")
    rows = drift.collect()
    assert len(rows) == 10
    assert all(abs(r.psi_term) < 1e-12 for r in rows)
