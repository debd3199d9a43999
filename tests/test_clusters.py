from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)
from tests.conftest import SF_SMOKE


def _components(spark, edge_pairs, n_vertices):
    vertices = spark.range(n_vertices).select(F.col("id"))
    edges = spark.createDataFrame(edge_pairs, "src bigint, dst bigint")
    rows = connected_components(vertices, edges).collect()
    return {r.id: r.cluster_id for r in rows}

def test_chain_converges_to_min_label(spark):
    """A 6-vertex chain needs diameter-many propagation rounds — the
    convergence loop must keep going until labels stop moving, not stop
    after one round."""
    got = _components(spark, [(i, i + 1) for i in range(5)], 6)
    assert got == {i: 0 for i in range(6)}


def test_singletons_and_separate_components(spark):
    got = _components(spark, [(1, 2), (4, 3)], 6)
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 3, 5: 5}


def test_cycle_terminates(spark):
    got = _components(spark, [(0, 1), (1, 2), (2, 0)], 3)
    assert got == {0: 0, 1: 0, 2: 0}


def test_dedup_clusters_covers_every_document(spark):
    from music_streaming_etl_glue_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    clusters = dedup_clusters(docs)
    assert clusters.count() == docs.count()
    # cluster_id is always a member doc_id and never exceeds its doc_id
    bad = clusters.filter(F.col("cluster_id") > F.col("doc_id")).count()
    assert bad == 0
    reps = clusters.select(F.col("cluster_id").alias("doc_id")).distinct()
    missing = reps.join(clusters.select("doc_id").distinct(), "doc_id", "left_anti")
    assert missing.count() == 0


def test_pagerank_star_graph(spark):
    """On a 5-vertex star the hub must dominate, leaves tie exactly, and
    (no dangling vertices) total mass stays ~1 each iteration."""
    from music_streaming_etl_glue_spark.operators.clusters import pagerank

    vertices = spark.range(5).select(F.col("id"))
    spokes = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(
        spokes + [(b, a) for a, b in spokes], "src bigint, dst bigint"
    )
    got = {r.id: r.rank for r in pagerank(vertices, edges).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert got[0] == max(got.values())
    leaf_ranks = {round(got[i], 12) for i in range(1, 5)}
    assert len(leaf_ranks) == 1
