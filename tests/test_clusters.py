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


# ---------------------------------------------------------------------------
# large-star / small-star (two-phase) connected components
# ---------------------------------------------------------------------------

def _components_two_phase(spark, edge_pairs, n_vertices, stats=None):
    from music_streaming_etl_glue_spark.operators.clusters import (
        connected_components_two_phase,
    )

    vertices = spark.range(n_vertices).select(F.col("id"))
    edges = spark.createDataFrame(edge_pairs, "src bigint, dst bigint")
    rows = connected_components_two_phase(
        vertices, edges, stats=stats
    ).collect()
    return {r.id: r.cluster_id for r in rows}


def test_two_phase_matches_min_label_on_random_graph(spark):
    """Same labels as min-label propagation on a random graph with mixed
    components, cycles, and singletons — the contract both kernels share."""
    import random

    rng = random.Random(5)
    n = 300
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(220)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _components_two_phase(spark, edges, n)
    want = _components(spark, edges, n)
    assert got == want


def test_two_phase_chain_is_logarithmic(spark):
    """The verdict's acceptance test: a 10k-vertex chain (diameter ≈ n,
    the worst case for min-label) must converge in O(log n) rounds —
    every vertex labeled 0."""
    import math

    n = 10_000
    stats: dict = {}
    got = _components_two_phase(
        spark, [(i, i + 1) for i in range(n - 1)], n, stats=stats
    )
    assert got == {i: 0 for i in range(n)}
    bound = 2 * math.log2(n) + 6
    assert stats["rounds"] <= bound, f"{stats['rounds']} rounds > {bound}"


def test_two_phase_singletons_cycles_and_parallel_edges(spark):
    got = _components_two_phase(
        spark, [(0, 1), (1, 2), (2, 0), (2, 1), (4, 3)], 6
    )
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_min_label_raises_on_iteration_cap(spark):
    """Un-converged labels are wrong data — the cap must fail loudly,
    not return silently (round-2 ADVICE)."""
    import pytest

    vertices = spark.range(40).select(F.col("id"))
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(vertices, edges, max_iterations=3)


def test_triangle_stats_known_graph(spark):
    """K4 plus a pendant vertex: 4 triangles, wedges = sum deg(deg-1)/2
    = 3*3 + 6 + 0... computed explicitly below; transitivity checks the
    3T/wedges formula end to end."""
    from music_streaming_etl_glue_spark.operators.clusters import (
        triangle_stats,
    )

    # K4 on {0,1,2,3} + pendant edge (3,4); duplicate + reversed edges
    # must not change the census
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (1, 0)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    row = triangle_stats(df).collect()[0]
    assert row.n_nodes == 5
    assert row.n_edges == 7
    assert row.n_triangles == 4
    # degrees: 0,1,2 -> 3; 3 -> 4; 4 -> 1  => wedges = 3*3 + 6 + 0 = 15
    assert row.n_wedges == 15
    assert abs(row.transitivity - 3 * 4 / 15) < 1e-9


def test_triangle_stats_triangle_free(spark):
    from music_streaming_etl_glue_spark.operators.clusters import (
        triangle_stats,
    )

    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint"
    )
    row = triangle_stats(df).collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == 2
    assert row.transitivity == 0.0


def test_triangle_stats_random_graph_vs_reference(spark):
    """Degree-ordered enumeration equals a brute-force reference count on
    a deterministic pseudo-random graph with a planted hub (the skew
    shape the orientation exists for: the hub's edges all point INTO it,
    so its quadratic wedge set never enters the join)."""
    import hashlib
    from itertools import combinations

    from music_streaming_etl_glue_spark.operators.clusters import (
        triangle_stats,
    )

    n = 24
    edges = {
        (a, b)
        for a, b in combinations(range(n), 2)
        if int(hashlib.md5(f"{a}:{b}".encode()).hexdigest(), 16) % 5 == 0
    }
    edges |= {(0, i) for i in range(1, n)}  # hub: node 0 touches everyone
    expect = sum(
        1
        for a, b, c in combinations(range(n), 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    df = spark.createDataFrame(sorted(edges), "src bigint, dst bigint")
    row = triangle_stats(df).collect()[0]
    assert row.n_triangles == expect
    assert row.n_edges == len(edges)


def test_label_propagation_matches_reference_sim(spark):
    """Two 4-cliques joined by one bridge edge: connected components
    would merge everything; LP must keep two communities. The expected
    labels come from an exact local simulation of the same rule
    (most-frequent neighbor label, ties to the smallest)."""
    from music_streaming_etl_glue_spark.operators.clusters import (
        LABELPROP_ITERATIONS,
        label_propagation,
    )

    cliq_a = [1, 2, 3, 4]
    cliq_b = [10, 11, 12, 13]
    und = [(a, b) for i, a in enumerate(cliq_a) for b in cliq_a[i + 1:]]
    und += [(a, b) for i, a in enumerate(cliq_b) for b in cliq_b[i + 1:]]
    und.append((4, 10))  # bridge
    sym = und + [(b, a) for a, b in und]
    verts = spark.createDataFrame([(v,) for v in cliq_a + cliq_b], "id long")
    edges = spark.createDataFrame(sym, "src long, dst long")

    # exact reference simulation
    labels = {v: v for v in cliq_a + cliq_b}
    neigh = {}
    for s, d in sym:
        neigh.setdefault(d, []).append(s)
    for _ in range(LABELPROP_ITERATIONS):
        new = {}
        for v in labels:
            votes = {}
            for u in neigh.get(v, []):
                votes[labels[u]] = votes.get(labels[u], 0) + 1
            if votes:
                best = max(votes.values())
                new[v] = min(l for l, c in votes.items() if c == best)
            else:
                new[v] = labels[v]
        labels = new

    got = {r.id: r.label for r in label_propagation(verts, edges).collect()}
    assert got == labels
    # the bridge did not merge the cliques
    assert {labels[v] for v in cliq_a}.isdisjoint({labels[v] for v in cliq_b})


def test_track_reach_bfs_contract(spark):
    """Recursive-CTE BFS: seed at depth 0, every depth-(d+1) node has a
    depth-d in-neighbor, and no node exceeds the depth bound or the
    reachable set of the capped graph."""
    from music_streaming_etl_glue_spark.operators.clusters import (
        REACH_MAX_DEPTH,
        strongest_neighbor_edges,
        track_reach,
    )

    import __spark_entry__ as entry_mod

    enriched = entry_mod.queries()["enriched"](spark, SF_SMOKE)
    reach = {
        r.track_id: r.min_depth for r in track_reach(enriched).collect()
    }
    edges = {
        (r.src, r.dst)
        for r in strongest_neighbor_edges(enriched).collect()
    }
    seed = min(s for s, _ in edges)
    assert reach[seed] == 0
    assert max(reach.values()) <= REACH_MAX_DEPTH
    # BFS invariant: a node at depth d+1 has a predecessor at depth d
    for node, d in reach.items():
        if d == 0:
            continue
        assert any(
            (src, node) in edges and reach.get(src) == d - 1
            for src in reach
        ), (node, d)


def test_personalized_pagerank_concentrates_mass_at_seed(spark):
    """PPR on a star graph: the seed (center) holds the most mass, all
    teleport mass returns to it, and a disconnected vertex scores 0."""
    from music_streaming_etl_glue_spark.operators.clusters import (
        personalized_pagerank,
    )

    verts = spark.createDataFrame([(i,) for i in range(6)], "id long")
    # star centered at 0 over 1..4; vertex 5 disconnected
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)],
        "src long, dst long",
    )
    r = {row.id: row.rank for row in personalized_pagerank(verts, edges, 0).collect()}
    assert r[5] == 0.0
    assert r[0] == max(r.values())
    assert all(abs(r[i] - r[1]) < 1e-12 for i in range(2, 5))


def test_multi_seed_ppr_matches_per_seed_runs(spark):
    """The batched (seed, id) iteration must be bit-identical to running
    each personalized walk separately — batching changes shuffle count,
    never values."""
    from music_streaming_etl_glue_spark.operators.clusters import (
        personalized_pagerank,
        personalized_pagerank_multi,
    )

    verts = spark.createDataFrame([(i,) for i in range(8)], "id long")
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 5), (5, 6)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    batched = {
        (r.seed, r.id): r.rank
        for r in personalized_pagerank_multi(verts, edges, [0, 5]).collect()
    }
    for seed in (0, 5):
        single = {
            r.id: r.rank
            for r in personalized_pagerank(verts, edges, seed).collect()
        }
        for vid, rank in single.items():
            assert batched[(seed, vid)] == rank, (seed, vid)
