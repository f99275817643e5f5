"""connected_components unit tests (operators/graph.py): known shapes
whose closure is obvious, including a chain long enough to force several
propagation rounds."""

from __future__ import annotations

from bigdatacw1_spark.operators.graph import connected_components, dedup_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.node: r.comp for r in connected_components(df).collect()}


def test_two_triangles_and_a_bridge(spark):
    # {1,2,3} and {10,11,12} joined by 3-10 → one component rooted at 1;
    # {20,21} separate.
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10), (20, 21)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 12: 1, 20: 20, 21: 20}


def test_long_chain_needs_multiple_rounds(spark):
    # 0-1-2-...-12: diameter 12, min label must walk the whole chain.
    edges = [(i, i + 1) for i in range(12)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_direction_and_duplicates_ignored(spark):
    edges = [(5, 4), (4, 5), (4, 3), (3, 4), (5, 4)]
    got = _cc(spark, edges)
    assert got == {3: 3, 4: 3, 5: 3}


def test_dedup_clusters_column_contract(spark):
    pairs = spark.createDataFrame([(7, 8), (8, 9), (100, 200)], ["a", "b"])
    rows = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert rows == {7: 7, 8: 7, 9: 7, 100: 100, 200: 100}


def test_pagerank_star_center_dominates_and_is_deterministic(spark):
    from bigdatacw1_spark.operators.graph import PR_SCALE, pagerank

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (5, 6)], "src bigint, dst bigint"
    )
    r1 = {r.node: r.rank_units for r in pagerank(edges, iterations=8).collect()}
    r2 = {r.node: r.rank_units for r in pagerank(edges, iterations=8).collect()}
    assert r1 == r2  # bitwise reproducible
    # star center out-ranks its leaves; symmetric pair ranks are equal
    assert r1[1] > r1[2] == r1[3] == r1[4]
    assert r1[5] == r1[6]
    # mass conservation up to deterministic floor drift (< 1 unit/node/hop)
    total = sum(r1.values())
    n = len(r1)
    assert n * PR_SCALE >= total > n * PR_SCALE - n * 8 * 100


def test_pagerank_partitioning_invariance(spark):
    from bigdatacw1_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7) % 20) for i in range(20)], "src bigint, dst bigint"
    ).where("src != dst")
    a = {r.node: r.rank_units for r in pagerank(edges, iterations=6).collect()}
    b = {
        r.node: r.rank_units
        for r in pagerank(edges.repartition(13), iterations=6).collect()
    }
    assert a == b


def test_bfs_levels_min_hops_and_bounded_depth(spark):
    from bigdatacw1_spark.operators.graph import bfs_levels

    #    1-2-3-4-5   and 1-3 shortcut; 9-10 disconnected
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3), (9, 10)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    out = {r["node"]: r["hops"] for r in bfs_levels(edges, seeds, max_hops=2).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}  # 5 beyond bound; 9/10 unreachable
    full = {r["node"]: r["hops"] for r in bfs_levels(edges, seeds, max_hops=10).collect()}
    assert full[5] == 3 and 9 not in full


def test_triangle_count_exact_on_known_graph(spark):
    """K4 (every node in C(3,2)=3 triangles) + a star center (0
    triangles) + duplicate and self-loop edges that must be ignored."""
    from bigdatacw1_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    star = [(10, 11), (10, 12), (10, 13), (11, 10)]  # reverse duplicate
    junk = [(1, 1), (2, 1)]  # self-loop, reverse duplicate of K4 edge
    edges = spark.createDataFrame(k4 + star + junk, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 10: 0, 11: 0, 12: 0, 13: 0}


def test_shortest_paths_weighted_beats_fewer_hops(spark):
    """The 2-hop cheap route (0.1+0.1) must beat the direct 1-hop edge
    (1.0) — distance is weight, not hop count; and a node beyond
    max_hops stays unreached."""
    from bigdatacw1_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [
            (1, 2, 1.0),   # direct but expensive
            (1, 3, 0.1), (3, 2, 0.1),  # two cheap hops
            (2, 4, 0.1),   # reachable only via 2
            (4, 5, 0.1),   # 3+ hops from source set at max_hops=3 via cheap chain
        ],
        "src long, dst long, weight double",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"] for r in shortest_paths(edges, seeds, max_hops=3).collect()}
    assert got[1] == 0.0
    assert abs(got[2] - 0.2) < 1e-12   # cheap 2-hop route wins
    assert abs(got[3] - 0.1) < 1e-12
    assert abs(got[4] - 0.30000000000000004) < 1e-15  # path-order float sum
    # 5 is 4 hops along the CHEAP chain (excluded at max_hops=3) but 3 hops
    # via the expensive direct edge: 1.0 + 0.1 + 0.1
    assert abs(got[5] - 1.2) < 1e-9
    assert shortest_paths(edges, seeds, max_hops=2).where("node = 5").count() == 0


def test_shortest_paths_directed_respects_edge_direction(spark):
    from bigdatacw1_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame([(1, 2, 0.5)], "src long, dst long, weight double")
    seeds = spark.createDataFrame([(2,)], "node long")
    undirected = shortest_paths(edges, seeds, max_hops=2)
    directed = shortest_paths(edges, seeds, max_hops=2, directed=True)
    assert {r["node"] for r in undirected.collect()} == {1, 2}
    assert {r["node"] for r in directed.collect()} == {2}  # no 2→1 edge


def test_pointer_jumping_cc_equals_propagation_and_converges_faster(spark):
    """On a long chain (worst case for plain propagation) the jumping
    variant must produce identical canonical labels while plain
    propagation at the same round budget has NOT yet converged — the
    O(log n) vs O(diameter) separation, observed rather than claimed."""
    from pyspark.sql import functions as F

    from bigdatacw1_spark.operators.graph import (
        connected_components,
        connected_components_jump,
    )

    n = 64  # chain 0-1-2-...-63: diameter 63
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    jump = connected_components_jump(chain, max_iter=10)
    got = {(r.node, r.comp) for r in jump.collect()}
    assert got == {(i, 0) for i in range(n)}  # one component, min-id label

    slow = connected_components(chain, max_iter=10)
    not_done = slow.where(F.col("comp") != 0).count()
    assert not_done > 0  # same budget, propagation still mid-flight

    # random graph: both algorithms agree exactly
    import random

    rng = random.Random(11)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(45)]
    e = spark.createDataFrame(edges, "src long, dst long").where("src != dst")
    a = {(r.node, r.comp) for r in connected_components(e, max_iter=25).collect()}
    b = {(r.node, r.comp) for r in connected_components_jump(e).collect()}
    assert a == b


def test_kcore_peels_tails_keeps_clique(spark):
    """A triangle with a pendant tail: the 2-core is exactly the
    triangle; the tail (degree 1) peels in round one. A path graph has
    an EMPTY 2-core."""
    from bigdatacw1_spark.operators.graph import kcore_membership

    tri_tail = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = kcore_membership(tri_tail, k=2, rounds=4)
    rows = got.collect()
    assert {r.node for r in rows} == {1, 2, 3}
    assert all(r.stable for r in rows)

    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert kcore_membership(path, k=2, rounds=4).count() == 0


def test_lpa_splits_two_cliques_joined_by_bridge(spark):
    """Two 4-cliques joined by one bridge edge: LPA assigns each clique
    its own community (CC would merge them into one component)."""
    from bigdatacw1_spark.operators.graph import label_propagation

    def clique(nodes):
        return [(a, b) for a in nodes for b in nodes if a < b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.community for r in label_propagation(e, rounds=3).collect()}
    left = {got[n] for n in (1, 2, 3)}
    right = {got[n] for n in (11, 12, 13)}
    assert len(left) == 1 and len(right) == 1
    assert left != right  # the bridge does NOT merge the communities
