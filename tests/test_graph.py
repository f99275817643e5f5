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
