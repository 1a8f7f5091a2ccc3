"""Behavioral tests for PageRank (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators import graph


def _edges(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def test_symmetric_cycle_ranks_uniform(spark):
    # 4-cycle: perfect symmetry -> identical ranks, total mass ~1
    out = graph.pagerank(
        _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]), iters=5
    ).collect()
    ranks = {r["node"]: r["rank_micro"] for r in out}
    assert len(set(ranks.values())) == 1
    total = sum(ranks.values())
    assert abs(total - 1_000_000) < 100  # micro-unit truncation only


def test_hub_outranks_leaves(spark):
    # star: hub 0 connected to 5 leaves
    out = graph.pagerank(
        _edges(spark, [(0, i) for i in range(1, 6)]), iters=4
    ).collect()
    ranks = {r["node"]: r["rank_micro"] for r in out}
    assert all(ranks[0] > ranks[i] for i in range(1, 6))
    leaf_ranks = {ranks[i] for i in range(1, 6)}
    assert len(leaf_ranks) == 1  # leaves are symmetric


def test_pagerank_deterministic_across_runs_and_layouts(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2)])
    a = sorted(
        (r["node"], r["rank_micro"])
        for r in graph.pagerank(e, iters=3).collect()
    )
    b = sorted(
        (r["node"], r["rank_micro"])
        for r in graph.pagerank(e.repartition(7), iters=3).collect()
    )
    assert a == b


def test_disconnected_components_share_mass_by_size(spark):
    # triangle + single edge: all nodes get base mass; triangle nodes
    # equal each other, pair nodes equal each other
    out = graph.pagerank(
        _edges(spark, [(0, 1), (1, 2), (0, 2), (10, 11)]), iters=4
    ).collect()
    ranks = {r["node"]: r["rank_micro"] for r in out}
    assert ranks[0] == ranks[1] == ranks[2]
    assert ranks[10] == ranks[11]
    assert all(v > 0 for v in ranks.values())


def test_triangles_known_graph(spark):
    """K4 (4 triangles) + a hub star (0 triangles) + one extra triangle
    sharing a K4 vertex — every triangle found exactly once, canonical
    ascending ids."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    star = [(10, i) for i in range(20, 28)]  # hub: no closed wedges
    extra = [(4, 50), (4, 51), (50, 51)]
    pairs = spark.createDataFrame(k4 + star + extra, "doc_a long, doc_b long")
    out = sorted(
        tuple(r) for r in graph.triangles(pairs).collect()
    )
    assert out == [
        (1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4), (4, 50, 51),
    ]


def test_triangles_input_order_and_duplicates_are_irrelevant(spark):
    """Reversed pairs and duplicate rows must not create duplicate or
    phantom triangles (the operator symmetrizes + dedups internally)."""
    pairs = spark.createDataFrame(
        [(2, 1), (1, 3), (3, 2), (2, 3), (3, 1)], "doc_a long, doc_b long"
    )
    out = [tuple(r) for r in graph.triangles(pairs).collect()]
    assert out == [(1, 2, 3)]


def test_kcore_peels_tendrils_keeps_clique(spark):
    """K4 plus a pendant path: 2-core keeps exactly the K4 (each with
    degree 3); the path peels away over successive rounds."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    path = [(4, 10), (10, 11), (11, 12)]
    pairs = spark.createDataFrame(k4 + path, "doc_a long, doc_b long")
    out = {r["node"]: r["degree"] for r in graph.kcore(pairs, k=2, rounds=5).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
