"""Strategy-selection equivalence: the distributed branch of the graph
queries (taken when the edge count exceeds DRIVER_GRAPH_THRESHOLD)
must produce exactly the driver-side branch's labeling/ranks. At
fixture scale only the driver branch runs naturally, so these tests
force the distributed branch by lowering the threshold."""

from __future__ import annotations

import pytest

import grapho_spark.queries.graph as G

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def force_distributed(monkeypatch):
    monkeypatch.setattr(G, "DRIVER_GRAPH_THRESHOLD", 0)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_connected_components_distributed_equals_driver(spark, force_distributed):
    dist = _rows(G.graph_connected_components(spark, SF), "node", "component")
    # restore the driver branch for the reference result
    G.DRIVER_GRAPH_THRESHOLD = 1_000_000
    drv = _rows(G.graph_connected_components(spark, SF), "node", "component")
    assert dist == drv


def test_pagerank_distributed_equals_driver(spark, force_distributed):
    dist = _rows(G.graph_pagerank(spark, SF), "node", "pagerank")
    G.DRIVER_GRAPH_THRESHOLD = 1_000_000
    drv = _rows(G.graph_pagerank(spark, SF), "node", "pagerank")
    # same nodes; ranks equal to the 6dp the query rounds to
    assert [n for n, _ in dist] == [n for n, _ in drv]
    assert all(abs(a - b) < 1e-6 for (_, a), (_, b) in zip(dist, drv))


def _edges_df(spark, pairs, typ="long"):
    return spark.createDataFrame(pairs, f"src {typ}, dst {typ}")


def test_lss_equals_pointer_jumping_numeric(spark):
    # Deterministic pseudo-random graph + a deep chain (pointer
    # jumping's worst case) + singleton-ish isolated pairs.
    from grapho_spark.analytics import (
        connected_components,
        connected_components_lss,
    )

    pairs = [(i, i + 1) for i in range(0, 60)]  # chain: diameter 60
    pairs += [(100 + (i * 7) % 40, 100 + (i * 11) % 40) for i in range(40)]
    pairs += [(200, 201), (300, 300)]  # pair + self-loop
    e = _edges_df(spark, pairs)
    a = _rows(connected_components(e), "node", "component")
    b = _rows(connected_components_lss(e), "node", "component")
    assert a == b
    # chain collapses to one component rooted at 0
    assert all(c == 0 for n, c in b if n <= 60)


def test_lss_equals_pointer_jumping_string_ids(spark):
    from grapho_spark.analytics import (
        connected_components,
        connected_components_lss,
    )

    pairs = [(f"n{i:03d}", f"n{(i + 1):03d}") for i in range(0, 25)]
    pairs += [("za", "zb"), ("zb", "zc"), ("solo1", "solo2")]
    e = _edges_df(spark, pairs, typ="string")
    a = _rows(connected_components(e), "node", "component")
    b = _rows(connected_components_lss(e), "node", "component")
    assert a == b
    assert ("zc", "za") in b


def test_wedge_cap_bounds_supernode_fanout(spark):
    """WEDGE_CAP guard (r7): on a synthetic star graph with one
    super-node of degree 500, capped adjacency keeps at most cap
    neighbors per node — deterministically the smallest ids — so wedge
    fan-out through the hub is bounded by cap^2 instead of deg^2; all
    sub-cap nodes keep their full adjacency (exactness below the cap)."""
    from pyspark.sql import functions as F

    hub_edges = [(0, i) for i in range(1, 501)] + [(1, 2), (2, 3)]
    edges = spark.createDataFrame(hub_edges, "p1 long, p2 long")
    sym = G.sym_edges(edges)
    capped = G.capped_adjacency(sym, cap=64)
    per_node = {
        r.src: (r.n, r.lo, r.hi)
        for r in capped.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("dst").alias("lo"),
            F.max("dst").alias("hi"),
        )
        .collect()
    }
    # hub truncated to its 64 SMALLEST neighbor ids (deterministic)
    assert per_node[0] == (64, 1, 64)
    # sub-cap nodes keep full adjacency: node 2 has neighbors {0,1,3}
    assert per_node[2] == (3, 0, 3)
    # idempotent under re-run (no nondeterministic tie-breaks)
    again = {
        r.src: r.n
        for r in G.capped_adjacency(sym, cap=64)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert again == {k: v[0] for k, v in per_node.items()}


def test_wedge_cap_exact_at_test_sf(spark):
    """At fixture SFs the max co-purchase degree is far below
    WEDGE_CAP, so the capped operators are bit-equal to the exact
    oracle (graph_wedge_cap_stats certifies it)."""
    row = G.graph_wedge_cap_stats(spark, SF).collect()[0]
    assert row.wedge_paths_exact is True
    assert row.n_capped_nodes == 0
    assert row.max_degree <= G.WEDGE_CAP


def test_multi_source_bfs_equals_per_source_bfs(spark):
    from grapho_spark.analytics import bfs, multi_source_bfs

    # path 1-2-3-4-5 plus a branch 2-6; directed symmetric closure
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6)], "src long, dst long"
    )
    sym = edges.unionAll(edges.selectExpr("dst as src", "src as dst"))
    sources = spark.createDataFrame([(1,), (4,)], "node long")
    multi = {
        (r.source, r.node): r.hops
        for r in multi_source_bfs(sym, sources, max_hops=3).collect()
    }
    for s in (1, 4):
        start = spark.createDataFrame([(s,)], "node long")
        single = {r.node: r.hops for r in bfs(sym, start, max_hops=3).collect()}
        got = {n: h for (src, n), h in multi.items() if src == s}
        assert got == single, (s, got, single)
