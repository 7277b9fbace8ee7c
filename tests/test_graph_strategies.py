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
