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
