"""Proximity-graph ANN (r13): builder invariants + beam-probe
contract. The recall/scan measurement itself is the rows-only dial
`embedding_graph_beam_recall` (parity-swept per round; 0.905 recall
at 0.3125 visited fraction measured at sf0.1 — PERF.md r13)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grapho_spark.queries.embeddings import (
    _GRAPH_DEG,
    _GRAPH_MAX_SHARD_ROWS,
    ann_graph_table,
    embedding_graph_beam_recall,
)


def test_graph_table_invariants(spark, sf_dir):
    g = ann_graph_table(spark, sf_dir)
    rows = g.collect()
    ids = {r["vec_id"] for r in rows}
    adj = {r["vec_id"]: list(r["nbrs"]) for r in rows}
    # every endpoint is a corpus vector; no self-loops; sorted arrays
    for v, ns in adj.items():
        assert v not in ns
        assert ns == sorted(ns)
        assert set(ns) <= ids
    # symmetric (reverse edges unioned)
    for v, ns in adj.items():
        for u in ns:
            assert v in adj[u], (v, u)
    # pruned out-degree bound holds BEFORE symmetrization, so the
    # symmetric degree stays O(deg); assert a generous cap
    assert max(len(ns) for ns in adj.values()) <= 6 * _GRAPH_DEG
    # deterministic: a second call returns the persisted table
    g2 = ann_graph_table(spark, sf_dir)
    assert sorted(map(tuple, g2.collect())) == sorted(map(tuple, rows))


def test_graph_shard_gate(spark, sf_dir, monkeypatch):
    import grapho_spark.queries.embeddings as emb

    monkeypatch.setattr(emb, "_GRAPH_MAX_SHARD_ROWS", 1)
    with pytest.raises(ValueError, match="ONE shard"):
        emb.ann_graph_table(spark, sf_dir, pred="vec_id > -1")
    assert _GRAPH_MAX_SHARD_ROWS > 1  # module constant untouched


def test_beam_recall_shape_and_bounds(spark, sf_dir):
    row = embedding_graph_beam_recall(spark, sf_dir).collect()[0]
    assert row["n_queries"] > 0
    assert 0.0 <= row["avg_recall"] <= 1.0
    assert 0.0 < row["scan_fraction"] <= 1.0
    # tiny SFs saturate: the beam must still find the exact top-3
    # when it visits most of the corpus
    if row["scan_fraction"] > 0.7:
        assert row["avg_recall"] == 1.0
