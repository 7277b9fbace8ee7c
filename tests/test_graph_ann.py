"""Proximity-graph ANN (r13, resharded r14): NN-descent builder
invariants + convergence pin, SPANN-style multi-shard build, and the
beam-probe contract. The recall/scan measurement itself is the
rows-only dial `embedding_graph_beam_recall` (parity-swept per
round; 0.905 recall at 0.3125 visited measured at sf0.1 on the r13
exact build — r14's NN-descent build must hold that bar, re-measured
in PERF.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from grapho_spark.queries.embeddings import (
    _GRAPH_DEG,
    _GRAPH_POOL,
    _nnd_edges,
    _spark_cosine,
    ann_graph_table,
    ann_graph_tables,
    embedding_graph_beam_recall,
    embedding_graph_sharded_recall,
)
from grapho_spark.tables import load_table


def test_graph_table_invariants(spark, sf_dir):
    g = ann_graph_table(spark, sf_dir)
    rows = g.collect()
    shard_of = {r["vec_id"]: r["shard"] for r in rows}
    adj = {r["vec_id"]: list(r["nbrs"]) for r in rows}
    ids = set(adj)
    # every endpoint is a corpus vector IN THE SAME SHARD; no
    # self-loops; sorted arrays
    for v, ns in adj.items():
        assert v not in ns
        assert ns == sorted(ns)
        assert set(ns) <= ids
        for u in ns:
            assert shard_of[u] == shard_of[v]
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


def test_nnd_converges_to_exact_lists(spark, sf_dir):
    """VERDICT r13 #1 done-bar: NN-descent's top-K lists ≈ the exact
    top-K lists on a small corpus (the n² pass it replaced)."""
    e = load_table(spark, sf_dir, "embeddings")
    va = e.select(
        F.lit(0).alias("shard"),
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    k = _GRAPH_POOL
    approx = _nnd_edges(spark, va, k)
    a = va.select(F.col("vec_id").alias("src"), F.col("v").alias("xa"))
    b = va.select(F.col("vec_id").alias("dst"), F.col("v").alias("xb"))
    w = Window.partitionBy("src").orderBy(F.desc("cos"), "dst")
    exact = (
        a.crossJoin(b)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", _spark_cosine("xa", "xb").alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("src", "dst")
    )
    n_exact = exact.count()
    hit = approx.select("src", "dst").join(exact, ["src", "dst"]).count()
    recall = hit / n_exact
    assert recall >= 0.9, f"NN-descent list recall {recall:.3f} < 0.9"


def test_multi_shard_build_and_routing(spark, sf_dir):
    """Forcing ≥2 shards: the assignment covers the corpus, subgraph
    edges stay within shards, and the centroid table routes."""
    n = load_table(spark, sf_dir, "embeddings").count()
    graph, assign, cents = ann_graph_tables(
        spark, sf_dir, shard_target=max(10, n // 3), ident="testsh"
    )
    shards = {r["shard"] for r in assign.select("shard").distinct().collect()}
    assert len(shards) >= 2
    assert assign.count() == n
    assert cents is not None
    # every graph row's shard equals its assignment
    joined = graph.join(assign.withColumnRenamed("shard", "a_shard"), "vec_id")
    assert joined.filter(F.col("shard") != F.col("a_shard")).count() == 0


def test_beam_recall_shape_and_bounds(spark, sf_dir):
    row = embedding_graph_beam_recall(spark, sf_dir).collect()[0]
    assert row["n_queries"] > 0
    assert 0.0 <= row["avg_recall"] <= 1.0
    assert 0.0 < row["scan_fraction"] <= 1.0
    # tiny SFs saturate: the beam must still find the exact top-3
    # when it visits most of the corpus
    if row["scan_fraction"] > 0.7:
        assert row["avg_recall"] == 1.0


def test_sharded_recall_dial(spark, sf_dir):
    row = embedding_graph_sharded_recall(spark, sf_dir).collect()[0]
    assert row["n_shards"] >= 2
    assert row["probed_shards"] == 2
    assert row["n_queries"] > 0
    assert 0.0 <= row["avg_recall"] <= 1.0
    # probing 2 of >=3 cells must NOT visit the whole corpus
    assert row["scan_fraction"] < 0.95
    # no closure: exactly one membership per vector
    assert row["replication"] == 1.0


def test_graph_delta_append(spark, sf_dir):
    """FreshDiskANN-style delta ingest: appended vectors join the
    merged adjacency with in-shard pruned edges, the append is
    idempotent per batch, and health meters growth."""
    from grapho_spark.queries.embeddings import (
        _GRAPH_APPEND_CAP,
        _GRAPH_SHARD_TARGET,
        _graph_adjacency,
        _graph_tag,
        ann_graph_health,
        append_to_ann_graph,
    )

    n = load_table(spark, sf_dir, "embeddings").count()
    base_pred, batch_pred = "vec_id % 5 != 0", "vec_id % 5 = 0"
    res = append_to_ann_graph(
        spark, sf_dir, base_pred, batch_pred, ident="testd"
    )
    assert res["applied"] is True
    tag = _graph_tag(sf_dir, base_pred, _GRAPH_SHARD_TARGET, "testd", 0.0)
    adj = _graph_adjacency(spark, tag)
    rows = adj.collect()
    members = {(r["shard"], r["vec_id"]) for r in rows}
    # every corpus vector is a member exactly once (single shard here)
    assert len({v for _, v in members}) == n
    by_id = {r["vec_id"]: r for r in rows}
    batch_ids = {
        r["vec_id"]
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(batch_pred)
        .select("vec_id")
        .collect()
    }
    for bid in batch_ids:
        r = by_id[bid]
        assert len(r["nbrs"]) >= 1  # attached to the standing graph
        assert bid not in r["nbrs"]
        for u in r["nbrs"]:
            assert (r["shard"], u) in members
    # standing lists stay under the overflow cap
    assert max(len(r["nbrs"]) for r in rows) <= _GRAPH_APPEND_CAP
    # reverse edges landed: some standing vector points at the batch
    assert any(
        set(r["nbrs"]) & batch_ids
        for r in rows
        if r["vec_id"] not in batch_ids
    )
    # health: growth below the rebuild factor, totals exact
    h = ann_graph_health(spark, sf_dir, base_pred, ident="testd")
    assert h["built"] and not h["rebuild"]
    assert h["total_rows"] == n
    assert h["built_rows"] == n - len(batch_ids)
    # idempotent per batch: second call skips and changes nothing
    res2 = append_to_ann_graph(
        spark, sf_dir, base_pred, batch_pred, ident="testd"
    )
    assert res2["applied"] is False
    rows2 = _graph_adjacency(spark, tag).collect()
    assert sorted(map(tuple, rows2)) == sorted(map(tuple, rows))


def test_graph_append_auto_rebuild(spark, sf_dir):
    """Outgrown append compacts in-band into the new identity and
    retires the old one (the IVF auto-rebuild contract)."""
    from grapho_spark.queries.embeddings import (
        ann_graph_health,
        append_to_ann_graph,
    )

    base_pred, batch_pred = "vec_id % 5 = 0", "vec_id % 5 != 0"
    res = append_to_ann_graph(
        spark, sf_dir, base_pred, batch_pred, ident="testdr",
        auto_rebuild_pred="vec_id >= 0",
    )
    assert res["rebuilt"] is True
    assert res["retired_tables"]
    for t in res["retired_tables"]:
        assert not spark.catalog.tableExists(t)
    assert spark.catalog.tableExists(res["rebuilt_tables"][0])
    # post-rebuild health is the NEW identity's cleared verdict
    assert res["health"]["built"] and not res["health"]["rebuild"]
    h_old = ann_graph_health(spark, sf_dir, base_pred, ident="testdr")
    assert h_old["built"] is False  # old marker gone — fails fast


def test_closure_membership_invariants(spark, sf_dir):
    """SPANN closure multi-assignment: primary memberships are
    bit-identical to the hard assignment (closure only ADDS boundary
    replicas, capped at _GRAPH_CLOSURE_CAP), replicas carry the same
    vector, and the closure dial's route ceiling can only match or
    beat the hard-routed dial's."""
    from grapho_spark.queries.embeddings import (
        _GRAPH_CLOSURE_CAP,
        embedding_graph_closure_recall,
    )

    n = load_table(spark, sf_dir, "embeddings").count()
    graph, assign, cents = ann_graph_tables(
        spark, sf_dir, shard_target=max(10, n // 3),
        ident="testshc", closure_eps=0.4,
    )
    # the primary assignment is contained in the graph membership
    memb = graph.select("shard", "vec_id")
    missing = assign.join(memb, ["shard", "vec_id"], "left_anti").count()
    assert missing == 0
    # membership covers every vector, capped per vector
    per_vec = memb.groupBy("vec_id").agg(F.count(F.lit(1)).alias("c"))
    assert per_vec.count() == n
    assert per_vec.agg(F.max("c")).collect()[0][0] <= _GRAPH_CLOSURE_CAP
    # subgraph edges stay within their shard even for replicas
    rows = graph.collect()
    members = {(r["shard"], r["vec_id"]) for r in rows}
    for r in rows:
        for u in r["nbrs"]:
            assert (r["shard"], u) in members
    row_c = embedding_graph_closure_recall(spark, sf_dir).collect()[0]
    row_h = embedding_graph_sharded_recall(spark, sf_dir).collect()[0]
    assert row_c["replication"] >= 1.0
    assert row_c["route_ceiling"] >= row_h["route_ceiling"]
    assert 0.0 <= row_c["avg_recall"] <= 1.0
