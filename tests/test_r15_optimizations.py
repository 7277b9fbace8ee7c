"""Round-15 optimization invariants.

Pins the internals the optimization round changed:
- stream_state_partitions derives state-store counts from source bytes
  (floor/cap/env-target semantics);
- the shared prepared_sym_edges view IS the symmetrized co-purchase
  edge list (the iterative loops all switched to it);
- market_basket_rules' reuse of the memoized edge weights as co-order
  counts is valid (threshold containment + equal counts).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from grapho_spark.session import get_spark

    return get_spark("test_r15_opt")


def test_stream_state_partitions_floor_cap_and_target(spark, tmp_path):
    from grapho_spark.streaming.ops import stream_state_partitions

    small = tmp_path / "small.bin"
    small.write_bytes(b"x" * 1024)
    # tiny source -> floor
    assert stream_state_partitions(spark, str(small)) == 4
    # missing path contributes 0 bytes, never raises
    assert stream_state_partitions(spark, str(tmp_path / "nope")) == 4
    # a directory is walked recursively
    sub = tmp_path / "d" / "e"
    sub.mkdir(parents=True)
    (sub / "a.bin").write_bytes(b"x" * 2048)
    assert stream_state_partitions(spark, str(tmp_path / "d")) == 4
    # env target scales the count; cap is cluster parallelism
    old = os.environ.get("SPARK_GRAFT_STREAM_PART_BYTES")
    try:
        os.environ["SPARK_GRAFT_STREAM_PART_BYTES"] = "256"
        par = spark.sparkContext.defaultParallelism
        got = stream_state_partitions(spark, str(small))
        assert got == min(par, 1024 // 256 + 1) or got == min(par, max(4, 1024 // 256 + 1))
        big = tmp_path / "big.bin"
        big.write_bytes(b"x" * (par * 4096))
        assert stream_state_partitions(spark, str(big)) == par
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_STREAM_PART_BYTES", None)
        else:
            os.environ["SPARK_GRAFT_STREAM_PART_BYTES"] = old


def test_prepared_sym_edges_is_the_symmetrized_edge_list(spark):
    from grapho_spark.queries.graph import (
        copurchase_edges,
        prepared_sym_edges,
        sym_edges,
    )

    want = sorted(
        (r.src, r.dst)
        for r in sym_edges(copurchase_edges(spark, SF)).collect()
    )
    got = sorted((r.src, r.dst) for r in prepared_sym_edges(spark, SF).collect())
    assert got == want and len(got) > 0


def test_market_basket_counts_equal_memoized_weights(spark):
    from grapho_spark.queries.graph import (
        MIN_WEIGHT,
        RULE_MIN_CO,
        _copurchase_pairs,
        copurchase_edges,
    )

    # the reuse is only valid while the rule threshold is at least the
    # memoized view's build threshold
    assert RULE_MIN_CO >= MIN_WEIGHT
    direct = {
        (r.p1, r.p2): r.n_co
        for r in _copurchase_pairs(spark, SF)
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= RULE_MIN_CO)
        .collect()
    }
    via_memo = {
        (r.p1, r.p2): r.weight
        for r in copurchase_edges(spark, SF)
        .filter(F.col("weight") >= RULE_MIN_CO)
        .collect()
    }
    assert direct == via_memo


@pytest.mark.parametrize("k,rounds,normalized", [(4, 1, False), (32, 3, True)])
def test_kmeans_hof_assignment_matches_exploded_join(spark, k, rounds, normalized):
    """The r15 per-vector array-HOF Lloyd assignment must equal the
    exploded (vec,pos)x(cell,pos) join + groupBy + argmin-window it
    replaced, bit-for-bit: BIGINT distance sums are order-free and the
    HOF per-term SQL is the spelling of _nano9_long/_sq_nano9_long, so
    any mismatch is a protocol bug, not noise."""
    from pyspark.sql import Window

    import grapho_spark.queries.embeddings as E

    a_new, c_final = E._kmeans_pair(spark, SF, k, rounds, normalized)
    if normalized:
        vecs = E._normalized_vec_expl(spark, SF, None)

        def term(a, b):
            return E._sq_nano9_long(a, b)

    else:
        e = E.load_table(spark, SF, "embeddings")
        vecs = e.select(
            "vec_id", F.posexplode("embedding").alias("pos0", "val")
        ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "val")

        def term(a, b):
            return E._nano9_long((a - b) * (a - b))

    d = (
        vecs.join(F.broadcast(c_final), "pos")
        .groupBy("vec_id", "cid")
        .agg(F.sum(term(F.col("val"), F.col("cval"))).alias("dist"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    a_old = (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", F.col("cid").alias("cid_old"))
    )
    joined = a_new.join(a_old, "vec_id")
    assert joined.count() == a_new.count() == a_old.count()
    assert joined.filter(F.col("cid") != F.col("cid_old")).count() == 0
