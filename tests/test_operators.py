"""Unit tests for the generic operator library (asof/range/topk),
analytics algorithms, and multimodal plumbing on small hand-built
graphs/frames with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_asof_join_basic(spark):
    from grapho_spark.operators import asof_join

    left = spark.createDataFrame(
        [("u1", 10), ("u1", 25), ("u2", 5)], "k string, t long"
    )
    right = spark.createDataFrame(
        [("u1", 8, "a"), ("u1", 20, "b"), ("u2", 9, "c")], "k string, t long, v string"
    )
    out = {
        (r.k, r.t): r.v_asof
        for r in asof_join(left, right, on="t", by="k", value_cols=["v"]).collect()
    }
    assert out == {("u1", 10): "a", ("u1", 25): "b", ("u2", 5): None}


def test_asof_join_tolerance(spark):
    # pandas merge_asof semantics: matches older than `tolerance` are
    # nulled; the matched right `on` is exposed as t_asof
    from grapho_spark.operators import asof_join

    left = spark.createDataFrame(
        [("u1", 10), ("u1", 100), ("u2", 5)], "k string, t long"
    )
    right = spark.createDataFrame(
        [("u1", 8, "a"), ("u2", 1, "c")], "k string, t long, v string"
    )
    rows = {
        (r.k, r.t): (r.v_asof, r.t_asof)
        for r in asof_join(
            left, right, on="t", by="k", value_cols=["v"], tolerance=10
        ).collect()
    }
    assert rows == {
        ("u1", 10): ("a", 8),  # distance 2 <= 10
        ("u1", 100): (None, None),  # distance 92 > 10
        ("u2", 5): ("c", 1),  # distance 4 <= 10
    }


def test_asof_join_exact_match_toggle(spark):
    from grapho_spark.operators import asof_join

    left = spark.createDataFrame([("k", 10)], "k string, t long")
    right = spark.createDataFrame([("k", 10, "x")], "k string, t long, v string")
    exact = asof_join(left, right, on="t", by="k", allow_exact=True).collect()[0]
    strict = asof_join(left, right, on="t", by="k", allow_exact=False).collect()[0]
    assert exact.v_asof == "x"
    assert strict.v_asof is None


def test_bucketed_range_join(spark):
    from grapho_spark.operators import bucketed_range_join

    intervals = spark.createDataFrame([(1, 0.0, 10.0), (2, 5.0, 6.0)], "id int, lo double, hi double")
    points = spark.createDataFrame([(5.5,), (9.0,), (11.0,)], "p double")
    out = sorted(
        (r.id, r.p)
        for r in bucketed_range_join(intervals, points, "lo", "hi", "p", 4.0).collect()
    )
    assert out == [(1, 5.5), (1, 9.0), (2, 5.5)]


def test_top_k_per_group(spark):
    from grapho_spark.operators import top_k_per_group

    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9)], "g string, v int"
    )
    out = top_k_per_group(df, ["g"], [F.desc("v"), F.col("v")], k=2)
    assert sorted((r.g, r.v) for r in out.collect()) == [("a", 2), ("a", 3), ("b", 9)]


# ------------------------------------------------------------- analytics

EDGES = [(1, 2), (2, 3), (4, 5)]


def _edges(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_degrees(spark):
    from grapho_spark.analytics import degrees

    d = {r.node: (r.in_degree, r.out_degree) for r in degrees(_edges(spark)).collect()}
    assert d[2] == (1, 1) and d[1] == (0, 1) and d[5] == (1, 0)


def test_bfs(spark):
    from grapho_spark.analytics import bfs

    start = spark.createDataFrame([(1,)], "node long")
    hops = {r.node: r.hops for r in bfs(_edges(spark), start, max_hops=3).collect()}
    assert hops == {1: 0, 2: 1, 3: 2}


def test_connected_components(spark):
    from grapho_spark.analytics import connected_components

    comp = {r.node: r.component for r in connected_components(_edges(spark)).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[4] == comp[5] == 4


def test_pagerank_sums_to_one(spark):
    from grapho_spark.analytics import pagerank

    pr = pagerank(_edges(spark), iters=10)
    total = pr.agg(F.sum("pagerank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6  # dangling mass redistributed


def test_triangle_count(spark):
    from grapho_spark.analytics import triangle_count

    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    assert triangle_count(tri) == 1


def test_find_motif_2path(spark):
    from grapho_spark.analytics import find_motif

    v = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    e = _edges(spark)
    paths = find_motif(v, e, "(a)-[x]->(b); (b)-[y]->(c)")
    rows = paths.select("`a.id`", "`b.id`", "`c.id`").collect()
    assert [(r[0], r[1], r[2]) for r in rows] == [(1, 2, 3)]


def test_find_motif_rejects_bad_pattern(spark):
    import pytest

    from grapho_spark.analytics import find_motif

    v = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="bad motif term"):
        find_motif(v, _edges(spark), "(a)->(b)")


# ------------------------------------------------------------ multimodal


def test_blob_metadata_and_mime_sniff(spark):
    from grapho_spark.llmops import attach_blob_metadata

    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n123")), (2, bytearray(b"plain bytes"))],
        "id long, payload binary",
    )
    meta = {r.id: (r.mime, r.n_bytes) for r in attach_blob_metadata(df, "payload", "id").collect()}
    assert meta[1] == ("image/png", 9)
    assert meta[2] == ("application/octet-stream", 11)


def test_decode_stub_and_frame_sampling(spark):
    import pytest

    from grapho_spark.llmops import decode_media_batch, sample_frames

    df = spark.createDataFrame([(1, bytearray(b"abcd" * 10))], "id long, payload binary")
    meta = decode_media_batch(df, "payload", "id")
    row = meta.collect()[0]
    assert row.decode_ok and row.n_bytes == 40 and 16 <= row.width < 257
    frames = sample_frames(meta, every_nth=2).collect()
    assert [f.frame_idx for f in frames] == list(range(0, row.n_frames, 2))
    with pytest.raises(NotImplementedError):
        decode_media_batch(df, "payload", "id", real_decode=True)


def test_extract_embedding_batch(spark):
    import pytest

    from grapho_spark.llmops import extract_embedding_batch

    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(16)))), (2, bytearray(b""))],
        "id long, payload binary",
    )
    rows = {r.id: list(r.embedding) for r in extract_embedding_batch(df, "payload", "id").collect()}
    # dim i = sum of bytes at positions j % 8 == i over the first 64 bytes
    assert rows[1] == [float(i) + float(i + 8) for i in range(8)]
    assert rows[2] == [0.0] * 8
    with pytest.raises(NotImplementedError):
        extract_embedding_batch(df, "payload", "id", real_extract=True)


def test_salted_sum_equals_plain(spark):
    from grapho_spark.operators import salted_sum

    df = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", i * 10) for i in range(1, 201)],
        "id long, k string, v long",
    )
    salted = {
        r.k: r.sum_v for r in salted_sum(df, ["k"], "v", "id", n_salts=8).collect()
    }
    plain = {r.k: r[1] for r in df.groupBy("k").sum("v").collect()}
    assert salted == plain


def test_salted_join_equals_plain(spark):
    from grapho_spark.operators import salted_join

    big = spark.createDataFrame(
        [(i, "k%d" % (i % 3)) for i in range(100)], "id long, k string"
    )
    small = spark.createDataFrame(
        [("k0", "a"), ("k1", "b"), ("k2", "c")], "k string, v string"
    )
    out = salted_join(big, small, key="k", unique_col="id", n_salts=4)
    plain = big.join(small, "k")
    assert sorted((r.id, r.v) for r in out.collect()) == sorted(
        (r.id, r.v) for r in plain.collect()
    )


def test_engine_find_motif(spark):
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    eng.execute(
        "CREATE NODE P (name: string); CREATE EDGE E (FROM P MANY, TO P MANY);"
        "INSERT NODE P (name: 'a'); INSERT NODE P (name: 'b'); INSERT NODE P (name: 'c');"
        "INSERT EDGE E FROM P(name: 'a') TO P(name: 'b');"
        "INSERT EDGE E FROM P(name: 'b') TO P(name: 'c');"
    )
    paths = eng.find("(x)-[e1]->(y); (y)-[e2]->(z)", edge_type="E")
    rows = paths.select("`x.name`", "`y.name`", "`z.name`").collect()
    assert [(r[0], r[1], r[2]) for r in rows] == [("a", "b", "c")]


def test_engine_find_heterogeneous_edge(spark):
    # Regression: FROM Person TO Place edges — src vertices must bind
    # to Person, dst vertices to Place (not all to the FROM label).
    import pytest

    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    eng.execute(
        "CREATE NODE Person (name: string); CREATE NODE Place (city: string);"
        "CREATE EDGE LivesIn (FROM Person MANY, TO Place MANY);"
        "INSERT NODE Person (name: 'ann'); INSERT NODE Place (city: 'oslo');"
        "INSERT EDGE LivesIn FROM Person(name: 'ann') TO Place(city: 'oslo');"
    )
    rows = (
        eng.find("(p)-[e]->(q)", edge_type="LivesIn")
        .select("`p.name`", "`q.city`")
        .collect()
    )
    assert [(r[0], r[1]) for r in rows] == [("ann", "oslo")]
    # a chain through a heterogeneous edge is impossible: no node has both labels
    with pytest.raises(ValueError, match="both"):
        eng.find("(a)-[e1]->(b); (b)-[e2]->(c)", edge_type="LivesIn")


def test_spark_bloom_membership(spark):
    from grapho_spark.operators import SparkBloom

    df = spark.createDataFrame([(f"k{i}",) for i in range(500)], "v string")
    bf = SparkBloom.build(df, "v")
    # no false negatives
    assert all(bf.might_contain(f"k{i}") for i in range(500))
    # overwhelmingly negative for absent values (fpp ~1%)
    misses = sum(bf.might_contain(f"absent{i}") for i in range(500))
    assert misses < 25
    bf.put("fresh")
    assert bf.might_contain("fresh")
    assert not bf.might_contain(None)


def test_spark_bloom_long_column_and_unsafe_type(spark):
    import pytest

    from grapho_spark.operators import SparkBloom

    df = spark.createDataFrame([(i,) for i in range(300)], "v long")
    bf = SparkBloom.build(df, "v")
    assert all(bf.might_contain(i) for i in range(300))
    assert sum(bf.might_contain(i) for i in range(1000, 1300)) < 15
    dbl = spark.createDataFrame([(1.5,)], "v double")
    with pytest.raises(ValueError, match="unsafe"):
        SparkBloom.build(dbl, "v")


def test_engine_unique_bloom_path(spark, tmp_path):
    # UNIQUE enforcement must survive the bloom fast path: flush moves
    # buffered rows into base, update rewrites values (bloom cleared).
    from grapho_spark.engine import GraphEngine
    from grapho_spark.engine.engine import EngineError
    import pytest

    eng = GraphEngine(spark, data_dir=str(tmp_path / "bloomdb"))
    eng.execute(
        "CREATE NODE U (email: string UNIQUE, n: int);"
        "INSERT NODE U (email: 'a@x', n: 1);"
    )
    eng.flush()  # 'a@x' now in base; bloom builds lazily on next check
    with pytest.raises(EngineError, match="unique violation"):
        eng.execute("INSERT NODE U (email: 'a@x', n: 2);")
    eng.execute("INSERT NODE U (email: 'b@x', n: 2);")  # negative probe path
    with pytest.raises(EngineError, match="unique violation"):
        eng.execute("INSERT NODE U (email: 'b@x', n: 3);")  # buffer duplicate
    # update rewrites a value: the NEW value must be caught post-clear
    eng.execute("UPDATE NODE U SET email: 'c@x' WHERE email: 'b@x';")
    with pytest.raises(EngineError, match="unique violation"):
        eng.execute("INSERT NODE U (email: 'c@x', n: 4);")
    # the old value is free again after the update
    eng.execute("INSERT NODE U (email: 'b@x', n: 5);")
    assert sorted(r.email for r in eng.node_df("U").collect()) == [
        "a@x",
        "b@x",
        "c@x",
    ]


def test_salted_join_rejects_right_and_full(spark):
    import pytest

    from grapho_spark.operators import salted_join

    big = spark.createDataFrame([(1, "k0")], "id long, k string")
    small = spark.createDataFrame([("k0", "a")], "k string, v string")
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, key="k", unique_col="id", how=how)


def test_partitioned_parquet_scan_prunes(spark, sf_dir):
    # The partitioned-sink query's read-back must push the partition
    # filter into the scan (directory pruning, not row filtering).
    from grapho_spark.queries.sources_q import _partitioned_copy

    back = _partitioned_copy(spark, sf_dir, "orders", "o_orderpriority").filter(
        "o_orderpriority = '1-URGENT'"
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "1-URGENT" in plan


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    # The DPP query's fact scan must carry a runtime
    # dynamicpruningexpression subquery fed by the broadcast dim side —
    # not a full scan of every nationkey partition.
    from grapho_spark.queries import all_queries

    df = all_queries()["core_source_dynamic_partition_pruning"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert "BroadcastHashJoin" in plan


def test_chunk_windows_cover_every_token(spark, sf_dir):
    # Invariants of context-window chunking: chunk 0 starts at token 0;
    # consecutive starts differ by the stride; the union of windows
    # covers every token (last start within W of the end); rebuilding
    # the doc from non-overlapping prefixes of each chunk round-trips.
    from pyspark.sql import functions as F

    from grapho_spark.queries import all_queries
    from grapho_spark.queries.text import CHUNK_S, CHUNK_W
    from grapho_spark.tables import load_table

    chunks = all_queries()["text_chunk_windows"].spark_fn(spark, sf_dir)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
        F.sum(
            F.when(F.col("n_chunk_tokens") > CHUNK_W, 1).otherwise(0)
        ).alias("oversized"),
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    joined = per_doc.join(docs, "doc_id")
    bad = joined.filter(
        (F.col("oversized") > 0)
        | (F.col("n_chunks") != F.col("max_idx") + 1)
        # every token covered: the last window must start within W of
        # the end, i.e. stride * max_idx + W >= n_tokens
        | (F.lit(CHUNK_S) * F.col("max_idx") + F.lit(CHUNK_W) < F.col("n_tokens"))
    )
    assert bad.count() == 0


def test_pack_sequences_conserve_tokens(spark, sf_dir):
    # Packing must conserve documents and tokens exactly, and bins
    # within a source must be contiguous from 0.
    from pyspark.sql import functions as F

    from grapho_spark.queries import all_queries
    from grapho_spark.tables import load_table

    packed = all_queries()["text_pack_sequences"].spark_fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    totals = packed.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_tokens").alias("toks")
    ).first()
    expect = docs.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("toks"),
    ).first()
    assert totals.docs == expect.docs
    assert totals.toks == expect.toks
    per_source = packed.groupBy("source").agg(
        F.min("seq_bin").alias("mn"),
        F.max("seq_bin").alias("mx"),
        F.countDistinct("seq_bin").alias("n"),
    )
    bad = per_source.filter(
        (F.col("mn") != 0) | (F.col("n") != F.col("mx") + 1)
    )
    assert bad.count() == 0


def test_int8_quantization_bounds(spark, sf_dir):
    # Reconstruction error of min/max affine int8 quantization is
    # bounded by (scale/2)^2 per element, so mse <= scale^2/4; codes
    # use at most 256 distinct values.
    from pyspark.sql import functions as F

    from grapho_spark.queries import all_queries

    q = all_queries()["embedding_int8_quantization"].spark_fn(spark, sf_dir)
    bad = q.filter(
        (F.col("n_distinct_codes") > 256)
        | (F.col("mse") > F.col("scale") * F.col("scale") / 4 + F.lit(1e-12))
        | (F.col("mse") < 0)
    )
    assert bad.count() == 0


def test_segment_audio_zero_window_payloads(spark):
    from grapho_spark.llmops import decode_audio_batch, segment_audio

    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 300)), (2, bytearray(b"y" * 100)), (3, bytearray(b""))],
        "doc_id long, payload binary",
    )
    meta = decode_audio_batch(df, "payload", "doc_id")
    # 300 bytes -> 600 samples -> windows at 400/160: idx 0 and 1
    # 100 bytes -> 200 samples < 400 -> zero rows (not a [0,-1] sequence)
    out = segment_audio(meta, win=400, hop=160).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, []).append(r.win_idx)
    assert by_id == {1: [0, 1]}
    starts = {r.win_idx: r.start_sample for r in out if r.id == 1}
    assert starts == {0: 0, 1: 160}
