"""The persisted LSH band index's production ingest path: appending a
batch's band rows into the SAME bucket layout must leave probes
equivalent to a full index rebuild over corpus+batch (PERF.md's
build-once/probe-many claim), and the appended table must still scan
bucketed. Uses its own corpus predicate so the shared session index
used by the oracle-checked queries is never mutated."""

from __future__ import annotations
from grapho_spark.sparkutil import scratch_path


def _rows(df):
    return {(r["new_doc"], r["n_corpus_matches"]) for r in df.collect()}


def test_band_index_append_matches_rebuild(spark, sf_dir):
    from grapho_spark.queries import dedup

    base_pred = "doc_id % 10 < 5"
    batch_pred = "doc_id % 10 = 5"
    full_pred = "doc_id % 10 < 6"
    new_pred = "doc_id % 10 >= 8"

    tname = dedup.append_to_band_index(spark, sf_dir, batch_pred, base_pred)
    appended = dedup.probe_band_index(
        spark, sf_dir, spark.table(tname), new_pred
    )
    rebuilt = dedup.probe_band_index(
        spark, sf_dir, dedup.corpus_band_index(spark, sf_dir, full_pred), new_pred
    )
    got, want = _rows(appended), _rows(rebuilt)
    assert got == want
    assert want  # the probe must actually find collisions at sf0.001

    # the appended table still reads as a bucketed scan
    plan = appended._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan

    for pred in (base_pred, full_pred):
        spark.sql(f"DROP TABLE IF EXISTS {dedup._index_name(sf_dir, pred)}")


def test_ann_index_probe_and_crash_safe_rebuild(spark, sf_dir):
    """The persisted v2 ANN index: the probe must return a well-formed
    exact-cosine top-3 per sampled query from the STORED tables
    (build-once/probe-many), the codes table must be genuinely
    bucketed, and — the r8 crash-publish contract — an index whose
    build died mid-write (some tables registered, no build marker)
    must be rebuilt on the next call and then probe identically."""
    import hashlib
    import os
    import tempfile

    from grapho_spark.queries import all_queries
    from grapho_spark.queries.embeddings import ann_index_tables

    tag = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}_pid{os.getpid()}"

    reg = all_queries()
    indexed = reg["core_embedding_ivfpq_indexed_knn"].spark_fn(spark, sf_dir)
    rows = indexed.collect()
    assert rows  # queries must exist at this SF
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q_id, rs in by_q.items():
        assert len(rs) <= 3
        cosines = [r["cosine"] for r in rs]
        # exact re-rank output: descending cosine, no self-match
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["vec_id"] != q_id for r in rs)
    baseline = sorted((r["q_id"], r["vec_id"]) for r in rows)

    # second call returns the memoized tables without a rebuild, and
    # the codes table is genuinely bucketed
    _, _, codes = ann_index_tables(spark, sf_dir)
    tbl = f"ann_pq_codes_{tag}"
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
    assert any("Num Buckets" in str(r) for r in desc)

    # simulate a build that died mid-write: one table gone, marker
    # (written only after ALL tables) absent
    marker = os.path.join(
        scratch_path("grapho_spark_index"), f"_BUILD_OK_{tag}"
    )
    os.unlink(marker)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    cents2, book2, codes2 = ann_index_tables(spark, sf_dir)
    assert os.path.exists(marker)  # rebuild re-published the marker
    rebuilt = reg["core_embedding_ivfpq_indexed_knn"].spark_fn(spark, sf_dir)
    assert sorted((r["q_id"], r["vec_id"]) for r in rebuilt.collect()) == baseline


def test_ann_index_append_matches_frozen_rebuild(spark, sf_dir):
    """The ANN index's delta-ingest path: appending a batch's code rows
    (assigned to STORED centroids, encoded with the STORED codebook)
    must leave the codes table equal to encoding corpus+batch with the
    same frozen parameters, the appended table must still scan
    bucketed, and a probe must now RETRIEVE appended vectors without
    any rebuild."""
    import hashlib
    import os

    from grapho_spark.queries.embeddings import (
        _ann_probe,
        _assign_to_cents,
        _pq_encode,
        ann_index_tables,
        append_to_ann_index,
    )
    from pyspark.sql import functions as F

    base_pred = "vec_id % 10 < 8"
    batch_pred = "vec_id % 10 >= 8"
    union_pred = "vec_id IS NOT NULL"

    res = append_to_ann_index(spark, sf_dir, batch_pred, base_pred)
    codes_t = res["codes_table"]
    # the outgrowth verdict rides the append in-band: 8 base slices +
    # 2 appended = 1.25x growth, below the 2x rebuild threshold
    assert res["health"]["built"] and not res["health"]["rebuild"]
    assert not res["rebuilt"]
    cents, book, codes = ann_index_tables(spark, sf_dir, base_pred)

    # appended table == frozen-parameter encode of the FULL corpus
    want = (
        _pq_encode(spark, sf_dir, book, union_pred)
        .join(_assign_to_cents(spark, sf_dir, cents, union_pred), "vec_id")
        .select(F.col("cid").alias("cell"), "vec_id", "sub", "code")
    )
    got_rows = sorted(tuple(r) for r in spark.table(codes_t).collect())
    want_rows = sorted(tuple(r) for r in want.collect())
    assert got_rows == want_rows
    assert got_rows

    # the appended table is still registered bucketed (a bare scan
    # doesn't annotate bucketing; the catalog spec is the contract)
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {codes_t}").collect()
    assert any("Num Buckets" in str(r) for r in desc)

    # probing with the appended vectors as queries retrieves real
    # neighbors for every query — new vectors are searchable in place
    probed = _ann_probe(
        spark, sf_dir, cents, book, spark.table(codes_t), query_pred=batch_pred
    )
    rows = probed.collect()
    n_queries = spark.table(codes_t).filter(batch_pred).select("vec_id").distinct()
    n_batch = n_queries.count()
    assert n_batch > 0
    assert {r["q_id"] for r in rows} == {
        r["vec_id"] for r in n_queries.collect()
    }

    # cleanup: this index is pred-scoped; drop so reruns rebuild fresh
    tag = (
        hashlib.md5(f"{sf_dir}|{base_pred}".encode()).hexdigest()[:10]
        + f"_pid{os.getpid()}"
    )
    for t in (f"ann_centroids_{tag}", f"ann_codebook_{tag}", f"ann_pq_codes_{tag}"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    import tempfile

    marker = os.path.join(
        scratch_path("grapho_spark_index"), f"_BUILD_OK_{tag}"
    )
    if os.path.exists(marker):
        os.unlink(marker)


def test_prefix_ssjoin_is_exact_vs_brute_force(spark, sf_dir):
    """The AllPairs prefix-filter theorem, certified in-band: the
    prefix-filtered join must return EXACTLY the pairs a brute-force
    all-pairs exact-Jaccard scan finds at the threshold — zero false
    negatives (the guarantee LSH lacks) and zero false positives
    (verification is exact)."""
    from pyspark.sql import functions as F

    from grapho_spark.queries.dedup import (
        SSJOIN_T_DEN,
        SSJOIN_T_NUM,
        _spark_prefix_ssjoin_pairs,
        _spark_shingled,
    )

    got = {
        (r.doc_a, r.doc_b): r.n_common
        for r in _spark_prefix_ssjoin_pairs(spark, sf_dir).collect()
    }

    d = _spark_shingled(spark, sf_dir)
    doc_sh = d.select("doc_id", F.explode(F.array_distinct("shingles")).alias("sh"))
    sizes = d.select("doc_id", F.size(F.array_distinct("shingles")).alias("n_sh"))
    a, b = doc_sh.alias("a"), doc_sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    brute = (
        inter.join(sa, inter.doc_a == F.col("sa.doc_id"))
        .join(sb, inter.doc_b == F.col("sb.doc_id"))
        .filter(
            F.lit(SSJOIN_T_DEN) * F.col("n_common")
            >= F.lit(SSJOIN_T_NUM)
            * (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common"))
        )
    )
    want = {(r.doc_a, r.doc_b): r.n_common for r in brute.collect()}
    assert got == want
    assert want  # non-vacuous: the fixture contains true near-dups


def test_ann_index_outgrowth_flags_and_rebuild(spark, sf_dir):
    """r10 (VERDICT r9 task #5): the build marker records corpus size;
    delta-ingest past _ANN_REBUILD_FACTOR surfaces the rebuild signal
    with cells scaled ~ sqrt(growth); a compacting rebuild over the
    union corpus at the recommended cell count clears the flag and
    still answers probes with healthy recall vs exact brute force."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from grapho_spark.queries.embeddings import (
        _ann_probe,
        _ann_index_tag,
        _spark_cosine,
        ann_index_health,
        ann_index_tables,
        append_to_ann_index,
        rebuild_ann_index,
    )
    from grapho_spark.tables import load_table

    base_pred = "vec_id % 10 < 3"
    union_pred = "vec_id % 10 < 9"
    preds = [base_pred, union_pred]

    ann_index_tables(spark, sf_dir, base_pred)
    h0 = ann_index_health(spark, sf_dir, base_pred)
    assert h0["built"] and not h0["rebuild"]
    assert abs(h0["growth"] - 1.0) < 1e-9

    # two appended batches triple the indexed corpus -> outgrown
    a1 = append_to_ann_index(spark, sf_dir, "vec_id % 10 IN (3, 4, 5)", base_pred)
    a2 = append_to_ann_index(spark, sf_dir, "vec_id % 10 IN (6, 7, 8)", base_pred)
    h1 = ann_index_health(spark, sf_dir, base_pred)
    assert h1["rebuild"] and h1["growth"] >= 2.0
    assert h1["recommended_cells"] > h1["cells"]
    # the same verdict was already surfaced IN-BAND by the appends
    # themselves (r11: no separate health call needed to notice)
    assert a1["health"]["rebuild"] and a2["health"]["rebuild"]
    assert a2["health"] == h1

    # compacting rebuild over the union corpus at the recommended size
    cents2, book2, codes2 = rebuild_ann_index(
        spark, sf_dir, union_pred, cells=h1["recommended_cells"]
    )
    h2 = ann_index_health(spark, sf_dir, union_pred)
    assert h2["built"] and not h2["rebuild"]
    assert h2["cells"] == h1["recommended_cells"]

    # recall@3 of the rebuilt index vs exact brute force on the union
    q_pred = "vec_id % 97 = 0"
    probed = (
        _ann_probe(spark, sf_dir, cents2, book2, codes2, query_pred=q_pred)
        .select("q_id", "vec_id")
    )
    e = load_table(spark, sf_dir, "embeddings").filter(union_pred)
    q = e.filter(q_pred).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    base = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    bf = (
        F.broadcast(q)
        .crossJoin(base)
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", _spark_cosine("qv", "ev").alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
    )
    n_q = q.count()
    hits = probed.join(bf, ["q_id", "vec_id"]).count()
    assert n_q > 0
    assert hits / (3.0 * n_q) >= 0.6, (hits, n_q)

    # cleanup: pred-scoped indexes; drop so reruns rebuild fresh
    for pred in preds:
        tag = _ann_index_tag(sf_dir, pred)
        for t in (
            f"ann_centroids_{tag}",
            f"ann_codebook_{tag}",
            f"ann_pq_codes_{tag}",
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        marker = os.path.join(
            scratch_path("grapho_spark_index"), f"_BUILD_OK_{tag}"
        )
        if os.path.exists(marker):
            os.unlink(marker)


def test_ann_index_health_zero_built_rows(spark, sf_dir):
    """r11 (ADVICE r10): a marker recording built_rows == 0 (build pred
    matched no vectors) must flag rebuild WITHOUT raising — infinite
    growth has no usable cell-sizing signal, so recommended_cells stays
    at the current cell count instead of round(log2(inf))."""
    import json
    import os

    from grapho_spark.queries.embeddings import _ann_index_tag, ann_index_health

    pred = "vec_id < 0"  # any unused tag
    tag = _ann_index_tag(sf_dir, pred)
    codes_t = f"ann_pq_codes_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {codes_t}")
    spark.createDataFrame(
        [(0, 1, 0, 3)], "cell INT, vec_id INT, sub INT, code INT"
    ).write.saveAsTable(codes_t)
    marker = os.path.join(scratch_path("grapho_spark_index"), f"_BUILD_OK_{tag}")
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w", encoding="utf-8") as fh:
        json.dump({"tables": [codes_t], "built_rows": 0, "cells": 8}, fh)
    try:
        h = ann_index_health(spark, sf_dir, pred)
        assert h["built"] and h["rebuild"]
        assert h["growth"] == float("inf")
        assert h["recommended_cells"] == 8  # flag-only: no sizing signal
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {codes_t}")
        os.unlink(marker)


def test_ann_append_auto_rebuild_in_band(spark, sf_dir):
    """r11 (VERDICT r10 task #2): with ``auto_rebuild_pred`` set, the
    append that crosses _ANN_REBUILD_FACTOR runs the compacting
    rebuild in-band — the returned health is the post-rebuild CLEARED
    verdict for the new index identity, and a probe against the
    rebuilt tables answers from the union corpus."""
    import os

    from pyspark.sql import functions as F

    from grapho_spark.queries.embeddings import (
        _ann_index_tag,
        _ann_probe,
        ann_index_tables,
        append_to_ann_index,
    )
    from grapho_spark.sparkutil import scratch_path

    base_pred = "vec_id % 10 = 0"
    union_pred = "vec_id % 10 IN (0, 1, 2)"
    ann_index_tables(spark, sf_dir, base_pred)
    # the appended batch triples the indexed corpus -> outgrown ->
    # the auto-rebuild fires inside the same call
    res = append_to_ann_index(
        spark,
        sf_dir,
        "vec_id % 10 IN (1, 2)",
        base_pred,
        auto_rebuild_pred=union_pred,
    )
    try:
        assert res["rebuilt"]
        assert res["health"]["built"] and not res["health"]["rebuild"]
        assert abs(res["health"]["growth"] - 1.0) < 1e-9
        cents2, book2, codes2 = res["rebuilt_tables"]
        probed = _ann_probe(
            spark, sf_dir, cents2, book2, codes2, query_pred="vec_id % 97 = 0"
        )
        per_q = (
            probed.groupBy("q_id").agg(F.count("*").alias("n")).collect()
        )
        assert per_q and all(r.n <= 3 for r in per_q)
        # r12 (ADVICE r11): the outgrown OLD identity is retired as
        # part of the in-band rebuild — its tables and marker are
        # gone, so a caller that kept appending with the stale
        # base_pred fails fast instead of re-triggering a full
        # rebuild on every append. The new identity is the returned
        # one; health of the old tag now reads as not-built.
        old_tag = _ann_index_tag(sf_dir, base_pred)
        assert res["retired_tables"] == [
            f"ann_centroids_{old_tag}",
            f"ann_codebook_{old_tag}",
            f"ann_pq_codes_{old_tag}",
        ]
        assert not any(
            spark.catalog.tableExists(t) for t in res["retired_tables"]
        )
        from grapho_spark.queries.embeddings import ann_index_health

        assert ann_index_health(spark, sf_dir, base_pred) == {
            "built": False,
            "rebuild": False,
        }
    finally:
        for pred in (base_pred, union_pred):
            tag = _ann_index_tag(sf_dir, pred)
            for t in (
                f"ann_centroids_{tag}",
                f"ann_codebook_{tag}",
                f"ann_pq_codes_{tag}",
            ):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            marker = os.path.join(
                scratch_path("grapho_spark_index"), f"_BUILD_OK_{tag}"
            )
            if os.path.exists(marker):
                os.unlink(marker)
