"""The persisted LSH band index's production ingest path: appending a
batch's band rows into the SAME bucket layout must leave probes
equivalent to a full index rebuild over corpus+batch (PERF.md's
build-once/probe-many claim), and the appended table must still scan
bucketed. Uses its own corpus predicate so the shared session index
used by the oracle-checked queries is never mutated."""

from __future__ import annotations


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
    indexed = reg["embedding_ivfpq_indexed_knn"].spark_fn(spark, sf_dir)
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
        tempfile.gettempdir(), "grapho_spark_index", f"_BUILD_OK_{tag}"
    )
    os.unlink(marker)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    cents2, book2, codes2 = ann_index_tables(spark, sf_dir)
    assert os.path.exists(marker)  # rebuild re-published the marker
    rebuilt = reg["embedding_ivfpq_indexed_knn"].spark_fn(spark, sf_dir)
    assert sorted((r["q_id"], r["vec_id"]) for r in rebuilt.collect()) == baseline
