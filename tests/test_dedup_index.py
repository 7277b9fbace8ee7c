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


def test_ann_index_probe_matches_recompute(spark, sf_dir):
    """The persisted ANN index (cell-bucketed PQ codes + stored
    centroids/codebook) must answer identically to the variant that
    re-derives everything from raw vectors, and the probe must read
    the STORED table (build-once/probe-many for vector search)."""
    from grapho_spark.queries import all_queries
    from grapho_spark.queries.embeddings import ann_index_tables

    reg = all_queries()
    key = lambda r: (r["q_id"], r["vec_id"])  # noqa: E731
    indexed = reg["embedding_ivfpq_indexed_knn"].spark_fn(spark, sf_dir)
    recomputed = reg["embedding_ivfpq_knn"].spark_fn(spark, sf_dir)
    got = sorted(map(key, indexed.collect()))
    want = sorted(map(key, recomputed.collect()))
    assert got == want
    assert want  # queries must exist at this SF

    # second call returns the memoized tables without a rebuild, and
    # the codes table is genuinely bucketed
    _, _, codes = ann_index_tables(spark, sf_dir)
    [tbl] = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("ann_pq_codes_")
    ]
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
    assert any("Num Buckets" in str(r) for r in desc)
