"""Physical-plan expectation matrix for the headline queries.

Each entry maps a registered query name to the regex patterns its
*executed or formatted* physical plan must contain — the evidence for
PERF.md's scaling claims (predicate pushdown reaches the parquet scan,
small dimensions broadcast, top-k compiles to TakeOrderedAndProject,
partition pruning and DPP fire).  A lost broadcast or an unpushed
filter is a silent 100x regression at the 100 TB target even when the
answer stays correct, so these are asserted in CI
(``tests/test_plan_expectations.py``) and printable on demand via
``scripts/explain_audit.py``.

The reference engine has no optimizer to audit (full scans only,
reference server/server.go:526-803); this matrix is about keeping the
Spark plans we *chose* from regressing.
"""

from __future__ import annotations

PLAN_CHECKS: dict[str, list[str]] = {
    "q6_forecast_revenue": ["PushedFilters", "ReadSchema", "VectorizedScan"],
    "q5_local_supplier_volume": ["BroadcastHashJoin", "PushedFilters"],
    "q3_shipping_priority": ["BroadcastHashJoin", "TakeOrderedAndProject"],
    "semi_join_urgent_customers": ["LeftSemi", "PushedFilters"],
    "embedding_knn_bruteforce": ["BroadcastNestedLoopJoin|BroadcastHashJoin|Cross"],
    "q4_order_priority": ["LeftSemi", "PushedFilters"],
    "q7_volume_shipping": ["BroadcastHashJoin", "PushedFilters"],
    "q8_market_share": ["BroadcastHashJoin", "PushedFilters"],
    "q19_discount_revenue": ["BroadcastHashJoin", "PushedFilters"],
    "q22_dormant_customers": ["BroadcastNestedLoopJoin|BroadcastHashJoin", "LeftAnti"],
    "q16_supplier_count_by_part": ["LeftAnti", "BroadcastHashJoin"],
    "timeseries_daily_ohlc": ["Window", "ReadSchema"],
    "window_order_gap_days": ["Window", "ReadSchema"],
    "graph_neighborhood_jaccard": ["BroadcastHashJoin", "Window"],
    "deterministic_stratified_sample": ["PushedFilters", "ReadSchema"],
    "source_partitioned_parquet_pruning": ["PartitionFilters"],
    "core_source_dynamic_partition_pruning": ["dynamicpruning", "BroadcastHashJoin"],
    "text_contamination_probe": ["BroadcastHashJoin"],
    "embedding_ivf_recall": [
        "BroadcastNestedLoopJoin|BroadcastHashJoin|Cross",
        "ReadSchema",
    ],
    "events_hierarchical_rollup": ["HashAggregate", "ReadSchema"],
    "core_gql_match_edge_pattern": [
        "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
    ],
    "text_chunk_windows": ["Generate", "ReadSchema"],
    "text_pack_sequences": ["Window", "RunningWindowFunction|WindowExec|Window"],
    # round-6: MATCH ... ORDER BY ... LIMIT must compile to per-partition
    # top-k over the pushed-filter scan, never a global sort
    "gql_match_order_limit": ["TakeOrderedAndProject", "PushedFilters"],
    # round-9: the OR/IN WHERE extensions must reach the parquet scan —
    # the disjunction as one Or() of IsNotNull-guarded arms, the
    # membership list as ONE In() filter (never K unioned scans)
    "gql_match_or_where": [
        r"PushedFilters: \[[^\]]*Or\(And\(IsNotNull\(c_acctbal\),GreaterThan",
    ],
    "gql_match_in_where": [
        r"PushedFilters: \[[^\]]*In\(c_mktsegment",
    ],
    # r10: NOT decomposes to pushable Not(EqualNullSafe) conjuncts
    "gql_match_not_where": [
        r"PushedFilters: \[[^\]]*Not\(EqualNullSafe\(c_mktsegment,BUILDING\)\)",
    ],
    # r10: nested paren groups push whole as one Or(And(...)) tree
    "gql_match_paren_groups": [
        r"PushedFilters: \[[^\]]*Or\(And\(",
    ],
    # r12: HAVING is a post-aggregate filter — the PRE-aggregation
    # WHERE must still push to the parquet scan (the HAVING predicate
    # reads aggregate outputs, so it cannot block pushdown below the
    # aggregate), and the plan keeps the partial-agg + exchange shape
    "gql_match_having": [
        r"PushedFilters: \[[^\]]*GreaterThan\(c_acctbal,0\.0\)",
        "HashAggregate",
    ],
    # r11: the composite boolean-algebra MATCH on a flushed bucketed
    # engine table — Catalyst decomposes NOT(a OR b) into pushable
    # conjuncts (Not(EqualNullSafe), Not(In)), the bounds and <> push
    # alongside, and paging stays ONE TakeOrderedAndProject carrying
    # offset 10 (limit arg = offset+40)
    "core_gql_match_bool_algebra": [
        r"PushedFilters: \[[^\]]*Not\(EqualNullSafe\(c_mktsegment,AUTOMOBILE\)\)",
        r"Not\(In\(c_mktsegment, \[FURNITURE,HOUSEHOLD\]\)\)",
        r"GreaterThanOrEqual\(c_acctbal,1000\.0\)",
        r"LessThan\(c_acctbal,9000\.0\)",
        r"Not\(EqualTo\(c_nationkey,13\)\)",
        "TakeOrderedAndProject",
        r"Arguments: 50, \[bal[^\]]*\], \[[^\]]*\], 10",
    ],
    # r9: inclusive bounds must push as GreaterThanOrEqual/
    # LessThanOrEqual scan filters
    "gql_match_cmp_bounds": [
        r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(c_acctbal",
        r"LessThanOrEqual\(c_acctbal",
    ],
    # r9: paging must compile to ONE TakeOrderedAndProject carrying the
    # offset (per-partition top-(m+n) + driver merge), never a global
    # sort + skip scan
    # (formatted plans carry the node args on an Arguments: line —
    # limit=offset+n first, the trailing 5 is the offset)
    "gql_match_limit_offset": [
        "TakeOrderedAndProject",
        r"Arguments: 10, \[c_acctbal[^\]]*\], \[[^\]]*\], 5",
        "PushedFilters",
    ],
    # round-6: item-frequency and stats dims must broadcast to the
    # scoring joins; chunk dedup must stay explode + window (no join)
    "market_basket_rules": ["BroadcastHashJoin"],
    "timeseries_zscore_anomalies": ["BroadcastHashJoin"],
    "embedding_pq_adc_knn": ["BroadcastHashJoin"],
    "text_chunk_dedup_rewrite": ["Generate", "Window"],
    "text_pii_redaction": ["ReadSchema", "VectorizedScan"],
    # temporal enrichment must be an equi-join on user_id with the
    # validity range as a RESIDUAL condition, never a nested loop
    "events_temporal_enrichment": [
        "BroadcastHashJoin|SortMergeJoin",
        "Left keys \\[1\\]: \\[user_id",
        "Join condition: \\(\\(ts.* >= valid_from",
        "EqualTo\\(event_type,purchase\\)",
    ],
    # round-6b: skyline joins its tiny per-size table broadcast; the
    # weighted sample must be per-partition top-k, never a global sort;
    # Q11's nation-filtered supplier side must broadcast
    "part_skyline_frontier": ["BroadcastHashJoin", "ReadSchema"],
    "corpus_weighted_sample": ["TakeOrderedAndProject", "ReadSchema"],
    "q11_important_stock": ["BroadcastHashJoin", "PushedFilters"],
    "events_touch_attribution": ["Window", "ReadSchema"],
    # round-6b second batch: degree/seed tables broadcast into the
    # fixed-point PPR and Adamic-Adar wedge streams; the inverted
    # index ends in per-partition top-k; KS and gapfill stay window
    # passes over collapsed inputs
    "graph_personalized_pagerank": ["BroadcastHashJoin", "HashAggregate"],
    "graph_adamic_adar": ["BroadcastHashJoin", "TakeOrderedAndProject", "Window"],
    "text_inverted_index": [
        "ObjectHashAggregate|HashAggregate|SortAggregate",
        "TakeOrderedAndProject",
    ],
    "events_ks_two_sample": ["HashAggregate", "Window"],
    "timeseries_gapfill_interpolate": ["Window", "ReadSchema"],
    "events_trigram_paths": ["Window", "TakeOrderedAndProject"],
    # round-6: the probe must scan the persisted bucketed band index
    # (build-once/probe-many), not rebuild buckets from signatures
    "dedup_incremental_new_vs_corpus": [
        "lsh_corpus_buckets",
        "SelectedBucketsCount",
    ],
    # round-7: the wedge operators must carry the WEDGE_CAP guard —
    # a row_number window (the cap) feeding the wedge join, with the
    # exact-degree table still broadcast into the scoring join; the
    # shard manifest must stay a single hash aggregate over a scan
    # (map-only assignment, no join, no window)
    "graph_wedge_cap_stats": ["HashAggregate", "ReadSchema"],
    # round-7 coverage widening: pin the load-bearing physical shape
    # of every core_ family representative with a deterministic batch
    # plan (markers read off the actual sf0.001 plans; losing any one
    # of these is a silent scale regression — an unpushed filter, a
    # lost broadcast, a window that became a join, a Python stage
    # that fell off Arrow)
    "core_q1_pricing_summary": ["PushedFilters", "VectorizedScan", "HashAggregate"],
    "core_q9_product_profit": ["PushedFilters", "BroadcastHashJoin"],
    "core_q21_suppliers_kept_waiting": ["PushedFilters", "BroadcastHashJoin", "Window"],
    "core_grouping_sets_revenue": ["Expand", "HashAggregate"],
    "core_pivot_status_revenue_by_year": ["HashAggregate", "VectorizedScan"],
    "core_range_join_acctbal_bands": ["BroadcastHashJoin", "Generate"],
    "core_salted_skew_aggregation": ["HashAggregate", "VectorizedScan"],
    "core_setop_active_1995_not_1996": ["LeftAnti", "PushedFilters"],
    "core_events_asof_last_purchase": ["Window", "VectorizedScan"],
    "core_events_sessionization": ["Window", "HashAggregate"],
    "core_timeseries_resample_ffill": ["Window", "Generate", "PushedFilters"],
    "core_stats_moments_by_segment": ["HashAggregate", "VectorizedScan"],
    "core_text_language_id": ["HashAggregate", "VectorizedScan"],
    "core_text_fingerprints": ["VectorizedScan"],
    "core_text_tfidf_top_terms": ["Generate", "BroadcastHashJoin", "Window"],
    "core_dedup_minhash_lsh_pairs": ["Generate", "InMemoryTableScan"],
    "core_embedding_ivf_knn": ["BroadcastHashJoin", "Window", "PushedFilters"],
    "core_embedding_rp_lsh_neardup": ["BroadcastHashJoin", "InMemoryTableScan"],
    "core_udaf_revenue_cents_by_priority": ["ArrowEvalPython"],
    "core_udtf_leading_terms": ["BatchEvalPython|ArrowEvalPython"],
    "core_window_running_order_total": ["Window", "VectorizedScan"],
    "core_window_top3_parts_per_brand": ["Window", "VectorizedScan"],
    "core_multimodal_decode_stub": ["MapInPandas"],
    "core_dedup_simhash": ["Generate", "HashAggregate"],
    "corpus_shuffle_shards": ["SortAggregate|HashAggregate", "ReadSchema"],
    # the tiny per-source aggregate must broadcast back over the plan,
    # never trigger a second corpus pass
    "corpus_epoch_plan": ["HashAggregate|SortAggregate", "Broadcast"],
    "graph_triangle_count": ["Window", "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
    # the ANN probe must scan the PERSISTED cell-bucketed code table
    # (build-once/probe-many), not re-derive PQ codes from raw vectors
    "core_embedding_ivfpq_indexed_knn": ["ann_pq_codes", "BroadcastHashJoin"],
    # all-corpus near-dup must ALSO read the stored code table (the
    # whole point is avoiding the O(n^2) raw-vector scan)
    "embedding_indexed_neardup_pairs": ["ann_pq_codes"],
    # r8b: DSIR scoring must be one feature scan + a broadcast of the
    # B-row log-ratio table (a shuffle join there would re-shuffle the
    # corpus-sized feature stream); the within-doc rarity ordering of
    # the prefix ssjoin must stay a doc-partitioned Window, and its
    # candidate generation an equi-join on the prefix token
    "core_corpus_dsir_importance": ["BroadcastHashJoin", "HashAggregate", "InMemoryTableScan"],
    "core_dedup_prefix_ssjoin_pairs": ["Window", "HashAggregate"],
    # the composed export funnel: dedup election stays a Window (no
    # self-join), the DSIR model joins as a broadcast
    "corpus_training_export_manifest": ["Window", "BroadcastHashJoin", "HashAggregate"],
    # r8c: BPE tokenizer application must be a broadcast of the vocab
    # lookup over the corpus token stream with map-side partial aggs;
    # SemDeDup must broadcast centroids, rank via a Window, and read
    # the ranked table from its materialization (both pair-join sides)
    "text_bpe_tokenize": ["BroadcastHashJoin", "HashAggregate"],
    "core_embedding_semantic_dedup": ["BroadcastHashJoin", "Window", "InMemoryTableScan"],
    # the leakage audit reads the memoized k-means assignment and
    # joins holdout x train on the cell id
    "corpus_semantic_leakage": ["InMemoryTableScan", "HashAggregate"],
    # blob ingestion must be the built-in binaryFile file scan
    "source_binaryfile_blobs": ["binaryFile"],
    # the merged-schema read must surface the evolved column in the
    # scan's ReadSchema (NULL-filled per legacy file, no rewrite)
    "source_schema_merge_evolution": ["HashAggregate", "o_orderpriority"],
    # r8e: the CMS candidate pass must be a top-k (never a global
    # sort), the 2048-cell sketch must join as a broadcast, and the
    # token stream must come from its materialization (sketch build +
    # exact counts share one token explode)
    "text_cms_heavy_hitters": [
        "TakeOrderedAndProject",
        "BroadcastHashJoin",
        "InMemoryTableScan",
    ],
    # GD training result: the final scoring pass is one aggregate over
    # the materialized feature table — weights are plan literals, so
    # no join of any kind may appear
    "corpus_quality_classifier_gd": ["HashAggregate", "InMemoryTableScan"],
    # the WAL must be read through the registered Python data source
    # (a BatchScan of it), once per encoding
    "source_commitlog_datasource": ["BatchScan commitlog"],
    # round-8 late additions: variant extraction must stay a vectorized
    # scan + hash aggregate (no per-row JSON text reparse path); the
    # XML round-trip must actually read through the xml datasource; the
    # state introspection must be a StateScan of the checkpoint (not a
    # recomputation); curriculum bucketing folds 3 broadcast scalars
    # into a map-only pass (never a global NTILE sort); modularity's
    # scoring joins run over the memoized (cached) edge table
    "scalar_variant_extract": ["HashAggregate", "VectorizedScan"],
    # RETURN DISTINCT must compile to partial-agg distinct over the
    # pushed-filter scan — never a global sort
    "gql_match_distinct_neq": ["HashAggregate", "PushedFilters"],
    # grouped-aggregate RETURN: map-side partial agg over the
    # pushed-filter scan (the range predicate must reach parquet)
    "gql_match_group_agg": ["HashAggregate", "PushedFilters"],
    # r11: aggregate output aliases keep the same grouped plan shape —
    # the user names land as-is in the aggregate expressions (no
    # post-agg rename projection) and the range filter still pushes
    "gql_match_agg_alias": [
        "HashAggregate",
        "PushedFilters",
        r"AS n_cust#\d+",  # the user alias IS the aggregate's output attr
    ],
    "source_xml_roundtrip": ["Scan xml", "HashAggregate"],
    "streaming_state_store_read": ["StateScan"],
    "corpus_curriculum_phases": ["BroadcastNestedLoopJoin", "Aggregate"],
    "graph_modularity_score": ["BroadcastHashJoin", "InMemoryTableScan"],
    # stress centrality: distances and the SP-DAG are materialized once
    # and re-read by the unrolled sigma/g layer joins
    "graph_stress_centrality": ["InMemoryTableScan", "HashAggregate"],
    # pipe-syntax front end must compile to the classic plan: pushed
    # filters at the scan, partial hash aggregate
    "relational_pipe_syntax": ["PushedFilters", "HashAggregate"],
    "events_retention_matrix": ["HashAggregate", "ReadSchema"],
    # walk steps must be (node, idx)-keyed joins over the indexed
    # adjacency (a Window builds the index), never a cross product
    "graph_random_walks": ["Window", "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
}


def plan_string(df, mode: str = "formatted") -> str:
    """The string df.explain(mode) would print, WITHOUT printing it.
    Asks the JVM directly (the same PythonSQLUtils.explainString call
    explain() wraps) instead of capturing stdout — redirect_stdout
    swaps process-global sys.stdout, so a concurrent engine/thread
    could interleave its own output into the captured plan (ADVICE r7).
    Falls back to a stdout capture only if the JVM handle is absent
    (e.g. a Connect session)."""
    try:
        return str(
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), mode
            )
        )
    except AttributeError:
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()


def formatted_plan(df) -> str:
    """Return df.explain('formatted') output as a string, with a
    synthetic ``VectorizedScan`` marker appended when the parquet scan
    is batched (under AQE the pre-execution plan carries no ``*(n)``
    codegen markers, so ``Batched: true`` is the stable signal)."""
    plan = plan_string(df, "formatted")
    if "Batched: true" in plan:
        plan += "\nVectorizedScan"
    return plan
