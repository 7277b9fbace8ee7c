"""Plan audit: prints the physical-plan evidence for PERF.md's claims
(predicate pushdown, column pruning, broadcast joins, codegen spans)
for a few representative queries.

Usage: PYTHONPATH=. python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

from grapho_spark.queries import all_queries
from grapho_spark.session import get_spark

CHECKS = {
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
    "graph_neighborhood_jaccard": ["BroadcastHashJoin"],
    "deterministic_stratified_sample": ["PushedFilters", "ReadSchema"],
    # round-3 additions
    "source_partitioned_parquet_pruning": ["PartitionFilters"],
    "core_source_dynamic_partition_pruning": ["dynamicpruning", "BroadcastHashJoin"],
    "text_contamination_probe": ["BroadcastHashJoin"],
    "embedding_ivf_recall": [
        "BroadcastNestedLoopJoin|BroadcastHashJoin|Cross",
        "ReadSchema",
    ],
    "events_hierarchical_rollup": ["HashAggregate", "ReadSchema"],
    "core_gql_match_edge_pattern": ["BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"],
    # round-5 additions
    "text_chunk_windows": ["Generate", "ReadSchema"],
    "text_pack_sequences": ["Window", "RunningWindowFunction|WindowExec|Window"],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain_audit")
    reg = all_queries()
    failures = []
    for name, wanted in CHECKS.items():
        df = reg[name].spark_fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # under AQE the pre-execution plan carries no '*(n)' codegen
        # markers; 'Batched: true' marks the vectorized parquet scan.
        if "Batched: true" in plan:
            plan += "\nVectorizedScan"
        print(f"=== {name} ===")
        for pat in wanted:
            hit = re.search(pat, plan)
            status = "OK " if hit else "MISS"
            if not hit:
                failures.append((name, pat))
            print(f"  [{status}] {pat}")
        for line in plan.splitlines():
            if "PushedFilters" in line or "ReadSchema" in line:
                print("   ", line.strip()[:160])
    print("FAILURES:", failures or "none")


if __name__ == "__main__":
    main()
