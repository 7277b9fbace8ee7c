"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "core_q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "top_customers_by_revenue",
    "core_window_running_order_total",
    "rollup_revenue_by_year_priority",
    "core_events_sessionization",
    "core_events_asof_last_purchase",
    "dedup_exact_summary",
    "core_dedup_minhash_lsh_pairs",
    "core_dedup_simhash",
    "text_quality_scores",
    "text_token_stats",
    "text_chunk_windows",
    "embedding_knn_pandas",
    "core_embedding_ivf_knn",
    "embedding_int8_quantization",
    "graph_copurchase_edges",
    "graph_pagerank",
    "core_graph_cc_distributed",
    "core_graph_pagerank_distributed",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    from grapho_spark.queries import all_queries
    from grapho_spark.session import get_spark

    spark = get_spark("grapho_spark_bench")
    registry = all_queries()
    missing = [n for n in HEADLINE if n not in registry]
    if missing:  # a silent skip would under-report the bench total
        raise SystemExit(f"bench: unknown query names: {missing}")

    # Warm the JVM / parquet footers with a trivial action, and the
    # Python worker pool with a no-op mapInPandas (daemon + worker
    # startup is deployment cost, same bucket as JVM warmup — on a
    # long-lived cluster both pools are already hot).
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def _ident(it):
        yield from it

    spark.range(64).repartition(32).mapInPandas(_ident, schema="id long").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry.get(name)
        if q is None:
            continue
        t0 = time.perf_counter()
        df = q.spark_fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
