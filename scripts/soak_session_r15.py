"""r15 late-session degradation probe: run every headline query once
to accumulate realistic end-of-bench session state, then time the
queries that degraded in full-bench runs (stress centrality, trigram
paths) and report storage/JVM state.

Usage: python scripts/soak_session_r15.py [periodicGC_interval|''].
An argument like "90s" sets spark.cleaner.periodicGC.interval (must be
set before the context starts); no argument keeps the default (30min).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    interval = sys.argv[1] if len(sys.argv) > 1 else None
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("soak_r15")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "8192")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if interval:
        b = b.config("spark.cleaner.periodicGC.interval", interval)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from bench import HEADLINE
    from grapho_spark.queries import all_queries

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = all_queries()
    spark.read.parquet(os.path.join(sf, "region.parquet")).count()

    from grapho_spark.queries.embeddings import ann_index_tables

    ann_index_tables(spark, sf)

    t0 = time.perf_counter()
    for name in HEADLINE:
        reg[name].spark_fn(spark, sf).count()
    print(f"soak pass (85 queries x1): {time.perf_counter() - t0:.1f}s", flush=True)

    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    import grapho_spark.sparkutil as _su

    print(
        "rdds_cached:", jsc.getPersistentRDDs().size(),
        "scratch_registered:", len(_su._SCRATCH_PERSISTS),
        "scratch_cap:", _su._SCRATCH_CAP,
        flush=True,
    )
    for name in ["graph_stress_centrality", "events_trigram_paths", "core_q1_pricing_summary", "merge_upsert_documents", "graph_hits_bipartite"]:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            reg[name].spark_fn(spark, sf).count()
            runs.append(time.perf_counter() - t0)
        print(f"late {name}: median={sorted(runs)[1]:.3f} min={min(runs):.3f}", flush=True)


if __name__ == "__main__":
    main()
