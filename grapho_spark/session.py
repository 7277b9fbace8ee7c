"""SparkSession factory tuned for the test harness (local[N]) while
keeping settings that transfer to a real cluster.

Scale posture: AQE on (runtime coalesce + skew-join), shuffle
partitions sized to cores locally (on a cluster this would be
~2-3x total cores or left to AQE), UTC session timezone so timestamp
semantics match the DuckDB oracle, Arrow enabled for the pandas
exchange paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "grapho_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Versioned-table chain reads pass thousands of root paths;
        # under this threshold Spark would launch a distributed
        # listing job whose task scheduling dwarfs local-FS listing
        # (measured ~5s of a 5.6s read at 2048 leaf dirs). Manifest-
        # built reads (engine/zones.py) don't list dirs at all; this
        # keeps the fallback path and foreign many-path reads sane on
        # local filesystems (an object-store deployment would retune).
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "8192")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # NOT bigger-is-better: with an oversized heap (tested 64g) GC never
        # triggers, so the ContextCleaner never reclaims shuffle/broadcast
        # state and long sessions degrade 10-30x (measured: identical bench
        # 178s at 64g vs 31s at 8g). Modest heap => regular GC => steady state.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
