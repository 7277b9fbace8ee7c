"""Bucketed co-located joins: writing both join sides bucketed on the
join key lets Spark's bucket-aware scan join them with NO shuffle
exchange — the pre-partitioning pattern for repeated big-big joins at
scale (PERF.md). Asserted on the physical plan, not just timings."""

from __future__ import annotations

import pytest


@pytest.fixture()
def warehouse_tables(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    n = 10_000
    orders = spark.range(n).select(
        F.col("id").alias("o_key"), (F.col("id") % 100).alias("o_val")
    )
    items = spark.range(n * 4).select(
        (F.col("id") % n).alias("i_key"), (F.col("id") % 7).alias("i_val")
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    orders.write.bucketBy(8, "o_key").sortBy("o_key").mode("overwrite").saveAsTable(
        "b_orders"
    )
    items.write.bucketBy(8, "i_key").sortBy("i_key").mode("overwrite").saveAsTable(
        "b_items"
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_eliminates_shuffle(spark, warehouse_tables):
    left = spark.table("b_orders")
    right = spark.table("b_items")
    # bucket-aware scans: SortMergeJoin directly over the scans, no
    # Exchange on either side (hint forces SMJ so autoBroadcast cannot
    # hide the bucketing behind a broadcast at this toy size)
    smj = left.hint("merge").join(right, left.o_key == right.i_key)
    plan = smj._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    # correctness unchanged
    assert smj.count() == 40_000
