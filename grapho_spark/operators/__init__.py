"""Reusable relational operators Spark lacks natively (SURVEY.md §2.4):
as-of joins, range joins, distributed top-k helpers, bloom sketches."""

from grapho_spark.operators.asof import asof_join
from grapho_spark.operators.bloom import SparkBloom
from grapho_spark.operators.rangejoin import bucketed_range_join
from grapho_spark.operators.salted import salted_join, salted_sum
from grapho_spark.operators.topk import top_k_per_group

__all__ = [
    "SparkBloom",
    "asof_join",
    "bucketed_range_join",
    "salted_join",
    "salted_sum",
    "top_k_per_group",
]
