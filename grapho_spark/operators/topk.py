"""Distributed top-k per group with deterministic tie-breaking."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """row_number over (group, order) <= k. ``order_cols`` must include
    a unique tiebreaker for deterministic results under ties — callers
    get nondeterministic LIMIT semantics otherwise (SURVEY.md §7:
    driver hashing needs stable row sets)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
