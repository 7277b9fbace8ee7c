"""Structured Streaming operators (SURVEY.md §2.4 — absent in the
reference; the commit log is its only stream-like artifact)."""

from grapho_spark.streaming.cdc import (
    cdc_stream,
    changes_per_table,
    export_cdc_segments,
    maintain_row_deltas,
)
from grapho_spark.streaming.ops import (
    run_to_memory,
    run_with_checkpoint,
    sessionized_counts,
    stateful_user_totals,
    tws_user_stats,
    windowed_counts,
)

__all__ = [
    "cdc_stream",
    "changes_per_table",
    "export_cdc_segments",
    "maintain_row_deltas",
    "run_to_memory",
    "run_with_checkpoint",
    "sessionized_counts",
    "stateful_user_totals",
    "tws_user_stats",
    "windowed_counts",
]
