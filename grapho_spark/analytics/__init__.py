"""Graph algorithms as DataFrame programs over (vertices, edges)
tables — the GraphFrames-style analytics surface (SURVEY.md §7.2
phase 6; the reference defines a property graph but has no
algorithms)."""

from grapho_spark.analytics.algorithms import (
    bfs,
    connected_components,
    connected_components_lss,
    degrees,
    kcore_peel,
    label_propagation,
    multi_source_bfs,
    pagerank,
    sssp,
    triangle_count,
)
from grapho_spark.analytics.motif import find_motif

__all__ = [
    "bfs",
    "multi_source_bfs",
    "connected_components",
    "connected_components_lss",
    "degrees",
    "kcore_peel",
    "label_propagation",
    "pagerank",
    "sssp",
    "triangle_count",
    "find_motif",
]
