"""Versioned graph schema catalog (semantics of /root/reference/catalog/):
immutable copy-on-write Catalog snapshots, pure validate+apply DDL
functions, and a JSONL event store with snapshot+manifest recovery."""

from grapho_spark.catalog.types import Catalog, EdgeType, FieldSpec, IndexSpec, NodeType
from grapho_spark.catalog.store import CatalogStore

__all__ = ["Catalog", "NodeType", "EdgeType", "FieldSpec", "IndexSpec", "CatalogStore"]
