"""GQL-engine parity queries: run real GQL statements (the reference's
query language — SURVEY.md §2.1) through our parser + engine against
the fixture tables bound as node types, with plain-SQL oracles.

Populated once the engine slice lands (grapho_spark.engine).
"""

from __future__ import annotations
