"""grapho_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference graph
database (``nikopapanastasiou/grapho``, studied read-only at
``/root/reference``) on top of Apache Spark DataFrames, plus the
large-scale relational / LLM-data-pipeline operator surface the
reference lacks (SURVEY.md §2.4, §7).

Layout
------
- ``gql/``        GQL front-end: lexer, recursive-descent parser, AST
                  (grammar-compatible with reference ``parser/``).
- ``catalog/``    Versioned, immutable graph catalog + JSONL store
                  (semantics of reference ``catalog/``).
- ``engine/``     GraphEngine: statement execution (DDL/DML/MATCH) over
                  copy-on-write parquet table versions + commit log.
- ``queries/``    Registry of analytic queries (Spark fn + DuckDB oracle
                  SQL) — the driver-facing correctness surface.
- ``analytics/``  Graph algorithms (BFS, connected components, PageRank,
                  degrees, motifs) as DataFrame programs.
- ``llmops/``     Dedup (exact / MinHash-LSH / SimHash), similarity
                  search, text analysis, multimodal plumbing.
- ``streaming/``  Structured Streaming operators over the events table.
"""

__version__ = "0.1.0"
