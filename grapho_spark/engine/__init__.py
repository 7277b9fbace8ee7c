"""GraphEngine: executes GQL statements (DDL/DML/MATCH) over Spark
DataFrames with a versioned catalog, constraint enforcement, commit
log + parquet persistence."""

from grapho_spark.engine.engine import GraphEngine, StatementResult

__all__ = ["GraphEngine", "StatementResult"]
