"""Query registry: the driver-facing correctness surface.

Each registered query is a named pair of
  - a Spark function ``(spark, sf_dir) -> DataFrame`` (DataFrame-API
    first; ``spark.sql`` where SQL is clearer — same Catalyst plan), and
  - optionally a DuckDB-dialect oracle SQL string computing the same
    result on the same parquet tables (pre-registered views).

Determinism contract (critical for the driver's order-insensitive
value hash): every float-producing aggregate is either computed in
exact decimal / integer-scaled arithmetic (so Spark's and DuckDB's
different accumulation orders cannot change the result) or explicitly
rounded at a precision far coarser than the accumulated float error.
Column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a query under ``name`` with its oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules once, on first use.
    from grapho_spark.queries import (  # noqa: F401
        arrays_q,
        dedup,
        embeddings,
        events,
        graph,
        gql_parity,
        multimodal,
        operators_q,
        relational,
        relational2,
        relational3,
        relational4,
        sources_q,
        streaming,
        text,
        timeseries,
        udx,
        windows_q,
    )

    return dict(REGISTRY)
