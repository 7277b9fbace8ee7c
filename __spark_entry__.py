"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose every registered operator of
grapho_spark with its DuckDB oracle (grapho_spark/queries/*).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# self-locating: grapho_spark must import regardless of the driver's cwd
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from grapho_spark.queries import all_queries

    return all_queries()["q3_shipping_priority"].spark_fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from grapho_spark.queries import all_queries

    return {name: q.spark_fn for name, q in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    from grapho_spark.queries import all_queries

    return {
        name: q.oracle
        for name, q in sorted(all_queries().items())
        if q.oracle is not None
    }
