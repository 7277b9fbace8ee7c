"""The local mirror of the driver's correctness gate: every registered
query with an oracle must match DuckDB exactly (row count, name-sorted
schema, values)."""

from __future__ import annotations

import pytest

from grapho_spark.oracle import compare_query
from grapho_spark.queries import all_queries


def _names() -> list[str]:
    return sorted(all_queries().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    report = compare_query(spark, name, sf_dir)
    assert report["status"] in ("match", "rows_only"), report
    if report["status"] == "rows_only":
        assert report["spark_rows"] >= 0
