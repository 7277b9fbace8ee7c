"""Meta-tests for the oracle comparator itself: the single gate every
correctness claim rides on must DETECT wrong answers, not just bless
matching ones. Each case injects a deliberately-broken query into the
registry and asserts the comparator reports the right failure class."""

from __future__ import annotations

import pytest

from grapho_spark.oracle import compare_query
from grapho_spark.queries import REGISTRY, Query


@pytest.fixture()
def inject():
    added: list[str] = []

    def _inject(name: str, spark_fn, oracle: str) -> None:
        REGISTRY[name] = Query(name, spark_fn, oracle, "")
        added.append(name)

    yield _inject
    for n in added:
        REGISTRY.pop(n, None)


def test_detects_value_mismatch(spark, sf_dir, inject):
    inject(
        "_meta_wrong_value",
        lambda sp, d: sp.sql("SELECT 1 AS a, 'x' AS b"),
        "SELECT 2 AS a, 'x' AS b",
    )
    assert compare_query(spark, "_meta_wrong_value", sf_dir)["status"] == "value_mismatch"


def test_detects_rowcount_mismatch(spark, sf_dir, inject):
    inject(
        "_meta_wrong_rows",
        lambda sp, d: sp.range(3).selectExpr("id AS a"),
        "SELECT UNNEST(range(4)) AS a",
    )
    assert (
        compare_query(spark, "_meta_wrong_rows", sf_dir)["status"]
        == "rowcount_mismatch"
    )


def test_detects_schema_mismatch(spark, sf_dir, inject):
    inject(
        "_meta_wrong_schema",
        lambda sp, d: sp.sql("SELECT 1 AS a"),
        "SELECT 1 AS b",
    )
    assert (
        compare_query(spark, "_meta_wrong_schema", sf_dir)["status"]
        == "schema_mismatch"
    )


def test_detects_type_divergence(spark, sf_dir, inject):
    # int64 vs float64 must NOT silently compare equal (the round-1
    # lesson the type-tagged normalizer exists for)
    inject(
        "_meta_wrong_type",
        lambda sp, d: sp.sql("SELECT CAST(1 AS BIGINT) AS a"),
        "SELECT CAST(1 AS DOUBLE) AS a",
    )
    assert (
        compare_query(spark, "_meta_wrong_type", sf_dir)["status"] == "value_mismatch"
    )


def test_blesses_exact_match(spark, sf_dir, inject):
    inject(
        "_meta_right",
        lambda sp, d: sp.sql("SELECT CAST(7 AS BIGINT) AS a, 'ok' AS b"),
        "SELECT CAST(7 AS BIGINT) AS a, 'ok' AS b",
    )
    assert compare_query(spark, "_meta_right", sf_dir)["status"] == "match"
