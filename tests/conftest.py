from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("GRAPHO_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from grapho_spark.session import get_spark

    s = get_spark("grapho_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
