"""Crash-safe fixture publish contract (r8e sources battery): the
blob / schema-evolution fixtures write their _FIXTURE_OK marker only
AFTER every file, so a build that died mid-write must be REBUILT on
the next call, never read half-finished."""

from __future__ import annotations

import os

from grapho_spark.queries.sources_q import (
    _BINFILE_N,
    _binaryfile_fixture_dir,
    _schema_evolution_fixture,
)
from grapho_spark.sparkutil import scratch_path


def test_binaryfile_fixture_rebuilds_after_partial_write(spark, sf_dir):
    # simulate a crash: directory exists with ONE stale, wrong-content
    # blob and no marker
    import hashlib
    import tempfile

    tag = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}_pid{os.getpid()}"
    path = scratch_path(f"grapho_binfix_{tag}")
    marker = os.path.join(path, "_FIXTURE_OK")
    if os.path.exists(marker):
        os.remove(marker)  # invalidate a previously-published fixture
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "blob_0000.bin"), "wb") as fh:
        fh.write(b"torn half-written garbage")

    got = _binaryfile_fixture_dir(spark, sf_dir)
    assert got == path and os.path.exists(marker)
    blobs = sorted(f for f in os.listdir(path) if f.endswith(".bin"))
    assert len(blobs) == _BINFILE_N
    # the torn file must have been overwritten with the real content
    import pandas as pd

    doc0 = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    doc0 = doc0[doc0["doc_id"] == 0]["text"].iloc[0].encode("utf-8")
    with open(os.path.join(path, "blob_0000.bin"), "rb") as fh:
        assert fh.read() == doc0


def test_schema_evolution_fixture_rebuilds_without_marker(spark, sf_dir):
    v1, v2 = _schema_evolution_fixture(spark, sf_dir)
    base = os.path.dirname(v1)
    marker = os.path.join(base, "_FIXTURE_OK")
    assert os.path.exists(marker)
    os.remove(marker)  # crash between generations on a later build
    v1b, v2b = _schema_evolution_fixture(spark, sf_dir)
    assert (v1b, v2b) == (v1, v2) and os.path.exists(marker)
    cols = set(spark.read.parquet(v2b).columns)
    assert "o_orderpriority" in cols
    assert "o_orderpriority" not in set(spark.read.parquet(v1b).columns)
