"""Loaders for the driver-generated parquet fixture tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under an
``sf*`` directory.

``load_tables`` also registers each DataFrame as a temp view so query
code can freely mix the DataFrame API and ``spark.sql`` (Catalyst
produces the same plan either way).

Scale note: these are plain parquet scans — Catalyst pushes filters
and prunes columns into the scan (verified via ``explain``, see
PERF.md). ``region``/``nation``/``supplier``/``part`` are dimension
tables; query code broadcast-hints them at join sites rather than here
(the hint belongs to the join, not the load).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from grapho_spark.sparkutil import scratch_path

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any realistic SF.
DIM_TABLES = {"region", "nation", "supplier", "part"}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Confs our loads rely on, set dynamically so they hold even in a
    session we didn't build (the driver's):

    - nanosAsLong: Spark 4 refuses TIMESTAMP(NANOS) parquet columns
      (events.ts) unless they're surfaced as raw long nanoseconds; we
      convert back to TimestampType below (values are us-aligned).
    - UTC session timezone: timestamp collection must match the
      UTC-naive DuckDB oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _convert_ns_columns(df: DataFrame) -> DataFrame:
    dtypes = dict(df.dtypes)
    if dtypes.get("ts") == "bigint":
        # legacy fixtures: TIMESTAMP(NANOS) parquet surfaced as raw long
        # nanoseconds via nanosAsLong. integer `div`, NOT `/`: float
        # division loses sub-us precision on epoch-nanosecond
        # magnitudes (> 2^53).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # current fixtures: plain timestamp[us] with no timezone, which
    # Spark 4 reads as TIMESTAMP_NTZ. unix_micros()/withWatermark()
    # reject NTZ and the JSON writer formats it under a different
    # option, so normalize to TIMESTAMP. Value-preserving: the session
    # timezone is pinned to UTC in _ensure_session_confs.
    for name, dtype in dtypes.items():
        if dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


_TABLE_MEMO: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fixture-table DataFrame, memoized per (session, path, mtime).

    Building the reader costs ~96ms warm (footer read, file index,
    analysis of the ns->us conversion projection) and queries call
    this 1-4 times per invocation — across a bench pass that is
    seconds of pure driver time. DataFrames are immutable so reuse is
    safe; a rebuilt fixture bumps the path mtime and mints a new
    entry. No data is cached — every action still scans the parquet."""
    _ensure_session_confs(spark)
    path = table_path(sf_dir, name)
    try:
        mt = os.stat(path).st_mtime_ns
    except OSError:
        mt = -1
    key = (spark.sparkContext.applicationId, os.path.abspath(path), mt)
    df = _TABLE_MEMO.get(key)
    if df is None:
        df = _TABLE_MEMO[key] = _convert_ns_columns(spark.read.parquet(path))
    return df


_STREAM_SCHEMA_MEMO: dict[tuple, object] = {}


def _stream_schema(spark: SparkSession, path: str):
    """Parquet footer schema, memoized per (session, path, mtime).

    Every streaming query pays a driver-side footer read just to
    declare its source schema (streaming reads cannot infer); the
    fixture is immutable between rebuilds, and a rebuild bumps the
    file mtime, which invalidates the key."""
    st = os.stat(path)
    key = (spark.sparkContext.applicationId, os.path.abspath(path), st.st_mtime_ns)
    sch = _STREAM_SCHEMA_MEMO.get(key)
    if sch is None:
        sch = _STREAM_SCHEMA_MEMO[key] = spark.read.parquet(path).schema
    return sch


def load_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Structured-Streaming source for a fixture table (explicit raw
    schema — streaming reads cannot infer), with the same ns->us
    timestamp conversion as the batch loader."""
    _ensure_session_confs(spark)
    raw_schema = _stream_schema(spark, table_path(sf_dir, name))
    # The file stream source requires a DIRECTORY; the fixture is a
    # single parquet file. Expose it through a symlink dir under /tmp.
    # hashlib, not hash(): Python string hashing is salted per process,
    # which would mint a fresh symlink dir on every run.
    digest = hashlib.md5(f"{sf_dir}:{name}".encode()).hexdigest()[:10]
    link_dir = scratch_path(f"grapho_stream_{digest}")
    os.makedirs(link_dir, exist_ok=True)
    src = os.path.abspath(table_path(sf_dir, name))
    # Prune dangling links first: a rebuilt fixture (mode=overwrite
    # mints new random part names) leaves links whose targets are gone;
    # the file-stream source would error on them (and os.path.exists on
    # a dangling link reads False, so the re-link below would collide).
    for entry in os.listdir(link_dir):
        p = os.path.join(link_dir, entry)
        if os.path.islink(p) and not os.path.exists(p):
            try:
                os.unlink(p)
            except FileNotFoundError:
                pass  # the link dir is cross-process shared: a
                # concurrent pruner may have unlinked it first
    if os.path.isdir(src):
        # Spark-written fixture (a parquet DIRECTORY, e.g. the scale
        # probe's inflated copies): the file-stream source does not
        # follow a symlinked subdirectory — it listed zero files and
        # silently streamed nothing (r7 find). Link the part files
        # themselves.
        stale = os.path.join(link_dir, f"{name}.parquet")
        if os.path.islink(stale) and os.path.isdir(stale):
            os.unlink(stale)
        for part in os.listdir(src):
            if part.endswith(".parquet"):
                link = os.path.join(link_dir, f"{name}_{part}")
                if not os.path.exists(link):
                    os.symlink(os.path.join(src, part), link)
    else:
        link = os.path.join(link_dir, f"{name}.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
    stream = spark.readStream.schema(raw_schema).parquet(link_dir)
    return _convert_ns_columns(stream)


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None, register: bool = True
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
