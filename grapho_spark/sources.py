"""Source/sink connectors (SURVEY.md §2.3 — the reference has no file
formats at all; its only I/O is the TCP statement stream + JSONL
logs). Parquet is the native format; CSV, JSON, ORC, XML (native in
Spark 4 — requires ``rowTag``), and text are supported with explicit
schemas (no runtime inference in pipelines — inference costs an extra
scan and can drift).

JDBC/Delta/Iceberg/Hudi/Avro need jars not present in this
environment; ``read_table`` raises a clear error for them (import-try
gate — Avro's core jars ship with Spark but the ``spark-avro``
datasource module does not, verified by a probe read in this sandbox).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as ST

SUPPORTED = ("parquet", "csv", "json", "orc", "xml", "text", "binaryfile")
NEEDS_JARS = ("jdbc", "delta", "iceberg", "hudi", "avro")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: ST.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    fmt = fmt.lower()
    if fmt in NEEDS_JARS:
        raise NotImplementedError(
            f"{fmt} connector requires driver jars not present in this "
            "environment; add the package to spark.jars.packages and use "
            f'spark.read.format("{fmt}") directly'
        )
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; supported: {SUPPORTED}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} reads require an explicit schema (no inference in pipelines)")
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt == "xml" and "rowTag" not in options:
        raise ValueError("xml reads require an explicit rowTag option")
    return reader.format(fmt).options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    fmt = fmt.lower()
    if fmt == "binaryfile":
        raise ValueError("binaryFile is a read-only source (no writer in Spark)")
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; supported: {SUPPORTED}")
    writer = df.write.mode(mode).options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if fmt == "xml" and "rowTag" not in options:
        raise ValueError("xml writes require an explicit rowTag option")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)
