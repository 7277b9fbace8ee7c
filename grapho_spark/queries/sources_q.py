"""Connector queries: CSV and JSON round-trips through the
grapho_spark.sources read/write layer, value-checked against the
original parquet via the DuckDB oracle (format conversion must be
lossless — timestamp precision included)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.queries._util import dec, dsum
from grapho_spark.tables import load_table

# Default CSV/JSON timestamp formats drop sub-millisecond precision;
# the fixtures carry microseconds.
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def _roundtrip(spark: SparkSession, df: DataFrame, fmt: str, tag: str) -> DataFrame:
    from grapho_spark.sources import read_table, write_table

    path = os.path.join(tempfile.gettempdir(), f"grapho_src_{fmt}_{tag}")
    # timestampNTZFormat too: if an NTZ column ever reaches the writer,
    # the plain timestampFormat silently doesn't apply and the default
    # NTZ format truncates to milliseconds (a silent wrong answer).
    opts = {"timestampFormat": TS_FMT, "timestampNTZFormat": TS_FMT}
    write_table(df, path, fmt=fmt, **opts)
    return read_table(spark, path, fmt=fmt, schema=df.schema, **opts)


@query(
    "source_csv_roundtrip",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_orderstatus
""",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> CSV (header, explicit timestamp format) -> read back
    with explicit schema -> aggregate; must equal aggregating the
    original parquet (lossless conversion)."""
    o = load_table(spark, sf_dir, "orders")
    back = _roundtrip(spark, o, "csv", os.path.basename(sf_dir))
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(dec("o_totalprice", 14, 2), "revenue"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@query(
    "source_json_roundtrip",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
""",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> JSON lines (microsecond timestamp format) -> read back
    -> aggregate incl. the nested-JSON property; timestamps must
    survive to the microsecond."""
    e = load_table(spark, sf_dir, "events")
    back = _roundtrip(spark, e, "json", os.path.basename(sf_dir))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
    )


@query(
    "source_orc_roundtrip",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
       MIN(l_shipdate) AS first_ship,
       MAX(l_shipdate) AS last_ship
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> ORC -> read back -> aggregate; ORC carries an
    embedded schema and microsecond timestamps, so the round-trip must
    be lossless without explicit format options (unlike CSV/JSON)."""
    l = load_table(spark, sf_dir, "lineitem")
    back = _roundtrip(spark, l, "orc", os.path.basename(sf_dir))
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(dec("l_quantity")).cast("double").alias("total_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


def _partitioned_copy(
    spark: SparkSession, sf_dir: str, table: str, part_col: str
) -> DataFrame:
    """Hive-partitioned parquet copy of a fixture table, cached in a
    temp dir. Cache key = source identity (path + mtime + size) + uid:
    a regenerated fixture gets a fresh partitioned copy instead of
    silently serving stale data, and two users never collide on one
    temp dir."""
    import hashlib

    src = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(src)
        ident = f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}:{part_col}"
    except OSError:
        ident = f"{os.path.abspath(sf_dir)}:{table}:{part_col}"
    key = hashlib.md5(ident.encode()).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(), f"grapho_src_part_{os.getuid()}_{key}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        load_table(spark, sf_dir, table).write.mode("overwrite").partitionBy(
            part_col
        ).parquet(path)
    return spark.read.parquet(path)


@query(
    "source_partitioned_parquet_pruning",
    oracle="""
SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1
""",
)
def source_partitioned_parquet_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink + pruned read-back: orders written
    partitionBy(o_orderpriority), then read with an equality filter on
    the partition column — the scan must list ONLY the matching
    directory (PartitionFilters in the plan; asserted in
    tests/test_operators.py). Values must equal filtering the original
    table.

    Scale: partition layout + pruning is THE first lever at 100 TB —
    a filtered query reads 1/k of the files before any row-level work.
    """
    back = _partitioned_copy(spark, sf_dir, "orders", "o_orderpriority").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return back.groupBy(F.year("o_orderdate").cast("long").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(dec("o_totalprice", 14, 2), "revenue"),
    )


@query(
    "source_dynamic_partition_pruning",
    oracle="""
SELECT n.n_name AS nation,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE n.n_regionkey = 1
GROUP BY 1
""",
)
def source_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (DPP): customer Hive-partitioned by
    c_nationkey, joined to the nation dim filtered on n_regionkey — the
    partition filter is NOT a literal in the query; Catalyst injects a
    runtime ``dynamicpruningexpression`` subquery into the fact scan
    from the broadcast dim side, so only the ~1/5 of partitions whose
    nationkey survives the dim filter are listed and read (asserted on
    the plan in tests/test_operators.py).

    Scale: static pruning covers literal filters; DPP is what keeps a
    100 TB star-schema join from scanning every partition when the
    restriction lives on the dimension table.
    """
    cust = _partitioned_copy(spark, sf_dir, "customer", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    return (
        cust.join(
            F.broadcast(nat),
            cust.c_nationkey == nat.n_nationkey,
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(dec("c_acctbal", 14, 2), "total_acctbal"),
        )
    )
