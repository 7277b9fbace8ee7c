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
from grapho_spark.sparkutil import scratch_path

# Default CSV/JSON timestamp formats drop sub-millisecond precision;
# the fixtures carry microseconds.
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def _roundtrip(spark: SparkSession, df: DataFrame, fmt: str, tag: str) -> DataFrame:
    from grapho_spark.sources import read_table, write_table

    path = scratch_path(f"grapho_src_{fmt}_{tag}")
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
    path = scratch_path(f"grapho_src_part_{key}")
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


_BINFILE_N = 16  # documents exported as standalone blob files


def _binaryfile_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """One blob FILE per document (doc_id < _BINFILE_N) under a
    pid-scoped temp dir — the on-disk shape Spark's built-in
    ``binaryFile`` source ingests (one row per file: path,
    modificationTime, length, content). Published crash-safe: the
    marker is written AFTER all files, so a half-written fixture is
    rebuilt, never read."""
    import hashlib

    import pandas as pd

    tag = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}_pid{os.getpid()}"
    path = scratch_path(f"grapho_binfix_{tag}")
    marker = os.path.join(path, "_FIXTURE_OK")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        docs = pd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        docs = docs[docs["doc_id"] < _BINFILE_N]
        for _, row in docs.iterrows():
            with open(
                os.path.join(path, f"blob_{int(row['doc_id']):04d}.bin"), "wb"
            ) as fh:
                fh.write(row["text"].encode("utf-8"))
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return path


@query(
    "source_binaryfile_blobs",
    oracle=f"""
SELECT 'blob_' || lpad(CAST(doc_id AS VARCHAR), 4, '0') || '.bin' AS fname,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(hex(encode(text))) AS digest
FROM documents
WHERE doc_id < {_BINFILE_N}
ORDER BY fname
""",
)
def source_binaryfile_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob ingestion through Spark's built-in ``binaryFile``
    source — the standard way a multimodal pipeline reads image/audio
    files at scale (one row per file with the raw bytes as a
    ``binary`` column, driven by directory listing; filters on
    path/length push into the listing). The fixture exports the first
    {_BINFILE_N} documents as standalone .bin files; the oracle
    recomputes byte length and content digest straight from the
    documents view, so the round trip (table -> files -> binaryFile
    scan) must be byte-lossless. The digest protocol is
    md5(hex(bytes)) because DuckDB's md5 only accepts VARCHAR — hex
    is identical (uppercase) on both engines.

    Scale: binaryFile is splittable per FILE and prunes on the
    pushed path glob; content bytes stay opaque binary exactly as in
    the multimodal battery (signatures shuffle, payloads don't —
    multimodal_blob_metadata's contract, here from real files).
    """
    d = _binaryfile_fixture_dir(spark, sf_dir)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")  # pushed into the listing
        .load(d)
    )
    return (
        files.select(
            F.regexp_extract("path", r"[^/]+$", 0).alias("fname"),
            F.length("content").cast("long").alias("n_bytes"),
            F.md5(F.hex("content")).alias("digest"),
        )
        .orderBy("fname")
    )


@query(
    "streaming_binaryfile_ingest",
    oracle=f"""
SELECT 'blob_' || lpad(CAST(doc_id AS VARCHAR), 4, '0') || '.bin' AS fname,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(hex(encode(text))) AS digest
FROM documents
WHERE doc_id < {_BINFILE_N}
ORDER BY fname
""",
)
def streaming_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous multimodal ingest: the SAME blob directory read as a
    STREAM (``readStream.format("binaryFile")``) — the at-ingest shape
    of a production media pipeline, where new image/audio files land
    in object storage and each micro-batch picks up only unseen files
    (tracked in the checkpoint's file log, so reprocessing is
    exactly-once per file). Per-file metadata + digest are computed
    map-side in the micro-batch and appended; the finite fixture makes
    the final sink state equal the batch scan, giving this streaming
    source a full value-hash oracle (the ``streaming_windowed_counts``
    contract, applied to file ingest).

    Scale: the file-listing source shards micro-batches by file
    (``maxFilesPerTrigger``/``maxBytesPerTrigger`` bound batch size);
    blob bytes never shuffle — digest/length are computed in the scan
    stage and only the tiny metadata rows reach the sink.
    """
    from grapho_spark.streaming import run_to_memory

    d = _binaryfile_fixture_dir(spark, sf_dir)
    # file streams require an explicit schema (no inference per batch);
    # this is binaryFile's fixed schema, stated rather than inferred
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", "*.bin")
        .load(d)
    )
    meta = files.select(
        F.regexp_extract("path", r"[^/]+$", 0).alias("fname"),
        F.length("content").cast("long").alias("n_bytes"),
        F.md5(F.hex("content")).alias("digest"),
    )
    return run_to_memory(meta, "append").orderBy("fname")


def _schema_evolution_fixture(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Two parquet generations of the orders feed under a pid-scoped
    dir: v1 (even orderkeys) was written before the upstream producer
    added ``o_orderpriority``; v2 (odd orderkeys) carries it. The
    marker is written AFTER both generations (crash-safe publish)."""
    import hashlib

    tag = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}_pid{os.getpid()}"
    base = scratch_path(f"grapho_schevo_{tag}")
    v1, v2 = os.path.join(base, "gen1"), os.path.join(base, "gen2")
    marker = os.path.join(base, "_FIXTURE_OK")
    if not os.path.exists(marker):
        orders = load_table(spark, sf_dir, "orders")
        (
            orders.filter(F.col("o_orderkey") % 2 == 0)
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .write.mode("overwrite")
            .parquet(v1)
        )
        (
            orders.filter(F.col("o_orderkey") % 2 == 1)
            .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
            .write.mode("overwrite")
            .parquet(v2)
        )
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return v1, v2


@query(
    "source_schema_merge_evolution",
    oracle="""
WITH evolved AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS o_orderpriority
  FROM orders)
SELECT CASE WHEN o_orderpriority IS NULL THEN 'pre-evolution' ELSE o_orderpriority END
         AS priority_cohort,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custkeys,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
FROM evolved GROUP BY 1
""",
)
def source_schema_merge_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet file generations — the
    unavoidable 100 TB lake reality that a long-lived feed's early
    files lack columns added later. ``mergeSchema=true`` unions the
    per-file footers into one evolved schema; rows from pre-evolution
    files surface the new column as NULL, and the query buckets
    revenue by priority with an explicit ``'pre-evolution'`` cohort
    for legacy rows. The oracle simulates the same evolution from the
    orders view, so the merged read must be value-exact.

    Scale: footer merging happens once at planning (driver-side,
    bounded by file count, not data); each file is then scanned with
    its OWN physical schema and NULL-filled per-batch — no rewrite of
    old data, no shuffle beyond the final aggregate. The alternative
    (backfill-rewriting TBs of old files on every column add) is
    exactly what this avoids.
    """
    v1, v2 = _schema_evolution_fixture(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(v1, v2)
    return merged.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("pre-evolution")).alias(
            "priority_cohort"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_custkeys"),
        dsum(dec("o_totalprice", 14, 2), "total_price"),
    )


# ------------------------------------------------------ z-order layout

_Z_FILES = 16  # target file count for the layout comparison
_Z_BITS = 8  # bits per dimension (dims live in [0, 256))


def _z_interleave(d1: str, d2: str, div: str) -> str:
    """Bit-interleaved z-value of two {_Z_BITS}-bit dims, in pure
    integer arithmetic (div/mod) so the same formula works on Spark
    (``div``) and DuckDB (``//``)."""
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({d1}) {div} {2**b}) % 2) * {2**(2 * b + 1)}")
        terms.append(f"((({d2}) {div} {2**b}) % 2) * {2**(2 * b)}")
    return " + ".join(terms)


def _zorder_oracle() -> str:
    from grapho_spark.queries.curation import _shu

    div = "//"
    return f"""
WITH base AS (
  SELECT o_orderkey, o_custkey % 256 AS d1,
         (month(o_orderdate) * 31 + day(o_orderdate)) % 256 AS d2
  FROM orders),
z AS (SELECT o_orderkey, d1, d2, {_z_interleave('d1', 'd2', div)} AS zval FROM base),
tagged AS (
  SELECT 'linear' AS layout,
         row_number() OVER (ORDER BY d1, d2, o_orderkey) AS rn, d1, d2 FROM z
  UNION ALL
  SELECT 'zorder',
         row_number() OVER (ORDER BY zval, o_orderkey), d1, d2 FROM z),
nn AS (SELECT COUNT(*) AS n FROM base),
files AS (
  SELECT layout, ((rn - 1) * {_Z_FILES}) {div} n AS file_id,
         MIN(d1) AS min1, MAX(d1) AS max1,
         MIN(d2) AS min2, MAX(d2) AS max2
  FROM tagged, nn GROUP BY 1, 2)
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST({_shu('1000000 * SUM((max1 - min1 + 1) * (max2 - min2 + 1))',
                  'COUNT(*)', div)} AS DOUBLE) / 1000000.0 AS avg_extent_area,
       CAST(SUM(CASE WHEN max1 >= 96 AND min1 <= 127 THEN 1 ELSE 0 END) AS BIGINT)
         AS files_hit_d1_range,
       CAST(SUM(CASE WHEN max2 >= 96 AND min2 <= 127 THEN 1 ELSE 0 END) AS BIGINT)
         AS files_hit_d2_range
FROM files GROUP BY layout
"""


@query("source_zorder_clustering", oracle=_zorder_oracle())
def source_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) data clustering vs a linear sort — the
    layout decision behind file skipping at 100 TB, quantified: assign
    each orders row to one of {_Z_FILES} files under (a) a linear sort
    on (d1, d2) and (b) a bit-interleaved z-value sort, then report
    each layout's average per-file bounding-box area and how many
    files a range predicate on EACH dimension would have to read
    (min/max footer pruning). The linear layout prunes its leading
    dimension well and the trailing one not at all; z-order prunes
    both at ~sqrt cost — the measured argument for OPTIMIZE ZORDER BY
    on any multi-dim-filtered table, computed by the engine itself
    instead of asserted from folklore.

    Determinism: dims, z-values, ranks (ties broken by o_orderkey) and
    file ids are exact integers; the only division is the micro-unit
    half-up mean of integer box areas.

    Scale: this is a layout PLANNER dial — the exact global sort here
    is the test-SF stand-in for the sampled repartitionByRange the
    actual rewrite would use; the per-file min/max aggregation and the
    pruning arithmetic are file-count-, not data-, sized.
    """
    from pyspark.sql import Window

    from grapho_spark.queries.curation import _shu

    div = "div"
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("d1"),
        ((F.month("o_orderdate") * 31 + F.dayofmonth("o_orderdate")) % 256).alias(
            "d2"
        ),
    )
    z = base.withColumn("zval", F.expr(_z_interleave("d1", "d2", div)))
    lin = z.select(
        F.lit("linear").alias("layout"),
        F.row_number().over(Window.orderBy("d1", "d2", "o_orderkey")).alias("rn"),
        "d1",
        "d2",
    )
    zo = z.select(
        F.lit("zorder").alias("layout"),
        F.row_number().over(Window.orderBy("zval", "o_orderkey")).alias("rn"),
        "d1",
        "d2",
    )
    nn = base.agg(F.count(F.lit(1)).alias("n"))
    files = (
        lin.unionAll(zo)
        .crossJoin(F.broadcast(nn))
        .select(
            "layout",
            F.expr(f"((rn - 1) * {_Z_FILES}) div n").alias("file_id"),
            "d1",
            "d2",
        )
        .groupBy("layout", "file_id")
        .agg(
            F.min("d1").alias("min1"),
            F.max("d1").alias("max1"),
            F.min("d2").alias("min2"),
            F.max("d2").alias("max2"),
        )
    )
    return files.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        (
            F.expr(
                _shu(
                    "1000000 * SUM((max1 - min1 + 1) * (max2 - min2 + 1))",
                    "COUNT(*)",
                    div,
                )
            ).cast("double")
            / 1_000_000.0
        ).alias("avg_extent_area"),
        F.sum(F.when((F.col("max1") >= 96) & (F.col("min1") <= 127), 1).otherwise(0))
        .cast("long")
        .alias("files_hit_d1_range"),
        F.sum(F.when((F.col("max2") >= 96) & (F.col("min2") <= 127), 1).otherwise(0))
        .cast("long")
        .alias("files_hit_d2_range"),
    )


# ------------------------------------------------- aggregate pushdown


@query(
    "source_aggregate_pushdown",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_keys,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
       MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
       true AS agg_pushed
FROM orders
""",
)
def source_aggregate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/MIN/MAX answered from parquet FOOTERS alone — Spark's
    DSv2 aggregate pushdown (``spark.sql.parquet.aggregatePushdown``):
    the scan reads row-group statistics, never data pages, so a
    100 TB table's global count/min/max costs one footer read per
    file instead of a full scan. The plan property is certified
    IN-BAND (the wedge-cap convention): the query inspects its own
    physical plan while the pushdown confs are active and emits
    ``agg_pushed`` — the oracle pins it ``true``, so a Spark upgrade
    that silently stops pushing fails value parity, not just a plan
    test.

    The DSv2 flip (parquet off ``useV1SourceList``) and the pushdown
    flag are set only while this plan is built and MATERIALIZED, then
    restored — other queries keep the session's V1 behavior (the
    statement surface runs queries sequentially, like the driver).
    """
    from grapho_spark.plan_expectations import plan_string
    from grapho_spark.sparkutil import materialize

    conf = spark.conf
    old_push = conf.get("spark.sql.parquet.aggregatePushdown")
    old_v1 = conf.get("spark.sql.sources.useV1SourceList")
    try:
        conf.set("spark.sql.parquet.aggregatePushdown", "true")
        conf.set(
            "spark.sql.sources.useV1SourceList",
            ",".join(s for s in old_v1.split(",") if s and s != "parquet"),
        )
        scan = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        agg = scan.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_keys"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
        )
        pushed = "PushedAggregation" in plan_string(agg)
        return materialize(agg.select("*", F.lit(pushed).alias("agg_pushed")))
    finally:
        conf.set("spark.sql.parquet.aggregatePushdown", old_push)
        conf.set("spark.sql.sources.useV1SourceList", old_v1)


# ---------------------------------------------- commitlog datasource

_WAL_N = 32  # documents journaled into the WAL fixture


def _commitlog_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """A deterministic WAL pair (text + binary encodings, identical
    records) journaling the first {_WAL_N} documents as compact JSON
    envelopes — written with the engine's REAL CommitLog writer so the
    on-disk bytes are the production framing. Marker-after-files
    publish (crash-safe, same contract as the blob fixture)."""
    import hashlib

    import pandas as pd

    from grapho_spark.engine.commitlog import CommitLog

    tag = f"{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}_pid{os.getpid()}"
    path = scratch_path(f"grapho_walfix_{tag}")
    marker = os.path.join(path, "_FIXTURE_OK")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        for name in ("commitlog.jsonl", "commitlog.bin"):
            try:
                os.remove(os.path.join(path, name))
            except OSError:
                pass
        docs = pd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        docs = docs[docs["doc_id"] < _WAL_N].sort_values("doc_id")
        records = [
            f'{{"seq":{int(r.doc_id)},"text_md5":"'
            f'{hashlib.md5(r.text.encode("utf-8")).hexdigest()}"}}'
            for r in docs.itertuples()
        ]
        # a small segment cap forces several ROLLS, so the datasource
        # read below exercises real multi-partition segment fan-out
        # (one InputPartition per sealed segment + the active tail)
        for fmt in ("text", "binary"):
            log = CommitLog(path, fmt=fmt, max_segment_bytes=512)
            for rec in records:
                log.append(rec)
            log.close()
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return path


_WAL_ORACLE_ROWS = f"""
SELECT CAST(doc_id AS BIGINT) AS rec_offset,
       CAST(doc_id AS BIGINT) AS seq,
       '{{"seq":' || doc_id || ',"text_md5":"' || md5(text) || '"}}' AS record,
       CAST(octet_length(encode('{{"seq":' || doc_id || ',"text_md5":"'
                                || md5(text) || '"}}')) AS BIGINT) AS n_bytes
FROM documents WHERE doc_id < {_WAL_N}
"""


@query(
    "source_commitlog_datasource",
    oracle=f"""
WITH rows_t AS ({_WAL_ORACLE_ROWS})
SELECT fmt, rec_offset, seq, record, n_bytes
FROM rows_t, (SELECT unnest(['binary', 'text']) AS fmt)
ORDER BY fmt, rec_offset
""",
)
def source_commitlog_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's commit log (WAL) read back through a custom
    PYTHON DATA SOURCE (``spark.read.format("commitlog")``,
    grapho_spark/datasource.py) — Spark 4's DataSource API turned on
    the engine's own durability artifact, so audit/replication tooling
    queries the journal with plain DataFrame ops instead of a bespoke
    export. Both on-disk encodings (text JSONL and 4-byte-BE binary,
    reference server/commitlog.go framing) are read and must agree
    record-for-record; the oracle reconstructs the exact envelope
    bytes from the documents view, so framing, UTF-8 handling and the
    corruption-stop parse are all value-checked.

    Scale: one WAL segment = one InputPartition (sequential replay is
    the log's contract); a segmented production log fans out one
    partition per segment. Only (offset, record) rows leave the
    reader.
    """
    from grapho_spark.datasource import register_commitlog

    register_commitlog(spark)
    d = _commitlog_fixture_dir(spark, sf_dir)
    parts = []
    for fmt in ("text", "binary"):
        df = (
            spark.read.format("commitlog")
            .option("path", d)
            .option("logformat", fmt)
            .load()
        )
        parts.append(
            df.select(
                F.lit(fmt).alias("fmt"),
                F.col("offset").alias("rec_offset"),
                "record",
                "n_bytes",
            )
        )
    both = parts[0].unionAll(parts[1])
    return both.select(
        "fmt",
        "rec_offset",
        F.get_json_object("record", "$.seq").cast("long").alias("seq"),
        "record",
        "n_bytes",
    ).orderBy("fmt", "rec_offset")


@query(
    "streaming_commitlog_tail",
    oracle=f"""
WITH rows_t AS ({_WAL_ORACLE_ROWS})
SELECT rec_offset, seq, record, n_bytes FROM rows_t ORDER BY rec_offset
""",
)
def streaming_commitlog_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same WAL TAILED as a structured stream: the Python data
    source's stream reader checkpoints a single integer offset (the
    record index) and each micro-batch reads only records appended
    since — the engine's journal becomes a live CDC feed with
    exactly-once delivery riding Spark's offset log. The finite
    fixture drains to the batch result, giving the custom streaming
    source a full value-hash oracle.

    Scale: per-batch work is (new records) only; reader state is ONE
    integer regardless of log size.
    """
    from grapho_spark.datasource import register_commitlog
    from grapho_spark.streaming import run_to_memory

    register_commitlog(spark)
    d = _commitlog_fixture_dir(spark, sf_dir)
    s = spark.readStream.format("commitlog").option("path", d).load()
    out = run_to_memory(
        s.select(
            F.col("offset").alias("rec_offset"),
            F.get_json_object("record", "$.seq").cast("long").alias("seq"),
            "record",
            "n_bytes",
        ),
        "append",
    )
    return out.orderBy("rec_offset")


@query(
    "source_xml_roundtrip",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_acctbal,
       MIN(c_custkey) AS min_key,
       MAX(c_custkey) AS max_key,
       CAST(SUM(length(c_name)) AS BIGINT) AS name_chars
FROM customer
GROUP BY c_mktsegment
""",
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> XML (native Spark 4 datasource, one <customer>
    element per row) -> read back with explicit schema -> aggregate;
    must equal aggregating the original parquet. The name-length sum
    pins lossless text round-tripping through XML escaping, and the
    decimal balance sum pins numeric formatting (shortest-round-trip
    doubles both ways).

    Scale: XML is a line-unsplittable format — files, not blocks, are
    the parallelism unit — so the writer's task count (here: the
    upstream partitioning) decides read parallelism; fine for feeds,
    wrong for a 100 TB fact table (use parquet). That trade-off is the
    point of carrying both in the connector matrix.
    """
    from grapho_spark.sources import read_table, write_table

    c = load_table(spark, sf_dir, "customer")
    # pid-scoped: two processes benching the same SF must not race on
    # one overwrite-mode directory (the r7 band-index lesson)
    path = scratch_path(
        f"grapho_src_xml_{os.path.basename(sf_dir)}_{os.getpid()}"
    )
    write_table(c, path, fmt="xml", rowTag="customer")
    back = read_table(spark, path, fmt="xml", schema=c.schema, rowTag="customer")
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(dec("c_acctbal", 14, 2), "total_acctbal"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
        F.sum(F.length("c_name")).cast("long").alias("name_chars"),
    )
