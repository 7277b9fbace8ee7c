"""Second relational batch: exact quantiles, approximate aggregates
(rows-only — Spark's and DuckDB's sketches legitimately differ),
unpivot (wide->long), CUBE grouping sets, ordered string aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.queries._util import dec, dsum
from grapho_spark.tables import load_table


@query(
    "percentiles_exact_by_flag",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
FROM lineitem
GROUP BY l_returnflag
""",
)
def percentiles_exact_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation — both engines use the
    (n-1)*p rule, so values agree; rounded 6dp to absorb last-ulp
    interpolation arithmetic).

    Scale: exact percentile requires a sort per group — fine per-group
    here; at 100 TB switch to approx_percentile (see
    approx_aggregates_rows_only).
    """
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        *[
            F.round(F.expr(f"percentile(l_extendedprice, {p})"), 6).alias(name)
            for p, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.95, "p95")]
        ]
    )


@query(
    "stats_approx_aggregates_rows_only",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS orders_within_5pct,
       TRUE AS parts_within_5pct,
       TRUE AS median_within_5pct
FROM lineitem
GROUP BY l_returnflag
""",
)
def approx_aggregates_rows_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — HLL distinct + quantile sketch.
    Spark's HLL++/KLL and DuckDB's sketches are different algorithms
    with different (both valid) answers, so the sketch outputs can't be
    hash-compared directly. Instead the query emits the EXACT values
    plus Spark-computed booleans asserting each sketch landed within
    5% relative error; the oracle checks the exact values and literal
    TRUE — a deterministic, hashable contract that still fails if a
    sketch goes wild.

    Scale: the approx forms ARE the 100 TB forms — mergeable
    constant-size sketches instead of sort/expand. Distinct sketches
    use Datasketches HLL (``hll_sketch_agg``, lgK=14 ≈ 0.8% rse),
    whose aggregation buffer is ONE binary attribute — NOT classic
    ``approx_count_distinct(rsd=0.01)``, whose HLL++ buffer explodes
    into ~1.5k per-register Long attributes at small rsd and stalls
    whole-stage codegen for minutes (measured r7: rsd=0.02 standalone
    >590s at sf0.01; the sketch itself is not the cost, the generated
    aggregate code is).
    """
    l = load_table(spark, sf_dir, "lineitem")

    def within(approx, exact):
        return (
            F.abs(approx.cast("double") - exact.cast("double"))
            / exact.cast("double")
            <= F.lit(0.05)
        )

    agg = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey", 14)).alias(
            "approx_orders"
        ),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey", 14)).alias(
            "approx_parts"
        ),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        within(F.col("approx_orders"), F.col("exact_orders")).alias(
            "orders_within_5pct"
        ),
        within(F.col("approx_parts"), F.col("exact_parts")).alias("parts_within_5pct"),
        within(F.col("approx_median"), F.col("exact_median")).alias(
            "median_within_5pct"
        ),
    )


@query(
    "unpivot_customer_metrics",
    oracle="""
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
""",
)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide->long) via stack() — the inverse of pivot."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) "
            "AS (metric, value)"
        ),
    )


@query(
    "cube_revenue_by_year_status",
    oracle="""
SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
       o_orderstatus,
       GROUPING(EXTRACT(year FROM o_orderdate))::BIGINT AS g_year,
       GROUPING(o_orderstatus)::BIGINT AS g_status,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (EXTRACT(year FROM o_orderdate), o_orderstatus)
""",
)
def cube_revenue_by_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping-set combinations with GROUPING flags."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    return (
        o.cube("order_year", "o_orderstatus")
        .agg(
            F.grouping("order_year").cast("long").alias("g_year"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            dsum(dec("o_totalprice", 14, 2), "revenue"),
        )
        .select("order_year", "o_orderstatus", "g_year", "g_status", "revenue")
    )


@query(
    "listagg_nations_per_region",
    oracle="""
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM region JOIN nation ON r_regionkey = n_regionkey
GROUP BY r_name
""",
)
def listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list -> array_sort ->
    array_join (collect_list alone is partition-order-nondeterministic;
    the sort makes it stable — SURVEY.md §7 determinism rule)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@query(
    "salted_skew_aggregation",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_totalprice
FROM orders
GROUP BY o_orderstatus
""",
)
def salted_skew_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-phase aggregation (grapho_spark.operators.salted):
    o_orderstatus is heavily skewed ('O'/'F' carry ~half the table
    each); the salt spreads each hot key over 16 reducers in phase one.
    Decimal values make the two-phase split exactly equal to the plain
    sum — which is the oracle.
    """
    from grapho_spark.operators import salted_sum

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", dec("o_totalprice", 14, 2).alias("tp")
    )
    out = salted_sum(
        o, key_cols=["o_orderstatus"], value_col="tp", unique_col="o_orderkey"
    )
    return out.select(
        "o_orderstatus", F.col("sum_tp").cast("double").alias("sum_totalprice")
    )


@query(
    "sketch_merge_distinct_bounded",
    oracle="""
SELECT COUNT(DISTINCT user_id) AS exact_users,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_partial_sketches,
       TRUE AS merged_within_5pct
FROM events
""",
)
def sketch_merge_distinct_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: build one Datasketches HLL
    sketch of user_id PER event_type partition, then merge the partial
    sketches with hll_union_agg and estimate the global distinct count
    — the build-partial/merge-later pattern that lets 100 TB pipelines
    maintain distinct counts incrementally (per day/shard) and combine
    them without re-scanning. Same bounded-check contract as
    approx_aggregates_rows_only: the query emits the exact count plus
    a Spark-computed 5%-relative-error boolean (sketch estimates are
    engine-specific, so the estimate itself is not hash-compared).

    Scale: each partial sketch is KBs regardless of cardinality; the
    merge is a constant-size reduction, not a shuffle of values.
    """
    e = load_table(spark, sf_dir, "events")
    partials = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = partials.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count(F.lit(1)).alias("n_partial_sketches"),
    )
    exact = e.agg(F.count_distinct("user_id").alias("exact_users"))
    return exact.crossJoin(F.broadcast(merged)).select(
        "exact_users",
        F.col("n_partial_sketches").cast("long").alias("n_partial_sketches"),
        (
            F.abs(F.col("est").cast("double") - F.col("exact_users").cast("double"))
            / F.col("exact_users").cast("double")
            <= F.lit(0.05)
        ).alias("merged_within_5pct"),
    )


@query(
    "fuzzy_name_match_blocked",
    oracle="""
WITH c AS (SELECT c_custkey AS ckey, c_name FROM customer),
s AS (SELECT s_suppkey AS skey, s_name FROM supplier),
blocked AS (
  SELECT c.ckey, c.c_name, s.skey, s.s_name,
         levenshtein(substring(c.c_name, 10), substring(s.s_name, 10)) AS name_dist
  FROM c JOIN s
    ON substring(CAST(c.ckey AS VARCHAR), 1, 1) = substring(CAST(s.skey AS VARCHAR), 1, 1))
SELECT ckey, c_name, skey, s_name, CAST(name_dist AS BIGINT) AS name_dist
FROM blocked WHERE name_dist <= 2
""",
)
def fuzzy_name_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (entity-resolution shape): customer and
    supplier identifier suffixes compared by Levenshtein edit distance
    WITHIN blocks (first digit of the key), keeping near-matches
    (distance <= 2). The blocking key is what makes fuzzy matching
    feasible at scale — the edit-distance comparison never runs
    across blocks, so cost is sum of block-pair products instead of
    the full cross product.

    Scale: equi-join on the block key with the distance as a residual
    filter; block sizing (here 1 digit, in production a phonetic/
    prefix key) bounds the quadratic term.
    """
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"), "c_name"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("skey"), "s_name"
    )
    blocked = c.join(
        s,
        F.substring(F.col("ckey").cast("string"), 1, 1)
        == F.substring(F.col("skey").cast("string"), 1, 1),
    ).select(
        "ckey",
        "c_name",
        "skey",
        "s_name",
        F.levenshtein(
            F.substring("c_name", 10, 100), F.substring("s_name", 10, 100)
        ).cast("long").alias("name_dist"),
    )
    return blocked.filter(F.col("name_dist") <= 2)
