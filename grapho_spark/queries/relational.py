"""Relational operator surface: scans, filters, joins (inner/semi/anti/
broadcast), aggregations, windows, sorts/top-k, set ops, grouping sets,
pivot, scalar functions (SURVEY.md §2.4 — all absent in the reference,
expressed here as idiomatic Catalyst-optimized DataFrame programs).

Scale notes per query are in the docstrings: which side broadcasts,
where the shuffles are, and why the plan survives a 100x scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.queries._util import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    charge,
    dec,
    disc_price,
    dsum,
)
from grapho_spark.tables import load_table


@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({dp}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({ch}) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""".format(dp=SQL_DISC_PRICE, ch=SQL_CHARGE),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single scan + 8 aggregates over 2 grouping keys.

    Scale: one shuffle on two low-cardinality keys; partial (map-side)
    aggregation collapses ~all rows before the exchange, so the shuffle
    is O(partitions x groups) regardless of table size. Filter and the
    5-column projection push into the parquet scan.
    """
    l = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(disc_price(), "sum_disc_price"),
            dsum(charge(), "sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(dec("l_discount", 4, 2)).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT o_orderkey,
       CAST(SUM({dp}) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1997-06-01'
  AND l_shipdate > DATE '1997-06-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""".format(dp=SQL_DISC_PRICE),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10.

    Scale: customer (filtered to one segment) is the smallest side and
    is broadcast, eliminating a shuffle of orders; lineitem joins
    orders on the shuffle key both sides already aggregate on. Top-10
    uses a total order (revenue DESC, o_orderkey) so ties cannot make
    LIMIT nondeterministic across engines. TakeOrderedAndProject keeps
    the top-k per partition — no global sort materialization.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-06-01"))
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-06-01"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(disc_price(), "revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(SUM({dp}) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
""".format(dp=SQL_DISC_PRICE),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (4 dimension tables) + agg.

    Scale: supplier/nation/region are broadcast (dimension tables stay
    small at any SF), so the only shuffles are lineitem-orders and
    orders-customer on their join keys; the local-supplier predicate
    (c_nationkey = s_nationkey) is applied as a post-join filter on
    broadcast columns, not an extra shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(disc_price(), "revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no grouping.

    Scale: all three predicates push to the parquet scan (row-group
    min/max skipping on l_shipdate); a single global aggregate is
    computed map-side then combined — effectively no shuffle payload.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(dec("l_extendedprice") * dec("l_discount", 4, 2), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "top_customers_by_revenue",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k (total order via c_custkey tiebreak).

    Scale: aggregate orders by o_custkey BEFORE joining customer — the
    join then moves one row per customer instead of one per order, and
    the pre-aggregation reuses the shuffle the groupBy needs anyway.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        dsum(dec("o_totalprice", 14, 2), "revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "revenue", "n_orders")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "semi_join_urgent_customers",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
)
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with >=1 urgent order.

    Scale: semi join never duplicates the left side, so no fan-out; the
    filtered orders side is projected to the single join column before
    the shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "relational_anti_join_customers_no_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def anti_join_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders at all.

    Scale: anti join on the aggregated-to-distinct key column only.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "window_running_order_total",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS order_seq
FROM orders
""",
)
def window_running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: running sum + row_number per customer.

    Scale: one shuffle on o_custkey serves both window functions (same
    partitioning/ordering); frame order has a unique tiebreak
    (o_orderkey) so the running sum is deterministic. Skewed customers
    would be handled by AQE; decimal accumulation keeps it exact.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice", 14, 2))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "window_top3_parts_per_brand",
    oracle="""
SELECT p_brand, p_partkey, p_name, p_retailprice, rn
FROM (SELECT p_brand, p_partkey, p_name, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part)
WHERE rn <= 3
""",
)
def window_top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked window (deterministic tiebreak).

    Scale: the canonical distributed top-k-per-group — rank inside each
    hash partition after one shuffle on the group key; the rn<=3 filter
    is evaluated before any global collection.
    """
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
    )


@query(
    "setop_active_1995_not_1996",
    oracle="""
SELECT o_custkey FROM orders
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
""",
)
def setop_active_1995_not_1996(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: customers active in 1995 but not 1996.

    Scale: EXCEPT DISTINCT = one shuffle on the full (single-column)
    row; both inputs pre-projected to the key.
    """
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01")) & (F.col("o_orderdate") < F.lit("1996-01-01"))
    ).select("o_custkey")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_custkey")
    return y95.subtract(y96)


@query(
    "setop_segments_intersect",
    oracle="""
SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT c_mktsegment FROM customer WHERE c_acctbal < 0
""",
)
def setop_segments_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection of market segments across balance strata."""
    c = load_table(spark, sf_dir, "customer")
    hi = c.filter(F.col("c_acctbal") > 5000).select("c_mktsegment")
    lo = c.filter(F.col("c_acctbal") < 0).select("c_mktsegment")
    return hi.intersect(lo)


@query(
    "rollup_revenue_by_year_priority",
    oracle="""
SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
       o_orderpriority,
       GROUPING(EXTRACT(year FROM o_orderdate))::BIGINT AS g_year,
       GROUPING(o_orderpriority)::BIGINT AS g_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP (EXTRACT(year FROM o_orderdate), o_orderpriority)
""",
)
def rollup_revenue_by_year_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets with GROUPING() disambiguation flags.

    Scale: Spark expands grouping sets map-side; still a single shuffle
    keyed by (keys, grouping-id).
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    return (
        o.rollup("order_year", "o_orderpriority")
        .agg(
            F.grouping("order_year").cast("long").alias("g_year"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            dsum(dec("o_totalprice", 14, 2), "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "order_year", "o_orderpriority", "g_year", "g_priority", "revenue", "n_orders"
        )
    )


@query(
    "pivot_status_revenue_by_year",
    oracle="""
SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE) AS "O",
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE) AS "F",
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE) AS "P"
FROM orders
GROUP BY 1
""",
)
def pivot_status_revenue_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide) with an explicit value list.

    Scale: explicit pivot values avoid the extra distinct-values job;
    pivot compiles to conditional aggregation — one shuffle.
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    return (
        o.groupBy("order_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(dec("o_totalprice", 14, 2)).cast("double"))
    )


@query(
    "scalar_string_functions",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       LOWER(p_type) AS type_lower,
       SUBSTRING(p_name, 1, 12) AS name_prefix,
       LENGTH(p_name) AS name_len,
       REPLACE(p_type, ' ', '_') AS type_snake,
       CONCAT(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
       TRIM(p_name) AS name_trim,
       CONTAINS(p_type, 'BRASS') AS is_brass
FROM part
""",
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string function battery (all JVM built-ins, codegen'd)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.trim("p_name").alias("name_trim"),
        F.col("p_type").contains("BRASS").alias("is_brass"),
    )


@query(
    "date_functions_monthly_revenue",
    oracle="""
SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS order_year,
       EXTRACT(month FROM o_orderdate)::BIGINT AS order_month,
       EXTRACT(quarter FROM o_orderdate)::BIGINT AS order_quarter,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1, 2, 3
""",
)
def date_functions_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime extraction + agg: revenue by (year, month, quarter)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
            dec("o_totalprice", 14, 2).alias("tp"),
        )
        .groupBy("order_year", "order_month", "order_quarter")
        .agg(dsum(F.col("tp"), "revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "relational_case_when_balance_buckets",
    oracle="""
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 3000 THEN 'low'
            WHEN c_acctbal < 7000 THEN 'mid'
            ELSE 'high' END AS bucket,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
FROM customer
GROUP BY 1
""",
)
def case_when_balance_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    c = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    return c.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(dec("c_acctbal"), "total_balance"),
    )


@query(
    "distinct_counts_per_priority",
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def distinct_counts_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg in Spark)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "orders_above_customer_avg",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_above_avg
FROM (SELECT o_orderpriority,
             o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
      FROM orders)
WHERE o_totalprice > cust_avg
GROUP BY o_orderpriority
""",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated 'greater than own group average' via window (the
    classic correlated-subquery rewrite Catalyst would produce).

    Scale: a window avg avoids the self-join of the naive subquery
    form — one shuffle on o_custkey instead of two plus a join.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    with_avg = o.select(
        "o_orderpriority",
        "o_totalprice",
        (
            F.sum(dec("o_totalprice", 14, 2)).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("cust_avg"),
    )
    return (
        with_avg.filter(F.col("o_totalprice") > F.col("cust_avg"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


@query(
    "having_large_orders",
    oracle="""
SELECT l_orderkey, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY l_orderkey
HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
""",
)
def having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(dec("l_quantity"), "total_qty"),
        )
        .filter(F.col("total_qty") > 150)
    )
