"""Third relational batch — classic TPC-H shapes not yet covered:
conditional-aggregate ratio (Q14), grouped-HAVING IN-subquery (Q18),
min-per-group join (Q2's correlated-min core), outer-join histogram
(Q13 shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.queries._util import SQL_DISC_PRICE, dec, disc_price, dsum
from grapho_spark.tables import load_table


@query(
    "promo_revenue_ratio",
    oracle=f"""
SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {SQL_DISC_PRICE}
                     ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE)
         / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) * 100.0 AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'
""",
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a fact-dim
    join. Both sums are exact decimals; the final division is one
    deterministic double op, so no rounding is needed.

    Scale: part is broadcast; the month filter pushes to the lineitem
    scan (row-group skipping on l_shipdate).
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01")) & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    p = load_table(spark, sf_dir, "part")
    dp = disc_price()
    promo = F.when(F.col("p_type").like("PROMO%"), dp).otherwise(
        F.lit(0).cast("decimal(4,2)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(promo).cast("double") / F.sum(dp).cast("double") * F.lit(100.0)
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "large_volume_customers",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the IN-(grouped HAVING subquery) rewritten as
    aggregate-then-join — Catalyst's decorrelation target, written
    directly.

    Scale: the HAVING filter shrinks the subquery result to the rare
    big orders before any join; customer joins via broadcast of that
    small set.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("total_qty_dec"))
        .filter(F.col("total_qty_dec") > 250)
    )
    return (
        F.broadcast(big)
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("total_qty_dec").cast("double").alias("total_qty"),
        )
    )


@query(
    "relational_cheapest_supplier_per_part",
    oracle="""
SELECT p_partkey, p_name, s_suppkey, s_acctbal
FROM (SELECT l_partkey, l_suppkey,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY s_acctbal, l_suppkey) AS rn
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN supplier ON s_suppkey = ps.l_suppkey) ranked
JOIN part ON p_partkey = ranked.l_partkey
JOIN supplier ON s_suppkey = ranked.l_suppkey
WHERE rn = 1
""",
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-min core: for each part, the supplier with
    the minimal account balance among its actual suppliers —
    min-per-group via ranked window with deterministic tiebreak,
    instead of a correlated subquery + rejoin."""
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("l_partkey").orderBy("s_acctbal", "l_suppkey")
    ranked = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return ranked.join(F.broadcast(p), ranked.l_partkey == p.p_partkey).select(
        "p_partkey", "p_name", "s_suppkey", "s_acctbal"
    )


@query(
    "customer_order_histogram",
    oracle="""
SELECT n_orders, COUNT(*) AS n_customers
FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey)
GROUP BY n_orders
""",
)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer distribution via LEFT OUTER
    join (zero-order customers must appear in the 0 bucket) + double
    aggregation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))
