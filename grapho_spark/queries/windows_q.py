"""Window-function batch two: frame-based moving aggregates, ntile,
lead/lag deltas, first/last_value spans (SURVEY.md §2.4 — windows are
absent in the reference; this is the Spark analytic surface a user
would reach for instead).

Determinism: every window ORDER BY carries a unique tiebreak column,
so frame contents are identical across engines; money math is exact
decimal; date arithmetic is integer days/epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.queries._util import dec
from grapho_spark.tables import load_table


@query(
    "window_moving_avg_monthly",
    oracle="""
WITH monthly AS (
  SELECT o_orderpriority,
         -- month-granularity date_trunc returns DATE in DuckDB but
         -- TIMESTAMP in Spark; cast to align
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
         SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
  FROM orders GROUP BY 1, 2)
SELECT o_orderpriority, month_start,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w AS moving_avg_3m
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month_start
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def window_moving_avg_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-month moving average of monthly revenue per order priority:
    aggregate first (rows collapse to priority x month), then a
    ROWS-frame window over the small grouped result. The moving
    average divides an exact decimal frame-sum by the frame count, so
    accumulation order cannot diverge.

    Scale: the window input is |priorities x months| rows — the
    pre-aggregation does the heavy lifting in one shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        "o_orderpriority", F.date_trunc("month", "o_orderdate").alias("month_start")
    ).agg(F.sum(dec("o_totalprice", 14, 2)).alias("rev"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("month_start")
        .rowsBetween(-2, Window.currentRow)
    )
    return monthly.select(
        "o_orderpriority",
        "month_start",
        F.col("rev").cast("double").alias("revenue"),
        (F.sum("rev").over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "moving_avg_3m"
        ),
    )


@query(
    "window_ntile_balance_deciles",
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment, c_acctbal,
         NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
  FROM customer)
SELECT decile, COUNT(*) AS n_customers,
       CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
       CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
       COUNT(DISTINCT c_mktsegment) AS n_segments
FROM ranked GROUP BY decile
""",
)
def window_ntile_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance deciles via NTILE with a unique (balance,
    custkey) ordering — identical bucket boundaries on both engines —
    summarized per decile.

    Scale: a global NTILE needs a total order; at 100 TB this becomes
    approx quantile boundaries + a broadcast range-partition table,
    same output contract.
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        "c_mktsegment", "c_acctbal", F.ntile(10).over(w).alias("decile")
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("c_acctbal").cast("double").alias("min_bal"),
        F.max("c_acctbal").cast("double").alias("max_bal"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


@query(
    "window_order_gap_days",
    oracle="""
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders)
SELECT o_custkey, COUNT(*) AS n_gaps,
       CAST(SUM(gap_days) AS BIGINT) AS total_gap_days,
       MIN(gap_days) AS min_gap, MAX(gap_days) AS max_gap
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY o_custkey
HAVING COUNT(*) >= 10
""",
)
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between consecutive orders per customer (LAG delta),
    summarized for frequent customers — integer day arithmetic, unique
    (date, orderkey) ordering.

    Scale: one shuffle on o_custkey serves both the window and the
    summary aggregation (same partitioning, no re-exchange).
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_days").cast("bigint").alias("total_gap_days"),
            F.min("gap_days").alias("min_gap"),
            F.max("gap_days").alias("max_gap"),
        )
        .filter(F.col("n_gaps") >= 10)
    )


@query(
    "window_first_last_order_span",
    oracle="""
WITH spans AS (
  SELECT o_custkey,
         FIRST_VALUE(o_orderdate) OVER w AS first_order,
         LAST_VALUE(o_orderdate) OVER w AS last_order,
         COUNT(*) OVER w AS n_orders
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
SELECT date_diff('day', first_order, last_order) AS span_days,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM spans
WHERE n_orders >= 20
GROUP BY 1
""",
)
def window_first_last_order_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime span (first to last order) via
    FIRST_VALUE/LAST_VALUE over an unbounded frame, histogrammed by
    span length for active customers.

    Scale: same single o_custkey shuffle; the unbounded frame is one
    pass per partition.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    spans = o.select(
        "o_custkey",
        F.first("o_orderdate").over(w).alias("first_order"),
        F.last("o_orderdate").over(w).alias("last_order"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
    ).filter(F.col("n_orders") >= 20)
    return spans.groupBy(
        F.datediff("last_order", "first_order").alias("span_days")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@query(
    "window_rank_battery",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function battery per order priority: rank, dense_rank,
    percent_rank and cume_dist over totalprice with orderkey tiebreaks.
    percent_rank/cume_dist are exact rank ratios — one division each,
    rounded at 6dp.

    Scale: one shuffle on the partition key; each priority ranks
    independently (no global sort).
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
