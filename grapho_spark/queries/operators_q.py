"""Oracle-checked queries driving the generic operator library
(grapho_spark.operators, grapho_spark.analytics): as-of join, bucketed
range join, motif finding."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grapho_spark.sparkutil import materialize

from grapho_spark.queries import query
from grapho_spark.queries.graph import copurchase_edges, _DUCK_EDGES_CTE
from grapho_spark.tables import load_table


@query(
    "operators_asof_purchases",
    oracle="""
WITH purchases AS (
  SELECT user_id, ts, MAX(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts),
errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
SELECT e.event_id, e.user_id, e.ts,
       (SELECT p.purchase_event_id FROM purchases p
        WHERE p.user_id = e.user_id AND p.ts <= e.ts
        ORDER BY p.ts DESC LIMIT 1) AS purchase_event_id_asof
FROM errors e
""",
)
def asof_operator_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic union-window ``asof_join`` operator: each error
    event picks up the user's latest at-or-before purchase event id.
    Right side deduped to one row per (user, ts) so the as-of value is
    unambiguous on both engines."""
    from grapho_spark.operators import asof_join

    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    return asof_join(
        errors,
        purchases,
        on="ts",
        by="user_id",
        value_cols=["purchase_event_id"],
        allow_exact=True,
    )


@query(
    "range_join_acctbal_bands",
    oracle="""
SELECT s_suppkey,
       COUNT(c_custkey) AS n_customers_in_band
FROM supplier LEFT JOIN customer
  ON c_acctbal >= s_acctbal - 500 AND c_acctbal <= s_acctbal + 500
GROUP BY s_suppkey
""",
)
def range_join_acctbal_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: suppliers to customers whose balance falls
    within +/-500 of the supplier's — an equi-join on bucket ids plus
    an exact filter instead of Catalyst's nested-loop fallback."""
    from grapho_spark.operators import bucketed_range_join

    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 500).alias("lo"),
        (F.col("s_acctbal") + 500).alias("hi"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    joined = bucketed_range_join(s, c, lo="lo", hi="hi", point="c_acctbal", bucket_width=500.0)
    counted = joined.groupBy("s_suppkey").agg(
        F.count("c_custkey").alias("n_customers_in_band")
    )
    # left semantics: suppliers with zero matches still appear
    return (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey")
        .join(counted, "s_suppkey", "left")
        .select(
            "s_suppkey",
            F.coalesce("n_customers_in_band", F.lit(0)).alias("n_customers_in_band"),
        )
    )


@query(
    "motif_2path_count",
    oracle=f"""
WITH {_DUCK_EDGES_CTE}
SELECT COUNT(*) AS n_2paths
FROM edges e1 JOIN edges e2 ON e1.p2 = e2.p1
""",
)
def motif_2path_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphFrames-style motif finder over the co-purchase graph:
    counts directed 2-paths (a)->(b)->(c) — the edge-pattern MATCH the
    reference's grammar could not express (parser.go:685)."""
    from grapho_spark.analytics import find_motif

    edges = copurchase_edges(spark, sf_dir).select(
        F.col("p1").alias("src"), F.col("p2").alias("dst")
    ).transform(materialize)
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
        .transform(materialize)
    )
    paths = find_motif(vertices, edges, "(a)-[x]->(b); (b)-[y]->(c)")
    return paths.agg(F.count(F.lit(1)).alias("n_2paths"))
