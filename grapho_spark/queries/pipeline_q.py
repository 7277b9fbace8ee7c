"""Warehouse-maintenance operators a production pipeline needs around
the analytics core: MERGE (upsert) and SCD Type-2 change history.
Neither exists in the reference (it has no join engine at all,
reference server/server.go:526-803) — these are the Spark-first
re-expressions of the table-maintenance half of a data platform.

Both are pure DataFrame plans (one shuffle join / one window pass);
at 100 TB the MERGE key join broadcasts the daily batch or bucket-
joins against a bucketed base, and the SCD2 window partitions by the
entity key, so both stay shard-parallel with no global pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from grapho_spark.queries import query
from grapho_spark.tables import load_table

# Deterministic split of `documents` into a standing base (key ends
# 0-7) and a daily batch: rows ending in 8 become UPDATES of the base
# key 8 below them (doc_id-8 ends in 0 — always present in the base),
# rows ending in 9 are fresh INSERTS.
_MERGE_BASE_PRED = "doc_id % 10 < 8"
_MERGE_BATCH_PRED = "doc_id % 10 >= 8"


@query(
    "merge_upsert_documents",
    oracle=f"""
WITH base AS (
  SELECT doc_id, source, n_chars FROM documents WHERE {_MERGE_BASE_PRED}),
batch AS (
  SELECT CASE WHEN doc_id % 10 = 8 THEN doc_id - 8 ELSE doc_id END AS doc_id,
         source, n_chars
  FROM documents WHERE {_MERGE_BATCH_PRED}),
merged AS (
  SELECT COALESCE(b.doc_id, t.doc_id) AS doc_id,
         COALESCE(b.source, t.source) AS source,
         COALESCE(b.n_chars, t.n_chars) AS n_chars,
         CASE WHEN b.doc_id IS NOT NULL AND t.doc_id IS NOT NULL THEN 'update'
              WHEN t.doc_id IS NULL THEN 'insert'
              ELSE 'keep' END AS action
  FROM base t FULL OUTER JOIN batch b ON t.doc_id = b.doc_id)
SELECT action, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM merged GROUP BY action, source
""",
)
def merge_upsert_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert) as a declarative plan: a daily batch lands
    on a standing base table — matched keys take the batch's values
    (WHEN MATCHED THEN UPDATE), unmatched batch keys append (WHEN NOT
    MATCHED THEN INSERT), untouched base rows pass through. Expressed
    as ONE full-outer join on the key + coalesce projections, with an
    ``action`` audit column instead of side effects, then aggregated
    per (action, source) so the oracle hashes compactly.

    Scale: the single shuffle is the key join; a real deployment
    broadcasts the (small) daily batch or bucket-joins a bucketed
    base — either way the base is never rewritten whole, which is
    what makes MERGE the right maintenance primitive vs full
    recompute."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    base = docs.filter(_MERGE_BASE_PRED)
    batch = docs.filter(_MERGE_BATCH_PRED).withColumn(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 8, F.col("doc_id") - 8).otherwise(
            F.col("doc_id")
        ),
    )
    t, b = base.alias("t"), batch.alias("b")
    merged = t.join(b, F.col("t.doc_id") == F.col("b.doc_id"), "full_outer").select(
        F.coalesce(F.col("b.doc_id"), F.col("t.doc_id")).alias("doc_id"),
        F.coalesce(F.col("b.source"), F.col("t.source")).alias("source"),
        F.coalesce(F.col("b.n_chars"), F.col("t.n_chars")).alias("n_chars"),
        F.when(
            F.col("b.doc_id").isNotNull() & F.col("t.doc_id").isNotNull(),
            F.lit("update"),
        )
        .when(F.col("t.doc_id").isNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )
    return merged.groupBy("action", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "scd2_user_status_history",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
changes AS (
  SELECT user_id, event_type AS status, ts AS valid_from, event_id
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type)
SELECT user_id, status, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, event_id) AS valid_to,
       CAST(LEAD(valid_from) OVER (PARTITION BY user_id
                                   ORDER BY valid_from, event_id) IS NULL
            AS BOOLEAN) AS is_current
FROM changes
""",
)
def scd2_user_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 built from an event stream:
    each time a user's event_type differs from their previous event, a
    new versioned row opens (valid_from = the change's timestamp); the
    next change closes it (valid_to), and the open row is flagged
    ``is_current`` — the standard dimension-history layout, derived
    with two window passes (lag to detect changes, lead to close
    intervals) over the SAME partitioning.

    Scale: both windows partition by user_id — shard-parallel, one
    shuffle total (the second window reuses the first's partitioning),
    no global ordering anywhere. Ties are broken by event_id so the
    history is deterministic under equal timestamps."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "status",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


_SCD2_CTE = """
ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events),
changes AS (
  SELECT user_id, event_type AS status, ts AS valid_from, event_id
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type),
history AS (
  SELECT user_id, status, valid_from,
         LEAD(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from, event_id) AS valid_to
  FROM changes)
"""


@query(
    "events_temporal_enrichment",
    oracle=f"""
WITH {_SCD2_CTE}
SELECT e.event_id, e.user_id, e.ts, h.status AS status_at_event
FROM events e
JOIN history h
  ON h.user_id = e.user_id
 AND e.ts >= h.valid_from
 AND (h.valid_to IS NULL OR e.ts < h.valid_to)
WHERE e.event_type = 'purchase'
""",
)
def events_temporal_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (validity-interval) enrichment: every purchase event
    joined to the SCD2 status row valid AT ITS TIMESTAMP
    (valid_from <= ts < valid_to, open interval for the current row) —
    the dimension-as-of-event-time join every warehouse needs once a
    dimension is versioned.

    Scale: both sides partition by user_id, so the range condition
    evaluates within co-partitioned groups (an equi-join on user_id
    with a residual range filter — no BroadcastNestedLoop); intervals
    per user are bounded by their status-change count.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            F.col("user_id").alias("h_user"),
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w2 = Window.partitionBy("h_user").orderBy("valid_from", "event_id")
    history = changes.select(
        "h_user",
        "status",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    return purchases.join(
        history,
        (F.col("user_id") == F.col("h_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    ).select("event_id", "user_id", "ts", F.col("status").alias("status_at_event"))


@query(
    "dq_audit_orders",
    oracle="""
WITH checks AS (
  SELECT 'orders_pk_unique' AS check_name,
         (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS n_violations
  UNION ALL
  SELECT 'orders_fk_customer',
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'lineitem_fk_orders',
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'orders_totalprice_positive',
         (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
  UNION ALL
  SELECT 'orders_orderdate_not_null',
         (SELECT count(*) FROM orders WHERE o_orderdate IS NULL)
  UNION ALL
  SELECT 'lineitem_discount_in_range',
         (SELECT count(*) FROM lineitem
          WHERE l_discount < 0 OR l_discount > 1))
SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
       (n_violations = 0) AS passed
FROM checks
""",
)
def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit battery (the dbt-tests shape): primary-key
    uniqueness, two referential-integrity checks, a positivity range, a
    not-null and a bounded-range rule — one row per check with its
    violation count and pass flag, the table a pipeline gate consumes.

    Scale: each check is one aggregate or one broadcast/shuffled anti
    join; the result is checks-sized. At 100 TB the FK anti joins are
    the only data-sized terms and shuffle on their key once.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    def one(name, df_cnt):
        return df_cnt.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
            (F.col("n") == 0).alias("passed"),
        )

    pk = o.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("n")
    )
    fk_cust = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fk_ord = (
        l.join(o, l.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    price = o.filter(F.col("o_totalprice") <= 0).agg(F.count(F.lit(1)).alias("n"))
    nn = o.filter(F.col("o_orderdate").isNull()).agg(F.count(F.lit(1)).alias("n"))
    disc = l.filter(
        (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        one("orders_pk_unique", pk)
        .unionByName(one("orders_fk_customer", fk_cust))
        .unionByName(one("lineitem_fk_orders", fk_ord))
        .unionByName(one("orders_totalprice_positive", price))
        .unionByName(one("orders_orderdate_not_null", nn))
        .unionByName(one("lineitem_discount_in_range", disc))
    )
