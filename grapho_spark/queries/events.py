"""Event-stream analytics over the ``events`` table (batch side):
sessionization (gaps-and-islands), tumbling windows, as-of join,
JSON property extraction. The streaming counterparts live in
``grapho_spark/streaming`` (SURVEY.md §2.4: streaming absent in the
reference; the commit log is its only stream-like artifact).

Timestamps are compared in epoch microseconds (``unix_micros`` /
``epoch_us``) on both engines — integer math, no float or truncation
ambiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.tables import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@query(
    "events_sessionization",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_US}
              OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM (SELECT user_id, event_id, new_session FROM flagged))
SELECT user_id,
       COUNT(DISTINCT session_id) AS n_sessions,
       COUNT(*) AS n_events,
       COUNT(*) * 1.0 / COUNT(DISTINCT session_id) AS avg_events_per_session
FROM sessions
GROUP BY user_id
""",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via gaps-and-islands: a session breaks after a
    30-minute silence per user.

    Scale: two window passes over the same (user_id, ts) partitioning —
    one shuffle total; per-user data is tiny, so no skew concern. The
    same semantics are available incrementally via
    ``session_window`` in the streaming module.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    flagged = e.select(
        "user_id",
        "event_id",
        F.when(
            (us - F.lag(us).over(w) > SESSION_GAP_US) | F.lag(us).over(w).isNull(), 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = flagged.select("user_id", F.sum("new_session").over(w2).alias("session_id"))
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        (F.count(F.lit(1)) * F.lit(1.0) / F.countDistinct("session_id")).alias(
            "avg_events_per_session"
        ),
    )


@query(
    "events_tumbling_hourly",
    oracle="""
SELECT date_trunc('hour', ts) AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate per event type (batch form of
    the streaming windowed count — see streaming module).

    Scale: single shuffle on (hour, type); decimal sum keeps the
    double-valued metric deterministic.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


@query(
    "events_asof_last_purchase",
    oracle="""
SELECT event_id, user_id, ts, last_purchase_ts,
       CASE WHEN last_purchase_ts IS NOT NULL
            THEN (epoch_us(ts) - epoch_us(last_purchase_ts)) / 1000000.0 END AS secs_since_purchase
FROM (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_ts
  FROM events)
WHERE event_type = 'error'
""",
)
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed as a single-pass window (union-free): for
    every error event, the user's most recent strictly-prior purchase.

    Scale: this is the shuffle-minimal as-of pattern — instead of a
    range join (quadratic blowup) the two event sets stay in one
    stream, one shuffle on user_id, and ``last(..., ignorenulls)``
    carries the as-of value forward. A generic two-table as-of
    operator built on the same idea lives in
    ``grapho_spark.operators.asof``.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    enriched = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_purchase_ts"),
    )
    return enriched.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        "ts",
        "last_purchase_ts",
        F.when(
            F.col("last_purchase_ts").isNotNull(),
            (F.unix_micros("ts") - F.unix_micros("last_purchase_ts")) / F.lit(1000000.0),
        ).alias("secs_since_purchase"),
    )


@query(
    "events_json_extraction",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
)
def events_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: extract an int property from the JSON
    ``props`` column and aggregate (reference type ``json`` maps to
    StringType + accessors — SURVEY.md §1.2).
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "events_hourly_top_type",
    oracle="""
SELECT hour_start, event_type, n_events
FROM (SELECT date_trunc('hour', ts) AS hour_start, event_type, COUNT(*) AS n_events,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY 1, 2)
WHERE rn = 1
""",
)
def events_hourly_top_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 event type per hour: agg then ranked window (deterministic
    tiebreak on event_type)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("hour_start").orderBy(F.desc("n_events"), "event_type")
    return (
        hourly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("hour_start", "event_type", "n_events")
    )


@query(
    "events_daily_retention",
    oracle="""
WITH daily AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT a.day AS day,
       COUNT(DISTINCT a.user_id) AS n_active,
       COUNT(DISTINCT b.user_id) AS n_retained_next_day
FROM daily a
LEFT JOIN daily b
  ON a.user_id = b.user_id AND b.day = a.day + 1
GROUP BY a.day
""",
)
def events_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day retention: distinct active users per day self-joined to
    the following day (the classic cohort-retention shape).

    Scale: the distinct (user, day) projection collapses the event
    volume before the self-join; the join key includes user_id so it
    shuffles the compacted table once.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    a = daily.alias("a")
    b = daily.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.day") == F.date_add(F.col("a.day"), 1)),
            "left",
        )
        .groupBy(F.col("a.day").alias("day"))
        .agg(
            F.countDistinct(F.col("a.user_id")).alias("n_active"),
            F.countDistinct(F.col("b.user_id")).alias("n_retained_next_day"),
        )
    )


@query(
    "events_funnel_conversion",
    oracle="""
WITH signups AS (
  SELECT user_id, MIN(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
conv AS (
  SELECT s.user_id, s.signup_ts, MIN(p.ts) AS first_purchase_ts
  FROM signups s
  LEFT JOIN events p
    ON p.user_id = s.user_id AND p.event_type = 'purchase'
   AND p.ts >= s.signup_ts
   AND epoch_us(p.ts) - epoch_us(s.signup_ts) <= CAST(604800000000 AS BIGINT)
  GROUP BY s.user_id, s.signup_ts)
SELECT CAST(signup_ts AS DATE) AS cohort_day,
       CAST(COUNT(*) AS BIGINT) AS n_signups,
       CAST(COUNT(first_purchase_ts) AS BIGINT) AS n_converted_7d,
       COUNT(first_purchase_ts) * 1.0 / COUNT(*) AS conversion_rate
FROM conv GROUP BY cohort_day
""",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: signup -> first purchase within 7 days, rolled
    up into per-cohort-day conversion rates — the standard two-step
    funnel over an event stream, as one aggregate + one time-bounded
    left join (epoch-microsecond integer bounds, no float time math).

    Scale: the signup side collapses to one row per user BEFORE the
    join; the join shuffles on user_id and the purchase side is
    pre-filtered by event_type, so the heavy event volume crosses the
    wire once, filtered.
    """
    e = load_table(spark, sf_dir, "events")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy(F.col("user_id").alias("s_user"))
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        signups.join(
            purchases,
            (F.col("s_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("signup_ts"))
            & (
                F.unix_micros("p_ts") - F.unix_micros("signup_ts")
                <= F.lit(7 * 24 * 3600 * 1_000_000)
            ),
            "left",
        )
        .groupBy("s_user", "signup_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    return conv.groupBy(F.to_date("signup_ts").alias("cohort_day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_signups"),
        F.count("first_purchase_ts").cast("long").alias("n_converted_7d"),
        (F.count("first_purchase_ts") * F.lit(1.0) / F.count(F.lit(1))).alias(
            "conversion_rate"
        ),
    )


@query(
    "events_transition_matrix",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type,
         CASE WHEN epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id))
                   - epoch_us(ts) <= CAST(1800000000 AS BIGINT)
              THEN 1 ELSE 0 END AS within_session
  FROM events)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM ordered
WHERE next_type IS NOT NULL AND within_session = 1
GROUP BY from_type, to_type
""",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-style event transition matrix: counts of (event_type ->
    immediately-following event_type) pairs per user, restricted to
    gaps of at most 30 minutes (the session gap) — the path-analysis
    primitive behind next-action prediction and UX funnels.

    Scale: one window pass partitioned by user_id (shard-parallel),
    then a tiny |types|^2 aggregate; the event volume is never
    self-joined.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        (
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"))
            <= F.lit(30 * 60 * 1_000_000)
        ).alias("within_session"),
    )
    return (
        ordered.filter(F.col("next_type").isNotNull() & F.col("within_session"))
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


@query(
    "events_new_vs_returning",
    oracle="""
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id),
daily AS (
  SELECT CAST(e.ts AS DATE) AS day, e.user_id,
         (CAST(e.ts AS DATE) = f.first_day) AS is_new
  FROM events e JOIN firsts f USING (user_id)
  GROUP BY 1, 2, 3)
SELECT day,
       count(*) FILTER (WHERE is_new) AS new_users,
       count(*) FILTER (WHERE NOT is_new) AS returning_users
FROM daily GROUP BY day
""",
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning active users: a user is 'new' on their
    first-ever active day, 'returning' on later active days — the
    growth-dashboard split.

    Scale: one shuffle on user_id to find first days, one on
    (day, user_id) to distinct daily actives, one per-day count; the
    first-day table is user-sized, joined on the same user_id
    partitioning it was built with.
    """
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily = (
        e.join(firsts, "user_id")
        .select(
            F.to_date("ts").alias("day"),
            "user_id",
            (F.to_date("ts") == F.col("first_day")).alias("is_new"),
        )
        .distinct()
    )
    return daily.groupBy("day").agg(
        F.count(F.when(F.col("is_new"), 1)).alias("new_users"),
        F.count(F.when(~F.col("is_new"), 1)).alias("returning_users"),
    )


@query(
    "orders_cohort_revenue",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort_month
  FROM orders GROUP BY o_custkey),
facts AS (
  SELECT f.cohort_month,
         date_diff('month', f.cohort_month,
                   date_trunc('month', o.o_orderdate)) AS months_since,
         CAST(o.o_totalprice AS DECIMAL(14,2)) AS price
  FROM orders o JOIN firsts f USING (o_custkey))
SELECT cohort_month, months_since,
       count(*) AS n_orders,
       CAST(sum(price) AS DOUBLE) AS revenue
FROM facts
WHERE months_since <= 24
GROUP BY cohort_month, months_since
""",
)
def orders_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-LTV matrix: customers grouped by first-order month, and
    each later order's revenue attributed to (cohort, months-since) —
    the retention/LTV triangle, first 24 months. Exact-decimal revenue.

    Scale: one custkey shuffle to find cohorts (customer-sized table,
    joined back on the same key), one shuffle for the matrix rollup.
    The matrix itself is months^2-sized — trivially small at any data
    scale.
    """
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.trunc(F.min("o_orderdate"), "month").alias("cohort_month")
    )
    facts = o.join(firsts, "o_custkey").select(
        "cohort_month",
        (
            F.months_between(F.trunc("o_orderdate", "month"), F.col("cohort_month"))
        ).cast("long").alias("months_since"),
        F.col("o_totalprice").cast("decimal(14,2)").alias("price"),
    )
    return (
        facts.filter(F.col("months_since") <= 24)
        .groupBy("cohort_month", "months_since")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
        )
    )


@query(
    "events_interarrival_stats",
    oracle="""
WITH gaps AS (
  SELECT user_id,
         date_diff('second',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events)
SELECT user_id,
       count(*) AS n_gaps,
       CAST(min(gap_s) AS BIGINT) AS min_gap_s,
       CAST(max(gap_s) AS BIGINT) AS max_gap_s,
       CAST(sum(gap_s) AS BIGINT) AS total_gap_s,
       CAST(median(gap_s) AS DOUBLE) AS median_gap_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY user_id
""",
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics (seconds between consecutive
    events): count, min/max, total and exact median — the
    activity-cadence profile behind sessionization thresholds and bot
    detection. All integer seconds; the median is Spark's exact
    percentile against DuckDB's median (both exact on integers).

    Scale: one shuffle on user_id shared by the lag window and the
    rollup; no global ordering.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_s").cast("long").alias("min_gap_s"),
        F.max("gap_s").cast("long").alias("max_gap_s"),
        F.sum("gap_s").cast("long").alias("total_gap_s"),
        F.expr("percentile(gap_s, 0.5)").cast("double").alias("median_gap_s"),
    )


@query(
    "events_hourly_seasonality",
    oracle="""
WITH tot AS (SELECT count(*) AS n FROM events)
SELECT CAST(isodow(ts) AS BIGINT) AS dow,
       CAST(date_part('hour', ts) AS BIGINT) AS hour,
       count(*) AS n_events,
       round(count(*) * 1.0 / n, 6) AS share
FROM events, tot
GROUP BY 1, 2, n
""",
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap: event volume per (ISO weekday, hour-of-day)
    cell with each cell's corpus share — the traffic-seasonality
    profile capacity planning reads. Integer counts; one rounded
    division.

    Scale: one 168-cell rollup with map-side combine plus a 1-row
    scalar.
    """
    e = load_table(spark, sf_dir, "events")
    tot = e.agg(F.count(F.lit(1)).alias("n"))
    cells = e.groupBy(
        F.dayofweek(F.date_sub("ts", 0)).alias("_dow_raw"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    # Spark dayofweek: 1=Sunday..7=Saturday; ISO dow: 1=Monday..7=Sunday
    iso = F.when(F.col("_dow_raw") == 1, 7).otherwise(F.col("_dow_raw") - 1)
    return cells.crossJoin(F.broadcast(tot)).select(
        iso.cast("long").alias("dow"),
        F.col("hour").cast("long").alias("hour"),
        "n_events",
        F.round(F.col("n_events") * F.lit(1.0) / F.col("n"), 6).alias("share"),
    )


@query(
    "events_trigram_paths",
    oracle="""
WITH ordered AS (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3,
         CASE WHEN epoch_us(LEAD(ts, 2) OVER w) - epoch_us(ts)
                   <= CAST(1800000000 AS BIGINT) THEN 1 ELSE 0 END AS tight
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM ordered
WHERE t3 IS NOT NULL AND tight = 1
GROUP BY t1, t2, t3
ORDER BY n_paths DESC, t1, t2, t3
LIMIT 20
""",
)
def events_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining over the event stream: the 20 most
    frequent 3-step event-type paths where the whole triple fits in a
    30-minute window — the sequence primitive behind journey mining
    and next-k-action models.

    Scale: one window pass partitioned by user_id (shard-parallel, no
    self-join), then an aggregate over at most |types|^3 keys and a
    TakeOrderedAndProject top-20 with a total tie-break order.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
        (
            (F.unix_micros(F.lead("ts", 2).over(w)) - F.unix_micros("ts"))
            <= F.lit(30 * 60 * 1_000_000)
        ).alias("tight"),
    )
    return (
        ordered.filter(F.col("t3").isNotNull() & F.col("tight"))
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "t1", "t2", "t3")
        .limit(20)
    )


@query(
    "events_touch_attribution",
    oracle="""
WITH touches AS (
  SELECT user_id, ts, event_type
  FROM (SELECT user_id, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id) AS rn
        FROM events WHERE event_type IN ('view', 'click'))
  WHERE rn = 1),
purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
attributed AS (
  SELECT p.value,
         (SELECT t.event_type FROM touches t
          WHERE t.user_id = p.user_id AND t.ts < p.ts
            AND epoch_us(p.ts) - epoch_us(t.ts) <= CAST(604800000000 AS BIGINT)
          ORDER BY t.ts LIMIT 1) AS first_touch,
         (SELECT t.event_type FROM touches t
          WHERE t.user_id = p.user_id AND t.ts < p.ts
            AND epoch_us(p.ts) - epoch_us(t.ts) <= CAST(604800000000 AS BIGINT)
          ORDER BY t.ts DESC LIMIT 1) AS last_touch
  FROM purchases p)
SELECT position, channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM (
  SELECT 'first' AS position, first_touch AS channel, value
  FROM attributed WHERE first_touch IS NOT NULL
  UNION ALL
  SELECT 'last' AS position, last_touch AS channel, value
  FROM attributed WHERE last_touch IS NOT NULL)
GROUP BY position, channel
ORDER BY position, channel
""",
)
def events_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style touch attribution: each purchase credits the
    FIRST and the LAST view/click touch of the same user inside a
    7-day lookback; revenue rolls up per (position, channel).
    Touches are deduplicated to the min event_id per (user, ts) so
    equal-timestamp ties cannot flip the winner between engines.

    Scale: both the last-touch and first-touch sweeps are range-frame
    window passes over the per-user timeline (one shuffle on user_id)
    — the oracle's correlated LIMIT-1 probes per purchase are stated
    semantics only. The final rollup has at most 2 x |channels| keys.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select("user_id", "ts", "event_id", "event_type", "value")
    # Rank ONLY touch rows per (user, ts) — mirroring the oracle's
    # `touches` CTE. Ranking the mixed stream would let a purchase with
    # a smaller event_id shadow a same-timestamp touch out of existence.
    w_dedup = Window.partitionBy("user_id", "ts").orderBy("event_id")
    touches = (
        base.filter(F.col("event_type").isin("view", "click"))
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    tagged = touches.unionByName(
        base.filter(F.col("event_type") == "purchase")
    ).select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_type",
        "value",
    )
    lookback = 7 * 24 * 3600 * 1_000_000
    w_range = (
        Window.partitionBy("user_id").orderBy("us").rangeBetween(-lookback, -1)
    )
    touch_type = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    attributed = tagged.select(
        "event_type",
        "value",
        F.first(touch_type, ignorenulls=True).over(w_range).alias("first_touch"),
        F.last(touch_type, ignorenulls=True).over(w_range).alias("last_touch"),
    ).filter(F.col("event_type") == "purchase")
    unioned = attributed.filter(F.col("first_touch").isNotNull()).select(
        F.lit("first").alias("position"),
        F.col("first_touch").alias("channel"),
        "value",
    ).unionByName(
        attributed.filter(F.col("last_touch").isNotNull()).select(
            F.lit("last").alias("position"),
            F.col("last_touch").alias("channel"),
            "value",
        )
    )
    return (
        unioned.groupBy("position", "channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("revenue"),
        )
        .orderBy("position", "channel")
    )


@query(
    "events_asof_tolerance",
    oracle="""
WITH views AS (
  SELECT user_id, ts, value
  FROM (SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view')
  WHERE rn = 1)
SELECT p.event_id, p.user_id,
       (SELECT v.value FROM views v
        WHERE v.user_id = p.user_id AND v.ts <= p.ts
          AND v.ts >= p.ts - INTERVAL 1 HOUR
        ORDER BY v.ts DESC LIMIT 1) AS view_value_asof
FROM events p WHERE p.event_type = 'purchase'
""",
)
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas merge_asof semantics):
    each purchase carries the latest same-user view value, but only if
    it is at most one hour stale — older matches null out. Exercises
    the generic operator's ``tolerance`` parameter end-to-end
    (operators/asof.py; the plain as-of twin is
    events_asof_last_purchase). Views pre-deduplicate to the max
    event_id per (user, ts) for tie determinism.

    Scale: same union-window shape as the untolerated as-of — one
    shuffle on user_id, no range join; the tolerance is a map-side
    comparison on the carried timestamp.
    """
    from grapho_spark.operators import asof_join

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    views = (
        e.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        views,
        on="ts",
        by="user_id",
        value_cols=["value"],
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    return out.select(
        "event_id", "user_id", F.col("value_asof").alias("view_value_asof")
    )


@query(
    "events_lag_feature_matrix",
    oracle="""
WITH p AS (
  SELECT user_id, ts, event_id, value
  FROM events WHERE event_type = 'purchase'),
feats AS (
  SELECT user_id, ts, event_id, value,
         LAG(value, 1) OVER w AS lag1,
         LAG(value, 2) OVER w AS lag2,
         CAST(SUM(CAST(value AS DECIMAL(18,6)))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / LEAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 5) AS roll5_mean
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id, value, lag1, lag2, round(roll5_mean, 6) AS roll5_mean
FROM feats WHERE lag2 IS NOT NULL
""",
)
def events_lag_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML feature engineering over the purchase stream: per-user lag-1
    / lag-2 features and a 5-row rolling mean (exact-decimal numerator
    over a row frame, rounded at 6dp), keeping rows with a full lag
    history — the sliding feature matrix a training pipeline feeds to
    a forecaster.

    Scale: every feature rides ONE window pass partitioned by user_id
    (shard-parallel); nothing joins, nothing re-sorts — adding more
    lags or frames is marginal cost zero shuffles.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w5 = w.rowsBetween(-4, 0)
    feats = e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("lag1"),
        F.lag("value", 2).over(w).alias("lag2"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w5).cast("double")
            / F.least(F.count(F.lit(1)).over(w5), F.lit(5)),
            6,
        ).alias("roll5_mean"),
    )
    return feats.filter(F.col("lag2").isNotNull()).select(
        "event_id", "user_id", "value", "lag1", "lag2", "roll5_mean"
    )


@query(
    "events_ks_two_sample",
    oracle="""
WITH pv AS (
  SELECT value,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS ca,
         COUNT(*) FILTER (WHERE event_type = 'view') AS cb
  FROM events WHERE event_type IN ('purchase', 'view')
  GROUP BY value),
tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM pv),
cum AS (
  SELECT SUM(ca) OVER (ORDER BY value) AS cuma,
         SUM(cb) OVER (ORDER BY value) AS cumb
  FROM pv)
SELECT t.na, t.nb,
       round(MAX(ABS(CAST(c.cuma AS DOUBLE) / t.na
                     - CAST(c.cumb AS DOUBLE) / t.nb)), 6) AS ks_stat
FROM cum c CROSS JOIN tot t
GROUP BY t.na, t.nb
""",
)
def events_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the purchase
    and view value distributions: max |ECDF_a - ECDF_b| evaluated
    after each distinct value (tie-safe: counts roll up per value
    BEFORE the cumulative pass, so step order within a value cannot
    differ between engines). The nonparametric companion to the PSI
    drift score — no binning choices to defend.

    Scale: the per-value rollup collapses the event volume to
    |distinct values| rows map-side; the single-partition cumulative
    window runs on that collapsed table only (value domains are small;
    for continuous data you'd pre-round to fixed precision — a
    quantized ECDF — keeping the same shape).
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    pv = e.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("ca"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("cb"),
    )
    tot = pv.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = pv.select(
        F.sum("ca").over(w).alias("cuma"), F.sum("cb").over(w).alias("cumb")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cuma").cast("double") / F.col("na")
                        - F.col("cumb").cast("double") / F.col("nb")
                    )
                ),
                6,
            ).alias("ks_stat")
        )
        .select("na", "nb", "ks_stat")
    )


@query(
    "events_interval_overlap_join",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                   > CAST(1800000000 AS BIGINT)
                OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events WHERE user_id % 13 = 0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid,
         ts
  FROM seq),
intervals AS (
  SELECT user_id, sid, MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM sess GROUP BY user_id, sid),
hits AS (
  SELECT i.user_id, i.sid, i.s_start, i.s_end, e.event_id
  FROM intervals i
  JOIN events e
    ON e.ts >= i.s_start AND e.ts <= i.s_end AND e.user_id <> i.user_id)
SELECT user_id, CAST(sid AS BIGINT) AS session_id, s_start, s_end,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_concurrent_events
FROM hits
GROUP BY user_id, sid, s_start, s_end
ORDER BY user_id, session_id
""",
)
def events_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: for each user session (30-min gap rule,
    sampled users), count how many OTHER users' events fall inside the
    session's [start, end] — concurrency/contention analysis. The
    oracle states it as the raw inequality join; the engine BUCKETS
    both sides by hour (sessions explode into their covered hour
    buckets via ``sequence``), so candidates pair only within a bucket
    and the residual range predicate runs on that bounded set — the
    IEJoin-avoidance pattern that keeps a 100 TB interval join from
    going quadratic. Events spanning a bucket only (no true overlap)
    are cut by the residual filter; DISTINCT event_id undoes the
    at-most-2-bucket double-count of boundary hits.

    Scale: the bucketed equi-join shuffles on (hour bucket); session
    intervals are tiny (sessions << events) and their bucket explosion
    is bounded by session duration (30-min gaps cap it). No
    BroadcastNestedLoopJoin anywhere in the plan.
    """
    e = load_table(spark, sf_dir, "events")
    mine = e.filter(F.col("user_id") % 13 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    flagged = mine.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (us - F.lag(us).over(w) > SESSION_GAP_US) | F.lag(us).over(w).isNull(), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    intervals = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    HOUR = 3600 * 1_000_000
    i_buckets = intervals.select(
        "user_id",
        "sid",
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                (F.unix_micros("s_start") / HOUR).cast("long"),
                (F.unix_micros("s_end") / HOUR).cast("long"),
            )
        ).alias("bucket"),
    )
    e_buckets = e.select(
        F.col("user_id").alias("e_user"),
        "event_id",
        F.col("ts").alias("e_ts"),
        (F.unix_micros("ts") / HOUR).cast("long").alias("bucket"),
    )
    hits = i_buckets.join(e_buckets, "bucket").filter(
        (F.col("e_ts") >= F.col("s_start"))
        & (F.col("e_ts") <= F.col("s_end"))
        & (F.col("e_user") != F.col("user_id"))
    )
    return (
        hits.groupBy("user_id", "sid", "s_start", "s_end")
        .agg(F.countDistinct("event_id").cast("long").alias("n_concurrent_events"))
        .select(
            "user_id",
            F.col("sid").cast("long").alias("session_id"),
            "s_start",
            "s_end",
            "n_concurrent_events",
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "events_concurrent_sessions",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                   > CAST(1800000000 AS BIGINT)
                OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
intervals AS (
  SELECT user_id, sid, MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM (SELECT user_id,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid,
               ts
        FROM seq)
  GROUP BY user_id, sid),
deltas AS (
  SELECT s_start AS t, 1 AS d FROM intervals
  UNION ALL
  SELECT s_end, -1 FROM intervals),
marks AS (
  SELECT t, SUM(d) AS d FROM deltas GROUP BY t),
sweep AS (
  SELECT t, SUM(d) OVER (ORDER BY t) AS live FROM marks)
SELECT CAST(t AS DATE) AS day,
       CAST(MAX(live) AS BIGINT) AS peak_concurrent_sessions
FROM sweep GROUP BY 1 ORDER BY day
""",
)
def events_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: the peak number of simultaneously-open
    user sessions per day, computed by summing +1/-1 boundary deltas
    in time order — the interval-counting operator that needs NO
    interval join at all (capacity planning's favorite query).
    Boundary ties collapse per timestamp before the prefix sum, so the
    sweep order is unambiguous across engines; a session closing at
    the same instant another opens nets to zero.

    Scale: intervals are session-sized (tiny vs events); the prefix
    sum runs over the 2x-sessions boundary stream. At 100 TB you'd
    range-partition the sweep on time and carry partition-boundary
    offsets — same algebra, the deltas commute.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (us - F.lag(us).over(w) > SESSION_GAP_US) | F.lag(us).over(w).isNull(), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"),
    )
    intervals = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    deltas = intervals.select(F.col("s_start").alias("t"), F.lit(1).alias("d")).unionAll(
        intervals.select(F.col("s_end").alias("t"), F.lit(-1).alias("d"))
    )
    marks = deltas.groupBy("t").agg(F.sum("d").alias("d"))
    sweep = marks.select(
        "t",
        F.sum("d").over(Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)).alias("live"),
    )
    return (
        sweep.groupBy(F.col("t").cast("date").alias("day"))
        .agg(F.max("live").cast("long").alias("peak_concurrent_sessions"))
        .orderBy("day")
    )


@query(
    "events_daily_correlation",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS HUGEINT) AS x,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS HUGEINT) AS y
  FROM events GROUP BY 1),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM daily)
SELECT CAST(n AS BIGINT) AS n_days,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
         AS pearson_r
FROM m
""",
)
def events_daily_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between daily event count and daily total
    value, from EXACT integer/decimal moment sums combined in one
    final double formula (the same engineered-determinism recipe as
    the Zipf fit — never `corr()`, whose float accumulation order
    differs between engines).

    Scale: one daily rollup (map-side partials), then five moments
    over |days| rows — a single-row result with no second pass over
    events.
    """
    e = load_table(spark, sf_dir, "events")
    # Pearson is scale-invariant, so y lifts to exact integer
    # micro-units; every moment product then fits decimal(38,0)
    # (HUGEINT in the oracle) with zero rounding before the final
    # double formula.
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("x"),
        (F.sum(F.col("value").cast("decimal(18,6)")) * 1_000_000)
        .cast("decimal(38,0)")
        .alias("y"),
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    return m.select(
        n.cast("long").alias("n_days"),
        F.round(
            (n * F.col("sxy") - sx * sy)
            / (
                F.sqrt(n * F.col("sxx") - sx * sx)
                * F.sqrt(n * F.col("syy") - sy * sy)
            ),
            6,
        ).alias("pearson_r"),
    )


@query(
    "events_trend_slope_by_type",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS HUGEINT) AS x,
         CAST(COUNT(*) AS HUGEINT) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
m AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM daily GROUP BY event_type)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
         AS events_per_day_slope
FROM m ORDER BY event_type
""",
)
def events_trend_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS trend: the least-squares slope of daily event count
    over day index, per event type — "is this signal growing?"
    computed from exact integer moment sums per group with one closing
    double formula each (the grouped sibling of the Pearson/Zipf
    recipe; never a float accumulation).

    Scale: a (type, day) rollup with map-side partials, then five
    moments over |types| x |days| rows grouped on the same key — the
    regression itself costs one tiny aggregation.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("decimal(38,0)")
        .alias("x"),
    ).agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("y"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    return m.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.round(
            (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx), 6
        ).alias("events_per_day_slope"),
    ).orderBy("event_type")


@query(
    "events_user_entropy",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events
  WHERE user_id % 9 = 0 GROUP BY user_id, event_type),
tot AS (SELECT user_id, SUM(c) AS n FROM counts GROUP BY user_id),
terms AS (
  SELECT c.user_id,
         CAST(round(-(c.c * 1.0 / t.n) * ln(c.c * 1.0 / t.n), 6)
              AS DECIMAL(18,6)) AS h
  FROM counts c JOIN tot t USING (user_id))
SELECT user_id,
       CAST(SUM(h) AS DOUBLE) AS entropy_nats
FROM terms GROUP BY user_id
ORDER BY user_id
""",
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity: Shannon entropy of each user's event-type
    distribution (0 = one-note bots, ln(5) = uniform across all five
    types) — the engagement-mix feature behind persona clustering.
    Each -p ln p term rounds at 6dp and accumulates as exact decimals
    (the standard libm-parity policy).

    Scale: one (user, type) rollup with map-side partials; the entropy
    sum runs over <=5 rows per user on the same shuffle key.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 9 == 0)
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c") * 1.0 / F.col("n")
    terms = counts.join(tot, "user_id").select(
        "user_id",
        F.round(-p * F.log(p), 6).cast("decimal(18,6)").alias("h"),
    )
    return (
        terms.groupBy("user_id")
        .agg(F.sum("h").cast("double").alias("entropy_nats"))
        .orderBy("user_id")
    )


@query(
    "events_user_burstiness",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS HUGEINT) AS c
  FROM events WHERE user_id % 9 = 0 GROUP BY user_id, CAST(ts AS DATE)),
m AS (
  SELECT user_id,
         COUNT(*) AS n,
         CAST(SUM(c) AS DOUBLE) AS s,
         CAST(SUM(c * c) AS DOUBLE) AS s2
  FROM daily GROUP BY user_id)
SELECT user_id, CAST(n AS BIGINT) AS n_days,
       round((s2 - s * s / n) / (n - 1) / (s / n), 6) AS fano_factor
FROM m WHERE n > 1
ORDER BY user_id
""",
)
def events_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness per user: the Fano factor (sample variance over mean
    of daily event counts; 1 = Poisson-like, >1 bursty, <1 metronomic)
    — the dispersion feature that separates schedulers from humans.
    Exact integer moments per user, one closing double expression.

    Scale: a (user, day) rollup then three moments per user on the
    same shuffle key — no second pass over events.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 9 == 0)
    daily = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    m = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("double").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("s2"),
    )
    n, s2, s = F.col("n"), F.col("s2"), F.col("s")
    return (
        m.filter(n > 1)
        .select(
            "user_id",
            n.cast("long").alias("n_days"),
            F.round((s2 - s * s / n) / (n - 1) / (s / n), 6).alias("fano_factor"),
        )
        .orderBy("user_id")
    )


@query(
    "events_audience_overlap",
    oracle="""
WITH aud AS (
  SELECT DISTINCT event_type, user_id FROM events),
sizes AS (
  SELECT event_type, COUNT(*) AS n FROM aud GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_both
  FROM aud a JOIN aud b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type)
SELECT p.type_a, p.type_b,
       CAST(p.n_both AS BIGINT) AS n_both,
       round(CAST(p.n_both AS DOUBLE) / (sa.n + sb.n - p.n_both), 6)
         AS audience_jaccard
FROM pairs p
JOIN sizes sa ON p.type_a = sa.event_type
JOIN sizes sb ON p.type_b = sb.event_type
ORDER BY type_a, type_b
""",
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: exact Jaccard between the user sets of
    every event-type pair — the segment-overlap report behind
    campaign targeting (and the exact ground truth the mergeable-HLL
    sketch approximates at 100 TB). The (user, type) dedup collapses
    the event volume map-side; the pair join is keyed on user with at
    most |types| rows per user.

    Scale: exact at |users| x |types| — beyond memory budgets the
    same query swaps user sets for the HLL sketches already in the
    registry (sketch_merge_distinct_bounded), keeping this shape.
    """
    e = load_table(spark, sf_dir, "events")
    aud = e.select("event_type", "user_id").distinct()
    sizes = aud.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = aud.select(F.col("event_type").alias("type_a"), "user_id")
    b = aud.select(F.col("event_type").alias("type_b"), "user_id")
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_both")),
                6,
            ).alias("audience_jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "events_chi2_hour_type",
    oracle="""
WITH obs AS (
  SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) % 6 AS hour_band,
         event_type, CAST(COUNT(*) AS HUGEINT) AS o
  FROM events GROUP BY 1, 2),
row_t AS (SELECT hour_band, SUM(o) AS r FROM obs GROUP BY hour_band),
col_t AS (SELECT event_type, SUM(o) AS c FROM obs GROUP BY event_type),
tot AS (SELECT SUM(o) AS n FROM obs),
terms AS (
  SELECT CAST(round(
           (CAST(o.o AS DOUBLE) - CAST(r.r * c.c AS DOUBLE) / t.n)
           * (CAST(o.o AS DOUBLE) - CAST(r.r * c.c AS DOUBLE) / t.n)
           / (CAST(r.r * c.c AS DOUBLE) / t.n), 6) AS DECIMAL(18,6)) AS x2
  FROM obs o
  JOIN row_t r USING (hour_band)
  JOIN col_t c USING (event_type)
  CROSS JOIN tot t)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(x2) AS DOUBLE) AS chi2_stat
FROM terms
""",
)
def events_chi2_hour_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence test between hour-of-day band and
    event type (does WHEN depend on WHAT?): observed vs expected
    contingency cells, each (O-E)^2/E term rounded at 6dp and
    accumulated as exact decimals — the categorical-association
    hypothesis test next to KS (continuous) and PSI (binned drift).
    Expected counts use exact integer row x column products divided
    once in double.

    Scale: one contingency rollup with map-side partials; margins and
    the statistic live on the |bands| x |types| grid.
    """
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        (F.hour("ts").cast("long") % 6).alias("hour_band"), "event_type"
    ).agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("o"))
    row_t = obs.groupBy("hour_band").agg(F.sum("o").alias("r"))
    col_t = obs.groupBy("event_type").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    expected = (F.col("r") * F.col("c")).cast("double") / F.col("n").cast("double")
    x2 = F.round(
        (F.col("o").cast("double") - expected)
        * (F.col("o").cast("double") - expected)
        / expected,
        6,
    ).cast("decimal(18,6)")
    terms = (
        obs.join(F.broadcast(row_t), "hour_band")
        .join(F.broadcast(col_t), "event_type")
        .crossJoin(F.broadcast(tot))
        .select(x2.alias("x2"))
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("x2").cast("double").alias("chi2_stat"),
    )


@query(
    "events_dau_wau",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
dau AS (
  SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
contrib AS (
  SELECT user_id, day + CAST(x.off AS INTEGER) AS day
  FROM ud, (SELECT UNNEST(range(0, 7)) AS off) x),
wau AS (
  SELECT day, COUNT(DISTINCT user_id) AS wau
  FROM contrib GROUP BY day),
grid AS (SELECT day FROM dau)
SELECT g.day,
       CAST(d.dau AS BIGINT) AS dau,
       CAST(w.wau AS BIGINT) AS wau,
       round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
FROM grid g JOIN dau d USING (day) JOIN wau w USING (day)
ORDER BY g.day
""",
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DAU/WAU staple: daily active users, trailing-7-day active
    users, and the DAU/WAU stickiness ratio per day (reported only
    for days with activity). The trailing-window distinct is computed
    by exploding each (user, day) into the 7 future days it covers —
    map-side fan-out of 7, then one distinct count per day — instead
    of re-scanning a 7-day window per day (the standard scalable
    rewrite; at 100 TB the distinct swaps for the registry's HLL
    sketches, same shape).

    Scale: the (user, day) dedup collapses the event volume first;
    everything after is |users| x |days| sized with bounded fan-out.
    """
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
    ).select("user_id", F.date_add(F.col("day"), F.col("off")).alias("day"))
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@query(
    "events_retention_matrix",
    oracle="""
WITH daily AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
cohort AS (
  SELECT user_id, MIN(day) AS cohort_day FROM daily GROUP BY user_id)
SELECT c.cohort_day,
       CAST(d.day - c.cohort_day AS BIGINT) AS offset_days,
       COUNT(DISTINCT d.user_id) AS n_active
FROM daily d JOIN cohort c ON d.user_id = c.user_id
GROUP BY 1, 2
""",
)
def events_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cohort-retention matrix: users are cohorted by first-seen
    day; each (cohort_day, offset_days) cell counts distinct cohort
    members active that many days later — the triangle heatmap every
    growth dashboard draws (events_daily_retention is its next-day
    diagonal).

    Scale: events collapse to distinct (user, day) first; the cohort
    table is user-sized and joins on user_id (one shuffle of the
    compacted table); the matrix itself is tiny (days x offsets).
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohort = daily.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        daily.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("offset_days"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
