"""Structured Streaming queries over the ``events`` table, run to
completion against the finite parquet input via a memory sink (the
same code shape targets Kafka + a real sink in production — see
``grapho_spark/streaming/``).

Because the input is finite and we use ``complete`` output mode, the
final streaming state equals the batch aggregation — so these streaming
queries have exact DuckDB oracles (a rare luxury; the driver gets a
full value-hash check on a streaming operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.streaming import run_to_memory
from grapho_spark.tables import load_stream


@query(
    "streaming_windowed_counts",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window aggregate (1h windows, 1h
    watermark for state cleanup), driven to completion over the parquet
    input; result equals the batch hourly aggregate.

    Scale: streaming state is bounded by the watermark horizon; the
    aggregation itself is the same partial-agg + shuffle as batch.
    """
    stream = (
        load_stream(spark, sf_dir, "events")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )
    out = run_to_memory(stream, "complete")
    return out.select(
        F.col("window.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@query(
    "streaming_session_windows",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {30 * 60 * 1_000_000}
              OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged)
SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions, COUNT(*) AS n_events
FROM sessions GROUP BY user_id
""",
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ``session_window`` sessionization (30-minute gap,
    merging windows) driven to completion; per-user session/event
    counts equal the batch gaps-and-islands computation — the oracle
    IS that batch SQL, so the streaming session-merge semantics are
    value-checked."""
    from grapho_spark.streaming import sessionized_counts

    stream = load_stream(spark, sf_dir, "events")
    out = run_to_memory(sessionized_counts(stream, gap="30 minutes"), "complete")
    return out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


@query(
    "streaming_stateful_user_totals",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       round(SUM(value), 4) AS total_value
FROM events
GROUP BY user_id
""",
)
def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    running per-user totals in explicit GroupState; the final update
    per user equals the batch aggregate (totals rounded 4dp — the
    pandas per-batch accumulation order differs from the oracle's).
    """
    from grapho_spark.streaming import stateful_user_totals

    stream = load_stream(spark, sf_dir, "events")
    out = run_to_memory(stateful_user_totals(stream), "update")
    # update mode emits one row per key per micro-batch; keep the final
    # (max-count) state per user.
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max("total_value"), 4).alias("total_value"),
    )


@query(
    "streaming_user_event_totals",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       MAX(ts) AS last_seen
FROM events
GROUP BY user_id
""",
)
def streaming_user_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming running per-user totals (complete mode global state),
    equal to the batch groupBy at end-of-input.

    ``approx_count_distinct`` would be the unbounded-state-safe choice
    at scale; here exact distinct keeps the oracle exact and state is
    bounded by (user, type) cardinality.
    """
    stream = (
        load_stream(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact distinct is unsupported in streaming aggs; a bounded
            # collect_set gives the exact cardinality (event_type is
            # low-cardinality; at scale: approx_count_distinct).
            F.size(F.collect_set("event_type")).alias("n_types"),
            F.max("ts").alias("last_seen"),
        )
    )
    return run_to_memory(stream, "complete")


@query(
    "streaming_sliding_windows",
    oracle="""
SELECT CAST(time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE
            AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM events, range(0, 2) t(k)
GROUP BY 1, 2
""",
)
def streaming_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour long, every 30 minutes): each event
    lands in exactly duration/slide = 2 windows. The oracle unrolls
    that membership as a cross join with k in {0, 1} shifted tumbling
    buckets — value-checking Spark's overlapping-window assignment.

    Scale: sliding windows multiply state by duration/slide; the
    watermark still bounds it (windows older than the watermark are
    evicted)."""
    stream = load_stream(spark, sf_dir, "events")
    windowed = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = run_to_memory(windowed, "complete")
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n_events"
    )
