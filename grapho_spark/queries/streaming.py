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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.streaming import run_to_memory
from grapho_spark.tables import load_stream, load_table
from grapho_spark.queries.text import _STOP_SQL as _CUR_STOP_SQL
from grapho_spark.sparkutil import scratch_path
from grapho_spark.streaming.ops import stream_state_partitions
from grapho_spark.tables import table_path


_PLAN_MEMO: dict[tuple[str, str], DataFrame] = {}


def _memo_plan(spark: SparkSession, key: str, builder) -> DataFrame:
    """Session-memoized UNRESOLVED streaming plan (the lazy DataFrame
    object only — no data, no cache). Each run_to_memory start() still
    re-reads the source and recomputes from the parquet input; this
    skips only the driver-side re-construction/analysis of a large
    expression tree on repeat invocations (measured 0.56s per call on
    the mapside ANN probe's generated SQL)."""
    mkey = (spark.sparkContext.applicationId, key)
    df = _PLAN_MEMO.get(mkey)
    if df is None:
        df = _PLAN_MEMO[mkey] = builder()
    return df


def _spread(df: DataFrame) -> DataFrame:
    """Spread a (small) streamed batch across cluster parallelism
    BEFORE heavyweight per-row map work (regex extraction, md5
    feature hashing, interpreted HOF folds) — r16, guide §2.6/§1.2.

    The fixture parquet files are single-row-group, so a micro-batch
    arrives as ONE scan task and the whole map stage runs serially
    (measured: the dsir feature fold 0.60 -> 0.23s, the mapside ANN
    probe 1.1 -> 0.5s once spread). The exchange moves only the tiny
    sampled batch; at production scale a query/ingest stream already
    arrives partitioned and the keyless round-robin is a no-op cost
    next to the per-row scoring it parallelizes."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _sp(spark: SparkSession, sf_dir: str, *tables: str) -> int:
    """Input-sized streaming state-partition count for this query's
    source tables (see ``stream_state_partitions``): the
    shuffle-partition count a streaming query starts with is its
    state-store instance count per stateful operator per micro-batch,
    so it is derived from source bytes (floor 4, cap cluster
    parallelism) instead of inheriting the session default."""
    return stream_state_partitions(
        spark, *(table_path(sf_dir, t) for t in tables)
    )


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
    out = run_to_memory(stream, "complete", state_partitions=_sp(spark, sf_dir, "events"))
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
    out = run_to_memory(sessionized_counts(stream, gap="30 minutes"), "complete", state_partitions=_sp(spark, sf_dir, "events"))
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
    out = run_to_memory(stateful_user_totals(stream), "update", state_partitions=_sp(spark, sf_dir, "events"))
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
    return run_to_memory(stream, "complete", state_partitions=_sp(spark, sf_dir, "events"))


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
    out = run_to_memory(windowed, "complete", state_partitions=_sp(spark, sf_dir, "events"))
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n_events"
    )


@query(
    "streaming_stream_stream_join",
    oracle="""
SELECT p.user_id,
       p.event_id AS purchase_id,
       e.event_id AS error_id,
       p.ts AS purchase_ts,
       e.ts AS error_ts
FROM events p
JOIN events e
  ON p.user_id = e.user_id
 AND p.event_type = 'purchase' AND e.event_type = 'error'
 AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
""",
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: errors within one hour AFTER a
    purchase by the same user, both sides watermarked so the join
    state is bounded (purchases retained only until their 1-hour
    window passes the watermark). The batch interval join is the exact
    oracle.

    Scale: state is keyed on user_id and pruned by event time — the
    canonical bounded-state stream-stream join; without the time bound
    Spark rejects the plan (unbounded state), which is the right
    default.
    """
    ev = load_stream(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", "2 hours")
    )
    joined = purchases.join(
        errors,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("error_ts") >= F.col("purchase_ts"))
        & (F.col("error_ts") <= F.col("purchase_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    out = run_to_memory(joined, "append", state_partitions=_sp(spark, sf_dir, "events"))
    return out.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "error_id",
        "purchase_ts",
        "error_ts",
    )


@query(
    "streaming_dedup_watermarked",
    oracle="""
SELECT user_id, event_type,
       CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute_start,
       COUNT(*) AS n_first_seen
FROM (SELECT DISTINCT user_id, event_type, date_trunc('minute', ts) AS ts
      FROM events)
GROUP BY 1, 2, 3
""",
)
def streaming_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: dropDuplicates on (user, type, minute)
    under a watermark — the stream emits each key once, and the dedup
    state for minutes older than the watermark is dropped (bounded
    state, the streaming face of exact dedup).

    The oracle is batch DISTINCT on the same key; n_first_seen is 1 by
    construction, proving exactly-one-emission.
    """
    ev = load_stream(spark, sf_dir, "events")
    deduped = (
        ev.withColumn("minute_start", F.date_trunc("minute", "ts"))
        .withWatermark("minute_start", "1 hour")
        .dropDuplicates(["user_id", "event_type", "minute_start"])
    )
    out = run_to_memory(
        deduped.select("user_id", "event_type", "minute_start"),
        "append",
        state_partitions=_sp(spark, sf_dir, "events"),
    )
    return out.groupBy("user_id", "event_type", "minute_start").agg(
        F.count(F.lit(1)).alias("n_first_seen")
    )


@query(
    "streaming_left_outer_join",
    oracle="""
WITH bounds AS (
  SELECT LEAST(
           (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'),
           (SELECT MAX(ts) FROM events WHERE event_type = 'error')
         ) - INTERVAL 210 MINUTE AS cutoff),
p AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
  FROM events, bounds
  WHERE event_type = 'purchase' AND ts <= cutoff),
e AS (
  SELECT user_id, event_id AS error_id, ts AS error_ts
  FROM events WHERE event_type = 'error')
SELECT p.user_id, p.purchase_id, p.purchase_ts,
       e.error_id, e.error_ts
FROM p LEFT JOIN e
  ON p.user_id = e.user_id
 AND e.error_ts >= p.purchase_ts
 AND e.error_ts <= p.purchase_ts + INTERVAL 1 HOUR
""",
)
def streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: every purchase, paired with the
    errors that followed it within an hour OR emitted once with nulls
    after the watermark proves no error can still arrive — the
    only-on-watermark-expiry semantics that distinguishes outer from
    inner streaming joins.

    Determinism note: the global watermark is the MIN across the two
    inputs of (that side's max event time - 2h delay), so after all
    data it sits at min(max purchase ts, max error ts) - 2h. A
    purchase's null row emits once the watermark passes its join
    window end (+1h); every purchase with
    ts <= min(maxP, maxE) - 3h has therefore provably flushed. The
    JOIN OUTPUT and the oracle restrict purchases to that region
    (minus a 30-minute margin so the eviction boundary's >/>=
    semantics can't matter). The filter sits AFTER the join:
    filtering the purchase stream itself would hold that side's max
    event time (and with it the global watermark) back, leaving a
    band of never-flushed outer state.

    Scale: identical bounded state to the inner join — purchases are
    dropped from state at watermark + window, which is also exactly
    when their null row emits.
    """
    ev_batch = load_table(spark, sf_dir, "events")
    maxes = ev_batch.groupBy().agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
        F.max(F.when(F.col("event_type") == "error", F.col("ts"))).alias("e"),
    ).collect()[0]
    from datetime import timedelta

    cutoff = min(maxes.p, maxes.e) - timedelta(minutes=210)
    ev = load_stream(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", "2 hours")
    )
    joined = purchases.join(
        errors,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("error_ts") >= F.col("purchase_ts"))
        & (F.col("error_ts") <= F.col("purchase_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    )
    out = run_to_memory(joined.filter(F.col("purchase_ts") <= F.lit(cutoff)), "append", state_partitions=_sp(spark, sf_dir, "events"))
    return out.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "error_id",
        "error_ts",
    )


@query(
    "streaming_timeout_sessions",
    oracle="""
WITH pts AS (
  SELECT user_id, epoch_us(ts) AS us FROM events),
flagged AS (
  SELECT user_id, us,
         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                   > 1800000000
              OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM pts),
sessions AS (
  SELECT user_id, us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM flagged),
agg AS (
  SELECT user_id, MIN(us) AS session_start_us, MAX(us) AS session_end_us,
         COUNT(*) AS n_events
  FROM sessions GROUP BY user_id, sid)
SELECT user_id, session_start_us, session_end_us, n_events
FROM agg
WHERE session_end_us <= (SELECT MAX(us) FROM pts)
                        - 3600000000 - 1800000000 - 300000000
""",
)
def streaming_timeout_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful sessionization with EVENT-TIME TIMEOUT
    (applyInPandasWithState): gap-closed sessions emit in-batch; each
    user's trailing open session emits when the watermark passes its
    end + 30-minute gap — output driven by state eviction, the
    timeout semantics the other stateful queries don't exercise.

    Determinism: Spark emits every gap-closed session plus timed-out
    trailing sessions (timeout fires once the final watermark,
    max ts - 1h, passes end + gap). BOTH sides therefore keep only
    sessions with end <= max_ts - 1h - gap - 5min margin: below that
    line a session is provably emitted under either >/>= timeout
    boundary semantics, and above it the oracle can't know which side
    Spark chose. Session bounds ride as epoch-microsecond longs so no
    timezone/unit coercion can skew the comparison.
    """
    from grapho_spark.streaming.ops import sessionize_with_timeout

    max_us = (
        load_table(spark, sf_dir, "events")
        .agg(F.unix_micros(F.max("ts"))).collect()[0][0]
    )
    cutoff = max_us - 3_600_000_000 - 1_800_000_000 - 300_000_000
    ev = load_stream(spark, sf_dir, "events")
    out = run_to_memory(sessionize_with_timeout(ev), "append", state_partitions=_sp(spark, sf_dir, "events"))
    return out.filter(F.col("session_end_us") <= F.lit(cutoff))


from grapho_spark.queries.dedup import INCR_ORACLE


@query("streaming_lsh_index_probe", oracle=INCR_ORACLE)
def streaming_lsh_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC LSH probe: new documents arrive as a stream and
    are checked against the standing corpus band index in real time —
    the streaming twin of ``dedup_incremental_new_vs_corpus``, with an
    architecture chosen so the streaming side needs ZERO stateful
    operators: the static index is split per band (three key->capped
    doc-list tables), the stream does three stateless stream-static
    left joins, and the distinct-union of matches happens map-side in
    one array expression. Append mode, no watermark, no state store —
    at scale the index tables are broadcastable or bucket-joined, and
    per-document probe cost is O(bands).

    The result (matched new docs with distinct corpus-match counts)
    equals the batch incremental query, so it shares that exact DuckDB
    oracle — a full value-hash check on a stream-static join.
    """
    from grapho_spark.queries.dedup import (
        _INCR_NEW_PRED,
        corpus_band_index,
        N_BANDS,
        N_SEEDS,
        SPARK_SHINGLES,
        spark_sig,
    )

    # Static side: per-band slices of the PERSISTED bucketed band
    # index (corpus_band_index — built once, scanned here; no
    # signature recompute at probe time).
    index = corpus_band_index(spark, sf_dir)
    band_tables = []
    for k in range(N_BANDS):
        band_tables.append(
            index.filter(F.col("band_id") == k).select(
                F.col("band_key").alias(f"key{k}"),
                F.col("docs").alias(f"docs{k}"),
            )
        )

    # Stream side: new-batch docs -> signatures (stateless projections).
    stream = (
        load_stream(spark, sf_dir, "documents")
        .filter(_INCR_NEW_PRED)
        .select(
            F.col("doc_id").alias("new_doc"),
            F.split(F.trim(F.lower("text")), r"\s+").alias("words"),
        )
        .select("new_doc", F.expr(SPARK_SHINGLES).alias("shingles"))
    )
    for j in range(N_SEEDS):
        stream = stream.withColumn(f"s{j}", F.expr(spark_sig(j)))
    from grapho_spark.queries.dedup import ROWS_PER_BAND

    for k in range(N_BANDS):
        cols = [f"s{j}" for j in range(k * ROWS_PER_BAND, (k + 1) * ROWS_PER_BAND)]
        stream = stream.withColumn(f"b{k}", F.md5(F.concat(*cols)))
    probe = stream.select("new_doc", *[f"b{k}" for k in range(N_BANDS)])
    for k, bt in enumerate(band_tables):
        probe = probe.join(bt, probe[f"b{k}"] == bt[f"key{k}"], "left")
    merged = probe.select(
        "new_doc",
        F.array_distinct(
            F.concat(
                *[
                    F.coalesce(F.col(f"docs{k}"), F.expr("array()"))
                    for k in range(N_BANDS)
                ]
            )
        ).alias("matches"),
    )
    out = run_to_memory(
        merged.select(
            "new_doc", F.size("matches").cast("long").alias("n_corpus_matches")
        ).filter(F.col("n_corpus_matches") > 0),
        "append",
        state_partitions=_sp(spark, sf_dir, "documents"),
    )
    return out


@query(
    "streaming_curation_filter",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         string_split_regex(trim(text), '\\s+') AS words,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com' AS seeded
  FROM documents)
SELECT doc_id, lang,
       len(words) AS n_words,
       ((len(words) BETWEEN 5 AND 1000)
         AND len(list_filter(words, w -> w IN ({_CUR_STOP_SQL}))) >= 2
         AND len(list_distinct(words)) * 1.0 / len(words) > 0.2) AS accept,
       len(regexp_extract_all(seeded, '__EMAIL__')) AS n_emails
FROM toks
""".replace("__EMAIL__", "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"),
)
def streaming_curation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time curation over a document STREAM: the Gopher-style
    accept flag and PII email count computed per document as it
    arrives, in append mode with zero streaming state — the shape of a
    filter-at-ingest stage in front of a corpus sink. Identical
    expressions to the batch curation module, so the finite stream's
    output equals the batch result and gets a full value-hash oracle.

    Scale: stateless map-only streaming (no watermark, no state store);
    throughput is bounded by codegen regex evaluation, same as batch.
    """
    from grapho_spark.queries.curation import _EMAIL_RE
    from grapho_spark.queries.text import STOPWORDS

    stream = load_stream(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    seeded = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
    )
    n_words = F.size(words)
    accept = (
        n_words.between(5, 1000)
        & (F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))) >= 2)
        & (F.size(F.array_distinct(words)) * F.lit(1.0) / n_words > 0.2)
    )
    out = stream.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        accept.alias("accept"),
        F.size(F.regexp_extract_all(seeded, F.lit(_EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
    )
    return run_to_memory(out, "append", state_partitions=_sp(spark, sf_dir, "documents"))


@query(
    "streaming_drift_monitor",
    oracle="""
WITH binned AS (
  SELECT date_trunc('day', ts) AS day,
         LEAST(CAST(FLOOR(value / 25.0) AS BIGINT), 7) AS bin
  FROM events),
ref AS (
  SELECT bin, COUNT(*) AS rc FROM binned GROUP BY bin),
ref_tot AS (SELECT COUNT(*) AS rtot FROM binned),
win AS (
  SELECT day, bin, COUNT(*) AS c FROM binned GROUP BY day, bin),
win_tot AS (
  SELECT day, COUNT(*) AS tot FROM binned GROUP BY day),
scaffold AS (
  SELECT d.day, b.bin
  FROM (SELECT DISTINCT day FROM binned) d,
       (SELECT UNNEST(range(8)) AS bin) b),
terms AS (
  SELECT sc.day,
         CAST(round(
           ((COALESCE(w.c, 0) + 0.5) / (wt.tot + 4.0)
              - (COALESCE(r.rc, 0) + 0.5) / (rt.rtot + 4.0))
           * ln(((COALESCE(w.c, 0) + 0.5) / (wt.tot + 4.0))
                / ((COALESCE(r.rc, 0) + 0.5) / (rt.rtot + 4.0))), 6)
           AS DECIMAL(18,6)) AS contrib
  FROM scaffold sc
  JOIN win_tot wt ON sc.day = wt.day
  LEFT JOIN win w ON sc.day = w.day AND sc.bin = w.bin
  LEFT JOIN ref r ON sc.bin = r.bin
  CROSS JOIN ref_tot rt)
SELECT CAST(day AS TIMESTAMP) AS window_start,
       CAST(SUM(contrib) AS DOUBLE) AS psi
FROM terms GROUP BY day ORDER BY window_start
""",
)
def streaming_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor: per-day value-distribution PSI of the
    live stream against a static reference distribution (here the
    full-corpus profile; in production, the training-time profile).
    The STREAMING stage is the per-(window, bin) count — bounded state
    under the watermark; the PSI math is stateless post-processing on
    the window-sized sink output (bins x days rows), exactly how a
    monitoring sink feeds a dashboard query. Same Laplace smoothing +
    6dp-rounded exact-decimal accumulation as the batch PSI operator.

    Scale: streaming state is |windows in horizon| x 8 bins; the
    reference profile is a broadcast scalar table; the event volume
    itself never joins anything.
    """
    bin_col = F.least(F.floor(F.col("value") / 25.0).cast("long"), F.lit(7))
    stream = (
        load_stream(spark, sf_dir, "events")
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day"), bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    win = run_to_memory(stream, "complete", state_partitions=_sp(spark, sf_dir, "events")).select(
        F.col("window.start").alias("window_start"), "bin", "c"
    )
    e = load_table(spark, sf_dir, "events").select(bin_col.alias("bin"))
    ref = e.groupBy("bin").agg(F.count(F.lit(1)).alias("rc"))
    rtot = e.count()
    win_tot = win.groupBy("window_start").agg(F.sum("c").alias("tot"))
    scaffold = win_tot.crossJoin(
        F.broadcast(spark.range(8).select(F.col("id").alias("bin")))
    )
    p = (F.coalesce(F.col("c"), F.lit(0)) + 0.5) / (F.col("tot") + 4.0)
    q = (F.coalesce(F.col("rc"), F.lit(0)) + 0.5) / (F.lit(rtot) + 4.0)
    terms = (
        scaffold.join(win, ["window_start", "bin"], "left")
        .join(F.broadcast(ref), ["bin"], "left")
        .select(
            "window_start",
            F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)").alias("contrib"),
        )
    )
    return (
        terms.groupBy("window_start")
        .agg(F.sum("contrib").cast("double").alias("psi"))
        .orderBy("window_start")
    )


@query(
    "streaming_windowed_distinct_sketch",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS sketch_within_2pct
FROM events
GROUP BY 1, 2
""",
)
def streaming_windowed_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct users per (day, event_type) via a mergeable
    Datasketches HLL (``hll_sketch_agg``, lgK=14) — the
    unbounded-state-safe form of windowed COUNT DISTINCT: sketch state
    is constant-size per group no matter how many users stream
    through, and sketches merge across micro-batches and (on a
    cluster) across partial aggregations. Exact distinct is computed
    batch-side for the contract column: the sketch estimate must land
    within 2% of truth (deterministic — HLL is hash-based, no RNG),
    the same hashable bounded-error contract as
    stats_approx_aggregates_rows_only.

    Scale: the exact side shuffles (day, type, user) once; the sketch
    side never shuffles users at all — at 100 TB only the sketch side
    survives, and this query certifies it against truth at test SF.
    """
    stream = (
        load_stream(spark, sf_dir, "events")
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias(
                "sketch_users"
            )
        )
    )
    sketched = run_to_memory(stream, "complete", state_partitions=_sp(spark, sf_dir, "events")).select(
        F.col("window.start").alias("window_start"),
        "event_type",
        "sketch_users",
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", "ts").alias("window_start"),
            "event_type",
        )
        .agg(F.countDistinct("user_id").cast("long").alias("exact_users"))
    )
    return exact.join(sketched, ["window_start", "event_type"]).select(
        "window_start",
        "event_type",
        "exact_users",
        (
            F.abs(F.col("sketch_users").cast("double") - F.col("exact_users"))
            / F.col("exact_users")
            <= F.lit(0.02)
        ).alias("sketch_within_2pct"),
    )


def _ann_stream_oracle() -> str:
    from grapho_spark.queries.embeddings import (
        _DUCK_ANN_INDEX_CTES,
        _DUCK_ANN_PROBE_CTES,
    )

    return f"""
WITH {_DUCK_ANN_INDEX_CTES},
{_DUCK_ANN_PROBE_CTES}
SELECT q_id, vec_id, adc_dist FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY adc_dist, vec_id) AS rn
  FROM ai_adc) WHERE rn <= 3
"""


@query("streaming_ann_index_probe", oracle=_ann_stream_oracle())
def streaming_ann_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC vector search: query embeddings arrive as a
    stream and are answered from the standing persisted ANN index in
    real time — the ANN twin of streaming_lsh_index_probe, with the
    same zero-state architecture: the KB-sized routing state (cell
    centroids + trained PQ codebook) rides a one-row broadcast join;
    each routed cell is one stateless stream-static left join against
    the per-cell member table; normalization, exact-decimal routing,
    the per-query ADC LUT, candidate scoring and the per-query top-3
    all happen INSIDE array expressions on the query row. Append
    mode, no watermark, no state store, no aggregation.

    The result (ADC top-3 per streamed query) shares the batch index
    pipeline's generated-SQL oracle — a full value-hash check on a
    streaming plan (exact decimal folds are order-free, so map-side
    folds equal batch groupBy sums bit-for-bit).

    Scale: per-query cost is bounded by n_probe x cell size exactly
    like the batch probe's bucketed scan; the member tables are the
    same rows the batch index stores, keyed by cell. No micro-batch
    ever holds more state than its own rows.
    """
    from grapho_spark.queries.embeddings import (
        ann_index_stream_tables,
        ann_probe_mapside,
    )

    def build() -> DataFrame:
        static_cb, cell_tbl = ann_index_stream_tables(spark, sf_dir)
        q_stream = (
            load_stream(spark, sf_dir, "embeddings")
            .filter("vec_id % 97 = 0")
            .select("vec_id", "embedding")
        )
        return ann_probe_mapside(q_stream, static_cb, cell_tbl)

    plan = _memo_plan(spark, f"ann_mapside_probe:{sf_dir}", build)
    return run_to_memory(plan, "append", state_partitions=_sp(spark, sf_dir, "embeddings"))


def _dsir_stream_oracle() -> str:
    from grapho_spark.queries.curation import DUCK_DSIR_CTE

    return f"""
WITH {DUCK_DSIR_CTE}
SELECT doc_id, lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_feats,
       CAST(CAST(SUM(lam) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0
         AS log_importance
FROM b JOIN lam USING (bucket)
WHERE doc_id % 7 = 0
GROUP BY doc_id, lang, source
"""


@query("streaming_dsir_score", oracle=_dsir_stream_oracle())
def streaming_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC DSIR scoring at ingest: documents arrive as a
    stream (deterministic doc_id % 7 sample, the dial convention) and
    each is scored against the FROZEN per-bucket log-ratio table the
    batch pipeline trained (curation.dsir_lambda) — the production
    shape where the importance model is fit once on a reference
    snapshot and every newly crawled document is scored on arrival.

    Zero streaming state: the 1024-bucket model rides a ONE-ROW
    broadcast map (same architecture as streaming_ann_index_probe's
    centroid/codebook frame), and the per-document fold runs inside an
    array expression on the row — append mode, no watermark, no state
    store, no aggregation. The fold uses integer MICRO-UNITS (lam *
    1e6 as BIGINT) so the map-side sum is exact integer math, equal to
    the batch pipeline's decimal fold bit-for-bit; the oracle forces
    the identical int/1e6 division shape.

    Scale: per-document cost is O(features in that doc) against a
    16 KB broadcast map — linear ingest throughput, no shuffle at all
    on the stream side.
    """
    from grapho_spark.queries.curation import (
        DSIR_BUCKETS,
        SPARK_DSIR_FEATS,
        dsir_lambda,
    )

    lam_map = F.broadcast(
        dsir_lambda(spark, sf_dir)
        .select("bucket", (F.col("lam") * 1_000_000).cast("long").alias("lm"))
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("bucket", "lm")))
            ).alias("lam_map")
        )
        .withColumn("jk", F.lit(1))
    )
    stream = (
        _spread(load_stream(spark, sf_dir, "documents").filter("doc_id % 7 = 0"))
        .select(
            "doc_id",
            "lang",
            "source",
            F.split(F.trim(F.lower("text")), r"\s+").alias("words"),
        )
        .withColumn("feats", F.expr(SPARK_DSIR_FEATS))
        .withColumn("jk", F.lit(1))
    )
    scored = stream.join(lam_map, "jk").select(
        "doc_id",
        "lang",
        "source",
        F.size("feats").cast("long").alias("n_feats"),
        (
            F.expr(
                "aggregate(feats, CAST(0 AS BIGINT), (acc, f) -> acc + "
                "element_at(lam_map, CAST(conv(substring(md5(f), 1, 6), 16, 10) "
                f"AS BIGINT) % {DSIR_BUCKETS}))"
            ).cast("double")
            / 1_000_000.0
        ).alias("log_importance"),
    )
    return run_to_memory(scored, "append", state_partitions=_sp(spark, sf_dir, "documents"))


def _bpe_stream_oracle() -> str:
    from grapho_spark.queries.text import BPE_ROUNDS, BPE_WORD_RE, _duck_bpe_ctes

    return f"""
WITH {_duck_bpe_ctes()},
vocab AS (
  SELECT w, len(string_split(seg, ' ')) AS n_pieces FROM seg{BPE_ROUNDS}),
tok AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '{BPE_WORD_RE}')) AS w
  FROM documents WHERE doc_id % 7 = 0)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(COALESCE(v.n_pieces, length(t.w))) AS BIGINT) AS n_bpe_tokens
FROM tok t LEFT JOIN vocab v USING (w)
GROUP BY t.doc_id
"""


@query("streaming_bpe_tokenize", oracle=_bpe_stream_oracle())
def streaming_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC tokenizer application at ingest: documents arrive
    as a stream (deterministic doc_id % 7 sample, the dial convention)
    and are token-counted against the FROZEN BPE vocabulary the batch
    trainer learned (text._bpe_train) — the production shape where the
    tokenizer is trained once on a reference snapshot and every newly
    crawled document gets its token count (the unit of training-budget
    accounting) on arrival.

    Zero streaming state: the trained (word -> piece count) vocabulary
    rides a ONE-ROW broadcast map (the streaming_dsir_score
    architecture) and the per-document fold is an integer array
    aggregate on the row — append mode, no watermark, no state store.
    Out-of-vocabulary words fall back to their character count (the
    byte-level BPE guarantee that nothing is untokenizable).

    Scale: per-document cost is O(words in that doc) against a
    vocab-sized broadcast map — linear ingest throughput, no shuffle
    on the stream side; the vocabulary itself is trained by the batch
    pipeline's one corpus shuffle (text_bpe_merges).
    """
    from grapho_spark.queries.text import BPE_WORD_RE, _bpe_train

    _, vocab = _bpe_train(spark, sf_dir)
    vmap = F.broadcast(
        vocab.select("w", F.col("n_pieces").cast("long").alias("np"))
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("w", "np")))
            ).alias("vmap")
        )
        .withColumn("jk", F.lit(1))
    )
    stream = (
        _spread(load_stream(spark, sf_dir, "documents").filter("doc_id % 7 = 0"))
        .select(
            "doc_id",
            F.regexp_extract_all(F.lower("text"), F.lit(BPE_WORD_RE), F.lit(0)).alias(
                "words"
            ),
        )
        # a document with no tokenizable word emits no row — the same
        # contract as the oracle's UNNEST (which produces zero rows
        # for such a doc and GROUP BY omits it); without this filter a
        # digits/punctuation-only doc would appear stream-side only
        .filter(F.size("words") > 0)
        .withColumn("jk", F.lit(1))
    )
    counted = stream.join(vmap, "jk").select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        F.expr(
            "aggregate(words, CAST(0 AS BIGINT), (acc, w) -> acc + "
            "coalesce(element_at(vmap, w), CAST(length(w) AS BIGINT)))"
        ).alias("n_bpe_tokens"),
    )
    return run_to_memory(counted, "append", state_partitions=_sp(spark, sf_dir, "documents"))


def _quality_stream_oracle() -> str:
    from grapho_spark.queries.curation import (
        _DUCK_GD_CHARS,
        _DUCK_GD_WORDS,
        _M,
        GD_ITERS,
        _gd_cte_prefix,
        _gd_feat_sql,
        _gd_sigmoid,
        _shu,
    )

    z = f"w0 + {_shu('w1 * x1 + w2 * x2', str(_M), '//')}"
    return f"""{_gd_cte_prefix()}
feat_s AS (
{_gd_feat_sql('//', _DUCK_GD_WORDS, _DUCK_GD_CHARS,
              extra_cols='doc_id, ', where=' WHERE doc_id % 3 = 0')}
),
scored AS (
  SELECT doc_id, {_gd_sigmoid(z)} AS s
  FROM feat_s, wt{GD_ITERS})
SELECT doc_id,
       CAST(s AS DOUBLE) / {_M}.0 AS quality_score,
       s >= 500000 AS keep
FROM scored
"""


@query("streaming_quality_score", oracle=_quality_stream_oracle())
def streaming_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static quality scoring at ingest: the logistic-regression
    weights TRAINED by the batch pipeline (corpus_quality_classifier_gd
    — the frozen-model convention of streaming_dsir_score /
    streaming_bpe_tokenize) score each arriving document map-side.
    Features, logit and sigmoid use the exact integer micro-unit
    protocol of training, so a document gets the SAME score at ingest
    as it would in the batch scorer; the oracle re-derives the weights
    through the full unrolled training CTEs and scores the same
    doc_id % 3 = 0 sample.

    Scale: the model rides the PLAN as three integer literals — no
    broadcast, no join, no state store, append mode; per-document cost
    is one pass over its token array. This is the cheapest possible
    at-ingest filter shape: a 1000-executor stream scores documents
    with zero cross-executor traffic.
    """
    from grapho_spark.queries.curation import (
        _M,
        _SPARK_GD_X1,
        _SPARK_GD_X2,
        _gd_sigmoid,
        _gd_train,
        _shu,
    )

    w0, w1, w2 = _gd_train(spark, sf_dir)
    s = _gd_sigmoid(f"{w0} + {_shu(f'{w1} * x1 + {w2} * x2', str(_M), 'div')}")
    stream = (
        load_stream(spark, sf_dir, "documents")
        .filter("doc_id % 3 = 0")
        .select(
            "doc_id",
            F.split(F.trim(F.lower("text")), r"\s+").alias("words"),
            F.length(
                F.regexp_replace(F.trim(F.lower("text")), r"\s+", "")
            ).alias("chars"),
        )
        .selectExpr(
            "doc_id", f"{_SPARK_GD_X1} AS x1", f"{_SPARK_GD_X2} AS x2"
        )
        .selectExpr(
            "doc_id",
            f"CAST({s} AS DOUBLE) / {_M}.0 AS quality_score",
            f"{s} >= 500000 AS keep",
        )
    )
    return run_to_memory(stream, "append", state_partitions=_sp(spark, sf_dir, "documents"))


def _cms_stream_oracle() -> str:
    from grapho_spark.queries.text import _cms_bucket_duck

    return f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents)
SELECT CAST(j AS BIGINT) AS j, bucket, CAST(COUNT(*) AS BIGINT) AS c
FROM (SELECT j, {_cms_bucket_duck('w')} AS bucket
      FROM toks, (SELECT unnest([0, 1, 2, 3]) AS j))
GROUP BY 1, 2
"""


@query("streaming_cms_sketch", oracle=_cms_stream_oracle())
def streaming_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch maintained OVER A STREAM: each micro-batch
    folds its tokens into the same fixed 4x512 integer grid
    (text_cms_heavy_hitters' sketch), and because CMS cells merge by
    addition the final streaming state equals the batch sketch exactly
    — the oracle IS the batch construction. This is the
    heavy-hitters-at-ingest shape: the grid is queryable at any point
    mid-stream, and a fleet of ingest streams can union their grids
    cell-wise.

    Scale: streaming state is hard-bounded at 2048 cells no matter the
    corpus (contrast a per-term counter, whose state is vocab-sized and
    grows unboundedly on open-vocabulary streams); the per-batch fold
    is the same map-side-combined aggregate as batch.
    """
    from grapho_spark.queries.text import CMS_D, _cms_bucket_spark

    stack_tok = ", ".join(
        f"CAST({j} AS BIGINT), {_cms_bucket_spark('w', j)}" for j in range(CMS_D)
    )
    stream = (
        _spread(load_stream(spark, sf_dir, "documents"))
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"))
        .selectExpr(f"stack({CMS_D}, {stack_tok}) AS (j, bucket)")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return run_to_memory(stream, "complete", state_partitions=_sp(spark, sf_dir, "documents"))


@query(
    "streaming_state_store_read",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY user_id
""",
)
def streaming_state_store_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store introspection (Spark 4's ``statestore`` batch data
    source): a streaming per-user count/sum aggregation runs to
    completion against an explicit checkpoint, then the OPERATOR STATE
    itself is read back from the checkpoint as a batch DataFrame —
    per-user running totals straight out of RocksDB/HDFS state files,
    no sink required. Since the fixture is finite, the final state
    equals the batch aggregate — an exact oracle over the state files,
    pinning that checkpointed state is complete and readable (the
    debugging/ops surface a production streaming deployment lives by).

    Scale: state reads parallelize by state-store partition (one
    InputPartition per shuffle partition of the checkpoint), so
    inspection cost tracks state size, not input history.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from grapho_spark.streaming import run_with_checkpoint

    # deterministic pid-scoped checkpoint (the source_xml_roundtrip
    # convention): repeated bench/correctness invocations reuse and
    # overwrite ONE directory per (sf_dir, process) instead of leaking
    # a fresh mkdtemp of RocksDB/offset files per run
    ckpt = scratch_path(
        f"grapho_statestore_{os.path.basename(sf_dir)}_{os.getpid()}"
    )
    _shutil.rmtree(ckpt, ignore_errors=True)
    stream = load_stream(spark, sf_dir, "events").select(
        "user_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("k").alias("sum_k")
    )
    run_with_checkpoint(
        agg, "update", ckpt, state_partitions=_sp(spark, sf_dir, "events")
    )
    st = spark.read.format("statestore").load(ckpt)
    # `value.count` / `value.sum` are Spark's INTERNAL aggregation-
    # buffer field names (not the query's n_events/sum_k aliases) —
    # an implementation detail stable across Spark 4.x but not a
    # public API. Resolve them by position from the state schema so a
    # rename on a Spark upgrade fails loudly here, not silently.
    val_fields = st.schema["value"].dataType.names
    if val_fields != ["count", "sum"]:
        raise AssertionError(
            f"statestore value schema changed (Spark upgrade?): "
            f"expected aggregation buffer fields ['count', 'sum'], "
            f"got {val_fields}"
        )
    return st.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.count").cast("long").alias("n_events"),
        F.col("value.sum").cast("long").alias("sum_k"),
    )


@query(
    "streaming_windowed_quantile_sketch",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       TRUE AS p50_rank_certified,
       TRUE AS p95_rank_certified
FROM events
GROUP BY 1, 2
""",
)
def streaming_windowed_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-(day, event_type) value quantiles via the
    Greenwald-Khanna summary (``percentile_approx`` — a mergeable
    bounded-state sketch, the streaming answer to windowed percentiles
    the way HLL answers windowed COUNT DISTINCT). The certificate is
    the GK guarantee itself, checked batch-side against truth: the
    returned p50/p95 must be an element whose EXACT rank (# of group
    values <= it) lies within max(1, 5% of n) of the target rank p*n —
    rank error, not value error, is what GK bounds, so the contract
    holds regardless of the value distribution's shape.

    Scale: sketch state is O(1/eps log eps*n) per group however many
    events stream through; the exact rank side shuffles the window's
    values once and exists only to certify at test SF — at 100 TB only
    the sketch side survives.
    """
    stream = (
        load_stream(spark, sf_dir, "events")
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.percentile_approx("value", 0.5, 1000).alias("p50"),
            F.percentile_approx("value", 0.95, 1000).alias("p95"),
        )
    )
    sketched = run_to_memory(stream, "complete", state_partitions=_sp(spark, sf_dir, "events")).select(
        F.col("window.start").alias("window_start"), "event_type", "p50", "p95"
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("window_start"), "event_type", "value"
    )
    ranks = (
        ev.join(F.broadcast(sketched), ["window_start", "event_type"])
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("value") <= F.col("p50")).cast("long")).alias("rank_p50"),
            F.sum((F.col("value") <= F.col("p95")).cast("long")).alias("rank_p95"),
        )
    )
    tol = F.greatest(F.lit(1.0), F.col("n_events") * 0.05)
    return ranks.select(
        "window_start",
        "event_type",
        "n_events",
        (
            F.abs(F.col("rank_p50") - F.col("n_events") * 0.5) <= tol
        ).alias("p50_rank_certified"),
        (
            F.abs(F.col("rank_p95") - F.col("n_events") * 0.95) <= tol
        ).alias("p95_rank_certified"),
    )
