"""Time-series operators over ``events`` (the hypertable-style surface
a TSDB user expects, built from Spark primitives):

- grid resampling with forward-fill (sequence-generated grid + the
  generic as-of join from operators/asof.py),
- per-day OHLC rollup (open/high/low/close via deterministic
  first/last ordering).

Values are carried verbatim (no float arithmetic), so both engines
return bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.tables import load_table

GRID_START = "2024-01-01 00:00:00"
GRID_END = "2024-01-31 00:00:00"
STEP_HOURS = 6


@query(
    "timeseries_resample_ffill",
    oracle=f"""
WITH users AS (SELECT DISTINCT user_id FROM events WHERE user_id % 3 = 0),
grid AS (
  SELECT u.user_id, g.ts
  FROM users u,
       generate_series(TIMESTAMP '{GRID_START}', TIMESTAMP '{GRID_END}',
                       INTERVAL {STEP_HOURS} HOUR) g(ts)),
filled AS (
  SELECT grid.user_id, grid.ts,
         (SELECT e.value FROM events e
          WHERE e.user_id = grid.user_id AND e.ts <= grid.ts
          ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS value_ffill
  FROM grid)
SELECT user_id, ts AS grid_ts, value_ffill FROM filled
""",
)
def timeseries_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event stream onto a regular 6-hour grid,
    forward-filling the most recent observed value (null before the
    first event) — the TSDB gap-fill/LOCF operator, composed from a
    generated grid and the generic as-of join.

    Rights are pre-deduplicated to the max event_id per (user, ts) so
    the carried value is deterministic under timestamp ties.

    Scale: the grid is |users| x |points| rows built map-side from
    ``sequence``; the as-of join is the union-window pattern — one
    shuffle on user_id, no range-join blowup.
    """
    from grapho_spark.operators import asof_join

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 3 == 0)
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    rights = (
        e.select("user_id", "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    grid = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit(GRID_START).cast("timestamp"),
                    F.lit(GRID_END).cast("timestamp"),
                    F.expr(f"INTERVAL {STEP_HOURS} HOURS"),
                )
            ).alias("ts"),
        )
    )
    out = asof_join(grid, rights, on="ts", by="user_id", value_cols=["value"])
    return out.select(
        "user_id", F.col("ts").alias("grid_ts"), F.col("value_asof").alias("value_ffill")
    )


@query(
    "timeseries_daily_ohlc",
    oracle="""
WITH ordered AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn_open,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_close
  FROM events)
SELECT user_id, day,
       MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
       COUNT(*) AS n_events
FROM ordered
GROUP BY user_id, day
""",
)
def timeseries_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily OHLC bars: open/close picked by deterministic
    (ts, event_id) order, high/low as exact min/max — candlestick
    rollup with zero float arithmetic (values carried verbatim).

    Scale: one shuffle on (user, day); the two rank windows share the
    partitioning with the final aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    w_open = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    w_close = Window.partitionBy("user_id", day).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ordered = e.select(
        "user_id",
        day.alias("day"),
        "value",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return ordered.groupBy("user_id", "day").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_hierarchical_rollup",
    oracle="""
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2
""",
)
def events_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: day-level stats computed
    by RE-AGGREGATING hour partials, which re-aggregate minute
    partials — never touching raw rows twice. The oracle aggregates
    raw events directly, proving the partial chain is lossless (count
    and min/max are associative; the sum runs in DECIMAL so
    accumulation order cannot change it).

    Scale: this is the TSDB rollup pattern at 100 TB — minute partials
    are the only scan of raw data; every coarser granularity is a
    re-aggregation of the (tiny) next-finer level, and partials are
    mergeable across late-arriving partitions.
    """
    e = load_table(spark, sf_dir, "events")
    minute = e.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute_start")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(20,6)")).alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    hour = minute.groupBy(
        "event_type", F.date_trunc("hour", "minute_start").alias("hour_start")
    ).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    return hour.groupBy(
        "event_type", F.date_trunc("day", "hour_start").alias("day_start")
    ).agg(
        F.sum("n").alias("n_events"),
        F.sum("s").cast("double").alias("sum_value"),
        F.min("mn").alias("min_value"),
        F.max("mx").alias("max_value"),
    )


# --------------------------------------------------------------------------
# Exponential smoothing (truncated-FIR EWMA) and z-score anomaly flags
# --------------------------------------------------------------------------
#
# True EWMA is recursive (order-dependent accumulation, not
# cross-engine hashable); the 8-tap truncation with alpha=0.5 keeps
# >99.6% of the mass (2^-8 tail) and becomes a pure per-row scalar
# expression over LAG values — identical IEEE operations on both
# engines, bit-exact with no rounding. Coefficients are powers of two,
# so each scaled term is exact in binary floating point.

_EWMA_TAPS = 8


def _ewma_terms(lag_fmt: str) -> str:
    """SQL for the truncated EWMA numerator/denominator over taps
    0..7; lag_fmt formats a k-lag value expression, e.g.
    ``lag(value, {k}) OVER w``."""
    num = " + ".join(
        f"coalesce({lag_fmt.format(k=k)}, 0) * {0.5 ** k!r}"
        for k in range(_EWMA_TAPS)
    )
    den = " + ".join(
        f"(CASE WHEN {lag_fmt.format(k=k)} IS NOT NULL THEN {0.5 ** k!r} ELSE 0 END)"
        for k in range(_EWMA_TAPS)
    )
    return f"({num}) / ({den})"


@query(
    "timeseries_ewma_smooth",
    oracle=f"""
SELECT event_id, event_type, ts, value,
       {_ewma_terms("lag(value, {k}) OVER (PARTITION BY event_type ORDER BY ts, event_id)")} AS ewma
FROM events
""",
)
def timeseries_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential smoothing per event_type: 8-tap truncated EWMA
    (alpha=0.5) as a per-row FIR over LAG values with renormalized
    weights at series start — bit-exact cross-engine (see module
    comment).

    Scale: one shuffle on event_type; the window is 8 physical lags,
    evaluated streaming within each sorted partition (no unbounded
    frame). Skewed series keys can be range-split because the filter
    taps are finite.
    """
    e = load_table(spark, sf_dir, "events")
    lag_fmt = "lag(value, {k}) OVER (PARTITION BY event_type ORDER BY ts, event_id)"
    return e.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.expr(_ewma_terms(lag_fmt)).alias("ewma"),
    )


@query(
    "timeseries_zscore_anomalies",
    oracle="""
WITH stats AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, e.value,
       round((e.value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS zscore,
       abs((e.value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))) > 2.5 AS is_anomaly
FROM events e JOIN stats USING (event_type)
""",
)
def timeseries_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly flags: population mean/std derived from
    exact DECIMAL sums (order-independent), then a per-row scalar
    z = (x - mean)/std — rounded to 6dp; |z| > 2.5 flags the outlier.

    Scale: the stats table is one row per event_type (broadcast to the
    scoring join); the scoring pass is map-only.
    """
    e = load_table(spark, sf_dir, "events")
    dv = F.col("value").cast("decimal(18,6)")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dv).cast("double").alias("s1"),
        F.sum(dv * dv).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    z = (F.col("value") - mean) / std
    return e.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.round(z, 6).alias("zscore"),
        (F.abs(z) > 2.5).alias("is_anomaly"),
    )


@query(
    "timeseries_gapfill_interpolate",
    oracle=f"""
WITH rights AS (
  SELECT user_id, ts, value
  FROM (SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE user_id % 5 = 0)
  WHERE rn = 1),
users AS (SELECT DISTINCT user_id FROM rights),
grid AS (
  SELECT u.user_id, g.ts
  FROM users u,
       generate_series(TIMESTAMP '{GRID_START}', TIMESTAMP '{GRID_END}',
                       INTERVAL {STEP_HOURS} HOUR) g(ts)),
bounds AS (
  SELECT grid.user_id, grid.ts,
         (SELECT epoch_us(r.ts) FROM rights r
          WHERE r.user_id = grid.user_id AND r.ts <= grid.ts
          ORDER BY r.ts DESC LIMIT 1) AS prev_us,
         (SELECT r.value FROM rights r
          WHERE r.user_id = grid.user_id AND r.ts <= grid.ts
          ORDER BY r.ts DESC LIMIT 1) AS prev_val,
         (SELECT epoch_us(r.ts) FROM rights r
          WHERE r.user_id = grid.user_id AND r.ts > grid.ts
          ORDER BY r.ts LIMIT 1) AS next_us,
         (SELECT r.value FROM rights r
          WHERE r.user_id = grid.user_id AND r.ts > grid.ts
          ORDER BY r.ts LIMIT 1) AS next_val
  FROM grid)
SELECT user_id, ts AS grid_ts,
       CASE WHEN prev_us = epoch_us(ts) THEN round(prev_val, 6)
            WHEN prev_us IS NULL OR next_us IS NULL THEN NULL
            ELSE round(prev_val + (next_val - prev_val)
                       * (CAST(epoch_us(ts) - prev_us AS DOUBLE)
                          / CAST(next_us - prev_us AS DOUBLE)), 6)
       END AS value_interp
FROM bounds
""",
)
def timeseries_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TSDB linear-interpolation gap-fill (the `interpolate()` half of
    hypertable resampling, next to the LOCF ffill twin): each 6-hour
    grid point gets the time-weighted blend of the nearest observation
    on each side; exact hits pass through, points outside the observed
    span stay null. Observations are pre-deduplicated to the max
    event_id per (user, ts); the blend rounds at 6dp (the repo's
    float-parity policy — both engines compute the identical IEEE
    expression).

    Scale: grid + observations are unioned and swept with two window
    passes partitioned by user_id (last-non-null backward, first-non-
    null forward) — one shuffle on user_id, no range join, no
    per-grid-point probes; the oracle's correlated LIMIT-1 subqueries
    state the semantics, the engine never executes that shape.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    w_dedup = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    rights = (
        e.select("user_id", "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.unix_micros("ts").alias("obs_us"),
            F.col("value").alias("obs_val"),
            F.lit(0).alias("tag"),
            F.lit(None).cast("timestamp").alias("grid_ts"),
        )
    )
    grid = (
        rights.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit(GRID_START).cast("timestamp"),
                    F.lit(GRID_END).cast("timestamp"),
                    F.expr(f"INTERVAL {STEP_HOURS} HOURS"),
                )
            ).alias("grid_ts"),
        )
        .select(
            "user_id",
            F.unix_micros("grid_ts").alias("obs_us"),
            F.lit(None).cast("double").alias("obs_val"),
            F.lit(1).alias("tag"),
            "grid_ts",
        )
    )
    merged = rights.unionByName(grid)
    order = [F.col("obs_us"), F.col("tag")]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    swept = merged.select(
        "user_id",
        "grid_ts",
        "tag",
        F.unix_micros("grid_ts").alias("g_us"),
        F.last(F.when(F.col("tag") == 0, F.col("obs_us")), ignorenulls=True)
        .over(w_back)
        .alias("prev_us"),
        F.last(F.when(F.col("tag") == 0, F.col("obs_val")), ignorenulls=True)
        .over(w_back)
        .alias("prev_val"),
        F.first(F.when(F.col("tag") == 0, F.col("obs_us")), ignorenulls=True)
        .over(w_fwd)
        .alias("next_us"),
        F.first(F.when(F.col("tag") == 0, F.col("obs_val")), ignorenulls=True)
        .over(w_fwd)
        .alias("next_val"),
    )
    frac = (F.col("g_us") - F.col("prev_us")).cast("double") / (
        F.col("next_us") - F.col("prev_us")
    ).cast("double")
    return swept.filter(F.col("tag") == 1).select(
        "user_id",
        "grid_ts",
        F.when(F.col("prev_us") == F.col("g_us"), F.round(F.col("prev_val"), 6))
        .when(
            F.col("prev_us").isNull() | F.col("next_us").isNull(),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac, 6
            )
        )
        .alias("value_interp"),
    )


@query(
    "timeseries_cusum_changepoints",
    oracle="""
WITH RECURSIVE base AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id % 7 = 0),
mus AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mu
  FROM base GROUP BY user_id),
seq AS (SELECT b.user_id, b.rn, b.value, m.mu FROM base b JOIN mus m USING (user_id)),
walk AS (
  SELECT user_id, rn, GREATEST(0.0, value - mu - 1.0) AS s
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, GREATEST(0.0, w.s + s.value - s.mu - 1.0)
  FROM walk w JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1)
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE s > 5.0) AS BIGINT) AS n_alarms,
       round(MAX(s), 6) AS max_cusum
FROM walk
GROUP BY user_id
ORDER BY user_id
""",
)
def timeseries_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per user series: the one-sided
    recurrence s_i = max(0, s_{i-1} + x_i - mu - k) with drift k=1 and
    alarm threshold h=5 — genuinely SEQUENTIAL state that no window
    frame can express, so this is the batch showcase for the
    applyInPandas custom-operator path (Arrow batches, one pandas call
    per user group). The per-user mean is an exact-decimal Spark
    aggregate joined in beforehand, so both engines walk the identical
    IEEE sequence; the oracle states the recurrence as a recursive CTE.

    Scale: one shuffle partitions users across executors; each series
    walks locally in numpy. 100 TB of telemetry with millions of
    series parallelizes per-key; a single monster series would need
    segmented scan-style prefix reconstruction instead.
    """
    import pandas as pd

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    # r15: the per-user mean as a WINDOW over user_id instead of a
    # separate aggregate + broadcast join — the window's hash
    # partitioning is exactly the applyInPandas groupBy's, so the two
    # share one exchange and events is scanned ONCE (was: two scans,
    # an aggregate exchange and a BroadcastHashJoin). The window's
    # exact-decimal SUM is order-free, so mu is bit-identical.
    w = Window.partitionBy("user_id")
    joined = e.select("user_id", "ts", "event_id", "value").withColumn(
        "mu",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w),
    )

    def cusum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        mu = pdf["mu"].iloc[0]
        s = 0.0
        n_alarms = 0
        max_s = 0.0
        for x in pdf["value"].to_numpy():
            s = s + x - mu - 1.0
            if s < 0.0:
                s = 0.0
            if s > 5.0:
                n_alarms += 1
            if s > max_s:
                max_s = s
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_alarms": [n_alarms],
                "max_cusum": [round(max_s, 6)],
            }
        )

    return (
        joined.groupBy("user_id")
        .applyInPandas(cusum, schema="user_id long, n_alarms long, max_cusum double")
        .orderBy("user_id")
    )


@query(
    "timeseries_mad_robust_anomalies",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type),
dev AS (
  SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev
  GROUP BY event_type)
SELECT d.event_type,
       round(MAX(d.med), 6) AS median_value,
       round(MAX(a.mad), 6) AS mad,
       CAST(COUNT(*) FILTER (WHERE d.adev > 3 * 1.4826 * a.mad) AS BIGINT)
         AS n_robust_anomalies
FROM dev d JOIN mad a USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
""",
)
def timeseries_mad_robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection via median absolute deviation: the
    outlier-resistant twin of the z-score flags (one extreme value
    shifts a mean and stddev, but not a median). Two exact-median
    passes (interpolated order statistics — identical in both
    engines), then the classic |x - med| > 3 * 1.4826 * MAD rule.

    Scale: two groupBy-percentile rollups over the same shuffle key
    and a broadcast join of the |types|-row stats back onto the
    deviation stream; exact medians at 100 TB would swap for
    approx_percentile with the same pipeline shape.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("median_value"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.count(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1)
            ).cast("long").alias("n_robust_anomalies"),
        )
        .orderBy("event_type")
    )


@query(
    "timeseries_time_weighted_avg",
    oracle="""
WITH seq AS (
  SELECT user_id, value, epoch_us(ts) AS us,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_us
  FROM events WHERE user_id % 11 = 0),
seg AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,6)) * (next_us - us) AS wv,
         next_us - us AS dur
  FROM seq WHERE next_us IS NOT NULL)
SELECT user_id,
       CAST(SUM(dur) AS BIGINT) AS total_us,
       round(CAST(SUM(wv) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE), 6)
         AS time_weighted_avg
FROM seg GROUP BY user_id
ORDER BY user_id
""",
)
def timeseries_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user series (the TSDB `time_weight`
    aggregate): each observation holds until the next one, so its
    weight is the integer-microsecond duration; the weighted sum
    accumulates as exact decimals and the final division is one
    rounded double op — engine-exact without float accumulation.

    Scale: one lead() window pass partitioned by user (shard-parallel)
    and a rollup on the same key — no joins, no range lookups.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 11 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    seg = seq.select(
        "user_id",
        (F.col("value").cast("decimal(18,6)") * (F.col("next_us") - F.col("us"))).alias("wv"),
        (F.col("next_us") - F.col("us")).alias("dur"),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum("dur").cast("long").alias("total_us"),
            F.round(
                F.sum("wv").cast("double") / F.sum("dur").cast("double"), 6
            ).alias("time_weighted_avg"),
        )
        .orderBy("user_id")
    )


@query(
    "timeseries_stl_decompose",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS HUGEINT) AS y
  FROM events GROUP BY 1),
idx AS (
  SELECT day, y,
         CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         COUNT(*) OVER () AS n
  FROM daily),
trend AS (
  SELECT day, y, dow, rn, n,
         CAST(SUM(y) OVER (ORDER BY rn ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
              AS HUGEINT) AS tsum,
         COUNT(*) OVER (ORDER BY rn ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS tcnt
  FROM idx),
detr AS (
  SELECT day, dow,
         CAST(round(CAST(y AS DOUBLE)
                    - CAST(tsum AS DOUBLE) / tcnt, 6) AS DECIMAL(18,6)) AS d
  FROM trend WHERE rn > 3 AND rn <= n - 3),
seasonal AS (
  SELECT dow,
         CAST(SUM(d) * 1000000 AS BIGINT) AS sm,
         COUNT(*) AS n
  FROM detr GROUP BY dow)
SELECT dow,
       CAST(CASE WHEN sm >= 0 THEN (2 * sm + n) // (2 * n)
                 ELSE -((2 * (-sm) + n) // (2 * n)) END AS DOUBLE)
         / 1000000.0 AS seasonal_effect,
       CAST(n AS BIGINT) AS n_days
FROM seasonal ORDER BY dow
""",
)
def timeseries_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition of the daily event count:
    trend = centered 7-day moving average, seasonal = mean of the
    detrended series per weekday (edge days without a full trend
    window are excluded) — the decomposition that separates
    day-of-week rhythm from growth before anomaly flags fire.
    Detrended values round at 6dp and accumulate as exact decimals;
    the per-weekday mean divides by an integer count.

    Scale: one daily rollup, one 7-row window over |days| rows, one
    7-group aggregate — the event volume is touched once.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    w_ord = Window.orderBy("day")
    idx = daily.select(
        "day",
        "y",
        F.dayofweek("day").cast("long").alias("dow"),
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    w7 = w_ord.rowsBetween(-3, 3)
    trend = idx.select(
        "day",
        "y",
        "dow",
        "rn",
        "n",
        F.sum("y").over(w7).alias("tsum"),
        F.count(F.lit(1)).over(w7).alias("tcnt"),
    )
    detr = trend.filter((F.col("rn") > 3) & (F.col("rn") <= F.col("n") - 3)).select(
        "dow",
        F.round(
            F.col("y").cast("double") - F.col("tsum").cast("double") / F.col("tcnt"),
            6,
        )
        .cast("decimal(18,6)")
        .alias("d"),
    )
    # exact half-away-from-zero integer mean at 1e-6 resolution — the
    # round(sum/count, 6) double shape is the boundary-risk class the
    # sf0.1 sweep exposed in the LM-surprisal scorers
    agg = detr.groupBy("dow").agg(
        (F.sum("d") * 1_000_000).cast("long").alias("sm"),
        F.count(F.lit(1)).alias("n"),
    )
    sm, n = F.col("sm"), F.col("n")
    mean_fp = F.when(
        sm >= 0, F.expr("(2 * sm + n) div (2 * n)")
    ).otherwise(-F.expr("(2 * (-sm) + n) div (2 * n)"))
    return agg.select(
        "dow",
        (mean_fp.cast("double") / 1_000_000.0).alias("seasonal_effect"),
        n.cast("long").alias("n_days"),
    ).orderBy("dow")
