"""Similarity search over the ``embeddings`` table (array<float>, 64-d):
brute-force cosine top-k (baseline), an IVF-style coarse-quantized
variant (the scale path), element-wise centroids, and near-duplicate
detection by embedding cosine. A vectorized Arrow/numpy variant of the
brute-force search lives in ``embedding_knn_pandas`` (same oracle).

Determinism: dot products for ranking are computed either in exact
DECIMAL (IVF assignment) or rounded to 6 decimals before ranking, with
vec_id tiebreaks — so Spark's and DuckDB's last-ulp float differences
cannot reorder results.

Scale: brute-force is O(queries x corpus) — fine for a broadcast-able
query set; IVF prunes the corpus to one coarse cell per query, which
is the pattern that survives 100 TB (cells ~ partitions, centroid
table broadcast).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.tables import load_table
from grapho_spark.sparkutil import materialize, scratch_path

DIM = 64

_SPARK_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"


def _spark_cosine(a: str, b: str) -> F.Column:
    dot = _SPARK_DOT.format(a=a, b=b)
    na = _SPARK_DOT.format(a=a, b=a)
    nb = _SPARK_DOT.format(a=b, b=b)
    return F.round(F.expr(f"{dot} / (sqrt({na}) * sqrt({nb}))"), 6)


def _snorm(col: str) -> F.Column:
    """sqrt(self-dot) of a vector column — the per-VECTOR two thirds
    of `_spark_cosine`'s work, lifted out so pair-scale joins compute
    it once per vector instead of once per pair (r15). Same fold,
    same sqrt input."""
    return F.expr(f"sqrt({_SPARK_DOT.format(a=col, b=col)})")


def _cosine_prenorm(a: str, b: str, sa: str, sb: str) -> F.Column:
    """`_spark_cosine` with the two sqrt(self-dot) factors taken from
    precomputed columns. Bit-identical to `_spark_cosine`: the fold,
    the sqrts, the product sa*sb, the division and the 6dp round are
    the same IEEE operations on the same inputs — only WHERE the
    per-vector factors are computed moves (guide §2.3/§2.4: hoist
    per-row work out of the pair fan-out)."""
    dot = _SPARK_DOT.format(a=a, b=b)
    return F.round(F.expr(f"{dot} / ({sa} * {sb})"), 6)


_DUCK_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

# Exact HALF-UP mean of 6dp-decimal components in integer MICRO-UNITS:
# round-half-away-from-zero of SUM(dv)*1e6 / n, computed entirely in
# BIGINT so both engines produce bit-identical codewords (a plain 6dp
# double mean can land on a true 7th-digit tie where Spark BigDecimal
# and DuckDB double->decimal rounding disagree — the PARITY.md r8
# codebook finding). ONE template for every codebook/centroid mean:
# {div} is '//' on DuckDB and 'DIV' on Spark.
_MICRO_MEAN_CW_TEMPLATE = (
    "CAST(CAST(CASE WHEN CAST(SUM({col}) * 1000000 AS BIGINT) >= 0 "
    "THEN (2 * CAST(SUM({col}) * 1000000 AS BIGINT) + COUNT(*)) "
    "{div} (2 * COUNT(*)) "
    "ELSE -((2 * -CAST(SUM({col}) * 1000000 AS BIGINT) + COUNT(*)) "
    "{div} (2 * COUNT(*))) "
    "END AS DOUBLE) / 1000000 AS DECIMAL(12,6))"
)
_MICRO_MEAN_CW_DUCK = _MICRO_MEAN_CW_TEMPLATE.format(div="//", col="dv")
# r15: on the Spark side the exact-6dp decimals are scaled to BIGINT
# micro-units BEFORE the SUM (CAST(SUM(dv)*1e6 AS BIGINT) ==
# SUM(CAST(dv*1e6 AS BIGINT)) — both are the exact integer sum — but
# the long fold stays on the fixed-width aggregation fast path where
# sum(decimal(12,6)) widens to a slow decimal(22,6) buffer). The
# DuckDB oracle text is untouched.
_MICRO_MEAN_CW_SPARK = _MICRO_MEAN_CW_TEMPLATE.format(div="DIV", col="dv").replace(
    "CAST(SUM(dv) * 1000000 AS BIGINT)", "SUM(CAST(dv * 1000000 AS BIGINT))"
)


# r15 (guide §1.2 step 2, §2.3 narrower types): the distance folds used
# to SUM wide decimals — sum(decimal(28,9)) / sum(decimal(38,12)) fall
# off the fixed-width hash-aggregation fast path onto per-row
# BigDecimal arithmetic (measured 7.96s vs 0.92s for the identical
# double fold over the 4M-row kmeans assign join at sf0.1). Every such
# term is an EXACT decimal of bounded scale, so the fold runs instead
# over exact BIGINT fixed-point units; the decimal value is recovered
# (or the ordering consumed) bit-identically.
def _nano9_long(sq):
    """Exact BIGINT nano-units (1e-9) of ``round(sq, 9)``.

    ``round`` (BigDecimal HALF_UP — kept: the 12dp-exact squares land
    on true 9dp ties, measured 10k-41k per corpus, so the rounding
    decision must stay the engine-agreed one) yields a double that IS
    a 9dp value; scaling by 1e9 lands within ~4.4e-7 of its integer
    (|sq| <= 4, so the relative 2^-53 error is bounded), and
    floor(x + 0.5) recovers that integer exactly. A SUM of these longs
    scaled back by 1e-9 equals the old sum(decimal(28,9)) exactly
    (verified: 0/64000 dist mismatches at sf0.1)."""
    return F.floor(F.round(sq, 9) * 1e9 + F.lit(0.5))


def _micro6_long(col):
    """Exact BIGINT micro-units (1e-6) of ``round(col, 6)`` — the
    6dp twin of :func:`_nano9_long` (same recovery argument; values
    are O(1) embedding components, so micro-units stay far inside
    long range even summed over 1e10-row clusters)."""
    return F.floor(F.round(col, 6) * 1e6 + F.lit(0.5))


def _sq_nano9_long(a, b):
    """:func:`_nano9_long` of ``(a-b)^2`` for EXACT-6dp operands,
    paying BigDecimal ``round`` only on true 9dp ties.

    The exact square of two 6dp values is an exact 12dp value; away
    from a 9dp tie it sits >= 1e-12 (0.001 nano) from the rounding
    boundary while the double square is within ~2.2e-15 of it, so
    ``floor(d2*1e9 + 0.5)`` and BigDecimal HALF_UP agree. AT a tie
    (exact femto square % 1000 == 500 — decidable exactly in integer
    micro-units precisely because a and b are exact 6dp values; ~1% of
    terms, measured 41451/4.1M at sf0.1) the two CAN disagree
    (measured 792/64000 dists when floor is used throughout), so those
    rows keep the engine-agreed ``round``. Bit-identical to the old
    sum(decimal(28,9)) fold at ~1/3 the cost."""
    al = F.floor(a * 1e6 + F.lit(0.5))
    bl = F.floor(b * 1e6 + F.lit(0.5))
    sqf = (al - bl) * (al - bl)
    d2 = (a - b) * (a - b)
    return F.when(
        sqf % 1000 == 500, F.floor(F.round(d2, 9) * 1e9 + F.lit(0.5))
    ).otherwise(F.floor(d2 * 1e9 + F.lit(0.5)))


@query(
    "embedding_knn_bruteforce",
    oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
base AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
scored AS (
  SELECT q_id, vec_id, {_DUCK_COS.format(a="qv", b="ev")} AS cosine
  FROM q, base WHERE q_id <> vec_id)
SELECT q_id, vec_id, cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= 5
""",
)
def embedding_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a small query set.

    Scale: the query set is broadcast (never shuffle the corpus); the
    per-query top-k is computed with a ranked window after scoring.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("se"),
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("ev").alias("qv"), F.col("se").alias("sq")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", _cosine_prenorm("qv", "ev", "sq", "se").alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "vec_id", "cosine")
    )


@query(
    "embedding_knn_pandas",
    oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
base AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
scored AS (
  SELECT q_id, vec_id, {_DUCK_COS.format(a="qv", b="ev")} AS cosine
  FROM q, base WHERE q_id <> vec_id)
SELECT q_id, vec_id, cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= 5
""",
)
def embedding_knn_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same search as ``embedding_knn_bruteforce`` via the vectorized
    Arrow path: queries are collected (tiny set) into a numpy matrix,
    the corpus streams through ``mapInPandas`` computing a partial
    top-k per Arrow batch, and a final ranked window merges partials.

    Scale: this is the 100 TB shape — O(batch x queries) BLAS matmul
    per partition, only k rows per (partition, query) cross the wire.
    """
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    q_rows = (
        e.filter(F.col("vec_id") < 10)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.embedding for r in q_rows], dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))

    def partial_topk(batches):
        for pdf in batches:
            ev = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            vid = pdf["vec_id"].to_numpy()
            norms = np.sqrt((ev * ev).sum(axis=1))
            sims = (q_mat @ ev.T) / (q_norm[:, None] * norms[None, :])
            out = []
            for qi, q_id in enumerate(q_ids):
                s = sims[qi]
                mask = vid != q_id
                idx = np.nonzero(mask)[0]
                order = idx[np.argsort(-s[idx], kind="stable")][:5]
                out.append(
                    pd.DataFrame(
                        {
                            "q_id": q_id,
                            "vec_id": vid[order],
                            "cosine": np.round(s[order], 6),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partials = e.select("vec_id", "embedding").mapInPandas(
        partial_topk, schema="q_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        partials.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "vec_id", "cosine")
    )


@query(
    "embedding_centroids",
    oracle="""
SELECT label, i AS pos,
       CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,6))) AS DOUBLE) / COUNT(*) AS centroid_val,
       COUNT(*) AS n_vectors
FROM embeddings, range(1, 65) t(i)
GROUP BY label, i
""",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise centroid per label (exploded representation).

    Decimal-cast elements keep the mean exact across accumulation
    orders. Scale: explode is map-side; one shuffle on (label, pos).
    """
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .select("label", (F.col("pos0") + 1).alias("pos"), F.col("v").cast("double").cast("decimal(12,6)").alias("dv"))
        .groupBy("label", "pos")
        .agg(
            (F.sum("dv").cast("double") / F.count(F.lit(1))).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


_DUCK_IVF_CTE = """
centroids AS (
  SELECT label, i AS pos,
         CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,6))) AS DOUBLE) / COUNT(*) AS cval
  FROM embeddings, range(1, 65) t(i)
  GROUP BY label, i),
queries AS (
  SELECT vec_id AS q_id, label AS q_label, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % 97 = 0),
q_exploded AS (
  SELECT q_id, i AS pos, qv[i] AS qval FROM queries, range(1, 65) t(i)),
q_dots AS (
  SELECT q_id, c.label,
         CAST(SUM(CAST(qval AS DECIMAL(12,6)) * CAST(cval AS DECIMAL(12,6))) AS DOUBLE) AS dot_d
  FROM q_exploded q JOIN centroids c ON q.pos = c.pos
  GROUP BY q_id, c.label),
assigned AS (
  SELECT q_id, label AS cell
  FROM (SELECT q_id, label, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot_d DESC, label) AS rn
        FROM q_dots)
  WHERE rn = 1)
"""


@query(
    "embedding_ivf_knn",
    oracle=f"""
WITH {_DUCK_IVF_CTE},
scored AS (
  SELECT q.q_id, a.cell, e.vec_id,
         {_DUCK_COS.format(a="q.qv", b="e.embedding::DOUBLE[]")} AS cosine
  FROM queries q
  JOIN assigned a ON q.q_id = a.q_id
  JOIN embeddings e ON e.label = a.cell AND e.vec_id <> q.q_id)
SELECT q_id, cell, vec_id, cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
      FROM scored)
WHERE rn <= 3
""",
)
def embedding_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse cells = per-label centroids; each query is
    routed to its nearest centroid (exact-decimal dot product), then
    searched only within that cell.

    Scale: centroid table is tiny and broadcast; the corpus is
    partitioned by cell, so each query touches 1/n_cells of the data —
    the IVF pruning that makes ANN viable at 100 TB.
    """
    _q, top3 = _spark_ivf_results(spark, sf_dir)
    return top3


def _spark_ivf_results(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(query set, IVF top-3 results) — shared by embedding_ivf_knn and
    the recall measurement."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = (
        e.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .select(
            "label",
            (F.col("pos0") + 1).alias("pos"),
            F.col("v").cast("double").cast("decimal(12,6)").alias("dv"),
        )
        .groupBy("label", "pos")
        .agg((F.sum("dv").cast("double") / F.count(F.lit(1))).alias("cval"))
    )
    q = e.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("sq"),
    )
    q_expl = q.select("q_id", F.posexplode("qv").alias("pos0", "qval")).select(
        "q_id", (F.col("pos0") + 1).alias("pos"), "qval"
    )
    q_dots = (
        q_expl.join(F.broadcast(cents), "pos")
        .groupBy("q_id", "label")
        .agg(
            F.sum(
                (F.col("qval").cast("decimal(12,6)") * 1000000).cast("long")
                * (F.col("cval").cast("decimal(12,6)") * 1000000).cast("long")
            ).alias("dot_d")
        )
    )
    w_assign = Window.partitionBy("q_id").orderBy(F.desc("dot_d"), "label")
    assigned = (
        q_dots.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("q_id", F.col("label").alias("cell"))
    )
    base = e.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("se"),
    )
    scored = (
        F.broadcast(q.join(assigned, "q_id"))
        .join(base, (F.col("label") == F.col("cell")) & (F.col("vec_id") != F.col("q_id")))
        .select("q_id", "cell", "vec_id", _cosine_prenorm("qv", "ev", "sq", "se").alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    top3 = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "cell", "vec_id", "cosine")
    )
    return q, top3


@query(
    "embedding_ivf_recall",
    oracle=f"""
WITH {_DUCK_IVF_CTE},
ivf_scored AS (
  SELECT q.q_id, e.vec_id,
         {_DUCK_COS.format(a="q.qv", b="e.embedding::DOUBLE[]")} AS cosine
  FROM queries q
  JOIN assigned a ON q.q_id = a.q_id
  JOIN embeddings e ON e.label = a.cell AND e.vec_id <> q.q_id),
ivf_top AS (
  SELECT q_id, vec_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
        FROM ivf_scored)
  WHERE rn <= 3),
bf_scored AS (
  SELECT q.q_id, e.vec_id,
         {_DUCK_COS.format(a="q.qv", b="e.embedding::DOUBLE[]")} AS cosine
  FROM queries q JOIN embeddings e ON e.vec_id <> q.q_id),
bf_top AS (
  SELECT q_id, vec_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
        FROM bf_scored)
  WHERE rn <= 3),
matched AS (
  SELECT q.q_id, COUNT(i.vec_id) AS m
  FROM queries q
  LEFT JOIN (SELECT it.q_id, it.vec_id FROM ivf_top it
             JOIN bf_top bt ON it.q_id = bt.q_id AND it.vec_id = bt.vec_id) i
    ON i.q_id = q.q_id
  GROUP BY q.q_id)
SELECT COUNT(*) AS n_queries,
       round(SUM(m) * 1.0 / (3 * COUNT(*)), 6) AS avg_recall,
       CAST(SUM(CASE WHEN m = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_perfect
FROM matched
""",
)
def embedding_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the IVF search against exact brute force on the same
    query set — the accuracy/cost dial every ANN deployment has to
    measure ("no silent caps": single-cell probing trades recall for
    the 1/n_cells scan, and this query makes the trade a recorded
    number instead of an assumption).

    Scale: brute force over the full corpus is the expensive side —
    at 100 TB this runs on a sampled query set (as here: ~1% of ids),
    which is exactly how production recall monitoring works.
    """
    q, ivf = _spark_ivf_results(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("se"),
    )
    bf_scored = (
        F.broadcast(q)
        .crossJoin(base)
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", _cosine_prenorm("qv", "ev", "sq", "se").alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    bf_top = (
        bf_scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
    )
    inter = ivf.select("q_id", "vec_id").join(bf_top, ["q_id", "vec_id"])
    matched = (
        q.select("q_id")
        .join(inter.groupBy("q_id").agg(F.count(F.lit(1)).alias("m")), "q_id", "left")
        .select("q_id", F.coalesce("m", F.lit(0)).alias("m"))
    )
    return matched.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.sum("m") * F.lit(1.0) / (F.lit(3) * F.count(F.lit(1))), 6).alias(
            "avg_recall"
        ),
        F.sum(F.when(F.col("m") == 3, 1).otherwise(0)).cast("long").alias("n_perfect"),
    )


@query(
    "embedding_neardup_pairs",
    oracle=f"""
WITH sample AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings WHERE vec_id % 10 = 0),
base AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings),
pairs AS (
  SELECT s.vec_id AS vec_a, b.vec_id AS vec_b, s.label,
         {_DUCK_COS.format(a="s.ev", b="b.ev")} AS cosine
  FROM sample s JOIN base b ON s.label = b.label AND s.vec_id < b.vec_id)
SELECT label, COUNT(*) AS n_pairs_checked,
       CAST(SUM(CASE WHEN cosine >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
       MAX(cosine) AS max_cosine
FROM pairs
GROUP BY label
""",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate scan, blocked by label (the
    coarse cell doubles as the dedup blocking key so the pair join is
    per-cell, not global O(n^2))."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("se"),
    )
    s = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("vec_a"), "label", F.col("ev").alias("av"), F.col("se").alias("sa")
    )
    pairs = s.join(
        e, (s.label == e.label) & (F.col("vec_a") < F.col("vec_id"))
    ).select(s.label.alias("label"), _cosine_prenorm("av", "ev", "sa", "se").alias("cosine"))
    return pairs.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_pairs_checked"),
        F.sum(F.when(F.col("cosine") >= 0.6, 1).otherwise(0)).alias("n_neardup"),
        F.max("cosine").alias("max_cosine"),
    )


N_RP_BITS = 16
_RP_SCALE = 1_000_000

# Deterministic pseudo-random hyperplane component for (element i, bit j):
# an integer in [-5, 5], identical formula on both engines. Embeddings
# are fixed-point-scaled to int64 first, so every dot product is exact
# integer math — no float accumulation order to diverge on.
_SPARK_RP_BUCKET = f"""
aggregate(
  transform(sequence(0, {N_RP_BITS - 1}), j ->
    CASE WHEN aggregate(
           transform(sv, (x, i) -> x * (pmod(i * 7 + j * 13, 11) - 5)),
           0L, (acc, y) -> acc + y) >= 0
         THEN shiftleft(1L, j) ELSE 0L END),
  0L, (acc, b) -> acc + b)
"""


@query(
    "embedding_rp_lsh_neardup",
    oracle=f"""
WITH scaled AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {_RP_SCALE}) AS BIGINT)) AS sv
  FROM embeddings),
dots AS (
  SELECT vec_id, j, SUM(sv[i + 1] * ((i * 7 + j * 13) % 11 - 5)) AS dot
  FROM scaled, range(0, {DIM}) t(i), range(0, {N_RP_BITS}) s(j)
  GROUP BY vec_id, j),
buckets AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
           AS bucket
  FROM dots GROUP BY vec_id),
cand AS (
  SELECT b1.bucket, b1.vec_id AS vec_a, b2.vec_id AS vec_b
  FROM buckets b1 JOIN buckets b2
    ON b1.bucket = b2.bucket AND b1.vec_id < b2.vec_id),
verified AS (
  SELECT cand.bucket,
         {_DUCK_COS.format(a="x1.embedding::DOUBLE[]", b="x2.embedding::DOUBLE[]")}
           AS cosine
  FROM cand
  JOIN embeddings x1 ON x1.vec_id = cand.vec_a
  JOIN embeddings x2 ON x2.vec_id = cand.vec_b)
SELECT COUNT(*) AS n_candidate_pairs,
       CAST(SUM(CASE WHEN cosine >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
       COUNT(DISTINCT bucket) AS n_shared_buckets
FROM verified
""",
)
def embedding_rp_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) LSH near-duplicate scan:
    16 sign bits of deterministic integer hyperplane dot products form
    a bucket id; only same-bucket pairs are verified with the exact
    cosine. This is the cosine-metric sibling of the MinHash path.

    Scale: the signature is one map-side pass (no shuffle); the
    candidate join shuffles on bucket — 2^16 buckets spread uniformly,
    so the pair blow-up is ~n^2/65536 per bucket instead of n^2, and a
    per-bucket cap can bound hot buckets.
    """
    from grapho_spark.sparkutil import materialize

    e = load_table(spark, sf_dir, "embeddings")
    buckets = materialize(
        e.select(
            "vec_id",
            F.expr(
                f"transform(cast(embedding as array<double>),"
                f" x -> cast(round(x * {_RP_SCALE}) as bigint))"
            ).alias("sv"),
        ).select("vec_id", F.expr(_SPARK_RP_BUCKET).alias("bucket"))
    )
    b1 = buckets.select(F.col("vec_id").alias("vec_a"), "bucket")
    b2 = buckets.select(F.col("vec_id").alias("vec_b"), F.col("bucket").alias("b2"))
    cand = b1.join(b2, (b1.bucket == b2.b2) & (b1.vec_a < b2.vec_b)).select(
        "bucket", "vec_a", "vec_b"
    )
    ev = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("sn"),
    )
    verified = (
        cand.join(
            ev.select(F.col("vec_id").alias("vec_a"), F.col("ev").alias("av"), F.col("sn").alias("sa")),
            "vec_a",
        )
        .join(
            ev.select(F.col("vec_id").alias("vec_b"), F.col("ev").alias("bv"), F.col("sn").alias("sb")),
            "vec_b",
        )
        .select("bucket", _cosine_prenorm("av", "bv", "sa", "sb").alias("cosine"))
    )
    return verified.agg(
        F.count(F.lit(1)).alias("n_candidate_pairs"),
        F.sum(F.when(F.col("cosine") >= 0.6, 1).otherwise(0)).alias("n_neardup"),
        F.countDistinct("bucket").alias("n_shared_buckets"),
    )


@query(
    "embedding_int8_quantization",
    oracle="""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
m AS (
  SELECT vec_id, ev,
         list_aggregate(ev, 'min') AS mn,
         list_aggregate(ev, 'max') AS mx
  FROM e),
s AS (
  SELECT vec_id, ev, mn,
         CASE WHEN mx = mn THEN 1.0 ELSE (mx - mn) / 255.0 END AS scale
  FROM m),
q AS (
  SELECT vec_id, mn, scale,
         list_transform(ev, x -> floor((x - mn) / scale + 0.5)) AS codes,
         list_transform(
           ev,
           x -> (x - (mn + floor((x - mn) / scale + 0.5) * scale))
                * (x - (mn + floor((x - mn) / scale + 0.5) * scale))
         ) AS sqerr
  FROM s)
SELECT vec_id, mn, scale,
       CAST(len(list_distinct(codes)) AS BIGINT) AS n_distinct_codes,
       round(list_aggregate(sqerr, 'sum') / len(sqerr), 10) AS mse
FROM q
""",
)
def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding column: per-vector
    min/max affine scale to the 0..255 code range, with codebook usage
    (distinct codes) and reconstruction MSE — the compression step that
    cuts an embedding corpus 4x before ANN indexing at 100 TB.

    Determinism: float32 inputs cast exactly to double; rounding is
    ``floor(v + 0.5)`` on BOTH engines (Spark round() and DuckDB
    round() disagree on tie semantics); the MSE left-fold runs in array
    order in both engines and is rounded at 10dp, far coarser than
    double accumulation error over 64 elements.

    Scale: pure per-row codegen array math — map-only over the scan,
    no shuffle, no Python.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ev = F.col("embedding").cast("array<double>")
    base = e.select("vec_id", ev.alias("ev")).select(
        "vec_id",
        "ev",
        F.array_min("ev").alias("mn"),
        F.array_max("ev").alias("mx"),
    )
    base = base.withColumn(
        "scale",
        F.when(F.col("mx") == F.col("mn"), F.lit(1.0)).otherwise(
            (F.col("mx") - F.col("mn")) / F.lit(255.0)
        ),
    )
    code = "floor((x - mn) / scale + 0.5)"
    err = f"(x - (mn + {code} * scale)) * (x - (mn + {code} * scale))"
    return base.select(
        "vec_id",
        "mn",
        "scale",
        F.size(F.array_distinct(F.expr(f"transform(ev, x -> {code})")))
        .cast("long")
        .alias("n_distinct_codes"),
        F.round(
            F.expr(f"aggregate(transform(ev, x -> {err}), 0D, (acc, x) -> acc + x)")
            / F.size("ev"),
            10,
        ).alias("mse"),
    )


@query(
    "embedding_ivf_multiprobe",
    oracle=f"""
WITH {_DUCK_IVF_CTE.replace("assigned AS (", "assigned_mp AS (").replace(
        "WHERE rn = 1)", "WHERE rn <= 2)").replace(
        "SELECT q_id, label AS cell", "SELECT q_id, label AS cell, rn")},
bf_scored AS (
  SELECT q.q_id, e.vec_id,
         {_DUCK_COS.format(a="q.qv", b="e.embedding::DOUBLE[]")} AS cosine
  FROM queries q JOIN embeddings e ON e.vec_id <> q.q_id),
bf_top AS (
  SELECT q_id, vec_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
        FROM bf_scored)
  WHERE rn <= 3),
probes(n_probe) AS (VALUES (1), (2)),
ivf_scored AS (
  SELECT p.n_probe, q.q_id, e.vec_id,
         {_DUCK_COS.format(a="q.qv", b="e.embedding::DOUBLE[]")} AS cosine
  FROM probes p
  JOIN assigned_mp a ON a.rn <= p.n_probe
  JOIN queries q ON q.q_id = a.q_id
  JOIN embeddings e ON e.label = a.cell AND e.vec_id <> q.q_id),
ivf_top AS (
  SELECT n_probe, q_id, vec_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY n_probe, q_id
                                     ORDER BY cosine DESC, vec_id) AS rn
        FROM ivf_scored)
  WHERE rn <= 3),
matched AS (
  SELECT p.n_probe, q.q_id, COUNT(i.vec_id) AS m
  FROM probes p CROSS JOIN queries q
  LEFT JOIN (SELECT it.n_probe, it.q_id, it.vec_id FROM ivf_top it
             JOIN bf_top bt ON it.q_id = bt.q_id AND it.vec_id = bt.vec_id) i
    ON i.q_id = q.q_id AND i.n_probe = p.n_probe
  GROUP BY p.n_probe, q.q_id)
SELECT n_probe,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       round(SUM(m) * 1.0 / (3 * COUNT(*)), 6) AS avg_recall,
       CAST(SUM(CASE WHEN m = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_perfect
FROM matched
GROUP BY n_probe
""",
)
def embedding_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF: each query searches its TOP-2 nearest cells
    instead of one, and recall@3 vs exact brute force is reported for
    n_probe = 1 and 2 side by side — the standard ANN accuracy/cost
    dial (probe more cells -> scan more data -> higher recall),
    recorded as a number instead of an assumption.

    Scale: probing k cells multiplies the per-query scan by k/n_cells,
    nothing else changes — candidate generation is still
    broadcast-join + per-cell pruning; the brute-force side exists
    only to measure recall and runs on the sampled query set.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cents = (
        e.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .select(
            "label",
            (F.col("pos0") + 1).alias("pos"),
            F.col("v").cast("double").cast("decimal(12,6)").alias("dv"),
        )
        .groupBy("label", "pos")
        .agg((F.sum("dv").cast("double") / F.count(F.lit(1))).alias("cval"))
    )
    q = e.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("sq"),
    )
    q_expl = q.select("q_id", F.posexplode("qv").alias("pos0", "qval")).select(
        "q_id", (F.col("pos0") + 1).alias("pos"), "qval"
    )
    q_dots = (
        q_expl.join(F.broadcast(cents), "pos")
        .groupBy("q_id", "label")
        .agg(
            F.sum(
                (F.col("qval").cast("decimal(12,6)") * 1000000).cast("long")
                * (F.col("cval").cast("decimal(12,6)") * 1000000).cast("long")
            ).alias("dot_d")
        )
    )
    w_assign = Window.partitionBy("q_id").orderBy(F.desc("dot_d"), "label")
    assigned = (
        q_dots.withColumn("cell_rank", F.row_number().over(w_assign))
        .filter(F.col("cell_rank") <= 2)
        .select("q_id", F.col("label").alias("cell"), "cell_rank")
    )
    base = e.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("se"),
    )
    probes = spark.range(1, 3).select(F.col("id").cast("int").alias("n_probe"))
    cand = (
        F.broadcast(probes)
        .join(assigned, F.col("cell_rank") <= F.col("n_probe"))
        .join(q, "q_id")
    )
    scored = F.broadcast(cand).join(
        base, (F.col("label") == F.col("cell")) & (F.col("vec_id") != F.col("q_id"))
    ).select("n_probe", "q_id", "vec_id", _cosine_prenorm("qv", "ev", "sq", "se").alias("cosine"))
    w_top = Window.partitionBy("n_probe", "q_id").orderBy(F.desc("cosine"), "vec_id")
    ivf_top = (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= 3)
        .select("n_probe", "q_id", "vec_id")
    )
    bf_scored = (
        F.broadcast(q)
        .crossJoin(base.drop("label"))
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", _cosine_prenorm("qv", "ev", "sq", "se").alias("cosine"))
    )
    w_bf = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    bf_top = (
        bf_scored.withColumn("rn", F.row_number().over(w_bf))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
    )
    inter = ivf_top.join(bf_top, ["q_id", "vec_id"]).groupBy("n_probe", "q_id").agg(
        F.count(F.lit(1)).alias("m")
    )
    matched = (
        F.broadcast(probes)
        .crossJoin(q.select("q_id"))
        .join(inter, ["n_probe", "q_id"], "left")
        .select("n_probe", "q_id", F.coalesce("m", F.lit(0)).alias("m"))
    )
    return matched.groupBy("n_probe").agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.sum("m") * F.lit(1.0) / (F.lit(3) * F.count(F.lit(1))), 6).alias(
            "avg_recall"
        ),
        F.sum(F.when(F.col("m") == 3, 1).otherwise(0)).cast("long").alias("n_perfect"),
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance (ADC) search
# --------------------------------------------------------------------------

_PQ_M = 8  # subspaces (64-d -> 8 x 8-d subvectors)
_PQ_K = 4  # codewords per subspace

_DUCK_PQ_CTE = f"""
pq_expl AS (
  SELECT vec_id, i AS pos, (i - 1) // 8 AS sub,
         CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,6)) AS dv
  FROM embeddings, range(1, 65) t(i)),
pq_cw AS (
  SELECT vec_id % {_PQ_K} AS grp, sub, pos,
         {_MICRO_MEAN_CW_DUCK} AS cw
  FROM pq_expl GROUP BY vec_id % {_PQ_K}, sub, pos),
pq_dists AS (
  SELECT e.vec_id, e.sub, c.grp,
         CAST(SUM((e.dv - c.cw) * (e.dv - c.cw)) AS DECIMAL(38,12)) AS dist
  FROM pq_expl e JOIN pq_cw c ON e.sub = c.sub AND e.pos = c.pos
  GROUP BY e.vec_id, e.sub, c.grp),
pq_codes AS (
  SELECT vec_id, sub, grp AS code
  FROM (SELECT vec_id, sub, grp,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist, grp) AS rn
        FROM pq_dists)
  WHERE rn = 1),
pq_lut AS (
  SELECT d.vec_id AS q_id, d.sub, d.grp, d.dist
  FROM pq_dists d WHERE d.vec_id % 97 = 0),
pq_adc AS (
  SELECT l.q_id, c.vec_id,
         CAST(SUM(l.dist) AS DOUBLE) AS adc_dist
  FROM pq_codes c JOIN pq_lut l ON l.sub = c.sub AND l.grp = c.code
  WHERE c.vec_id <> l.q_id
  GROUP BY l.q_id, c.vec_id)
"""


def _pq_demo_parts(spark: SparkSession, sf_dir: str):
    """(codes, lut) of the 4-codeword PQ DEMO protocol — the shared
    construction of embedding_pq_adc_knn and embedding_ivfpq_knn,
    memoized per session (each previously re-derived the identical
    codebook, corpus codes and query LUT).

    r16: the corpus code assignment folds per-(vector, subspace)
    micro-unit arrays against the broadcast codebook (_pq_assign_hof —
    the _pq16_codebook shape; SUM((dvm-cwl)^2) and the (dist, grp)
    argmin tie-break are bit-identical to the exploded join + window
    they replace). The query LUT keeps the exploded JOIN: it is
    query-sized (n/97 rows x {_PQ_K} codewords), and it must keep ALL
    codeword distances, not the argmin."""
    from grapho_spark.sparkutil import memo_table

    def build_varr() -> DataFrame:
        e = load_table(spark, sf_dir, "embeddings")
        n_vecs = e.count()  # metadata-cheap columnar count
        par = max(
            1,
            min(spark.sparkContext.defaultParallelism, n_vecs * _PQ_M // 4096 + 1),
        )
        return (
            e.select("vec_id", F.posexplode("embedding").alias("pos0", "v"))
            .select(
                "vec_id",
                F.floor(F.col("pos0") / _PQ_M).cast("int").alias("sub"),
                "pos0",
                (F.col("v").cast("double").cast("decimal(12,6)") * 1000000)
                .cast("long")
                .alias("dvm"),
            )
            .groupBy("vec_id", "sub")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos0", "dvm"))),
                    lambda s: s.getField("dvm"),
                ).alias("dvm")
            )
            .repartition(par, "vec_id")
        )

    varr = memo_table(spark, f"pq_demo_varr:{sf_dir}", build_varr)
    mean_dvm = _MICRO_MEAN_CW_SPARK.replace("CAST(dv * 1000000 AS BIGINT)", "dvm")
    cw = (
        varr.select(
            (F.col("vec_id") % _PQ_K).alias("grp"),
            "sub",
            F.posexplode("dvm").alias("p0", "dvm"),
        )
        .groupBy(
            "grp", "sub", (F.col("sub") * _PQ_M + F.col("p0") + 1).alias("pos")
        )
        .agg(F.expr(mean_dvm).alias("cw"))
    )

    def build_codes() -> DataFrame:
        return _pq_assign_hof(varr, cw).select(
            "vec_id", "sub", F.col("grp").alias("code")
        )

    def build_lut() -> DataFrame:
        cwl = (F.col("cw") * 1000000).cast("long")
        return (
            varr.filter(F.col("vec_id") % 97 == 0)
            .select("vec_id", "sub", F.posexplode("dvm").alias("p0", "dvm"))
            .select(
                "vec_id",
                "sub",
                (F.col("sub") * _PQ_M + F.col("p0") + 1).alias("pos"),
                "dvm",
            )
            .join(F.broadcast(cw), ["sub", "pos"])
            .groupBy("vec_id", "sub", "grp")
            .agg(
                F.sum((F.col("dvm") - cwl) * (F.col("dvm") - cwl)).alias("dist")
            )
            .select(
                F.col("vec_id").alias("q_id"),
                F.col("sub").alias("l_sub"),
                F.col("grp").alias("l_grp"),
                "dist",
            )
        )

    return (
        memo_table(spark, f"pq_demo_codes:{sf_dir}", build_codes),
        memo_table(spark, f"pq_demo_lut:{sf_dir}", build_lut),
    )


@query(
    "embedding_pq_adc_knn",
    oracle=f"""
WITH {_DUCK_PQ_CTE}
SELECT q_id, vec_id, adc_dist
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY adc_dist, vec_id) AS rn
      FROM pq_adc)
WHERE rn <= 3
""",
)
def embedding_pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance (ADC) scoring:
    each 64-d vector is split into {_PQ_M} 8-d subvectors, every
    subvector quantized to its nearest of {_PQ_K} per-subspace
    codewords (codebook = exact-decimal means of the deterministic
    ``vec_id % {_PQ_K}`` seed partition — one random-partition k-means
    init step, reproducible on both engines). A query is answered
    WITHOUT decoding the corpus: its per-(subspace, codeword) squared
    distances form a {_PQ_M}x{_PQ_K} lookup table, and each corpus
    vector's approximate distance is the sum of {_PQ_M} table lookups
    selected by its stored codes.

    Scale: this is the memory-bound ANN path at 100 TB — the corpus is
    stored as {_PQ_M} small codes per vector (8 bytes vs 256 for raw
    float32); the codebook and per-query LUTs are KBs and broadcast;
    scoring is a map-side join + sum, never touching raw vectors. All
    distance math is exact DECIMAL so ranking is cross-engine stable.
    """
    # r16: codes + LUT come from the memoized demo-PQ bundle (HOF code
    # assignment; exact BIGINT femto-unit distances — see
    # _pq_demo_parts for the bit-identity argument). The ADC scoring
    # below stays a JOIN: it is the corpus-scale fan-out, where
    # interpreted HOF folds are the slow path (verify-skill r15 note).
    codes, lut = _pq_demo_parts(spark, sf_dir)
    adc = (
        codes.join(
            F.broadcast(lut),
            (F.col("sub") == F.col("l_sub")) & (F.col("code") == F.col("l_grp")),
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg((F.sum("dist").cast("double") / 1e12).alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_dist", "vec_id")
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id", "adc_dist")
    )


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (64-d -> 16-d)
# --------------------------------------------------------------------------

_JL_OUT = 16


def _jl_sign(j: int, i: int) -> int:
    """Deterministic +/-1 projection entry for output dim j, input dim
    i — a fixed pseudo-random sign pattern both engines can replay
    (md5 of "j:i", parity of first hex nibble)."""
    import hashlib

    h = hashlib.md5(f"{j}:{i}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


def _jl_spark_expr(j: int) -> str:
    terms = " + ".join(
        f"({'' if _jl_sign(j, i) > 0 else '-'}CAST(embedding[{i}] AS DOUBLE))"
        for i in range(DIM)
    )
    return f"round(({terms}) / 4.0, 6)"


def _jl_duck_expr(j: int) -> str:
    # DuckDB lists are 1-based
    terms = " + ".join(
        f"({'' if _jl_sign(j, i) > 0 else '-'}CAST(embedding[{i + 1}] AS DOUBLE))"
        for i in range(DIM)
    )
    return f"round(({terms}) / 4.0, 6)"


@query(
    "embedding_random_projection",
    oracle="SELECT vec_id, "
    + ", ".join(f"{_jl_duck_expr(j)} AS d{j}" for j in range(_JL_OUT))
    + " FROM embeddings",
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: 64-d -> 16-d via
    a fixed +/-1 sign matrix (Achlioptas construction, scaled by
    1/sqrt(16) = 1/4). The sign pattern derives from md5(j:i) so both
    engines replay the identical matrix; each output dim is one fixed
    left-to-right sum of 64 signed doubles rounded at 6dp —
    deterministic scalar math, no aggregation.

    Scale: map-only codegen (16 fused projections per row, zero
    shuffle); the JL guarantee lets downstream ANN/clustering run on
    a 4x smaller vector at bounded distance distortion.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        *[F.expr(_jl_spark_expr(j)).alias(f"d{j}") for j in range(_JL_OUT)],
    )


@query(
    "embedding_ivfpq_knn",
    oracle=f"""
WITH {_DUCK_IVF_CTE},
{_DUCK_PQ_CTE.strip().rstrip()},
cells AS (SELECT vec_id, label FROM embeddings),
adc_cell AS (
  SELECT l.q_id, c.vec_id, a.cell,
         CAST(SUM(l.dist) AS DOUBLE) AS adc_dist
  FROM pq_codes c
  JOIN cells ce ON ce.vec_id = c.vec_id
  JOIN assigned a ON a.cell = ce.label
  JOIN pq_lut l ON l.q_id = a.q_id AND l.sub = c.sub AND l.grp = c.code
  WHERE c.vec_id <> l.q_id
  GROUP BY l.q_id, c.vec_id, a.cell)
SELECT q_id, cell, vec_id, adc_dist
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY adc_dist, vec_id) AS rn
      FROM adc_cell)
WHERE rn <= 3
""",
)
def embedding_ivfpq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ: the production ANN composition — each query routes to
    its nearest coarse cell (exact-decimal centroid dot products, as
    embedding_ivf_knn), then PQ/ADC scores ONLY the vectors in that
    cell from their stored 8-byte codes. Exhaustive ADC is
    O(corpus x queries) (measured 5.8x under the 10x probe, which
    inflates both); cell routing divides the scored corpus by the cell
    count, which is the shape that holds at 100 TB — cells map to
    partitions, codes stay columnar, codebook/LUTs broadcast.
    """
    e = load_table(spark, sf_dir, "embeddings")
    # coarse routing (exact-decimal centroid assignment)
    cents = (
        e.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .select(
            "label",
            (F.col("pos0") + 1).alias("pos"),
            F.col("v").cast("double").cast("decimal(12,6)").alias("dv"),
        )
        .groupBy("label", "pos")
        .agg((F.sum("dv").cast("double") / F.count(F.lit(1))).alias("cval"))
    )
    q_expl = (
        e.filter(F.col("vec_id") % 97 == 0)
        .select(F.col("vec_id").alias("q_id"), F.posexplode("embedding").alias("pos0", "qv"))
        .select("q_id", (F.col("pos0") + 1).alias("pos"), F.col("qv").cast("double").alias("qval"))
    )
    q_dots = (
        q_expl.join(F.broadcast(cents), "pos")
        .groupBy("q_id", "label")
        .agg(
            F.sum(
                (F.col("qval").cast("decimal(12,6)") * 1000000).cast("long")
                * (F.col("cval").cast("decimal(12,6)") * 1000000).cast("long")
            ).alias("dot_d")
        )
    )
    w_assign = Window.partitionBy("q_id").orderBy(F.desc("dot_d"), "label")
    assigned = (
        q_dots.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("q_id", F.col("label").alias("cell"))
    )
    # PQ pieces: the memoized demo-PQ bundle shared with
    # embedding_pq_adc_knn (r16 — both queries previously re-derived
    # the identical codebook/codes/LUT chains per invocation)
    codes, lut = _pq_demo_parts(spark, sf_dir)
    cells = e.select("vec_id", "label")
    routed = assigned.select(F.col("q_id").alias("a_qid"), "cell")
    adc = (
        codes.join(cells, "vec_id")
        .join(F.broadcast(routed), F.col("label") == F.col("cell"))
        .join(
            F.broadcast(lut),
            (F.col("a_qid") == F.col("q_id"))
            & (F.col("sub") == F.col("l_sub"))
            & (F.col("code") == F.col("l_grp")),
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id", "cell")
        .agg((F.sum("dist").cast("double") / 1e12).alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_dist", "vec_id")
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "cell", "vec_id", "adc_dist")
    )


@query(
    "embedding_cell_balance",
    oracle="""
WITH cells AS (
  SELECT label AS cell, count(*) AS n_vectors FROM embeddings GROUP BY label),
tot AS (SELECT count(*) AS n, count(DISTINCT label) AS n_cells FROM embeddings)
SELECT cell, n_vectors,
       round(n_vectors * 1.0 / n, 6) AS share,
       round(n_vectors * 1.0 / (n * 1.0 / n_cells), 6) AS balance_ratio
FROM cells, tot
""",
)
def embedding_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-balance observability: vectors per coarse cell, each
    cell's corpus share, and its ratio to the ideal uniform cell size —
    the skew report that predicts IVF tail latency (a 10x-overloaded
    cell makes every query routed there 10x slower; the fix is
    splitting hot cells or multi-probing).

    Scale: one cell-keyed count plus a 1-row broadcast scalar.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cells = e.groupBy(F.col("label").alias("cell")).agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    tot = e.agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("label").alias("n_cells")
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "cell",
        "n_vectors",
        F.round(F.col("n_vectors") * F.lit(1.0) / F.col("n"), 6).alias("share"),
        F.round(
            F.col("n_vectors") * F.lit(1.0) / (F.col("n") * F.lit(1.0) / F.col("n_cells")),
            6,
        ).alias("balance_ratio"),
    )


@query(
    "embedding_quantile_normalize",
    oracle="""
WITH flat AS (
  SELECT vec_id, embedding[p.pos] AS val, p.pos
  FROM embeddings
  CROSS JOIN (SELECT UNNEST(range(1, 5)) AS pos) p),
ranked AS (
  SELECT vec_id, pos - 1 AS dim, val,
         ROW_NUMBER() OVER (PARTITION BY pos ORDER BY val, vec_id) AS rk,
         COUNT(*) OVER (PARTITION BY pos) AS n
  FROM flat)
SELECT vec_id, dim,
       round((rk - 0.5) / n, 6) AS qnorm
FROM ranked
WHERE vec_id % 199 = 0
ORDER BY vec_id, dim
""",
)
def embedding_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension quantile (rank) normalization of the embedding
    matrix — the feature-preprocessing step that uniformizes each
    dimension's marginal before tabular training or histogram-based
    indexing. qnorm = (rank - 0.5)/n per dimension, ties broken by
    vec_id so both engines rank identically; checked on the first 4
    dims for a deterministic sample of vectors.

    Scale: posexplode keys every value by dimension, so each
    dimension ranks independently in its own partition (shard-parallel
    window, no global sort); at 100 TB you'd swap the exact rank for a
    per-dimension t-digest lookup, same pipeline shape.
    """
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("dim", "val")
    )
    w = Window.partitionBy("dim").orderBy("val", "vec_id")
    ranked = flat.select(
        "vec_id",
        "dim",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("dim")).alias("n"),
    )
    return (
        ranked.filter(F.col("vec_id") % 199 == 0)
        .select(
            "vec_id",
            "dim",
            F.round((F.col("rk") - 0.5) / F.col("n"), 6).alias("qnorm"),
        )
        .orderBy("vec_id", "dim")
    )


@query(
    "embedding_standardize",
    oracle="""
WITH flat AS (
  SELECT vec_id, embedding[p.pos] AS val, p.pos - 1 AS dim
  FROM embeddings
  CROSS JOIN (SELECT UNNEST(range(1, 5)) AS pos) p),
stats AS (
  SELECT dim,
         CAST(SUM(CAST(round(val, 6) AS DECIMAL(18,6))) AS DOUBLE)
           / COUNT(*) AS mu,
         CAST(SUM(CAST(round(val * val, 9) AS DECIMAL(28,9))) AS DOUBLE)
           / COUNT(*) AS m2,
         COUNT(*) AS n
  FROM flat GROUP BY dim)
SELECT f.vec_id, f.dim,
       round((f.val - s.mu) / sqrt(s.m2 - s.mu * s.mu), 6) AS zval
FROM flat f JOIN stats s USING (dim)
WHERE f.vec_id % 199 = 0
ORDER BY f.vec_id, f.dim
""",
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization (z-scoring) of the embedding
    matrix — the parametric twin of the quantile normalizer: each
    dimension's mean and variance come from exact-decimal moment sums
    (per-value rounding at 6/9dp keeps float32 inputs engine-exact),
    then one rounded double expression standardizes; checked on the
    first 4 dims for a deterministic vector sample.

    Scale: one moments rollup per dimension (map-side partials over
    the exploded stream), broadcast back onto the values — no window,
    no sort, unlike the rank-based normalizer.
    """
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("dim", "val")
    )
    stats = flat.groupBy("dim").agg(
        (
            F.sum(F.round(F.col("val"), 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu"),
        (
            F.sum(F.round(F.col("val") * F.col("val"), 9).cast("decimal(28,9)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("m2"),
    )
    return (
        flat.join(F.broadcast(stats), "dim")
        .filter(F.col("vec_id") % 199 == 0)
        .select(
            "vec_id",
            "dim",
            F.round(
                (F.col("val") - F.col("mu"))
                / F.sqrt(F.col("m2") - F.col("mu") * F.col("mu")),
                6,
            ).alias("zval"),
        )
        .orderBy("vec_id", "dim")
    )


def _normalized_vec_expl(
    spark: SparkSession, sf_dir: str, pred: str | None = None
) -> DataFrame:
    """(vec_id, pos 1-based, val) — L2-NORMALIZED embedding components,
    6dp-rounded doubles, memoized per (session, sf_dir, pred). The
    norm is a sequential double fold over the array (``_SPARK_DOT``)
    so it equals DuckDB's ``list_dot_product`` bit-for-bit;
    normalizing before any L2-based routing/quantization makes
    squared-L2 ordering agree with cosine ordering (L2^2 = 2 - 2cos on
    unit vectors) — the metric alignment the r7 recall dial showed the
    un-normalized index lacks. ``pred`` restricts the corpus (SQL
    predicate over the raw embeddings columns) — the delta-ingest path
    normalizes only its batch."""
    from grapho_spark.sparkutil import memo_table

    def build() -> DataFrame:
        e = load_table(spark, sf_dir, "embeddings")
        if pred is not None:
            e = e.filter(pred)
        ed = "CAST(embedding AS ARRAY<DOUBLE>)"
        dot = _SPARK_DOT.format(a=ed, b=ed)
        nv = e.select(
            "vec_id",
            F.expr(f"transform({ed}, x -> round(x / sqrt({dot}), 6))").alias("nvec"),
        )
        return nv.select(
            "vec_id", F.posexplode("nvec").alias("pos0", "val")
        ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "val")

    return memo_table(spark, f"norm_vec_expl:{sf_dir}:{pred}", build)


_KMEANS_PAIR_MEMO: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _kmeans_pair(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    rounds: int,
    normalized: bool = False,
    pred: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd k-means, parameterized (r8): ``k`` centroids
    seeded from the first ``k`` vectors, ``rounds`` recompute rounds,
    then a final assignment against the last centroids. Returns
    (assignments(vec_id, cid), centroids(cid, pos, cval)) — the
    centroid table is the one the final assignment used, so routing an
    in-corpus query by argmin-distance lands in its own cell. Distance
    terms round at 9dp and accumulate as exact DECIMAL(28,9) (groupBy
    SUM of exact decimals == the reference fold, order-free); means are
    the 6dp exact-decimal protocol of embedding_kmeans_lloyd. With
    ``normalized`` the input is the 6dp L2-normalized component table.

    Scale: one broadcast join of k centroids + map-side partial
    aggregation per assignment; lineage is checkpoint-truncated per
    round (PERF.md's iterative-loop lesson). Memoized per
    (session, sf_dir, k, rounds, normalized, pred) — both consumers of
    a configuration read one cached assignment/centroid pair. ``pred``
    restricts the training corpus (delta-ingest test path; the k seed
    vectors must satisfy it)."""
    from pyspark.sql.types import DecimalType

    key = (spark.sparkContext.applicationId, sf_dir, k, rounds, normalized, pred)
    got = _KMEANS_PAIR_MEMO.get(key)
    if got is not None:
        return got
    from grapho_spark.sparkutil import checkpoint_state, materialize

    if normalized:
        vecs = _normalized_vec_expl(spark, sf_dir, pred)
    else:
        e = load_table(spark, sf_dir, "embeddings")
        if pred is not None:
            e = e.filter(pred)
        vecs = materialize(
            e.select("vec_id", F.posexplode("embedding").alias("pos0", "val")).select(
                "vec_id", (F.col("pos0") + 1).alias("pos"), "val"
            )
        )

    # r15: the dist fold runs in exact BIGINT nano-units instead of
    # decimal(28,9) (argmin ordering is scale-invariant; per-vector
    # sums are <= 64 * 4e9 nano, far inside long range) — same values,
    # fixed-width aggregation path (guide §1.2/§2.3). The normalized
    # corpus is exact-6dp, so it additionally skips the per-row
    # BigDecimal round on non-tie terms (_sq_nano9_long); raw-double
    # corpora keep the full round.
    #
    # r15b: the assignment itself is a per-VECTOR array fold against
    # the broadcast centroid structs (the ann_probe_mapside shape)
    # instead of an exploded (vec,pos)x(cell,pos) join — the join
    # built a n*64*k intermediate (12.5M rows/round at sf0.1) before
    # its groupBy; the fold does the same integer sums map-side.
    # BIGINT addition is order-free and the per-term expressions below
    # are the SQL spellings of _nano9_long/_sq_nano9_long, so every
    # dist (and therefore every argmin with the same (d, cid)
    # tie-break) is bit-identical to the join+window version.
    if normalized:
        _mic = "CAST(FLOOR({v} * 1000000 + 0.5D) AS BIGINT)"
        _term = (
            f"CASE WHEN (({_mic.format(v='x')} - {_mic.format(v='y')}) * "
            f"({_mic.format(v='x')} - {_mic.format(v='y')})) % 1000 = 500 "
            "THEN CAST(FLOOR(round((x - y) * (x - y), 9) * 1000000000 + 0.5D) AS BIGINT) "
            "ELSE CAST(FLOOR((x - y) * (x - y) * 1000000000 + 0.5D) AS BIGINT) END"
        )
    else:
        _term = "CAST(FLOOR(round((x - y) * (x - y), 9) * 1000000000 + 0.5D) AS BIGINT)"

    # one array row per vector, built ONCE from the exploded table and
    # reused by every round's assignment. Explicit partition count:
    # AQE would coalesce the ~3MB agg output to one partition and
    # serialize the fold; explicit repartition is AQE-exempt. Sized
    # from the corpus (ceil(n/256) vectors per task) and capped at
    # cluster parallelism — at scale the cap binds, locally it spreads
    # the interpreted HOF work across cores.
    _eb = load_table(spark, sf_dir, "embeddings")
    if pred is not None:
        _eb = _eb.filter(pred)
    n_vecs = _eb.count()  # metadata-cheap columnar count
    par = max(1, min(spark.sparkContext.defaultParallelism, n_vecs // 256 + 1))
    varr = materialize(
        vecs.groupBy("vec_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "val"))),
                lambda s: s.getField("val"),
            ).alias("varr")
        )
        .repartition(par, "vec_id")
    )

    def assign(cents: DataFrame) -> DataFrame:
        carr = (
            cents.groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "cval"))),
                    lambda s: s.getField("cval"),
                ).alias("cvec")
            )
            .agg(F.sort_array(F.collect_list(F.struct("cid", "cvec"))).alias("cents"))
        )
        return varr.crossJoin(F.broadcast(carr)).select(
            "vec_id",
            F.expr(
                f"""element_at(array_sort(transform(cents, c -> struct(
                     aggregate(zip_with(varr, c.cvec, (x, y) -> {_term}),
                               CAST(0 AS BIGINT), (a, t) -> a + t) AS d,
                     c.cid AS cid))), 1).cid"""
            ).alias("cid"),
        )

    def recompute(assigned: DataFrame) -> DataFrame:
        # r15: micro-unit BIGINT fold; cast(sum_long as double)/1e6 and
        # cast(sum_decimal(18,6) as double) are both the nearest double
        # of the same exact sum, so the 6dp mean is bit-identical (an
        # exact-6dp corpus skips the per-row BigDecimal round too)
        micro = (
            F.floor(F.col("val") * 1e6 + F.lit(0.5))
            if normalized
            else _micro6_long(F.col("val"))
        )
        return (
            vecs.join(assigned, "vec_id")
            .groupBy("cid", "pos")
            .agg(
                F.round(
                    F.sum(micro).cast("double") / 1e6 / F.count(F.lit(1)),
                    6,
                ).alias("cval")
            )
        )

    if pred is None:
        cents = vecs.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cid"), "pos", F.col("val").alias("cval")
        )
    else:
        # r12: a pred-restricted corpus must seed from its OWN first k
        # vectors — ``vec_id < k`` intersected with the pred yields
        # fewer than k live seeds (measured: a %5 sample at k=16 ran
        # 4 effective cells, so every probe scanned the whole corpus).
        # The k smallest in-corpus vec_ids keep the seed deterministic.
        seed_ids = (
            vecs.select("vec_id").distinct().orderBy("vec_id").limit(k)
        )
        cents = vecs.join(F.broadcast(seed_ids), "vec_id").select(
            F.col("vec_id").alias("cid"), "pos", F.col("val").alias("cval")
        )
    # materialize (persist+count, ONE execution) per round instead of
    # checkpoint_state (count + eager localCheckpoint = the plan runs
    # twice): measured 26.8s vs 47.3s for the 32-cell/3-round chain at
    # sf0.1 with bit-identical assignments (r14, VERDICT r13 #5);
    # lineage depth stays bounded because rounds <= 3 everywhere and
    # each round reads the previous round's cached frame.
    for _ in range(rounds):
        cents = materialize(recompute(assign(cents)))
    # the stored pair is a session-shared view (read by every probe of
    # this configuration): pin both frames out of the scratch FIFO
    pair = (
        materialize(assign(cents), pinned=True),
        materialize(cents, pinned=True),
    )
    _KMEANS_PAIR_MEMO[key] = pair
    return pair


def _kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cid) after two deterministic Lloyd iterations (k=4,
    first-four seeding, exact-decimal distance folds) — shared by
    embedding_kmeans_lloyd and the k-means-cell IVF recall probe,
    memoized per session (a materialized view in cluster terms: the
    two Lloyd rounds run once, both consumers read the cached
    assignment table)."""
    return _kmeans_pair(spark, sf_dir, 4, 1, normalized=False)[0]


@query(
    "embedding_kmeans_lloyd",
    oracle="""
WITH dims AS (SELECT UNNEST(range(1, 65)) AS pos),
vecs AS (
  SELECT vec_id, embedding[d.pos] AS val, d.pos
  FROM embeddings CROSS JOIN dims d),
c0 AS (
  SELECT vec_id AS cid, val, pos FROM vecs WHERE vec_id < 4),
d1 AS (
  SELECT v.vec_id, c.cid,
         SUM(CAST(round((v.val - c.val) * (v.val - c.val), 9)
                  AS DECIMAL(28,9))) AS dist
  FROM vecs v JOIN c0 c USING (pos)
  GROUP BY v.vec_id, c.cid),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM d1) WHERE rk = 1),
c1 AS (
  SELECT a.cid, v.pos,
         round(CAST(SUM(CAST(round(v.val, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*), 6) AS val
  FROM vecs v JOIN a1 a USING (vec_id)
  GROUP BY a.cid, v.pos),
d2 AS (
  SELECT v.vec_id, c.cid,
         SUM(CAST(round((v.val - c.val) * (v.val - c.val), 9)
                  AS DECIMAL(28,9))) AS dist
  FROM vecs v JOIN c1 c USING (pos)
  GROUP BY v.vec_id, c.cid),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM d2) WHERE rk = 1)
SELECT cid AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(vec_id) AS BIGINT) AS representative
FROM a2 GROUP BY cid ORDER BY cluster_id
""",
)
def embedding_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means (k=4, two iterations, centroids
    seeded from the first four vectors): the iterative clustering
    primitive, engine-exact — squared-difference terms round at 9dp
    and accumulate as EXACT decimals, so the argmin assignment cannot
    flip on accumulation order; recomputed centroids are 6dp-rounded
    exact-decimal means. The oracle unrolls both Lloyd iterations as
    CTEs over dimension-exploded vectors.

    Scale: assignments are a broadcast join of k centroid vectors
    against the corpus with a k-row-per-vector argmin (map-side after
    the broadcast); centroid recomputation is one groupBy on
    (cluster, dim) with map-side partials. Production k-means on
    Spark is exactly this loop with float sums; the decimal policy
    here buys the cross-engine bit-exactness the oracle requires.
    """
    a2 = _kmeans_assignments(spark, sf_dir)
    return (
        a2.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("vec_id").cast("long").alias("representative"),
        )
        .orderBy("cluster_id")
    )


@query(
    "hybrid_rrf_retrieval",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(trim(lower(text)), ' ')) AS term
  FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(CAST(dl AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ('hash', 'join') GROUP BY doc_id, term),
idf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
bm AS (
  SELECT tf.doc_id,
         SUM(CAST(round(
           ln((s.n_docs - idf.df + 0.5) / (idf.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 6)
           AS DECIMAL(18,6))) AS bm25
  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id),
lex AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
  FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
cos AS (
  SELECT e.vec_id AS doc_id,
         {_DUCK_COS.format(a="e.embedding::DOUBLE[]", b="q.v")} AS cosine
  FROM embeddings e CROSS JOIN qv q WHERE e.vec_id <> 0),
sem AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r
  FROM cos ORDER BY cosine DESC, doc_id LIMIT 50),
fused AS (
  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         CAST(COALESCE(round(1.0 / (60 + l.r), 6), 0) AS DECIMAL(18,6))
           + CAST(COALESCE(round(1.0 / (60 + s.r), 6), 0) AS DECIMAL(18,6))
           AS rrf
  FROM lex l FULL OUTER JOIN sem s USING (doc_id))
SELECT doc_id, CAST(rrf AS DOUBLE) AS rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
""",
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: the BM25 lexical
    top-50 (query "hash join") fuses with the embedding-cosine
    semantic top-50 (query-by-example: vector 0) via
    RRF(k=60) = sum 1/(60 + rank) — the standard way production search
    merges lexical and vector lists without score calibration. Rank
    contributions round at 6dp and add as exact decimals; every rank
    is tie-broken by doc_id so both engines fuse identical lists.

    Scale: each branch is its own bounded top-k (TakeOrdered on the
    lexical side, broadcast query vector + top-k on the semantic
    side); fusion joins two 50-row lists — driver-trivial at any
    corpus size.
    """
    from pyspark.sql.types import DecimalType

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(18,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("term").isin("hash", "join"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    bm = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))),
                6,
            )
            .cast(DecimalType(18, 6))
            .alias("c"),
        )
        .groupBy("doc_id")
        .agg(F.sum("c").alias("bm25"))
    )
    lex = (
        bm.orderBy(F.desc("bm25"), "doc_id")
        .limit(50)
        .select("doc_id", F.row_number().over(Window.orderBy(F.desc("bm25"), "doc_id")).alias("r"))
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("se"),
    )
    qv = e.filter(F.col("vec_id") == 0).select(
        F.col("ev").alias("qv"), F.col("se").alias("sq")
    )
    cos = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            _cosine_prenorm("ev", "qv", "se", "sq").alias("cosine"),
        )
    )
    sem = (
        cos.orderBy(F.desc("cosine"), "doc_id")
        .limit(50)
        .select("doc_id", F.row_number().over(Window.orderBy(F.desc("cosine"), "doc_id")).alias("r"))
    )
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.round(F.lit(1.0) / (60 + r), 6), F.lit(0.0)
    ).cast(DecimalType(18, 6))
    fused = (
        lex.withColumnRenamed("r", "lr")
        .join(sem.withColumnRenamed("r", "sr"), "doc_id", "full_outer")
        .select(
            "doc_id",
            (contrib(F.col("lr")) + contrib(F.col("sr"))).cast("double").alias("rrf_score"),
        )
    )
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(10)


@query(
    "embedding_fisher_ratio",
    oracle="""
WITH flat AS (
  SELECT label, embedding[p.pos] AS val, p.pos - 1 AS dim
  FROM embeddings
  CROSS JOIN (SELECT UNNEST(range(1, 65)) AS pos) p),
per_class AS (
  SELECT dim, label,
         COUNT(*) AS n,
         SUM(CAST(round(val, 6) AS DECIMAL(18,6))) AS s_dec,
         SUM(CAST(round(val * val, 9) AS DECIMAL(28,9))) AS s2_dec
  FROM flat GROUP BY dim, label),
pc AS (
  SELECT dim, label, n,
         CAST(s_dec AS DOUBLE) AS s, CAST(s2_dec AS DOUBLE) AS s2
  FROM per_class),
gstats AS (
  SELECT dim,
         CAST(SUM(CAST(n AS HUGEINT)) AS DOUBLE) AS gn,
         CAST(SUM(s_dec) AS DOUBLE) AS gs
  FROM per_class GROUP BY dim),
parts AS (
  SELECT p.dim,
         SUM(CAST(round(p.n * (p.s / p.n - g.gs / g.gn)
                        * (p.s / p.n - g.gs / g.gn), 9)
                  AS DECIMAL(28,9))) AS between_c,
         SUM(CAST(round(p.s2 - p.s * p.s / p.n, 9)
                  AS DECIMAL(28,9))) AS within_c
  FROM pc p JOIN gstats g USING (dim)
  GROUP BY p.dim)
SELECT dim,
       round(CAST(between_c AS DOUBLE) / CAST(within_c AS DOUBLE), 6)
         AS fisher_ratio
FROM parts
ORDER BY fisher_ratio DESC, dim
LIMIT 10
""",
)
def embedding_fisher_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension Fisher discriminant ratio (between-class scatter
    over within-class scatter, across the label groups): the classic
    filter-style feature selector — the top-10 dimensions best
    separating the classes. Per-class moments accumulate as exact
    decimals; each ratio combines a handful of per-class doubles in a
    fixed expression (classes sum in label order via the grouped sum
    over a tiny |labels| set — deterministic at this cardinality on
    both engines).

    Scale: one (dim, label) moments rollup over the exploded matrix
    (map-side partials); everything after is |dims| x |labels| rows.
    """
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    )
    per_class = flat.groupBy("dim", "label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("val"), 6).cast("decimal(18,6)")).alias("s_dec"),
        F.sum(F.round(F.col("val") * F.col("val"), 9).cast("decimal(28,9)")).alias(
            "s2_dec"
        ),
    )
    # class AND global sums stay exact decimals; doubles appear only
    # inside each fixed per-class term expression
    glob = per_class.groupBy("dim").agg(
        F.sum("n").cast("double").alias("gn"),
        F.sum("s_dec").cast("double").alias("gs"),
    )
    per_class = per_class.select(
        "dim",
        "label",
        "n",
        F.col("s_dec").cast("double").alias("s"),
        F.col("s2_dec").cast("double").alias("s2"),
    )
    mean_diff = F.col("s") / F.col("n") - F.col("gs") / F.col("gn")
    parts = (
        per_class.join(glob, "dim")
        .groupBy("dim")
        .agg(
            # per-class terms round at 9dp then sum as exact decimals:
            # a plain double SUM over the label set is the same
            # accumulation-order risk class the sf0.1 sweep exposed in
            # the LM-surprisal means
            F.sum(
                F.round(F.col("n") * mean_diff * mean_diff, 9).cast("decimal(28,9)")
            ).alias("between_c"),
            F.sum(
                F.round(
                    F.col("s2") - F.col("s") * F.col("s") / F.col("n"), 9
                ).cast("decimal(28,9)")
            ).alias("within_c"),
        )
    )
    return (
        parts.select(
            "dim",
            F.round(
                F.col("between_c").cast("double") / F.col("within_c").cast("double"),
                6,
            ).alias("fisher_ratio"),
        )
        .orderBy(F.desc("fisher_ratio"), "dim")
        .limit(10)
    )


@query(
    "embedding_triplet_mining",
    oracle=f"""
WITH anchors AS (
  SELECT vec_id AS a_id, embedding::DOUBLE[] AS av, label AS a_label
  FROM embeddings WHERE vec_id % 199 = 0),
others AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev, label FROM embeddings),
scored AS (
  SELECT a.a_id, a.a_label, o.vec_id, o.label,
         {_DUCK_COS.format(a="a.av", b="o.ev")} AS cosine
  FROM anchors a JOIN others o ON a.a_id <> o.vec_id),
pos AS (
  SELECT a_id, vec_id AS pos_id, cosine AS pos_cos
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id
                                     ORDER BY cosine DESC, vec_id) AS rk
        FROM scored WHERE label = a_label)
  WHERE rk = 1),
neg AS (
  SELECT s.a_id, s.vec_id AS neg_id, s.cosine AS neg_cos
  FROM (SELECT s.*, ROW_NUMBER() OVER (PARTITION BY s.a_id
                                       ORDER BY s.cosine DESC, s.vec_id) AS rk
        FROM scored s JOIN pos p ON s.a_id = p.a_id
        WHERE s.label <> s.a_label AND s.cosine > p.pos_cos) s
  WHERE rk = 1)
SELECT p.a_id AS anchor, p.pos_id, p.pos_cos,
       n.neg_id AS hard_neg_id, n.neg_cos AS hard_neg_cos
FROM pos p LEFT JOIN neg n USING (a_id)
ORDER BY anchor
""",
)
def embedding_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative triplet mining for contrastive training: per
    anchor, the most-similar SAME-label vector (positive) and the
    most-similar OTHER-label vector that scores above it (the hard
    negative — null when no negative violates the margin). Cosines
    round at 6dp with vec_id tie-breaks, so triplet selection is
    engine-exact.

    Scale: anchors broadcast against the corpus (the query-set
    pattern); both argmaxes are ranked windows per anchor. At 100 TB
    the corpus side routes through the registry's IVF cells first —
    same triplet logic over candidate sets instead of the full scan.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        "label",
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("se"),
    )
    anchors = e.filter(F.col("vec_id") % 199 == 0).select(
        F.col("vec_id").alias("a_id"),
        F.col("ev").alias("av"),
        F.col("label").alias("a_label"),
        F.col("se").alias("sa"),
    )
    # r15: materialized — scored feeds both the positive and negative
    # argmax; without the barrier the anchor-corpus cosine fan-out
    # (the expensive higher-order array expression) evaluated twice
    from grapho_spark.sparkutil import materialize as _mat

    scored = _mat(
        F.broadcast(anchors)
        .crossJoin(e)
        .filter(F.col("a_id") != F.col("vec_id"))
        .select(
            "a_id",
            "a_label",
            "vec_id",
            "label",
            _cosine_prenorm("av", "ev", "sa", "se").alias("cosine"),
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cosine"), "vec_id")
    pos = (
        scored.filter(F.col("label") == F.col("a_label"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("a_id", F.col("vec_id").alias("pos_id"), F.col("cosine").alias("pos_cos"))
    )
    neg = (
        scored.filter(F.col("label") != F.col("a_label"))
        .join(F.broadcast(pos.select("a_id", "pos_cos")), "a_id")
        .filter(F.col("cosine") > F.col("pos_cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("a_id", F.col("vec_id").alias("neg_id"), F.col("cosine").alias("neg_cos"))
    )
    return (
        pos.join(neg, "a_id", "left")
        .select(
            F.col("a_id").alias("anchor"),
            "pos_id",
            "pos_cos",
            F.col("neg_id").alias("hard_neg_id"),
            F.col("neg_cos").alias("hard_neg_cos"),
        )
        .orderBy("anchor")
    )



# --------------------------------------------------------------------------
# The persisted ANN index, v2 (r8): k-means cells over L2-NORMALIZED
# vectors + a TRAINED PQ codebook, probed with multi-probe routing and
# an exact-cosine re-rank of the ADC shortlist.
#
# The r7 index routed by the synthetic `label` column — the exact
# configuration its own recall dial measured at ~0 recall@3 (labels are
# not cosine neighborhoods, and ADC ranked un-normalized L2 against a
# cosine ground truth). v2 composes the three remedies that dial named,
# each individually measured: normalize (L2 ordering == cosine ordering
# on unit vectors), train cells on vector geometry (k-means), probe
# more than one cell, and re-rank the survivors exactly. Measured
# recall@3 at sf0.1 moves ~0 -> 0.79 (embedding_ivfpq_recall).
#
# r9 retune (32 cells / 16 probes / 400 shortlist): the r8 dial's
# remaining loss decomposed as ROUTING, not quantization — measured at
# sf0.1: PQ_K 16->32 recall flat 0.794 (codewords not binding);
# nprobe 4->5 at shortlist 200 DROPPED recall to 0.762 (crowding);
# the nprobe=4 routing CEILING (exhaustive shortlist) is 0.825. Finer
# cells at the SAME 50% scan fraction fix it: 32 cells with 16 probed
# reach 0.968 (vs 0.857 for 16/8, 0.794 shipped 8/4) because each
# routing decision moves 1/32 of the corpus instead of 1/8. Probe wall
# 1.88s -> 2.79s (1.48x, inside the gate) at UNCHANGED ADC scan
# fraction; build 41s -> 88s (the corpus x cells assignment table —
# the amortized ingest side). This is the standard IVF sizing rule
# (cells grow ~sqrt(N), probe a fixed fraction), which the 8-cell
# index was too coarse to express at this corpus size.
# --------------------------------------------------------------------------

_ANN_CELLS = 32  # coarse k-means cells in the persisted index
_ANN_ROUNDS = 3  # Lloyd recompute rounds for the coarse cells
_ANN_NPROBE = 16  # cells probed per query (of _ANN_CELLS, 50% scan)
_ANN_SHORTLIST = 400  # ADC candidates re-ranked by exact cosine
_ANN_PQ_K = 16  # codewords per subspace (vs 4 in the exhaustive demo)
_ANN_PQ_TRAIN = 2  # Lloyd rounds for the PQ codebook

_DUCK_NORM_CTE = """ai_norm AS (
  SELECT vec_id, i AS pos,
         round(CAST(embedding[i] AS DOUBLE)
               / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
           AS val
  FROM embeddings, range(1, 65) t(i))"""


def _duck_kmeans_chain(prefix: str, src: str, k: int, rounds: int) -> str:
    """CTE chain for the parameterized Lloyd k-means of _kmeans_pair:
    seed from the first k vectors, ``rounds`` recompute rounds, final
    assignment against the last centroids. Emits ``{prefix}c{rounds}``
    (final centroids), ``{prefix}df`` (final per-(vec,cid) distances)
    and ``{prefix}assign`` (final assignment)."""
    parts = [
        f"""{prefix}c0 AS (
  SELECT vec_id AS cid, pos, val AS cval FROM {src} WHERE vec_id < {k})"""
    ]
    dist = """{out} AS (
  SELECT v.vec_id, c.cid,
         SUM(CAST(round((v.val - c.cval) * (v.val - c.cval), 9)
                  AS DECIMAL(28,9))) AS dist
  FROM {src} v JOIN {cents} c USING (pos)
  GROUP BY v.vec_id, c.cid)"""
    argmin = """{out} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM {dists}) WHERE rk = 1)"""
    for r in range(1, rounds + 1):
        parts.append(dist.format(out=f"{prefix}d{r}", src=src, cents=f"{prefix}c{r-1}"))
        parts.append(argmin.format(out=f"{prefix}a{r}", dists=f"{prefix}d{r}"))
        parts.append(
            f"""{prefix}c{r} AS (
  SELECT a.cid, v.pos,
         round(CAST(SUM(CAST(round(v.val, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*), 6) AS cval
  FROM {src} v JOIN {prefix}a{r} a USING (vec_id)
  GROUP BY a.cid, v.pos)"""
        )
    parts.append(dist.format(out=f"{prefix}df", src=src, cents=f"{prefix}c{rounds}"))
    parts.append(argmin.format(out=f"{prefix}assign", dists=f"{prefix}df"))
    return ",\n".join(parts)


def _duck_pq_trained_ctes(lut_pred: str = "vec_id % 97 = 0") -> str:
    """CTE chain for the index's TRAINED product-quantizer: codebook
    seeded from the deterministic ``vec_id % K`` partition means (the
    embedding_pq_adc_knn protocol) then refined by _ANN_PQ_TRAIN Lloyd
    rounds per subspace, all over the normalized components. Emits
    ``p16_cw{T}`` (final codebook), ``p16_codes`` and ``p16_lut``
    (per-query code distances for the % 97 sample)."""
    K, T = _ANN_PQ_K, _ANN_PQ_TRAIN
    parts = [
        """p16_expl AS (
  SELECT vec_id, pos, (pos - 1) // 8 AS sub, CAST(val AS DECIMAL(12,6)) AS dv
  FROM ai_norm)""",
        f"""p16_cw0 AS (
  SELECT vec_id % {K} AS grp, sub, pos,
         {_MICRO_MEAN_CW_DUCK} AS cw
  FROM p16_expl GROUP BY vec_id % {K}, sub, pos)""",
    ]
    dist = """{out} AS (
  SELECT e.vec_id, e.sub, c.grp,
         CAST(SUM((e.dv - c.cw) * (e.dv - c.cw)) AS DECIMAL(38,12)) AS dist
  FROM p16_expl e JOIN {cw} c ON e.sub = c.sub AND e.pos = c.pos
  GROUP BY e.vec_id, e.sub, c.grp)"""
    for t in range(1, T + 1):
        parts.append(dist.format(out=f"p16_d{t}", cw=f"p16_cw{t-1}"))
        parts.append(
            f"""p16_a{t} AS (
  SELECT vec_id, sub, grp FROM (
    SELECT vec_id, sub, grp,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, grp) AS rn
    FROM p16_d{t}) WHERE rn = 1)""",
        )
        parts.append(
            f"""p16_cw{t} AS (
  SELECT a.grp, e.sub, e.pos,
         {_MICRO_MEAN_CW_TEMPLATE.format(div='//', col='e.dv')} AS cw
  FROM p16_expl e JOIN p16_a{t} a ON a.vec_id = e.vec_id AND a.sub = e.sub
  GROUP BY a.grp, e.sub, e.pos)"""
        )
    parts.append(dist.format(out="p16_df", cw=f"p16_cw{T}"))
    parts.append(
        """p16_codes AS (
  SELECT vec_id, sub, grp AS code FROM (
    SELECT vec_id, sub, grp,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, grp) AS rn
    FROM p16_df) WHERE rn = 1)"""
    )
    parts.append(
        f"""p16_lut AS (
  SELECT vec_id AS q_id, sub, grp, dist FROM p16_df WHERE {lut_pred})"""
    )
    return ",\n".join(parts)


def _duck_ann_index_ctes(lut_pred: str = "vec_id % 97 = 0") -> str:
    return (
        _DUCK_NORM_CTE
        + ",\n"
        + _duck_kmeans_chain("ai_", "ai_norm", _ANN_CELLS, _ANN_ROUNDS)
        + ",\n"
        + _duck_pq_trained_ctes(lut_pred)
    )


_DUCK_ANN_INDEX_CTES = _duck_ann_index_ctes()

def _duck_ann_probe_ctes(q_pred: str = "v.vec_id % 97 = 0") -> str:
    return f"""ai_qd AS (
  SELECT v.vec_id AS q_id, c.cid,
         SUM(CAST(round((v.val - c.cval) * (v.val - c.cval), 9)
                  AS DECIMAL(28,9))) AS dist
  FROM ai_norm v JOIN ai_c{_ANN_ROUNDS} c USING (pos)
  WHERE {q_pred}
  GROUP BY v.vec_id, c.cid),
ai_route AS (
  SELECT q_id, cid FROM (
    SELECT q_id, cid,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, cid) AS rk
    FROM ai_qd) WHERE rk <= {_ANN_NPROBE}),
ai_adc AS (
  SELECT l.q_id, c.vec_id, CAST(SUM(l.dist) AS DOUBLE) AS adc_dist
  FROM p16_codes c
  JOIN ai_assign a ON a.vec_id = c.vec_id
  JOIN ai_route r ON r.cid = a.cid
  JOIN p16_lut l ON l.q_id = r.q_id AND l.sub = c.sub AND l.grp = c.code
  WHERE c.vec_id <> l.q_id
  GROUP BY l.q_id, c.vec_id),
ai_short AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rn
    FROM ai_adc) WHERE rn <= {_ANN_SHORTLIST}),
ai_rerank AS (
  SELECT s.q_id, s.vec_id,
         {_DUCK_COS.format(a="q.embedding::DOUBLE[]", b="e.embedding::DOUBLE[]")}
           AS cosine
  FROM ai_short s
  JOIN embeddings q ON q.vec_id = s.q_id
  JOIN embeddings e ON e.vec_id = s.vec_id),
ai_top AS (
  SELECT q_id, vec_id, cosine FROM (
    SELECT q_id, vec_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
    FROM ai_rerank) WHERE rn <= 3)"""


_DUCK_ANN_PROBE_CTES = _duck_ann_probe_ctes()


def _pq_expl(spark: SparkSession, sf_dir: str, pred: str | None = None) -> DataFrame:
    """(vec_id, pos, sub, dv decimal(12,6)) — normalized components in
    PQ subspace layout, the input to codebook training and encoding."""
    return _normalized_vec_expl(spark, sf_dir, pred).select(
        "vec_id",
        "pos",
        F.floor((F.col("pos") - 1) / _PQ_M).cast("int").alias("sub"),
        F.col("val").cast("decimal(12,6)").alias("dv"),
    )


def _pq_varr(
    spark: SparkSession, sf_dir: str, pred: str | None = None
) -> DataFrame:
    """(vec_id, sub, dvm array<bigint>) — per-(vector, subspace)
    micro-unit component arrays (``dvm[i]`` = CAST(dv*1e6 AS BIGINT) of
    pos = sub*_PQ_M + i + 1), memoized per (session, sf_dir, pred).

    r16: the ONE fan-in table the codebook training rounds AND the
    code assignment fold against broadcast codeword arrays — replacing
    the (vec,pos)x(code,pos) exploded joins (n*64*K rows per pass)
    with map-side integer HOFs, the same shape as _kmeans_pair's r15b
    Lloyd assignment (guide §2.4/§2.2). Explicit AQE-exempt partition
    count, sized so each task folds ~4096 subspace rows (the per-row
    fold is K*_PQ_M integer ops — an 8x narrower row than the Lloyd
    varr, hence the 8x larger rows-per-task target) and capped at
    cluster parallelism."""
    from grapho_spark.sparkutil import memo_table

    def build() -> DataFrame:
        e = load_table(spark, sf_dir, "embeddings")
        if pred is not None:
            e = e.filter(pred)
        n_vecs = e.count()  # metadata-cheap columnar count
        par = max(
            1,
            min(spark.sparkContext.defaultParallelism, n_vecs * _PQ_M // 4096 + 1),
        )
        return (
            _pq_expl(spark, sf_dir, pred)
            .groupBy("vec_id", "sub")
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                "pos",
                                (F.col("dv") * 1000000)
                                .cast("long")
                                .alias("dvm"),
                            )
                        )
                    ),
                    lambda s: s.getField("dvm"),
                ).alias("dvm")
            )
            .repartition(par, "vec_id")
        )

    return memo_table(spark, f"pq_varr:{sf_dir}:{pred}", build)


def _pq_assign_hof(varr: DataFrame, book: DataFrame) -> DataFrame:
    """(vec_id, sub, dvm, grp) — nearest codeword per (vector,
    subspace) as a per-row integer array fold against broadcast
    per-subspace codeword arrays.

    Bit-identity vs the exploded join it replaces:
    ``aggregate(zip_with(dvm, cwm, (x,y)->(x-y)*(x-y)), 0L, +)`` is the
    same exact femto-unit SUM((dvl-cwl)^2) per (vec_id, sub, grp)
    (BIGINT addition is order-free), and
    ``element_at(array_sort(struct(d, grp)), 1)`` is the
    row_number-over-(dist, grp) argmin with the identical tie-break."""
    barr = (
        book.groupBy("sub", "grp")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "pos",
                            (F.col("cw") * 1000000).cast("long").alias("cwm"),
                        )
                    )
                ),
                lambda s: s.getField("cwm"),
            ).alias("cwm")
        )
        .groupBy("sub")
        .agg(F.sort_array(F.collect_list(F.struct("grp", "cwm"))).alias("cbs"))
    )
    return varr.join(F.broadcast(barr), "sub").select(
        "vec_id",
        "sub",
        "dvm",
        F.expr(
            """element_at(array_sort(transform(cbs, c -> struct(
                 aggregate(zip_with(dvm, c.cwm, (x, y) -> (x - y) * (x - y)),
                           CAST(0 AS BIGINT), (a, t) -> a + t) AS d,
                 c.grp AS grp))), 1).grp"""
        ).alias("grp"),
    )


def _pq_encode(
    spark: SparkSession, sf_dir: str, book: DataFrame, pred: str | None = None
) -> DataFrame:
    """(vec_id, sub, code) — nearest-codeword assignment of the
    (optionally pred-restricted) corpus against a FROZEN codebook:
    shared by the full index build and the delta-ingest append (which
    must encode new vectors with the stored codebook, never retrain).

    r16: per-(vector, subspace) HOF fold against the broadcast codebook
    (see _pq_assign_hof) instead of the r15 exploded
    (vec,pos)x(code,pos) join + window — the femto-unit distances and
    the (dist, grp) argmin tie-break are bit-identical."""
    return _pq_assign_hof(_pq_varr(spark, sf_dir, pred), book).select(
        "vec_id", "sub", F.col("grp").alias("code")
    )


def _assign_to_cents(
    spark: SparkSession, sf_dir: str, cents: DataFrame, pred: str | None = None
) -> DataFrame:
    """(vec_id, cid) — argmin exact-decimal distance of the
    (pred-restricted) normalized corpus against FROZEN centroids (the
    delta-ingest cell assignment; same formula as _kmeans_pair's
    final assignment, so base-build and append agree)."""
    # r15: BIGINT nano-unit fold, same as _kmeans_pair's normalized
    # assign (the two must stay formula-identical so base-build and
    # append agree)
    d = (
        _normalized_vec_expl(spark, sf_dir, pred)
        .join(F.broadcast(cents), "pos")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(_sq_nano9_long(F.col("val"), F.col("cval"))).alias("dist")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid")
    )


def _pq16_codebook(
    spark: SparkSession, sf_dir: str, pred: str | None = None
) -> DataFrame:
    """(sub, pos, grp, cw) — the trained codebook (Spark twin of
    _duck_pq_trained_ctes's cw chain), memoized per (session, sf_dir,
    pred): concurrent index prebuilds over the same corpus (the
    scaled-sizing dial's mult-1/mult-4 identities) train ONE codebook
    instead of racing two identical chains."""
    from grapho_spark.sparkutil import memo_table

    return memo_table(
        spark,
        f"pq16_codebook:{sf_dir}:{pred}",
        lambda: _pq16_codebook_impl(spark, sf_dir, pred),
    )


def _pq16_codebook_impl(
    spark: SparkSession, sf_dir: str, pred: str | None = None
) -> DataFrame:
    from grapho_spark.sparkutil import materialize

    # Codeword means round to 6dp in EXACT INTEGER MICRO-UNITS with an
    # explicit half-up division: a mean of 6dp decimals can land
    # exactly on a 7th-digit tie (observed: 1.811278/28 = 0.0646885),
    # where double->decimal casts and double round() disagree across
    # engines (Java BigDecimal rounds the shortest decimal repr, C
    # libraries round the binary value). Integer arithmetic has no
    # such boundary — both engines compute the identical codeword.
    #
    # r16: the whole training chain folds over the per-(vector,
    # subspace) micro-unit array table (_pq_varr) — assignment is the
    # broadcast HOF of _pq_assign_hof, and the recompute posexplodes
    # the assigned arrays back to (grp, sub, pos) rows instead of
    # re-joining the exploded corpus on (vec_id, sub). dvm[i] IS
    # CAST(dv*1e6 AS BIGINT) of pos = sub*_PQ_M+i+1, so SUM(dvm) and
    # COUNT(*) per (grp, sub, pos) — and therefore every codeword —
    # are bit-identical to the r15 join chain.
    varr = _pq_varr(spark, sf_dir, pred)
    mean_dvm = _MICRO_MEAN_CW_SPARK.replace("CAST(dv * 1000000 AS BIGINT)", "dvm")

    def recompute(assigned: DataFrame) -> DataFrame:
        return (
            assigned.select("grp", "sub", F.posexplode("dvm").alias("p0", "dvm"))
            .groupBy(
                "grp",
                "sub",
                (F.col("sub") * _PQ_M + F.col("p0") + 1).alias("pos"),
            )
            .agg(F.expr(mean_dvm).alias("cw"))
        )

    cw = recompute(
        varr.select((F.col("vec_id") % _ANN_PQ_K).alias("grp"), "sub", "dvm")
    )
    for _ in range(_ANN_PQ_TRAIN):
        # materialize, not checkpoint_state: same one-execution win as
        # _kmeans_pair's rounds (trains <= _ANN_PQ_TRAIN = 2 rounds)
        cw = materialize(recompute(_pq_assign_hof(varr, cw)))
    return cw


def _prebuild_parallel(thunks: list) -> None:
    """Run independent index-build thunks on driver threads — Spark
    schedules their jobs concurrently, overlapping the per-job
    latencies (scheduling, checkpoint barriers) that dominate these
    small-data builds. VERDICT r13 #5 measured the bench quality-dial
    phase at ~334s, ~all of it four sequential scaled-sizing builds;
    build CONTENT is unchanged — thunks write distinct table
    identities and the shared derived-table memos are build-once
    (sparkutil.memo_table)."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) <= 1:
        for t in thunks:
            t()
        return
    with ThreadPoolExecutor(max_workers=min(4, len(thunks))) as ex:
        for f in [ex.submit(t) for t in thunks]:
            f.result()


def _ann_index_tag(
    sf_dir: str, pred: str | None = None, ident: str | None = None
) -> str:
    """THE tag for the persisted index tables of (sf_dir, pred) — the
    single source of truth shared by ann_index_tables, the delta-
    ingest append and the probe-side build timer. Duplicated formulas
    diverged once (append with pred=None hashed the string 'None' and
    silently created an orphan codes table), hence the helper.
    ``ident`` names an ALTERNATE index identity over the same corpus
    (e.g. the scaled-sizing dial's fine-routing variant) — without it
    a second build with different cells would silently return the
    first identity's tables (the marker check is per-tag)."""
    import hashlib
    import os

    key = sf_dir if pred is None else f"{sf_dir}|{pred}"
    if ident is not None:
        key = f"{key}|{ident}"
    return f"{hashlib.md5(key.encode()).hexdigest()[:10]}_pid{os.getpid()}"


def ann_index_tables(
    spark: SparkSession,
    sf_dir: str,
    pred: str | None = None,
    cells: int | None = None,
    ident: str | None = None,
):
    """The STANDING ANN index (build-once/probe-many, the ANN twin of
    dedup's corpus_band_index), v2: PQ codes of the L2-NORMALIZED
    vectors persisted as a parquet table bucketed by K-MEANS cell
    (_ANN_CELLS cells, _ANN_ROUNDS Lloyd rounds — trained on vector
    geometry, not the synthetic labels the r7 dial measured at ~0
    recall), plus the (tiny) cell-centroid and trained-codebook
    tables. Built once per (process, sf_dir); every probe reads the
    stored codes — no per-query PQ training, no signature recompute.
    In production these are metastore tables maintained by the
    embedding-ingest pipeline. Paths are pid-scoped for the same
    reason as the LSH index (the memoizing session catalog is
    per-process; a shared path is a concurrent-overwrite hazard).

    Crash-safe publish (r8): the three tables are only trusted when
    the build marker written AFTER all of them is present; a build
    that died mid-write leaves no marker, so the next call drops the
    half-registered tables and rebuilds instead of probing garbage.

    ``pred`` restricts the indexed corpus (its own tag/tables; used by
    the delta-ingest path, whose appends then target that index).
    ``cells`` overrides _ANN_CELLS (used by rebuild_ann_index when the
    corpus has outgrown the frozen routing granularity — the r9 retune
    measured that cells must grow with the corpus to hold recall at a
    fixed scan fraction). The marker records the built corpus size and
    cell count so ann_index_health can detect the outgrowth.
    ``ident`` builds a SEPARATE index identity over the same corpus
    (used by the scaled-sizing dial's fine-routing variant; the
    append/health/rebuild lifecycle only manages ident=None
    identities)."""
    import json
    import os

    tag = _ann_index_tag(sf_dir, pred, ident)
    cent_t = f"ann_centroids_{tag}"
    book_t = f"ann_codebook_{tag}"
    codes_t = f"ann_pq_codes_{tag}"
    base = scratch_path("grapho_spark_index")
    marker = os.path.join(base, f"_BUILD_OK_{tag}")
    complete = os.path.exists(marker) and all(
        spark.catalog.tableExists(t) for t in (cent_t, book_t, codes_t)
    )
    if not complete:
        n_cells = cells or _ANN_CELLS
        for t in (cent_t, book_t, codes_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        if os.path.exists(marker):
            os.unlink(marker)
        # the Lloyd chain and the PQ codebook training are independent
        # until the codes encoding — overlap them (VERDICT r13 #5)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as ex:
            f_km = ex.submit(
                _kmeans_pair, spark, sf_dir, n_cells, _ANN_ROUNDS, True, pred
            )
            f_bk = ex.submit(_pq16_codebook, spark, sf_dir, pred)
            assign, cents = f_km.result()
            book = f_bk.result()
        codes = (
            _pq_encode(spark, sf_dir, book, pred)
            .join(assign, "vec_id")
            .select(F.col("cid").alias("cell"), "vec_id", "sub", "code")
        )
        cents.write.option("path", os.path.join(base, cent_t)).mode(
            "overwrite"
        ).saveAsTable(cent_t)
        book.write.option("path", os.path.join(base, book_t)).mode(
            "overwrite"
        ).saveAsTable(book_t)
        (
            codes.write.bucketBy(8, "cell")
            .sortBy("cell", "vec_id")
            .option("path", os.path.join(base, codes_t))
            .mode("overwrite")
            .saveAsTable(codes_t)
        )
        os.makedirs(base, exist_ok=True)
        built_rows = assign.count()  # indexed vectors at build time
        with open(marker, "w") as fh:
            json.dump(
                {
                    "tables": [cent_t, book_t, codes_t],
                    "built_rows": built_rows,
                    "cells": n_cells,
                },
                fh,
            )
    return spark.table(cent_t), spark.table(book_t), spark.table(codes_t)


def append_to_ann_index(
    spark: SparkSession,
    sf_dir: str,
    batch_pred: str,
    base_pred: str,
    auto_rebuild_pred: str | None = None,
) -> dict:
    """Delta-ingest for the persisted ANN index (the ANN twin of
    dedup's append_to_band_index): normalize the new batch, assign
    each vector to its nearest STORED centroid, encode it with the
    STORED trained codebook, and append the code rows to the codes
    table in the SAME bucket layout (Spark verifies the bucket spec).
    Centroids and codebook are FROZEN — the production invariant that
    keeps every historical code comparable; periodic compaction
    (a full rebuild) re-trains them when drift accumulates.

    The outgrowth verdict is surfaced IN-BAND (VERDICT r10 task #2):
    every append runs ``ann_index_health`` on its way out and returns
    ``{"codes_table", "health", "rebuilt", "rebuilt_tables"}`` — an
    ingest pipeline that only ever calls this function still sees
    ``health["rebuild"]`` flip the moment the index outgrows its
    routing granularity, instead of silently degrading forever. Pass
    ``auto_rebuild_pred`` (a predicate covering the UNION of the built
    corpus and every appended batch — the rebuild re-trains from the
    base tables, so it must see all of them) to run the compacting
    rebuild in-band at the health-recommended cell count when flagged;
    the returned health is then the post-rebuild (cleared) verdict for
    the NEW index identity. When the rebuild fires with a DIFFERENT
    pred, the outgrown old identity is RETIRED (tables + marker
    dropped, names returned in ``retired_tables``) — after
    ``rebuilt=True`` the caller must switch ``base_pred`` to
    ``auto_rebuild_pred`` for future appends/probes (ADVICE r11: a
    caller that kept the old pred would append into a stale codes
    table and re-trigger a full rebuild every time; now it fails fast
    on the missing table instead).

    Scale: the batch-sized delta is the only thing computed or
    written — no rebuild, no re-encode of the standing corpus (the
    health check is one metadata-cheap count on the codes table); the
    append is one bucketed write, so probes keep their bucketed scan.
    The auto-rebuild, when it fires, is the same scheduled compaction
    cost the LSM-shaped design always owed — just triggered by the
    ingest that crossed the threshold instead of a cron job.

    Concurrency caveat (ADVICE r12): the in-band retire DROPS the old
    identity's tables mid-call. Index tags are pid-scoped, so the
    reachable hazard is same-process concurrency — a thread still
    holding lazy plans over the old tables when a rebuild fires fails
    mid-query during the retire window. Serialize appends with probes
    of the SAME identity (the ingest-pipeline contract this models
    does exactly that); cross-process readers are unaffected by
    construction."""
    cents, book, _ = ann_index_tables(spark, sf_dir, base_pred)
    codes_t = f"ann_pq_codes_{_ann_index_tag(sf_dir, base_pred)}"
    delta = (
        _pq_encode(spark, sf_dir, book, batch_pred)
        .join(_assign_to_cents(spark, sf_dir, cents, batch_pred), "vec_id")
        .select(F.col("cid").alias("cell"), "vec_id", "sub", "code")
    )
    (
        delta.write.bucketBy(8, "cell")
        .sortBy("cell", "vec_id")
        .mode("append")
        .saveAsTable(codes_t)
    )
    health = ann_index_health(spark, sf_dir, base_pred)
    rebuilt = False
    rebuilt_tables = None
    retired = None
    if auto_rebuild_pred is not None and health.get("rebuild"):
        rebuilt_tables = rebuild_ann_index(
            spark,
            sf_dir,
            auto_rebuild_pred,
            cells=health.get("recommended_cells"),
        )
        rebuilt = True
        health = ann_index_health(spark, sf_dir, auto_rebuild_pred)
        if auto_rebuild_pred != base_pred:
            # ADVICE r11: the rebuild creates a NEW index identity
            # (tagged by auto_rebuild_pred); the outgrown old identity
            # would otherwise keep its tables + rebuild=True health,
            # and a caller that kept appending with the same base_pred
            # would write deltas into the stale codes table and
            # re-trigger a full O(corpus) rebuild on EVERY append.
            # Retire it: drop its tables and marker so further use of
            # the old identity fails fast instead of degrading — after
            # rebuilt=True, callers MUST switch base_pred to the
            # returned identity's pred (auto_rebuild_pred).
            import os

            old_tag = _ann_index_tag(sf_dir, base_pred)
            retired = [
                f"ann_centroids_{old_tag}",
                f"ann_codebook_{old_tag}",
                f"ann_pq_codes_{old_tag}",
            ]
            for t in retired:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            old_marker = os.path.join(
                scratch_path("grapho_spark_index"), f"_BUILD_OK_{old_tag}"
            )
            if os.path.exists(old_marker):
                os.unlink(old_marker)
    return {
        "codes_table": codes_t,
        "health": health,
        "rebuilt": rebuilt,
        "rebuilt_tables": rebuilt_tables,
        "retired_tables": retired,
    }


# Appended rows beyond this multiple of the BUILT corpus flag the index
# for a compacting rebuild: the r9 retune measured that cells must grow
# with the corpus to hold recall at a fixed scan fraction (8 cells at
# 1x -> 32 at 10x kept recall@3 >= 0.95), so an index serving 2x its
# built size is running at half its designed routing granularity.
_ANN_REBUILD_FACTOR = 2.0


def ann_index_health(
    spark: SparkSession, sf_dir: str, pred: str | None = None
) -> dict:
    """Outgrowth check for the persisted ANN index of (sf_dir, pred):
    compares the CURRENT indexed-vector count (codes table, sub 0 —
    one row per vector) against the corpus size recorded in the build
    marker. ``rebuild=True`` once growth crosses _ANN_REBUILD_FACTOR,
    with ``recommended_cells`` scaled ~ sqrt(growth) (rounded to a
    power of two) so the per-cell candidate count — the probe-cost
    unit — returns to its designed size. In production this runs after
    each ingest batch and gates the periodic compaction job; here the
    delta-ingest tests drive it (VERDICT r9 task #5).

    The frozen-parameter append path stays valid below the threshold
    (every historical code remains comparable); the rebuild is the
    designed response above it, not a correctness fix."""
    import json
    import math
    import os

    tag = _ann_index_tag(sf_dir, pred)
    marker = os.path.join(
        scratch_path("grapho_spark_index"), f"_BUILD_OK_{tag}"
    )
    codes_t = f"ann_pq_codes_{tag}"
    try:
        with open(marker, encoding="utf-8") as fh:
            meta = json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        # no index, or a pre-r10 marker without sizing metadata: no
        # signal either way — callers rebuild on their own cadence
        return {"built": False, "rebuild": False}
    built = int(meta.get("built_rows") or 0)
    cells = int(meta.get("cells") or _ANN_CELLS)
    current = spark.table(codes_t).filter(F.col("sub") == 0).count()
    growth = (current / built) if built else float("inf")
    rebuild = growth >= _ANN_REBUILD_FACTOR
    recommended = cells
    if rebuild and math.isfinite(growth):
        recommended = 2 ** max(
            int(math.log2(cells)),
            round(math.log2(cells * math.sqrt(growth))),
        )
    # built_rows == 0 (the build pred matched nothing): growth is
    # infinite — flag the rebuild but keep the current cell count;
    # sqrt(inf) has no usable sizing signal (ADVICE r10).
    return {
        "built": True,
        "built_rows": built,
        "current_rows": current,
        "growth": growth,
        "cells": cells,
        "rebuild": rebuild,
        "recommended_cells": recommended,
    }


def rebuild_ann_index(
    spark: SparkSession,
    sf_dir: str,
    pred: str | None = None,
    cells: int | None = None,
):
    """Compacting rebuild of the (sf_dir, pred) index: drop the
    published tables + marker and retrain centroids and codebook on
    the CURRENT pred corpus at the new cell count (default: what
    ann_index_health recommends). This is the periodic compaction the
    frozen-parameter append path assumes — at 100 TB it is the same
    scheduled job that compacts any LSM-shaped index. ``pred`` should
    cover the union of the originally-built corpus and every appended
    batch (the index is rebuilt FROM the base tables, not from the
    accumulated code rows, so re-encoding cost is one corpus pass)."""
    import os

    if cells is None:
        health = ann_index_health(spark, sf_dir, pred)
        cells = health.get("recommended_cells") or _ANN_CELLS
    tag = _ann_index_tag(sf_dir, pred)
    for t in (f"ann_centroids_{tag}", f"ann_codebook_{tag}", f"ann_pq_codes_{tag}"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    marker = os.path.join(
        scratch_path("grapho_spark_index"), f"_BUILD_OK_{tag}"
    )
    if os.path.exists(marker):
        os.unlink(marker)
    _KMEANS_PAIR_MEMO.clear()
    return ann_index_tables(spark, sf_dir, pred, cells=cells)


def _ann_probe(
    spark: SparkSession,
    sf_dir: str,
    cents: DataFrame,
    book: DataFrame,
    codes: DataFrame,
    query_pred: str = "vec_id % 97 = 0",
    hint_broadcast: bool = True,
    nprobe: int = _ANN_NPROBE,
) -> DataFrame:
    """The full probe plan against an arbitrary set of index tables —
    shared by the oracle-checked query (standard full-corpus index),
    the delta-ingest tests (base index + appended codes) and the
    all-corpus near-dup scan. ``hint_broadcast=False`` drops the
    broadcast hints on the routed-query/LUT/shortlist sides: when the
    QUERY SET is the whole corpus (near-dup), those tables are
    corpus-sized and must shuffle on their join keys instead."""
    e = load_table(spark, sf_dir, "embeddings")
    # r15: the normalized query explode IS _normalized_vec_expl's
    # memoized table restricted to query_pred (filter-then-normalize
    # == normalize-then-filter for a per-row transform; identical
    # round-6dp formula) — reuse the session memo instead of
    # re-deriving the explode per probe call. The all-corpus near-dup
    # scan gets the table the index build already persisted for free
    # (it feeds BOTH the coarse routing and the LUT build — measured
    # 20.1 -> 16.5s min at sf0.1 when the double derivation was first
    # removed), and repeated probes of any query set skip the scan +
    # normalize entirely.
    nv_pred = None if query_pred == "vec_id IS NOT NULL" else query_pred
    q_expl = _normalized_vec_expl(spark, sf_dir, nv_pred).select(
        F.col("vec_id").alias("q_id"),
        "pos",
        F.floor((F.col("pos") - 1) / _PQ_M).cast("int").alias("sub"),
        F.col("val").alias("qval"),
    )
    # multi-probe coarse routing against the stored centroids
    # (r15: BIGINT nano-unit fold — see _nano9_long; routing rank is
    # ordering-only, so the scaled integers decide identically)
    q_dists = (
        q_expl.join(F.broadcast(cents), "pos")
        .groupBy("q_id", "cid")
        .agg(
            F.sum(_sq_nano9_long(F.col("qval"), F.col("cval"))).alias("dist")
        )
    )
    w_route = Window.partitionBy("q_id").orderBy("dist", "cid")
    route = (
        q_dists.withColumn("rk", F.row_number().over(w_route))
        .filter(F.col("rk") <= nprobe)
        .select(F.col("q_id").alias("a_qid"), F.col("cid").alias("cell"))
    )
    # per-query LUT from the stored trained codebook (r15: exact BIGINT
    # femto-units — qval IS a 6dp value, cw an exact 6dp decimal; the
    # per-(sub,grp) partial sums <= 6.4e13 and the 16-sub ADC total
    # <= ~1e15, far inside long range, so both folds are exact and the
    # shortlist ordering is identical to the decimal(38,12) path)
    lut = (
        q_expl.select(
            "q_id", "pos", "sub", _micro6_long(F.col("qval")).alias("dvl")
        )
        .join(F.broadcast(book), ["sub", "pos"])
        .withColumn("cwl", (F.col("cw") * 1000000).cast("long"))
        .groupBy("q_id", "sub", "grp")
        .agg(
            F.sum(
                (F.col("dvl") - F.col("cwl")) * (F.col("dvl") - F.col("cwl"))
            ).alias("dist")
        )
        .select(
            F.col("q_id").alias("l_qid"),
            F.col("sub").alias("l_sub"),
            F.col("grp").alias("l_grp"),
            "dist",
        )
    )
    maybe_bc = F.broadcast if hint_broadcast else (lambda df: df)
    adc = (
        codes.join(maybe_bc(route), "cell")
        .join(
            maybe_bc(lut),
            (F.col("a_qid") == F.col("l_qid"))
            & (F.col("sub") == F.col("l_sub"))
            & (F.col("code") == F.col("l_grp")),
        )
        .filter(F.col("vec_id") != F.col("l_qid"))
        .groupBy(F.col("l_qid").alias("q_id"), "vec_id")
        .agg(F.sum("dist").alias("adc_dist"))
    )
    w_short = Window.partitionBy("q_id").orderBy("adc_dist", "vec_id")
    short = (
        adc.withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= _ANN_SHORTLIST)
        .select("q_id", "vec_id")
    )
    # exact-cosine re-rank of the shortlist against raw vectors
    # (r15: sqrt(self-dot) computed per VECTOR before the pair join,
    # not per pair — bit-identical, see _cosine_prenorm)
    qv = e.filter(query_pred).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("sq"),
    )
    ev = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("se"),
    )
    rer = (
        ev.join(maybe_bc(short), "vec_id")
        .join(maybe_bc(qv), "q_id")
        .select("q_id", "vec_id", _cosine_prenorm("qv", "ev", "sq", "se").alias("cosine"))
    )
    w_top = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        rer.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id", "cosine")
    )


@query(
    "embedding_ivfpq_indexed_knn",
    oracle=f"""
WITH {_DUCK_ANN_INDEX_CTES},
{_DUCK_ANN_PROBE_CTES}
SELECT q_id, vec_id, cosine FROM ai_top
""",
)
def embedding_ivfpq_indexed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 ANN against the PERSISTED v2 index (ann_index_tables):
    normalize the query, route to its _ANN_NPROBE nearest k-means
    cells (stored centroids, exact-decimal distances), ADC-score the
    stored PQ codes of just those cells against the per-query LUT from
    the stored trained codebook, then RE-RANK the _ANN_SHORTLIST best
    ADC candidates by exact cosine on raw vectors. This is the
    deployment split at 100 TB: the index is built once by the ingest
    pipeline (and extended in place by append_to_ann_index deltas); a
    probe touches the codebook (KB), the centroids (KB), the code rows
    of the routed cells (8 bytes/vector) and raw vectors for only the
    shortlist.

    Scale: queries explode map-side; routing and LUT construction join
    only broadcast-sized tables; scoring joins the tiny routed-query
    table against the bucketed code scan; the shortlist (constant rows
    per query) broadcasts back against the corpus for the re-rank."""
    cents, book, codes = ann_index_tables(spark, sf_dir)
    return _ann_probe(spark, sf_dir, cents, book, codes)


@query(
    "embedding_ivfpq_recall",
    oracle=f"""
WITH {_DUCK_ANN_INDEX_CTES},
{_DUCK_ANN_PROBE_CTES},
queries AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % 97 = 0),
bf_scored AS (
  SELECT q.q_id, e.vec_id,
         {_DUCK_COS.format(a="q.qv", b="e.embedding::DOUBLE[]")} AS cosine
  FROM queries q JOIN embeddings e ON e.vec_id <> q.q_id),
bf_top AS (
  SELECT q_id, vec_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY cosine DESC, vec_id) AS rn
        FROM bf_scored)
  WHERE rn <= 3),
matched AS (
  SELECT q.q_id, COUNT(i.vec_id) AS m
  FROM queries q
  LEFT JOIN (SELECT pt.q_id, pt.vec_id FROM ai_top pt
             JOIN bf_top bt ON pt.q_id = bt.q_id AND pt.vec_id = bt.vec_id) i
    ON i.q_id = q.q_id
  GROUP BY q.q_id)
SELECT COUNT(*) AS n_queries,
       round(SUM(m) * 1.0 / (3 * COUNT(*)), 6) AS avg_recall,
       CAST(SUM(CASE WHEN m = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_perfect
FROM matched
""",
)
def embedding_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the PERSISTED v2 index against exact brute force —
    the accuracy dial for the full production stack, and the gate that
    caught the r7 index: label cells + un-normalized ADC measured ~0
    here, so the index was fast retrieval of the wrong neighbors. The
    v2 composition (k-means cells on normalized vectors, trained
    codebook, {_ANN_NPROBE}-cell multi-probe, exact re-rank of the top
    {_ANN_SHORTLIST}) measured 0.79 at sf0.1; the r9 retune (32 cells,
    16 probed — same 50% scan fraction at finer routing granularity)
    measures 0.968. bench.py records this number per run and flags
    drops like time regressions.

    Scale: the index side reads stored codes (cheap); brute force is
    the expensive side and runs on the sampled query set, which is
    how production recall monitoring works at 100 TB."""
    pq_top = embedding_ivfpq_indexed_knn(spark, sf_dir).select("q_id", "vec_id")
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("sq"),
    )
    base = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("se"),
    )
    bf_scored = (
        F.broadcast(q)
        .crossJoin(base)
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", _cosine_prenorm("qv", "ev", "sq", "se").alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    bf_top = (
        bf_scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
    )
    inter = pq_top.join(bf_top, ["q_id", "vec_id"])
    matched = (
        q.select("q_id")
        .join(inter.groupBy("q_id").agg(F.count(F.lit(1)).alias("m")), "q_id", "left")
        .select("q_id", F.coalesce("m", F.lit(0)).alias("m"))
    )
    return matched.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.sum("m") * F.lit(1.0) / (F.lit(3) * F.count(F.lit(1))), 6).alias(
            "avg_recall"
        ),
        F.sum(F.when(F.col("m") == 3, 1).otherwise(0)).cast("long").alias("n_perfect"),
    )


# Scaled-sizing anchor (r12, VERDICT r11 #6): the health verdict's
# cells ∝ √growth rule wired into an index the PROBE actually uses,
# anchored at the r9-TUNED operating point (32 cells at the 2000-row
# sf0.1 corpus, measured recall@3 0.968 at 50% scan). cells(N) =
# 2^round(log2(anchor_cells · √(N/anchor_rows))). Denser sizing was
# measured WORSE, not better: a fixed-rows-per-cell rule (N/31) gave
# 64 cells at the same corpus and dropped the same 50%-scan probe to
# 0.921 — k-means routing quality decays when cells shrink past the
# tuned granularity, so growth must follow √N, not N.
_ANN_SQRT_ANCHOR_ROWS = 2000
_ANN_SQRT_ANCHOR_CELLS = 32


def _scaled_cells(n: int, fine_mult: int) -> int:
    """The √N sizing rule (anchored at _ANN_SQRT_ANCHOR_*), times the
    fine-routing multiplier — shared by the dial's measurement path
    and its parallel prebuild so the two can never diverge."""
    import math

    return fine_mult * 2 ** max(
        3,
        round(
            math.log2(
                _ANN_SQRT_ANCHOR_CELLS
                * math.sqrt(max(n, 1) / _ANN_SQRT_ANCHOR_ROWS)
            )
        ),
    )


def _ann_scaled_recall(
    spark: SparkSession,
    sf_dir: str,
    scale: str,
    corpus_pred: str,
    query_pred: str,
    probe_denom: int,
    fine_mult: int = 1,
) -> DataFrame:
    """One row of the scaled-sizing dial: size cells from THIS corpus
    scale, probe cells/probe_denom, and measure recall@3 against
    exact brute force WITHIN the same corpus plus the MEASURED scan
    fraction (code rows in the routed cells / corpus — cell imbalance
    makes the real fraction differ from nprobe/cells) and the ROUTING
    CEILING (fraction of true top-3 neighbors whose cell the router
    probed — the exact re-rank can never beat it, so recall ≈ ceiling
    proves a loss is routing geometry, not the ADC/shortlist stages).
    ``fine_mult`` multiplies the √N cell count for a separate
    finer-ROUTING index identity (r13): at a FIXED scan fraction,
    finer cells route measurably better — granularity is a probe-cost
    dial, distinct from the √N storage-sizing rule."""
    e = load_table(spark, sf_dir, "embeddings")
    n = e.filter(corpus_pred).count()
    cells = _scaled_cells(n, fine_mult)
    nprobe = max(1, cells // probe_denom)
    cents, book, codes = ann_index_tables(
        spark,
        sf_dir,
        pred=corpus_pred,
        cells=cells,
        ident=None if fine_mult == 1 else f"fine{fine_mult}",
    )
    top = _ann_probe(
        spark, sf_dir, cents, book, codes, query_pred=query_pred, nprobe=nprobe
    ).select("q_id", "vec_id")
    q = e.filter(query_pred).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("sq"),
    )
    base = e.filter(corpus_pred).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("se"),
    )
    bf = (
        F.broadcast(q)
        .crossJoin(base)
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", _cosine_prenorm("qv", "ev", "sq", "se").alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    bf_top = (
        bf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
    )
    inter = top.join(bf_top, ["q_id", "vec_id"])
    matched = (
        q.select("q_id")
        .join(
            inter.groupBy("q_id").agg(F.count(F.lit(1)).alias("m")),
            "q_id",
            "left",
        )
        .select("q_id", F.coalesce("m", F.lit(0)).alias("m"))
    )
    # measured scan fraction: per-query routed-cell code rows / corpus
    cell_sizes = (
        codes.filter(F.col("sub") == 0)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c_rows"))
    )
    # re-derive the routing (same plan prefix as the probe; Catalyst
    # dedups the scan) — query-sample-sized
    q_expl = (
        e.filter(query_pred)
        .select(
            F.col("vec_id").alias("q_id"),
            F.expr(
                "transform(CAST(embedding AS ARRAY<DOUBLE>), "
                "x -> round(x / sqrt(aggregate(CAST(embedding AS ARRAY<DOUBLE>), "
                "CAST(0.0 AS DOUBLE), (a, y) -> a + y * y)), 6))"
            ).alias("nvec"),
        )
        .select("q_id", F.posexplode("nvec").alias("pos0", "qval"))
        .select("q_id", (F.col("pos0") + 1).alias("pos"), "qval")
    )
    # r15: BIGINT nano-unit fold (exact-6dp operands; routing is
    # ordering-only) — see _sq_nano9_long
    q_dists = (
        q_expl.join(F.broadcast(cents), "pos")
        .groupBy("q_id", "cid")
        .agg(F.sum(_sq_nano9_long(F.col("qval"), F.col("cval"))).alias("dist"))
    )
    w_route = Window.partitionBy("q_id").orderBy("dist", "cid")
    routed = (
        q_dists.withColumn("rk", F.row_number().over(w_route))
        .filter(F.col("rk") <= nprobe)
        .select("q_id", "cid")
    )
    scan = (
        routed.join(cell_sizes, F.col("cid") == F.col("cell"), "left")
        .groupBy("q_id")
        .agg(F.sum(F.coalesce("c_rows", F.lit(0))).alias("scanned"))
        .agg(F.round(F.avg("scanned") / F.lit(n), 4).alias("scan_fraction"))
    )
    # routing ceiling: the fraction of TRUE top-3 neighbors whose
    # assigned cell was among the routed cells — what an exact-rerank
    # probe could reach at best from these candidates
    vec_cells = codes.filter(F.col("sub") == 0).select(
        "vec_id", F.col("cell").alias("v_cell")
    )
    ceiling = (
        bf_top.join(vec_cells, "vec_id")
        .join(
            routed.withColumnRenamed("q_id", "r_qid"),
            (F.col("q_id") == F.col("r_qid"))
            & (F.col("v_cell") == F.col("cid")),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("covered"))
        .crossJoin(F.broadcast(q.agg(F.count(F.lit(1)).alias("nq"))))
        .select(
            F.round(F.col("covered") / (F.lit(3.0) * F.col("nq")), 6).alias(
                "route_ceiling"
            )
        )
    )
    return (
        matched.agg(
            F.lit(scale).alias("scale"),
            F.lit(f"{100 // probe_denom}pct").alias("nominal_frac"),
            F.lit(int(n)).cast("long").alias("n_vectors"),
            F.lit(cells).cast("long").alias("cells"),
            F.lit(nprobe).cast("long").alias("nprobe"),
            F.count(F.lit(1)).alias("n_queries"),
            F.round(
                F.sum("m") * F.lit(1.0) / (F.lit(3) * F.count(F.lit(1))), 6
            ).alias("avg_recall"),
        )
        .crossJoin(F.broadcast(scan))
        .crossJoin(F.broadcast(ceiling))
    )


@query("embedding_ann_scaled_sizing")
def embedding_ann_scaled_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaled-sizing dial (r12, VERDICT r11 #6; reworked r13 for
    VERDICT r12 #4): build the persisted index at TWO corpus scales
    with the √N sizing rule (cells = 2^round(log2(32·√(N/2000))),
    the anchor _ANN_SQRT_ANCHOR_CELLS/_ANN_SQRT_ANCHOR_ROWS), probe
    at TWO fractions, and record recall@3, the MEASURED scan
    fraction, and the ROUTING CEILING for each point. Measured at
    sf0.1: at the FIXED 50% fraction recall IMPROVES 0.848 -> 0.968
    as the corpus grows 5x — the sizing rule's scaling claim,
    verified through the probe itself.

    The 25% points route through a FINE-ROUTING identity (4x the √N
    cells, same nominal fraction): at a fixed scan budget, finer
    cells cover true-neighbor cells measurably better — measured at
    sf0.1 through this dial, x1 0.65 -> 0.864 (scan 0.29) and x5
    0.76 -> 0.810 (scan 0.26). The √N rule remains the STORAGE/
    rebuild sizing — routing granularity is a separate, cheaper
    dial; r12's "denser sizing measured worse" applied to moving the
    50% operating point off its tuned anchor, not to probe-side
    granularity at a fixed budget.

    VERDICT r12 #4 asked for ≥0.9 recall at ≤0.27 scan; that bar is
    NOT reachable on this corpus and the dial now PROVES why in-band:
    ``route_ceiling`` is the fraction of true top-3 neighbors whose
    cell was probed — the exact re-rank can never beat it, and
    recall ≈ ceiling in every row, so the 25% loss is routing
    geometry (near-uniform synthetic 64-d vectors have almost no
    cluster structure), not the ADC/shortlist stages. Six candidate
    families were measured offline at matched ~25% scan on the x5
    corpus before choosing fine routing (PERF.md r13): fixed IVF
    0.65, ORACLE-adaptive per-query cell allocation ≤~0.75,
    2x/3x multi-assignment (spill) 0.54-0.73, 4-view multi-routing
    0.81-0.83, Vamana-pruned beam search 0.79@0.28-0.905@0.36, and
    finer-granularity routing 0.81-0.825 (plateau at 4x; 8x adds
    nothing). The frontier at 25% scan is ~0.82 REGARDLESS of
    method; 0.9 first appears at ~0.35 scan (beam) — recorded so the
    operating choice (50% scan for ≥0.95, 25% for ~0.8) is an
    informed cost/recall trade, which at 100 TB is the decision that
    actually matters.

    Rows-only (no DuckDB oracle): the dial MEASURES a quality metric
    against in-plan exact brute force — the brute-force ground truth
    is itself the oracle; a second 2-scale k-means+PQ chain in SQL
    would re-specify the index, not check it. bench.py records
    recall + scan fraction per (scale, fraction) in the quality
    section (regression-gated like every other dial)."""
    scales = (
        ("x1", "vec_id % 5 = 0", "vec_id % 95 = 0"),
        ("x5", "vec_id >= 0", "vec_id % 97 = 0"),
    )
    # Prebuild the four index identities on driver threads (VERDICT
    # r13 #5): the builds are independent (distinct tags/tables; the
    # shared PQ codebook is memoized build-once) and their walls were
    # ~all of the bench quality phase when run back-to-back. The
    # measurement loop below then finds every table via its marker.
    e_all = load_table(spark, sf_dir, "embeddings")
    thunks = []
    for _, corpus_pred, _ in scales:
        n = e_all.filter(corpus_pred).count()
        for mult in (1, 4):
            thunks.append(
                lambda cp=corpus_pred, c=_scaled_cells(n, mult), m=mult: (
                    ann_index_tables(
                        spark, sf_dir, pred=cp, cells=c,
                        ident=None if m == 1 else f"fine{m}",
                    )
                )
            )
    _prebuild_parallel(thunks)
    out = None
    for scale, corpus_pred, query_pred in scales:
        # 50% = the shipped operating point on the √N-sized index;
        # 25% = the cheap point through the FINE-ROUTING identity
        # (4x cells, same nominal fraction — the r13 measured best of
        # six candidate families; see the docstring's frontier table)
        for denom, mult in ((2, 1), (4, 4)):
            one = _ann_scaled_recall(
                spark, sf_dir, scale, corpus_pred, query_pred, denom,
                fine_mult=mult,
            )
            out = one if out is None else out.unionByName(one)
    return out


# ------------------------------------------------ graph ANN (r13/r14)

# Proximity-graph ANN (the HNSW/DiskANN/Vamana family): built once as
# a persisted adjacency table, probed by best-first beam search. The
# r13 frontier measurement (PERF.md) showed beam search is the ONLY
# family that reaches 0.9 recall below half-corpus scans on the
# near-uniform synthetic vectors (0.905 @ 0.36 visited) — IVF routing
# is geometry-capped at ~0.82 regardless of granularity. Shipped as a
# second first-class ANN strategy next to IVF+PQ.
#
# r14 (VERDICT r13 #1) made both halves cluster-shaped:
#  * the builder is NN-DESCENT (Dong et al., WWW'11) — per-round
#    neighbor-of-neighbor refinement joins bounded by O(n·B²) scored
#    pairs — instead of the r13 n² crossJoin (4×10¹⁰ pairs at the old
#    gate's own 200k maximum);
#  * corpora past _GRAPH_SHARD_TARGET rows split into SPANN-style
#    k-means shards, each shard building its own subgraph in the SAME
#    distributed flow (the shard id is just another join/group key);
#  * the beam probe fans out one batch per (shard, routed queries)
#    via a COGROUPED applyInPandas and a global top-k merges shard
#    results — graph and vectors never visit the driver, so the r13
#    collect() gate is gone entirely.
_GRAPH_DEG = 12  # pruned out-degree per node
_GRAPH_POOL = 24  # NN-list width during descent, pool for alpha-prune
_GRAPH_ALPHA = 1.2  # Vamana diversification: keep u unless a kept w
#                     dominates it (alpha * d(u, w) <= d(v, u))
_GRAPH_EF = 60  # beam width of the probe
_GRAPH_SHARD_TARGET = 100_000  # rows per shard subgraph (SPANN cells)
_GRAPH_NND_ROUNDS = 6  # neighbor-of-neighbor refinement rounds
_GRAPH_NND_SAMPLE = 16  # neighbors sampled per node per round (rho)
# (B=16, 6 rounds measured 0.958 list-recall vs exact top-24 on the
# 500-vector corpus — B=8/4 rounds stalled at 0.386 on these
# near-uniform vectors, B=24/4 reached 0.994 at 1.5x the pair
# budget; per-round work is bounded at n*B^2 scored pairs)
_GRAPH_CLOSURE_CAP = 2  # max cell memberships per vector under closure
_GRAPH_APPEND_CAP = 6 * _GRAPH_DEG  # symmetric-degree bound before a
#                                     standing list re-prunes on append
#                                     (the build invariant's cap)
_GRAPH_CLOSURE_EPS = 0.01  # closure threshold: join cells within
#                            (1+eps) of the nearest centroid distance.
#                            Frozen from the measured sf0.1 frontier
#                            (PERF.md r14 closure table): 0.01 buys
#                            +6.4 recall pts at 1.30x storage with
#                            recall/ceiling 0.982; eps>=0.03 on this
#                            near-uniform corpus degenerates to ~2x
#                            full duplication


def _nnd_edges(spark: SparkSession, va: DataFrame, k: int) -> DataFrame:
    """NN-descent: approximate top-``k`` cosine neighbor lists
    (shard, src, dst, cos) per vector of ``va`` (shard, vec_id, v),
    all edges within their shard. Seeds are hash-pseudo-random
    (xxhash64 — deterministic), then _GRAPH_NND_ROUNDS rounds of the
    classic refinement: sample B neighbors per node from the current
    UNDIRECTED lists, join neighbors-of-neighbors, score the new
    pairs, keep the best k per node. Each round is a bounded
    self-join (≤ n·B² scored pairs — at B=8 that is 64 pairs/row
    regardless of corpus size) and lineage is checkpoint-truncated,
    so the build scales like any other shuffle pipeline instead of
    the n² exact pass it replaces. Convergence vs the exact lists is
    pinned by tests/test_graph_ann.py."""
    from grapho_spark.sparkutil import checkpoint_state

    # one vector row per vec_id for the lookups: under closure
    # multi-assignment va carries a row per (shard, vec_id) and the
    # replicas' vectors are identical — joining the raw frame would
    # duplicate scored pairs and let the same dst occupy two top-k
    # slots
    vu = (
        va.select("vec_id", "v")
        .dropDuplicates(["vec_id"])
        .withColumn("_sn", _snorm("v"))
    )
    vsrc = vu.select(
        F.col("vec_id").alias("src"), F.col("v").alias("_va"), F.col("_sn").alias("_sa")
    )
    vdst = vu.select(
        F.col("vec_id").alias("dst"), F.col("v").alias("_vb"), F.col("_sn").alias("_sb")
    )

    def scored(pairs: DataFrame) -> DataFrame:
        return (
            pairs.join(vsrc, "src")
            .join(vdst, "dst")
            .select(
                "shard", "src", "dst",
                _cosine_prenorm("_va", "_vb", "_sa", "_sb").alias("cos"),
            )
        )

    w_rank = Window.partitionBy("shard").orderBy(
        F.xxhash64("vec_id"), "vec_id"
    )
    ranked = va.select(
        "shard", "vec_id", F.row_number().over(w_rank).alias("rnk")
    )
    counts = ranked.groupBy("shard").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = ranked.join(F.broadcast(counts), "shard")
    seed_pairs = (
        ranked.select(
            "shard", "vec_id", "cnt",
            F.explode(F.expr(f"sequence(0, {k - 1})")).alias("j"),
        )
        .withColumn(
            "trnk",
            (F.pmod(F.xxhash64("vec_id", "j"), F.col("cnt")) + 1).cast("int"),
        )
        .join(
            ranked.select(
                "shard", F.col("rnk").alias("trnk"),
                F.col("vec_id").alias("dst"),
            ),
            ["shard", "trnk"],
        )
        .filter(F.col("vec_id") != F.col("dst"))
        .select("shard", F.col("vec_id").alias("src"), "dst")
        .distinct()
    )
    w_top = Window.partitionBy("shard", "src").orderBy(F.desc("cos"), "dst")
    edges = (
        scored(seed_pairs)
        .withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    edges = checkpoint_state(edges)
    b = _GRAPH_NND_SAMPLE
    for r in range(_GRAPH_NND_ROUNDS):
        und = (
            edges.select("shard", "src", "dst")
            .unionByName(
                edges.select(
                    "shard",
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                )
            )
            .distinct()
        )
        w_s = Window.partitionBy("shard", "src").orderBy(
            F.xxhash64("dst", F.lit(r)), "dst"
        )
        samp = (
            und.withColumn("rn", F.row_number().over(w_s))
            .filter(F.col("rn") <= b)
            .drop("rn")
        )
        cand = (
            samp.select("shard", F.col("src").alias("a"), F.col("dst").alias("m"))
            .join(
                samp.select(
                    "shard", F.col("src").alias("m"), F.col("dst").alias("b")
                ),
                ["shard", "m"],
            )
            .filter(F.col("a") != F.col("b"))
            .select("shard", F.col("a").alias("src"), F.col("b").alias("dst"))
            .distinct()
        )
        edges = (
            edges.unionByName(scored(cand))
            .groupBy("shard", "src", "dst")
            .agg(F.max("cos").alias("cos"))
            .withColumn("rn", F.row_number().over(w_top))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )
        edges = checkpoint_state(edges)
    return edges


def _alpha_prune_batch(deg: int):
    """Vamana RobustPrune as a per-(shard, src) Arrow batch: sort the
    candidate pool by cosine, keep a candidate unless a kept,
    closer-together edge alpha-dominates it, stop at ``deg`` edges.
    Input columns (shard, src, dst, vb, cos); the pool's pairwise
    geometry is POOL×dim, KB-sized. Shared by the graph build
    (deg=_GRAPH_DEG) and the delta append's overflow re-prune
    (deg=_GRAPH_POOL — symmetric lists keep more than the build's
    out-degree so connectivity survives)."""
    import numpy as np

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cos", "dst"], ascending=[False, True])
        ids = pdf["dst"].to_numpy()
        vs = np.stack(pdf["vb"].to_numpy())
        vs = vs / np.linalg.norm(vs, axis=1, keepdims=True)
        d_vu = 2.0 - 2.0 * pdf["cos"].to_numpy()  # d(v, u) from cosine
        kept: list[int] = []
        for i in range(len(ids)):
            if len(kept) >= deg:
                break
            ok = True
            for j in kept:
                d_uw = 2.0 - 2.0 * float(vs[i] @ vs[j])
                if d_uw * _GRAPH_ALPHA <= d_vu[i]:
                    ok = False  # a kept, closer-together edge dominates
                    break
            if ok:
                kept.append(i)
        return pd.DataFrame(
            {
                "shard": pdf["shard"].iloc[:1],
                "src": pdf["src"].iloc[:1],
                "nbrs": [ids[kept].tolist()],
            }
        )

    return _prune


def _closure_membership(
    vecs: DataFrame, cents: DataFrame, eps: float
) -> DataFrame:
    """SPANN-style closure multi-assignment (Chen et al., NeurIPS'21
    §4.2 — public): a vector joins every cell whose centroid distance
    is within (1+eps) of its nearest centroid's (so (1+eps)² on the
    squared-L2 the shard k-means folds), capped at _GRAPH_CLOSURE_CAP
    memberships. Exact-decimal distances with the cid tiebreak — the
    rk=1 membership is bit-identical to _kmeans_pair's assignment, so
    closure only ADDS boundary replicas. One broadcast join of the
    tiny centroid table; output is (vec_id, shard) with 1..cap rows
    per vector. eps <= 0 returns the PRIMARY assignment only (rk=1,
    no equal-distance ties admitted — identical to the build's hard
    assignment; the delta-append path routes batches through this)."""
    from pyspark.sql.types import DecimalType

    vx = vecs.select(
        "vec_id", F.posexplode("v").alias("pos0", "val")
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "val")
    if eps <= 0.0:
        # r15: the primary assignment is ordering-only, so the dist
        # fold runs in exact BIGINT nano-units (argmin identical); the
        # eps > 0 frontier below keeps the decimal fold because its
        # (1+eps)^2 threshold compares CAST-to-double dist VALUES —
        # reproducing those doubles from scaled longs adds a second
        # rounding that could flip an exact-boundary membership.
        d_long = (
            vx.join(F.broadcast(cents), "pos")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum(
                    _nano9_long(
                        (F.col("val") - F.col("cval"))
                        * (F.col("val") - F.col("cval"))
                    )
                ).alias("dist")
            )
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        return (
            d_long.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", F.col("cid").cast("int").alias("shard"))
        )
    d = (
        vx.join(F.broadcast(cents), "pos")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(
                F.round(
                    (F.col("val") - F.col("cval"))
                    * (F.col("val") - F.col("cval")),
                    9,
                ).cast(DecimalType(28, 9))
            ).alias("dist")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    ranked = d.withColumn("rk", F.row_number().over(w))
    wv = Window.partitionBy("vec_id")
    lim = (1.0 + eps) * (1.0 + eps)
    return (
        ranked.withColumn("d1", F.min("dist").over(wv))
        .filter(
            (F.col("rk") == 1)
            | (
                (F.col("rk") <= _GRAPH_CLOSURE_CAP)
                & (
                    F.col("dist").cast("double")
                    <= F.lit(lim) * F.col("d1").cast("double")
                )
            )
        )
        .select("vec_id", F.col("cid").cast("int").alias("shard"))
    )


def _graph_tag(
    sf_dir: str, pred: str, target: int, ident: str, closure_eps: float
) -> str:
    """One index identity per (corpus pred, shard target, closure
    eps) — shared by the build, the delta append, and health."""
    sub = f"{ident}_t{target}" + (
        f"_c{closure_eps}" if closure_eps > 0.0 else ""
    )
    return _ann_index_tag(sf_dir, pred, ident=sub)


def ann_graph_table(
    spark: SparkSession,
    sf_dir: str,
    pred: str = "vec_id >= 0",
    shard_target: int | None = None,
    ident: str = "graph",
    closure_eps: float = 0.0,
) -> DataFrame:
    """The persisted proximity-graph adjacency (shard, vec_id, nbrs)
    — see ann_graph_tables for the build contract."""
    return ann_graph_tables(
        spark, sf_dir, pred, shard_target, ident, closure_eps
    )[0]


def ann_graph_tables(
    spark: SparkSession,
    sf_dir: str,
    pred: str = "vec_id >= 0",
    shard_target: int | None = None,
    ident: str = "graph",
    closure_eps: float = 0.0,
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Build-once/probe-many sharded proximity graph over the (pred)
    corpus. Rows shard into ceil(n / shard_target) SPANN-style
    k-means cells (the existing exact-decimal Lloyd machinery; one
    shard below the target — no special case, shard 0), then each
    shard gets a Vamana-style subgraph: NN-descent top-_GRAPH_POOL
    lists (_nnd_edges — bounded refinement joins, NOT n²),
    alpha-pruned to _GRAPH_DEG diversified out-edges (per-src Arrow
    batch; the pool's pairwise geometry is POOL×dim, KB-sized), made
    symmetric within the shard (reverse edges unioned — the classic
    connectivity fix for thin kNN digraphs).

    With ``closure_eps`` > 0 (multi-shard builds only) vectors join
    EVERY cell whose centroid distance is within (1+eps) of their
    nearest — SPANN's closure multi-assignment, capped at
    _GRAPH_CLOSURE_CAP memberships — so boundary neighbors exist in
    both adjacent subgraphs and the per-query route ceiling rises at
    the cost of replicated storage. The persisted ``ann_gassign``
    table stays PRIMARY-only (query routing is unchanged); the graph
    table carries the replicated membership.

    Persists three tables with the IVF index family's crash-safe
    marker protocol: ``ann_graph_<tag>`` (shard, vec_id, nbrs),
    ``ann_gassign_<tag>`` (vec_id, shard — routes in-corpus queries
    to their own cell), and for multi-shard builds
    ``ann_gcents_<tag>`` (cid, pos, cval — routes arbitrary queries
    to their nearest cells). Returns (graph, assign, cents|None)."""
    import json
    import math
    import os

    target = shard_target or _GRAPH_SHARD_TARGET
    tag = _graph_tag(sf_dir, pred, target, ident, closure_eps)
    g_name = f"ann_graph_{tag}"
    a_name = f"ann_gassign_{tag}"
    c_name = f"ann_gcents_{tag}"
    base = scratch_path("grapho_spark_index")
    marker = os.path.join(base, f"_BUILD_OK_{g_name}")
    if os.path.exists(marker) and all(
        spark.catalog.tableExists(t) for t in (g_name, a_name)
    ):
        with open(marker) as fh:
            info = json.load(fh)
        cents = spark.table(c_name) if info["shards"] > 1 else None
        return spark.table(g_name), spark.table(a_name), cents
    for t in (g_name, a_name, c_name):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    if os.path.exists(marker):
        os.unlink(marker)
    e = load_table(spark, sf_dir, "embeddings").filter(pred)
    vecs = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = vecs.count()
    shards = max(1, math.ceil(n / target))
    cents: DataFrame | None = None
    if shards > 1:
        assign_df, cents = _kmeans_pair(
            spark, sf_dir, shards, 2, normalized=False, pred=pred
        )
        assign = assign_df.select(
            "vec_id", F.col("cid").cast("int").alias("shard")
        )
        member = (
            _closure_membership(vecs, cents, closure_eps)
            if closure_eps > 0.0
            else assign
        )
    else:
        assign = vecs.select("vec_id", F.lit(0).alias("shard"))
        member = assign
    from grapho_spark.sparkutil import materialize

    va = materialize(
        vecs.join(member, "vec_id").select("shard", "vec_id", "v")
    )
    member_rows = va.count()
    edges = _nnd_edges(spark, va, _GRAPH_POOL)
    pool = edges.join(
        va.select("vec_id", "v")
        .dropDuplicates(["vec_id"])
        .select(F.col("vec_id").alias("dst"), F.col("v").alias("vb")),
        "dst",
    ).select("shard", "src", "dst", "vb", "cos")

    pruned = pool.groupBy("shard", "src").applyInPandas(
        _alpha_prune_batch(_GRAPH_DEG), "shard int, src long, nbrs array<long>"
    )
    sym = (
        pruned.select("shard", "src", F.explode("nbrs").alias("dst"))
        .unionByName(
            pruned.select(
                "shard",
                F.explode("nbrs").alias("src"),
                F.col("src").alias("dst"),
            )
        )
        .groupBy("shard", "src")
        .agg(F.array_sort(F.collect_set("dst")).alias("nbrs"))
        .select("shard", F.col("src").alias("vec_id"), "nbrs")
    )
    os.makedirs(base, exist_ok=True)
    sym.write.option("path", os.path.join(base, g_name)).mode(
        "overwrite"
    ).saveAsTable(g_name)
    assign.write.option("path", os.path.join(base, a_name)).mode(
        "overwrite"
    ).saveAsTable(a_name)
    if cents is not None:
        cents.write.option("path", os.path.join(base, c_name)).mode(
            "overwrite"
        ).saveAsTable(c_name)
    with open(marker, "w") as fh:
        json.dump(
            {
                "rows": n,
                "shards": shards,
                "deg": _GRAPH_DEG,
                "alpha": _GRAPH_ALPHA,
                "pool": _GRAPH_POOL,
                "nnd_rounds": _GRAPH_NND_ROUNDS,
                "closure_eps": closure_eps,
                "member_rows": member_rows,
            },
            fh,
        )
    cents_out = spark.table(c_name) if cents is not None else None
    return spark.table(g_name), spark.table(a_name), cents_out


def _graph_adjacency(spark: SparkSession, tag: str) -> DataFrame:
    """Merge-on-read adjacency for a graph-ANN identity: the base
    ``ann_graph_<tag>`` rows at generation 0 overridden per
    (shard, vec_id) by the latest ``ann_gdelta_<tag>`` generation —
    the same LSM shape as the engine's side files. Without deltas the
    base table returns untouched."""
    base = spark.table(f"ann_graph_{tag}").withColumn("gen", F.lit(0))
    dname = f"ann_gdelta_{tag}"
    if not spark.catalog.tableExists(dname):
        return base.drop("gen")
    merged = base.unionByName(spark.table(dname))
    w = Window.partitionBy("shard", "vec_id").orderBy(F.desc("gen"))
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "gen")
    )


def ann_graph_health(
    spark: SparkSession,
    sf_dir: str,
    pred: str = "vec_id >= 0",
    shard_target: int | None = None,
    ident: str = "graph",
    closure_eps: float = 0.0,
) -> dict:
    """Outgrowth check for the persisted proximity graph — the graph
    twin of ann_index_health: compares the CURRENT member count
    (merged adjacency, distinct vec_id) against the corpus size the
    build marker recorded. ``rebuild=True`` once growth crosses
    _ANN_REBUILD_FACTOR — appended nodes only ever attach to the
    standing graph (batch-internal edges are deferred to compaction,
    see append_to_ann_graph), so past ~2x the built corpus an
    append-grown graph runs with a degraded edge set the same way an
    outgrown IVF index runs at half its routing granularity.
    ``recommended_shards`` re-sizes the SPANN cells for the grown
    corpus."""
    import json
    import math
    import os

    target = shard_target or _GRAPH_SHARD_TARGET
    tag = _graph_tag(sf_dir, pred, target, ident, closure_eps)
    marker = os.path.join(
        scratch_path("grapho_spark_index"), f"_BUILD_OK_ann_graph_{tag}"
    )
    if not os.path.exists(marker):
        return {"built": False, "rebuild": False}
    with open(marker) as fh:
        info = json.load(fh)
    built = int(info["rows"])
    total = (
        _graph_adjacency(spark, tag)
        .agg(F.countDistinct("vec_id"))
        .collect()[0][0]
    )
    growth = total / built if built else float("inf")
    return {
        "built": True,
        "built_rows": built,
        "total_rows": int(total),
        "growth": round(growth, 4),
        "rebuild": growth >= _ANN_REBUILD_FACTOR,
        "recommended_shards": max(1, math.ceil(total / target)),
    }


def append_to_ann_graph(
    spark: SparkSession,
    sf_dir: str,
    base_pred: str,
    batch_pred: str,
    shard_target: int | None = None,
    ident: str = "graph",
    closure_eps: float = 0.0,
    auto_rebuild_pred: str | None = None,
) -> dict:
    """Delta-ingest for the proximity graph — the FreshDiskANN-style
    insert (Singh et al., arXiv 2105.09613, public) re-expressed as
    dataflow, mirroring append_to_ann_index's frozen-parameter
    contract: shard centroids are FROZEN (batch vectors route through
    the same exact-decimal closure/primary assignment the build
    used), each new vector finds its neighbor pool with ONE cogrouped
    beam pass over the standing merged graph (per (shard, routed
    batch) Arrow batch — no driver collect), alpha-prunes it to the
    build's out-degree, and its reverse edges merge into the affected
    standing lists; a standing list that overflows 6x the build
    degree re-prunes to _GRAPH_POOL with the same RobustPrune batch
    the builder uses. Mutations land in an append-only
    ``ann_gdelta_<tag>`` generation table read through
    _graph_adjacency's merge-on-read view — the base table is never
    rewritten, so the append is batch-sized work end to end.

    Batch-INTERNAL edges are deferred: a batch vector's pool comes
    from the standing graph, so two same-batch vectors only connect
    via later appends' reverse edges or the compacting rebuild —
    that is the accumulation ann_graph_health meters, and the
    recall dial measures its cost honestly (delta-grown vs
    fresh-built recall on the same corpus).

    Appends are idempotent per (identity, batch_pred): a marker skips
    re-application (the graph insert is not naturally idempotent —
    re-running it against the already-merged graph would find a
    different pool), so build-once/probe-many callers like the dials
    and the parity sweep get deterministic state. In-band health +
    auto-rebuild follow the IVF contract: pass ``auto_rebuild_pred``
    covering the union corpus and a flagged append compacts into that
    NEW identity and retires the old one's tables/markers."""
    import json
    import os

    target = shard_target or _GRAPH_SHARD_TARGET
    graph, assign, cents = ann_graph_tables(
        spark, sf_dir, base_pred, shard_target, ident, closure_eps
    )
    tag = _graph_tag(sf_dir, base_pred, target, ident, closure_eps)
    base_dir = scratch_path("grapho_spark_index")
    d_name = f"ann_gdelta_{tag}"
    a_name = f"ann_gassign_{tag}"
    import hashlib

    bkey = hashlib.md5(batch_pred.encode()).hexdigest()[:12]
    ap_marker = os.path.join(base_dir, f"_APPEND_OK_{d_name}_{bkey}")
    applied = False
    if not os.path.exists(ap_marker):
        applied = True
        e = load_table(spark, sf_dir, "embeddings").filter(batch_pred)
        batch = e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        from grapho_spark.sparkutil import materialize

        batch = materialize(batch)
        if cents is not None:
            member = _closure_membership(batch, cents, closure_eps)
            primary = (
                member
                if closure_eps <= 0.0
                else _closure_membership(batch, cents, 0.0)
            )
        else:
            member = batch.select("vec_id", F.lit(0).alias("shard"))
            primary = member
        adj = _graph_adjacency(spark, tag)
        vecs_all = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        routed = materialize(
            member.withColumnRenamed("vec_id", "q_id")
            .join(
                batch.select(
                    F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
                ),
                "q_id",
            )
            .select("shard", "q_id", "qv")
        )
        cand = _graph_beam_results(
            spark, adj, vecs_all, routed, k=_GRAPH_POOL
        )
        vb_lut = vecs_all.select(
            F.col("vec_id").alias("dst"), F.col("v").alias("vb")
        )
        pool = cand.select(
            "shard",
            F.col("q_id").alias("src"),
            F.col("vec_id").alias("dst"),
            F.col("cosine").alias("cos"),
        ).join(vb_lut, "dst")
        new_rows = pool.groupBy("shard", "src").applyInPandas(
            _alpha_prune_batch(_GRAPH_DEG),
            "shard int, src long, nbrs array<long>",
        )
        new_rows = materialize(new_rows)
        # reverse edges into the affected standing lists
        incoming = (
            new_rows.select(
                "shard", F.explode("nbrs").alias("vec_id"),
                F.col("src").alias("inc"),
            )
            .groupBy("shard", "vec_id")
            .agg(F.collect_set("inc").alias("inc"))
        )
        affected = adj.join(incoming, ["shard", "vec_id"]).select(
            "shard",
            "vec_id",
            F.array_sort(
                F.array_union("nbrs", "inc")
            ).alias("nbrs"),
        )
        ok = affected.filter(F.size("nbrs") <= _GRAPH_APPEND_CAP)
        over = affected.filter(F.size("nbrs") > _GRAPH_APPEND_CAP)
        va_lut = vecs_all.select(
            F.col("vec_id").alias("src"), F.col("v").alias("va"),
            _snorm("v").alias("s_a"),
        )
        vbn_lut = vecs_all.select(
            F.col("vec_id").alias("dst"), F.col("v").alias("vb"),
            _snorm("v").alias("s_b"),
        )
        over_pool = (
            over.select(
                "shard", F.col("vec_id").alias("src"),
                F.explode("nbrs").alias("dst"),
            )
            .join(va_lut, "src")
            .join(vbn_lut, "dst")
            .select(
                "shard", "src", "dst", "vb",
                _cosine_prenorm("va", "vb", "s_a", "s_b").alias("cos"),
            )
        )
        repruned = over_pool.groupBy("shard", "src").applyInPandas(
            _alpha_prune_batch(_GRAPH_POOL),
            "shard int, src long, nbrs array<long>",
        )
        gen = 1
        if spark.catalog.tableExists(d_name):
            prev = spark.table(d_name).agg(F.max("gen")).collect()[0][0]
            gen = int(prev or 0) + 1
        delta = (
            new_rows.select(
                "shard", F.col("src").alias("vec_id"),
                F.array_sort("nbrs").alias("nbrs"),
            )
            .unionByName(ok.select("shard", "vec_id", "nbrs"))
            .unionByName(
                repruned.select(
                    "shard", F.col("src").alias("vec_id"),
                    F.array_sort("nbrs").alias("nbrs"),
                )
            )
            .withColumn("gen", F.lit(gen))
            .select("gen", "shard", "vec_id", "nbrs")
        )
        os.makedirs(base_dir, exist_ok=True)
        if spark.catalog.tableExists(d_name):
            delta.write.mode("append").saveAsTable(d_name)
        else:
            delta.write.option(
                "path", os.path.join(base_dir, d_name)
            ).saveAsTable(d_name)
        primary.select("vec_id", "shard").write.mode("append").saveAsTable(
            a_name
        )
        with open(ap_marker, "w") as fh:
            json.dump({"batch_pred": batch_pred, "gen": gen}, fh)
    health = ann_graph_health(
        spark, sf_dir, base_pred, shard_target, ident, closure_eps
    )
    rebuilt = False
    rebuilt_tables = None
    retired = None
    if auto_rebuild_pred is not None and health.get("rebuild"):
        new_target = shard_target or _GRAPH_SHARD_TARGET
        ann_graph_tables(
            spark, sf_dir, auto_rebuild_pred, shard_target, ident,
            closure_eps,
        )
        new_tag = _graph_tag(
            sf_dir, auto_rebuild_pred, new_target, ident, closure_eps
        )
        rebuilt = True
        rebuilt_tables = [
            f"ann_graph_{new_tag}",
            f"ann_gassign_{new_tag}",
            f"ann_gcents_{new_tag}",
        ]
        if auto_rebuild_pred != base_pred:
            retired = [
                f"ann_graph_{tag}", a_name, f"ann_gcents_{tag}", d_name,
            ]
            for t in retired:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            for mk in [f"_BUILD_OK_ann_graph_{tag}"] + [
                m
                for m in os.listdir(base_dir)
                if m.startswith(f"_APPEND_OK_{d_name}_")
            ]:
                p = os.path.join(base_dir, mk)
                if os.path.exists(p):
                    os.unlink(p)
        health = ann_graph_health(
            spark, sf_dir, auto_rebuild_pred, shard_target, ident,
            closure_eps,
        )
    return {
        "graph_table": f"ann_graph_{tag}",
        "delta_table": d_name,
        "applied": applied,
        "health": health,
        "rebuilt": rebuilt,
        "rebuilt_tables": rebuilt_tables,
        "retired_tables": retired,
    }


def _graph_beam_results(
    spark: SparkSession,
    graph: DataFrame,
    vecs: DataFrame,
    routed: DataFrame,
    k: int = 3,
) -> DataFrame:
    """Per-(query, shard) beam search: ONE cogrouped applyInPandas
    batch per shard — the left side carries the shard's adjacency +
    vectors, the right side its routed queries; neither visits the
    driver (the r13 version collect()ed both, which is why it was
    gated). Per shard the beam is the same deterministic best-first
    walk: entry points are the 4 smallest vec_ids, ties break by id.
    Emits (q_id, vec_id, cosine, visited, shard) rows — the per-shard
    top-k plus the visit count (one exact distance per visit, the
    family's unit of work); a global window merges shard results."""
    left = graph.join(vecs.select("vec_id", "v"), "vec_id").select(
        "shard", "vec_id", "nbrs", "v"
    )

    def _beam(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        import heapq

        import numpy as np

        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(
                columns=["q_id", "vec_id", "cosine", "visited", "shard"]
            )
        order = np.argsort(l["vec_id"].to_numpy())
        ids = l["vec_id"].to_numpy()[order].astype(np.int64)
        mat = np.stack(l["v"].to_numpy()[order]).astype(np.float64)
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        pos = {int(i): p for p, i in enumerate(ids)}
        nbrs_o = l["nbrs"].to_numpy()[order]
        adj = [
            [pos[int(u)] for u in nbrs_o[p] if int(u) in pos]
            for p in range(len(ids))
        ]
        entries = list(range(min(4, len(ids))))  # 4 smallest ids
        shard_val = int(l["shard"].iloc[0])
        out = []
        for q_id, qv in zip(r["q_id"], r["qv"]):
            q = np.asarray(qv, dtype=np.float64)
            q = q / np.linalg.norm(q)
            qp = pos.get(int(q_id), -1)  # exclude self when in-corpus
            visited: set[int] = set()
            best: list[tuple[float, int]] = []
            cand: list[tuple[float, int]] = []
            for s in entries:
                if s == qp or s in visited:
                    continue
                visited.add(s)
                sim = float(q @ matn[s])
                heapq.heappush(best, (sim, s))
                heapq.heappush(cand, (-sim, s))
            while len(best) > _GRAPH_EF:
                heapq.heappop(best)
            while cand:
                d, vtx = heapq.heappop(cand)
                if len(best) >= _GRAPH_EF and -d < best[0][0]:
                    break
                for u in adj[vtx]:
                    if u in visited or u == qp:
                        continue
                    visited.add(u)
                    sim = float(q @ matn[u])
                    if len(best) < _GRAPH_EF or sim > best[0][0]:
                        heapq.heappush(cand, (-sim, u))
                        heapq.heappush(best, (sim, u))
                        if len(best) > _GRAPH_EF:
                            heapq.heappop(best)
            top = sorted(best, key=lambda t: (-t[0], ids[t[1]]))[:k]
            for sim, vtx in top:
                out.append(
                    (
                        int(q_id),
                        int(ids[vtx]),
                        float(sim),
                        len(visited),
                        shard_val,
                    )
                )
        return pd.DataFrame(
            out, columns=["q_id", "vec_id", "cosine", "visited", "shard"]
        )

    return (
        left.groupby("shard")
        .cogroup(routed.groupby("shard"))
        .applyInPandas(
            _beam, "q_id long, vec_id long, cosine double, visited long, shard int"
        )
    )


def _route_queries_to_shards(
    q: DataFrame, cents: DataFrame | None, r_shards: int
) -> DataFrame:
    """(q_id, qv) -> (shard, q_id, qv) × min(r_shards, shards):
    nearest cells by the same exact-decimal squared-L2 protocol the
    shard k-means trained with (centroids broadcast — they are tiny).
    cents=None means the single-shard build: everything routes to
    shard 0."""
    from pyspark.sql.types import DecimalType

    if cents is None:
        return q.select(F.lit(0).alias("shard"), "q_id", "qv")
    qx = q.select(
        "q_id", F.posexplode("qv").alias("pos0", "qval")
    ).select("q_id", (F.col("pos0") + 1).alias("pos"), "qval")
    # r15: BIGINT nano-unit fold (shard rank is ordering-only)
    d = (
        qx.join(F.broadcast(cents), "pos")
        .groupBy("q_id", "cid")
        .agg(
            F.sum(
                _nano9_long(
                    (F.col("qval") - F.col("cval"))
                    * (F.col("qval") - F.col("cval"))
                )
            ).alias("dist")
        )
    )
    wq = Window.partitionBy("q_id").orderBy("dist", "cid")
    return (
        d.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= r_shards)
        .select(F.col("cid").cast("int").alias("shard"), "q_id")
        .join(q, "q_id")
        .select("shard", "q_id", "qv")
    )


def _graph_recall_frame(
    spark: SparkSession,
    sf_dir: str,
    pred: str,
    query_pred: str,
    shard_target: int | None,
    ident: str,
    r_shards: int,
    closure_eps: float = 0.0,
    delta_batch_pred: str | None = None,
) -> DataFrame:
    """Shared recall harness for the graph-ANN dials: build (or read)
    the sharded graph, route queries, beam per (query, shard), merge
    a global top-k (deduped by vec_id — closure replicas surface the
    same neighbor from two shards), and measure against in-plan exact
    brute force. ``visited`` sums over the query's routed shards
    (each visit is one exact distance — the same unit as the IVF
    dials' routed rows, so a replica visited in two shards honestly
    counts twice); scan_fraction divides by the FULL corpus size, and
    ``replication`` reports graph memberships per vector (1.0 without
    closure — the storage side of the closure trade).

    With ``delta_batch_pred`` the harness measures the DELTA-GROWN
    graph: build on ``pred``, append the batch through
    append_to_ann_graph, then probe the merge-on-read adjacency with
    the brute-force ground truth over the UNION corpus — so the
    deferred batch-internal edges cost shows up as measured recall,
    not as a claim."""
    if delta_batch_pred is None:
        graph, assign, cents = ann_graph_tables(
            spark, sf_dir, pred, shard_target, ident, closure_eps
        )
        corpus_pred = pred
    else:
        append_to_ann_graph(
            spark, sf_dir, pred, delta_batch_pred, shard_target, ident,
            closure_eps,
        )
        target = shard_target or _GRAPH_SHARD_TARGET
        tag = _graph_tag(sf_dir, pred, target, ident, closure_eps)
        graph = _graph_adjacency(spark, tag)
        assign = spark.table(f"ann_gassign_{tag}")
        c_name = f"ann_gcents_{tag}"
        cents = (
            spark.table(c_name)
            if spark.catalog.tableExists(c_name)
            else None
        )
        corpus_pred = f"({pred}) OR ({delta_batch_pred})"
    e = load_table(spark, sf_dir, "embeddings").filter(corpus_pred)
    vecs = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = vecs.count()
    n_shards = graph.agg(F.countDistinct("shard")).collect()[0][0]
    q = e.filter(query_pred).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    if r_shards <= 1:
        # in-corpus queries route to their OWN cell via the assignment
        routed = q.join(
            assign.select(F.col("vec_id").alias("q_id"), "shard"), "q_id"
        ).select("shard", "q_id", "qv")
    else:
        routed = _route_queries_to_shards(q, cents, r_shards)
    from grapho_spark.sparkutil import materialize

    routed = materialize(routed)
    res = _graph_beam_results(spark, graph, vecs, routed, k=3)
    w_g = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    top = (
        # a closure replica found in BOTH probed shards is one result,
        # not two — dedup by (q_id, vec_id) before ranking so a
        # duplicate can't burn two of the three top-k slots
        res.groupBy("q_id", "vec_id")
        .agg(F.max("cosine").alias("cosine"))
        .withColumn("rn", F.row_number().over(w_g))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
    )
    visited = (
        res.groupBy("q_id", "shard")
        .agg(F.max("visited").alias("v1"))
        .groupBy("q_id")
        .agg(F.sum("v1").alias("visited"))
    )
    qv = q.select("q_id", F.col("qv").alias("qv_")).withColumn("sq", _snorm("qv_"))
    base = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("se"),
    )
    bf = (
        F.broadcast(qv)
        .crossJoin(base)
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", _cosine_prenorm("qv_", "ev", "sq", "se").alias("cosine"))
    )
    w_bf = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    bf_top = (
        bf.withColumn("rn", F.row_number().over(w_bf))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
    )
    inter = top.join(bf_top, ["q_id", "vec_id"])
    # routing ceiling (the scaled-sizing dial's honesty column): the
    # fraction of TRUE top-3 neighbors living in a shard the query
    # probed — the beam can never beat it, so recall ≈ ceiling proves
    # a multi-shard loss is k-means routing geometry, not the graph
    # or the beam (on these near-uniform vectors boundary neighbors
    # fall in unprobed cells exactly as the IVF dials measured).
    # Membership comes from the GRAPH table, not the primary
    # assignment, so closure replicas raise the ceiling they exist to
    # raise (identical to the assignment when closure is off).
    membership = graph.select("shard", "vec_id")
    reachable = (
        bf_top.join(membership, "vec_id")
        .join(routed.select("q_id", "shard"), ["q_id", "shard"])
        .groupBy("q_id", "vec_id")
        .agg(F.lit(1).alias("one"))
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("reach"))
    )
    memb_rows = graph.count()
    return (
        q.select("q_id")
        .join(
            inter.groupBy("q_id").agg(F.count(F.lit(1)).alias("m")),
            "q_id",
            "left",
        )
        .join(visited, "q_id", "left")
        .join(reachable, "q_id", "left")
        .agg(
            F.lit(int(_GRAPH_DEG)).cast("long").alias("graph_degree"),
            F.lit(int(_GRAPH_EF)).cast("long").alias("ef"),
            F.lit(int(n_shards)).cast("long").alias("n_shards"),
            F.lit(int(r_shards)).cast("long").alias("probed_shards"),
            F.count(F.lit(1)).alias("n_queries"),
            F.round(
                F.sum(F.coalesce("m", F.lit(0)))
                / (F.lit(3.0) * F.count(F.lit(1))),
                6,
            ).alias("avg_recall"),
            F.round(
                F.sum(F.coalesce("reach", F.lit(0)))
                / (F.lit(3.0) * F.count(F.lit(1))),
                6,
            ).alias("route_ceiling"),
            F.round(
                F.avg(F.coalesce("visited", F.lit(0))) / F.lit(float(n)), 4
            ).alias("scan_fraction"),
            F.round(F.lit(memb_rows / float(n)), 4).alias("replication"),
        )
    )


@query("embedding_graph_beam_recall")
def embedding_graph_beam_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-ANN dial: best-first beam search (ef=_GRAPH_EF) over the
    persisted proximity graph, measured against in-plan exact brute
    force — recall@3 plus the scan fraction (distinct vectors VISITED
    per query / corpus; a visit IS the unit of work, one exact
    distance each, so the accounting matches the IVF dial's
    routed-rows metric). The r13 frontier measurement landed at ~0.9
    recall near 0.35 visited on this synthetic corpus — the point IVF
    routing cannot reach (geometry-capped ~0.82; see
    embedding_ann_scaled_sizing's route_ceiling). r14: the graph
    builds by NN-descent and the beam fans out per (query, shard)
    via a cogrouped applyInPandas with a global top-k merge — no
    driver-side collect at any corpus size (VERDICT r13 #1); at
    default sizing this corpus is one shard, so the recall bar is
    unchanged.

    Rows-only (like the sibling IVF dial, and for the same reason):
    the in-plan brute force IS the ground truth; re-specifying a beam
    search in SQL would test nothing. Kept out of bench.py's quality
    dials deliberately — the scaled-sizing dial already regression-
    gates ANN quality and this adds an index build to every bench
    run; the parity sweep still executes it end-to-end per round."""
    return _graph_recall_frame(
        spark, sf_dir, "vec_id >= 0", "vec_id % 97 = 0",
        shard_target=None, ident="graph", r_shards=1,
    )


@query("embedding_graph_sharded_recall")
def embedding_graph_sharded_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-shard graph-ANN dial (VERDICT r13 #1's done-bar): force
    3 SPANN-style shards on the same corpus (shard_target = n/3) and
    probe the 2 nearest cells per query, each beam touching only its
    cells' subgraphs. This is the 100-TB shape: cells are independent
    build units, query fan-out is one Arrow batch per (cell, routed
    queries), and the top-k merge is an ordinary window.

    Measured at sf0.1: recall 0.825 against route_ceiling 0.841 —
    the beam recovers 98.1% of what 2-of-3 k-means routing admits
    (vs 0.937 single-shard), so the gap to single-shard is PROVEN
    in-band to be routing geometry on these near-uniform vectors
    (boundary neighbors fall in the unprobed cell — the exact
    phenomenon the IVF dials' route_ceiling documents).
    embedding_graph_closure_recall is the same dial with SPANN's
    closure multi-assignment buying that ceiling back. Rows-only for
    the same reason as the sibling dial (the in-plan brute force is
    the ground truth)."""
    import math

    n = load_table(spark, sf_dir, "embeddings").count()
    target = max(50, math.ceil(n / 3))
    return _graph_recall_frame(
        spark, sf_dir, "vec_id >= 0", "vec_id % 97 = 0",
        shard_target=target, ident="graphsh", r_shards=2,
    )


@query("embedding_graph_closure_recall")
def embedding_graph_closure_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The sharded graph-ANN dial with SPANN closure multi-assignment
    (Chen et al., NeurIPS'21): boundary vectors whose second-nearest
    centroid is within (1+eps) of their nearest join BOTH subgraphs
    (cap 2), so the true neighbors that 2-of-3 hard routing loses
    become reachable — the known storage-for-recall trade, bought
    where it is cheap: a beam probe's work is ef-bounded, NOT
    proportional to the replicated shard size (unlike the IVF
    posting-list spill variants r13's frontier study measured
    NET-worse at matched scan — replication inflates every posting
    scan but only nudges a beam's frontier). ``replication`` reports
    the storage cost in-plan; ``route_ceiling`` shows how much of the
    hard-routing loss the closure bought back. Same 3-shard/probe-2
    geometry as embedding_graph_sharded_recall, so the two dials diff
    directly. Measured at sf0.1 (PERF.md r14 frontier table):
    eps=0.01 lifts recall 0.825 → 0.889 (ceiling 0.841 → 0.905,
    recall/ceiling 0.982) at replication 1.296 and scan 0.4618 →
    0.5183; larger eps degenerates to ~2x full duplication on this
    near-uniform corpus and is strictly worse than single-shard.
    Rows-only like its siblings (the in-plan brute force is the
    ground truth)."""
    import math

    n = load_table(spark, sf_dir, "embeddings").count()
    target = max(50, math.ceil(n / 3))
    return _graph_recall_frame(
        spark, sf_dir, "vec_id >= 0", "vec_id % 97 = 0",
        shard_target=target, ident="graphshc", r_shards=2,
        closure_eps=_GRAPH_CLOSURE_EPS,
    )


@query("embedding_graph_delta_recall")
def embedding_graph_delta_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta-ingest dial for the proximity graph: build on 80% of the
    corpus (vec_id % 5 != 0), append the remaining 20% through
    append_to_ann_graph (FreshDiskANN-style insert — beam-sourced
    pools, RobustPrune, reverse-edge merge with overflow re-prune,
    all landing in the merge-on-read ``ann_gdelta`` generation
    table), then measure recall@3 + scan over the UNION corpus with
    in-plan brute force. The number this dial exists to watch is the
    delta-grown recall vs embedding_graph_beam_recall's fresh-built
    recall on the same full corpus: the append defers batch-internal
    edges (a batch vector's pool comes from the standing graph), and
    that deferral must cost measured recall points, not silent
    degradation — ann_graph_health meters when the accumulated
    deferral warrants the compacting rebuild. Measured at sf0.1:
    delta-grown 0.921 recall @ 0.364 scan vs fresh-built 0.937 @
    0.342 on the identical corpus/queries — a 20% ingest costs ~1.6
    points (PERF.md r14). Rows-only like its siblings (the in-plan
    brute force is the ground truth)."""
    return _graph_recall_frame(
        spark, sf_dir, "vec_id % 5 != 0", "vec_id % 97 = 0",
        shard_target=None, ident="graphd", r_shards=1,
        delta_batch_pred="vec_id % 5 = 0",
    )


# Dial configurations for embedding_ivf_kmeans_recall: (cells, Lloyd
# recompute rounds, cells probed). (4,1,1) is the r7 baseline config
# (own-cell routing, measured 0.40 at sf0.1); (16,3,4) probes the same
# 25% corpus fraction through 4 of 16 finer-trained cells — measured
# ~0.70 at sf0.1, the "raise k-means quality" comparison made explicit.
_DIAL_CONFIGS = [(4, 1, 1), (16, 3, 4)]


def _duck_dial_block(k: int, rounds: int, nprobe: int) -> str:
    """One dial configuration as a SELECT over generated k-means CTEs
    (raw un-normalized vectors — the historical dial protocol)."""
    p = f"dk{k}r{rounds}_"
    return (
        _duck_kmeans_chain(p, "vecs", k, rounds)
        + f""",
{p}qd AS (
  SELECT v.vec_id AS q_id, c.cid,
         SUM(CAST(round((v.val - c.cval) * (v.val - c.cval), 9)
                  AS DECIMAL(28,9))) AS dist
  FROM vecs v JOIN {p}c{rounds} c USING (pos)
  WHERE v.vec_id % 97 = 0
  GROUP BY v.vec_id, c.cid),
{p}route AS (
  SELECT q_id, cid FROM (
    SELECT q_id, cid,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, cid) AS rk
    FROM {p}qd) WHERE rk <= {nprobe}),
{p}scored AS (
  SELECT q.q_id, e.vec_id,
         {_DUCK_COS.format(a="q.qv", b="e.embedding::DOUBLE[]")} AS cosine
  FROM queries q
  JOIN {p}route r ON r.q_id = q.q_id
  JOIN {p}assign ca ON ca.cid = r.cid
  JOIN embeddings e ON e.vec_id = ca.vec_id AND e.vec_id <> q.q_id),
{p}top AS (
  SELECT q_id, vec_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY cosine DESC, vec_id) AS rn
        FROM {p}scored)
  WHERE rn <= 3),
{p}matched AS (
  SELECT q.q_id, COUNT(i.vec_id) AS m
  FROM queries q
  LEFT JOIN (SELECT ct.q_id, ct.vec_id FROM {p}top ct
             JOIN bf_top bt ON ct.q_id = bt.q_id AND ct.vec_id = bt.vec_id) i
    ON i.q_id = q.q_id
  GROUP BY q.q_id),
{p}out AS (
  SELECT {k} AS cells, {rounds} AS lloyd_rounds, {nprobe} AS n_probe,
         COUNT(*) AS n_queries,
         round(SUM(m) * 1.0 / (3 * COUNT(*)), 6) AS avg_recall,
         CAST(SUM(CASE WHEN m = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_perfect
  FROM {p}matched)"""
    )


_DUCK_DIAL_SQL = (
    """
WITH vecs AS (
  SELECT vec_id, i AS pos, embedding[i] AS val
  FROM embeddings, range(1, 65) t(i)),
queries AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % 97 = 0),
bf_scored AS (
  SELECT q.q_id, e.vec_id,
         """
    + _DUCK_COS.format(a="q.qv", b="e.embedding::DOUBLE[]")
    + """ AS cosine
  FROM queries q JOIN embeddings e ON e.vec_id <> q.q_id),
bf_top AS (
  SELECT q_id, vec_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY cosine DESC, vec_id) AS rn
        FROM bf_scored)
  WHERE rn <= 3),
"""
    + ",\n".join(_duck_dial_block(k, r, np) for k, r, np in _DIAL_CONFIGS)
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT * FROM dk{k}r{r}_out" for k, r, np in _DIAL_CONFIGS
    )
)


@query("embedding_ivf_kmeans_recall", oracle=_DUCK_DIAL_SQL)
def embedding_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of IVF with K-MEANS-TRAINED cells, one row per
    (cells, lloyd_rounds, n_probe) configuration: queries route to
    their n_probe nearest cell centroids, candidates score by exact
    cosine within the routed cells, recall measured against exact
    brute force. The r8 parameterization answers "does raising k-means
    quality raise recall?" with a measured pair at EQUAL scan budget
    (25% of corpus): (4 cells, 1 round, probe 1) reads 0.40 at sf0.1
    while (16 cells, 3 rounds, probe 4) reads ~0.70 — finer
    well-trained cells + multi-probe beat coarse cells at the same
    cost. Together with embedding_ivf_recall (label cells 0.08) and
    embedding_ivfpq_recall (full index stack 0.97 post-r9-retune) the dials quantify
    exactly where accuracy goes: partitioning, quantization, or
    metric mismatch.

    Scale: assignment is the k-means broadcast argmin; the in-cell
    scoring joins each query to n_probe/k of the corpus; brute force
    (the expensive truth side) runs on the sampled query set only."""
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("se"),
    )
    q = e.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("sq"),
    )
    bf_scored = (
        F.broadcast(q)
        .crossJoin(base)
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", _cosine_prenorm("qv", "ev", "sq", "se").alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    bf_top = (
        bf_scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
    )
    from grapho_spark.sparkutil import materialize

    bf_top = materialize(bf_top)

    # train the dial configurations' Lloyd chains concurrently — they
    # are independent and memoized per config (VERDICT r13 #5)
    _prebuild_parallel(
        [
            lambda k=k, r=rounds: _kmeans_pair(
                spark, sf_dir, k, r, normalized=False
            )
            for k, rounds, _ in _DIAL_CONFIGS
        ]
    )
    outs = []
    for k, rounds, nprobe in _DIAL_CONFIGS:
        assign, cents = _kmeans_pair(spark, sf_dir, k, rounds, normalized=False)
        q_expl = (
            e.filter(F.col("vec_id") % 97 == 0)
            .select(
                F.col("vec_id").alias("q_id"),
                F.posexplode("embedding").alias("pos0", "val"),
            )
            .select("q_id", (F.col("pos0") + 1).alias("pos"), "val")
        )
        # r15: BIGINT nano-unit fold (route rank is ordering-only)
        q_dists = (
            q_expl.join(F.broadcast(cents), "pos")
            .groupBy("q_id", "cid")
            .agg(
                F.sum(
                    _nano9_long(
                        (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
                    )
                ).alias("dist")
            )
        )
        w_route = Window.partitionBy("q_id").orderBy("dist", "cid")
        route = (
            q_dists.withColumn("rk", F.row_number().over(w_route))
            .filter(F.col("rk") <= nprobe)
            .select("q_id", "cid")
        )
        cellmates = assign.withColumnRenamed("vec_id", "c_vid")
        cell_scored = (
            F.broadcast(route.join(q, "q_id"))
            .join(cellmates, "cid")
            .filter(F.col("c_vid") != F.col("q_id"))
            .join(base, F.col("c_vid") == base.vec_id)
            .select("q_id", "vec_id", _cosine_prenorm("qv", "ev", "sq", "se").alias("cosine"))
        )
        cell_top = (
            cell_scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("q_id", "vec_id")
        )
        inter = cell_top.join(bf_top, ["q_id", "vec_id"])
        matched = (
            q.select("q_id")
            .join(
                inter.groupBy("q_id").agg(F.count(F.lit(1)).alias("m")),
                "q_id",
                "left",
            )
            .select("q_id", F.coalesce("m", F.lit(0)).alias("m"))
        )
        agg = matched.agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.round(
                F.sum("m") * F.lit(1.0) / (F.lit(3) * F.count(F.lit(1))), 6
            ).alias("avg_recall"),
            F.sum(F.when(F.col("m") == 3, 1).otherwise(0))
            .cast("long")
            .alias("n_perfect"),
        )
        outs.append(
            agg.select(
                F.lit(k).alias("cells"),
                F.lit(rounds).alias("lloyd_rounds"),
                F.lit(nprobe).alias("n_probe"),
                "n_queries",
                "avg_recall",
                "n_perfect",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# --------------------------------------------------------------------------
# Stream-facing view of the persisted ANN index (r8): the probe as a
# pure MAP-SIDE expression chain over stream-static joins, so a query
# STREAM can search the standing index with zero stateful operators.
# --------------------------------------------------------------------------


def ann_index_stream_tables(spark: SparkSession, sf_dir: str):
    """The persisted index reshaped for stream-static probing:

    - a ONE-ROW broadcast frame (join key ``jk``) carrying the
      _ANN_CELLS cell centroids and the trained codebook as nested
      arrays —
      genuinely KB-sized routing state, the thing a production stream
      keeps broadcast on every executor;
    - a PER-CELL table ``(cell, members)`` where members is the cell's
      (vec_id, 8 PQ codes ordered by subspace) list — the streaming
      probe left-joins it once per routed cell (the LSH probe's
      per-band-join pattern), so per-query state is bounded by cell
      size exactly like a batch probe's bucketed scan.

    Built from the stored tables; memoized per session."""
    from grapho_spark.sparkutil import memo_table

    def build_cb() -> DataFrame:
        cents, book, _ = ann_index_tables(spark, sf_dir)
        cents_arr = (
            cents.groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "cval"))),
                    lambda s: s.getField("cval"),
                ).alias("cvec")
            )
            .agg(F.sort_array(F.collect_list(F.struct("cid", "cvec"))).alias("cents"))
        )
        book_arr = (
            book.groupBy("sub", "grp")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "cw"))),
                    lambda s: s.getField("cw"),
                ).alias("cwv")
            )
            .agg(
                F.sort_array(F.collect_list(F.struct("sub", "grp", "cwv"))).alias(
                    "books"
                )
            )
        )
        return cents_arr.crossJoin(book_arr).withColumn("jk", F.lit(1))

    def build_cells() -> DataFrame:
        _, _, codes = ann_index_tables(spark, sf_dir)
        return (
            codes.groupBy("cell", "vec_id")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("sub", "code"))),
                    lambda s: s.getField("code"),
                ).alias("codes")
            )
            .groupBy("cell")
            .agg(F.sort_array(F.collect_list(F.struct("vec_id", "codes"))).alias("members"))
        )

    return (
        memo_table(spark, f"ann_stream_cb:{sf_dir}", build_cb),
        memo_table(spark, f"ann_stream_cells:{sf_dir}", build_cells),
    )


def ann_probe_mapside(
    q_df: DataFrame, static_cb: DataFrame, cell_tbl: DataFrame
) -> DataFrame:
    """ADC top-3 against the persisted index as a STATELESS plan:
    normalize, route, LUT, score and rank entirely inside array
    expressions on each query row, with the index arriving through
    stream-static joins (the one-row centroid/codebook frame plus one
    left join per routed cell). Works identically for a batch or a
    STREAMING ``q_df`` (vec_id, embedding) — no aggregation, no
    window, no state store; output is append-safe.

    Every distance follows the index's exact protocol, executed (r15)
    in exact BIGINT fixed-point instead of interpreted BigDecimal:
    HOF lambdas evaluate INTERPRETED per element, where decimal
    arithmetic is the slowest possible path. Routing terms are exact
    9dp nano-units — the integer (sqf + 500) DIV 1000 equals the
    engine round() away from true ties, and the ~1% tie rows (exact
    femto square % 1000 == 500, decidable in integer micro-units)
    reconstruct the original doubles (CAST(m AS DOUBLE)/1e6 is exactly
    the 6dp double the micro-unit came from) and keep the BigDecimal
    round. LUT/ADC folds are pure exact integers (no rounding exists
    in the decimal protocol there), and integer sums are order-free,
    so the map-side folds equal the batch groupBy sums bit-for-bit —
    the oracle is the same generated SQL the batch probe family uses,
    checked by value hash."""
    ed = "CAST(embedding AS ARRAY<DOUBLE>)"
    dot = _SPARK_DOT.format(a=ed, b=ed)
    # r16 (guide §2.6/§1.2): the per-row probe folds below are
    # heavyweight INTERPRETED expressions (~17ms/row measured at
    # sf0.1), and a query micro-batch arriving as one file/offset range
    # otherwise runs them on 1-2 scan tasks — measured 1.1s -> 0.5s on
    # the 63-row batch twin by spreading the (tiny) query rows across
    # cluster parallelism before the fold. Keyless round-robin on a
    # deterministic source; values are per-row, so the result is
    # partitioning-independent.
    q_df = q_df.repartition(q_df.sparkSession.sparkContext.defaultParallelism)
    q = (
        q_df.select(
            F.col("vec_id").alias("q_id"),
            F.expr(f"transform({ed}, x -> round(x / sqrt({dot}), 6))").alias("nq"),
        )
        .withColumn("jk", F.lit(1))
        .join(F.broadcast(static_cb), "jk")
    )
    _sq_tie_sql = (
        "CASE WHEN pmod((x - y) * (x - y), 1000) = 500 "
        "THEN CAST(FLOOR(round((CAST(x AS DOUBLE) / 1000000 - "
        "CAST(y AS DOUBLE) / 1000000) * (CAST(x AS DOUBLE) / 1000000 - "
        "CAST(y AS DOUBLE) / 1000000), 9) * 1000000000 + 0.5D) AS BIGINT) "
        "ELSE ((x - y) * (x - y) + 500) DIV 1000 END"
    )
    q = q.withColumn(
        "qm", F.expr("transform(nq, x -> CAST(FLOOR(x * 1000000 + 0.5D) AS BIGINT))")
    ).withColumn(
        "routed",
        F.expr(
            f"""slice(array_sort(transform(cents, c -> struct(
                 aggregate(zip_with(qm,
                           transform(c.cvec, v -> CAST(FLOOR(v * 1000000 + 0.5D) AS BIGINT)),
                           (x, y) -> {_sq_tie_sql}),
                           CAST(0 AS BIGINT),
                           (a, t) -> a + t) AS d,
                 c.cid AS cid))), 1, {_ANN_NPROBE})"""
        ),
    ).withColumn(
        # keyed sub*K+grp: a TRAINED codebook may have dropped empty
        # codewords, so positions aren't dense — a map lookup is
        # position-free (and O(1), the production LUT shape). Values
        # are exact BIGINT femto-units; the 16-lookup ADC total stays
        # < ~1e14 (|components| < 1), inside both long range and 2^53
        "lut",
        F.expr(
            f"""map_from_entries(transform(books, b -> struct(
                 CAST(b.sub * {_ANN_PQ_K} + b.grp AS BIGINT) AS k,
                 aggregate(zip_with(slice(qm, b.sub * 8 + 1, 8),
                           transform(b.cwv, v -> CAST(v * 1000000 AS BIGINT)),
                           (x, y) -> (x - y) * (x - y)),
                           CAST(0 AS BIGINT),
                           (a, t) -> a + t) AS v)))"""
        ),
    )
    for k in range(1, _ANN_NPROBE + 1):
        ct = cell_tbl.select(
            F.col("cell").alias(f"cell_{k}"), F.col("members").alias(f"members_{k}")
        )
        q = q.withColumn(f"cell_{k}q", F.expr(f"element_at(routed, {k}).cid")).join(
            ct, F.col(f"cell_{k}q") == F.col(f"cell_{k}"), "left"
        )
    members = ", ".join(
        f"coalesce(members_{k}, CAST(array() AS ARRAY<STRUCT<vec_id: BIGINT, codes: ARRAY<BIGINT>>>))"
        for k in range(1, _ANN_NPROBE + 1)
    )
    scored = q.withColumn(
        "top3",
        F.expr(
            f"""slice(array_sort(transform(
                 filter(concat({members}), m -> m.vec_id != q_id),
                 m -> struct(
                   CAST(aggregate(sequence(0, {_PQ_M - 1}),
                        CAST(0 AS BIGINT),
                        (a, s) -> a + element_at(lut,
                          CAST(s * {_ANN_PQ_K} + element_at(m.codes, s + 1) AS BIGINT)))
                     AS DOUBLE) / 1000000000000 AS adc_dist,
                   m.vec_id AS vec_id))), 1, 3)"""
        ),
    )
    return scored.select(
        "q_id", F.explode("top3").alias("hit")
    ).select("q_id", F.col("hit.vec_id").alias("vec_id"), F.col("hit.adc_dist").alias("adc_dist"))


_NEARDUP_TAU = 0.45


@query(
    "embedding_indexed_neardup_pairs",
    oracle=f"""
WITH {_duck_ann_index_ctes("TRUE")},
{_duck_ann_probe_ctes("TRUE")}
SELECT DISTINCT least(q_id, vec_id) AS u,
                greatest(q_id, vec_id) AS v,
                cosine
FROM ai_top
WHERE cosine >= {_NEARDUP_TAU}
""",
)
def embedding_indexed_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate detection THROUGH the persisted ANN
    index: every corpus vector probes the standing index (routed
    cells, stored codes, exact re-rank of the shortlist) and pairs
    whose re-ranked cosine clears {_NEARDUP_TAU} are emitted as
    deduped (u < v) candidates. This is how embedding-based dedup
    actually runs at 100 TB — the brute-force scan
    (embedding_neardup_pairs) is O(n^2) in the corpus; probing the
    index is O(n x cell) with the same standing tables every search
    query uses, at the cost of index recall (pairs the router misses
    are the recall gap the dials measure — by design this is the
    ANN-candidate stage; an exactness-critical dedup re-verifies
    survivors, the MinHash pipeline's verify-then-act pattern).

    Scale: with the whole corpus as the query set, the routed-query
    and LUT tables are corpus-sized, so the probe runs WITHOUT
    broadcast hints — the ADC join shuffles on cell (matching the
    codes table's bucketing) and the re-rank joins shuffle on their
    keys; per-vector work stays n_probe x cell-sized. The pair-dedup
    is one distinct on (u, v).
    """
    cents, book, codes = ann_index_tables(spark, sf_dir)
    top = _ann_probe(
        spark,
        sf_dir,
        cents,
        book,
        codes,
        query_pred="vec_id IS NOT NULL",
        hint_broadcast=False,
    )
    return (
        top.filter(F.col("cosine") >= _NEARDUP_TAU)
        .select(
            F.least("q_id", "vec_id").alias("u"),
            F.greatest("q_id", "vec_id").alias("v"),
            "cosine",
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023): semantic deduplication by k-means
# clustering + within-cluster near-duplicate election. The published
# recipe computes all pairwise similarities inside each cluster; the
# scalable variant here orders cluster members by distance-to-centroid
# (near-identical vectors have near-identical centroid distances, so
# semantic duplicates are adjacent in that order) and compares each
# member only against the SEMDEDUP_WINDOW predecessors — fan-out is
# hard-bounded per vector instead of quadratic per cell.
# --------------------------------------------------------------------------

SEMDEDUP_WINDOW = 32  # predecessors compared per member (bounded fan-out)
# coverage-curve window steps measured by embedding_semdedup_coverage
_SEMDEDUP_COV_WINDOWS = (32, 64, 128)
_SEMDEDUP_COV_WINDOWS_SQL = ", ".join(str(w) for w in _SEMDEDUP_COV_WINDOWS)
SEMDEDUP_TAU = 0.35  # cosine threshold, fit to the fixture geometry
# (max pairwise cosine is ~0.48/0.51/0.60 at sf0.001/0.01/0.1 — the
# near-dup battery's 0.6 would make every stage of this query vacuous)


def _semdedup_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cid, rn): members of each shared k-means cell ranked
    by exact-decimal distance to their OWN centroid (ties broken by
    vec_id) — the ordering both the SemDeDup election and its
    coverage dial consume. Memoized: both sides of the election's
    pair join AND the dial read one materialized copy (the
    project-collapse trap would otherwise recompute the decimal
    distance agg + window once per consumer)."""
    from pyspark.sql.types import DecimalType

    from grapho_spark.sparkutil import memo_table

    def build() -> DataFrame:
        assign, cents = _kmeans_pair(spark, sf_dir, 4, 1)
        e = load_table(spark, sf_dir, "embeddings")
        vecs = e.select(
            "vec_id", F.posexplode("embedding").alias("pos0", "val")
        ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "val")
        # r15: BIGINT nano-unit fold (the per-cell centroid-distance
        # rank is ordering-only; dist never leaves the frame)
        own = (
            vecs.join(assign, "vec_id")
            .join(F.broadcast(cents), ["cid", "pos"])
            .groupBy("vec_id", "cid")
            .agg(
                F.sum(
                    _nano9_long(
                        (F.col("val") - F.col("cval"))
                        * (F.col("val") - F.col("cval"))
                    )
                ).alias("dist")
            )
        )
        rank_w = Window.partitionBy("cid").orderBy("dist", "vec_id")
        return own.withColumn("rn", F.row_number().over(rank_w)).select(
            "vec_id", "cid", "rn"
        )

    return memo_table(spark, f"semdedup_ranked:{sf_dir}", build)


@query(
    "embedding_semantic_dedup",
    oracle=f"""
WITH dims AS (SELECT UNNEST(range(1, {DIM + 1})) AS pos),
vecs AS (
  SELECT vec_id, embedding[d.pos] AS val, d.pos
  FROM embeddings CROSS JOIN dims d),
{_duck_kmeans_chain("sd", "vecs", 4, 1)},
own AS (
  SELECT f.vec_id, f.cid, f.dist
  FROM sddf f JOIN sdassign a USING (vec_id, cid)),
ranked AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS rn
  FROM own),
pairs AS (
  SELECT a.cid, a.vec_id AS vi, b.vec_id AS vj
  FROM ranked a JOIN ranked b
    ON a.cid = b.cid AND b.rn < a.rn AND a.rn - b.rn <= {SEMDEDUP_WINDOW}),
scored AS (
  SELECT p.cid, p.vi,
         {_DUCK_COS.format(a="x1.embedding::DOUBLE[]", b="x2.embedding::DOUBLE[]")}
           AS cosine
  FROM pairs p
  JOIN embeddings x1 ON x1.vec_id = p.vi
  JOIN embeddings x2 ON x2.vec_id = p.vj),
dropped AS (
  SELECT DISTINCT cid, vi FROM scored WHERE cosine >= {SEMDEDUP_TAU}),
m AS (SELECT cid, COUNT(*) AS n_members FROM sdassign GROUP BY cid),
dd AS (SELECT cid, COUNT(*) AS n_dropped FROM dropped GROUP BY cid)
SELECT m.cid AS cluster_id,
       CAST(m.n_members AS BIGINT) AS n_members,
       CAST(COALESCE(dd.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(m.n_members - COALESCE(dd.n_dropped, 0) AS BIGINT) AS n_kept,
       round(CAST(m.n_members - COALESCE(dd.n_dropped, 0) AS DOUBLE)
             / m.n_members, 6) AS keep_rate
FROM m LEFT JOIN dd USING (cid)
ORDER BY cluster_id
""",
)
def embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means cells (the shared memoized deterministic
    Lloyd assignment) + within-cell near-duplicate election. Members
    are ranked by exact-decimal distance to their own centroid; each
    member is compared against its SEMDEDUP_WINDOW=32 rank-predecessors
    and dropped if any predecessor's cosine >= SEMDEDUP_TAU=0.35 — the
    earliest (closest-to-centroid, then lowest id) copy of a semantic
    duplicate group survives. Returns the per-cluster keep/drop
    manifest.

    Scale: candidate fan-out is <= 2xSEMDEDUP_WINDOW per vector via
    rank-block bucketing (each member joins only its own and the
    previous rank block) — linear in corpus size, never the published
    per-cell quadratic; the centroid-distance rank reuses the k-means
    shuffle key. At 100 TB, k scales with N to hold cells at ~10^4
    members and this plan is unchanged. Ordering by centroid distance
    is the standard locality trick: true near-duplicates differ by
    epsilon, so their centroid distances differ by at most epsilon and
    they land inside the same comparison window.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ranked = _semdedup_ranked(spark, sf_dir).select(
        "vec_id",
        "cid",
        "rn",
        ((F.col("rn") - 1) / SEMDEDUP_WINDOW).cast("long").alias("blk"),
    )
    # r15: sqrt(self-dot) hoisted to the vector table — computed once
    # per vector, not once per pair (the per-pair fold is 3 aggregates
    # of which 2 are per-vector; see _cosine_prenorm, bit-identical)
    ev = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("sn"),
    )
    later = (
        ranked.join(ev, "vec_id")
        .select(
            F.col("vec_id").alias("vi"),
            "cid",
            F.col("rn").alias("ri"),
            F.col("ev").alias("av"),
            F.col("sn").alias("sa"),
            F.explode(F.array(F.col("blk"), F.col("blk") - 1)).alias("pblk"),
        )
    )
    earlier = ranked.join(ev, "vec_id").select(
        F.col("vec_id").alias("vj"),
        F.col("cid").alias("cj"),
        F.col("rn").alias("rj"),
        F.col("blk").alias("bj"),
        F.col("ev").alias("bv"),
        F.col("sn").alias("sb"),
    )
    pairs = later.join(
        earlier,
        (F.col("cid") == F.col("cj"))
        & (F.col("pblk") == F.col("bj"))
        & (F.col("rj") < F.col("ri"))
        & (F.col("ri") - F.col("rj") <= SEMDEDUP_WINDOW),
    ).select("cid", "vi", _cosine_prenorm("av", "bv", "sa", "sb").alias("cosine"))
    dropped = (
        pairs.filter(F.col("cosine") >= SEMDEDUP_TAU).select("cid", "vi").distinct()
    )
    m = ranked.groupBy("cid").agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    dd = dropped.groupBy("cid").agg(F.count(F.lit(1)).cast("long").alias("n_dropped"))
    return (
        m.join(dd, "cid", "left")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            (F.col("n_members") - F.coalesce("n_dropped", F.lit(0)))
            .cast("long")
            .alias("n_kept"),
            F.round(
                (F.col("n_members") - F.coalesce("n_dropped", F.lit(0))).cast("double")
                / F.col("n_members"),
                6,
            ).alias("keep_rate"),
        )
        .orderBy("cluster_id")
    )


@query(
    "embedding_semdedup_coverage",
    oracle=f"""
WITH dims AS (SELECT UNNEST(range(1, {DIM + 1})) AS pos),
vecs AS (
  SELECT vec_id, embedding[d.pos] AS val, d.pos
  FROM embeddings CROSS JOIN dims d),
{_duck_kmeans_chain("sc", "vecs", 4, 1)},
own AS (
  SELECT f.vec_id, f.cid, f.dist
  FROM scdf f JOIN scassign a USING (vec_id, cid)),
ranked AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS rn
  FROM own),
full_pairs AS (
  SELECT a.vec_id AS vi, a.rn - b.rn AS gap,
         {_DUCK_COS.format(a="x1.embedding::DOUBLE[]", b="x2.embedding::DOUBLE[]")}
           AS cosine
  FROM ranked a JOIN ranked b
    ON a.cid = b.cid AND b.rn < a.rn AND a.vec_id % 7 = 0
  JOIN embeddings x1 ON x1.vec_id = a.vec_id
  JOIN embeddings x2 ON x2.vec_id = b.vec_id),
wins AS (SELECT UNNEST([{_SEMDEDUP_COV_WINDOWS_SQL}]) AS window_size),
n AS (SELECT COUNT(*) AS n_sampled FROM ranked WHERE vec_id % 7 = 0),
f AS (
  SELECT COUNT(DISTINCT vi) AS n_full_dropped
  FROM full_pairs WHERE cosine >= {SEMDEDUP_TAU}),
w AS (
  SELECT ws.window_size, COUNT(DISTINCT p.vi) AS n_window_dropped
  FROM wins ws LEFT JOIN full_pairs p
    ON p.cosine >= {SEMDEDUP_TAU} AND p.gap <= ws.window_size
  GROUP BY ws.window_size)
SELECT CAST(w.window_size AS INTEGER) AS window_size,
       CAST(n.n_sampled AS BIGINT) AS n_sampled,
       CAST(f.n_full_dropped AS BIGINT) AS n_full_dropped,
       CAST(w.n_window_dropped AS BIGINT) AS n_window_dropped,
       round(CAST(w.n_window_dropped AS DOUBLE) / f.n_full_dropped, 6)
         AS window_coverage
FROM w CROSS JOIN n CROSS JOIN f
ORDER BY window_size
""",
)
def embedding_semdedup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage CURVE for the windowed SemDeDup election: on the
    deterministic vec_id % 7 sample, the fraction of members the FULL
    per-cell pairwise scan would drop that a W-predecessor window also
    drops, for W in (32, 64, 128) — the accuracy/cost trade
    of embedding_semantic_dedup as a recorded curve instead of an
    assumption, the exact analogue of the ANN multiprobe recall dial
    (a near-dup missed because its partner sits outside the rank
    window is this operator's recall loss; each extra window step is
    a linear cost increase).

    Scale: the full-pairwise truth side runs only on the ~14% member
    sample (each sampled member against its whole cell) — the recall
    dials' production monitoring shape; the windowed side is read off
    the same sampled pair stream. At 100 TB the sample modulus is the
    knob, exactly as in graph_anf_hyperball's certificate.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ranked = _semdedup_ranked(spark, sf_dir)
    ev = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("sn"),
    )
    a = (
        ranked.filter(F.col("vec_id") % 7 == 0)
        .join(ev, "vec_id")
        .select(
            F.col("vec_id").alias("vi"),
            F.col("cid").alias("ca"),
            F.col("rn").alias("ra"),
            F.col("ev").alias("av"),
            F.col("sn").alias("sa"),
        )
    )
    b = ranked.join(ev, "vec_id").select(
        F.col("vec_id").alias("vj"),
        F.col("cid").alias("cb"),
        F.col("rn").alias("rb"),
        F.col("ev").alias("bv"),
        F.col("sn").alias("sb"),
    )
    pairs = a.join(
        b, (F.col("ca") == F.col("cb")) & (F.col("rb") < F.col("ra"))
    ).select(
        "vi",
        (F.col("ra") - F.col("rb")).alias("gap"),
        _cosine_prenorm("av", "bv", "sa", "sb").alias("cosine"),
    )
    # ONE pass over the sampled pair stream: a conditional distinct
    # count per window step plus the full-scan count, then a stack()
    # unpivot — never a join against the pair stream
    hit = F.col("cosine") >= SEMDEDUP_TAU
    agg = pairs.agg(
        F.countDistinct(F.when(hit, F.col("vi"))).cast("long").alias("full_d"),
        *[
            F.countDistinct(F.when(hit & (F.col("gap") <= w), F.col("vi")))
            .cast("long")
            .alias(f"w{w}")
            for w in _SEMDEDUP_COV_WINDOWS
        ],
    )
    stack_args = ", ".join(f"{w}, w{w}" for w in _SEMDEDUP_COV_WINDOWS)
    ns = (
        ranked.filter(F.col("vec_id") % 7 == 0)
        .agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    )
    return (
        agg.crossJoin(F.broadcast(ns))
        .select(
            F.expr(
                f"stack({len(_SEMDEDUP_COV_WINDOWS)}, {stack_args}) "
                "AS (window_size, n_window_dropped)"
            ),
            "n_sampled",
            F.col("full_d").alias("n_full_dropped"),
        )
        .select(
            F.col("window_size").cast("int").alias("window_size"),
            "n_sampled",
            "n_full_dropped",
            "n_window_dropped",
            F.round(
                F.col("n_window_dropped").cast("double") / F.col("n_full_dropped"), 6
            ).alias("window_coverage"),
        )
        .orderBy("window_size")
    )


@query(
    "corpus_semantic_leakage",
    oracle=f"""
WITH dims AS (SELECT UNNEST(range(1, {DIM + 1})) AS pos),
vecs AS (
  SELECT vec_id, embedding[d.pos] AS val, d.pos
  FROM embeddings CROSS JOIN dims d),
{_duck_kmeans_chain("sl", "vecs", 4, 1)},
splits AS (
  SELECT vec_id, cid,
         CASE WHEN (CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 6))
                    AS BIGINT) % 100) < 80 THEN 'train'
              WHEN (CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 6))
                    AS BIGINT) % 100) < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM slassign),
holdout AS (SELECT vec_id, cid, split FROM splits WHERE split <> 'train'),
train AS (SELECT vec_id, cid FROM splits WHERE split = 'train'),
hits AS (
  SELECT h.split, h.vec_id
  FROM holdout h JOIN train t ON h.cid = t.cid
  JOIN embeddings x1 ON x1.vec_id = h.vec_id
  JOIN embeddings x2 ON x2.vec_id = t.vec_id
  WHERE {_DUCK_COS.format(a="x1.embedding::DOUBLE[]", b="x2.embedding::DOUBLE[]")}
        >= {SEMDEDUP_TAU}),
leaked AS (SELECT split, COUNT(DISTINCT vec_id) AS n_leaked FROM hits GROUP BY split)
SELECT s.split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(ANY_VALUE(l.n_leaked), 0) AS BIGINT) AS n_leaked,
       round(CAST(COALESCE(ANY_VALUE(l.n_leaked), 0) AS DOUBLE) / COUNT(*), 6)
         AS leak_rate
FROM holdout s LEFT JOIN leaked l ON l.split = s.split
GROUP BY s.split
ORDER BY s.split
""",
)
def corpus_semantic_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic train/holdout contamination audit: a val/test document
    whose embedding has a cosine >= SEMDEDUP_TAU=0.35 neighbour in the
    TRAIN split is leaked — the eval set is measuring memorization of
    a semantic duplicate, not generalization. Text-level split-leakage
    (corpus_split_leakage) misses paraphrases; this is the
    embedding-level sibling, run per holdout split over the shared
    k-means cells (vec_id is 1:1 with doc_id in the fixtures, and the
    split hash is corpus_train_val_test_split's md5 protocol — so
    this composes with the text-side split exactly).

    Scale: the scan is (holdout x train) WITHIN each k-means cell —
    the holdout side is ~20% of the corpus and cells are bounded by
    choosing k ~ N/10^4, so the pair stream is (0.2 N) x cell, never
    N^2; the broadcast side of nothing — both sides shuffle once on
    cell id, and the per-cell product is the audit's explicit cost
    knob (same shape as the coverage dial's truth side, which is why
    an audit like this runs scheduled, not per-ingest).
    """
    assign, _ = _kmeans_pair(spark, sf_dir, 4, 1)
    e = load_table(spark, sf_dir, "embeddings")
    ev = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("ev"),
        _snorm("CAST(embedding AS ARRAY<DOUBLE>)").alias("sn"),
    )
    split_bucket = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 6), 16, 10
    ).cast("long") % 100
    split = (
        F.when(split_bucket < 80, "train")
        .when(split_bucket < 90, "val")
        .otherwise("test")
    )
    splits = assign.join(ev, "vec_id").select(
        "vec_id", "cid", "ev", "sn", split.alias("split")
    )
    holdout = splits.filter(F.col("split") != "train").select(
        F.col("vec_id").alias("hid"), "cid", F.col("ev").alias("hv"), F.col("sn").alias("sh"), "split"
    )
    train = splits.filter(F.col("split") == "train").select(
        F.col("cid").alias("ct"), F.col("ev").alias("tv"), F.col("sn").alias("st")
    )
    hits = (
        holdout.join(train, F.col("cid") == F.col("ct"))
        .filter(_cosine_prenorm("hv", "tv", "sh", "st") >= SEMDEDUP_TAU)
        .select("split", "hid")
        .distinct()
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaked"))
    )
    return (
        holdout.groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .join(hits, "split", "left")
        .select(
            "split",
            "n_docs",
            F.coalesce("n_leaked", F.lit(0)).cast("long").alias("n_leaked"),
            F.round(
                F.coalesce("n_leaked", F.lit(0)).cast("double") / F.col("n_docs"), 6
            ).alias("leak_rate"),
        )
        .orderBy("split")
    )
