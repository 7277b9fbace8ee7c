"""Deduplication operators over ``documents``: exact (hash-groupBy),
MinHash + LSH banding (shingle -> minhash -> band -> bucket-join),
exact n-gram Jaccard verification of LSH candidates, and SimHash.

Engine-portable hashing: ``md5`` (identical in Spark and DuckDB) is
the hash family; seed ``j`` is mixed in as a string prefix, and "min
over the hash space" = min over hex strings.

Scale design: shingling, minhash signatures, band keys are all
PER-ROW expressions (no explode, no shuffle) inside whole-stage
codegen. The only shuffles are (a) the band-bucket self-join — which
touches candidate pairs only, the whole point of LSH — and (b) the
final pair aggregation. At 100 TB, band keys are the join/shuffle
keys; hot buckets (degenerate near-identical corpora) would be capped
per-bucket — noted in PERF.md.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grapho_spark.sparkutil import materialize

from grapho_spark.queries import query
from grapho_spark.sparkutil import memo_table
from grapho_spark.tables import load_table
from grapho_spark.sparkutil import scratch_path

N_SEEDS = 12
N_BANDS = 3
ROWS_PER_BAND = N_SEEDS // N_BANDS
# Per-bucket candidate cap: only the smallest BUCKET_CAP doc ids of a
# band bucket generate pairs. Identical on both engines (sorted,
# deterministic); bounds hot-bucket pair blow-up at scale.
BUCKET_CAP = 64

# ---------------------------------------------------------------- shared
# Spark-side expression fragments (SQL expression dialect of Catalyst).
#
# Hash family: ONE md5 per (shingle, seed-group) sliced into 3
# 10-hex-char windows -> 12 signature positions from 4 md5 calls per
# shingle (3x less hashing than 12 independent md5s; windows of
# independent digests are independent enough for LSH banding, and the
# oracle mirrors the construction exactly).

SPARK_WORDS = r"split(trim(lower(text)), '\\s+')"
# NOTE: `words` must be a materialized column here — inlining the
# split() into the lambda re-tokenizes the document once per shingle
# (O(words^2) per row; observed 7x slowdown).
SPARK_SHINGLES = (
    "transform(sequence(1, greatest(size(words) - 2, 1)), "
    "i -> concat_ws(' ', slice(words, i, 3)))"
)

N_SEED_GROUPS = N_SEEDS // 3


def spark_sig(j: int) -> str:
    grp, win = divmod(j, 3)
    start = 1 + 10 * win
    return (
        f"array_min(transform(shingles, "
        f"s -> substring(md5(concat('{grp}:', s)), {start}, 10)))"
    )


# DuckDB-side equivalents.
DUCK_WORDS = r"string_split_regex(trim(lower(text)), '\s+')"
DUCK_SHINGLES = (
    f"[array_to_string(words[i:i+2], ' ') "
    f"for i in range(1, greatest(len(words) - 2, 1) + 1)]"
)


def duck_sig(j: int) -> str:
    grp, win = divmod(j, 3)
    start = 1 + 10 * win
    return f"list_min([substring(md5('{grp}:' || s), {start}, 10) for s in shingles])"


DUCK_SHINGLES_CTE = f"""
words_t AS (
  SELECT doc_id, {DUCK_WORDS} AS words FROM documents),
shingles_t AS (
  SELECT doc_id, {DUCK_SHINGLES} AS shingles FROM words_t)"""


def _duck_signature_cte() -> str:
    sig_cols = ",\n         ".join(f"{duck_sig(j)} AS s{j}" for j in range(N_SEEDS))
    band_cols = ",\n         ".join(
        "md5({}) AS b{}".format(
            " || ".join(f"s{j}" for j in range(k * ROWS_PER_BAND, (k + 1) * ROWS_PER_BAND)),
            k,
        )
        for k in range(N_BANDS)
    )
    return f"""{DUCK_SHINGLES_CTE},
sigs AS (
  SELECT doc_id,
         {sig_cols}
  FROM shingles_t),
banded AS (
  SELECT doc_id,
         {band_cols}
  FROM sigs),
band_long AS (
  {" UNION ALL ".join(f"SELECT doc_id, {k} AS band_id, b{k} AS band_key FROM banded" for k in range(N_BANDS))}),
band_buckets AS (
  SELECT band_id, band_key,
         list_sort(list(DISTINCT doc_id))[1:{BUCKET_CAP}] AS docs
  FROM band_long GROUP BY band_id, band_key),
cand_pairs AS (
  SELECT DISTINCT a AS doc_a, b AS doc_b
  FROM band_buckets, UNNEST(docs) t1(a), UNNEST(docs) t2(b)
  WHERE a < b)
"""


def _spark_shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + shingles array, MATERIALIZED (localCheckpoint).

    Without the barrier, Catalyst's project-collapse would inline the
    shingling expression into every downstream consumer (12 signature
    mins, the band join's both sides...), recomputing it each time. At
    cluster scale this would be a written shingle/signature table; here
    localCheckpoint gives the same compute-once semantics.
    """
    def build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents").repartition(32, "doc_id")
        words = d.select(
            F.col("doc_id"), F.split(F.trim(F.lower("text")), r"\s+").alias("words")
        )
        return words.select(F.col("doc_id"), F.expr(SPARK_SHINGLES).alias("shingles"))

    return memo_table(spark, f"doc_shingles:{sf_dir}", build)


def _spark_group_mins(g: int) -> str:
    """All 3 window-minima of seed group ``g`` in ONE pass: the digest
    array is built once by the transform, then a single fold tracks the
    per-window minima. Writing ``spark_sig(j)`` per signature instead
    recomputes the group's md5 array for every window (12 md5 passes
    where 4 suffice — measured ~2.4x slower signature build). 'zz' is
    the +inf sentinel ('z' > 'f' beats any hex substring)."""
    return (
        f"aggregate("
        f"transform(shingles, s -> md5(concat('{g}:', s))), "
        f"array('zz', 'zz', 'zz'), "
        f"(acc, h) -> array("
        f"least(acc[0], substring(h, 1, 10)), "
        f"least(acc[1], substring(h, 11, 10)), "
        f"least(acc[2], substring(h, 21, 10))))"
    )


def _spark_signatures(
    spark: SparkSession, sf_dir: str, shingled: DataFrame | None = None
) -> DataFrame:
    def build() -> DataFrame:
        d = shingled if shingled is not None else _spark_shingled(spark, sf_dir)
        # Stage 1 (the heavy pass): one digest transform + fold per
        # seed group over the shingle arrays. MATERIALIZED before the
        # scalar extraction — otherwise project-collapse would inline
        # each group fold into its 3 consumers, resurrecting the 12-pass
        # plan this stage exists to avoid. Tiny cache: 4 x 3 strings/doc.
        grouped = materialize(
            d.select(
                "doc_id",
                *[
                    F.expr(_spark_group_mins(g)).alias(f"g{g}")
                    for g in range(N_SEED_GROUPS)
                ],
            )
        )
        # Stage 2 (cheap): unpack s{j} = group[j//3] window [j%3] and
        # hash the band keys — plain projections over the cached rows.
        out = grouped.select(
            "doc_id",
            *[
                F.element_at(f"g{j // 3}", j % 3 + 1).alias(f"s{j}")
                for j in range(N_SEEDS)
            ],
        )
        for k in range(N_BANDS):
            cols = [f"s{j}" for j in range(k * ROWS_PER_BAND, (k + 1) * ROWS_PER_BAND)]
            out = out.withColumn(f"b{k}", F.md5(F.concat(*cols)))
        return out

    # consumed by 3+ joins downstream and by two queries — memoized
    return memo_table(spark, f"minhash_sigs:{sf_dir}", build)


def _spark_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """LSH candidate pairs: group each band bucket, cap it, explode the
    pairs map-side.

    One shuffle (the bucket groupBy, with map-side combine) replaces
    the band-long self-join's two-sided shuffle; the per-bucket cap
    (smallest ``BUCKET_CAP`` doc ids — deterministic) bounds the pair
    fan-out of degenerate hot buckets (a near-identical corpus would
    otherwise emit O(bucket^2) candidates), which is the 100 TB
    safeguard. The final distinct dedups pairs that collide in
    multiple bands.
    """
    stack_args = ", ".join(f"{k}, b{k}" for k in range(N_BANDS))
    band_long = sigs.selectExpr(
        "doc_id", f"stack({N_BANDS}, {stack_args}) AS (band_id, band_key)"
    )
    buckets = band_long.groupBy("band_id", "band_key").agg(
        F.expr(f"slice(array_sort(collect_set(doc_id)), 1, {BUCKET_CAP})").alias("docs")
    )
    return (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(docs, (x, i) -> "
                    "transform(slice(docs, i + 2, size(docs) - i - 1), "
                    "y -> struct(x as doc_a, y as doc_b))))"
                )
            ).alias("pr")
        )
        .select("pr.doc_a", "pr.doc_b")
        .distinct()
    )


# ---------------------------------------------------------------- queries


@query(
    "dedup_exact_summary",
    oracle="""
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(trim(lower(text)))) AS n_distinct_texts,
       COUNT(*) - COUNT(DISTINCT md5(trim(lower(text)))) AS n_exact_dups
FROM documents
""",
)
def dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup summary: normalized-text hash cardinality.

    Scale: hash the text ONCE per row map-side, aggregate the 16-byte
    digest, never shuffle the document bodies.
    """
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.trim(F.lower("text")))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(h).alias("n_distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct(h)).alias("n_exact_dups"),
    )


@query(
    "dedup_exact_groups",
    oracle="""
SELECT md5(trim(lower(text))) AS text_hash,
       MIN(doc_id) AS canonical_doc,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
HAVING COUNT(*) > 1
""",
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: hash-groupBy, keep-min-id canonical."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.trim(F.lower("text"))).alias("text_hash"))
        .agg(F.min("doc_id").alias("canonical_doc"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


_MATCH_SUM_DUCK = " + ".join(
    f"CASE WHEN sa.s{j} = sb.s{j} THEN 1 ELSE 0 END" for j in range(N_SEEDS)
)


@query(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
WITH {_duck_signature_cte()}
SELECT p.doc_a, p.doc_b,
       ({_MATCH_SUM_DUCK}) AS n_matching,
       ({_MATCH_SUM_DUCK}) * 1.0 / {N_SEEDS} AS est_jaccard
FROM cand_pairs p
JOIN sigs sa ON p.doc_a = sa.doc_id
JOIN sigs sb ON p.doc_b = sb.doc_id
""",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates: word-3-gram shingles ->
    12-seed minhash signature -> 3 bands of 4 -> band-bucket self-join;
    estimated Jaccard = fraction of matching signature positions.
    """
    sigs = _spark_signatures(spark, sf_dir)
    pairs = _spark_candidate_pairs(sigs)
    sa = sigs.alias("sa")
    sb = sigs.alias("sb")
    match_sum = sum(
        F.when(F.col(f"sa.s{j}") == F.col(f"sb.s{j}"), 1).otherwise(0)
        for j in range(N_SEEDS)
    )
    return (
        pairs.join(sa, pairs.doc_a == F.col("sa.doc_id"))
        .join(sb, pairs.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            match_sum.alias("n_matching"),
            (match_sum * F.lit(1.0) / F.lit(N_SEEDS)).alias("est_jaccard"),
        )
    )


@query(
    "dedup_lsh_bucket_stats",
    oracle=f"""
WITH {_duck_signature_cte()},
bucket_sizes AS (
  SELECT band_id, band_key, COUNT(DISTINCT doc_id) AS n_docs
  FROM band_long GROUP BY band_id, band_key)
SELECT COUNT(*) AS n_buckets,
       CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pair_buckets,
       CAST(SUM(CASE WHEN n_docs > {BUCKET_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_capped_buckets,
       CAST(MAX(n_docs) AS BIGINT) AS max_bucket_docs,
       CAST(SUM(n_docs * (n_docs - 1) // 2) AS BIGINT) AS n_pairs_uncapped,
       CAST(SUM(CASE WHEN n_docs > {BUCKET_CAP}
                THEN n_docs * (n_docs - 1) // 2
                     - {BUCKET_CAP} * ({BUCKET_CAP} - 1) // 2
                ELSE 0 END) AS BIGINT) AS n_dropped_candidates
FROM bucket_sizes
""",
)
def dedup_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability for the LSH bucket cap ("no silent caps"):
    per-band bucket-size distribution, how many buckets exceed
    ``BUCKET_CAP``, and exactly how many per-bucket candidate pairs the
    cap drops (a dropped pair can still surface via another band, so
    this is the upper bound on recall loss). Run alongside
    dedup_minhash_lsh_pairs whenever the corpus changes shape; PERF.md
    records the measured rate at sf0.1.

    Scale: one groupBy on (band_id, band_key) with map-side combine —
    the same single shuffle the candidate generator pays.
    """
    sigs = _spark_signatures(spark, sf_dir)
    stack_args = ", ".join(f"{k}, b{k}" for k in range(N_BANDS))
    band_long = sigs.selectExpr(
        "doc_id", f"stack({N_BANDS}, {stack_args}) AS (band_id, band_key)"
    )
    sizes = band_long.groupBy("band_id", "band_key").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    pairs_of = lambda c: (c * (c - F.lit(1))).cast("long") / F.lit(2)  # noqa: E731
    cap_pairs = BUCKET_CAP * (BUCKET_CAP - 1) // 2
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_pair_buckets"),
        F.sum(F.when(F.col("n_docs") > BUCKET_CAP, 1).otherwise(0))
        .cast("long")
        .alias("n_capped_buckets"),
        F.max("n_docs").cast("long").alias("max_bucket_docs"),
        F.sum(pairs_of(F.col("n_docs"))).cast("long").alias("n_pairs_uncapped"),
        F.sum(
            F.when(
                F.col("n_docs") > BUCKET_CAP,
                pairs_of(F.col("n_docs")) - F.lit(cap_pairs),
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_dropped_candidates"),
    )


_DUCK_VERIFIED_CTE = """
doc_shingles AS (
  SELECT doc_id, unnest(list_distinct(shingles)) AS sh FROM shingles_t),
sizes AS (
  SELECT doc_id, len(list_distinct(shingles)) AS n_sh FROM shingles_t),
inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
  FROM cand_pairs p
  JOIN doc_shingles a ON a.doc_id = p.doc_a
  JOIN doc_shingles b ON b.doc_id = p.doc_b AND a.sh = b.sh
  GROUP BY p.doc_a, p.doc_b),
verified AS (
  SELECT i.doc_a, i.doc_b, i.n_common,
         sa.n_sh AS n_sh_a, sb.n_sh AS n_sh_b,
         i.n_common * 1.0 / (sa.n_sh + sb.n_sh - i.n_common) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b)
"""


def _spark_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard-verified LSH candidate pairs (the verify stage of
    MinHash-LSH dedup); shared by dedup_jaccard_verified and the
    clustering/canonical-assignment stage."""
    d = _spark_shingled(spark, sf_dir)
    sigs = _spark_signatures(spark, sf_dir, shingled=d)
    pairs = _spark_candidate_pairs(sigs)
    doc_sh = d.select("doc_id", F.explode(F.array_distinct("shingles")).alias("sh"))
    sizes = d.select("doc_id", F.size(F.array_distinct("shingles")).alias("n_sh"))
    a = doc_sh.alias("a")
    b = doc_sh.alias("b")
    inter = (
        pairs.join(a, pairs.doc_a == F.col("a.doc_id"))
        .join(b, (pairs.doc_b == F.col("b.doc_id")) & (F.col("a.sh") == F.col("b.sh")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, inter.doc_a == F.col("sa.doc_id"))
        .join(sb, inter.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.col("sa.n_sh").alias("n_sh_a"),
            F.col("sb.n_sh").alias("n_sh_b"),
            (
                F.col("n_common")
                * F.lit(1.0)
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


@query(
    "dedup_jaccard_verified",
    oracle=f"""
WITH {_duck_signature_cte()},
{_DUCK_VERIFIED_CTE}
SELECT doc_a, doc_b, n_common, n_sh_a, n_sh_b, jaccard FROM verified
""",
)
def dedup_jaccard_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard on the LSH candidate pairs (the verify
    stage of MinHash-LSH dedup): explode distinct shingles of candidate
    docs only, count intersections.

    Scale: the expensive exact computation is restricted to LSH
    candidates — cost is O(candidates x shingles), not O(n^2).
    """
    return _spark_verified_pairs(spark, sf_dir)


DEDUP_JACCARD_THRESHOLD = 0.5


@query(
    "dedup_cluster_canonical",
    oracle=f"""
WITH RECURSIVE {_duck_signature_cte()},
{_DUCK_VERIFIED_CTE},
dedges AS (
  SELECT doc_a AS src, doc_b AS dst FROM verified
  WHERE jaccard >= {DEDUP_JACCARD_THRESHOLD}),
dsym AS (
  SELECT src, dst FROM dedges UNION ALL SELECT dst, src FROM dedges),
dnodes AS (SELECT DISTINCT src AS node FROM dsym),
dreach(n, m) AS (
  SELECT node, node FROM dnodes
  UNION
  SELECT r.n, e.dst FROM dreach r JOIN dsym e ON r.m = e.src),
dcomp AS (SELECT n, MIN(m) AS component FROM dreach GROUP BY n)
SELECT component AS canonical_doc,
       COUNT(*) AS n_members,
       COUNT(*) - 1 AS n_dropped
FROM dcomp GROUP BY component
""",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAST stage of corpus near-dedup: cluster the verified
    near-dup pairs (connected components — near-duplication is
    transitive enough once exact-Jaccard-thresholded) and assign each
    cluster's canonical survivor = min doc_id; every other member is
    dropped from the training corpus. Output: one row per cluster with
    its size and drop count.

    Scale: pairs are LSH-candidates only (never O(n^2)); the component
    loop is the pointer-jumping distributed CC — O(log diameter)
    rounds, and near-dup clusters have tiny diameters.
    """
    from grapho_spark.analytics import connected_components

    pairs = _spark_verified_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= DEDUP_JACCARD_THRESHOLD
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = connected_components(edges)
    return cc.groupBy(F.col("component").alias("canonical_doc")).agg(
        F.count(F.lit(1)).alias("n_members"),
        (F.count(F.lit(1)) - F.lit(1)).cast("long").alias("n_dropped"),
    )


# ---------------------------------------------------------------- simhash

N_SIMHASH_BITS = 32

# Token hash as ONE 32-bit integer (hex -> int), bits extracted with
# shift/mask — keeps the 32 per-bit aggregate expressions inside
# whole-stage codegen (a 16-branch hex CASE ladder per bit did not).
SPARK_TOKEN_HASH = "cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint)"
DUCK_TOKEN_HASH = "CAST('0x' || substring(md5(w), 1, 8) AS UBIGINT)::BIGINT"


def _bit_weight(bit: int) -> str:
    """+1/-1 weight of bit ``bit`` (0 = MSB) of the 32-bit token hash
    ``v`` — same expression text is valid on both engines."""
    return f"CASE WHEN ((v >> {31 - bit}) & 1) = 1 THEN 1 ELSE -1 END"


def _duck_simhash_cte() -> str:
    sums = ",\n         ".join(
        f"SUM({_bit_weight(j)}) AS w{j}" for j in range(N_SIMHASH_BITS)
    )
    bits = " || ".join(
        f"CASE WHEN w{j} > 0 THEN '1' ELSE '0' END" for j in range(N_SIMHASH_BITS)
    )
    return f"""
tokens AS (
  SELECT doc_id, {DUCK_TOKEN_HASH} AS v
  FROM (SELECT doc_id, unnest({DUCK_WORDS}) AS w FROM documents)),
weights AS (
  SELECT doc_id,
         {sums}
  FROM tokens GROUP BY doc_id),
simhashes AS (
  SELECT doc_id, {bits} AS simhash FROM weights)
"""


def _spark_simhashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.expr(SPARK_WORDS)).alias("w")
    ).select("doc_id", F.expr(SPARK_TOKEN_HASH).alias("v"))
    sums = [
        F.sum(F.expr(_bit_weight(j))).alias(f"w{j}") for j in range(N_SIMHASH_BITS)
    ]
    weights = tokens.groupBy("doc_id").agg(*sums)
    bits = F.concat(
        *[
            F.when(F.col(f"w{j}") > 0, "1").otherwise("0")
            for j in range(N_SIMHASH_BITS)
        ]
    )
    return weights.select("doc_id", bits.alias("simhash"))


@query(
    "dedup_simhash",
    oracle=f"""
WITH {_duck_simhash_cte()}
SELECT doc_id, simhash FROM simhashes
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash (token hashes weighted +/-1 per bit,
    sign-aggregated). Exact-match buckets are hamming-0 duplicates;
    near-dup search flips bands of bits (see dedup_simhash_clusters).

    Scale: one explode + one groupBy(doc_id) — the aggregation is the
    shuffle; 32 small integer sums ride along in map-side partial agg.
    """
    return _spark_simhashes(spark, sf_dir)


@query(
    "dedup_simhash_clusters",
    oracle=f"""
WITH {_duck_simhash_cte()}
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT simhash) AS n_distinct_simhash,
       COUNT(*) - COUNT(DISTINCT simhash) AS n_bucketed_dups
FROM simhashes
""",
)
def dedup_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash bucket summary: docs sharing an identical 32-bit
    signature are duplicate candidates."""
    sh = _spark_simhashes(spark, sf_dir)
    return sh.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("simhash").alias("n_distinct_simhash"),
        (F.count(F.lit(1)) - F.countDistinct("simhash")).alias("n_bucketed_dups"),
    )


# ------------------------------------------------------- decontamination

N_PROBE_DOCS = 5  # stand-in "benchmark suite": shingles of the first docs


@query(
    "text_contamination_probe",
    oracle=f"""
WITH {DUCK_SHINGLES_CTE},
probe_set AS (
  SELECT DISTINCT unnest(list_distinct(shingles)) AS sh
  FROM shingles_t WHERE doc_id < {N_PROBE_DOCS}),
doc_sh AS (
  SELECT doc_id, unnest(list_distinct(shingles)) AS sh, len(list_distinct(shingles)) AS n_sh
  FROM shingles_t WHERE doc_id >= {N_PROBE_DOCS})
SELECT d.doc_id,
       COUNT(*) AS n_contaminated_ngrams,
       ANY_VALUE(d.n_sh) AS n_ngrams,
       COUNT(*) * 1.0 / ANY_VALUE(d.n_sh) AS contamination_ratio
FROM doc_sh d JOIN probe_set p ON d.sh = p.sh
GROUP BY d.doc_id
""",
)
def text_contamination_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination probe: flag corpus documents whose
    word-3-grams overlap a probe set (here: the shingles of the first
    {N_PROBE_DOCS} docs stand in for an eval benchmark — in production
    the probe set is the benchmark suite's n-grams). Returns each
    contaminated doc with its hit count and contamination ratio.

    Scale: the probe set is small by construction (benchmarks are KBs,
    corpora are TBs) — broadcast it; each document is then checked
    map-side with zero shuffle of corpus text. The explode is bounded
    by shingles-per-doc; the only shuffle is the per-doc hit count.
    """
    d = _spark_shingled(spark, sf_dir)
    probes = (
        d.filter(F.col("doc_id") < N_PROBE_DOCS)
        .select(F.explode(F.array_distinct("shingles")).alias("sh"))
        .distinct()
    )
    doc_sh = d.filter(F.col("doc_id") >= N_PROBE_DOCS).select(
        "doc_id",
        F.size(F.array_distinct("shingles")).alias("n_sh"),
        F.explode(F.array_distinct("shingles")).alias("sh"),
    )
    return (
        doc_sh.join(F.broadcast(probes), "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_contaminated_ngrams"),
            F.first("n_sh").alias("n_ngrams"),
            (F.count(F.lit(1)) * F.lit(1.0) / F.first("n_sh")).alias(
                "contamination_ratio"
            ),
        )
    )


# Incremental split: deterministic 80/20 by doc_id — "corpus" is the
# existing index, "new" is today's increment.
_INCR_CORPUS_PRED = "doc_id % 10 < 8"
_INCR_NEW_PRED = "doc_id % 10 >= 8"


INCR_ORACLE = f"""
WITH {_duck_signature_cte()},
band_corpus AS (
  SELECT band_id, band_key,
         list_sort(list(DISTINCT doc_id))[1:{BUCKET_CAP}] AS docs
  FROM band_long WHERE {_INCR_CORPUS_PRED}
  GROUP BY band_id, band_key),
links AS (
  SELECT DISTINCT n.doc_id AS new_doc, t.c AS corpus_doc
  FROM band_long n, band_corpus b, UNNEST(b.docs) AS t(c)
  WHERE n.band_id = b.band_id AND n.band_key = b.band_key
    AND n.{_INCR_NEW_PRED})
SELECT new_doc, CAST(COUNT(*) AS BIGINT) AS n_corpus_matches
FROM links GROUP BY new_doc
"""


# Bucket count for the persisted band index; co-partitions probe joins
# on (band_id, band_key) with the standing table so the index side is
# never reshuffled at probe time.
INDEX_BUCKETS = 8


def _band_long(spark: SparkSession, sf_dir: str, pred: str) -> DataFrame:
    """(doc_id, band_id, band_key) rows for the docs matching pred."""
    sigs = _spark_signatures(spark, sf_dir)
    stack_args = ", ".join(f"{k}, b{k}" for k in range(N_BANDS))
    return sigs.filter(pred).selectExpr(
        "doc_id", f"stack({N_BANDS}, {stack_args}) AS (band_id, band_key)"
    )


def _capped_buckets(band_long: DataFrame) -> DataFrame:
    return band_long.groupBy("band_id", "band_key").agg(
        F.expr(f"slice(array_sort(collect_set(doc_id)), 1, {BUCKET_CAP})").alias(
            "docs"
        )
    )


def _index_name(sf_dir: str, corpus_pred: str) -> str:
    import hashlib

    tag = hashlib.md5(f"{sf_dir}|{corpus_pred}".encode()).hexdigest()[:10]
    # pid-scoped: the session catalog (where tableExists memoizes the
    # build) is per-process, so sharing the backing path across
    # processes is pure hazard — two concurrent local sessions would
    # overwrite/read the same files mid-rebuild (observed as a flaky
    # read in r7 when pytest and a parity sweep overlapped). In
    # production the index is a metastore table owned by ONE ingest
    # pipeline; locally each process gets its own copy.
    return f"lsh_corpus_buckets_{tag}_pid{os.getpid()}"


def corpus_band_index(
    spark: SparkSession, sf_dir: str, corpus_pred: str = _INCR_CORPUS_PRED
) -> DataFrame:
    """The standing LSH band index (band_id, band_key, capped docs
    list) persisted ONCE as a BUCKETED parquet table — the
    build-once/probe-many split of production incremental dedup.

    The index is written with ``bucketBy(INDEX_BUCKETS, band_id,
    band_key)`` + ``sortBy``, so every probe (the batch incremental
    query, the stream-static probe) scans the stored table — no
    signature recompute, no groupBy rebuild — and joins on the bucket
    keys without shuffling the index side. Rebuild happens only when
    the table is absent from the session catalog (in production: a
    metastore table maintained by the ingest pipeline; a daily
    increment lands via ``append_to_band_index``, same bucket
    layout)."""
    import tempfile

    tname = _index_name(sf_dir, corpus_pred)
    if not spark.catalog.tableExists(tname):
        (
            _capped_buckets(_band_long(spark, sf_dir, corpus_pred))
            .write.bucketBy(INDEX_BUCKETS, "band_id", "band_key")
            .sortBy("band_id", "band_key")
            .option(
                "path",
                scratch_path("grapho_spark_index", tname),
            )
            .mode("overwrite")
            .saveAsTable(tname)
        )
    return spark.table(tname)


def append_to_band_index(
    spark: SparkSession,
    sf_dir: str,
    batch_pred: str,
    corpus_pred: str = _INCR_CORPUS_PRED,
) -> str:
    """Append a new batch's capped band rows to the persisted index in
    the SAME bucket layout (Spark verifies the bucket spec matches) —
    the production ingest path: delta rows, no index rebuild.

    A key collided by both the corpus and the batch then holds
    multiple rows; probes explode+distinct, so multi-row keys read
    correctly. The per-row cap still bounds any single write's
    fan-out; a compaction (periodic rebuild) re-merges rows and
    re-applies the global cap."""
    tname = _index_name(sf_dir, corpus_pred)
    corpus_band_index(spark, sf_dir, corpus_pred)  # ensure it exists
    (
        _capped_buckets(_band_long(spark, sf_dir, batch_pred))
        .write.bucketBy(INDEX_BUCKETS, "band_id", "band_key")
        .sortBy("band_id", "band_key")
        .mode("append")
        .saveAsTable(tname)
    )
    return tname


def probe_band_index(
    spark: SparkSession, sf_dir: str, index: DataFrame, new_pred: str
) -> DataFrame:
    """Count distinct index collisions per new document — the shared
    probe shape of the batch incremental query and the append test."""
    links = (
        _band_long(spark, sf_dir, new_pred)
        .withColumnRenamed("doc_id", "new_doc")
        .join(index, ["band_id", "band_key"])
        .select("new_doc", F.explode("docs").alias("corpus_doc"))
        .distinct()
    )
    return links.groupBy("new_doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_corpus_matches")
    )


@query("dedup_incremental_new_vs_corpus", oracle=INCR_ORACLE)
def dedup_incremental_new_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: flag documents of a NEW batch (20% split
    by doc_id) that LSH-collide with the EXISTING corpus (80%) — the
    production shape where a daily increment is deduped against a
    standing signature index instead of re-pairing the whole corpus.

    Scale: the corpus side is the PERSISTED bucketed band index
    (``corpus_band_index`` — built once, scanned at probe time); the
    new batch joins bucket keys and explodes at most ``BUCKET_CAP``
    corpus ids per collision. Cost per increment is O(new x bands),
    independent of corpus size beyond the index probe.
    """
    return probe_band_index(
        spark, sf_dir, corpus_band_index(spark, sf_dir), _INCR_NEW_PRED
    )


@query(
    "dedup_containment_pairs",
    oracle=f"""
WITH {_duck_signature_cte()},
{_DUCK_VERIFIED_CTE}
SELECT doc_a, doc_b,
       round(n_common * 1.0 / n_sh_a, 6) AS containment_a,
       round(n_common * 1.0 / n_sh_b, 6) AS containment_b,
       (n_common * 1.0 / n_sh_a > 0.8 OR n_common * 1.0 / n_sh_b > 0.8)
         AS is_contained
FROM verified
""",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment on the LSH candidate pairs:
    |A intersect B| / |A| (and /|B|) — catches quote/snippet inclusion that
    symmetric Jaccard under-scores (a 100-shingle doc fully inside a
    10000-shingle doc has Jaccard ~0.01 but containment 1.0). Flagged
    at 0.8 either direction.

    Scale: same candidate-restricted cost as the Jaccard verify —
    O(candidates x shingles), never all-pairs.
    """
    p = _spark_verified_pairs(spark, sf_dir)
    ca = F.round(F.col("n_common") * F.lit(1.0) / F.col("n_sh_a"), 6)
    cb = F.round(F.col("n_common") * F.lit(1.0) / F.col("n_sh_b"), 6)
    return p.select(
        "doc_a",
        "doc_b",
        ca.alias("containment_a"),
        cb.alias("containment_b"),
        (
            (F.col("n_common") * F.lit(1.0) / F.col("n_sh_a") > 0.8)
            | (F.col("n_common") * F.lit(1.0) / F.col("n_sh_b") > 0.8)
        ).alias("is_contained"),
    )


@query(
    "dedup_minhash_estimator_error",
    oracle=f"""
WITH {_duck_signature_cte()},
{_DUCK_VERIFIED_CTE},
est AS (
  SELECT p.doc_a, p.doc_b,
         ({_MATCH_SUM_DUCK}) * 1.0 / {N_SEEDS} AS est_jaccard
  FROM cand_pairs p
  JOIN sigs sa ON p.doc_a = sa.doc_id
  JOIN sigs sb ON p.doc_b = sb.doc_id)
SELECT e.doc_a, e.doc_b, e.est_jaccard, v.jaccard,
       round(abs(e.est_jaccard - v.jaccard), 6) AS abs_err
FROM est e JOIN verified v ON e.doc_a = v.doc_a AND e.doc_b = v.doc_b
""",
)
def dedup_minhash_estimator_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration: per candidate pair, the
    signature-estimated Jaccard next to the exact shingle Jaccard and
    their absolute error — the observability that tells you whether
    {N_SEEDS} seeds are enough for the corpus' similarity profile
    before trusting the estimate at scale.

    Scale: both inputs are already candidate-restricted; the
    comparison join is pair-keyed and pair-sized.
    """
    sigs = _spark_signatures(spark, sf_dir)
    pairs = _spark_candidate_pairs(sigs)
    sa = sigs.alias("sa")
    sb = sigs.alias("sb")
    match_sum = sum(
        F.when(F.col(f"sa.s{j}") == F.col(f"sb.s{j}"), 1).otherwise(0)
        for j in range(N_SEEDS)
    )
    est = (
        pairs.join(sa, pairs.doc_a == F.col("sa.doc_id"))
        .join(sb, pairs.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (match_sum * F.lit(1.0) / F.lit(N_SEEDS)).alias("est_jaccard"),
        )
    )
    exact = _spark_verified_pairs(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    return est.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "est_jaccard",
        "jaccard",
        F.round(F.abs(F.col("est_jaccard") - F.col("jaccard")), 6).alias("abs_err"),
    )


@query(
    "dedup_source_leakage_matrix",
    oracle=f"""
WITH {_duck_signature_cte()},
{_DUCK_VERIFIED_CTE},
near AS (
  SELECT doc_a, doc_b FROM verified WHERE jaccard >= {DEDUP_JACCARD_THRESHOLD}),
srcs AS (SELECT doc_id, source FROM documents)
SELECT least(sa.source, sb.source) AS source_x,
       greatest(sa.source, sb.source) AS source_y,
       count(*) AS n_neardup_pairs
FROM near n
JOIN srcs sa ON sa.doc_id = n.doc_a
JOIN srcs sb ON sb.doc_id = n.doc_b
GROUP BY 1, 2
""",
)
def dedup_source_leakage_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate leakage matrix: verified near-dup pairs
    (exact Jaccard >= {DEDUP_JACCARD_THRESHOLD}) bucketed by the
    unordered pair of their documents' sources — diagonal entries are
    within-source duplication, off-diagonal entries reveal one feed
    mirroring another (the signal for dropping a redundant source
    entirely rather than deduping row by row).

    Scale: pair-sized join against a doc->source projection
    (broadcastable or pair-key-shuffled); the matrix is
    sources^2-bounded.
    """
    near = _spark_verified_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= DEDUP_JACCARD_THRESHOLD
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = d.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    sb = d.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        near.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_x"),
            F.greatest("src_a", "src_b").alias("source_y"),
        )
        .agg(F.count(F.lit(1)).alias("n_neardup_pairs"))
    )


@query(
    "dedup_quality_survivor",
    oracle=f"""
WITH RECURSIVE {{sig_cte}},
{{verified_cte}},
dedges AS (
  SELECT doc_a AS src, doc_b AS dst FROM verified
  WHERE jaccard >= {DEDUP_JACCARD_THRESHOLD}),
dsym AS (
  SELECT src, dst FROM dedges UNION ALL SELECT dst, src FROM dedges),
dnodes AS (SELECT DISTINCT src AS node FROM dsym),
dreach(n, m) AS (
  SELECT node, node FROM dnodes
  UNION
  SELECT r.n, e.dst FROM dreach r JOIN dsym e ON r.m = e.src),
dcomp AS (SELECT n, MIN(m) AS component FROM dreach GROUP BY n),
ranked AS (
  SELECT c.component, c.n AS doc_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.n) AS rk
  FROM dcomp c JOIN documents d ON c.n = d.doc_id)
SELECT component AS cluster_id,
       CAST(MAX(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS survivor_doc,
       CAST(MAX(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT)
         AS survivor_chars,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
FROM ranked GROUP BY component
ORDER BY cluster_id
""".format(sig_cte=_duck_signature_cte(), verified_cte=_DUCK_VERIFIED_CTE),
)
def dedup_quality_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based survivor selection per near-dup cluster: keep the
    member with the MOST CONTENT (n_chars, doc_id tie-break) instead
    of the arbitrary min-id — what production corpus dedup actually
    ships (the longest near-duplicate usually subsumes the others).
    Cluster identity stays the min-label component for stable naming.

    Scale: same bucketed-LSH + distributed-CC machinery as the
    canonical variant; the argmax is a per-cluster window over the
    component assignment joined to document metadata (never bodies).
    """
    from grapho_spark.analytics import connected_components
    from pyspark.sql import Window as W

    pairs = _spark_verified_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= DEDUP_JACCARD_THRESHOLD
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = connected_components(edges)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = (
        cc.join(d, cc.node == d.doc_id)
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("component").orderBy(F.desc("n_chars"), "node")
            ),
        )
    )
    return (
        ranked.groupBy(F.col("component").alias("cluster_id"))
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("node")))
            .cast("long")
            .alias("survivor_doc"),
            F.max(F.when(F.col("rk") == 1, F.col("n_chars")))
            .cast("long")
            .alias("survivor_chars"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


@query(
    "dedup_lsh_recall_probe",
    oracle=f"""
WITH {{sig_cte}},
sample_sh AS (
  SELECT doc_id, unnest(list_distinct(shingles)) AS sh
  FROM shingles_t WHERE doc_id % 20 = 0),
sample_sizes AS (
  SELECT doc_id, len(list_distinct(shingles)) AS n_sh
  FROM shingles_t WHERE doc_id % 20 = 0),
truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sample_sh a JOIN sample_sh b
    ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
truth_pairs AS (
  SELECT t.doc_a, t.doc_b
  FROM truth t
  JOIN sample_sizes sa ON sa.doc_id = t.doc_a
  JOIN sample_sizes sb ON sb.doc_id = t.doc_b
  WHERE t.n_common * 1.0 / (sa.n_sh + sb.n_sh - t.n_common)
        >= {DEDUP_JACCARD_THRESHOLD}),
caught AS (
  SELECT tp.doc_a, tp.doc_b,
         CASE WHEN cp.doc_a IS NULL THEN 0 ELSE 1 END AS hit
  FROM truth_pairs tp
  LEFT JOIN cand_pairs cp
    ON cp.doc_a = tp.doc_a AND cp.doc_b = tp.doc_b)
SELECT CAST(COUNT(*) AS BIGINT) AS n_truth_pairs,
       CAST(SUM(hit) AS BIGINT) AS n_caught,
       round(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS recall
FROM caught
""".format(sig_cte=_duck_signature_cte()),
)
def dedup_lsh_recall_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH recall: on a deterministic document sample, the
    ground truth is EXACT all-pairs Jaccard (affordable on the sample)
    and the measurement is what fraction of true near-dup pairs the
    banded MinHash-LSH candidate generation catches — the
    evaluation-metric companion to the estimator-calibration probe,
    and the number that justifies the band/row configuration.

    Scale: ground truth is quadratic ONLY in the sample (a fixed
    slice); the candidate side reuses the production LSH pipeline
    unchanged. In production this probe runs on every reconfiguration
    of bands x rows.
    """
    d = _spark_shingled(spark, sf_dir)
    sample = d.filter(F.col("doc_id") % 20 == 0)
    sh = sample.select(
        "doc_id", F.explode(F.array_distinct("shingles")).alias("sh")
    )
    sizes = sample.select(
        "doc_id", F.size(F.array_distinct("shingles")).alias("n_sh")
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    truth = (
        a.join(b, ["sh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_sh_b"))
    truth_pairs = (
        truth.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(
            F.col("n_common")
            / (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common"))
            >= DEDUP_JACCARD_THRESHOLD
        )
        .select("doc_a", "doc_b")
    )
    sigs = _spark_signatures(spark, sf_dir, shingled=d)
    cand = _spark_candidate_pairs(sigs).select("doc_a", "doc_b").withColumn(
        "hit", F.lit(1)
    )
    caught = truth_pairs.join(cand, ["doc_a", "doc_b"], "left").select(
        F.coalesce(F.col("hit"), F.lit(0)).alias("hit")
    )
    return caught.agg(
        F.count(F.lit(1)).cast("long").alias("n_truth_pairs"),
        F.sum("hit").cast("long").alias("n_caught"),
        F.round(F.sum("hit").cast("double") / F.count(F.lit(1)), 6).alias("recall"),
    )


@query(
    "dedup_lsh_precision_probe",
    oracle=f"""
WITH {{sig_cte}},
{{verified_cte}}
SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(COUNT(*) FILTER (WHERE jaccard >= {DEDUP_JACCARD_THRESHOLD})
            AS BIGINT) AS n_true_neardups,
       round(CAST(COUNT(*) FILTER (WHERE jaccard >= {DEDUP_JACCARD_THRESHOLD})
                  AS DOUBLE) / COUNT(*), 6) AS precision
FROM verified
""".format(sig_cte=_duck_signature_cte(), verified_cte=_DUCK_VERIFIED_CTE),
)
def dedup_lsh_precision_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured LSH precision: of all banded candidate pairs, the
    fraction whose EXACT Jaccard clears the near-dup threshold — the
    companion to the recall probe (together they justify bands x
    rows: precision prices the wasted verify work, recall prices the
    missed duplicates).

    Scale: the verify stage already computes exact Jaccard per
    candidate (never O(n^2)); this is one aggregate over that stream.
    """
    v = _spark_verified_pairs(spark, sf_dir)
    hit = F.count(F.when(F.col("jaccard") >= DEDUP_JACCARD_THRESHOLD, 1))
    return v.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        hit.cast("long").alias("n_true_neardups"),
        F.round(hit.cast("double") / F.count(F.lit(1)), 6).alias("precision"),
    )


# --------------------------------------------------------------------------
# Exact set-similarity join with prefix filtering (AllPairs / PPJoin
# family, Bayardo et al. WWW'07 / Xiao et al. ICDE'08 — public papers).
#
# The zero-false-negative alternative to MinHash-LSH: order every
# document's shingle set by global rarity (document frequency asc,
# shingle asc — rarest first) and generate candidate pairs ONLY from
# the first  n - ceil(t*n) + 1  shingles of each set (the "prefix").
# Theorem: with the length filter  min(|a|,|b|) >= t * max(|a|,|b|),
# any pair with Jaccard >= t shares at least one token in both
# prefixes — so verifying exactly on prefix-candidates returns the
# COMPLETE pair set, unlike LSH whose recall is probabilistic
# (dedup_lsh_recall_probe measures that gap).
#
# Two further exactness-preserving scale guards (added after the x10
# probe spilled the first cut to death on a near-copy-dense corpus):
#
# - PPJoin POSITIONAL filter: a token matched at rarity positions
#   (pa, pb) bounds the overlap above by min(na-pa, nb-pb)+1; a pair
#   whose EVERY prefix match fails  ubound >= ceil(t/(1+t)*(na+nb))
#   cannot reach the threshold. The rarest common token always
#   carries the true bound, so no qualifying pair is lost. Measured
#   at sf0.1: candidates 310k -> 125k at identical output.
# - Verification by ARRAY INTERSECTION, not an exploded join: each
#   candidate pair joins the per-doc sorted shingle ARRAY (one row
#   per doc) and computes |a intersect b| map-side. The exploded
#   verify shape shuffles candidates x shingles rows (the measured
#   ~80 GB spill at x10); the array shape shuffles candidates + docs
#   rows only.
#
# Threshold is kept as a rational T_NUM/T_DEN and every threshold
# comparison is integer arithmetic — no float ceil/rounding to
# diverge between engines.
# --------------------------------------------------------------------------

SSJOIN_T_NUM = 1  # Jaccard threshold numerator
SSJOIN_T_DEN = 2  # Jaccard threshold denominator (t = 1/2)

# prefix length = n - ceil(t*n) + 1, all-integer
_PREFIX_LEN = (
    f"n_sh - (({SSJOIN_T_NUM} * n_sh + {SSJOIN_T_DEN} - 1) // {SSJOIN_T_DEN}) + 1"
)

_DUCK_PREFIX_CTE = f"""{DUCK_SHINGLES_CTE},
doc_arr AS (
  SELECT doc_id, list_sort(list_distinct(shingles)) AS sharr,
         len(list_distinct(shingles)) AS n_sh
  FROM shingles_t),
doc_sh AS (
  SELECT doc_id, unnest(sharr) AS sh FROM doc_arr),
df AS (SELECT sh, COUNT(*) AS c FROM doc_sh GROUP BY sh),
pos_t AS (
  SELECT d.doc_id, d.sh, z.n_sh,
         row_number() OVER (PARTITION BY d.doc_id ORDER BY f.c, d.sh) AS pos
  FROM doc_sh d JOIN df f USING (sh) JOIN doc_arr z USING (doc_id)),
prefix_t AS (
  SELECT doc_id, sh, n_sh, pos FROM pos_t WHERE pos <= {_PREFIX_LEN}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.n_sh AS n_sh_a, b.n_sh AS n_sh_b
  FROM prefix_t a JOIN prefix_t b
    ON a.sh = b.sh AND a.doc_id < b.doc_id
  WHERE {SSJOIN_T_DEN} * least(a.n_sh, b.n_sh)
        >= {SSJOIN_T_NUM} * greatest(a.n_sh, b.n_sh)
    AND least(a.n_sh - a.pos + 1, b.n_sh - b.pos + 1)
        >= (({SSJOIN_T_NUM} * (a.n_sh + b.n_sh) + {SSJOIN_T_NUM} + {SSJOIN_T_DEN} - 1)
            // ({SSJOIN_T_NUM} + {SSJOIN_T_DEN}))),
ss_inter AS (
  SELECT c.doc_a, c.doc_b, c.n_sh_a, c.n_sh_b,
         len(list_intersect(a.sharr, b.sharr)) AS n_common
  FROM cand c
  JOIN doc_arr a ON a.doc_id = c.doc_a
  JOIN doc_arr b ON b.doc_id = c.doc_b),
ss_pairs AS (
  SELECT doc_a, doc_b, n_common, n_sh_a, n_sh_b,
         n_common * 1.0 / (n_sh_a + n_sh_b - n_common) AS jaccard
  FROM ss_inter
  WHERE {SSJOIN_T_DEN} * n_common
        >= {SSJOIN_T_NUM} * (n_sh_a + n_sh_b - n_common))"""


def _spark_prefix_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered candidate pairs (doc_a, doc_b, n_sh_a, n_sh_b),
    memoized: the pairs query and its stats audit both consume this —
    without the barrier the whole df/window/self-join pipeline would
    re-run per consumer."""
    return memo_table(
        spark, f"prefix_ssjoin_cand:{sf_dir}", lambda: _build_prefix_candidates(spark, sf_dir)
    )


def _spark_doc_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sharr sorted-distinct shingle array, n_sh), memoized —
    the verify stage's per-doc row (one array, never exploded)."""

    def build() -> DataFrame:
        d = _spark_shingled(spark, sf_dir)
        return d.select(
            "doc_id",
            F.sort_array(F.array_distinct("shingles")).alias("sharr"),
            F.size(F.array_distinct("shingles")).alias("n_sh"),
        )

    return memo_table(spark, f"prefix_ssjoin_docarr:{sf_dir}", build)


def _build_prefix_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    arr = _spark_doc_arrays(spark, sf_dir)
    doc_sh = arr.select("doc_id", "n_sh", F.explode("sharr").alias("sh"))
    df_tbl = doc_sh.groupBy("sh").agg(F.count(F.lit(1)).alias("c"))
    pos = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.asc("c"), F.asc("sh"))
    )
    prefix = (
        doc_sh.join(df_tbl, "sh")
        .withColumn("pos", pos)
        .filter(F.expr(f"pos <= {_PREFIX_LEN.replace('//', 'div')}"))
        .select("doc_id", "sh", "n_sh", "pos")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    alpha = (
        f"({SSJOIN_T_NUM} * (a.n_sh + b.n_sh) + {SSJOIN_T_NUM} + {SSJOIN_T_DEN} - 1)"
        f" div ({SSJOIN_T_NUM} + {SSJOIN_T_DEN})"
    )
    return (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            F.lit(SSJOIN_T_DEN) * F.least("a.n_sh", "b.n_sh")
            >= F.lit(SSJOIN_T_NUM) * F.greatest("a.n_sh", "b.n_sh")
        )
        .filter(
            F.expr(
                f"least(a.n_sh - a.pos + 1, b.n_sh - b.pos + 1) >= {alpha}"
            )
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_sh_a"),
            F.col("b.n_sh").alias("n_sh_b"),
        )
        .distinct()
    )


def _spark_prefix_ssjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard pairs (>= t) from prefix-filtered candidates,
    verified by per-pair array intersection (map-side, no explode).

    MEMOIZED (r9): the verified pair set is the exact dedup pass's
    standing OUTPUT table — tiny relative to its inputs (true pairs,
    not candidates) — and both the pairs query and the _stats audit
    consume it. Without the memo the audit re-paid the whole
    candidate+verify stream for two scalar counts (measured 27.9s at
    the x10 probe); with it the audit costs one aggregation over the
    materialized output, the same persist-once-and-share contract as
    the minhash signatures and the ANN index."""

    def build() -> DataFrame:
        arr = _spark_doc_arrays(spark, sf_dir)
        cand = _spark_prefix_candidates(spark, sf_dir)
        a = arr.select(
            F.col("doc_id").alias("doc_a"), F.col("sharr").alias("arr_a")
        )
        b = arr.select(
            F.col("doc_id").alias("doc_b"), F.col("sharr").alias("arr_b")
        )
        inter = (
            cand.join(a, "doc_a")
            .join(b, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                "n_sh_a",
                "n_sh_b",
                F.size(F.array_intersect("arr_a", "arr_b")).alias("n_common"),
            )
        )
        return inter.filter(
            F.lit(SSJOIN_T_DEN) * F.col("n_common")
            >= F.lit(SSJOIN_T_NUM)
            * (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common"))
        ).select(
            "doc_a",
            "doc_b",
            "n_common",
            "n_sh_a",
            "n_sh_b",
            (
                F.col("n_common")
                * F.lit(1.0)
                / (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_common"))
            ).alias("jaccard"),
        )

    return memo_table(spark, f"prefix_ssjoin_pairs:{sf_dir}", build)


@query(
    "dedup_prefix_ssjoin_pairs",
    oracle=f"""
WITH {_DUCK_PREFIX_CTE}
SELECT doc_a, doc_b, n_common, n_sh_a, n_sh_b, jaccard FROM ss_pairs
""",
)
def dedup_prefix_ssjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join at Jaccard >= 1/2 over 3-gram
    shingle sets, via AllPairs/PPJoin prefix + length + positional
    filtering — the COMPLETE (zero-false-negative) near-dup pair set,
    unlike MinHash-LSH whose banding can miss pairs (certified equal
    to a brute-force all-pairs scan in pytest). All threshold tests
    are integer arithmetic; the only float is the final reported
    jaccard (one per-row division, IEEE-identical on both engines).

    Scale: document frequency is a vocab-sized aggregate (map-side
    combined); within-doc rarity ordering is a window partitioned by
    doc_id — shard-parallel, NO global sort (the (df, shingle) pair is
    itself the total order, so no global rank assignment is needed).
    Candidate fan-out is bounded by prefix-token co-occurrence, cut
    further by the length filter and the PPJoin positional bound
    (310k -> 125k candidates at sf0.1, identical output); the verify
    stage joins each candidate against the per-doc shingle ARRAY and
    intersects map-side — candidates + docs rows shuffle, never the
    candidates x shingles explosion (which spilled ~80 GB on the x10
    near-copy probe before this shape). At 100 TB the df table is
    computed once and persisted beside the corpus (frozen stats, like
    the ANN index centroids).
    """
    return _spark_prefix_ssjoin_pairs(spark, sf_dir)


@query(
    "dedup_prefix_ssjoin_stats",
    oracle=f"""
WITH {_DUCK_PREFIX_CTE},
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT n_docs,
       CAST(n_docs * (n_docs - 1) / 2 AS BIGINT) AS brute_pairs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_prefix_candidates,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ss_pairs) AS n_exact_pairs,
       round((SELECT COUNT(*) FROM ss_pairs) * 1.0
             / greatest((SELECT COUNT(*) FROM cand), 1), 6)
         AS candidate_precision
FROM n
""",
)
def dedup_prefix_ssjoin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruning audit for the prefix-filtered set-similarity join: how
    many of the O(n^2) brute-force pairs survive prefix+length
    filtering (the work the verify stage actually pays for), and what
    fraction of those candidates are true >= t pairs. The exactness
    guarantee makes this the ground-truth counterpart of
    dedup_lsh_recall_probe's sampled estimate.

    Scale: two scalar counts over the candidate/pair streams the pairs
    query already produces — the audit costs one extra aggregation.
    """
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    cand = _spark_prefix_candidates(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_prefix_candidates")
    )
    pairs = _spark_prefix_ssjoin_pairs(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_exact_pairs")
    )
    return (
        n.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(pairs))
        .select(
            "n_docs",
            (F.col("n_docs") * (F.col("n_docs") - 1) / 2)
            .cast("long")
            .alias("brute_pairs"),
            F.col("n_prefix_candidates").cast("long"),
            F.col("n_exact_pairs").cast("long"),
            F.round(
                F.col("n_exact_pairs")
                * F.lit(1.0)
                / F.greatest(F.col("n_prefix_candidates"), F.lit(1)),
                6,
            ).alias("candidate_precision"),
        )
    )
