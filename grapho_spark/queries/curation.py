"""Corpus-curation operators: PII redaction, duplicated-chunk removal,
language-quota sampling, token-budget mixture selection, and a
Gopher-style composite quality filter.

These extend the LLM-data-pipeline surface beyond the reference
(nikopapanastasiou/grapho has no analytics at all — see SURVEY.md §2.4);
they are the document-level cleaning/selection stages a 100 TB
training-data pipeline runs between ingest and dedup/packing.

Scale notes (local[32] tests, 1000-executor design):

- PII redaction and the quality filter are pure per-row codegen
  (regexp_* builtins) — map-only, no shuffle, trivially linear.
- Chunk-level dedup shuffles once on the chunk hash (global
  first-occurrence election) and once on doc_id (reassembly) — the
  same two-shuffle shape CCNet-style line dedup needs at any scale;
  chunk text itself never rides the first shuffle, only its hash.
- Quota sampling and budget selection use per-group windows ordered by
  a deterministic hash rank — each language/source partition sorts
  independently (no global sort), so the plan is shard-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.queries.text import STOPWORDS, _STOP_SQL
from grapho_spark.tables import load_table

# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------
#
# The synthetic documents fixture contains no natural PII, which would
# make a redaction operator vacuously green (0 matches on both
# engines). To exercise the machinery honestly, the query first embeds
# DETERMINISTIC PII-shaped strings derived from each row's own columns
# (an email, a phone number and an IPv4 address keyed off doc_id /
# n_chars), then runs the real detection + redaction pipeline over the
# result. Both engines derive identically, so counts and redacted text
# are meaningfully compared — the regexes and replacement logic are the
# production path.

_EMAIL_RE = "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PHONE_RE = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
_IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


@query(
    "text_pii_redaction",
    oracle=f"""
WITH seeded AS (
  SELECT doc_id, lang, source,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
              || lpad(CAST(n_chars % 10000 AS VARCHAR), 4, '0')
              || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
              || CAST(n_chars % 256 AS VARCHAR) AS text
  FROM documents)
SELECT doc_id, lang, source,
       len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
       len(regexp_extract_all(
         regexp_replace(text, '{_PHONE_RE}', '', 'g'), '{_IPV4_RE}')) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(text,
         '{_EMAIL_RE}', '<EMAIL>', 'g'),
         '{_PHONE_RE}', '<PHONE>', 'g'),
         '{_IPV4_RE}', '<IP>', 'g') AS redacted
FROM seeded
""",
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: email / phone / IPv4 regex scrub with
    per-class match counts and the redacted text.

    IP counting runs on the phone-stripped text so a phone number's
    digit groups are never double-counted as an address. Redaction
    applies email -> phone -> IP in that order on both engines.

    Scale: map-only codegen (regexp_count / regexp_replace) — no
    shuffle, no UDF; linear in corpus bytes.
    """
    d = load_table(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        "lang",
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("n_chars") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            (F.col("n_chars") % 256).cast("string"),
        ).alias("text"),
    )
    no_phone = F.regexp_replace("text", F.lit(_PHONE_RE), F.lit(""))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(_PHONE_RE),
            F.lit("<PHONE>"),
        ),
        F.lit(_IPV4_RE),
        F.lit("<IP>"),
    )
    return seeded.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), F.lit(0))).alias("n_phones"),
        F.size(F.regexp_extract_all(no_phone, F.lit(_IPV4_RE), F.lit(0))).alias("n_ips"),
        redacted.alias("redacted"),
    )


# --------------------------------------------------------------------------
# Duplicated-chunk removal (CCNet-style line dedup)
# --------------------------------------------------------------------------

_CHUNK_WORDS = 10


@query(
    "text_chunk_dedup_rewrite",
    oracle=f"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
chunks AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(w[(i*{_CHUNK_WORDS})+1 : (i+1)*{_CHUNK_WORDS}], ' ') AS chunk
  FROM words, range(0, 100) t(i)
  WHERE i*{_CHUNK_WORDS} < len(w)),
elected AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks)
SELECT doc_id,
       count(*) AS n_chunks,
       count(*) FILTER (WHERE rn = 1) AS n_kept,
       coalesce(string_agg(chunk, ' ' ORDER BY chunk_idx)
                  FILTER (WHERE rn = 1), '') AS dedup_text
FROM elected
GROUP BY doc_id
""",
)
def text_chunk_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-chunk removal (CCNet-style line dedup): split each doc
    into {_CHUNK_WORDS}-word chunks, elect the globally-first occurrence
    of every distinct chunk (ordered by doc_id, position), and rewrite
    each doc keeping only its first-occurrence chunks.

    Scale: chunk election shuffles on the chunk value once (at 100 TB,
    hash the chunk and elect on the 128-bit hash so only 16-byte keys
    ride the shuffle); reassembly shuffles on doc_id once. No pairwise
    comparison anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("w"))
    chunks = words.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("w") / F.lit(_CHUNK_WORDS)).cast("int") - F.lit(1),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice("w", i * _CHUNK_WORDS + 1, _CHUNK_WORDS)
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    rn = F.row_number().over(
        Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    )
    elected = chunks.select("doc_id", "chunk_idx", "chunk", rn.alias("rn"))
    return elected.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
        F.coalesce(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1,
                                F.struct("chunk_idx", "chunk"),
                            )
                        )
                    ),
                    lambda s: s.chunk,
                ),
            ),
            F.lit(""),
        ).alias("dedup_text"),
    )


# --------------------------------------------------------------------------
# Language-quota sampling
# --------------------------------------------------------------------------

_QUOTA = 40


@query(
    "corpus_language_quota_sample",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents)
SELECT doc_id, lang, n_chars, rk FROM ranked WHERE rk <= {_QUOTA}
""",
)
def corpus_language_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced corpus sampling: keep at most {_QUOTA} docs per
    language, chosen by deterministic hash rank (md5 of doc_id) so the
    sample is stable across runs and engines.

    Scale: one shuffle on lang; each language partition ranks
    independently. For languages too large for one partition, salt the
    rank into buckets and take per-bucket quotas (quota/n_buckets).
    """
    d = load_table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    )
    return (
        d.select("doc_id", "lang", "n_chars", rk.alias("rk"))
        .filter(F.col("rk") <= _QUOTA)
    )


# --------------------------------------------------------------------------
# Token-budget mixture selection
# --------------------------------------------------------------------------

_BUDGET_TOKENS = 1500


@query(
    "corpus_token_budget_mix",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents),
cum AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY source ORDER BY h, doc_id
           ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM toks)
SELECT source,
       count(*) AS docs_kept,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
       CAST(max(cum_tokens) AS BIGINT) AS max_cum
FROM cum
WHERE cum_tokens <= {_BUDGET_TOKENS}
GROUP BY source
""",
)
def corpus_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture selection: give every source the same token
    budget ({_BUDGET_TOKENS} whitespace tokens) and keep docs in
    deterministic hash order until the running total would exceed it —
    the selection stage of building a fixed-size training mix.

    Scale: one shuffle on source; the running sum is a per-source
    window in hash order (no global sort). At 100 TB, sources larger
    than a partition get bucketed sub-budgets (budget/n_buckets per
    salt bucket), which keeps the window shard-local.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    cum = F.sum("n_tokens").over(
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.select("doc_id", "source", "n_tokens", cum.alias("cum_tokens"))
        .filter(F.col("cum_tokens") <= _BUDGET_TOKENS)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
            F.max("cum_tokens").alias("max_cum"),
        )
    )


# --------------------------------------------------------------------------
# Gopher-style composite quality filter
# --------------------------------------------------------------------------


@query(
    "text_gopher_quality_filter",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, source, text,
         string_split_regex(trim(text), '\\s+') AS words
  FROM documents),
sig AS (
  SELECT doc_id, lang, source,
         len(words) AS n_words,
         length(text) * 1.0 / len(words) AS avg_word_len,
         len(list_filter(words, w -> w IN ({_STOP_SQL}))) AS n_stop,
         len(list_distinct(words)) * 1.0 / len(words) AS distinct_ratio
  FROM toks)
SELECT doc_id, lang, source, n_words, avg_word_len, n_stop, distinct_ratio,
       (n_words BETWEEN 5 AND 1000) AS ok_length,
       (avg_word_len BETWEEN 2.0 AND 12.0) AS ok_word_len,
       (n_stop >= 2) AS ok_stopwords,
       (distinct_ratio > 0.2) AS ok_diversity,
       ((n_words BETWEEN 5 AND 1000) AND (avg_word_len BETWEEN 2.0 AND 12.0)
         AND n_stop >= 2 AND distinct_ratio > 0.2) AS accept,
       CASE WHEN NOT (n_words BETWEEN 5 AND 1000) THEN 'length'
            WHEN NOT (avg_word_len BETWEEN 2.0 AND 12.0) THEN 'word_len'
            WHEN n_stop < 2 THEN 'stopwords'
            WHEN distinct_ratio <= 0.2 THEN 'diversity'
            ELSE 'pass' END AS verdict
FROM sig
""",
)
def text_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rules-style composite document filter: word-count bounds,
    mean word length bounds, minimum stopword evidence, lexical
    diversity — each rule surfaced as a flag plus a single accept bit
    and the first-failing-rule verdict (the shape a curation pipeline
    logs for filter-rate audits).

    Scale: pure per-row codegen, map-only; rule thresholds are
    literals so the whole filter inlines into one projection.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    sig = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(words).alias("n_words"),
        (F.length("text") * F.lit(1.0) / F.size(words)).alias("avg_word_len"),
        F.size(
            F.filter(words, lambda w: w.isin(*STOPWORDS))
        ).alias("n_stop"),
        (F.size(F.array_distinct(words)) * F.lit(1.0) / F.size(words)).alias(
            "distinct_ratio"
        ),
    )
    ok_length = F.col("n_words").between(5, 1000)
    ok_word_len = F.col("avg_word_len").between(2.0, 12.0)
    ok_stop = F.col("n_stop") >= 2
    ok_div = F.col("distinct_ratio") > 0.2
    accept = ok_length & ok_word_len & ok_stop & ok_div
    verdict = (
        F.when(~ok_length, "length")
        .when(~ok_word_len, "word_len")
        .when(~ok_stop, "stopwords")
        .when(~ok_div, "diversity")
        .otherwise("pass")
    )
    return sig.select(
        "doc_id",
        "lang",
        "source",
        "n_words",
        "avg_word_len",
        "n_stop",
        "distinct_ratio",
        ok_length.alias("ok_length"),
        ok_word_len.alias("ok_word_len"),
        ok_stop.alias("ok_stopwords"),
        ok_div.alias("ok_diversity"),
        accept.alias("accept"),
        verdict.alias("verdict"),
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split + cross-split leakage check
# --------------------------------------------------------------------------


def _split_expr_sql() -> str:
    """Split assignment from the md5 hash of doc_id: 80/10/10."""
    return (
        "CASE WHEN (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100) < 80 THEN 'train' "
        "WHEN (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100) < 90 THEN 'val' "
        "ELSE 'test' END"
    )


@query(
    "corpus_train_val_test_split",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, lang,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         {_split_expr_sql()} AS split
  FROM documents)
SELECT lang, split,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM assigned GROUP BY lang, split
""",
)
def corpus_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: the assignment is a
    pure function of md5(doc_id) (first 6 hex digits mod 100), so the
    split is reproducible across runs, engines and shards — per
    (lang, split) doc and token counts for the split-balance audit.

    Scale: map-only assignment plus one rollup shuffle; no sampling
    state, no global ordering.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(
            "lang",
            split.alias("split"),
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


_LEAK_SPAN = 8  # tokens per shingled span for the leakage check


@query(
    "corpus_split_leakage",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\\s+') AS words,
         {_split_expr_sql()} AS split
  FROM documents),
spans AS (
  SELECT DISTINCT doc_id, split,
         array_to_string(words[i : i + {_LEAK_SPAN} - 1], ' ') AS span
  FROM assigned, range(1, 1000) t(i)
  WHERE i + {_LEAK_SPAN} - 1 <= len(words)),
train_spans AS (SELECT DISTINCT span FROM spans WHERE split = 'train'),
eval_hits AS (
  SELECT s.split, s.doc_id, count(*) AS n_leaked_spans
  FROM spans s JOIN train_spans t USING (span)
  WHERE s.split <> 'train'
  GROUP BY s.split, s.doc_id)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs_leaked,
       CAST(sum(n_leaked_spans) AS BIGINT) AS n_spans_leaked
FROM eval_hits GROUP BY split
""",
)
def corpus_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination check: {_LEAK_SPAN}-token spans of
    val/test documents that also occur anywhere in the train split —
    the decontamination audit run after splitting (leaked spans mean
    the eval set can be memorized from training data).

    Scale: spans shuffle once on the span value (at 100 TB, hash the
    span first so only 16-byte keys ride the shuffle); the train-span
    set is the join build side. Same no-pairwise shape as
    text_repeated_spans.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    words = F.split(F.trim(F.lower("text")), r"\s+")
    assigned = d.select("doc_id", split.alias("split"), words.alias("words"))
    spans = assigned.select(
        "doc_id",
        "split",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size("words") - _LEAK_SPAN + 1, F.lit(0))
                    ),
                    lambda i: F.concat_ws(" ", F.slice("words", i, _LEAK_SPAN)),
                )
            )
        ).alias("span"),
    ).distinct()
    train_spans = spans.filter(F.col("split") == "train").select("span").distinct()
    hits = (
        spans.filter(F.col("split") != "train")
        .join(train_spans, "span")
        .groupBy("split", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_leaked_spans"))
    )
    return hits.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_leaked"),
        F.sum("n_leaked_spans").cast("long").alias("n_spans_leaked"),
    )


N_SHARDS = 16  # export shards; at 100 TB this is thousands — same plan


@query(
    "corpus_shuffle_shards",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         md5(CAST(doc_id AS VARCHAR) || ':shard') AS h,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 6))
              AS BIGINT) % {N_SHARDS} AS shard
  FROM documents)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       min(h) AS head_hash,
       max(h) AS tail_hash
FROM keyed GROUP BY shard ORDER BY shard
""",
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle-shard manifest for training-data export:
    every document gets a salted hash key h = md5(doc_id || ':shard');
    the first 6 hex digits assign one of N_SHARDS shards and h itself
    is the within-shard training order — a reproducible global shuffle
    with NO global sort and no RNG state (re-running on a grown corpus
    moves only the new docs). The query emits the per-shard manifest a
    training job validates before reading: doc/char counts (shard
    balance), language coverage, and the head/tail order keys.

    The export itself is the same plan plus a write:
    ``keyed.repartition(N_SHARDS, "shard").sortWithinPartitions("h")
    .write.partitionBy("shard").parquet(...)`` — one hash shuffle,
    per-shard local sort, no driver state.

    Scale: assignment is map-only (md5 of the key column, no payload
    movement); the manifest rollup shuffles N_SHARDS * ~langs tiny
    rows. Salted hashing keeps this shard split independent of the
    train/val/test split hash (different salt => uncorrelated).
    """
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard")))
    keyed = d.select(
        "lang",
        "n_chars",
        h.alias("h"),
        (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % N_SHARDS).alias(
            "shard"
        ),
    )
    return (
        keyed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.min("h").alias("head_hash"),
            F.max("h").alias("tail_hash"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# DSIR-style importance reweighting
# --------------------------------------------------------------------------
#
# Data Selection via Importance Resampling (Xie et al., arXiv
# 2302.03169, public): estimate target-domain and raw-corpus
# distributions over HASHED n-gram buckets, then score every raw
# document by its importance log-weight
#     log w(doc) = sum over features f of [ln p_target(b(f)) - ln p_raw(b(f))]
# and keep the highest-weighted docs. The hashed-bucket trick is what
# makes this 100 TB-able: the "model" is two B-sized count vectors, not
# a vocabulary — B is fixed (here 1024) no matter how big the corpus.
#
# Here the target distribution is the corpus's own English slice (in
# production it is an out-of-band high-quality sample); features are
# lowercased whitespace unigrams + adjacent bigrams, hashed with the
# engine-portable md5-prefix trick (same construction as
# corpus_shuffle_shards / the MinHash family).
#
# Determinism (the text_unigram_logprob protocol): each bucket's
# log-ratio is ONE double expression + ln rounded at 6dp (libm-stable
# policy), folded per document as EXACT decimals so the two engines'
# different accumulation orders cannot diverge; both engines compute
# the identical expression tree.

DSIR_BUCKETS = 1024  # hashed feature buckets; fixed regardless of corpus size
DSIR_TARGET_LANG = "en"  # stand-in target domain (the corpus's own en slice)

_DSIR_BIGRAMS_DUCK = (
    "[array_to_string(words[i:i+1], ' ') "
    "for i in range(1, greatest(len(words) - 1, 1) + 1)]"
)


# DuckDB CTE chain shared with the streaming ingest scorer's oracle.
DUCK_DSIR_CTE = f"""w AS (
  SELECT doc_id, lang, source,
         string_split_regex(trim(lower(text)), '\\s+') AS words
  FROM documents),
feats AS (
  SELECT doc_id, lang, source,
         unnest(list_concat(words, {_DSIR_BIGRAMS_DUCK})) AS feat
  FROM w),
b AS (
  SELECT doc_id, lang, source,
         CAST(('0x' || substring(md5(feat), 1, 6)) AS BIGINT)
           % {DSIR_BUCKETS} AS bucket
  FROM feats),
raw_b AS (SELECT bucket, COUNT(*) AS c_raw FROM b GROUP BY bucket),
tgt_b AS (SELECT bucket, COUNT(*) AS c_tgt FROM b
          WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bucket),
tot AS (
  SELECT (SELECT COUNT(*) FROM b) AS t_raw,
         (SELECT COUNT(*) FROM b WHERE lang = '{DSIR_TARGET_LANG}') AS t_tgt),
lam AS (
  SELECT r.bucket,
         CAST(round(ln(
             ((COALESCE(g.c_tgt, 0) + 1.0) / (t_tgt + {DSIR_BUCKETS}))
             / ((r.c_raw + 1.0) / (t_raw + {DSIR_BUCKETS}))
           ), 6) AS DECIMAL(18,6)) AS lam
  FROM raw_b r LEFT JOIN tgt_b g USING (bucket), tot)"""


@query(
    "corpus_dsir_importance",
    oracle=f"""
WITH {DUCK_DSIR_CTE}
SELECT doc_id, lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_feats,
       CAST(SUM(lam) AS DOUBLE) AS log_importance
FROM b JOIN lam USING (bucket)
GROUP BY doc_id, lang, source
""",
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weight per document: hashed-ngram (unigram +
    bigram, md5 -> 1024 buckets) target-vs-raw log-likelihood ratio,
    summed over the document's features. log_importance > 0 means the
    doc looks more like the target (en) distribution than the raw mix
    — the selection signal importance resampling ranks on.

    Scale: the feature stream is a map-only explode (never collected);
    the two distribution estimates are B-sized (1024-row) hash
    aggregates with map-side partial combine; the per-bucket log-ratio
    table is broadcast (16 KB) to the scoring join, so scoring is scan
    + broadcast-join + one groupBy(doc_id). At 100 TB the two count
    vectors are computed once and persisted; re-scoring a grown corpus
    reuses them unchanged (same frozen-stats shape as the ANN index's
    stored centroids).
    """
    b = _dsir_buckets(spark, sf_dir)
    lam = dsir_lambda(spark, sf_dir)
    return (
        b.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lam").cast("double").alias("log_importance"),
        )
    )


# Spark-side feature expression shared by the batch pipeline and the
# streaming ingest scorer (per-row, codegen): unigrams ++ bigrams.
SPARK_DSIR_FEATS = (
    "concat(words, transform(sequence(1, greatest(size(words) - 1, 1)), "
    "i -> concat_ws(' ', slice(words, i, 2))))"
)


def _dsir_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, source, bucket) hashed-feature stream, memoized —
    consumed by the distribution estimates AND the batch scorer."""
    from grapho_spark.sparkutil import memo_table

    def build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        words = F.split(F.trim(F.lower("text")), r"\s+")
        w = d.select("doc_id", "lang", "source", words.alias("words"))
        feats = w.select(
            "doc_id",
            "lang",
            "source",
            F.explode(F.expr(SPARK_DSIR_FEATS)).alias("feat"),
        )
        return feats.select(
            "doc_id",
            "lang",
            "source",
            (
                F.conv(F.substring(F.md5("feat"), 1, 6), 16, 10).cast("long")
                % DSIR_BUCKETS
            ).alias("bucket"),
        )

    return memo_table(spark, f"dsir_buckets:{sf_dir}", build)


def dsir_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, lam DECIMAL(18,6)) per-bucket log-likelihood ratio —
    the DSIR 'model': two add-one-smoothed hashed-ngram distributions
    folded into one broadcastable B-row table. Memoized; the streaming
    scorer freezes exactly this table (same frozen-stats contract as
    the ANN index's stored centroids/codebook)."""
    from grapho_spark.sparkutil import memo_table

    def build() -> DataFrame:
        b = _dsir_buckets(spark, sf_dir)
        is_tgt = F.col("lang") == DSIR_TARGET_LANG
        raw_b = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
        tgt_b = (
            b.filter(is_tgt).groupBy("bucket").agg(F.count(F.lit(1)).alias("c_tgt"))
        )
        tot = b.agg(
            F.count(F.lit(1)).alias("t_raw"),
            F.sum(is_tgt.cast("long")).alias("t_tgt"),
        )
        return (
            raw_b.join(tgt_b, "bucket", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "bucket",
                F.round(
                    F.log(
                        (
                            (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(1.0))
                            / (F.col("t_tgt") + F.lit(DSIR_BUCKETS))
                        )
                        / (
                            (F.col("c_raw") + F.lit(1.0))
                            / (F.col("t_raw") + F.lit(DSIR_BUCKETS))
                        )
                    ),
                    6,
                )
                .cast("decimal(18,6)")
                .alias("lam"),
            )
        )

    return memo_table(spark, f"dsir_lambda:{sf_dir}", build)


# --------------------------------------------------------------------------
# End-to-end training-export manifest: the whole curation funnel as
# ONE declarative plan. Production pipelines run these stages as
# separate jobs with intermediate tables; expressing the composition
# as a single DataFrame lets Catalyst see the whole funnel — the text
# column is pruned the moment the last text-derived value (quality
# gate, content hash, DSIR features) is computed, filters push into
# the scan, and the per-doc stages share one partitioning.
# --------------------------------------------------------------------------


@query(
    "corpus_training_export_manifest",
    oracle=f"""
WITH {DUCK_DSIR_CTE},
imp AS (
  SELECT doc_id, SUM(lam) AS s
  FROM b JOIN lam USING (bucket) GROUP BY doc_id),
base AS (
  SELECT doc_id, lang, n_chars, text,
         string_split_regex(trim(text), '\\s+') AS words
  FROM documents),
accepted AS (
  SELECT doc_id, lang, n_chars, text FROM base
  WHERE len(words) BETWEEN 5 AND 1000
    AND len(list_filter(words, w -> w IN ({_STOP_SQL}))) >= 2
    AND len(list_distinct(words)) * 1.0 / len(words) > 0.2),
deduped AS (
  SELECT doc_id, lang, n_chars FROM (
    SELECT a.*,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM accepted a) WHERE rn = 1),
selected AS (
  SELECT d.doc_id, d.lang, d.n_chars
  FROM deduped d JOIN imp USING (doc_id)
  WHERE imp.s > 0),
keyed AS (
  SELECT lang, n_chars,
         {_split_expr_sql()} AS split,
         md5(CAST(doc_id AS VARCHAR) || ':shard') AS h,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 6))
              AS BIGINT) % {N_SHARDS} AS shard
  FROM selected)
SELECT split, shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       min(h) AS head_hash,
       max(h) AS tail_hash
FROM keyed GROUP BY split, shard
""",
)
def corpus_training_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation funnel composed into one Catalyst plan:
    quality gate (length / stopword / diversity) -> exact dedup
    (first doc per content hash) -> DSIR selection (keep docs whose
    importance log-weight is positive, i.e. more target-like than the
    raw mix, scored against the frozen bucket model) -> deterministic
    80/10/10 split -> salted-hash shard assignment -> per (split,
    shard) export manifest (doc/char counts, language coverage, the
    head/tail within-shard order keys a training job validates).

    Scale: the funnel is three shuffles end to end — the content-hash
    window (dedup election), the doc-keyed importance join, and the
    48-row manifest rollup; every earlier stage is map-only and the
    text column dies as soon as its hash and features are computed.
    The export itself is this same plan with the write described at
    corpus_shuffle_shards; at 100 TB each stage would otherwise be a
    separate job with a materialized table between — composing them
    saves two full corpus writes and lets AQE size every exchange.

    Non-vacuous at the bench SF: sf0.1 runs 5000 -> 3832 (quality) ->
    3825 (exact dedup; the fixture's 8 duplicate texts) -> 1299 (DSIR)
    docs — every stage removes rows.
    """
    from grapho_spark.queries.text import STOPWORDS

    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    n_words = F.size("words")
    base = d.select("doc_id", "lang", "n_chars", "text", words.alias("words"))
    accept = (
        n_words.between(5, 1000)
        & (F.size(F.filter("words", lambda w: w.isin(*STOPWORDS))) >= 2)
        & (F.size(F.array_distinct("words")) * F.lit(1.0) / n_words > 0.2)
    )
    accepted = base.filter(accept).select("doc_id", "lang", "n_chars", "text")
    rn = F.row_number().over(
        Window.partitionBy(F.md5("text")).orderBy("doc_id")
    )
    deduped = (
        accepted.withColumn("rn", rn).filter("rn = 1").select("doc_id", "lang", "n_chars")
    )
    imp = (
        _dsir_buckets(spark, sf_dir)
        .join(F.broadcast(dsir_lambda(spark, sf_dir)), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("lam").alias("s"))
    )
    selected = deduped.join(imp, "doc_id").filter(F.col("s") > 0)
    split_bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long") % 100
    split = (
        F.when(split_bucket < 80, "train")
        .when(split_bucket < 90, "val")
        .otherwise("test")
    )
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard")))
    keyed = selected.select(
        "lang",
        "n_chars",
        split.alias("split"),
        h.alias("h"),
        (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % N_SHARDS).alias("shard"),
    )
    return keyed.groupBy("split", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.min("h").alias("head_hash"),
        F.max("h").alias("tail_hash"),
    )


# --------------------------------------------------------------------------
# Distributed quality-classifier training (logistic regression, GD)
# --------------------------------------------------------------------------

GD_ITERS = 3  # full-batch gradient-descent rounds (LR = 1/2)
_M = 1_000_000  # micro-unit scale: all model math in 1e-6 integers


def _shu(expr: str, den: str, div: str) -> str:
    """Signed half-up integer division ``round(expr / den)`` — the
    repo's micro-unit protocol (timeseries.py): inner operands are
    made non-negative so Spark's ``div`` (truncate) and DuckDB's
    ``//`` (floor) agree."""
    return (
        f"(CASE WHEN ({expr}) >= 0 "
        f"THEN ((2 * ({expr}) + ({den})) {div} (2 * ({den}))) "
        f"ELSE -(((2 * (-({expr})) + ({den}))) {div} (2 * ({den}))) END)"
    )


def _gd_sigmoid(z_micro: str) -> str:
    """Sigmoid on a micro-unit integer logit, back to micro units.
    ONE libm exp() per row on a micro-ROUNDED input, result rounded
    half-up at 1e-6 — the same float-containment policy as the
    surprisal/TF-IDF rounds (both engines round positive halves up)."""
    return (
        f"CAST(round({_M}.0 / (1.0 + exp(-(CAST({z_micro} AS DOUBLE) "
        f"/ {_M}.0)))) AS BIGINT)"
    )


def _gd_feat_sql(
    div: str, words: str, chars: str, extra_cols: str = "", where: str = ""
) -> str:
    """Feature CTE body, engine-parameterized: x1 = stopword ratio,
    x2 = mean word length / 10 (both micro-unit half-up), y = 1 iff
    lang = 'en' (the weak label English stopword density predicts)."""
    flt = (
        f"len(list_filter(w.words, t -> t IN ({_STOP_SQL})))"
        if div == "//"
        else f"size(filter(w.words, t -> t IN ({_STOP_SQL})))"
    )
    n_tok = "len(w.words)" if div == "//" else "size(w.words)"
    # every operand explicitly BIGINT: 1e6 * count overflows INT32, and
    # Spark would WRAP silently (non-ANSI) where DuckDB errors
    return f"""
  SELECT {extra_cols}{_shu(f'{_M} * CAST({flt} AS BIGINT)', f'CAST({n_tok} AS BIGINT)', div)} AS x1,
         {_shu(f'100000 * CAST({chars} AS BIGINT)', f'CAST({n_tok} AS BIGINT)', div)} AS x2,
         CAST(CASE WHEN lang = 'en' THEN {_M} ELSE 0 END AS BIGINT) AS y
  FROM (SELECT doc_id, lang, {words} AS words, text FROM documents{where}) w
"""


# DuckDB-side feature-expression pieces (the Spark twins are inline in
# _gd_feats).
_DUCK_GD_WORDS = r"string_split_regex(trim(lower(text)), '\s+')"
_DUCK_GD_CHARS = r"length(regexp_replace(trim(lower(w.text)), '\s+', '', 'g'))"


def _gd_cte_prefix() -> str:
    """The training CTE chain (feat .. wt{GD_ITERS}) shared by every
    oracle that needs the trained weights — weights are scalar CTEs
    threaded through, bit-identical to the Spark loop."""
    div = "//"
    den = f"2 * n * {_M}"
    parts = [
        "WITH feat AS (",
        _gd_feat_sql(div, _DUCK_GD_WORDS, _DUCK_GD_CHARS),
        "),",
        "nn AS (SELECT COUNT(*) AS n FROM feat),",
        # iteration 1: w = 0 => z = 0 => s = M/2 exactly
        f"""g1 AS (SELECT SUM((CAST(500000 AS BIGINT) - y) * {_M}) AS ga,
             SUM((CAST(500000 AS BIGINT) - y) * x1) AS gb,
             SUM((CAST(500000 AS BIGINT) - y) * x2) AS gc FROM feat),""",
        f"""wt1 AS (SELECT -{_shu('ga', den, div)} AS w0,
              -{_shu('gb', den, div)} AS w1,
              -{_shu('gc', den, div)} AS w2 FROM g1, nn),""",
    ]
    for t in range(2, GD_ITERS + 1):
        p = t - 1
        z = f"w0 + {_shu('w1 * x1 + w2 * x2', str(_M), div)}"
        parts += [
            f"""s{t} AS (SELECT x1, x2, y, {_gd_sigmoid(z)} AS s
      FROM feat, wt{p}),""",
            f"""g{t} AS (SELECT SUM((s - y) * {_M}) AS ga,
             SUM((s - y) * x1) AS gb,
             SUM((s - y) * x2) AS gc FROM s{t}),""",
            f"""wt{t} AS (SELECT w0 - {_shu('ga', den, div)} AS w0,
              w1 - {_shu('gb', den, div)} AS w1,
              w2 - {_shu('gc', den, div)} AS w2 FROM g{t}, wt{p}, nn),""",
        ]
    return "\n".join(parts)


def _gd_oracle() -> str:
    """Batch training oracle: the shared CTE chain + accuracy pass +
    the 4-row (metric, value) report."""
    div = "//"
    zf = f"w0 + {_shu('w1 * x1 + w2 * x2', str(_M), div)}"
    parts = [
        _gd_cte_prefix(),
        f"""sf AS (SELECT {_gd_sigmoid(zf)} AS s, y FROM feat, wt{GD_ITERS}),""",
        f"""acc AS (SELECT {_shu(
            f"{_M} * SUM(CASE WHEN (s >= 500000) = (y = {_M}) THEN 1 ELSE 0 END)",
            "n", div)} AS a
     FROM sf, nn GROUP BY n)""",
        f"""SELECT 'train_accuracy' AS metric, CAST(a AS DOUBLE) / {_M}.0 AS value FROM acc
UNION ALL SELECT 'w_bias', CAST(w0 AS DOUBLE) / {_M}.0 FROM wt{GD_ITERS}
UNION ALL SELECT 'w_mean_word_len', CAST(w2 AS DOUBLE) / {_M}.0 FROM wt{GD_ITERS}
UNION ALL SELECT 'w_stopword_ratio', CAST(w1 AS DOUBLE) / {_M}.0 FROM wt{GD_ITERS}""",
    ]
    return "\n".join(parts)


# Spark twins of the feature expressions (doc_id carried so the
# stream-static scorer can reuse them per document).
_SPARK_GD_X1 = _shu(
    f"{_M} * CAST(size(filter(words, t -> t IN ({_STOP_SQL}))) AS BIGINT)",
    "CAST(size(words) AS BIGINT)",
    "div",
)
_SPARK_GD_X2 = _shu(
    "100000 * CAST(chars AS BIGINT)", "CAST(size(words) AS BIGINT)", "div"
)


def _gd_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, x1, x2, y) feature table, memoized per session —
    shared by the {GD_ITERS} gradient passes, the accuracy pass and
    any consumer of the trained weights."""
    from grapho_spark.sparkutil import memo_table

    def build() -> DataFrame:
        return (
            load_table(spark, sf_dir, "documents")
            .select(
                "doc_id",
                "lang",
                F.split(F.trim(F.lower("text")), r"\s+").alias("words"),
                F.length(
                    F.regexp_replace(F.trim(F.lower("text")), r"\s+", "")
                ).alias("chars"),
            )
            .select(
                "doc_id",
                F.expr(_SPARK_GD_X1).alias("x1"),
                F.expr(_SPARK_GD_X2).alias("x2"),
                F.when(F.col("lang") == "en", F.lit(_M))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("y"),
            )
        )

    return memo_table(spark, f"gd_feats:{sf_dir}", build)


_GD_WEIGHTS: dict[str, tuple[int, int, int]] = {}


def _gd_train(spark: SparkSession, sf_dir: str) -> tuple[int, int, int]:
    """Run the {GD_ITERS}-round GD loop; weights are micro-unit ints,
    memoized per sf_dir (deterministic, so process-wide is safe)."""
    got = _GD_WEIGHTS.get(sf_dir)
    if got is not None:
        return got
    div = "div"
    feats = _gd_feats(spark, sf_dir)

    def grad(w: tuple[int, int, int]) -> tuple[int, int, int, int]:
        w0, w1, w2 = w
        if w0 == 0 and w1 == 0 and w2 == 0:
            s = "CAST(500000 AS BIGINT)"  # sigmoid(0) exactly
        else:
            s = _gd_sigmoid(f"{w0} + {_shu(f'{w1} * x1 + {w2} * x2', str(_M), div)}")
        row = feats.selectExpr(f"{s} AS s", "x1", "x2", "y").agg(
            F.expr(f"SUM((s - y) * {_M})").alias("ga"),
            F.expr("SUM((s - y) * x1)").alias("gb"),
            F.expr("SUM((s - y) * x2)").alias("gc"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return int(row.ga), int(row.gb), int(row.gc), int(row.n)

    def half_up(a: int, d: int) -> int:
        return (2 * a + d) // (2 * d) if a >= 0 else -((2 * -a + d) // (2 * d))

    w = (0, 0, 0)
    for _ in range(GD_ITERS):
        ga, gb, gc, n = grad(w)
        den = 2 * n * _M
        w = (w[0] - half_up(ga, den), w[1] - half_up(gb, den), w[2] - half_up(gc, den))
    _GD_WEIGHTS[sf_dir] = w
    return w


@query("corpus_quality_classifier_gd", oracle=_gd_oracle())
def corpus_quality_classifier_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN a quality classifier distributively: full-batch logistic
    regression ({GD_ITERS} GD rounds, LR 1/2) on per-document features
    (stopword ratio, mean word length / 10, bias) against the weak
    label lang='en' — the fastText-style linear probe every
    production curation stack trains to score web documents, here
    expressed in Spark's native execution model instead of a separate
    training system.

    Determinism: features, logits, gradients and weight updates are
    integer micro-units end-to-end (signed half-up division protocol);
    the ONLY float op is one exp() per row on a micro-rounded logit,
    rounded straight back to micro units. The oracle unrolls all
    {GD_ITERS} iterations as CTEs and matches bit-for-bit.

    Scale: each GD round is ONE map-side-combined aggregate over the
    corpus producing a 3-number gradient; weights go back as plan
    LITERALS (nothing is broadcast, nothing shuffles but the 3-cell
    partial-agg tree). At 100 TB that is {GD_ITERS} linear scans —
    the minimum any full-batch trainer pays — and the same shape
    extends to minibatch SGD by sampling the scan. The scored-corpus
    application of the trained weights is map-only (see
    streaming_curation_filter for the at-ingest shape).
    """
    w = _gd_train(spark, sf_dir)
    feats = _gd_feats(spark, sf_dir)
    div = "div"
    sf = _gd_sigmoid(f"{w[0]} + {_shu(f'{w[1]} * x1 + {w[2]} * x2', str(_M), div)}")
    acc = feats.selectExpr(f"{sf} AS s", "y").agg(
        F.expr(
            _shu(
                f"{_M} * SUM(CASE WHEN (s >= 500000) = (y = {_M}) THEN 1 ELSE 0 END)",
                "COUNT(*)",
                div,
            )
        ).alias("a")
    )
    return acc.selectExpr(
        f"""stack(4,
          'train_accuracy', CAST(a AS DOUBLE) / {_M}.0,
          'w_bias', CAST({w[0]} AS DOUBLE) / {_M}.0,
          'w_mean_word_len', CAST({w[2]} AS DOUBLE) / {_M}.0,
          'w_stopword_ratio', CAST({w[1]} AS DOUBLE) / {_M}.0
        ) AS (metric, value)"""
    )


# Keep fractions for the calibration dial: "keep the top f of the
# corpus by classifier score".
_CAL_KEEP = (0.9, 0.75, 0.5, 0.25, 0.1)


def _gd_calibration_oracle() -> str:
    div = "//"
    z = f"w0 + {_shu('w1 * x1 + w2 * x2', str(_M), div)}"
    rows = ", ".join(f"({f})" for f in _CAL_KEEP)
    feat_d = _gd_feat_sql(div, _DUCK_GD_WORDS, _DUCK_GD_CHARS, extra_cols="doc_id, ")
    return f"""{_gd_cte_prefix()}
feat_d AS (
{feat_d}
),
scored AS (
  SELECT doc_id, y, {_gd_sigmoid(z)} AS s
  FROM feat_d, wt{GD_ITERS}),
ranked AS (
  SELECT s, ROW_NUMBER() OVER (ORDER BY s, doc_id) AS rn FROM scored),
nn2 AS (SELECT COUNT(*) AS n FROM scored),
targets AS (SELECT f FROM (VALUES {rows}) t(f)),
thr AS (
  SELECT t.f, r.s AS thr_s
  FROM targets t, nn2, ranked r
  WHERE r.rn = n - CAST(ceil(t.f * n) AS BIGINT) + 1),
agg AS (
  SELECT thr.f, thr.thr_s,
         CAST(SUM(CASE WHEN sc.s >= thr.thr_s THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         CAST(SUM(CASE WHEN sc.s >= thr.thr_s AND sc.y = {_M} THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_en,
         CAST(SUM(CASE WHEN sc.y = {_M} THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM scored sc, thr GROUP BY thr.f, thr.thr_s)
SELECT CAST(f AS DOUBLE) AS target_keep,
       CAST(thr_s AS DOUBLE) / {_M}.0 AS threshold_score,
       n_keep,
       CAST({_shu(f'{_M} * n_keep', 'n', div)} AS DOUBLE) / {_M}.0 AS keep_rate,
       CAST({_shu(f'{_M} * n_keep_en', 'n_keep', div)} AS DOUBLE) / {_M}.0 AS precision_en,
       CAST({_shu(f'{_M} * n_keep_en', 'n_en', div)} AS DOUBLE) / {_M}.0 AS recall_en
FROM agg
"""


@query("corpus_quality_calibration", oracle=_gd_calibration_oracle())
def corpus_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold calibration for the trained quality classifier: for
    each target keep-fraction ("keep the top 90/75/50/25/10% of the
    corpus by score") find the EXACT score threshold (the rank-based
    order statistic, ties resolved by doc_id so the cut is
    reproducible) and report the realized keep rate plus
    precision/recall against the weak label — the calibration table a
    curation pipeline publishes next to a trained filter so downstream
    consumers pick thresholds from measured trade-offs, not guesses.

    Scale: scoring is map-only (weights are plan literals); the order
    statistic here is an exact global rank — a one-window dial, the
    same deliberate test-SF luxury as the recall dials. At 100 TB the
    threshold comes from approx_percentile (or a sampled exact rank)
    and everything downstream of `thr` is unchanged: one broadcast of
    5 thresholds and one aggregate pass.
    """
    from pyspark.sql import Window

    w0, w1, w2 = _gd_train(spark, sf_dir)
    div = "div"
    s = _gd_sigmoid(f"{w0} + {_shu(f'{w1} * x1 + {w2} * x2', str(_M), div)}")
    scored = _gd_feats(spark, sf_dir).selectExpr("doc_id", "y", f"{s} AS s")
    n = scored.count()
    ranked = scored.select(
        "s", F.row_number().over(Window.orderBy("s", "doc_id")).alias("rn")
    )
    import math

    ks = {f: n - math.ceil(f * n) + 1 for f in _CAL_KEEP}
    kmap = spark.createDataFrame(
        [(float(f), int(k)) for f, k in ks.items()], "f double, rn int"
    )
    thr = ranked.join(F.broadcast(kmap), "rn").select("f", F.col("s").alias("thr_s"))
    agg = (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("f", "thr_s")
        .agg(
            F.sum(F.when(F.col("s") >= F.col("thr_s"), 1).otherwise(0))
            .cast("long")
            .alias("n_keep"),
            F.sum(
                F.when((F.col("s") >= F.col("thr_s")) & (F.col("y") == _M), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_keep_en"),
            F.sum(F.when(F.col("y") == _M, 1).otherwise(0)).cast("long").alias("n_en"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    return agg.select(
        F.col("f").cast("double").alias("target_keep"),
        (F.col("thr_s").cast("double") / _M).alias("threshold_score"),
        "n_keep",
        (F.expr(_shu(f"{_M} * n_keep", "n", div)).cast("double") / _M).alias("keep_rate"),
        (F.expr(_shu(f"{_M} * n_keep_en", "n_keep", div)).cast("double") / _M).alias(
            "precision_en"
        ),
        (F.expr(_shu(f"{_M} * n_keep_en", "n_en", div)).cast("double") / _M).alias(
            "recall_en"
        ),
    )


# ------------------------------------------------ temperature mixture

_MIX_TAUS = (0.3, 0.7, 1.0)  # sampling temperatures (mT5-style)


def _temp_pow(share_micro: str, tau: float) -> str:
    """share^(1/tau) -> integer micro units. ONE libm pow() per source
    on a micro-ROUNDED share, rounded straight back to micro — the
    same float-containment policy as the GD sigmoid."""
    return (
        f"CAST(round(pow(CAST({share_micro} AS DOUBLE) / {_M}.0, "
        f"{1.0 / tau!r}) * {_M}) AS BIGINT)"
    )


def _temp_mixture_oracle() -> str:
    div = "//"
    taus = ", ".join(f"({t})" for t in _MIX_TAUS)
    return f"""
WITH by_src AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_toks
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS total FROM by_src),
shares AS (
  SELECT source, n_toks,
         {_shu(f'{_M} * n_toks', 'total', div)} AS share_micro
  FROM by_src, tot),
powed AS (
  SELECT t.tau, s.source, s.n_toks, s.share_micro,
         CASE {' '.join(f'WHEN t.tau = {t} THEN ' + _temp_pow('s.share_micro', t) for t in _MIX_TAUS)} END AS v
  FROM shares s, (SELECT CAST(f AS DOUBLE) AS tau FROM (VALUES {taus}) x(f)) t),
sums AS (SELECT tau, CAST(SUM(v) AS BIGINT) AS sv FROM powed GROUP BY tau)
SELECT p.tau, p.source, p.n_toks,
       CAST(p.share_micro AS DOUBLE) / {_M}.0 AS raw_share,
       CAST({_shu(f'{_M} * p.v', 'sv', div)} AS DOUBLE) / {_M}.0 AS temp_weight
FROM powed p JOIN sums USING (tau)
"""


@query("corpus_temperature_mixture", oracle=_temp_mixture_oracle())
def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights (the mT5/multilingual
    recipe): w_i ∝ share_i^(1/τ) for τ in {_MIX_TAUS} — τ=1 reproduces
    natural proportions, τ<1 flattens the mixture toward rare sources.
    Published per (τ, source) with the raw share alongside, so the
    training loader reads its epoch weights straight off this table.

    Determinism: shares and normalized weights are integer micro-unit
    half-up divisions; the ONLY float op is one pow() per (τ, source)
    on a micro-rounded share, rounded straight back to micro before
    the integer normalization sum (so Spark's and DuckDB's float
    accumulation orders can't touch the result).

    Scale: everything after the sources-sized groupBy is arithmetic
    on a ~20-row table; the corpus is touched exactly once.
    """
    taus = spark.createDataFrame([(t,) for t in _MIX_TAUS], "tau double")
    by_src = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("n_toks"))
    )
    tot = by_src.agg(F.sum("n_toks").cast("long").alias("total"))
    div = "div"
    shares = by_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_toks",
        F.expr(_shu(f"{_M} * n_toks", "total", div)).alias("share_micro"),
    )
    v = "CASE " + " ".join(
        f"WHEN tau = {t} THEN " + _temp_pow("share_micro", t) for t in _MIX_TAUS
    ) + " END"
    powed = shares.crossJoin(F.broadcast(taus)).selectExpr(
        "tau", "source", "n_toks", "share_micro", f"{v} AS v"
    )
    sums = powed.groupBy("tau").agg(F.sum("v").cast("long").alias("sv"))
    return powed.join(F.broadcast(sums), "tau").select(
        "tau",
        "source",
        "n_toks",
        (F.col("share_micro").cast("double") / _M).alias("raw_share"),
        (F.expr(_shu(f"{_M} * v", "sv", div)).cast("double") / _M).alias(
            "temp_weight"
        ),
    )


@query(
    "corpus_curriculum_phases",
    oracle="""
WITH b AS (
  SELECT quantile_cont(n_chars, 0.25) AS q1,
         quantile_cont(n_chars, 0.50) AS q2,
         quantile_cont(n_chars, 0.75) AS q3
  FROM documents),
keyed AS (
  SELECT doc_id, lang, n_chars,
         md5(CAST(doc_id AS VARCHAR) || ':curriculum') AS h,
         1 + CAST(n_chars > (SELECT q1 FROM b) AS INT)
           + CAST(n_chars > (SELECT q2 FROM b) AS INT)
           + CAST(n_chars > (SELECT q3 FROM b) AS INT) AS phase
  FROM documents)
SELECT phase,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       min(h) AS head_hash,
       max(h) AS tail_hash
FROM keyed GROUP BY phase
""",
)
def corpus_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-curriculum phase manifest: documents are bucketed into 4
    training phases by VALUE-based n_chars quartiles (shortest-first
    curriculum), with a salted-hash within-phase order key — the same
    no-global-sort reproducible-order trick as corpus_shuffle_shards,
    so phase N's docs stream in a deterministic shuffled order. The
    quartile boundaries come from one percentile aggregate (quarter
    fractions interpolate exactly in binary64, so Spark's and DuckDB's
    interpolation cannot diverge) and broadcast to the bucketing pass.

    Scale: boundary estimation is one aggregate; phase assignment is
    map-only against 3 broadcast scalars (no global NTILE sort, which
    would single-partition the corpus); the manifest rollup moves 4
    rows. The export is the manifest plan + repartition(phase)/sort(h)
    write, same as the shard exporter.
    """
    d = load_table(spark, sf_dir, "documents")
    b = d.agg(
        F.percentile("n_chars", 0.25).alias("q1"),
        F.percentile("n_chars", 0.50).alias("q2"),
        F.percentile("n_chars", 0.75).alias("q3"),
    )
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":curriculum")))
    keyed = d.crossJoin(F.broadcast(b)).select(
        "lang",
        "n_chars",
        h.alias("h"),
        (
            F.lit(1)
            + (F.col("n_chars") > F.col("q1")).cast("int")
            + (F.col("n_chars") > F.col("q2")).cast("int")
            + (F.col("n_chars") > F.col("q3")).cast("int")
        ).alias("phase"),
    )
    return keyed.groupBy("phase").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.min("h").alias("head_hash"),
        F.max("h").alias("tail_hash"),
    )
