"""Multimodal-plumbing queries: binary payloads (synthesized
deterministically from document text — no media fixtures exist) pushed
through the real Spark machinery: JVM-side metadata extraction, Arrow
``mapInPandas`` decode (stubbed codec), frame-sampling explode. The
oracles recompute the deterministic fake decode independently in SQL,
so the whole Python batch path is value-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.tables import load_table


def _blob_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


@query(
    "multimodal_blob_metadata",
    oracle="""
SELECT doc_id AS id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       'application/octet-stream' AS mime
FROM documents
""",
)
def multimodal_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side blob metadata pass (length/md5/magic-sniff) — no
    Python touches the payloads."""
    from grapho_spark.llmops import attach_blob_metadata

    return attach_blob_metadata(_blob_df(spark, sf_dir), "payload", "doc_id")


_DECODE_CTE = """
decoded AS (
  SELECT doc_id AS id,
         octet_length(encode(text)) AS n_bytes,
         list_sum([ascii(substring(text, i, 1))
                   for i in range(1, least(64, length(text)) + 1)]) AS checksum
  FROM documents),
meta AS (
  SELECT id, n_bytes,
         (16 + checksum % 241)::INT AS width,
         (16 + (checksum // 7) % 241)::INT AS height,
         (1 + n_bytes % 4)::INT AS n_frames
  FROM decoded)
"""


@query(
    "multimodal_decode_stub",
    oracle=f"""
WITH {_DECODE_CTE}
SELECT id, n_bytes, width, height, n_frames, TRUE AS decode_ok FROM meta
""",
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow mapInPandas decode path with the deterministic stub
    codec; the oracle recomputes width/height/frames from the same
    bytes in SQL — verifying batch shapes, schema, and the Python
    roundtrip end to end."""
    from grapho_spark.llmops import decode_media_batch

    meta = decode_media_batch(_blob_df(spark, sf_dir), "payload", "doc_id")
    return meta.select("id", "n_bytes", "width", "height", "n_frames", "decode_ok")


@query(
    "multimodal_frame_sampling",
    oracle=f"""
WITH {_DECODE_CTE}
SELECT id, n_frames, unnest(range(0, n_frames, 2)) AS frame_idx FROM meta
""",
)
def multimodal_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan: every 2nd frame index per media item,
    exploded JVM-side (sequence+explode, no Python)."""
    from grapho_spark.llmops import decode_media_batch, sample_frames

    meta = decode_media_batch(_blob_df(spark, sf_dir), "payload", "doc_id")
    return sample_frames(meta, every_nth=2).select(
        "id", "n_frames", F.col("frame_idx").cast("long").alias("frame_idx")
    )


@query(
    "multimodal_embedding_pipeline",
    oracle="""
WITH emb AS (
  SELECT doc_id AS id,
         [COALESCE(CAST(list_sum(
             [ascii(substring(text, j + 1, 1))
              for j in range(0, least(64, length(text))) if j % 8 = i]
           ) AS DOUBLE), 0.0)
          for i in range(0, 8)] AS embedding
  FROM documents),
dots AS (
  SELECT id, embedding, k,
         list_sum([embedding[i + 1] * ((i * 7 + k * 13) % 11 - 5)
                   for i in range(0, 8)]) AS dot
  FROM emb, range(0, 4) t(k))
SELECT id,
       array_to_string(
         list_transform(ANY_VALUE(embedding),
                        v -> CAST(CAST(v AS DECIMAL(12,1)) AS VARCHAR)),
         ',') AS embedding_csv,
       CAST(list_sum(ANY_VALUE(embedding)) AS DOUBLE) AS l1_norm,
       CAST(SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << k) ELSE 0 END) AS BIGINT)
         AS bucket
FROM dots GROUP BY id
""",
)
def multimodal_embedding_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal pipeline: payload -> Arrow mapInPandas feature
    extraction (stub encoder, deterministic) -> JVM-side L1 norm and a
    4-bit random-hyperplane bucket over the extracted vectors — the
    blob-to-ANN-bucket shape of a multimodal dedup/search pipeline,
    value-checked end to end.

    Scale: extraction is one Python roundtrip per Arrow batch; the
    norm/bucket math runs codegen'd on the array column; bucketing
    feeds the same LSH join pattern as embedding_rp_lsh_neardup.

    The vector is emitted as a deterministic CSV string
    (``embedding_csv``) rather than ``array<double>`` because the
    driver's pandas canonicalizer cannot hash list cells.
    """
    from grapho_spark.llmops import extract_embedding_batch

    emb = extract_embedding_batch(_blob_df(spark, sf_dir), "payload", "doc_id")
    bucket = (
        "aggregate(sequence(0, 3), 0L, (acc, k) -> acc + "
        "CASE WHEN aggregate(sequence(0, 7), 0D, (a2, i) -> "
        "a2 + embedding[i] * (pmod(i * 7 + k * 13, 11) - 5)) >= 0D "
        "THEN shiftleft(1L, k) ELSE 0L END)"
    )
    return emb.select(
        "id",
        F.expr(
            "concat_ws(',', transform(embedding,"
            " v -> cast(cast(v as decimal(12,1)) as string)))"
        ).alias("embedding_csv"),
        F.expr("cast(aggregate(embedding, 0D, (acc, x) -> acc + x) as double)").alias(
            "l1_norm"
        ),
        F.expr(bucket).alias("bucket"),
    )


AUDIO_WIN = 400  # samples per window (25 ms at 16 kHz)
AUDIO_HOP = 160  # hop (10 ms)


@query(
    "multimodal_audio_windows",
    oracle=f"""
WITH audio AS (
  SELECT doc_id AS id,
         octet_length(encode(text)) * 2 AS n_samples
  FROM documents),
win AS (
  SELECT id, n_samples,
         CASE WHEN n_samples >= {AUDIO_WIN}
              THEN (n_samples - {AUDIO_WIN}) // {AUDIO_HOP} + 1
              ELSE 0 END AS n_win
  FROM audio)
SELECT id, i AS win_idx,
       i * {AUDIO_HOP} AS start_sample,
       i * {AUDIO_HOP} + {AUDIO_WIN} AS end_sample,
       round(i * {AUDIO_HOP} * 1000.0 / 16000, 3) AS start_ms
FROM win, range(0, 100000) t(i)
WHERE i < n_win
""",
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio segmentation plumbing: payloads decoded to
    (n_samples, rate) via an Arrow ``mapInPandas`` stub codec, then
    segmented into {AUDIO_WIN}-sample windows at {AUDIO_HOP}-sample hop
    (25 ms / 10 ms at 16 kHz — the standard ASR feature grid) with a
    JVM-side sequence+explode; tail windows dropped, sub-window
    payloads yield zero rows. The oracle recomputes the deterministic
    stub decode in SQL, so the whole Python batch path is
    value-checked.

    Scale: decode is one Arrow roundtrip per partition batch; the
    window explode is pure codegen with fan-out n_samples/hop —
    linear in audio duration, no shuffle.
    """
    from grapho_spark.llmops import decode_audio_batch, segment_audio

    meta = decode_audio_batch(_blob_df(spark, sf_dir), "payload", "doc_id")
    return segment_audio(meta, win=AUDIO_WIN, hop=AUDIO_HOP).select(
        "id",
        F.col("win_idx").cast("long").alias("win_idx"),
        F.col("start_sample").cast("long").alias("start_sample"),
        F.col("end_sample").cast("long").alias("end_sample"),
        "start_ms",
    )


@query(
    "multimodal_frame_dedup",
    oracle=f"""
WITH {_DECODE_CTE},
frames AS (
  SELECT id, width, height, unnest(range(0, n_frames, 2)) AS frame_idx
  FROM meta),
sigs AS (
  SELECT id,
         md5(CAST(width AS VARCHAR) || 'x' || CAST(height AS VARCHAR)
             || ':' || CAST(frame_idx AS VARCHAR)) AS frame_sig
  FROM frames)
SELECT frame_sig,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(COUNT(DISTINCT id) AS BIGINT) AS n_items
FROM sigs
GROUP BY frame_sig
HAVING COUNT(*) >= 3
ORDER BY n_frames DESC, frame_sig
LIMIT 15
""",
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-item frame-level dedup over the stub-decoded media: each
    sampled frame gets a content signature (here the deterministic
    stub's dimensions + index; a real codec would perceptual-hash the
    pixel buffer through the same column), and signatures shared by 3+
    frames across items surface as duplicate candidates — the
    video-dedup step that removes re-uploads before training.

    Scale: frames explode JVM-side from the Arrow-decoded metadata;
    the signature is one md5 in codegen, and the dedup is a
    hash-groupBy on the signature (pixel payloads would never
    shuffle — only their hashes do, same as text dedup).
    """
    from grapho_spark.llmops import decode_media_batch, sample_frames

    meta = decode_media_batch(_blob_df(spark, sf_dir), "payload", "doc_id")
    # sample_frames projects to (id, n_frames, frame_idx); join the
    # dimensions back from the decoded metadata for the signature
    frames = sample_frames(meta, every_nth=2).join(
        meta.select("id", "width", "height"), "id"
    )
    sigs = frames.select(
        "id",
        F.md5(
            F.concat_ws(
                "",
                F.concat_ws("x", F.col("width").cast("string"), F.col("height").cast("string")),
                F.lit(":"),
                F.col("frame_idx").cast("string"),
            )
        ).alias("frame_sig"),
    )
    return (
        sigs.groupBy("frame_sig")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.countDistinct("id").cast("long").alias("n_items"),
        )
        .filter(F.col("n_frames") >= 3)
        .orderBy(F.desc("n_frames"), "frame_sig")
        .limit(15)
    )
