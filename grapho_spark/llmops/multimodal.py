"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The Spark-side machinery here is REAL and tested: schemas, batch
iteration, partition-preserving transforms, deterministic fake
decoding. The actual codec step is STUBBED (``NotImplementedError``
behind ``real_decode=True``) because image/audio libraries are not in
this container — swap ``_fake_decode_header`` for PIL/ffmpeg in
production; every signature stays the same.

Scale notes: binary payloads never pass through Python row-at-a-time —
they move as Arrow buffers into pandas batches; metadata-only
operations (size, hash, mime sniff) stay JVM-side as built-ins.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "id long, n_bytes long, content_md5 string, mime string, "
    "width int, height int, n_frames int, decode_ok boolean"
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"GIF8": "image/gif",
}


def attach_blob_metadata(df: DataFrame, blob_col: str, id_col: str) -> DataFrame:
    """JVM-side (no Python) metadata: byte length, md5, magic-byte mime
    sniff. This is the cheap first pass that lets later stages
    partition/filter without touching payloads."""
    mime = F.lit("application/octet-stream")
    for magic, m in _MAGIC.items():
        hex_prefix = magic.hex()
        mime = F.when(
            F.hex(F.substring(F.col(blob_col), 1, len(magic))) == hex_prefix.upper(),
            F.lit(m),
        ).otherwise(mime)
    return df.select(
        F.col(id_col).alias("id"),
        F.length(blob_col).alias("n_bytes"),
        F.md5(F.col(blob_col)).alias("content_md5"),
        mime.alias("mime"),
    )


def _fake_decode_header(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives (width, height,
    n_frames) from the payload bytes. Replace with PIL/ffmpeg."""
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    width = 16 + (checksum % 241)
    height = 16 + ((checksum // 7) % 241)
    n_frames = 1 + (n % 4)
    return width, height, n_frames


def decode_media_batch(
    df: DataFrame, blob_col: str, id_col: str, real_decode: bool = False
) -> DataFrame:
    """Decode/inspect media payloads via ``mapInPandas`` (Arrow batch
    in, Arrow batch out; one Python roundtrip per partition batch, not
    per row)."""
    if real_decode:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; the Spark plumbing below is the production "
            "shape — swap _fake_decode_header for the codec"
        )

    import hashlib

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf[blob_col]
            ]
            n = len(payloads)
            # All header math runs vectorized over one (n, 64) uint8
            # matrix (single frombuffer over the zero-padded
            # concatenation); only md5 is per-item (as a real hash is).
            heads = (
                np.frombuffer(
                    b"".join(p[:64].ljust(64, b"\0") for p in payloads),
                    dtype=np.uint8,
                )
                .reshape(n, 64)
                .astype(np.uint16)
            )
            checksum = heads.sum(axis=1).astype(np.int64)
            n_bytes = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=n
            )
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64").to_numpy(),
                    "n_bytes": n_bytes,
                    "content_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                    "mime": "application/octet-stream",
                    "width": (16 + checksum % 241).astype(np.int32),
                    "height": (16 + (checksum // 7) % 241).astype(np.int32),
                    "n_frames": (1 + n_bytes % 4).astype(np.int32),
                    "decode_ok": True,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(decode, schema=MEDIA_META_SCHEMA)


def sample_frames(
    meta: DataFrame, every_nth: int = 2
) -> DataFrame:
    """Frame sampling plan over decoded metadata: one output row per
    kept frame index — pure JVM explode, no Python. (In production the
    per-frame extraction would be a second mapInPandas keyed by
    (id, frame_idx).)"""
    return meta.select(
        "id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )


EMBED_DIM = 8


def extract_embedding_batch(
    df: DataFrame, blob_col: str, id_col: str, real_extract: bool = False
) -> DataFrame:
    """Feature extraction over media payloads via ``mapInPandas``:
    payload -> fixed-width embedding (Arrow batch in/out). The real
    model call is STUBBED (``NotImplementedError`` behind
    ``real_extract=True``); the stand-in derives dim i from the bytes
    at positions ``j % EMBED_DIM == i`` of the first 64 bytes —
    deterministic, so the whole batch path is oracle-checkable.

    Scale: embeddings leave Python as Arrow fixed-width lists; the
    downstream ANN/bucketing runs JVM-side on the array column.
    """
    if real_extract:
        raise NotImplementedError(
            "real feature extraction requires a model runtime not present in "
            "this environment; swap the stub for the encoder call — the "
            "mapInPandas plumbing is the production shape"
        )

    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf[blob_col]
            ]
            n = len(payloads)
            heads = (
                np.frombuffer(
                    b"".join(p[:64].ljust(64, b"\0") for p in payloads),
                    dtype=np.uint8,
                )
                .reshape(n, 64)
                .astype(np.float64)
            )
            # lane i = sum of bytes at positions j ≡ i (mod EMBED_DIM):
            # reshape (n, 64) -> (n, 64/DIM, DIM) and sum the middle
            # axis — one vectorized reduction for the whole batch.
            lanes = heads.reshape(n, 64 // EMBED_DIM, EMBED_DIM).sum(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64").to_numpy(),
                    "embedding": list(lanes),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        extract, schema="id long, embedding array<double>"
    )


AUDIO_META_SCHEMA = (
    "id long, n_bytes long, n_samples long, sample_rate int, decode_ok boolean"
)

AUDIO_SAMPLES_PER_BYTE = 2
AUDIO_RATE = 16000


def decode_audio_batch(
    df: DataFrame, blob_col: str, id_col: str, real_decode: bool = False
) -> DataFrame:
    """Audio header inspection via ``mapInPandas`` (same Arrow-batch
    shape as decode_media_batch): derives (n_samples, sample_rate)
    per payload. The stub maps bytes deterministically
    (n_samples = n_bytes * {spb}, rate = {rate}); swap for
    soundfile/ffprobe in production.""".format(
        spb=AUDIO_SAMPLES_PER_BYTE, rate=AUDIO_RATE
    )
    if real_decode:
        raise NotImplementedError(
            "real audio decoding requires soundfile/ffmpeg, absent in this "
            "environment; the Spark plumbing is the production shape"
        )

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf[blob_col]]
            n = len(payloads)
            n_bytes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64").to_numpy(),
                    "n_bytes": n_bytes,
                    "n_samples": n_bytes * AUDIO_SAMPLES_PER_BYTE,
                    "sample_rate": np.full(n, AUDIO_RATE, dtype=np.int32),
                    "decode_ok": True,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(decode, schema=AUDIO_META_SCHEMA)


def segment_audio(meta: DataFrame, win: int, hop: int) -> DataFrame:
    """Fixed-window audio segmentation plan over decoded metadata: one
    row per (id, window) with sample offsets and ms timestamps — pure
    JVM sequence+explode, no Python. Windows shorter than ``win`` at
    the tail are dropped (VAD/feature extractors want full frames);
    payloads under one window yield zero rows."""
    n_win = F.when(
        F.col("n_samples") >= win,
        (F.col("n_samples") - F.lit(win)) / F.lit(hop) + 1,
    ).otherwise(F.lit(0)).cast("long")
    # sequence(0, -1) would yield [0, -1] (Spark sequences run
    # backwards when start > stop), so zero-window payloads must map
    # to an empty array, not a degenerate sequence.
    idx = F.when(n_win > 0, F.sequence(F.lit(0), n_win - 1)).otherwise(
        F.array().cast("array<long>")
    )
    return (
        meta.select(
            "id",
            "n_samples",
            "sample_rate",
            F.explode(idx).alias("win_idx"),
        )
        .select(
            "id",
            "win_idx",
            (F.col("win_idx") * hop).alias("start_sample"),
            (F.col("win_idx") * hop + win).alias("end_sample"),
            F.round(
                F.col("win_idx") * hop * 1000.0 / F.col("sample_rate"), 3
            ).alias("start_ms"),
        )
    )
