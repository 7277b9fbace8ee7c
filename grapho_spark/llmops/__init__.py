"""LLM-training-data pipeline operators: dedup, similarity, text
analysis (see grapho_spark.queries.{dedup,text,embeddings} for the
oracle-checked query forms) and multimodal column plumbing."""

from grapho_spark.llmops.multimodal import (
    attach_blob_metadata,
    decode_audio_batch,
    decode_media_batch,
    extract_embedding_batch,
    sample_frames,
    segment_audio,
)

__all__ = [
    "attach_blob_metadata",
    "decode_audio_batch",
    "decode_media_batch",
    "extract_embedding_batch",
    "sample_frames",
    "segment_audio",
]
