"""CDC (change-data-capture) bridge from the engine's commit log to
Structured Streaming.

The reference's only stream-like artifact is its write-ahead commit
log (/root/reference/server/commitlog.go:92-158 — ordered single
writer, group fsync); SURVEY.md §2.3 flags "treat as a Structured
Streaming file source" as the natural extension. Spark's file source
assumes IMMUTABLE files — it tracks completed file names and never
re-reads appended bytes — so a live append-only log cannot be tailed
directly. The bridge:

1. ``export_cdc_segments(engine)`` — copies commit-log entries past
   the last exported offset into a new immutable segment file
   ``<data_dir>/cdc/segment-<n>.jsonl`` (call after commits, e.g. on
   flush; each segment is closed forever, satisfying the file-source
   contract). Each record carries the global seq, the statement kind,
   and the target table.
2. ``cdc_stream(spark, data_dir)`` — ``readStream`` over the segment
   directory with an explicit schema (never inferred on a stream).
3. ``changes_per_table(cdc)`` — example downstream operator: running
   mutation counts per (table, op), the shape a downstream
   materializer or cache-invalidator would consume.

Scale: segments are the standard log-shipping layout (Kafka segment
files, Delta commit logs); the stream source lists only NEW files per
microbatch, and the per-(table, op) aggregation state is bounded by
the catalog size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CDC_SCHEMA = "seq LONG, op STRING, kind STRING, table STRING, payload STRING"

_KIND_TO_OP = {
    "InsertNodeStmt": ("insert", "node"),
    "InsertEdgeStmt": ("insert", "edge"),
    "UpdateNodeStmt": ("update", "node"),
    "UpdateEdgeStmt": ("update", "edge"),
    "DeleteNodeStmt": ("delete", "node"),
    "DeleteEdgeStmt": ("delete", "edge"),
}

_TYPE_FIELDS = ("node_type", "edge_type", "name")


def _cdc_dir(data_dir: str) -> str:
    return os.path.join(data_dir, "cdc")


def export_cdc_segments(engine) -> int:
    """Export commit-log entries newer than the last exported segment
    into one new immutable segment file; returns the number of change
    records exported (0 = no new segment written).

    Crash/race safety:

    - The offset advances only by the count of lines that PARSED — a
      torn final line (a reader racing the engine's append) or a
      corrupt line stays un-exported and is retried on the next call,
      never silently skipped.
    - Segments are named by the commit-log offset they start at
      (``segment-<offset>.jsonl``), so two exporters can never race to
      the same name for different data, and a crash between segment
      publish and the offset write is detected on re-run: the segment
      for the current offset already exists, so we advance past it
      instead of duplicating its records into a new segment.
    """
    data_dir = engine.data_dir
    if not data_dir:
        raise ValueError("engine has no data_dir; nothing to export")
    cdc_dir = _cdc_dir(data_dir)
    os.makedirs(cdc_dir, exist_ok=True)

    state_path = os.path.join(cdc_dir, "_exported_offset")
    try:
        with open(state_path, encoding="utf-8") as f:
            offset = int(f.read().strip() or 0)
    except FileNotFoundError:
        offset = 0

    seg_path = os.path.join(cdc_dir, f"segment-{offset:012d}.jsonl")
    if os.path.exists(seg_path):
        # Previous run crashed after publishing this segment but before
        # recording the offset: the segment is durable (one record per
        # parsed log line), so just advance the offset past it.
        with open(seg_path, encoding="utf-8") as f:
            n_existing = sum(1 for _ in f)
        _write_offset(state_path, offset + n_existing)
        return n_existing

    # Format-agnostic read through the engine's commit log (text or
    # binary); only COMPLETE records come back, so a torn tail (a
    # writer racing this export) is naturally left for the next call.
    lines = engine.commit_records()
    base = engine.commit_base()
    if offset < base:
        # log retention (flush(retain_log=True)) dropped records this
        # consumer never exported — silent data loss is worse than an
        # error, so fail loudly (the operator resets the offset file
        # or replays from an upstream CDC segment archive)
        raise RuntimeError(
            f"commit-log retention outran this CDC consumer: "
            f"export offset {offset} < retained base {base}"
        )
    fresh = lines[offset - base:]
    if not fresh:
        return 0

    records = []
    for line in fresh:
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            break  # same best-effort stop as replay; retried next export
        stmt = obj.get("stmt", obj)
        kind = stmt.get("__type__", "unknown")
        op, _target = _KIND_TO_OP.get(kind, ("unknown", "unknown"))
        table = next(
            (stmt[f] for f in _TYPE_FIELDS if isinstance(stmt.get(f), str)), ""
        )
        records.append(
            {
                "seq": obj.get("seq"),
                "op": op,
                "kind": kind,
                "table": table,
                "payload": json.dumps(stmt, separators=(",", ":")),
            }
        )
    if not records:
        return 0

    tmp = seg_path + f".tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        for r in records:
            f.write(json.dumps(r, separators=(",", ":")) + "\n")
        f.flush()
        os.fsync(f.fileno())
    try:
        # Exclusive publish: os.link fails with FileExistsError if the
        # segment already exists, so a concurrent exporter that won the
        # race keeps its (immutable) segment — we never clobber a file
        # a streaming consumer may have already recorded as processed.
        os.link(tmp, seg_path)
    except FileExistsError:
        os.unlink(tmp)
        with open(seg_path, encoding="utf-8") as f:
            n_existing = sum(1 for _ in f)
        _write_offset(state_path, offset + n_existing)
        return n_existing
    os.unlink(tmp)
    _write_offset(state_path, offset + len(records))
    return len(records)


def _write_offset(state_path: str, offset: int) -> None:
    tmp = state_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(str(offset))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, state_path)


def cdc_stream(spark: SparkSession, data_dir: str) -> DataFrame:
    """Streaming DataFrame over the exported CDC segments."""
    return (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(os.path.join(_cdc_dir(data_dir), "segment-*.jsonl"))
    )


def changes_per_table(cdc: DataFrame) -> DataFrame:
    """Running mutation counts per (table, op) — bounded state (one row
    per catalog table x 3 ops)."""
    return cdc.groupBy("table", "op").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.max("seq").alias("last_seq"),
    )


def maintain_row_deltas(cdc: DataFrame, state: dict[str, int]):
    """Incremental materialization example: maintain per-table NET row
    deltas (+1 insert, -1 delete, 0 update) in a driver-side dict via
    ``foreachBatch`` — the downstream-cache-maintenance shape (in
    production the sink would be a Delta/JDBC upsert, same batch_fn).

    Returns the StreamingQuery; caller awaits/stops it. Exactly-once
    per batch within a run: foreachBatch batches are replayed on
    failure, so a production sink must be idempotent on batch_id —
    here batch ids are tracked in ``state['_batches']``.
    """
    delta = (
        F.when(F.col("op") == "insert", F.lit(1))
        .when(F.col("op") == "delete", F.lit(-1))
        .otherwise(F.lit(0))
    )

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        seen = state.setdefault("_batches", set())
        if batch_id in seen:
            return
        seen.add(batch_id)
        for r in (
            batch_df.groupBy("table").agg(F.sum(delta).alias("d")).collect()
        ):
            state[r.table] = state.get(r.table, 0) + (r.d or 0)

    return cdc.writeStream.outputMode("append").foreachBatch(batch_fn).start()
