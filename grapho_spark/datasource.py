"""A Spark Python DataSource exposing the engine's commit log (WAL)
as a first-class ``spark.read``/``spark.readStream`` format — the
integration that lets the analytics side query the OLTP side's
durability artifact directly (audit, replication lag, CDC backfill)
without a bespoke export step.

Batch: one row per COMPLETE record (the reader reuses
``CommitLog._scan``'s corruption-stop parse, so a torn tail is simply
absent — never a wrong row). Stream: a tailing source whose offset is
the record index; each micro-batch reads only records appended since
the last committed offset (the at-most-once/at-least-once story is
Spark's checkpointed offset log, exactly like the file source).

Scale: the writer ROLLS the log into numbered sealed segments at
``max_segment_bytes`` (commitlog.py) and appends (name, count) to a
manifest at each roll; the batch reader maps ONE SEGMENT to ONE
InputPartition with global offsets computed from that manifest — so a
long-lived log is read with real parallelism, and the driver reads a
tiny manifest, never the data. An unsegmented log degrades to one
partition (replay is sequential by contract — reference
server/commitlog.go).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SCHEMA = "offset bigint, record string, n_bytes bigint"


def _read_all(path: str, fmt: str) -> list[str]:
    from grapho_spark.engine.commitlog import CommitLog

    return CommitLog(path, fmt=fmt).records()  # read-only parse


class CommitLogDataSource(DataSource):
    """``format("commitlog")`` — options: path (the engine data_dir),
    logformat ('text' default | 'binary')."""

    @classmethod
    def name(cls) -> str:
        return "commitlog"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "CommitLogBatchReader":
        return CommitLogBatchReader(self.options)

    def simpleStreamReader(self, schema) -> "CommitLogStreamReader":
        return CommitLogStreamReader(self.options)


class CommitLogBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.fmt = options.get("logformat", "text")
        if not self.path:
            raise ValueError("commitlog source requires a path (the data_dir)")

    def partitions(self):
        """One SEGMENT = one InputPartition, carrying (segment path,
        global start offset). Start offsets for sealed segments come
        from the manifest the writer appends at roll time (a tiny
        driver-side read — never the data); unlisted segments (crash
        between rename and manifest append) and the active file are
        parsed driver-side as the documented fallback."""
        import os

        from grapho_spark.engine.commitlog import (
            MANIFEST_NAME,
            CommitLog,
            scan_segment,
        )

        log = CommitLog(self.path, fmt=self.fmt)
        manifest: dict[str, int] = {}
        try:
            with open(os.path.join(self.path, MANIFEST_NAME)) as mf:
                for line in mf:
                    name, n = line.rstrip("\n").split("\t")
                    manifest[name] = int(n)
        except OSError:
            pass
        parts, start = [], log.base_offset()  # retention-aware
        for p in log.segment_paths():
            n = manifest.get(os.path.basename(p))
            if n is None:
                n = len(scan_segment(p, self.fmt)[0])
            if n:
                parts.append(InputPartition((p, start)))
            start += n
        return parts or [InputPartition((None, 0))]

    def read(self, partition):
        import os

        from grapho_spark.engine.commitlog import scan_segment

        path, start = partition.value
        if path is None:
            return
        recs, end = scan_segment(path, self.fmt)
        # a torn SEALED segment would silently misalign every later
        # partition's offsets — fail loudly instead (the active file,
        # always the last segment, may legitimately have a torn tail)
        sealed = os.path.basename(path).split(".")[1].isdigit()
        if sealed and end < os.path.getsize(path):
            raise IOError(f"sealed commit-log segment is corrupt: {path}")
        for i, rec in enumerate(recs, start=start):
            yield (i, rec, len(rec.encode("utf-8")))


class CommitLogStreamReader(SimpleDataSourceStreamReader):
    """Tailing reader: offset = number of complete records consumed.
    ``read`` returns only the records appended since the start offset,
    so state is the single integer Spark checkpoints for us. Sealed
    segments wholly below the offset are SKIPPED via the roll
    manifest — per-trigger cost is O(new records + active tail), not
    O(log age)."""

    def __init__(self, options):
        self.path = options.get("path")
        self.fmt = options.get("logformat", "text")
        if not self.path:
            raise ValueError("commitlog source requires a path (the data_dir)")

    def initialOffset(self) -> dict:
        # a FRESH consumer of a retained log starts at the earliest
        # retained record (Kafka auto.offset.reset=earliest); only an
        # EXISTING checkpoint below the base fails loudly
        from grapho_spark.engine.commitlog import CommitLog

        return {"index": CommitLog(self.path, fmt=self.fmt).base_offset()}

    def _tail_from(self, i0: int) -> list[tuple[int, str, int]]:
        """(global index, record, n_bytes) for every complete record
        at global index >= i0, parsing only the segments that can
        contain them."""
        import os

        from grapho_spark.engine.commitlog import (
            MANIFEST_NAME,
            CommitLog,
            scan_segment,
        )

        log = CommitLog(self.path, fmt=self.fmt)
        manifest: dict[str, int] = {}
        try:
            with open(os.path.join(self.path, MANIFEST_NAME)) as mf:
                for line in mf:
                    name, n = line.rstrip("\n").split("\t")
                    manifest[name] = int(n)
        except OSError:
            pass
        active = log.path
        base = log.base_offset()
        if i0 < base:
            raise RuntimeError(
                f"commit-log retention outran this stream's checkpoint: "
                f"offset {i0} < retained base {base}"
            )
        rows, start = [], base
        for p in log.segment_paths():
            n = manifest.get(os.path.basename(p))
            if n is not None and start + n <= i0:
                start += n  # wholly consumed sealed segment: skip
                continue
            recs, end = scan_segment(p, self.fmt)
            # a torn SEALED segment would shift every later record's
            # global index — fail loudly, same contract as the batch
            # reader (the active tail may legitimately be torn)
            if p != active and end < os.path.getsize(p):
                raise IOError(f"sealed commit-log segment is corrupt: {p}")
            for i, rec in enumerate(recs, start=start):
                if i >= i0:
                    rows.append((i, rec, len(rec.encode("utf-8"))))
            start += len(recs)
        return rows

    def read(self, start: dict):
        i0 = int(start["index"])
        rows = self._tail_from(i0)
        end = rows[-1][0] + 1 if rows else i0
        return iter(rows), {"index": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        i0, i1 = int(start["index"]), int(end["index"])
        return iter(r for r in self._tail_from(i0) if r[0] < i1)


_REGISTERED: set[int] = set()


def register_commitlog(spark) -> None:
    """Idempotent per-session registration."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.dataSource.register(CommitLogDataSource)
    _REGISTERED.add(key)
