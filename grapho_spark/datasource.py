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

Scale: a single WAL file is inherently one partition (replay is
sequential by contract — reference server/commitlog.go); a production
deployment segments the log, and ``partitions()`` maps one segment to
one InputPartition. The reader ships only (offset, record) — byte
payloads of any size stay out of the driver.
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
        # one WAL file = one partition (sequential replay contract);
        # segmented logs map segment -> InputPartition here
        return [InputPartition(0)]

    def read(self, partition):
        for i, rec in enumerate(_read_all(self.path, self.fmt)):
            yield (i, rec, len(rec.encode("utf-8")))


class CommitLogStreamReader(SimpleDataSourceStreamReader):
    """Tailing reader: offset = number of complete records consumed.
    ``read`` returns only the records appended since the start offset,
    so state is the single integer Spark checkpoints for us."""

    def __init__(self, options):
        self.path = options.get("path")
        self.fmt = options.get("logformat", "text")
        if not self.path:
            raise ValueError("commitlog source requires a path (the data_dir)")

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        recs = _read_all(self.path, self.fmt)
        i0 = int(start["index"])
        rows = [
            (i, rec, len(rec.encode("utf-8")))
            for i, rec in enumerate(recs[i0:], start=i0)
        ]
        return iter(rows), {"index": len(recs)}

    def readBetweenOffsets(self, start: dict, end: dict):
        recs = _read_all(self.path, self.fmt)
        i0, i1 = int(start["index"]), int(end["index"])
        return iter(
            (i, rec, len(rec.encode("utf-8")))
            for i, rec in enumerate(recs[i0:i1], start=i0)
        )


_REGISTERED: set[int] = set()


def register_commitlog(spark) -> None:
    """Idempotent per-session registration."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.dataSource.register(CommitLogDataSource)
    _REGISTERED.add(key)
