"""The commitlog Python DataSource (grapho_spark/datasource.py):
corruption-stop through the reader, incremental stream tailing, and
idempotent registration."""

from __future__ import annotations

import struct
import uuid

from grapho_spark.datasource import register_commitlog
from grapho_spark.engine.commitlog import CommitLog


def _write_log(d: str, fmt: str, records: list[str]) -> None:
    log = CommitLog(d, fmt=fmt)
    for r in records:
        log.append(r)
    log.close()


def test_batch_reader_stops_at_torn_tail(spark, tmp_path):
    d = str(tmp_path)
    _write_log(d, "binary", [f'{{"seq":{i}}}' for i in range(3)])
    # simulate a crash mid-append: a length prefix promising more
    # bytes than were written
    with open(f"{d}/commitlog.bin", "ab") as fh:
        fh.write(struct.pack(">I", 100))
        fh.write(b"torn")
    register_commitlog(spark)
    df = (
        spark.read.format("commitlog")
        .option("path", d)
        .option("logformat", "binary")
        .load()
    )
    rows = sorted(r.offset for r in df.collect())
    assert rows == [0, 1, 2]  # the torn record is absent, never wrong


def test_stream_tail_picks_up_appends(spark, tmp_path):
    d = str(tmp_path)
    _write_log(d, "text", ['{"seq":0}', '{"seq":1}'])
    register_commitlog(spark)
    name = "cl_tail_" + uuid.uuid4().hex[:8]
    q = (
        spark.readStream.format("commitlog")
        .option("path", d)
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table(name).count() == 2
        # append while the stream is live: only the delta is read
        log = CommitLog(d, fmt="text")
        log.append('{"seq":2}')
        log.append('{"seq":3}')
        log.close()
        q.processAllAvailable()
        got = sorted(r.offset for r in spark.table(name).collect())
        assert got == [0, 1, 2, 3]
    finally:
        q.stop()


def test_register_is_idempotent(spark):
    register_commitlog(spark)
    register_commitlog(spark)  # second call must be a no-op


def test_segmented_log_reads_in_parallel_with_global_offsets(spark, tmp_path):
    d = str(tmp_path)
    recs = [f'{{"seq":{i},"pad":"{"x" * 40}"}}' for i in range(20)]
    log = CommitLog(d, fmt="text", max_segment_bytes=150)
    for r in recs:
        log.append(r)
    log.close()
    assert len(log.sealed_paths()) >= 3  # the cap actually rolled
    register_commitlog(spark)
    df = spark.read.format("commitlog").option("path", d).load()
    from pyspark.sql import functions as F

    rows = df.select("offset", "record", F.spark_partition_id().alias("pid")).collect()
    by_off = {r.offset: r.record for r in rows}
    assert [by_off[i] for i in range(20)] == recs  # global order preserved
    assert len({r.pid for r in rows}) > 1  # real multi-partition fan-out


def test_corrupt_sealed_segment_fails_loudly(spark, tmp_path):
    import pytest

    d = str(tmp_path)
    log = CommitLog(d, fmt="binary", max_segment_bytes=80)
    for i in range(9):
        log.append(f'{{"seq":{i},"pad":"{"y" * 20}"}}')
    log.close()
    sealed = log.sealed_paths()
    assert sealed
    with open(sealed[0], "r+b") as fh:  # truncate mid-record
        fh.truncate(10)
    register_commitlog(spark)
    df = (
        spark.read.format("commitlog")
        .option("path", d)
        .option("logformat", "binary")
        .load()
    )
    with pytest.raises(Exception):  # torn SEALED segment must not
        df.collect()  # silently misalign offsets


def test_stream_tail_across_rolls(spark, tmp_path):
    """The tailing reader must follow the log ACROSS segment rolls
    (skipping wholly-consumed sealed segments via the manifest) and
    never re-emit or drop a record."""
    import uuid

    d = str(tmp_path)
    log = CommitLog(d, fmt="text", max_segment_bytes=120)
    for i in range(6):
        log.append(f'{{"seq":{i},"pad":"{"a" * 30}"}}')
    log.close()
    register_commitlog(spark)
    name = "cl_roll_" + uuid.uuid4().hex[:8]
    q = (
        spark.readStream.format("commitlog")
        .option("path", d)
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table(name).count() == 6
        # keep appending THROUGH more rolls while the stream is live
        log2 = CommitLog(d, fmt="text", max_segment_bytes=120)
        for i in range(6, 14):
            log2.append(f'{{"seq":{i},"pad":"{"a" * 30}"}}')
        log2.close()
        assert len(log2.sealed_paths()) >= 3
        q.processAllAvailable()
        got = sorted(r.offset for r in spark.table(name).collect())
        assert got == list(range(14))  # exactly-once across rolls
    finally:
        q.stop()


def test_fresh_stream_on_retained_log_starts_at_base(spark, tmp_path):
    """A NEW consumer of a retained log begins at the earliest
    retained record (Kafka earliest semantics); only a pre-existing
    checkpoint below the base fails."""
    import uuid

    d = str(tmp_path)
    log = CommitLog(d, fmt="text", max_segment_bytes=100)
    for i in range(10):
        log.append(f'{{"seq":{i},"pad":"{"b" * 30}"}}')
    log.close()
    log.retain_below(6)
    base = log.base_offset()
    assert 0 < base <= 6
    register_commitlog(spark)
    name = "cl_fresh_" + uuid.uuid4().hex[:8]
    q = (
        spark.readStream.format("commitlog")
        .option("path", d)
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r.offset for r in spark.table(name).collect())
        assert got == list(range(base, 10))  # global indices preserved
    finally:
        q.stop()
