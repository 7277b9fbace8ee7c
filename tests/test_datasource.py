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
