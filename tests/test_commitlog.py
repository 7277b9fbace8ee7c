"""Commit-log format tests: text + binary round-trips, torn-tail
recovery, the 10 MB replay guard, and group-fsync batching —
mirroring the reference's commitlog.go:121-133,180-182 and the
corruption-stop contract of catalog/store_test.go:340-385."""

from __future__ import annotations

import json
import os
import struct

import pytest

from grapho_spark.engine import GraphEngine
from grapho_spark.engine.commitlog import (
    BINARY_NAME,
    MAX_RECORD_BYTES,
    CommitLog,
    detect_format,
)

RECORDS = ['{"seq":1,"a":"x"}', '{"seq":2,"b":"üñïçødé"}', '{"seq":3}']


@pytest.mark.parametrize("fmt", ["text", "binary"])
def test_roundtrip(tmp_path, fmt):
    log = CommitLog(str(tmp_path), fmt=fmt)
    for r in RECORDS:
        log.append(r)
    log.close()
    assert CommitLog(str(tmp_path), fmt=fmt).records() == RECORDS


def test_binary_truncated_tail_recovers_prefix(tmp_path):
    log = CommitLog(str(tmp_path), fmt="binary")
    for r in RECORDS:
        log.append(r)
    log.close()
    # chop mid-record: strip the last 3 bytes
    path = os.path.join(str(tmp_path), BINARY_NAME)
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-3])
    assert CommitLog(str(tmp_path), fmt="binary").records() == RECORDS[:-1]
    # chop INSIDE a length prefix too
    open(path, "wb").write(data[: -len(RECORDS[2].encode()) - 2])
    assert CommitLog(str(tmp_path), fmt="binary").records() == RECORDS[:-1]


def test_binary_length_guard_stops_replay(tmp_path):
    log = CommitLog(str(tmp_path), fmt="binary")
    log.append(RECORDS[0])
    log.close()
    path = os.path.join(str(tmp_path), BINARY_NAME)
    with open(path, "ab") as f:  # absurd length prefix (> 10 MB guard)
        f.write(struct.pack(">I", MAX_RECORD_BYTES + 1))
        f.write(b"xxxx")
    assert CommitLog(str(tmp_path), fmt="binary").records() == RECORDS[:1]


def test_text_torn_tail_excluded(tmp_path):
    log = CommitLog(str(tmp_path), fmt="text")
    log.append(RECORDS[0])
    log.close()
    with open(log.path, "a", encoding="utf-8") as f:
        f.write('{"torn"')  # no newline: incomplete
    assert CommitLog(str(tmp_path), fmt="text").records() == RECORDS[:1]


def test_group_fsync_batches(tmp_path):
    log = CommitLog(str(tmp_path), fmt="binary", fsync_every=4, fsync_interval=3600)
    for i in range(10):
        log.append(f'{{"seq":{i}}}')
    assert log.n_fsyncs == 2  # at appends 4 and 8; 2 pending
    log.sync()
    assert log.n_fsyncs == 3
    log.close()
    assert len(CommitLog(str(tmp_path), fmt="binary").records()) == 10


def test_detect_format(tmp_path):
    assert detect_format(str(tmp_path)) == "text"
    CommitLog(str(tmp_path), fmt="binary").append("x")
    assert detect_format(str(tmp_path)) == "binary"


def test_engine_binary_log_roundtrip(spark, tmp_path):
    d = str(tmp_path / "bindb")
    eng = GraphEngine(spark, data_dir=d, log_format="binary")
    eng.execute(
        "CREATE NODE P (name: string, age: int);"
        "INSERT NODE P (name: 'a', age: 1); INSERT NODE P (name: 'b', age: 2);"
        "UPDATE NODE P SET age: 9 WHERE name: 'a';"
    )
    assert os.path.exists(os.path.join(d, BINARY_NAME))
    # auto-detect on reopen (no log_format passed)
    eng2 = GraphEngine(spark, data_dir=d)
    assert eng2._commitlog.fmt == "binary"
    assert {r.name: r.age for r in eng2.node_df("P").collect()} == {"a": 9, "b": 2}
    # truncate the tail mid-record: prefix replays, engine opens clean
    path = os.path.join(d, BINARY_NAME)
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-5])
    eng3 = GraphEngine(spark, data_dir=d)
    names = {r.name for r in eng3.node_df("P").collect()}
    assert "a" in names  # earliest records survive


def test_engine_binary_log_flush_and_seq(spark, tmp_path):
    d = str(tmp_path / "bindb2")
    eng = GraphEngine(spark, data_dir=d, log_format="binary")
    eng.execute("CREATE NODE P (name: string); INSERT NODE P (name: 'a');")
    eng.flush()
    eng.execute("INSERT NODE P (name: 'b');")
    eng2 = GraphEngine(spark, data_dir=d)
    assert sorted(r.name for r in eng2.node_df("P").collect()) == ["a", "b"]
    # seq scan works on binary records too
    assert eng2._max_logged_seq() >= 1
    assert json.loads(eng2.commit_records()[-1])["stmt"]["__type__"] == (
        "InsertNodeStmt"
    )


@pytest.mark.parametrize("fmt", ["text", "binary"])
def test_append_after_torn_tail_truncates_first(tmp_path, fmt):
    """WAL recovery: reopening for append must cut the torn tail back
    to the last complete record, so post-crash appends stay framed and
    replayable (not absorbed into the torn fragment forever)."""
    log = CommitLog(str(tmp_path), fmt=fmt)
    for r in RECORDS[:2]:
        log.append(r)
    log.close()
    with open(log.path, "ab") as f:  # simulate a crash mid-append
        f.write(struct.pack(">I", 100) + b"par" if fmt == "binary" else b'{"torn"')
    log2 = CommitLog(str(tmp_path), fmt=fmt)
    log2.append(RECORDS[2])  # post-crash write
    log2.close()
    # EVERY post-crash record must be visible on the next boot
    assert CommitLog(str(tmp_path), fmt=fmt).records() == [
        RECORDS[0],
        RECORDS[1],
        RECORDS[2],
    ]


def test_idle_fsync_ticker_fires(tmp_path):
    """A burst smaller than fsync_every followed by idle must still
    become durable within ~fsync_interval (the reference's 1 s ticker,
    commitlog.go:113-116) — not wait for the next append forever."""
    import time

    log = CommitLog(str(tmp_path), fmt="text", fsync_every=64, fsync_interval=0.05)
    for i in range(3):
        log.append(f'{{"seq":{i}}}')
    deadline = time.monotonic() + 2.0
    while log.n_fsyncs == 0 and time.monotonic() < deadline:
        time.sleep(0.02)
    assert log.n_fsyncs >= 1  # ticker synced the idle remainder
    assert log._unsynced == 0
    log.close()


def test_engine_rejects_conflicting_log_format(spark, tmp_path):
    """An explicit log_format contradicting an existing non-empty log
    of the other format must refuse to open (silently reading the
    wrong file would strand the old log's unflushed records)."""
    from grapho_spark.engine.engine import EngineError

    d = str(tmp_path / "fmtdb")
    eng = GraphEngine(spark, data_dir=d, log_format="binary")
    eng.execute("CREATE NODE P (name: string); INSERT NODE P (name: 'a');")
    with pytest.raises(EngineError, match="commit log"):
        GraphEngine(spark, data_dir=d, log_format="text")
    # matching explicit format and auto-detect both still work
    assert GraphEngine(spark, data_dir=d, log_format="binary")._commitlog.fmt == "binary"


def test_segment_rotation_preserves_order_and_manifest(tmp_path):
    import os

    from grapho_spark.engine.commitlog import MANIFEST_NAME, CommitLog

    d = str(tmp_path)
    recs = [f"rec-{i:03d}-" + "z" * 25 for i in range(14)]
    log = CommitLog(d, fmt="text", max_segment_bytes=100)
    for r in recs:
        log.append(r)
    log.close()
    assert log.records() == recs  # global replay order across segments
    sealed = log.sealed_paths()
    assert len(sealed) >= 3
    manifest = dict(
        line.rstrip("\n").split("\t")
        for line in open(os.path.join(d, MANIFEST_NAME))
    )
    # every sealed segment is listed with its exact record count
    from grapho_spark.engine.commitlog import scan_segment

    for p in sealed:
        assert int(manifest[os.path.basename(p)]) == len(scan_segment(p, "text")[0])
    # reopen + append continues the numbering, replay still complete
    log2 = CommitLog(d, fmt="text", max_segment_bytes=100)
    log2.append("tail-record")
    log2.close()
    assert CommitLog(d, fmt="text").records() == recs + ["tail-record"]


def test_rotation_off_by_default_single_file(tmp_path):
    from grapho_spark.engine.commitlog import CommitLog

    d = str(tmp_path)
    log = CommitLog(d, fmt="text")
    for i in range(50):
        log.append(f"r{i}" + "w" * 100)
    log.close()
    assert log.sealed_paths() == []  # no cap -> classic single file
    assert len(log.records()) == 50


def test_detect_format_sees_fully_rotated_binary_log(tmp_path):
    """r8e latent-bug pin: if the last append sealed the active binary
    file, the log is ONLY sealed segments — auto-detection (and the
    engine's wrong-format guard) must still see it."""
    import os

    from grapho_spark.engine.commitlog import CommitLog, detect_format, log_exists

    d = str(tmp_path)
    log = CommitLog(d, fmt="binary", max_segment_bytes=40)
    for i in range(4):
        log.append(f"record-{i}-xxxxxxxxxxxxxxxxxxxxxxxxxxxxxx")
    log.close()
    assert not os.path.exists(log.path)  # every record sealed away
    assert log.sealed_paths()
    assert detect_format(d) == "binary"
    assert log_exists(d, "binary") and not log_exists(d, "text")
    # replay still sees everything
    assert len(CommitLog(d, fmt="binary").records()) == 4


def test_retention_drops_only_fully_flushed_segments(tmp_path):
    import os

    from grapho_spark.engine.commitlog import CommitLog

    d = str(tmp_path)
    recs = [f"r{i:02d}" + "p" * 30 for i in range(12)]
    log = CommitLog(d, fmt="text", max_segment_bytes=80)
    for r in recs:
        log.append(r)
    log.close()
    n_seg = len(log.sealed_paths())
    assert n_seg >= 4
    # retain below global index 5: only segments whose records ALL
    # have index < 5 may go
    dropped = log.retain_below(5)
    assert dropped >= 1
    base = log.base_offset()
    assert 0 < base <= 5
    tail = log.records()
    assert tail == recs[base:]  # global index of tail[i] is base+i
    # idempotent / monotone
    assert log.retain_below(5) == 0
    # retain everything durable
    log.retain_below(len(recs))
    assert log.records() == recs[log.base_offset():]
    # count() + base == global count
    assert log.base_offset() + len(log.records()) == len(recs)


def test_retention_never_touches_unlisted_segments(tmp_path):
    import os

    from grapho_spark.engine.commitlog import MANIFEST_NAME, CommitLog

    d = str(tmp_path)
    log = CommitLog(d, fmt="text", max_segment_bytes=60)
    for i in range(9):
        log.append(f"rec{i}" + "q" * 20)
    log.close()
    # simulate the roll-crash window: strip the manifest entry of the
    # FIRST sealed segment (rename happened, manifest append did not)
    mf = os.path.join(d, MANIFEST_NAME)
    lines = open(mf).read().splitlines(True)
    first = log.sealed_paths()[0]
    open(mf, "w").writelines(
        l for l in lines if not l.startswith(os.path.basename(first))
    )
    assert log.retain_below(100) == 0  # unknown count blocks ALL retention
    assert os.path.exists(first)
    assert log.base_offset() == 0
    assert len(log.records()) == 9  # nothing lost
