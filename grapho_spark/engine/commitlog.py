"""Commit-log encodings + group fsync, mirroring the reference's WAL.

The reference supports two on-disk formats
(/root/reference/server/commitlog.go):

- **text** — one command per line (commitlog.go:134-140). Here: one
  JSON record per line (``commitlog.jsonl``), the engine's default.
- **binary** — 4-byte big-endian length prefix + payload bytes
  (commitlog.go:121-133), with a ``<= 10 MB`` record guard at replay
  (commitlog.go:180-182). Here: ``commitlog.bin``.

Durability model: the reference runs an async writer goroutine with a
1024-slot queue and a 1 s fsync ticker, falling back to a synchronous
write when the queue overflows (commitlog.go:54,92-118,144-158). A
driver-side Python engine has no background goroutine, so the same
group-commit contract is expressed synchronously: every append is
written + OS-flushed immediately (readers — replay, CDC export — see
it at once), while the expensive ``fsync`` is batched: it fires every
``fsync_every`` appends or ``fsync_interval`` seconds, whichever comes
first, and always on ``close()``. The crash window is thus bounded by
the same ~1 s / queue-depth the reference accepts.

Replay is corruption-stop best-effort in both formats (the engine's
contract, matching catalog/store.go:80-127): a torn tail — truncated
length prefix, short body, or a text line with no terminating newline
— and anything after it is ignored; the prefix survives.
"""

from __future__ import annotations

import os
import struct
import time

MAX_RECORD_BYTES = 10 << 20  # replay guard, commitlog.go:180-182

TEXT_NAME = "commitlog.jsonl"
BINARY_NAME = "commitlog.bin"


def detect_format(data_dir: str) -> str:
    """Existing binary log wins; otherwise text (the default)."""
    if os.path.exists(os.path.join(data_dir, BINARY_NAME)):
        return "binary"
    return "text"


class CommitLog:
    """Append-only record log with text/binary encodings and batched
    fsync. Records are opaque strings (the engine stores one JSON
    statement envelope per record)."""

    def __init__(
        self,
        data_dir: str,
        fmt: str = "text",
        fsync_every: int = 64,
        fsync_interval: float = 1.0,
    ):
        if fmt not in ("text", "binary"):
            raise ValueError(f"unknown commit-log format: {fmt!r}")
        self.fmt = fmt
        self.path = os.path.join(
            data_dir, BINARY_NAME if fmt == "binary" else TEXT_NAME
        )
        self.fsync_every = fsync_every
        self.fsync_interval = fsync_interval
        self._file = None
        self._unsynced = 0
        self._last_fsync = time.monotonic()
        self.n_fsyncs = 0  # observable for tests/metrics

    # ---------------------------------------------------------- write

    def _fh(self):
        if self._file is None or self._file.closed:
            self._file = open(self.path, "ab")
        return self._file

    def append(self, record: str) -> None:
        """Write one record; visible to readers immediately, durable at
        the next group fsync (<= fsync_every appends / fsync_interval s)."""
        data = record.encode("utf-8")
        f = self._fh()
        if self.fmt == "binary":
            f.write(struct.pack(">I", len(data)))
            f.write(data)
        else:
            f.write(data)
            if not data.endswith(b"\n"):
                f.write(b"\n")
        f.flush()  # OS-level: replay/CDC readers see the record now
        self._unsynced += 1
        now = time.monotonic()
        if (
            self._unsynced >= self.fsync_every
            or now - self._last_fsync >= self.fsync_interval
        ):
            self.sync()

    def sync(self) -> None:
        if self._file is not None and not self._file.closed and self._unsynced:
            os.fsync(self._file.fileno())
            self.n_fsyncs += 1
        self._unsynced = 0
        self._last_fsync = time.monotonic()

    def close(self) -> None:
        if self._file is not None and not self._file.closed:
            self._file.flush()
            os.fsync(self._file.fileno())
            self._file.close()
        self._unsynced = 0

    # ----------------------------------------------------------- read

    def records(self) -> list[str]:
        """All COMPLETE records, stopping at the first torn/corrupt
        one (corruption-stop best effort; the tail is simply absent)."""
        try:
            with open(self.path, "rb") as f:
                blob = f.read()
        except FileNotFoundError:
            return []
        out: list[str] = []
        if self.fmt == "binary":
            pos, n_bytes = 0, len(blob)
            while pos + 4 <= n_bytes:
                (n,) = struct.unpack_from(">I", blob, pos)
                if n > MAX_RECORD_BYTES:  # guard: treat as corruption, stop
                    break
                if pos + 4 + n > n_bytes:  # torn body
                    break
                try:
                    out.append(blob[pos + 4 : pos + 4 + n].decode("utf-8"))
                except UnicodeDecodeError:
                    break
                pos += 4 + n
            return out
        for line in blob.split(b"\n")[:-1]:  # last element: after final \n
            try:
                out.append(line.decode("utf-8"))
            except UnicodeDecodeError:
                break
        return out

    def count(self) -> int:
        return len(self.records())
