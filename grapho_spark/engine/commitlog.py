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
write when the queue overflows (commitlog.go:54,92-118,144-158). Here
every append is written + OS-flushed immediately (readers — replay,
CDC export — see it at once), while the expensive ``fsync`` is
batched: it fires every ``fsync_every`` appends, and a background
ticker thread (the analogue of the reference's 1 s ticker,
commitlog.go:113-116) fsyncs any idle remainder every
``fsync_interval`` seconds, so records never stay un-fsynced just
because writes stopped. ``close()`` always fsyncs.

Replay is corruption-stop best-effort in both formats (the engine's
contract, matching catalog/store.go:80-127): a torn tail — truncated
length prefix, short body, or a text line with no terminating newline
— and anything after it is ignored; the prefix survives. Opening the
log for APPEND first truncates the file back to the end of the last
complete record (standard WAL recovery), so post-crash appends are
framed correctly instead of being absorbed into the torn fragment.
"""

from __future__ import annotations

import os
import struct
import threading

MAX_RECORD_BYTES = 10 << 20  # replay guard, commitlog.go:180-182

TEXT_NAME = "commitlog.jsonl"
BINARY_NAME = "commitlog.bin"
MANIFEST_NAME = "commitlog.manifest"  # sealed-segment index (see roll)


def detect_format(data_dir: str) -> str:
    """Existing binary log wins; otherwise text (the default). A
    ROTATED binary log may have no active file at the moment of
    detection (the last append sealed it), so sealed segments count
    as an existing log too."""
    if os.path.exists(os.path.join(data_dir, BINARY_NAME)) or _sealed_glob(
        data_dir, "binary"
    ):
        return "binary"
    return "text"


def _sealed_glob(data_dir: str, fmt: str) -> list[str]:
    """Sealed segment files of ``fmt`` in ``data_dir``, oldest first."""
    import glob

    name = BINARY_NAME if fmt == "binary" else TEXT_NAME
    stem, ext = os.path.splitext(os.path.join(data_dir, name))
    return sorted(glob.glob(f"{stem}.[0-9]*{ext}"))


def log_exists(data_dir: str, fmt: str) -> bool:
    """True if a non-empty log of ``fmt`` exists — active file OR any
    sealed segment (a rotated log is still a log)."""
    name = BINARY_NAME if fmt == "binary" else TEXT_NAME
    p = os.path.join(data_dir, name)
    if os.path.exists(p) and os.path.getsize(p) > 0:
        return True
    return bool(_sealed_glob(data_dir, fmt))


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
        max_segment_bytes: int | None = None,
    ):
        if fmt not in ("text", "binary"):
            raise ValueError(f"unknown commit-log format: {fmt!r}")
        self.fmt = fmt
        self.data_dir = data_dir
        self.max_segment_bytes = max_segment_bytes
        self.path = os.path.join(
            data_dir, BINARY_NAME if fmt == "binary" else TEXT_NAME
        )
        self.fsync_every = fsync_every
        self.fsync_interval = fsync_interval
        self._file = None
        self._unsynced = 0
        self._lock = threading.Lock()
        self._ticker = None
        self._ticker_stop = threading.Event()
        self.n_fsyncs = 0  # observable for tests/metrics

    # ---------------------------------------------------------- write

    def _fh(self):
        if self._file is None or self._file.closed:
            self._truncate_torn_tail()
            self._file = open(self.path, "ab")
        return self._file

    def _truncate_torn_tail(self) -> None:
        """WAL recovery: cut the ACTIVE file back to the end of the
        last complete record before appending, so a torn tail from a
        crash can't absorb or misframe post-crash records. Sealed
        segments are immutable and never truncated."""
        try:
            size = os.path.getsize(self.path)
        except OSError:
            return
        _, valid_end = self._scan_file(self.path)
        if valid_end < size:
            with open(self.path, "r+b") as f:
                f.truncate(valid_end)
                f.flush()
                os.fsync(f.fileno())

    # ------------------------------------------------------- segments

    def _stem_ext(self) -> tuple[str, str]:
        stem, ext = os.path.splitext(self.path)
        return stem, ext

    def sealed_paths(self) -> list[str]:
        """Sealed (immutable) segment files, oldest first. Zero-padded
        numbering makes lexicographic order the append order."""
        return _sealed_glob(self.data_dir, self.fmt)

    def _next_seg_no(self) -> int:
        """Next segment number: one past the max EVER USED — manifest
        entries count even when their files were dropped by retention,
        so numbers are never reused (a reused name would duplicate a
        manifest key and corrupt base_offset's dropped-prefix walk)."""
        _, ext = self._stem_ext()

        def num(name: str) -> int:
            try:
                return int(os.path.basename(name).split(".")[1])
            except (IndexError, ValueError):
                return 0

        used = [num(name) for name, _ in self._manifest_entries()]
        used += [num(p) for p in self.sealed_paths()]
        return max(used, default=0) + 1

    def segment_paths(self) -> list[str]:
        """All segments in replay order: sealed, then the active file
        (if it exists)."""
        out = self.sealed_paths()
        if os.path.exists(self.path):
            out.append(self.path)
        return out

    def _roll_locked(self) -> None:
        """Seal the active file: fsync, atomically rename to the next
        numbered segment, and append (name, record count) to the
        manifest AFTER the rename — a crash between rename and
        manifest write leaves an unlisted sealed segment, which
        readers fall back to parsing (never a lost or double record)."""
        f = self._file
        if f is None or f.closed:
            return
        f.flush()
        os.fsync(f.fileno())
        self.n_fsyncs += 1
        self._unsynced = 0
        n_records = len(self._scan_file(self.path)[0])
        f.close()
        self._file = None
        stem, ext = self._stem_ext()
        sealed = f"{stem}.{self._next_seg_no():08d}{ext}"
        os.rename(self.path, sealed)
        with open(os.path.join(self.data_dir, MANIFEST_NAME), "a") as mf:
            mf.write(f"{os.path.basename(sealed)}\t{n_records}\n")
            mf.flush()
            os.fsync(mf.fileno())

    def append(self, record: str) -> None:
        """Write one record; visible to readers immediately, durable at
        the next group fsync (<= fsync_every appends / fsync_interval s)."""
        data = record.encode("utf-8")
        with self._lock:
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
            if self._unsynced >= self.fsync_every:
                self._sync_locked()
            if (
                self.max_segment_bytes is not None
                and f.tell() >= self.max_segment_bytes
            ):
                self._roll_locked()
        self._ensure_ticker()

    def _sync_locked(self) -> None:
        if self._file is not None and not self._file.closed and self._unsynced:
            os.fsync(self._file.fileno())
            self.n_fsyncs += 1
        self._unsynced = 0

    def sync(self) -> None:
        with self._lock:
            self._sync_locked()

    def _ensure_ticker(self) -> None:
        """Background fsync ticker (reference commitlog.go:113-116): a
        burst of < fsync_every appends followed by idle still becomes
        durable within ~fsync_interval seconds."""
        if self._ticker is not None and self._ticker.is_alive():
            return
        self._ticker_stop.clear()

        def _tick():
            while not self._ticker_stop.wait(self.fsync_interval):
                with self._lock:
                    if self._file is None or self._file.closed:
                        break
                    self._sync_locked()

        self._ticker = threading.Thread(
            target=_tick, name="commitlog-fsync", daemon=True
        )
        self._ticker.start()

    def close(self) -> None:
        self._ticker_stop.set()
        with self._lock:
            if self._file is not None and not self._file.closed:
                self._file.flush()
                os.fsync(self._file.fileno())
                self._file.close()
            self._unsynced = 0

    # ----------------------------------------------------------- read

    def _scan(self) -> tuple[list[str], int]:
        """Parse ALL segments in replay order; returns (complete
        records, byte offset of the end of the last complete record in
        the ACTIVE file). Corruption-stop is GLOBAL: a corrupt sealed
        segment ends the scan — the prefix survives, nothing after a
        tear is trusted (catalog/store.go:80-127 contract)."""
        out: list[str] = []
        for p in self.sealed_paths():
            recs, end = self._scan_file(p)
            out.extend(recs)
            try:
                size = os.path.getsize(p)
            except OSError:
                size = end
            if end < size:  # a sealed segment should never be torn
                return out, 0
        recs, end = self._scan_file(self.path)
        out.extend(recs)
        return out, end

    def _scan_file(self, path: str) -> tuple[list[str], int]:
        return scan_segment(path, self.fmt)

    def records(self) -> list[str]:
        """All RETAINED complete records across all segments, stopping
        at the first torn/corrupt one (corruption-stop best effort; the
        tail is simply absent). The record at position ``i`` has GLOBAL
        index ``base_offset() + i`` — retention (retain_below) drops
        whole sealed segments from the head without renumbering."""
        return self._scan()[0]

    def count(self) -> int:
        return len(self.records())

    # ------------------------------------------------------ retention

    def _manifest_entries(self) -> list[tuple[str, int]]:
        """(segment basename, record count) in roll order, this
        format's extension only (text and binary logs share a dir)."""
        _, ext = self._stem_ext()
        out: list[tuple[str, int]] = []
        try:
            with open(os.path.join(self.data_dir, MANIFEST_NAME)) as mf:
                for line in mf:
                    name, n = line.rstrip("\n").split("\t")
                    if name.endswith(ext):
                        out.append((name, int(n)))
        except OSError:
            pass
        return out

    def base_offset(self) -> int:
        """Global index of the first RETAINED record: the summed
        manifest counts of the leading run of dropped (missing)
        sealed segments. Derived, not stored — deleting a segment is
        the atomic retention step, so a crash mid-retention just
        leaves retention part-done, never miscounted."""
        base = 0
        for name, n in self._manifest_entries():
            if os.path.exists(os.path.join(self.data_dir, name)):
                break
            base += n
        return base

    def retain_below(self, global_index: int) -> int:
        """Drop manifest-listed sealed segments whose records all have
        global index < ``global_index`` (e.g. the engine's durable
        manifest commit_offset). Oldest-first; an UNLISTED sealed
        segment (crash between rename and manifest append) stops
        retention — its count is unknown, so nothing past it may be
        renumbered. Returns the number of segments dropped. The
        caller owns coordination with log consumers (CDC exporters):
        records below ``global_index`` become unreadable."""
        dropped = 0
        with self._lock:
            base = self.base_offset()
            counts = dict(self._manifest_entries())
            for p in self.sealed_paths():  # existing, oldest first
                n = counts.get(os.path.basename(p))
                if n is None:  # unlisted (roll-crash window): stop
                    break
                if base + n <= global_index:
                    os.remove(p)
                    base += n
                    dropped += 1
                else:
                    break
        return dropped


def scan_segment(path: str, fmt: str) -> tuple[list[str], int]:
    """Parse ONE segment file; returns (complete records, byte offset
    of the end of the last complete record). Corruption-stop: the
    first torn/oversized/undecodable record ends the scan. Module-
    level so readers (the Spark data source) can parse a single
    segment on an executor without a CommitLog handle."""
    try:
        with open(path, "rb") as f:
            blob = f.read()
    except FileNotFoundError:
        return [], 0
    out: list[str] = []
    if fmt == "binary":
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
        return out, pos
    pos = 0
    for line in blob.split(b"\n")[:-1]:  # last element: after final \n
        try:
            out.append(line.decode("utf-8"))
        except UnicodeDecodeError:
            break
        pos += len(line) + 1
    return out, pos
