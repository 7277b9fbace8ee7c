"""Catalog persistence: JSONL DDL event log + JSON snapshots + manifest.

Recovery contract mirrors /root/reference/catalog/store.go:
- ``ddl-events.jsonl``: one JSON DDL event per line, fsync per append
  (store.go:131-158).
- ``snap-%06d.json``: full catalog snapshots (store.go:160-175).
- ``MANIFEST.json``: current snapshot + replay offset, written via
  atomic tmp+rename (store.go:177-196).
- Load = read manifest -> load snapshot -> replay events past the
  offset -> STOP at the first corrupt/unapplicable line, keeping the
  best-effort catalog (store.go:80-127).

Unlike the reference, DDL is persisted HERE only (the reference also
re-logs DDL into the commit log and its replay then conflicts —
server/server.go:58-62; SURVEY.md §3-B) — single source of truth per
statement class.
"""

from __future__ import annotations

import dataclasses
import enum
import json
import os
from typing import Any

from grapho_spark.catalog.ddl import DDLError, apply_ddl
from grapho_spark.catalog.types import Catalog, catalog_from_json, catalog_to_json
from grapho_spark.gql import ast

_DDL_CLASSES = {
    cls.__name__: cls
    for cls in (
        ast.CreateNodeStmt,
        ast.CreateEdgeStmt,
        ast.AlterNodeStmt,
        ast.AlterEdgeStmt,
        ast.DropNodeStmt,
        ast.DropEdgeStmt,
    )
}


def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        d = {f.name: _to_jsonable(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
        d["__type__"] = type(obj).__name__
        return d
    if isinstance(obj, enum.Enum):
        return {"__enum__": type(obj).__name__, "value": obj.value}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(x) for x in obj]
    return obj


_ENUM_CLASSES = {
    cls.__name__: cls
    for cls in (ast.BaseType, ast.LiteralKind, ast.Cardinality, ast.AlterAction)
}

_DML_CLASSES = {
    cls.__name__: cls
    for cls in (
        ast.InsertNodeStmt,
        ast.InsertEdgeStmt,
        ast.UpdateNodeStmt,
        ast.UpdateEdgeStmt,
        ast.DeleteNodeStmt,
        ast.DeleteEdgeStmt,
    )
}

_VALUE_CLASSES = {
    cls.__name__: cls
    for cls in (
        ast.TypeSpec,
        ast.Literal,
        ast.FieldDef,
        ast.Endpoint,
        ast.Property,
        ast.PredGroup,
        ast.NodeRef,
        ast.MatchElement,
        *_DDL_CLASSES.values(),
        *_DML_CLASSES.values(),
    )
}


def _from_jsonable(obj: Any) -> Any:
    if isinstance(obj, dict):
        if "__enum__" in obj:
            return _ENUM_CLASSES[obj["__enum__"]](obj["value"])
        if "__type__" in obj:
            cls = _VALUE_CLASSES[obj["__type__"]]
            kwargs = {k: _from_jsonable(v) for k, v in obj.items() if k != "__type__"}
            # dataclass tuple fields arrive as lists
            for f in dataclasses.fields(cls):
                if f.name in kwargs and isinstance(kwargs[f.name], list):
                    kwargs[f.name] = tuple(kwargs[f.name])
            return cls(**kwargs)
        return {k: _from_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_from_jsonable(x) for x in obj]
    return obj


def stmt_to_event(stmt: ast.Stmt) -> dict:
    if type(stmt).__name__ not in _DDL_CLASSES:
        raise DDLError(f"not a persistable DDL statement: {type(stmt).__name__}")
    return _to_jsonable(stmt)


def event_to_stmt(event: dict) -> ast.Stmt:
    return _from_jsonable(event)


class CatalogStore:
    EVENTS = "ddl-events.jsonl"
    MANIFEST = "MANIFEST.json"

    def __init__(self, directory: str, snapshot_every: int = 64):
        self.dir = directory
        self.snapshot_every = snapshot_every
        # In-memory counters fix the reference's O(log-length) append
        # pattern (store.go:152-157 recounts the file per event — its
        # own comment says "For real use, track offset in memory").
        self._n_events: int | None = None
        self._snap_offset: int | None = None
        os.makedirs(directory, exist_ok=True)

    # ------------------------------------------------------------- paths

    def _events_path(self) -> str:
        return os.path.join(self.dir, self.EVENTS)

    def _manifest_path(self) -> str:
        return os.path.join(self.dir, self.MANIFEST)

    def _snapshot_path(self, n: int) -> str:
        return os.path.join(self.dir, f"snap-{n:06d}.json")

    # ------------------------------------------------------------- write

    def append_event(self, stmt: ast.Stmt, seq: int | None = None) -> None:
        """Append one DDL event; ``seq`` is the engine's global statement
        sequence number, shared with the commit log so boot-time replay
        can interleave DDL and DML in original statement order."""
        event = stmt_to_event(stmt)
        if seq is not None:
            event["__seq__"] = seq
        line = json.dumps(event, separators=(",", ":"))
        n_before = self.n_events()
        with open(self._events_path(), "a", encoding="utf-8") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._n_events = n_before + 1

    def n_events(self) -> int:
        """Total DDL events on disk — one file scan ever, then O(1)."""
        if self._n_events is None:
            self._n_events = self._count_events()
        return self._n_events

    def snap_offset(self) -> int:
        """Replay offset of the current snapshot (0 if none)."""
        if self._snap_offset is None:
            try:
                with open(self._manifest_path(), encoding="utf-8") as f:
                    self._snap_offset = int(json.load(f).get("offset", 0))
            except FileNotFoundError:
                self._snap_offset = 0
        return self._snap_offset

    def events_since_snapshot(self) -> int:
        return self.n_events() - self.snap_offset()

    def write_snapshot(self, cat: Catalog) -> None:
        """Snapshot current catalog and point the manifest at it; replay
        offset becomes the current event count.

        The offset is RE-COUNTED from the file here (snapshots are
        rare, O(log) is fine): the in-memory counter can be stale when
        a second engine instance shares the directory, and a too-low
        offset would make the next boot re-apply an already-snapshotted
        event — aborting best-effort replay and dropping later events."""
        offset = self._count_events()
        self._n_events = offset
        path = self._snapshot_path(cat.version)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(catalog_to_json(cat), f)
            f.flush()
            os.fsync(f.fileno())
        self._write_manifest({"snapshot": os.path.basename(path), "offset": offset})
        self._snap_offset = offset

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path())

    def _count_events(self) -> int:
        try:
            with open(self._events_path(), encoding="utf-8") as f:
                return sum(1 for _ in f)
        except FileNotFoundError:
            return 0

    # ------------------------------------------------------------- load

    def load_base(self) -> tuple[Catalog, int]:
        """Load the snapshot-only catalog + its event-replay offset (no
        event replay — the engine interleaves events with the commit
        log by sequence number)."""
        cat = Catalog()
        offset = 0
        try:
            with open(self._manifest_path(), encoding="utf-8") as f:
                manifest = json.load(f)
            snap = manifest.get("snapshot")
            if snap:
                with open(os.path.join(self.dir, snap), encoding="utf-8") as f:
                    cat = catalog_from_json(json.load(f))
            offset = int(manifest.get("offset", 0))
        except FileNotFoundError:
            pass
        self._snap_offset = offset
        return cat, offset

    def read_events(self, offset: int = 0) -> list[tuple[int | None, ast.Stmt]]:
        """Decode DDL events past ``offset`` as (seq, stmt) pairs,
        stopping at the first corrupt line (store.go:80-127)."""
        out: list[tuple[int | None, ast.Stmt]] = []
        try:
            with open(self._events_path(), encoding="utf-8") as f:
                for i, line in enumerate(f):
                    if i < offset:
                        continue
                    try:
                        event = json.loads(line)
                        seq = event.pop("__seq__", None)
                        out.append((seq, event_to_stmt(event)))
                    except (json.JSONDecodeError, KeyError, TypeError):
                        break
        except FileNotFoundError:
            pass
        return out

    def max_seq(self) -> int:
        """Max engine sequence number recorded in the DDL event log
        (0 if none) — a cheap line scan tolerant of corrupt lines."""
        mx = 0
        try:
            with open(self._events_path(), encoding="utf-8") as f:
                for line in f:
                    try:
                        s = json.loads(line).get("__seq__")
                    except (json.JSONDecodeError, AttributeError):
                        continue
                    if isinstance(s, int) and s > mx:
                        mx = s
        except FileNotFoundError:
            pass
        return mx

    def load_at(self, offset: int) -> Catalog:
        """Catalog state after exactly the first ``offset`` events,
        replayed from the start of the (never-deleted) event log.
        Rare recovery path: used when a crash between the catalog
        snapshot and the engine-manifest publish leaves the snapshot
        ahead of the manifest's recorded event offset."""
        cat = Catalog()
        for i, (_seq, stmt) in enumerate(self.read_events(0)):
            if i >= offset:
                break
            try:
                cat = apply_ddl(cat, stmt)
            except DDLError:
                break
        self._snap_offset = offset
        return cat

    def load(self) -> Catalog:
        cat, offset = self.load_base()
        for _seq, stmt in self.read_events(offset):
            # corruption tolerance: stop at the first unapplicable
            # event, keep the best-effort catalog (store.go:80-127).
            try:
                cat = apply_ddl(cat, stmt)
            except DDLError:
                break
        return cat

    def history(self) -> list[dict]:
        """Catalog time-travel: replay ALL events from version 0 and
        return one entry per catalog version — the audit/introspection
        view the reference's versioned copy-on-write catalog implies
        but never exposes (catalog/types.go:71-75 versions, no reader).

        Each entry: version, the statement kind and target, and the
        node/edge type counts after that version.
        """
        out: list[dict] = []
        cat = Catalog()
        for _seq, stmt in self.read_events(0):
            try:
                cat = apply_ddl(cat, stmt)
            except DDLError:
                break
            out.append(
                {
                    "version": cat.version,
                    "op": type(stmt).__name__,
                    "target": getattr(stmt, "name", ""),
                    "n_node_types": len(cat.nodes),
                    "n_edge_types": len(cat.edges),
                }
            )
        return out
