"""Concurrent mixed DML against ONE GQLServer over real sockets.

The reference has a known data race here: server/server.go:543-547
mutates the shared catalog/table maps from concurrent connection
goroutines with no lock (its README calls the server "write-only";
the race is observable under `go test -race`). This engine takes the
opposite contract — every statement executes under the engine RLock,
so concurrent clients SERIALIZE — and this test pins that contract:

  (a) no statement errors under concurrency,
  (b) the commit log records one gap-free strictly-increasing seq per
      DML statement (a total order exists),
  (c) the final table state equals an independent sequential semantic
      model replaying the logged statements IN LOG ORDER — i.e. the
      concurrent execution is equivalent to SOME serial execution, the
      serializability definition,
  (d) a fresh engine recovering from the same data_dir reconstructs
      that exact state (durability is not weakened by concurrency).

See QUIRKS.md (concurrency entry) for the behavior divergence note.
"""

from __future__ import annotations

import json
import threading

import pytest

from grapho_spark.catalog.store import _from_jsonable
from grapho_spark.engine import GraphEngine
from grapho_spark.gql import ast


class _Client:
    def __init__(self, port: int):
        import socket

        self.sock = socket.create_connection(("127.0.0.1", port), timeout=60)
        self.f = self.sock.makefile("rw", encoding="utf-8", newline="\n")

    def read_until_blank(self) -> list[str]:
        out = []
        while True:
            line = self.f.readline()
            if line == "":
                return out
            line = line.rstrip("\n")
            if line == "":
                return out
            out.append(line)

    def send(self, text: str) -> None:
        self.f.write(text + "\n")
        self.f.flush()

    def close(self) -> None:
        self.sock.close()


N_THREADS = 4
N_OPS = 12


def _thread_script(t: int) -> list[str]:
    """Deterministic per-thread statement list; cross-thread UPDATE /
    DELETE keys make the final state order-dependent, so only the
    logged serial order can predict it."""
    stmts = []
    for i in range(N_OPS):
        stmts.append(f"INSERT NODE T (k: {t}, v: {i});")
        if i % 3 == 2:  # touch the NEXT thread's rows
            stmts.append(f"UPDATE NODE T SET v: {50 + t} WHERE k: {(t + 1) % N_THREADS};")
        if i == N_OPS - 2:
            stmts.append(f"DELETE NODE T WHERE v > {52 + t};")
    return stmts


def _apply_model(stmts: list[ast.Stmt]) -> list[dict]:
    """Sequential semantic model (same semantics as
    test_differential_model): int literals, '='/'<'/'>' predicates,
    set-semantics UPDATE/DELETE."""

    def val(lit: ast.Literal) -> int:
        return int(lit.text)

    def match(row: dict, conds) -> bool:
        for c in conds:
            got = row.get(c.name)
            want = val(c.value)
            if c.op == "=" and got != want:
                return False
            if c.op == ">" and not (got is not None and got > want):
                return False
            if c.op == "<" and not (got is not None and got < want):
                return False
        return True

    rows: list[dict] = []
    for s in stmts:
        if isinstance(s, ast.InsertNodeStmt):
            rows.append({p.name: val(p.value) for p in s.properties})
        elif isinstance(s, ast.UpdateNodeStmt):
            for r in rows:
                if match(r, s.where):
                    for p in s.set:
                        r[p.name] = val(p.value)
        elif isinstance(s, ast.DeleteNodeStmt):
            rows = [r for r in rows if not match(r, s.where)]
        else:  # pragma: no cover - script only uses node DML
            raise AssertionError(f"unexpected logged stmt {type(s).__name__}")
    return rows


def test_concurrent_mixed_dml_serializes(spark, tmp_path):
    from grapho_spark.server import GQLServer

    eng = GraphEngine(spark, data_dir=str(tmp_path / "concdb"))
    srv = GQLServer(eng)
    srv.start_background()
    try:
        setup = _Client(srv.port)
        setup.read_until_blank()  # banner
        setup.send("CREATE NODE T (k: int, v: int);")
        assert setup.read_until_blank()[-1].startswith("OK")
        setup.send("quit")
        setup.close()

        errors: list[str] = []

        def run(t: int) -> None:
            c = _Client(srv.port)
            c.read_until_blank()
            try:
                for stmt in _thread_script(t):
                    c.send(stmt)
                    reply = c.read_until_blank()
                    if not reply or not reply[-1].startswith("OK"):
                        errors.append(f"t{t}: {stmt} -> {reply}")
            finally:
                c.close()

        threads = [threading.Thread(target=run, args=(t,)) for t in range(N_THREADS)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert errors == []

        # (b) serialized commit-log ordering: strictly increasing seqs,
        # one per DML statement issued
        entries = [json.loads(line) for line in eng.commit_records()]
        seqs = [e["seq"] for e in entries]
        assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
        n_dml = N_THREADS * len(_thread_script(0))
        assert len(entries) == n_dml

        # (c) final state == sequential model replaying the LOG order
        logged = [_from_jsonable(e["stmt"]) for e in entries]
        want = sorted((r["k"], r["v"]) for r in _apply_model(logged))
        got = sorted((r.k, r.v) for r in eng.node_df("T").collect())
        assert got == want

        # (d) crash-recovery equivalence under the concurrent log
        eng2 = GraphEngine(spark, data_dir=eng.data_dir)
        got2 = sorted((r.k, r.v) for r in eng2.node_df("T").collect())
        assert got2 == want
    finally:
        srv.stop()


def test_concurrent_sql_view_isolation(spark):
    """Two engines on one SparkSession issuing sql() from racing
    threads: the process-wide view lock must pin each analysis to the
    calling engine's catalog — every result reflects the caller's own
    rows, never the other engine's (r7 view-pinning under contention,
    not just sequentially)."""
    a = GraphEngine(spark)
    b = GraphEngine(spark)
    a.execute("CREATE NODE Iso2 (k: int); INSERT NODE Iso2 (k: 1);")
    b.execute(
        "CREATE NODE Iso2 (k: int);"
        "INSERT NODE Iso2 (k: 5); INSERT NODE Iso2 (k: 6); INSERT NODE Iso2 (k: 7);"
    )
    errors: list[str] = []

    def hammer(engine: GraphEngine, want: int, label: str) -> None:
        for _ in range(12):
            got = engine.sql("SELECT count(*) AS n FROM node_Iso2").collect()[0].n
            if got != want:
                errors.append(f"{label}: {got} != {want}")

    threads = [
        threading.Thread(target=hammer, args=(a, 1, "a")),
        threading.Thread(target=hammer, args=(b, 3, "b")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
