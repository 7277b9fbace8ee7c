"""TCP line-protocol front-end: a drop-in network endpoint for
reference clients, wrapping ``GraphEngine.execute``.

Wire protocol mirrors /root/reference/server/server.go:111-226 so the
reference's CLI (cmd/client/main.go) works unmodified:

- welcome banner on connect;
- lines accumulate until one ends with ``;`` (server.go:146-151);
- ``quit`` / ``exit`` closes with ``Goodbye!`` (server.go:131-135);
- parse errors: ``Parse errors:`` + indented messages (server.go:174-181);
- per-statement feedback lines (``Node inserted with ID: ...``), MATCH
  rows as ``  ID: <id>, Properties: map[k:v ...]`` under a
  ``Nodes of type 'X':`` section (server.go:724-740 — Go's ``%v`` map
  rendering with sorted keys, which cmd/client/main.go:39-42 scrapes);
- ``OK - N statement(s) executed successfully`` trailer (server.go:205).

Concurrency: many clients may connect; statement execution is
serialized by the engine's lock (the reference has NO such lock — its
concurrent DML is a data race, server.go:543-547). Blocking Spark work
runs in a worker thread so the event loop keeps accepting clients.
"""

from __future__ import annotations

import asyncio
import threading

from grapho_spark.engine.engine import EngineError, GraphEngine, StatementResult
from grapho_spark.gql import ast
from grapho_spark.gql.parser import parse_script

BANNER = (
    "Welcome to Grapho DDL Server\n"
    "Enter DDL commands (CREATE, ALTER, DROP) followed by semicolon\n"
    "Type 'quit' to exit\n\n"
)


def _go_value(v: object) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _go_map(row: dict) -> str:
    """Go ``%v`` rendering of a property map: ``map[k1:v1 k2:v2]``,
    keys sorted (fmt sorts map keys), nulls omitted (the reference
    stores only supplied props)."""
    items = sorted((k, v) for k, v in row.items() if v is not None)
    return "map[" + " ".join(f"{k}:{_go_value(v)}" for k, v in items) + "]"


def render_match(stmt: ast.MatchStmt, res: StatementResult) -> str:
    out = ["MATCH Results:"]
    rows = [r.asDict() for r in res.df.collect()]
    cols = res.df.columns
    if stmt.return_aggs or stmt.return_count or stmt.return_agg:
        # Aggregate RETURN (bare or grouped): no entity ids by
        # construction — one line per (group) row.
        out.append("")
        out.append("Aggregate results:")
        for row in rows:
            out.append(f"  {_go_map(row)}")
        return "\n".join(out) + "\n"
    if stmt.return_distinct:
        # RETURN DISTINCT: deduplicated projection — there are no
        # entity ids by construction, one line per distinct tuple.
        out.append("")
        out.append("Distinct rows:")
        for row in rows:
            props = {k: v for k, v in row.items() if k != "_label"}
            label = f" [{row['_label']}]" if "_label" in row else ""
            out.append(f"  Properties: {_go_map(props)}{label}")
        return "\n".join(out) + "\n"
    if "_id" not in cols and "_label" not in cols:
        # Edge-pattern chain result: prefixed <alias>_<col> columns,
        # one row per matched path. Render one line per path with the
        # joined element ids as the ID.
        out.append("")
        pat = ", ".join(f"{el.type} {el.alias}".strip() for el in stmt.pattern)
        out.append(f"Paths matching '{pat}':")
        id_cols = [c for c in cols if c.endswith("__id")]
        for row in rows:
            pid = "-".join(str(row[c]) for c in id_cols)
            props = {k: v for k, v in row.items() if k not in id_cols}
            out.append(f"  ID: {pid}, Properties: {_go_map(props)}")
        return "\n".join(out) + "\n"
    multi = len(stmt.pattern) > 1
    for el in stmt.pattern:
        out.append("")
        out.append(f"Nodes of type '{el.type}':")
        for row in rows:
            if multi and row.get("_label") != el.type:
                continue
            rid = row.get("_id", "")
            # The reference renders the id as the map KEY only — its
            # Properties %v map holds just the props (server.go:734), so
            # a scraper must not see a phantom _id property.
            props = {k: v for k, v in row.items() if k not in ("_id", "_label")}
            out.append(f"  ID: {rid}, Properties: {_go_map(props)}")
    return "\n".join(out) + "\n"


def execute_command(engine: GraphEngine, command: str) -> str:
    """One ``;``-terminated command -> the reference's response text."""
    stmts, errors = parse_script(command)
    if errors:
        return (
            "Parse errors:\n"
            + "".join(f"  {e}\n" for e in errors)
            + "\n"
        )
    if not stmts:
        return "No statements to execute\n\n"
    out: list[str] = []
    try:
        # Statements were already parsed above for error reporting;
        # execute them directly instead of re-parsing the script.
        results = engine.execute_statements(stmts)
    except EngineError as e:
        return "".join(f"{ln}\n" for ln in out) + f"Error executing statement: {e}\n\n"
    for stmt, res in zip(stmts, results):
        if isinstance(stmt, ast.MatchStmt):
            out.append(render_match(stmt, res).rstrip("\n"))
        elif res.df is not None:  # SHOW/DESCRIBE: one line per row
            for r in res.df.collect():
                out.append("  " + " | ".join(str(v) for v in r))
        elif res.message:
            out.append(res.message)
    out.append(f"OK - {len(stmts)} statement(s) executed successfully")
    return "\n".join(out) + "\n\n"


class GQLServer:
    """Asyncio line server; ``start_background()`` runs it on a daemon
    thread (own event loop) and returns the bound port — the shape the
    REPL, tests, and ``python -m grapho_spark --serve`` all use."""

    def __init__(self, engine: GraphEngine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self.host = host
        self.port = port
        self._loop: asyncio.AbstractEventLoop | None = None
        self._thread: threading.Thread | None = None
        self._started = threading.Event()

    async def _handle(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        writer.write(BANNER.encode())
        await writer.drain()
        buf: list[str] = []
        try:
            while True:
                line = await reader.readline()
                if not line:
                    break
                text = line.decode("utf-8", "replace").strip()
                if text in ("quit", "exit"):
                    writer.write(b"Goodbye!\n")
                    await writer.drain()
                    break
                if not text:
                    continue
                buf.append(text)
                if text.endswith(";"):
                    command = " ".join(buf)
                    buf = []
                    reply = await asyncio.to_thread(
                        execute_command, self.engine, command
                    )
                    writer.write(reply.encode())
                    await writer.drain()
        finally:
            writer.close()

    async def serve(self) -> None:
        server = await asyncio.start_server(self._handle, self.host, self.port)
        self.port = server.sockets[0].getsockname()[1]
        self._started.set()
        async with server:
            await server.serve_forever()

    # -------------------------------------------------- thread harness

    def start_background(self) -> int:
        def run() -> None:
            self._loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self._loop)
            try:
                self._loop.run_until_complete(self.serve())
            except (asyncio.CancelledError, RuntimeError):
                pass
            finally:
                self._loop.close()

        self._thread = threading.Thread(target=run, daemon=True, name="gql-server")
        self._thread.start()
        if not self._started.wait(timeout=30):
            raise RuntimeError("GQL server failed to start")
        return self.port

    def stop(self) -> None:
        if self._loop is not None:
            # Cancel in-flight connection handlers BEFORE stopping the
            # loop: a handler parked on readline() that is merely
            # abandoned gets garbage-collected mid-await later (the
            # PytestUnraisableExceptionWarning teardown race), whereas
            # a cancelled one unwinds through its finally and closes
            # the writer. The stop is scheduled one iteration later so
            # the cancellations are actually delivered first.
            def _shutdown(loop: asyncio.AbstractEventLoop) -> None:
                for task in asyncio.all_tasks(loop):
                    task.cancel()
                loop.call_soon(loop.stop)

            self._loop.call_soon_threadsafe(_shutdown, self._loop)
        if self._thread is not None:
            self._thread.join(timeout=10)
