"""TCP front-end tests: a plain socket client speaks the reference's
line protocol (server/server.go:111-226) against the asyncio server."""

from __future__ import annotations

import re
import socket

import pytest

from grapho_spark.engine import GraphEngine
from grapho_spark.server import GQLServer


class _Client:
    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        self.f = self.sock.makefile("rw", encoding="utf-8", newline="\n")

    def read_until_blank(self) -> list[str]:
        """Read lines until the blank terminator every reply ends with."""
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


@pytest.fixture()
def server(spark, tmp_path):
    eng = GraphEngine(spark, data_dir=str(tmp_path / "srvdb"))
    srv = GQLServer(eng)
    srv.start_background()
    yield srv
    srv.stop()


def test_three_statement_script_over_socket(server):
    c = _Client(server.port)
    banner = c.read_until_blank()
    assert banner[0] == "Welcome to Grapho DDL Server"

    c.send("CREATE NODE Person (id: int PRIMARY KEY, name: string, age: int);")
    reply = c.read_until_blank()
    assert reply[-1].startswith("OK - 1 statement(s)")

    c.send("INSERT NODE Person (id: 1, name: 'John', age: 30);")
    reply = c.read_until_blank()
    assert any("Inserted node Person" in ln for ln in reply)
    assert reply[-1].startswith("OK - 1 statement(s)")

    # statement split across lines, accumulated until ';'
    c.send("MATCH Person WHERE name: 'John'")
    c.send("RETURN name, age;")
    reply = c.read_until_blank()
    assert reply[0] == "MATCH Results:"
    # next blank-separated block: the section + rows + OK trailer
    block = c.read_until_blank()
    assert block[0] == "Nodes of type 'Person':"
    m = re.match(r"^\s*ID:\s*([^,]+),\s*Properties:\s*(map\[.*\])$", block[1])
    assert m, block
    assert m.group(1).strip() == "1"
    assert "name:John" in m.group(2) and "age:30" in m.group(2)

    c.send("quit")
    assert c.f.readline().strip() == "Goodbye!"
    c.close()


def test_parse_error_and_engine_error(server):
    c = _Client(server.port)
    c.read_until_blank()

    c.send("CREATE GARBAGE;")
    reply = c.read_until_blank()
    assert reply[0] == "Parse errors:"

    c.send("INSERT NODE Ghost (name: 'x');")
    reply = c.read_until_blank()
    assert any("Error executing statement" in ln for ln in reply)

    # the connection survives errors
    c.send("CREATE NODE T (name: string);")
    reply = c.read_until_blank()
    assert reply[-1].startswith("OK -")
    c.close()


def test_two_clients_share_engine(server):
    a = _Client(server.port)
    b = _Client(server.port)
    a.read_until_blank()
    b.read_until_blank()
    a.send("CREATE NODE S (v: int); INSERT NODE S (v: 7);")
    reply = a.read_until_blank()
    assert reply[-1].startswith("OK - 2 statement(s)")
    b.send("MATCH S;")
    reply = b.read_until_blank()
    assert reply[0] == "MATCH Results:"
    block = b.read_until_blank()
    assert any("v:7" in ln for ln in block)
    a.close()
    b.close()


def test_execute_command_never_crashes_on_fuzz(spark):
    """The wire handler must ALWAYS return a rendered response — parse
    errors, engine errors, binary garbage, huge tokens — never raise
    (a crash would drop the TCP session; the reference's handler has
    the same always-respond contract, server/server.go:126-152)."""
    import random

    from grapho_spark.engine import GraphEngine
    from grapho_spark.server import execute_command

    eng = GraphEngine(spark)
    eng.execute("CREATE NODE F (a: int);")
    rng = random.Random(3)
    corpus = [
        "", ";", ";;;", "MATCH", "MATCH F WHERE a >", "INSERT NODE F (a: );",
        "CREATE NODE F (a: int);",  # duplicate type
        "UPDATE NODE F SET", "DELETE NODE F", "\x00\x01\xff", "'unterminated",
        "`backtick", "/* open comment", "-- just a comment",
        "MATCH F RETURN SUM();", "MATCH F RETURN COUNT(*) ORDER BY a;",
        "MATCH F WHERE a <>;", "MATCH F WHERE a !;", "MATCH F WHERE a ! 1;",
        "MATCH F RETURN DISTINCT COUNT(*);", "MATCH F WHERE a <> 1 RETURN DISTINCT a;",
        "MATCH F RETURN a, COUNT(*), COUNT(*);", "MATCH F RETURN a, SUM(nosuch);",
        "A" * 5000, "MATCH F WHERE a: " + "9" * 200 + ";",
        "MATCH F LIMIT 3000000000;",
        "CREATE NODE G (x: " + "array<" * 3000 + "int" + ">" * 3000 + ");",
        "CREATE NODE H (f: float); INSERT NODE H (f: " + "9" * 400 + ");",
    ]
    for _ in range(60):
        cmd = rng.choice(corpus)
        out = execute_command(eng, cmd)
        assert isinstance(out, str)


def test_concurrent_writers_serialize(spark):
    """Statement execution holds the engine lock, so N threads
    hammering INSERTs concurrently must lose nothing: exact final
    count, all sequential IDs unique (the wire server shares one
    engine across connections, server.py; the reference serializes
    per-connection reads the same way)."""
    import threading

    from grapho_spark.engine import GraphEngine
    from grapho_spark.server import execute_command

    eng = GraphEngine(spark)
    eng.execute("CREATE NODE C (v: int);")
    N_THREADS, N_EACH = 8, 25
    errs: list = []

    def worker(t: int) -> None:
        try:
            for i in range(N_EACH):
                out = execute_command(eng, f"INSERT NODE C (v: {t * 1000 + i});")
                assert "OK" in out or "Inserted" in out, out
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(N_THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    rows = eng.node_df("C").collect()
    assert len(rows) == N_THREADS * N_EACH
    ids = [r["_id"] for r in rows]
    assert len(set(ids)) == len(ids)  # sequential IDs never collided
    vals = sorted(r.v for r in rows)
    assert vals == sorted(t * 1000 + i for t in range(N_THREADS) for i in range(N_EACH))


def test_statement_fragmented_across_packets(server):
    """The reference buffers per line until ';' (server.go:126-152);
    our handler must likewise assemble a statement that arrives split
    across multiple TCP writes — and flush only at the terminator."""
    import time

    c = _Client(server.port)
    c.read_until_blank()
    pieces = ["CREATE NODE Frag (", "v: int", "); INSERT NODE ", "Frag (v: 5);"]
    for p in pieces:
        c.sock.sendall(p.encode())
        time.sleep(0.05)  # force separate packets / reads
    c.sock.sendall(b"\n")
    reply = c.read_until_blank()
    assert any("OK - 2 statement(s)" in ln for ln in reply), reply
    c.send("MATCH Frag;")
    assert c.read_until_blank()[0] == "MATCH Results:"
    block = c.read_until_blank()
    assert any("v:5" in ln for ln in block)
    c.close()


def test_explain_over_socket(server):
    c = _Client(server.port)
    c.read_until_blank()
    c.send("CREATE NODE Pl (k: int);")
    c.read_until_blank()
    c.send("INSERT NODE Pl (k: 1);")
    c.read_until_blank()
    c.send("EXPLAIN MATCH Pl WHERE k: 1 RETURN k;")
    reply = c.read_until_blank()
    # plan lines render one per row; the OK trailer still closes the reply
    assert any("Physical Plan" in ln or "Scan" in ln for ln in reply)
    assert reply[-1].startswith("OK - 1 statement(s)")
    c.send("quit")
    c.close()


def test_r9_syntax_over_socket(server):
    # OR / IN / <= / OFFSET / COUNT(field) ride the reference wire
    # protocol unchanged (statements pass through the same engine)
    c = _Client(server.port)
    c.read_until_blank()
    c.send(
        "CREATE NODE W9 (id: int PRIMARY KEY, v: int);"
        "INSERT NODE W9 (id: 1, v: 10); INSERT NODE W9 (id: 2, v: 20);"
        "INSERT NODE W9 (id: 3);"
    )
    reply = c.read_until_blank()
    assert reply[-1].startswith("OK - 4 statement(s)")
    c.send("MATCH W9 WHERE v: 10 OR v >= 20 RETURN v;")
    reply = c.read_until_blank()
    assert reply[0] == "MATCH Results:"
    block = c.read_until_blank()
    assert sum("v:" in ln for ln in block) == 2
    c.send("MATCH W9 WHERE id IN (1, 3) RETURN COUNT(id);")
    reply = c.read_until_blank()
    assert reply[0] == "MATCH Results:"
    block = c.read_until_blank()
    assert any("count_id" in ln and "2" in ln for ln in block), block
    # ORDER BY v ASC is NULLS FIRST: [null(id 3), 10, 20] -> OFFSET 2
    # lands on v=20
    c.send("MATCH W9 RETURN v ORDER BY v LIMIT 1 OFFSET 2;")
    reply = c.read_until_blank()
    block = c.read_until_blank()
    assert any("v:20" in ln.replace(" ", "") for ln in block), block
    c.send("quit")
    c.close()


def test_r10_not_and_paren_over_socket(server):
    # r10 NOT / parenthesized groups over the reference wire protocol,
    # plus one malformed-input recovery case per new form
    c = _Client(server.port)
    c.read_until_blank()
    c.send(
        "CREATE NODE W10 (id: int PRIMARY KEY, v: int, tag: string);"
        "INSERT NODE W10 (id: 1, v: 10, tag: 'x');"
        "INSERT NODE W10 (id: 2, v: 20, tag: 'y');"
        "INSERT NODE W10 (id: 3, tag: 'x');"
    )
    assert c.read_until_blank()[-1].startswith("OK - 4 statement(s)")
    # NOT leaf matches nulls (negated null-safe =)
    c.send("MATCH W10 WHERE NOT v: 10 RETURN id ORDER BY id;")
    assert c.read_until_blank()[0] == "MATCH Results:"
    block = c.read_until_blank()
    assert sum("id:" in ln for ln in block) == 2
    # NOT over a parenthesized OR group
    c.send("MATCH W10 WHERE NOT (v: 10 OR tag: 'y') RETURN id;")
    c.read_until_blank()
    block = c.read_until_blank()
    assert sum("id:" in ln for ln in block) == 1 and any(
        "id:3" in ln.replace(" ", "") for ln in block
    )
    # malformed: unbalanced paren -> parse error, connection survives
    c.send("MATCH W10 WHERE (v: 10 OR tag: 'y' RETURN id;")
    reply = c.read_until_blank()
    assert any("ERROR" in ln or "error" in ln for ln in reply), reply
    # malformed: bare NOT with nothing to negate
    c.send("MATCH W10 WHERE NOT RETURN id;")
    reply = c.read_until_blank()
    assert any("ERROR" in ln or "error" in ln for ln in reply), reply
    # connection still works after both errors
    c.send("MATCH W10 RETURN COUNT(*);")
    assert c.read_until_blank()[0] == "MATCH Results:"
    c.read_until_blank()
    c.send("quit")
    c.close()


def test_r10_endpoint_dml_with_predicates_over_socket(server):
    # endpoint-qualified UPDATE/DELETE combined with the r9/r10
    # predicate forms (OR / IN / NOT) over the wire — untested
    # combinations called out by the r9 verdict
    c = _Client(server.port)
    c.read_until_blank()
    c.send(
        "CREATE NODE U (id: int PRIMARY KEY, name: string);"
        "CREATE EDGE Owns (FROM U MANY, TO U MANY, PROPS (w: int, kind: string));"
        "INSERT NODE U (id: 1, name: 'a'); INSERT NODE U (id: 2, name: 'b');"
        "INSERT NODE U (id: 3, name: 'c');"
        "INSERT EDGE Owns FROM U('1') TO U('2') (w: 1, kind: 'k1');"
        "INSERT EDGE Owns FROM U('1') TO U('3') (w: 2, kind: 'k2');"
        "INSERT EDGE Owns FROM U('2') TO U('3') (w: 3, kind: 'k1');"
    )
    assert c.read_until_blank()[-1].startswith("OK - 8 statement(s)")
    # endpoint-qualified UPDATE with an IN/OR predicate
    c.send(
        "UPDATE EDGE Owns FROM U('1') TO U SET kind: 'seen' "
        "WHERE w IN (1, 3) OR w >= 2;"
    )
    reply = c.read_until_blank()
    assert any("Updated 2 edge(s)" in ln for ln in reply), reply
    # endpoint-qualified DELETE with NOT (the ~pred keep side over a
    # joined endpoint marker)
    c.send("DELETE EDGE Owns FROM U TO U('3') WHERE NOT kind: 'seen';")
    reply = c.read_until_blank()
    assert any("Deleted 1 edge(s)" in ln for ln in reply), reply
    c.send("MATCH U a, Owns e, U b RETURN kind ORDER BY kind;")
    c.read_until_blank()
    block = c.read_until_blank()
    assert sum("kind:seen" in ln.replace(" ", "") for ln in block) == 2, block
    # malformed endpoint ref recovers
    c.send("DELETE EDGE Owns FROM U( TO U WHERE w: 1;")
    reply = c.read_until_blank()
    assert any("error" in ln.lower() for ln in reply), reply
    c.send("MATCH U a, Owns e, U b RETURN COUNT(*);")
    assert c.read_until_blank()[0] == "MATCH Results:"
    block = c.read_until_blank()
    assert any("n_rows" in ln and "2" in ln for ln in block), block
    c.send("quit")
    c.close()


def test_r10_qualified_return_over_socket(server):
    c = _Client(server.port)
    c.read_until_blank()
    c.send(
        "CREATE NODE QS (name: string PRIMARY KEY, seg: string);"
        "CREATE EDGE QE (FROM QS MANY, TO QS MANY);"
        "INSERT NODE QS (name: 'a', seg: 's1');"
        "INSERT NODE QS (name: 'b', seg: 's2');"
        "INSERT EDGE QE FROM QS('1') TO QS('2');"
    )
    assert c.read_until_blank()[-1].startswith("OK - 5 statement(s)")
    c.send("MATCH QS x, QE e, QS y RETURN x.name, y.name;")
    assert c.read_until_blank()[0] == "MATCH Results:"
    block = c.read_until_blank()
    joined = " ".join(block).replace(" ", "")
    assert "x_name:a" in joined and "y_name:b" in joined, block
    # malformed: dangling dot recovers
    c.send("MATCH QS x RETURN x.;")
    reply = c.read_until_blank()
    assert any("error" in ln.lower() for ln in reply), reply
    c.send("MATCH QS RETURN name ORDER BY name;")
    assert c.read_until_blank()[0] == "MATCH Results:"
    c.read_until_blank()
    c.send("quit")
    c.close()


def test_r11_return_alias_over_socket(server):
    # r11: RETURN output aliasing over the reference wire protocol —
    # the pretty-printer renders the user's AS names; a collision is a
    # parse error the connection survives
    c = _Client(server.port)
    c.read_until_blank()
    c.send(
        "CREATE NODE AL (name: string PRIMARY KEY, seg: string);"
        "INSERT NODE AL (name: 'a', seg: 's1');"
        "INSERT NODE AL (name: 'b', seg: 's2');"
    )
    assert c.read_until_blank()[-1].startswith("OK - 3 statement(s)")
    c.send("MATCH AL p RETURN p.name AS owner, seg AS s ORDER BY owner DESC;")
    assert c.read_until_blank()[0] == "MATCH Results:"
    block = c.read_until_blank()
    joined = " ".join(block).replace(" ", "")
    assert "owner:b" in joined and "s:s2" in joined, block
    # malformed: duplicate output name -> parse error, connection lives
    c.send("MATCH AL RETURN name AS x, seg AS x;")
    reply = c.read_until_blank()
    assert any("error" in ln.lower() for ln in reply), reply
    c.send("MATCH AL RETURN COUNT(*);")
    assert c.read_until_blank()[0] == "MATCH Results:"
    c.read_until_blank()
    # r11: aggregate aliases render under the user's names too
    c.send("MATCH AL RETURN seg AS s, COUNT(*) AS cnt ORDER BY s;")
    assert c.read_until_blank()[0] == "MATCH Results:"
    block = c.read_until_blank()
    joined = " ".join(block).replace(" ", "")
    assert "cnt:1" in joined and "s:s1" in joined, block
    # duplicate aggregate output names are a parse error it survives
    c.send("MATCH AL RETURN COUNT(*) AS x, SUM(seg) AS x;")
    reply = c.read_until_blank()
    assert any("error" in ln.lower() for ln in reply), reply
    c.send("quit")
    c.close()


def test_r11_optional_match_over_socket(server):
    # r11 OPTIONAL MATCH over the wire: NULL-padded fields render, and
    # a misplaced OPTIONAL is an error the connection survives
    c = _Client(server.port)
    c.read_until_blank()
    c.send(
        "CREATE NODE ON1 (name: string PRIMARY KEY);"
        "CREATE EDGE OE1 (FROM ON1 MANY, TO ON1 MANY);"
        "INSERT NODE ON1 (name: 'a'); INSERT NODE ON1 (name: 'b');"
        "INSERT EDGE OE1 FROM ON1('1') TO ON1('2');"
    )
    assert c.read_until_blank()[-1].startswith("OK - 5 statement(s)")
    c.send(
        "MATCH ON1 x, OPTIONAL OE1 e, ON1 y "
        "RETURN x.name AS src, y.name AS dst ORDER BY src;"
    )
    assert c.read_until_blank()[0] == "MATCH Results:"
    block = c.read_until_blank()
    joined = " ".join(block).replace(" ", "")
    assert "src:a" in joined and "dst:b" in joined, block
    assert "src:b" in joined, block  # the unmatched row survives
    # r13: OPTIONAL on a trailing node EXECUTES (dangling-edge read);
    # a misplaced INTERIOR node OPTIONAL is still an error the
    # connection survives
    c.send(
        "MATCH ON1 x, OE1 e, OPTIONAL ON1 y RETURN x.name AS src;"
    )
    assert c.read_until_blank()[0] == "MATCH Results:"
    c.read_until_blank()
    c.send("MATCH ON1 x, OE1 e, OPTIONAL ON1 y, OE1 e2, ON1 z;")
    reply = c.read_until_blank()
    assert any("error" in ln.lower() for ln in reply), reply
    c.send("MATCH ON1 RETURN COUNT(*);")
    assert c.read_until_blank()[0] == "MATCH Results:"
    c.read_until_blank()
    c.send("quit")
    c.close()
