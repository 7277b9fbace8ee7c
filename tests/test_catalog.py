"""Catalog DDL validation matrix + store recovery tests — ported from
/root/reference/catalog/ddl_test.go, store_test.go, types_test.go."""

from __future__ import annotations

import json
import os

import pytest

from grapho_spark.catalog.ddl import DDLError, apply_ddl
from grapho_spark.catalog.store import CatalogStore
from grapho_spark.catalog.types import Catalog
from grapho_spark.gql.parser import parse_script


def ddl(cat: Catalog, text: str) -> Catalog:
    stmts, errors = parse_script(text)
    assert not errors, errors
    for st in stmts:
        cat = apply_ddl(cat, st)
    return cat


def base_cat() -> Catalog:
    return ddl(
        Catalog(),
        "CREATE NODE Person (id: int PRIMARY KEY, email: string UNIQUE, name: string);"
        "CREATE NODE Company (name: string NOT NULL);",
    )


def test_create_node_shape_and_indexes():
    cat = base_cat()
    nt = cat.node("Person")
    assert nt.pk == "id"
    assert {(i.field, i.unique) for i in nt.indexes} == {("id", True), ("email", True)}
    assert cat.version == 2


def test_version_increments_per_ddl():
    cat = ddl(base_cat(), "CREATE EDGE WorksAt (FROM Person, TO Company);")
    cat = ddl(cat, "ALTER NODE Person ADD age: int;")
    assert cat.version == 4


@pytest.mark.parametrize(
    "text,msg",
    [
        ("CREATE NODE Person (a: int);", "already exists"),
        ("CREATE NODE X (a: int, a: string);", "duplicate field"),
        ("CREATE NODE X (a: array<int> PRIMARY KEY);", "must be scalar"),
        ("CREATE NODE X (a: enum<'x'> PRIMARY KEY);", "must be scalar"),
        ("CREATE NODE X (a: int PRIMARY KEY, b: int PRIMARY KEY);", "multiple primary keys"),
        ("CREATE NODE X (a: int NOT NULL DEFAULT null);", "NOT NULL but default null"),
        ("CREATE EDGE E (FROM Nope, TO Person);", "FROM node type"),
        ("CREATE EDGE E (FROM Person, TO Nope);", "TO node type"),
    ],
)
def test_create_validation_errors(text, msg):
    cat = base_cat()
    with pytest.raises(DDLError, match=msg):
        ddl(cat, text)


def test_alter_node_matrix():
    cat = base_cat()
    cat = ddl(cat, "ALTER NODE Person ADD nick: string UNIQUE;")
    assert any(i.field == "nick" for i in cat.node("Person").indexes)
    cat = ddl(cat, "ALTER NODE Person MODIFY name: text;")
    cat = ddl(cat, "ALTER NODE Person DROP nick;")
    assert "nick" not in cat.node("Person").field_map()

    with pytest.raises(DDLError, match="cannot drop primary key"):
        ddl(cat, "ALTER NODE Person DROP id;")
    with pytest.raises(DDLError, match="does not exist"):
        ddl(cat, "ALTER NODE Person DROP ghost;")
    with pytest.raises(DDLError, match="cannot remove primary key"):
        ddl(cat, "ALTER NODE Person MODIFY id: int;")
    with pytest.raises(DDLError, match="already primary key"):
        ddl(cat, "ALTER NODE Person ADD id2: int PRIMARY KEY;")


def test_alter_set_primary_key():
    cat = base_cat()
    cat = ddl(cat, "ALTER NODE Person SET PRIMARY KEY (email);")
    assert cat.node("Person").pk == "email"
    with pytest.raises(DDLError, match="composite primary keys"):
        ddl(cat, "ALTER NODE Person SET PRIMARY KEY (id, email);")
    with pytest.raises(DDLError, match="does not exist"):
        ddl(cat, "ALTER NODE Person SET PRIMARY KEY (ghost);")


def test_alter_edge_set_endpoints_applies_both():
    cat = ddl(base_cat(), "CREATE EDGE E (FROM Person, TO Person);")
    cat = ddl(cat, "ALTER EDGE E SET FROM Company MANY TO Person ONE;")
    e = cat.edge("E")
    # the reference's executor would drop one endpoint here
    # (server/server.go:406-423); we apply both.
    assert e.from_ep.label == "Company" and e.from_ep.card.value == "MANY"
    assert e.to_ep.label == "Person" and e.to_ep.card.value == "ONE"


def test_drop_node_referenced_by_edge_rejected():
    cat = ddl(base_cat(), "CREATE EDGE E (FROM Person, TO Company);")
    with pytest.raises(DDLError, match="referenced by edge"):
        ddl(cat, "DROP NODE Person;")
    cat = ddl(cat, "DROP EDGE E;")
    cat = ddl(cat, "DROP NODE Person;")
    assert cat.node("Person") is None


def test_immutability_of_snapshots():
    cat1 = base_cat()
    v1 = cat1.version
    fields_before = cat1.node("Person").fields
    cat2 = ddl(cat1, "ALTER NODE Person ADD extra: int;")
    assert cat1.version == v1
    assert cat1.node("Person").fields == fields_before
    assert len(cat2.node("Person").fields) == len(fields_before) + 1


# ---------------------------------------------------------------- store


def test_store_roundtrip(tmp_path):
    store = CatalogStore(str(tmp_path))
    cat = Catalog()
    stmts, _ = parse_script(
        "CREATE NODE Person (id: int PRIMARY KEY);"
        "CREATE EDGE Knows (FROM Person, TO Person);"
        "ALTER NODE Person ADD name: string DEFAULT 'x';"
    )
    for st in stmts:
        cat = apply_ddl(cat, st)
        store.append_event(st)
    loaded = CatalogStore(str(tmp_path)).load()
    assert loaded == cat


def test_store_snapshot_and_offset(tmp_path):
    store = CatalogStore(str(tmp_path))
    cat = Catalog()
    stmts, _ = parse_script("CREATE NODE A (x: int); CREATE NODE B (y: int);")
    for st in stmts:
        cat = apply_ddl(cat, st)
        store.append_event(st)
    store.write_snapshot(cat)
    # events after the snapshot replay on top of it
    more, _ = parse_script("CREATE NODE C (z: int);")
    cat = apply_ddl(cat, more[0])
    store.append_event(more[0])
    loaded = CatalogStore(str(tmp_path)).load()
    assert loaded == cat
    manifest = json.load(open(os.path.join(str(tmp_path), "MANIFEST.json")))
    assert manifest["offset"] == 2


def test_store_corruption_stops_replay_keeps_prior_state(tmp_path):
    store = CatalogStore(str(tmp_path))
    cat = Catalog()
    stmts, _ = parse_script("CREATE NODE A (x: int); CREATE NODE B (y: int);")
    for st in stmts:
        cat = apply_ddl(cat, st)
        store.append_event(st)
    # corrupt line then a valid one — replay must stop AT the corruption
    with open(os.path.join(str(tmp_path), "ddl-events.jsonl"), "a") as f:
        f.write("{not json}\n")
    good, _ = parse_script("CREATE NODE C (z: int);")
    store.append_event(good[0])
    loaded = CatalogStore(str(tmp_path)).load()
    assert loaded.node("A") and loaded.node("B")
    assert loaded.node("C") is None


def test_write_snapshot_recounts_shared_file(tmp_path):
    """A second writer sharing the directory makes the in-memory event
    counter stale; write_snapshot must record the FILE's true offset so
    the next boot never re-applies an already-snapshotted event."""
    from grapho_spark.catalog.store import CatalogStore
    from grapho_spark.catalog.types import Catalog
    from grapho_spark.gql import ast

    d = str(tmp_path / "cat")
    a = CatalogStore(d)
    b = CatalogStore(d)

    def create(name):
        return ast.CreateNodeStmt(
            name=name,
            fields=(ast.FieldDef(name="x", type=ast.TypeSpec(ast.BaseType.INT)),),
        )

    a.append_event(create("A"), seq=1)   # a._n_events = 1
    b.append_event(create("B"), seq=2)   # file now has 2; a's cache stale
    a.append_event(create("C"), seq=3)   # a's cache says 2, file has 3
    a.write_snapshot(Catalog())
    import json as _json

    with open(a._manifest_path(), encoding="utf-8") as f:
        assert _json.load(f)["offset"] == 3
    assert a.read_events(a.snap_offset()) == []
