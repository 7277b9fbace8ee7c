"""Differential model test: a seeded random DML workload runs against
BOTH the GraphEngine and an independent in-memory Python model that
implements the documented statement semantics (QUIRKS.md: typed
coercion, null-safe equality, range-never-matches-null, set-semantics
UPDATE/DELETE). Final table states must agree row-for-row.

This is the cross-check the reference lacks entirely (its server/
package has zero tests): two independent implementations of the same
semantics, driven by the same statement stream."""

from __future__ import annotations

import random

import pytest

from grapho_spark.engine import GraphEngine

N_OPS = 80
DOMAIN = list(range(6))  # small value domain => predicates hit often


def _model_match(row: dict, conds: list[tuple[str, str, object]]) -> bool:
    for name, op, val in conds:
        got = row.get(name)
        if op == "=":
            if got != val:
                return False
        else:
            if got is None or val is None:
                return False
            if op == "<" and not got < val:
                return False
            if op == ">" and not got > val:
                return False
    return True


def _rand_conds(rng: random.Random) -> tuple[str, list[tuple[str, str, object]]]:
    conds = []
    for _ in range(rng.randint(1, 2)):
        field = rng.choice(["a", "b"])
        op = rng.choice(["=", "<", ">"])
        val = rng.choice(DOMAIN)
        conds.append((field, op, val))
    text = ", ".join(
        f"{f}: {v}" if op == "=" else f"{f} {op} {v}" for f, op, v in conds
    )
    return text, conds


def test_differential_random_dml(eng):
    rng = random.Random(42)
    eng.execute("CREATE NODE D (a: int, b: int, tag: string DEFAULT 'x');")
    model: list[dict] = []
    next_id = [0]

    def insert():
        props = {}
        for f in ("a", "b"):
            if rng.random() < 0.85:
                props[f] = rng.choice(DOMAIN)
        body = ", ".join(f"{k}: {v}" for k, v in props.items())
        eng.execute(f"INSERT NODE D ({body});" if body else "INSERT NODE D;")
        next_id[0] += 1
        model.append(
            {"a": props.get("a"), "b": props.get("b"), "tag": "x"}
        )

    def update():
        text, conds = _rand_conds(rng)
        setv = rng.choice(DOMAIN)
        eng.execute(f"UPDATE NODE D SET b: {setv} WHERE {text};")
        for r in model:
            if _model_match(r, conds):
                r["b"] = setv

    def delete():
        text, conds = _rand_conds(rng)
        eng.execute(f"DELETE NODE D WHERE {text};")
        model[:] = [r for r in model if not _model_match(r, conds)]

    for i in range(N_OPS):
        rng.choice([insert, insert, insert, update, update, delete])()
        if i == N_OPS // 2:
            # flush: the first half ran pure-buffer (driver-side DML
            # twins); after this the same stream exercises the
            # DISTRIBUTED predicate/update/delete plans on the merged
            # base+buffer table
            eng.flush()

    # None sorts fail on mixed types in py3 — sort on a null-aware key
    key = lambda t: tuple((v is None, v is not None and v) for v in t)  # noqa: E731
    got = sorted(((r.a, r.b, r.tag) for r in eng.node_df("D").collect()), key=key)
    want = sorted(((r["a"], r["b"], r["tag"]) for r in model), key=key)
    assert got == want


@pytest.fixture()
def eng(spark, tmp_path):
    # a real data_dir so the mid-stream flush persists (without one,
    # flush() is a documented no-op and everything stays pure-buffer)
    return GraphEngine(spark, data_dir=str(tmp_path / "diff_model"))
