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


def _member_match(row: dict, m: tuple) -> bool:
    """One disjunction member: ``("leaf", negated, field, op, val)`` or
    ``("group", negated, groups)`` — mirroring the engine's r10 WHERE
    algebra (every leaf total, NOT = plain negation)."""
    if m[0] == "group":
        _, neg, groups = m
        res = _model_match(row, groups)
        return (not res) if neg else res
    _, neg, name, op, val = m
    got = row.get(name)
    if op == "=":
        res = got == val
    elif op == "in":
        # null-safe membership: a null literal in the list matches
        # stored nulls, like the engine's `=` (here DOMAIN is non-null)
        if got is None:
            res = any(v is None for v in val)
        else:
            res = any(v is not None and got == v for v in val)
    elif got is None or val is None:
        res = False  # range/<> never matches null (total: False, not NULL)
    elif op == "<":
        res = got < val
    elif op == ">":
        res = got > val
    elif op == "<=":
        res = got <= val
    elif op == ">=":
        res = got >= val
    else:
        res = got != val  # <>
    return (not res) if neg else res


def _model_match(row: dict, groups: list[list[tuple]]) -> bool:
    """Conjunction of OR-groups (r10: the WHERE grammar's full extent —
    comma = AND between groups, OR within a group, members
    =/</>/<>/IN, NOT on any member, parenthesized nested groups)."""
    return all(
        any(_member_match(row, m) for m in group) for group in groups
    )


def _rand_member(rng: random.Random, depth: int) -> tuple[str, tuple]:
    neg = rng.random() < 0.25
    pre = "NOT " if neg else ""
    if depth == 0 and rng.random() < 0.2:
        subtext, subgroups = _rand_conds(rng, depth=1)
        return f"{pre}({subtext})", ("group", neg, subgroups)
    field = rng.choice(["a", "b"])
    op = rng.choice(["=", "<", ">", "<=", ">=", "<>", "in"])
    if op == "in":
        vals = tuple(rng.choice(DOMAIN) for _ in range(rng.randint(1, 3)))
        return (
            f"{pre}{field} IN ({', '.join(str(x) for x in vals)})",
            ("leaf", neg, field, "in", vals),
        )
    v = rng.choice(DOMAIN)
    txt = f"{field}: {v}" if op == "=" else f"{field} {op} {v}"
    return f"{pre}{txt}", ("leaf", neg, field, op, v)


def _rand_conds(
    rng: random.Random, depth: int = 0
) -> tuple[str, list[list[tuple]]]:
    groups: list[list[tuple]] = []
    texts: list[str] = []
    for _ in range(rng.randint(1, 2)):
        pairs = [_rand_member(rng, depth) for _ in range(rng.randint(1, 2))]
        groups.append([m for _, m in pairs])
        texts.append(" OR ".join(t for t, _ in pairs))
    return ", ".join(texts), groups


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

    def check_match() -> None:
        # result-level differential: MATCH WHERE through the full
        # engine vs the model's filter, not just end-state equality
        text, conds = _rand_conds(rng)
        got = eng.execute(f"MATCH D WHERE {text} RETURN a, b;")[0].df.collect()
        want = [r for r in model if _model_match(r, conds)]
        # compare VALUES, not just counts — a wrong-rows/right-count
        # MATCH must fail here, not only at the end-state check
        key = lambda t: tuple((v is None, v is not None and v) for v in t)  # noqa: E731
        got_vals = sorted(((r.a, r.b) for r in got), key=key)
        want_vals = sorted(((r["a"], r["b"]) for r in want), key=key)
        assert got_vals == want_vals, (text, got_vals[:5], want_vals[:5])
        # aggregate RETURN differential: COUNT(*) and SUM(b) through
        # the engine vs the model (SUM skips nulls, SQL semantics)
        n = eng.execute(f"MATCH D WHERE {text} RETURN COUNT(*);")[0].df.collect()
        assert n[0][0] == len(want), text
        s = eng.execute(f"MATCH D WHERE {text} RETURN SUM(b);")[0].df.collect()
        want_sum = [r["b"] for r in want if r["b"] is not None]
        assert s[0][0] == (sum(want_sum) if want_sum else None), text
        # ORDER BY / LIMIT OFFSET paging differential (r9): the engine
        # orders by (a ASC NULLS FIRST, _id), and _id order IS the
        # model's insertion order, so a STABLE null-aware sort of the
        # model replicates every page exactly — overlaps, gaps or
        # nondeterministic tie handling would fail here
        # Spark ASC is NULLS FIRST -> None sorts before every value
        want_sorted = sorted(
            want, key=lambda r: (r["a"] is not None, r["a"] is not None and r["a"])
        )
        for off in (0, 2, 5):
            got_p = eng.execute(
                f"MATCH D WHERE {text} RETURN a, b "
                f"ORDER BY a LIMIT 3 OFFSET {off};"
            )[0].df.collect()
            assert [(r.a, r.b) for r in got_p] == [
                (r["a"], r["b"]) for r in want_sorted[off : off + 3]
            ], (text, off)
        # r11: aliased-projection differential — AS renames the OUTPUT
        # column only; values, ordering and paging are unchanged, and
        # ORDER BY resolves the alias as an exact output column
        got_al = eng.execute(
            f"MATCH D WHERE {text} RETURN b AS bb, a ORDER BY bb LIMIT 4;"
        )[0].df
        assert got_al.columns == ["_id", "bb", "a"], text
        want_bb = sorted(
            want, key=lambda r: (r["b"] is not None, r["b"] is not None and r["b"])
        )[:4]
        assert [(r.bb, r.a) for r in got_al.collect()] == [
            (r["b"], r["a"]) for r in want_bb
        ], text
        # r12: grouped-aggregate + HAVING differential — group by a,
        # COUNT(*)/SUM(b) with a post-aggregate OR filter; the model
        # groups nulls into one group (Spark groupBy semantics) and
        # HAVING's null-safe `=` never matches a null key against a
        # non-null literal
        hv = rng.choice(DOMAIN)
        got_h = eng.execute(
            f"MATCH D WHERE {text} RETURN a, COUNT(*) AS n, SUM(b) AS sb "
            f"HAVING n > 1 OR a: {hv};"
        )[0].df.collect()
        groups: dict = {}
        for r in want:
            g = groups.setdefault(r["a"], [0, None])
            g[0] += 1
            if r["b"] is not None:
                g[1] = (g[1] or 0) + r["b"]
        want_h = sorted(
            (
                (a, cnt, sb)
                for a, (cnt, sb) in groups.items()
                if cnt > 1 or (a is not None and a == hv)
            ),
            key=key,
        )
        got_h_vals = sorted(((r.a, r.n, r.sb) for r in got_h), key=key)
        assert got_h_vals == want_h, (text, hv, got_h_vals[:5], want_h[:5])

    for i in range(N_OPS):
        rng.choice([insert, insert, insert, update, update, delete])()
        if i == N_OPS // 2:
            # flush: the first half ran pure-buffer (driver-side DML
            # twins); after this the same stream exercises the
            # DISTRIBUTED predicate/update/delete plans on the merged
            # base+buffer table
            eng.flush()
        if i in (N_OPS // 3, (2 * N_OPS) // 3, N_OPS - 1):
            check_match()

    # None sorts fail on mixed types in py3 — sort on a null-aware key
    key = lambda t: tuple((v is None, v is not None and v) for v in t)  # noqa: E731
    got = sorted(((r.a, r.b, r.tag) for r in eng.node_df("D").collect()), key=key)
    want = sorted(((r["a"], r["b"], r["tag"]) for r in model), key=key)
    assert got == want

    # crash-recovery equivalence: a FRESH engine on the same data_dir
    # (flushed parquet + commit-log tail replay) must reconstruct the
    # exact same state the model predicts
    eng2 = GraphEngine(eng.spark, data_dir=eng.data_dir)
    got2 = sorted(((r.a, r.b, r.tag) for r in eng2.node_df("D").collect()), key=key)
    assert got2 == want


@pytest.fixture()
def eng(spark, tmp_path):
    # a real data_dir so the mid-stream flush persists (without one,
    # flush() is a documented no-op and everything stays pure-buffer)
    return GraphEngine(spark, data_dir=str(tmp_path / "diff_model"))


def test_differential_random_edge_dml(eng):
    """Same differential harness over EDGE DML incl. endpoint-qualified
    UPDATE/DELETE (set semantics over matching endpoints) and the
    smallest-id endpoint resolution of INSERT EDGE (QUIRKS.md #9)."""
    rng = random.Random(7)
    eng.execute(
        "CREATE NODE P (k: int);"
        "CREATE EDGE E (FROM P MANY, TO P MANY, PROPS (w: int));"
    )
    nodes: list[tuple[str, int]] = []  # (id, k)
    edges: list[dict] = []  # {id, src, dst, w}
    counter = [0]

    def ins_node():
        k = rng.choice(DOMAIN)
        eng.execute(f"INSERT NODE P (k: {k});")
        counter[0] += 1
        nodes.append((str(counter[0]), k))

    def resolve(k: int) -> str:
        # deterministic first match = smallest id (numeric-aware)
        ids = [nid for nid, nk in nodes if nk == k]
        return min(ids, key=lambda s: (len(s), s))

    def ins_edge():
        if not nodes:
            return
        xk = rng.choice([nk for _, nk in nodes])
        yk = rng.choice([nk for _, nk in nodes])
        w = rng.choice(DOMAIN)
        eng.execute(f"INSERT EDGE E FROM P(k: {xk}) TO P(k: {yk}) (w: {w});")
        counter[0] += 1
        edges.append(
            {"id": f"edge_{counter[0]}", "src": resolve(xk), "dst": resolve(yk), "w": w}
        )

    def ep_ids(k: int | None) -> set[str] | None:
        if k is None:
            return None
        return {nid for nid, nk in nodes if nk == k}

    def _ep_clause(rng):
        if rng.random() < 0.5 or not nodes:
            return "", None, None
        xk = rng.choice([nk for _, nk in nodes])
        yk = rng.choice([nk for _, nk in nodes])
        return f" FROM P(k: {xk}) TO P(k: {yk})", ep_ids(xk), ep_ids(yk)

    def upd_edge():
        ep_text, from_ids, to_ids = _ep_clause(rng)
        setv = rng.choice(DOMAIN)
        wv = rng.choice(DOMAIN)
        eng.execute(f"UPDATE EDGE E{ep_text} SET w: {setv} WHERE w: {wv};")
        for e in edges:
            if e["w"] == wv and (from_ids is None or e["src"] in from_ids) and (
                to_ids is None or e["dst"] in to_ids
            ):
                e["w"] = setv

    def del_edge():
        ep_text, from_ids, to_ids = _ep_clause(rng)
        wv = rng.choice(DOMAIN)
        eng.execute(f"DELETE EDGE E{ep_text} WHERE w > {wv};")
        edges[:] = [
            e
            for e in edges
            if not (
                e["w"] > wv
                and (from_ids is None or e["src"] in from_ids)
                and (to_ids is None or e["dst"] in to_ids)
            )
        ]

    def check_optional():
        # r11 OPTIONAL differential: left-join semantics vs the model —
        # a node with NO outgoing edge survives as one NULL-padded row;
        # a node whose edges ALL fail the WHERE disappears (post-join
        # filter, no null resurrection); NOT over the total predicate
        # KEEPS the padded rows (guarded cmp is false on NULL)
        tv = rng.choice(DOMAIN)
        got = eng.execute(
            f"MATCH P x, OPTIONAL E e, P y WHERE NOT e.w > {tv} "
            "RETURN x.k AS xk, e.w AS wv;"
        )[0].df.collect()
        rows: list[tuple] = []
        for nid, k in nodes:
            matched = [e for e in edges if e["src"] == nid]
            if matched:
                rows.extend((k, e["w"]) for e in matched)
            else:
                rows.append((k, None))
        want_o = [(k, w) for k, w in rows if not (w is not None and w > tv)]
        key = lambda t: tuple((v is None, v is not None and v) for v in t)  # noqa: E731
        assert sorted(((r.xk, r.wv) for r in got), key=key) == sorted(
            want_o, key=key
        ), tv

    def check_optional_varlen():
        # r12 OPTIONAL+*bounds differential: left-outer hop composition
        # vs the model — shortest hops within 1..2 per reachable (x, y)
        # pair (path multiplicity collapsed), one NULL-padded row per
        # node with NO reachable endpoint, self-pairs (cycles) kept
        got = eng.execute(
            "MATCH P x, OPTIONAL E*1..2 e, P y RETURN x.k, e.hops, y.k;"
        )[0].df.collect()
        one = {(e["src"], e["dst"]) for e in edges}
        pairs: dict[tuple, int] = {p: 1 for p in one}
        for a, b in one:
            for b2, c in one:
                if b == b2:
                    pairs.setdefault((a, c), 2)
        kmap = dict(nodes)
        rows: list[tuple] = []
        for nid, k in nodes:
            out = [(d, h) for (s, d), h in pairs.items() if s == nid]
            if out:
                rows.extend((k, h, kmap[d]) for d, h in out)
            else:
                rows.append((k, None, None))
        key = lambda t: tuple((v is None, v is not None and v) for v in t)  # noqa: E731
        assert sorted(((r.x_k, r.e_hops, r.y_k) for r in got), key=key) == sorted(
            rows, key=key
        )

    ops = [ins_node] * 2 + [ins_edge] * 3 + [upd_edge] * 2 + [del_edge]
    for i in range(60):
        rng.choice(ops)()
        if i == 30:
            eng.flush()
            check_optional()  # over flushed base + buffer
            check_optional_varlen()
    check_optional()  # end-state
    check_optional_varlen()

    got = sorted(
        (r["_id"], r["_src"], r["_dst"], r.w) for r in eng.edge_df("E").collect()
    )
    want = sorted((e["id"], e["src"], e["dst"], e["w"]) for e in edges)
    assert got == want


def test_differential_optional_node(eng):
    """r13 node-endpoint OPTIONAL differential: DELETE NODE does not
    cascade (the reference's rule, SURVEY.md §2.1 #12), so edges
    dangle — ``MATCH P x, E e, OPTIONAL P y`` must keep the dangling
    hop with a NULL-padded y, and the leading form ``MATCH OPTIONAL
    P x, E e, P y`` the symmetric src side, while the inner form
    drops both. Model: id-exact edge list + live-node map."""
    rng = random.Random(23)
    eng.execute(
        "CREATE NODE P (k: int);"
        "CREATE EDGE E (FROM P MANY, TO P MANY, PROPS (w: int));"
    )
    live: dict[str, int] = {}  # id -> k
    edges: list[dict] = []
    counter = [0]

    def ins_node():
        k = rng.choice(DOMAIN)
        eng.execute(f"INSERT NODE P (k: {k});")
        counter[0] += 1
        live[str(counter[0])] = k

    def ins_edge():
        if not live:
            return
        xk = rng.choice(list(live.values()))
        yk = rng.choice(list(live.values()))
        w = rng.choice(DOMAIN)
        eng.execute(f"INSERT EDGE E FROM P(k: {xk}) TO P(k: {yk}) (w: {w});")
        counter[0] += 1
        res = lambda k: min(  # noqa: E731
            (i for i, kk in live.items() if kk == k), key=lambda s: (len(s), s)
        )
        edges.append({"src": res(xk), "dst": res(yk), "w": w})

    def del_node():
        if not live:
            return
        k = rng.choice(list(live.values()))
        eng.execute(f"DELETE NODE P WHERE k: {k};")
        for i in [i for i, kk in live.items() if kk == k]:
            del live[i]  # edges stay — dangling

    def check():
        key = lambda t: tuple(  # noqa: E731
            (v is None, v is not None and v) for v in t
        )

        got = eng.execute(
            "MATCH P x, E e, OPTIONAL P y RETURN x.k AS xk, e.w AS w, y.k AS yk;"
        )[0].df.collect()
        want = [
            (live[e["src"]], e["w"], live.get(e["dst"]))
            for e in edges
            if e["src"] in live
        ]
        assert sorted(((r.xk, r.w, r.yk) for r in got), key=key) == sorted(
            want, key=key
        )

        got = eng.execute(
            "MATCH OPTIONAL P x, E e, P y RETURN x.k AS xk, e.w AS w, y.k AS yk;"
        )[0].df.collect()
        want = [
            (live.get(e["src"]), e["w"], live[e["dst"]])
            for e in edges
            if e["dst"] in live
        ]
        assert sorted(((r.xk, r.w, r.yk) for r in got), key=key) == sorted(
            want, key=key
        )

        got = eng.execute("MATCH P x, E e, P y RETURN x.k AS xk;")[0].df
        want_inner = [
            e for e in edges if e["src"] in live and e["dst"] in live
        ]
        assert got.count() == len(want_inner)

        # WHERE conjuncts over the optional chain — these drive the
        # r13 per-element zone pruning (flushed chains carry leaf
        # stats) against the model on BOTH join sides:
        wv = rng.choice(DOMAIN)
        got = eng.execute(
            "MATCH P x, E e, OPTIONAL P y "
            f"WHERE e.w: {wv} RETURN x.k AS xk, y.k AS yk;"
        )[0].df.collect()
        want = [
            (live[e["src"]], live.get(e["dst"]))
            for e in edges
            if e["src"] in live and e["w"] == wv
        ]
        assert sorted(((r.xk, r.yk) for r in got), key=key) == sorted(
            want, key=key
        ), wv
        kv = rng.choice(DOMAIN)
        # conjunct on the NULLABLE side: padding must be dropped
        got = eng.execute(
            "MATCH P x, E e, OPTIONAL P y "
            f"WHERE y.k: {kv} RETURN x.k AS xk, y.k AS yk;"
        )[0].df.collect()
        want = [
            (live[e["src"]], live[e["dst"]])
            for e in edges
            if e["src"] in live
            and e["dst"] in live
            and live[e["dst"]] == kv
        ]
        assert sorted(((r.xk, r.yk) for r in got), key=key) == sorted(
            want, key=key
        ), kv
        got = eng.execute(
            "MATCH OPTIONAL P x, E e, P y "
            f"WHERE x.k: {kv} RETURN x.k AS xk, y.k AS yk;"
        )[0].df.collect()
        want = [
            (live[e["src"]], live[e["dst"]])
            for e in edges
            if e["dst"] in live
            and e["src"] in live
            and live[e["src"]] == kv
        ]
        assert sorted(((r.xk, r.yk) for r in got), key=key) == sorted(
            want, key=key
        ), kv

    ops = [ins_node] * 3 + [ins_edge] * 3 + [del_node]
    for i in range(50):
        rng.choice(ops)()
        if i == 25:
            eng.flush()
            check()  # over flushed base + buffer
    check()  # end-state


def test_differential_alter_interleaved(eng):
    """Schema migration under live data, differentially: ALTER ADD /
    DROP / MODIFY interleaved with inserts and updates; the model
    tracks schema state (ADD -> None backfill, DROP -> values vanish,
    MODIFY int->float -> stored values become doubles)."""
    rng = random.Random(11)
    eng.execute("CREATE NODE M (a: int);")
    model: list[dict] = []
    has_c = [False]

    def ins():
        a = rng.choice(DOMAIN)
        if has_c[0] and rng.random() < 0.5:
            c = rng.choice(DOMAIN)
            eng.execute(f"INSERT NODE M (a: {a}, c: {c});")
            model.append({"a": a, "c": c})
        else:
            eng.execute(f"INSERT NODE M (a: {a});")
            model.append({"a": a, "c": None} if has_c[0] else {"a": a})

    def add_c():
        if has_c[0]:
            return
        eng.execute("ALTER NODE M ADD c: int;")
        has_c[0] = True
        for r in model:
            r["c"] = None

    def drop_c():
        if not has_c[0]:
            return
        eng.execute("ALTER NODE M DROP c;")
        has_c[0] = False
        for r in model:
            r.pop("c", None)

    def upd():
        if not has_c[0]:
            return
        v = rng.choice(DOMAIN)
        av = rng.choice(DOMAIN)
        eng.execute(f"UPDATE NODE M SET c: {v} WHERE a > {av};")
        for r in model:
            if r["a"] > av:
                r["c"] = v

    for i in range(40):
        rng.choice([ins, ins, ins, add_c, drop_c, upd])()
        if i == 20:
            eng.flush()

    key = lambda t: tuple((v is None, v is not None and v) for v in t)  # noqa: E731
    cols = ["a", "c"] if has_c[0] else ["a"]
    got = sorted(
        (tuple(getattr(r, c) for c in cols) for r in eng.node_df("M").collect()),
        key=key,
    )
    want = sorted((tuple(r.get(c) for c in cols) for r in model), key=key)
    assert got == want


@pytest.mark.parametrize("seed", [301, 302])
def test_differential_durable_bucketed_storage(spark, tmp_path, seed):
    """r10: the durable twin of the random-DML differential — every
    periodic flush exercises bucketed partial rewrites, delta chains,
    auto-compaction and the staged publish (id_buckets=4,
    max_delta_chain=2), and the run ends with a REOPEN (boot recovery
    over bucket maps + commit-log replay) plus a chain-length bound.
    The full 12-seed version is scripts/soak_r10.py; two seeds run in
    CI so a storage regression cannot outlive a round. This shape
    caught the fold-time bucket-loss bug (soak seed 209)."""
    from grapho_spark.engine import GraphEngine

    rng = random.Random(seed)
    eng = GraphEngine(
        spark,
        data_dir=str(tmp_path / f"soak{seed}"),
        id_buckets=4,
        max_delta_chain=2,
        # r11: adaptive re-bucketing live under the soak — the table
        # outgrows 4 rows/bucket mid-stream, so at least one full
        # rewrite re-buckets and later partial rewrites/point reads
        # hash with the GROWN n across the generation boundary;
        # keep_versions fires retention GC (incl. the r11 leaf-
        # granular shed) on every flush under random DML
        target_bucket_rows=4,
        keep_versions=3,
    )
    eng.execute("CREATE NODE D (a: int, b: int);")
    model: list[dict] = []

    def insert():
        props = {f: rng.choice(DOMAIN) for f in ("a", "b") if rng.random() < 0.85}
        body = ", ".join(f"{k}: {v}" for k, v in props.items())
        eng.execute(f"INSERT NODE D ({body});" if body else "INSERT NODE D;")
        model.append({"a": props.get("a"), "b": props.get("b")})

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

    def check():
        text, conds = _rand_conds(rng)
        want = [r for r in model if _model_match(r, conds)]
        got = eng.execute(f"MATCH D WHERE {text} RETURN a, b;")[0].df.collect()
        key = lambda t: tuple((v is None, v is not None and v) for v in t)  # noqa: E731
        assert sorted(((r.a, r.b) for r in got), key=key) == sorted(
            ((r["a"], r["b"]) for r in want), key=key
        ), (seed, text)

    ops = [insert] * 5 + [update] * 2 + [delete] * 1 + [check] * 2
    for i in range(60):
        rng.choice(ops)()
        if i % 15 == 14:
            eng.flush()
        if i == 29:
            # mid-stream maintenance compaction: the re-bucketing point
            eng.compact()
    eng.flush()
    eng2 = GraphEngine(spark, data_dir=eng.data_dir)
    # the reopened engine restores the grown layout n from the tip map
    tab2 = eng2.tables[("node", "D")]
    assert tab2.bucket_n is not None and tab2.bucket_n >= 4, (
        seed, tab2.bucket_n,
    )
    key = lambda t: tuple((v is None, v is not None and v) for v in t)  # noqa: E731
    rows = eng2.execute("MATCH D;")[0].df.collect()
    assert sorted(((r.a, r.b) for r in rows), key=key) == sorted(
        ((r["a"], r["b"]) for r in model), key=key
    ), (seed, "reopen")
    for v in eng2.table_versions("node", "D"):
        assert len(eng2._chain_versions("node", "D", v)) <= 3, (seed, v)
