"""Parser tests — ported from the reference's DDL/DML parser test
matrix (/root/reference/parser/parser_test.go, dml_test.go): AST field
asserts, defaults, array/enum, trailing commas, error recovery,
mixed-statement scripts."""

from __future__ import annotations

from grapho_spark.gql import ast
from grapho_spark.gql.parser import parse_script


def one(text: str):
    stmts, errors = parse_script(text)
    assert not errors, errors
    assert len(stmts) == 1
    return stmts[0]


def test_create_node_full():
    st = one(
        "CREATE NODE Person (id: int PRIMARY KEY, email: string UNIQUE NOT NULL, "
        "age: int DEFAULT 0, bio: text);"
    )
    assert isinstance(st, ast.CreateNodeStmt)
    assert st.name == "Person"
    names = [f.name for f in st.fields]
    assert names == ["id", "email", "age", "bio"]
    assert st.fields[0].primary_key and st.fields[0].type.base is ast.BaseType.INT
    assert st.fields[1].unique and st.fields[1].not_null
    assert st.fields[2].default.kind is ast.LiteralKind.NUMBER
    assert st.fields[2].default.text == "0"
    assert st.fields[3].type.base is ast.BaseType.TEXT


def test_create_node_empty_and_trailing_comma():
    st = one("CREATE NODE Empty ();")
    assert st.fields == ()
    st2 = one("CREATE NODE T (a: int,);")
    assert [f.name for f in st2.fields] == ["a"]


def test_array_and_enum_types():
    st = one("CREATE NODE T (tags: array<string>, status: enum<'a', 'b'>, m: array<array<int>>);")
    assert st.fields[0].type.is_array
    assert st.fields[0].type.elem.base is ast.BaseType.STRING
    assert st.fields[1].type.enum_vals == ("a", "b")
    assert st.fields[2].type.elem.is_array
    assert st.fields[2].type.elem.elem.base is ast.BaseType.INT


def test_quoted_identifiers():
    st = one("CREATE NODE `my node` (`weird field`: int);")
    assert st.name == "my node"
    assert st.fields[0].name == "weird field"


def test_create_edge_default_cardinality_one():
    st = one("CREATE EDGE Knows (FROM Person, TO Person);")
    assert isinstance(st, ast.CreateEdgeStmt)
    assert st.from_ep.card is ast.Cardinality.ONE
    assert st.to_ep.card is ast.Cardinality.ONE


def test_create_edge_cards_and_props():
    st = one(
        "CREATE EDGE WorksAt (FROM Person MANY, TO Company ONE, "
        "PROPS (since: date, role: string DEFAULT 'eng'));"
    )
    assert st.from_ep == ast.Endpoint("Person", ast.Cardinality.MANY)
    assert st.to_ep == ast.Endpoint("Company", ast.Cardinality.ONE)
    assert [p.name for p in st.props] == ["since", "role"]
    assert st.props[1].default.text == "eng"


def test_alter_node_matrix():
    add = one("ALTER NODE Person ADD nick: string UNIQUE;")
    assert add.action is ast.AlterAction.ADD_FIELD and add.field.unique
    drop = one("ALTER NODE Person DROP nick;")
    assert drop.action is ast.AlterAction.DROP_FIELD and drop.field_name == "nick"
    mod = one("ALTER NODE Person MODIFY age: float;")
    assert mod.action is ast.AlterAction.MODIFY_FIELD
    assert mod.field.type.base is ast.BaseType.FLOAT
    setpk = one("ALTER NODE Person SET PRIMARY KEY (email);")
    assert setpk.action is ast.AlterAction.SET_PRIMARY_KEY
    assert setpk.pk_fields == ("email",)
    # composite list is grammatically allowed (parser captures it all)
    comp = one("ALTER NODE Person SET PRIMARY KEY (a, b);")
    assert comp.pk_fields == ("a", "b")


def test_alter_edge_matrix():
    st = one("ALTER EDGE Knows SET FROM Person MANY TO Company ONE;")
    assert st.action is ast.AlterAction.SET_ENDPOINTS
    assert st.from_ep.card is ast.Cardinality.MANY
    assert st.to_ep.label == "Company"


def test_drop_statements():
    assert isinstance(one("DROP NODE Person;"), ast.DropNodeStmt)
    assert isinstance(one("DROP EDGE Knows;"), ast.DropEdgeStmt)


def test_insert_node_with_and_without_props():
    st = one("INSERT NODE Person (name: 'John', age: 30, ok: true, x: null);")
    assert isinstance(st, ast.InsertNodeStmt)
    kinds = [p.value.kind for p in st.properties]
    assert kinds == [
        ast.LiteralKind.STRING,
        ast.LiteralKind.NUMBER,
        ast.LiteralKind.BOOL,
        ast.LiteralKind.NULL,
    ]
    bare = one("INSERT NODE Person;")
    assert bare.properties == ()


def test_insert_edge_by_id_and_by_props():
    st = one("INSERT EDGE Knows FROM Person(1) TO Person(name: 'Ann') (since: 2020);")
    assert isinstance(st, ast.InsertEdgeStmt)
    assert st.from_node.id.text == "1"
    assert st.to_node.id is None
    assert st.to_node.properties[0].name == "name"
    assert st.properties[0].name == "since"


def test_update_with_and_without_where():
    st = one("UPDATE NODE Person SET age: 31 WHERE name: 'John';")
    assert st.set[0].name == "age" and st.where[0].name == "name"
    st2 = one("UPDATE EDGE Knows SET since: 2021;")
    assert isinstance(st2, ast.UpdateEdgeStmt) and st2.where == ()


def test_delete_requires_where():
    _, errors = parse_script("DELETE NODE Person;")
    assert errors
    st = one("DELETE EDGE Knows WHERE since: 2020;")
    assert isinstance(st, ast.DeleteEdgeStmt)


def test_match_with_alias_where_return():
    st = one("MATCH Person p, Company WHERE name: 'Ann' RETURN name, age;")
    assert isinstance(st, ast.MatchStmt)
    assert st.pattern[0] == ast.MatchElement("Person", "p", False, 1, 7)
    assert st.pattern[1].type == "Company"
    assert st.where[0].value.text == "Ann"
    assert st.return_fields == ("name", "age")


def test_show_and_describe():
    assert one("SHOW NODES;").kind == "NODES"
    d = one("DESCRIBE NODE Person;")
    assert d.kind == "NODE" and d.name == "Person"


def test_error_recovery_continues_to_next_statement():
    stmts, errors = parse_script("CREATE BOGUS; CREATE NODE P (a: int);")
    assert len(errors) == 1
    assert len(stmts) == 1
    assert stmts[0].name == "P"


def test_missing_semicolon_reported():
    stmts, errors = parse_script("CREATE NODE P (a: int)")
    assert len(stmts) == 1
    assert any("missing ';'" in e.msg for e in errors)


def test_mixed_script():
    text = """
    CREATE NODE Person (id: int PRIMARY KEY, name: string);
    CREATE EDGE Knows (FROM Person, TO Person);
    INSERT NODE Person (id: 1, name: 'Ann');
    UPDATE NODE Person SET name: 'Bea' WHERE id: 1;
    MATCH Person WHERE name: 'Bea' RETURN name;
    DROP EDGE Knows;
    """
    stmts, errors = parse_script(text)
    assert not errors
    assert [type(s).__name__ for s in stmts] == [
        "CreateNodeStmt",
        "CreateEdgeStmt",
        "InsertNodeStmt",
        "UpdateNodeStmt",
        "MatchStmt",
        "DropEdgeStmt",
    ]


def test_update_delete_edge_endpoint_refs():
    st = one(
        "UPDATE EDGE WorksAt FROM Person (name: 'bob') TO Company "
        "SET role: 'lead' WHERE since: 2020;"
    )
    assert isinstance(st, ast.UpdateEdgeStmt)
    assert st.from_node.node_type == "Person"
    assert st.from_node.properties[0].name == "name"
    assert st.to_node.node_type == "Company"
    assert st.to_node.properties == ()
    assert st.set[0].name == "role" and st.where[0].name == "since"

    st = one("DELETE EDGE WorksAt FROM Person TO Company (cname: 'acme');")
    assert isinstance(st, ast.DeleteEdgeStmt)
    assert st.where == () and st.to_node.properties[0].name == "cname"

    # endpoint refs do NOT waive DELETE's predicate rule when absent
    _, errors = parse_script("DELETE EDGE WorksAt;")
    assert errors
    # UPDATE NODE must not accept FROM
    _, errors = parse_script("UPDATE NODE P FROM Q TO R SET x: 1;")
    assert errors


def test_match_var_length_bounds_parse():
    from grapho_spark.gql.parser import parse_script

    stmts, errs = parse_script("MATCH Person a, Knows*2..4 k, Person b;")
    assert not errs
    el = stmts[0].pattern[1]
    assert (el.min_hops, el.max_hops) == (2, 4)

    stmts, errs = parse_script("MATCH Person a, Knows* k, Person b;")
    assert not errs
    el = stmts[0].pattern[1]
    assert (el.min_hops, el.max_hops) == (1, 3)

    stmts, errs = parse_script("MATCH Person a, Knows*2 k, Person b;")
    assert not errs
    el = stmts[0].pattern[1]
    assert (el.min_hops, el.max_hops) == (2, 2)


def test_match_var_length_bad_bounds_rejected():
    from grapho_spark.gql.parser import parse_script

    _, errs = parse_script("MATCH Person a, Knows*4..2 k, Person b;")
    assert errs
    _, errs = parse_script("MATCH Person a, Knows*0..3 k, Person b;")
    assert errs
    _, errs = parse_script("MATCH Person a, Knows*1..99 k, Person b;")
    assert errs


def test_number_lexing_unaffected_by_range_fix():
    from grapho_spark.gql.lexer import Lexer, TokenType

    toks = Lexer("1..3").tokens()
    assert [t.type for t in toks[:4]] == [
        TokenType.NUMBER, TokenType.DOT, TokenType.DOT, TokenType.NUMBER,
    ]
    toks = Lexer("1.5").tokens()
    assert toks[0].type is TokenType.NUMBER and toks[0].lit == "1.5"


def test_match_order_limit_parse():
    from grapho_spark.gql.parser import parse_script

    stmts, errs = parse_script(
        "MATCH Customer RETURN c_name ORDER BY c_acctbal DESC, c_name LIMIT 5;"
    )
    assert not errs
    st = stmts[0]
    assert st.order_by == (("c_acctbal", True), ("c_name", False))
    assert st.limit == 5

    # LIMIT without ORDER BY; ORDER BY without LIMIT
    stmts, errs = parse_script("MATCH Customer LIMIT 10;")
    assert not errs and stmts[0].limit == 10 and stmts[0].order_by == ()
    stmts, errs = parse_script("MATCH Customer ORDER BY c_name;")
    assert not errs and stmts[0].limit is None
    assert stmts[0].order_by == (("c_name", False),)


def test_match_order_limit_soft_keywords_stay_identifiers():
    from grapho_spark.gql.parser import parse_script

    # 'order' / 'limit' remain valid aliases and field names: the
    # clause only triggers on ORDER followed by BY / LIMIT followed by
    # a number (LL(2) at exactly that position).
    stmts, errs = parse_script("MATCH Customer order;")
    assert not errs and stmts[0].pattern[0].alias == "order"
    stmts, errs = parse_script("MATCH Customer limit;")
    assert not errs and stmts[0].pattern[0].alias == "limit"
    stmts, errs = parse_script("MATCH Customer RETURN order, limit;")
    assert not errs and stmts[0].return_fields == ("order", "limit")


def test_match_order_limit_bad_limit_rejected():
    from grapho_spark.gql.parser import parse_script

    _, errs = parse_script("MATCH Customer LIMIT 0;")
    assert errs
    # LIMIT with no number is an alias named 'LIMIT', then a parse
    # error at the stray token only if something follows; bare trailing
    # ident is consumed as the alias.
    stmts, errs = parse_script("MATCH Customer LIMIT;")
    assert not errs and stmts[0].pattern[0].alias == "LIMIT"


def test_match_return_count_parse():
    from grapho_spark.gql.parser import parse_script

    stmts, errs = parse_script("MATCH Customer RETURN COUNT(*);")
    assert not errs and stmts[0].return_count and stmts[0].return_fields == ()
    stmts, errs = parse_script("MATCH Customer RETURN COUNT(*) LIMIT 1;")
    assert not errs and stmts[0].return_count
    # count stays a legal plain field name
    stmts, errs = parse_script("MATCH Customer RETURN count;")
    assert not errs and stmts[0].return_fields == ("count",)
    # mixing with fields is the grouped-aggregate extension
    stmts, errs = parse_script("MATCH Customer RETURN COUNT(*), c_name;")
    assert not errs
    assert stmts[0].return_fields == ("c_name",)
    assert stmts[0].return_aggs == (("COUNT", "*"),)
    assert not stmts[0].return_count  # grouped form, not the bare legacy one
    # ORDER BY with a BARE aggregate stays rejected
    _, errs = parse_script("MATCH Customer RETURN COUNT(*) ORDER BY c_name;")
    assert errs


def test_where_range_operators_parse():
    stmts, errors = parse_script(
        "MATCH Person WHERE age > 30, score < 2.5, name: 'x' RETURN name;"
    )
    assert not errors
    where = stmts[0].where
    assert [(p.name, p.op) for p in where] == [
        ("age", ">"),
        ("score", "<"),
        ("name", "="),
    ]
    _, errors = parse_script("DELETE NODE Person WHERE age > 90;")
    assert not errors
    _, errors = parse_script("UPDATE NODE Person SET flag: true WHERE age < 18;")
    assert not errors


def test_range_operator_rejected_outside_where():
    # INSERT property lists and SET lists are reference grammar; the
    # range extension applies to WHERE only.
    _, errors = parse_script("INSERT NODE Person (age > 30);")
    assert errors
    _, errors = parse_script("UPDATE NODE Person SET age > 30 WHERE id: 1;")
    assert errors


def test_type_nesting_depth_capped():
    deep = "CREATE NODE X (a: " + "array<" * 3000 + "int" + ">" * 3000 + ");"
    stmts, errors = parse_script(deep)  # must not raise RecursionError
    assert errors and "nesting too deep" in errors[0].msg
    ok = "CREATE NODE X (a: " + "array<" * 8 + "int" + ">" * 8 + ");"
    stmts, errors = parse_script(ok)
    assert not errors


def test_limit_out_of_jvm_int_range_rejected():
    _, errors = parse_script("MATCH P LIMIT 3000000000;")
    assert errors and "LIMIT" in errors[0].msg
    stmts, errors = parse_script("MATCH P LIMIT 2147483647;")
    assert not errors and stmts[0].limit == 2**31 - 1


def test_where_not_equal_parses():
    stmts, errors = parse_script(
        "MATCH Person WHERE age <> 30, name != 'x' RETURN name;"
    )
    assert not errors
    assert [(p.name, p.op) for p in stmts[0].where] == [
        ("age", "<>"),
        ("name", "<>"),
    ]
    _, errors = parse_script("DELETE NODE Person WHERE age <> 90;")
    assert not errors
    # reference grammar positions (INSERT/SET lists) reject it
    _, errors = parse_script("INSERT NODE Person (age <> 30);")
    assert errors


def test_return_distinct_parses():
    stmts, errors = parse_script("MATCH Person RETURN DISTINCT name, city;")
    assert not errors
    assert stmts[0].return_distinct and stmts[0].return_fields == ("name", "city")
    # soft keyword: a single field literally named distinct still works
    stmts, errors = parse_script("MATCH Person RETURN distinct;")
    assert not errors
    assert not stmts[0].return_distinct
    assert stmts[0].return_fields == ("distinct",)
    # DISTINCT then ORDER BY clause: ORDER is not treated as a field
    stmts, errors = parse_script(
        "MATCH Person RETURN DISTINCT name ORDER BY name LIMIT 3;"
    )
    assert not errors
    assert stmts[0].return_distinct and stmts[0].limit == 3
    # aggregates cannot combine with DISTINCT
    _, errors = parse_script("MATCH Person RETURN DISTINCT COUNT(*);")
    assert errors


def test_where_or_in_parses():
    # r9: OR groups + IN lists (soft keywords)
    stmts, errors = parse_script(
        "MATCH P WHERE a: 1 OR b < 2, c IN (1, 2, null) RETURN a;"
    )
    assert not errors
    w = stmts[0].where
    assert [(p.name, p.op, p.or_group) for p in w] == [
        ("a", "=", 0),
        ("b", "<", 0),
        ("c", "in", -1),
    ]
    assert [v.text for v in w[2].in_values] == ["1", "2", "null"]
    # OR/IN stay legal FIELD names at predicate start
    stmts, errors = parse_script("MATCH P WHERE or: 1, in: 2;")
    assert not errors
    assert [(p.name, p.op) for p in stmts[0].where] == [("or", "="), ("in", "=")]
    # IN requires allow_cmp positions (WHERE); INSERT rejects it
    _, errors = parse_script("INSERT NODE P (a IN (1));")
    assert errors
    # UPDATE/DELETE WHERE accept OR/IN too
    _, errors = parse_script("UPDATE NODE P SET a: 1 WHERE b: 1 OR b: 2;")
    assert not errors
    _, errors = parse_script("DELETE NODE P WHERE a IN (1, 2);")
    assert not errors
    # qualified keys compose with OR/IN
    stmts, errors = parse_script("MATCH P x, E e, P y WHERE x.a: 1 OR y.b IN (2);")
    assert not errors
    assert [(p.name, p.op, p.or_group) for p in stmts[0].where] == [
        ("x.a", "=", 0),
        ("y.b", "in", 0),
    ]


def test_match_as_of_parses():
    stmts, errors = parse_script("MATCH Person AS OF 2 WHERE a: 1 RETURN a;")
    assert not errors
    assert stmts[0].as_of == 2
    # alias then AS OF
    stmts, errors = parse_script("MATCH Person p AS OF 3;")
    assert not errors
    assert stmts[0].as_of == 3 and stmts[0].pattern[0].alias == "p"
    # AS without OF is an alias named `as`
    stmts, errors = parse_script("MATCH Person as;")
    assert not errors
    assert stmts[0].as_of is None and stmts[0].pattern[0].alias == "as"
    # non-integer version rejected at parse time
    _, errors = parse_script("MATCH Person AS OF 1.5;")
    assert errors and "integer version" in errors[0].msg


def test_where_inclusive_bounds_parse():
    # r9: <= / >= complete the comparison set
    stmts, errors = parse_script("MATCH P WHERE a <= 3, b >= 1 OR c <> 2;")
    assert not errors
    assert [(p.name, p.op, p.or_group) for p in stmts[0].where] == [
        ("a", "<=", -1),
        ("b", ">=", 0),
        ("c", "<>", 0),
    ]
    # reference grammar positions reject them
    _, errors = parse_script("INSERT NODE P (a <= 3);")
    assert errors


def test_limit_offset_parses():
    stmts, errors = parse_script("MATCH P ORDER BY a LIMIT 5 OFFSET 10;")
    assert not errors
    assert stmts[0].limit == 5 and stmts[0].offset == 10
    # OFFSET without LIMIT is just a field... no clause to attach to:
    # the parser leaves it unconsumed and errors on the dangling token
    _, errors = parse_script("MATCH P ORDER BY a OFFSET 10;")
    assert errors
    # negative / overflow rejected
    _, errors = parse_script("MATCH P LIMIT 5 OFFSET 3000000000;")
    assert errors and "OFFSET" in errors[0].msg
    # a field literally named offset still parses everywhere else
    stmts, errors = parse_script("MATCH P WHERE offset: 1 RETURN offset;")
    assert not errors
    assert stmts[0].where[0].name == "offset"


def test_not_and_paren_groups_parse():
    # r10: NOT term and parenthesized nested predicate lists
    from grapho_spark.gql import ast

    stmts, errors = parse_script("MATCH P WHERE NOT a: 1, b: 2;")
    assert not errors
    w = stmts[0].where
    assert (w[0].name, w[0].negated, w[1].name, w[1].negated) == (
        "a", True, "b", False,
    )
    # NOT NOT cancels
    stmts, _ = parse_script("MATCH P WHERE NOT NOT a: 1;")
    assert stmts[0].where[0].negated is False
    # parenthesized group joins an enclosing OR like any member
    stmts, errors = parse_script("MATCH P WHERE (a: 1, b: 2) OR c: 3;")
    assert not errors
    g, c = stmts[0].where
    assert isinstance(g, ast.PredGroup) and not g.negated
    assert [p.name for p in g.items] == ["a", "b"]
    assert g.or_group == c.or_group == 0
    # NOT over a group, nesting, and NOT inside
    stmts, errors = parse_script("MATCH P WHERE NOT (a < 3, NOT (b: 2 OR c: 4));")
    assert not errors
    outer = stmts[0].where[0]
    assert isinstance(outer, ast.PredGroup) and outer.negated
    inner = outer.items[1]
    assert isinstance(inner, ast.PredGroup) and inner.negated
    assert [p.or_group for p in inner.items] == [0, 0]
    # NOT is reserved (NOT NULL): a field named not needs backticks
    _, errors = parse_script("MATCH P WHERE not: 1;")
    assert errors
    stmts, errors = parse_script("MATCH P WHERE `not`: 1;")
    assert not errors and stmts[0].where[0].name == "not"
    # reference grammar positions reject both extensions
    _, errors = parse_script("INSERT NODE P (NOT a: 1);")
    assert errors
    _, errors = parse_script("INSERT NODE P ((a: 1));")
    assert errors
    # unbalanced paren is a parse error
    _, errors = parse_script("MATCH P WHERE (a: 1 OR b: 2;")
    assert errors


def test_match_return_alias_parse():
    # r11: RETURN output aliasing — AS is a soft keyword (marker only
    # when followed by an IDENT); aliases land index-aligned in
    # return_aliases, None for unaliased items
    st = one("MATCH Person p RETURN p.name AS owner, age, city AS c;")
    assert st.return_fields == ("p.name", "age", "city")
    assert st.return_aliases == ("owner", None, "c")
    # no aliases anywhere -> empty tuple (programmatic-AST back-compat)
    st = one("MATCH Person RETURN name, age;")
    assert st.return_aliases == ()
    # quoted `as` is a plain field, never a marker
    st = one("MATCH Person RETURN `as`, name;")
    assert st.return_fields == ("as", "name") and st.return_aliases == ()
    # DISTINCT composes with aliases
    st = one("MATCH Person RETURN DISTINCT seg AS s;")
    assert st.return_distinct and st.return_aliases == ("s",)
    # alias followed by ORDER BY parses (greedy alias, then the clause)
    st = one("MATCH Person RETURN name AS n ORDER BY n DESC LIMIT 2;")
    assert st.return_aliases == ("n",) and st.order_by == (("n", True),)


def test_match_return_alias_collisions_rejected():
    _, errors = parse_script("MATCH P RETURN a AS x, b AS x;")
    assert len(errors) == 1 and "duplicate RETURN output column" in errors[0].msg
    _, errors = parse_script("MATCH P RETURN a AS sum_b, SUM(b);")
    assert len(errors) == 1 and "collides with the SUM(b)" in errors[0].msg
    _, errors = parse_script("MATCH P RETURN COUNT(*) AS x, SUM(b) AS x;")
    assert len(errors) == 1 and "duplicate aggregate output column" in errors[0].msg
    # qualified item whose default output name collides with an alias
    _, errors = parse_script("MATCH P p RETURN p.name AS p_seg, p.seg;")
    assert len(errors) == 1 and "duplicate RETURN output column" in errors[0].msg


def test_match_aggregate_alias_parse():
    # r11: aggregates alias too — aliases land index-aligned in
    # return_agg_aliases; a single bare aggregate WITH an alias stays
    # in return_aggs (never the legacy return_count/return_agg)
    st = one("MATCH P RETURN seg, COUNT(*) AS cnt, SUM(v) AS total;")
    assert st.return_aggs == (("COUNT", "*"), ("SUM", "v"))
    assert st.return_agg_aliases == ("cnt", "total")
    st = one("MATCH P RETURN seg, COUNT(*) AS cnt, SUM(v);")
    assert st.return_agg_aliases == ("cnt", None)
    st = one("MATCH P RETURN COUNT(*) AS total;")
    assert not st.return_count
    assert st.return_aggs == (("COUNT", "*"),)
    assert st.return_agg_aliases == ("total",)
    st = one("MATCH P RETURN SUM(v) AS s ORDER BY s DESC;")
    assert st.return_agg is None and st.return_aggs == (("SUM", "v"),)
    # unaliased single aggregates keep the legacy encoding
    st = one("MATCH P RETURN COUNT(*);")
    assert st.return_count and st.return_aggs == ()
    st = one("MATCH P RETURN SUM(v);")
    assert st.return_agg == ("SUM", "v") and st.return_aggs == ()
    # no agg aliases anywhere -> empty tuple (programmatic back-compat)
    st = one("MATCH P RETURN seg, COUNT(*), SUM(v);")
    assert st.return_agg_aliases == ()


def test_match_count_distinct_parse():
    # r11: COUNT(DISTINCT field) — DISTINCT is a soft keyword inside
    # COUNT(...) (marker only before another IDENT)
    st = one("MATCH P RETURN seg, COUNT(DISTINCT v);")
    assert st.return_aggs == (("COUNT_DISTINCT", "v"),)
    st = one("MATCH P RETURN COUNT(DISTINCT v) AS u;")
    assert st.return_aggs == (("COUNT_DISTINCT", "v"),)
    assert st.return_agg_aliases == ("u",)
    # a field literally named distinct stays reachable, bare or quoted
    st = one("MATCH P RETURN COUNT(distinct);")
    assert st.return_agg == ("COUNT", "distinct")
    st = one("MATCH P RETURN COUNT(`DISTINCT` );")
    assert st.return_agg == ("COUNT", "DISTINCT")
    # DISTINCT applies to COUNT only (SUM(DISTINCT ...) unsupported)
    _, errors = parse_script("MATCH P RETURN SUM(DISTINCT v);")
    assert errors


def test_match_optional_parse():
    # r11: OPTIONAL soft keyword marks the following element; a type
    # literally named OPTIONAL stays reachable bare at pattern end
    st = one("MATCH A a, OPTIONAL E e, B b;")
    assert [el.optional for el in st.pattern] == [False, True, False]
    assert st.pattern[1].type == "E" and st.pattern[1].alias == "e"
    st = one("MATCH OPTIONAL;")
    assert st.pattern[0].type == "OPTIONAL" and not st.pattern[0].optional
    # r12: OPTIONAL + *bounds now parses (left-outer hop composition)
    st = one("MATCH A a, OPTIONAL E*2 e, B b;")
    assert st.pattern[1].optional and st.pattern[1].min_hops == 2


def test_qualified_aggregate_args_parse():
    """r12: alias-qualified aggregate arguments — SUM(y.amount),
    COUNT(DISTINCT o.f). A QUALIFIED single bare aggregate stays in
    return_aggs (never the legacy encoding) so every pattern path
    projects its source column."""
    st = one("MATCH A a, E e, B b RETURN b.city, SUM(b.amount), COUNT(DISTINCT a.k);")
    assert st.return_fields == ("b.city",)
    assert st.return_aggs == (("SUM", "b.amount"), ("COUNT_DISTINCT", "a.k"))
    st2 = one("MATCH A a RETURN SUM(a.v);")
    assert st2.return_agg is None and st2.return_aggs == (("SUM", "a.v"),)
    st3 = one("MATCH A RETURN SUM(v);")  # unqualified keeps legacy encoding
    assert st3.return_agg == ("SUM", "v") and st3.return_aggs == ()
    # dotted default aliases are sanitized — no collision with AS form
    st4 = one("MATCH A a RETURN a.k, SUM(a.v) AS total;")
    assert st4.return_agg_aliases == ("total",)


def test_having_parse():
    """r12: HAVING soft-keyword clause — post-aggregate filter with the
    WHERE predicate grammar, between RETURN and ORDER BY."""
    st = one(
        "MATCH P RETURN city, COUNT(*) AS n "
        "HAVING n > 5 OR city: 'x' ORDER BY n DESC LIMIT 3;"
    )
    assert len(st.having) == 2
    assert st.having[0].name == "n" and st.having[0].op == ">"
    assert st.having[0].or_group == st.having[1].or_group >= 0
    assert st.order_by == (("n", True),) and st.limit == 3
    st2 = one("MATCH P RETURN COUNT(*) HAVING n_rows > 10;")
    assert st2.return_count and len(st2.having) == 1


def test_having_requires_aggregate():
    stmts, errors = parse_script("MATCH P RETURN name HAVING name: 'x';")
    assert errors and "HAVING requires an aggregate RETURN" in errors[0].msg


def test_optional_varlen_parse():
    """r12: OPTIONAL now combines with *bounds (left-outer hop
    composition); node-element OPTIONAL is still an engine error."""
    st = one("MATCH A a, OPTIONAL E*1..3 e, B b RETURN a.name;")
    assert st.pattern[1].optional
    assert st.pattern[1].min_hops == 1 and st.pattern[1].max_hops == 3
