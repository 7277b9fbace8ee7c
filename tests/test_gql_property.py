"""Property-based GQL front-end tests (hypothesis): the reference has
no fuzz coverage at all (SURVEY.md §5), so these pin the invariants
the hand-written tests can't sweep:

- the lexer/parser never crash on arbitrary input (errors are
  collected ParseErrors, not exceptions);
- well-formed statements round-trip: generated AST -> rendered text
  -> parse -> equal AST fields;
- string escaping ('' for ') survives arbitrary content.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from grapho_spark.gql import ast
from grapho_spark.gql.lexer import KEYWORDS
from grapho_spark.gql.parser import parse_script

# The grammar reserves keywords (case-insensitive), so generated
# identifiers must avoid them.  Derive the exclusion set from the
# lexer's own table — a hand-copied list drifted once (it omitted ON,
# so hypothesis drew the field name `on` and the parse legitimately
# failed; reference/parser/keywords.go:25 reserves ON identically).
idents = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,15}", fullmatch=True).filter(
    lambda s: s.upper() not in KEYWORDS
)

# The 46 reserved words of the reference grammar
# (reference/parser/keywords.go:5-54).  Pinned here so a lexer edit
# that adds/drops a keyword fails loudly instead of silently changing
# which programs parse.
REFERENCE_KEYWORDS = {
    "CREATE", "NODE", "EDGE", "FROM", "TO", "PROPS", "PRIMARY", "KEY",
    "UNIQUE", "NOT", "NULL", "DEFAULT", "CHECK", "ALTER", "DROP", "ADD",
    "MODIFY", "SET", "INDEX", "ON", "ONE", "MANY", "ARRAY", "ENUM",
    "SHOW", "DESCRIBE", "TYPE", "DATE", "TIME", "DATETIME", "JSON",
    "BLOB", "INT", "FLOAT", "STRING", "TEXT", "BOOL", "UUID", "TRUE",
    "FALSE", "INSERT", "UPDATE", "DELETE", "MATCH", "WHERE", "RETURN",
}


def test_keyword_table_matches_reference():
    assert set(KEYWORDS) == REFERENCE_KEYWORDS


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_parser_never_crashes(text):
    stmts, errors = parse_script(text)
    assert isinstance(stmts, list)
    assert isinstance(errors, list)


@given(idents, idents, st.text(max_size=40))
@settings(max_examples=100, deadline=None)
def test_string_literal_roundtrip(type_name, field, value):
    # '' escapes a quote inside a string literal (lexer_test.go:55-66)
    escaped = value.replace("'", "''")
    script = f"CREATE NODE {type_name} ({field}: string);" \
             f"INSERT NODE {type_name} ({field}: '{escaped}');"
    stmts, errors = parse_script(script)
    if field.lower() == type_name.lower():
        pass  # name collisions are legal; nothing special
    assert not errors, (script, errors)
    ins = stmts[1]
    assert isinstance(ins, ast.InsertNodeStmt)
    assert ins.properties[0].value.text == value


@given(idents, st.integers(min_value=0, max_value=10**12))
@settings(max_examples=100, deadline=None)
def test_number_literal_roundtrip(field, n):
    stmts, errors = parse_script(f"CREATE NODE T ({field}: int);"
                                 f"INSERT NODE T ({field}: {n});")
    assert not errors
    lit = stmts[1].properties[0].value
    assert lit.kind is ast.LiteralKind.NUMBER
    assert lit.text == str(n)  # reference stores the raw text (§1.3)


@given(st.lists(idents, min_size=1, max_size=5, unique_by=lambda s: s.lower()))
@settings(max_examples=100, deadline=None)
def test_create_node_field_list_roundtrip(fields):
    body = ", ".join(f"{f}: string" for f in fields)
    stmts, errors = parse_script(f"CREATE NODE T ({body});")
    assert not errors
    assert [f.name for f in stmts[0].fields] == fields


@given(st.text(max_size=80))
@settings(max_examples=100, deadline=None)
def test_error_recovery_resumes_at_semicolon(junk):
    # a garbage statement must not swallow the following valid one —
    # unless the junk opens an unterminated string/backtick/comment, in
    # which case the lexer (like the reference's) legitimately consumes
    # to EOF, so those characters are excluded from the property
    junk = "".join(c for c in junk if c not in ";'`" and not c.isspace())
    junk = junk.replace("--", "-").replace("/*", "/")
    script = f"%% {junk};\nCREATE NODE Ok (a: int);"
    stmts, errors = parse_script(script)
    assert errors  # the junk statement errored
    assert any(
        isinstance(s, ast.CreateNodeStmt) and s.name == "Ok" for s in stmts
    )


@given(
    st.lists(
        st.tuples(idents, st.sampled_from([":", "<", ">", "<>", "!="]),
                  st.integers(min_value=0, max_value=10**6)),
        min_size=1, max_size=4,
    )
)
@settings(max_examples=100, deadline=None)
def test_where_op_roundtrip(conds):
    # comparison extension: ':' / '<' / '>' / '<>' / '!=' all parse,
    # op preserved ('!=' normalizes to '<>')
    body = ", ".join(f"{f} {op if op != ':' else ':'} {n}" if op != ":"
                     else f"{f}: {n}" for f, op, n in conds)
    stmts, errors = parse_script(f"MATCH T WHERE {body} RETURN a;")
    assert not errors, (body, errors)
    got = [(p.name, p.op, p.value.text) for p in stmts[0].where]
    want = [
        (f, {":": "=", "!=": "<>"}.get(op, op), str(n)) for f, op, n in conds
    ]
    assert got == want


@given(st.sampled_from(["SUM", "MIN", "MAX", "AVG"]), idents)
@settings(max_examples=50, deadline=None)
def test_aggregate_return_roundtrip(func, field):
    stmts, errors = parse_script(f"MATCH T RETURN {func}({field});")
    assert not errors
    assert stmts[0].return_agg == (func, field)
    # lowercase function names parse too (keywords are soft here)
    stmts, errors = parse_script(f"MATCH T RETURN {func.lower()}({field});")
    assert not errors
    assert stmts[0].return_agg == (func, field)
