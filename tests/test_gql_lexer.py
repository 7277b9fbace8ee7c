"""Lexer tests — ported nearly 1:1 from the reference's lexer test
matrix (/root/reference/parser/lexer_test.go): golden token streams,
quote escapes, comments, backtick idents, ILLEGAL tokens."""

from __future__ import annotations

from grapho_spark.gql.lexer import Lexer, TokenType as T


def toks(text: str) -> list[tuple[T, str]]:
    return [(t.type, t.lit) for t in Lexer(text).tokens()]


def types(text: str) -> list[T]:
    return [t.type for t in Lexer(text).tokens()]


def test_create_node_stream():
    assert toks("CREATE NODE Person (name: string);") == [
        (T.CREATE, "CREATE"),
        (T.NODE, "NODE"),
        (T.IDENT, "Person"),
        (T.LPAREN, "("),
        (T.IDENT, "name"),
        (T.COLON, ":"),
        (T.STRINGKW, "string"),
        (T.RPAREN, ")"),
        (T.SEMI, ";"),
        (T.EOF, ""),
    ]


def test_keywords_case_insensitive():
    assert types("create NoDe mAtCh WHERE")[:4] == [T.CREATE, T.NODE, T.MATCH, T.WHERE]


def test_bool_null_normalized_lowercase():
    assert toks("TRUE False NULL")[:3] == [
        (T.BOOL, "true"),
        (T.BOOL, "false"),
        (T.NULL, "null"),
    ]


def test_string_with_escaped_quote():
    assert toks("'it''s'")[0] == (T.STRING, "it's")


def test_empty_string():
    assert toks("''")[0] == (T.STRING, "")


def test_numbers():
    assert toks("42 3.14 7.")[:3] == [
        (T.NUMBER, "42"),
        (T.NUMBER, "3.14"),
        (T.NUMBER, "7."),
    ]


def test_line_comment_skipped():
    assert types("CREATE -- a comment\n NODE") == [T.CREATE, T.NODE, T.EOF]


def test_block_comment_skipped():
    assert types("CREATE /* multi\nline */ NODE") == [T.CREATE, T.NODE, T.EOF]


def test_backtick_ident():
    assert toks("`weird name`")[0] == (T.IDENT, "weird name")


def test_backtick_keyword_stays_ident():
    assert toks("`CREATE`")[0] == (T.IDENT, "CREATE")


def test_illegal_unexpected_char():
    ts = types("CREATE 💥 NODE")
    assert T.ILLEGAL in ts


def test_illegal_unterminated_string():
    assert toks("'oops")[0][0] == T.ILLEGAL


def test_illegal_unterminated_block_comment():
    assert toks("/* nope")[0][0] == T.ILLEGAL


def test_illegal_unterminated_backtick():
    assert toks("`nope")[0][0] == T.ILLEGAL


def test_punctuation_and_generics():
    assert types("array<int>") == [T.ARRAY, T.LT, T.INT, T.GT, T.EOF]


def test_positions_tracked():
    lx = Lexer("CREATE\n  NODE")
    t1 = lx.next_token()
    t2 = lx.next_token()
    assert (t1.line, t1.col) == (1, 1)
    assert (t2.line, t2.col) == (2, 3)


def test_not_equal_tokens():
    assert toks("a <> 5")[:3] == [(T.IDENT, "a"), (T.NEQ, "<>"), (T.NUMBER, "5")]
    assert toks("a != 5")[1] == (T.NEQ, "!=")
    # '<' not followed by '>' stays LT (generics unchanged)
    assert types("array<int>") == [T.ARRAY, T.LT, T.INT, T.GT, T.EOF]
    # bare '!' is ILLEGAL with a hint, not a crash
    ts = toks("a ! b")
    assert ts[1][0] is T.ILLEGAL and "!=" in ts[1][1]
