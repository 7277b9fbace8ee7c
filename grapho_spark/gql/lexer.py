"""Hand-rolled lexer for the GQL language.

Token-compatible with the reference lexer (/root/reference/parser/
lexer.go): ``--`` line comments, ``/* */`` block comments,
single-quoted strings with ``''`` escape, backtick-quoted identifiers,
unsigned numbers ``\\d+(\\.\\d*)?``, case-insensitive keywords
(TRUE/FALSE/NULL normalized to lowercase literal text), and ILLEGAL
tokens for anything else (including unterminated strings/comments/
quoted identifiers).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass


class TokenType(enum.Enum):
    EOF = "EOF"
    ILLEGAL = "ILLEGAL"

    IDENT = "IDENT"
    NUMBER = "NUMBER"
    STRING = "STRING"
    BOOL = "BOOL"
    NULL = "NULL"

    LPAREN = "LPAREN"
    RPAREN = "RPAREN"
    LT = "LT"
    GT = "GT"
    NEQ = "NEQ"  # extension: '<>' / '!=' not-equal in WHERE
    LTE = "LTE"  # extension: '<=' in WHERE
    GTE = "GTE"  # extension: '>=' in WHERE
    COMMA = "COMMA"
    SEMI = "SEMI"
    COLON = "COLON"
    DOT = "DOT"
    STAR = "STAR"

    # keywords
    CREATE = "CREATE"
    NODE = "NODE"
    EDGE = "EDGE"
    FROM = "FROM"
    TO = "TO"
    PROPS = "PROPS"
    PRIMARY = "PRIMARY"
    KEY = "KEY"
    UNIQUE = "UNIQUE"
    NOT = "NOT"
    NULLKW = "NULLKW"
    DEFAULT = "DEFAULT"
    CHECK = "CHECK"
    ALTER = "ALTER"
    DROP = "DROP"
    ADD = "ADD"
    MODIFY = "MODIFY"
    SET = "SET"
    INDEX = "INDEX"
    ON = "ON"
    ONE = "ONE"
    MANY = "MANY"
    ARRAY = "ARRAY"
    ENUM = "ENUM"
    SHOW = "SHOW"
    DESCRIBE = "DESCRIBE"
    TYPEKW = "TYPEKW"
    DATE = "DATE"
    TIME = "TIME"
    DATETIME = "DATETIME"
    JSON = "JSON"
    BLOB = "BLOB"
    INT = "INT"
    FLOAT = "FLOAT"
    STRINGKW = "STRINGKW"
    TEXT = "TEXT"
    BOOLKW = "BOOLKW"
    UUID = "UUID"
    INSERT = "INSERT"
    UPDATE = "UPDATE"
    DELETE = "DELETE"
    MATCH = "MATCH"
    WHERE = "WHERE"
    RETURN = "RETURN"


KEYWORDS: dict[str, TokenType] = {
    "CREATE": TokenType.CREATE,
    "NODE": TokenType.NODE,
    "EDGE": TokenType.EDGE,
    "FROM": TokenType.FROM,
    "TO": TokenType.TO,
    "PROPS": TokenType.PROPS,
    "PRIMARY": TokenType.PRIMARY,
    "KEY": TokenType.KEY,
    "UNIQUE": TokenType.UNIQUE,
    "NOT": TokenType.NOT,
    "NULL": TokenType.NULLKW,
    "DEFAULT": TokenType.DEFAULT,
    "CHECK": TokenType.CHECK,
    "ALTER": TokenType.ALTER,
    "DROP": TokenType.DROP,
    "ADD": TokenType.ADD,
    "MODIFY": TokenType.MODIFY,
    "SET": TokenType.SET,
    "INDEX": TokenType.INDEX,
    "ON": TokenType.ON,
    "ONE": TokenType.ONE,
    "MANY": TokenType.MANY,
    "ARRAY": TokenType.ARRAY,
    "ENUM": TokenType.ENUM,
    "SHOW": TokenType.SHOW,
    "DESCRIBE": TokenType.DESCRIBE,
    "TYPE": TokenType.TYPEKW,
    "DATE": TokenType.DATE,
    "TIME": TokenType.TIME,
    "DATETIME": TokenType.DATETIME,
    "JSON": TokenType.JSON,
    "BLOB": TokenType.BLOB,
    "INT": TokenType.INT,
    "FLOAT": TokenType.FLOAT,
    "STRING": TokenType.STRINGKW,
    "TEXT": TokenType.TEXT,
    "BOOL": TokenType.BOOLKW,
    "UUID": TokenType.UUID,
    "TRUE": TokenType.BOOL,
    "FALSE": TokenType.BOOL,
    "INSERT": TokenType.INSERT,
    "UPDATE": TokenType.UPDATE,
    "DELETE": TokenType.DELETE,
    "MATCH": TokenType.MATCH,
    "WHERE": TokenType.WHERE,
    "RETURN": TokenType.RETURN,
}


@dataclass(frozen=True)
class Token:
    type: TokenType
    lit: str
    line: int
    col: int
    # True for backtick-quoted identifiers: quoting opts the name out
    # of every soft-keyword interpretation (DISTINCT/ORDER/LIMIT/...),
    # so fields literally named after soft keywords stay reachable.
    quoted: bool = False


def _is_ident_start(ch: str) -> bool:
    return ch.isalpha() or ch == "_"


def _is_ident_part(ch: str) -> bool:
    return ch.isalnum() or ch == "_"


class Lexer:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.line = 1
        self.col = 1

    def _peek(self, n: int = 0) -> str:
        i = self.pos + n
        return self.text[i] if i < len(self.text) else ""

    def _advance(self) -> str:
        ch = self.text[self.pos]
        self.pos += 1
        if ch == "\n":
            self.line += 1
            self.col = 1
        else:
            self.col += 1
        return ch

    def _token(self, t: TokenType, lit: str, line: int, col: int) -> Token:
        return Token(t, lit, line, col)

    def next_token(self) -> Token:
        self._skip_whitespace()
        line, col = self.line, self.col
        if self.pos >= len(self.text):
            return self._token(TokenType.EOF, "", line, col)

        ch = self._peek()
        # comments
        if ch == "-" and self._peek(1) == "-":
            while self.pos < len(self.text) and self._peek() != "\n":
                self._advance()
            return self.next_token()
        if ch == "/" and self._peek(1) == "*":
            self._advance()
            self._advance()
            while True:
                if self.pos >= len(self.text):
                    return self._token(TokenType.ILLEGAL, "unterminated block comment", line, col)
                if self._peek() == "*" and self._peek(1) == "/":
                    self._advance()
                    self._advance()
                    break
                self._advance()
            return self.next_token()

        punct = {
            "(": TokenType.LPAREN,
            ")": TokenType.RPAREN,
            "<": TokenType.LT,
            ">": TokenType.GT,
            ",": TokenType.COMMA,
            ";": TokenType.SEMI,
            ":": TokenType.COLON,
            ".": TokenType.DOT,
            "*": TokenType.STAR,
        }
        if ch in punct:
            self._advance()
            # two-char comparisons: '<>' / '<=' / '>=' (the '<' or '>'
            # was just consumed)
            if ch == "<" and self.pos < len(self.text) and self._peek() == ">":
                self._advance()
                return self._token(TokenType.NEQ, "<>", line, col)
            if ch == "<" and self.pos < len(self.text) and self._peek() == "=":
                self._advance()
                return self._token(TokenType.LTE, "<=", line, col)
            if ch == ">" and self.pos < len(self.text) and self._peek() == "=":
                self._advance()
                return self._token(TokenType.GTE, ">=", line, col)
            return self._token(punct[ch], ch, line, col)

        if ch == "!":
            self._advance()
            if self.pos < len(self.text) and self._peek() == "=":
                self._advance()
                return self._token(TokenType.NEQ, "!=", line, col)
            return self._token(
                TokenType.ILLEGAL, "unexpected character: '!' (did you mean '!=')", line, col
            )

        if ch == "`":
            return self._lex_quoted_ident(line, col)
        if ch == "'":
            return self._lex_string(line, col)
        if _is_ident_start(ch):
            return self._lex_ident_or_keyword(line, col)
        if ch.isdigit():
            return self._lex_number(line, col)

        self._advance()
        return self._token(TokenType.ILLEGAL, f"unexpected character: {ch!r}", line, col)

    def _skip_whitespace(self) -> None:
        while self.pos < len(self.text) and self._peek() in " \t\r\n":
            self._advance()

    def _lex_ident_or_keyword(self, line: int, col: int) -> Token:
        start = self.pos
        while self.pos < len(self.text) and _is_ident_part(self._peek()):
            self._advance()
        lit = self.text[start : self.pos]
        tt = KEYWORDS.get(lit.upper(), TokenType.IDENT)
        if tt is TokenType.BOOL:
            return self._token(TokenType.BOOL, lit.lower(), line, col)
        if tt is TokenType.NULLKW:
            return self._token(TokenType.NULL, lit.lower(), line, col)
        return self._token(tt, lit, line, col)

    def _lex_quoted_ident(self, line: int, col: int) -> Token:
        self._advance()  # opening backtick
        start = self.pos
        while True:
            if self.pos >= len(self.text):
                return self._token(TokenType.ILLEGAL, "unterminated quoted identifier", line, col)
            if self._peek() == "`":
                break
            self._advance()
        lit = self.text[start : self.pos]
        self._advance()  # closing backtick
        tok = self._token(TokenType.IDENT, lit, line, col)
        return Token(tok.type, tok.lit, tok.line, tok.col, quoted=True)

    def _lex_string(self, line: int, col: int) -> Token:
        self._advance()  # opening quote
        out: list[str] = []
        while True:
            if self.pos >= len(self.text):
                return self._token(TokenType.ILLEGAL, "unterminated string literal", line, col)
            if self._peek() == "'":
                if self._peek(1) == "'":  # '' escape
                    out.append("'")
                    self._advance()
                    self._advance()
                    continue
                break
            out.append(self._advance())
        self._advance()  # closing quote
        return self._token(TokenType.STRING, "".join(out), line, col)

    def _lex_number(self, line: int, col: int) -> Token:
        start = self.pos
        while self.pos < len(self.text) and self._peek().isdigit():
            self._advance()
        # `1..3` (variable-length range) must lex as NUMBER DOT DOT
        # NUMBER, so a dot only joins the number when NOT followed by
        # another dot ('1.' alone still lexes as the float '1.').
        if self._peek() == "." and self._peek(1) != ".":
            self._advance()
            while self.pos < len(self.text) and self._peek().isdigit():
                self._advance()
        return self._token(TokenType.NUMBER, self.text[start : self.pos], line, col)

    def tokens(self) -> list[Token]:
        out = []
        while True:
            t = self.next_token()
            out.append(t)
            if t.type in (TokenType.EOF,):
                return out
