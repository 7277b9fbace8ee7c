"""Recursive-descent parser for the GQL language.

Grammar-compatible with the reference parser
(/root/reference/parser/parser.go): single-token lookahead, and the
same error-recovery contract — on error, record a positioned message
and skip to the next ``;`` (parser.go:50-59), continuing with the next
statement. Additionally implements SHOW/DESCRIBE (tokens the reference
reserves but never parses — SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

from grapho_spark.gql import ast
from grapho_spark.gql.lexer import Lexer, Token, TokenType as T


@dataclass(frozen=True)
class ParseError(Exception):
    line: int
    col: int
    msg: str

    def __str__(self) -> str:
        return f"{self.line}:{self.col}: {self.msg}"


class _Recover(Exception):
    """Internal signal: error recorded, skip to next ';'."""


class Parser:
    def __init__(self, text: str):
        self._lexer = Lexer(text)
        self.errors: list[ParseError] = []
        self._peeked: Token | None = None
        self._tok = self._lexer.next_token()

    # -- token plumbing ---------------------------------------------------

    def _next(self) -> None:
        if self._peeked is not None:
            self._tok = self._peeked
            self._peeked = None
        else:
            self._tok = self._lexer.next_token()

    def _peek(self) -> Token:
        """Second token of lookahead. Used ONLY to disambiguate the
        soft keywords ORDER/LIMIT from a pattern alias in MATCH (the
        reference grammar is strictly LL(1); the extension needs LL(2)
        at exactly that position)."""
        if self._peeked is None:
            self._peeked = self._lexer.next_token()
        return self._peeked

    def _expect(self, tt: T) -> Token:
        t = self._tok
        if t.type is not tt:
            self._err(t, f"expected {tt.value}, found {t.type.value} ({t.lit!r})")
        self._next()
        return t

    def _match(self, tt: T) -> bool:
        if self._tok.type is tt:
            self._next()
            return True
        return False

    def _err(self, tok: Token, msg: str) -> None:
        self.errors.append(ParseError(tok.line, tok.col, msg))
        raise _Recover()

    def _sync_to_semi(self) -> None:
        while self._tok.type not in (T.SEMI, T.EOF):
            self._next()
        if self._tok.type is T.SEMI:
            self._next()

    # -- entry point ------------------------------------------------------

    def parse_script(self) -> tuple[list[ast.Stmt], list[ParseError]]:
        out: list[ast.Stmt] = []
        while self._tok.type is not T.EOF:
            if self._match(T.SEMI):  # stray semicolons
                continue
            try:
                st = self._parse_stmt()
            except _Recover:
                self._sync_to_semi()
                continue
            if st is not None:
                out.append(st)
                if not self._match(T.SEMI):
                    t = self._tok
                    self.errors.append(
                        ParseError(t.line, t.col, "missing ';' after statement")
                    )
                    self._sync_to_semi()
        return out, list(self.errors)

    def _parse_stmt(self) -> ast.Stmt | None:
        t = self._tok
        dispatch = {
            T.CREATE: self._parse_create,
            T.ALTER: self._parse_alter,
            T.DROP: self._parse_drop,
            T.INSERT: self._parse_insert,
            T.UPDATE: self._parse_update,
            T.DELETE: self._parse_delete,
            T.MATCH: self._parse_match,
            T.SHOW: self._parse_show,
            T.DESCRIBE: self._parse_describe,
        }
        fn = dispatch.get(t.type)
        if fn is None:
            # EXPLAIN is a SOFT keyword (not reserved in the reference
            # grammar): an IDENT spelled EXPLAIN at statement start,
            # followed by MATCH, wraps the traversal; anywhere else
            # ``explain`` remains a plain identifier.
            if t.type is T.IDENT and t.lit.upper() == "EXPLAIN":
                self._next()
                if self._tok.type is not T.MATCH:
                    self._err(
                        self._tok,
                        "EXPLAIN supports MATCH statements only",
                    )
                inner = self._parse_match()
                return ast.ExplainStmt(target=inner, line=t.line, col=t.col)
            self._err(t, f"unexpected token {t.type.value} at start of statement")
            return None
        return fn()

    # -- DDL --------------------------------------------------------------

    def _node_or_edge(self, after: str) -> bool:
        """True for NODE, False for EDGE."""
        if self._match(T.NODE):
            return True
        if self._match(T.EDGE):
            return False
        self._err(self._tok, f"expected NODE or EDGE after {after}")
        return True  # unreachable

    def _parse_create(self) -> ast.Stmt:
        t = self._tok
        self._next()
        if self._node_or_edge("CREATE"):
            return self._parse_create_node(t)
        return self._parse_create_edge(t)

    def _parse_field_list(self) -> tuple[ast.FieldDef, ...]:
        """( field_def [, field_def]* [,] ) with empty list allowed."""
        fields: list[ast.FieldDef] = []
        self._expect(T.LPAREN)
        if self._tok.type is not T.RPAREN:
            while True:
                fields.append(self._parse_field_def())
                if not self._match(T.COMMA):
                    break
                if self._tok.type is T.RPAREN:  # trailing comma
                    break
        self._expect(T.RPAREN)
        return tuple(fields)

    def _parse_create_node(self, t: Token) -> ast.CreateNodeStmt:
        name = self._expect(T.IDENT)
        fields = self._parse_field_list()
        return ast.CreateNodeStmt(name=name.lit, fields=fields, line=t.line, col=t.col)

    def _parse_create_edge(self, t: Token) -> ast.CreateEdgeStmt:
        name = self._expect(T.IDENT)
        self._expect(T.LPAREN)
        self._expect(T.FROM)
        from_ep = self._parse_endpoint()
        self._expect(T.COMMA)
        self._expect(T.TO)
        to_ep = self._parse_endpoint()
        props: tuple[ast.FieldDef, ...] = ()
        if self._match(T.COMMA):
            self._expect(T.PROPS)
            props = self._parse_field_list()
        self._expect(T.RPAREN)
        return ast.CreateEdgeStmt(
            name=name.lit, from_ep=from_ep, to_ep=to_ep, props=props, line=t.line, col=t.col
        )

    def _parse_endpoint(self) -> ast.Endpoint:
        label = self._expect(T.IDENT)
        card = ast.Cardinality.ONE
        if self._match(T.ONE):
            card = ast.Cardinality.ONE
        elif self._match(T.MANY):
            card = ast.Cardinality.MANY
        return ast.Endpoint(label=label.lit, card=card)

    def _parse_field_def(self) -> ast.FieldDef:
        ident = self._expect(T.IDENT)
        self._expect(T.COLON)
        ts = self._parse_type_spec()
        primary = unique = not_null = False
        default: ast.Literal | None = None
        while True:
            if self._match(T.PRIMARY):
                self._expect(T.KEY)
                primary = True
            elif self._match(T.UNIQUE):
                unique = True
            elif self._match(T.NOT):
                self._expect(T.NULL)
                not_null = True
            elif self._match(T.DEFAULT):
                default = self._parse_literal()
            else:
                break
        return ast.FieldDef(
            name=ident.lit,
            type=ts,
            primary_key=primary,
            unique=unique,
            not_null=not_null,
            default=default,
            line=ident.line,
            col=ident.col,
        )

    _SIMPLE_TYPES = {
        T.STRINGKW: ast.BaseType.STRING,
        T.TEXT: ast.BaseType.TEXT,
        T.INT: ast.BaseType.INT,
        T.FLOAT: ast.BaseType.FLOAT,
        T.BOOLKW: ast.BaseType.BOOL,
        T.UUID: ast.BaseType.UUID,
        T.DATE: ast.BaseType.DATE,
        T.TIME: ast.BaseType.TIME,
        T.DATETIME: ast.BaseType.DATETIME,
        T.JSON: ast.BaseType.JSON,
        T.BLOB: ast.BaseType.BLOB,
    }

    def _parse_type_spec(self, depth: int = 0) -> ast.TypeSpec:
        t = self._tok
        if depth > 32:
            # grammar allows unbounded array<array<...>> recursion; an
            # adversarial ~3000-deep literal otherwise escapes as a
            # RecursionError that kills the server session instead of
            # a positioned parse error (wire-handler fuzz coverage)
            self._err(t, "type nesting too deep (max 32)")
        if t.type in self._SIMPLE_TYPES:
            self._next()
            return ast.TypeSpec(base=self._SIMPLE_TYPES[t.type])
        if t.type is T.ARRAY:
            self._next()
            self._expect(T.LT)
            elem = self._parse_type_spec(depth + 1)
            self._expect(T.GT)
            return ast.TypeSpec(elem=elem)
        if t.type is T.ENUM:
            self._next()
            self._expect(T.LT)
            vals = [self._expect(T.STRING).lit]
            while self._match(T.COMMA):
                vals.append(self._expect(T.STRING).lit)
            self._expect(T.GT)
            return ast.TypeSpec(enum_vals=tuple(vals))
        self._err(t, f"expected type, found {t.type.value}")
        return ast.TypeSpec()  # unreachable

    def _parse_literal(self) -> ast.Literal:
        t = self._tok
        if t.type is T.STRING:
            self._next()
            return ast.Literal(ast.LiteralKind.STRING, t.lit, t.line, t.col)
        if t.type is T.NUMBER:
            self._next()
            return ast.Literal(ast.LiteralKind.NUMBER, t.lit, t.line, t.col)
        if t.type is T.BOOL:
            self._next()
            return ast.Literal(ast.LiteralKind.BOOL, t.lit, t.line, t.col)
        if t.type is T.NULL:
            self._next()
            return ast.Literal(ast.LiteralKind.NULL, "null", t.line, t.col)
        self._err(t, f"expected literal, found {t.type.value}")
        raise AssertionError  # unreachable

    # -- ALTER ------------------------------------------------------------

    def _parse_alter(self) -> ast.Stmt:
        t = self._tok
        self._next()
        if self._node_or_edge("ALTER"):
            return self._parse_alter_node(t)
        return self._parse_alter_edge(t)

    def _parse_alter_node(self, t: Token) -> ast.AlterNodeStmt:
        name = self._expect(T.IDENT)
        if self._match(T.ADD):
            fd = self._parse_field_def()
            return ast.AlterNodeStmt(
                name.lit, ast.AlterAction.ADD_FIELD, field=fd, line=t.line, col=t.col
            )
        if self._match(T.DROP):
            f = self._expect(T.IDENT)
            return ast.AlterNodeStmt(
                name.lit, ast.AlterAction.DROP_FIELD, field_name=f.lit, line=t.line, col=t.col
            )
        if self._match(T.MODIFY):
            fd = self._parse_field_def()
            return ast.AlterNodeStmt(
                name.lit, ast.AlterAction.MODIFY_FIELD, field=fd, line=t.line, col=t.col
            )
        if self._match(T.SET):
            self._expect(T.PRIMARY)
            self._expect(T.KEY)
            self._expect(T.LPAREN)
            pk = [self._expect(T.IDENT).lit]
            while self._match(T.COMMA):
                pk.append(self._expect(T.IDENT).lit)
            self._expect(T.RPAREN)
            return ast.AlterNodeStmt(
                name.lit,
                ast.AlterAction.SET_PRIMARY_KEY,
                pk_fields=tuple(pk),
                line=t.line,
                col=t.col,
            )
        self._err(self._tok, "expected ADD, DROP, MODIFY, or SET after ALTER NODE")
        raise AssertionError

    def _parse_alter_edge(self, t: Token) -> ast.AlterEdgeStmt:
        name = self._expect(T.IDENT)
        if self._match(T.ADD):
            fd = self._parse_field_def()
            return ast.AlterEdgeStmt(
                name.lit, ast.AlterAction.ADD_PROP, prop=fd, line=t.line, col=t.col
            )
        if self._match(T.DROP):
            f = self._expect(T.IDENT)
            return ast.AlterEdgeStmt(
                name.lit, ast.AlterAction.DROP_PROP, prop_name=f.lit, line=t.line, col=t.col
            )
        if self._match(T.MODIFY):
            fd = self._parse_field_def()
            return ast.AlterEdgeStmt(
                name.lit, ast.AlterAction.MODIFY_PROP, prop=fd, line=t.line, col=t.col
            )
        if self._match(T.SET):
            self._expect(T.FROM)
            from_ep = self._parse_endpoint()
            self._expect(T.TO)
            to_ep = self._parse_endpoint()
            return ast.AlterEdgeStmt(
                name.lit,
                ast.AlterAction.SET_ENDPOINTS,
                from_ep=from_ep,
                to_ep=to_ep,
                line=t.line,
                col=t.col,
            )
        self._err(self._tok, "expected ADD, DROP, MODIFY, or SET after ALTER EDGE")
        raise AssertionError

    # -- DROP -------------------------------------------------------------

    def _parse_drop(self) -> ast.Stmt:
        t = self._tok
        self._next()
        if self._node_or_edge("DROP"):
            name = self._expect(T.IDENT)
            return ast.DropNodeStmt(name.lit, line=t.line, col=t.col)
        name = self._expect(T.IDENT)
        return ast.DropEdgeStmt(name.lit, line=t.line, col=t.col)

    # -- DML --------------------------------------------------------------

    def _parse_property_list(
        self, qualified: bool = False, allow_cmp: bool = False
    ) -> tuple[ast.Property, ...]:
        """``qualified=True`` (MATCH WHERE only) additionally accepts
        alias-qualified keys — ``a.name: 'x'`` — stored with the dot in
        the property name; the engine resolves the alias.
        ``allow_cmp=True`` (WHERE clauses only) additionally accepts
        ``name < literal`` / ``name > literal`` / ``name <> literal``
        comparisons, ``name IN (lit, ...)`` membership lists, and
        ``pred OR pred`` disjunctions between comma-separated
        conjuncts, ``NOT term`` negation, and ``( ... )`` grouping of
        a full nested predicate list (extensions — the reference
        grammar has only ``name: value`` equality conjunction,
        parser.go:741-778). OR binds tighter than the comma
        (``a: 1 OR b: 2, c: 3`` is ``(a=1 OR b=2) AND c=3``) and NOT
        binds tighter than OR (``NOT a: 1 OR b: 2`` is
        ``(NOT a=1) OR b=2``); parentheses override both. OR and IN
        are soft keywords — a field literally named ``or``/``in``
        still parses at predicate start and backtick-quoting opts out
        everywhere; NOT is reserved in the reference lexer already
        (NOT NULL), so a field named ``not`` needs backticks like any
        reserved word."""
        props: list[ast.Property | ast.PredGroup] = []
        gid = 0
        while True:
            group = [self._parse_one_term(qualified, allow_cmp)]
            while (
                allow_cmp
                and self._tok.type is T.IDENT
                and not self._tok.quoted
                and self._tok.lit.upper() == "OR"
            ):
                self._next()
                group.append(self._parse_one_term(qualified, allow_cmp))
            if len(group) > 1:
                group = [dataclasses.replace(p, or_group=gid) for p in group]
                gid += 1
            props.extend(group)
            if not self._match(T.COMMA):
                break
        return tuple(props)

    def _parse_one_term(
        self, qualified: bool, allow_cmp: bool
    ) -> "ast.Property | ast.PredGroup":
        """One disjunction member: ``[NOT] predicate`` or ``[NOT]
        ( nested-where )`` (cmp contexts only; plain property lists
        keep the reference grammar)."""
        negated = False
        while allow_cmp and self._tok.type is T.NOT:
            # NOT is already reserved in the reference lexer (NOT NULL,
            # token.go) — no soft-keyword dance needed; a field named
            # ``not`` requires backticks everywhere, as with any
            # reserved word
            self._next()
            negated = not negated
        if allow_cmp and self._tok.type is T.LPAREN:
            t = self._tok
            self._next()
            items = self._parse_property_list(qualified, allow_cmp)
            self._expect(T.RPAREN)
            return ast.PredGroup(
                items, negated=negated, line=t.line, col=t.col
            )
        p = self._parse_one_predicate(qualified, allow_cmp)
        return dataclasses.replace(p, negated=True) if negated else p

    def _parse_one_predicate(
        self, qualified: bool, allow_cmp: bool
    ) -> ast.Property:
        name = self._expect(T.IDENT)
        full = name.lit
        if qualified and self._match(T.DOT):
            full = f"{full}.{self._expect(T.IDENT).lit}"
        if allow_cmp and self._tok.type in (T.LT, T.GT, T.LTE, T.GTE, T.NEQ):
            op = {
                T.LT: "<",
                T.GT: ">",
                T.LTE: "<=",
                T.GTE: ">=",
                T.NEQ: "<>",
            }[self._tok.type]
            self._next()
            return ast.Property(
                full, self._parse_literal(), name.line, name.col, op=op
            )
        if (
            allow_cmp
            and self._tok.type is T.IDENT
            and not self._tok.quoted
            and self._tok.lit.upper() == "IN"
            and self._peek().type is T.LPAREN
        ):
            self._next()  # IN
            self._next()  # (
            vals = [self._parse_literal()]
            while self._match(T.COMMA):
                vals.append(self._parse_literal())
            self._expect(T.RPAREN)
            return ast.Property(
                full,
                vals[0],
                name.line,
                name.col,
                op="in",
                in_values=tuple(vals),
            )
        self._expect(T.COLON)
        return ast.Property(full, self._parse_literal(), name.line, name.col)

    def _parse_node_ref(self) -> ast.NodeRef:
        t = self._tok
        node_type = self._expect(T.IDENT).lit
        id_lit: ast.Literal | None = None
        props: tuple[ast.Property, ...] = ()
        if self._match(T.LPAREN):
            if self._tok.type in (T.NUMBER, T.STRING):
                id_lit = self._parse_literal()
            else:
                props = self._parse_property_list()
            self._expect(T.RPAREN)
        return ast.NodeRef(node_type, id=id_lit, properties=props, line=t.line, col=t.col)

    def _parse_insert(self) -> ast.Stmt:
        t = self._tok
        self._next()
        if self._node_or_edge("INSERT"):
            node_type = self._expect(T.IDENT).lit
            props: tuple[ast.Property, ...] = ()
            if self._match(T.LPAREN):
                props = self._parse_property_list()
                self._expect(T.RPAREN)
            return ast.InsertNodeStmt(node_type, props, line=t.line, col=t.col)
        edge_type = self._expect(T.IDENT).lit
        self._expect(T.FROM)
        from_ref = self._parse_node_ref()
        self._expect(T.TO)
        to_ref = self._parse_node_ref()
        props = ()
        if self._match(T.LPAREN):
            props = self._parse_property_list()
            self._expect(T.RPAREN)
        return ast.InsertEdgeStmt(
            edge_type, from_ref, to_ref, props, line=t.line, col=t.col
        )

    def _parse_endpoint_refs(
        self, is_node: bool
    ) -> tuple[ast.NodeRef | None, ast.NodeRef | None]:
        """Optional ``FROM <ref> TO <ref>`` endpoint qualification on
        edge UPDATE/DELETE (extension; INSERT EDGE's ref grammar
        reused). Bare refs (no parens) mean "any node of that type"."""
        if is_node or not self._match(T.FROM):
            return None, None
        from_ref = self._parse_node_ref()
        self._expect(T.TO)
        return from_ref, self._parse_node_ref()

    def _parse_update(self) -> ast.Stmt:
        t = self._tok
        self._next()
        is_node = self._node_or_edge("UPDATE")
        type_name = self._expect(T.IDENT).lit
        from_ref, to_ref = self._parse_endpoint_refs(is_node)
        self._expect(T.SET)
        set_props = self._parse_property_list()
        where: tuple[ast.Property, ...] = ()
        if self._match(T.WHERE):
            where = self._parse_property_list(allow_cmp=True)
        if is_node:
            return ast.UpdateNodeStmt(
                type_name, set=set_props, where=where, line=t.line, col=t.col
            )
        return ast.UpdateEdgeStmt(
            type_name,
            set=set_props,
            where=where,
            from_node=from_ref,
            to_node=to_ref,
            line=t.line,
            col=t.col,
        )

    def _parse_delete(self) -> ast.Stmt:
        t = self._tok
        self._next()
        is_node = self._node_or_edge("DELETE")
        type_name = self._expect(T.IDENT).lit
        from_ref, to_ref = self._parse_endpoint_refs(is_node)
        where: tuple[ast.Property, ...] = ()
        if from_ref is not None:
            # endpoint refs satisfy the mandatory-predicate rule
            if self._match(T.WHERE):
                where = self._parse_property_list(allow_cmp=True)
        else:
            self._expect(T.WHERE)  # WHERE is mandatory for DELETE
            where = self._parse_property_list(allow_cmp=True)
        if is_node:
            return ast.DeleteNodeStmt(type_name, where=where, line=t.line, col=t.col)
        return ast.DeleteEdgeStmt(
            type_name,
            where=where,
            from_node=from_ref,
            to_node=to_ref,
            line=t.line,
            col=t.col,
        )

    def _parse_match(self) -> ast.MatchStmt:
        t = self._tok
        self._next()
        pattern: list[ast.MatchElement] = []
        while self._tok.type is T.IDENT:
            # OPTIONAL extension (r11, soft keyword): ``MATCH A a,
            # OPTIONAL E e, B b`` marks the edge element (and
            # everything after it) left-outer — rows of the left
            # prefix survive with NULL-padded fields when no edge
            # matches. Marker only when followed by another IDENT (the
            # element type), so a type literally named OPTIONAL stays
            # reachable bare at the end of a pattern or backtick-quoted
            # anywhere.
            optional = False
            if (
                self._tok.lit.upper() == "OPTIONAL"
                and not self._tok.quoted
                and self._peek().type is T.IDENT
            ):
                optional = True
                self._next()
            el_tok = self._tok
            el_type = el_tok.lit
            self._next()
            # Variable-length extension (edge elements): TYPE* (1..3),
            # TYPE*n (exactly n), TYPE*lo..hi. Bounds capped at 10 so a
            # typo cannot request an unbounded chain-join union.
            min_hops = max_hops = 1
            if self._match(T.STAR):
                min_hops, max_hops = 1, 3
                if self._tok.type is T.NUMBER:
                    lo_tok = self._tok
                    self._next()
                    lo = int(lo_tok.lit)
                    if self._tok.type is T.DOT:
                        self._expect(T.DOT)
                        self._expect(T.DOT)
                        hi_tok = self._expect(T.NUMBER)
                        min_hops, max_hops = lo, int(hi_tok.lit)
                    else:
                        min_hops = max_hops = lo
                if not (1 <= min_hops <= max_hops <= 10):
                    self._err(
                        el_tok,
                        f"variable-length bounds must satisfy "
                        f"1 <= lo <= hi <= 10, got {min_hops}..{max_hops}",
                    )
            alias = ""
            if self._tok.type is T.IDENT and not self._at_soft_clause():
                alias = self._tok.lit
                self._next()
            # r12: OPTIONAL + *bounds is legal — left-outer hop
            # composition (rows with no reachable endpoint NULL-pad).
            # r13: OPTIONAL on a chain's endpoint NODE elements is
            # legal too (left-outer on the final hop's dst / right-
            # outer on the leading src); the engine still rejects it
            # on interior nodes and node-only patterns, where it has
            # nothing to be optional relative to.
            pattern.append(
                ast.MatchElement(
                    el_type,
                    alias,
                    is_edge=False,
                    min_hops=min_hops,
                    max_hops=max_hops,
                    line=el_tok.line,
                    col=el_tok.col,
                    optional=optional,
                )
            )
            if not self._match(T.COMMA):
                break
        # AS OF extension (soft keywords): read the pattern at a past
        # flushed version — ``MATCH Person AS OF 2 WHERE ...`` compiles
        # to the engine's node_df_at time travel. ``AS`` only acts as
        # a marker when followed by ``OF`` (LL(2)), so aliases/fields
        # literally named ``as`` stay legal.
        as_of: int | None = None
        if (
            self._tok.type is T.IDENT
            and not self._tok.quoted
            and self._tok.lit.upper() == "AS"
            and self._peek().type is T.IDENT
            and self._peek().lit.upper() == "OF"
        ):
            self._next()  # AS
            self._next()  # OF
            v_tok = self._expect(T.NUMBER)
            try:
                as_of = int(v_tok.lit)
            except ValueError:
                self._err(
                    v_tok, f"AS OF expects an integer version, got {v_tok.lit!r}"
                )
        where: tuple[ast.Property, ...] = ()
        if self._match(T.WHERE):
            where = self._parse_property_list(qualified=True, allow_cmp=True)
        returns: list[str] = []
        return_count = False
        return_agg: tuple[str, str] | None = None
        return_distinct = False
        if self._match(T.RETURN):
            # RETURN DISTINCT extension (soft keyword): a marker only
            # when followed by another IDENT that can't start an
            # ORDER BY / LIMIT clause, so ``RETURN distinct`` still
            # returns a field literally named distinct. A backtick-
            # quoted follower is never a clause starter, so fields
            # literally named order/limit stay reachable under
            # DISTINCT as ``RETURN DISTINCT `order```; a quoted
            # ``distinct`` itself is always a plain field.
            if (
                self._tok.type is T.IDENT
                and self._tok.lit.upper() == "DISTINCT"
                and not self._tok.quoted
                and self._peek().type is T.IDENT
                and (
                    self._peek().quoted
                    or self._peek().lit.upper() not in ("ORDER", "LIMIT")
                )
            ):
                return_distinct = True
                self._next()
            # RETURN item list: each item is a field name or an
            # <agg>(...) aggregate (the parenthesized form keeps
            # count/sum/... legal field names — a field reference is
            # never followed by LPAREN). Mixing fields and aggregates
            # is the grouped-aggregate extension: fields become group
            # keys. A single bare aggregate keeps the legacy
            # return_count/return_agg encoding.
            aggs: list[tuple[str, str]] = []
            agg_aliases: list[str | None] = []
            ret_aliases: list[str | None] = []
            while True:
                item = self._expect(T.IDENT)
                up = item.lit.upper()
                if (
                    up in ("COUNT", "SUM", "MIN", "MAX", "AVG")
                    and self._tok.type is T.LPAREN
                ):
                    self._next()
                    if up == "COUNT" and self._tok.type is T.STAR:
                        self._next()
                        aggs.append(("COUNT", "*"))
                    elif (
                        up == "COUNT"
                        and self._tok.type is T.IDENT
                        and self._tok.lit.upper() == "DISTINCT"
                        and not self._tok.quoted
                        and self._peek().type is T.IDENT
                    ):
                        # r11: COUNT(DISTINCT field) — distinct non-null
                        # count. DISTINCT is a soft keyword here (marker
                        # only before another IDENT, so a field
                        # literally named distinct stays reachable as
                        # COUNT(distinct); quoted `distinct` is always
                        # a plain field). DISTINCT * is not a thing.
                        self._next()
                        aggs.append(("COUNT_DISTINCT", self._agg_arg()))
                    else:
                        # COUNT(field) counts NON-NULL values (SQL
                        # semantics), aliased count_<field> vs
                        # COUNT(*)'s n_rows
                        aggs.append((up, self._agg_arg()))
                    self._expect(T.RPAREN)
                    if return_distinct:
                        self._err(
                            item,
                            "DISTINCT cannot be combined with an aggregate RETURN",
                        )
                    # r11: aggregate output aliasing — ``COUNT(*) AS
                    # total`` renames the aggregate's output column
                    # (default: the deterministic <func>_<field> /
                    # n_rows name). Same soft-keyword rule as field
                    # aliases.
                    if self._at_return_as():
                        self._next()  # AS
                        agg_aliases.append(self._expect(T.IDENT).lit)
                    else:
                        agg_aliases.append(None)
                else:
                    # r10: alias-qualified RETURN field (``RETURN
                    # x.name``) — the projection twin of the r9
                    # alias-qualified WHERE key; resolves to exactly
                    # its pattern element (output column ``x_name``)
                    name = item.lit
                    if self._match(T.DOT):
                        name = f"{name}.{self._expect(T.IDENT).lit}"
                    # r11: RETURN output aliasing — ``field AS owner``
                    # renames the OUTPUT column (soft keyword, LL(2):
                    # ``AS`` is a marker only when followed by an
                    # IDENT; a quoted ``as`` is always a plain field).
                    # AS OF never appears after RETURN, so there is no
                    # clash with the time-travel marker.
                    out_alias: str | None = None
                    if self._at_return_as():
                        self._next()  # AS
                        out_alias = self._expect(T.IDENT).lit
                    returns.append(name)
                    ret_aliases.append(out_alias)
                if not self._match(T.COMMA):
                    break
            if (
                len(aggs) == 1
                and not returns
                and agg_aliases[0] is None
                and "." not in aggs[0][1]
            ):
                # legacy single-bare-aggregate encoding; an ALIASED or
                # QUALIFIED (x.field) single aggregate stays in
                # return_aggs (the grouped path with zero keys is the
                # same global-row plan, carries the alias, and projects
                # the qualified source column on every pattern path)
                func, fname = aggs[0]
                if func == "COUNT" and fname == "*":
                    return_count = True
                else:
                    return_agg = (func, fname)
                aggs = []
                agg_aliases = []
            # Effective OUTPUT names of the field items (user AS alias,
            # else the qualified <alias>_<field> rename, else the bare
            # field) — collisions among them, or with a generated
            # aggregate alias, would emit duplicate output columns and
            # die later as an ambiguous-reference AnalysisException;
            # reject at parse time instead. (Unqualified fields in a
            # CHAIN pattern get an owner prefix only the engine knows —
            # this check covers every name the parser can see.)
            out_names: list[str] = [
                al or nm.replace(".", "_")
                for nm, al in zip(returns, ret_aliases)
            ]
            seen_out: set[str] = set()
            for nm, on in zip(returns, out_names):
                if on in seen_out:
                    self._err(
                        t,
                        f"duplicate RETURN output column {on!r} "
                        f"(from item {nm!r}) — use AS to disambiguate",
                    )
                seen_out.add(on)
            seen_aliases = set()
            for (func, fname), user_al in zip(aggs, agg_aliases):
                alias = user_al or (
                    "n_rows"
                    if func == "COUNT" and fname == "*"
                    # qualified arg: sum_y_amount (dots can't live in
                    # an output column name)
                    else f"{func.lower()}_{fname.replace('.', '_')}"
                )
                if alias in seen_aliases:
                    self._err(
                        t,
                        f"duplicate aggregate output column {alias!r} in "
                        f"RETURN — use AS to disambiguate",
                    )
                if alias in seen_out:
                    self._err(
                        t,
                        f"RETURN field output {alias!r} collides with the "
                        f"{func}({fname}) aggregate's output column",
                    )
                seen_aliases.add(alias)
            return_aggs = tuple(aggs)
            return_aliases = (
                tuple(ret_aliases) if any(a is not None for a in ret_aliases) else ()
            )
            return_agg_aliases = (
                tuple(agg_aliases)
                if any(a is not None for a in agg_aliases)
                else ()
            )
        else:
            return_aggs = ()
            return_aliases = ()
            return_agg_aliases = ()
        # HAVING extension (r12, soft keyword): post-aggregate filter,
        # same predicate grammar as WHERE. Sits between RETURN and
        # ORDER BY/LIMIT, SQL clause order. A marker only when
        # unquoted — a field literally named ``having`` is unreachable
        # HERE (it would be a RETURN item), so no LL(2) dance needed.
        having: tuple = ()
        if (
            self._tok.type is T.IDENT
            and not self._tok.quoted
            and self._tok.lit.upper() == "HAVING"
        ):
            h_tok = self._tok
            self._next()
            if not (return_count or return_agg or return_aggs):
                self._err(
                    h_tok,
                    "HAVING requires an aggregate RETURN "
                    "(group keys + COUNT/SUM/MIN/MAX/AVG)",
                )
            having = self._parse_property_list(qualified=True, allow_cmp=True)
        order_by, limit, offset = self._parse_order_limit()
        if (return_count or return_agg) and order_by:
            self._err(t, "ORDER BY is meaningless with an aggregate RETURN")
        return ast.MatchStmt(
            tuple(pattern),
            where,
            tuple(returns),
            line=t.line,
            col=t.col,
            order_by=order_by,
            limit=limit,
            offset=offset,
            return_count=return_count,
            return_agg=return_agg,
            return_aggs=return_aggs,
            return_distinct=return_distinct,
            as_of=as_of,
            return_aliases=return_aliases,
            return_agg_aliases=return_agg_aliases,
            having=having,
        )

    def _agg_arg(self) -> str:
        """Aggregate argument: a field name, optionally alias-QUALIFIED
        (``SUM(y.amount)``, ``COUNT(DISTINCT o.status)`` — r12). The
        dotted form resolves exactly like a qualified RETURN field
        (its element's ``<alias>_<field>`` output column), so chain /
        var-length aggregates can target any pattern element, not just
        the first declarer of an unqualified name."""
        name = self._expect(T.IDENT).lit
        if self._match(T.DOT):
            name = f"{name}.{self._expect(T.IDENT).lit}"
        return name

    def _at_return_as(self) -> bool:
        """True when the current token is the RETURN-item ``AS`` output
        alias marker (r11): an unquoted ``AS`` followed by an IDENT.
        AS OF never appears after RETURN (it sits between the pattern
        and WHERE), so inside the RETURN item list AS+IDENT is always
        an alias; a backtick-quoted ``as`` is never a marker."""
        return (
            self._tok.type is T.IDENT
            and not self._tok.quoted
            and self._tok.lit.upper() == "AS"
            and self._peek().type is T.IDENT
        )

    def _at_soft_clause(self) -> bool:
        """True when the current IDENT begins an ORDER BY / LIMIT
        clause rather than naming an alias/field (soft keywords: the
        reference reserves neither, parser/keywords.go:5-54)."""
        if self._tok.type is not T.IDENT or self._tok.quoted:
            return False
        up = self._tok.lit.upper()
        if up == "ORDER":
            nxt = self._peek()
            return nxt.type is T.IDENT and nxt.lit.upper() == "BY"
        if up == "LIMIT":
            return self._peek().type is T.NUMBER
        if up == "AS":
            nxt = self._peek()
            return nxt.type is T.IDENT and nxt.lit.upper() == "OF"
        return False

    def _parse_order_limit(
        self,
    ) -> tuple[tuple[tuple[str, bool], ...], int | None, int | None]:
        """MATCH extension: ``[ORDER BY field [ASC|DESC], ...]
        [LIMIT n [OFFSET m]]``. Results stay deterministic regardless —
        the engine appends its _id tiebreak after the user keys, which
        also makes OFFSET paging stable (no overlaps/gaps)."""
        order_by: list[tuple[str, bool]] = []
        if self._at_soft_clause() and self._tok.lit.upper() == "ORDER":
            self._next()  # ORDER
            self._next()  # BY (validated by _at_soft_clause)
            while True:
                fld = self._expect(T.IDENT)
                fname = fld.lit
                if self._match(T.DOT):  # alias-qualified sort key (r10)
                    fname = f"{fname}.{self._expect(T.IDENT).lit}"
                desc = False
                if self._tok.type is T.IDENT and self._tok.lit.upper() in (
                    "ASC",
                    "DESC",
                ):
                    desc = self._tok.lit.upper() == "DESC"
                    self._next()
                order_by.append((fname, desc))
                if not self._match(T.COMMA):
                    break
        limit: int | None = None
        if self._at_soft_clause() and self._tok.lit.upper() == "LIMIT":
            lim_kw = self._tok
            self._next()  # LIMIT
            n_tok = self._expect(T.NUMBER)
            try:
                limit = int(n_tok.lit)
            except ValueError:
                self._err(n_tok, f"LIMIT must be an integer, got {n_tok.lit!r}")
            if limit is not None and limit < 1:
                self._err(lim_kw, f"LIMIT must be >= 1, got {limit}")
            if limit is not None and limit > 2**31 - 1:
                # Dataset.limit takes a JVM int; a larger literal would
                # escape as a py4j overflow instead of a parse error
                self._err(lim_kw, f"LIMIT must be <= {2**31 - 1}, got {limit}")
        offset: int | None = None
        if (
            limit is not None
            and self._tok.type is T.IDENT
            and not self._tok.quoted
            and self._tok.lit.upper() == "OFFSET"
            and self._peek().type is T.NUMBER
        ):
            # paging extension: OFFSET is a soft keyword valid only
            # after LIMIT (the deterministic _id tiebreak makes the
            # skipped prefix stable, so pages never overlap or gap)
            off_kw = self._tok
            self._next()  # OFFSET
            n_tok = self._expect(T.NUMBER)
            try:
                offset = int(n_tok.lit)
            except ValueError:
                self._err(n_tok, f"OFFSET must be an integer, got {n_tok.lit!r}")
            if offset is not None and offset < 0:
                self._err(off_kw, f"OFFSET must be >= 0, got {offset}")
            if offset is not None and offset > 2**31 - 1:
                self._err(
                    off_kw, f"OFFSET must be <= {2**31 - 1}, got {offset}"
                )
        return tuple(order_by), limit, offset

    # -- SHOW / DESCRIBE (extension; reserved tokens in the reference) ----

    def _parse_show(self) -> ast.ShowStmt:
        t = self._tok
        self._next()
        kw = self._expect(T.IDENT)
        kind = kw.lit.upper()
        if kind == "VERSIONS":
            # SHOW VERSIONS <type> — time-travel introspection: one row
            # per flushed copy-on-write version of the named type.
            name = self._expect(T.IDENT)
            return ast.ShowStmt(kind, target=name.lit, line=t.line, col=t.col)
        if kind not in ("NODES", "EDGES"):
            self._err(kw, "expected NODES, EDGES or VERSIONS after SHOW")
        return ast.ShowStmt(kind, line=t.line, col=t.col)

    def _parse_describe(self) -> ast.DescribeStmt:
        t = self._tok
        self._next()
        is_node = self._node_or_edge("DESCRIBE")
        name = self._expect(T.IDENT)
        return ast.DescribeStmt("NODE" if is_node else "EDGE", name.lit, line=t.line, col=t.col)


def parse_script(text: str) -> tuple[list[ast.Stmt], list[ParseError]]:
    return Parser(text).parse_script()
