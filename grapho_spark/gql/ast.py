"""AST for the GQL statement language.

Node kinds and fields mirror the reference grammar
(/root/reference/parser/ast.go) so statement semantics carry over 1:1;
the representation (frozen dataclasses, enums) is our own.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class BaseType(enum.Enum):
    STRING = "string"
    TEXT = "text"
    INT = "int"
    FLOAT = "float"
    BOOL = "bool"
    UUID = "uuid"
    DATE = "date"
    TIME = "time"
    DATETIME = "datetime"
    JSON = "json"
    BLOB = "blob"


@dataclass(frozen=True)
class TypeSpec:
    """A declared field type. ``elem`` is set for ``array<...>`` (the
    base is then irrelevant, matching reference parser/ast.go:24-28);
    ``enum_vals`` is set for ``enum<'a','b'>``."""

    base: BaseType = BaseType.STRING
    elem: TypeSpec | None = None
    enum_vals: tuple[str, ...] = ()

    @property
    def is_array(self) -> bool:
        return self.elem is not None

    @property
    def is_enum(self) -> bool:
        return bool(self.enum_vals)

    def render(self) -> str:
        if self.elem is not None:
            return f"array<{self.elem.render()}>"
        if self.enum_vals:
            return "enum<" + ", ".join(f"'{v}'" for v in self.enum_vals) + ">"
        return self.base.value


class LiteralKind(enum.Enum):
    STRING = "string"
    NUMBER = "number"
    BOOL = "bool"
    NULL = "null"


@dataclass(frozen=True)
class Literal:
    kind: LiteralKind
    text: str  # raw text; strings already unescaped
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class FieldDef:
    name: str
    type: TypeSpec
    primary_key: bool = False
    unique: bool = False
    not_null: bool = False
    default: Literal | None = None
    line: int = 0
    col: int = 0


class Cardinality(enum.Enum):
    ONE = "ONE"
    MANY = "MANY"


@dataclass(frozen=True)
class Endpoint:
    label: str
    card: Cardinality = Cardinality.ONE


@dataclass(frozen=True)
class Property:
    name: str
    value: Literal
    line: int = 0
    col: int = 0
    #: comparison operator — "=" (the reference's only one), or
    #: "<"/">"/"<>"/"in" in WHERE clauses (engine-side extensions; the
    #: lexer already had LT/GT for generic type params, reference
    #: parser/token.go:70-71)
    op: str = "="
    #: literal list for ``op == "in"`` (``field IN (v1, v2, ...)``);
    #: ``value`` then holds the first element and is otherwise unused
    in_values: tuple[Literal, ...] = ()
    #: disjunction group (WHERE extension): properties sharing an
    #: or_group >= 0 are OR'd together before the groups are AND'd
    #: (the reference's comma conjunction); -1 = plain conjunct
    or_group: int = -1
    #: NOT prefix (WHERE extension): negate this member. Every leaf
    #: predicate compiles TOTAL (never NULL), so negation is total
    #: too — ``NOT a: 5`` matches rows where a is null or != 5
    #: (negation of null-safe equality), never a third value.
    negated: bool = False


@dataclass(frozen=True)
class PredGroup:
    """Parenthesized WHERE sub-expression (extension — the reference
    grammar has only the flat comma conjunction, parser.go:741-778):
    ``items`` carries the same conjunction-of-OR-groups encoding as a
    top-level WHERE tuple and may nest further groups; ``negated``
    applies NOT to the whole group; ``or_group`` lets the group join
    an enclosing disjunction like any other member."""

    items: tuple["Property | PredGroup", ...]
    negated: bool = False
    or_group: int = -1
    line: int = 0
    col: int = 0


class Stmt:
    line: int
    col: int


@dataclass(frozen=True)
class CreateNodeStmt(Stmt):
    name: str
    fields: tuple[FieldDef, ...] = ()
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class CreateEdgeStmt(Stmt):
    name: str
    from_ep: Endpoint = Endpoint("")
    to_ep: Endpoint = Endpoint("")
    props: tuple[FieldDef, ...] = ()
    line: int = 0
    col: int = 0


class AlterAction(enum.Enum):
    ADD_FIELD = "ADD_FIELD"
    DROP_FIELD = "DROP_FIELD"
    MODIFY_FIELD = "MODIFY_FIELD"
    SET_PRIMARY_KEY = "SET_PRIMARY_KEY"
    ADD_PROP = "ADD_PROP"
    DROP_PROP = "DROP_PROP"
    MODIFY_PROP = "MODIFY_PROP"
    SET_ENDPOINTS = "SET_ENDPOINTS"


@dataclass(frozen=True)
class AlterNodeStmt(Stmt):
    name: str
    action: AlterAction
    field: FieldDef | None = None  # add/modify
    field_name: str = ""  # drop
    pk_fields: tuple[str, ...] = ()  # set primary key
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class AlterEdgeStmt(Stmt):
    name: str
    action: AlterAction
    prop: FieldDef | None = None
    prop_name: str = ""
    from_ep: Endpoint | None = None
    to_ep: Endpoint | None = None
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class DropNodeStmt(Stmt):
    name: str
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class DropEdgeStmt(Stmt):
    name: str
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class NodeRef:
    """FROM/TO reference in INSERT EDGE: direct id literal or a
    property conjunction (first match wins — server/server.go:745-765)."""

    node_type: str
    id: Literal | None = None
    properties: tuple[Property, ...] = ()
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class InsertNodeStmt(Stmt):
    node_type: str
    properties: tuple[Property, ...] = ()
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class InsertEdgeStmt(Stmt):
    edge_type: str
    from_node: NodeRef | None = None
    to_node: NodeRef | None = None
    properties: tuple[Property, ...] = ()
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class UpdateNodeStmt(Stmt):
    node_type: str
    set: tuple[Property, ...] = ()
    where: tuple[Property, ...] = ()
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class UpdateEdgeStmt(Stmt):
    edge_type: str
    set: tuple[Property, ...] = ()
    where: tuple[Property, ...] = ()
    # Endpoint qualification (extension): ``UPDATE EDGE E FROM <ref> TO
    # <ref> SET ...`` restricts the update to edges whose endpoints
    # match the refs (ALL matching nodes, unlike INSERT's single
    # resolve). None = unqualified (the reference's surface).
    from_node: NodeRef | None = None
    to_node: NodeRef | None = None
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class DeleteNodeStmt(Stmt):
    node_type: str
    where: tuple[Property, ...] = ()  # mandatory per grammar
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class DeleteEdgeStmt(Stmt):
    edge_type: str
    where: tuple[Property, ...] = ()
    # Endpoint qualification (extension); when present it satisfies the
    # mandatory-predicate rule, so WHERE becomes optional.
    from_node: NodeRef | None = None
    to_node: NodeRef | None = None
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class MatchElement:
    type: str
    alias: str = ""
    is_edge: bool = False
    line: int = 0
    col: int = 0
    # variable-length extension (edge elements only): TYPE* / TYPE*n /
    # TYPE*lo..hi. (1, 1) = plain single-hop element.
    min_hops: int = 1
    max_hops: int = 1
    # OPTIONAL extension (r11, edge elements only): this hop and every
    # later one compile to LEFT joins — left-prefix rows survive with
    # NULL-padded fields when nothing matches.
    optional: bool = False


@dataclass(frozen=True)
class MatchStmt(Stmt):
    pattern: tuple[MatchElement, ...] = ()
    where: tuple[Property, ...] = ()
    return_fields: tuple[str, ...] = ()
    line: int = 0
    col: int = 0
    # ORDER BY / LIMIT extension (soft keywords — not reserved in the
    # reference grammar, parser/keywords.go:5-54, so field names
    # ``order``/``limit`` stay legal identifiers everywhere else).
    # Each order key is (field, descending).
    order_by: tuple[tuple[str, bool], ...] = ()
    limit: int | None = None
    # paging extension: LIMIT n OFFSET m (soft keyword, only after
    # LIMIT) — skip the first m rows of the deterministic order
    offset: int | None = None
    # RETURN COUNT(*) extension: aggregate row count instead of a
    # projection. The parenthesized form keeps ``count`` a legal field
    # name (a field reference is never followed by LPAREN).
    return_count: bool = False
    # RETURN SUM/MIN/MAX/AVG(field) extension: (func, field), same
    # parenthesized-form rule as COUNT(*).
    return_agg: tuple[str, str] | None = None
    # Grouped-aggregate RETURN extension: ``RETURN city, COUNT(*)``
    # (and/or several aggregates) — return_fields become the group
    # keys (empty = one global row) and each (func, field) aggregate
    # projects with a deterministic ``<func>_<field>`` / ``n_rows``
    # alias. A single bare aggregate still maps to the legacy
    # return_count/return_agg fields.
    return_aggs: tuple[tuple[str, str], ...] = ()
    # RETURN DISTINCT extension (soft keyword, LL(2): a marker only
    # when the next token is another IDENT that cannot start an
    # ORDER BY / LIMIT clause — so a field literally named
    # ``distinct`` stays legal). Deduplicates the PROJECTED return
    # fields (ids are dropped; plain RETURN keeps per-entity rows).
    return_distinct: bool = False
    # AS OF extension (soft keywords, LL(2): ``AS`` is a marker only
    # when followed by ``OF``): read the single node-pattern element
    # at a past flushed parquet version — the GQL surface over the
    # engine's node_df_at time travel.
    as_of: int | None = None
    # RETURN output aliasing extension (r11): ``RETURN a.name AS
    # owner`` — one entry per return_fields item, the user-chosen
    # output column name or None for the default (<alias>_<field> for
    # qualified items, the bare field otherwise). Empty tuple = no
    # aliases anywhere (programmatic ASTs stay valid unchanged).
    return_aliases: tuple[str | None, ...] = ()
    # Aggregate output aliasing extension (r11): ``COUNT(*) AS total``
    # — one entry per return_aggs item, the user-chosen output column
    # name or None for the deterministic <func>_<field> / n_rows
    # default. Empty tuple = no aliases anywhere. A single bare
    # aggregate WITH an alias stays in return_aggs (never the legacy
    # return_count/return_agg encoding), so these two tuples are
    # always index-aligned.
    return_agg_aliases: tuple[str | None, ...] = ()
    # HAVING extension (r12, soft keyword): post-aggregate filter over
    # the group keys and aggregate output aliases — ``RETURN city,
    # COUNT(*) AS n HAVING n > 5``. Same predicate grammar as WHERE
    # (comparisons, IN, OR/NOT, parenthesized groups); names resolve
    # against the SAME set ORDER BY enforces post-aggregation (group
    # keys by RETURN name or output column, aggregate aliases). Only
    # legal with an aggregate RETURN.
    having: tuple["Property | PredGroup", ...] = ()


@dataclass(frozen=True)
class ShowStmt(Stmt):
    """SHOW NODES | SHOW EDGES | SHOW VERSIONS <type> — catalog and
    time-travel introspection. The reference reserves the SHOW token
    with no grammar (parser/token.go:32-46); we implement the
    clearly-intended forms (SURVEY.md §2.4)."""

    kind: str  # "NODES" | "EDGES" | "VERSIONS"
    target: str = ""  # type name, VERSIONS only
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class DescribeStmt(Stmt):
    """DESCRIBE NODE <name> | DESCRIBE EDGE <name> (reserved token in
    the reference, implemented here as catalog introspection)."""

    kind: str  # "NODE" | "EDGE"
    name: str = ""
    line: int = 0
    col: int = 0


@dataclass(frozen=True)
class ExplainStmt(Stmt):
    """EXPLAIN MATCH ... — engine extension returning the compiled
    Spark physical plan instead of executing the traversal. EXPLAIN is
    a SOFT keyword (like ORDER/LIMIT): it is not reserved in the
    reference grammar (parser/keywords.go:5-54), so ``explain`` stays
    a legal identifier everywhere else."""

    target: MatchStmt = None  # type: ignore[assignment]
    line: int = 0
    col: int = 0
