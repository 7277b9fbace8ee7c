"""Pure DDL validate+apply functions over immutable Catalog values.

Validation matrix mirrors /root/reference/catalog/ddl.go:
- create node: unique name, no duplicate fields, <=1 PRIMARY KEY,
  scalar-only PK (ddl.go:142-178), enum needs >=1 value, NOT NULL
  field may not default to null; PK/UNIQUE register a unique IndexSpec
  (ddl.go:120-126).
- create edge: unique name, endpoints must name existing node types,
  prop validations as above (ddl.go:208-237).
- alter node add/drop/modify/set-pk: existence checks, PK protection
  (can't drop the PK field, can't demote the PK, can't add a second
  PK), scalar-PK rule (ddl.go:242-343).
- alter edge add/drop/modify/set-endpoints: as above; we apply BOTH
  endpoints on SET FROM..TO (the reference's executor drops one —
  server/server.go:406-423 — a documented bug we fix; SURVEY.md §2.1
  #6).
- drop node: rejected while any edge references it (ddl.go:526-531).

Each function returns a NEW Catalog (version+1) or raises DDLError.
"""

from __future__ import annotations

from dataclasses import replace

from grapho_spark.catalog.types import Catalog, EdgeType, FieldSpec, IndexSpec, NodeType
from grapho_spark.gql import ast
from grapho_spark.gql.ast import (
    AlterAction,
    BaseType,
    Cardinality,
    Endpoint,
    FieldDef,
    LiteralKind,
    TypeSpec,
)

SCALAR_BASES = {
    BaseType.STRING,
    BaseType.TEXT,
    BaseType.INT,
    BaseType.FLOAT,
    BaseType.BOOL,
    BaseType.UUID,
    BaseType.DATE,
    BaseType.TIME,
    BaseType.DATETIME,
}


class DDLError(Exception):
    pass


def is_scalar(ts: TypeSpec) -> bool:
    return ts.elem is None and not ts.enum_vals and ts.base in SCALAR_BASES


def _validate_field(fd: FieldDef, noun: str) -> None:
    if fd.type.is_enum and not fd.type.enum_vals:
        raise DDLError(f"enum {noun} {fd.name!r} must have values")
    if fd.not_null and fd.default is not None and fd.default.kind is LiteralKind.NULL:
        raise DDLError(f"{noun} {fd.name!r} NOT NULL but default null")
    if fd.primary_key and not is_scalar(fd.type):
        raise DDLError(f"primary key {fd.name!r} must be scalar")


def _check_duplicates(fields: tuple[FieldDef, ...], noun: str) -> None:
    seen: set[str] = set()
    for f in fields:
        if f.name in seen:
            raise DDLError(f"duplicate {noun} {f.name!r}")
        seen.add(f.name)


def apply_create_node(cat: Catalog, stmt: ast.CreateNodeStmt) -> Catalog:
    if cat.node(stmt.name) is not None:
        raise DDLError(f"node {stmt.name!r} already exists")
    _check_duplicates(stmt.fields, "field")
    pk = ""
    for fd in stmt.fields:
        _validate_field(fd, "field")
        if fd.primary_key:
            if pk:
                raise DDLError(f"multiple primary keys: {pk!r} and {fd.name!r}")
            pk = fd.name
    indexes = tuple(
        IndexSpec(fd.name, unique=True)
        for fd in stmt.fields
        if fd.primary_key or fd.unique
    )
    nt = NodeType(
        name=stmt.name,
        fields=tuple(FieldSpec.from_field_def(fd) for fd in stmt.fields),
        pk=pk,
        indexes=indexes,
    )
    return cat.with_node(nt)


def apply_create_edge(cat: Catalog, stmt: ast.CreateEdgeStmt) -> Catalog:
    if cat.edge(stmt.name) is not None:
        raise DDLError(f"edge {stmt.name!r} already exists")
    if cat.node(stmt.from_ep.label) is None:
        raise DDLError(f"FROM node type {stmt.from_ep.label!r} not found")
    if cat.node(stmt.to_ep.label) is None:
        raise DDLError(f"TO node type {stmt.to_ep.label!r} not found")
    _check_duplicates(stmt.props, "edge prop")
    for fd in stmt.props:
        if fd.primary_key:
            raise DDLError(f"edge prop {fd.name!r} cannot be a primary key")
        _validate_field(fd, "prop")
    et = EdgeType(
        name=stmt.name,
        from_ep=stmt.from_ep,
        to_ep=stmt.to_ep,
        props=tuple(FieldSpec.from_field_def(fd) for fd in stmt.props),
    )
    return cat.with_edge(et)


def apply_alter_node(cat: Catalog, stmt: ast.AlterNodeStmt) -> Catalog:
    nt = cat.node(stmt.name)
    if nt is None:
        raise DDLError(f"node {stmt.name!r} does not exist")
    fields = nt.field_map()

    if stmt.action is AlterAction.ADD_FIELD:
        fd = stmt.field
        assert fd is not None
        if fd.name in fields:
            raise DDLError(f"field {fd.name!r} already exists")
        _validate_field(fd, "field")
        if fd.primary_key and nt.pk:
            raise DDLError(
                f"cannot set primary key on field {fd.name!r} when {nt.pk!r} is already primary key"
            )
        new_fields = nt.fields + (FieldSpec.from_field_def(fd),)
        new_pk = fd.name if fd.primary_key else nt.pk
        new_indexes = nt.indexes
        if fd.primary_key or fd.unique:
            new_indexes = new_indexes + (IndexSpec(fd.name, unique=True),)
        return cat.with_node(replace(nt, fields=new_fields, pk=new_pk, indexes=new_indexes))

    if stmt.action is AlterAction.DROP_FIELD:
        if stmt.field_name not in fields:
            raise DDLError(f"field {stmt.field_name!r} does not exist")
        if stmt.field_name == nt.pk:
            raise DDLError(f"cannot drop primary key field {stmt.field_name!r}")
        new_fields = tuple(f for f in nt.fields if f.name != stmt.field_name)
        new_indexes = tuple(i for i in nt.indexes if i.field != stmt.field_name)
        return cat.with_node(replace(nt, fields=new_fields, indexes=new_indexes))

    if stmt.action is AlterAction.MODIFY_FIELD:
        fd = stmt.field
        assert fd is not None
        if fd.name not in fields:
            raise DDLError(f"field {fd.name!r} does not exist")
        _validate_field(fd, "field")
        if fd.name == nt.pk:
            if not fd.primary_key:
                raise DDLError(f"cannot remove primary key from field {fd.name!r}")
            if not is_scalar(fd.type):
                raise DDLError(f"primary key {fd.name!r} must be scalar")
        elif fd.primary_key:
            raise DDLError(
                f"cannot set primary key on field {fd.name!r} when {nt.pk!r} is already primary key"
            )
        new_fields = tuple(
            FieldSpec.from_field_def(fd) if f.name == fd.name else f for f in nt.fields
        )
        new_indexes = tuple(i for i in nt.indexes if i.field != fd.name)
        if fd.primary_key or fd.unique:
            new_indexes = new_indexes + (IndexSpec(fd.name, unique=True),)
        return cat.with_node(replace(nt, fields=new_fields, indexes=new_indexes))

    if stmt.action is AlterAction.SET_PRIMARY_KEY:
        # The reference's executor collapses the parsed composite list
        # into one comma-joined name, so composite PKs always fail
        # validation (server/server.go:355-357, SURVEY.md §2.1 #4). We
        # make the restriction explicit instead of accidental.
        if len(stmt.pk_fields) != 1:
            raise DDLError("composite primary keys are not supported")
        pk_name = stmt.pk_fields[0]
        spec = fields.get(pk_name)
        if spec is None:
            raise DDLError(f"field {pk_name!r} does not exist")
        if not is_scalar(spec.type):
            raise DDLError(f"primary key {pk_name!r} must be scalar")
        new_indexes = tuple(
            i
            for i in nt.indexes
            if i.field != nt.pk or any(f.name == nt.pk and f.unique for f in nt.fields)
        )
        if not any(i.field == pk_name for i in new_indexes):
            new_indexes = new_indexes + (IndexSpec(pk_name, unique=True),)
        return cat.with_node(replace(nt, pk=pk_name, indexes=new_indexes))

    raise DDLError(f"unknown alter node action: {stmt.action}")


def apply_alter_edge(cat: Catalog, stmt: ast.AlterEdgeStmt) -> Catalog:
    et = cat.edge(stmt.name)
    if et is None:
        raise DDLError(f"edge {stmt.name!r} does not exist")
    props = et.prop_map()

    if stmt.action is AlterAction.ADD_PROP:
        fd = stmt.prop
        assert fd is not None
        if fd.name in props:
            raise DDLError(f"prop {fd.name!r} already exists")
        _validate_field(fd, "prop")
        return cat.with_edge(replace(et, props=et.props + (FieldSpec.from_field_def(fd),)))

    if stmt.action is AlterAction.DROP_PROP:
        if stmt.prop_name not in props:
            raise DDLError(f"prop {stmt.prop_name!r} does not exist")
        return cat.with_edge(
            replace(et, props=tuple(p for p in et.props if p.name != stmt.prop_name))
        )

    if stmt.action is AlterAction.MODIFY_PROP:
        fd = stmt.prop
        assert fd is not None
        if fd.name not in props:
            raise DDLError(f"prop {fd.name!r} does not exist")
        _validate_field(fd, "prop")
        return cat.with_edge(
            replace(
                et,
                props=tuple(
                    FieldSpec.from_field_def(fd) if p.name == fd.name else p for p in et.props
                ),
            )
        )

    if stmt.action is AlterAction.SET_ENDPOINTS:
        from_ep: Endpoint = stmt.from_ep or et.from_ep
        to_ep: Endpoint = stmt.to_ep or et.to_ep
        if cat.node(from_ep.label) is None:
            raise DDLError(f"FROM node type {from_ep.label!r} not found")
        if cat.node(to_ep.label) is None:
            raise DDLError(f"TO node type {to_ep.label!r} not found")
        return cat.with_edge(replace(et, from_ep=from_ep, to_ep=to_ep))

    raise DDLError(f"unknown alter edge action: {stmt.action}")


def apply_drop_node(cat: Catalog, stmt: ast.DropNodeStmt) -> Catalog:
    if cat.node(stmt.name) is None:
        raise DDLError(f"node {stmt.name!r} does not exist")
    for e in cat.edges:
        if e.from_ep.label == stmt.name or e.to_ep.label == stmt.name:
            raise DDLError(f"cannot drop node {stmt.name!r}: referenced by edge {e.name!r}")
    return cat.without_node(stmt.name)


def apply_drop_edge(cat: Catalog, stmt: ast.DropEdgeStmt) -> Catalog:
    if cat.edge(stmt.name) is None:
        raise DDLError(f"edge {stmt.name!r} does not exist")
    return cat.without_edge(stmt.name)


def apply_ddl(cat: Catalog, stmt: ast.Stmt) -> Catalog:
    """Dispatch a DDL statement to its apply function."""
    if isinstance(stmt, ast.CreateNodeStmt):
        return apply_create_node(cat, stmt)
    if isinstance(stmt, ast.CreateEdgeStmt):
        return apply_create_edge(cat, stmt)
    if isinstance(stmt, ast.AlterNodeStmt):
        return apply_alter_node(cat, stmt)
    if isinstance(stmt, ast.AlterEdgeStmt):
        return apply_alter_edge(cat, stmt)
    if isinstance(stmt, ast.DropNodeStmt):
        return apply_drop_node(cat, stmt)
    if isinstance(stmt, ast.DropEdgeStmt):
        return apply_drop_edge(cat, stmt)
    raise DDLError(f"not a DDL statement: {type(stmt).__name__}")
