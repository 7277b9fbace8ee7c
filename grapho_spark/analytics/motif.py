"""Motif (pattern) finding over vertex/edge DataFrames — the
GraphFrames-style ``find`` surface, and the fix for the reference's
MATCH limitation (its parser hardcodes node-only pattern elements,
/root/reference/parser/parser.go:685; SURVEY.md §2.1 #13).

Pattern syntax: chains of ``(a)-[e]->(b); (b)-[e2]->(c)`` — named
vertices and edges; a vertex name reused across terms joins the
terms. Each term compiles to one equi-join edge->vertex; Catalyst
reorders/broadcasts as usual.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_RE = re.compile(r"^\((\w+)\)-\[(\w*)\]->\((\w+)\)$")


def _prefix(df: DataFrame, name: str) -> DataFrame:
    return df.select(*[F.col(c).alias(f"{name}.{c}") for c in df.columns])


def find_motif(
    vertices: DataFrame | dict[str, DataFrame], edges: DataFrame, pattern: str
) -> DataFrame:
    """Match a chain motif. ``vertices`` must have ``id``; ``edges``
    must have ``src``/``dst``. Result columns are struct-ish prefixed
    ``<name>.<col>`` for every named vertex/edge in the pattern.

    For heterogeneous edges (FROM label != TO label) pass ``vertices``
    as ``{"src": <from-label df>, "dst": <to-label df>}`` — each motif
    vertex then binds to the table of the endpoint role it occupies. A
    vertex appearing in BOTH roles (a chain hop) is rejected, since no
    node can carry two labels.

    Example: ``find_motif(v, e, "(a)-[x]->(b); (b)-[y]->(c)")`` — all
    directed 2-paths.
    """
    if isinstance(vertices, dict):
        v_by_role = {"src": vertices["src"], "dst": vertices["dst"]}
        heterogeneous = v_by_role["src"] is not v_by_role["dst"]
    else:
        v_by_role = {"src": vertices, "dst": vertices}
        heterogeneous = False

    terms = [t.strip() for t in pattern.split(";") if t.strip()]
    if not terms:
        raise ValueError("empty motif pattern")

    out: DataFrame | None = None
    bound_vertices: set[str] = set()
    vertex_roles: dict[str, str] = {}
    bound_edges: set[str] = set()

    for term in terms:
        m = _TERM_RE.match(term)
        if not m:
            raise ValueError(f"bad motif term: {term!r} (expected '(a)-[e]->(b)')")
        a, e, b = m.groups()
        if e and e in bound_edges:
            raise ValueError(f"edge name {e!r} reused across terms")
        e_name = e or f"__e{len(bound_edges)}"
        e_df = _prefix(edges, e_name)
        src_col = F.col(f"`{e_name}.src`")
        dst_col = F.col(f"`{e_name}.dst`")

        if out is None:
            out = e_df
        else:
            # join the new edge onto whichever endpoint is already bound
            if a in bound_vertices:
                out = out.join(e_df, F.col(f"`{a}.id`") == src_col)
            elif b in bound_vertices:
                out = out.join(e_df, F.col(f"`{b}.id`") == dst_col)
            else:
                raise ValueError(
                    f"term {term!r} shares no vertex with earlier terms"
                )
        bound_edges.add(e_name)

        for vname, vcol, role in ((a, src_col, "src"), (b, dst_col, "dst")):
            if vname not in bound_vertices:
                v_df = _prefix(v_by_role[role], vname)
                out = out.join(v_df, F.col(f"`{vname}.id`") == vcol)
                bound_vertices.add(vname)
                vertex_roles[vname] = role
            else:
                if heterogeneous and vertex_roles[vname] != role:
                    raise ValueError(
                        f"vertex {vname!r} appears as both {vertex_roles[vname]}"
                        f" and {role} of a heterogeneous edge — no node has"
                        " both endpoint labels"
                    )
                # both endpoints already bound: constrain the edge
                out = out.filter(F.col(f"`{vname}.id`") == vcol)

    return out
