"""GraphEngine: statement-level execution of GQL over Spark.

Execution semantics follow /root/reference/server/server.go with the
declared-semantics fixes catalogued in SURVEY.md §1.3/§7:

- statements execute serially; the first error aborts the remainder of
  the script (server.go:190-194); no transactions.
- INSERT NODE/EDGE: type must exist, sequential string IDs from one
  shared counter (nodes ``"N"``, edges ``"edge_N"`` —
  server.go:533,557-559,616-617), endpoint labels type-checked
  (server.go:609-614), node refs resolve by direct ID or first
  property-match (server.go:745-765; made deterministic via smallest
  ID).
- UPDATE/DELETE/MATCH WHERE: conjunctive equality only; a key missing
  from the schema matches nothing (server.go:779-782); ``null``
  matches stored nulls (server.go:793-797 — eqNullSafe).
- Declared-semantics divergences (enforced here, absent in the
  reference): typed coercion by catalog type, applied DEFAULTs, real
  NOT NULL (explicit null rejected), UNIQUE/PK guards, enum value
  checks, endpoint cardinality enforcement, RETURN projection honored.

Storage model (Spark-idiomatic substitute for the reference's mutable
in-memory maps): each node/edge type is a TABLE = immutable base
DataFrame (optionally parquet-backed, copy-on-write versions) + a
driver-side row buffer for OLTP appends. Reads union the two;
UPDATE/DELETE are MERGE-ON-READ (r12): each statement persists an
O(matched) side file (deletion vector of matched _ids, or rewritten
rows with SET applied) and the live view composes
``base ∖ ids ∪ rewrites`` lazily — never an O(table) materialization;
the next flush folds pending side files into the touched buckets'
leaf dirs only. At cluster scale the buffer would be a streaming
ingest table and flush() a compaction job — same architecture
(Delta/Iceberg deletion vectors + OPTIMIZE).

Durability: DDL goes ONLY to the catalog store (events JSONL); DML
goes ONLY to the commit log (JSONL of statement ASTs), replayed past
the manifest offset on open — this separation avoids the reference's
double-persistence replay conflict (server.go:47-68, SURVEY.md §3-B).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading
import weakref
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as ST

from grapho_spark.catalog.ddl import DDLError, apply_ddl
from grapho_spark.catalog.store import CatalogStore, _from_jsonable, _to_jsonable
from grapho_spark.catalog.types import (
    Catalog,
    DST_COLUMN,
    EdgeType,
    Endpoint,
    FieldSpec,
    ID_COLUMN,
    NodeType,
    SRC_COLUMN,
    edge_struct,
    node_struct,
    spark_type,
)
from grapho_spark.engine import zones as zn
from grapho_spark.engine.coerce import CoercionError, coerce_literal
from grapho_spark.engine.commitlog import (
    BINARY_NAME,
    TEXT_NAME,
    CommitLog,
    detect_format,
)
from grapho_spark.gql import ast
from grapho_spark.gql.ast import Cardinality, LiteralKind, TypeSpec
from grapho_spark.gql.parser import parse_script

# Hash-bucket partition column of versioned table parquet (full
# rewrites write partitionBy(_gbkt); never present in data files or
# table schemas — it lives only in leaf-dir names).
BUCKET_COLUMN = "_gbkt"

# Merge-on-read mutations: side files at or below this row count AND
# this on-disk byte size get an explicit broadcast hint on the
# anti-join (the deletion-vector / rewrite side of a point mutation is
# tiny; hinting skips AQE's initial shuffle planning for the
# overwhelmingly common case). Larger side files fall through to AQE's
# runtime join selection — the byte gate (ADVICE r12) keeps a side
# file of ~1M wide string _ids from forcing a few-hundred-MB driver
# broadcast that F.broadcast would otherwise push past AQE's own size
# estimation.
_MUT_BROADCAST_ROWS = 1_000_000
_MUT_BROADCAST_BYTES = 32 << 20  # compressed parquet on disk

# Serializes the register-views + analyze window of GraphEngine.sql()
# across ALL engine instances sharing this process's SparkSession (temp
# views are session-global; see GraphEngine.sql's docstring).
_SQL_VIEW_LOCK = threading.Lock()

# Lowercased names of node_*/edge_* temp views REGISTERED BY A
# GraphEngine, keyed PER SparkSession (temp views are session-scoped:
# a process-global set would let an engine on session B discard the
# record of a view that lives on session A without dropping it, and
# A's next sql() would silently read the stale snapshot). sql() only
# ever drops names recorded for ITS OWN session — a user's own
# node_/edge_-prefixed view on the shared session (e.g. edge_weights)
# is not engine property and must survive (ADVICE r7). Guarded by
# _SQL_VIEW_LOCK; weak keys let dead sessions drop their record.
_ENGINE_OWNED_VIEWS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _cmp(col: Column, op: str, lit: Column) -> Column:
    """WHERE comparison: ``=`` is null-safe equality (the reference's
    observed semantics, server/server.go:793-797); ``<``/``>``/``<>``
    are the comparison extension — null never matches (three-valued
    SQL semantics on both sides of ``<>``). The extension branches must
    be TOTAL (never NULL): DELETE keeps rows via ``filter(~pred)``, and
    ``~NULL`` is NULL, which would silently DELETE null-valued rows a
    range predicate never matched (caught by
    tests/test_differential_model.py). Totality comes from explicit
    ``isNotNull`` guards rather than ``coalesce(cmp, false)``: a
    coalesce around the comparison is opaque to Catalyst's filter
    pushdown (the scan read every row group), while IsNotNull + the
    raw comparison push to the parquet scan — asserted by the
    ``gql_match_distinct_neq`` plan expectation. (false AND NULL is
    false, so the conjunction is total even when one side is null.)"""
    if op == "<":
        return col.isNotNull() & lit.isNotNull() & (col < lit)
    if op == ">":
        return col.isNotNull() & lit.isNotNull() & (col > lit)
    if op == "<=":
        return col.isNotNull() & lit.isNotNull() & (col <= lit)
    if op == ">=":
        return col.isNotNull() & lit.isNotNull() & (col >= lit)
    if op == "<>":
        return col.isNotNull() & lit.isNotNull() & (col != lit)
    return col.eqNullSafe(lit)


_AGG_FNS = {
    "SUM": F.sum,
    "MIN": F.min,
    "MAX": F.max,
    "AVG": F.avg,
    "COUNT": F.count,  # COUNT(field): non-null count (SQL semantics)
    # COUNT(DISTINCT field): Spark compiles the standard two-phase
    # (expand + partial agg) plan — map-side distinct before the
    # shuffle, no global collect
    "COUNT_DISTINCT": F.countDistinct,
}


def _where_groups(
    where: tuple["ast.Property", ...],
) -> list[list["ast.Property"]]:
    """Split a WHERE list into its conjunction of disjunction groups:
    properties sharing an ``or_group >= 0`` form one OR group; every
    ``or_group < 0`` property is its own conjunct (the reference's
    comma = AND, server/server.go:768-803)."""
    groups: dict[object, list] = {}
    order: list[object] = []
    for i, p in enumerate(where):
        k = ("g", p.or_group) if getattr(p, "or_group", -1) >= 0 else ("s", i)
        if k not in groups:
            groups[k] = []
            order.append(k)
        groups[k].append(p)
    return [groups[k] for k in order]


def _in_pred(col: Column, vals: list) -> Column:
    """``field IN (v1, ...)`` over coerced literals. Null handling
    mirrors the engine's null-safe ``=``: a NULL literal in the list
    matches stored nulls (compiled as an IsNull branch); otherwise a
    null cell never matches — exactly what Catalyst's In gives, so
    the non-null arm stays a single pushable In filter on the scan."""
    nonnull = [v for v in vals if v is not None]
    parts: list[Column] = []
    if nonnull:
        # IsNotNull guard keeps the predicate TOTAL (never NULL): In()
        # on a null cell yields NULL, and DELETE's keep-side ~NULL
        # would silently delete null rows the list never matched (the
        # same trap _cmp documents; caught by the differential model).
        # IsNotNull AND In both push to the parquet scan.
        parts.append(col.isNotNull() & col.isin(*nonnull))
    if any(v is None for v in vals):
        parts.append(col.isNull())
    if not parts:  # programmatic empty list: matches nothing
        return F.lit(False)
    expr = parts[0]
    for e in parts[1:]:
        expr = expr | e
    return expr


class EngineError(Exception):
    pass


@dataclass
class StatementResult:
    kind: str
    message: str = ""
    count: int = 0
    df: DataFrame | None = None


@dataclass
class _Table:
    schema: ST.StructType
    base: DataFrame | None = None
    buffer: list[dict] = field(default_factory=list)
    version: int = 0
    dirty: bool = False
    # True when BASE rows were mutated since the last flush (UPDATE/
    # DELETE/ALTER rewrite); False means any pending change is pure
    # buffered INSERTs, which flush as an O(delta) append version
    # instead of an O(table) rewrite (see flush()).
    base_dirty: bool = False
    # Hash buckets (pmod(xxhash64(_id), id_buckets)) whose rows were
    # mutated since the last flush: UPDATE/DELETE union in the matched
    # rows' buckets, letting flush() rewrite ONLY those buckets of the
    # versioned parquet (partition-pruned copy-on-write). None = the
    # touched set is unknowable (ALTER changed the physical schema),
    # forcing the full rewrite. _id never changes after insert, so a
    # row's bucket is immutable and the set stays a superset of every
    # changed bucket.
    touched_buckets: set[int] | None = field(default_factory=set)
    # Bucket count of the table's live bucket-complete layout (the
    # "n" of the tip chain's _BUCKETS.json). None = no bucket-complete
    # version yet, or a legacy whole-dir layout — the engine-level
    # id_buckets floor applies. Adaptive re-bucketing grows this at
    # full compacting rewrites (see _grown_bucket_n); it never changes
    # between full rewrites, so mutation-time touched-bucket recording
    # and the partial-rewrite filter always hash with the SAME n as
    # the layout they prune against.
    bucket_n: int | None = None
    # Lazily-built bloom sketches per unique field (operators/bloom.py):
    # a negative probe proves a value absent from base with no Spark
    # job. No false negatives; cleared whenever base VALUES can change
    # (UPDATE); DELETE keeps them (stale positives only cost an extra
    # exact scan). Inserted values are put() so the sketch stays a
    # superset of base+buffer across flushes.
    blooms: dict[str, object] = field(default_factory=dict)
    # Merge-on-read mutation layers since the last flush, in statement
    # order. Entries: ("fold", DataFrame) — a buffer snapshot folded
    # into the view at mutation time; ("d", path) — a deletion-vector
    # parquet of matched _ids; ("u", path) — a rewrite parquet of
    # matched rows with SET applied; ("rebase", path) — a full view
    # snapshot that RESTARTS the composition (depth bound). The live
    # view (tab.base) is base₀ with these applied sequentially:
    # fold → ∪ rows; d → ∖ ids; u → ∖ ids ∪ rewrites. Side files live
    # in session-scoped temp — durability is the commit log (replay
    # re-derives them) and the next flush folds them into versioned
    # parquet.
    mut_parts: list = field(default_factory=list)
    # Lazy-plan depth of tab.base in mutation/delta layers
    # (diagnostic; every partial/full flush resets it via a fresh
    # chain read, and the rebase cap bounds it between flushes).
    base_layers: int = 0


def _having_value(lit: "ast.Literal", dt: ST.DataType, name: str) -> object:
    """Coerce a HAVING literal against the RESULT column's Spark type
    (aggregate outputs have no catalog spec — sum→long, avg→double,
    count→long — so coercion keys off the plan's schema). Kind
    mismatches error instead of silently casting to null."""
    if lit.kind is LiteralKind.NULL:
        return None
    if isinstance(dt, ST.NumericType):
        if lit.kind is not LiteralKind.NUMBER:
            raise EngineError(
                f"HAVING {name!r}: expected a numeric literal, got {lit.text!r}"
            )
        return float(lit.text) if "." in lit.text else int(lit.text)
    if isinstance(dt, ST.BooleanType):
        if lit.kind is not LiteralKind.BOOL:
            raise EngineError(
                f"HAVING {name!r}: expected a boolean literal, got {lit.text!r}"
            )
        return lit.text.lower() == "true"
    if lit.kind is not LiteralKind.STRING:
        raise EngineError(
            f"HAVING {name!r}: expected a string literal, got {lit.text!r}"
        )
    return lit.text


def _having_member(
    out: DataFrame, p: "ast.Property | ast.PredGroup", allowed: dict[str, str]
) -> Column:
    """One HAVING disjunction member: leaf comparison over a resolved
    result column, or a nested parenthesized group. Unknown names are
    ERRORS (the post-aggregate namespace is closed — exactly the set
    ORDER BY enforces), unlike WHERE's missing-prop-matches-nothing
    reference rule which applies to open row schemas."""
    if isinstance(p, ast.PredGroup):
        sub = _having_pred(out, p.items, allowed)
        return ~sub if p.negated else sub
    if p.name not in allowed:
        raise EngineError(
            f"HAVING field {p.name!r} is not a group key or aggregate "
            f"alias of this RETURN (available: {sorted(set(allowed))})"
        )
    col_name = allowed[p.name]
    dt = out.schema[col_name].dataType
    if p.op == "in":
        vals = [_having_value(v, dt, p.name) for v in p.in_values]
        one = _in_pred(F.col(col_name), vals)
    else:
        v = _having_value(p.value, dt, p.name)
        one = _cmp(F.col(col_name), p.op, F.lit(v).cast(dt))
    return ~one if p.negated else one


def _having_pred(
    out: DataFrame,
    items: tuple["ast.Property | ast.PredGroup", ...],
    allowed: dict[str, str],
) -> Column:
    """HAVING predicate (r12): the WHERE conjunction-of-OR-groups
    encoding compiled against post-aggregation result columns. A plain
    ``filter`` after the agg — Catalyst keeps the partial-agg shape
    and the filter never blocks pushdown below the aggregate (it
    can't: it reads aggregate outputs)."""
    pred = F.lit(True)
    for group in _where_groups(items):
        gpred: Column | None = None
        for p in group:
            one = _having_member(out, p, allowed)
            gpred = one if gpred is None else (gpred | one)
        pred = pred & (gpred if gpred is not None else F.lit(False))
    return pred


def _id_sort_key() -> list[Column]:
    """Numeric-aware ordering for sequential string IDs ('2' < '10')."""
    return [F.length(ID_COLUMN), F.col(ID_COLUMN)]


def _resolve_result_col(out: DataFrame, name: str, clause: str) -> str:
    """Resolve a user field against result columns: exact name first,
    else a unique ``<alias>_<field>`` suffix match (the chain and
    var-length paths prefix columns with the element alias). An
    alias-QUALIFIED name (``x.field``) maps to its exact ``x_field``
    output column — never a suffix guess."""
    if "." in name:
        exact = name.replace(".", "_")
        if exact in out.columns:
            return exact
        raise EngineError(
            f"{clause} field {name!r} not found in result columns {out.columns}"
        )
    if name in out.columns:
        return name
    suffix = [c for c in out.columns if c.endswith(f"_{name}")]
    if len(suffix) != 1:
        raise EngineError(
            f"{clause} field {name!r} not found in result columns {out.columns}"
            if not suffix
            else f"{clause} field {name!r} is ambiguous: {suffix}"
        )
    return suffix[0]


def _return_field_owner(
    rf: str,
    aliases: list[str],
    specs: list[dict],
    where_desc: str,
) -> tuple[str, str]:
    """(owner_alias, bare_field) for a RETURN item over alias-prefixed
    columns: a qualified ``x.field`` targets exactly its element; an
    unqualified field keeps the first-declaring-element rule."""
    if "." in rf:
        q, f = rf.split(".", 1)
        if q not in aliases:
            raise EngineError(f"RETURN alias {q!r} is not in the pattern")
        if f not in specs[aliases.index(q)]:
            raise EngineError(
                f"RETURN field {f!r} is not declared by element {q!r}"
            )
        return q, f
    owner = next(
        (aliases[i] for i, sp in enumerate(specs) if rf in sp), None
    )
    if owner is None:
        raise EngineError(f"RETURN field {rf!r} {where_desc}")
    return owner, rf


def _return_items(stmt: "ast.MatchStmt") -> list[tuple[str, str | None]]:
    """RETURN items to project as ``(field, output_alias | None)``
    pairs: the named fields (with their r11 ``AS`` output aliases) plus
    the source fields of grouped aggregates (``RETURN city, SUM(age)``
    must carry ``age`` through the projection for the aggregation
    step). An aggregate source rides along under its OWN name even when
    the field also appears aliased (``RETURN age AS a, SUM(age)`` —
    the aggregation step resolves the raw name)."""
    aliases = stmt.return_aliases or (None,) * len(stmt.return_fields)
    items = list(zip(stmt.return_fields, aliases))
    plain = {rf for rf, al in items if al is None}
    for _, fname in stmt.return_aggs:
        if fname != "*" and fname not in plain:
            items.append((fname, None))
            plain.add(fname)
    return items


def _apply_order_limit(
    out: DataFrame,
    stmt: "ast.MatchStmt",
    tiebreak: list[Column],
    distinct_cols: list[str] | None = None,
) -> DataFrame:
    """ORDER BY / LIMIT extension for MATCH results.

    Each ORDER BY field resolves against the result's output columns:
    exact name first, else a unique ``<alias>_<field>`` suffix match
    (the chain/var-length paths prefix columns with the element alias).
    The engine's deterministic _id tiebreak always follows the user
    keys, so LIMIT is stable across runs and engines. With a LIMIT the
    plan is TakeOrderedAndProject — per-partition top-k then a k-row
    merge on the driver, never a global sort.
    """
    if stmt.return_count:
        # RETURN COUNT(*): aggregate instead of project; map-side
        # partial count + single-row exchange, never a full sort.
        out = out.agg(F.count(F.lit(1)).alias("n_rows"))
        if getattr(stmt, "having", ()):
            out = out.filter(
                _having_pred(out, stmt.having, {"n_rows": "n_rows"})
            )
        return out
    if stmt.return_agg:
        # RETURN SUM/MIN/MAX/AVG/COUNT(field): same map-side-partial
        # shape as COUNT(*); the field resolves like an ORDER BY key
        # (COUNT(field) counts NON-NULL values, SQL semantics).
        func, fname = stmt.return_agg
        resolved = _resolve_result_col(out, fname, "aggregate")
        alias = f"{func.lower()}_{fname.replace('.', '_')}"
        out = out.agg(_AGG_FNS[func](F.col(resolved)).alias(alias))
        if getattr(stmt, "having", ()):
            out = out.filter(_having_pred(out, stmt.having, {alias: alias}))
        return out
    if stmt.return_aggs:
        # Grouped-aggregate RETURN: the return fields are the group
        # keys (none = one global row); each aggregate projects with a
        # deterministic alias. Map-side partial agg + one shuffle on
        # the key — the same shape as the single-aggregate forms.
        # a group key carrying an AS alias (r11) was projected under
        # the alias — resolve that exact output column, not the raw name
        key_aliases = stmt.return_aliases or (None,) * len(stmt.return_fields)
        keys = [
            _resolve_result_col(out, al or f, "RETURN group key")
            for f, al in zip(stmt.return_fields, key_aliases)
        ]
        # r11: each aggregate projects under its user AS alias when
        # given, else the deterministic <func>_<field> / n_rows name
        agg_user = stmt.return_agg_aliases or (None,) * len(stmt.return_aggs)
        agg_out: list[str] = [
            ua
            or (
                "n_rows"
                if func == "COUNT" and fname == "*"
                else f"{func.lower()}_{fname.replace('.', '_')}"
            )
            for (func, fname), ua in zip(stmt.return_aggs, agg_user)
        ]
        agg_cols: list[Column] = []
        for (func, fname), alias in zip(stmt.return_aggs, agg_out):
            if func == "COUNT" and fname == "*":
                agg_cols.append(F.count(F.lit(1)).alias(alias))
            else:
                resolved = _resolve_result_col(out, fname, "aggregate")
                agg_fn = _AGG_FNS[func]
                agg_cols.append(agg_fn(F.col(resolved)).alias(alias))
        out = out.groupBy(*keys).agg(*agg_cols) if keys else out.agg(*agg_cols)
        # Post-aggregation only group keys (by RETURN name or resolved
        # column) and aggregate aliases exist; a bare source field
        # (ORDER BY age after RETURN city, SUM(age)) must error, not
        # silently suffix-resolve to sum_age.
        allowed: dict[str, str] = {}
        for f, key_col in zip(stmt.return_fields, keys):
            allowed[f] = key_col
            allowed[key_col] = key_col
        for alias in agg_out:
            allowed[alias] = alias
        # HAVING (r12): post-aggregate filter over the same closed
        # namespace ORDER BY resolves against. Applied before ORDER
        # BY/LIMIT — SQL clause order.
        if getattr(stmt, "having", ()):
            out = out.filter(_having_pred(out, stmt.having, allowed))
        user_cols = []
        for name, desc in stmt.order_by:
            if name not in allowed:
                raise EngineError(
                    f"ORDER BY field {name!r} is not a group key or "
                    f"aggregate alias of this RETURN "
                    f"(available: {sorted(set(allowed))})"
                )
            resolved = allowed[name]
            user_cols.append(F.col(resolved).desc() if desc else F.col(resolved).asc())
        # deterministic group order: user keys, then the group keys
        # (a global aggregate has one row — nothing to order)
        if user_cols or keys:
            out = out.orderBy(*user_cols, *[F.col(k) for k in keys])
        if getattr(stmt, "offset", None):
            out = out.offset(stmt.offset)
        if stmt.limit is not None:
            out = out.limit(stmt.limit)
        return out
    if distinct_cols is not None:
        # RETURN DISTINCT: dedupe the PROJECTED return fields (entity
        # ids are dropped — keeping them would make distinct a no-op).
        # The deterministic tiebreak becomes the full projected tuple,
        # which is a total order post-distinct. Partial-agg + shuffle
        # on the return-field key — never a global sort.
        out = out.select(*distinct_cols).distinct()
        tiebreak = [F.col(c) for c in distinct_cols]
    user_cols: list[Column] = []
    for name, desc in stmt.order_by:
        resolved = _resolve_result_col(out, name, "ORDER BY")
        user_cols.append(F.col(resolved).desc() if desc else F.col(resolved).asc())
    out = out.orderBy(*user_cols, *tiebreak)
    if getattr(stmt, "offset", None):
        # paging: the deterministic tiebreak above makes the skipped
        # prefix stable, so consecutive pages never overlap or gap;
        # orderBy+offset+limit compile to one TakeOrderedAndProject
        # (per-partition top-(m+n), driver merge) — no global sort
        out = out.offset(stmt.offset)
    if stmt.limit is not None:
        out = out.limit(stmt.limit)
    return out


def _scratch_host_tag() -> str:
    """Hostname component of a mutation-scratch root name, sanitized
    so the ``-``-delimited ``mut-<pid>-<host>-<rand>`` format parses
    unambiguously (dashes/dots stripped, length-capped)."""
    import re
    import socket

    try:
        h = socket.gethostname()
    except OSError:
        h = "unknown"
    return re.sub(r"[^A-Za-z0-9]", "", h)[:32] or "unknown"


def _hkey(v: object) -> object:
    """Hashable key with value-equality semantics (array fields are
    Python lists; nested arrays nest)."""
    return tuple(_hkey(x) for x in v) if isinstance(v, list) else v


class GraphEngine:
    def __init__(
        self,
        spark: SparkSession,
        data_dir: str | None = None,
        replay: bool = True,
        log_format: str | None = None,
        snapshot_every: int = 64,
        keep_versions: int | None = None,
        log_segment_bytes: int | None = None,
        max_delta_chain: int = 8,
        id_buckets: int = 16,
        target_bucket_rows: int | None = None,
        zone_stats: bool = True,
        zone_bloom_rows: int = 100_000,
        bloom_semijoin_leafs: int = 32768,
    ):
        """``log_format``: commit-log encoding — ``"text"`` (JSONL, the
        default) or ``"binary"`` (4-byte BE length-prefixed records,
        the reference's alternative format, commitlog.go:121-133).
        ``None`` auto-detects from an existing log in ``data_dir``.
        ``log_segment_bytes``: roll the commit log into numbered sealed
        segments at this size (None = classic single file); replay and
        CDC offsets span segments transparently.

        ``snapshot_every``: auto-compaction cadence — once this many
        DDL events accumulate past the last snapshot, the engine runs a
        full ``flush()`` so reopen replays only the tail.

        ``keep_versions``: time-travel retention — keep this many most
        recent flushed parquet versions per table, pruning older ones
        at the end of each ``flush()`` (Delta-style VACUUM). ``None``
        (default) keeps every version forever; without a bound a
        long-lived OLTP workload grows storage without limit. Must be
        >= 1 when set (the live version is never pruned).

        ``max_delta_chain``: insert-only flushes append O(delta)
        versions onto the last full rewrite; once a chain carries this
        many deltas, the next flush compacts it with a full rewrite
        (bounding per-read path counts and retention's protected set
        on ingest-dominated workloads). Must be >= 1.

        ``id_buckets``: full rewrites lay the versioned parquet out as
        hash buckets of ``_id`` (``_gbkt=<k>`` leaf dirs + a
        _BUCKETS.json map). A later UPDATE/DELETE flush then rewrites
        ONLY the buckets holding matched rows and inherits the rest
        from the prior version's map — partition-pruned copy-on-write,
        so mutation I/O is O(touched/id_buckets of the table), not
        O(table). Size it so one bucket ≈ a healthy parquet file set
        at your table size (more buckets = finer rewrites but more
        files; at cluster scale hundreds-to-thousands). Must be >= 1;
        1 effectively disables pruning.

        ``target_bucket_rows``: adaptive re-bucketing — at each FULL
        compacting rewrite (first flush, chain compaction, ALTER,
        explicit ``compact()``), if the table now holds more than this
        many rows per bucket, the bucket count DOUBLES until it fits
        (grow-only; ``id_buckets`` stays the floor). The grown count
        is per-table, recorded in that version's _BUCKETS.json, and
        every later mutation/partial-rewrite hashes with it — so the
        partial-rewrite win stays O(touched · rows/bucket) as the
        table grows 100×, instead of decaying to O(table/16). The
        storage twin of the ANN index's outgrowth rule. ``None``
        (default) disables growth (fixed ``id_buckets``).

        ``zone_stats``: write per-version sidecars at flush — the
        leaf-file inventory + min/max/null zone statistics
        (``_FILES.json``, one pyarrow footer pass) and, for versions
        of at least ``zone_bloom_rows`` rows, per-leaf Bloom bitmaps
        over the type's PK/UNIQUE fields (``_ZONES``, one
        column-pruned JVM pass). Chain/AS OF reads then come from the
        explicit file manifest (no directory listing), and point
        UPDATE/DELETE/MATCH statements prune to the leafs whose
        stats/bloom admit the predicate (see engine/zones.py).
        Versions written without sidecars fall back to dir-listing
        reads with no pruning.

        ``bloom_semijoin_leafs``: past this many inventoried leafs in
        one chain read, bloom candidate selection runs as ONE Spark
        job over the chain's ``_ZONES`` sidecars (only absent-verdict
        rows return to the driver) instead of the driver-side probe
        loop — the driver then never materializes the chain's bitmaps
        (~0.2% of table bytes), which is what caps the driver loop:
        the first-statement bitmap load is O(leafs) driver time
        (~30µs/leaf measured — ~30s and GBs of driver heap at 10^6
        leafs) while the probe job holds a flat ~2s floor. Measured
        at 15M rows (scripts/leafscale_probe.py, PERF.md r14): the
        driver loop is still 3x faster at 16384 leafs (0.72s vs 2.06s
        steady-state), so the default crossover sits at 32768 —
        semi-join is the 10^5-10^6-leaf insurance, not a mid-size
        win. Identical pruning decisions on both paths (same md5
        probe, pinned by tests/test_zones.py and the odd/even-seed
        differential soak)."""
        if keep_versions is not None and keep_versions < 1:
            raise EngineError("keep_versions must be >= 1 (or None)")
        if max_delta_chain < 1:
            raise EngineError("max_delta_chain must be >= 1")
        if id_buckets < 1:
            raise EngineError("id_buckets must be >= 1")
        if target_bucket_rows is not None and target_bucket_rows < 1:
            raise EngineError("target_bucket_rows must be >= 1 (or None)")
        self.spark = spark
        self.data_dir = data_dir
        self.keep_versions = keep_versions
        self.max_delta_chain = max_delta_chain
        self.id_buckets = id_buckets
        self.target_bucket_rows = target_bucket_rows
        self.zone_stats = zone_stats
        self.zone_bloom_rows = zone_bloom_rows
        self.bloom_semijoin_leafs = bloom_semijoin_leafs
        # Cached per-version sidecars: (kind, name, version) ->
        # parsed _FILES.json (or None for legacy dirs) / per-leaf
        # blooms. Version dirs are immutable once published, so the
        # caches are invalidated only where a dir can be REPLACED
        # (flush overwriting a crash orphan) or a table identity
        # recycled (DROP).
        self._inv_cache: dict[tuple[str, str, int], dict | None] = {}
        self._zone_cache: dict[tuple[str, str, int], dict] = {}
        # Statement-scoped zone-pruning audit: every pruned chain read
        # appends (kind, name, kept_leafs, total_leafs); each statement
        # resets it on entry (_execute_stmt), so it never outgrows one
        # statement's reads. EXPLAIN MATCH compiles its target and
        # prepends the recorded decisions to the plan text (guarded by
        # self._lock like all statement execution).
        self._prune_log: list[tuple[str, str, int, int, str]] = []
        # Chain/AS OF reads pass thousands of root paths; below this
        # threshold Spark launches a distributed listing job whose
        # per-task scheduling dwarfs the local-FS listing it does
        # (measured ~5s of a 5.6s read at 2048 leafs). Driver-side
        # sequential listing is ~0.3s at that width; manifest-built
        # reads don't list directories at all. Only raise the value
        # when it is still at Spark's default (32) — a user-tuned
        # setting on the shared session is theirs (ADVICE r13);
        # session.py sets the same 8192 for sessions we build.
        try:
            cur = spark.conf.get(
                "spark.sql.sources.parallelPartitionDiscovery.threshold"
            )
            if cur is None or int(cur) == 32:
                spark.conf.set(
                    "spark.sql.sources.parallelPartitionDiscovery.threshold",
                    "8192",
                )
        except Exception:
            pass
        self._lock = threading.RLock()
        self.tables: dict[tuple[str, str], _Table] = {}
        self.next_id = 1
        self._commit_offset = 0
        self._seq = 1  # global statement sequence shared by DDL + DML logs
        self._replaying = False
        self._commitlog: CommitLog | None = None
        # Session-scoped scratch root for merge-on-read mutation side
        # files (created lazily on the first UPDATE/DELETE).
        self._mut_tmp: str | None = None
        self._mut_n = 0

        if data_dir:
            os.makedirs(data_dir, exist_ok=True)
            if log_format is not None:
                # An explicit format that contradicts an existing log of
                # the OTHER format would silently strand that log's
                # unflushed records (replay reads only the requested
                # file) and misapply the manifest's commit_offset to the
                # wrong file's records. Refuse instead.
                from grapho_spark.engine.commitlog import log_exists

                other_fmt = "text" if log_format == "binary" else "binary"
                other_name = TEXT_NAME if log_format == "binary" else BINARY_NAME
                # log_exists also sees ROTATED logs whose active file
                # was just sealed (r8e segment rotation)
                if log_exists(data_dir, other_fmt):
                    raise EngineError(
                        f"data_dir already has a non-empty "
                        f"{'text' if log_format == 'binary' else 'binary'} "
                        f"commit log ({other_name}); refusing to open with "
                        f"log_format={log_format!r}"
                    )
            self._commitlog = CommitLog(
                data_dir,
                fmt=log_format or detect_format(data_dir),
                max_segment_bytes=log_segment_bytes,
            )
            self.catalog_store: CatalogStore | None = CatalogStore(
                os.path.join(data_dir, "catalog"), snapshot_every=snapshot_every
            )
            if replay:
                # Start from the last flush (catalog snapshot + table
                # versions are written together there, so they are
                # mutually consistent), then replay BOTH logs
                # interleaved by sequence number — schema-changing DDL
                # after unflushed DML must re-apply in original order.
                self.catalog, ev_offset = self.catalog_store.load_base()
                ev_expected = self._manifest_ev_offset()
                if ev_expected is not None and ev_offset != ev_expected:
                    # Crash window between the catalog snapshot and the
                    # engine-manifest publish: the snapshot ran ahead of
                    # (or, with a hand-rolled layout, behind) the
                    # manifest's consistent point. Rebuild the catalog
                    # at exactly the manifest's offset from the full
                    # event log so unflushed DML replays against the
                    # catalog it originally ran against.
                    self.catalog = self.catalog_store.load_at(ev_expected)
                    ev_offset = ev_expected
                self._load_manifest_and_tables()
                self._ensure_catalog_tables()
                self._replay_logs(ev_offset)
            else:
                self.catalog = self.catalog_store.load()
                self._load_manifest_and_tables()
                # The flushed manifest's seq ignores unflushed log
                # entries; writes through a replay=False engine must not
                # mint duplicate sequence numbers (a later replay=True
                # boot would then order equal-seq DDL before DML
                # regardless of actual statement order). Cheap line scan
                # of both log tails for the max seq already issued.
                self._seq = max(
                    self._seq,
                    self._max_logged_seq() + 1,
                    self.catalog_store.max_seq() + 1,
                )
        else:
            self.catalog_store = None
            self.catalog = Catalog()
        self._ensure_catalog_tables()

    def _ensure_catalog_tables(self) -> None:
        """Empty table states for catalog types with no persisted data."""
        for nt in self.catalog.nodes:
            self.tables.setdefault(("node", nt.name), _Table(node_struct(nt)))
        for et in self.catalog.edges:
            self.tables.setdefault(("edge", et.name), _Table(edge_struct(et)))

    # ------------------------------------------------------------ public

    def execute(self, script: str) -> list[StatementResult]:
        """Parse and execute a GQL script; first error aborts the rest."""
        stmts, errors = parse_script(script)
        if errors:
            raise EngineError("; ".join(str(e) for e in errors))
        return self.execute_statements(stmts)

    def execute_statements(self, stmts: list[ast.Stmt]) -> list[StatementResult]:
        """Execute pre-parsed statements (the TCP server parses once for
        error reporting and hands the list straight here)."""
        out: list[StatementResult] = []
        with self._lock:
            for stmt in stmts:
                out.append(self._execute_stmt(stmt))
        return out

    def node_df(self, name: str) -> DataFrame:
        if self.catalog.node(name) is None:
            raise EngineError(f"node type {name!r} does not exist")
        return self._merged_df(("node", name))

    def edge_df(self, name: str) -> DataFrame:
        if self.catalog.edge(name) is None:
            raise EngineError(f"edge type {name!r} does not exist")
        return self._merged_df(("edge", name))

    def sql(self, query: str) -> DataFrame:
        """Run Spark SQL over the graph: every node type is exposed as
        the view ``node_<Name>`` and every edge type as
        ``edge_<Name>`` (current-state snapshots of base+buffer at
        call time). This is the GQL<->SQL bridge: traversals in MATCH,
        analytics in full Spark SQL over the same tables — e.g.
        ``SELECT k, count(*) FROM node_P GROUP BY k`` or joins through
        ``edge_E``'s (_src, _dst) columns. Views refresh per call, so
        DML between calls is visible; names never clash with user
        fields (views live in Spark's catalog, not the engine's).

        Temp views are session-scoped, so two engines sharing one
        SparkSession would otherwise cross-read: this call pins the
        session's ``node_*``/``edge_*`` views to THIS engine's catalog
        (registers its own, drops stragglers left by other engines)
        under a process-wide lock, and Spark analyzes the query eagerly
        — the returned DataFrame stays bound to this engine's snapshot
        even if another engine calls sql() afterwards. A query naming
        another engine's type fails analysis instead of silently
        reading foreign data. Only views RECORDED as engine-registered
        (module registry ``_ENGINE_OWNED_VIEWS``) are ever dropped —
        a user's own ``node_``/``edge_``-prefixed temp view on the
        shared session is untouched.
        """
        with _SQL_VIEW_LOCK:
            owned = _ENGINE_OWNED_VIEWS.setdefault(self.spark, set())
            mine = {f"node_{nt.name}".lower() for nt in self.catalog.nodes} | {
                f"edge_{et.name}".lower() for et in self.catalog.edges
            }
            for stale in sorted(owned - mine):
                self.spark.catalog.dropTempView(stale)
                owned.discard(stale)
            for nt in self.catalog.nodes:
                self.node_df(nt.name).createOrReplaceTempView(f"node_{nt.name}")
            for et in self.catalog.edges:
                self.edge_df(et.name).createOrReplaceTempView(f"edge_{et.name}")
            owned.update(mine)
            return self.spark.sql(query)

    def bind_node_type(self, name: str, df: DataFrame, pk: str) -> None:
        """Register an existing DataFrame (e.g. a parquet fixture table)
        as a node type; ``pk`` becomes both the declared PRIMARY KEY and
        the string ``_id``. This is the bulk path: MATCH/UPDATE/DELETE
        compile to full Spark plans over the bound data."""
        with self._lock:
            if self.catalog.node(name) is not None:
                raise EngineError(f"node {name!r} already exists")
            fields = tuple(
                FieldSpec(name=f.name, type=_spark_to_type_spec(f.dataType), not_null=False)
                for f in df.schema.fields
            )
            nt = NodeType(name=name, fields=fields, pk=pk)
            self.catalog = self.catalog.with_node(nt)
            base = df.withColumn(ID_COLUMN, F.col(pk).cast("string")).select(
                ID_COLUMN, *[f.name for f in df.schema.fields]
            )
            self.tables[("node", name)] = _Table(base.schema, base=base)

    def bind_edge_type(
        self,
        name: str,
        df: DataFrame,
        src: str,
        dst: str,
        from_label: str,
        to_label: str,
    ) -> None:
        """Register an existing DataFrame (e.g. a parquet fixture) as an
        edge type between two bound/stored node types: ``src``/``dst``
        name the foreign-key columns whose values match the endpoint
        types' ``_id`` strings. Remaining columns become edge props.
        This is the bulk path that makes edge-pattern MATCH run as full
        Spark join plans over fixture data."""
        with self._lock:
            if self.catalog.edge(name) is not None:
                raise EngineError(f"edge {name!r} already exists")
            for lbl in (from_label, to_label):
                if self.catalog.node(lbl) is None:
                    raise EngineError(f"node type {lbl!r} does not exist")
            props = tuple(
                FieldSpec(
                    name=f.name, type=_spark_to_type_spec(f.dataType), not_null=False
                )
                for f in df.schema.fields
                if f.name not in (src, dst)
            )
            et = EdgeType(
                name=name,
                from_ep=Endpoint(from_label, Cardinality.MANY),
                to_ep=Endpoint(to_label, Cardinality.MANY),
                props=props,
            )
            self.catalog = self.catalog.with_edge(et)
            base = df.select(
                F.concat(
                    F.lit("edge_"),
                    F.col(src).cast("string"),
                    F.lit("_"),
                    F.col(dst).cast("string"),
                ).alias(ID_COLUMN),
                F.col(src).cast("string").alias(SRC_COLUMN),
                F.col(dst).cast("string").alias(DST_COLUMN),
                *[f.name for f in df.schema.fields if f.name not in (src, dst)],
            )
            self.tables[("edge", name)] = _Table(base.schema, base=base)

    def find(self, pattern: str, edge_type: str, node_type: str | None = None) -> DataFrame:
        """Motif search over a bound/stored edge type: GraphFrames-style
        chain patterns like ``"(a)-[e]->(b); (b)-[e2]->(c)"`` — the
        edge-pattern MATCH the reference's grammar cannot express
        (parser.go:685 hardcodes node-only elements; SURVEY.md §2.1 #13).

        Motif vertices bind to the label of the endpoint role they
        occupy: src positions join the edge's FROM-label table, dst
        positions the TO-label table (``node_type`` overrides both);
        edges use the stored (_src, _dst) columns.
        """
        from grapho_spark.analytics import find_motif

        et = self.catalog.edge(edge_type)
        if et is None:
            raise EngineError(f"edge type {edge_type!r} does not exist")

        def _nodes(label: str) -> DataFrame:
            return self.node_df(label).withColumnRenamed(ID_COLUMN, "id")

        if node_type or et.from_ep.label == et.to_ep.label:
            vertices: DataFrame | dict[str, DataFrame] = _nodes(
                node_type or et.from_ep.label
            )
        else:
            vertices = {"src": _nodes(et.from_ep.label), "dst": _nodes(et.to_ep.label)}
        edges = (
            self.edge_df(edge_type)
            .withColumnRenamed(SRC_COLUMN, "src")
            .withColumnRenamed(DST_COLUMN, "dst")
        )
        return find_motif(vertices, edges, pattern)

    def table_versions(self, kind: str, name: str) -> list[int]:
        """Flushed parquet versions available for time travel (ascending;
        empty for in-memory engines or never-flushed tables). Clamped
        to the table's COMMITTED version: a dir published by a flush
        that crashed before its manifest write (rename done, manifest
        not) is invisible until the re-run flush overwrites it —
        uncommitted state must never be servable via AS OF."""
        if not self.data_dir:
            return []
        tdir = os.path.join(self.data_dir, "tables", f"{kind}_{name}")
        try:
            entries = os.listdir(tdir)
        except FileNotFoundError:
            return []
        tab = self.tables.get((kind, name))
        cap = tab.version if tab is not None else None
        out = []
        for e in entries:
            if e.startswith("v") and e[1:].isdigit():
                v = int(e[1:])
                if cap is None or v <= cap:
                    out.append(v)
        return sorted(out)

    def node_df_at(self, name: str, version: int) -> DataFrame:
        """Time travel: the node table as of flush ``version``. The
        engine's copy-on-write flush keeps every version's parquet
        (v1, v2, ...), so old versions stay readable — Delta-style
        time travel on plain parquet. A delta (insert-only) version
        reads as its chain: latest full at-or-below it + deltas since
        (``_chain_paths``). Schema is read as-of the version's chain
        (an ALTER between versions shows the old shape; ALTER forces
        the next flush to start a fresh full chain)."""
        return self._df_at("node", name, version)

    def edge_df_at(self, name: str, version: int) -> DataFrame:
        """Time travel: the edge table as of flush ``version``."""
        return self._df_at("edge", name, version)

    def _is_delta_version(self, kind: str, name: str, v: int) -> bool:
        return os.path.exists(
            os.path.join(
                self.data_dir, "tables", f"{kind}_{name}", f"v{v}", "_DELTA"
            )
        )

    def _bucket_expr(self, n: int) -> Column:
        """Stable hash bucket of a row: pmod(xxhash64(_id), n).
        xxhash64 is a fixed algorithm (seed 42) computed JVM-side, so
        the same _id lands in the same bucket across sessions and
        versions; _id never changes after insert, so bucket membership
        is immutable FOR A GIVEN n — the invariant partition-pruned
        rewrites rest on. ``n`` is the table's live layout count
        (``_tab_bucket_n``); a full rewrite may grow it, rehashing
        everything it writes anyway."""
        return F.pmod(F.xxhash64(F.col(ID_COLUMN)), F.lit(n))

    def _tab_bucket_n(self, tab: _Table) -> int:
        """Bucket count of the table's LIVE layout: the tip chain's
        _BUCKETS.json ``n`` (tracked in tab.bucket_n), else the engine
        floor for tables with no bucket-complete version yet."""
        return tab.bucket_n if tab.bucket_n is not None else self.id_buckets

    def _grown_bucket_n(self, tab: _Table, rows: int) -> int:
        """Adaptive re-bucketing decision at a FULL rewrite: double the
        bucket count until rows/bucket <= target_bucket_rows (grow-only
        — never below the current layout or the id_buckets floor, so
        an already-grown table keeps its granularity across ALTER /
        compact even if it shrank). Doubling keeps the progression
        stable and the file-count overhead geometric, exactly the ANN
        index's cells ∝ √growth discipline applied to storage."""
        n = max(self._tab_bucket_n(tab), self.id_buckets)
        if self.target_bucket_rows is None:
            return n
        while rows > n * self.target_bucket_rows:
            n *= 2
        return n

    def _bucket_map(self, kind: str, name: str, v: int) -> dict | None:
        """The _BUCKETS.json manifest of a bucket-complete version:
        ``{"n": <id_buckets at write>, "map": {"<bucket>": <version
        owning its leaf dir>}}``. None for delta versions, legacy
        whole-dir versions, and missing versions."""
        try:
            with open(
                os.path.join(
                    self.data_dir,
                    "tables",
                    f"{kind}_{name}",
                    f"v{v}",
                    "_BUCKETS.json",
                ),
                encoding="utf-8",
            ) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _chain_versions(self, kind: str, name: str, version: int) -> list[int]:
        """Version numbers composing the table AS OF ``version``
        (ascending): the latest FULL version at-or-below it plus every
        delta version after that full. Delta dirs are self-describing
        via their _DELTA marker, so no manifest history is needed."""
        chain: list[int] = []
        for v in reversed(
            [v for v in self.table_versions(kind, name) if v <= version]
        ):
            chain.append(v)
            if not self._is_delta_version(kind, name, v):
                break
        return sorted(chain)

    def _chain_paths(self, kind: str, name: str, version: int) -> list[str]:
        """Parquet paths composing the table AS OF ``version`` (see
        ``_chain_versions``). Chains have one physical schema: any
        schema-changing or row-mutating operation forces the next
        flush to be a full rewrite; pure-insert chains are compacted
        by a forced full rewrite once they exceed ``max_delta_chain``
        deltas, so no read ever composes an unbounded path list.

        A bucket-complete version (one carrying _BUCKETS.json) expands
        to its bucket leaf dirs, each served from the version that
        last rewrote it — the read side of partition-pruned
        copy-on-write. Leaf dirs are read directly (no basePath), so
        Spark never infers the _gbkt partition column and the physical
        schema stays exactly the table schema."""
        base_dir = os.path.join(self.data_dir, "tables", f"{kind}_{name}")
        paths: list[str] = []
        for v in self._chain_versions(kind, name, version):
            bm = self._bucket_map(kind, name, v)
            if bm is None:
                paths.append(os.path.join(base_dir, f"v{v}"))
            else:
                paths.extend(
                    os.path.join(
                        base_dir, f"v{owner}", f"{BUCKET_COLUMN}={k}"
                    )
                    for k, owner in sorted(
                        bm["map"].items(), key=lambda kv: int(kv[0])
                    )
                )
        return paths

    def _write_sidecars(
        self, kind: str, name: str, tab: _Table, staging: str
    ) -> None:
        """Write the version's _FILES.json inventory (+ zone stats;
        one pyarrow footer pass) and, past the bloom row gate, the
        per-leaf _ZONES blooms over the type's point-lookup fields
        (one column-pruned JVM pass). Runs against the staging dir so
        the atomic rename publishes data + sidecars together."""
        inv = zn.scan_staging(staging, tab.schema)
        zn.write_inventory(staging, inv)
        total = sum(m["rows"] for m in inv["leafs"].values())
        if total >= self.zone_bloom_rows:
            fields = self._bloom_zone_fields(kind, name, tab)
            if fields:
                zn.write_zone_blooms(
                    self.spark, staging, tab.schema, inv, fields
                )

    def _bloom_zone_fields(
        self, kind: str, name: str, tab: _Table
    ) -> list[str]:
        """Fields worth a per-leaf bloom: the PK and UNIQUE-indexed
        fields (the point-predicate surface), restricted to types
        whose Spark/Python string forms agree (the shared md5 hash
        convention of operators/bloom.py)."""
        from grapho_spark.operators.bloom import SparkBloom

        if kind != "node":
            return []
        nt = self.catalog.node(name)
        if nt is None:
            return []
        out: list[str] = []
        for fname in [nt.pk, *(i.field for i in nt.indexes if i.unique)]:
            if (
                fname
                and fname not in out
                and fname in tab.schema.fieldNames()
                and SparkBloom.supports(tab.schema[fname].dataType)
            ):
                out.append(fname)
        return out

    def _inventory(self, kind: str, name: str, version: int) -> dict | None:
        key = (kind, name, version)
        if key not in self._inv_cache:
            self._inv_cache[key] = zn.load_inventory(
                os.path.join(
                    self.data_dir, "tables", f"{kind}_{name}", f"v{version}"
                )
            )
        return self._inv_cache[key]

    def _leaf_blooms(
        self, kind: str, name: str, version: int, leaf: str
    ) -> dict:
        """field -> bloom tuple for one leaf of a version (loaded and
        regrouped once per version, then cached)."""
        key = (kind, name, version)
        grouped = self._zone_cache.get(key)
        if grouped is None:
            flat = zn.load_zone_blooms(
                os.path.join(
                    self.data_dir, "tables", f"{kind}_{name}", f"v{version}"
                )
            )
            grouped = {}
            for (lf, fld), bloom in flat.items():
                grouped.setdefault(lf, {})[fld] = bloom
            self._zone_cache[key] = grouped
        return grouped.get(leaf, {})

    def _drop_sidecar_caches(self, kind: str, name: str) -> None:
        """Purge cached sidecars of a table whose identity is being
        recycled (DROP; a later CREATE restarts version numbering, so
        stale (kind, name, v) entries would serve the old table)."""
        for cache in (self._inv_cache, self._zone_cache):
            for k in [k for k in cache if k[0] == kind and k[1] == name]:
                del cache[k]

    def _chain_read(
        self,
        kind: str,
        name: str,
        version: int,
        schema: ST.StructType | None = None,
        prune_groups: list | None = None,
    ) -> tuple[DataFrame, bool]:
        """The table AS OF ``version`` read from the per-version file
        manifests: explicit file paths (no directory listing — the
        100-TB metadata fix, VERDICT r12 #1) with the recorded
        physical schema (no footer inference). A chain member or leaf
        without an inventory (pre-r13 dirs) falls back to its dir
        path; ``prune_groups`` (compiled WHERE, engine/zones.py)
        drops leafs whose zone stats/bloom prove no base row can
        match. Returns (df, pruned_any)."""
        base_dir = os.path.join(self.data_dir, "tables", f"{kind}_{name}")
        paths: list[str] = []
        pruned_any = False
        kept_leafs = total_leafs = 0
        read_schema = schema
        chain = self._chain_versions(kind, name, version)
        if read_schema is None:
            # the chain has ONE physical schema; the newest member
            # with an inventory recorded it at write time
            for v in reversed(chain):
                inv = self._inventory(kind, name, v)
                if inv is not None:
                    read_schema = ST.StructType.fromJson(inv["schema"])
                    break
        records: list[tuple[int, str, str, dict | None]] = []
        for v in chain:
            bm = self._bucket_map(kind, name, v)
            if bm is None:
                entries = [(v, zn.ROOT_LEAF, os.path.join(base_dir, f"v{v}"))]
            else:
                entries = [
                    (
                        int(o),
                        k,
                        os.path.join(base_dir, f"v{o}", f"{BUCKET_COLUMN}={k}"),
                    )
                    for k, o in sorted(
                        bm["map"].items(), key=lambda kv: int(kv[0])
                    )
                ]
            for owner, leaf_key, ldir in entries:
                inv = self._inventory(kind, name, owner)
                meta = None if inv is None else inv["leafs"].get(leaf_key)
                records.append((owner, leaf_key, ldir, meta))
        # Bloom candidate selection: below bloom_semijoin_leafs the
        # driver probes cached per-version bitmaps; above it, ONE
        # distributed job probes the _ZONES sidecars where they live
        # and only absent-verdicts come back (probed is then the
        # verdict map, possibly empty = stats-only pruning).
        probed: dict | None = None
        if prune_groups is not None:
            total_leafs = sum(1 for r in records if r[3] is not None)
            if total_leafs > self.bloom_semijoin_leafs:
                probed = {}
                probes = zn.collect_eq_probes(prune_groups)
                if probes:
                    zdirs = [
                        (owner, zp)
                        for owner in sorted(
                            {r[0] for r in records if r[3] is not None}
                        )
                        if os.path.exists(
                            zp := os.path.join(
                                base_dir, f"v{owner}", zn.ZONES_NAME
                            )
                        )
                    ]
                    if zdirs:
                        probed = zn.probe_zone_blooms_distributed(
                            self.spark, zdirs, probes
                        )
        for owner, leaf_key, ldir, meta in records:
            if meta is None:
                paths.append(ldir)  # legacy dir: list, never prune
                continue
            if prune_groups is not None:
                stats = meta.get("_stats")
                if stats is None:
                    stats = meta["_stats"] = zn.decode_leaf_stats(
                        meta,
                        read_schema
                        if read_schema is not None
                        else ST.StructType([]),
                    )
                blooms = (
                    probed.get((owner, leaf_key), {})
                    if probed is not None
                    else self._leaf_blooms(kind, name, owner, leaf_key)
                )
                if not zn.leaf_may_match(
                    prune_groups, stats, blooms, meta["rows"]
                ):
                    pruned_any = True
                    continue
                kept_leafs += 1
            paths.extend(os.path.join(ldir, f[0]) for f in meta["files"])
        if prune_groups is not None and total_leafs > 0:
            # total_leafs == 0 means every element was legacy/no-
            # inventory (nothing was prunable) — an audit line reading
            # "kept 0/0" would suggest everything was pruned (ADVICE
            # r13), so only prunable reads are recorded. The mode
            # names which candidate-selection path ran (r14): the
            # driver bitmap loop or the distributed _ZONES probe job.
            self._prune_log.append(
                (
                    kind,
                    name,
                    kept_leafs,
                    total_leafs,
                    "job" if probed is not None else "driver",
                )
            )
        if not paths:
            tab = self.tables.get((kind, name))
            empty_schema = (
                read_schema
                if read_schema is not None
                else (tab.schema if tab is not None else ST.StructType([]))
            )
            return self.spark.createDataFrame([], empty_schema), pruned_any
        reader = self.spark.read
        if read_schema is not None:
            reader = reader.schema(read_schema)
        return reader.parquet(*paths), pruned_any

    def _df_at(
        self,
        kind: str,
        name: str,
        version: int,
        prune_groups: list | None = None,
    ) -> DataFrame:
        if not self.data_dir:
            raise EngineError("time travel needs a durable engine (data_dir)")
        # membership via table_versions, not raw path existence: an
        # orphan dir published by a crashed flush (rename done,
        # manifest not) sits above the committed version and must not
        # be servable as history
        have = self.table_versions(kind, name)
        if version not in have:
            raise EngineError(
                f"{kind} {name!r} has no version {version} "
                f"(available: {have or 'none'})"
            )
        # A version dir kept past retention ONLY because later maps
        # still reference some of its bucket leaf dirs is leaf-GC'd
        # (_LEAF_GC marker): its unreferenced leafs are gone, so a
        # direct AS OF read would silently return partial state.
        # Refuse with the same shape as a pruned version.
        if os.path.exists(
            os.path.join(
                self.data_dir, "tables", f"{kind}_{name}", f"v{version}",
                "_LEAF_GC",
            )
        ):
            servable = [
                v
                for v in have
                if not os.path.exists(
                    os.path.join(
                        self.data_dir, "tables", f"{kind}_{name}",
                        f"v{v}", "_LEAF_GC",
                    )
                )
            ]
            raise EngineError(
                f"{kind} {name!r} version {version} was retained only as "
                f"a bucket-leaf dependency of newer versions and is no "
                f"longer directly servable (leaf-GC'd by retention; "
                f"servable: {servable or 'none'})"
            )
        # manifest-built read: explicit files + recorded schema when
        # the chain carries inventories, dir-listing fallback when not
        # (an empty chain — DELETE emptied the table before that flush
        # — reads as an empty frame with the best-known schema)
        return self._chain_read(kind, name, version, prune_groups=prune_groups)[0]

    def history(self) -> list[dict]:
        """Catalog version history (time-travel audit) reconstructed
        from the DDL event log; empty for in-memory engines."""
        if not self.catalog_store:
            return []
        return self.catalog_store.history()

    def flush(self, retain_log: bool = False) -> None:
        """Persist buffered rows / materialized tables as new parquet
        versions and advance the manifest. Insert-only changes write
        an O(delta) APPEND version (r9); mutated/migrated tables write
        the full copy-on-write rewrite, which doubles as chain
        compaction.

        ``retain_log=True`` additionally drops sealed commit-log
        segments wholly below the now-durable manifest offset (needs
        ``log_segment_bytes``; a no-op on single-file logs). EXPLICIT
        opt-in: dropped records become unreadable, so coordinate with
        CDC/export consumers first — Kafka-retention semantics, and
        the CDC exporter fails loudly if retention outran it."""
        if not self.data_dir:
            return
        with self._lock:
            if self._commitlog is not None:
                self._commitlog.sync()  # group-fsync boundary: flush is durable
            versions: dict[str, int] = {}
            for (kind, name), tab in self.tables.items():
                key = f"{kind}_{name}"
                if (
                    tab.buffer
                    or tab.dirty
                    or tab.base_dirty  # ALTER migrates base without setting dirty
                    or tab.base is None
                    or tab.version == 0
                ):
                    # INSERT-only changes on an already-flushed table
                    # write an O(delta) APPEND version (just the
                    # buffered rows + a _DELTA marker making the chain
                    # self-describing on disk) instead of the O(table)
                    # copy-on-write rewrite — appends dominate a
                    # production ingest workload, so the common flush
                    # is delta-sized. UPDATE/DELETE/ALTER set
                    # base_dirty and keep the full rewrite (which also
                    # acts as compaction of any prior delta chain).
                    delta = (
                        tab.base is not None
                        and tab.version > 0
                        and bool(tab.buffer)
                        and not tab.base_dirty
                        # Auto-compaction: a pure-ingest workload never
                        # mutates, so without a cap the chain (and the
                        # per-read path list, and retention's protected
                        # set) would grow one dir per flush forever.
                        # Once the live chain carries max_delta_chain
                        # deltas, the next flush is a full compacting
                        # rewrite — Delta/Iceberg-style OPTIMIZE,
                        # amortized O(table / max_delta_chain) per flush.
                        and len(self._chain_versions(kind, name, tab.version))
                        <= self.max_delta_chain
                    )
                    prev = tab.version
                    tab.version += 1
                    path = os.path.join(self.data_dir, "tables", key, f"v{tab.version}")
                    # Staged publish: write parquet AND the _DELTA /
                    # _BUCKETS.json markers into v<N>.staging, then
                    # rename into place. A crash anywhere before the
                    # rename leaves only a .staging dir, which
                    # table_versions/_chain_paths never read — so a
                    # half-written version (or a delta missing its
                    # marker, which a chain read would misclassify as
                    # FULL) is never servable.
                    staging = path + ".staging"
                    shutil.rmtree(staging, ignore_errors=True)
                    partial_written = False
                    if delta:
                        self._buffer_df(tab).write.mode("overwrite").parquet(
                            staging
                        )
                        with open(os.path.join(staging, "_DELTA"), "w") as mk:
                            mk.write("delta\n")
                    else:
                        partial_written = self._write_bucketed(
                            kind, name, tab, prev, staging
                        )
                    if self.zone_stats:
                        self._write_sidecars(kind, name, tab, staging)
                    # a complete v-dir here is an orphan of a flush that
                    # crashed after rename but before its manifest
                    # publish (never committed, hidden by the
                    # table_versions clamp) — superseded by this rewrite
                    shutil.rmtree(path, ignore_errors=True)
                    os.replace(staging, path)
                    # the replace may have overwritten an orphan dir a
                    # prior crashed flush left under the same version
                    # number — any sidecar cached from it is stale
                    self._inv_cache.pop((kind, name, tab.version), None)
                    self._zone_cache.pop((kind, name, tab.version), None)
                    # Mutation side files now folded into the published
                    # version: deletable once no lazy plan references
                    # them (immediately on a fresh chain rebuild below;
                    # deferred past keep-composed refreshes, which keep
                    # reading them).
                    side_paths = [
                        ref for op, ref in tab.mut_parts if op != "fold"
                    ]
                    if delta and tab.base is not None:
                        # O(delta) base refresh: the new state is the
                        # prior chain read (tab.base, untouched by
                        # pure inserts) UNION the one new delta dir —
                        # composing avoids relisting every bucket leaf
                        # dir of the chain per ingest flush (measured
                        # 5.4s/flush at 2048 leafs in the x100 probe,
                        # pure driver-side path listing for a 1-row
                        # write). The union depth is bounded by
                        # max_delta_chain; the next full rewrite
                        # rebuilds from a fresh listing below.
                        tab.base = tab.base.union(
                            self.spark.read.schema(tab.schema).parquet(path)
                        )
                        tab.base_layers += 1
                    else:
                        # Fresh chain rebuild: explicit-file manifest
                        # read when inventories exist (no dir
                        # listing), dir-path fallback otherwise. A
                        # keep-composed branch used to reuse the
                        # pre-flush merge-on-read plan here to dodge
                        # a ~5s O(leafs) dir relist; the r13
                        # manifests removed the relist and the r14
                        # measurement (scripts/keepcomposed_probe.py,
                        # PERF.md) showed fresh strictly faster at
                        # x10 AND x100 (flush 5.9s vs 9.0s, post-
                        # flush count 0.7s vs 2.1s at 15M rows — the
                        # composed plan's depth costs more than the
                        # manifest read), so the branch was deleted
                        # (VERDICT r13 #4) and every partial-rewrite
                        # flush now also reclaims its side files
                        # eagerly.
                        tab.base, _ = self._chain_read(
                            kind, name, tab.version, schema=tab.schema
                        )
                        tab.base_layers = 0
                        # nothing references the folded side files
                        # anymore — reclaim this table's scratch
                        for sp in side_paths:
                            shutil.rmtree(sp, ignore_errors=True)
                    tab.buffer = []
                    tab.dirty = False
                    tab.base_dirty = False
                    tab.touched_buckets = set()
                    tab.mut_parts = []
                versions[key] = tab.version
            self._commit_offset = self._count_commit_lines()
            # Snapshot the catalog BEFORE publishing the engine manifest:
            # the manifest advances commit_offset past the flushed DML, so
            # every type it references must already be recoverable from
            # the snapshot. The reverse order had a crash window where
            # types created since the last snapshot were skipped at boot
            # (schema None in _load_manifest_and_tables) while their DML
            # sat below commit_offset — silently losing flushed rows.
            ev_offset = 0
            if self.catalog_store:
                self.catalog_store.write_snapshot(self.catalog)
                ev_offset = self.catalog_store.snap_offset()
            manifest = {
                "next_id": self.next_id,
                "commit_offset": self._commit_offset,
                # The catalog event offset this manifest is consistent
                # with: boot reconciles a snapshot that ran AHEAD of the
                # manifest (crash between the two writes) back to this
                # offset via full event replay, restoring the invariant
                # that unflushed DML replays against the same catalog it
                # originally ran against.
                "ev_offset": ev_offset,
                "seq": self._seq,
                "versions": versions,
            }
            tmp = self._manifest_path() + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(manifest, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._manifest_path())
            # Retention GC runs strictly AFTER the manifest publish: a
            # crash mid-prune can only leave extra old versions behind
            # (re-pruned next flush), never touch a version the
            # manifest references.
            if self.keep_versions is not None:
                self._prune_versions()
            if retain_log and self._commitlog is not None:
                # same publish-then-GC discipline for the LOG: only
                # sealed segments wholly below the now-durable
                # commit_offset are dropped, so a crash mid-retention
                # leaves extra old segments, never a replay gap
                self._commitlog.retain_below(self._commit_offset)

    def compact(self, kind: str | None = None, name: str | None = None) -> None:
        """Explicit OPTIMIZE: force a FULL compacting rewrite of the
        selected flushed tables (default: every flushed table) and run
        the flush. Collapses delta chains and bucket owner maps into
        one fresh bucket-complete version, after which retention GC
        can free every older dir nothing references. The automatic
        triggers (``max_delta_chain`` on insert chains, the
        owner-spread cap on partial rewrites) bound growth on their
        own; this reclaims immediately — the maintenance-window job a
        100 TB deployment schedules off-peak, exactly Delta/Iceberg
        OPTIMIZE."""
        with self._lock:
            for (k, n), tab in self.tables.items():
                if kind is not None and k != kind:
                    continue
                if name is not None and n != name:
                    continue
                if tab.version == 0:
                    continue  # never flushed: nothing to compact
                tab.base_dirty = True
                tab.touched_buckets = None  # None = force the full path
            self.flush()

    def _prune_versions(self) -> None:
        """Delete flushed parquet version dirs older than the retention
        window (``keep_versions`` most recent per table). Time travel
        to a pruned version raises the normal no-such-version error,
        which lists what survives. A FULL version (and intermediate
        deltas) that a retained version's chain depends on is never
        pruned, even when it falls outside the window — pruning it
        would corrupt every retained version built on it.

        A version that survives ONLY because retained _BUCKETS.json
        maps still reference some of its bucket leaf dirs is pruned
        LEAF-GRANULARLY (r11): the leafs no retained read references
        are deleted and a ``_LEAF_GC`` marker makes the now-partial
        dir unservable as a direct AS OF anchor (it was never part of
        servable history after falling out of the window — only its
        referenced leafs are). Without this, a mutation-heavy
        workload pinned every historical version dir WHOLE as long as
        one of its buckets stayed un-rewritten — unbounded protected
        storage the r10 owner-spread cap only bounds in dir count,
        not bytes. The marker is written BEFORE any leaf is deleted,
        so a crash mid-GC can only leave extra leafs behind a marker
        that already refuses direct reads, never a silently-partial
        servable version."""
        for (kind, name), tab in self.tables.items():
            all_vs = self.table_versions(kind, name)
            base_dir = os.path.join(self.data_dir, "tables", f"{kind}_{name}")
            # whole dirs every retained read traverses (chain members:
            # full anchors + deltas), and the exact (owner, bucket)
            # leaf pairs those reads reference through bucket maps
            needed: set[int] = set()
            needed_leafs: set[tuple[int, int]] = set()
            for v in all_vs:
                if v > tab.version - self.keep_versions:
                    for c in self._chain_versions(kind, name, v):
                        needed.add(c)
                        bm = self._bucket_map(kind, name, c)
                        if bm is not None:
                            for k, o in bm["map"].items():
                                needed_leafs.add((int(o), int(k)))
            owners = {o for o, _ in needed_leafs}
            for v in all_vs:
                if v > tab.version - self.keep_versions or v in needed:
                    continue  # in-window or chain-needed: keep whole
                vdir = os.path.join(base_dir, f"v{v}")
                if v not in owners:
                    shutil.rmtree(vdir, ignore_errors=True)
                    continue
                # Owner-only survivor: shed the unreferenced leafs.
                # The marker is unconditional — even with nothing to
                # shed, the dir is past retention and its OWN map may
                # reference sub-owners that were pruned, so it is no
                # longer directly-servable history either way.
                keep = {k for o, k in needed_leafs if o == v}
                victims = [
                    e
                    for e in os.listdir(vdir)
                    if e.startswith(f"{BUCKET_COLUMN}=")
                    and int(e.split("=", 1)[1]) not in keep
                ]
                marker = os.path.join(vdir, "_LEAF_GC")
                if not os.path.exists(marker):
                    with open(marker, "w") as mk:
                        mk.write("leaf-gc\n")
                for e in victims:
                    shutil.rmtree(os.path.join(vdir, e), ignore_errors=True)

    def _buffer_buckets(self, tab: _Table) -> set[int]:
        """Hash buckets of the driver-held buffer rows — a buffer-sized
        Spark job (the bucket hash must be the JVM xxhash64, so it is
        never computed driver-side)."""
        buf = self._buffer_df(tab)
        if buf is None:
            return set()
        return {
            int(r["b"])
            for r in buf.select(
                self._bucket_expr(self._tab_bucket_n(tab)).alias("b")
            )
            .distinct()
            .collect()
        }

    def _write_bucketed(
        self, kind: str, name: str, tab: _Table, prev: int, staging: str
    ) -> bool:
        """Write a bucket-complete (non-delta) version into ``staging``:
        the table laid out as ``_gbkt=<k>`` hash-bucket leaf dirs plus
        a _BUCKETS.json owner map.

        When every mutated bucket since the last flush is known
        (UPDATE/DELETE recorded them; no ALTER; the prior tip is
        bucket-complete under the table's live bucket count), only
        those buckets are rewritten and the rest INHERIT their leaf
        dirs from the prior map — mutation flush I/O becomes
        O(touched · rows/bucket) instead of O(table), the
        partition-pruned copy-on-write the O(delta) insert path
        already gets for appends. Anything else (legacy whole-dir tip,
        delta tip needing compaction, schema migration, first flush)
        falls back to the full rewrite, which also migrates the layout
        and — with ``target_bucket_rows`` set — GROWS the bucket count
        to fit the table's current size (adaptive re-bucketing), so
        per-bucket rewrite cost stays bounded as the table grows."""
        parent = self._bucket_map(kind, name, prev) if prev > 0 else None
        partial = (
            tab.base_dirty
            and tab.touched_buckets is not None
            and bool(tab.touched_buckets)
            and parent is not None
            and parent.get("n") == self._tab_bucket_n(tab)
            and not self._is_delta_version(kind, name, prev)
        )
        touched = {int(b) for b in tab.touched_buckets or ()}
        if partial and tab.buffer:
            # post-mutation inserts ride the same partial rewrite;
            # their buckets come from a buffer-sized job, never a
            # table scan
            touched |= self._buffer_buckets(tab)
        if partial:
            # Owner-spread cap (the partial-rewrite twin of
            # max_delta_chain): each partial rewrite can leave the map
            # referencing one more version dir, and retention must keep
            # every referenced dir whole — unbounded spread would mean
            # unbounded protected storage and path-list diversity on a
            # mutation-dominated workload. Once a rewrite would leave
            # more than max_delta_chain owner versions, compact with a
            # full rewrite instead.
            inherited = {
                int(o)
                for k, o in parent["map"].items()
                if int(k) not in touched
            }
            if len(inherited) + 1 > self.max_delta_chain:
                partial = False
        if partial and tab.mut_parts:
            # Merge-on-read flush: start from ONLY the touched
            # buckets' leaf dirs of the parent layout and replay the
            # pending mutation side files onto them — the read side of
            # a mutation flush is O(touched · rows/bucket + matched),
            # never an O(table) scan of the composed view. Buckets
            # absent from the parent map held no rows (folded inserts
            # may create them; those rows ride in via the fold/buffer
            # frames). A rebase layer restarts from a full snapshot —
            # the _gbkt filter below still prunes the write to touched.
            base_dir = os.path.join(self.data_dir, "tables", f"{kind}_{name}")
            leaf_paths = [
                os.path.join(
                    base_dir,
                    f"v{parent['map'][str(b)]}",
                    f"{BUCKET_COLUMN}={b}",
                )
                for b in sorted(touched)
                if str(b) in parent["map"]
            ]
            start = (
                self.spark.read.schema(tab.schema).parquet(*leaf_paths)
                if leaf_paths
                else self.spark.createDataFrame([], tab.schema)
            )
            df = self._compose_mut_parts(tab, start)
            buf_df = self._buffer_df(tab)
            if buf_df is not None:
                df = df.unionByName(buf_df)
        else:
            df = self._merged_df((kind, name))
        if partial:
            # a partial rewrite NEVER re-buckets: it must hash with the
            # exact n of the layout it inherits leaf dirs from
            n = int(parent["n"])
        else:
            # full rewrites are the re-bucketing point: when adaptive
            # growth is on, one count (parquet-footer-cheap on the
            # flushed chain; the rewrite scans the table anyway)
            # decides the new layout's bucket count
            n = self._grown_bucket_n(
                tab,
                df.count() if self.target_bucket_rows is not None else 0,
            )
        df = df.withColumn(BUCKET_COLUMN, self._bucket_expr(n))
        if partial:
            df = df.filter(F.col(BUCKET_COLUMN).isin(sorted(touched)))
        # one task per bucket keeps leaf dirs to O(1) files; at cluster
        # scale the repartition is the standard dynamic-partition write.
        # A PARTIAL rewrite sizes the shuffle by the touched-bucket
        # count, not the layout width — a point mutation at n=2048
        # otherwise schedules 2047 empty tasks (measured ~6s of pure
        # scheduling at the x100 probe). Bucket collisions within a
        # task are fine: partitionBy still splits them into their own
        # leaf dirs.
        num = max(len(touched), 1) if partial else n
        (
            df.repartition(num, F.col(BUCKET_COLUMN))
            .write.mode("overwrite")
            .partitionBy(BUCKET_COLUMN)
            .parquet(staging)
        )
        present = {
            int(e.split("=", 1)[1])
            for e in os.listdir(staging)
            if e.startswith(f"{BUCKET_COLUMN}=")
        }
        if partial:
            bmap = dict(parent["map"])
            for k in touched:
                if k in present:
                    bmap[str(k)] = tab.version
                else:
                    # the rewrite emptied this bucket (DELETE took its
                    # last row) — dropping the entry is what deletes it
                    bmap.pop(str(k), None)
        else:
            bmap = {str(k): tab.version for k in sorted(present)}
        with open(
            os.path.join(staging, "_BUCKETS.json"), "w", encoding="utf-8"
        ) as f:
            json.dump({"n": n, "map": bmap}, f)
        # the new layout's n becomes the table's live bucket count —
        # every later touched-bucket recording and partial rewrite
        # hashes with it
        tab.bucket_n = n
        return partial

    # ------------------------------------------------------- persistence

    def _manifest_path(self) -> str:
        return os.path.join(self.data_dir, "ENGINE-MANIFEST.json")

    def commit_records(self) -> list[str]:
        """RETAINED complete commit-log records (format-agnostic;
        torn/corrupt tails excluded) — the read surface for replay and
        CDC export. Record i has GLOBAL index commit_base() + i (log
        retention drops whole sealed segments from the head)."""
        if self._commitlog is None:
            return []
        return self._commitlog.records()

    def commit_base(self) -> int:
        """Global index of the first retained commit-log record."""
        return 0 if self._commitlog is None else self._commitlog.base_offset()

    def _count_commit_lines(self) -> int:
        return self.commit_base() + len(self.commit_records())

    def _max_logged_seq(self) -> int:
        """Max sequence number present in the commit log (0 if none) —
        tolerant of corrupt records, which carry no usable seq anyway."""
        mx = 0
        for line in self.commit_records():
            try:
                s = json.loads(line).get("seq")
            except (json.JSONDecodeError, AttributeError):
                continue
            if isinstance(s, int) and s > mx:
                mx = s
        return mx

    def _manifest_ev_offset(self) -> int | None:
        """Catalog event offset recorded at the last flush. No manifest
        at all means nothing was ever flushed — the consistent point is
        offset 0 (covers a crash during the FIRST flush, after the
        catalog snapshot but before the manifest publish). A manifest
        without the field (legacy layout) returns None: trust its
        snapshot as-is."""
        try:
            with open(self._manifest_path(), encoding="utf-8") as f:
                v = json.load(f).get("ev_offset")
            return v if isinstance(v, int) else None
        except FileNotFoundError:
            return 0

    def _load_manifest_and_tables(self) -> None:
        try:
            with open(self._manifest_path(), encoding="utf-8") as f:
                manifest = json.load(f)
        except FileNotFoundError:
            return
        self.next_id = manifest.get("next_id", 1)
        self._commit_offset = manifest.get("commit_offset", 0)
        self._seq = manifest.get("seq", 1)
        for key, version in manifest.get("versions", {}).items():
            kind, name = key.split("_", 1)
            schema = None
            if kind == "node":
                nt = self.catalog.node(name)
                schema = node_struct(nt) if nt else None
            else:
                et = self.catalog.edge(name)
                schema = edge_struct(et) if et else None
            if schema is None or version == 0:
                continue
            path = os.path.join(self.data_dir, "tables", key, f"v{version}")
            if os.path.exists(path):
                chain = self._chain_paths(kind, name, version)
                base = (
                    self.spark.read.schema(schema).parquet(*chain)
                    if chain
                    else self.spark.createDataFrame([], schema)
                )
                # restore the live layout's bucket count from the tip
                # chain's bucket-complete version (its first element),
                # so reopen continues partial rewrites at the GROWN
                # granularity instead of resetting to the engine floor
                cvs = self._chain_versions(kind, name, version)
                bm = self._bucket_map(kind, name, cvs[0]) if cvs else None
                self.tables[(kind, name)] = _Table(
                    schema,
                    base=base,
                    version=version,
                    bucket_n=int(bm["n"]) if bm else None,
                )

    def _read_commit_entries(self) -> list[tuple[int | None, ast.Stmt]]:
        """Decode commit-log lines past the manifest offset as
        (seq, stmt), stopping at the first corrupt line. Accepts both
        the seq-wrapped format and bare statement dicts (pre-seq logs)."""
        out: list[tuple[int | None, ast.Stmt]] = []
        for line in self.commit_records()[max(0, self._commit_offset - self.commit_base()) :]:
            try:
                obj = json.loads(line)
                if isinstance(obj, dict) and "stmt" in obj and "__type__" not in obj:
                    out.append((obj.get("seq"), _from_jsonable(obj["stmt"])))
                else:
                    out.append((None, _from_jsonable(obj)))
            except (json.JSONDecodeError, KeyError, TypeError):
                break  # corruption tolerance: stop, keep best effort
        return out

    def _replay_logs(self, ev_offset: int) -> None:
        """Replay unflushed DDL + DML interleaved by global sequence
        number, preserving original statement order. Entries without a
        seq (pre-seq logs) keep the legacy DDL-before-DML order. The
        first statement that fails to apply stops replay (same
        best-effort contract as the corruption path)."""
        assert self.catalog_store is not None
        ddl = self.catalog_store.read_events(ev_offset)
        dml = self._read_commit_entries()
        items = sorted(
            [(s if s is not None else 0, 0, i) for i, (s, _) in enumerate(ddl)]
            + [(s if s is not None else 0, 1, i) for i, (s, _) in enumerate(dml)]
        )
        self._replaying = True
        try:
            for seq_key, src, idx in items:
                seq, stmt = (ddl if src == 0 else dml)[idx]
                try:
                    self._execute_stmt(stmt)
                except EngineError:
                    break
                if seq is not None and seq >= self._seq:
                    self._seq = seq + 1
        finally:
            self._replaying = False

    def _next_seq(self) -> int:
        s = self._seq
        self._seq = s + 1
        return s

    def _log_dml(self, stmt: ast.Stmt) -> None:
        if not self.data_dir or self._replaying:
            return
        entry = {"seq": self._next_seq(), "stmt": _to_jsonable(stmt)}
        self._commitlog.append(json.dumps(entry, separators=(",", ":")))

    # -------------------------------------------------------- dispatch

    def _execute_stmt(self, stmt: ast.Stmt) -> StatementResult:
        # statement-scoped: the zone-pruning audit never accumulates
        # across statements (a long OLTP session would otherwise grow
        # one tuple per pruned read forever)
        self._prune_log.clear()
        if isinstance(
            stmt,
            (
                ast.CreateNodeStmt,
                ast.CreateEdgeStmt,
                ast.AlterNodeStmt,
                ast.AlterEdgeStmt,
                ast.DropNodeStmt,
                ast.DropEdgeStmt,
            ),
        ):
            return self._execute_ddl(stmt)
        if isinstance(stmt, ast.InsertNodeStmt):
            return self._insert_node(stmt)
        if isinstance(stmt, ast.InsertEdgeStmt):
            return self._insert_edge(stmt)
        if isinstance(stmt, (ast.UpdateNodeStmt, ast.UpdateEdgeStmt)):
            return self._update(stmt)
        if isinstance(stmt, (ast.DeleteNodeStmt, ast.DeleteEdgeStmt)):
            return self._delete(stmt)
        if isinstance(stmt, ast.MatchStmt):
            return self._match(stmt)
        if isinstance(stmt, ast.ExplainStmt):
            return self._explain(stmt)
        if isinstance(stmt, ast.ShowStmt):
            return self._show(stmt)
        if isinstance(stmt, ast.DescribeStmt):
            return self._describe(stmt)
        raise EngineError(f"unsupported statement: {type(stmt).__name__}")

    # ------------------------------------------------------------- DDL

    def _execute_ddl(self, stmt: ast.Stmt) -> StatementResult:
        try:
            new_cat = apply_ddl(self.catalog, stmt)
        except DDLError as e:
            raise EngineError(str(e)) from e
        # persist-before-publish (catalog/registry.go:100-114)
        if self.catalog_store and not self._replaying:
            self.catalog_store.append_event(stmt, seq=self._next_seq())
        old_cat = self.catalog
        self.catalog = new_cat
        self._migrate_tables(old_cat, stmt)
        # Auto-compaction: every snapshot_every events, run a FULL
        # flush — snapshotting the catalog alone would advance the DDL
        # replay offset past events whose sequence numbers interleave
        # with still-unflushed DML, breaking ordered replay (e.g. DROP
        # + CREATE same name after an unflushed INSERT). flush() keeps
        # snapshot, table versions, and commit offset consistent.
        if (
            self.catalog_store
            and not self._replaying
            and self.catalog_store.events_since_snapshot()
            >= self.catalog_store.snapshot_every
        ):
            self.flush()
        return StatementResult(
            "ddl", f"OK (catalog version {new_cat.version})", count=0
        )

    def _migrate_tables(self, old_cat: Catalog, stmt: ast.Stmt) -> None:
        if isinstance(stmt, ast.CreateNodeStmt):
            nt = self.catalog.node(stmt.name)
            self.tables[("node", stmt.name)] = _Table(node_struct(nt))
        elif isinstance(stmt, ast.CreateEdgeStmt):
            et = self.catalog.edge(stmt.name)
            self.tables[("edge", stmt.name)] = _Table(edge_struct(et))
        elif isinstance(stmt, ast.DropNodeStmt):
            self._reclaim_table_scratch(self.tables.pop(("node", stmt.name), None))
            self._drop_sidecar_caches("node", stmt.name)
        elif isinstance(stmt, ast.DropEdgeStmt):
            self._reclaim_table_scratch(self.tables.pop(("edge", stmt.name), None))
            self._drop_sidecar_caches("edge", stmt.name)
        elif isinstance(stmt, (ast.AlterNodeStmt, ast.AlterEdgeStmt)):
            kind = "node" if isinstance(stmt, ast.AlterNodeStmt) else "edge"
            key = (kind, stmt.name)
            tab = self.tables.get(key)
            if tab is None:
                return
            if kind == "node":
                new_schema = node_struct(self.catalog.node(stmt.name))
            else:
                new_schema = edge_struct(self.catalog.edge(stmt.name))
            df = self._merged_df(key)
            for f in new_schema.fields:
                if f.name not in df.columns:
                    df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
                elif df.schema[f.name].dataType != f.dataType:
                    df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
            df = df.select(*[f.name for f in new_schema.fields])
            # the migrated base must flush as a FULL rewrite: old
            # version files carry the old physical schema, so no
            # bucket leaf dir can be inherited (touched_buckets=None)
            self.tables[key] = _Table(
                new_schema,
                base=df.localCheckpoint(),
                version=tab.version,
                base_dirty=True,
                touched_buckets=None,
                # the forced full rewrite may re-bucket, but until it
                # runs the GROWN granularity must survive the ALTER
                bucket_n=tab.bucket_n,
            )
            # localCheckpoint materialized the composed view: the old
            # table's pending mutation side files are unreferenced now
            self._reclaim_table_scratch(tab)

    @staticmethod
    def _reclaim_table_scratch(tab: "_Table | None") -> None:
        """Reclaim a replaced/popped table's pending mutation scratch
        (its non-fold mut_parts dirs). ALTER rebuilds
        the _Table from a materialized localCheckpoint and DROP
        discards the table outright, so nothing references the side
        files afterwards — without this they persist until the
        process dies and a later engine open sweeps them (ADVICE
        r13; flush/rebase/unique-abort already reclaim their own)."""
        if tab is None:
            return
        for op, ref in tab.mut_parts:
            if op != "fold":
                shutil.rmtree(ref, ignore_errors=True)
        tab.mut_parts = []

    # ------------------------------------------------------------ tables

    def _table(self, kind: str, name: str) -> _Table:
        tab = self.tables.get((kind, name))
        if tab is None:
            raise EngineError(f"{kind} type {name!r} does not exist")
        return tab

    def _buffer_df(self, tab: _Table) -> DataFrame | None:
        if not tab.buffer:
            return None
        rows = [
            tuple(r.get(f.name) for f in tab.schema.fields) for r in tab.buffer
        ]
        return self.spark.createDataFrame(rows, tab.schema)

    def _merged_df(self, key: tuple[str, str]) -> DataFrame:
        tab = self.tables[key]
        buf_df = self._buffer_df(tab)
        if tab.base is not None and buf_df is not None:
            return tab.base.unionByName(buf_df)
        if tab.base is not None:
            return tab.base
        if buf_df is not None:
            return buf_df
        return self.spark.createDataFrame([], tab.schema)

    def _compile_prune(
        self,
        where,
        specs: dict[str, FieldSpec],
        columns: list[str],
        alias: str | None = None,
    ) -> list | None:
        """WHERE compiled to zone-prunable conjunct groups, or None
        when pruning is off / nothing prunable survives."""
        if not where or not self.zone_stats:
            return None
        return zn.compile_pruning_groups(
            where,
            specs,
            columns,
            alias,
            self._resolve_prop_name,
            coerce_literal,
            self._coerce_in_values,
        )

    def _pruned_merged_df(
        self, key: tuple[str, str], tab: _Table, groups: list | None
    ) -> DataFrame | None:
        """The live view with the flushed-chain start zone-pruned for
        a compiled WHERE (VERDICT r12 #2): candidate leafs read by
        explicit file list, pending mutation layers replayed in full,
        current buffer unioned. Sound because a base row the pruning
        drops either still holds its (non-matching) base values or
        was rewritten — in which case its composed row arrives via a
        fully-read patch layer while the anti-join removes the base
        copy regardless. None when pruning does not apply (no chain,
        ALTER in flight, rebase layer, no inventories) or removed
        nothing — callers fall back to the ordinary merged view."""
        if (
            groups is None
            or tab.version == 0
            or not self.data_dir
            or tab.touched_buckets is None  # ALTER migrated the base
            or any(op == "rebase" for op, _ in tab.mut_parts)
        ):
            return None
        start, pruned = self._chain_read(
            key[0], key[1], tab.version, schema=tab.schema, prune_groups=groups
        )
        if not pruned:
            return None
        df = self._compose_mut_parts(tab, start)
        buf_df = self._buffer_df(tab)
        return df.unionByName(buf_df) if buf_df is not None else df

    # --------------------------------------------------------- helpers

    def _field_specs(self, kind: str, name: str) -> dict[str, FieldSpec]:
        if kind == "node":
            nt = self.catalog.node(name)
            if nt is None:
                raise EngineError(f"node type {name!r} does not exist")
            return nt.field_map()
        et = self.catalog.edge(name)
        if et is None:
            raise EngineError(f"edge type {name!r} does not exist")
        return et.prop_map()

    def _coerce_props(
        self, props: tuple[ast.Property, ...], specs: dict[str, FieldSpec], type_name: str
    ) -> dict:
        row: dict = {}
        for p in props:
            spec = specs.get(p.name)
            if spec is None:
                raise EngineError(f"unknown property {p.name!r} on type {type_name!r}")
            try:
                row[p.name] = coerce_literal(p.value, spec.type, p.name)
            except CoercionError as e:
                raise EngineError(str(e)) from e
        return row

    def _apply_defaults_and_notnull(
        self, row: dict, specs: dict[str, FieldSpec], type_name: str
    ) -> dict:
        for spec in specs.values():
            if spec.name not in row and spec.default is not None:
                try:
                    row[spec.name] = coerce_literal(spec.default, spec.type, spec.name)
                except CoercionError as e:
                    raise EngineError(str(e)) from e
            if spec.not_null and row.get(spec.name) is None:
                raise EngineError(
                    f"field {spec.name!r} is NOT NULL but no value provided"
                )
        return row

    def _check_unique(
        self, key: tuple[str, str], unique_fields: list[str], row: dict
    ) -> None:
        from grapho_spark.operators.bloom import SparkBloom

        tab = self.tables[key]
        for fname in unique_fields:
            val = row.get(fname)
            if val is None:
                continue
            for r in tab.buffer:
                if r.get(fname) == val:
                    raise EngineError(f"unique violation on {fname!r}: {val!r}")
            if tab.base is not None:
                bf = tab.blooms.get(fname)
                if bf is None and SparkBloom.supports(tab.schema[fname].dataType):
                    bf = SparkBloom.build(tab.base, fname)
                    tab.blooms[fname] = bf
                if bf is not None and not bf.might_contain(val):
                    continue  # definitely absent: no scan needed
                if tab.base.filter(F.col(fname).eqNullSafe(F.lit(val))).limit(1).count():
                    raise EngineError(f"unique violation on {fname!r}: {val!r}")

    def _bloom_put(self, tab: _Table, unique_fields: list[str], row: dict) -> None:
        for fname in unique_fields:
            bf = tab.blooms.get(fname)
            if bf is not None and row.get(fname) is not None:
                bf.put(row[fname])

    def _resolve_prop_name(
        self, p: ast.Property, alias: str | None
    ) -> str | None:
        """Resolve an (optionally alias-qualified) WHERE key against a
        single element: ``a.field`` matches only when ``a`` is this
        element's alias; an unqualified name passes through. None =
        this predicate cannot match this element."""
        if "." not in p.name:
            return p.name
        q, f = p.name.split(".", 1)
        return f if alias is not None and q == alias else None

    def _coerce_in_values(
        self, p: ast.Property, spec: FieldSpec, name: str
    ) -> list:
        if spec.type.elem is not None:
            raise EngineError(
                f"IN is not supported on array field {name!r}"
            )
        try:
            return [coerce_literal(v, spec.type, name) for v in p.in_values]
        except CoercionError as e:
            raise EngineError(str(e)) from e

    def _py_where(
        self,
        where: tuple[ast.Property, ...],
        specs: dict[str, FieldSpec],
        columns: list[str],
        alias: str | None = None,
    ):
        """Driver-side twin of ``_where_pred`` for PURE-BUFFER tables
        (never flushed, never bound — all rows are dicts the engine
        itself coerced): returns ``callable(row) -> bool`` with the
        same semantics — conjunction of OR-groups, null-safe equality
        (null matches null), IN membership, unknown key matches
        nothing, same coercion errors.

        Point DML on unflushed in-memory data is the reference's own
        execution model (Go maps on one machine); scheduling a
        distributed job to scan a 4-row createDataFrame costs ~0.5s of
        pure overhead per statement. Both sides of every comparison
        come from ``coerce_literal``, so Python ``==`` agrees with the
        Column predicate for every storable type."""
        # group -> list of member callables; a member whose key is
        # unknown matches nothing (compiles to False — so its NOT
        # matches everything, mirroring _where_member); a group with
        # only such members matches nothing at all.
        compiled: list[list] = [
            [self._py_member(p, specs, columns, alias) for p in group]
            for group in _where_groups(where)
        ]

        def match(r: dict) -> bool:
            return all(
                any(m(r) for m in members) for members in compiled
            )

        return match

    def _py_member(
        self,
        p: "ast.Property | ast.PredGroup",
        specs: dict[str, FieldSpec],
        columns: list[str],
        alias: str | None = None,
    ):
        """One disjunction member of ``_py_where`` (leaf or nested
        group), with its NOT applied — coercion errors raise at
        compile time, like the distributed path."""
        if isinstance(p, ast.PredGroup):
            sub = self._py_where(p.items, specs, columns, alias)
            return (lambda r: not sub(r)) if p.negated else sub
        name = self._resolve_prop_name(p, alias)
        spec = specs.get(name) if name is not None else None
        if spec is None or name not in columns:
            leaf = lambda r: False  # noqa: E731
        elif p.op == "in":
            vals = self._coerce_in_values(p, spec, name)

            def leaf(r, name=name, vals=vals):
                got = r.get(name)
                if got is None:
                    return any(v is None for v in vals)
                return any(v is not None and got == v for v in vals)

        else:
            try:
                val = coerce_literal(p.value, spec.type, name)
            except CoercionError as e:
                raise EngineError(str(e)) from e

            def leaf(r, name=name, op=p.op, val=val):
                got = r.get(name)
                if op != "=":
                    # range/<> extension: null never matches (SQL
                    # semantics; total, so NOT is plain negation)
                    if got is None or val is None:
                        return False
                    if op == "<>":
                        return got != val
                    if op == "<=":
                        return got <= val
                    if op == ">=":
                        return got >= val
                    return got < val if op == "<" else got > val
                if got is None or val is None:
                    return got is val
                return got == val

        return (lambda r: not leaf(r)) if p.negated else leaf

    def _where_pred(
        self,
        where: tuple[ast.Property, ...],
        specs: dict[str, FieldSpec],
        columns: list[str],
        alias: str | None = None,
    ) -> Column:
        """Conjunction of OR-groups; a key absent from the schema
        matches nothing (server/server.go:779-782) — the member
        compiles to FALSE, so within a disjunction only that member
        dies and the group survives on its other members (and
        ``NOT missing: x``, false negated, matches everything —
        compositional semantics). ``=`` is null-safe equality
        (server.go:793-797); ``<``/``>``/``<>`` use guarded SQL
        comparison (see ``_cmp``); ``IN`` compiles to a pushable In
        filter (see ``_in_pred``); parenthesized groups recurse;
        every leaf is TOTAL, so NOT is plain negation (never a
        three-valued surprise on DELETE's ``~pred`` keep side).
        Catalyst constant-folds the FALSE leaves away, so pushdown is
        unaffected."""
        pred = F.lit(True)
        for group in _where_groups(where):
            gpred: Column | None = None
            for p in group:
                one = self._where_member(p, specs, columns, alias)
                gpred = one if gpred is None else (gpred | one)
            pred = pred & (gpred if gpred is not None else F.lit(False))
        return pred

    def _where_member(
        self,
        p: "ast.Property | ast.PredGroup",
        specs: dict[str, FieldSpec],
        columns: list[str],
        alias: str | None = None,
    ) -> Column:
        """One disjunction member of ``_where_pred`` (leaf predicate or
        nested parenthesized group), with its NOT applied."""
        if isinstance(p, ast.PredGroup):
            sub = self._where_pred(p.items, specs, columns, alias)
            return ~sub if p.negated else sub
        name = self._resolve_prop_name(p, alias)
        spec = specs.get(name) if name is not None else None
        if spec is None or name not in columns:
            one: Column = F.lit(False)
        elif p.op == "in":
            one = _in_pred(F.col(name), self._coerce_in_values(p, spec, name))
        else:
            try:
                val = coerce_literal(p.value, spec.type, name)
            except CoercionError as e:
                raise EngineError(str(e)) from e
            one = _cmp(F.col(name), p.op, F.lit(val).cast(spark_type(spec.type)))
        return ~one if p.negated else one

    def _prefixed_where_pred(
        self,
        items: tuple["ast.Property | ast.PredGroup", ...],
        aliases: list[str],
        specs: list[dict[str, FieldSpec]],
        on_dead=None,
    ) -> Column:
        """Conjunction of OR-groups over alias-prefixed chain /
        var-length columns (the prefixed twin of ``_where_pred``).
        ``on_dead`` is called with each non-viable member (used by the
        var-length path to reject WHERE on edge properties); a group
        left with no viable member matches nothing."""
        pred = F.lit(True)
        for group in _where_groups(items):
            gpred: Column | None = None
            for p in group:
                one = self._prefixed_member_pred(
                    p, aliases, specs, on_dead=on_dead
                )
                if one is None:
                    if on_dead is not None:
                        on_dead(p)  # may raise (var-length edge props)
                    if getattr(p, "negated", False):
                        # NOT over a non-viable member matches
                        # everything (compositional: NOT false)
                        one = F.lit(True)
                    else:
                        continue
                gpred = one if gpred is None else (gpred | one)
            pred = pred & (gpred if gpred is not None else F.lit(False))
        return pred

    def _prefixed_member_pred(
        self,
        p: "ast.Property | ast.PredGroup",
        aliases: list[str],
        specs: list[dict[str, FieldSpec]],
        on_dead=None,
    ) -> Column | None:
        """One WHERE member over alias-prefixed chain/var-length
        columns: an alias-qualified key (``a.field``) targets exactly
        its element; an unqualified key applies to EVERY element
        declaring the field (AND — the chain's documented semantics);
        NOT negates the member as a whole (parenthesized groups
        recurse; all leaves are total). None = this member is not
        viable (the group loop turns a negated dead member into
        match-everything, compositional with ``_where_member``, after
        giving ``on_dead`` its chance to reject)."""
        if isinstance(p, ast.PredGroup):
            sub = self._prefixed_where_pred(
                p.items, aliases, specs, on_dead=on_dead
            )
            return ~sub if p.negated else sub
        name = p.name
        if "." in name:
            q, f = name.split(".", 1)
            if q not in aliases:
                return None
            spec = specs[aliases.index(q)].get(f)
            if spec is None:
                return None
            owners = [(q, spec)]
            name = f
        else:
            owners = [
                (aliases[i], sp[name])
                for i, sp in enumerate(specs)
                if name in sp
            ]
            if not owners:
                return None
        expr: Column | None = None
        for alias, spec in owners:
            col = F.col(f"{alias}_{name}")
            if p.op == "in":
                one = _in_pred(col, self._coerce_in_values(p, spec, name))
            else:
                try:
                    val = coerce_literal(p.value, spec.type, name)
                except CoercionError as e:
                    raise EngineError(str(e)) from e
                one = _cmp(col, p.op, F.lit(val).cast(spark_type(spec.type)))
            expr = one if expr is None else expr & one
        return ~expr if p.negated else expr

    # ------------------------------------------------------------- DML

    def _insert_node(self, stmt: ast.InsertNodeStmt) -> StatementResult:
        nt = self.catalog.node(stmt.node_type)
        if nt is None:
            raise EngineError(f"node type {stmt.node_type!r} does not exist")
        specs = nt.field_map()
        row = self._coerce_props(stmt.properties, specs, stmt.node_type)
        row = self._apply_defaults_and_notnull(row, specs, stmt.node_type)
        if nt.pk and row.get(nt.pk) is None:
            raise EngineError(f"primary key {nt.pk!r} requires a value")
        unique_fields = [i.field for i in nt.indexes if i.unique]
        key = ("node", stmt.node_type)
        self._check_unique(key, unique_fields, row)
        row[ID_COLUMN] = str(self.next_id)
        self.next_id += 1
        tab = self._table(*key)
        tab.buffer.append(row)
        tab.dirty = True
        self._bloom_put(tab, unique_fields, row)
        self._log_dml(stmt)
        return StatementResult(
            "insert", f"Inserted node {stmt.node_type} id={row[ID_COLUMN]}", count=1
        )

    def _resolve_node_ref(self, ref: ast.NodeRef, declared_label: str, side: str) -> str:
        if ref.node_type != declared_label:
            raise EngineError(
                f"{side} node type {ref.node_type!r} does not match edge endpoint {declared_label!r}"
            )
        nt = self.catalog.node(ref.node_type)
        if nt is None:
            raise EngineError(f"node type {ref.node_type!r} does not exist")
        key = ("node", ref.node_type)
        tab = self._table(*key)
        if tab.base is None:
            # pure-buffer fast path: point lookup over driver-held rows,
            # same deterministic smallest-ID first-match
            columns = [f.name for f in tab.schema.fields]
            if ref.id is not None:
                test = lambda r: r.get(ID_COLUMN) == ref.id.text  # noqa: E731
            elif ref.properties:
                test = self._py_where(ref.properties, nt.field_map(), columns)
            else:
                raise EngineError(
                    f"{side} node reference needs an id or properties"
                )
            ids = sorted(
                (r[ID_COLUMN] for r in tab.buffer if test(r)),
                key=lambda i: (len(i), i),
            )
            if not ids:
                raise EngineError(f"{side} node not found for {ref.node_type}")
            return ids[0]
        df = self._merged_df(key)
        if ref.id is not None:
            # direct-ID refs are EXISTENCE checks (the resolved id is
            # the literal itself) — answerable from the driver buffer
            # plus a bucket-pruned read of one leaf dir instead of a
            # table scan per INSERT EDGE
            if self._point_id_exists(key, tab, ref.id.text):
                return ref.id.text
            raise EngineError(f"{side} node not found for {ref.node_type}")
        elif ref.properties:
            pred = self._where_pred(ref.properties, nt.field_map(), df.columns)
            # deterministic first-match: smallest ID (the reference's
            # first-match is Go map-iteration nondeterministic,
            # server.go:758-764 — documented divergence)
            hits = df.filter(pred).orderBy(*_id_sort_key()).limit(1).collect()
        else:
            raise EngineError(f"{side} node reference needs an id or properties")
        if not hits:
            raise EngineError(f"{side} node not found for {ref.node_type}")
        return hits[0][ID_COLUMN]

    def _point_id_exists(
        self, key: tuple[str, str], tab: _Table, id_text: str
    ) -> bool:
        """Does a row with this exact ``_id`` exist? Buffer rows are
        checked driver-side (no job). On a CLEAN flushed table the
        disk probe is BUCKET-PRUNED: one tiny job computes the id's
        hash bucket, then only the owning ``_gbkt`` leaf dir (plus any
        delta dirs, which are batch-sized) is read — O(1) files where
        the merged-frame filter reads every file's listing/footers.
        At 100 TB this is the difference between a point lookup and a
        table pass for every INSERT EDGE endpoint resolve. An
        unflushed mutation (base_dirty) or in-memory engine falls back
        to the full merged-frame filter."""
        if any(r.get(ID_COLUMN) == id_text for r in tab.buffer):
            return True
        if tab.base is None:
            return False
        kind, name = key
        if not self.data_dir or tab.version == 0 or tab.base_dirty:
            return bool(
                tab.base.filter(F.col(ID_COLUMN) == F.lit(id_text))
                .limit(1)
                .collect()
            )
        chain = self._chain_versions(kind, name, tab.version)
        if not chain:
            return False
        base_dir = os.path.join(self.data_dir, "tables", f"{kind}_{name}")
        anchor = chain[0]
        bm = (
            self._bucket_map(kind, name, anchor)
            if not self._is_delta_version(kind, name, anchor)
            else None
        )
        paths: list[str] = []
        if bm is not None:
            b = (
                self.spark.range(1)
                .select(
                    F.pmod(
                        F.xxhash64(F.lit(id_text)), F.lit(int(bm["n"]))
                    ).alias("b")
                )
                .first()["b"]
            )
            owner = bm["map"].get(str(b))
            if owner is not None:
                paths.append(
                    os.path.join(base_dir, f"v{owner}", f"{BUCKET_COLUMN}={b}")
                )
            start = 1
        else:
            # legacy whole-dir anchor (pre-bucketed layout)
            paths.append(os.path.join(base_dir, f"v{anchor}"))
            start = 1
        paths.extend(
            os.path.join(base_dir, f"v{v}") for v in chain[start:]
        )
        if not paths:  # empty bucket, no deltas: provably absent
            return False
        probe = self.spark.read.schema(tab.schema).parquet(*paths)
        return bool(
            probe.filter(F.col(ID_COLUMN) == F.lit(id_text)).limit(1).collect()
        )

    def _endpoint_id_set(
        self, ref: ast.NodeRef, declared_label: str, side: str
    ) -> DataFrame:
        """ALL node ids matching an endpoint ref (set semantics for
        UPDATE/DELETE qualification — unlike INSERT's single resolve).
        A bare ref (no id, no props) matches every node of the type."""
        if ref.node_type != declared_label:
            raise EngineError(
                f"{side} node type {ref.node_type!r} does not match "
                f"edge endpoint {declared_label!r}"
            )
        nt = self.catalog.node(ref.node_type)
        if nt is None:
            raise EngineError(f"node type {ref.node_type!r} does not exist")
        df = self._merged_df(("node", ref.node_type))
        if ref.id is not None:
            pred = F.col(ID_COLUMN) == F.lit(ref.id.text)
        elif ref.properties:
            pred = self._where_pred(ref.properties, nt.field_map(), df.columns)
        else:
            pred = F.lit(True)
        return df.filter(pred).select(ID_COLUMN)

    def _py_endpoint_ids(
        self, ref: ast.NodeRef, declared_label: str, side: str
    ) -> set[str] | None:
        """Driver-side twin of ``_endpoint_id_set`` for pure-buffer
        node tables: the full id set matching an endpoint ref, or
        ``None`` when the node table is flushed/bound (the caller must
        take the distributed path). Validation errors are identical to
        the distributed twin and raised before eligibility is decided."""
        if ref.node_type != declared_label:
            raise EngineError(
                f"{side} node type {ref.node_type!r} does not match "
                f"edge endpoint {declared_label!r}"
            )
        nt = self.catalog.node(ref.node_type)
        if nt is None:
            raise EngineError(f"node type {ref.node_type!r} does not exist")
        tab = self._table("node", ref.node_type)
        if tab.base is not None:
            return None
        columns = [f.name for f in tab.schema.fields]
        if ref.id is not None:
            test = lambda r: r.get(ID_COLUMN) == ref.id.text  # noqa: E731
        elif ref.properties:
            test = self._py_where(ref.properties, nt.field_map(), columns)
        else:
            test = lambda r: True  # noqa: E731
        return {r[ID_COLUMN] for r in tab.buffer if test(r)}

    def _py_dml_tests(
        self,
        stmt: ast.UpdateNodeStmt
        | ast.UpdateEdgeStmt
        | ast.DeleteNodeStmt
        | ast.DeleteEdgeStmt,
        is_node: bool,
        type_name: str,
        specs: dict[str, FieldSpec],
        tab: _Table,
    ):
        """Match tests for a pure-buffer UPDATE/DELETE: the WHERE
        predicate plus (edge DML) endpoint-qualification membership
        tests. Returns a list of ``callable(row) -> bool`` or ``None``
        when a referenced endpoint table is flushed/bound, in which
        case the caller must run the distributed plan."""
        columns = [f.name for f in tab.schema.fields]
        tests = []
        if stmt.where:
            tests.append(self._py_where(stmt.where, specs, columns))
        from_ref = getattr(stmt, "from_node", None)
        to_ref = getattr(stmt, "to_node", None)
        if not is_node and (from_ref or to_ref):
            et = self.catalog.edge(type_name)
            assert et is not None
            for ref, side, col, label in (
                (from_ref, "FROM", SRC_COLUMN, et.from_ep.label),
                (to_ref, "TO", DST_COLUMN, et.to_ep.label),
            ):
                if ref is None:
                    continue
                ids = self._py_endpoint_ids(ref, label, side)
                if ids is None:
                    return None
                tests.append(lambda r, c=col, s=ids: r.get(c) in s)
        return tests

    def _endpoint_qualify(
        self,
        df: DataFrame,
        edge_type: str,
        from_ref: ast.NodeRef | None,
        to_ref: ast.NodeRef | None,
    ) -> tuple[DataFrame, Column, list[str]]:
        """Join endpoint-id sets onto an edge DataFrame as marker
        columns; returns (joined df, match predicate, marker columns to
        drop afterwards). Node ids are unique, so the left joins never
        duplicate edge rows — and the predicate stays a distributed
        plan (no driver-side id collection)."""
        et = self.catalog.edge(edge_type)
        assert et is not None
        pred = F.lit(True)
        drops: list[str] = []
        for ref, side, col, label in (
            (from_ref, "FROM", SRC_COLUMN, et.from_ep.label),
            (to_ref, "TO", DST_COLUMN, et.to_ep.label),
        ):
            if ref is None:
                continue
            marker = f"_grapho_{side.lower()}_match"
            ids = self._endpoint_id_set(ref, label, side).select(
                F.col(ID_COLUMN).alias(marker)
            )
            df = df.join(ids, df[col] == ids[marker], "left")
            pred = pred & F.col(marker).isNotNull()
            drops.append(marker)
        return df, pred, drops

    def _insert_edge(self, stmt: ast.InsertEdgeStmt) -> StatementResult:
        et = self.catalog.edge(stmt.edge_type)
        if et is None:
            raise EngineError(f"edge type {stmt.edge_type!r} does not exist")
        assert stmt.from_node is not None and stmt.to_node is not None
        src = self._resolve_node_ref(stmt.from_node, et.from_ep.label, "FROM")
        dst = self._resolve_node_ref(stmt.to_node, et.to_ep.label, "TO")
        specs = et.prop_map()
        row = self._coerce_props(stmt.properties, specs, stmt.edge_type)
        row = self._apply_defaults_and_notnull(row, specs, stmt.edge_type)
        key = ("edge", stmt.edge_type)
        # declared cardinality enforcement (divergence: the reference
        # parses+stores cardinality but never checks it, SURVEY.md §1.2)
        tab_e = self._table(*key)
        for card, col, node_id, ep_side, ep_label in (
            (et.from_ep.card, SRC_COLUMN, src, "FROM", et.from_ep.label),
            (et.to_ep.card, DST_COLUMN, dst, "TO", et.to_ep.label),
        ):
            if card is not Cardinality.ONE:
                continue
            if tab_e.base is None:  # pure-buffer fast path
                taken = any(r.get(col) == node_id for r in tab_e.buffer)
            else:
                taken = bool(
                    self._merged_df(key)
                    .filter(F.col(col) == F.lit(node_id))
                    .limit(1)
                    .count()
                )
            if taken:
                raise EngineError(
                    f"cardinality violation: {ep_side} {ep_label} is ONE "
                    f"and node {node_id} already has a {stmt.edge_type} edge"
                )
        row[ID_COLUMN] = f"edge_{self.next_id}"
        self.next_id += 1
        row[SRC_COLUMN] = src
        row[DST_COLUMN] = dst
        tab = self._table(*key)
        tab.buffer.append(row)
        tab.dirty = True
        self._log_dml(stmt)
        return StatementResult(
            "insert", f"Inserted edge {stmt.edge_type} id={row[ID_COLUMN]}", count=1
        )

    def _coerce_sets(
        self,
        stmt: ast.UpdateNodeStmt | ast.UpdateEdgeStmt,
        specs: dict[str, FieldSpec],
        type_name: str,
    ) -> dict[str, object]:
        sets: dict[str, object] = {}
        for p in stmt.set:
            spec = specs.get(p.name)
            if spec is None:
                raise EngineError(f"unknown property {p.name!r} on type {type_name!r}")
            try:
                val = coerce_literal(p.value, spec.type, p.name)
            except CoercionError as e:
                raise EngineError(str(e)) from e
            if val is None and spec.not_null:
                raise EngineError(f"field {p.name!r} is NOT NULL")
            sets[p.name] = val
        return sets

    def _mut_scratch_dir(self) -> str:
        """Fresh scratch dir for one mutation side file (deletion
        vector / rewrite patch / rebase snapshot). Session-scoped
        scratch, NOT durable state: the commit log replays the
        statement (re-deriving the side file) after a crash, and the
        next flush folds pending side files into a versioned parquet.

        Durable engines root the scratch under ``data_dir/_scratch``
        (ADVICE r12): the system temp dir is reaped by tmpfiles
        cleaners on long-lived hosts, and a keep-composed live plan
        may lazily reference a side file well past the flush that
        made it redundant — scratch must share the data dir's
        lifetime, not /tmp's. Side files are GC'd when the last plan
        reference drops (fresh chain rebuild, rebase, uniqueness
        abort — see flush()/_publish_mutation/_update); stale
        sessions' roots are swept at the next open (_sweep_scratch)."""
        if self._mut_tmp is None:
            if self.data_dir:
                root = os.path.join(self.data_dir, "_scratch")
                os.makedirs(root, exist_ok=True)
                self._sweep_scratch(root)
                self._mut_tmp = tempfile.mkdtemp(
                    prefix=f"mut-{os.getpid()}-{_scratch_host_tag()}-",
                    dir=root,
                )
            else:
                self._mut_tmp = tempfile.mkdtemp(prefix="grapho_mut_")
        self._mut_n += 1
        return os.path.join(self._mut_tmp, f"m{self._mut_n}")

    @staticmethod
    def _sweep_scratch(root: str) -> None:
        """Remove mutation-scratch session roots left by DEAD
        processes (a crashed session cannot sweep its own; every side
        file it held is re-derivable from the commit log). Live pids
        — including other engines of this process — are never
        touched. Roots carry the writer's hostname tag
        (``mut-<pid>-<host>-<rand>``): os.kill(pid, 0) is only
        meaningful on the writer's host, so when a durable data_dir
        is shared across hosts (or pid namespaces) a foreign live
        session must not be swept on pid-reuse coincidence (ADVICE
        r13). Foreign-host roots are left alone — the owner's next
        open sweeps them. Legacy two-part roots (pre-hostname) are
        treated as same-host."""
        host = _scratch_host_tag()
        for e in os.listdir(root):
            if not e.startswith("mut-"):
                continue
            parts = e.split("-")
            try:
                pid = int(parts[1])
            except (IndexError, ValueError):
                continue
            # mut-<pid>-<host>-<rand> is 4+ parts; mut-<pid>-<rand>
            # (legacy) is 3 and predates cross-host sharing
            if len(parts) >= 4 and parts[2] != host:
                continue
            if pid == os.getpid():
                continue
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                shutil.rmtree(os.path.join(root, e), ignore_errors=True)
            except PermissionError:
                pass  # alive under another uid: leave it

    @staticmethod
    def _side_file_bytes(path: str) -> int:
        """On-disk size of a mutation side file (its parquet parts) —
        the byte arm of the broadcast-hint gate. A rewrite patch's
        _ID is a subset of its row width, so the true broadcast
        payload (the _id projection) is never larger than this."""
        try:
            return sum(
                os.stat(os.path.join(path, f)).st_size
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        except OSError:
            return 0

    def _compose_mut_parts(self, tab: _Table, start: DataFrame) -> DataFrame:
        """Apply the pending mutation layers to ``start`` in statement
        order. Works for ANY starting row set that is a superset of
        the rows the layers touch — the flush's partial path exploits
        this by starting from ONLY the touched buckets' leaf dirs
        (every matched row's bucket is in touched_buckets, so the
        restricted replay is exact on those buckets)."""
        out = start
        for op, ref in tab.mut_parts:
            if op == "fold":
                out = out.unionByName(ref)
            elif op == "rebase":
                # full-view snapshot: composition restarts here
                out = self.spark.read.schema(tab.schema).parquet(ref)
            elif op == "d":
                out = out.join(
                    self.spark.read.parquet(ref), ID_COLUMN, "left_anti"
                )
            else:  # "u"
                patch = self.spark.read.schema(tab.schema).parquet(ref)
                out = out.join(
                    patch.select(ID_COLUMN), ID_COLUMN, "left_anti"
                ).unionByName(patch)
        return out

    def _publish_mutation(
        self, tab: _Table, path: str, op: str, count: int
    ) -> None:
        """Merge-on-read publish of an UPDATE/DELETE (VERDICT r11 #1):
        compose the statement's side file onto the live view —
        ``base ∖ matched-ids [∪ rewrites]`` — instead of
        materializing an O(table) localCheckpoint per statement. The
        side file holds ONLY the matched rows, so statement cost is
        one pushdown scan + an O(matched) write; the read side stays
        a lazy plan over the flushed chain (reference analogue being
        beaten: full-scan-per-statement at server/server.go:641-740).

        Any buffered inserts fold into the view first (their row
        dicts are snapshotted by _buffer_df, and matched buffer rows
        are already in the side file — the anti-join removes their
        stale originals). Plan depth is bounded: past
        2·max_delta_chain layers the view is rebased into one scratch
        snapshot (O(live rows), amortized over the window)."""
        buf_df = self._buffer_df(tab)
        base = (
            tab.base
            if tab.base is not None
            else self.spark.createDataFrame([], tab.schema)
        )
        if buf_df is not None:
            tab.mut_parts.append(("fold", buf_df))
            base = base.unionByName(buf_df)
            tab.buffer = []
            tab.base_layers += 1
        small = count <= _MUT_BROADCAST_ROWS and (
            self._side_file_bytes(path) <= _MUT_BROADCAST_BYTES
        )
        if op == "u":
            patch = self.spark.read.schema(tab.schema).parquet(path)
            ids = patch.select(ID_COLUMN)
            if small:
                ids = F.broadcast(ids)
            tab.base = base.join(ids, ID_COLUMN, "left_anti").unionByName(
                patch
            )
            tab.base_layers += 2
        else:
            ids = self.spark.read.parquet(path)
            if small:
                ids = F.broadcast(ids)
            tab.base = base.join(ids, ID_COLUMN, "left_anti")
            tab.base_layers += 1
        tab.mut_parts.append((op, path))
        tab.dirty = True
        tab.base_dirty = True
        if len(tab.mut_parts) > 2 * self.max_delta_chain:
            rb = self._mut_scratch_dir()
            tab.base.write.mode("overwrite").parquet(rb)
            # the snapshot MATERIALIZED every pending layer — the
            # superseded side files have no live reference left (the
            # rebased plan reads only rb) and are reclaimed here
            # (ADVICE r12)
            stale = [
                ref for op, ref in tab.mut_parts if op != "fold"
            ]
            tab.base = self.spark.read.schema(tab.schema).parquet(rb)
            tab.mut_parts = [("rebase", rb)]
            tab.base_layers = 1
            for sp in stale:
                shutil.rmtree(sp, ignore_errors=True)

    def _update_buffer(
        self,
        stmt: ast.UpdateNodeStmt | ast.UpdateEdgeStmt,
        kind: str,
        is_node: bool,
        type_name: str,
        tab: _Table,
        tests: list,
        sets: dict[str, object],
    ) -> StatementResult:
        """UPDATE over a pure-buffer table: mutate the driver-held row
        dicts in place. The uniqueness guard checks the WOULD-BE state
        before any mutation (like the distributed path, which builds
        new_df first), so a violation leaves the table untouched."""
        matched = [r for r in tab.buffer if all(t(r) for t in tests)]
        if matched:
            if is_node:
                nt = self.catalog.node(type_name)
                hit_ids = {id(r) for r in matched}
                for idx in nt.indexes:
                    if idx.unique and idx.field in sets:
                        seen: set = set()
                        for r in tab.buffer:
                            v = sets[idx.field] if id(r) in hit_ids else r.get(idx.field)
                            if v is None:
                                continue
                            k = _hkey(v)
                            if k in seen:
                                raise EngineError(
                                    f"unique violation on {idx.field!r} after update"
                                )
                            seen.add(k)
            for r in matched:
                r.update(sets)
            tab.dirty = True
            tab.blooms.clear()
        self._log_dml(stmt)
        return StatementResult(
            "update", f"Updated {len(matched)} {kind}(s)", count=len(matched)
        )

    def _update(self, stmt: ast.UpdateNodeStmt | ast.UpdateEdgeStmt) -> StatementResult:
        is_node = isinstance(stmt, ast.UpdateNodeStmt)
        kind = "node" if is_node else "edge"
        type_name = stmt.node_type if is_node else stmt.edge_type
        specs = self._field_specs(kind, type_name)
        key = (kind, type_name)
        tab = self._table(*key)
        if tab.base is None:
            # pure-buffer fast path (same statement semantics, zero
            # Spark jobs): eligible unless an endpoint ref points at a
            # flushed/bound node table
            tests = self._py_dml_tests(stmt, is_node, type_name, specs, tab)
            if tests is not None:
                sets = self._coerce_sets(stmt, specs, type_name)
                return self._update_buffer(stmt, kind, is_node, type_name, tab, tests, sets)
        df = self._merged_df(key)
        if stmt.where:
            # zone/bloom pruning: restrict the base scan to the leafs
            # whose stats admit the predicate (point statements on a
            # bloomed field read O(1) leafs instead of the chain)
            pruned = self._pruned_merged_df(
                key, tab, self._compile_prune(stmt.where, specs, df.columns)
            )
            if pruned is not None:
                df = pruned
        pred = self._where_pred(stmt.where, specs, df.columns) if stmt.where else F.lit(True)
        ep_drops: list[str] = []
        if not is_node and (stmt.from_node or stmt.to_node):
            df, ep_pred, ep_drops = self._endpoint_qualify(
                df, type_name, stmt.from_node, stmt.to_node
            )
            pred = pred & ep_pred

        sets = self._coerce_sets(stmt, specs, type_name)

        # ONE base scan per statement (r12): write the matched rows
        # (with SET applied) straight to the side file, then derive
        # count and touched buckets from the side file itself —
        # footer-cheap reads of an O(matched) table, replacing the
        # separate stats aggregation scan of the whole chain.
        patch_rows = df.filter(pred)
        for k, v in sets.items():
            patch_rows = patch_rows.withColumn(
                k, F.lit(v).cast(df.schema[k].dataType)
            )
        cols = [f.name for f in tab.schema.fields]
        path = self._mut_scratch_dir()
        patch_rows.select(*cols).write.mode("overwrite").parquet(path)
        patch = self.spark.read.schema(tab.schema).parquet(path)
        count = patch.count()
        if count:
            # Uniqueness guard BEFORE any state change. Every matched
            # row gets the SAME literal — a violation is exactly
            # (a) two matched rows both receiving it, or (b) an
            # UNMATCHED row already holding it (unmatched = pred not
            # TRUE, which includes null-pred rows — eqNullSafe). This
            # replaces the old full-table groupBy-dedup scan with an
            # O(1) check plus one pushdown probe per set unique field.
            if is_node:
                nt = self.catalog.node(type_name)
                for idx in nt.indexes:
                    if idx.unique and idx.field in sets:
                        v = sets[idx.field]
                        if v is None:
                            continue  # nulls never collide
                        # the probe searches UNMATCHED rows, so the
                        # WHERE-pruned df above is not a superset of
                        # its search space — prune by the probe's own
                        # equality instead (unique fields are bloomed)
                        probe_df = self._pruned_merged_df(
                            key, tab, [[("=", idx.field, v)]]
                        )
                        if probe_df is None:
                            probe_df = self._merged_df(key)
                        clash = count > 1 or bool(
                            probe_df.filter(
                                ~pred.eqNullSafe(F.lit(True))
                                & (F.col(idx.field) == F.lit(v))
                            )
                            .limit(1)
                            .count()
                        )
                        if clash:
                            # the statement aborts before publishing:
                            # reclaim the orphaned patch dir (ADVICE
                            # r12 — nothing references it)
                            shutil.rmtree(path, ignore_errors=True)
                            raise EngineError(
                                f"unique violation on {idx.field!r} after update"
                            )
            if tab.touched_buckets is not None:
                tab.touched_buckets |= {
                    int(r["b"])
                    for r in patch.select(
                        self._bucket_expr(self._tab_bucket_n(tab)).alias("b")
                    )
                    .distinct()
                    .collect()
                }
                if tab.buffer:
                    # the mutation folds buffered inserts into base
                    # (buffer cleared in _publish_mutation) — record
                    # THEIR buckets too, or a later partial rewrite
                    # would drop surviving ex-buffer rows in untouched
                    # buckets (caught by the r10 durable soak, seed 209)
                    tab.touched_buckets |= self._buffer_buckets(tab)
            self._publish_mutation(tab, path, "u", count)
            # SET may introduce values unseen by the sketches — a stale
            # bloom would false-negative and skip a real duplicate scan.
            tab.blooms.clear()
        self._log_dml(stmt)
        return StatementResult("update", f"Updated {count} {kind}(s)", count=count)

    def _delete(self, stmt: ast.DeleteNodeStmt | ast.DeleteEdgeStmt) -> StatementResult:
        is_node = isinstance(stmt, ast.DeleteNodeStmt)
        kind = "node" if is_node else "edge"
        type_name = stmt.node_type if is_node else stmt.edge_type
        specs = self._field_specs(kind, type_name)
        key = (kind, type_name)
        tab = self._table(*key)
        has_ep = not is_node and (
            getattr(stmt, "from_node", None) or getattr(stmt, "to_node", None)
        )
        if not has_ep and not stmt.where:
            # the parser mandates a predicate; guard the programmatic path
            raise EngineError("DELETE requires WHERE or endpoint refs")
        if tab.base is None:
            # pure-buffer fast path: filter the driver-held rows
            tests = self._py_dml_tests(stmt, is_node, type_name, specs, tab)
            if tests is not None:
                keep = [r for r in tab.buffer if not all(t(r) for t in tests)]
                count = len(tab.buffer) - len(keep)
                if count:
                    tab.buffer = keep
                    tab.dirty = True
                self._log_dml(stmt)
                return StatementResult(
                    "delete", f"Deleted {count} {kind}(s)", count=count
                )
        df = self._merged_df(key)
        if stmt.where:
            # same zone/bloom leaf pruning as _update
            pruned = self._pruned_merged_df(
                key, tab, self._compile_prune(stmt.where, specs, df.columns)
            )
            if pruned is not None:
                df = pruned
        pred = (
            self._where_pred(stmt.where, specs, df.columns)
            if stmt.where
            else F.lit(True)
        )
        ep_drops: list[str] = []
        if has_ep:
            df, ep_pred, ep_drops = self._endpoint_qualify(
                df, type_name, stmt.from_node, stmt.to_node
            )
            pred = pred & ep_pred
        # ONE base scan (r12): persist the deletion vector of matched
        # _ids (O(matched), not an O(table) rewrite), then derive count
        # and touched buckets from the side file — mirrors _update.
        path = self._mut_scratch_dir()
        df.filter(pred).select(ID_COLUMN).write.mode("overwrite").parquet(
            path
        )
        ids = self.spark.read.parquet(path)
        count = ids.count()
        if count:
            if tab.touched_buckets is not None:
                tab.touched_buckets |= {
                    int(r["b"])
                    for r in ids.select(
                        self._bucket_expr(self._tab_bucket_n(tab)).alias("b")
                    )
                    .distinct()
                    .collect()
                }
                if tab.buffer:
                    # same fold-the-buffer bucket recording as _update
                    tab.touched_buckets |= self._buffer_buckets(tab)
            self._publish_mutation(tab, path, "d", count)
        # NOTE: like the reference, DELETE NODE does not cascade or
        # validate dangling edges (SURVEY.md §2.1 #12).
        self._log_dml(stmt)
        return StatementResult("delete", f"Deleted {count} {kind}(s)", count=count)

    # ------------------------------------------------------------ MATCH

    def _match(self, stmt: ast.MatchStmt) -> StatementResult:
        if not stmt.pattern:
            raise EngineError("MATCH requires at least one pattern element")
        if stmt.as_of is not None:
            # Time-travel MATCH reads ONE committed parquet version —
            # a chain/var-length/multi pattern would need a consistent
            # multi-table snapshot the flush protocol doesn't define.
            if len(stmt.pattern) != 1:
                raise EngineError(
                    "AS OF supports a single node-pattern element"
                )
            el = stmt.pattern[0]
            if self.catalog.node(el.type) is None:
                raise EngineError(f"node type {el.type!r} does not exist")
        # Edge-pattern extension: the reference's grammar parses pattern
        # elements but hardcodes IsEdge=false (parser.go:685) because a
        # parser without a catalog cannot tell node types from edge
        # types. The ENGINE can: an element naming an edge type turns
        # the pattern into a traversal chain (node, edge, node, ...)
        # compiled to src/dst equi-joins.
        if any(
            self.catalog.node(el.type) is None
            and self.catalog.edge(el.type) is not None
            for el in stmt.pattern
        ):
            return self._match_chain(stmt)
        if any(el.max_hops > 1 or el.min_hops != 1 for el in stmt.pattern):
            # *bounds on a node-only pattern would otherwise be
            # silently dropped by the union path below.
            raise EngineError(
                "variable-length *bounds require an edge element in the pattern"
            )
        if any(el.optional for el in stmt.pattern):
            # OPTIONAL on a node-only pattern has nothing to be
            # optional relative to — the union path would silently
            # ignore the marker
            raise EngineError(
                "OPTIONAL requires an edge element in a chain pattern"
            )
        frames: list[DataFrame] = []
        multi = len(stmt.pattern) > 1
        if multi and (
            any(func != "COUNT" for func, _ in stmt.return_aggs)
            # ADVICE r11: a SINGLE unaliased aggregate parses into the
            # legacy return_agg encoding — guard it too, or
            # COUNT(DISTINCT v) over a union pattern silently counts
            # stringified cross-type values (int 1 vs string '1'
            # merge; 1 vs 1.0 split)
            or (stmt.return_agg and stmt.return_agg[0] != "COUNT")
        ):
            # the union path stringifies heterogenous prop columns for
            # schema alignment; SUM/AVG over those strings would be an
            # ANSI runtime cast error (or silent nonsense) — refuse.
            raise EngineError(
                "aggregates other than COUNT(*)/COUNT(field) over "
                "a multi-type pattern are not supported (the union path "
                "stringifies heterogenous columns; SUM/AVG would cast-"
                "error and COUNT(DISTINCT)/MIN/MAX would compare strings)"
            )
        for el in stmt.pattern:
            nt = self.catalog.node(el.type)
            if nt is None:
                raise EngineError(f"node type {el.type!r} does not exist")
            key = ("node", el.type)
            # AS OF reads the committed version's parquet (buffered
            # rows are NOT part of a past version); WHERE/RETURN
            # resolve against the current catalog's field specs
            # intersected with the version's physical columns.
            tab = self.tables[key]
            # zone/bloom pruning: a point MATCH on a bloomed/statted
            # field reads O(candidate) leafs instead of the chain
            # (conservative for AS OF column drift: a member the
            # version cannot resolve compiles to FALSE in the filter
            # and merely declines to prune here)
            groups = self._compile_prune(
                stmt.where,
                nt.field_map(),
                tab.schema.fieldNames(),
                alias=el.alias or el.type,
            )
            if stmt.as_of is not None:
                df = self._df_at(
                    "node", el.type, stmt.as_of, prune_groups=groups
                )
            else:
                df = self._pruned_merged_df(key, tab, groups)
                if df is None:
                    df = self._merged_df(key)
            pred = (
                self._where_pred(
                    stmt.where,
                    nt.field_map(),
                    df.columns,
                    alias=el.alias or el.type,
                )
                if stmt.where
                else F.lit(True)
            )
            df = df.filter(pred)
            if stmt.return_fields or stmt.return_aggs:
                cols: list[Column] = [F.col(ID_COLUMN)]
                for rf, user_al in _return_items(stmt):
                    if "." in rf:
                        # alias-qualified: this element contributes the
                        # field only when the alias names IT (output
                        # column <alias>_<field>, or the user's AS
                        # alias, like the chain path); other union
                        # elements contribute null — the same shape as
                        # an undeclared field
                        q, f = rf.split(".", 1)
                        outn = user_al or f"{q}_{f}"
                        if q == (el.alias or el.type) and f in df.columns:
                            cols.append(F.col(f).alias(outn))
                        elif multi:
                            cols.append(F.lit(None).cast("string").alias(outn))
                        else:
                            raise EngineError(
                                f"RETURN field {rf!r} not found on type "
                                f"{el.type!r} (alias {el.alias or el.type!r})"
                            )
                    elif rf in df.columns:
                        cols.append(
                            F.col(rf).alias(user_al) if user_al else F.col(rf)
                        )
                    elif multi:
                        cols.append(
                            F.lit(None).cast("string").alias(user_al or rf)
                        )
                    else:
                        raise EngineError(
                            f"RETURN field {rf!r} not found on type {el.type!r}"
                        )
                df = df.select(*cols)
            if multi:
                # align heterogenous schemas: label + stringified props
                df = df.select(
                    F.lit(el.type).alias("_label"),
                    F.col(ID_COLUMN),
                    *[
                        F.col(c).cast("string").alias(c)
                        for c in df.columns
                        if c != ID_COLUMN
                    ],
                )
            frames.append(df)
        out = frames[0]
        for f2 in frames[1:]:
            out = out.unionByName(f2, allowMissingColumns=True)
        tiebreak = [F.col("_label")] if multi else []
        out = _apply_order_limit(
            out,
            stmt,
            [*tiebreak, *_id_sort_key()],
            distinct_cols=self._distinct_cols(
                stmt,
                # DISTINCT must name OUTPUT columns: a qualified return
                # field (x.seg) was projected as x_seg above — passing
                # the raw dotted name would make select() parse it as
                # struct access and die (ADVICE r10); an AS alias IS
                # the output column (r11)
                (["_label"] if multi else [])
                + [
                    al or rf.replace(".", "_")
                    for rf, al in zip(
                        stmt.return_fields,
                        stmt.return_aliases
                        or (None,) * len(stmt.return_fields),
                    )
                ],
            ),
        )
        return StatementResult("match", "", count=-1, df=out)

    @staticmethod
    def _distinct_cols(stmt: "ast.MatchStmt", cols: list[str]) -> list[str] | None:
        """Projection for RETURN DISTINCT (None when not requested).
        The parser only sets the flag with explicit return fields; the
        guard covers programmatic ASTs."""
        if not stmt.return_distinct:
            return None
        if not stmt.return_fields:
            raise EngineError("RETURN DISTINCT requires explicit return fields")
        return cols

    def _match_chain(self, stmt: ast.MatchStmt) -> StatementResult:
        """MATCH with edge elements: ``MATCH A a, E e, B b [WHERE ...]
        [RETURN ...]`` — an alternating node/edge chain compiled to
        ``edge._src = left._id AND edge._dst = right._id`` equi-joins.
        Output columns are ``<alias>_<col>`` (alias defaults to the
        element's type name); WHERE keys apply to every element that
        declares the field (a key no element declares matches nothing,
        the reference's missing-prop rule); RETURN projects each field
        from the first element declaring it, plus every ``_id``."""
        pattern = stmt.pattern
        if len(pattern) % 2 == 0 or len(pattern) < 3:
            raise EngineError(
                "edge-pattern MATCH must alternate node, edge, node, ..."
            )
        if any(el.max_hops > 1 or el.min_hops != 1 for el in pattern):
            return self._match_var_length(stmt)
        specs: list[dict[str, FieldSpec]] = []
        for i, el in enumerate(pattern):
            if i % 2 == 0:
                nt = self.catalog.node(el.type)
                if nt is None:
                    raise EngineError(
                        f"pattern position {i + 1}: node type {el.type!r} expected"
                    )
                if el.optional and 0 < i < len(pattern) - 1:
                    # an optional INTERIOR node would leave the next
                    # hop joining through a NULL-padded _id — only the
                    # endpoints have a well-defined left-outer form
                    raise EngineError(
                        "OPTIONAL on a node element is supported only "
                        "on the first or last element of the chain"
                    )
                specs.append(nt.field_map())
            else:
                et = self.catalog.edge(el.type)
                if et is None:
                    raise EngineError(
                        f"pattern position {i + 1}: edge type {el.type!r} expected"
                    )
                left, right = pattern[i - 1], pattern[i + 1]
                if et.from_ep.label != left.type or et.to_ep.label != right.type:
                    raise EngineError(
                        f"edge {el.type!r} connects "
                        f"{et.from_ep.label!r}->{et.to_ep.label!r}, "
                        f"not {left.type!r}->{right.type!r}"
                    )
                specs.append(et.prop_map())
        aliases = [el.alias or el.type for el in pattern]
        if len(set(aliases)) != len(aliases):
            raise EngineError(
                "repeated types in an edge pattern need distinct aliases"
            )

        # zone/bloom pruning per element (r13): an element's base scan
        # prunes by the WHERE groups that resolve exclusively to it —
        # on a NULLABLE side (at/after an OPTIONAL hop, or an optional
        # endpoint) only predicates that also reject the NULL padding
        # qualify (see zones.compile_chain_pruning_groups).
        first_opt_edge = min(
            (j for j in range(1, len(pattern), 2) if pattern[j].optional),
            default=None,
        )

        def _nullable(i: int) -> bool:
            return (
                (first_opt_edge is not None and i >= first_opt_edge)
                or (i == 0 and pattern[0].optional)
                or (i == len(pattern) - 1 and pattern[i].optional)
            )

        def prefixed(i: int) -> DataFrame:
            kind = "node" if i % 2 == 0 else "edge"
            key = (kind, pattern[i].type)
            df = None
            if stmt.where and self.zone_stats:
                tab = self.tables.get(key)
                if tab is not None:
                    groups = zn.compile_chain_pruning_groups(
                        stmt.where,
                        specs[i],
                        tab.schema.fieldNames(),
                        aliases[i],
                        aliases,
                        _nullable(i),
                        coerce_literal,
                        self._coerce_in_values,
                    )
                    df = self._pruned_merged_df(key, tab, groups)
            if df is None:
                df = self._merged_df(key)
            return df.select(
                *[F.col(c).alias(f"{aliases[i]}_{c}") for c in df.columns]
            )

        out = prefixed(0)
        # OPTIONAL (r11): the marked edge hop and every later hop
        # compile to LEFT joins — left-prefix rows survive with
        # NULL-padded edge/right-node fields when nothing matches
        # (inner joins after an optional hop would silently re-drop
        # the NULL-padded rows, turning OPTIONAL back into inner).
        # WHERE stays a post-join filter: every leaf predicate is
        # TOTAL (null-safe =, IsNotNull-guarded comparisons), so a
        # predicate on an optional field drops NULL-padded rows —
        # SQL LEFT JOIN + WHERE semantics — and its NOT keeps them.
        # OPTIONAL node endpoints (r13): a trailing ``OPTIONAL B b``
        # left-outers ONLY the final hop's dst join (the edge stays
        # required — B is absent exactly when the edge dangles, since
        # DELETE NODE does not cascade); the symmetric leading form
        # ``MATCH OPTIONAL A a, E e, B b`` compiles the first hop's
        # src join as a RIGHT join (every (e, b) survives, a
        # NULL-padded). Combining a leading optional node with an
        # optional FIRST edge would be a full-outer ambiguity — refused.
        lead_opt = pattern[0].optional
        if lead_opt and pattern[1].optional:
            raise EngineError(
                "OPTIONAL on the leading node cannot combine with an "
                "OPTIONAL first edge (ambiguous full-outer semantics)"
            )
        opt_seen = False
        for i in range(1, len(pattern), 2):
            opt_seen = opt_seen or pattern[i].optional
            src_how = "left" if opt_seen else "inner"
            if i == 1 and lead_opt:
                src_how = "right"
            dst_how = (
                "left"
                if opt_seen
                or (i + 1 == len(pattern) - 1 and pattern[i + 1].optional)
                else "inner"
            )
            out = out.join(
                prefixed(i),
                F.col(f"{aliases[i]}_{SRC_COLUMN}")
                == F.col(f"{aliases[i - 1]}_{ID_COLUMN}"),
                src_how,
            ).join(
                prefixed(i + 1),
                F.col(f"{aliases[i]}_{DST_COLUMN}")
                == F.col(f"{aliases[i + 1]}_{ID_COLUMN}"),
                dst_how,
            )

        if stmt.where:
            out = out.filter(
                self._prefixed_where_pred(stmt.where, aliases, specs)
            )

        id_cols = [f"{a}_{ID_COLUMN}" for a in aliases]
        ret_cols: list[str] = []
        if stmt.return_fields or stmt.return_aggs:
            cols = list(id_cols)
            for rf, user_al in _return_items(stmt):
                owner, bare = _return_field_owner(
                    rf, aliases, specs, "not found in pattern"
                )
                outn = user_al or f"{owner}_{bare}"
                cols.append(
                    F.col(f"{owner}_{bare}").alias(outn)
                    if user_al
                    else f"{owner}_{bare}"
                )
                ret_cols.append(outn)
            out = out.select(*cols)
        sort_cols: list[Column] = []
        for c in id_cols:
            sort_cols.extend([F.length(c), F.col(c)])
        out = _apply_order_limit(
            out, stmt, sort_cols, distinct_cols=self._distinct_cols(stmt, ret_cols)
        )
        return StatementResult("match", "", count=-1, df=out)

    def _match_var_length(self, stmt: ast.MatchStmt) -> StatementResult:
        """Variable-length traversal (grammar extension, absent from
        the reference): ``MATCH A a, E*lo..hi e, B b``. Returns one
        row per reachable (a, b) pair with ``<alias>_hops`` = the
        SHORTEST path length within [lo, hi] — deterministic (path
        multiplicity is collapsed by a min aggregation), which is what
        makes the statement oracle-checkable.

        Hop composition goes through the edge's declared endpoint
        labels: hop i+1 can extend hop i only if E's to-label equals
        its from-label, because endpoint IDs live in per-label key
        spaces (a bound Customer key and a bound Nation key may share
        the value '3' without being the same node — composing across
        labels would fabricate paths). A self-label edge (X->X)
        therefore composes to any depth; a heterogeneous edge (X->Y,
        X != Y) admits exactly one hop, so bounds [lo..hi] intersect
        {1}: lo <= 1 yields the single-hop pairs, lo > 1 yields the
        (correct) empty result. The pattern's node labels must equal
        the edge's declared endpoint labels; the last hop always lands
        on B's table.

        Plan shape: the L-step reach sets are built by L-1 self-joins
        of the edge list (bounded unrolling, L <= 10 — declarative, so
        Catalyst plans ordinary equi-joins), unioned with a hops tag,
        min-aggregated on the endpoint pair, then joined back to the
        endpoint node tables for properties. Self-pairs (a = b via a
        cycle) are kept — a cycle IS a path.
        """
        pattern = stmt.pattern
        if len(pattern) != 3:
            raise EngineError(
                "variable-length MATCH supports exactly node, edge*, node"
            )
        if pattern[0].optional or pattern[2].optional:
            # OPTIONAL on the NODE elements has nothing to be optional
            # relative to; only the *bounds edge may carry it (r12)
            raise EngineError(
                "OPTIONAL in a variable-length pattern belongs on the "
                "edge element"
            )
        left_el, edge_el, right_el = pattern
        for el in (left_el, right_el):
            if el.max_hops > 1 or el.min_hops != 1:
                raise EngineError("only the edge element may carry *bounds")
        nt_l = self.catalog.node(left_el.type)
        nt_r = self.catalog.node(right_el.type)
        et = self.catalog.edge(edge_el.type)
        if nt_l is None or nt_r is None or et is None:
            raise EngineError(
                "variable-length MATCH needs node, edge, node types"
            )
        if not (
            et.from_ep.label == left_el.type
            and et.to_ep.label == right_el.type
        ):
            raise EngineError(
                f"variable-length pattern labels must match edge "
                f"{edge_el.type!r}'s declared endpoints "
                f"({et.from_ep.label!r}->{et.to_ep.label!r} declared, "
                f"pattern has {left_el.type!r}->{right_el.type!r})"
            )
        # Heterogeneous endpoints cannot self-compose (per-label key
        # spaces) — the only realizable path length is 1.
        composable = et.from_ep.label == et.to_ep.label
        aliases = [el.alias or el.type for el in pattern]
        if len(set(aliases)) != len(aliases):
            raise EngineError(
                "repeated types in an edge pattern need distinct aliases"
            )
        a, e_alias, b = aliases

        edges = self._merged_df(("edge", edge_el.type)).select(
            F.col(SRC_COLUMN).alias("_s"), F.col(DST_COLUMN).alias("_d")
        )
        lo, hi = edge_el.min_hops, edge_el.max_hops
        if not composable:
            hi = min(hi, 1)  # deeper layers are provably empty
        reach = edges.select("_s", "_d", F.lit(1).alias("_hops"))
        layers = [reach] if lo <= 1 else []
        frontier = reach
        for depth in range(2, hi + 1):
            nxt = edges.select(
                F.col("_s").alias("_s2"), F.col("_d").alias("_d2")
            )
            frontier = (
                frontier.join(nxt, frontier["_d"] == F.col("_s2"))
                .select("_s", F.col("_d2").alias("_d"), F.lit(depth).alias("_hops"))
                .distinct()  # per-layer: many paths, one (s, d) pair
            )
            if depth >= lo:
                layers.append(frontier)
        if not layers:
            # bounds admit no realizable path length (e.g. *2..3 over a
            # heterogeneous edge) — the correct result is empty, not an
            # error: the statement is well-formed, nothing is reachable
            layers = [reach.filter(F.lit(False))]
        pairs = layers[0]
        for extra in layers[1:]:
            pairs = pairs.unionByName(extra)
        pairs = pairs.groupBy("_s", "_d").agg(F.min("_hops").alias("_hops"))

        def prefixed(
            alias: str, type_name: str, nullable: bool
        ) -> DataFrame:
            # zone/bloom pruning of the endpoint scans (r14, VERDICT
            # r13 #3): same per-element compile as the chain path —
            # groups resolving exclusively to this alias prune its
            # base leafs; on the NULLABLE side (right endpoint of an
            # OPTIONAL *bounds edge) only padding-rejecting predicates
            # qualify. The traversal itself (the edge list) carries no
            # predicates (WHERE on edge props is rejected above), so
            # only the node scans prune.
            key = ("node", type_name)
            df = None
            if stmt.where and self.zone_stats:
                tab = self.tables.get(key)
                if tab is not None:
                    groups = zn.compile_chain_pruning_groups(
                        stmt.where,
                        self.catalog.node(type_name).field_map(),
                        tab.schema.fieldNames(),
                        alias,
                        aliases,
                        nullable,
                        coerce_literal,
                        self._coerce_in_values,
                    )
                    df = self._pruned_merged_df(key, tab, groups)
            if df is None:
                df = self._merged_df(key)
            return df.select(
                *[F.col(c).alias(f"{alias}_{c}") for c in df.columns]
            )

        # r12: OPTIONAL on the *bounds edge = left-outer composition —
        # every left-endpoint row survives; rows with no reachable
        # right endpoint within the bounds NULL-pad hops and the right
        # node's columns. The (pairs ⋈ right) inner block builds first
        # so the outer join NULL-pads it as a unit (joining pairs
        # left-outer then right inner would re-drop the padded rows).
        inner = pairs.join(
            prefixed(b, right_el.type, nullable=edge_el.optional),
            F.col("_d") == F.col(f"{b}_{ID_COLUMN}"),
        )
        out = (
            prefixed(a, left_el.type, nullable=False)
            .join(
                inner,
                F.col("_s") == F.col(f"{a}_{ID_COLUMN}"),
                "left" if edge_el.optional else "inner",
            )
            .withColumn(f"{e_alias}_hops", F.col("_hops").cast("long"))
            .drop("_s", "_d", "_hops")
        )

        node_specs = [nt_l.field_map(), nt_r.field_map()]
        node_aliases = [a, b]

        def _reject_edge_prop(p: ast.Property) -> None:
            bare = p.name.split(".", 1)[-1]
            if bare in et.prop_map():
                raise EngineError(
                    f"WHERE on edge property {bare!r} is not "
                    f"supported across a variable-length edge"
                )

        if stmt.where:
            out = out.filter(
                self._prefixed_where_pred(
                    stmt.where, node_aliases, node_specs,
                    on_dead=_reject_edge_prop,
                )
            )

        id_cols = [f"{a}_{ID_COLUMN}", f"{b}_{ID_COLUMN}"]
        ret_cols: list[str] = []
        if stmt.return_fields or stmt.return_aggs:
            cols = list(id_cols) + [f"{e_alias}_hops"]
            for rf, user_al in _return_items(stmt):
                if rf == "hops" or rf == f"{e_alias}.hops":
                    if user_al:
                        out = out.withColumn(user_al, F.col(f"{e_alias}_hops"))
                        cols.append(user_al)
                        ret_cols.append(user_al)
                    else:
                        ret_cols.append(f"{e_alias}_hops")
                    continue  # always projected as <alias>_hops
                owner, bare = _return_field_owner(
                    rf, node_aliases, node_specs,
                    "not found on the endpoint types",
                )
                outn = user_al or f"{owner}_{bare}"
                cols.append(
                    F.col(f"{owner}_{bare}").alias(outn)
                    if user_al
                    else f"{owner}_{bare}"
                )
                ret_cols.append(outn)
            out = out.select(*cols)
        sort_cols: list[Column] = []
        for c in id_cols:
            sort_cols.extend([F.length(c), F.col(c)])
        out = _apply_order_limit(
            out, stmt, sort_cols, distinct_cols=self._distinct_cols(stmt, ret_cols)
        )
        return StatementResult("match", "", count=-1, df=out)

    # ------------------------------------------------- SHOW / DESCRIBE

    def _explain(self, stmt: ast.ExplainStmt) -> StatementResult:
        """EXPLAIN MATCH ... : compile the traversal exactly as MATCH
        would (same code path — the plan shown IS the plan that would
        run) and return the formatted physical plan, one line per row,
        instead of executing it. The plan-audit surface
        (plan_expectations.py) through the GQL wire protocol. Plan text
        comes straight from the JVM (plan_string), not a stdout
        capture, so concurrent engines can't interleave output."""
        from grapho_spark.plan_expectations import plan_string

        self._prune_log.clear()
        res = self._match(stmt.target)
        # zone-pruning audit (r13): surface the manifest-level leaf
        # decisions the Spark plan can't show (they happen BEFORE the
        # relation is built — the FileScan only lists survivors)
        prune_lines = [
            (
                f"ZonePruning: {k} {n}: kept {kept}/{total} leafs"
                f" (bloom probe: {mode})",
            )
            for k, n, kept, total, mode in self._prune_log
        ]
        self._prune_log.clear()
        lines = prune_lines + [
            (ln,) for ln in plan_string(res.df, "formatted").splitlines() if ln.strip()
        ]
        df = self.spark.createDataFrame(lines, "plan: string")
        return StatementResult(
            kind="explain",
            message=f"Explained MATCH: {len(lines)} plan lines",
            count=len(lines),
            df=df,
        )

    def _show(self, stmt: ast.ShowStmt) -> StatementResult:
        if stmt.kind == "VERSIONS":
            kind = "node" if self.catalog.node(stmt.target) else (
                "edge" if self.catalog.edge(stmt.target) else None
            )
            if kind is None:
                raise EngineError(f"type {stmt.target!r} does not exist")
            versions = self.table_versions(kind, stmt.target)
            latest = versions[-1] if versions else -1

            def _vkind(v: int) -> tuple[str, int, int]:
                """(layout, n_buckets_owned, bucket_n): full/partial
                versions are bucket-complete via their _BUCKETS.json
                owner map (bucket_n = the map's n, which adaptive
                re-bucketing grows over the table's life); delta
                versions are insert-only appends; legacy is the
                pre-r10 whole-dir layout."""
                if self._is_delta_version(kind, stmt.target, v):
                    return "delta", 0, 0
                bm = self._bucket_map(kind, stmt.target, v)
                if bm is None:
                    return "legacy", 0, 0
                owned = sum(1 for o in bm["map"].values() if int(o) == v)
                layout = "full" if owned == len(bm["map"]) else "partial"
                if os.path.exists(
                    os.path.join(
                        self.data_dir, "tables", f"{kind}_{stmt.target}",
                        f"v{v}", "_LEAF_GC",
                    )
                ):
                    # kept past retention only as a bucket-leaf
                    # dependency; not directly servable
                    layout += "(gc)"
                return layout, owned, int(bm["n"])
            rows = []
            for v in versions:
                layout, owned, n = _vkind(v)
                rows.append(
                    (
                        stmt.target,
                        v,
                        v == latest,
                        layout,
                        owned,
                        len(self._chain_versions(kind, stmt.target, v)),
                        n,
                    )
                )
            df = self.spark.createDataFrame(
                rows,
                "name string, version long, is_latest boolean, "
                "layout string, buckets_owned int, chain_len int, "
                "bucket_n int",
            )
            return StatementResult("show", "", count=-1, df=df)
        if stmt.kind == "NODES":
            rows = [
                (n.name, len(n.fields), n.pk, self.catalog.version)
                for n in sorted(self.catalog.nodes, key=lambda n: n.name)
            ]
            df = self.spark.createDataFrame(
                rows, "name string, n_fields int, pk string, catalog_version long"
            )
        else:
            rows = [
                (
                    e.name,
                    e.from_ep.label,
                    e.from_ep.card.value,
                    e.to_ep.label,
                    e.to_ep.card.value,
                    len(e.props),
                )
                for e in sorted(self.catalog.edges, key=lambda e: e.name)
            ]
            df = self.spark.createDataFrame(
                rows,
                "name string, from_label string, from_card string, "
                "to_label string, to_card string, n_props int",
            )
        return StatementResult("show", "", count=-1, df=df)

    def _describe(self, stmt: ast.DescribeStmt) -> StatementResult:
        if stmt.kind == "NODE":
            nt = self.catalog.node(stmt.name)
            if nt is None:
                raise EngineError(f"node type {stmt.name!r} does not exist")
            rows = [
                (
                    f.name,
                    f.type.render(),
                    f.name == nt.pk,
                    f.unique,
                    f.not_null,
                    f.default.text if f.default else None,
                )
                for f in nt.fields
            ]
        else:
            et = self.catalog.edge(stmt.name)
            if et is None:
                raise EngineError(f"edge type {stmt.name!r} does not exist")
            rows = [
                (p.name, p.type.render(), False, p.unique, p.not_null,
                 p.default.text if p.default else None)
                for p in et.props
            ]
        df = self.spark.createDataFrame(
            rows,
            "field string, type string, primary_key boolean, is_unique boolean, "
            "not_null boolean, default_value string",
        )
        return StatementResult("describe", "", count=-1, df=df)


def _spark_to_type_spec(dt: ST.DataType) -> TypeSpec:
    from grapho_spark.gql.ast import BaseType

    if isinstance(dt, ST.ArrayType):
        return TypeSpec(elem=_spark_to_type_spec(dt.elementType))
    mapping = {
        ST.StringType: BaseType.STRING,
        ST.LongType: BaseType.INT,
        ST.IntegerType: BaseType.INT,
        ST.ShortType: BaseType.INT,
        ST.DoubleType: BaseType.FLOAT,
        ST.FloatType: BaseType.FLOAT,
        ST.BooleanType: BaseType.BOOL,
        ST.DateType: BaseType.DATE,
        ST.TimestampType: BaseType.DATETIME,
        ST.TimestampNTZType: BaseType.DATETIME,
        ST.BinaryType: BaseType.BLOB,
    }
    for cls, base in mapping.items():
        if isinstance(dt, cls):
            return TypeSpec(base=base)
    return TypeSpec(base=BaseType.STRING)
