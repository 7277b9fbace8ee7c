"""GQL-engine parity queries: real GQL statements (the reference's
query language, SURVEY.md §2.1) executed through our lexer -> parser ->
catalog -> Spark MATCH planner against fixture tables bound as node
types — each with a plain-SQL oracle, so the driver's correctness gate
exercises the full engine stack end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grapho_spark.queries import query
from grapho_spark.tables import load_table
from grapho_spark.sparkutil import scratch_path


def _engine_with_customer(spark: SparkSession, sf_dir: str):
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    eng.bind_node_type("Customer", load_table(spark, sf_dir, "customer"), pk="c_custkey")
    return eng


@query(
    "gql_match_where_return",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id, c_name, c_acctbal
FROM customer WHERE c_mktsegment = 'BUILDING'
""",
)
def gql_match_where_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH <type> WHERE <conj-eq> RETURN <fields> through the full
    GQL engine (statement #13, server/server.go:724-740 — with the
    RETURN projection the reference parses but ignores)."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_mktsegment: 'BUILDING' RETURN c_name, c_acctbal;"
    )[0]
    return res.df


@query(
    "gql_match_full_scan",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id, c_custkey, c_name, c_nationkey,
       c_acctbal, c_mktsegment
FROM customer
""",
)
def gql_match_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare MATCH = full scan of a node type (all properties)."""
    eng = _engine_with_customer(spark, sf_dir)
    return eng.execute("MATCH Customer;")[0].df


@query(
    "gql_match_edge_pattern",
    oracle="""
SELECT CAST(c.c_custkey AS VARCHAR) AS c__id,
       'edge_' || CAST(o.o_custkey AS VARCHAR) || '_'
               || CAST(o.o_orderkey AS VARCHAR) AS p__id,
       CAST(o.o_orderkey AS VARCHAR) AS o__id,
       c.c_name AS c_c_name,
       o.o_totalprice AS o_o_totalprice
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'F'
""",
)
def gql_match_edge_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-pattern MATCH through the full engine: ``MATCH Customer c,
    Placed p, Order o WHERE ... RETURN ...`` compiles the node-edge-node
    chain to src/dst equi-joins — the traversal the reference's grammar
    parses but cannot execute (parser.go:685 hardcodes node-only
    elements). Fixture tables are bound as node types and the orders
    relation doubles as the Placed edge.
    """
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    o = load_table(spark, sf_dir, "orders")
    eng.bind_node_type("Customer", load_table(spark, sf_dir, "customer"), pk="c_custkey")
    eng.bind_node_type("Order", o.select("o_orderkey", "o_totalprice"), pk="o_orderkey")
    eng.bind_edge_type(
        "Placed",
        o.select("o_custkey", "o_orderkey", "o_orderstatus"),
        src="o_custkey",
        dst="o_orderkey",
        from_label="Customer",
        to_label="Order",
    )
    res = eng.execute(
        "MATCH Customer c, Placed p, Order o WHERE o_orderstatus: 'F' "
        "RETURN c_name, o_totalprice;"
    )[0]
    return res.df


@query(
    "gql_insert_update_delete_roundtrip",
    oracle="""
SELECT 'widget' AS name, 15 AS qty
UNION ALL SELECT 'gizmo', 7
ORDER BY name
""",
)
def gql_insert_update_delete_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full DML lifecycle through the engine: CREATE, INSERT x3,
    UPDATE with WHERE, DELETE with WHERE, MATCH the survivors. The
    oracle is the hand-computed expected state (constant SQL)."""
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    eng.execute(
        "CREATE NODE Item (name: string, qty: int);"
        "INSERT NODE Item (name: 'widget', qty: 10);"
        "INSERT NODE Item (name: 'gizmo', qty: 7);"
        "INSERT NODE Item (name: 'junk', qty: 0);"
        "UPDATE NODE Item SET qty: 15 WHERE name: 'widget';"
        "DELETE NODE Item WHERE qty: 0;"
    )
    res = eng.execute("MATCH Item RETURN name, qty;")[0]
    return res.df.select("name", F.col("qty").cast("int").alias("qty"))


@query(
    "gql_typed_roundtrip",
    oracle="""
SELECT * FROM (VALUES
  ('1', 'Ann',  DATE '2024-03-01', 'gold',   3, CAST(4.5 AS DOUBLE),  TRUE),
  ('2', 'Bob',  DATE '2024-07-15', 'silver', 2, CAST(NULL AS DOUBLE), FALSE),
  ('3', 'Cleo', NULL,              'gold',   0, CAST(1.25 AS DOUBLE), TRUE)
) AS t(_id, name, joined, tier, n_tags, score, active)
""",
)
def gql_typed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The type system through the full GQL stack: enum (validated
    membership), date coercion from string literals, float/int/bool,
    explicit nulls, DEFAULT application, array field declared (left
    null) — inserted via statements, read back via MATCH. The oracle is
    the hand-computed expected table; every cell exercises a coercion
    path (engine/coerce.py).
    """
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    eng.execute(
        "CREATE NODE Member ("
        "  name: string NOT NULL,"
        "  joined: date,"
        "  tier: enum<'gold','silver'> DEFAULT 'gold',"
        "  n_tags: int DEFAULT 0,"
        "  score: float,"
        "  active: bool DEFAULT TRUE,"
        "  tags: array<string>"
        ");"
        "INSERT NODE Member (name: 'Ann', joined: '2024-03-01', n_tags: 3,"
        "                    score: 4.5);"
        "INSERT NODE Member (name: 'Bob', joined: '2024-07-15', tier: 'silver',"
        "                    n_tags: 2, score: null, active: FALSE);"
        "INSERT NODE Member (name: 'Cleo', score: 1.25);"
    )
    res = eng.execute(
        "MATCH Member RETURN name, joined, tier, n_tags, score, active;"
    )[0]
    return res.df


@query(
    "gql_describe_catalog",
    oracle="""
SELECT * FROM (VALUES
  ('name',   'string',               FALSE, FALSE, TRUE,  NULL),
  ('joined', 'date',                 FALSE, FALSE, FALSE, NULL),
  ('tier',   'enum<''gold'', ''silver''>', FALSE, FALSE, FALSE, 'gold')
) AS t(field, type, primary_key, is_unique, not_null, default_value)
""",
)
def gql_describe_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE NODE through the engine (a token the reference reserves
    but never parses): field/type/constraint introspection rows checked
    against the declared DDL."""
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    eng.execute(
        "CREATE NODE Profile ("
        "  name: string NOT NULL,"
        "  joined: date,"
        "  tier: enum<'gold','silver'> DEFAULT 'gold'"
        ");"
    )
    return eng.execute("DESCRIBE NODE Profile;")[0].df


@query(
    "gql_alter_migration",
    oracle="""
SELECT * FROM (VALUES
  ('1', 'widget', '10',  'shelf-A'),
  ('2', 'gizmo',  '7',   'shelf-A'),
  ('3', 'doodad', NULL,  'shelf-B')
) AS t(_id, name, qty, location)
""",
)
def gql_alter_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live schema migration through the engine: rows inserted under
    the ORIGINAL schema survive ALTER ADD (existing rows get NULL for
    the new column — the DEFAULT applies to inserts only, per the
    declared semantics — then an UPDATE backfills them) and ALTER
    MODIFY (int -> string retype casts stored values). The oracle is
    the hand-computed post-migration table.
    """
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    eng.execute(
        "CREATE NODE Item (name: string, qty: int);"
        "INSERT NODE Item (name: 'widget', qty: 10);"
        "INSERT NODE Item (name: 'gizmo', qty: 7);"
        "ALTER NODE Item ADD location: string DEFAULT 'shelf-A';"
        "ALTER NODE Item MODIFY qty: string;"
        "INSERT NODE Item (name: 'doodad', location: 'shelf-B');"
        "UPDATE NODE Item SET location: 'shelf-A' WHERE location: null;"
    )
    res = eng.execute("MATCH Item RETURN name, qty, location;")[0]
    return res.df


@query(
    "gql_edge_endpoint_dml",
    oracle="""
SELECT * FROM (VALUES
  ('ann', 'acme',   'eng',  2019),
  ('bob', 'acme',   'lead', 2020)
) AS t(who, com, role, since)
ORDER BY who
""",
)
def gql_edge_endpoint_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Endpoint-qualified edge DML (extension): ``UPDATE EDGE E FROM
    <ref> TO <ref> SET ...`` / ``DELETE EDGE E FROM <ref> TO <ref>``
    mutate the edges whose endpoints match the refs — ALL matching
    nodes (set semantics), unlike INSERT's single-node resolve. The
    reference can only predicate on the edge's own props
    (server/server.go:543-584); selecting edges by who they connect
    needs a manual id lookup there. Verified through an edge-pattern
    MATCH of the surviving graph against the hand-computed oracle."""
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    eng.execute(
        "CREATE NODE Person (name: string);"
        "CREATE NODE Company (cname: string);"
        "CREATE EDGE WorksAt (FROM Person MANY, TO Company MANY,"
        "                     PROPS (role: string, since: int));"
        "INSERT NODE Person (name: 'ann'); INSERT NODE Person (name: 'bob');"
        "INSERT NODE Company (cname: 'acme');"
        "INSERT NODE Company (cname: 'globex');"
        "INSERT EDGE WorksAt FROM Person (name: 'ann') TO Company (cname: 'acme')"
        "  (role: 'eng', since: 2019);"
        "INSERT EDGE WorksAt FROM Person (name: 'bob') TO Company (cname: 'acme')"
        "  (role: 'eng', since: 2020);"
        "INSERT EDGE WorksAt FROM Person (name: 'bob') TO Company (cname: 'globex')"
        "  (role: 'mgr', since: 2021);"
        # bob's edges everywhere -> lead
        "UPDATE EDGE WorksAt FROM Person (name: 'bob') TO Company SET role: 'lead';"
        # drop globex edges regardless of who holds them
        "DELETE EDGE WorksAt FROM Person TO Company (cname: 'globex');"
    )
    res = eng.execute("MATCH Person p, WorksAt w, Company c;")[0]
    return (
        res.df.select(
            F.col("p_name").alias("who"),
            F.col("c_cname").alias("com"),
            F.col("w_role").alias("role"),
            F.col("w_since").cast("int").alias("since"),
        )
        .orderBy("who")
    )


@query(
    "gql_time_travel",
    oracle="""
SELECT * FROM (VALUES
  (1, CAST(3 AS BIGINT), CAST(17 AS BIGINT)),
  (2, CAST(3 AS BIGINT), CAST(22 AS BIGINT)),
  (3, CAST(2 AS BIGINT), CAST(22 AS BIGINT))
) AS t(version, n_rows, total_qty)
""",
)
def gql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the engine's copy-on-write flushes: every
    flush writes a new parquet version (v1, v2, ...) and KEEPS the old
    ones, so any past state stays readable — Delta-style time travel
    on plain parquet, from the versioning the durable engine already
    does (the reference overwrites its node files in place,
    server/server.go:870-905, and has no history). Three flushes
    (insert / update / delete between them) are read back per-version
    and aggregated; the oracle is the hand-computed state at each
    version."""
    import os as _os
    import shutil as _shutil
    import tempfile

    from grapho_spark.engine import GraphEngine

    # deterministic pid-scoped dir (reused + overwritten per process)
    # instead of leaking one mkdtemp per bench/correctness invocation
    data_dir = scratch_path(f"grapho_tt_{_os.getpid()}")
    _shutil.rmtree(data_dir, ignore_errors=True)
    eng = GraphEngine(spark, data_dir=data_dir)
    eng.execute(
        "CREATE NODE Item (name: string, qty: int);"
        "INSERT NODE Item (name: 'widget', qty: 10);"
        "INSERT NODE Item (name: 'gizmo', qty: 7);"
        "INSERT NODE Item (name: 'junk', qty: 0);"
    )
    eng.flush()  # v1
    eng.execute("UPDATE NODE Item SET qty: 15 WHERE name: 'widget';")
    eng.flush()  # v2
    eng.execute("DELETE NODE Item WHERE qty: 0;")
    eng.flush()  # v3
    frames = []
    for v in eng.table_versions("node", "Item"):
        frames.append(
            eng.node_df_at("Item", v).agg(
                F.lit(v).alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("qty").cast("long").alias("total_qty"),
            )
        )
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out


@query(
    "gql_match_var_length",
    oracle="""
WITH e AS (
  SELECT c1.c_custkey AS s, c2.c_custkey AS d
  FROM customer c1 JOIN customer c2
    ON c2.c_custkey = c1.c_custkey + 1
   AND c2.c_mktsegment = c1.c_mktsegment),
h1 AS (SELECT s, d, 1 AS hops FROM e),
h2 AS (SELECT DISTINCT e1.s, e2.d, 2 AS hops
       FROM e e1 JOIN e e2 ON e1.d = e2.s),
h3 AS (SELECT DISTINCT e1.s, e3.d, 3 AS hops
       FROM e e1 JOIN e e2 ON e1.d = e2.s
                JOIN e e3 ON e2.d = e3.s),
pairs AS (
  SELECT s, d, MIN(hops) AS hops
  FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2
        UNION ALL SELECT * FROM h3)
  GROUP BY s, d)
SELECT CAST(a.c_custkey AS VARCHAR) AS a__id,
       CAST(b.c_custkey AS VARCHAR) AS b__id,
       CAST(p.hops AS BIGINT) AS n_hops,
       a.c_name AS a_c_name
FROM pairs p
JOIN customer a ON a.c_custkey = p.s
JOIN customer b ON b.c_custkey = p.d
WHERE a.c_mktsegment = 'BUILDING' AND b.c_mktsegment = 'BUILDING'
""",
)
def gql_match_var_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length traversal through the full GQL engine (grammar
    extension — the reference cannot express any traversal at all):
    ``MATCH Customer a, NextInSeg*1..3 n, Customer b WHERE ... RETURN
    c_name`` returns each reachable pair with the SHORTEST hop count
    in 1..3, compiled to a bounded union of edge self-joins + a min
    aggregation (declarative — Catalyst plans ordinary equi-joins).
    The ``NextInSeg`` edge links each customer to the next customer id
    within its market segment, derived from the fixture."""
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    cust = load_table(spark, sf_dir, "customer")
    eng.bind_node_type("Customer", cust, pk="c_custkey")
    c1 = cust.select(F.col("c_custkey").alias("sk"), F.col("c_mktsegment").alias("m1"))
    c2 = cust.select(F.col("c_custkey").alias("dk"), F.col("c_mktsegment").alias("m2"))
    edges = c1.join(
        c2, (F.col("dk") == F.col("sk") + 1) & (F.col("m1") == F.col("m2"))
    ).select("sk", "dk")
    eng.bind_edge_type(
        "NextInSeg", edges, src="sk", dst="dk",
        from_label="Customer", to_label="Customer",
    )
    res = eng.execute(
        "MATCH Customer a, NextInSeg*1..3 n, Customer b "
        "WHERE c_mktsegment: 'BUILDING' RETURN c_name;"
    )[0]
    return res.df


@query(
    "gql_match_var_length_hetero",
    oracle="""
SELECT CAST(c.c_custkey AS VARCHAR) AS a__id,
       CAST(n.n_nationkey AS VARCHAR) AS b__id,
       CAST(1 AS BIGINT) AS e_hops,
       c.c_name AS a_c_name,
       n.n_name AS b_n_name
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE n.n_name = 'GERMANY'
""",
)
def gql_match_var_length_hetero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length MATCH across DISTINCT endpoint labels:
    ``MATCH Customer a, LocatedIn*1..3 e, Nation b``. Hop composition
    goes through the edge's declared endpoint labels — a heterogeneous
    edge (Customer->Nation) cannot self-compose because endpoint IDs
    live in per-label key spaces (custkey 3 and nationkey 3 are
    different nodes), so the realizable path lengths inside [1..3]
    collapse to {1}: the engine plans the single-hop join to B's table
    and skips the provably-empty deeper layers. The oracle is the
    plain FK join with hops pinned to 1."""
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    cust = load_table(spark, sf_dir, "customer")
    eng.bind_node_type("Customer", cust, pk="c_custkey")
    eng.bind_node_type("Nation", load_table(spark, sf_dir, "nation"), pk="n_nationkey")
    eng.bind_edge_type(
        "LocatedIn",
        cust.select(
            F.col("c_custkey").alias("sk"), F.col("c_nationkey").alias("dk")
        ),
        src="sk", dst="dk",
        from_label="Customer", to_label="Nation",
    )
    res = eng.execute(
        "MATCH Customer a, LocatedIn*1..3 e, Nation b "
        "WHERE n_name: 'GERMANY' RETURN c_name, n_name;"
    )[0]
    return res.df


@query(
    "gql_match_order_limit",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id, c_name, c_acctbal
FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY c_acctbal DESC,
         length(CAST(c_custkey AS VARCHAR)), CAST(c_custkey AS VARCHAR)
LIMIT 5
""",
)
def gql_match_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY / LIMIT extension on MATCH: top-5 BUILDING customers by
    balance through the full GQL stack. ORDER and LIMIT are soft
    keywords (the reference reserves neither, parser/keywords.go:5-54),
    and the engine appends its deterministic _id tiebreak after the
    user keys so LIMIT is stable cross-engine. The physical plan is
    TakeOrderedAndProject over the pushed-filter scan — per-partition
    top-k, no global sort (asserted in tests/test_plan_expectations.py).
    """
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_mktsegment: 'BUILDING' "
        "RETURN c_name, c_acctbal ORDER BY c_acctbal DESC LIMIT 5;"
    )[0]
    return res.df


@query(
    "gql_match_count",
    oracle="""
SELECT COUNT(*) AS n_rows FROM customer WHERE c_mktsegment = 'BUILDING'
""",
)
def gql_match_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETURN COUNT(*) aggregate extension on MATCH: predicate row
    count through the full GQL stack. The parenthesized form keeps
    ``count`` a legal field name. Plan: map-side partial count over
    the pushed-filter scan + a single-row exchange."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_mktsegment: 'BUILDING' RETURN COUNT(*);"
    )[0]
    return res.df


@query(
    "gql_match_range_where",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id, c_name, c_acctbal
FROM customer
WHERE c_acctbal > 9000.0 AND c_mktsegment = 'BUILDING'
""",
)
def gql_match_range_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH with the range-WHERE extension: ``field > literal`` next
    to the reference's ``field: value`` equality (the lexer always had
    LT/GT for generic type params, reference parser/token.go:70-71;
    the reference grammar never uses them in WHERE). Typed coercion
    applies to the bound the same way it does to equality literals."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_acctbal > 9000.0, c_mktsegment: 'BUILDING' "
        "RETURN c_name, c_acctbal;"
    )[0]
    return res.df


@query(
    "gql_match_agg_return",
    oracle="""
SELECT CAST(SUM(c_nationkey) AS BIGINT) AS sum_c_nationkey
FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0.0
""",
)
def gql_match_agg_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH with the aggregate-RETURN extension beyond COUNT(*):
    ``RETURN SUM(field)`` (SUM/MIN/MAX/AVG), combined with the
    range-WHERE extension — map-side partial aggregation, single-row
    exchange, never a full sort."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_mktsegment: 'BUILDING', c_acctbal > 0.0 "
        "RETURN SUM(c_nationkey);"
    )[0]
    return res.df


@query(
    "gql_sql_bridge",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_nationkey < 10
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def gql_sql_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GQL<->SQL bridge end-to-end: ``engine.sql()`` runs full
    Spark SQL (aggregation with exact-decimal money math) over the
    ``node_Customer`` view the engine registers from its own catalog —
    the path a reference user takes to get the analytics the reference
    never had, without leaving the engine."""
    eng = _engine_with_customer(spark, sf_dir)
    return eng.sql(
        "SELECT c_mktsegment, CAST(COUNT(*) AS LONG) AS n, "
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal "
        "FROM node_Customer WHERE c_nationkey < 10 "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )


@query(
    "gql_match_distinct_neq",
    oracle="""
SELECT DISTINCT c_mktsegment, c_nationkey
FROM customer
WHERE c_mktsegment <> 'BUILDING' AND c_acctbal > 0.0
""",
)
def gql_match_distinct_neq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETURN DISTINCT + ``<>`` extensions through the full GQL stack:
    the distinct (segment, nation) pairs among positive-balance
    customers outside BUILDING. DISTINCT is a soft keyword (a field
    literally named ``distinct`` stays legal — LL(2) like ORDER/LIMIT);
    ``<>``/``!=`` follow the range extension's null-never-matches
    three-valued semantics in both the distributed predicate and the
    pure-buffer Python twin. The projection drops entity ids before
    dedup (keeping them would make DISTINCT a no-op), and the engine's
    deterministic order becomes the full projected tuple.

    Plan: pushed-filter scan -> partial-agg distinct + one shuffle on
    the return-field key — never a global sort.
    """
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_mktsegment <> 'BUILDING', c_acctbal > 0.0 "
        "RETURN DISTINCT c_mktsegment, c_nationkey;"
    )[0]
    return res.df


@query(
    "gql_match_group_agg",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_rows,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS sum_c_acctbal
FROM customer
WHERE c_acctbal > 0.0
GROUP BY c_mktsegment
""",
)
def gql_match_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate RETURN extension through the full GQL stack:
    ``RETURN c_mktsegment, COUNT(*), SUM(c_acctbal)`` groups by the
    named fields and projects deterministic ``n_rows``/``sum_<field>``
    aliases — map-side partial aggregation + one shuffle on the group
    key, the same plan SQL GROUP BY compiles to. The SUM is cast to
    exact decimal before aggregation on both sides so accumulation
    order cannot diverge (the engine's double sum would be
    order-dependent across 32 partitions).
    """
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_acctbal > 0.0 "
        "RETURN c_mktsegment, COUNT(*), SUM(c_acctbal);"
    )[0]
    return res.df.select(
        "c_mktsegment",
        "n_rows",
        F.col("sum_c_acctbal").cast("decimal(14,2)").cast("double").alias(
            "sum_c_acctbal"
        ),
    )


@query(
    "gql_match_or_where",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id, c_name, c_acctbal, c_mktsegment
FROM customer
WHERE (c_acctbal > 9500.0 OR c_mktsegment = 'BUILDING')
  AND c_nationkey < 10
""",
)
def gql_match_or_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH with the OR-disjunction WHERE extension: ``pred OR pred``
    binds tighter than the reference's comma conjunction, so
    ``a > x OR b: y, c < z`` is ``(a OR b) AND c``. OR is a soft
    keyword (the reserved-word table stays the reference's 46,
    parser/keywords.go) and the compiled predicate keeps the
    IsNotNull-guarded comparison form on each arm, so the whole
    disjunction pushes to the parquet scan as
    ``Or(And(IsNotNull, Gt), EqualNullSafe)`` — plan-CI-asserted."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_acctbal > 9500.0 OR c_mktsegment: 'BUILDING', "
        "c_nationkey < 10 RETURN c_name, c_acctbal, c_mktsegment;"
    )[0]
    return res.df


@query(
    "gql_match_in_where",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id, c_name, c_mktsegment
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal > 9000.0
""",
)
def gql_match_in_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH with the IN-list WHERE extension: ``field IN (lit, ...)``
    compiles to Catalyst's single ``In`` filter (null literals in the
    list add an IsNull arm, mirroring the engine's null-safe ``=``),
    so membership over K values is ONE pushable scan predicate rather
    than K unioned scans — at 100 TB the row groups that can't contain
    any of the K values are never read. IN is a soft keyword; a field
    literally named ``in`` still parses at predicate start."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY'), "
        "c_acctbal > 9000.0 RETURN c_name, c_mktsegment;"
    )[0]
    return res.df


@query(
    "gql_time_travel_match",
    oracle="""
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 'gizmo',  CAST(7 AS BIGINT)),
  (CAST(1 AS BIGINT), 'widget', CAST(10 AS BIGINT)),
  (CAST(2 AS BIGINT), 'gizmo',  CAST(7 AS BIGINT)),
  (CAST(2 AS BIGINT), 'widget', CAST(15 AS BIGINT)),
  (CAST(3 AS BIGINT), 'widget', CAST(15 AS BIGINT))
) AS t(version, name, qty)
""",
)
def gql_time_travel_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel surfaced IN the query language (r9): ``MATCH Item
    AS OF <version> WHERE ... RETURN ...`` compiles to the engine's
    ``node_df_at`` copy-on-write parquet read — AS/OF are soft
    keywords (LL(2): AS is a marker only before OF), the reserved-word
    table stays the reference's 46 (parser/keywords.go). The WHERE
    still pushes to the version's parquet scan; buffered rows are
    never visible to a past version. Three flushes (insert / update /
    delete between them) are MATCHed per-version with a qty filter;
    the oracle is the hand-computed surviving state."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from grapho_spark.engine import GraphEngine

    data_dir = scratch_path(f"grapho_ttm_{_os.getpid()}")
    _shutil.rmtree(data_dir, ignore_errors=True)
    eng = GraphEngine(spark, data_dir=data_dir)
    eng.execute(
        "CREATE NODE Item (name: string, qty: int);"
        "INSERT NODE Item (name: 'widget', qty: 10);"
        "INSERT NODE Item (name: 'gizmo', qty: 7);"
        "INSERT NODE Item (name: 'junk', qty: 0);"
    )
    eng.flush()  # v1
    eng.execute("UPDATE NODE Item SET qty: 15 WHERE name: 'widget';")
    eng.flush()  # v2
    eng.execute("DELETE NODE Item WHERE name: 'gizmo';")
    eng.flush()  # v3
    frames = []
    for v in eng.table_versions("node", "Item"):
        df = eng.execute(
            f"MATCH Item AS OF {v} WHERE qty > 5 RETURN name, qty;"
        )[0].df
        frames.append(
            df.select(
                F.lit(v).cast("long").alias("version"),
                "name",
                F.col("qty").cast("long").alias("qty"),
            )
        )
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out


@query(
    "gql_match_cmp_bounds",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id, c_name, c_acctbal
FROM customer
WHERE c_acctbal >= 9000.0 AND c_acctbal <= 9500.0 AND c_nationkey <= 5
""",
)
def gql_match_cmp_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH with the inclusive-bound extension (r9): ``field <=
    literal`` / ``field >= literal`` complete the comparison set next
    to ``<``/``>``/``<>``/IN — same IsNotNull-guarded total-predicate
    discipline (null never matches, DELETE's keep-side never sees a
    NULL predicate), same parquet pushdown (GreaterThanOrEqual /
    LessThanOrEqual scan filters, plan-CI-asserted), same pure-buffer
    Python twin, and the differential soak generator draws them like
    every other operator."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_acctbal >= 9000.0, c_acctbal <= 9500.0, "
        "c_nationkey <= 5 RETURN c_name, c_acctbal;"
    )[0]
    return res.df


@query(
    "gql_match_limit_offset",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id, c_name, c_acctbal
FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY c_acctbal DESC,
         length(CAST(c_custkey AS VARCHAR)), CAST(c_custkey AS VARCHAR)
LIMIT 5 OFFSET 5
""",
)
def gql_match_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paging extension (r9): ``LIMIT n OFFSET m`` on MATCH — OFFSET
    is a soft keyword valid only after LIMIT, and the engine's
    deterministic _id tiebreak makes the skipped prefix stable, so
    consecutive pages never overlap or gap (the property plain SQL
    paging lacks under ties). orderBy+offset+limit compile to ONE
    TakeOrderedAndProject(limit=m+n, offset=m): per-partition
    top-(m+n) then a driver merge — no global sort, no full skip-scan
    (plan-CI-asserted)."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_mktsegment: 'BUILDING' "
        "RETURN c_name, c_acctbal ORDER BY c_acctbal DESC LIMIT 5 OFFSET 5;"
    )[0]
    return res.df


@query(
    "gql_match_count_field",
    oracle="""
SELECT * FROM (VALUES
  ('oslo', CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
  ('rome', CAST(1 AS BIGINT), CAST(2 AS BIGINT))
) AS t(city, count_age, n_rows)
""",
)
def gql_match_count_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(field) extension (r9): counts NON-NULL values (SQL
    semantics) next to COUNT(*)'s row count, aliased
    ``count_<field>`` vs ``n_rows`` — in both the bare single-
    aggregate RETURN and the grouped form, same map-side-partial
    plan. The fixture plants a null age so the two counts diverge;
    the oracle is the hand-computed table."""
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    eng.execute(
        "CREATE NODE CityF (id: int PRIMARY KEY, city: string, age: int);"
        "INSERT NODE CityF (id: 1, city: 'rome', age: 10);"
        "INSERT NODE CityF (id: 2, city: 'rome');"
        "INSERT NODE CityF (id: 3, city: 'oslo', age: 30);"
    )
    res = eng.execute(
        "MATCH CityF RETURN city, COUNT(age), COUNT(*) ORDER BY city;"
    )[0]
    return res.df


@query(
    "gql_match_not_where",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id, c_name, c_acctbal, c_mktsegment
FROM customer
WHERE NOT (c_mktsegment = 'BUILDING' OR c_mktsegment = 'MACHINERY')
  AND c_acctbal > 9600.0
""",
)
def gql_match_not_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH with the NOT WHERE extension (r10): ``NOT term`` negates
    a single predicate or a parenthesized group. Every leaf compiles
    TOTAL (null-safe ``=``, IsNotNull-guarded comparisons, guarded
    IN), so the negation is plain boolean NOT — no three-valued
    surprise on DELETE's ``~pred`` keep side — and Catalyst folds
    ``Not(Or(EqualNullSafe...))`` into a pushable scan filter
    (plan-CI-asserted). NOT was already reserved in the reference
    lexer (NOT NULL, parser/token.go), so the reserved-word table is
    unchanged. c_mktsegment is never null in the fixture, so the
    null-matching arm of NOT-over-``=`` is inert here and the DuckDB
    NOT(...) oracle agrees; the null semantics themselves are pinned
    by tests/test_engine.py::test_not_and_paren_where_semantics."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE "
        "NOT (c_mktsegment: 'BUILDING' OR c_mktsegment: 'MACHINERY'), "
        "c_acctbal > 9600.0 "
        "RETURN c_name, c_acctbal, c_mktsegment;"
    )[0]
    return res.df


@query(
    "gql_match_paren_groups",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id, c_name, c_acctbal, c_nationkey
FROM customer
WHERE ((c_nationkey < 3 AND c_acctbal > 9000.0)
       OR (c_nationkey > 20 AND NOT c_acctbal < 9900.0))
""",
)
def gql_match_paren_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parenthesized WHERE groups (r10): ``( ... )`` wraps a full
    nested predicate list (comma = AND, OR, NOT all legal inside) and
    participates in an enclosing disjunction like any member —
    completing the boolean algebra the r9 OR/IN extension started.
    The nested groups compile to ordinary AND/OR Columns that
    Catalyst flattens and pushes whole to the parquet scan."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE "
        "(c_nationkey < 3, c_acctbal > 9000.0) OR "
        "(c_nationkey > 20, NOT c_acctbal < 9900.0) "
        "RETURN c_name, c_acctbal, c_nationkey;"
    )[0]
    return res.df


@query(
    "gql_match_qualified_return",
    oracle="""
WITH e AS (
  SELECT c1.c_custkey AS s, c2.c_custkey AS d
  FROM customer c1 JOIN customer c2
    ON c2.c_custkey = c1.c_custkey + 1
   AND c2.c_mktsegment = c1.c_mktsegment)
SELECT CAST(a.c_custkey AS VARCHAR) AS x__id,
       'edge_' || CAST(e.s AS VARCHAR) || '_' || CAST(e.d AS VARCHAR) AS e__id,
       CAST(b.c_custkey AS VARCHAR) AS y__id,
       a.c_name AS x_c_name, b.c_name AS y_c_name,
       b.c_acctbal AS y_c_acctbal
FROM e
JOIN customer a ON a.c_custkey = e.s
JOIN customer b ON b.c_custkey = e.d
WHERE a.c_mktsegment = 'BUILDING' AND b.c_acctbal > 5000.0
""",
)
def gql_match_qualified_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias-qualified RETURN fields (r10): ``RETURN x.c_name,
    y.c_name, y.c_acctbal`` projects a shared field from BOTH chain
    endpoints in one statement — the projection twin of the r9
    alias-qualified WHERE key, which the first-declaring-element rule
    for unqualified fields cannot express. Output columns are
    ``<alias>_<field>``, and ORDER BY accepts the dotted form through
    the same exact-resolution. The NextInSeg edge links consecutive
    customer ids within a market segment (the var-length fixture's
    single-hop shape); bound-edge _ids are 'edge_<src>_<dst>',
    mirrored in the oracle."""
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    cust = load_table(spark, sf_dir, "customer")
    eng.bind_node_type("Customer", cust, pk="c_custkey")
    c1 = cust.select(F.col("c_custkey").alias("sk"), F.col("c_mktsegment").alias("m1"))
    c2 = cust.select(F.col("c_custkey").alias("dk"), F.col("c_mktsegment").alias("m2"))
    edges = c1.join(
        c2, (F.col("dk") == F.col("sk") + 1) & (F.col("m1") == F.col("m2"))
    ).select("sk", "dk")
    eng.bind_edge_type(
        "NextInSeg", edges, src="sk", dst="dk",
        from_label="Customer", to_label="Customer",
    )
    res = eng.execute(
        "MATCH Customer x, NextInSeg e, Customer y "
        "WHERE x.c_mktsegment: 'BUILDING', y.c_acctbal > 5000.0 "
        "RETURN x.c_name, y.c_name, y.c_acctbal;"
    )[0]
    return res.df


@query(
    "gql_match_return_alias",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id,
       c_name AS owner, c_acctbal AS balance
FROM customer
WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000.0
""",
)
def gql_match_return_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETURN output aliasing (r11): ``RETURN p.c_name AS owner,
    c_acctbal AS balance`` — the user picks the OUTPUT column names
    (the projection surface's missing half after r10's qualified
    RETURN, whose columns were auto-named ``<alias>_<field>``). ``AS``
    is a soft keyword (marker only before an IDENT inside the RETURN
    list), so fields literally named ``as`` stay legal, and AS OF is
    unaffected (it sits before WHERE). ORDER BY and DISTINCT resolve
    aliases as exact output columns; output-name collisions are
    parse-time errors. The reference parses-and-ignores RETURN
    entirely (parser/parser.go:711-719) — extension polish."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer p "
        "WHERE p.c_mktsegment: 'BUILDING', p.c_acctbal > 9000.0 "
        "RETURN p.c_name AS owner, c_acctbal AS balance;"
    )[0]
    return res.df


@query(
    "gql_match_agg_alias",
    oracle="""
SELECT c_mktsegment AS segment, COUNT(*) AS n_cust,
       MAX(c_acctbal) AS top_bal
FROM customer
WHERE c_acctbal > 1000.0
GROUP BY c_mktsegment
ORDER BY n_cust DESC, segment
""",
)
def gql_match_agg_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate output aliasing (r11): ``COUNT(*) AS n_cust,
    MAX(c_acctbal) AS top_bal`` renames aggregate output columns (the
    aggregate half of RETURN AS; defaults stay the deterministic
    ``n_rows``/``<func>_<field>`` names), with ORDER BY resolving the
    user alias. Group keys alias too (``c_mktsegment AS segment``).
    Same grouped plan as gql_match_group_agg: map-side partial agg +
    one shuffle on the key. MAX over decimals is order-free, so no
    accumulation-order cast discipline is needed."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_acctbal > 1000.0 "
        "RETURN c_mktsegment AS segment, COUNT(*) AS n_cust, "
        "MAX(c_acctbal) AS top_bal ORDER BY n_cust DESC, segment;"
    )[0]
    return res.df


@query(
    "gql_match_count_distinct",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM customer
WHERE c_acctbal > 0.0
GROUP BY c_mktsegment
""",
)
def gql_match_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT field) through the full GQL stack (r11):
    distinct non-null count per group, aliased, alongside COUNT(*).
    DISTINCT is a soft keyword inside COUNT(...) — a field literally
    named distinct stays reachable. Spark compiles the standard
    two-phase expand + partial-agg plan (map-side distinct before the
    shuffle), the same shape SQL COUNT(DISTINCT) gets."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_acctbal > 0.0 "
        "RETURN c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, "
        "COUNT(*) AS n_rows;"
    )[0]
    return res.df


@query(
    "gql_match_optional",
    oracle="""
SELECT CAST(c.c_custkey AS VARCHAR) AS c__id,
       CASE WHEN o.o_orderkey IS NULL THEN NULL
            ELSE 'edge_' || CAST(o.o_custkey AS VARCHAR) || '_'
                         || CAST(o.o_orderkey AS VARCHAR) END AS h__id,
       CAST(o.o_orderkey AS VARCHAR) AS o__id,
       c.c_name AS cust,
       o.o_totalprice AS price
FROM customer c
LEFT JOIN orders o
  ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
WHERE o.o_totalprice IS NULL OR o.o_totalprice < 100000.0
""",
)
def gql_match_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL MATCH (r11): ``MATCH Customer c, OPTIONAL PlacedP h,
    Order o`` compiles the marked hop (and everything after it) to
    LEFT joins — customers with no pending order survive with
    NULL-padded edge/order fields. WHERE stays a post-join filter
    over TOTAL predicates, so ``NOT o.o_totalprice >= X`` KEEPS the
    NULL-padded rows (guarded comparison is false on NULL; NOT false
    is true) — mirrored in the oracle as ``IS NULL OR <``. Declared
    absent in the reference (inner-only chains); every mainstream
    graph QL grows this form."""
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    o = load_table(spark, sf_dir, "orders")
    eng.bind_node_type("Customer", load_table(spark, sf_dir, "customer"), pk="c_custkey")
    eng.bind_node_type("Order", o.select("o_orderkey", "o_totalprice"), pk="o_orderkey")
    eng.bind_edge_type(
        "PlacedP",
        o.filter(F.col("o_orderstatus") == "P").select("o_custkey", "o_orderkey"),
        src="o_custkey",
        dst="o_orderkey",
        from_label="Customer",
        to_label="Order",
    )
    res = eng.execute(
        "MATCH Customer c, OPTIONAL PlacedP h, Order o "
        "WHERE NOT o.o_totalprice >= 100000.0 "
        "RETURN c.c_name AS cust, o.o_totalprice AS price;"
    )[0]
    return res.df


@query(
    "gql_match_bool_algebra",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id,
       c_name AS name, c_acctbal AS bal, c_mktsegment AS seg
FROM customer
WHERE NOT (c_mktsegment = 'AUTOMOBILE'
           OR c_mktsegment IN ('FURNITURE', 'HOUSEHOLD'))
  AND c_acctbal >= 1000.0 AND c_acctbal < 9000.0
  AND c_nationkey <> 13
ORDER BY bal DESC, name
LIMIT 40 OFFSET 10
""",
)
def gql_match_bool_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r10/r11 MATCH surface composed in ONE statement, executed
    against a FLUSHED BUCKETED engine table (VERDICT r10 task #3): NOT
    over a parenthesized OR group, IN, inclusive/exclusive bounds and
    ``<>`` — all as alias-qualified WHERE keys — with qualified RETURN
    under r11 ``AS`` output aliases and ORDER BY/LIMIT/OFFSET paging.
    The fixture binds customer as a node type and flushes, so the scan
    is the engine's versioned ``_gbkt`` bucket layout and the whole
    predicate tree pushes to that parquet scan (plan-CI pins
    Not/In/bounds in PushedFilters and the single
    TakeOrderedAndProject carrying the offset). Every leaf compiles
    total (null-safe =, IsNotNull-guarded cmp/IN), and c_mktsegment /
    c_acctbal / c_nationkey are never null in the fixture, so the
    plain-SQL oracle agrees; the null semantics themselves are pinned
    by tests/test_engine.py."""
    import os as _os
    import shutil as _shutil

    from grapho_spark.engine import GraphEngine

    data_dir = scratch_path(f"grapho_ba_{_os.getpid()}")
    _shutil.rmtree(data_dir, ignore_errors=True)
    eng = GraphEngine(spark, data_dir=data_dir)
    eng.bind_node_type(
        "Customer", load_table(spark, sf_dir, "customer"), pk="c_custkey"
    )
    eng.flush()  # v1: bucket-complete _gbkt layout on disk
    res = eng.execute(
        "MATCH Customer c WHERE "
        "NOT (c.c_mktsegment: 'AUTOMOBILE' OR "
        "c.c_mktsegment IN ('FURNITURE', 'HOUSEHOLD')), "
        "c.c_acctbal >= 1000.0, c.c_acctbal < 9000.0, "
        "c.c_nationkey <> 13 "
        "RETURN c.c_name AS name, c.c_acctbal AS bal, "
        "c.c_mktsegment AS seg "
        "ORDER BY bal DESC, name LIMIT 40 OFFSET 10;"
    )[0]
    return res.df


@query(
    "gql_match_agg_qualified",
    oracle="""
SELECT c.c_mktsegment AS c_c_mktsegment,
       COUNT(DISTINCT o.o_orderkey) AS count_distinct_o_o_orderkey,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_o_o_totalprice
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def gql_match_agg_qualified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qualified aggregate arguments (r12, VERDICT r11 #3):
    ``RETURN c.c_mktsegment, COUNT(DISTINCT o.o_orderkey),
    SUM(o.o_totalprice)`` over a chain pattern — the aggregate
    argument targets a NON-TAIL element by alias, resolving through
    the same ``<alias>_<field>`` output-column rule as qualified
    RETURN fields. The SUM is exact decimal end-to-end and cast to
    double only at the output boundary, so 32-partition accumulation
    order cannot diverge from DuckDB's."""
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    o = load_table(spark, sf_dir, "orders")
    eng.bind_node_type(
        "Customer", load_table(spark, sf_dir, "customer"), pk="c_custkey"
    )
    eng.bind_node_type(
        "Order", o.select("o_orderkey", "o_totalprice"), pk="o_orderkey"
    )
    eng.bind_edge_type(
        "Placed",
        o.select("o_custkey", "o_orderkey"),
        src="o_custkey",
        dst="o_orderkey",
        from_label="Customer",
        to_label="Order",
    )
    res = eng.execute(
        "MATCH Customer c, Placed p, Order o "
        "RETURN c.c_mktsegment, COUNT(DISTINCT o.o_orderkey), "
        "SUM(o.o_totalprice);"
    )[0]
    return res.df.select(
        "c_c_mktsegment",
        "count_distinct_o_o_orderkey",
        F.col("sum_o_o_totalprice")
        .cast("decimal(18,2)")
        .cast("double")
        .alias("sum_o_o_totalprice"),
    )


@query(
    "gql_match_having",
    oracle="""
SELECT c_nationkey, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS bal
FROM customer
WHERE c_acctbal > 0.0
GROUP BY c_nationkey
HAVING COUNT(*) > 45 OR c_nationkey = 0
""",
)
def gql_match_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING extension (r12, VERDICT r11 #4): post-aggregate filter
    over group keys + aggregate aliases — ``RETURN c_nationkey,
    COUNT(*) AS n, SUM(c_acctbal) AS bal HAVING n > 45 OR
    c_nationkey: 0``. Same predicate grammar as WHERE (comparisons,
    OR, NOT, IN); names resolve against the closed post-aggregation
    namespace ORDER BY already enforces. Compiles to a plain filter
    above the partial-agg + single-shuffle plan — the pre-aggregation
    WHERE pushdown is unaffected (the filter reads aggregate
    outputs)."""
    eng = _engine_with_customer(spark, sf_dir)
    res = eng.execute(
        "MATCH Customer WHERE c_acctbal > 0.0 "
        "RETURN c_nationkey, COUNT(*) AS n, SUM(c_acctbal) AS bal "
        "HAVING n > 45 OR c_nationkey: 0;"
    )[0]
    return res.df.select(
        "c_nationkey",
        "n",
        F.col("bal").cast("decimal(14,2)").cast("double").alias("bal"),
    )


@query(
    "gql_match_optional_varlen",
    oracle="""
WITH e AS (
  SELECT c1.c_custkey AS s, c2.c_custkey AS d
  FROM customer c1 JOIN customer c2
    ON c2.c_custkey = c1.c_custkey + 1
   AND c2.c_mktsegment = c1.c_mktsegment),
h1 AS (SELECT s, d, 1 AS hops FROM e),
h2 AS (SELECT DISTINCT e1.s, e2.d, 2 AS hops
       FROM e e1 JOIN e e2 ON e1.d = e2.s),
pairs AS (
  SELECT s, d, MIN(hops) AS hops
  FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2)
  GROUP BY s, d)
SELECT CAST(a.c_custkey AS VARCHAR) AS a__id,
       CAST(b.c_custkey AS VARCHAR) AS b__id,
       CAST(p.hops AS BIGINT) AS n_hops,
       a.c_name AS a_c_name,
       b.c_name AS b_c_name
FROM customer a
LEFT JOIN pairs p ON p.s = a.c_custkey
LEFT JOIN customer b ON b.c_custkey = p.d
WHERE a.c_mktsegment = 'BUILDING'
""",
)
def gql_match_optional_varlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL variable-length traversal (r12, VERDICT r11 #5):
    ``MATCH Customer a, OPTIONAL NextInSeg*1..2 n, Customer b`` keeps
    EVERY left-endpoint row; rows with no reachable endpoint within
    the bounds NULL-pad hops and b's columns (left-outer composition
    of the bounded hop union — the (pairs x right-node) block joins
    as a unit so the padding survives). The WHERE is alias-qualified
    to ``a`` — an unqualified segment predicate would apply to b too
    and re-drop the padded rows, SQL LEFT JOIN + WHERE semantics."""
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    cust = load_table(spark, sf_dir, "customer")
    eng.bind_node_type("Customer", cust, pk="c_custkey")
    c1 = cust.select(F.col("c_custkey").alias("sk"), F.col("c_mktsegment").alias("m1"))
    c2 = cust.select(F.col("c_custkey").alias("dk"), F.col("c_mktsegment").alias("m2"))
    edges = c1.join(
        c2, (F.col("dk") == F.col("sk") + 1) & (F.col("m1") == F.col("m2"))
    ).select("sk", "dk")
    eng.bind_edge_type(
        "NextInSeg", edges, src="sk", dst="dk",
        from_label="Customer", to_label="Customer",
    )
    res = eng.execute(
        "MATCH Customer a, OPTIONAL NextInSeg*1..2 n, Customer b "
        "WHERE a.c_mktsegment: 'BUILDING' "
        "RETURN a.c_name, b.c_name;"
    )[0]
    return res.df


@query(
    "gql_time_travel_agg",
    oracle="""
SELECT * FROM (VALUES
  (1, 'a', CAST(2 AS BIGINT), CAST(17 AS BIGINT)),
  (1, 'b', CAST(1 AS BIGINT), CAST(5 AS BIGINT)),
  (2, 'a', CAST(2 AS BIGINT), CAST(27 AS BIGINT)),
  (2, 'b', CAST(1 AS BIGINT), CAST(5 AS BIGINT)),
  (3, 'a', CAST(1 AS BIGINT), CAST(20 AS BIGINT))
) AS t(version, grp, n, total_qty)
""",
)
def gql_time_travel_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregates composed with AS OF time travel (r12,
    VERDICT r11 #8): ``MATCH Item AS OF <v> RETURN grp, COUNT(*) AS n,
    SUM(qty) AS total_qty`` — the aggregation runs over the committed
    parquet version's rows (buffered rows are NOT part of a past
    version), exercising the time-travel read and the grouped RETURN
    in ONE statement. Three flushed versions (insert / update /
    delete between them); the oracle is the hand-computed per-version
    group state."""
    import os as _os
    import shutil as _shutil

    from grapho_spark.engine import GraphEngine

    data_dir = scratch_path(f"grapho_tta_{_os.getpid()}")
    _shutil.rmtree(data_dir, ignore_errors=True)
    eng = GraphEngine(spark, data_dir=data_dir)
    eng.execute(
        "CREATE NODE Item (grp: string, qty: int);"
        "INSERT NODE Item (grp: 'a', qty: 10);"
        "INSERT NODE Item (grp: 'a', qty: 7);"
        "INSERT NODE Item (grp: 'b', qty: 5);"
    )
    eng.flush()  # v1: a={10,7}, b={5}
    eng.execute("UPDATE NODE Item SET qty: 20 WHERE qty: 10;")
    eng.flush()  # v2: a={20,7}, b={5}
    eng.execute("DELETE NODE Item WHERE qty: 7; DELETE NODE Item WHERE grp: 'b';")
    eng.flush()  # v3: a={20}
    frames = []
    for v in eng.table_versions("node", "Item"):
        df = eng.execute(
            f"MATCH Item AS OF {v} RETURN grp, COUNT(*) AS n, "
            f"SUM(qty) AS total_qty;"
        )[0].df
        frames.append(
            df.select(
                F.lit(v).alias("version"),
                "grp",
                "n",
                F.col("total_qty").cast("long").alias("total_qty"),
            )
        )
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out


@query(
    "gql_match_point_pruned",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id, c_name, c_acctbal
FROM customer WHERE c_custkey = 42
""",
)
def gql_match_point_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point MATCH through the r13 zone/bloom pruning path end-to-end
    (VERDICT r12 #2's read side in the driver's correctness gate):
    the customer fixture is bound, FLUSHED to the bucketed layout
    with per-leaf blooms forced on (``zone_bloom_rows=0``), and the
    pk equality probes the manifest — the scan reads only the leafs
    whose bloom admits the key (x100 probe: statement wall flat at
    ~0.3-0.8s across a 100x scale-up, PERF.md r13). The oracle is the
    same point SELECT; any pruning unsoundness (a dropped true row)
    would surface as a row-count/value mismatch here."""
    import os as _os
    import shutil as _shutil

    from grapho_spark.engine import GraphEngine

    data_dir = scratch_path(f"grapho_pp_{_os.getpid()}")
    _shutil.rmtree(data_dir, ignore_errors=True)
    eng = GraphEngine(spark, data_dir=data_dir, zone_bloom_rows=0)
    eng.bind_node_type(
        "Customer", load_table(spark, sf_dir, "customer"), pk="c_custkey"
    )
    eng.flush()  # v1: bucket-complete _gbkt layout + _FILES/_ZONES
    res = eng.execute(
        "MATCH Customer c WHERE c.c_custkey: 42 "
        "RETURN c.c_name AS c_name, c.c_acctbal AS c_acctbal;"
    )[0]
    return res.df


@query(
    "gql_match_optional_node",
    oracle="""
SELECT CAST(c.c_custkey AS VARCHAR) AS c__id,
       'edge_' || CAST(o.o_custkey AS VARCHAR) || '_'
               || CAST(o.o_orderkey AS VARCHAR) AS p__id,
       CASE WHEN o.o_totalprice < 150000.0
            THEN CAST(o.o_orderkey AS VARCHAR) END AS o__id,
       c.c_name AS cust,
       CASE WHEN o.o_totalprice < 150000.0
            THEN o.o_totalprice END AS price
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'F'
""",
)
def gql_match_optional_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL on a trailing NODE element (r13, VERDICT r12 #5):
    ``MATCH Customer c, PlacedF p, OPTIONAL Order o`` left-outers
    ONLY the final hop's dst join — the edge stays required, and the
    dst node NULL-pads exactly when the edge dangles (the reference's
    DELETE NODE does not cascade, server/server.go:699-740, so
    dangling edges are a reachable steady state this form exists to
    read). Here the Order node type is bound to a SUBSET of orders
    (< 150k), so 'F' edges to expensive orders dangle by
    construction."""
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    o = load_table(spark, sf_dir, "orders")
    eng.bind_node_type(
        "Customer", load_table(spark, sf_dir, "customer"), pk="c_custkey"
    )
    eng.bind_node_type(
        "Order",
        o.filter(F.col("o_totalprice") < 150000.0).select(
            "o_orderkey", "o_totalprice"
        ),
        pk="o_orderkey",
    )
    eng.bind_edge_type(
        "PlacedF",
        o.filter(F.col("o_orderstatus") == "F").select(
            "o_custkey", "o_orderkey"
        ),
        src="o_custkey",
        dst="o_orderkey",
        from_label="Customer",
        to_label="Order",
    )
    res = eng.execute(
        "MATCH Customer c, PlacedF p, OPTIONAL Order o "
        "RETURN c.c_name AS cust, o.o_totalprice AS price;"
    )[0]
    return res.df


@query(
    "gql_match_optional_node_leading",
    oracle="""
SELECT CASE WHEN c.c_acctbal > 0.0
            THEN CAST(c.c_custkey AS VARCHAR) END AS c__id,
       'edge_' || CAST(o.o_custkey AS VARCHAR) || '_'
               || CAST(o.o_orderkey AS VARCHAR) AS p__id,
       CAST(o.o_orderkey AS VARCHAR) AS o__id,
       CASE WHEN c.c_acctbal > 0.0 THEN c.c_name END AS cust,
       o.o_totalprice AS price
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_orderstatus = 'F'
""",
)
def gql_match_optional_node_leading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The symmetric LEADING form (r13, VERDICT r12 #5): ``MATCH
    OPTIONAL Customer c, PlacedF p, Order o`` keeps every (edge,
    order) pair and NULL-pads the src node when no Customer row
    matches the edge's _src — compiled as a RIGHT join on the first
    hop's src side. Customer is bound to the positive-balance subset
    so the padding is reachable on fixture data."""
    from grapho_spark.engine import GraphEngine

    eng = GraphEngine(spark)
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    eng.bind_node_type(
        "Customer",
        cust.filter(F.col("c_acctbal") > 0.0),
        pk="c_custkey",
    )
    eng.bind_node_type(
        "Order", o.select("o_orderkey", "o_totalprice"), pk="o_orderkey"
    )
    eng.bind_edge_type(
        "PlacedF",
        o.filter(F.col("o_orderstatus") == "F").select(
            "o_custkey", "o_orderkey"
        ),
        src="o_custkey",
        dst="o_orderkey",
        from_label="Customer",
        to_label="Order",
    )
    res = eng.execute(
        "MATCH OPTIONAL Customer c, PlacedF p, Order o "
        "RETURN c.c_name AS cust, o.o_totalprice AS price;"
    )[0]
    return res.df


@query(
    "gql_match_having_qualified",
    oracle="""
SELECT * FROM (VALUES
  (1, 'a', CAST(17 AS BIGINT), CAST(2 AS BIGINT)),
  (2, 'a', CAST(27 AS BIGINT), CAST(2 AS BIGINT))
) AS t(version, t_grp, s, n)
""",
)
def gql_match_having_qualified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over QUALIFIED group keys + qualified aggregate args +
    AS OF composed in one statement (r13, VERDICT r12 #6): ``MATCH
    Item t AS OF <v> WHERE t.qty > 0 RETURN t.grp, SUM(t.qty) AS s,
    COUNT(*) AS n HAVING s >= 12 OR t_grp: 'missing'`` — the group
    key projected via qualified RETURN is addressable in HAVING under
    its OUTPUT name (``t_grp``), the same closed post-aggregation
    namespace ORDER BY resolves. Two flushed versions; group 'b'
    (s=5) fails HAVING in both. Hand-computed oracle."""
    import os as _os
    import shutil as _shutil

    from grapho_spark.engine import GraphEngine

    data_dir = scratch_path(f"grapho_hq_{_os.getpid()}")
    _shutil.rmtree(data_dir, ignore_errors=True)
    eng = GraphEngine(spark, data_dir=data_dir)
    eng.execute(
        "CREATE NODE Item (grp: string, qty: int);"
        "INSERT NODE Item (grp: 'a', qty: 10);"
        "INSERT NODE Item (grp: 'a', qty: 7);"
        "INSERT NODE Item (grp: 'b', qty: 5);"
    )
    eng.flush()  # v1: a={10,7}, b={5}
    eng.execute("UPDATE NODE Item SET qty: 20 WHERE qty: 10;")
    eng.flush()  # v2: a={20,7}, b={5}
    frames = []
    for v in eng.table_versions("node", "Item"):
        df = eng.execute(
            f"MATCH Item t AS OF {v} WHERE t.qty > 0 "
            "RETURN t.grp, SUM(t.qty) AS s, COUNT(*) AS n "
            "HAVING s >= 12 OR t_grp: 'missing';"
        )[0].df
        frames.append(
            df.select(
                F.lit(v).alias("version"),
                "t_grp",
                F.col("s").cast("long").alias("s"),
                "n",
            )
        )
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out
