"""Local replica of the driver's correctness gate: run each registered
query on Spark and its oracle SQL on DuckDB over the same parquet
tables, compare row-count + (name-sorted) schema + values.

The driver hashes order-insensitively, so we sort rows over all
columns; values must match EXACTLY (the queries are engineered for
cross-engine determinism — decimal/integer math or explicit rounding).

DuckDB results are fetched through Arrow (not ``fetchall``) to mirror
the driver's conversion path: ``fetchall`` silently converts HUGEINT
(the result type of SUM over integers) to Python int, hiding a typed
int64-vs-float64 divergence the driver DOES see. Round-1 lesson:
always ``CAST(SUM(<int>) AS BIGINT)`` in oracle SQL output columns.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from typing import Any

import duckdb

from grapho_spark.tables import TABLE_NAMES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _norm(v: Any) -> Any:
    """Normalize a leaf value to a (type-tag, value) pair.

    The tag makes cross-type equality FAIL on purpose: Python says
    ``101005 == 101005.0 == Decimal('101005')`` but the driver hashes
    typed arrow columns, so an int64-vs-float64 divergence (e.g. DuckDB
    HUGEINT sums) must be flagged here even though values are equal.
    """
    if v is None:
        return None
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", v)
    if isinstance(v, decimal.Decimal):
        return ("dec", v)
    if isinstance(v, _dt.datetime):
        return ("s", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("s", v.isoformat())
    if isinstance(v, _dt.time):
        return ("s", v.isoformat())
    if isinstance(v, bytes):
        return ("y", v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return ("s", v) if isinstance(v, str) else v


def _sort_key(row: tuple) -> tuple:
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def rows_canonical(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return sorted_cols, out


def compare_query(spark, name: str, sf_dir: str) -> dict:
    """Run query ``name`` on Spark and DuckDB; return a report dict."""
    from grapho_spark.queries import all_queries

    q = all_queries()[name]
    sdf = q.spark_fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)

    if q.oracle is None:
        return {"name": name, "status": "rows_only", "spark_rows": len(s_rows)}

    con = duck_connection(sf_dir)
    try:
        tbl = con.execute(q.oracle).arrow()
        d_cols = list(tbl.schema.names)
        cols_py = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
        d_rows = [tuple(col[i] for col in cols_py) for i in range(tbl.num_rows)]
    finally:
        con.close()

    sc, sr = rows_canonical(s_cols, s_rows)
    dc, dr = rows_canonical(d_cols, d_rows)

    report: dict = {
        "name": name,
        "spark_rows": len(sr),
        "duck_rows": len(dr),
        "spark_cols": sc,
        "duck_cols": dc,
    }
    if sc != dc:
        report["status"] = "schema_mismatch"
        return report
    if len(sr) != len(dr):
        report["status"] = "rowcount_mismatch"
        return report
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            report["status"] = "value_mismatch"
            report["first_diff_row"] = i
            report["spark_row"] = a
            report["duck_row"] = b
            return report
    report["status"] = "match"
    return report
