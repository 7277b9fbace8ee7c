"""Shared helpers for oracle-exact arithmetic.

Float sums are accumulation-order-dependent, and Spark and DuckDB
partition/accumulate differently — so any ``sum(double)`` can differ in
the last ulps and break the driver's value hash. All monetary math here
is done in DECIMAL with tightly-chosen precisions (kept small so DuckDB's
``w1+w2`` multiplication-width rule stays under its 38-digit cap), then
cast to double at the end — bit-identical across engines regardless of
accumulation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: str | Column, p: int = 12, s: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


def one_minus(col: str) -> Column:
    """(1 - col) as decimal(4,2) — for discount factors in [0, 1]."""
    return (F.lit(1.0) - F.col(col)).cast("decimal(4,2)")


def one_plus(col: str) -> Column:
    """(1 + col) as decimal(4,2) — for tax factors in [1, 2)."""
    return (F.lit(1.0) + F.col(col)).cast("decimal(4,2)")


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return dec("l_extendedprice") * one_minus("l_discount")


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal."""
    return disc_price() * one_plus("l_tax")


def dsum(col: Column, name: str) -> Column:
    """Exact decimal sum surfaced as double (deterministic)."""
    return F.sum(col).cast("double").alias(name)


# DuckDB-side equivalents (keep in sync with the above).
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
)
SQL_CHARGE = SQL_DISC_PRICE + " * CAST(1 + l_tax AS DECIMAL(4,2))"
