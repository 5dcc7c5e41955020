"""Shared helpers for oracle-checked queries.

Float discipline: DOUBLE aggregation is order-dependent, and Spark/DuckDB merge
partials in different orders. Every money aggregate therefore accumulates in
DECIMAL(12,2)-derived exact types and casts the *final* scalar to DOUBLE, which
is bit-deterministic in both engines (see queries/__init__ docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dec(col: str | Column) -> Column:
    """Exact 2-decimal fixed-point view of a money/quantity column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def one_minus(col: str) -> Column:
    """``(1 - col)`` kept at DECIMAL(12,2) so products stay within 38 digits."""
    return (F.lit(1) - dec(col)).cast("decimal(12,2)")


def one_plus(col: str) -> Column:
    return (F.lit(1) + dec(col)).cast("decimal(12,2)")


def dsum(c: Column) -> Column:
    """Exact decimal sum, surfaced as DOUBLE."""
    return F.sum(c).cast("double")


# SQL-side (shared dialect) equivalents, for oracle strings.
SQL_DEC = "CAST({c} AS DECIMAL(12,2))"


def sql_dec(c: str) -> str:
    return SQL_DEC.format(c=c)


def sql_one_minus(c: str) -> str:
    return f"CAST(1 - {sql_dec(c)} AS DECIMAL(12,2))"


def sql_one_plus(c: str) -> str:
    return f"CAST(1 + {sql_dec(c)} AS DECIMAL(12,2))"


# revenue := sum(extendedprice * (1 - discount)) — the TPC-H workhorse.
SQL_REVENUE = (
    f"CAST(SUM({sql_dec('l_extendedprice')} * {sql_one_minus('l_discount')}) AS DOUBLE)"
)


def revenue_col() -> Column:
    return dsum(dec("l_extendedprice") * one_minus("l_discount"))
