"""Scalar functions present in Flink 1.12 but absent from PySpark built-ins
(SURVEY.md §2.7; reference surface: flink-table/flink-table-planner-blink/.../
functions/sql/FlinkSqlOperatorTable.java, runtime SqlFunctionUtils.java:62).

All helpers return Column expressions built from pyspark.sql.functions — they
stay inside WholeStageCodegen (no Python-side evaluation), so they cost the
same as native built-ins at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def split_index(col: str | Column, sep: str, index: int) -> Column:
    """Flink SPLIT_INDEX(str, sep, index) — 0-based, NULL when out of range.
    Reference: SqlFunctionUtils.java (splitIndex). ``sep`` is a literal string,
    so regex metacharacters are escaped before F.split."""
    return F.get(F.split(_c(col), re.escape(sep)), index)


_DECIMAL_RE = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$"


def is_decimal(col: str | Column) -> Column:
    """Flink IS_DECIMAL(str): parseable as a decimal number."""
    return _c(col).rlike(_DECIMAL_RE)


def is_digit(col: str | Column) -> Column:
    """Flink IS_DIGIT(str): all characters are digits (non-empty)."""
    return _c(col).rlike(r"^[0-9]+$")


def is_alpha(col: str | Column) -> Column:
    """Flink IS_ALPHA(str): all characters are letters (non-empty)."""
    return _c(col).rlike(r"^[a-zA-Z]+$")


def similar_to_regex(pattern: str) -> str:
    """Translate a SQL ``SIMILAR TO`` pattern to an anchored regex.

    SQL semantics: ``%`` = any string, ``_`` = any char, the rest is a regex
    subset; the whole string must match. Handles escaped ``\\%`` / ``\\_``.
    """
    out: list[str] = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(ch)
        i += 1
    return "^" + "".join(out) + "$"


def similar_to(col: str | Column, pattern: str) -> Column:
    """SQL ``expr SIMILAR TO pattern`` (Flink supports it; Spark lacks it)."""
    return _c(col).rlike(similar_to_regex(pattern))


def hash_code(col: str | Column) -> Column:
    """Flink HASH_CODE(str): Java ``String.hashCode`` (h = 31*h + c, 32-bit wrap).

    Expressed as a fold over the characters in LONG arithmetic with an explicit
    mod-2^32 wrap per step (Java int overflow semantics, safe under Spark's
    ANSI mode). Runs in codegen; for very long strings prefer xxhash64/md5 —
    this exists purely for Flink-output parity.
    """
    chars = F.split(_c(col), "")
    two31, two32 = F.lit(2147483648), F.lit(4294967296)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * F.lit(31) + F.ascii(ch) + two31, two32) - two31,
    ).cast("int")


def truncate_num(col: str | Column, scale: int = 0) -> Column:
    """Flink TRUNCATE(numeric, d): truncate toward zero to d decimal places."""
    p = 10**scale
    c = _c(col)
    return (
        F.when(c >= 0, F.floor(c * p) / p).otherwise(-(F.floor(-c * p) / p))
    ).cast("double")


def rand_integer(bound: int | Column, seed: int | None = None) -> Column:
    """Flink RAND_INTEGER(bound[, seed]): uniform int in [0, bound)."""
    r = F.rand(seed) if seed is not None else F.rand()
    return (r * bound).cast("int")


def between_symmetric(col: str | Column, a, b) -> Column:
    """SQL ``BETWEEN SYMMETRIC`` — bounds may arrive in either order."""
    c = _c(col)
    return (c >= F.least(F.lit(a), F.lit(b))) & (c <= F.greatest(F.lit(a), F.lit(b)))


def overlaps(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """SQL ``(s1, e1) OVERLAPS (s2, e2)`` period predicate (Flink supports the
    native syntax; boolean rewrite here)."""
    return (F.least(s1, e1) <= F.greatest(s2, e2)) & (F.least(s2, e2) <= F.greatest(s1, e1))


# --- SQL:2016 JSON predicates (Flink IS JSON VALUE/OBJECT/ARRAY/SCALAR) -----
# Implemented over try_parse_json (Spark 4 VariantType try-parse: NULL on bad
# input) + first-character dispatch, all JVM-side.


def is_json_value(col: str | Column) -> Column:
    c = _c(col)
    return c.isNotNull() & F.try_parse_json(c).isNotNull()


def _lead_char_is(col: Column, ch: str) -> Column:
    return F.startswith(F.ltrim(col), F.lit(ch))


def is_json_object(col: str | Column) -> Column:
    c = _c(col)
    return is_json_value(c) & _lead_char_is(c, "{")


def is_json_array(col: str | Column) -> Column:
    c = _c(col)
    return is_json_value(c) & _lead_char_is(c, "[")


def is_json_scalar(col: str | Column) -> Column:
    c = _c(col)
    return is_json_value(c) & ~_lead_char_is(c, "{") & ~_lead_char_is(c, "[")


# --- CREATE FUNCTION targets (SqlCreateFunction.java; ScalarFunction.java:94)


def price_band(price):
    """Python ScalarFunction analog for ``CREATE FUNCTION … AS '<this path>'``
    (the PyFlink general-udf shape, flink-python/pyflink/table/udf.py:515):
    a plain callable + ``returns`` DDL that TableEnvironment registers via
    ``spark.udf.register``. Kept trivial — real pipelines should prefer the
    SQL_FUNCTION form below, which never leaves the JVM."""
    if price is None:
        return None
    if price < 50000.0:
        return "low"
    if price < 150000.0:
        return "mid"
    return "high"


price_band.returns = "string"


class _SqlFunctionSpec:
    """Carrier for the JVM-side CREATE FUNCTION form: (params, returns, body)
    become a Spark SQL scalar function (CREATE FUNCTION … RETURNS … RETURN
    expr), fully codegen'd — the preferred mapping for expression-shaped
    ScalarFunctions."""

    def __init__(self, params: str, returns: str, body: str):
        self.SQL_FUNCTION = (params, returns, body)


# SPLIT_INDEX(str, sep, idx) — FlinkSqlOperatorTable SPLIT_INDEX,
# SqlFunctionUtils.java splitIndex: 0-based element of the separator split.
split_index_sql = _SqlFunctionSpec(
    "s STRING, d STRING, i INT", "STRING", "element_at(split(s, d), i + 1)"
)
