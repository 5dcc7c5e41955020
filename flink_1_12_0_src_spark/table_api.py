"""Table API facade — the reference's fluent relational layer (SURVEY.md
§3.2; flink-table/flink-table-api-java/.../api/Table.java, 1514 LoC) on
DataFrames.

The Flink 1.12 Table API builds a QueryOperation tree from fluent calls with
an expression DSL (``group_by("user_id").select("user_id, value.sum AS
total")``). Spark's DataFrame *is* that layer, so this facade is a thin
translator: each ``Table`` wraps a DataFrame, each method maps 1:1
(select/filter/where/group_by/order_by/limit/offset/distinct/as_/
join/left_outer_join/right_outer_join/full_outer_join/union/union_all/
minus/minus_all/intersect/intersect_all/add_columns/rename_columns/
drop_columns/fetch), and the expression strings lower to Catalyst via a
small rewriter:

- ``col.sum / .avg / .count / .min / .max / .stddev / .var`` postfix
  aggregates (Expressions DSL: $("col").sum()) → the matching built-in;
- ``expr AS alias`` / ``expr as alias`` → ``.alias``;
- everything else passes through ``F.expr`` (shared SQL dialect).

No physical planning happens here — exactly like the reference, where
Table.java only assembles QueryOperations and PlannerBase.translate (§3.1)
does the work; here Catalyst is that planner.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

_AGG_FNS = {
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "stddev": F.stddev,
    "var": F.variance,
    "first": F.first,
    "last": F.last,
}

_POSTFIX_RE = re.compile(
    r"^\s*([A-Za-z_][\w.]*)\s*\.\s*(" + "|".join(_AGG_FNS) + r")\s*(?:\(\s*\))?\s*$",
    re.I,
)
_ALIAS_RE = re.compile(r"^(.*?)\s+[Aa][Ss]\s+([A-Za-z_]\w*)\s*$", re.S)


def _expr(e: str) -> Column:
    """Lower one Table-API expression string to a Column."""
    e = e.strip()
    alias = None
    am = _ALIAS_RE.match(e)
    if am:
        e, alias = am.group(1).strip(), am.group(2)
    pm = _POSTFIX_RE.match(e)
    col = _AGG_FNS[pm.group(2).lower()](pm.group(1)) if pm else F.expr(e)
    return col.alias(alias) if alias else col


def _split_exprs(s: str) -> list[str]:
    """Split a comma-joined expression list, respecting parentheses."""
    out, depth, cur = [], 0, ""
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        out.append(cur)
    return out


class Table:
    """Fluent relational Table over a DataFrame (Table.java:129-1514)."""

    def __init__(self, df: DataFrame, group_exprs: list[str] | None = None):
        self._df = df
        self._group = group_exprs  # set between group_by() and select()

    # -- projection / filtering -------------------------------------------
    def select(self, exprs: str) -> "Table":
        parts = _split_exprs(exprs)
        if self._group is not None:
            keys = [k.strip() for k in self._group]
            aggs = []
            for p in parts:
                if p.strip() in keys:
                    continue
                if not _POSTFIX_RE.match(_ALIAS_RE.sub(r"\1", p).strip()):
                    raise ValueError(
                        f"grouped select expression {p.strip()!r} is neither a "
                        "group key nor a postfix aggregate (col.sum / "
                        "col.avg / …)"
                    )
                aggs.append(_expr(p))
            out = self._df.groupBy(*[F.expr(k) for k in keys]).agg(*aggs)
            # re-order columns to the select order
            wanted = []
            for p in parts:
                name = _ALIAS_RE.match(p).group(2) if _ALIAS_RE.match(p) else p.strip()
                wanted.append(name)
            missing = [c for c in wanted if c not in out.columns]
            if missing:
                raise ValueError(
                    f"grouped select columns {missing} not present in the "
                    f"aggregate output {out.columns}; alias aggregates "
                    "('col.sum as name') to the names you select"
                )
            return Table(out.select(*wanted))
        return Table(self._df.select(*[_expr(p) for p in parts]))

    def filter(self, predicate: str) -> "Table":
        return Table(self._df.filter(F.expr(predicate)))

    where = filter

    def add_columns(self, exprs: str) -> "Table":
        df = self._df
        for p in _split_exprs(exprs):
            c = _expr(p)
            df = df.withColumn(_col_name(c), c)
        return Table(df)

    def rename_columns(self, exprs: str) -> "Table":
        df = self._df
        for p in _split_exprs(exprs):
            m = _ALIAS_RE.match(p)
            if not m:
                raise ValueError(f"rename_columns needs 'old as new': {p}")
            df = df.withColumnRenamed(m.group(1).strip(), m.group(2))
        return Table(df)

    def drop_columns(self, exprs: str) -> "Table":
        return Table(self._df.drop(*[p.strip() for p in _split_exprs(exprs)]))

    def as_(self, names: str) -> "Table":
        return Table(self._df.toDF(*[n.strip() for n in names.split(",")]))

    # -- aggregation -------------------------------------------------------
    def group_by(self, keys: str) -> "Table":
        return Table(self._df, group_exprs=_split_exprs(keys))

    def distinct(self) -> "Table":
        return Table(self._df.distinct())

    # -- joins -------------------------------------------------------------
    def _join(self, right: "Table", on: str | None, how: str) -> "Table":
        cond = F.expr(on) if on else None
        return Table(self._df.join(right._df, cond, how) if cond is not None
                     else self._df.crossJoin(right._df))

    def join(self, right: "Table", on: str | None = None) -> "Table":
        return self._join(right, on, "inner")

    def left_outer_join(self, right: "Table", on: str) -> "Table":
        return self._join(right, on, "left")

    def right_outer_join(self, right: "Table", on: str) -> "Table":
        return self._join(right, on, "right")

    def full_outer_join(self, right: "Table", on: str) -> "Table":
        return self._join(right, on, "full")

    # -- set ops -----------------------------------------------------------
    def union(self, other: "Table") -> "Table":
        return Table(self._df.union(other._df).distinct())

    def union_all(self, other: "Table") -> "Table":
        return Table(self._df.union(other._df))

    def minus(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df).distinct())

    def minus_all(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df))

    def intersect(self, other: "Table") -> "Table":
        return Table(self._df.intersect(other._df))

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self._df.intersectAll(other._df))

    # -- ordering / limits -------------------------------------------------
    def order_by(self, exprs: str) -> "Table":
        cols = []
        for p in _split_exprs(exprs):
            m = re.match(r"(.+?)\.(asc|desc)\s*$", p.strip(), re.I)
            if m:
                c = F.expr(m.group(1).strip())
                cols.append(c.desc() if m.group(2).lower() == "desc" else c.asc())
            else:
                cols.append(F.expr(p.strip()))
        return Table(self._df.orderBy(*cols))

    def limit(self, n: int) -> "Table":
        return Table(self._df.limit(n))

    fetch = limit

    def offset(self, n: int) -> "Table":
        return Table(self._df.offset(n))

    # -- escape hatch ------------------------------------------------------
    def to_df(self) -> DataFrame:
        return self._df


def _col_name(c: Column) -> str:
    # alias name out of the Column's string repr: Column<'x AS name'>
    s = str(c)
    m = re.search(r" AS (\w+)'?>?$", s)
    if not m:
        raise ValueError(f"add_columns expressions need an alias: {s}")
    return m.group(1)


def from_dataframe(df: DataFrame) -> Table:
    """TableEnvironment.fromDataStream / from_path analog."""
    return Table(df)
