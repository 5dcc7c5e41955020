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
            aggs, finals = [], []
            for p in parts:
                bare = _ALIAS_RE.sub(r"\1", p).strip()
                am = _ALIAS_RE.match(p)
                name = am.group(2) if am else p.strip()
                if bare in keys:
                    finals.append(F.expr(bare).alias(name) if name != bare else F.col(bare))
                elif _POSTFIX_RE.match(bare):
                    # postfix aggregate; unaliased ones get a dot-free name
                    # ('value.sum' → 'value_sum'), Flink's EXPR$n analog
                    out_name = name if am else name.replace(".", "_").replace("()", "")
                    aggs.append(_expr(bare).alias(out_name))
                    finals.append(F.col(out_name))
                elif bare.split(".", 1)[0] in keys:
                    # group-key-derived field access, e.g. 'w.start' on a
                    # group window alias (GroupWindowedTable.java select)
                    finals.append(F.expr(bare).alias(name))
                else:
                    raise ValueError(
                        f"grouped select expression {p.strip()!r} is neither a "
                        "group key, a key-derived field (w.start / w.end), nor "
                        "a postfix aggregate (col.sum / col.avg / …)"
                    )
            out = self._df.groupBy(*[F.expr(k) for k in keys]).agg(*aggs)
            return Table(out.select(*finals))
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

    def window(self, win) -> "GroupWindowedTable | OverWindowedTable":
        """Table.window(Tumble/Slide/Session…alias) → GroupWindowedTable;
        Table.window(Over…alias) → OverWindowedTable (Table.java:929,960)."""
        if isinstance(win, _OverWindow):
            return OverWindowedTable(self._df, win)
        if isinstance(win, _GroupWindow):
            return GroupWindowedTable(self._df, win)
        raise TypeError(f"window() wants a Tumble/Slide/Session/Over window, got {type(win)}")

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

    # -- sinks -------------------------------------------------------------
    def execute_insert(self, env, sink_name: str, overwrite: bool = False) -> None:
        """Table.executeInsert (Table.java:1519) — write this table's rows
        into the named catalog sink table through the environment's INSERT
        path (connector options, partitioning, compaction and commit
        policies all apply). ``env`` is the TableEnvironment holding the
        sink's DDL; the fluent API stays env-free everywhere else, so the
        handle is explicit here rather than captured at construction."""
        import uuid

        tmp = f"_tapi_insert_{uuid.uuid4().hex[:12]}"
        self._df.createOrReplaceTempView(tmp)
        try:
            env.execute_sql(
                f"INSERT {'OVERWRITE' if overwrite else 'INTO'} {sink_name} "
                f"SELECT * FROM {tmp}"
            )
        finally:
            self._df.sparkSession.catalog.dropTempView(tmp)

    def explain(self) -> str:
        """Table.explain (Table.java:1475) — the planned physical plan text."""
        return self._df._jdf.queryExecution().explainString(
            self._df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

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


# ---------------------------------------------------------------------------
# Group windows + OVER windows (Flink 1.12 Table API:
# flink-table/flink-table-api-java/src/main/java/org/apache/flink/table/api/
# {Tumble,Slide,Session,Over}.java + GroupWindowedTable/OverWindowedTable;
# string DSL per the 1.12 docs: Tumble.over("1.hours").on("ts").alias("w"))
# ---------------------------------------------------------------------------

_DURATION_RE = re.compile(r"^\s*(\d+)\s*\.\s*(millis|seconds?|minutes?|hours?|days?)\s*$", re.I)


def _duration(spec: str) -> str:
    """'10.minutes' → '10 minutes' (Spark interval string)."""
    m = _DURATION_RE.match(spec)
    if not m:
        raise ValueError(f"unparseable window duration: {spec!r} (want e.g. '10.minutes')")
    unit = m.group(2).lower()
    unit = {"millis": "milliseconds"}.get(unit, unit if unit.endswith("s") else unit + "s")
    return f"{m.group(1)} {unit}"


class _GroupWindow:
    def __init__(self, kind: str, size: str | None, slide: str | None, time_col: str | None, name: str | None):
        self.kind, self.size, self.slide, self.time_col, self.name = kind, size, slide, time_col, name

    def on(self, time_col: str) -> "_GroupWindow":
        self.time_col = time_col.strip()
        return self

    def alias(self, name: str) -> "_GroupWindow":
        self.name = name.strip()
        return self

    def _column(self) -> Column:
        if not (self.time_col and self.name):
            raise ValueError("group window needs .on(time_col) and .alias(name)")
        if self.kind == "tumble":
            return F.window(self.time_col, _duration(self.size))
        if self.kind == "slide":
            return F.window(self.time_col, _duration(self.size), _duration(self.slide))
        return F.session_window(self.time_col, _duration(self.size))


class Tumble:
    """Tumble.over("1.hours").on("ts").alias("w") (Tumble.java:42)."""

    @staticmethod
    def over(size: str) -> _GroupWindow:
        return _GroupWindow("tumble", size, None, None, None)


class Slide:
    """Slide.over("1.hours").every("15.minutes").on("ts").alias("w") (Slide.java:47)."""

    @staticmethod
    def over(size: str) -> "_SlideB":
        return _SlideB(size)


class _SlideB:
    def __init__(self, size: str):
        self._size = size

    def every(self, slide: str) -> _GroupWindow:
        return _GroupWindow("slide", self._size, slide, None, None)


class Session:
    """Session.with_gap("5.minutes").on("ts").alias("w") (Session.java:41)."""

    @staticmethod
    def with_gap(gap: str) -> _GroupWindow:
        return _GroupWindow("session", gap, None, None, None)


class _OverWindow:
    def __init__(self):
        self.partition_keys: list[str] = []
        self.order_col: str | None = None
        self.preceding_spec: str = "unbounded_range"
        self.name: str | None = None

    def order_by(self, col: str) -> "_OverWindow":
        self.order_col = col.strip()
        return self

    def preceding(self, spec: str) -> "_OverWindow":
        self.preceding_spec = spec.strip().lower()
        return self

    def alias(self, name: str) -> "_OverWindow":
        self.name = name.strip()
        return self

    def _spec(self):
        from pyspark.sql import Window as W

        if not (self.order_col and self.name):
            raise ValueError("over window needs .order_by(time_col) and .alias(name)")
        w = W.partitionBy(*[F.expr(k) for k in self.partition_keys]) if self.partition_keys else W.partitionBy()
        w = w.orderBy(self.order_col)
        s = self.preceding_spec
        if s == "unbounded_range":
            return w  # Spark's default frame IS RANGE UNBOUNDED PRECEDING..CURRENT ROW
        if s == "unbounded_row":
            return w.rowsBetween(W.unboundedPreceding, W.currentRow)
        m = re.match(r"^(\d+)\.rows$", s)
        if m:
            return w.rowsBetween(-int(m.group(1)), W.currentRow)
        raise ValueError(f"unsupported preceding spec: {self.preceding_spec!r}")


class Over:
    """Over.partition_by("k").order_by("ts").preceding("unbounded_range").alias("ow")
    (Over.java:45; OverWindowPartitionedOrderedPreceding)."""

    @staticmethod
    def partition_by(keys: str) -> _OverWindow:
        ow = _OverWindow()
        ow.partition_keys = [k.strip() for k in keys.split(",")]
        return ow

    @staticmethod
    def order_by(col: str) -> _OverWindow:
        return _OverWindow().order_by(col)


_OVER_RE = re.compile(r"^(.*?)\s+over\s+([A-Za-z_]\w*)$", re.I | re.S)


class GroupWindowedTable:
    """table.window(Tumble…alias("w")).group_by("w, key").select(…)
    (GroupWindowedTable.java → WindowGroupedTable)."""

    def __init__(self, df: DataFrame, win: _GroupWindow):
        self._df, self._win = df, win

    def group_by(self, keys: str) -> Table:
        parts = [k.strip() for k in _split_exprs(keys)]
        if self._win.name not in parts:
            raise ValueError(f"group_by on a windowed table must include the window alias {self._win.name!r}")
        df = self._df.withColumn(self._win.name, self._win._column())
        return Table(df, group_exprs=parts)


class OverWindowedTable:
    """table.window(Over…alias("ow")).select("k, v.sum over ow AS s")
    (OverWindowedTable.java)."""

    def __init__(self, df: DataFrame, win: _OverWindow):
        self._df, self._win = df, win

    def select(self, exprs: str) -> Table:
        spec = self._win._spec()
        cols = []
        for p in _split_exprs(exprs):
            bare = _ALIAS_RE.sub(r"\1", p).strip()
            am = _ALIAS_RE.match(p)
            om = _OVER_RE.match(bare)
            if om:
                if om.group(2) != self._win.name:
                    raise ValueError(f"unknown over-window alias {om.group(2)!r}")
                pm = _POSTFIX_RE.match(om.group(1).strip())
                if not pm:
                    raise ValueError(
                        f"over-window expression must be a postfix aggregate: {p!r}"
                    )
                c = _AGG_FNS[pm.group(2).lower()](pm.group(1)).over(spec)
                name = am.group(2) if am else f"{pm.group(1)}_{pm.group(2)}".replace(".", "_")
                cols.append(c.alias(name))
            else:
                cols.append(_expr(p))
        return Table(self._df.select(*cols))
