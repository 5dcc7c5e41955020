"""MATCH_RECOGNIZE SQL clause → CEP Pattern compiler (SURVEY.md §2.9 SQL
front-end: FlinkSqlOperatorTable MATCH_RECOGNIZE operators, parsed by Calcite
and planned by StreamExecMatch.scala:68; here a textual parser in the same
spirit as plans/dialect.py lowering the clause onto operators/cep.py).

Supported subset (the MatchRecognizeITCase shapes):

    MATCH_RECOGNIZE (
      PARTITION BY c1[, c2 …]
      ORDER BY c1[, c2 …]
      MEASURES FIRST|LAST(VAR.col[, offset])|COUNT|SUM|AVG|MIN|MAX(VAR.col)
               | MATCH_ROWTIME() | CLASSIFIER() AS alias, …
      [AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW | TO FIRST var | TO LAST var]
      PATTERN (A B+ C{2,4} D? …)
      [WITHIN INTERVAL 'n' UNIT]
      DEFINE A AS <comparison> [AND <comparison>], …
    )

DEFINE comparisons are ``VAR.col <op> rhs`` with op ∈ {=, <>, !=, <, <=, >,
>=} and rhs one of:

- a literal (string/number);
- ``PREV(VAR2.col [, k])`` — the PHYSICAL row k back in partition order
  (SQL:2016 row-pattern PREV; k defaults to 1). Compiles to a vectorized
  ``shift(k)`` comparison — the canonical price-goes-down idiom
  ``DOWN AS DOWN.v < PREV(DOWN.v)`` (MatchRecognizeITCase.scala:122-133);
- ``FIRST(VAR2.col[, k])`` / ``LAST(VAR2.col[, k])`` of an EARLIER pattern
  variable — a cross-variable predicate over the current partial match with
  the SQL:2016 logical offset (LAST(A.x, 1) = second-to-last bound row),
  compiled to ``Pattern.where_binding`` (unmatched or out-of-range
  reference ⇒ row rejected).

Null predicates: ``VAR.col IS [NOT] NULL`` (vectorized) and
``FIRST|LAST(VAR2.col) IS [NOT] NULL`` (partial-match; an unbound
variable's reference IS null — the MatchRecognizeITCase.scala:122-133
``LAST(A.nullField) IS NULL`` reading).

Aggregate predicates (MatchRecognizeITCase testAggregates; SQL:2016
RUNNING semantics):

- ``AGG(VAR.col) <op> literal`` where the aggregated variable is the
  DEFINE's own variable — a running aggregate including the candidate row
  (``A AS AVG(A.price) < 15``), compiled to ``Pattern.where_running`` and
  re-checked at every loop append;
- ``AGG(VAR2.col) <op> literal`` / ``VAR.col <op> AGG(VAR2.col)`` of an
  EARLIER variable — evaluated over that variable's bound rows via
  ``Pattern.where_binding``. AGG ∈ COUNT/SUM/AVG/MIN/MAX; MEASURES
  accepts the same set plus FIRST/LAST.

A variable without a DEFINE entry matches any row (the standard's "always
true"). PATTERN contiguity is strict (the MATCH_RECOGNIZE regex reading) —
exactly our Pattern.next/one_or_more(consecutive=True).
"""

from __future__ import annotations

import operator
import re
from typing import Callable

import pandas as pd

from flink_1_12_0_src_spark.operators.cep import _AGGS, Pattern

_OPS: dict[str, Callable] = {
    "=": operator.eq,
    "<>": operator.ne,
    "!=": operator.ne,
    "<=": operator.le,
    ">=": operator.ge,
    "<": operator.lt,
    ">": operator.gt,
}

_SECTION_RE = re.compile(
    r"MATCH_RECOGNIZE\s*\(\s*"
    r"PARTITION\s+BY\s+(?P<part>[\w\s,]+?)\s*"
    r"ORDER\s+BY\s+(?P<order>[\w\s,]+?)\s*"
    r"MEASURES\s+(?P<measures>.*?)\s*"
    r"(?:AFTER\s+MATCH\s+SKIP\s+(?P<skip>PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW|TO\s+(?:FIRST|LAST)\s+\w+)\s*)?"
    r"PATTERN\s*\(\s*(?P<pattern>[^)]*?)\s*\)\s*"
    r"(?:WITHIN\s+INTERVAL\s+'(?P<wamount>\d+)'\s+(?P<wunit>SECOND|MINUTE|HOUR|DAY)S?\s*)?"
    r"DEFINE\s+(?P<define>.*?)\s*\)\s*$",
    re.I | re.S,
)

_MEASURE_RE = re.compile(
    r"(FIRST|LAST|COUNT|SUM|AVG|MIN|MAX)\s*\(\s*(\w+)\.(\w+)\s*"
    r"(?:,\s*(\d+)\s*)?\)\s+AS\s+(\w+)",
    re.I,
)

_STEP_RE = re.compile(r"(\w+)\s*(\+\??|\?\??|\{\s*\d+\s*(?:,\s*\d+\s*)?\}\??)?")

_CMP_RE = re.compile(
    r"(\w+)\.(\w+)\s*(=|<>|!=|<=|>=|<|>)\s*('(?:[^']*)'|-?\d+(?:\.\d+)?)"
)

# rhs forms referencing other rows: PREV(V.col[, k]) / FIRST|LAST(V.col)
_NAV_RE = re.compile(
    r"(\w+)\.(\w+)\s*(=|<>|!=|<=|>=|<|>)\s*(PREV|FIRST|LAST)\s*\(\s*(\w+)\.(\w+)\s*(?:,\s*(\d+)\s*)?\)",
    re.I,
)

# LAST(V.col) IS [NOT] NULL — the MatchRecognizeITCase.scala:122-133 idiom
# ("LAST(A.nullField) IS NULL": no A row bound a non-null value yet)
_NAV_NULL_RE = re.compile(
    r"(FIRST|LAST)\s*\(\s*(\w+)\.(\w+)\s*\)\s+IS\s+(NOT\s+)?NULL", re.I
)

# VAR.col IS [NOT] NULL
_NULL_RE = re.compile(r"(\w+)\.(\w+)\s+IS\s+(NOT\s+)?NULL", re.I)

# aggregate DEFINE forms (MatchRecognizeITCase testAggregates; SQL:2016
# running semantics): AGG(V.col) <op> literal, and VAR.col <op> AGG(V2.col)
_AGG_LIT_RE = re.compile(
    r"(COUNT|SUM|AVG|MIN|MAX)\s*\(\s*(\w+)\.(\w+)\s*\)\s*"
    r"(=|<>|!=|<=|>=|<|>)\s*('(?:[^']*)'|-?\d+(?:\.\d+)?)",
    re.I,
)
_COL_AGG_RE = re.compile(
    r"(\w+)\.(\w+)\s*(=|<>|!=|<=|>=|<|>)\s*"
    r"(COUNT|SUM|AVG|MIN|MAX)\s*\(\s*(\w+)\.(\w+)\s*\)",
    re.I,
)

# aggregate kernels shared by the run/bind predicates — the same table the
# MEASURES resolver uses (operators/cep._AGGS), restricted to the set the
# DEFINE grammar accepts
_AGG_FNS = {k: _AGGS[k] for k in ("count", "sum", "avg", "min", "max")}

_UNIT_SECONDS = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}


def _literal(tok: str):
    if tok.startswith("'"):
        return tok[1:-1]
    return float(tok) if "." in tok else int(tok)


def _make_predicate(conjuncts: list[tuple[str, str, object]]):
    def pred(pdf: pd.DataFrame) -> pd.Series:
        m = pd.Series(True, index=pdf.index)
        for col, op, lit in conjuncts:
            if op == "isnull":
                m &= pdf[col].isna()
            elif op == "notnull":
                m &= pdf[col].notna()
            else:
                m &= _OPS[op](pdf[col], lit)
        return m

    return pred


def _make_prev_predicate(conjuncts: list[tuple[str, str, str, int]]):
    """PREV(V.col, k) comparisons — physical row offsets, vectorized as a
    shift over the key's sorted rows; the partition's first k rows have no
    PREV and compare False (NaN semantics), matching SQL row-pattern
    navigation."""

    def pred(pdf: pd.DataFrame) -> pd.Series:
        m = pd.Series(True, index=pdf.index)
        for col, op, ref_col, k in conjuncts:
            m &= _OPS[op](pdf[col], pdf[ref_col].shift(k)).fillna(False)
        return m

    return pred


def _make_run_predicate(conjuncts: list[tuple[str, str, str, object]]):
    """AGG(V.col) <op> literal over V's OWN rows-so-far (running semantics:
    the candidate row is included) — compiled onto Pattern.where_running, so
    every loop append re-checks the aggregate."""

    def pred(pdf, bindings, prefix: list[int], cand: int) -> bool:
        idxs = prefix + [cand]
        for agg, ref_col, op, lit in conjuncts:
            if not bool(_OPS[op](_AGG_FNS[agg](pdf[ref_col].iloc[idxs]), lit)):
                return False
        return True

    return pred


def _make_agg_bind_predicate(conjuncts: list[tuple]):
    """Aggregates of an EARLIER variable's bound rows: ``AGG(V2.col) <op>
    literal`` (uniform over candidate rows) and ``V.col <op> AGG(V2.col)``
    (per-row comparison). An unbound referenced variable rejects the row."""

    def pred(pdf: pd.DataFrame, bindings: dict[str, list[int]]) -> pd.Series:
        m = pd.Series(True, index=pdf.index)
        for c in conjuncts:
            if c[0] == "agglit":
                _, agg, var2, ref_col, op, lit = c
                idxs = bindings.get(var2)
                if not idxs:
                    return pd.Series(False, index=pdf.index)
                ok = bool(_OPS[op](_AGG_FNS[agg](pdf[ref_col].iloc[idxs]), lit))
                if not ok:
                    return pd.Series(False, index=pdf.index)
            else:  # ("colagg", col, op, agg, var2, ref_col)
                _, col, op, agg, var2, ref_col = c
                idxs = bindings.get(var2)
                if not idxs:
                    return pd.Series(False, index=pdf.index)
                m &= _OPS[op](pdf[col], _AGG_FNS[agg](pdf[ref_col].iloc[idxs]))
        return m

    return pred


def _make_bind_predicate(conjuncts: list[tuple[str, str, str, str, str]]):
    """FIRST/LAST(V2.col) comparisons — evaluated against the current
    partial match's bindings inside the NFA scan (operators/cep.py
    where_binding); a reference to a not-yet-bound variable rejects the
    row."""

    def pred(pdf: pd.DataFrame, bindings: dict[str, list[int]]) -> pd.Series:
        m = pd.Series(True, index=pdf.index)
        for col, op, nav, var2, ref_col, k in conjuncts:
            idxs = bindings.get(var2)
            pos = k if nav == "FIRST" else -1 - k  # SQL:2016 logical offset
            if op in ("isnull", "notnull"):
                # an unbound variable's FIRST/LAST reference IS null
                # (MatchRecognizeITCase's LAST(A.nullField) IS NULL reading)
                ref_null = not idxs or len(idxs) <= k or pd.isna(
                    pdf[ref_col].iloc[idxs[pos]]
                )
                m &= ref_null if op == "isnull" else not ref_null
                continue
            if not idxs or len(idxs) <= k:
                return pd.Series(False, index=pdf.index)
            ref = pdf[ref_col].iloc[idxs[pos]]
            m &= _OPS[op](pdf[col], ref)
        return m

    return pred


def parse_match_recognize(clause: str) -> dict:
    """Parse the clause into the match_recognize() keyword arguments:
    {partition_by, order_by, pattern, measures, after_match}."""
    m = _SECTION_RE.search(clause.strip())
    if not m:
        raise ValueError(f"unparseable MATCH_RECOGNIZE clause: {clause[:120]}")

    part = [c.strip() for c in m.group("part").split(",")]
    order = [c.strip() for c in m.group("order").split(",")]

    measures: dict[str, tuple[str, str, str]] = {}
    for agg, var, col, k, alias in _MEASURE_RE.findall(m.group("measures")):
        agg = agg.lower()
        if k and agg in ("first", "last"):
            # SQL:2016 logical offset: LAST(A.col, 1) = second-to-last row
            agg = f"{agg}@{int(k)}"
        measures[alias] = (var.upper(), agg, col)
    for alias in re.findall(
        r"MATCH_ROWTIME\s*\(\s*\)\s+AS\s+(\w+)", m.group("measures"), re.I
    ):
        # FlinkSqlOperatorTable.MATCH_ROWTIME: the match's rowtime attribute
        # (timestamp of the last bound row); resolved against the query's
        # time_col at measure time
        measures[alias] = ("__MATCH__", "match_rowtime", "")
    for alias in re.findall(
        r"CLASSIFIER\s*\(\s*\)\s+AS\s+(\w+)", m.group("measures"), re.I
    ):
        # FlinkSqlOperatorTable.CLASSIFIER: the variable of the last bound row
        measures[alias] = ("__MATCH__", "classifier", "")

    defines: dict[str, list[tuple[str, str, object]]] = {}
    prev_defines: dict[str, list[tuple[str, str, str, int]]] = {}
    bind_defines: dict[str, list[tuple[str, str, str, str, str]]] = {}
    run_defines: dict[str, list[tuple[str, str, str, object]]] = {}
    agg_bind_defines: dict[str, list[tuple]] = {}
    for d in re.split(r",\s*(?=\w+\s+AS\s)", m.group("define"), flags=re.I):
        dm = re.match(r"(\w+)\s+AS\s+(.*)", d.strip(), re.I | re.S)
        if not dm:
            raise ValueError(f"unparseable DEFINE entry: {d[:80]}")
        var = dm.group(1).upper()
        for expr in re.split(r"\bAND\b", dm.group(2), flags=re.I):
            am = _AGG_LIT_RE.search(expr)
            if am:
                agg, var2, ref_col, op, lit = am.groups()
                agg, var2 = agg.lower(), var2.upper()
                if var2 == var:
                    # running aggregate over the variable's own binding
                    run_defines.setdefault(var, []).append(
                        (agg, ref_col, op, _literal(lit))
                    )
                else:
                    agg_bind_defines.setdefault(var, []).append(
                        ("agglit", agg, var2, ref_col, op, _literal(lit))
                    )
                continue
            cam = _COL_AGG_RE.search(expr)
            if cam:
                cvar, col, op, agg, var2, ref_col = cam.groups()
                if cvar.upper() != var:
                    raise ValueError("DEFINE lhs may only reference its own variable")
                if var2.upper() == var:
                    raise ValueError(
                        "V.col <op> AGG(V.col) of the same variable is not supported; "
                        "use the AGG(V.col) <op> literal running form"
                    )
                agg_bind_defines.setdefault(var, []).append(
                    ("colagg", col, op, agg.lower(), var2.upper(), ref_col)
                )
                continue
            nnm = _NAV_NULL_RE.search(expr)
            if nnm:
                nav, var2, ref_col, neg = nnm.groups()
                bind_defines.setdefault(var, []).append(
                    (None, "notnull" if neg else "isnull", nav.upper(), var2.upper(), ref_col, 0)
                )
                continue
            nm = _NAV_RE.search(expr)
            if nm:
                cvar, col, op, nav, var2, ref_col, k = nm.groups()
                if cvar.upper() != var:
                    raise ValueError("DEFINE lhs may only reference its own variable")
                nav = nav.upper()
                if nav == "PREV":
                    prev_defines.setdefault(var, []).append(
                        (col, op, ref_col, int(k) if k else 1)
                    )
                else:
                    bind_defines.setdefault(var, []).append(
                        (col, op, nav, var2.upper(), ref_col, int(k) if k else 0)
                    )
                continue
            cm = _CMP_RE.search(expr)
            if cm:
                cvar, col, op, lit = cm.groups()
                if cvar.upper() != var:
                    raise ValueError("DEFINE may only reference its own variable")
                defines.setdefault(var, []).append((col, op, _literal(lit)))
                continue
            um = _NULL_RE.search(expr)
            if um:
                cvar, col, neg = um.groups()
                if cvar.upper() != var:
                    raise ValueError("DEFINE may only reference its own variable")
                defines.setdefault(var, []).append(
                    (col, "notnull" if neg else "isnull", None)
                )
                continue
            raise ValueError(f"unsupported DEFINE predicate: {expr.strip()[:80]}")

    pattern: Pattern | None = None
    for var, quant in _STEP_RE.findall(m.group("pattern")):
        if not var:
            continue
        var = var.upper()
        pattern = Pattern.begin(var) if pattern is None else pattern.next(var)
        if var in defines and var in prev_defines:
            p1 = _make_predicate(defines[var])
            p2 = _make_prev_predicate(prev_defines[var])
            pattern.where(lambda pdf, a=p1, b=p2: a(pdf) & b(pdf))
        elif var in defines:
            pattern.where(_make_predicate(defines[var]))
        elif var in prev_defines:
            pattern.where(_make_prev_predicate(prev_defines[var]))
        if var in bind_defines and var in agg_bind_defines:
            b1 = _make_bind_predicate(bind_defines[var])
            b2 = _make_agg_bind_predicate(agg_bind_defines[var])
            pattern.where_binding(lambda pdf, bd, a=b1, b=b2: a(pdf, bd) & b(pdf, bd))
        elif var in bind_defines:
            pattern.where_binding(_make_bind_predicate(bind_defines[var]))
        elif var in agg_bind_defines:
            pattern.where_binding(_make_agg_bind_predicate(agg_bind_defines[var]))
        if var in run_defines:
            pattern.where_running(_make_run_predicate(run_defines[var]))
        lazy = quant.endswith("?") and quant not in ("?",)  # +? / {n,m}? / ??
        base = quant[:-1] if lazy else quant
        if base == "+":
            pattern.one_or_more()
        elif base == "?":
            pattern.optional()
        elif base.startswith("{"):
            nums = [int(x) for x in re.findall(r"\d+", base)]
            pattern.times(*nums)
        if lazy:
            # reluctant quantifier suffix (SQL:2016 row-pattern lazy mode)
            pattern.reluctant()

    if pattern is None:
        raise ValueError("empty PATTERN")
    if m.group("wamount"):
        pattern.within(int(m.group("wamount")) * _UNIT_SECONDS[m.group("wunit").upper()])

    skip = (m.group("skip") or "PAST LAST ROW").upper()
    if "PAST" in skip:
        after = "past_last"
    elif "NEXT" in skip:
        after = "next_row"
    else:
        nav, var = skip.split()[1], skip.split()[2]
        after = f"to_{nav.lower()}:{var}"
    return {
        "partition_by": part,
        "order_by": order,
        "pattern": pattern,
        "measures": measures,
        "after_match": after,
    }
