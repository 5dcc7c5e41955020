"""MATCH_RECOGNIZE SQL clause → CEP Pattern compiler (SURVEY.md §2.9 SQL
front-end: FlinkSqlOperatorTable MATCH_RECOGNIZE operators, parsed by Calcite
and planned by StreamExecMatch.scala:68; here a textual parser in the same
spirit as plans/dialect.py lowering the clause onto operators/cep.py).

Supported subset (the MatchRecognizeITCase shapes):

    MATCH_RECOGNIZE (
      PARTITION BY c1[, c2 …]
      ORDER BY c1[, c2 …]
      MEASURES FIRST|LAST|COUNT|SUM|MIN|MAX(VAR.col) AS alias, …
      [AFTER MATCH SKIP PAST LAST ROW | AFTER MATCH SKIP TO NEXT ROW]
      PATTERN (A B+ C{2,4} D? …)
      [WITHIN INTERVAL 'n' UNIT]
      DEFINE A AS <comparison> [AND <comparison>], …
    )

DEFINE comparisons are ``VAR.col <op> literal`` with op ∈ {=, <>, !=, <, <=,
>, >=}; a variable without a DEFINE entry matches any row (the standard's
"always true"). PATTERN contiguity is strict (the MATCH_RECOGNIZE regex
reading) — exactly our Pattern.next/one_or_more(consecutive=True).
"""

from __future__ import annotations

import operator
import re
from typing import Callable

import pandas as pd

from flink_1_12_0_src_spark.operators.cep import Pattern

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
    r"(?:AFTER\s+MATCH\s+SKIP\s+(?P<skip>PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW)\s*)?"
    r"PATTERN\s*\(\s*(?P<pattern>[^)]*?)\s*\)\s*"
    r"(?:WITHIN\s+INTERVAL\s+'(?P<wamount>\d+)'\s+(?P<wunit>SECOND|MINUTE|HOUR|DAY)S?\s*)?"
    r"DEFINE\s+(?P<define>.*?)\s*\)\s*$",
    re.I | re.S,
)

_MEASURE_RE = re.compile(
    r"(FIRST|LAST|COUNT|SUM|MIN|MAX)\s*\(\s*(\w+)\.(\w+)\s*\)\s+AS\s+(\w+)", re.I
)

_STEP_RE = re.compile(r"(\w+)\s*(\+\??|\?\??|\{\s*\d+\s*(?:,\s*\d+\s*)?\}\??)?")

_CMP_RE = re.compile(
    r"(\w+)\.(\w+)\s*(=|<>|!=|<=|>=|<|>)\s*('(?:[^']*)'|-?\d+(?:\.\d+)?)"
)

_UNIT_SECONDS = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}


def _literal(tok: str):
    if tok.startswith("'"):
        return tok[1:-1]
    return float(tok) if "." in tok else int(tok)


def _make_predicate(conjuncts: list[tuple[str, str, object]]):
    def pred(pdf: pd.DataFrame) -> pd.Series:
        m = pd.Series(True, index=pdf.index)
        for col, op, lit in conjuncts:
            m &= _OPS[op](pdf[col], lit)
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
    for agg, var, col, alias in _MEASURE_RE.findall(m.group("measures")):
        measures[alias] = (var.upper(), agg.lower(), col)

    defines: dict[str, list[tuple[str, str, object]]] = {}
    for d in re.split(r",\s*(?=\w+\s+AS\s)", m.group("define"), flags=re.I):
        dm = re.match(r"(\w+)\s+AS\s+(.*)", d.strip(), re.I | re.S)
        if not dm:
            raise ValueError(f"unparseable DEFINE entry: {d[:80]}")
        var = dm.group(1).upper()
        conjuncts = []
        for expr in re.split(r"\bAND\b", dm.group(2), flags=re.I):
            cm = _CMP_RE.search(expr)
            if not cm:
                raise ValueError(f"unsupported DEFINE predicate: {expr.strip()[:80]}")
            cvar, col, op, lit = cm.groups()
            if cvar.upper() != var:
                raise ValueError("DEFINE may only reference its own variable")
            conjuncts.append((col, op, _literal(lit)))
        defines[var] = conjuncts

    pattern: Pattern | None = None
    for var, quant in _STEP_RE.findall(m.group("pattern")):
        if not var:
            continue
        var = var.upper()
        pattern = Pattern.begin(var) if pattern is None else pattern.next(var)
        if var in defines:
            pattern.where(_make_predicate(defines[var]))
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
    after = "past_last" if "PAST" in skip else "next_row"
    return {
        "partition_by": part,
        "order_by": order,
        "pattern": pattern,
        "measures": measures,
        "after_match": after,
    }
