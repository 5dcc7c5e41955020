"""Flink 1.12 SQL dialect → Spark SQL translation (SURVEY.md §2.11, §3.1).

Covers the surface the reference's SQL tests exercise that differs textually
from Spark SQL:

- group windows in GROUP BY: ``TUMBLE(ts, size)`` / ``HOP(ts, slide, size)`` /
  ``SESSION(ts, gap)`` (reference: FlinkSqlOperatorTable.java group-window
  functions; StreamExecGroupWindowAggregate.scala:33) → Spark
  ``window(ts, size[, slide])`` / ``session_window(ts, gap)``;
- window auxiliary functions ``TUMBLE_START/END``, ``HOP_START/END``,
  ``SESSION_START/END`` → ``window.start`` / ``window.end`` struct fields;
- ``INTERVAL 'n' UNIT`` literals → Spark duration strings inside window calls;
- ``PROCTIME()`` → ``current_timestamp()`` (documented approximation, §1.2).

Everything else (joins, aggs, OVER, set ops, subqueries, scalar functions)
is already common SQL between the dialects and passes through untouched —
Catalyst then performs the §4.1 rewrites natively.

The translator is deliberately textual (regex over the query string): the
reference subset it supports is unambiguous at the token level, and staying
out of AST land keeps the layer ~100 lines with zero JVM round-trips.
"""

from __future__ import annotations

import re

_UNITS = {
    "SECOND": "seconds",
    "MINUTE": "minutes",
    "HOUR": "hours",
    "DAY": "days",
}

# INTERVAL '5' MINUTE  /  INTERVAL '1' DAY(S)
_INTERVAL = r"INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?"
# a column reference: identifier with optional qualifier
_COL = r"[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)?"


def _dur(amount: str, unit: str) -> str:
    return f"'{amount} {_UNITS[unit.upper()]}'"


def translate_query(sql: str) -> str:
    """Lower a Flink-dialect query to Spark SQL (see module docstring)."""
    out = sql

    # --- window auxiliary functions (must run before the assigners) -------
    def aux(m: re.Match) -> str:
        fn = m.group(1).upper()
        field = "start" if fn.endswith("_START") else "end"
        base = "session_window" if fn.startswith("SESSION") else "window"
        return f"{base}.{field}"

    out = re.sub(
        rf"\b((?:TUMBLE|HOP|SESSION)_(?:START|END))\s*\(\s*{_COL}\s*,"
        rf"\s*{_INTERVAL}\s*(?:,\s*{_INTERVAL}\s*)?\)",
        aux,
        out,
        flags=re.I,
    )

    # --- TUMBLE(ts, size) → window(ts, size) ------------------------------
    out = re.sub(
        rf"\bTUMBLE\s*\(\s*({_COL})\s*,\s*{_INTERVAL}\s*\)",
        lambda m: f"window({m.group(1)}, {_dur(m.group(2), m.group(3))})",
        out,
        flags=re.I,
    )

    # --- HOP(ts, slide, size) → window(ts, size, slide) [arg order swap] --
    out = re.sub(
        rf"\bHOP\s*\(\s*({_COL})\s*,\s*{_INTERVAL}\s*,\s*{_INTERVAL}\s*\)",
        lambda m: (
            f"window({m.group(1)}, {_dur(m.group(4), m.group(5))},"
            f" {_dur(m.group(2), m.group(3))})"
        ),
        out,
        flags=re.I,
    )

    # --- SESSION(ts, gap) → session_window(ts, gap) -----------------------
    out = re.sub(
        rf"\bSESSION\s*\(\s*({_COL})\s*,\s*{_INTERVAL}\s*\)",
        lambda m: f"session_window({m.group(1)}, {_dur(m.group(2), m.group(3))})",
        out,
        flags=re.I,
    )

    # --- PROCTIME() → current_timestamp() ---------------------------------
    out = re.sub(r"\bPROCTIME\s*\(\s*\)", "current_timestamp()", out, flags=re.I)

    return out


# ---------------------------------------------------------------------------
# CREATE TABLE ... WITH ('connector'=..., ...) DDL
# ---------------------------------------------------------------------------

_TYPE_MAP = {
    "STRING": "STRING",
    "VARCHAR": "STRING",
    "CHAR": "STRING",
    "BOOLEAN": "BOOLEAN",
    "BYTES": "BINARY",
    "VARBINARY": "BINARY",
    "TINYINT": "TINYINT",
    "SMALLINT": "SMALLINT",
    "INT": "INT",
    "INTEGER": "INT",
    "BIGINT": "BIGINT",
    "FLOAT": "FLOAT",
    "DOUBLE": "DOUBLE",
    "DATE": "DATE",
    "TIMESTAMP": "TIMESTAMP",  # TIMESTAMP(p) precision dropped (micros)
}

_CREATE_RE = re.compile(
    r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*(?:\((?P<body>.*?)\)\s*)?"
    r"(?:PARTITIONED\s+BY\s*\((?P<parts>[^)]*)\)\s*)?"
    r"(?:WITH\s*\((?P<opts>.*?)\)\s*)?;?\s*$",
    re.I | re.S,
)

# CREATE TABLE … LIKE clause (FLIP-110; flink-sql-parser
# …/ddl/SqlTableLike.java:90 — feature options ALL/OPTIONS/PARTITIONS/
# GENERATED/WATERMARKS/CONSTRAINTS with INCLUDING/EXCLUDING/OVERWRITING
# strategies; planner merge rules MergeTableLikeUtil.java:72-80)
_LIKE_RE = re.compile(
    r"\sLIKE\s+(?P<base>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"(?:\((?P<likeopts>[^)]*)\))?\s*;?\s*$",
    re.I | re.S,
)
_LIKE_OPT_RE = re.compile(
    r"(INCLUDING|EXCLUDING|OVERWRITING)\s+"
    r"(ALL|OPTIONS|PARTITIONS|GENERATED|WATERMARKS|CONSTRAINTS)",
    re.I,
)

_WATERMARK_RE = re.compile(
    rf"WATERMARK\s+FOR\s+(?P<col>\w+)\s+AS\s+\w+\s*-\s*{_INTERVAL}", re.I
)

# FLIP-107 metadata column: name TYPE METADATA [FROM 'key'] [VIRTUAL]
# (flink-sql-parser .../ddl/SqlTableColumn.java SqlMetadataColumn)
_METADATA_RE = re.compile(
    r"^(?P<name>`?\w+`?)\s+(?P<type>\w+(?:\(\d+(?:,\s*\d+)?\))?)\s+METADATA"
    r"(?:\s+FROM\s+'(?P<key>[^']+)')?(?P<virtual>\s+VIRTUAL)?\s*$",
    re.I,
)


def _map_type(flink_type: str) -> str:
    t = flink_type.strip().upper()
    if t.startswith("DECIMAL") or t.startswith("NUMERIC"):
        return t.replace("NUMERIC", "DECIMAL")
    base = re.sub(r"\(.*\)", "", t).strip()
    if base in _TYPE_MAP:
        return _TYPE_MAP[base]
    if base.startswith(("ARRAY", "MAP", "ROW")):
        raise ValueError(f"nested DDL type not supported in dialect layer: {flink_type}")
    raise ValueError(f"unknown Flink type: {flink_type}")


def parse_create_table(ddl: str) -> dict:
    """Parse Flink connector DDL into {name, schema_ddl, options, partition_by,
    watermark: (col, delay)|None, computed: [(name, expr), ...]}.

    Reference surface: SqlCreateTable.java (flink-sql-parser .../ddl/),
    WATERMARK clause → StreamExecWatermarkAssigner.scala:45, computed columns
    (``col AS expr`` — SqlCreateTable's computed-column list, evaluated at
    read time exactly like Flink's generated columns). PRIMARY KEY
    constraints are metadata-only (NOT ENFORCED in Flink too).
    """
    ddl = ddl.strip()
    like = None
    lm = _LIKE_RE.search(ddl)
    if lm:
        raw = lm.group("likeopts") or ""
        opts_list = [
            (s_.upper(), f_.upper()) for s_, f_ in _LIKE_OPT_RE.findall(raw)
        ]
        # reject anything the option grammar did not consume (typos,
        # unsupported features) and FLIP-110's invalid combinations, instead
        # of silently falling back to the defaults (SqlTableLike.java:186-191)
        leftover = _LIKE_OPT_RE.sub("", raw).strip(" ,\n\t")
        if leftover:
            raise ValueError(f"unrecognized LIKE option text: {leftover!r}")
        for s_, f_ in opts_list:
            if s_ == "OVERWRITING" and f_ in ("ALL", "PARTITIONS", "CONSTRAINTS"):
                raise ValueError(f"OVERWRITING {f_} is not a valid LIKE option")
        like = {"base": lm.group("base"), "options": opts_list}
        ddl = ddl[: lm.start()]
    m = _CREATE_RE.search(ddl.strip())
    if not m:
        raise ValueError(f"unparseable CREATE TABLE: {ddl[:120]}")
    body = m.group("body") or ""
    watermark = None
    cols: list[str] = []
    depth = 0
    field = ""
    fields: list[str] = []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append(field)
            field = ""
        else:
            field += ch
    if field.strip():
        fields.append(field)
    computed: list[tuple[str, str]] = []
    metadata: list[tuple[str, str, str, bool]] = []
    for f in fields:
        f = f.strip().rstrip(",").strip()
        if not f:
            continue
        wm = _WATERMARK_RE.match(f)
        if wm:
            watermark = (wm.group("col"), f"{wm.group(2)} {_UNITS[wm.group(3).upper()]}")
            continue
        if re.match(r"PRIMARY\s+KEY", f, re.I):
            continue  # NOT ENFORCED in Flink too — metadata only
        mm = _METADATA_RE.match(f)
        if mm:
            # FLIP-107 metadata column (SqlTableColumn.SqlMetadataColumn):
            # name TYPE METADATA [FROM 'key'] [VIRTUAL]; key defaults to the
            # column name, VIRTUAL columns are read-only (excluded on insert)
            name = mm.group("name").strip("`")
            metadata.append(
                (
                    name,
                    _map_type(mm.group("type")),
                    mm.group("key") or name,
                    bool(mm.group("virtual")),
                )
            )
            continue
        parts = f.split(None, 2)
        if len(parts) >= 3 and parts[1].upper() == "AS":
            computed.append((parts[0], parts[2]))  # computed column: name AS expr
            continue
        name_part, _, type_part = f.partition(" ")
        cols.append(f"{name_part} {_map_type(type_part)}")
    opts = dict(
        re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group("opts") or "")
    )
    parts = [p.strip() for p in (m.group("parts") or "").split(",") if p.strip()]
    return {
        "name": m.group("name"),
        "schema_ddl": ", ".join(cols),
        "options": opts,
        "partition_by": parts,
        "watermark": watermark,
        "computed": computed,
        "metadata": metadata,
        "like": like,
    }
