"""SQL client REPL (SURVEY.md §2.11 — Flink SqlClient parity,
flink-table/flink-sql-client/src/main/java/org/apache/flink/table/client/
SqlClient.java:62).

Usage:
    python -m flink_1_12_0_src_spark.cli [--sf-dir /root/testdata/sf0.01]
    echo "SELECT 1 AS x;" | python -m flink_1_12_0_src_spark.cli

Statements end with ';'. DDL (CREATE TABLE … WITH (...)) goes through the
Flink-dialect translator; queries print up to --max-rows rows. The driver
tables (region…embeddings) are pre-registered as views, like the SQL client's
pre-configured catalog."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from flink_1_12_0_src_spark.catalog import TABLES, table
from flink_1_12_0_src_spark.session import get_spark
from flink_1_12_0_src_spark.table_env import TableEnvironment


# SqlClient.java:83 SOURCE_MAX_SIZE — refuse oversized script files
_SOURCE_MAX_SIZE = 50_000

_HELP = """Available commands (SqlCommandParser.java command set):
  QUIT/EXIT; CLEAR; HELP; SOURCE <file>;
  SHOW CATALOGS/DATABASES/TABLES/VIEWS/FUNCTIONS/MODULES/PARTITIONS;
  SHOW CURRENT CATALOG/DATABASE; USE [CATALOG] <name>;
  CREATE/DROP/ALTER CATALOG|DATABASE|TABLE|VIEW|FUNCTION;
  DESCRIBE <table>; EXPLAIN [PLAN FOR] <query>;
  SET ['key' = 'value']; RESET ['key']; INSERT INTO/OVERWRITE; SELECT ...;"""


# SOURCE may dispatch a statement that is itself a SOURCE; bound the chain
# so a self-/cyclically-SOURCing script fails fast instead of recursing to
# the interpreter limit with a 50 KB echo per level
_SOURCE_MAX_DEPTH = 16


def _dispatch(env, stmt: str, max_rows: int, depth: int = 0) -> bool:
    """Route one statement the way CliClient.callCommand does.

    Returns False when the statement ends the session (QUIT/EXIT — also
    honored inside a SOURCE'd file, as CliClient routes sourced content
    through the same command parser), True otherwise.
    """
    head = stmt.split(None, 1)[0].upper()
    if head in {"QUIT", "EXIT"}:
        return False
    if head == "HELP":
        print(_HELP)
    elif head == "CLEAR":
        if sys.stdout.isatty():  # CliClient clears only a real terminal
            sys.stdout.write("\033[2J\033[H")
    elif head == "SOURCE":
        # CliClient.java:686 callSource — read the file as ONE statement
        # (size-capped), echo it, then dispatch it recursively
        if depth >= _SOURCE_MAX_DEPTH:
            raise ValueError(f"SOURCE nesting exceeds {_SOURCE_MAX_DEPTH} levels")
        parts = stmt.split(None, 1)
        if len(parts) < 2:
            raise ValueError("SOURCE needs a path: SOURCE <script-file>")
        src_path = Path(parts[1].strip().strip("'\""))
        # Memory-bound the read without changing the documented CHAR limit:
        # UTF-8 uses at most 4 bytes per char, so st_size > 4×cap is
        # definitely over the cap (rejected before any read); otherwise read
        # at most cap+1 chars and apply the exact char check — a whole
        # oversized file is never materialized.
        if src_path.stat().st_size > 4 * _SOURCE_MAX_SIZE:
            raise ValueError(f"SOURCE file exceeds {_SOURCE_MAX_SIZE} chars")
        with open(src_path, encoding="utf-8") as fh:
            text = fh.read(_SOURCE_MAX_SIZE + 1)
        if len(text) > _SOURCE_MAX_SIZE:
            raise ValueError(f"SOURCE file exceeds {_SOURCE_MAX_SIZE} chars")
        inner = text.strip().rstrip(";").strip()
        print(f"[INFO] Executing SQL from file:\n{inner}")
        if inner:
            return _dispatch(env, inner, max_rows, depth + 1)
    elif head == "EXPLAIN":
        # Flink SqlClient EXPLAIN [PLAN FOR] <query>
        parts = stmt.split(None, 1)
        if len(parts) < 2:
            raise ValueError("EXPLAIN needs a query: EXPLAIN [PLAN FOR] <query>")
        body = parts[1]
        if body.upper().startswith("PLAN FOR"):
            body = body[len("PLAN FOR") :].strip()
        print(env.explain_sql(body))
    elif head in {"CREATE", "DROP", "INSERT", "ALTER", "SET", "RESET", "USE"}:
        # statement commands: Flink-dialect routing (a bare SET lists
        # the session properties, so it may return rows)
        out = env.execute_sql(stmt)
        if out is not None:
            out.show(max_rows, truncate=False)
        else:
            print("OK")
    elif head in {"SHOW", "DESCRIBE", "DESC"}:
        # introspection goes through the dialect router, NOT spark.sql
        # (SHOW CATALOGS/MODULES etc. differ from Spark's own SHOW)
        env.execute_sql(stmt).show(max_rows, truncate=False)
    else:
        env.sql_query(stmt).show(max_rows, truncate=False)
    return True


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="spark-graft SQL client")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--max-rows", type=int, default=50)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args(argv)

    spark = get_spark(app_name="sql-client", cpus=args.cpus, shuffle_partitions=args.cpus)
    for t in TABLES:
        try:
            table(spark, args.sf_dir, t).createOrReplaceTempView(t)
        except Exception:  # table parquet missing at this SF — skip
            pass
    env = TableEnvironment(spark)

    interactive = sys.stdin.isatty()
    if interactive:
        print(f"spark-graft SQL client — tables: {', '.join(TABLES)}; end statements with ';'")
    buf: list[str] = []
    while True:
        if interactive:
            sys.stdout.write("sql> " if not buf else "   > ")
            sys.stdout.flush()
        line = sys.stdin.readline()
        if not line:
            break
        buf.append(line)
        if not line.rstrip().endswith(";"):
            continue
        stmt = "".join(buf).strip().rstrip(";").strip()
        buf = []
        if not stmt:
            continue
        try:
            if not _dispatch(env, stmt, args.max_rows):
                break
        except Exception as ex:  # REPL: report, keep session alive
            print(f"ERROR: {ex}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
