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

from flink_1_12_0_src_spark.catalog import TABLES, table
from flink_1_12_0_src_spark.session import get_spark
from flink_1_12_0_src_spark.table_env import TableEnvironment


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
        if stmt.lower() in {"quit", "exit"}:
            break
        try:
            head = stmt.split(None, 1)[0].upper()
            if head == "EXPLAIN":
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
                    out.show(args.max_rows, truncate=False)
                else:
                    print("OK")
            elif head in {"SHOW", "DESCRIBE", "DESC"}:
                # introspection goes through the dialect router, NOT spark.sql
                # (SHOW CATALOGS/MODULES etc. differ from Spark's own SHOW)
                env.execute_sql(stmt).show(args.max_rows, truncate=False)
            else:
                env.sql_query(stmt).show(args.max_rows, truncate=False)
        except Exception as ex:  # REPL: report, keep session alive
            print(f"ERROR: {ex}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
