"""SQL client REPL end-to-end (SqlClient.java:62 parity): statements stream
over stdin exactly as a user would type them — catalog query, CREATE
FUNCTION, ALTER-able DDL, Flink-dialect group window — and the process must
answer each and exit cleanly."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_cli_statements_end_to_end(tmp_path):
    """ONE REPL session covering the statement-routing surface the four
    pre-r15 per-feature tests exercised in four separate processes: the
    same statements run and the same assertions hold, minus three ~10 s
    JVM boots (each subprocess starts a fresh SparkSession). The sourced
    QUIT / recursion-cap behaviors stay in their own session below — a
    sourced QUIT ends the session, so it cannot share one."""
    sql_file = tmp_path / "script.sql"
    sql_file.write_text("SELECT COUNT(*) AS n_from_file FROM region;\n")
    big = tmp_path / "big.sql"
    big.write_text("-- " + "x" * 60_000)
    script = f"""SELECT COUNT(*) AS n_nations FROM nation;
CREATE TEMPORARY FUNCTION price_band AS 'flink_1_12_0_src_spark.functions.scalar.price_band';
SELECT price_band(o_totalprice) AS band, COUNT(*) AS cnt FROM orders GROUP BY band ORDER BY band;
SELECT TUMBLE_START(ts, INTERVAL '1' DAY) AS d, COUNT(*) AS c
FROM events GROUP BY TUMBLE(ts, INTERVAL '1' DAY) ORDER BY d LIMIT 3;
EXPLAIN PLAN FOR SELECT n_name FROM nation WHERE n_nationkey < 5;
EXPLAIN SELECT COUNT(*) AS c FROM region;
SET table.exec.resource.default-parallelism = 3;
SET;
SHOW CATALOGS;
SHOW MODULES;
RESET;
SET;
HELP;
CLEAR;
SOURCE {sql_file};
SOURCE {big};
quit;
"""
    proc = subprocess.run(
        [sys.executable, "-m", "flink_1_12_0_src_spark.cli",
         "--sf-dir", "/root/testdata/sf0.001", "--cpus", "2"],
        input=script, capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    # statements end-to-end
    assert "n_nations" in out          # catalog table query answered
    assert "OK" in out                 # CREATE FUNCTION acknowledged
    assert "band" in out and ("low" in out or "mid" in out or "high" in out)
    # EXPLAIN statements
    assert "== Physical Plan ==" in out
    assert "PushedFilters" in out      # predicate pushdown visible in the scan
    # SET/RESET/SHOW route through the Flink-dialect router, not spark.sql
    assert "table.exec.resource.default-parallelism" in out  # bare SET listing
    assert "default_catalog" in out    # Flink catalogs, not spark_catalog
    assert "core" in out               # SHOW MODULES
    assert out.count("OK") >= 2        # SET k=v and RESET ack
    # SOURCE / HELP / CLEAR (CliClient.java:686 command set)
    assert "SOURCE <file>" in out      # HELP listed the command
    assert "Executing SQL from file" in out
    assert "n_from_file" in out        # the sourced SELECT ran
    assert "exceeds 50000" in proc.stderr       # size cap enforced
    # the size-cap message is the only expected stderr complaint
    other_err = [
        ln for ln in proc.stderr.splitlines()
        if "ERROR" in ln and "exceeds 50000" not in ln
    ]
    assert not other_err, other_err


def test_cli_source_quit_and_recursion_cap(tmp_path):
    """A SOURCE'd QUIT ends the session (CliClient routes sourced content
    through the same command parser), and a self-SOURCing script fails with
    a bounded nesting error instead of recursing."""
    quit_sql = tmp_path / "quit.sql"
    quit_sql.write_text("QUIT;\n")
    loop_sql = tmp_path / "loop.sql"
    loop_sql.write_text(f"SOURCE {loop_sql};\n")
    script = f"""SOURCE {loop_sql};
SOURCE {quit_sql};
SELECT 1 AS should_not_run;
"""
    proc = subprocess.run(
        [sys.executable, "-m", "flink_1_12_0_src_spark.cli",
         "--sf-dir", "/root/testdata/sf0.001", "--cpus", "2"],
        input=script, capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "nesting exceeds" in proc.stderr       # cycle bounded, session alive
    assert "should_not_run" not in proc.stdout    # QUIT from the file ended it
