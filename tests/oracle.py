"""DuckDB oracle comparison harness — mirrors the driver's correctness gate:
row-count + schema-width + order-insensitive value comparison, columns sorted
by name before comparing (so Spark/oracle column *names* must match).
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from flink_1_12_0_src_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _key(row):
    return tuple((x is None, str(type(x)), x) for x in row)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=_key)
    return sorted(cols), out


def compare_to_oracle(spark, sf_dir: str, spark_fn, oracle: str, float_tol: float = 0.0):
    """Assert the Spark query and the DuckDB oracle agree. float_tol=0 → exact."""
    sdf = spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duck_connect(sf_dir)
    cur = con.execute(oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    con.close()

    assert sorted(scols) == sorted(ocols), f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}"
    assert len(srows) == len(orows), f"row count differs: spark={len(srows)} oracle={len(orows)}"

    _, s_norm = normalize(srows, scols)
    _, o_norm = normalize(orows, ocols)
    mism = []
    for i, (a, b) in enumerate(zip(s_norm, o_norm)):
        # type-strict: 1 (int) must not silently equal 1.0 (float) — the
        # driver's value hash distinguishes them
        if a == b and all(type(x) is type(y) for x, y in zip(a, b)):
            continue
        if float_tol and len(a) == len(b) and all(
            (x == y)
            or (
                isinstance(x, float)
                and isinstance(y, float)
                and math.isclose(x, y, rel_tol=float_tol, abs_tol=float_tol)
            )
            for x, y in zip(a, b)
        ):
            continue
        mism.append((i, a, b))
        if len(mism) >= 5:
            break
    assert not mism, "value mismatch (first 5): " + "\n".join(
        f"row {i}:\n  spark : {a}\n  oracle: {b}" for i, a, b in mism
    )
