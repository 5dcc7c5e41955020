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


# Output types every oracle must resolve to. The driver's gate hashes
# *rendered* values, so an oracle column typed HUGEINT (DuckDB's type for any
# uncast integer SUM, plain or windowed) or DECIMAL renders through the
# pandas/Arrow path differently than Spark's BIGINT/DOUBLE even when the
# values are identical — this was the sole cause of all 6 r06 driver reds
# (and the r03 flinkddl_csv_source red, commit bd0ead5). Keep oracles plain.
# FLOAT/REAL is deliberately NOT plain: float32 renders its excess digits
# ('0.10000000149011612' vs double '0.1'), the same rendered-value divergence
# class as HUGEINT — no oracle may emit it (none does; audit-verified).
PLAIN_TYPES = frozenset(
    {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "VARCHAR", "BOOLEAN", "TIMESTAMP", "DATE"}
)

_FAMILY = {
    "bigint": "int", "integer": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "float64",
    "float": "float32", "real": "float32",  # renders differently than double
    "varchar": "str", "string": "str",
    "boolean": "bool",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "date": "date",
}


def type_family(dtype: str) -> str:
    """Map a Spark dtype / DuckDB type string to a render family.

    Families group types whose Python/Arrow rendering is identical (all int
    widths render the same; VARCHAR==string; …). Anything outside the plain
    set — HUGEINT, DECIMAL(p,s), arrays — maps to its own raw string, so it
    only matches an identical type on the other side.
    """
    return _FAMILY.get(dtype.strip().lower(), dtype.strip().lower())


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


def _run_oracle(sf_dir: str, oracle: str):
    con = duck_connect(sf_dir)
    try:
        rel = con.sql(oracle)
        ocols = list(rel.columns)
        otypes = dict(zip(ocols, (str(t) for t in rel.types)))
        orows = rel.fetchall()
    finally:
        con.close()
    return ocols, otypes, orows


def compare_to_oracle(spark, sf_dir: str, spark_fn, oracle: str, float_tol: float = 0.0):
    """Assert the Spark query and the DuckDB oracle agree. float_tol=0 → exact.

    The oracle runs in a worker thread WHILE Spark builds and collects its
    side — both engines release the GIL in their native cores, so the
    comparison costs max(spark, duckdb) instead of their sum (the heaviest
    oracles — the unrolled power-iteration and substring-rewrite SQL — are
    DuckDB-bound at 28-38 s each, fully hidden behind their Spark runs)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        ofut = pool.submit(_run_oracle, sf_dir, oracle)
        sdf = spark_fn(spark, sf_dir)
        scols = sdf.columns
        stypes = dict(sdf.dtypes)
        srows = [tuple(r) for r in sdf.collect()]
        ocols, otypes, orows = ofut.result()

    assert sorted(scols) == sorted(ocols), f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}"
    # The driver hashes *rendered* values, so type families must line up too —
    # a DuckDB HUGEINT (uncast integer SUM) vs Spark BIGINT is a driver red
    # even when fetchall() values compare equal (r06 lesson; see PLAIN_TYPES).
    type_mism = [
        (c, stypes[c], otypes[c]) for c in sorted(scols) if type_family(stypes[c]) != type_family(otypes[c])
    ]
    assert not type_mism, "output type family mismatch (spark vs oracle): " + ", ".join(
        f"{c}: spark={st} oracle={ot}" for c, st, ot in type_mism
    )
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
