"""Oracle output-type audit — the permanent gate for the r03/r06 lesson.

The driver's correctness gate hashes *rendered* values (repo commit bd0ead5,
round 3). DuckDB types any uncast integer ``SUM()`` — plain or windowed — as
HUGEINT, and bare decimal literals as DECIMAL(p,s); both render through the
pandas/Arrow path differently than Spark's BIGINT/DOUBLE while ``fetchall()``
returns plain Python values that compare equal. That divergence was the sole
cause of all 6 driver-red rows in CORRECTNESS_r06 (and the r03
flinkddl_csv_source red). This audit plans every registered oracle through
DuckDB and asserts each output column resolves to a plain type, so a
non-plain oracle fails at registration time instead of burning a driver round.
"""

from __future__ import annotations

import pytest

from flink_1_12_0_src_spark.queries import load_all
from tests.conftest import SF_SMOKE
from tests.oracle import PLAIN_TYPES, compare_to_oracle, duck_connect, type_family

REGISTRY = load_all()


def _non_plain(con, oracle: str) -> list[tuple[str, str]]:
    """Return (column, type) pairs of an oracle's non-plain output columns."""
    rel = con.sql(oracle)
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).split("(")[0] not in PLAIN_TYPES
    ]


def test_every_oracle_output_type_is_plain():
    con = duck_connect(SF_SMOKE)
    try:
        offenders = {
            name: bad
            for name, q in sorted(REGISTRY.items())
            if q.oracle and (bad := _non_plain(con, q.oracle))
        }
    finally:
        con.close()
    assert not offenders, (
        "oracles with non-plain output types (HUGEINT/DECIMAL render "
        "differently than Spark through the driver's value hash — add a "
        f"CAST): {offenders}"
    )


def test_audit_catches_uncast_integer_sum():
    """Regression: the exact r06 defect class must be flagged by this audit."""
    con = duck_connect(SF_SMOKE)
    try:
        bad = _non_plain(con, "SELECT SUM(r_regionkey) AS s FROM region")
        assert bad == [("s", "HUGEINT")]
        bad = _non_plain(con, "SELECT 1.5 AS score")
        assert bad == [("score", "DECIMAL(2,1)")]
        assert _non_plain(con, "SELECT CAST(SUM(r_regionkey) AS BIGINT) AS s FROM region") == []
    finally:
        con.close()


def test_harness_reds_on_hugeint_like_the_driver(spark):
    """compare_to_oracle must reproduce a HUGEINT red locally: identical
    values, divergent render type → AssertionError naming the column."""

    def spark_side(s, sf_dir):
        return s.read.parquet(f"{sf_dir}/region.parquet").selectExpr(
            "CAST(SUM(r_regionkey) AS BIGINT) AS s"
        )

    with pytest.raises(AssertionError, match="type family mismatch.*s: spark=bigint oracle=HUGEINT"):
        compare_to_oracle(spark, SF_SMOKE, spark_side, "SELECT SUM(r_regionkey) AS s FROM region")
    # and the cast version passes — values were never the problem
    compare_to_oracle(
        spark, SF_SMOKE, spark_side, "SELECT CAST(SUM(r_regionkey) AS BIGINT) AS s FROM region"
    )


def test_type_family_map():
    assert type_family("bigint") == type_family("INTEGER") == "int"
    assert type_family("double") == "float64"
    # float32 renders excess digits vs double — must NOT share a family
    assert type_family("FLOAT") == type_family("real") == "float32"
    assert type_family("FLOAT") != type_family("double")
    assert type_family("string") == type_family("VARCHAR") == "str"
    assert type_family("HUGEINT") == "hugeint"  # matches nothing Spark emits
    assert type_family("DECIMAL(2,1)") == "decimal(2,1)"


def test_audit_rejects_float32():
    con = duck_connect(SF_SMOKE)
    try:
        assert _non_plain(con, "SELECT CAST(1.5 AS FLOAT) AS x") == [("x", "FLOAT")]
    finally:
        con.close()
