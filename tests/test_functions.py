"""Unit tests for the Flink function-parity layer (functions/scalar.py) —
the reference's per-function test style (SURVEY §5.5, e.g.
flink-table/.../planner/functions/aggfunctions/*Test.java)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_12_0_src_spark.functions import (
    hash_code,
    is_alpha,
    is_decimal,
    is_digit,
    similar_to,
    similar_to_regex,
    split_index,
    truncate_num,
)


def java_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


def test_hash_code_matches_java(spark):
    samples = ["", "a", "abc", "hello world", "Brand#12", "NATION_7 xyz"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", hash_code("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == java_hash(s), f"hash_code({s!r})"


def test_split_index_oob_null(spark):
    df = spark.createDataFrame([("a|b|c",)], "s string")
    row = df.select(
        split_index("s", "|", 0).alias("w0"),
        split_index("s", "|", 2).alias("w2"),
        split_index("s", "|", 9).alias("oob"),
    ).first()
    assert (row["w0"], row["w2"], row["oob"]) == ("a", "c", None)


def test_similar_to_translation():
    assert similar_to_regex("%(red|blue)%") == "^.*(red|blue).*$"
    assert similar_to_regex("a_c") == "^a.c$"
    assert similar_to_regex(r"100\%") == "^100%$"


def test_similar_to_whole_string(spark):
    df = spark.createDataFrame([("red widget",), ("redx",), ("blue",)], "s string")
    got = [r["m"] for r in df.select(similar_to("s", "%red%").alias("m")).collect()]
    assert got == [True, True, False]


def test_predicates(spark):
    df = spark.createDataFrame(
        [("123",), ("12.5",), ("-.5",), ("abc",), ("a1",), ("",)], "s string"
    )
    rows = df.select(
        "s",
        is_decimal("s").alias("dec"),
        is_digit("s").alias("dig"),
        is_alpha("s").alias("alp"),
    ).collect()
    by = {r["s"]: (r["dec"], r["dig"], r["alp"]) for r in rows}
    assert by["123"] == (True, True, False)
    assert by["12.5"] == (True, False, False)
    assert by["-.5"] == (True, False, False)
    assert by["abc"] == (False, False, True)
    assert by["a1"] == (False, False, False)
    assert by[""] == (False, False, False)


def test_truncate_toward_zero(spark):
    df = spark.createDataFrame([(3.14159,), (-3.14159,), (2.999,)], "x double")
    got = [r["t"] for r in df.select(truncate_num(F.col("x"), 2).alias("t")).collect()]
    assert got == [3.14, -3.14, 2.99]
