"""Skew mitigation operators (SURVEY.md §4 scale techniques).

Reference context: Flink splits skewed distinct-aggs via SplitAggregateRule
(…/rules/logical/SplitAggregateRule.scala) and relies on its hash exchange for
join skew; Spark's AQE skew-join handles *detected* storage-size skew at
runtime. Manual salting remains the tool for the cases AQE can't fix: a hot
join key whose matching build rows must be replicated, or a pre-aggregation
whose single key floods one task.

Both operators are pure DataFrame transforms and provably equivalent to the
unsalted plan (the salt is deterministic, derived from a unique column), so
they stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts`` shuffle
    partitions: big rows get salt = pmod(hash(salt_src), n), the small side is
    replicated once per salt value via explode, and the join key becomes
    (key, salt). Row-for-row identical to ``big.join(small, key, how)`` for
    ``how`` in (inner, left): the salt adds no semantics, only placement.

    ``how`` is restricted to inner/left — for right/full outer joins an
    unmatched small-side row would surface once per salt replica (n_salts
    null-padded rows instead of one), so those shapes are rejected rather
    than silently wrong.

    Cost model: small side × n_salts replication vs. one task owning the
    whole hot key. Use when the small side is modest but above the broadcast
    threshold (below it, broadcast already avoids the skew entirely)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how=inner/left only (got {how!r}): replicated "
            "small-side rows would duplicate unmatched right/full outer output"
        )
    bs = big.withColumn("_salt", F.pmod(F.hash(F.col(salt_src)), F.lit(n_salts)))
    ss = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = bs.join(ss, [key, "_salt"], how)
    return out.drop("_salt")


def two_stage_agg(df: DataFrame, key: str, value_col, agg_alias: str, n_salts: int = 16) -> DataFrame:
    """Explicit salt → partial agg → final agg for a pathologically hot group
    key (the SplitAggregateRule shape). ``value_col`` must be decomposable
    (SUM/COUNT/MIN/MAX). Spark already does map-side partial aggregation; this
    adds a *shuffle-level* split so even the reduce side of one key fans out."""
    salted = df.withColumn("_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value_col).alias("_p"))
    return partial.groupBy(key).agg(F.sum("_p").alias(agg_alias))
