"""Query registry: one entry per operator/capability from SURVEY.md §2.

Each :class:`Query` pairs a Spark implementation (DataFrame/SQL, takes
``(spark, sf_dir)``) with an optional DuckDB oracle SQL string over the same
parquet tables. The driver's correctness gate runs both at sf0.01 and compares
row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- float aggregations accumulate in DECIMAL (exact, order-independent) and cast
  the final value to DOUBLE — bit-deterministic in both engines regardless of
  partitioning/merge order;
- output types are plain (BIGINT/DOUBLE/STRING/TIMESTAMP/BOOLEAN).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: add a query implementation to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# Queries the round-1 driver gate already verified green (CORRECTNESS_r01.json).
# The gate truncated at 50 of 160 entries, so registration order is budget
# order: queries WITHOUT a prior driver-green row run first (cheap batch →
# expensive streaming), and these 50 re-verify last — any truncation point
# maximizes newly-evidenced surface while the round-over-round union stays
# complete.
_R01_DRIVER_GREEN = frozenset(
    {
        "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
        "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12",
        "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
        "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
        "calc_project_filter", "values_inline", "expand_grouping_sets",
        "expand_cube", "expand_rollup_grouping_id", "correlate_unnest",
        "join_left_outer", "join_right_outer", "join_full_outer", "join_cross",
        "join_theta_nonequi", "join_semi_in", "join_anti_not_in",
        "join_scalar_subquery", "join_broadcast_hint", "interval_join_batch",
        "agg_function_suite", "agg_min_by_max_by", "agg_listagg_collect",
        "agg_multiset", "agg_stddev_var", "agg_distinct_multi",
        "sort_limit_offset", "setop_union_all", "setop_union_distinct",
        "setop_intersect", "setop_intersect_all", "setop_except",
    }
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY) and return it
    in gate-budget order (driver-unverified first, cheapest first)."""
    from flink_1_12_0_src_spark.queries import (  # noqa: F401
        relational,
        window_agg,
        scalar_fns,
        custom_ops,
        dialectq,
        pipelineq,  # noqa: F401  (registers pipeline queries)
        graphq,
        cdcq,
        tpch,
        tpch2,
        streamingq,
    )

    fresh = {n: q for n, q in REGISTRY.items() if n not in _R01_DRIVER_GREEN}
    green = {n: q for n, q in REGISTRY.items() if n in _R01_DRIVER_GREEN}
    return {**fresh, **green}
