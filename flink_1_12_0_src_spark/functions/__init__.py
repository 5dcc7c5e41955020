"""Function-parity layer for the reference's SQL function surface (SURVEY.md §2.7).

~90% of Flink's FlinkSqlOperatorTable is a direct PySpark built-in; this package
holds the remainder as Column-composition helpers (JVM expressions — never
row-at-a-time Python UDFs in the hot path).
"""

from flink_1_12_0_src_spark.functions.scalar import (
    between_symmetric,
    hash_code,
    is_alpha,
    is_decimal,
    is_digit,
    is_json_array,
    is_json_object,
    is_json_scalar,
    is_json_value,
    overlaps,
    rand_integer,
    similar_to,
    similar_to_regex,
    split_index,
    truncate_num,
)

__all__ = [
    "between_symmetric",
    "hash_code",
    "is_alpha",
    "is_decimal",
    "is_digit",
    "is_json_array",
    "is_json_object",
    "is_json_scalar",
    "is_json_value",
    "overlaps",
    "rand_integer",
    "similar_to",
    "similar_to_regex",
    "split_index",
    "truncate_num",
]
