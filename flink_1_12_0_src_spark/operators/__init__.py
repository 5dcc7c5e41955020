"""Custom operators for capabilities Spark lacks as primitives (SURVEY.md §2.3
temporal/as-of join, §2.5 streaming rank/dedup, §2.9 CEP).

Design rule: compose built-in DataFrame ops when semantics allow (as-of join =
union + window — one shuffle, fully distributed); drop to applyInPandas only
for genuinely imperative logic (NFA pattern matching), keyed so state stays
bounded per group.
"""

from flink_1_12_0_src_spark.operators.joins import asof_join, lookup_join
from flink_1_12_0_src_spark.operators.cep import Pattern, match_recognize
from flink_1_12_0_src_spark.operators.dedup import deduplicate, changelog_normalize

__all__ = [
    "asof_join",
    "lookup_join",
    "Pattern",
    "match_recognize",
    "deduplicate",
    "changelog_normalize",
]
