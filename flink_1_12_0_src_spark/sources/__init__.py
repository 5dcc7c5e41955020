"""Source/sink connector layer (SURVEY.md §2.1).

Maps Flink's connector/format identifiers (``'connector'='filesystem'``,
``'format'='csv'`` …) onto Spark DataSource readers and writers, which carry
the same pushdown ability surface natively (SupportsFilterPushDown /
SupportsProjectionPushDown / partition pruning — SURVEY §2.1 ability table).
"""

from flink_1_12_0_src_spark.sources.connectors import (
    SUPPORTED_CONNECTORS,
    reader_config,
    writer_config,
)

__all__ = ["SUPPORTED_CONNECTORS", "reader_config", "writer_config"]
