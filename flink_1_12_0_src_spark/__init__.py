"""flink_1_12_0_src_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Flink 1.12.0 (reference: shaolei7788/flink-1.12.0-src).

Architecture (SURVEY.md §7): a thin Python layer over vanilla PySpark.

- Batch relational surface (Flink Blink planner SQL/Table API) → Spark DataFrame/SQL
  via Catalyst. No custom planner: every Flink batch rewrite already exists in Catalyst
  (SURVEY.md §4.1).
- Streaming surface (DataStream + streaming SQL) → Structured Streaming; genuine gaps
  (keep-last dedup, streaming Top-N, temporal/as-of join, CEP) are custom stateful
  operators in ``operators/`` and ``streaming/``.
- LLM-data-pipeline extensions (dedup families, similarity search, text analysis,
  multimodal columns) in ``pipeline/``.

Everything is designed for a multi-executor cluster at ~100 TB: declarative plans
(Catalyst pushdown/pruning), broadcast hints for dimension tables, no driver-side
collects inside operators, AQE-friendly shuffles.
"""

from flink_1_12_0_src_spark.session import get_spark
from flink_1_12_0_src_spark.catalog import TABLES, register_views, table

__all__ = ["get_spark", "TABLES", "register_views", "table"]
