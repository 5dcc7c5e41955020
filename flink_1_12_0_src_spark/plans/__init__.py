"""Planning layer: Flink-SQL dialect → Spark SQL translation and DDL parsing.

Per SURVEY.md §4.1, every batch rewrite the reference's planner performs is
already inside Catalyst, so this package holds only the *dialect* work: the
thin layer above Spark that understands Flink 1.12 SQL surface syntax
(group windows, connector DDL, watermark clauses) and lowers it to idiomatic
Spark SQL — the analog of the reference's parse→validate→convert pipeline
(flink-table-planner-blink .../delegation/ParserImpl.java:72,
SqlToOperationConverter.java:188) with Catalyst playing the Volcano phases.
"""

from flink_1_12_0_src_spark.plans.dialect import translate_query, parse_create_table

__all__ = ["translate_query", "parse_create_table"]
