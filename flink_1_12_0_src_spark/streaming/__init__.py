"""Structured Streaming layer (SURVEY.md §2.8, §7 Phases 2–3).

Flink is stream-first; Spark's equivalent surface is Structured Streaming
micro-batching. This package provides:

- ``source``: replay a driver table as a multi-micro-batch file stream
  (the reference's ITCase pattern — same rows as the batch fixture so
  streaming results compare against the batch/DuckDB oracle, SURVEY §5.2/FIXTURES §2);
- ``run``: drive a streaming query to completion synchronously
  (Trigger.AvailableNow + memory sink) and hand back a batch DataFrame;
- ``stateful``: the custom stateful operators Spark lacks as primitives —
  streaming Top-N, keep-last dedup, streaming OVER — via update-mode
  aggregation or applyInPandasWithState (Flink KeyedProcessFunction analog).
"""

from flink_1_12_0_src_spark.streaming.source import events_stream
from flink_1_12_0_src_spark.streaming.run import run_to_batch
from flink_1_12_0_src_spark.streaming.stateful import (
    streaming_count_tumble,
    streaming_over_running_sum,
    streaming_topn,
)

__all__ = [
    "events_stream",
    "run_to_batch",
    "streaming_count_tumble",
    "streaming_over_running_sum",
    "streaming_topn",
]
