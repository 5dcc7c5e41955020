"""Drive a streaming query to completion and return its result as a batch
DataFrame — the PySpark analog of the reference's harness tests that feed
records + watermarks and assert the emitted output
(flink-table/.../runtime/harness/GroupAggregateHarnessTest.scala).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def run_to_batch(
    stream_df: DataFrame,
    output_mode: str = "complete",
    timeout_sec: int = 300,
) -> DataFrame:
    """Run the streaming plan with Trigger.AvailableNow into a memory sink,
    wait for completion, return the sink contents.

    - complete mode → final state snapshot (deterministic regardless of
      micro-batch boundaries);
    - append mode → everything emitted (deterministic for eager operators
      like inner stream-stream joins).
    """
    spark: SparkSession = stream_df.sparkSession
    name = f"out_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
    return spark.table(name)
