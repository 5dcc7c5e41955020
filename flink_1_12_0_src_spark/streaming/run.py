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


def run_split_late(
    stream_df: DataFrame, time_col: str, timeout_sec: int = 300
) -> DataFrame:
    """Late-data side channel (the SURVEY §2.8 mapping for Flink's
    ``sideOutputLateData`` / OutputTag): per micro-batch, rows whose event
    time is behind the running watermark (previous batches' max event time,
    i.e. a 0-second delay) divert to a side sink; everything else is the
    on-time branch (discarded here — the main branch is a separate query).

    Returns (late_df, ontime_df). The on-time branch is also how we realize
    Flink's allowed-lateness=0 DROP semantics: measured on Spark 4.1, the
    built-in windowed aggregate does NOT drop rows behind the watermark in
    this replay (numRowsDroppedByWatermark stays 0 and an already-emitted
    window would be resurrected and re-emitted in append mode) — a real
    semantic difference from Flink's WindowOperator, so the drop lives in
    our layer.

    Scale shape: the split is a ``filter`` executed on the executors and the
    branches stream straight to file sinks — the driver only ever sees the
    per-batch max-timestamp scalar it needs to advance the watermark.
    """
    spark: SparkSession = stream_df.sparkSession
    from pyspark.sql import functions as F

    side_dir = tempfile.mkdtemp(prefix="late_side_")
    ontime_dir = tempfile.mkdtemp(prefix="late_ontime_")
    state: dict = {"wm": None}

    def fb(bdf: DataFrame, _epoch: int) -> None:
        wm = state["wm"]
        late = bdf.filter(F.col(time_col) < F.lit(wm)) if wm is not None else bdf.limit(0)
        ontime = bdf.filter(F.col(time_col) >= F.lit(wm)) if wm is not None else bdf
        late.write.mode("append").parquet(side_dir)
        ontime.write.mode("append").parquet(ontime_dir)
        mx = bdf.agg(F.max(time_col)).collect()[0][0]
        if mx is not None and (wm is None or mx > wm):
            state["wm"] = mx

    q = (
        stream_df.writeStream.foreachBatch(fb)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
    schema = stream_df.schema
    return (
        spark.read.schema(schema).parquet(side_dir),
        spark.read.schema(schema).parquet(ontime_dir),
    )


def run_incremental_join(
    stream_df: DataFrame,
    side_col: str,
    left_tag: str,
    join_keys: list[str],
    left_cols: dict[str, str],
    right_cols: dict[str, str],
    timeout_sec: int = 300,
) -> DataFrame:
    """Unbounded NON-time-bounded stream-stream INNER join — the SURVEY §2.3
    GAP row (StreamExecJoin / StreamingJoinOperator.java:38 keeps both inputs
    in keyed state forever; Spark's built-in stream-stream join demands a
    watermark time bound and refuses this query).

    Classic incremental view maintenance over micro-batches: with accumulated
    sides L, R and batch deltas ΔL, ΔR,

        ΔJ = ΔL ⋈ R  ∪  L ⋈ ΔR  ∪  ΔL ⋈ ΔR

    emits every joined pair exactly once for append-only inputs (Flink's
    append-only +I case). Both sides arrive as ONE tagged union stream (the
    connect-streams encoding used by streaming_temporal_join). State = the
    accumulated sides as parquet — executor-side storage and joins; the
    driver never touches row data. Output is append-only, batch-boundary
    invariant, hence oracle-checkable against the batch join.
    """
    spark: SparkSession = stream_df.sparkSession
    from pyspark.sql import functions as F

    import glob as globmod
    import os

    l_dir = tempfile.mkdtemp(prefix="ij_left_")
    r_dir = tempfile.mkdtemp(prefix="ij_right_")
    out_dir = tempfile.mkdtemp(prefix="ij_out_")

    def side(df: DataFrame, cols: dict[str, str]) -> DataFrame:
        return df.select(*join_keys, *[F.col(c).alias(a) for c, a in cols.items()])

    def prev(files: list[str], schema) -> DataFrame | None:
        return spark.read.schema(schema).parquet(*files) if files else None

    def fb(bdf: DataFrame, _epoch: int) -> None:
        dl = side(bdf.filter(F.col(side_col) == left_tag), left_cols)
        dr = side(bdf.filter(F.col(side_col) != left_tag), right_cols)
        # snapshot the accumulated sides BEFORE appending this batch's deltas
        l_files = globmod.glob(os.path.join(l_dir, "*.parquet"))
        r_files = globmod.glob(os.path.join(r_dir, "*.parquet"))
        dl.write.mode("append").parquet(l_dir)
        dr.write.mode("append").parquet(r_dir)
        l_prev, r_prev = prev(l_files, dl.schema), prev(r_files, dr.schema)
        parts = [dl.join(dr, join_keys)]
        if r_prev is not None:
            parts.append(dl.join(r_prev, join_keys))
        if l_prev is not None:
            parts.append(l_prev.join(dr, join_keys))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(fb)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
    return spark.read.parquet(out_dir)
