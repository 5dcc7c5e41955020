"""Delivery-order INVARIANCE of emission-trace operators.

The round-3 driver red rows (cdc_retract_stream_output,
stream_tumble_early_fire) were hash-only mismatches caused by micro-batch
delivery-order scrambles: FileStreamSource orders files by modification
time, which a foreign environment can perturb. Every emission trace now
labels its epochs from the replay's DATA-borne ``stage`` column, so the
emitted changelog must be identical no matter how slices are interleaved.

These tests deliver the same slices deliberately SCRAMBLED (via the staged
sources' ``order`` parameter — stage stays chronological, only mtime-driven
delivery changes) and assert byte-identical output vs in-order delivery.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_src_spark.streaming.run import (
    run_early_fire_trace,
    run_incremental_outer_join_changelog,
    run_to_batch,
)
from flink_1_12_0_src_spark.streaming.source import events_stream_mod, events_stream_weeks
from flink_1_12_0_src_spark.streaming.upsert import run_changelog_count

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_changelog_count_delivery_order_invariant(spark):
    inorder = run_changelog_count(
        events_stream_weeks(spark, SF, with_stage=True), "user_id"
    )
    scrambled = run_changelog_count(
        events_stream_weeks(spark, SF, order=("3", "1", "4", "2"), with_stage=True),
        "user_id",
    )
    assert _rows(inorder) == _rows(scrambled)


def test_changelog_count_delete_leg_order_invariant(spark):
    inorder = run_changelog_count(
        events_stream_weeks(spark, SF, with_stage=True), "user_id", having_below=5
    )
    scrambled = run_changelog_count(
        events_stream_weeks(spark, SF, order=("2", "4", "1", "3"), with_stage=True),
        "user_id",
        having_below=5,
    )
    assert _rows(inorder) == _rows(scrambled)


def test_early_fire_trace_delivery_order_invariant(spark):
    inorder = run_early_fire_trace(events_stream_mod(spark, SF, with_stage=True))
    scrambled = run_early_fire_trace(
        events_stream_mod(spark, SF, with_stage=True, order=(2, 0, 3, 1))
    )
    assert _rows(inorder) == _rows(scrambled)


def test_early_fire_trace_equals_raw_update_mode_trace(spark):
    """Under IN-ORDER delivery the reconstructed trace is exactly the trace
    Spark's own update-mode windowed aggregate emits into a memory sink —
    the mechanism claim behind stream_tumble_early_fire."""
    s = events_stream_mod(spark, SF)
    agg = s.groupBy(F.expr("unix_micros(ts) DIV 86400000000").alias("window_day")).agg(
        F.count("*").alias("cnt")
    )
    raw = run_to_batch(agg.select("window_day", "cnt"), "update")
    trace = run_early_fire_trace(events_stream_mod(spark, SF, with_stage=True))
    assert _rows(raw) == _rows(trace)


def test_outer_join_changelog_delivery_order_invariant(spark):
    def run(order):
        s = events_stream_mod(spark, SF, with_stage=True, order=order).filter(
            F.col("event_type").isin("purchase", "error")
        )
        return run_incremental_outer_join_changelog(
            s, side_col="event_type", left_tag="purchase",
            join_keys=["user_id"], left_id="event_id", right_id="event_id",
            how="full",
        )

    assert _rows(run(None)) == _rows(run((3, 2, 1, 0)))


def test_semi_anti_join_delivery_order_invariant(spark):
    from flink_1_12_0_src_spark.streaming.run import run_incremental_semi_anti_join

    def run(how, order):
        s = (
            events_stream_mod(spark, SF, with_stage=True, order=order)
            .filter(
                (F.col("event_type") == "purchase")
                | ((F.col("event_type") == "error") & (F.col("value") > 200))
            )
            .select("user_id", "event_id", "event_type", "stage")
        )
        return run_incremental_semi_anti_join(
            s, side_col="event_type", left_tag="purchase",
            join_keys=["user_id"], left_id="event_id", how=how,
        )

    for how in ("semi", "anti"):
        assert _rows(run(how, None)) == _rows(run(how, (3, 1, 0, 2))), how


def test_delta_trigger_micro_batch_granularity_invariant(spark):
    """Micro-batch GRANULARITY is the other delivery axis the driver's
    environment can perturb (maxFilesPerTrigger coalescing): a stateful
    operator's final output must not depend on how many slices arrive per
    trigger, only on event-time order."""
    from flink_1_12_0_src_spark.streaming.source import events_stream
    from flink_1_12_0_src_spark.streaming.stateful import streaming_delta_trigger

    outs = []
    for mfpt in (1, 4):
        s = (
            events_stream(spark, SF, max_files_per_trigger=mfpt)
            .select("user_id", "ts", "event_id", "value")
            .withWatermark("ts", "0 seconds")
        )
        out = run_to_batch(
            streaming_delta_trigger(
                s, key="user_id", order_cols=["ts", "event_id"], value_col="value",
                delta_cents=4000,
            ),
            "append",
        )
        outs.append(_rows(out))
    assert outs[0] == outs[1]


def test_streaming_cep_micro_batch_granularity_invariant(spark):
    from flink_1_12_0_src_spark.operators.cep import Pattern
    from flink_1_12_0_src_spark.streaming.cep import streaming_match_recognize
    from flink_1_12_0_src_spark.streaming.source import events_stream

    outs = []
    for mfpt in (1, 2):
        pat = (
            Pattern.begin("v")
            .where(lambda pdf: pdf.event_type == "view")
            .next("c")
            .where(lambda pdf: pdf.event_type == "click")
            .within(3600.0)
        )
        s = (
            events_stream(spark, SF, max_files_per_trigger=mfpt)
            .withWatermark("ts", "1 hour")
            .select("user_id", "ts", "event_id", "event_type")
        )
        out = streaming_match_recognize(
            s,
            key="user_id",
            order_by=["ts", "event_id"],
            pattern=pat,
            measures={"view_id": ("v", "last", "event_id"),
                      "click_id": ("c", "last", "event_id")},
            measure_types={"view_id": "long", "click_id": "long"},
            time_col="ts",
            buffer_cols={"ts": "ts", "event_id": "long", "event_type": "string"},
        )
        outs.append(_rows(run_to_batch(out, "append")))
    assert outs[0] == outs[1]
