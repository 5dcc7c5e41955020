"""Batch-equality pins for the continuously-maintained analytics twins:
each stream_* report must equal its batch operator row-for-row, because the
streaming state (a grouped-aggregate snapshot) is a pure function of the
data — independent of micro-batch boundaries — and the report half is the
same code (operators/analytics.py) on both sides.
"""

from __future__ import annotations

import pytest

from flink_1_12_0_src_spark.queries import load_all
from tests.conftest import SF_SMOKE as SF

REG = load_all()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "stream_name,batch_name",
    [
        ("stream_retention_cohorts", "events_retention_cohorts"),
        ("stream_funnel_rates", "events_funnel_rates"),
        ("stream_daily_anomaly", "events_daily_anomaly"),
        ("stream_source_mix", "dataset_source_mix_report"),
        ("stream_wordcount_zipf", "text_zipf_rank_report"),
        ("stream_pack_efficiency", "dataset_pack_efficiency"),
    ],
)
def test_stream_twin_equals_batch(spark, stream_name, batch_name):
    got = _rows(REG[stream_name].spark(spark, SF))
    want = _rows(REG[batch_name].spark(spark, SF))
    assert got == want


def test_twin_snapshot_is_microbatch_boundary_invariant(spark):
    """The twins' core claim, pinned directly: the grouped-aggregate
    snapshot is a pure function of the DATA — replaying the same files as
    four micro-batches or as one produces identical state."""
    from pyspark.sql import functions as F

    from flink_1_12_0_src_spark.streaming.run import run_to_batch
    from flink_1_12_0_src_spark.streaming.source import events_stream

    def snapshot(per_trigger):
        s = events_stream(spark, SF, n_files=4, max_files_per_trigger=per_trigger)
        daily = (
            s.select("event_type", F.to_date("ts").alias("day"))
            .groupBy("event_type", "day")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        return _rows(run_to_batch(daily, "complete"))

    assert snapshot(1) == snapshot(4)
