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
    ],
)
def test_stream_twin_equals_batch(spark, stream_name, batch_name):
    got = _rows(REG[stream_name].spark(spark, SF))
    want = _rows(REG[batch_name].spark(spark, SF))
    assert got == want
