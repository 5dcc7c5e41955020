"""User-behavior analytics operators over event streams (retention cohorts,
per-group distribution stats).

The reference ships these as windowed SQL / Table-API aggregations over keyed
event streams (flink-table planner: group windows + OVER aggregates, e.g.
`flink-table/flink-table-planner-blink/src/main/scala/org/apache/flink/table/
planner/plan/nodes/physical/stream/StreamExecGroupWindowAggregate.scala`);
here each is one declarative DataFrame plan so Catalyst picks the physical
strategy.

Scale design (100 TB of events):
- ``retention_cohorts``: the corpus shuffles ONCE on ``user_id`` (distinct
  weekly activity + first-week aggregate share the same key, so AQE reuses
  the exchange for the join); everything after the per-user join is an
  aggregate over (cohort_week, week_offset) — weeks × offsets rows, tiny.
  No count-distinct is needed at the final stage: activity is already
  distinct per (user, week) and cohort_week is functionally dependent on
  user_id, so a plain COUNT(*) is exact.
- ``value_percentiles``: exact percentiles via Spark's ``percentile``
  aggregate — per-group state is a value→count map, fine for bounded-domain
  measures; for unbounded high-cardinality measures at 100 TB the scale path
  is ``approx_percentile`` (t-digest, mergeable sketch). The oracle gate
  needs exact quantiles, so the exact form is what is registered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the ISO week of
    their first event; each (cohort_week, week_offset) row counts the cohort
    members active that week and their share of the cohort
    (``retention = n_active / cohort size``).

    Both engines truncate weeks to ISO Monday (`date_trunc('week', ...)`),
    so offsets are exact multiples of 7 days and the integer division is
    lossless.
    """
    act = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.to_date(F.date_trunc("week", F.col(ts_col))).alias("wk"),
        )
        .distinct()
    )
    first = act.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    # act is distinct on (user_id, wk) and cohort_week is functionally
    # dependent on user_id, so COUNT(*) below counts distinct active users.
    joined = act.join(first, "user_id").select(
        "cohort_week",
        (F.datediff(F.col("wk"), F.col("cohort_week")) / 7).cast("int").alias("week_offset"),
    )
    counts = joined.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    size = W.partitionBy("cohort_week")
    cohort_size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(size)
    return counts.withColumn(
        "retention",
        F.round(F.col("n_active").cast("double") / cohort_size, round_digits),
    )


def value_percentiles(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    round_digits: int = 6,
) -> DataFrame:
    """Per-group distribution report of a numeric measure: exact linear-
    interpolation percentiles (rank ``p*(n-1)``, the ANSI PERCENTILE_CONT
    definition shared by Spark's ``percentile`` and DuckDB's
    ``quantile_cont``), plus count / min / max and a DECIMAL-accumulated
    mean so every statistic is order-independent across engines."""
    pct_arr = F.expr(
        f"percentile({value_col}, array({', '.join(f'{p}D' for p in percentiles)}))"
    )
    dec = F.round(F.col(value_col), round_digits).cast("decimal(18,6)")
    agg = events.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.min(value_col), round_digits).alias("min_value"),
        F.round(F.max(value_col), round_digits).alias("max_value"),
        F.round(F.sum(dec).cast("double") / F.count(F.lit(1)), round_digits).alias(
            "avg_value"
        ),
        pct_arr.alias("pcts"),
    )
    cols = [agg[group_col], "n_events", "min_value", "max_value", "avg_value"]
    for i, p in enumerate(percentiles):
        name = f"p{str(p).replace('0.', '').ljust(2, '0')}"
        cols.append(F.round(F.col("pcts")[i], round_digits).alias(name))
    return agg.select(*cols)
