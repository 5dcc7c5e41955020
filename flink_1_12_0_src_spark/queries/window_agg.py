"""OVER windows, ranking/Top-N/dedup, and group (time) windows
(SURVEY.md §2.4 StreamExecGroupWindowAggregate, §2.5 Over/Rank/Deduplicate).

Batch forms here (Flink's batch window aggs + the batch shape of each streaming
operator); the true Structured-Streaming forms live in streamingq.py.

Determinism: every row_number()/rank() orders by a unique key suffix
(event_id / (l_orderkey,l_linenumber)), so results are stable across engines.

Scale notes: window functions shuffle once on partitionBy keys; time-window
aggs are plain hash aggs on a derived bucket column (no per-window state in
batch). Top-N per group is the classic rank≤k filter that Spark 3.5 pushes
into a WindowGroupLimit before the full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from flink_1_12_0_src_spark.catalog import table
from flink_1_12_0_src_spark.queries import register
from flink_1_12_0_src_spark.queries._util import dec, dsum

# ---------------------------------------------------------------------------
# §2.5 OVER aggregates — full frame surface
# ---------------------------------------------------------------------------


@register(
    "over_rows_frame",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_sum,
       COUNT(*) OVER w AS running_cnt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
    tags=("batch", "over", "bench"),
    doc="ROWS UNBOUNDED PRECEDING running agg (Flink BatchExecOverAggregate — "
    "…/batch/BatchExecOverAggregate.scala:59, RowUnboundedPrecedingOverFrame.java; "
    "streaming twin: RowTimeRowsUnboundedPrecedingFunction).",
)
def over_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("running_sum"),
        F.count("*").over(w).alias("running_cnt"),
    ).orderBy("event_id")


@register(
    "over_sliding_rows",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum3,
       CAST(MAX(value) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS max_neighborhood
FROM events WHERE user_id <= 30
ORDER BY event_id
""",
    tags=("batch", "over"),
    doc="Bounded sliding ROWS frames incl. FOLLOWING (Flink RowSlidingOverFrame.java, "
    "OffsetOverFrame.java).",
)
def over_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    base = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(base.rowsBetween(-2, 0))
        .cast("double")
        .alias("sum3"),
        F.max("value").over(base.rowsBetween(-1, 1)).cast("double").alias("max_neighborhood"),
    ).orderBy("event_id")


@register(
    "over_range_frame",
    oracle="""
SELECT o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       COUNT(*) OVER (ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS peers_within_1000
FROM orders WHERE o_orderkey <= 2000
ORDER BY o_orderkey
""",
    tags=("batch", "over"),
    doc="RANGE value-based frame (Flink RangeSlidingOverFrame.java / "
    "RangeUnboundedPrecedingOverFrame.java). Spark rangeBetween on a numeric sort key.",
)
def over_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = W.orderBy("o_totalprice").rangeBetween(-1000, 0)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.count("*").over(w).alias("peers_within_1000"),
    ).orderBy("o_orderkey")


@register(
    "over_rank_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROW_NUMBER()   OVER w AS rn,
       RANK()         OVER w AS rnk,
       DENSE_RANK()   OVER w AS drnk,
       NTILE(4)       OVER w AS quartile,
       CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
       CAST(CUME_DIST()    OVER w AS DOUBLE) AS cume
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber)
ORDER BY l_orderkey, l_linenumber
LIMIT 2000
""",
    tags=("batch", "over", "rank"),
    doc="Ranking function family (Flink RANK/DENSE_RANK/ROW_NUMBER as agg functions — "
    "…/planner/functions/aggfunctions/RankAggFunction.java etc.).",
)
def over_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy("l_quantity", "l_orderkey", "l_linenumber")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).cast("double").alias("pct_rank"),
            F.cume_dist().over(w).cast("double").alias("cume"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(2000)
    )


@register(
    "over_lead_lag",
    oracle="""
SELECT event_id, user_id,
       lag(event_type)  OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       CAST(lag(value, 2, -1.0) OVER w AS DOUBLE) AS value_2back
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
""",
    tags=("batch", "over"),
    doc="LEAD/LAG with offset + default (Flink LeadLagAggFunction.java).",
)
def over_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("value", 2, -1.0).over(w).cast("double").alias("value_2back"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# §2.5 Top-N / dedup (batch shape of StreamExecRank / StreamExecDeduplicate)
# ---------------------------------------------------------------------------


@register(
    "topn_per_group",
    oracle="""
SELECT * FROM (
  SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
) WHERE rn <= 3
ORDER BY user_id, rn
""",
    tags=("batch", "rank", "topn", "bench"),
    doc="Top-N per key: rank ≤ k predicate → rank operator (Flink StreamExecRank — "
    "…/stream/StreamExecRank.scala:52, AppendOnlyTopNFunction.java). Spark 3.5+: "
    "InferWindowGroupLimit prunes to per-partition top-k before the full window sort.",
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.col("value").cast("double").alias("value"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("user_id", "rn")
    )


@register(
    "dedup_keep_first",
    oracle="""
SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id, event_type
""",
    tags=("batch", "dedup", "bench"),
    doc="Dedup keep-first: ROW_NUMBER()=1 ORDER BY time ASC (Flink "
    "StreamExecDeduplicate — …/stream/StreamExecDeduplicate.scala:58, "
    "ProcTimeDeduplicateKeepFirstRowFunction). Streaming twin: dropDuplicates in "
    "streamingq.py.",
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    )


@register(
    "dedup_keep_last",
    oracle="""
SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id, event_type
""",
    tags=("batch", "dedup"),
    doc="Dedup keep-last — the upsert/ChangelogNormalize primitive (Flink "
    "…/deduplicate/ProcTimeDeduplicateKeepLastRowFunction.java, "
    "StreamExecChangelogNormalize.scala:46). Batch: row_number DESC; streaming twin "
    "uses max_by(struct) update-mode agg (operators/dedup.py).",
)
def dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# §2.4 Group (time) windows — batch shape
# ---------------------------------------------------------------------------


@register(
    "window_tumble",
    oracle="""
SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2 ORDER BY window_start, event_type
""",
    tags=("batch", "window", "bench"),
    doc="TUMBLE window agg (Flink StreamExecGroupWindowAggregate — "
    "…/operators/window/assigners/TumblingWindowAssigner.java). Spark: "
    "groupBy(window(ts, '1 hour')) — a derived-bucket hash agg in batch.",
)
def window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            dsum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value")
        .orderBy("window_start", "event_type")
    )


@register(
    "window_hop",
    oracle="""
WITH hops AS (
  SELECT e.*, time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) - (k.k * INTERVAL 30 MINUTE) AS window_start
  FROM events e CROSS JOIN (VALUES (0), (1)) AS k(k)
)
SELECT window_start, COUNT(*) AS cnt
FROM hops
WHERE CAST(ts AS TIMESTAMP) >= window_start
  AND CAST(ts AS TIMESTAMP) < window_start + INTERVAL 1 HOUR
GROUP BY window_start ORDER BY window_start
""",
    tags=("batch", "window"),
    doc="HOP/sliding window (1h size, 30m slide): each row lands in size/slide "
    "windows (Flink SlidingWindowAssigner.java). Spark window(ts, '1 hour', "
    "'30 minutes') replicates rows the same way (Expand).",
)
def window_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
        .orderBy("window_start")
    )


@register(
    "window_session",
    oracle="""
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessioned AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM sessioned GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
    tags=("batch", "window", "session"),
    doc="SESSION window, 30 min gap (Flink SessionWindowAssigner.java — merging "
    "windows). Spark: session_window(ts, gap) in batch groupBy; the oracle uses the "
    "classic gaps-and-islands formulation. Streaming twin in streamingq.py.",
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        .orderBy("user_id", "session_start")
    )


@register(
    "window_cumulate",
    oracle="""
WITH steps AS (
  SELECT e.*, time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)) AS day_start,
         k.k * INTERVAL 6 HOUR AS ext
  FROM events e CROSS JOIN (VALUES (1),(2),(3),(4)) AS k(k)
)
SELECT day_start AS window_start, day_start + ext AS window_end, COUNT(*) AS cnt
FROM steps
WHERE CAST(ts AS TIMESTAMP) < day_start + ext
GROUP BY 1, 2 ORDER BY window_start, window_end
""",
    tags=("batch", "window"),
    doc="CUMULATE window (Flink CumulativeWindowAssigner.java — day window growing "
    "in 6h steps). No Spark built-in: expressed as explode over step ends + filter, "
    "exactly the assigner's replication semantics. Scales: Expand ×4 then hash agg.",
)
def window_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    steps = ev.select(
        "ts",
        F.date_trunc("day", "ts").alias("day_start"),
        F.explode(F.expr("array(1,2,3,4)")).alias("k"),
    ).withColumn("window_end", F.expr("day_start + make_interval(0,0,0,0, 6*k, 0, 0)"))
    return (
        steps.filter(F.col("ts") < F.col("window_end"))
        .groupBy(F.col("day_start").alias("window_start"), "window_end")
        .agg(F.count("*").alias("cnt"))
        .orderBy("window_start", "window_end")
    )


@register(
    "temporal_sort",
    oracle="""
SELECT event_id, ts, user_id
FROM events WHERE user_id <= 10
ORDER BY ts, event_id
""",
    tags=("batch", "sort"),
    doc="Sort by time attribute + unique tiebreak (Flink StreamExecTemporalSort — "
    "…/stream/StreamExecTemporalSort.scala:50, RowTimeSortOperator). Batch: plain "
    "orderBy; streaming emits per watermark.",
)
def temporal_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    return ev.select("event_id", "ts", "user_id").orderBy("ts", "event_id")


@register(
    "over_time_range_preceding",
    oracle="""
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch(CAST(ts AS TIMESTAMP))
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS cnt_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY epoch(CAST(ts AS TIMESTAMP))
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_last_hour
FROM events WHERE user_id <= 30
ORDER BY event_id
""",
    tags=("batch", "over", "time_range"),
    doc="Time-range OVER: agg over rows within [t-1h, t] per key — the batch shape of "
    "Flink's streaming OVER (RowTimeRangeBoundedPrecedingFunction.java:61). Spark "
    "rangeBetween needs a numeric key → epoch seconds.",
)
def over_time_range_preceding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("cnt_last_hour"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum_last_hour"),
    ).orderBy("event_id")


@register(
    "window_session_dynamic_gap",
    oracle="""
WITH e AS (SELECT user_id, ts, CAST(value AS DECIMAL(12,2)) AS val,
                  CASE WHEN event_type = 'error' THEN 1800000000 ELSE 3600000000 END AS gap_us,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS us
           FROM events),
m AS (SELECT *, MAX(us + gap_us) OVER (PARTITION BY user_id ORDER BY us
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM e),
b AS (SELECT *, CASE WHEN prev_end IS NULL OR us >= prev_end THEN 1 ELSE 0 END AS brk FROM m),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us) AS sess FROM b)
SELECT user_id, MIN(ts) AS session_start, make_timestamp(MAX(us + gap_us)) AS session_end,
       COUNT(*) AS cnt, CAST(SUM(val) AS DOUBLE) AS total
FROM s GROUP BY user_id, sess
ORDER BY user_id, session_start
""",
    tags=("batch", "window", "session", "dynamic_gap"),
    doc="Session window with DYNAMIC gap (Flink SessionWindowTimeGapExtractor — "
    "…/api/windowing/assigners/DynamicEventTimeSessionWindows.java): error "
    "events extend the session only 30 min, others 60 min. Spark: "
    "session_window with a per-row gap expression. Oracle: islands SQL with a "
    "running max of (ts+gap) in exact microseconds.",
)
def window_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "error", "30 minutes").otherwise("60 minutes")
    return (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "cnt",
            "total",
        )
        .orderBy("user_id", "session_start")
    )
