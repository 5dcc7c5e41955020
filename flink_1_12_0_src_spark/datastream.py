"""DataStream API facade — the reference's primary programming surface
(SURVEY.md §2.2/§2.8; flink-streaming-java/src/main/java/org/apache/flink/
streaming/api/datastream/{DataStream,KeyedStream,WindowedStream}.java and
environment/StreamExecutionEnvironment.java) on DataFrames.

Flink 1.12 runs the same DataStream program in streaming OR batch execution
mode (FLIP-134: `env.setRuntimeMode(BATCH)`); this facade is that batch
mode: every transformation maps 1:1 onto a DataFrame operation and Catalyst
replaces the StreamGraph translator. The streaming execution of the same
shapes is covered by the `stream_*` queries (`streaming/` package — real
Structured Streaming jobs); here the point is API parity for bounded
programs:

- ``map`` / ``flat_map`` / ``filter`` take SQL expression strings so the
  hot path stays JVM-side (whole-stage codegen), exactly like the Table
  API's expression DSL. ``map`` with a dict projects named expressions;
  ``flat_map`` explodes an array expression.
- ``key_by`` → :class:`KeyedStream` with Flink's built-in rolling
  aggregates (``sum``/``min``/``max``/``min_by``/``max_by`` — the
  KeyedStream.java:775-1000 family) as deterministic batch equivalents
  (final value per key; min_by/max_by tie-break on the order column).
- ``window(Tumbling/Sliding/Session…)`` → :class:`WindowedStream` with
  ``aggregate`` over postfix-style named aggregates.
- ``union`` / ``project`` / ``print`` / ``to_df`` round out the surface.

Citations per method in docstrings; reduce() is intentionally NOT exposed
with an arbitrary Python lambda — an associative user fold over a 100 TB
partition belongs in an aggregate expression or a pandas UDAF, not a
row-at-a-time Python loop (the one non-mapping this facade documents).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


class StreamExecutionEnvironment:
    """StreamExecutionEnvironment.java:160 (getExecutionEnvironment) —
    bounded/batch runtime mode (FLIP-134)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    @staticmethod
    def get_execution_environment(spark: SparkSession) -> "StreamExecutionEnvironment":
        return StreamExecutionEnvironment(spark)

    def from_collection(self, data, schema) -> "DataStream":
        """env.fromCollection (StreamExecutionEnvironment.java:921)."""
        return DataStream(self.spark.createDataFrame(data, schema))

    def from_dataframe(self, df: DataFrame) -> "DataStream":
        """DataStream↔Table bridge (StreamExecDataStreamScan analog)."""
        return DataStream(df)


class DataStream:
    """DataStream.java:137 — bounded-mode transformations on a DataFrame."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- row-level ---------------------------------------------------------
    def map(self, exprs: dict[str, str]) -> "DataStream":
        """DataStream.map (DataStream.java:588): project named expressions
        ({out_name: sql_expr}); expression strings keep the map JVM-side."""
        return DataStream(
            self._df.select(*[F.expr(e).alias(n) for n, e in exprs.items()])
        )

    def flat_map(self, array_expr: str, out_name: str, keep: list[str] | None = None) -> "DataStream":
        """DataStream.flatMap (DataStream.java:613): one input row → N output
        rows, expressed as explode(array_expr)."""
        cols = [F.col(c) for c in (keep or [])]
        return DataStream(self._df.select(*cols, F.explode(F.expr(array_expr)).alias(out_name)))

    def filter(self, predicate: str) -> "DataStream":
        """DataStream.filter (DataStream.java:638)."""
        return DataStream(self._df.filter(F.expr(predicate)))

    def project(self, *fields: str) -> "DataStream":
        """DataStream.project (DataStream.java:654)."""
        return DataStream(self._df.select(*fields))

    def union(self, *others: "DataStream") -> "DataStream":
        """DataStream.union (DataStream.java:238)."""
        df = self._df
        for o in others:
            df = df.unionByName(o._df)
        return DataStream(df)

    # -- keying ------------------------------------------------------------
    def key_by(self, *keys: str) -> "KeyedStream":
        """DataStream.keyBy (DataStream.java:292) → KeyedStream."""
        return KeyedStream(self._df, list(keys))

    def iterate(self, step, max_iterations: int = 10) -> "DataStream":
        """DataStream.iterate (DataStream.java:537) in batch execution: apply
        the loop body ``step: DataStream -> DataStream`` ``max_iterations``
        times with per-round ``localCheckpoint`` lineage truncation — the
        driver-loop fixpoint shape every Gelly algorithm in this repo uses
        (streaming feedback execution: ``stream_iterate_reduce``)."""
        df = self._df
        for _ in range(max_iterations):
            df = step(DataStream(df)).to_df().localCheckpoint(eager=True)
        return DataStream(df)

    def print(self, n: int = 20) -> None:
        """DataStream.print (DataStream.java:974) → console sink."""
        self._df.show(n, truncate=False)

    def to_df(self) -> DataFrame:
        return self._df


class KeyedStream:
    """KeyedStream.java:118 — keyed rolling aggregates, batch-mode finals."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df, self._keys = df, keys

    def sum(self, field: str) -> DataStream:
        """KeyedStream.sum(field) (KeyedStream.java:775): final per-key sum
        (the last value the rolling aggregate would emit)."""
        return DataStream(self._df.groupBy(*self._keys).agg(F.sum(field).alias(field)))

    def min(self, field: str) -> DataStream:
        """KeyedStream.min (KeyedStream.java:797)."""
        return DataStream(self._df.groupBy(*self._keys).agg(F.min(field).alias(field)))

    def max(self, field: str) -> DataStream:
        """KeyedStream.max (KeyedStream.java:842)."""
        return DataStream(self._df.groupBy(*self._keys).agg(F.max(field).alias(field)))

    def _by(self, field: str, order_col: str, minimize: bool) -> DataStream:
        from pyspark.sql import Window as W

        # NULL values must never win a min/max: Spark ASC is NULLS FIRST by
        # default, which would make a NULL-valued row the per-key "minimum"
        # (Flink compares actual values; DuckDB ASC is NULLS LAST)
        direction = [
            F.asc_nulls_last(field) if minimize else F.desc_nulls_last(field),
            F.asc(order_col),
        ]
        w = W.partitionBy(*self._keys).orderBy(*direction)
        return DataStream(
            self._df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def min_by(self, field: str, order_col: str) -> DataStream:
        """KeyedStream.minBy (KeyedStream.java:820): the whole row holding the
        per-key minimum; Flink keeps the FIRST such element, so ties break on
        the explicit ``order_col`` for batch determinism."""
        return self._by(field, order_col, minimize=True)

    def max_by(self, field: str, order_col: str) -> DataStream:
        """KeyedStream.maxBy (KeyedStream.java:865)."""
        return self._by(field, order_col, minimize=False)

    def window(self, assigner: "_WindowAssigner") -> "WindowedStream":
        """KeyedStream.window (KeyedStream.java:530) → WindowedStream."""
        return WindowedStream(self._df, self._keys, assigner)


class _WindowAssigner:
    def __init__(self, kind: str, size: str, slide: str | None = None):
        self.kind, self.size, self.slide = kind, size, slide
        self.time_col: str | None = None

    def on(self, time_col: str) -> "_WindowAssigner":
        self.time_col = time_col
        return self

    def _column(self) -> Column:
        if not self.time_col:
            raise ValueError("window assigner needs .on(time_col)")
        if self.kind == "tumble":
            return F.window(self.time_col, self.size)
        if self.kind == "slide":
            return F.window(self.time_col, self.size, self.slide)
        return F.session_window(self.time_col, self.size)


class TumblingEventTimeWindows:
    """…/api/windowing/assigners/TumblingEventTimeWindows.java:36."""

    @staticmethod
    def of(size: str) -> _WindowAssigner:
        return _WindowAssigner("tumble", size)


class SlidingEventTimeWindows:
    """…/api/windowing/assigners/SlidingEventTimeWindows.java:38."""

    @staticmethod
    def of(size: str, slide: str) -> _WindowAssigner:
        return _WindowAssigner("slide", size, slide)


class EventTimeSessionWindows:
    """…/api/windowing/assigners/EventTimeSessionWindows.java:39."""

    @staticmethod
    def with_gap(gap: str) -> _WindowAssigner:
        return _WindowAssigner("session", gap)


class WindowedStream:
    """WindowedStream.java:122 — windowed aggregates; batch mode emits each
    window's final pane."""

    def __init__(self, df: DataFrame, keys: list[str], assigner: _WindowAssigner):
        self._df, self._keys, self._assigner = df, keys, assigner

    def aggregate(self, aggs: dict[str, Column]) -> DataStream:
        """WindowedStream.aggregate (WindowedStream.java:661): named aggregate
        Columns per (key, window); the window struct surfaces as
        window_start/window_end."""
        win = self._assigner._column().alias("_w")
        out = (
            self._df.groupBy(win, *self._keys)
            .agg(*[c.alias(n) for n, c in aggs.items()])
            .select(
                F.col("_w.start").alias("window_start"),
                F.col("_w.end").alias("window_end"),
                *self._keys,
                *aggs.keys(),
            )
        )
        return DataStream(out)

    def sum(self, field: str) -> DataStream:
        """WindowedStream.sum (WindowedStream.java:1258)."""
        return self.aggregate({field: F.sum(field)})
