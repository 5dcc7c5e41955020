"""Streaming source: replay the events table as a chronological file stream.

Flink equivalent: FileSource with continuous monitoring
(flink-connectors/flink-connector-files/.../FileSource.java) feeding event-time
operators. Here the driver's events.parquet is split once per (sf_dir,
n_files) into range-partitioned files; readStream + maxFilesPerTrigger=1
yields one micro-batch per time slice, in order (FileStreamSource processes
by modification time then path; ranges are written in ascending part order).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from flink_1_12_0_src_spark.catalog import table

# v2: staged-cache format version — bumping forces re-staging so files always
# carry the current session's timestamp semantics (LTZ micros); stale caches
# written under different parquet-timestamp configs would otherwise surface
# TIMESTAMP_NTZ columns that withWatermark rejects.
_CACHE_ROOT = os.path.join(tempfile.gettempdir(), "flink_1_12_0_src_spark_streams_v3")


def _split_dir(sf_dir: str, n_files: int) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(_CACHE_ROOT, f"{tag}_events_{n_files}")


def events_stream(
    spark: SparkSession, sf_dir: str, n_files: int = 4, max_files_per_trigger: int = 1
) -> DataFrame:
    """Return a streaming DataFrame replaying events in ~n_files micro-batches."""
    path = _split_dir(sf_dir, n_files)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        ev = table(spark, sf_dir, "events")
        (
            ev.repartitionByRange(n_files, "ts")
            .sortWithinPartitions("ts", "event_id")
            .write.mode("overwrite")
            .parquet(path)
        )
        # FileStreamSource orders new files by modification time; make that
        # order the ts-range order explicitly (part-00000 = lowest range).
        parts = sorted(f for f in os.listdir(path) if f.startswith("part-"))
        base = os.path.getmtime(os.path.join(path, parts[-1]))
        for i, f in enumerate(parts):
            os.utime(os.path.join(path, f), (base + i, base + i))
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def events_stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay with REAL late data: calendar-week slices delivered out of
    order — week1, week3, week2, week4 (of the 2024-01 events range). After
    the week3 batch the watermark (0s delay = running max event time) sits at
    max(week3), so every week2 row arrives late — the fixture for the
    allowed-lateness / side-output mapping (WindowedStream.sideOutputLateData,
    …/datastream/WindowedStream.java:128).

    Fixed date boundaries (not quantiles) keep the late set SQL-expressible:
    late rows == rows with ts in [Jan 8, Jan 15).
    """
    path = os.path.join(_CACHE_ROOT, f"{sf_dir.strip('/').replace('/', '_')}_events_late")
    marker = os.path.join(path, "_SUCCESS")
    weeks = [
        ("1", "2024-01-01", "2024-01-08"),
        ("3", "2024-01-15", "2024-01-22"),
        ("2", "2024-01-08", "2024-01-15"),
        ("4", "2024-01-22", "2024-02-01"),
    ]
    if not os.path.exists(marker):
        ev = table(spark, sf_dir, "events")
        os.makedirs(path, exist_ok=True)
        for w, lo, hi in weeks:
            (
                ev.filter((ev.ts >= lo) & (ev.ts < hi))
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(path, f"week{w}"))
            )
        open(marker, "w").close()
        files = [os.path.join(path, f"week{w}") for w, _, _ in weeks]
        base = os.path.getmtime(marker)
        for i, d in enumerate(files):
            for f in os.listdir(d):
                os.utime(os.path.join(d, f), (base + i, base + i))
    schema = spark.read.parquet(os.path.join(path, "week1")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "/week*")
    )


def events_stream_weeks(
    spark: SparkSession, sf_dir: str, order: tuple[str, ...] = ("1", "2", "3", "4")
) -> DataFrame:
    """Replay staged by CALENDAR WEEK of the 2024-01 events range, one week
    per micro-batch, delivered in ``order``. Fixed date boundaries make the
    per-batch contents SQL-expressible — the fixture for changelog-emission
    oracles (batch k ≡ week order[k]).
    """
    bounds = {
        "1": ("2024-01-01", "2024-01-08"),
        "2": ("2024-01-08", "2024-01-15"),
        "3": ("2024-01-15", "2024-01-22"),
        "4": ("2024-01-22", "2024-02-01"),
    }
    tag = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(_CACHE_ROOT, f"{tag}_events_weeks_{'_'.join(order)}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        ev = table(spark, sf_dir, "events")
        os.makedirs(path, exist_ok=True)
        for w in order:
            lo, hi = bounds[w]
            (
                ev.filter((ev.ts >= lo) & (ev.ts < hi))
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(path, f"week{w}"))
            )
        open(marker, "w").close()
        base = os.path.getmtime(marker)
        for i, w in enumerate(order):
            d = os.path.join(path, f"week{w}")
            for f in os.listdir(d):
                os.utime(os.path.join(d, f), (base + i, base + i))
    schema = spark.read.parquet(os.path.join(path, f"week{order[0]}")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "/week*")
    )


def events_stream_mod(spark: SparkSession, sf_dir: str, parts: int = 4) -> DataFrame:
    """Replay staged by ``event_id % parts``, one residue class per
    micro-batch, in residue order. Every time window receives rows in EVERY
    batch, so an update-mode windowed aggregate re-emits each window's
    refined result per trigger — the deterministic fixture for early-fire
    emission oracles (batch k ≡ rows with event_id % parts == k, so the
    cumulative count after batch k is SQL-expressible)."""
    tag = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(_CACHE_ROOT, f"{tag}_events_mod{parts}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        ev = table(spark, sf_dir, "events")
        os.makedirs(path, exist_ok=True)
        for r in range(parts):
            (
                ev.filter(ev.event_id % parts == r)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(path, f"mod{r}"))
            )
        open(marker, "w").close()
        base = os.path.getmtime(marker)
        for r in range(parts):
            d = os.path.join(path, f"mod{r}")
            for f in os.listdir(d):
                os.utime(os.path.join(d, f), (base + r, base + r))
    schema = spark.read.parquet(os.path.join(path, "mod0")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "/mod*")
    )
