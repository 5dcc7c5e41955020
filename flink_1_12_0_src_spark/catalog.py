"""Catalog layer: register the driver's parquet tables as Spark views.

Mirrors Flink's catalog + ``CREATE TABLE ... WITH ('connector'='filesystem', ...)`` DDL
surface (reference: flink-table/flink-table-api-java/.../GenericInMemoryCatalog.java:52,
flink-table/flink-sql-parser/.../ddl/SqlCreateTable.java). On Spark, a parquet directory
scan is a DSv2 source with filter/projection/partition pushdown built in — the
equivalents of Flink's SupportsFilterPushDown / SupportsProjectionPushDown ability
interfaces (flink-table/flink-table-common/.../connector/source/abilities/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table. Plain ``spark.read.parquet``: Catalyst handles
    predicate pushdown + column pruning, so callers filter/select freely.

    ``events.ts`` is TIMESTAMP(NANOS) on disk; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as a raw INT64 that we
    convert to a microsecond timestamp (lossless for this data; DuckDB's
    TIMESTAMP_NS → TIMESTAMP cast truncates identically). The conversion is a
    cheap projection that stays inside whole-stage codegen.
    """
    # Runtime-settable; ensures any caller-provided session (e.g. the driver's)
    # can read the NANOS-typed events file.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin the session time zone: every calendar operation (string→timestamp
    # casts, F.window day buckets, NTZ→LTZ normalization below) must agree
    # with the DuckDB oracles, which treat the on-disk wall-clock values as
    # UTC. A caller-provided session with a non-UTC TZ would silently shift
    # day/week boundaries while keeping row counts identical.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        kind = field.dataType.simpleString()
        if kind == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif kind == "timestamp_ntz":
            # Newer parquet readers surface TIMESTAMP(NANOS) as NTZ directly
            # (ignoring nanosAsLong). Normalize to TIMESTAMP: the session TZ
            # is pinned UTC, so the wall-clock values are unchanged, and
            # event-time ops (withWatermark) require the LTZ type.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so queries can use ``spark.sql``.

    Idempotent; re-registering just repoints the view at the same path.
    """
    for name in tables:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
