"""Flink-SQL dialect + connector-DDL queries (SURVEY.md §2.11, §3.1, §2.1),
oracle-checked: each query enters through ``TableEnvironment`` exactly as a
Flink user would write it — group-window SQL, CREATE TABLE … WITH (connector)
DDL over csv/json files, partitioned filesystem sinks via INSERT — and must
produce the same rows DuckDB computes from the original parquet.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_1_12_0_src_spark.catalog import table
from flink_1_12_0_src_spark.queries import register
from flink_1_12_0_src_spark.table_env import TableEnvironment

_SQL_TOTAL = "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)"
_CACHE = os.path.join(tempfile.gettempdir(), "flink_1_12_0_src_spark_files")


def _tag(sf_dir: str) -> str:
    return sf_dir.strip("/").replace("/", "_")


def _staged_events_json(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events table as JSON lines once per SF (timestamps at
    microsecond precision); shared by every query that reads events back
    through a filesystem+json CREATE TABLE."""
    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_events_json")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            table(spark, sf_dir, "events")
            .withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
            .write.mode("overwrite")
            .json(path)
        )
    return path




def _env_with_events(spark: SparkSession, sf_dir: str) -> TableEnvironment:
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return TableEnvironment(spark)


@register(
    "flinksql_tumble",
    oracle=f"""
SELECT time_bucket(INTERVAL '1 day', ts) AS window_start, event_type,
       COUNT(*) AS cnt, {_SQL_TOTAL} AS total
FROM events GROUP BY 1, 2
""",
    tags=("dialect", "window_agg"),
    doc="Flink 1.12 group-window SQL (TUMBLE + TUMBLE_START, "
    "FlinkSqlOperatorTable group-window functions) lowered by the dialect "
    "layer to Spark window(); the user-facing string is pure Flink SQL.",
)
def flinksql_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = _env_with_events(spark, sf_dir)
    return env.sql_query("""
        SELECT TUMBLE_START(ts, INTERVAL '1' DAY) AS window_start, event_type,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events
        GROUP BY TUMBLE(ts, INTERVAL '1' DAY), event_type
    """)


@register(
    "flinksql_hop",
    oracle=f"""
SELECT time_bucket(INTERVAL '12 hours', ts) - k.k * INTERVAL '12 hours' AS window_start,
       COUNT(*) AS cnt, {_SQL_TOTAL} AS total
FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
GROUP BY 1
""",
    tags=("dialect", "window_agg"),
    doc="Flink HOP(time, slide, size) — note the arg-order swap to Spark "
    "window(time, size, slide) the translator performs.",
)
def flinksql_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = _env_with_events(spark, sf_dir)
    return env.sql_query("""
        SELECT HOP_START(ts, INTERVAL '12' HOUR, INTERVAL '1' DAY) AS window_start,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events
        GROUP BY HOP(ts, INTERVAL '12' HOUR, INTERVAL '1' DAY)
    """)


@register(
    "flinksql_session",
    oracle="""
WITH brk AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS s
  FROM brk
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS cnt
FROM sid GROUP BY user_id, s
""",
    tags=("dialect", "window_agg", "session"),
    doc="Flink SESSION(time, gap) group window → Spark session_window(); "
    "SESSION_START maps to the session_window.start struct field.",
)
def flinksql_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = _env_with_events(spark, sf_dir)
    return env.sql_query("""
        SELECT user_id,
               SESSION_START(ts, INTERVAL '30' MINUTE) AS session_start,
               COUNT(*) AS cnt
        FROM events
        GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)
    """)


def _nation_csv(spark: SparkSession, sf_dir: str) -> str:
    """Stage nation as '|'-delimited CSV once per sf_dir (shared by the
    csv-source / computed-column / ALTER TABLE DDL queries)."""
    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_nation_csv")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "nation").coalesce(1).write.mode("overwrite").option(
            "sep", "|"
        ).csv(path)
    return path


_NATION_COLS_DDL = """
            n_nationkey BIGINT,
            n_name STRING,
            n_regionkey BIGINT,
            n_comment STRING
"""


@register(
    "flinkddl_csv_source",
    oracle="""
SELECT r.r_name, COUNT(*) AS n_nations, CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
    tags=("dialect", "ddl", "source", "csv"),
    doc="Flink filesystem+csv connector DDL (FileSystemTableFactory.java, "
    "CsvFormatFactory.java:121 — field-delimiter option): nation is staged as "
    "'|'-delimited CSV, registered via CREATE TABLE … WITH, joined to the "
    "parquet region table. Exercises schema-on-read + option translation.",
)
def flinkddl_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _nation_csv(spark, sf_dir)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE nation_csv (
            n_nationkey BIGINT,
            n_name STRING,
            n_regionkey BIGINT,
            n_comment STRING
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'csv',
            'csv.field-delimiter' = '|'
        )
    """)
    table(spark, sf_dir, "region").createOrReplaceTempView("region")
    return env.sql_query("""
        SELECT r.r_name, COUNT(*) AS n_nations, CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
        FROM nation_csv n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """)


@register(
    "flinkddl_json_source",
    oracle=f"""
SELECT event_type, COUNT(*) AS cnt, {_SQL_TOTAL} AS total,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM events GROUP BY event_type
""",
    tags=("dialect", "ddl", "source", "json"),
    doc="Flink filesystem+json connector DDL (flink-formats/flink-json): "
    "events staged as JSON lines (timestamps serialized at microsecond "
    "precision), read back through CREATE TABLE with a TIMESTAMP(3) column, "
    "aggregated — proves the json format + type mapping round-trips.",
)
def flinkddl_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _staged_events_json(spark, sf_dir)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE events_json (
            event_id BIGINT,
            ts TIMESTAMP(3),
            user_id BIGINT,
            event_type STRING,
            `value` DOUBLE,
            props STRING
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'json'
        )
    """)
    return env.sql_query("""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(`value` AS DECIMAL(12,2))) AS DOUBLE) AS total,
               MIN(ts) AS first_ts, MAX(ts) AS last_ts
        FROM events_json GROUP BY event_type
    """)


@register(
    "flinkddl_partitioned_sink",
    oracle=f"""
SELECT event_type, COUNT(*) AS cnt, {_SQL_TOTAL} AS total
FROM events GROUP BY event_type
""",
    tags=("dialect", "ddl", "sink", "partitioning"),
    doc="Partitioned filesystem sink (FileSystemTableSink.java, "
    "SupportsPartitioning): INSERT OVERWRITE into a parquet table "
    "PARTITIONED BY (event_type) — directory layout gives partition pruning "
    "on read-back; the re-read aggregate must match the source of truth.",
)
def flinkddl_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_events_sink")
    env = _env_with_events(spark, sf_dir)
    env.execute_sql(f"""
        CREATE TABLE events_sink (
            event_id BIGINT,
            user_id BIGINT,
            `value` DOUBLE,
            event_type STRING
        ) PARTITIONED BY (event_type) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        )
    """)
    env.execute_sql(
        "INSERT OVERWRITE events_sink SELECT event_id, user_id, value AS `value`, event_type FROM events"
    )
    return env.sql_query("""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(`value` AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events_sink GROUP BY event_type
    """)


@register(
    "flinksql_stream_tumble",
    oracle=f"""
SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
       COUNT(*) AS cnt, {_SQL_TOTAL} AS total
FROM events GROUP BY 1
""",
    tags=("dialect", "ddl", "streaming", "watermark"),
    doc="End-to-end Flink streaming SQL path: CREATE TABLE with a WATERMARK "
    "clause (StreamExecWatermarkAssigner.scala:45) over a file stream, then a "
    "Flink TUMBLE query on the streaming view — DDL watermark becomes "
    "withWatermark, the group window becomes a streaming window aggregate.",
)
def flinksql_stream_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_12_0_src_spark.streaming import events_stream, run_to_batch
    from flink_1_12_0_src_spark.streaming.source import _split_dir

    events_stream(spark, sf_dir)  # ensure the split files exist
    path = _split_dir(sf_dir, 4)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE events_wm (
            event_id BIGINT,
            ts TIMESTAMP(3),
            user_id BIGINT,
            event_type STRING,
            `value` DOUBLE,
            props STRING,
            WATERMARK FOR ts AS ts - INTERVAL '1' HOUR
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        )
    """)
    env.stream_table("events_wm", {"maxFilesPerTrigger": "1"}).createOrReplaceTempView(
        "events_wm_stream"
    )
    out = env.sql_query("""
        SELECT TUMBLE_START(ts, INTERVAL '1' DAY) AS window_start,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(`value` AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events_wm_stream
        GROUP BY TUMBLE(ts, INTERVAL '1' DAY)
    """)
    return run_to_batch(out, "complete")


@register(
    "flinkddl_orc_source",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderpriority
""",
    tags=("dialect", "ddl", "source", "orc"),
    doc="Flink filesystem+orc connector DDL (flink-formats/flink-orc, "
    "OrcFileFormatFactory): orders staged as ORC, registered via CREATE TABLE "
    "… WITH ('format'='orc'), aggregated. Spark's vectorized ORC reader serves "
    "the scan; the avro format has its own row (flinkddl_avro_source) via the "
    "in-repo pure-Python OCF codec.",
)
def flinkddl_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_orders_orc")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "orders").write.mode("overwrite").orc(path)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE orders_orc (
            o_orderkey BIGINT,
            o_custkey BIGINT,
            o_orderstatus STRING,
            o_totalprice DOUBLE,
            o_orderdate TIMESTAMP(3),
            o_orderpriority STRING
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'orc'
        )
    """)
    return env.sql_query("""
        SELECT o_orderpriority, COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders_orc GROUP BY o_orderpriority
    """)


@register(
    "flinkddl_avro_source",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderpriority
""",
    tags=("dialect", "ddl", "source", "avro"),
    doc="Flink filesystem+avro connector DDL (flink-formats/flink-avro, "
    "AvroFormatFactory.java): orders staged as Avro OBJECT CONTAINER FILES "
    "by the in-repo pure-Python OCF writer (sources/avro_py.py — "
    "varint/zigzag longs, length-prefixed UTF-8, sync-marked blocks, null "
    "codec; spark-avro is not bundled in this environment, so the format "
    "row previously stood as the one documented-unfixable seam), registered "
    "via CREATE TABLE ... WITH ('format'='avro'), and aggregated. The read "
    "path (table_env -> avro_py.load_avro) prefers native spark-avro when "
    "present and falls back to the Arrow-batched binaryFile+mapInPandas "
    "decoder; the decoder takes the schema from the embedded avro.schema "
    "header, not from the DDL.",
)
def flinkddl_avro_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_12_0_src_spark.sources.avro_py import write_avro_dir

    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_orders_avro")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_avro_dir(
            table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            ),
            path,
            [
                ("o_orderkey", "long"),
                ("o_orderpriority", "string"),
                ("o_totalprice", "double"),
            ],
        )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE orders_avro (
            o_orderkey BIGINT,
            o_orderpriority STRING,
            o_totalprice DOUBLE
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'avro'
        )
    """)
    return env.sql_query("""
        SELECT o_orderpriority, COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders_avro GROUP BY o_orderpriority
    """)


# varint byte length of an unsigned value, as a SQL fragment — the oracle's
# half of the Avro wire-format law (long = zigzag then little-endian base-128
# varint; all sized values here are non-negative, so zigzag(v) = 2v)
def _avro_varint_len_sql(expr: str) -> str:
    return (
        f"CASE WHEN {expr} < 128 THEN 1 WHEN {expr} < 16384 THEN 2 "
        f"WHEN {expr} < 2097152 THEN 3 WHEN {expr} < 268435456 THEN 4 "
        f"WHEN {expr} < 34359738368 THEN 5 ELSE 6 END"
    )


@register(
    "avro_record_sizes",
    oracle=f"""
WITH d AS (
  SELECT doc_id, n_chars, octet_length(encode(lang)) AS lang_bytes
  FROM documents)
SELECT doc_id,
       CAST({_avro_varint_len_sql('2 * doc_id')}
            + {_avro_varint_len_sql('2 * lang_bytes')} + lang_bytes
            + {_avro_varint_len_sql('2 * n_chars')} AS BIGINT) AS record_bytes
FROM d ORDER BY doc_id
""",
    tags=("dialect", "avro", "format"),
    doc="Avro wire-format law, cross-engine: the ACTUAL byte length of each "
    "document's binary-encoded (doc_id long, lang string, n_chars long) "
    "record — produced by sources/avro_py.encode_record inside an "
    "Arrow-batched mapInPandas — must equal the DuckDB oracle's arithmetic "
    "derivation (zigzag-varint width classes + UTF-8 length-prefix + "
    "payload). A varint off-by-one, a missed zigzag, or a length-prefix bug "
    "shifts every affected row; the sizing law is also what a capacity "
    "planner uses to budget Avro ingest without encoding anything.",
)
def avro_record_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from flink_1_12_0_src_spark.sources.avro_py import encode_record

    fields = [("doc_id", "long"), ("lang", "string"), ("n_chars", "long")]
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def _sizes(batches):
        for pdf in batches:
            sizes = [
                len(encode_record(fields, t))
                for t in pdf[["doc_id", "lang", "n_chars"]].itertuples(
                    index=False, name=None
                )
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "record_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return docs.mapInPandas(_sizes, "doc_id bigint, record_bytes bigint").orderBy(
        "doc_id"
    )


@register(
    "avro_nullable_roundtrip",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang_opt,
         CASE WHEN doc_id % 13 = 0 THEN NULL ELSE n_chars END AS n_opt,
         CASE WHEN doc_id % 5 = 0 THEN NULL
              ELSE n_chars * CAST(1.5 AS DOUBLE) END AS score,
         CASE WHEN doc_id % 11 = 0 THEN NULL ELSE doc_id % 3 = 0 END AS flag,
         octet_length(encode(lang)) AS lang_bytes,
         n_chars
  FROM documents)
SELECT doc_id, lang_opt, n_opt, score, flag,
       CAST({_avro_varint_len_sql('2 * doc_id')}
            + 1 + CASE WHEN doc_id % 7 = 0 THEN 0
                       ELSE {_avro_varint_len_sql('2 * lang_bytes')} + lang_bytes END
            + 1 + CASE WHEN doc_id % 13 = 0 THEN 0
                       ELSE {_avro_varint_len_sql('2 * n_chars')} END
            + 1 + CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 8 END
            + 1 + CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 1 END
       AS BIGINT) AS record_bytes
FROM d ORDER BY doc_id
""",
    tags=("dialect", "avro", "format"),
    doc="Nullable-union Avro round trip (round 14, verdict task #4 — the "
    "dominant real-world schema shape): four ['null', T] union columns "
    "(string/long/double/boolean) with id-derived NULL patterns are staged "
    "through the pure-Python OCF writer (branch-index long before each "
    "value, per spec), read back via the binaryFile+mapInPandas decoder "
    "(NULL-capable pandas extension dtypes), and each ROUND-TRIPPED row is "
    "re-encoded to its wire size. The oracle re-derives both the values "
    "and the size law arithmetically — one union-index byte per nullable "
    "field, plus the branch payload only when non-NULL — so a missed "
    "branch byte, a wrong branch index, or a null-vs-default confusion "
    "shifts the affected rows. Reference analog: flink-formats/flink-avro "
    "AvroRowDataDeserializationSchema's nullable-field handling.",
)
def avro_nullable_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from flink_1_12_0_src_spark.sources.avro_py import (
        encode_record,
        read_avro_dir,
        write_avro_dir,
    )

    fields = [
        ("doc_id", "long"),
        ("lang_opt", "?string"),
        ("n_opt", "?long"),
        ("score", "?double"),
        ("flag", "?boolean"),
    ]
    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_docs_avro_nullable")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        src = table(spark, sf_dir, "documents").selectExpr(
            "doc_id",
            "CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang_opt",
            "CASE WHEN doc_id % 13 = 0 THEN NULL ELSE n_chars END AS n_opt",
            "CASE WHEN doc_id % 5 = 0 THEN NULL "
            "ELSE n_chars * CAST(1.5 AS DOUBLE) END AS score",
            "CASE WHEN doc_id % 11 = 0 THEN NULL ELSE doc_id % 3 = 0 END AS flag",
        )
        write_avro_dir(src, path, fields)

    back = read_avro_dir(spark, path)

    def _sizes(batches):
        for pdf in batches:
            cols = [n for n, _ in fields]
            sizes = [
                len(encode_record(fields, t))
                for t in pdf[cols].itertuples(index=False, name=None)
            ]
            out = pdf[cols].copy()
            out["record_bytes"] = pd.Series(sizes, dtype="int64")
            yield out

    return back.mapInPandas(
        _sizes,
        "doc_id bigint, lang_opt string, n_opt bigint, score double, "
        "flag boolean, record_bytes bigint",
    ).orderBy("doc_id")


@register(
    "partition_pruned_read",
    oracle=f"""
SELECT user_id, COUNT(*) AS cnt, {_SQL_TOTAL} AS total
FROM events WHERE event_type = 'click'
GROUP BY user_id ORDER BY user_id
""",
    tags=("dialect", "source", "partitioning", "pruning"),
    doc="Partition pruning on read (SupportsPartitionPushDown — "
    "…/connector/source/abilities/; PushPartitionIntoTableSourceScanRule): a "
    "hive-layout partitioned table filtered on the partition column scans ONE "
    "directory, not the table — PartitionFilters asserted in "
    "tests/test_plans.py. The access-path primitive that makes 100 TB "
    "time-series scans proportional to the slice read.",
)
def partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_events_partitioned")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(path)
    ev = spark.read.parquet(path).filter(F.col("event_type") == "click")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .orderBy("user_id")
    )


@register(
    "flinksql_match_recognize",
    oracle="""
WITH o AS (SELECT user_id, ts, event_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
e AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM o WHERE event_type = 'error'),
isl AS (SELECT user_id, grp, COUNT(*) AS k, MIN(rn) AS start_rn FROM e GROUP BY user_id, grp),
chunks AS (
  SELECT user_id, start_rn, k,
         unnest(generate_series(1, CAST(k // 4 + CASE WHEN k % 4 >= 2 THEN 1 ELSE 0 END AS BIGINT))) AS ci
  FROM isl WHERE k >= 2
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY start_rn, ci) - 1 AS INTEGER) AS match_seq,
       CAST(CASE WHEN ci <= k // 4 THEN 4 ELSE k % 4 END AS BIGINT) AS n_errors
FROM chunks
ORDER BY user_id, match_seq
""",
    tags=("dialect", "cep", "sql"),
    doc="MATCH_RECOGNIZE SQL front-end (FlinkSqlOperatorTable MATCH_RECOGNIZE "
    "operators → StreamExecMatch.scala:68): the clause text — PARTITION BY / "
    "ORDER BY / MEASURES / PATTERN (E{2,4}) / DEFINE — is parsed by "
    "plans/matchrec.py and compiled onto the CEP NFA. Same semantics and "
    "oracle as cep_times_range_burst, reached through the SQL surface.",
)
def flinksql_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_12_0_src_spark.operators.cep import match_recognize
    from flink_1_12_0_src_spark.plans.matchrec import parse_match_recognize

    kwargs = parse_match_recognize(
        """
        MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES COUNT(E.event_id) AS n_errors
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (E{2,4})
          DEFINE E AS E.event_type = 'error'
        )
        """
    )
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type", "event_id")
    return match_recognize(
        ev,
        output_schema="user_id bigint, match_seq int, n_errors bigint",
        time_col="ts",
        **kwargs,
    ).orderBy("user_id", "match_seq")


# Shared run-length CTE prefix for the V-shape MATCH_RECOGNIZE oracles:
# dir ∈ {-1,0,1} vs the previous row, maximal descent/ascent runs, and the
# adjacent (descent, ascent) pairs — the lag-window encoding of the NFA's
# greedy DOWN+/UP+ bindings.
_VSHAPE_RUNS_SQL = """
WITH o AS (SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS v,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
d AS (SELECT *, CASE WHEN v < lag(v) OVER (PARTITION BY user_id ORDER BY rn) THEN -1
                     WHEN v > lag(v) OVER (PARTITION BY user_id ORDER BY rn) THEN 1
                     ELSE 0 END AS dir
      FROM o),
r AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id, dir ORDER BY rn) AS rgrp FROM d),
dr AS (SELECT user_id, rgrp, MIN(rn) AS ds, MAX(rn) AS de, COUNT(*) AS dk
       FROM r WHERE dir = -1 GROUP BY 1, 2),
ur AS (SELECT user_id, rgrp, MIN(rn) AS us, MAX(rn) AS ue, COUNT(*) AS uk
       FROM r WHERE dir = 1 GROUP BY 1, 2),
vpair AS (SELECT d.user_id, d.ds, d.de, d.dk, u.us, u.ue, u.uk
          FROM dr d JOIN ur u ON u.user_id = d.user_id AND u.us = d.de + 1)
"""

_VSHAPE_CLAUSE = """
        MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(STRT.v) AS strt_v, COUNT(DOWN.v) AS down_cnt,
                   LAST(DOWN.v) AS trough_v, COUNT(UP.v) AS up_cnt,
                   LAST(UP.v) AS peak_v
          AFTER MATCH SKIP {skip}
          PATTERN (STRT DOWN+ UP+)
          DEFINE DOWN AS DOWN.v < PREV(DOWN.v), UP AS UP.v > PREV(UP.v)
        )
"""

_VSHAPE_SCHEMA = (
    "user_id bigint, match_seq int, strt_v double, down_cnt bigint, "
    "trough_v double, up_cnt bigint, peak_v double"
)


def _vshape(spark: SparkSession, sf_dir: str, skip: str) -> DataFrame:
    from flink_1_12_0_src_spark.operators.cep import match_recognize
    from flink_1_12_0_src_spark.plans.matchrec import parse_match_recognize

    kwargs = parse_match_recognize(_VSHAPE_CLAUSE.format(skip=skip))
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("value").cast("double").alias("v")
    )
    return match_recognize(
        ev, output_schema=_VSHAPE_SCHEMA, time_col="ts", **kwargs
    ).orderBy("user_id", "match_seq")


@register(
    "flinksql_match_prev_vshape",
    oracle=_VSHAPE_RUNS_SQL
    + """,
starts AS (SELECT user_id, de, ue, uk, unnest(generate_series(ds - 1, de - 1)) AS s
           FROM vpair)
SELECT m.user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY m.user_id ORDER BY m.s) - 1 AS INTEGER) AS match_seq,
       sv.v AS strt_v, CAST(m.de - m.s AS BIGINT) AS down_cnt, tv.v AS trough_v,
       CAST(m.uk AS BIGINT) AS up_cnt, pv.v AS peak_v
FROM starts m
JOIN o sv ON sv.user_id = m.user_id AND sv.rn = m.s
JOIN o tv ON tv.user_id = m.user_id AND tv.rn = m.de
JOIN o pv ON pv.user_id = m.user_id AND pv.rn = m.ue
ORDER BY m.user_id, match_seq
""",
    tags=("dialect", "cep", "sql", "prev_navigation"),
    doc="MATCH_RECOGNIZE DEFINE with PREV navigation — the price-goes-down "
    "idiom (MatchRecognizeITCase.scala:122-133; SQL:2016 row-pattern PREV): "
    "PATTERN (STRT DOWN+ UP+) with DOWN.v < PREV(DOWN.v) / UP.v > "
    "PREV(UP.v) finds every V-shape in each user's value series. PREV is a "
    "physical row offset, so the predicate compiles to a vectorized shift "
    "comparison (plans/matchrec.py). AFTER MATCH SKIP TO NEXT ROW ⇒ every "
    "start position yields its own (suffix-descent) match — overlap "
    "semantics the lag-window oracle reproduces with run-length encoding "
    "plus a per-start unnest. Closes the round-3 'What's missing #1' gap.",
)
def flinksql_match_prev_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _vshape(spark, sf_dir, "TO NEXT ROW")


@register(
    "flinksql_match_skip_to_last",
    oracle=_VSHAPE_RUNS_SQL
    + """
SELECT p.user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY p.user_id ORDER BY p.ds) - 1 AS INTEGER) AS match_seq,
       sv.v AS strt_v, CAST(p.dk AS BIGINT) AS down_cnt, tv.v AS trough_v,
       CAST(p.uk AS BIGINT) AS up_cnt, pv.v AS peak_v
FROM vpair p
JOIN o sv ON sv.user_id = p.user_id AND sv.rn = p.ds - 1
JOIN o tv ON tv.user_id = p.user_id AND tv.rn = p.de
JOIN o pv ON pv.user_id = p.user_id AND pv.rn = p.ue
ORDER BY p.user_id, match_seq
""",
    tags=("dialect", "cep", "sql", "after_match_skip"),
    doc="AFTER MATCH SKIP TO LAST <var> (AfterMatchSkipStrategy.java:46,56): "
    "the V-shape pattern resuming AT the last UP row, so consecutive Vs "
    "chain through shared peaks — exactly one match per adjacent "
    "(descent, ascent) run pair, each binding the FULL descent (unlike the "
    "TO NEXT ROW variant's suffix matches). The oracle is the run-pair "
    "encoding with no unnest; equivalence of the resume semantics is also "
    "property-tested against a reference scan in tests/test_property_cep.py. "
    "Closes the round-3 'What's missing #2' gap.",
)
def flinksql_match_skip_to_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _vshape(spark, sf_dir, "TO LAST UP")


@register(
    "flinkddl_computed_col",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       UPPER(n_name) AS name_upper,
       CAST(n_nationkey * 2 + n_regionkey AS BIGINT) AS key_mix
FROM nation ORDER BY n_nationkey
""",
    tags=("dialect", "ddl", "computed_column"),
    doc="Computed columns in CREATE TABLE (SqlCreateTable.java computed-column "
    "list, flink-sql-parser/.../ddl/): 'col AS expr' fields parse into "
    "read-time generated columns appended to the scan — the DDL's "
    "UPPER(n_name) and arithmetic mix are evaluated by Catalyst, never "
    "stored. Round-1 gap (VERDICT §2.11), now first-class.",
)
def flinkddl_computed_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _nation_csv(spark, sf_dir)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE nation_cc (
            {_NATION_COLS_DDL},
            name_upper AS UPPER(n_name),
            key_mix AS n_nationkey * 2 + n_regionkey
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'csv',
            'csv.field-delimiter' = '|'
        )
    """)
    return env.sql_query(
        "SELECT n_nationkey, name_upper, key_mix FROM nation_cc ORDER BY n_nationkey"
    )


@register(
    "flinkddl_alter",
    oracle="""
SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, COUNT(*) AS cnt,
       MIN(n_name) AS first_name
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
""",
    tags=("dialect", "ddl", "alter"),
    doc="ALTER TABLE (SqlAlterTableRename / SqlAlterTableOptions — "
    "flink-sql-parser/.../ddl/SqlAlterTable.java): the catalog entry is "
    "renamed (old view dropped, new registered) and its connector options "
    "merged via SET, then the renamed table is queried. Round-1 gap "
    "(VERDICT §2.11), now first-class.",
)
def flinkddl_alter(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _nation_csv(spark, sf_dir)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE nation_pre_alter (
            {_NATION_COLS_DDL}
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'csv',
            'csv.field-delimiter' = ','
        )
    """)
    # fix the delimiter via ALTER … SET (csv staged as '|'), then rename
    env.execute_sql("ALTER TABLE nation_pre_alter SET ('csv.field-delimiter' = '|')")
    env.execute_sql("ALTER TABLE nation_pre_alter RENAME TO nation_renamed")
    return env.sql_query("""
        SELECT n_regionkey, COUNT(*) AS cnt, MIN(n_name) AS first_name
        FROM nation_renamed GROUP BY n_regionkey ORDER BY n_regionkey
    """)


@register(
    "flinkddl_create_function",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS band,
       string_split(o_orderpriority, '-')[2] AS prio_word,
       COUNT(*) AS cnt
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
""",
    tags=("dialect", "ddl", "function"),
    doc="CREATE FUNCTION (SqlCreateFunction.java; ScalarFunction.java:94): "
    "two registration paths — price_band, a plain Python callable registered "
    "as a UDF (the PyFlink general-udf analog), and split_idx, a "
    "SQL_FUNCTION spec lowered to a Spark SQL scalar function "
    "(CREATE FUNCTION … RETURNS … RETURN expr, fully JVM-side; SPLIT_INDEX "
    "parity, SqlFunctionUtils.java). Round-1 gap (VERDICT §2.11).",
)
def flinkddl_create_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    env = TableEnvironment(spark)
    env.execute_sql(
        "CREATE TEMPORARY FUNCTION price_band AS "
        "'flink_1_12_0_src_spark.functions.scalar.price_band'"
    )
    env.execute_sql(
        "CREATE TEMPORARY FUNCTION split_idx AS "
        "'flink_1_12_0_src_spark.functions.scalar.split_index_sql'"
    )
    return env.sql_query("""
        SELECT price_band(o_totalprice) AS band,
               split_idx(o_orderpriority, '-', 1) AS prio_word,
               COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """)


@register(
    "flinkddl_show_functions",
    oracle="""
SELECT fn FROM (VALUES ('zz_price_band'), ('zz_split_idx')) AS t(fn) ORDER BY fn
""",
    tags=("dialect", "ddl", "introspection"),
    doc="SHOW FUNCTIONS round trip (SqlShowFunctions → "
    "TableEnvironmentImpl.listFunctions): CREATE FUNCTION makes the names "
    "visible in the listing — asserted by filtering the listing to the "
    "names this query registers (the full listing is Spark's "
    "version-dependent builtin set, so only the registered names are "
    "oracled).",
)
def flinkddl_show_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = TableEnvironment(spark)
    env.execute_sql(
        "CREATE TEMPORARY FUNCTION zz_price_band AS "
        "'flink_1_12_0_src_spark.functions.scalar.price_band'"
    )
    env.execute_sql(
        "CREATE TEMPORARY FUNCTION zz_split_idx AS "
        "'flink_1_12_0_src_spark.functions.scalar.split_index_sql'"
    )
    fns = env.execute_sql("SHOW FUNCTIONS")
    return (
        fns.filter(F.col("function_name").startswith("zz_"))
        .select(F.col("function_name").alias("fn"))
        .orderBy("fn")
    )


@register(
    "flinkddl_describe",
    oracle="""
SELECT * FROM (VALUES
  ('n_nationkey', 'bigint', true),
  ('n_name',      'string', true),
  ('n_regionkey', 'bigint', true),
  ('n_comment',   'string', true),
  ('name_upper',  'string', true),
  ('key_mix',     'bigint', true)
) AS t(col_name, data_type, nullable)
""",
    tags=("dialect", "ddl", "introspection"),
    doc="DESCRIBE round trip (SqlRichDescribeTable → "
    "TableEnvironmentImpl.describe): a CREATE TABLE with computed columns "
    "DESCRIBEs to its declared schema INCLUDING the generated columns — the "
    "REPL's schema surface, previously exercised only by the CLI test.",
)
def flinkddl_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _nation_csv(spark, sf_dir)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE nation_desc (
            {_NATION_COLS_DDL},
            name_upper AS UPPER(n_name),
            key_mix AS n_nationkey * 2 + n_regionkey
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'csv'
        )
    """)
    return env.execute_sql("DESCRIBE nation_desc")


@register(
    "tableapi_fluent_agg",
    oracle="""
SELECT c_mktsegment,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
       COUNT(*) AS cnt
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 100000
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    tags=("dialect", "table_api"),
    doc="Fluent Table API pipeline (SURVEY §3.2 — Table.java:129 filter/"
    "join/groupBy/select with the expression DSL, e.g. 'price.sum AS "
    "total'): the facade (table_api.py) assembles the same DataFrame plan a "
    "QueryOperation tree would hand PlannerBase.translate; Catalyst is the "
    "planner. Money sums run in DECIMAL and surface as DOUBLE per the repo "
    "float discipline.",
)
def tableapi_fluent_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    env = TableEnvironment(spark)
    t = (
        env.from_path("orders")
        .filter("o_totalprice > 100000")
        .add_columns("CAST(o_totalprice AS DECIMAL(12,2)) AS price_dec")
        .join(env.from_path("customer"), "o_custkey = c_custkey")
        .group_by("c_mktsegment")
        .select("c_mktsegment, price_dec.sum AS total, o_orderkey.count AS cnt")
        .select("c_mktsegment, CAST(total AS DOUBLE) AS total, cnt")
        .order_by("c_mktsegment")
    )
    return t.to_df()


@register(
    "tableapi_setops_projection",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
WHERE n_regionkey <= 1 OR n_regionkey >= 3
ORDER BY n_nationkey LIMIT 20
""",
    tags=("dialect", "table_api", "setop"),
    doc="Table API projection + set ops + ordering (Table.java select/"
    "filter/unionAll/distinct/orderBy/fetch): two filtered projections of "
    "nation unioned, deduplicated, ordered, limited — the DataSet-style "
    "fluent surface on the same facade.",
)
def tableapi_setops_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    env = TableEnvironment(spark)
    proj = "n_nationkey, n_name, n_regionkey"
    a = env.from_path("nation").select(proj).filter("n_regionkey <= 1")
    b = env.from_path("nation").select(proj).filter("n_regionkey >= 3")
    t = a.union_all(b).distinct().order_by("n_nationkey").fetch(20)
    return t.to_df()


@register(
    "flinkddl_stream_computed_watermark",
    oracle=f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       COUNT(*) AS cnt, {_SQL_TOTAL} AS total
FROM events GROUP BY 1 ORDER BY 1
""",
    tags=("dialect", "ddl", "streaming", "watermark", "computed_column"),
    doc="Computed ROWTIME column on a streaming table (SqlCreateTable "
    "computed columns + WATERMARK — the canonical Flink pattern for sources "
    "that store epoch numbers): the staged files carry only ts_us BIGINT; "
    "the DDL computes ts AS timestamp_micros(ts_us) and declares the "
    "watermark ON THE COMPUTED column, which stream_table applies before "
    "withWatermark. A Flink TUMBLE query then runs on the streaming view.",
)
def flinkddl_stream_computed_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_12_0_src_spark.streaming import run_to_batch

    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_events_us")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            table(spark, sf_dir, "events")
            .select(
                "event_id",
                F.unix_micros(F.col("ts")).alias("ts_us"),
                "user_id",
                "value",
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE events_us (
            event_id BIGINT,
            ts_us BIGINT,
            user_id BIGINT,
            `value` DOUBLE,
            ts AS timestamp_micros(ts_us),
            WATERMARK FOR ts AS ts - INTERVAL '1' HOUR
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        )
    """)
    env.stream_table("events_us", {"maxFilesPerTrigger": "1"}).createOrReplaceTempView(
        "events_us_stream"
    )
    out = env.sql_query("""
        SELECT TUMBLE_START(ts, INTERVAL '1' DAY) AS window_start,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(`value` AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events_us_stream
        GROUP BY TUMBLE(ts, INTERVAL '1' DAY)
    """)
    return run_to_batch(out, "complete").orderBy("window_start")


@register(
    "flinksql_match_agg_define",
    oracle="""
WITH RECURSIVE o AS (
  SELECT user_id, ts, event_id,
         CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
led AS (
  SELECT user_id, rn, cents AS c1,
         LEAD(cents, 1) OVER (PARTITION BY user_id ORDER BY rn) AS c2,
         LEAD(cents, 2) OVER (PARTITION BY user_id ORDER BY rn) AS c3,
         LEAD(cents, 3) OVER (PARTITION BY user_id ORDER BY rn) AS c4
  FROM o),
runs AS (
  SELECT user_id, rn AS s, c1, c2, c3, c4,
         CASE WHEN c1 >= 5000 THEN 0
              WHEN c2 IS NULL OR c1 + c2 >= 10000 THEN 1
              WHEN c3 IS NULL OR c1 + c2 + c3 >= 15000 THEN 2
              ELSE 3 END AS maxrun
  FROM led),
cand AS (
  SELECT user_id, s, c1, c2, c3, c4,
         CASE WHEN maxrun = 0 THEN NULL
              WHEN maxrun >= 3 AND c4 IS NOT NULL AND c4 >= 5000 THEN 3
              WHEN maxrun >= 2 AND c3 IS NOT NULL AND c3 >= 5000 THEN 2
              WHEN maxrun >= 1 AND c2 IS NOT NULL AND c2 >= 5000 THEN 1
              ELSE NULL END AS l
  FROM runs),
sel(user_id, s, l) AS (
  SELECT user_id, s, l FROM (
    SELECT user_id, s, l, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY s) AS rk
    FROM cand WHERE l IS NOT NULL) WHERE rk = 1
  UNION ALL
  SELECT nxt.user_id, nxt.s, nxt.l FROM sel
  JOIN LATERAL (SELECT user_id, s, l FROM cand c
                WHERE c.user_id = sel.user_id AND c.l IS NOT NULL
                  AND c.s > sel.s + sel.l
                ORDER BY s LIMIT 1) nxt ON true)
SELECT sel.user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY sel.user_id ORDER BY sel.s) - 1
            AS INTEGER) AS match_seq,
       CAST(sel.l AS BIGINT) AS n_a,
       CAST(c.c1 + CASE WHEN sel.l >= 2 THEN c.c2 ELSE 0 END
                 + CASE WHEN sel.l >= 3 THEN c.c3 ELSE 0 END AS BIGINT) AS sum_a,
       (c.c1 + CASE WHEN sel.l >= 2 THEN c.c2 ELSE 0 END
             + CASE WHEN sel.l >= 3 THEN c.c3 ELSE 0 END) / sel.l AS avg_a,
       CAST(CASE sel.l WHEN 1 THEN c.c2 WHEN 2 THEN c.c3 ELSE c.c4 END
            AS BIGINT) AS b_cents,
       ob.ts AS match_ts,
       'B' AS last_var,
       CAST(CASE sel.l WHEN 2 THEN c.c1 WHEN 3 THEN c.c2 ELSE NULL END
            AS BIGINT) AS a_prev_cents
FROM sel JOIN cand c ON c.user_id = sel.user_id AND c.s = sel.s
JOIN o ob ON ob.user_id = sel.user_id AND ob.rn = sel.s + sel.l
ORDER BY sel.user_id, match_seq
""",
    tags=("dialect", "cep", "sql", "agg_define"),
    doc="MATCH_RECOGNIZE DEFINE with a RUNNING AGGREGATE "
    "(MatchRecognizeITCase testAggregates; SQL:2016 running semantics): "
    "PATTERN (A{1,3} B) with A AS AVG(A.cents) < 5000 — every row appended "
    "to A must keep the running average under the bound (checked per append "
    "in the NFA via Pattern.where_running), B is the >= 5000 spike; greedy "
    "backtracking picks the longest A-run whose NEXT row matches B, SKIP "
    "PAST LAST ROW. MEASURES exercises COUNT/SUM/AVG/LAST. Oracle: prefix "
    "sums bound the run via LEAD windows; match selection is the same "
    "recursive jump-CTE as the delta trigger; exact cents keep every "
    "comparison integer.",
)
def flinksql_match_agg_define(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_12_0_src_spark.operators.cep import match_recognize
    from flink_1_12_0_src_spark.plans.matchrec import parse_match_recognize

    kwargs = parse_match_recognize(
        """
        MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES COUNT(A.cents) AS n_a, SUM(A.cents) AS sum_a,
                   AVG(A.cents) AS avg_a, LAST(B.cents) AS b_cents,
                   MATCH_ROWTIME() AS match_ts, CLASSIFIER() AS last_var,
                   LAST(A.cents, 1) AS a_prev_cents
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A{1,3} B)
          DEFINE A AS AVG(A.cents) < 5000, B AS B.cents >= 5000
        )
        """
    )
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value").cast("double") * 100).cast("bigint").alias("cents"),
    )
    return match_recognize(
        ev,
        output_schema=(
            "user_id bigint, match_seq int, n_a bigint, sum_a bigint, "
            "avg_a double, b_cents bigint, match_ts timestamp, last_var string, "
            "a_prev_cents bigint"
        ),
        time_col="ts",
        **kwargs,
    ).orderBy("user_id", "match_seq")


@register(
    "tableapi_temporal_fn_join",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
       CAST(c.value AS DOUBLE) AS rate
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
ORDER BY purchase_id
""",
    tags=("dialect", "table_api", "temporal", "join"),
    doc="Temporal TABLE FUNCTION join (Table.createTemporalTableFunction, "
    "flink-table-api-java/.../Table.java + TemporalTableFunctionImpl.java — "
    "the classic Rates(o_rowtime) idiom): a click-stream 'rate' history is "
    "registered as a temporal function versioned by ts per user_id, and "
    "each purchase laterally joins the version valid at its own rowtime. "
    "Lowered to the union + one-window-pass as-of join — no per-row "
    "lookups; oracle is DuckDB's native ASOF JOIN.",
)
def tableapi_temporal_fn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    env = TableEnvironment(spark)
    env.create_temporal_table_function(
        "rates",
        ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("value").cast("double").alias("rate")
        ),
        time_attr="ts",
        primary_key="user_id",
    )
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    return (
        env.join_lateral_temporal(probe, "rates", probe_time="p_ts")
        .select("purchase_id", "user_id", "p_ts", "rate")
        .orderBy("purchase_id")
    )


@register(
    "tableapi_tumble_window",
    oracle="""
SELECT event_type,
       time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
       COUNT(event_id) AS cnt
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
""",
    tags=("dialect", "table_api", "window"),
    doc="Table API group window (Tumble.java:42 + GroupWindowedTable.java: "
    "window(Tumble.over('1.hours').on('ts').alias('w')).group_by('w, "
    "event_type').select('…, w.start, vdec.sum')): the fluent facade lowers "
    "the window alias to Spark's window() struct and w.start/w.end to field "
    "accesses on the group key. Money sums in DECIMAL, surfaced as DOUBLE.",
)
def tableapi_tumble_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_12_0_src_spark.table_api import Tumble, from_dataframe

    ev = table(spark, sf_dir, "events")
    return (
        from_dataframe(ev)
        .add_columns("CAST(value AS DECIMAL(18,6)) AS vdec")
        .window(Tumble.over("1.hours").on("ts").alias("w"))
        .group_by("w, event_type")
        .select("event_type, w.start AS window_start, vdec.sum AS total, event_id.count AS cnt")
        .select("event_type, window_start, CAST(total AS DOUBLE) AS total, cnt")
        .order_by("window_start, event_type")
        .to_df()
    )


@register(
    "tableapi_over_window",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
FROM events ORDER BY event_id
""",
    tags=("dialect", "table_api", "over"),
    doc="Table API OVER window (Over.java:45 + OverWindowedTable.java: "
    "window(Over.partition_by('user_id').order_by('ts')"
    ".preceding('unbounded_range').alias('ow')).select('…, vdec.sum over "
    "ow')): RANGE UNBOUNDED PRECEDING is Spark's default ordered frame, so "
    "the facade emits a plain Window spec — peer rows (ts ties) aggregate "
    "together on both engines. DECIMAL accumulation, DOUBLE surface.",
)
def tableapi_over_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_12_0_src_spark.table_api import Over, from_dataframe

    ev = table(spark, sf_dir, "events")
    return (
        from_dataframe(ev)
        .add_columns("CAST(value AS DECIMAL(18,6)) AS vdec")
        .window(
            Over.partition_by("user_id").order_by("ts").preceding("unbounded_range").alias("ow")
        )
        .select("event_id, user_id, vdec.sum over ow AS rs")
        .select("event_id, user_id, CAST(rs AS DOUBLE) AS run_sum")
        .order_by("event_id")
        .to_df()
    )


@register(
    "datastream_keyby_window_sum",
    oracle="""
SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM events WHERE event_type <> 'heartbeat'
GROUP BY 1, 2 ORDER BY window_start, event_type
""",
    tags=("dialect", "datastream", "window"),
    doc="DataStream API program (datastream.py facade — DataStream.java "
    "filter:638/map:588/keyBy:292 + WindowedStream.aggregate:661 with "
    "TumblingEventTimeWindows.of): env.from_dataframe(events).filter(…)"
    ".map(…).key_by('event_type').window(Tumbling…).aggregate(sum) — the "
    "FLIP-134 batch execution of the canonical keyed-window stream program; "
    "every step lowers to a DataFrame op, DECIMAL money sums.",
)
def datastream_keyby_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_12_0_src_spark.datastream import (
        StreamExecutionEnvironment,
        TumblingEventTimeWindows,
    )

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ds = (
        env.from_dataframe(table(spark, sf_dir, "events"))
        .filter("event_type <> 'heartbeat'")
        .map({"ts": "ts", "event_type": "event_type", "vdec": "CAST(value AS DECIMAL(18,6))"})
        .key_by("event_type")
        .window(TumblingEventTimeWindows.of("1 hour").on("ts"))
        .aggregate({"total": F.sum("vdec")})
        .map({
            "window_start": "window_start",
            "event_type": "event_type",
            "total": "CAST(total AS DOUBLE)",
        })
    )
    return ds.to_df().orderBy("window_start", "event_type")


@register(
    "datastream_maxby_flatmap",
    oracle="""
WITH mx AS (
  SELECT * FROM (
    SELECT user_id, event_id, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY value DESC, event_id) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT user_id, event_id, value, unnest(string_split(event_type, '_')) AS part
FROM mx ORDER BY user_id, part
""",
    tags=("dialect", "datastream"),
    doc="DataStream keyed maxBy + flatMap (KeyedStream.maxBy:865 — the whole "
    "row holding each key's maximum, first-element tie-break made "
    "deterministic on event_id — then DataStream.flatMap:613 as an "
    "explode): key_by('user_id').max_by('value').flat_map(split(…)).",
)
def datastream_maxby_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_12_0_src_spark.datastream import StreamExecutionEnvironment

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ds = (
        env.from_dataframe(table(spark, sf_dir, "events"))
        .key_by("user_id")
        .max_by("value", "event_id")
        .flat_map("split(event_type, '_')", "part", keep=["user_id", "event_id", "value"])
        .project("user_id", "event_id", "value", "part")
    )
    return ds.to_df().orderBy("user_id", "part")


@register(
    "flinkddl_create_table_like",
    oracle=f"""
SELECT event_type, COUNT(*) AS cnt, {_SQL_TOTAL} AS total,
       COUNT(CASE WHEN value > 100 THEN 1 END) AS big_cnt
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("dialect", "ddl", "like"),
    doc="CREATE TABLE … LIKE (FLIP-110; SqlTableLike.java:90, merge rules "
    "MergeTableLikeUtil.java:72-80): the derived table inherits the base's "
    "columns + connector options (OPTIONS overwrites by default — the "
    "derived WITH clause swaps only the path-independent knobs) and adds a "
    "computed column; querying the derived table proves the merged schema, "
    "options and generated column all round-trip.",
)
def flinkddl_create_table_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _staged_events_json(spark, sf_dir)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE events_like_base (
            event_id BIGINT,
            ts TIMESTAMP(3),
            user_id BIGINT,
            event_type STRING,
            `value` DOUBLE,
            props STRING
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'json'
        )
    """)
    env.execute_sql("""
        CREATE TABLE events_like_derived (
            is_big AS `value` > 100
        ) WITH (
            'connector' = 'filesystem'
        ) LIKE events_like_base (INCLUDING GENERATED)
    """)
    return env.sql_query("""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(`value` AS DECIMAL(12,2))) AS DOUBLE) AS total,
               COUNT(CASE WHEN is_big THEN 1 END) AS big_cnt
        FROM events_like_derived GROUP BY event_type ORDER BY event_type
    """)


@register(
    "flinkddl_options_hint",
    oracle="""
SELECT r.r_name, COUNT(*) AS n_nations, CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
    tags=("dialect", "ddl", "source", "csv", "hints"),
    doc="FLIP-113 dynamic table options (flink-table-planner-blink "
    ".../hint/FlinkHints.java HINT_NAME_OPTIONS; CatalogSourceTable's "
    "dynamic-options merge): nation is staged as ';'-delimited CSV but the "
    "DDL declares '|' — an unhinted read mis-parses every row into one "
    "column. The query's /*+ OPTIONS('csv.field-delimiter'=';') */ hint "
    "overrides the delimiter FOR THIS QUERY ONLY (the catalog entry and its "
    "view keep the DDL options), proving per-query option merge semantics.",
)
def flinkddl_options_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_nation_csv_semi")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "nation").coalesce(1).write.mode("overwrite").option(
            "sep", ";"
        ).csv(path)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE nation_semi (
            {_NATION_COLS_DDL}
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'csv',
            'csv.field-delimiter' = '|'
        )
    """)
    # sanity: the UNHINTED read uses the DDL delimiter and mis-parses —
    # every ';'-joined line lands in column 1, so all keys are NULL
    assert env.sql_query(
        "SELECT COUNT(n_regionkey) AS k FROM nation_semi"
    ).first()["k"] == 0
    table(spark, sf_dir, "region").createOrReplaceTempView("region")
    return env.sql_query("""
        SELECT r.r_name, COUNT(*) AS n_nations, CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
        FROM nation_semi /*+ OPTIONS('csv.field-delimiter'=';') */ n
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """)


@register(
    "flinksql_system_time_join",
    oracle="""
WITH f AS (SELECT * FROM events WHERE event_type = 'purchase'),
d AS (SELECT * FROM events WHERE event_type = 'signup'),
j AS (
  SELECT f.event_id, f.user_id, f.ts, d.ts AS version_ts,
         CAST(d.value AS DOUBLE) AS setting,
         row_number() OVER (PARTITION BY f.event_id ORDER BY d.ts DESC) AS rn
  FROM f JOIN d ON f.user_id = d.user_id AND d.ts <= f.ts
)
SELECT event_id, user_id, ts, version_ts, setting
FROM j WHERE rn = 1 ORDER BY event_id
""",
    tags=("dialect", "join", "temporal", "sql"),
    doc="FLIP-132 event-time temporal join SQL, new syntax in Flink 1.12 "
    "(JOIN dim FOR SYSTEM_TIME AS OF f.rowtime; StreamExecTemporalJoinRule / "
    "TemporalRowTimeJoinOperator.java): each purchase joins the signup "
    "version current at its event time. The dim is a catalog table whose "
    "DDL declares the WATERMARK (version/rowtime) column — Flink's own "
    "precondition — and the clause lowers to a LATERAL greatest-version "
    "subquery (per-fact top-1, no full history join survives the plan).",
)
def flinksql_system_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_signup_dim_parquet")
    ev = table(spark, sf_dir, "events")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # version table = the signup events (the reference keys versions by
        # the join key; condition-after-selection semantics are pinned by
        # tests/test_dialect.py::test_system_time_condition_after_selection)
        ev.filter(F.col("event_type") == "signup").write.mode("overwrite").parquet(path)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE events_dim (
            event_id BIGINT,
            ts TIMESTAMP(3),
            user_id BIGINT,
            event_type STRING,
            `value` DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        )
    """)
    ev.filter(F.col("event_type") == "purchase").createOrReplaceTempView("purchases")
    return env.sql_query("""
        SELECT f.event_id, f.user_id, f.ts, d.ts AS version_ts,
               CAST(d.`value` AS DOUBLE) AS setting
        FROM purchases f
        JOIN events_dim FOR SYSTEM_TIME AS OF f.ts AS d
          ON f.user_id = d.user_id
        ORDER BY f.event_id
    """)


@register(
    "flinkddl_metadata_columns",
    oracle=f"""
SELECT event_type AS etype, COUNT(*) AS cnt, {_SQL_TOTAL} AS total
FROM events GROUP BY event_type ORDER BY etype
""",
    tags=("dialect", "ddl", "source", "metadata"),
    doc="FLIP-107 metadata columns (SqlTableColumn.SqlMetadataColumn; "
    "SupportsReadingMetadata): events staged as event_type-partitioned "
    "parquet, the DDL declares fpath STRING METADATA FROM 'file.path' "
    "VIRTUAL, and the query derives each row's partition purely from the "
    "read-time file path — proving the metadata column resolves per file "
    "(counts per path-derived partition ≡ counts per event_type). Kafka "
    "metadata keys translate but are broker-gated.",
)
def flinkddl_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_events_parted")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(path)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE events_meta (
            event_id BIGINT,
            ts TIMESTAMP(3),
            user_id BIGINT,
            `value` DOUBLE,
            fpath STRING METADATA FROM 'file.path' VIRTUAL
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        )
    """)
    return env.sql_query("""
        SELECT regexp_extract(fpath, 'event_type=([a-z]+)', 1) AS etype,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(`value` AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events_meta
        GROUP BY regexp_extract(fpath, 'event_type=([a-z]+)', 1)
        ORDER BY etype
    """)


@register(
    "flinkddl_static_partition_insert",
    oracle="""
SELECT event_type,
       COUNT(*) AS cnt,
       CAST(SUM(CASE WHEN event_type = 'click'
                     THEN CAST(value AS DECIMAL(12,2)) * 2
                     ELSE CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS total
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("dialect", "ddl", "sink", "partitioning"),
    doc="Static partition INSERT OVERWRITE (FLIP-63 / FileSystemTableSink's "
    "staticPartitions): fill a PARTITIONED BY (event_type) sink with all "
    "events, then INSERT OVERWRITE ... PARTITION (event_type='click') with "
    "doubled values and NO partition column in the SELECT. The overwrite "
    "must replace ONLY the click partition (dynamic partitionOverwriteMode "
    "— the reference's replace-touched-partitions behavior); every other "
    "partition keeps its original rows, checked per partition against the "
    "source of truth.",
)
def flinkddl_static_partition_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_events_static_part_sink")
    shutil.rmtree(path, ignore_errors=True)  # fresh sink per run (two-step DML)
    env = _env_with_events(spark, sf_dir)
    env.execute_sql(f"""
        CREATE TABLE events_spart_sink (
            event_id BIGINT,
            user_id BIGINT,
            `value` DOUBLE,
            event_type STRING
        ) PARTITIONED BY (event_type) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        )
    """)
    env.execute_sql(
        "INSERT OVERWRITE events_spart_sink "
        "SELECT event_id, user_id, value AS `value`, event_type FROM events"
    )
    env.execute_sql("""
        INSERT OVERWRITE events_spart_sink PARTITION (event_type='click')
        SELECT event_id, user_id, CAST(value * 2 AS DOUBLE) AS `value`
        FROM events WHERE event_type = 'click'
    """)
    return env.sql_query("""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(`value` AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events_spart_sink GROUP BY event_type ORDER BY event_type
    """)


@register(
    "flinkddl_compressed_sink",
    oracle=f"""
SELECT event_type, COUNT(*) AS cnt, {_SQL_TOTAL} AS total
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("dialect", "ddl", "sink", "formats"),
    doc="Compressed filesystem sink (flink-formats parquet.compression / "
    "flink-compress codec writers): a parquet sink declared with "
    "'parquet.compression'='gzip' must write gzip-codec part files "
    "(suffix-checked) that read back transparently to the same aggregate "
    "as the source of truth.",
)
def flinkddl_compressed_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_events_gzip_sink")
    env = _env_with_events(spark, sf_dir)
    env.execute_sql(f"""
        CREATE TABLE events_gzip_sink (
            event_id BIGINT,
            `value` DOUBLE,
            event_type STRING
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet',
            'parquet.compression' = 'gzip'
        )
    """)
    env.execute_sql(
        "INSERT OVERWRITE events_gzip_sink "
        "SELECT event_id, value AS `value`, event_type FROM events"
    )
    parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert parts and all(".gz." in f for f in parts), f"expected gzip parts, got {parts[:3]}"
    return env.sql_query("""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(`value` AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events_gzip_sink GROUP BY event_type ORDER BY event_type
    """)


@register(
    "flinkddl_auto_compaction_sink",
    oracle=f"""
SELECT event_type, COUNT(*) AS cnt, {_SQL_TOTAL} AS total
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("dialect", "ddl", "sink", "compaction"),
    doc="Streaming-sink auto-compaction (FileSystemOptions.java:204-214 "
    "AUTO_COMPACTION / COMPACTION_FILE_SIZE, new in 1.12; CompactOperator): "
    "a sink declared with 'auto-compaction'='true' rewrites its many small "
    "part files into ceil(bytes / compaction.file-size) files after the "
    "write, staged-and-swapped so readers never see a half-compacted state. "
    "The query asserts the file count actually collapsed and the compacted "
    "table still matches the source-of-truth aggregate.",
)
def flinkddl_auto_compaction_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_events_compact_sink")
    env = _env_with_events(spark, sf_dir)
    env.execute_sql(f"""
        CREATE TABLE events_compact_sink (
            event_id BIGINT,
            `value` DOUBLE,
            event_type STRING
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet',
            'auto-compaction' = 'true',
            'compaction.file-size' = '256MB'
        )
    """)
    env.execute_sql(
        "INSERT OVERWRITE events_compact_sink "
        "SELECT event_id, value AS `value`, event_type FROM events"
    )
    parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(parts) == 1, f"auto-compaction should leave 1 file, got {len(parts)}"
    return env.sql_query("""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(`value` AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events_compact_sink GROUP BY event_type ORDER BY event_type
    """)


@register(
    "flinkddl_show_partitions",
    oracle="""
SELECT 'event_type=' || event_type AS partition_name, COUNT(*) AS cnt
FROM events GROUP BY event_type ORDER BY partition_name
""",
    tags=("dialect", "ddl", "catalog", "partitioning"),
    doc="SHOW PARTITIONS round trip (SqlShowPartitions / "
    "GenericInMemoryCatalog.listPartitions — flink-table/flink-sql-parser/"
    ".../dql/SqlShowPartitions.java): a PARTITIONED BY (event_type) "
    "filesystem sink is filled with INSERT OVERWRITE, SHOW PARTITIONS "
    "enumerates the hive-style partition specs from the committed layout, "
    "and each listed partition is joined back to its row count read "
    "through the sink — so the listing, the directory layout, and the "
    "readable data must all agree with the source of truth.",
)
def flinkddl_show_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_events_showpart_sink")
    shutil.rmtree(path, ignore_errors=True)  # stale partitions would linger
    env = _env_with_events(spark, sf_dir)
    env.execute_sql(f"""
        CREATE TABLE events_showpart_sink (
            event_id BIGINT,
            `value` DOUBLE,
            event_type STRING
        ) PARTITIONED BY (event_type) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        )
    """)
    env.execute_sql(
        "INSERT OVERWRITE events_showpart_sink "
        "SELECT event_id, value AS `value`, event_type FROM events"
    )
    parts = env.execute_sql("SHOW PARTITIONS events_showpart_sink")
    counts = env.sql_query("""
        SELECT concat('event_type=', event_type) AS partition_name,
               COUNT(*) AS cnt
        FROM events_showpart_sink GROUP BY event_type
    """)
    return parts.join(counts, "partition_name").orderBy("partition_name")


@register(
    "tableapi_execute_insert",
    oracle="""
SELECT event_type, COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM events WHERE value > 100 GROUP BY event_type ORDER BY event_type
""",
    tags=("dialect", "table_api", "sink"),
    doc="Table.executeInsert (Table.java:1519 → TableEnvironment's INSERT "
    "path): a fluent Table pipeline (from_path → filter → select) written "
    "into a filesystem parquet sink via execute_insert(overwrite=True), "
    "then read back through the sink's catalog view and aggregated — the "
    "fluent API's DML leg, previously unit-tested only, now "
    "oracle-evidenced end to end (connector options and commit policies "
    "apply because the write goes through the env INSERT path).",
)
def tableapi_execute_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(_CACHE, f"{_tag(sf_dir)}_events_tapi_insert_sink")
    env = _env_with_events(spark, sf_dir)
    env.execute_sql(f"""
        CREATE TABLE events_tapi_sink (
            event_id BIGINT,
            `value` DOUBLE,
            event_type STRING
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'parquet'
        )
    """)
    t = (
        env.from_path("events")
        .filter("value > 100")
        .select("event_id, value, event_type")
    )
    t.execute_insert(env, "events_tapi_sink", overwrite=True)
    return env.sql_query("""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(`value` AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events_tapi_sink GROUP BY event_type ORDER BY event_type
    """)


@register(
    "flinkddl_datagen_sequence",
    oracle="""
SELECT CAST(id % 5 AS BIGINT) AS grp, COUNT(*) AS cnt,
       CAST(SUM(id) AS BIGINT) AS sum_id,
       CAST(SUM((id + 1000000) % 97) AS BIGINT) AS sum_vmod
FROM range(1, 10001) t(id)
GROUP BY grp ORDER BY grp
""",
    tags=("dialect", "ddl", "connector"),
    doc="Bounded datagen connector (DataGenTableSourceFactory.java:55-145 "
    "fields.<f>.kind='sequence' with start/end via SequenceGeneratorVisitor; "
    "DataGenTableSource.java:63 bounds the source): an all-sequence datagen "
    "table materializes as a deterministic batch view (spark.range + "
    "start+id projections), aggregated and checked against the closed-form "
    "oracle — the datagen row's first hard evidence (random kinds stay "
    "nondeterministic/streaming, as in the reference).",
)
def flinkddl_datagen_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE gen_seq (
            id BIGINT,
            v BIGINT
        ) WITH (
            'connector' = 'datagen',
            'fields.id.kind' = 'sequence',
            'fields.id.start' = '1',
            'fields.id.end' = '10000',
            'fields.v.kind' = 'sequence',
            'fields.v.start' = '1000001',
            'fields.v.end' = '1010000'
        )
    """)
    return env.sql_query("""
        SELECT id % 5 AS grp, COUNT(*) AS cnt,
               SUM(id) AS sum_id, SUM(v % 97) AS sum_vmod
        FROM gen_seq GROUP BY id % 5 ORDER BY grp
    """)


@register(
    "flinkddl_set_reset",
    oracle="""
SELECT event_type, COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("dialect", "ddl", "session"),
    doc="SET / RESET session properties (SqlCommandParser.java:310-322; "
    "TableConfig): SET 'table.exec.resource.default-parallelism' drives the "
    "live shuffle-partition conf (asserted in the aggregate's physical "
    "plan), the aggregate runs under it and must still match the source of "
    "truth, and RESET must restore the pre-SET conf value — the session-"
    "property surface's first driver-evidenced row (previously unit-only).",
)
def flinkddl_set_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = _env_with_events(spark, sf_dir)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    env.execute_sql("SET 'table.exec.resource.default-parallelism' = '7'")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    out = env.sql_query("""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(`value` AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events GROUP BY event_type ORDER BY event_type
    """).localCheckpoint()  # materialize UNDER the SET conf, before RESET
    env.execute_sql("RESET 'table.exec.resource.default-parallelism'")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    return out


@register(
    "flinkddl_show_modules",
    oracle="""
SELECT * FROM (VALUES
  ('after_load',   1, 'core'),
  ('after_load',   2, 'ext_fns'),
  ('after_unload', 1, 'core')
) t(phase, pos, module_name) ORDER BY phase, pos
""",
    tags=("dialect", "ddl", "module"),
    doc="Module registry round trip (FLIP-68 — TableEnvironment.java:354-362 "
    "loadModule/unloadModule, ModuleManager.java LinkedHashMap resolution "
    "order, SqlCommandParser.java:250 SHOW MODULES): load a second module, "
    "SHOW MODULES lists both in LOAD order with core first; unload it, the "
    "listing shrinks back. Duplicate-load and unknown-unload raise, as in "
    "ModuleManager (unit-tested); position in the listing is the function-"
    "resolution order surface.",
)
def flinkddl_show_modules(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = TableEnvironment(spark)
    env.load_module("ext_fns", object())
    # the SQL statement surface must agree with the Java-API listing IN
    # LOAD ORDER — the resolution-order surface is the point of FLIP-68
    shown = [r["module_name"] for r in env.execute_sql("SHOW MODULES").collect()]
    assert shown == env.list_modules(), shown
    rows = [("after_load", i + 1, n) for i, n in enumerate(env.list_modules())]
    env.unload_module("ext_fns")
    rows += [("after_unload", i + 1, n) for i, n in enumerate(env.list_modules())]
    return spark.createDataFrame(
        rows, "phase string, pos int, module_name string"
    ).orderBy("phase", "pos")


@register(
    "flinkddl_show_tables_views",
    oracle="""
SELECT * FROM (VALUES
  ('table', 'showtv_nation'),
  ('table', 'showtv_top'),
  ('view',  'showtv_top')
) t(kind, name) ORDER BY kind, name
""",
    tags=("dialect", "ddl", "introspection"),
    doc="SHOW TABLES / SHOW VIEWS round trip (SqlShowTables / SqlShowViews — "
    "TableEnvironmentImpl.listTables/listViews; Flink lists views under "
    "SHOW TABLES too, views-only under SHOW VIEWS): a connector table plus "
    "a derived temporary view, both listings filtered to the query's "
    "namespace prefix so the row is deterministic under a shared session "
    "(other queries' temp views don't leak in). Rerun-safe via leading "
    "DROP IF EXISTS.",
)
def flinkddl_show_tables_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _nation_csv(spark, sf_dir)
    env = TableEnvironment(spark)
    env.execute_sql("DROP VIEW IF EXISTS showtv_top")
    env.execute_sql("DROP TABLE IF EXISTS showtv_nation")
    env.execute_sql(f"""
        CREATE TABLE showtv_nation (
            {_NATION_COLS_DDL}
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'csv'
        )
    """)
    env.execute_sql(
        "CREATE TEMPORARY VIEW showtv_top AS "
        "SELECT n_name FROM showtv_nation WHERE n_regionkey = 0"
    )
    tables = env.execute_sql("SHOW TABLES").filter(
        F.col("table_name").startswith("showtv_")
    ).select(F.lit("table").alias("kind"), F.col("table_name").alias("name"))
    views = env.execute_sql("SHOW VIEWS").filter(
        F.col("view_name").startswith("showtv_")
    ).select(F.lit("view").alias("kind"), F.col("view_name").alias("name"))
    return tables.unionByName(views).orderBy("kind", "name").localCheckpoint()


@register(
    "flinkddl_explain_plan",
    oracle="""
SELECT * FROM (VALUES
  ('adaptive_execution',   true),
  ('columns_pruned',       true),
  ('exchange',             true),
  ('parquet_scan',         true),
  ('physical_plan',        true),
  ('predicate_pushed',     true),
  ('two_stage_aggregate',  true)
) t(feature, present) ORDER BY feature
""",
    tags=("dialect", "ddl", "introspection"),
    doc="EXPLAIN statement / Table.explain (SqlExplain / SqlCommandParser "
    "EXPLAIN PLAN FOR; TableEnvironmentImpl.explainSql, "
    "TableEnvironmentImpl.java:703): the dialect EXPLAIN of a filtered "
    "aggregate renders Catalyst's formatted physical plan, and the row "
    "asserts the plan SHAPE the engine promises at scale — each feature is "
    "a SEMANTIC predicate over the plan text, not a bare substring: "
    "predicate_pushed requires the actual GreaterThan(l_quantity,10.0) "
    "inside PushedFilters (a derived IsNotNull alone does not pass), "
    "columns_pruned requires the ReadSchema to carry the two referenced "
    "columns and NONE of lineitem's other columns, two_stage_aggregate "
    "requires the partial_count below the Exchange. The explain surface's "
    "first driver row, doubling as a driver-checked plan-quality gate.",
)
def flinkddl_explain_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = TableEnvironment(spark)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem_explain"
    )
    plan = env.execute_sql(
        "EXPLAIN SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem_explain "
        "WHERE l_quantity > 10 GROUP BY l_returnflag"
    ).collect()[0][0]
    read_schema = next(
        (l for l in plan.splitlines() if l.startswith("ReadSchema:")), ""
    )
    pushed = next(
        (l for l in plan.splitlines() if l.startswith("PushedFilters:")), ""
    )
    features = {
        "physical_plan": "== Physical Plan ==" in plan,
        "adaptive_execution": "AdaptiveSparkPlan" in plan,
        "parquet_scan": "Scan parquet" in plan,
        "exchange": "Exchange" in plan,
        "two_stage_aggregate": "partial_count" in plan and "HashAggregate" in plan,
        # the real predicate reaches the scan — a derived IsNotNull alone
        # (which PushedFilters prints even when the comparison is NOT
        # pushed) must not pass
        "predicate_pushed": "GreaterThan(l_quantity,10.0)" in pushed,
        # only the two referenced columns are read
        "columns_pruned": (
            "l_quantity" in read_schema
            and "l_returnflag" in read_schema
            and not any(
                c in read_schema
                for c in ("l_orderkey", "l_extendedprice", "l_shipdate", "l_partkey")
            )
        ),
    }
    return spark.createDataFrame(
        sorted(features.items()), "feature string, present boolean"
    )


@register(
    "flinkddl_catalog_registry",
    oracle="""
SELECT * FROM (VALUES
  ('catalog', 'default_catalog'),
  ('catalog', 'reg_mem'),
  ('current_catalog', 'reg_mem'),
  ('current_database', 'reg_analytics'),
  ('database', 'default_database'),
  ('database', 'reg_analytics')
) t(kind, name) ORDER BY kind, name
""",
    tags=("dialect", "ddl", "catalog"),
    doc="Catalog/database registry round trip (GenericInMemoryCatalog.java:52; "
    "SqlCreateCatalog / SqlCreateDatabase / SqlUseCatalog / SqlUseDatabase / "
    "SHOW): CREATE CATALOG + CREATE DATABASE, USE both, then the SHOW "
    "CATALOGS / SHOW DATABASES / SHOW CURRENT listings unioned into one "
    "relation and checked against the literal expected registry state — the "
    "registry surface's first hard-evidence row (previously unit-only). "
    "Rerun-safe because the registry is per-TableEnvironment-instance "
    "(fresh each call); the leading DROP IF EXISTS statements are no-ops "
    "that exercise the IF EXISTS path on unknown names.",
)
def flinkddl_catalog_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = TableEnvironment(spark)
    env.execute_sql("DROP CATALOG IF EXISTS reg_mem")  # rerun-safe
    env.execute_sql("DROP DATABASE IF EXISTS reg_analytics")
    env.execute_sql("CREATE CATALOG reg_mem WITH ('type' = 'generic_in_memory')")
    env.execute_sql("CREATE DATABASE reg_analytics")
    env.execute_sql("USE CATALOG reg_mem")
    env.execute_sql("USE reg_analytics")
    cats = env.execute_sql("SHOW CATALOGS").select(
        F.lit("catalog").alias("kind"), F.col("catalog_name").alias("name")
    )
    dbs = env.execute_sql("SHOW DATABASES").select(
        F.lit("database").alias("kind"), F.col("database_name").alias("name")
    )
    cur_c = env.execute_sql("SHOW CURRENT CATALOG").select(
        F.lit("current_catalog").alias("kind"),
        F.col("current_catalog_name").alias("name"),
    )
    cur_d = env.execute_sql("SHOW CURRENT DATABASE").select(
        F.lit("current_database").alias("kind"),
        F.col("current_database_name").alias("name"),
    )
    out = cats.unionByName(dbs).unionByName(cur_c).unionByName(cur_d).orderBy(
        "kind", "name"
    ).localCheckpoint()
    return out
