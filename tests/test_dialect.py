"""Unit tests for the Flink-SQL dialect translator and connector DDL parser
(pure Python — no Spark session needed)."""

from __future__ import annotations

import pytest

from flink_1_12_0_src_spark.plans.dialect import parse_create_table, translate_query
from flink_1_12_0_src_spark.sources.connectors import reader_config, writer_config


def test_tumble_rewrite():
    q = translate_query("SELECT 1 FROM t GROUP BY TUMBLE(ts, INTERVAL '1' DAY)")
    assert "window(ts, '1 days')" in q


def test_tumble_start_end():
    q = translate_query(
        "SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE), TUMBLE_END(ts, INTERVAL '5' MINUTE) FROM t"
    )
    assert "window.start" in q and "window.end" in q


def test_hop_arg_order_swap():
    q = translate_query("GROUP BY HOP(ts, INTERVAL '12' HOUR, INTERVAL '1' DAY)")
    # Flink: (time, slide, size) → Spark: (time, size, slide)
    assert "window(ts, '1 days', '12 hours')" in q


def test_session_rewrite():
    q = translate_query(
        "SELECT SESSION_START(ts, INTERVAL '30' MINUTE) FROM t GROUP BY SESSION(ts, INTERVAL '30' MINUTE)"
    )
    assert "session_window(ts, '30 minutes')" in q
    assert "session_window.start" in q


def test_proctime():
    assert translate_query("SELECT PROCTIME() FROM t") == "SELECT current_timestamp() FROM t"


def test_passthrough_unchanged():
    q = "SELECT a, SUM(b) OVER (PARTITION BY c ORDER BY d) FROM t WHERE e IN (SELECT f FROM g)"
    assert translate_query(q) == q


def test_parse_create_table_full():
    meta = parse_create_table("""
        CREATE TABLE ev (
            id BIGINT,
            ts TIMESTAMP(3),
            v DOUBLE,
            name VARCHAR(20),
            amount DECIMAL(12,2),
            PRIMARY KEY (id) NOT ENFORCED,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) PARTITIONED BY (name) WITH (
            'connector' = 'filesystem',
            'path' = '/tmp/x',
            'format' = 'csv',
            'csv.field-delimiter' = '|'
        )
    """)
    assert meta["name"] == "ev"
    assert meta["schema_ddl"] == "id BIGINT, ts TIMESTAMP, v DOUBLE, name STRING, amount DECIMAL(12,2)"
    assert meta["watermark"] == ("ts", "5 seconds")
    assert meta["partition_by"] == ["name"]
    assert meta["options"]["csv.field-delimiter"] == "|"


def test_reader_config_csv():
    cfg = reader_config(
        {"connector": "filesystem", "path": "/tmp/x", "format": "csv", "csv.field-delimiter": "|"}
    )
    assert cfg["format"] == "csv"
    assert cfg["options"]["sep"] == "|"
    assert cfg["options"]["header"] == "false"


def test_reader_config_kafka_mapping():
    cfg = reader_config(
        {
            "connector": "upsert-kafka",
            "topic": "orders",
            "properties.bootstrap.servers": "h:9092",
            "scan.startup.mode": "earliest-offset",
        }
    )
    assert cfg["format"] == "kafka"
    assert cfg["options"]["subscribe"] == "orders"
    assert cfg["options"]["startingOffsets"] == "earliest"
    assert cfg["changelog_by_key"] is True


def test_writer_config_print_blackhole():
    assert writer_config({"connector": "print"})["format"] == "console"
    assert writer_config({"connector": "blackhole"})["format"] == "noop"


def test_unknown_connector_raises():
    with pytest.raises(ValueError, match="unknown connector"):
        reader_config({"connector": "martian"})
