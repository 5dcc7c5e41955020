"""Pure-Python Avro OCF codec tests (sources/avro_py.py).

The encoder and decoder are separate implementations meeting at the bytes;
this file adds the THIRD implementation — hand-built byte fixtures written
inline against the Avro spec (the struct-packed pattern that caught the
mvhd-matrix bug in the multimodal family) — plus wire-law unit cases and
the Spark write/read round trip including the no-spark-avro fallback."""

from __future__ import annotations

import json
import struct

import pytest

from flink_1_12_0_src_spark.sources.avro_py import (
    DEFAULT_SYNC,
    decode_ocf,
    encode_ocf,
    encode_record,
    load_avro,
    read_avro_dir,
    read_header,
    write_avro_dir,
)


def _vl(n: int) -> bytes:
    """Hand-rolled zigzag varint, written independently in the test."""
    u = 2 * n if n >= 0 else -2 * n - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_long_wire_cases():
    """Spec examples + boundaries of the zigzag/varint encoding."""
    cases = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -2: b"\x03",
        2: b"\x04",
        63: b"\x7e",
        -64: b"\x7f",
        64: b"\x80\x01",
        -65: b"\x81\x01",
        8191: b"\xfe\x7f",
        8192: b"\x80\x80\x01",
    }
    for n, expect in cases.items():
        assert encode_record([("v", "long")], (n,)) == expect, n


def test_record_encoding_mixed_fields():
    fields = [("id", "long"), ("name", "string"), ("score", "double"), ("ok", "boolean")]
    got = encode_record(fields, (300, "ab", 1.5, True))
    expect = _vl(300) + _vl(2) + b"ab" + struct.pack("<d", 1.5) + b"\x01"
    assert got == expect


def _hand_ocf(rows: list[tuple[int, str]]) -> bytes:
    """Hand-built OCF for (id long, name string) — the independent fixture."""
    schema = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": "string"},
            ],
        },
        separators=(",", ":"),
    ).encode()
    out = b"Obj\x01" + _vl(2)
    out += _vl(len(b"avro.codec")) + b"avro.codec" + _vl(4) + b"null"
    out += _vl(len(b"avro.schema")) + b"avro.schema" + _vl(len(schema)) + schema
    out += b"\x00" + DEFAULT_SYNC
    body = b"".join(
        _vl(i) + _vl(len(n.encode())) + n.encode() for i, n in rows
    )
    out += _vl(len(rows)) + _vl(len(body)) + body + DEFAULT_SYNC
    return out


FIELDS = [("id", "long"), ("name", "string")]
ROWS = [(0, "a"), (127, "bc"), (128, ""), (-3, "héllo")]


def test_encoder_matches_hand_built_bytes():
    assert encode_ocf(ROWS, FIELDS) == _hand_ocf(ROWS)


def test_decoder_reads_hand_built_bytes():
    fields, recs = decode_ocf(_hand_ocf(ROWS))
    assert fields == FIELDS
    assert [(r["id"], r["name"]) for r in recs] == ROWS


def test_multi_block_roundtrip_and_header_probe():
    rows = [(i, f"n{i}") for i in range(5)]
    blob = encode_ocf(rows, FIELDS, records_per_block=2)  # 3 blocks
    fields, recs = decode_ocf(blob)
    assert [(r["id"], r["name"]) for r in recs] == rows
    hfields, sync, off = read_header(blob)
    assert hfields == FIELDS and sync == DEFAULT_SYNC
    # 3 sync-marked blocks follow the header
    assert blob[off:].count(DEFAULT_SYNC) == 3


def test_corrupt_sync_and_truncation_raise():
    blob = bytearray(encode_ocf(ROWS, FIELDS))
    blob[-1] ^= 0xFF  # flip the final sync byte
    with pytest.raises(ValueError, match="sync"):
        decode_ocf(bytes(blob))
    with pytest.raises((ValueError, IndexError, struct.error)):
        decode_ocf(encode_ocf(ROWS, FIELDS)[:-20])
    with pytest.raises(ValueError, match="magic"):
        decode_ocf(b"PAR1" + b"\x00" * 32)


def test_spark_write_read_roundtrip(spark, tmp_path):
    """write_avro_dir stages one OCF per partition; read_avro_dir decodes
    them back typed — and load_avro's fallback path (spark-avro absent in
    this environment) serves the same rows."""
    from pyspark.sql import functions as F

    df = (
        spark.range(0, 100)
        .repartition(3)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("s"),
            (F.col("id") * 1.5).alias("x"),
            (F.col("id") % 2 == 0).alias("b"),
        )
    )
    fields = [("k", "long"), ("s", "string"), ("x", "double"), ("b", "boolean")]
    path = str(tmp_path / "avro_rt")
    n = write_avro_dir(df, path, fields)
    assert n == 100
    back = read_avro_dir(spark, path)
    assert dict(back.dtypes) == {"k": "bigint", "s": "string", "x": "double", "b": "boolean"}
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
    via_load = sorted(tuple(r) for r in load_avro(spark, path).collect())
    assert via_load == want
