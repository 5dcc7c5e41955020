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
    hfields, sync, off, codec = read_header(blob)
    assert hfields == FIELDS and sync == DEFAULT_SYNC and codec == "null"
    # 3 sync-marked blocks follow the header
    assert blob[off:].count(DEFAULT_SYNC) == 3


def test_deflate_codec_roundtrip():
    """deflate blocks (raw RFC-1951 per spec) inflate back to the identical
    record set; the compressed container is smaller on repetitive data and
    its header advertises the codec."""
    rows = [(i, "repetitive-payload-" * 10) for i in range(50)]
    null_blob = encode_ocf(rows, FIELDS, records_per_block=16)
    defl_blob = encode_ocf(rows, FIELDS, records_per_block=16, codec="deflate")
    assert len(defl_blob) < len(null_blob) // 2
    assert read_header(defl_blob)[3] == "deflate"
    fields, recs = decode_ocf(defl_blob)
    assert fields == FIELDS
    assert [(r["id"], r["name"]) for r in recs] == rows
    with pytest.raises(NotImplementedError, match="snappy"):
        encode_ocf(rows, FIELDS, codec="snappy")


def test_corrupt_sync_and_truncation_raise():
    blob = bytearray(encode_ocf(ROWS, FIELDS))
    blob[-1] ^= 0xFF  # flip the final sync byte
    with pytest.raises(ValueError, match="sync"):
        decode_ocf(bytes(blob))
    with pytest.raises((ValueError, IndexError, struct.error)):
        decode_ocf(encode_ocf(ROWS, FIELDS)[:-20])
    with pytest.raises(ValueError, match="magic"):
        decode_ocf(b"PAR1" + b"\x00" * 32)


def test_write_modes_and_task_safe_naming(spark, tmp_path):
    """overwrite clears prior .avro files; append adds a fresh job's files;
    final names are deterministic per (job, partition) and land via atomic
    rename — no .tmp files survive a successful write."""
    import glob
    import os

    df = spark.range(0, 10).selectExpr("id AS k").repartition(2)
    fields = [("k", "long")]
    path = str(tmp_path / "modes")
    assert write_avro_dir(df, path, fields, mode="overwrite") == 10
    first = sorted(glob.glob(os.path.join(path, "*.avro")))
    assert len(first) == 2
    assert write_avro_dir(df, path, fields, mode="append") == 10
    assert len(glob.glob(os.path.join(path, "*.avro"))) == 4
    assert len(read_avro_dir(spark, path).collect()) == 20
    assert write_avro_dir(df, path, fields, mode="overwrite") == 10
    assert len(glob.glob(os.path.join(path, "*.avro"))) == 2
    assert not glob.glob(os.path.join(path, "*.tmp-*"))
    with pytest.raises(ValueError, match="mode"):
        write_avro_dir(df, path, fields, mode="errorifexists")


def test_avro_ddl_insert_select_and_metadata(spark, tmp_path):
    """The connector DDL surface on the no-spark-avro path: CREATE TABLE
    (with a FLIP-107 METADATA column) over a not-yet-existing path, INSERT
    INTO through save_avro's fallback, then SELECT — metadata resolves from
    the fallback's _metadata struct and the struct itself stays hidden."""
    from flink_1_12_0_src_spark.table_env import TableEnvironment

    path = str(tmp_path / "t_avro")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE t_avro (
            k BIGINT,
            s STRING,
            fname STRING METADATA FROM 'file.name' VIRTUAL
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'avro'
        )
    """)
    env.execute_sql(
        "INSERT INTO t_avro SELECT id AS k, concat('r', id) AS s FROM range(5)"
    )
    rows = env.sql_query("SELECT k, s, fname FROM t_avro ORDER BY k").collect()
    assert [(r["k"], r["s"]) for r in rows] == [(i, f"r{i}") for i in range(5)]
    assert all(r["fname"].endswith(".avro") for r in rows)
    assert "_metadata" not in env.sql_query("SELECT * FROM t_avro").columns
    # second INSERT appends
    env.execute_sql(
        "INSERT INTO t_avro SELECT id + 10 AS k, concat('x', id) AS s FROM range(2)"
    )
    assert env.sql_query("SELECT COUNT(*) AS n FROM t_avro").collect()[0]["n"] == 7


def test_avro_stream_table_matches_batch(spark, tmp_path):
    """stream_table over an avro DDL table (binaryFile stream + Arrow decode
    fallback) drains to the same rows the batch scan serves."""
    from flink_1_12_0_src_spark.streaming.run import run_to_batch
    from flink_1_12_0_src_spark.table_env import TableEnvironment

    df = spark.range(0, 30).selectExpr("id AS k", "id * 2.5 AS x").repartition(3)
    path = str(tmp_path / "s_avro")
    write_avro_dir(df, path, [("k", "long"), ("x", "double")])
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE s_avro (k BIGINT, x DOUBLE) WITH (
            'connector' = 'filesystem',
            'path' = '{path}',
            'format' = 'avro'
        )
    """)
    got = sorted(
        tuple(r)
        for r in run_to_batch(
            env.stream_table("s_avro", {"maxFilesPerTrigger": "1"}), "append"
        ).collect()
    )
    want = sorted(tuple(r) for r in df.collect())
    assert got == want


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

def test_boolean_decode_is_strict():
    """A nonzero-but-not-1 boolean byte is a framing error, not False —
    matching the decoder's corrupt-data posture everywhere else."""
    blob = bytearray(encode_ocf([(1, True)], [("k", "long"), ("b", "boolean")]))
    # locate the boolean byte: last block body is [k varint][bool byte],
    # followed by the 16-byte sync — so it sits at -17.
    assert blob[-17] == 1
    blob[-17] = 2
    with pytest.raises(ValueError, match="boolean byte"):
        decode_ocf(bytes(blob))


def test_empty_write_leaves_readable_typed_dir(spark, tmp_path):
    """A write that produces zero rows still leaves a schema-bearing
    header-only OCF file (like the native writer), so the next read returns
    an empty TYPED relation instead of FileNotFoundError."""
    import glob
    import os

    df = spark.range(0, 10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS x").filter("k < 0")
    fields = [("k", "long"), ("x", "double")]
    path = str(tmp_path / "empty_avro")
    assert write_avro_dir(df, path, fields, mode="overwrite") == 0
    files = glob.glob(os.path.join(path, "*.avro"))
    assert len(files) == 1 and os.path.exists(os.path.join(path, "_SUCCESS"))
    back = read_avro_dir(spark, path)
    assert dict(back.dtypes) == {"k": "bigint", "x": "double"}
    assert back.count() == 0


def test_schema_drift_names_the_file(spark, tmp_path):
    """A directory whose files disagree on schema fails with a descriptive
    schema-drift error naming the offending file, not an executor KeyError."""
    import os

    path = str(tmp_path / "drift")
    os.makedirs(path)
    with open(os.path.join(path, "a.avro"), "wb") as f:
        f.write(encode_ocf([(1, "x")], FIELDS))
    with open(os.path.join(path, "b.avro"), "wb") as f:
        f.write(encode_ocf([(2.5,)], [("renamed", "double")]))
    with pytest.raises(Exception, match="schema drift"):
        read_avro_dir(spark, path).collect()


def test_avro_options_are_accepted_on_fallback(spark, tmp_path):
    """DDL-declared format options thread through load_avro/save_avro (the
    native path applies them; the fallback's OCF framing has none, so they
    are accepted as no-ops rather than dropped with an error)."""
    from flink_1_12_0_src_spark.sources.avro_py import save_avro

    df = spark.range(0, 4).selectExpr("id AS k")
    path = str(tmp_path / "opts")
    save_avro(df, path, mode="append", options={"compression": "deflate"})
    got = sorted(
        r["k"] for r in load_avro(spark, path, options={"ignoreExtension": "true"}).collect()
    )
    assert got == [0, 1, 2, 3]

# ---------------------------------------------------------------------------
# nullable-union fields: ["null", T] — the dominant real-world schema shape
# ---------------------------------------------------------------------------

NFIELDS = [("k", "long"), ("s", "?string"), ("x", "?double"), ("b", "?boolean")]
NROWS = [
    (1, None, None, None),
    (2, "ab", 1.5, True),
    (3, "", 0.0, False),
    (-4, "héllo", None, True),
]


def _hand_nullable_ocf(rows) -> bytes:
    """Hand-built OCF for the nullable schema, written independently against
    the spec: each union value is its branch index as a zigzag-varint long
    (0 = null, 1 = the typed branch) followed by the branch's encoding."""
    schema = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "s", "type": ["null", "string"]},
                {"name": "x", "type": ["null", "double"]},
                {"name": "b", "type": ["null", "boolean"]},
            ],
        },
        separators=(",", ":"),
    ).encode()
    out = b"Obj\x01" + _vl(2)
    out += _vl(len(b"avro.codec")) + b"avro.codec" + _vl(4) + b"null"
    out += _vl(len(b"avro.schema")) + b"avro.schema" + _vl(len(schema)) + schema
    out += b"\x00" + DEFAULT_SYNC
    body = b""
    for k, s, x, b in rows:
        body += _vl(k)
        body += _vl(0) if s is None else _vl(1) + _vl(len(s.encode())) + s.encode()
        body += _vl(0) if x is None else _vl(1) + struct.pack("<d", x)
        body += _vl(0) if b is None else _vl(1) + (b"\x01" if b else b"\x00")
    out += _vl(len(rows)) + _vl(len(body)) + body + DEFAULT_SYNC
    return out


def test_nullable_union_encoder_matches_hand_built_bytes():
    assert encode_ocf(NROWS, NFIELDS) == _hand_nullable_ocf(NROWS)


def test_nullable_union_decoder_reads_hand_built_bytes():
    fields, recs = decode_ocf(_hand_nullable_ocf(NROWS))
    assert fields == NFIELDS
    assert [(r["k"], r["s"], r["x"], r["b"]) for r in recs] == NROWS


def test_nullable_union_bad_branch_index_raises():
    blob = bytearray(_hand_nullable_ocf([(1, None, None, None)]))
    # body is [k=1 -> 0x02][s idx 0][x idx 0][b idx 0] then sync; flip the
    # s branch index to 2 (varint 0x04)
    assert blob[-20:-16] == b"\x02\x00\x00\x00"
    blob[-19] = 0x04
    with pytest.raises(ValueError, match="union branch"):
        decode_ocf(bytes(blob))


def test_nullable_union_only_null_first_supported():
    schema = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [{"name": "k", "type": ["long", "null"]}],
        },
        separators=(",", ":"),
    ).encode()
    out = b"Obj\x01" + _vl(2)
    out += _vl(len(b"avro.codec")) + b"avro.codec" + _vl(4) + b"null"
    out += _vl(len(b"avro.schema")) + b"avro.schema" + _vl(len(schema)) + schema
    out += b"\x00" + DEFAULT_SYNC
    with pytest.raises(NotImplementedError, match="union"):
        read_header(out)


def test_nullable_union_spark_roundtrip_with_nulls(spark, tmp_path):
    """Full write/read round trip through the fallback with NULLs in every
    nullable column: fields_from_spark_schema maps nullability to unions,
    the decoder serves NULL-capable pandas dtypes, and Spark reads the
    NULLs back as NULLs (not NaN / 0 / False)."""
    from flink_1_12_0_src_spark.sources.avro_py import fields_from_spark_schema

    df = spark.range(0, 30).selectExpr(
        "id AS k",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE concat('v', id) END AS s",
        "CASE WHEN id % 5 = 0 THEN NULL ELSE id * CAST(1.5 AS DOUBLE) END AS x",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE id % 2 = 0 END AS b",
        "CASE WHEN id % 4 = 0 THEN NULL ELSE id * 10 END AS n",
    )
    fields = fields_from_spark_schema(df.schema)
    assert [t for _, t in fields] == ["long", "?string", "?double", "?boolean", "?long"]
    path = str(tmp_path / "nullable_rt")
    n = write_avro_dir(df.repartition(3), path, fields)
    assert n == 30
    back = read_avro_dir(spark, path)
    assert dict(back.dtypes) == {
        "k": "bigint", "s": "string", "x": "double", "b": "boolean", "n": "bigint"
    }
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
    nulls = back.filter("s IS NULL OR x IS NULL OR b IS NULL OR n IS NULL").count()
    assert nulls > 0


def test_int_float_bytes_primitives_wire_form():
    """int shares long's zigzag-varint wire form, float is 4-byte LE
    IEEE-754, bytes is a length-prefixed raw run — each checked against
    hand-built spec bytes, encoder and decoder independently."""
    fields = [("i", "int"), ("f", "float"), ("raw", "bytes")]
    rows = [(-65, 1.5, b"\x00\xff\x10"), (8192, -0.25, b"")]
    want = (
        _vl(-65) + struct.pack("<f", 1.5) + _vl(3) + b"\x00\xff\x10"
        + _vl(8192) + struct.pack("<f", -0.25) + _vl(0)
    )
    got = b"".join(encode_record(fields, r) for r in rows)
    assert got == want
    ffields, recs = decode_ocf(encode_ocf(rows, fields))
    assert ffields == fields
    assert [(r["i"], r["f"], r["raw"]) for r in recs] == rows


def test_int_float_bytes_spark_roundtrip(spark, tmp_path):
    """The widened primitive set (int/float/binary Spark columns, incl.
    nullable unions) round-trips through the fallback writer + reader with
    exact float32 values and NULLs preserved."""
    from flink_1_12_0_src_spark.sources.avro_py import fields_from_spark_schema

    df = spark.range(0, 20).selectExpr(
        "CAST(id AS INT) AS i",
        "CAST(id * 0.25 AS FLOAT) AS f",
        "encode(concat('b', id), 'UTF-8') AS raw",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id + 100 AS INT) END AS iopt",
        "CASE WHEN id % 4 = 0 THEN NULL ELSE CAST(id * 0.5 AS FLOAT) END AS fopt",
    )
    fields = fields_from_spark_schema(df.schema)
    assert [t for _, t in fields] == ["int", "float", "?bytes", "?int", "?float"]
    path = str(tmp_path / "widened")
    assert write_avro_dir(df.repartition(2), path, fields) == 20
    back = read_avro_dir(spark, path)
    assert dict(back.dtypes) == {
        "i": "int", "f": "float", "raw": "binary", "iopt": "int", "fopt": "float"
    }
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
