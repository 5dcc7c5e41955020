"""Pure-Python Avro Object Container File codec + Spark glue.

Spark's ``format("avro")`` needs the external spark-avro package, which is
not bundled in this environment — previously the one format row documented
as an unfixable seam. The Avro 1.x BINARY ENCODING and OCF layout are public
specification, and the subset a filesystem connector actually needs —
long/double/string/boolean primitives in flat record schemas, ``null``
codec, sync-marked blocks — fits in a few hundred lines of stdlib Python, so
the seam is now implemented in-env (reference analog:
flink-formats/flink-avro/src/main/java/org/apache/flink/formats/avro/
AvroFormatFactory.java — the reference's pluggable avro format; the wire
layout here follows the Apache Avro specification, not any library).

Two INDEPENDENT halves, meeting only at the bytes:

- the ENCODER (:func:`encode_ocf`) builds varint/zigzag longs, length-
  prefixed UTF-8 strings, little-endian doubles, the ``Obj\\x01`` header
  with its metadata map, and size-prefixed sync-marked blocks;
- the DECODER (:func:`decode_ocf`) re-reads all of that with its own
  index-based parser, taking the schema from the embedded ``avro.schema``
  JSON (never from the caller).

tests/test_avro_py.py pins BOTH against hand-built byte fixtures (the
struct-packed third-implementation pattern of the multimodal family) plus
varint/zigzag unit laws, and queries/dialectq.py's ``avro_record_sizes``
pins the record-size law cross-engine against a DuckDB arithmetic oracle.

Scale notes: encode/decode are Arrow-batched (``mapInPandas`` — one OCF
file per partition on write, per-file decode on read via ``binaryFile``),
so the Python cost is per-batch, not per-row-trip; blocks are sync-marked
per spec, so a future DataSourceV2 split reader could seek block
boundaries. The ``null`` codec only — deflate needs zlib (available) but
the reference's default is null and the driver fixtures use it.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
from collections.abc import Iterator

MAGIC = b"Obj\x01"
# Deterministic sync marker: fixtures must be byte-reproducible across runs
# (a random marker per spec-recommendation would break golden-byte tests).
DEFAULT_SYNC = bytes(range(16))

AVRO_TO_SPARK = {
    "long": "bigint",
    "string": "string",
    "double": "double",
    "boolean": "boolean",
}


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _append_varint(out: bytearray, v: int) -> None:
    """Unsigned little-endian base-128 varint."""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _append_long(out: bytearray, n: int) -> None:
    """Avro long: zigzag then varint."""
    n = int(n)
    _append_varint(out, 2 * n if n >= 0 else -2 * n - 1)


def _append_string(out: bytearray, s: str) -> None:
    b = str(s).encode("utf-8")
    _append_long(out, len(b))
    out += b


def _append_value(out: bytearray, typ: str, val) -> None:
    if typ == "long":
        _append_long(out, val)
    elif typ == "string":
        _append_string(out, val)
    elif typ == "double":
        out += struct.pack("<d", float(val))
    elif typ == "boolean":
        out.append(1 if val else 0)
    else:
        raise NotImplementedError(f"avro type not in the supported subset: {typ}")


def schema_json(fields: list[tuple[str, str]], name: str = "row") -> str:
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": f, "type": t} for f, t in fields],
        },
        separators=(",", ":"),
    )


def encode_record(fields: list[tuple[str, str]], row) -> bytes:
    """One record's binary encoding (no container framing) — also the unit
    the ``avro_record_sizes`` driver row sizes against its SQL oracle."""
    out = bytearray()
    for (_, typ), val in zip(fields, row):
        _append_value(out, typ, val)
    return bytes(out)


def encode_ocf(
    rows,
    fields: list[tuple[str, str]],
    name: str = "row",
    sync: bytes = DEFAULT_SYNC,
    records_per_block: int = 4096,
) -> bytes:
    """Object Container File: magic, metadata map (schema + codec), sync
    marker, then (count, byte-size, records..., sync) blocks."""
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json(fields, name), "avro.codec": "null"}
    _append_long(out, len(meta))
    for k in sorted(meta):
        _append_string(out, k)
        vb = meta[k].encode("utf-8")
        _append_long(out, len(vb))
        out += vb
    out.append(0)  # map terminator (long 0)
    out += sync
    rows = list(rows)
    for start in range(0, len(rows), records_per_block):
        chunk = rows[start : start + records_per_block]
        body = bytearray()
        for row in chunk:
            for (_, typ), val in zip(fields, row):
                _append_value(body, typ, val)
        _append_long(out, len(chunk))
        _append_long(out, len(body))
        out += body
        out += sync
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder — independent index-based parser; schema comes from the file
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v, i
        shift += 7


def _read_long(buf: bytes, i: int) -> tuple[int, int]:
    u, i = _read_varint(buf, i)
    return (u >> 1) ^ -(u & 1), i


def _read_meta(buf: bytes, i: int) -> tuple[dict[str, bytes], int]:
    meta: dict[str, bytes] = {}
    n, i = _read_long(buf, i)
    while n != 0:
        if n < 0:  # negative block count is followed by a byte size (spec)
            n = -n
            _, i = _read_long(buf, i)
        for _ in range(n):
            klen, i = _read_long(buf, i)
            k = buf[i : i + klen].decode("utf-8")
            i += klen
            vlen, i = _read_long(buf, i)
            meta[k] = buf[i : i + vlen]
            i += vlen
        n, i = _read_long(buf, i)
    return meta, i


def read_header(blob: bytes) -> tuple[list[tuple[str, str]], bytes, int]:
    """Parse just the OCF header: returns (fields, sync marker, body offset).
    Used by the Spark reader to learn the schema from ONE file driver-side
    without decoding any record block."""
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta, i = _read_meta(blob, 4)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec != "null":
        raise NotImplementedError(f"avro codec {codec!r} not supported (null only)")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    for _, t in fields:
        if t not in AVRO_TO_SPARK:
            raise NotImplementedError(f"avro type not in the supported subset: {t}")
    sync = blob[i : i + 16]
    return fields, sync, i + 16


def decode_ocf(blob: bytes) -> tuple[list[tuple[str, str]], list[dict]]:
    """Full decode: (fields, record dicts). Verifies block byte sizes and
    sync markers — a corrupt or truncated block raises, it does not yield
    silently wrong rows."""
    fields, sync, i = read_header(blob)
    rows: list[dict] = []
    while i < len(blob):
        cnt, i = _read_long(blob, i)
        size, i = _read_long(blob, i)
        end = i + size
        for _ in range(cnt):
            rec: dict = {}
            for fname, typ in fields:
                if typ == "long":
                    v, i = _read_long(blob, i)
                elif typ == "string":
                    ln, i = _read_long(blob, i)
                    v = blob[i : i + ln].decode("utf-8")
                    i += ln
                elif typ == "double":
                    (v,) = struct.unpack_from("<d", blob, i)
                    i += 8
                elif typ == "boolean":
                    v = blob[i] == 1
                    i += 1
                rec[fname] = v
            rows.append(rec)
        if i != end:
            raise ValueError(f"avro block size mismatch: at {i}, expected {end}")
        if blob[i : i + 16] != sync:
            raise ValueError(f"avro sync marker mismatch at {i}")
        i += 16
    return fields, rows


# ---------------------------------------------------------------------------
# Spark glue: Arrow-batched write/read over BinaryType files
# ---------------------------------------------------------------------------

def write_avro_dir(df, path: str, fields: list[tuple[str, str]]) -> int:
    """Stage a DataFrame as ``.avro`` OCF files, ONE per input partition
    (each mapInPandas task drains its partition's Arrow batches into one
    container) — the FileSystem-sink shape. Returns the row count written;
    drops a ``_SUCCESS`` marker like Spark's own file sinks."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    cols = [f for f, _ in fields]

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[tuple] = []
        for pdf in batches:
            rows.extend(pdf[cols].itertuples(index=False, name=None))
        if rows:
            blob = encode_ocf(rows, fields)
            fn = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
            with open(fn, "wb") as f:
                f.write(blob)
        yield pd.DataFrame({"n": pd.Series([len(rows)], dtype="int64")})

    total = (
        df.select(*cols)
        .mapInPandas(_write, "n bigint")
        .groupBy()
        .sum("n")
        .collect()[0][0]
    )
    open(os.path.join(path, "_SUCCESS"), "w").close()
    return int(total or 0)


def read_avro_dir(spark, path: str):
    """Read a directory of ``.avro`` OCF files as a typed DataFrame: the
    schema comes from ONE file's header (driver-side, header bytes only);
    record decoding runs distributed via binaryFile + mapInPandas (Arrow
    moves the blobs zero-copy into the Python workers). Per-file
    parallelism — the split unit of a filesystem scan."""
    import glob as _glob

    import pandas as pd

    files = sorted(_glob.glob(os.path.join(path, "*.avro")))
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as f:
        fields, _, _ = read_header(f.read(4096))
    ddl = ", ".join(f"{n} {AVRO_TO_SPARK[t]}" for n, t in fields)
    pd_dtype = {"long": "int64", "double": "float64", "boolean": "bool", "string": "object"}

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {n: [] for n, _ in fields}
            for blob in pdf["content"]:
                _, rows = decode_ocf(bytes(blob))
                for r in rows:
                    for n, _ in fields:
                        cols[n].append(r[n])
            yield pd.DataFrame(
                {n: pd.Series(cols[n], dtype=pd_dtype[t]) for n, t in fields}
            )

    bin_df = spark.read.format("binaryFile").load(os.path.join(path, "*.avro"))
    return bin_df.select("content").mapInPandas(_read, ddl)


def load_avro(spark, path: str):
    """Batch avro load with graceful degradation: Spark's native avro reader
    (vectorized, full pushdown) when the spark-avro package is on the
    classpath, else this module's pure-Python OCF reader. The connector DDL
    path (table_env) calls this, so ``'format' = 'avro'`` works in both
    environments."""
    try:
        df = spark.read.format("avro").load(path)
        df.schema  # force resolution so a missing package surfaces here
        return df
    except Exception:
        return read_avro_dir(spark, path)
