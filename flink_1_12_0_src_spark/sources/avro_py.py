"""Pure-Python Avro Object Container File codec + Spark glue.

Spark's ``format("avro")`` needs the external spark-avro package, which is
not bundled in this environment — previously the one format row documented
as an unfixable seam. The Avro 1.x BINARY ENCODING and OCF layout are public
specification, and the subset a filesystem connector actually needs —
the long/int/double/float/string/boolean/bytes primitives and their
nullable ``["null", T]`` unions in flat record schemas, ``null`` codec,
sync-marked blocks — fits in a few hundred lines of stdlib Python, so
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
boundaries. Both spec codecs: ``null`` (the driver fixtures' default —
byte-reproducible) and ``deflate`` (raw RFC-1951 per block via zlib).
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
    "int": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "bytes": "binary",
}

# Nullable fields are the spec's two-branch union ["null", T] — the dominant
# real-world schema shape (every optional column). INTERNALLY a union field
# is carried as the string "?T": schema_json renders it back to the JSON
# union form, the wire encoding writes the branch INDEX as an avro long
# (0 = null, 1 = T) before the value, and read_header maps the JSON list
# back to "?T". Only the null-first ordering is supported — the form every
# mainstream writer emits; a [T, "null"] schema raises loudly rather than
# decoding branches against the wrong index.


def _base_type(typ: str) -> str:
    return typ[1:] if typ.startswith("?") else typ


def _is_null_value(v) -> bool:
    """None, float NaN (pandas' null for float columns), or pandas NA —
    without importing pandas (the codec half stays stdlib-only)."""
    if v is None:
        return True
    if isinstance(v, float) and v != v:
        return True
    return type(v).__name__ == "NAType"


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
    if typ.startswith("?"):
        # union ["null", T]: branch index as a long, then the branch value
        if _is_null_value(val):
            _append_long(out, 0)
            return
        _append_long(out, 1)
        typ = typ[1:]
    if typ == "long" or typ == "int":  # int shares the zigzag-varint wire form
        _append_long(out, val)
    elif typ == "string":
        _append_string(out, val)
    elif typ == "double":
        out += struct.pack("<d", float(val))
    elif typ == "float":
        out += struct.pack("<f", float(val))
    elif typ == "boolean":
        out.append(1 if val else 0)
    elif typ == "bytes":
        b = bytes(val)
        _append_long(out, len(b))
        out += b
    else:
        raise NotImplementedError(f"avro type not in the supported subset: {typ}")


def schema_json(fields: list[tuple[str, str]], name: str = "row") -> str:
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [
                {"name": f, "type": ["null", t[1:]] if t.startswith("?") else t}
                for f, t in fields
            ],
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


def encode_header(
    fields: list[tuple[str, str]],
    name: str = "row",
    sync: bytes = DEFAULT_SYNC,
    codec: str = "null",
) -> bytes:
    """OCF header: magic, metadata map (schema + codec), sync marker."""
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json(fields, name), "avro.codec": codec}
    _append_long(out, len(meta))
    for k in sorted(meta):
        _append_string(out, k)
        vb = meta[k].encode("utf-8")
        _append_long(out, len(vb))
        out += vb
    out.append(0)  # map terminator (long 0)
    out += sync
    return bytes(out)


def encode_block(
    rows,
    fields: list[tuple[str, str]],
    sync: bytes = DEFAULT_SYNC,
    codec: str = "null",
) -> bytes:
    """One sync-marked OCF block: (count, byte size, body, sync) — with
    ``deflate``, the body is the record bytes compressed as RAW RFC-1951
    (no zlib header), per spec. Blocks are independent, so a writer can
    append one per Arrow batch — O(batch) memory, never O(partition)."""
    rows = list(rows)
    body = bytearray()
    for row in rows:
        for (_, typ), val in zip(fields, row):
            _append_value(body, typ, val)
    if codec == "deflate":
        import zlib

        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = c.compress(bytes(body)) + c.flush()
    elif codec != "null":
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    out = bytearray()
    _append_long(out, len(rows))
    _append_long(out, len(body))
    out += body
    out += sync
    return bytes(out)


def encode_ocf(
    rows,
    fields: list[tuple[str, str]],
    name: str = "row",
    sync: bytes = DEFAULT_SYNC,
    records_per_block: int = 4096,
    codec: str = "null",
) -> bytes:
    """Whole-file convenience form: header + blocks."""
    rows = list(rows)
    out = bytearray(encode_header(fields, name, sync, codec))
    for start in range(0, len(rows), records_per_block):
        out += encode_block(
            rows[start : start + records_per_block], fields, sync, codec
        )
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


def read_header(blob: bytes) -> tuple[list[tuple[str, str]], bytes, int, str]:
    """Parse just the OCF header: returns (fields, sync marker, body offset,
    codec). Used by the Spark reader to learn the schema from ONE file
    driver-side without decoding any record block."""
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta, i = _read_meta(blob, 4)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    fields: list[tuple[str, str]] = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            if len(t) == 2 and t[0] == "null" and t[1] in AVRO_TO_SPARK:
                t = "?" + t[1]
            else:
                raise NotImplementedError(
                    f"avro union not in the supported subset (only "
                    f"['null', T] with T in {sorted(AVRO_TO_SPARK)}): {t}"
                )
        elif t not in AVRO_TO_SPARK:
            raise NotImplementedError(f"avro type not in the supported subset: {t}")
        fields.append((f["name"], t))
    sync = blob[i : i + 16]
    return fields, sync, i + 16, codec


def decode_ocf(blob: bytes) -> tuple[list[tuple[str, str]], list[dict]]:
    """Full decode: (fields, record dicts). Verifies block byte sizes and
    sync markers — a corrupt or truncated block raises, it does not yield
    silently wrong rows. Handles both spec codecs: ``null`` and ``deflate``
    (raw RFC-1951, inflated per block before record parsing)."""
    fields, sync, i, codec = read_header(blob)
    rows: list[dict] = []
    while i < len(blob):
        cnt, i = _read_long(blob, i)
        size, i = _read_long(blob, i)
        body = blob[i : i + size]
        if len(body) != size:
            raise ValueError(f"avro block truncated at {i}: {len(body)} < {size}")
        i += size
        if blob[i : i + 16] != sync:
            raise ValueError(f"avro sync marker mismatch at {i}")
        i += 16
        if codec == "deflate":
            import zlib

            body = zlib.decompressobj(-15).decompress(body)
        j = 0
        for _ in range(cnt):
            rec: dict = {}
            for fname, ftyp in fields:
                typ = ftyp
                if typ.startswith("?"):
                    idx, j = _read_long(body, j)
                    if idx == 0:
                        rec[fname] = None
                        continue
                    if idx != 1:
                        raise ValueError(
                            f"avro union branch index must be 0 or 1, got "
                            f"{idx} at body offset {j}"
                        )
                    typ = typ[1:]
                if typ == "long" or typ == "int":
                    v, j = _read_long(body, j)
                elif typ == "string":
                    ln, j = _read_long(body, j)
                    v = body[j : j + ln].decode("utf-8")
                    j += ln
                elif typ == "double":
                    (v,) = struct.unpack_from("<d", body, j)
                    j += 8
                elif typ == "float":
                    (v,) = struct.unpack_from("<f", body, j)
                    j += 4
                elif typ == "bytes":
                    ln, j = _read_long(body, j)
                    v = bytes(body[j : j + ln])
                    j += ln
                elif typ == "boolean":
                    bb = body[j]
                    if bb not in (0, 1):
                        # keep the decoder's strict corrupt-data posture: a
                        # nonzero-but-not-1 byte is a framing error, not False
                        raise ValueError(
                            f"avro boolean byte must be 0 or 1, got {bb} at "
                            f"body offset {j}"
                        )
                    v = bb == 1
                    j += 1
                rec[fname] = v
            rows.append(rec)
        if j != len(body):
            raise ValueError(
                f"avro block size mismatch: consumed {j} of {len(body)} body bytes"
            )
    return fields, rows


# ---------------------------------------------------------------------------
# Spark glue: Arrow-batched write/read over BinaryType files
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {v: k for k, v in AVRO_TO_SPARK.items()}

_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length bigint, content binary"
)


def fields_from_spark_schema(schema) -> list[tuple[str, str]]:
    """Map a Spark StructType onto the supported avro field subset —
    faithfully: a nullable Spark column becomes the spec's ["null", T]
    union (internally "?T"), a NOT NULL column the bare primitive."""
    out: list[tuple[str, str]] = []
    for f in schema.fields:
        s = f.dataType.simpleString()
        if s not in _SPARK_TO_AVRO:
            raise NotImplementedError(
                f"column {f.name!r}: spark type {s} has no mapping in the "
                f"pure-Python avro subset ({sorted(_SPARK_TO_AVRO)})"
            )
        t = _SPARK_TO_AVRO[s]
        out.append((f.name, ("?" + t) if f.nullable else t))
    return out


def write_avro_dir(
    df, path: str, fields: list[tuple[str, str]], mode: str = "overwrite"
) -> int:
    """Stage a DataFrame as ``.avro`` OCF files, ONE per input partition.
    Each mapInPandas task streams its Arrow batches straight into
    sync-marked blocks of an open file — O(batch) memory, never
    O(partition) — under an ATTEMPT-SAFE naming scheme: the final name is
    deterministic per (write call, partition), written via temp-file +
    atomic rename, so a retried or speculative task REPLACES its own output
    instead of duplicating rows (the poor man's commit protocol; Spark's
    own sinks do the directory-level equivalent). ``mode='overwrite'``
    clears prior ``.avro`` files first (the staging/cache shape);
    ``'append'`` is the INSERT INTO shape — each call's fresh job id keeps
    its files distinct from prior inserts. Returns rows written and drops
    ``_SUCCESS`` like Spark's file sinks."""
    import glob as _glob

    import pandas as pd

    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    os.makedirs(path, exist_ok=True)
    if mode == "overwrite":
        for f in _glob.glob(os.path.join(path, "*.avro")):
            os.remove(f)
        marker = os.path.join(path, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)
    cols = [f for f, _ in fields]
    job = uuid.uuid4().hex[:12]  # chosen once, driver-side

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        final = os.path.join(path, f"part-{job}-{pid:05d}.avro")
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        n = 0
        out = None
        try:
            for pdf in batches:
                rows = list(pdf[cols].itertuples(index=False, name=None))
                if not rows:
                    continue
                if out is None:
                    out = open(tmp, "wb")
                    out.write(encode_header(fields))
                out.write(encode_block(rows, fields))
                n += len(rows)
            if out is not None:
                out.close()
                os.replace(tmp, final)
        finally:
            if out is not None and not out.closed:
                out.close()
            if os.path.exists(tmp):
                os.remove(tmp)
        yield pd.DataFrame({"n": pd.Series([n], dtype="int64")})

    total = (
        df.select(*cols)
        .mapInPandas(_write, "n bigint")
        .groupBy()
        .sum("n")
        .collect()[0][0]
    )
    if not _glob.glob(os.path.join(path, "*.avro")):
        # Zero rows written (and, under append, no prior files either):
        # emit ONE header-only OCF file so the directory stays a readable
        # empty typed relation — the native spark-avro writer does the
        # schema-bearing-file equivalent; without this, the next
        # _probe_fields would raise FileNotFoundError on a directory that
        # legitimately holds an empty table.
        with open(os.path.join(path, f"part-{job}-00000.avro"), "wb") as f:
            f.write(encode_header(fields))
    open(os.path.join(path, "_SUCCESS"), "w").close()
    return int(total or 0)


def _probe_fields(path: str) -> list[tuple[str, str]]:
    """Schema from ONE file's header, driver-side. Reads the whole file —
    the header is tiny relative to any real container, and a fixed-size
    probe would truncate a wide schema's metadata mid-JSON."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(path, "*.avro")))
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as f:
        fields, _, _, _ = read_header(f.read())
    return fields


def _decode_mapper(fields: list[tuple[str, str]], with_metadata: bool):
    import pandas as pd

    # union fields need NULL-capable pandas dtypes: the Int64/Float64/boolean
    # extension arrays round-trip None through Arrow into Spark NULLs, where
    # the numpy int64/bool dtypes would reject or coerce them
    pd_dtype = {
        "long": "int64", "double": "float64", "boolean": "bool", "string": "object",
        "int": "int32", "float": "float32", "bytes": "object",
        "?long": "Int64", "?double": "Float64", "?boolean": "boolean", "?string": "object",
        "?int": "Int32", "?float": "Float32", "?bytes": "object",
    }

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {n: [] for n, _ in fields}
            meta: list[dict] = []
            for blob, p, mt, ln in zip(
                pdf["content"], pdf["path"], pdf["modificationTime"], pdf["length"]
            ):
                ffields, rows = decode_ocf(bytes(blob))
                if ffields != fields:
                    # A later file with evolved/renamed fields would
                    # otherwise surface as an opaque executor KeyError;
                    # name the file and both schemas instead.
                    raise ValueError(
                        f"avro schema drift in {p}: file declares "
                        f"{ffields}, reader was bound to {fields} (probed "
                        "at scan start) — re-create the scan to pick up "
                        "the evolved schema"
                    )
                for r in rows:
                    for n, _ in fields:
                        cols[n].append(r[n])
                if with_metadata:
                    meta.extend(
                        {
                            "file_path": p,
                            "file_name": os.path.basename(p),
                            "file_size": int(ln),
                            "file_modification_time": mt,
                        }
                        for _ in rows
                    )
            data = {n: pd.Series(cols[n], dtype=pd_dtype[t]) for n, t in fields}
            if with_metadata:
                data["_metadata"] = pd.Series(meta, dtype="object")
            yield pd.DataFrame(data)

    return _read


def _decode_ddl(fields: list[tuple[str, str]], with_metadata: bool) -> str:
    ddl = ", ".join(f"{n} {AVRO_TO_SPARK[_base_type(t)]}" for n, t in fields)
    if with_metadata:
        # mirrors the hidden _metadata struct of Spark's native file
        # sources, so FLIP-107 METADATA columns resolve identically on the
        # fallback path (table_env drops the visible struct after applying)
        ddl += (
            ", _metadata struct<file_path:string,file_name:string,"
            "file_size:bigint,file_modification_time:timestamp>"
        )
    return ddl


def read_avro_dir(spark, path: str, with_metadata: bool = False):
    """Read a directory of ``.avro`` OCF files as a typed DataFrame: the
    schema comes from one file's header (:func:`_probe_fields`); record
    decoding runs distributed via binaryFile + mapInPandas (Arrow moves the
    blobs zero-copy into the Python workers). Per-file parallelism — the
    split unit of a filesystem scan. ``with_metadata`` appends a
    ``_metadata`` struct built from the binaryFile columns (path, length,
    modificationTime) for FLIP-107 METADATA resolution."""
    fields = _probe_fields(path)
    bin_df = spark.read.format("binaryFile").load(os.path.join(path, "*.avro"))
    return bin_df.select("path", "modificationTime", "length", "content").mapInPandas(
        _decode_mapper(fields, with_metadata), _decode_ddl(fields, with_metadata)
    )


def read_avro_stream(spark, path: str, options: dict | None = None):
    """STREAMING read of an ``.avro`` directory: binaryFile file-stream
    source (explicit schema — streaming sources require one) + the same
    Arrow-batched decode. Like every file-stream schema story, at least one
    file must exist at start so the record schema can be probed."""
    fields = _probe_fields(path)
    reader = spark.readStream.format("binaryFile").schema(_BINARYFILE_SCHEMA)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    bin_df = reader.load(os.path.join(path, "*.avro"))
    return bin_df.select("path", "modificationTime", "length", "content").mapInPandas(
        _decode_mapper(fields, False), _decode_ddl(fields, False)
    )


def _spark_avro_unavailable(exc: Exception) -> bool:
    """True only for the missing-package class of errors — anything else
    (bad path, permissions, corrupt files) must propagate with its real
    cause instead of being masked by a fallback retry."""
    msg = str(exc)
    return (
        "AVRO_NOT_LOADED" in msg
        or "Failed to find data source: avro" in msg
        or "Failed to find the data source: avro" in msg
    )


def load_avro(spark, path: str, with_metadata: bool = False, options: dict | None = None):
    """Batch avro load with graceful degradation: Spark's native avro reader
    (vectorized, full pushdown, hidden ``_metadata``) when the spark-avro
    package is on the classpath, else this module's pure-Python OCF reader.
    The connector DDL path (table_env) calls this, so
    ``'format' = 'avro'`` works in both environments. DDL-declared reader
    ``options`` are applied to the native reader (avroSchema,
    datetimeRebaseMode, ...); the fallback's OCF framing defines no reader
    options for the supported flat subset, so they are no-ops there."""
    try:
        reader = spark.read.format("avro")
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        df = reader.load(path)
        df.schema  # force resolution so a missing package surfaces here
        return df
    except Exception as e:
        if not _spark_avro_unavailable(e):
            raise
        return read_avro_dir(spark, path, with_metadata=with_metadata)


def stream_avro(spark, path: str, options: dict | None = None):
    """Streaming counterpart of :func:`load_avro`: native readStream avro
    when available (with the DDL options applied), else the binaryFile +
    mapInPandas decoder (options forwarded to its file-stream source —
    maxFilesPerTrigger and friends)."""
    try:
        reader = spark.readStream.format("avro")
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        df = reader.load(path)
        df.schema
        return df
    except Exception as e:
        if not _spark_avro_unavailable(e):
            raise
        return read_avro_stream(spark, path, options)


def save_avro(
    df, path: str, mode: str = "append", partition_by=None, options: dict | None = None
) -> None:
    """Write counterpart of :func:`load_avro`: native spark-avro writer when
    on the classpath (DDL ``options`` applied — compression and friends),
    else :func:`write_avro_dir` over the DataFrame's own schema
    (supported-subset types only; write options are no-ops on the fallback,
    whose block layout is fixed). Partitioned layout needs the native
    writer — the fallback refuses loudly rather than flattening."""
    try:
        writer = df.write.format("avro").mode(mode)
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
        return
    except Exception as e:
        if not _spark_avro_unavailable(e):
            raise
    if partition_by:
        raise NotImplementedError(
            "PARTITIONED BY with 'format'='avro' needs the native spark-avro "
            "writer (not on this classpath); the pure-Python fallback writes "
            "flat directories only"
        )
    write_avro_dir(df, path, fields_from_spark_schema(df.schema), mode=mode)
