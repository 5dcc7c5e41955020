"""Connector option translation: Flink WITH-options → Spark reader/writer.

Reference connector factories (SURVEY.md §2.1):
- filesystem: FileSystemTableFactory.java (flink-table-runtime-blink
  .../table/filesystem/) with formats csv/json/parquet/orc/avro
  (flink-formats/flink-{csv,json,parquet,orc,avro}; e.g.
  CsvFormatFactory.java:121 for the csv.* option keys);
- kafka / upsert-kafka: KafkaDynamicTableFactory.java:96,
  UpsertKafkaDynamicTableFactory.java:72;
- datagen / print / blackhole test connectors.

Spark side: csv/json/parquet/orc are built-in DSv2 sources, so filter/
projection/partition pushdown and vectorized parquet/orc reads come for
free. Kafka needs the spark-sql-kafka package on the classpath — the option
mapping is implemented and unit-tested; reads are gated on availability.
The avro *format* prefers spark-avro when present and otherwise reads/writes
through the in-repo pure-Python Object Container File codec
(sources/avro_py.py — varint/zigzag wire format, sync-marked blocks, null
codec; Arrow-batched via binaryFile + mapInPandas), so
``'format' = 'avro'`` works even without the package.

At 100 TB the interesting knobs are files.maxPartitionBytes (split sizing)
and partitioned layout (PARTITIONED BY → directory partitioning → partition
pruning); both flow straight through this mapping.
"""

from __future__ import annotations

SUPPORTED_CONNECTORS = (
    "filesystem",
    "kafka",
    "upsert-kafka",
    "datagen",
    "print",
    "blackhole",
)

_FORMATS = {"csv": "csv", "json": "json", "parquet": "parquet", "orc": "orc", "avro": "avro"}

# Flink csv.* / json.* option keys → Spark reader option keys
_CSV_OPTS = {
    "csv.field-delimiter": "sep",
    "csv.ignore-parse-errors": "mode",  # true → PERMISSIVE (Spark default), false → FAILFAST
    "csv.null-literal": "nullValue",
    "csv.quote-character": "quote",
    "csv.escape-character": "escape",
    "csv.allow-comments": "comment",
}
_JSON_OPTS = {
    "json.ignore-parse-errors": "mode",
    "json.timestamp-format.standard": None,  # ISO-8601 is Spark's default
}


def _format_options(fmt: str, opts: dict[str, str]) -> dict[str, str]:
    out: dict[str, str] = {}
    table = _CSV_OPTS if fmt == "csv" else _JSON_OPTS if fmt == "json" else {}
    for k, v in opts.items():
        if k in table:
            spark_key = table[k]
            if spark_key is None:
                continue
            if k.endswith("ignore-parse-errors"):
                out["mode"] = "PERMISSIVE" if v.lower() == "true" else "FAILFAST"
            else:
                out[spark_key] = v
    if fmt == "csv":
        # Flink csv format has no header; first line is data
        out.setdefault("header", "false")
    return out


def reader_config(options: dict[str, str]) -> dict:
    """Translate WITH-options into {format, path, options, streaming_capable}.

    Raises on unknown connectors — mirroring Flink's factory discovery error.
    """
    conn = options.get("connector")
    if conn == "filesystem":
        fmt = _FORMATS.get(options.get("format", "parquet"))
        if fmt is None:
            raise ValueError(f"unsupported filesystem format: {options.get('format')}")
        return {
            "format": fmt,
            "path": options["path"],
            "options": _format_options(fmt, options),
            "streaming_capable": True,
        }
    if conn in ("kafka", "upsert-kafka"):
        kafka_opts = {
            "kafka.bootstrap.servers": options.get("properties.bootstrap.servers", ""),
            "subscribe": options.get("topic", ""),
            "startingOffsets": {
                "earliest-offset": "earliest",
                "latest-offset": "latest",
            }.get(options.get("scan.startup.mode", "latest-offset"), "latest"),
        }
        return {
            "format": "kafka",
            "path": None,
            "options": kafka_opts,
            "streaming_capable": True,
            # upsert-kafka is a keyed changelog: reads must be followed by
            # changelog_normalize(pk, offset) — see operators/dedup.py
            "changelog_by_key": conn == "upsert-kafka",
        }
    if conn == "datagen":
        # DataGenTableSourceFactory.java:55-145: per-field generators keyed
        # fields.<name>.{kind,start,end,min,max,length}; 'sequence' emits
        # start..end and terminates when exhausted, 'random' never does.
        # Bounded iff number-of-rows is set (DataGenTableSource.java:63) —
        # or every field is a finite sequence, which exhausts the source.
        import re as _re

        fields: dict[str, dict[str, str]] = {}
        for k, v in options.items():
            m = _re.match(r"fields\.(\w+)\.(kind|start|end|min|max|length)$", k)
            if m:
                fields.setdefault(m.group(1), {})[m.group(2)] = v
        return {
            "format": "rate",
            "path": None,
            "options": {"rowsPerSecond": options.get("rows-per-second", "10")},
            "streaming_capable": True,
            "datagen_fields": fields,
            "number_of_rows": options.get("number-of-rows"),
        }
    raise ValueError(f"unknown connector: {conn!r} (supported: {SUPPORTED_CONNECTORS})")


def _parse_mem(v: str) -> int:
    """Parse Flink MemorySize strings ('128MB', '64 kb', '1g') to bytes."""
    import re as _re

    m = _re.match(r"\s*(\d+)\s*([kmgt]?)b?\s*$", v, _re.I)
    if not m:
        raise ValueError(f"unparseable memory size: {v!r}")
    return int(m.group(1)) * 1024 ** ("", "k", "m", "g", "t").index(m.group(2).lower())


def writer_config(options: dict[str, str]) -> dict:
    """Translate WITH-options into a sink config {format, path, options}."""
    conn = options.get("connector")
    if conn == "filesystem":
        flink_fmt = options.get("format", "parquet")
        fmt = _FORMATS.get(flink_fmt)
        out_opts = _format_options(fmt, options)
        # sink compression (flink-formats parquet.compression / orc.compress;
        # row formats via the flink-compress codec extension) → Spark's
        # per-format "compression" writer option; reads auto-detect the codec
        comp = options.get(f"{flink_fmt}.compression") or (
            options.get("orc.compress") if fmt == "orc" else None
        )
        if comp:
            out_opts["compression"] = comp.lower()
        return {
            "format": fmt,
            "path": options["path"],
            "options": out_opts,
            # streaming-sink small-file compaction (FileSystemOptions.java:
            # 204-214 AUTO_COMPACTION / COMPACTION_FILE_SIZE, new in 1.12)
            "auto_compaction": options.get("auto-compaction", "false").lower() == "true",
            "compaction_file_size": _parse_mem(
                options.get("compaction.file-size", "128MB")
            ),
        }
    if conn == "print":
        return {"format": "console", "path": None, "options": {}}
    if conn == "blackhole":
        return {"format": "noop", "path": None, "options": {}}
    if conn in ("kafka", "upsert-kafka"):
        return {
            "format": "kafka",
            "path": None,
            "options": {
                "kafka.bootstrap.servers": options.get("properties.bootstrap.servers", ""),
                "topic": options.get("topic", ""),
            },
        }
    raise ValueError(f"unknown sink connector: {conn!r}")
