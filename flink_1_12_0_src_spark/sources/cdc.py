"""CDC format decoders: debezium-json and canal-json → changelog rows
(SURVEY.md §2.1 formats row; reference: flink-formats/flink-json
src/main/java/org/apache/flink/formats/json/debezium/
DebeziumJsonDeserializationSchema.java and …/canal/
CanalJsonDeserializationSchema.java).

Each decoder turns a DataFrame of raw JSON strings (what a Kafka value column
carries) into typed rows with an explicit ``rowkind`` column — the Spark-side
materialization of Flink's RowKind header (+I/+U/-D; RowKind.java:35-58) —
plus the source version column used for ordering. Downstream,
``operators.dedup.changelog_normalize`` collapses the changelog to current
state (StreamExecChangelogNormalize), which is how Spark consumes retractions:
normalize-then-aggregate per micro-batch instead of native -U/+U flow
(SURVEY §1.1 mapping strategy).

Everything is built-in JVM expressions (from_json / explode) — no Python in
the row path, so the decode scales like any other columnar projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_KIND_INSERT, _KIND_UPDATE, _KIND_DELETE = "+I", "+U", "-D"


def parse_debezium(raw: DataFrame, json_col: str, payload_schema_ddl: str) -> DataFrame:
    """Decode debezium-json envelopes {before, after, op, ts_ms}.

    op mapping (DebeziumJsonDeserializationSchema): c/r → +I, u → +U (after
    image; the -U before-image is dropped — Spark consumers re-aggregate from
    normalized state), d → -D (payload = before image).
    Output: payload columns + rowkind + ts_ms + is_delete.
    """
    env = f"struct<before:struct<{payload_schema_ddl}>,after:struct<{payload_schema_ddl}>,op:string,ts_ms:bigint>"
    p = raw.select(F.from_json(F.col(json_col), env).alias("m"))
    return p.select(
        F.when(F.col("m.op") == "d", F.col("m.before"))
        .otherwise(F.col("m.after"))
        .alias("payload"),
        F.when(F.col("m.op").isin("c", "r"), _KIND_INSERT)
        .when(F.col("m.op") == "u", _KIND_UPDATE)
        .when(F.col("m.op") == "d", _KIND_DELETE)
        .alias("rowkind"),
        F.col("m.ts_ms").alias("ts_ms"),
        (F.col("m.op") == "d").alias("is_delete"),
    ).select("payload.*", "rowkind", "ts_ms", "is_delete")


def parse_canal(raw: DataFrame, json_col: str, payload_schema_ddl: str) -> DataFrame:
    """Decode canal-json envelopes {data: [...], type, es}.

    type mapping (CanalJsonDeserializationSchema): INSERT → +I, UPDATE → +U,
    DELETE → -D; ``data`` batches several rows per message → explode.
    """
    env = f"struct<data:array<struct<{payload_schema_ddl}>>,type:string,es:bigint>"
    p = raw.select(F.from_json(F.col(json_col), env).alias("m"))
    return (
        p.select(
            F.explode("m.data").alias("payload"),
            F.col("m.type").alias("t"),
            F.col("m.es").alias("es"),
        )
        .select(
            "payload.*",
            F.when(F.col("t") == "INSERT", _KIND_INSERT)
            .when(F.col("t") == "UPDATE", _KIND_UPDATE)
            .when(F.col("t") == "DELETE", _KIND_DELETE)
            .alias("rowkind"),
            F.col("es").alias("ts_ms"),
            (F.col("t") == "DELETE").alias("is_delete"),
        )
    )


_KIND_UPDATE_BEFORE = "-U"


def parse_maxwell(
    raw: DataFrame,
    json_col: str,
    payload_schema_ddl: str,
    emit_update_before: bool = False,
) -> DataFrame:
    """Decode maxwell-json envelopes {data, old, type, ts}
    (MaxwellJsonDeserializationSchema.java:54-123, new format in Flink 1.12).

    type mapping: insert → +I, update → +U (after image = ``data``),
    delete → -D (``data`` is the deleted row). Maxwell's ``old`` field is a
    PARTIAL before image — only changed fields are non-null — so the full
    -U before image is ``old`` merged over ``data`` field-by-field
    (coalesce; MaxwellJsonDeserializationSchema.java:106-119). By default
    the -U rows are dropped (this package's consumers re-aggregate from
    normalized state, same policy as parse_debezium); pass
    ``emit_update_before=True`` to emit them, exactly reconstructing the
    reference's UPDATE_BEFORE/UPDATE_AFTER pair.

    ``ts`` is Maxwell's epoch-seconds commit time → exposed as ``ts_ms``.
    """
    env = (
        f"struct<data:struct<{payload_schema_ddl}>,old:struct<{payload_schema_ddl}>,"
        "type:string,ts:bigint>"
    )
    # split top-level fields only — parameterized types (decimal(10,2),
    # struct<...>) contain commas of their own
    fields, depth, cur = [], 0, ""
    for ch in payload_schema_ddl:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        fields.append(cur)
    fields = [f.strip().split(":")[0].strip() for f in fields]
    p = raw.select(F.from_json(F.col(json_col), env).alias("m"))
    after = p.select(
        F.col("m.data").alias("payload"),
        F.when(F.col("m.type") == "insert", _KIND_INSERT)
        .when(F.col("m.type") == "update", _KIND_UPDATE)
        .when(F.col("m.type") == "delete", _KIND_DELETE)
        .alias("rowkind"),
        (F.col("m.ts") * 1000).alias("ts_ms"),
        (F.col("m.type") == "delete").alias("is_delete"),
    ).select("payload.*", "rowkind", "ts_ms", "is_delete")
    if not emit_update_before:
        return after
    before = (
        p.filter(F.col("m.type") == "update")
        .select(
            F.struct(
                *[
                    F.coalesce(F.col(f"m.old.{f}"), F.col(f"m.data.{f}")).alias(f)
                    for f in fields
                ]
            ).alias("payload"),
            F.lit(_KIND_UPDATE_BEFORE).alias("rowkind"),
            (F.col("m.ts") * 1000).alias("ts_ms"),
            F.lit(False).alias("is_delete"),
        )
        .select("payload.*", "rowkind", "ts_ms", "is_delete")
    )
    return after.unionAll(before)
