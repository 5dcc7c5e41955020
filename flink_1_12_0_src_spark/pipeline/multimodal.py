"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container image has no image/audio codecs, so the *decode* step is a
clearly-marked stub (deterministic fake features / NotImplementedError for
real codecs) — but everything Spark-side is real and tested: binary column
handling, metadata structs, Arrow batch shape through mapInPandas, and the
partition-hygiene notes for large blobs.

Scale notes: blobs ride as BinaryType column values — at 100 TB keep
``spark.sql.files.maxPartitionBytes`` small enough that a batch of blobs fits
executor memory, and push feature extraction through mapInPandas so Arrow
moves bytes zero-copy into the Python worker.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

REAL_CODECS_AVAILABLE = False  # no PIL/ffmpeg in this container — stubbed


def attach_blob(df: DataFrame, id_col: str, text_col: str, mime: str = "text/plain") -> DataFrame:
    """Materialize an opaque binary column + metadata struct from a source
    column (stand-in for reading image/audio bytes)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        blob.alias("blob"),
        F.struct(
            F.octet_length(blob).alias("n_bytes"),
            F.lit(mime).alias("mime"),
        ).alias("meta"),
    )


def decode_image(blob: bytes) -> object:
    """Real decode path — requires codecs not present in this image.

    Pixel DECODING stays env-gated, but container-HEADER parsing does not
    need a codec at all: see :func:`parse_image_headers`, which reads real
    PNG/GIF/BMP header layouts with pure built-in binary functions.
    """
    raise NotImplementedError(
        "image/audio codecs are not installed in this container; "
        "extract_blob_features uses the deterministic stub instead and "
        "parse_image_headers covers the codec-free header subset"
    )


# ---------------------------------------------------------------------------
# container-header synthesis + codec-free header parsing
#
# The useful subset of image handling that needs NO codec: the dimensions,
# pixel format, and byte accounting live in the first tens of bytes of every
# mainstream container, at fixed offsets. A 100 TB crawl triages images from
# exactly these fields (drop icons/thumbnails, bucket by resolution, estimate
# decode cost) BEFORE paying a decode. Everything below is JVM-side built-in
# expressions (hex/substring/conv) over BinaryType — whole-stage-codegen'd,
# no Python in the hot path, embarrassingly parallel per row.
#
# Reference scope: brief-driven (multimodal columns), nearest reference
# analog is the pluggable format surface (flink-formats/*, e.g.
# flink-formats/flink-parquet/.../ParquetFileFormatFactory.java) — a
# row-format sniffing/parsing seam, not a §2 row.
# ---------------------------------------------------------------------------

PNG_SIG_HEX = "89504E470D0A1A0A"  # \x89 P N G \r \n \x1a \n
GIF89A_HEX = "474946383961"  # "GIF89a"
BMP_SIG_HEX = "424D"  # "BM"
# IHDR-field consumers don't validate the chunk CRC (and DuckDB, the oracle
# engine, has no crc32), so the synthesized IHDR carries a fixed placeholder.
PNG_CRC_HEX = "5AA5C3D2"


def _be_hex(col, nbytes: int):
    """Big-endian fixed-width hex rendering of a non-negative integer col."""
    return F.lpad(F.hex(col), 2 * nbytes, "0")


def _le_hex(col, nbytes: int):
    """Little-endian fixed-width hex rendering (byte pairs reversed)."""
    be = _be_hex(col, nbytes)
    return F.concat(*[F.substring(be, 2 * i + 1, 2) for i in reversed(range(nbytes))])


def synth_image_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fixture: one REAL container header per row as a
    BinaryType blob — byte-for-byte valid PNG signature+IHDR / GIF89a
    logical-screen descriptor / BMP BITMAPFILEHEADER+BITMAPINFOHEADER
    layouts (CRC placeholder aside), NOT a toy encoding. Dimensions derive
    from the id (width = 16 + id·37 mod 2048, height = 16 + id·53 mod 2048,
    format = id mod 3) so the DuckDB oracle can re-synthesize the identical
    bytes and the parse step can be verified against ground truth.

    In production this column comes from ingestion; the parse path
    (:func:`parse_image_headers`) never looks at anything but the bytes."""
    ident = F.col(id_col)
    w = (F.lit(16) + (ident * 37) % 2048).cast("bigint")
    h = (F.lit(16) + (ident * 53) % 2048).cast("bigint")
    fmtc = ident % 3
    # PNG: 8-byte signature, IHDR length (13), "IHDR", width/height 4B BE,
    # bit depth 8, color type 6 (RGBA), compression/filter/interlace 0, CRC.
    png_hex = F.concat(
        F.lit(PNG_SIG_HEX + "0000000D" + "49484452"),
        _be_hex(w, 4),
        _be_hex(h, 4),
        F.lit("0806000000" + PNG_CRC_HEX),
    )
    # GIF89a: 6-byte signature, logical screen width/height 2B LE, packed
    # field 0xF7 (GCT present, 8-bit color), background index, aspect byte.
    gif_hex = F.concat(F.lit(GIF89A_HEX), _le_hex(w, 2), _le_hex(h, 2), F.lit("F70000"))
    # BMP: "BM", real file size (54 + 4-byte-padded 24bpp rows) 4B LE,
    # reserved, pixel-data offset 54, BITMAPINFOHEADER (size 40, width/height
    # 4B LE, 1 plane, 24 bpp, BI_RGB, real image size, 2835 ppm, 0 colors).
    row_bytes = (w * 3 + 3 - (w * 3 + 3) % 4).cast("bigint")
    img_size = (row_bytes * h).cast("bigint")
    bmp_hex = F.concat(
        F.lit(BMP_SIG_HEX),
        _le_hex(img_size + 54, 4),
        F.lit("00000000" + "36000000" + "28000000"),
        _le_hex(w, 4),
        _le_hex(h, 4),
        F.lit("0100" + "1800" + "00000000"),
        _le_hex(img_size, 4),
        F.lit("130B0000" + "130B0000" + "00000000" + "00000000"),
    )
    blob = F.unhex(
        F.when(fmtc == 0, png_hex).when(fmtc == 1, gif_hex).otherwise(bmp_hex)
    )
    return df.select(ident.alias(id_col), blob.alias("blob"))


def parse_image_headers(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Codec-free image metadata: sniff the magic bytes, then read width /
    height / bits-per-pixel from each format's real header layout — PNG IHDR
    (4-byte big-endian at offsets 16/20, bit depth × channels from bytes
    24/25), GIF logical-screen descriptor (2-byte little-endian at 6/8, GCT
    depth from the packed byte), BMP BITMAPINFOHEADER (4-byte little-endian
    at 18/22, bpp at 28). Input: (id, blob BinaryType); the parse uses ONLY
    the bytes.

    Implementation: one hex() rendering of the blob, then fixed-offset
    substring + base-16 conv — all JVM built-ins inside whole-stage codegen;
    per-row, no shuffle, linear at any corpus scale."""
    hx = F.hex(F.col("blob"))

    def be(byte_off: int, nbytes: int):
        return F.conv(F.substring(hx, 2 * byte_off + 1, 2 * nbytes), 16, 10).cast("bigint")

    def le(byte_off: int, nbytes: int):
        p = 2 * byte_off + 1
        return F.conv(
            F.concat(*[F.substring(hx, p + 2 * i, 2) for i in reversed(range(nbytes))]),
            16,
            10,
        ).cast("bigint")

    is_png = F.substring(hx, 1, 16) == PNG_SIG_HEX
    is_gif = F.substring(hx, 1, 12) == GIF89A_HEX
    is_bmp = F.substring(hx, 1, 4) == BMP_SIG_HEX
    fmt = (
        F.when(is_png, "png").when(is_gif, "gif").when(is_bmp, "bmp").otherwise("unknown")
    )
    width = F.when(is_png, be(16, 4)).when(is_gif, le(6, 2)).when(is_bmp, le(18, 4))
    height = F.when(is_png, be(20, 4)).when(is_gif, le(8, 2)).when(is_bmp, le(22, 4))
    # PNG channels per color type (0 gray, 2 RGB, 3 palette, 4 gray+A, 6 RGBA)
    png_channels = (
        F.when(be(25, 1) == 2, 3).when(be(25, 1) == 4, 2).when(be(25, 1) == 6, 4).otherwise(1)
    )
    bpp = (
        F.when(is_png, be(24, 1) * png_channels)
        .when(is_gif, be(10, 1) % 8 + 1)  # packed field: GCT size bits + 1
        .when(is_bmp, le(28, 2))
        .cast("bigint")
    )
    return df.select(
        F.col(id_col),
        fmt.alias("fmt"),
        width.alias("width"),
        height.alias("height"),
        bpp.alias("bpp"),
        F.octet_length(F.col("blob")).cast("bigint").alias("n_bytes"),
    )


def resolution_audit_state(parsed: DataFrame) -> DataFrame:
    """The resolution audit's aggregate STATE: per (format, quarter-megapixel
    bucket) — image count, width/height ranges, exact integer aspect and
    decoded-byte sums. Counter/MIN/MAX/SUM state class: mergeable and
    micro-batch-boundary-invariant, so the same expression runs as a batch
    aggregate or a continuously-maintained streaming grouped aggregate
    (stream_multimodal_audit) over a parsed-header relation
    (:func:`parse_image_headers` output). State is ~|formats|·|buckets| rows
    regardless of corpus size."""
    p = parsed.withColumn("aspect_milli", F.expr("width * 1000 DIV height"))
    return p.groupBy(
        "fmt", F.expr("width * height DIV 250000").alias("mp_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min("width").alias("min_width"),
        F.max("width").alias("max_width"),
        F.min("height").alias("min_height"),
        F.max("height").alias("max_height"),
        F.sum("aspect_milli").alias("_sum_aspect"),
        F.sum(F.expr("width * height * bpp DIV 8")).alias("total_pixel_bytes"),
    )


def resolution_audit_from_state(snap: DataFrame) -> DataFrame:
    """Render tail shared by the batch audit and its streaming twin: the
    report is a pure function of the aggregate state (mean aspect in
    milli-units, micro-unit-rounded — the cross-engine-stable form), so the
    twin's snapshot report equals the batch row's exactly."""
    return snap.select(
        "fmt",
        "mp_bucket",
        "n_images",
        "min_width",
        "max_width",
        "min_height",
        "max_height",
        (
            F.round(F.col("_sum_aspect") * 1000000.0 / F.col("n_images"), 0)
            .cast("bigint")
            / F.lit(1e6)
        ).alias("avg_aspect_milli"),
        "total_pixel_bytes",
    ).orderBy("fmt", "mp_bucket")


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", frame_bytes: int = 100, stride: int = 2
) -> DataFrame:
    """Frame sampling over binary media blobs via mapInPandas.

    Treats the blob as a fixed-size-frame container (a real decoder would read
    the container index instead — stubbed, no ffmpeg here): frame k covers
    bytes [k*frame_bytes, (k+1)*frame_bytes); every ``stride``-th frame is
    sampled and summarized (offset, length, checksum). One input row → many
    frame rows, emitted from the same Arrow batch — the explode happens inside
    the Python worker, so huge blobs never round-trip through a JVM explode.

    Scale: output is |blob|/(frame_bytes·stride) rows per doc — linear, no
    shuffle; downstream per-frame featurization chains as another mapInPandas.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, offs, lens, cksum = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf["blob"]):
                n_frames = (len(blob) + frame_bytes - 1) // frame_bytes
                for k in range(0, n_frames, stride):
                    chunk = blob[k * frame_bytes : (k + 1) * frame_bytes]
                    ids.append(i)
                    fidx.append(k)
                    offs.append(k * frame_bytes)
                    lens.append(len(chunk))
                    cksum.append(sum(chunk) % 997)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "checksum": pd.Series(cksum, dtype="int32"),
                }
            )

    return df.mapInPandas(
        _sample,
        schema=f"{id_col} bigint, frame_idx int, byte_offset bigint, frame_len int, checksum int",
    )


def extract_blob_features(df: DataFrame) -> DataFrame:
    """Feature extraction over binary blobs via mapInPandas (Arrow batches).

    Stub features (deterministic): byte length, first-byte value, and a
    mod-7 bucket — the plumbing (schema, batching, binary round-trip) is the
    real thing; swap `_featurize` for a codec call in production.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "first_byte": blobs.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "bucket": blobs.map(lambda b: len(b) % 7).astype("int32"),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return df.mapInPandas(
        _featurize,
        schema="doc_id bigint, n_bytes bigint, first_byte int, bucket int, mime string",
    )


def windowed_energy(
    df: DataFrame, id_col: str = "doc_id", win: int = 64, hop: int = 32
) -> DataFrame:
    """Sliding-window RMS energy over audio-like blobs via mapInPandas — the
    voice-activity / silence-trimming primitive of an audio pipeline.

    Treats each blob byte as one PCM sample (a real decoder would produce
    int16 frames — stubbed, no audio codecs here): window w covers samples
    [w·hop, w·hop + win) (last partial window included), energy =
    round(sqrt(mean(sample²)), 6) per window, plus an ``active`` flag
    against the fixed threshold 64.0 (a quarter of the 0-255 byte range —
    mirrored verbatim in the oracle). Windows
    materialize Python-side from the same Arrow batch — the one-row →
    many-windows explode never round-trips through a JVM explode; output is
    linear in blob bytes, no shuffle."""
    import math

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, offs, lens, rms = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf["blob"]):
                n = len(blob)
                w = 0
                while w * hop < n:
                    chunk = blob[w * hop : w * hop + win]
                    ids.append(i)
                    widx.append(w)
                    offs.append(w * hop)
                    lens.append(len(chunk))
                    rms.append(round(math.sqrt(sum(b * b for b in chunk) / len(chunk)), 6))
                    w += 1
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(widx, dtype="int32"),
                    "sample_offset": pd.Series(offs, dtype="int64"),
                    "window_len": pd.Series(lens, dtype="int32"),
                    "rms_energy": pd.Series(rms, dtype="float64"),
                }
            )

    out_schema = (
        f"{id_col} bigint, window_idx int, sample_offset bigint, "
        "window_len int, rms_energy double"
    )
    from pyspark.sql import functions as F

    return df.mapInPandas(_energy, schema=out_schema).withColumn(
        "active", F.col("rms_energy") >= 64.0
    )
