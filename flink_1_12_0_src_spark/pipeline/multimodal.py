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
    """Real decode path — requires codecs not present in this image."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this container; "
        "extract_blob_features uses the deterministic stub instead"
    )


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
