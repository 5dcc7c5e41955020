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
