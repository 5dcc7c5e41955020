"""Deduplication / changelog-normalize primitives (SURVEY.md §2.5).

Reference: StreamExecDeduplicate.scala:58 (keep-first / keep-last per key by
time), StreamExecChangelogNormalize.scala:46 (collapse an upsert stream to the
latest row per primary key — what the upsert-kafka source needs).

Spark-first: keep-first on a stream is the built-in ``dropDuplicates`` /
``dropDuplicatesWithinWatermark``; keep-last is an update-mode ``max_by(struct)``
aggregation — both scale as ordinary keyed state. Batch forms use one window
pass (row_number) or the same max_by agg; max_by avoids the full sort and is
the 100 TB-friendly choice when only the surviving row is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def deduplicate(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    keep: str = "first",
    tiebreak: str | None = None,
) -> DataFrame:
    """Keep the first/last row per key ordered by ``order_col`` (+ optional
    unique tiebreak for full determinism).

    Implemented as min_by/max_by over a struct of (order, tiebreak, payload):
    a single two-phase hash aggregation — no global sort, no window shuffle of
    the full payload, partial aggregation map-side. Works identically on
    batch and (update-mode) streaming DataFrames.
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be first|last, got {keep!r}")
    order_cols = [order_col] + ([tiebreak] if tiebreak else [])
    payload = [c for c in df.columns if c not in keys]
    ordk = F.struct(*[F.col(c) for c in order_cols])
    agg = F.min_by if keep == "first" else F.max_by
    packed = df.groupBy(*keys).agg(
        agg(F.struct(*[F.col(c) for c in payload]), ordk).alias("__row")
    )
    return packed.select(*keys, *[F.col(f"__row.{c}").alias(c) for c in payload])


def changelog_normalize(
    upserts: DataFrame,
    primary_key: list[str],
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Normalize an upsert/CDC stream to current state: latest version per PK,
    dropping keys whose latest record is a delete (Flink ChangelogNormalize +
    DropUpdateBefore). ``delete_col``: optional boolean column marking -D rows."""
    latest = deduplicate(upserts, primary_key, version_col, keep="last")
    if delete_col is not None:
        latest = latest.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    return latest
