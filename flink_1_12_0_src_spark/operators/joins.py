"""Temporal (as-of) join and lookup join — the two §2.3 join gaps.

Reference semantics:
- Temporal join ``FOR SYSTEM_TIME AS OF l.rowtime`` — each left row joins the
  version of the right (versioned) table valid at its event time:
  flink-table/.../plan/nodes/physical/stream/StreamExecTemporalJoin.scala:56,
  runtime …/operators/join/temporal/TemporalRowTimeJoinOperator.java (427 LoC):
  keeps right rows sorted by time per key, binary-searches the latest version
  ≤ left rowtime.
- Lookup join — per-row lookup into an external dimension with optional async:
  …/stream/StreamExecLookupJoin.scala:38, LookupJoinRunner.java:36.

Spark-first design (NOT a port): the as-of join is a *union + single window
pass*: tag both inputs, sort per key by (time, side), and carry the latest
right payload forward with last(..., ignorenulls=True). One shuffle, no
per-group pandas, no driver involvement — scales to arbitrary key cardinality
and survives skew via AQE. This matches pandas ``merge_asof`` semantics
(direction='backward', allow_exact_matches=True).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_prefix: str = "",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` per key (direction='backward'; 'forward' =
    earliest right row ≥ left time).

    Returns all left columns plus the right's non-key, non-time columns
    (optionally prefixed), plus ``<prefix><right_time>`` — NULL when no match
    (left-outer semantics, as Flink's temporal LEFT join).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload = [c for c in right.columns if c not in on and c != right_time]
    out_time = f"{right_prefix}{right_time}"
    out_payload = {c: f"{right_prefix}{c}" for c in payload}

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_payload[c]) for c in payload],
        F.lit(None).cast(right.schema[right_time].dataType).alias(out_time),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.col(right_time).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(out_payload[c]) for c in payload],
        F.col(right_time).alias(out_time),
    ).select(l_tag.columns)  # align column order for union

    combined = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows sort before left at equal ts → exact matches visible
        w = W.partitionBy(*on).orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
    else:
        w = W.partitionBy(*on).orderBy(F.col(_TS).desc(), F.col(_SIDE).asc())
    w = w.rowsBetween(W.unboundedPreceding, 0)

    filled = combined.select(
        *[c for c in left.columns],
        F.col(_SIDE),
        F.col(_TS),
        *[F.last(out_payload[c], ignorenulls=True).over(w).alias(out_payload[c]) for c in payload],
        F.last(out_time, ignorenulls=True).over(w).alias(out_time),
    )

    result = filled.filter(F.col(_SIDE) == 1).drop(_SIDE, _TS)

    if tolerance_seconds is not None:
        bound = F.col(left_time).cast("double") - F.col(out_time).cast("double")
        in_tol = (bound <= tolerance_seconds) if direction == "backward" else (-bound <= tolerance_seconds)
        # out-of-tolerance matches are nulled, preserving left-outer shape
        null_payload = [
            F.when(in_tol, F.col(out_payload[c])).alias(out_payload[c]) for c in payload
        ]
        result = result.select(
            *[c for c in left.columns],
            *null_payload,
            F.when(in_tol, F.col(out_time)).alias(out_time),
        )
    return result


def lookup_join(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | None = None,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Lookup join against a dimension table (Flink LookupJoinRunner.java:36 /
    ``FOR SYSTEM_TIME AS OF proctime``).

    In micro-batch Spark the dimension is re-read per batch when used under
    foreachBatch, which reproduces Flink's per-record-lookup freshness at
    micro-batch granularity. Dimension side broadcasts by default — at 100 TB
    the fact side never shuffles for this join.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)
