"""Custom stateful streaming operators — the Flink capabilities Structured
Streaming lacks as primitives, built on ``applyInPandasWithState`` (the Spark
analog of a Flink KeyedProcessFunction with keyed ValueState).

Reference semantics reproduced here:

- streaming OVER aggregate (unbounded preceding running agg):
  StreamExecOverAggregate.scala:52, RowTimeRangeBoundedPrecedingFunction.java:61
- streaming Top-N: StreamExecRank.scala:52, AppendOnlyTopNFunction.java
- count tumbling window: CountTumblingWindowAssigner.java
  (flink-table-runtime-blink .../operators/window/assigners/)

Scale notes (100 TB): state per key is O(1) scalars (running agg, count
window) or O(n) for top-n — never the full history. Input arrives hash-
partitioned by key (Spark shuffles before applyInPandasWithState), identical
to Flink's keyBy; Arrow moves batches to Python columnar, not per-row.
Determinism contract: micro-batches must arrive in event-time order per key
(see ``source.events_stream``) and rows are sorted within each batch; money
arithmetic is integer cents, so results are exactly reproducible and
oracle-comparable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _cents(series: pd.Series) -> np.ndarray:
    """Exact integer-cents view of a 2-decimal money column."""
    return np.rint(series.to_numpy(dtype="float64") * 100.0).astype("int64")


def streaming_over_running_sum(
    stream: DataFrame, key: str, order_cols: list[str], value_col: str
) -> DataFrame:
    """Streaming OVER (PARTITION BY key ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING): per-row running count + running sum.

    State per key: (row_count, running_cents) — two scalars, independent of
    history length. Each output row carries ``rn`` and ``run_sum``.
    """
    in_fields = {f.name: f for f in stream.schema.fields}
    out_schema = StructType(
        [in_fields[key]]
        + [in_fields[c] for c in order_cols]
        + [StructField(value_col, DoubleType())]
        + [StructField("rn", LongType()), StructField("run_sum", DoubleType())]
    )
    state_schema = StructType(
        [StructField("cnt", LongType()), StructField("cents", LongType())]
    )

    def fn(_key, pdf_iter, state):
        cnt, cents = state.get if state.exists else (0, 0)
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(order_cols, ignore_index=True)
        v = _cents(pdf[value_col])
        cum = cents + np.cumsum(v)
        rn = cnt + np.arange(1, len(pdf) + 1, dtype="int64")
        out = pdf[[key] + order_cols].copy()
        out[value_col] = v / 100.0
        out["rn"] = rn
        out["run_sum"] = cum / 100.0
        state.update((int(rn[-1]), int(cum[-1])))
        yield out

    return stream.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_over_time_range(
    stream: DataFrame, key: str, time_col: str, value_col: str, range_seconds: int
) -> DataFrame:
    """Streaming OVER (PARTITION BY key ORDER BY rowtime RANGE BETWEEN
    range_seconds PRECEDING AND CURRENT ROW): per-row count + sum over the
    trailing time window (Flink RowTimeRangeBoundedPrecedingFunction.java:61).

    State per key: the (ts, cents) pairs inside the trailing window span —
    bounded by data rate × range, NOT history length; rows older than
    last_ts − range are evicted each batch, exactly the reference's state
    cleanup timer. Lookups are vectorized searchsorted over the merged
    buffer."""
    in_fields = {f.name: f for f in stream.schema.fields}
    out_schema = StructType(
        [
            in_fields[key],
            in_fields[time_col],
            StructField(value_col, DoubleType()),
            StructField("cnt_range", LongType()),
            StructField("sum_range", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ts", ArrayType(LongType())),
            StructField("cents", ArrayType(LongType())),
        ]
    )
    range_us = range_seconds * 1_000_000

    def fn(key_tuple, pdf_iter, state):
        buf_ts, buf_cents = state.get if state.exists else ([], [])
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(time_col, ignore_index=True)
        new_ts = (pdf[time_col].astype("int64") // 1000).to_numpy()  # ns → µs
        new_cents = _cents(pdf[value_col])
        all_ts = np.concatenate([np.asarray(buf_ts, dtype="int64"), new_ts])
        all_cents = np.concatenate([np.asarray(buf_cents, dtype="int64"), new_cents])
        cum = np.cumsum(all_cents)
        k = len(buf_ts)
        g = np.arange(k, k + len(new_ts))
        lo = np.searchsorted(all_ts, new_ts - range_us, side="left")
        sums = cum[g] - np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        out = pd.DataFrame(
            {
                key: [key_tuple[0]] * len(new_ts),
                time_col: pdf[time_col],
                value_col: new_cents / 100.0,
                "cnt_range": (g - lo + 1).astype("int64"),
                "sum_range": sums / 100.0,
            }
        )
        keep = all_ts >= all_ts[-1] - range_us  # still reachable by future rows
        state.update(([int(x) for x in all_ts[keep]], [int(x) for x in all_cents[keep]]))
        yield out

    return stream.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_topn(
    stream: DataFrame, key: str, id_col: str, value_col: str, n: int
) -> DataFrame:
    """Streaming Top-N per key by (value DESC, id ASC): each micro-batch
    merges new rows into the retained top-n and re-emits the snapshot tagged
    with a per-key update sequence (``seq``). Downstream keeps the rows with
    the max seq per key — the changelog-to-latest-snapshot reading of Flink's
    AppendOnlyTopNFunction's +I/-D stream.

    State per key: the n retained (id, value) pairs + a counter — O(n).
    """
    out_schema = StructType(
        [
            StructField(key, stream.schema[key].dataType),
            StructField("rank", IntegerType()),
            StructField(id_col, LongType()),
            StructField(value_col, DoubleType()),
            StructField("seq", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("seq", LongType()),
            StructField("ids", ArrayType(LongType())),
            StructField("cents", ArrayType(LongType())),
        ]
    )

    def fn(key_tuple, pdf_iter, state):
        seq, ids, cents = state.get if state.exists else (0, [], [])
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf) == 0:
            return
        all_ids = np.concatenate([np.asarray(ids, dtype="int64"), pdf[id_col].to_numpy("int64")])
        all_cents = np.concatenate([np.asarray(cents, dtype="int64"), _cents(pdf[value_col])])
        order = np.lexsort((all_ids, -all_cents))[:n]
        top_ids, top_cents = all_ids[order], all_cents[order]
        seq += 1
        state.update((int(seq), [int(x) for x in top_ids], [int(x) for x in top_cents]))
        yield pd.DataFrame(
            {
                key: [key_tuple[0]] * len(top_ids),
                "rank": np.arange(1, len(top_ids) + 1, dtype="int32"),
                id_col: top_ids,
                value_col: top_cents / 100.0,
                "seq": np.full(len(top_ids), seq, dtype="int64"),
            }
        )

    return stream.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_temporal_join(
    stream: DataFrame,
    key: str,
    time_col: str,
    side_col: str,
    value_col: str,
    dim_tag: str = "D",
) -> DataFrame:
    """Streaming temporal (rowtime as-of) join — Flink StreamExecTemporalJoin /
    TemporalRowTimeJoinOperator.java: each fact row joins the dim version that
    was current at the fact's event time (version_ts ≤ fact_ts, latest wins).

    Spark has no two-input stateful operator, so both sides arrive as ONE
    tagged union stream keyed by the join key (the classic connect-streams
    encoding). Per batch (event-time ordered, the harness contract): rows
    sort by time, dim rows advance the version sequence, fact rows look up
    via searchsorted. State per key is a single (version_ts, value) pair —
    any older version is unreachable by future facts once the batch's max
    timestamp has passed it, which is exactly the reference's watermark-driven
    version cleanup.
    """
    in_fields = {f.name: f for f in stream.schema.fields}
    out_schema = StructType(
        [
            in_fields[key],
            StructField("fact_ts", in_fields[time_col].dataType),
            StructField("amount", DoubleType()),
            StructField("dim_ts", in_fields[time_col].dataType),
            StructField("setting", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("vts", LongType()), StructField("vcents", LongType())]
    )

    def fn(key_tuple, pdf_iter, state):
        vts, vcents = state.get if state.exists else (-1, 0)
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(time_col, ignore_index=True)
        ts_us = (pdf[time_col].astype("int64") // 1000).to_numpy()
        cents = _cents(pdf[value_col])
        is_dim = (pdf[side_col] == dim_tag).to_numpy()
        d_ts = np.concatenate([[vts], ts_us[is_dim]]) if vts >= 0 else ts_us[is_dim]
        d_cents = np.concatenate([[vcents], cents[is_dim]]) if vts >= 0 else cents[is_dim]
        f_ts, f_cents = ts_us[~is_dim], cents[~is_dim]
        if len(f_ts):
            if len(d_ts):
                idx = np.searchsorted(d_ts, f_ts, side="right") - 1
                hit = idx >= 0
                m_ts = d_ts[np.maximum(idx, 0)]
                m_cents = d_cents[np.maximum(idx, 0)]
            else:  # no version visible yet for this key
                hit = np.zeros(len(f_ts), dtype=bool)
                m_ts = np.zeros(len(f_ts), dtype="int64")
                m_cents = np.zeros(len(f_ts), dtype="int64")
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]] * len(f_ts),
                    "fact_ts": pd.to_datetime(f_ts, unit="us"),
                    "amount": f_cents / 100.0,
                    "dim_ts": pd.Series(
                        [pd.to_datetime(t, unit="us") if h else pd.NaT for t, h in zip(m_ts, hit)]
                    ),
                    "setting": pd.Series(
                        [c / 100.0 if h else None for c, h in zip(m_cents, hit)], dtype="float64"
                    ),
                }
            )
        if len(d_ts):
            state.update((int(d_ts[-1]), int(d_cents[-1])))
        elif vts >= 0:
            state.update((int(vts), int(vcents)))

    return stream.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_count_tumble(
    stream: DataFrame, key: str, order_cols: list[str], value_col: str, size: int
) -> DataFrame:
    """Count-based tumbling window (no Spark primitive): per key, every
    ``size`` rows in event order form one window; only complete windows are
    emitted (Flink CountTumblingWindowAssigner + purging trigger semantics —
    a trailing partial window stays in state, unemitted).

    State per key: (next_window_id, partial_count, partial_cents) — O(1).
    """
    out_schema = StructType(
        [
            StructField(key, stream.schema[key].dataType),
            StructField("win_id", LongType()),
            StructField("cnt", LongType()),
            StructField("win_sum", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("win", LongType()),
            StructField("pcnt", LongType()),
            StructField("pcents", LongType()),
        ]
    )

    def fn(key_tuple, pdf_iter, state):
        win, pcnt, pcents = state.get if state.exists else (0, 0, 0)
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(order_cols, ignore_index=True)
        v = _cents(pdf[value_col])
        total = pcnt + len(v)
        k = total // size  # complete windows this batch
        if k > 0:
            consumed = k * size - pcnt  # new rows absorbed into complete windows
            # window starts within the new rows: the first window already holds
            # pcnt rows from state, so it only takes (size - pcnt) new ones
            bounds = np.concatenate(
                [[0], np.arange(size - pcnt, consumed, size)]
            ).astype("int64")
            sums = np.add.reduceat(v[:consumed], bounds)
            sums[0] += pcents
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]] * k,
                    "win_id": win + np.arange(k, dtype="int64"),
                    "cnt": np.full(k, size, dtype="int64"),
                    "win_sum": sums / 100.0,
                }
            )
            win += k
            pcnt, pcents = total % size, int(v[consumed:].sum())
        else:
            pcnt, pcents = total, pcents + int(v.sum())
        state.update((int(win), int(pcnt), int(pcents)))

    return stream.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_dedup_ttl(
    stream: DataFrame, keys: list[str], time_col: str, ttl_seconds: int
) -> DataFrame:
    """Keep-first dedup with idle-state TTL — Flink StateTtlConfig /
    table.exec.state.ttl as used by deduplication and group-agg state
    (GroupAggFunction.java:124-134, StateTtlConfig OnReadAndWrite): a key's
    dedup state expires after ``ttl_seconds`` without traffic, so the next
    occurrence is treated as brand new and emitted again.

    Semantics are event-time deterministic: a row emits iff it is the first
    ever for its key or arrives >= ttl after the previous row of that key
    (every row refreshes the TTL, matching OnReadAndWrite update type).
    State per key is ONE timestamp, and it is physically removed by an
    event-time timer once the watermark passes last_seen + ttl — the same
    cleanup-timer mechanism as the reference's incremental state TTL.
    """
    in_fields = {f.name: f for f in stream.schema.fields}
    out_schema = StructType([in_fields[k] for k in keys] + [in_fields[time_col]])
    state_schema = StructType([StructField("last_ns", LongType())])
    ttl_ns = ttl_seconds * 1_000_000_000

    def fn(key_tuple, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()  # physical TTL cleanup (no traffic since last+ttl)
            return
        (last_ns,) = state.get if state.exists else (-1,)
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(time_col, ignore_index=True)
        ts = pdf[time_col].astype("int64").to_numpy()
        prev = np.concatenate([[last_ns], ts[:-1]])
        emit = (prev < 0) | (ts - prev >= ttl_ns)
        out = pd.DataFrame({k: [key_tuple[i]] * int(emit.sum()) for i, k in enumerate(keys)})
        out[time_col] = pdf.loc[emit, time_col].to_numpy()
        state.update((int(ts[-1]),))
        # cleanup timer at last_seen + ttl (clamped above the watermark —
        # Spark rejects timers that would fire in the past)
        state.setTimeoutTimestamp(
            max(
                int(ts[-1]) // 1_000_000 + ttl_seconds * 1000,
                state.getCurrentWatermarkMs() + 1,
            )
        )
        yield out

    return stream.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def streaming_count_slide(
    stream: DataFrame, key: str, order_cols: list[str], value_col: str, size: int, slide: int
) -> DataFrame:
    """Sliding count window (CountSlidingWindowAssigner — flink-table-runtime
    .../operators/window/assigners/): per key, window k covers event-ordered
    rows [k*slide, k*slide + size); only complete windows emit.

    State per key: total row count + the trailing ``size + slide`` (ts-ordered)
    cent values still reachable by an open window — O(size), not history.
    """
    out_schema = StructType(
        [
            StructField(key, stream.schema[key].dataType),
            StructField("win_id", LongType()),
            StructField("cnt", LongType()),
            StructField("win_sum", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("total", LongType()), StructField("tail", ArrayType(LongType()))]
    )

    def fn(key_tuple, pdf_iter, state):
        total, tail = state.get if state.exists else (0, [])
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(order_cols, ignore_index=True)
        v = np.concatenate([np.asarray(tail, dtype="int64"), _cents(pdf[value_col])])
        base = total - len(tail)  # absolute row index of v[0]
        new_total = total + len(pdf)
        # windows are complete when their last row index < new_total
        first_k = (total - size) // slide + 1 if total >= size else 0
        ks = []
        k = max(first_k, 0)
        while k * slide + size <= new_total:
            ks.append(k)
            k += 1
        if ks:
            cum = np.concatenate([[0], np.cumsum(v)])
            lo = np.array([k * slide - base for k in ks])
            hi = lo + size
            sums = cum[hi] - cum[lo]
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]] * len(ks),
                    "win_id": np.asarray(ks, dtype="int64"),
                    "cnt": np.full(len(ks), size, dtype="int64"),
                    "win_sum": sums / 100.0,
                }
            )
        # keep rows from the earliest still-open window onward
        next_k = ks[-1] + 1 if ks else max(first_k, 0)
        keep_from = max(next_k * slide - base, 0)
        state.update((int(new_total), [int(x) for x in v[keep_from:]]))

    return stream.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
