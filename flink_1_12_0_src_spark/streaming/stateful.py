"""Custom stateful streaming operators — the Flink capabilities Structured
Streaming lacks as primitives, built on ``applyInPandasWithState`` (the Spark
analog of a Flink KeyedProcessFunction with keyed ValueState + event-time
timers).

Reference semantics reproduced here:

- streaming OVER aggregate (unbounded preceding running agg):
  StreamExecOverAggregate.scala:52, RowTimeRowsUnboundedPrecedingFunction
- streaming OVER time-range: RowTimeRangeBoundedPrecedingFunction.java:61
  (buffers rows per timestamp, processes them on watermark, aggregates all
  ORDER-BY peers of a rowtime together)
- streaming Top-N: StreamExecRank.scala:52, AppendOnlyTopNFunction.java
- temporal rowtime join: TemporalRowTimeJoinOperator.java (facts buffer until
  the watermark proves the dim side complete up to their timestamp)
- count windows: CountTumblingWindowAssigner / CountSlidingWindowAssigner

Watermark correctness (NOT a replay-order contract): every operator here
buffers incoming rows in keyed state and processes a row only once the
watermark proves it final (ts <= wm — nothing earlier can still arrive).
Finalized rows are consumed in global event-time order regardless of the
order micro-batches delivered them, exactly Flink's register-timer-per-
rowtime pattern. An event-time timer re-arms at wm+1 whenever rows are
still buffered, so the trailing no-data micro-batch (Spark runs one when
the watermark advances) flushes the remainder — AvailableNow replays are
deterministic and oracle-checkable.

Scale notes (100 TB): state per key is the out-of-order slack (rows above
the watermark — bounded by the watermark delay × rate) plus O(1) carry
scalars (running agg, count window, dim version) or O(n) for top-n — never
full history. Input arrives hash-partitioned by key (Spark shuffles before
applyInPandasWithState), identical to Flink's keyBy; Arrow moves batches to
Python columnar, not per-row. Money arithmetic is integer cents, so results
are exactly reproducible and oracle-comparable.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# pandas dtypes for the state-buffer round trip (must match _ENC_TYPES:
# anything restored into a LongType array as float silently nulls)
_PD_DTYPES = {"ts": "int64", "long": "int64", "double": "float64", "string": "object"}

_ENC_TYPES = {
    "ts": LongType(),  # datetime64[ns] stored as int64 nanos
    "long": LongType(),
    "double": DoubleType(),
    "string": StringType(),
}


def _cents(series: pd.Series) -> np.ndarray:
    """Exact integer-cents view of a 2-decimal money column."""
    return np.rint(series.to_numpy(dtype="float64") * 100.0).astype("int64")


def _py(v):
    """numpy scalar → Python native (GroupState rejects numpy types)."""
    return v.item() if hasattr(v, "item") else v


def _wm_buffered(
    stream: DataFrame,
    group_keys: list[str],
    order_cols: list[str],
    buffer_cols: dict[str, str],
    carry_fields: list[StructField],
    init_carry: tuple,
    kernel: Callable,
    out_schema: StructType,
    align_seconds: float | None = None,
) -> DataFrame:
    """Hold-until-watermark harness shared by the stateful operators.

    ``align_seconds``: when set, rows finalize only up to the last
    ``align_seconds``-aligned epoch boundary ≤ watermark+1ms — so a kernel
    sees whole tumbling windows only (the WindowOperator fire-at-end
    contract); rows of the still-open window stay buffered.

    Rows buffer in keyed state; each invocation merges buffer + input, sorts
    by ``order_cols`` (order_cols[0] must be the event-time column), splits at
    the current watermark, and hands the finalized prefix — in provably-final
    global event-time order — to ``kernel(key_tuple, fin_pdf, carry) ->
    (out_pdf | None, carry)``. Pending rows (ts > wm) stay buffered; a timer
    at wm+1 guarantees a flush invocation when the watermark advances without
    new data for the key. The input stream MUST declare ``withWatermark`` on
    ``order_cols[0]``.

    This is the same finalize-at-watermark discipline as streaming/cep.py
    (and Flink's CepOperator/TemporalRowTimeJoinOperator state buffers):
    results depend only on event content + watermark, never on micro-batch
    boundaries or delivery order within the watermark slack.
    """
    cols = list(buffer_cols)
    time_col = order_cols[0]
    n_carry = len(carry_fields)
    state_schema = StructType(
        list(carry_fields)
        + [StructField(f"_b_{c}", ArrayType(_ENC_TYPES[t])) for c, t in buffer_cols.items()]
    )

    def fn(key_tuple, pdf_iter, state):
        stored = state.get if state.exists else None
        carry = tuple(stored[:n_carry]) if stored else init_carry
        parts = []
        if stored:
            # Restore with EXPLICIT dtypes and skip the frame when the stored
            # buffer is empty. A key whose buffer fully drains (timeout flush
            # with carry retained) stores empty lists; pd.DataFrame({c: []})
            # would default those columns to float64, and a later
            # concat([empty-float64, int64-data]) silently upcasts the int64
            # nanosecond timestamps to float64 (precision loss) — which the
            # LongType state array then nulls on write, corrupting the key's
            # buffer for the rest of the stream. Hit only on the
            # drain-then-refill delivery pattern (surfaced by the sf0.1
            # streaming smoke), invisible at smaller replays.
            restored = pd.DataFrame(
                {
                    c: pd.Series(list(v), dtype=_PD_DTYPES[t])
                    for (c, t), v in zip(buffer_cols.items(), stored[n_carry:])
                }
            )
            if len(restored):
                parts.append(restored)
        for pdf in pdf_iter:
            if len(pdf):
                enc = {}
                for c, t in buffer_cols.items():
                    enc[c] = pdf[c].astype("int64") if t == "ts" else pdf[c]
                parts.append(pd.DataFrame(enc))
        buf = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(
                {c: pd.Series(dtype=_PD_DTYPES[t]) for c, t in buffer_cols.items()}
            )
        )
        if len(buf):
            buf = buf.sort_values(order_cols, kind="mergesort", ignore_index=True)
        # ms-floored comparison: Spark's watermark (like Flink's) is
        # ms-precision, so a row is final iff floor_ms(ts) <= wm_ms — without
        # the flooring, a sub-ms event-time tail above the watermark would
        # never finalize (e.g. the global max row on the trailing flush batch)
        fin_below_ns = (state.getCurrentWatermarkMs() + 1) * 1_000_000
        if align_seconds is not None:
            win_ns = int(align_seconds * 1e9)
            fin_below_ns = (fin_below_ns // win_ns) * win_ns
        ts_arr = buf[time_col].to_numpy(dtype="int64") if len(buf) else np.array([], "int64")
        n_fin = int(np.searchsorted(ts_arr, fin_below_ns, side="left"))
        if n_fin:
            fin = buf.iloc[:n_fin].reset_index(drop=True).copy()
            for c, t in buffer_cols.items():
                if t == "ts":
                    fin[c] = pd.to_datetime(fin[c])
            out, carry = kernel(key_tuple, fin, carry)
            if out is not None and len(out):
                yield out
        pending = buf.iloc[n_fin:]
        state.update(
            tuple(_py(v) for v in carry)
            + tuple(pending[c].tolist() for c in cols)
        )
        if len(pending):
            # flush when the watermark next advances, even with no new data
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)

    return stream.groupBy(*group_keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def streaming_over_running_sum(
    stream: DataFrame, key: str, order_cols: list[str], value_col: str
) -> DataFrame:
    """Streaming OVER (PARTITION BY key ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING): per-row running count + running sum.

    Carry per key: (row_count, running_cents) — two scalars, independent of
    history length; plus the watermark buffer of not-yet-final rows.
    """
    in_fields = {f.name: f for f in stream.schema.fields}
    time_col = order_cols[0]
    out_schema = StructType(
        [in_fields[key]]
        + [in_fields[c] for c in order_cols]
        + [StructField(value_col, DoubleType())]
        + [StructField("rn", LongType()), StructField("run_sum", DoubleType())]
    )
    buffer_cols = {time_col: "ts"}
    for c in order_cols[1:]:
        buffer_cols[c] = "long"
    buffer_cols[value_col] = "double"

    def kernel(key_tuple, fin, carry):
        cnt, cents = carry
        v = _cents(fin[value_col])
        cum = cents + np.cumsum(v)
        rn = cnt + np.arange(1, len(fin) + 1, dtype="int64")
        out = pd.DataFrame({key: [key_tuple[0]] * len(fin)})
        for c in order_cols:
            out[c] = fin[c]
        out[value_col] = v / 100.0
        out["rn"] = rn
        out["run_sum"] = cum / 100.0
        return out, (int(rn[-1]), int(cum[-1]))

    return _wm_buffered(
        stream, [key], order_cols, buffer_cols,
        [StructField("cnt", LongType()), StructField("cents", LongType())],
        (0, 0), kernel, out_schema,
    )


def streaming_temporal_sort(
    stream: DataFrame, key: str, order_cols: list[str]
) -> DataFrame:
    """Streaming TEMPORAL SORT (StreamExecTemporalSort.scala:47 /
    RowTimeSortOperator: buffer rows in keyed state, emit them in event-time
    order as the watermark passes them): per key, rows are released in
    provably-final (ts, tiebreak…) order, each stamped with its per-key
    emission sequence number.

    Carry per key: one counter — the number of rows already emitted; plus
    the watermark buffer of not-yet-final rows (bounded by data rate ×
    watermark slack, not history). The emitted (key, seq) assignment is a
    pure function of event content, so it is micro-batch- and
    delivery-order-invariant and equals the batch ROW_NUMBER oracle.
    """
    in_fields = {f.name: f for f in stream.schema.fields}
    time_col = order_cols[0]
    out_schema = StructType(
        [in_fields[key]]
        + [in_fields[c] for c in order_cols]
        + [StructField("seq", LongType())]
    )
    buffer_cols = {time_col: "ts"}
    for c in order_cols[1:]:
        buffer_cols[c] = "long"

    def kernel(key_tuple, fin, carry):
        (n0,) = carry
        out = pd.DataFrame({key: [key_tuple[0]] * len(fin)})
        for c in order_cols:
            out[c] = fin[c]
        out["seq"] = n0 + np.arange(1, len(fin) + 1, dtype="int64")
        return out, (n0 + len(fin),)

    return _wm_buffered(
        stream, [key], order_cols, buffer_cols,
        [StructField("n", LongType())], (0,), kernel, out_schema,
    )


def streaming_delta_trigger(
    stream: DataFrame,
    key: str,
    order_cols: list[str],
    value_col: str,
    delta_cents: int,
) -> DataFrame:
    """Flink DeltaTrigger (flink-streaming-java/.../windowing/triggers/
    DeltaTrigger.java:33 + DeltaFunction): FIRE when the delta function
    between the LAST-FIRED element and the current element exceeds the
    threshold; the fired element becomes the new reference. Here the delta
    function is |value − last_fired_value| in exact cents, and each fire
    emits the triggering row (a key's first row always fires, initializing
    the reference — DeltaTrigger.onElement's null-state branch).

    Carry per key: (fired_yet, last_fired_cents) — two scalars, O(1) state
    like the reference's ValueState<T> lastElement. Rows are processed in
    provably-final event-time order via the watermark buffer, so the
    emission set is delivery-order invariant. The per-row reference update
    is inherently sequential (each decision depends on the previous fire) —
    a tight index loop over the Arrow batch, the same regime as the CEP NFA
    scan; all other arithmetic stays vectorized.
    """
    in_fields = {f.name: f for f in stream.schema.fields}
    time_col = order_cols[0]
    out_schema = StructType(
        [in_fields[key]]
        + [in_fields[c] for c in order_cols]
        + [StructField(value_col, DoubleType())]
    )
    buffer_cols = {time_col: "ts"}
    for c in order_cols[1:]:
        buffer_cols[c] = "long"
    buffer_cols[value_col] = "double"

    def kernel(key_tuple, fin, carry):
        fired, last = carry
        cents = _cents(fin[value_col])
        keep = np.zeros(len(fin), dtype=bool)
        for i in range(len(cents)):
            c = int(cents[i])
            if not fired or abs(c - last) >= delta_cents:
                keep[i] = True
                fired, last = 1, c
        out = pd.DataFrame({key: [key_tuple[0]] * int(keep.sum())})
        sel = fin.loc[keep]
        for c in order_cols:
            out[c] = sel[c].to_numpy()
        out[value_col] = cents[keep] / 100.0
        return out, (int(fired), int(last))

    return _wm_buffered(
        stream, [key], order_cols, buffer_cols,
        [StructField("fired", LongType()), StructField("last", LongType())],
        (0, 0), kernel, out_schema,
    )


def streaming_over_time_range(
    stream: DataFrame, key: str, time_col: str, value_col: str, range_seconds: int
) -> DataFrame:
    """Streaming OVER (PARTITION BY key ORDER BY rowtime RANGE BETWEEN
    range_seconds PRECEDING AND CURRENT ROW): per-row count + sum over the
    trailing time window (Flink RowTimeRangeBoundedPrecedingFunction.java:61).

    Carry per key: the already-emitted (ts, cents) pairs still inside the
    trailing window span of any future row — bounded by data rate × range,
    NOT history length. RANGE frames are peer-inclusive: because a row is
    only processed once the watermark passes its timestamp, every ORDER-BY
    peer (equal ts) is in the same finalized batch, so cnt_range/sum_range
    cover the whole peer group — matching the reference, which aggregates all
    rows of one rowtime together.
    """
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
    range_ns = range_seconds * 1_000_000_000

    def kernel(key_tuple, fin, carry):
        trail_ts, trail_cents = carry
        new_ts = fin[time_col].astype("int64").to_numpy()
        new_cents = _cents(fin[value_col])
        all_ts = np.concatenate([np.asarray(trail_ts, dtype="int64"), new_ts])
        all_cents = np.concatenate([np.asarray(trail_cents, dtype="int64"), new_cents])
        cum = np.cumsum(all_cents)
        lo = np.searchsorted(all_ts, new_ts - range_ns, side="left")
        # frame end = last ORDER-BY peer (peer-inclusive RANGE frame)
        hi = np.searchsorted(all_ts, new_ts, side="right") - 1
        sums = cum[hi] - np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        out = pd.DataFrame(
            {
                key: [key_tuple[0]] * len(fin),
                time_col: fin[time_col],
                value_col: new_cents / 100.0,
                "cnt_range": (hi - lo + 1).astype("int64"),
                "sum_range": sums / 100.0,
            }
        )
        keep = all_ts >= all_ts[-1] - range_ns  # still reachable by future rows
        return out, (all_ts[keep].tolist(), all_cents[keep].tolist())

    return _wm_buffered(
        stream, [key], [time_col], {time_col: "ts", value_col: "double"},
        [
            StructField("trail_ts", ArrayType(LongType())),
            StructField("trail_cents", ArrayType(LongType())),
        ],
        ([], []), kernel, out_schema,
    )


def streaming_topn(
    stream: DataFrame, key: str, id_col: str, value_col: str, n: int
) -> DataFrame:
    """Streaming Top-N per key by (value DESC, id ASC): each watermark advance
    merges newly-finalized rows into the retained top-n and re-emits the
    snapshot tagged with a per-key update sequence (``seq``). Downstream keeps
    the rows with the max seq per key — the changelog-to-latest-snapshot
    reading of Flink's AppendOnlyTopNFunction's +I/-D stream.

    Carry per key: the n retained (id, value) pairs + a counter — O(n).
    Order-insensitive by construction (top-n is a set), but rows still pass
    through the watermark buffer so the emitted snapshot sequence is
    deterministic per watermark position, not per delivery order.
    """
    time_col = "ts"
    out_schema = StructType(
        [
            StructField(key, stream.schema[key].dataType),
            StructField("rank", IntegerType()),
            StructField(id_col, LongType()),
            StructField(value_col, DoubleType()),
            StructField("seq", LongType()),
        ]
    )

    def kernel(key_tuple, fin, carry):
        seq, ids, cents = carry
        all_ids = np.concatenate(
            [np.asarray(ids, dtype="int64"), fin[id_col].to_numpy("int64")]
        )
        all_cents = np.concatenate([np.asarray(cents, dtype="int64"), _cents(fin[value_col])])
        order = np.lexsort((all_ids, -all_cents))[:n]
        top_ids, top_cents = all_ids[order], all_cents[order]
        seq += 1
        out = pd.DataFrame(
            {
                key: [key_tuple[0]] * len(top_ids),
                "rank": np.arange(1, len(top_ids) + 1, dtype="int32"),
                id_col: top_ids,
                value_col: top_cents / 100.0,
                "seq": np.full(len(top_ids), seq, dtype="int64"),
            }
        )
        return out, (int(seq), top_ids.tolist(), top_cents.tolist())

    return _wm_buffered(
        stream, [key], [time_col, id_col],
        {time_col: "ts", id_col: "long", value_col: "double"},
        [
            StructField("seq", LongType()),
            StructField("ids", ArrayType(LongType())),
            StructField("cents", ArrayType(LongType())),
        ],
        (0, [], []), kernel, out_schema,
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
    was current at the fact's event time (version_ts <= fact_ts, latest wins).

    Spark has no two-input stateful operator, so both sides arrive as ONE
    tagged union stream keyed by the join key (the classic connect-streams
    encoding). Facts buffer in keyed state until the watermark passes their
    timestamp — only then is the dim side provably complete up to fact_ts, so
    a late-but-in-watermark dim version can never be missed (the reference
    buffers facts in ``leftState`` and joins on watermark for exactly this
    reason). Carry per key: the latest finalized (version_ts, value) — any
    older version is unreachable by future facts.
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

    def kernel(key_tuple, fin, carry):
        vts, vcents = carry
        ts_ns = fin[time_col].astype("int64").to_numpy()
        cents = _cents(fin[value_col])
        is_dim = (fin[side_col] == dim_tag).to_numpy()
        d_ts = np.concatenate([[vts], ts_ns[is_dim]]) if vts >= 0 else ts_ns[is_dim]
        d_cents = (
            np.concatenate([[vcents], cents[is_dim]]) if vts >= 0 else cents[is_dim]
        )
        f_ts, f_cents = ts_ns[~is_dim], cents[~is_dim]
        out = None
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
            out = pd.DataFrame(
                {
                    key: [key_tuple[0]] * len(f_ts),
                    "fact_ts": pd.to_datetime(f_ts),
                    "amount": f_cents / 100.0,
                    "dim_ts": pd.Series(
                        [pd.to_datetime(t) if h else pd.NaT for t, h in zip(m_ts, hit)]
                    ),
                    "setting": pd.Series(
                        [c / 100.0 if h else None for c, h in zip(m_cents, hit)],
                        dtype="float64",
                    ),
                }
            )
        if len(d_ts):
            carry = (int(d_ts[-1]), int(d_cents[-1]))
        return out, carry

    return _wm_buffered(
        stream, [key], [time_col],
        {time_col: "ts", side_col: "string", value_col: "double"},
        [StructField("vts", LongType()), StructField("vcents", LongType())],
        (-1, 0), kernel, out_schema,
    )


def streaming_count_tumble(
    stream: DataFrame, key: str, order_cols: list[str], value_col: str, size: int
) -> DataFrame:
    """Count-based tumbling window (no Spark primitive): per key, every
    ``size`` rows in event order form one window; only complete windows are
    emitted (Flink CountTumblingWindowAssigner + purging trigger semantics —
    a trailing partial window stays in state, unemitted).

    Carry per key: (next_window_id, partial_count, partial_cents) — O(1).
    "Event order" is exact: rows enter windows only once the watermark
    finalizes them, in global (ts, id) order, not delivery order.
    """
    time_col = order_cols[0]
    out_schema = StructType(
        [
            StructField(key, stream.schema[key].dataType),
            StructField("win_id", LongType()),
            StructField("cnt", LongType()),
            StructField("win_sum", DoubleType()),
        ]
    )
    buffer_cols = {time_col: "ts"}
    for c in order_cols[1:]:
        buffer_cols[c] = "long"
    buffer_cols[value_col] = "double"

    def kernel(key_tuple, fin, carry):
        win, pcnt, pcents = carry
        v = _cents(fin[value_col])
        total = pcnt + len(v)
        k = total // size  # complete windows this invocation
        out = None
        if k > 0:
            consumed = k * size - pcnt  # new rows absorbed into complete windows
            # window starts within the new rows: the first window already holds
            # pcnt rows from carry, so it only takes (size - pcnt) new ones
            bounds = np.concatenate([[0], np.arange(size - pcnt, consumed, size)]).astype(
                "int64"
            )
            sums = np.add.reduceat(v[:consumed], bounds)
            sums[0] += pcents
            out = pd.DataFrame(
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
        return out, (int(win), int(pcnt), int(pcents))

    return _wm_buffered(
        stream, [key], order_cols, buffer_cols,
        [
            StructField("win", LongType()),
            StructField("pcnt", LongType()),
            StructField("pcents", LongType()),
        ],
        (0, 0, 0), kernel, out_schema,
    )


def streaming_count_slide(
    stream: DataFrame, key: str, order_cols: list[str], value_col: str, size: int, slide: int
) -> DataFrame:
    """Sliding count window (CountSlidingWindowAssigner — flink-table-runtime
    .../operators/window/assigners/): per key, window k covers event-ordered
    rows [k*slide, k*slide + size); only complete windows emit.

    Carry per key: total row count + the trailing cent values still reachable
    by an open window — O(size), not history. Event order is watermark-exact,
    as in streaming_count_tumble.
    """
    time_col = order_cols[0]
    out_schema = StructType(
        [
            StructField(key, stream.schema[key].dataType),
            StructField("win_id", LongType()),
            StructField("cnt", LongType()),
            StructField("win_sum", DoubleType()),
        ]
    )
    buffer_cols = {time_col: "ts"}
    for c in order_cols[1:]:
        buffer_cols[c] = "long"
    buffer_cols[value_col] = "double"

    def kernel(key_tuple, fin, carry):
        total, tail = carry
        v = np.concatenate([np.asarray(tail, dtype="int64"), _cents(fin[value_col])])
        base = total - len(tail)  # absolute row index of v[0]
        new_total = total + len(fin)
        # windows are complete when their last row index < new_total
        first_k = (total - size) // slide + 1 if total >= size else 0
        ks = []
        k = max(first_k, 0)
        while k * slide + size <= new_total:
            ks.append(k)
            k += 1
        out = None
        if ks:
            cum = np.concatenate([[0], np.cumsum(v)])
            lo = np.array([k * slide - base for k in ks])
            hi = lo + size
            sums = cum[hi] - cum[lo]
            out = pd.DataFrame(
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
        return out, (int(new_total), v[keep_from:].tolist())

    return _wm_buffered(
        stream, [key], order_cols, buffer_cols,
        [StructField("total", LongType()), StructField("tail", ArrayType(LongType()))],
        (0, []), kernel, out_schema,
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


def streaming_evicted_window(
    stream: DataFrame,
    key: str,
    order_cols: list[str],
    value_col: str,
    window_seconds: float,
    evictor: str,
    n: int | None = None,
    keep_seconds: float | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """Tumbling event-time window with an EVICTOR applied before the
    aggregate fires (flink-streaming-java/.../api/windowing/evictors/:
    CountEvictor, TimeEvictor, DeltaEvictor; invoked by WindowOperator
    before the window function — evictBefore):

    - ``evictor="count"``: keep only the LAST ``n`` rows of the window
      (CountEvictor.of(n));
    - ``evictor="time"``: keep rows within ``keep_seconds`` of the window's
      max event time (TimeEvictor.of(Time.seconds(k)));
    - ``evictor="delta"``: drop rows whose |value − last_row.value| >
      ``threshold`` (DeltaEvictor.of(threshold, deltaFn) against the window's
      last element).

    Spark's windowed aggregation has no evictor hook, so the operator runs on
    the watermark-buffered harness with window-ALIGNED finalization: a window
    fires exactly once, when the watermark passes its end, seeing all and
    only its rows in global event-time order (WindowOperator fire-at-end).
    State is O(open-window rows per key); emitted windows leave state.

    Emits (key, window_start, cnt_kept, total_kept) per closed window —
    cnt/total computed over the evictor's survivors only.
    """
    time_col = order_cols[0]
    out_schema = StructType(
        [
            StructField(key, stream.schema[key].dataType),
            StructField("window_start", stream.schema[time_col].dataType),
            StructField("cnt_kept", LongType()),
            StructField("total_kept", DoubleType()),
        ]
    )
    buffer_cols = {time_col: "ts"}
    for c in order_cols[1:]:
        buffer_cols[c] = "long"
    buffer_cols[value_col] = "double"
    win_ns = int(window_seconds * 1e9)

    def kernel(key_tuple, fin, carry):
        ts = fin[time_col].astype("int64").to_numpy()
        starts = (ts // win_ns) * win_ns
        rows = []
        for w in np.unique(starts):
            sel = fin[starts == w]  # already in global (ts, tiebreak) order
            if evictor == "count":
                kept = sel.iloc[-n:]
            elif evictor == "time":
                lo = sel[time_col].astype("int64").max() - int(keep_seconds * 1e9)
                kept = sel[sel[time_col].astype("int64") >= lo]
            elif evictor == "delta":
                cv = _cents(sel[value_col])  # exact cents: keep/drop decisions
                kept = sel[np.abs(cv - cv[-1]) <= int(round(threshold * 100))]
            else:  # pragma: no cover
                raise ValueError(f"unknown evictor: {evictor}")
            cents = _cents(kept[value_col]).sum()
            rows.append(
                {
                    key: key_tuple[0],
                    "window_start": pd.Timestamp(int(w)),
                    "cnt_kept": len(kept),
                    "total_kept": cents / 100.0,
                }
            )
        out = pd.DataFrame(rows, columns=list(out_schema.fieldNames())) if rows else None
        return out, carry

    return _wm_buffered(
        stream, [key], order_cols, buffer_cols,
        [StructField("unused", LongType())],
        (0,), kernel, out_schema,
        align_seconds=window_seconds,
    )
