"""Custom stateful streaming operators via ``applyInPandasWithState``.

Two collector behaviors genuinely need cross-micro-batch state:

- **streaming_accumulator** — the Prometheus exporter's accumulator
  (exporter/prometheusexporter/accumulator.go ~approx): per (metric,
  label-set) key, maintain latest value + cumulative sum across arrivals.
  Batch analog: queries key ``agg_latest_by_key`` / ``win_cumulative_sum``.

- **streaming_batcher** — the batch processor's send_batch_size flush
  (processor/batchprocessor/batch_processor.go ~approx): buffer rows per
  key, emit a numbered batch every time the buffer reaches ``batch_size``,
  carry the remainder in state (the reference's timeout flush maps to a
  ProcessingTimeTimeout; the size path is the deterministic one tested).

Both are Arrow-vectorized (pandas in/out) — per-row Python stays banned.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ACC_SCHEMA = "source string, n_seen bigint, tok_cum bigint, last_n_tok int"
ACC_STATE = "n_seen bigint, tok_cum bigint, last_n_tok int"


def _accumulate(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n_seen, tok_cum, last) = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n_seen += len(pdf)
        tok_cum += int(pdf["n_tok"].sum())
        if len(pdf):
            last = int(pdf["n_tok"].iloc[-1])
    state.update((n_seen, tok_cum, last))
    yield pd.DataFrame(
        {"source": [key[0]], "n_seen": [n_seen], "tok_cum": [tok_cum], "last_n_tok": [last]}
    )


def streaming_accumulator(stream: DataFrame, key_col: str = "source") -> DataFrame:
    """Cumulative per-key accumulator: one updated row per key per micro-batch.

    Run with outputMode('update').  State is a 3-tuple per key — O(#keys)
    memory on each executor, irrespective of stream length.
    """
    return stream.groupBy(key_col).applyInPandasWithState(
        _accumulate,
        outputStructType=ACC_SCHEMA,
        stateStructType=ACC_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BATCH_SCHEMA = "source string, batch_id bigint, n_rows int, n_tok_sum bigint"
BATCH_STATE = "pending int, pending_tok bigint, next_batch bigint"


def make_batcher(batch_size: int):
    """Build the flush-on-size stateful fn (size fixed at plan time)."""

    def _batch(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        pending, pending_tok, next_batch = state.get if state.exists else (0, 0, 0)
        out_rows: list[tuple] = []
        for pdf in pdfs:
            # vectorized: fold the whole Arrow batch into the buffer, then
            # emit floor(buffer/size) full batches.
            pending += len(pdf)
            pending_tok += int(pdf["n_tok"].sum())
            while pending >= batch_size:
                # tokens attributed proportionally; exactness only for counts
                take_tok = pending_tok * batch_size // pending
                out_rows.append((key[0], next_batch, batch_size, take_tok))
                pending -= batch_size
                pending_tok -= take_tok
                next_batch += 1
        state.update((pending, pending_tok, next_batch))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=["source", "batch_id", "n_rows", "n_tok_sum"])

    return _batch


def streaming_batcher(stream: DataFrame, batch_size: int, key_col: str = "source") -> DataFrame:
    """send_batch_size flush: emit one row per completed batch per key."""
    return stream.groupBy(key_col).applyInPandasWithState(
        make_batcher(batch_size),
        outputStructType=BATCH_SCHEMA,
        stateStructType=BATCH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TAIL_OUT = "trace_id string, span_id string, ts timestamp, level string"
TAIL_STATE = "span_ids array<string>, ts_us array<long>, levels array<string>, max_ts_ms bigint"


def make_tail_sampler(decision_wait_ms: int, keep_levels: tuple = ("ERROR",)):
    """Streaming tail sampler (tailsamplingprocessor decision_wait analog):
    buffer a trace's spans in state; when no span arrives for
    ``decision_wait`` of EVENT time (watermark-driven timeout), decide over
    the WHOLE trace and emit it iff any span matches ``keep_levels``."""

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            span_ids, ts_us, levels, _ = state.get
            state.remove()
            if any(lv in keep_levels for lv in levels):
                yield pd.DataFrame(
                    {
                        "trace_id": [key[0]] * len(span_ids),
                        "span_id": list(span_ids),
                        "ts": pd.to_datetime(list(ts_us), unit="us"),
                        "level": list(levels),
                    }
                )
            return
        span_ids, ts_us, levels, max_ts_ms = (
            state.get if state.exists else ([], [], [], 0)
        )
        span_ids, ts_us, levels = list(span_ids), list(ts_us), list(levels)
        for pdf in pdfs:
            span_ids.extend(pdf["span_id"].astype(str))
            us = (pdf["ts"].astype("int64") // 1000).tolist()
            ts_us.extend(us)
            levels.extend(pdf["level"].astype(str))
            if us:
                max_ts_ms = max(max_ts_ms, max(us) // 1000)
        state.update((span_ids, ts_us, levels, max_ts_ms))
        # decision point = last span's event time + decision_wait
        state.setTimeoutTimestamp(max_ts_ms + decision_wait_ms)

    return fn


def streaming_tail_sample(
    stream: DataFrame, decision_wait_ms: int = 30_000, keep_levels: tuple = ("ERROR",)
) -> DataFrame:
    """Tail-based sampling over a watermarked span stream.

    State per in-flight trace is O(#spans of that trace); traces are evicted
    at decision time, so steady-state memory is bounded by the decision
    window — exactly the reference's num_traces cap semantics.  Requires
    ``stream.withWatermark('ts', ...)`` upstream.
    """
    return stream.groupBy("trace_id").applyInPandasWithState(
        make_tail_sampler(decision_wait_ms, keep_levels),
        outputStructType=TAIL_OUT,
        stateStructType=TAIL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
