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
