"""Micro-batch streaming pipeline (receiver → processors → fanout, streamed).

Reference analogs: the OTLP receiver's push loop (receiver/otlpreceiver
~approx) becomes a file-source ``readStream``; the batch processor's
size/timeout ticker (processor/batchprocessor ~approx) becomes the trigger;
the fanoutconnector + exporters become ``foreachBatch`` running the SAME
batch fanout code — one code path for batch and streaming, which is the
whole point of building on DataFrames.

Scale posture: foreachBatch receives a bounded micro-batch DataFrame; the
per-batch plan is identical to the batch pipeline (narrow parse + broadcast
enrich + single-pass route tag), so streaming adds no extra shuffles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..operators.enrich import broadcast_enrich
from ..operators.router import Route, route_tag

SEQUENCES_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def read_stream_sequences(
    spark: SparkSession,
    input_dir: str,
    schema: StructType | str = SEQUENCES_DDL,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source receiver: new parquet files under ``input_dir`` are the
    arriving OTLP batches (streaming scans need an explicit schema)."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def windowed_sink_counts(
    stream: DataFrame,
    routes: list[Route],
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time tumbling per-sink counts with late-data bound.

    The collector itself has NO event-time semantics (records flow in
    processing time); this is the engine-extension the reference lacks —
    watermarked obsreport counts that stay correct under out-of-order
    arrival.  Output mode: append (finalized windows only).
    """
    tagged = route_tag(stream.withWatermark(ts_col, watermark), routes)
    return tagged.groupBy(F.window(ts_col, window).alias("w"), "sink").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_tok").alias("n_tok_sum"),
    )


def run_stream_pipeline(
    spark: SparkSession,
    input_dir: str,
    lookup: DataFrame,
    routes: list[Route],
    sink_root: str,
    checkpoint_dir: str,
    schema: StructType | str = SEQUENCES_DDL,
    available_now: bool = True,
    spec=None,  # optional PipelineSpec: relabel/attr_actions chains
) -> StreamingQuery:
    """Streaming parse→enrich→route→fanout with exactly-once file sinks.

    ``foreachBatch`` reuses the batch operators verbatim, and the write is
    the SAME single-pass manifest-gated fanout as the batch path
    (``ParquetSnapshotIO.append_group_partitioned`` with a batchId-keyed
    group): one ``partitionBy(sink)`` pass per micro-batch, no cache, no
    per-sink re-scan.  Exactly-once holds through crash-replay because the
    group commit is idempotent — a replayed batch whose sinks all committed
    is a no-op, and a partially-committed batch overwrites its own
    (manifest-invisible) data dir before re-laying markers.  Read the sinks
    back via ``ParquetSnapshotIO(root=sink_root).read(spark, sink)``.

    NB: group ids embed the checkpoint's persisted query id; upgrading an
    engine version that changes the id scheme while a checkpoint is
    mid-flight can replay the crash-window batch under a new group id —
    drain (let the stream finish its batch) before swapping engine code.
    """
    import json as _json
    import os as _os

    from ..sources.tableio import ParquetSnapshotIO

    stream = read_stream_sequences(spark, input_dir, schema)
    io = ParquetSnapshotIO(root=sink_root)
    sinks = [r.sink for r in routes]

    # Group ids are scoped to the STREAM INSTANCE, not just the batch id:
    # batch ids restart at 0 whenever the checkpoint is fresh (different
    # path OR deleted-and-recreated), and a bare batch-keyed group would
    # silently no-op the new stream's first batches as "already committed"
    # replays of an older stream sharing the sink_root.  Spark's stable
    # discriminator is the query id persisted in <checkpoint>/metadata —
    # unchanged across restarts of the same checkpoint (so crash-replay
    # stays idempotent), regenerated when the checkpoint is reset.
    _tag: dict[str, str] = {}

    def stream_tag() -> str:
        if "t" not in _tag:
            try:
                with open(_os.path.join(checkpoint_dir, "metadata")) as f:
                    _tag["t"] = _json.load(f)["id"].replace("-", "")[:12]
            except (OSError, ValueError, KeyError) as e:
                # OSError: missing/unreadable; ValueError: JSONDecodeError
                # (truncated mid-crash write); KeyError: no "id" field.
                # A path-stable fallback would be WRONG here: a fresh stream
                # (checkpoint deleted-and-recreated at the same path) restarts
                # batch ids at 0, and under a path-derived tag its first
                # batches would be skipped as already-committed replays of the
                # prior stream — silent data loss.  The metadata file exists
                # before the first foreachBatch call on every Spark local/HDFS
                # checkpoint; a non-local URI must supply the tag differently.
                raise RuntimeError(
                    f"cannot read stream id from {checkpoint_dir}/metadata; "
                    "refusing a path-derived group tag (would alias a fresh "
                    "stream's batch 0 onto a prior stream's committed groups)"
                ) from e
        return _tag["t"]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        df = batch_df
        if spec is not None:
            # same optional processor chains as the batch path (collector
            # order: relabel → attributes), same column-expression compile,
            # same engine-column protection against name-filter rules
            if spec.relabel:
                from ..operators.relabel import apply_relabel
                from ..plans.pipeline import engine_columns

                df = apply_relabel(df, spec.relabel, protected=engine_columns(df, spec))
            if spec.attr_actions:
                from ..operators.attraction import apply_actions

                df = apply_actions(df, spec.attr_actions)
            if spec.transform:
                from ..functions.ottl import apply_ottl

                df = apply_ottl(df, spec.transform)
            if spec.drop_conditions:
                from ..operators.filters import filter_ottl_drop

                df = filter_ottl_drop(df, spec.drop_conditions)
            if spec.group_by_attrs:
                # groupbyattrs parity in the stream: the record-side id is
                # a pure projection, so per-micro-batch ids are IDENTICAL
                # to the batch pipeline's (no cross-batch state needed)
                from ..operators.router import group_by_attrs as _gba

                _, df = _gba(df, spec.group_by_attrs)
        enriched = broadcast_enrich(df, lookup, on="source", defaults={"env": "unknown"})
        tagged = route_tag(enriched, routes)
        io.append_group_partitioned(tagged, "sink", sinks, f"q{stream_tag()}-batch{batch_id:08d}")

    w = stream.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint_dir)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def streaming_dedup(
    stream: DataFrame, id_cols: list[str] | None = None, ts_col: str = "ts", watermark: str = "10 minutes"
) -> DataFrame:
    """Record-level exactly-once under receiver redelivery (§2.12): drop
    duplicate ``id_cols`` arrivals within the watermark horizon.

    The collector is at-least-once end to end — a retried export re-sends
    whole batches and downstreams are expected to tolerate duplicates.  In
    the engine the fix is declarative: ``dropDuplicatesWithinWatermark``
    keeps per-id state only until the watermark passes (bounded state, the
    100 TB requirement — an unbounded ``dropDuplicates`` would accrete one
    state row per record forever)."""
    ids = id_cols or ["doc_id"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(ids)
