"""Structured Streaming variants of the pipeline (SURVEY.md §2.12).

The collector is a processing-time, at-least-once push-streaming system; the
flagship job here is batch (north_rule), but every streaming-shaped behavior
the reference has maps onto Structured Streaming:

- receiver ingest        → ``readStream`` (file source here; kafka on a cluster)
- batch processor ticker → micro-batch trigger (processingTime / availableNow)
- fanout + exporters     → ``foreachBatch`` reusing the exact batch fanout code
- prometheus accumulator → ``applyInPandasWithState`` cumulative per-key state
- batch size/timeout     → flush-on-size stateful batcher
"""

from .micro_batch import (
    read_stream_sequences,
    run_stream_pipeline,
    streaming_dedup,
    windowed_sink_counts,
)
from .stateful import streaming_accumulator, streaming_batcher, streaming_tail_sample

__all__ = [
    "read_stream_sequences",
    "run_stream_pipeline",
    "streaming_dedup",
    "windowed_sink_counts",
    "streaming_accumulator",
    "streaming_batcher",
    "streaming_tail_sample",
]
