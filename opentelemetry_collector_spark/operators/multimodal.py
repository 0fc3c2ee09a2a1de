"""Multimodal column plumbing (engine extension).

Treat image/audio/video payloads as opaque ``binary`` columns + typed
metadata structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas``.  The actual codecs
(PIL/librosa/ffmpeg) are NOT in this container, so the decode kernel is
STUBBED behind ``decode_backend='fake'`` (deterministic bytes-derived
features) / ``'real'`` (raises NotImplementedError at the import seam) —
the Spark-side contract (schemas, batch iteration, partition sizing) is
real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("blob", BinaryType()),         # opaque payload
        StructField("mime", StringType()),
        StructField("width", IntegerType()),       # typed metadata (nullable per kind)
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),  # fixed 8-dim
    ]
)

FEATURE_DIM = 8


def text_as_media(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Adapter used by tests/bench: wrap a string column as an opaque blob
    with plausible metadata — exercises the binary plumbing end to end."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.col(text_col)).alias("width"),
        F.lit(1).alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
    )


def _fake_features(blob: pd.Series) -> pd.Series:
    """Deterministic bytes-derived 8-dim feature (numpy, vectorized-ish per
    batch): byte-histogram moments — a stand-in with real batch shape."""
    import numpy as np

    out = []
    for b in blob:
        arr = np.frombuffer(b or b"\x00", dtype=np.uint8).astype(np.float32)
        chunks = np.array_split(arr, FEATURE_DIM)
        out.append(np.array([float(c.mean()) if len(c) else 0.0 for c in chunks], dtype=np.float32))
    return pd.Series(out)


def decode_and_featurize(media: DataFrame, decode_backend: str = "fake") -> DataFrame:
    """mapInPandas decode/feature kernel.  Arrow batches in, Arrow batches
    out; executor-side only — the blobs never hit the driver.  Partition
    sizing note: blobs are large → keep maxRecordsPerBatch small and
    repartition by media_id before heavy decode so batches stay ~tens of MB.
    """
    if decode_backend == "real":
        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "real decode needs PIL/librosa/ffmpeg (not in this container); "
                "plug the codec here — the Spark contract is identical"
            )
    elif decode_backend == "fake":
        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "kind": pdf["kind"],
                        "n_bytes": pdf["blob"].map(lambda b: len(b) if b is not None else 0),
                        "feature": _fake_features(pdf["blob"]),
                    }
                )
    else:
        raise ValueError(f"unknown decode_backend {decode_backend!r}")
    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode frame indices 0..n_frames-1
    step ``every_n`` (pure built-ins); the per-frame decode then rides the
    same mapInPandas kernel."""
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
    return media.filter(F.col("kind") == "video").select(
        "media_id", F.explode(idx).alias("frame_idx"), "blob"
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("blob", BinaryType()),
    ]
)


def resize_media(media: DataFrame, max_w: int = 128, backend: str = "fake") -> DataFrame:
    """mapInPandas resize kernel: downscale each blob so width ≤ ``max_w``.

    ``fake`` backend (codecs absent offline) is a stride subsample with
    PURE INTEGER arithmetic — stride = ceil(W/min(W,max_w)), output width
    = ceil(W/stride) — so an independent engine recomputes the output
    metadata exactly; ``real`` is the PIL/ffmpeg seam.  Same executor-side
    batch contract as decode_and_featurize (blobs never hit the driver)."""
    if backend == "real":

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "real resize needs PIL/ffmpeg (not in this container); "
                "plug the codec here — the Spark contract is identical"
            )

    elif backend == "fake":

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    blob = r.blob or b""
                    # NULL ints arrive from Arrow as NaN floats — `is not
                    # None` passes and int(NaN) raises; use pd.isna
                    w = len(blob) if pd.isna(r.width) else int(r.width)
                    new_w = max(1, min(w, max_w))
                    stride = (w + new_w - 1) // new_w if w else 1
                    out = bytes(blob[::stride])
                    rows.append(
                        (
                            r.media_id,
                            r.kind,
                            (w + stride - 1) // stride if w else 0,
                            1 if pd.isna(r.height) else int(r.height),
                            len(out),
                            out,
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=["media_id", "kind", "width", "height", "n_bytes", "blob"]
                )

    else:
        raise ValueError(f"unknown backend {backend!r}")
    return media.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only pass (no decode): per-kind size stats — shows column
    pruning, the blob column is never read when parquet-backed."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.octet_length("blob")).alias("total_bytes"),
        F.round(F.avg(F.octet_length("blob")), 4).alias("avg_bytes"),
    )
