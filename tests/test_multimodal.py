"""Multimodal plumbing: schemas, Arrow batch kernel, frame sampling, stub gate."""

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_and_featurize,
    frame_sample,
    media_metadata_stats,
    text_as_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "abcdefgh" * 10)], "id int, text string"
    )
    return text_as_media(df, "id", "text").cache()


def test_media_schema(media):
    assert dict(media.dtypes)["blob"] == "binary"
    assert media.count() == 2


def test_fake_decode_features(media):
    out = decode_and_featurize(media, decode_backend="fake")
    rows = {r.media_id: r for r in out.collect()}
    assert rows["1"].n_bytes == len(b"hello world")
    assert len(rows["1"].feature) == FEATURE_DIM
    # deterministic: second run identical
    again = {r.media_id: r for r in decode_and_featurize(media, decode_backend="fake").collect()}
    assert rows["1"].feature == again["1"].feature


def test_real_decode_is_stubbed(media):
    out = decode_and_featurize(media, decode_backend="real")
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "NotImplementedError" in str(ei.value) or "real decode" in str(ei.value)


def test_frame_sample(spark):
    df = spark.createDataFrame([(1, "x")], "id int, text string")
    m = text_as_media(df, "id", "text", kind="video").withColumn("n_frames", F.lit(25))
    frames = [r.frame_idx for r in frame_sample(m, every_n=10).collect()]
    assert frames == [0, 10, 20]


def test_metadata_stats(media):
    row = media_metadata_stats(media).collect()[0]
    assert row.kind == "image" and row.n_media == 2
    assert row.total_bytes == len("hello world") + 80
