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


def test_resize_fake_backend_integer_exact(spark):
    from opentelemetry_collector_spark.operators.multimodal import resize_media, text_as_media

    df = spark.createDataFrame(
        [("1", "x" * 300), ("2", "y" * 100), ("3", "z")], "id string, body string"
    )
    media = text_as_media(df, "id", "body")
    got = {r.media_id: (r.width, r.n_bytes, r.blob) for r in resize_media(media, max_w=128).collect()}
    # W=300: stride=ceil(300/128)=3 -> 100 bytes; W=100<=128: stride 1
    assert got["1"][0] == 100 and got["1"][1] == 100 and got["1"][2] == b"x" * 100
    assert got["2"][0] == 100 and got["2"][2] == b"y" * 100
    assert got["3"][0] == 1


def test_resize_real_backend_is_honest_seam(spark):
    from opentelemetry_collector_spark.operators.multimodal import resize_media, text_as_media

    df = spark.createDataFrame([("1", "abc")], "id string, body string")
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        resize_media(text_as_media(df, "id", "body"), backend="real").collect()
