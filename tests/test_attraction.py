"""Attraction action semantics — table-driven like the reference's
processor/attributesprocessor/attributes_test.go (testCase{name,
inputAttributes, expectedAttributes})."""

import hashlib

import pytest

from opentelemetry_collector_spark.operators.attraction import (
    AttrAction,
    apply_actions,
    span_rename,
)

CASES = [
    # (name, input rows {env}, actions, expected env values)
    ("insert_fills_null", [("a", None), ("b", "prod")],
     [AttrAction("insert", "env", value="unknown")], ["unknown", "prod"]),
    ("update_only_present", [("a", None), ("b", "prod")],
     [AttrAction("update", "env", value="staging")], [None, "staging"]),
    ("upsert_unconditional", [("a", None), ("b", "prod")],
     [AttrAction("upsert", "env", value="x")], ["x", "x"]),
]


@pytest.mark.parametrize("name,rows,actions,expected", CASES, ids=[c[0] for c in CASES])
def test_action_semantics(spark, name, rows, actions, expected):
    df = spark.createDataFrame(rows, "id string, env string")
    out = apply_actions(df, actions).orderBy("id").collect()
    assert [r.env for r in out] == expected


def test_insert_creates_missing_column(spark):
    df = spark.createDataFrame([("a",)], "id string")
    out = apply_actions(df, [AttrAction("insert", "env", value="e")])
    assert out.collect()[0].env == "e"


def test_update_missing_column_is_noop(spark):
    df = spark.createDataFrame([("a",)], "id string")
    out = apply_actions(df, [AttrAction("update", "env", value="e")])
    assert "env" not in out.columns


def test_delete(spark):
    df = spark.createDataFrame([("a", "x")], "id string, env string")
    out = apply_actions(df, [AttrAction("delete", "env")])
    assert out.columns == ["id"]


def test_hash_sha1_matches_reference_digest(spark):
    """The reference PII-scrubs with SHA-1 (attraction.go hash case)."""
    df = spark.createDataFrame([("a", "user@example.com"), ("b", None)], "id string, email string")
    out = {r.id: r.email for r in apply_actions(df, [AttrAction("hash", "email")]).collect()}
    assert out["a"] == hashlib.sha1(b"user@example.com").hexdigest()
    assert out["b"] is None


def test_from_attribute_copy(spark):
    df = spark.createDataFrame([("a", "v1", None)], "id string, src string, dst string")
    out = apply_actions(df, [AttrAction("upsert", "dst", from_attribute="src")])
    assert out.collect()[0].dst == "v1"


def test_convert(spark):
    df = spark.createDataFrame([("a", "42")], "id string, k string")
    out = apply_actions(df, [AttrAction("convert", "k", converted_type="int")])
    row = out.collect()[0]
    assert row.k == 42 and dict(out.dtypes)["k"] == "int"


def test_extract_action(spark):
    df = spark.createDataFrame([("a", "svc=api k=7")], "id string, raw string")
    out = apply_actions(
        df,
        [AttrAction("extract", "raw", pattern=r"svc=(?P<svc>\w+) k=(?P<k>\d+)", types={"k": "int"})],
    ).collect()[0]
    assert out.svc == "api" and out.k == 7


def test_span_rename_skips_on_missing_attr(spark):
    """spanprocessor processFromAttributes: missing attribute → no rename."""
    df = spark.createDataFrame(
        [("s1", "a", "b", "old"), ("s2", "a", None, "old")],
        "id string, x string, y string, name string",
    )
    out = {r.id: r.name for r in span_rename(df, "name", ["x", "y"], "::").collect()}
    assert out == {"s1": "a::b", "s2": "old"}
