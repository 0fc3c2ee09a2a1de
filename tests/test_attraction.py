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


# ---------------------------------------------------------------------------
# map-mode attraction (§2.11): parity with the column-mode action table
# ---------------------------------------------------------------------------

MAP_ROWS = [
    ("d1", {"svc": "auth", "env": None, "n": "7"}),
    ("d2", {"svc": "pay", "env": "stage", "n": "12"}),
    ("d3", {"svc": None, "n": "3"}),
]
MAP_CHAIN = [
    AttrAction("insert", "env", value="prod"),          # fills d3's absent, not d2's present
    AttrAction("update", "svc", value="redacted"),      # only where key present
    AttrAction("upsert", "tier", from_attribute="svc"),
    AttrAction("hash", "svc", value="sha256"),
    AttrAction("convert", "n", converted_type="double"),
    AttrAction("delete", "env"),
]


def _map_mode_result(spark):
    from opentelemetry_collector_spark.operators.attraction import apply_actions_map

    df = spark.createDataFrame(MAP_ROWS, "id string, attrs map<string,string>")
    out = apply_actions_map(df, "attrs", MAP_CHAIN)
    return {r.id: r.attrs for r in out.collect()}


def test_map_mode_action_semantics(spark):
    got = _map_mode_result(spark)
    sha = lambda s: hashlib.sha256(s.encode()).hexdigest()  # noqa: E731
    # insert only filled the truly-absent key (d3); present-but-null (d1)
    # stays null: map_contains_key is the map reading of "present"
    assert "env" not in got["d3"] or got["d3"].get("env") is None  # deleted at the end anyway
    assert all("env" not in m for m in got.values())               # delete ran last
    # update fires wherever the KEY exists — including d3's null-valued svc
    # (reference: attraction.go update requires key presence, not a value)
    assert all(m["svc"] == sha("redacted") for m in got.values())
    assert got["d1"]["tier"] == "redacted"
    assert got["d1"]["n"] == "7.0" and got["d2"]["n"] == "12.0"


def test_map_mode_matches_column_mode(spark):
    """Same logical data + same chain through both engines ⇒ same attrs.

    Column-mode 'present' means the column exists for ALL rows, so we use a
    key set where presence is uniform (the only semantic divergence between
    a ragged map and rectangular columns is per-row key absence)."""
    rows = [("d1", "auth", None, "7"), ("d2", "pay", "stage", "12")]
    cols = spark.createDataFrame(rows, "id string, svc string, env string, n string")
    chain = [
        AttrAction("insert", "env", value="prod"),   # fills NULL in column mode
        AttrAction("update", "svc", value="redacted"),
        AttrAction("upsert", "tier", from_attribute="svc"),
        AttrAction("hash", "svc", value="sha256"),
        AttrAction("convert", "n", converted_type="double"),
    ]
    col_out = {
        r.id: (r.svc, r.env, r.n, r.tier)
        for r in apply_actions(cols, chain).select("id", "svc", "env", "n", "tier").collect()
    }

    from opentelemetry_collector_spark.operators.attraction import apply_actions_map

    maps = spark.createDataFrame(
        [(i, {"svc": s, "env": e, "n": n}) for i, s, e, n in rows],
        "id string, attrs map<string,string>",
    )
    map_out = {r.id: r.attrs for r in apply_actions_map(maps, "attrs", chain).collect()}
    for rid, (svc, env, n, tier) in col_out.items():
        m = map_out[rid]
        # column-mode convert yields a real double; map values stay strings
        assert m["svc"] == svc and m["n"] == str(n) and m["tier"] == tier
        # d1: column-mode insert fills NULL; map-mode insert sees the key as
        # PRESENT (null-valued) and skips — the one documented divergence
        if rid == "d2":
            assert m["env"] == env


def test_map_mode_from_attribute_missing_source_skips(spark):
    """FromAttribute on an absent source key must skip the action (reference
    semantics), not write a phantom NULL entry (code-review finding r2)."""
    from opentelemetry_collector_spark.operators.attraction import apply_actions_map

    df = spark.createDataFrame([("d1", {"a": "x"})], "id string, attrs map<string,string>")
    chain = [
        AttrAction("insert", "b", from_attribute="missing"),
        AttrAction("upsert", "c", from_attribute="missing"),
        AttrAction("update", "a", from_attribute="missing"),
    ]
    got = apply_actions_map(df, "attrs", chain).collect()[0].attrs
    assert got == {"a": "x"}  # untouched: no phantom b/c, a not nulled
