"""Fanout/router semantics — mirrors fanoutconnector_test.go
(TestTracesProcessorMultiplexing: every consumer receives every matching
batch; counts equal) plus routing priority and exhaustiveness."""

import pyspark.sql.functions as F

from opentelemetry_collector_spark.operators.router import (
    Route,
    exhaustiveness_check,
    fanout,
    route_tag,
    routes_from_df,
    union_sources,
)

ROUTES = [
    Route("hot", "src = 'a'", 0),
    Route("warm", "src IN ('b','c')", 1),
    Route("rest", "TRUE", 9),
]


def _df(spark):
    rows = [(i, src) for i, src in enumerate(["a", "b", "c", "d", "a", "e"])]
    return spark.createDataFrame(rows, "id int, src string")


def test_first_match_wins_priority(spark):
    # overlapping predicates: priority 0 must win
    routes = [Route("low", "src = 'a'", 5), Route("high", "src = 'a'", 0), Route("rest", "TRUE", 9)]
    tagged = route_tag(_df(spark), routes)
    sinks = {r.sink for r in tagged.filter(F.col("src") == "a").collect()}
    assert sinks == {"high"}


def test_fanout_multiplexing(spark):
    df = _df(spark)
    out = fanout(df, ROUTES)
    counts = {s: b.count() for s, b in out.items()}
    assert counts == {"hot": 2, "warm": 2, "rest": 2}
    # disjoint: each row lands in exactly one sink
    total = sum(counts.values())
    assert total == df.count()


def test_exhaustiveness_check_empty(spark):
    df = _df(spark)
    out = fanout(df, ROUTES)
    assert exhaustiveness_check(df, out).count() == 0


def test_exhaustiveness_check_catches_loss(spark):
    df = _df(spark)
    out = fanout(df, ROUTES)
    out.pop("rest")  # simulate a dropped sink
    assert exhaustiveness_check(df, out).count() == 2


def test_union_sources_no_dedup(spark):
    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    assert union_sources([a, b]).count() == 3  # UNION ALL semantics


def test_union_allows_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id int, extra string")
    b = spark.createDataFrame([(2,)], "id int")
    out = union_sources([a, b])
    assert out.count() == 2 and set(out.columns) == {"id", "extra"}


def test_routes_from_config_df(spark):
    cfg = spark.createDataFrame(
        [("hot", "src = 'a'", 0), ("rest", "TRUE", 9)], "sink string, predicate string, priority int"
    )
    routes = routes_from_df(cfg)
    tagged = route_tag(_df(spark), routes)
    assert tagged.filter("sink = 'hot'").count() == 2


def test_no_route_yields_null_tag(spark):
    tagged = route_tag(_df(spark), [Route("hot", "src = 'a'", 0)])
    assert tagged.filter(F.col("sink").isNull()).count() == 4


def test_group_by_attrs_resources_and_null_keys(spark):
    from opentelemetry_collector_spark.operators.router import group_by_attrs

    rows = [(1, "a", "en"), (2, "a", "en"), (3, "a", None), (4, "a", "NULL")]
    df = spark.createDataFrame(rows, "id long, src string, lang string")
    resources, records = group_by_attrs(df, ["src", "lang"])
    res = resources.collect()
    # NULL and the literal string "NULL" are DIFFERENT resources
    assert len(res) == 3
    rid = {(r.src, r.lang): r.resource_id for r in res}
    assert len(set(rid.values())) == 3
    # record side carries the matching id, computed without any join
    recs = {r.id: r.resource_id for r in records.collect()}
    assert recs[1] == recs[2] == rid[("a", "en")]
    assert recs[3] == rid[("a", None)] != recs[4]


def test_group_by_attrs_record_side_no_shuffle(spark):
    from opentelemetry_collector_spark.operators.router import group_by_attrs

    df = spark.createDataFrame([(1, "a")], "id long, src string")
    _, records = group_by_attrs(df, ["src"])
    plan = records._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    # compact=True opts into the co-locating repartition
    _, compacted = group_by_attrs(df, ["src"], compact=True)
    cplan = compacted._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(resource_id" in cplan


def test_group_by_attrs_resource_id_not_forgeable(spark):
    """Length-prefixed key encoding: values crafted to contain the old
    delimiter bytes (or 'v<len>:' framing text) cannot merge two DISTINCT
    key tuples into one resource id."""
    from opentelemetry_collector_spark.operators.router import group_by_attrs

    rows = [
        (1, "a\x1d\x1fb", None),      # old scheme: collided with ('a','b')
        (2, "a", "b"),
        (3, "v1:a", "b"),             # framing-text injection attempt
        (4, "v", "1:ab"),
        (5, None, "n:"),              # nil marker as a literal value
        (6, "n:", None),
    ]
    df = spark.createDataFrame(rows, "id long, k1 string, k2 string")
    resources, _ = group_by_attrs(df, ["k1", "k2"])
    assert resources.count() == 6  # all six tuples distinct
