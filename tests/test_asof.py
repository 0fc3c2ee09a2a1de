"""As-of join semantics: at-or-before matching, equal-ts inclusion,
unmatched-left NULLs, per-key isolation (engine extension, SURVEY §2.7)."""

from __future__ import annotations

import pyspark.sql.functions as F

from opentelemetry_collector_spark.operators.asof import asof_join


def _ts(s):
    return f"2024-01-01 00:00:{s:02d}"


def test_asof_basic_and_equal_ts(spark):
    left = spark.createDataFrame(
        [("u1", _ts(5), "a"), ("u1", _ts(10), "b"), ("u1", _ts(2), "c")],
        "k string, ts_s string, tag string",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "tag")
    right = spark.createDataFrame(
        [("u1", _ts(3), 30), ("u1", _ts(10), 100)],
        "k string, ts_s string, v int",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    got = {r.tag: r.r_v for r in asof_join(left, right, on="k").collect()}
    # a@5 -> v@3; b@10 -> v@10 (equal ts INCLUDED, <= semantics); c@2 -> none
    assert got == {"a": 30, "b": 100, "c": None}


def test_asof_keys_are_isolated(spark):
    left = spark.createDataFrame(
        [("u1", _ts(9)), ("u2", _ts(9))], "k string, ts_s string"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("u1", _ts(1), 11)], "k string, ts_s string, v int"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    got = {r.k: r.r_v for r in asof_join(left, right, on="k").collect()}
    assert got == {"u1": 11, "u2": None}  # u2 never sees u1's rows


def test_asof_single_shuffle_plan(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") + 1_700_000_000).alias("ts"),
        F.col("id").alias("lv"),
    )
    right = spark.range(20).select(
        (F.col("id") % 5).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") * 5 + 1_700_000_000).alias("ts"),
        (F.col("id") * 10).alias("rv"),
    )
    plan = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    # one keyed exchange for the window; no join operator at all (the whole
    # as-of is union + running last) and certainly no range/nested loop
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_asof_null_keys_never_match(spark):
    """NULL join keys must not match each other (join semantics; the DuckDB
    ASOF oracle agrees) — review finding r2."""
    left = spark.createDataFrame(
        [(1, None, _ts(5)), (2, "u1", _ts(5))], "lid int, k string, ts_s string"
    ).select("lid", "k", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(None, _ts(1), 10), ("u1", _ts(1), 20)], "k string, ts_s string, v int"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    got = {r.lid: r.r_v for r in asof_join(left, right, on="k").collect()}
    assert got == {1: None, 2: 20}


def test_asof_keyless_global_join(spark):
    """on=[] — attach the latest right row regardless of key."""
    left = spark.createDataFrame([(1, _ts(9))], "lid int, ts_s string").select(
        "lid", F.col("ts_s").cast("timestamp").alias("ts")
    )
    right = spark.createDataFrame([(_ts(1), 5), (_ts(8), 7)], "ts_s string, v int").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "v"
    )
    got = asof_join(left, right, on=[], ts_col="ts").collect()
    assert got[0].r_v == 7


def test_asof_null_right_ts_never_matches(spark):
    """DuckDB ASOF (r.ts <= l.ts) is NULL-false; Spark's nulls-first ASC
    sort would otherwise carry a NULL-ts right row into every frame
    (advice finding r2)."""
    left = spark.createDataFrame([("u1", _ts(10))], "k string, ts_s string").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts")
    )
    right = spark.createDataFrame(
        [("u1", None, 99), ("u1", _ts(3), 30)], "k string, ts_s string, v int"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    got = asof_join(left, right, on="k").collect()
    assert got[0].r_v == 30  # NULL-ts row must not win (nor ever match)

    only_null = right.filter(F.col("v") == 99)
    got2 = asof_join(left, only_null, on="k").collect()
    assert got2[0].r_v is None


def test_interval_join_bucketed_exact_containment(spark):
    from opentelemetry_collector_spark.operators.asof import interval_join_bucketed

    B = 100  # tiny buckets so intervals span several
    ev = spark.createDataFrame(
        [(0, 49), (1, 150), (2, 250), (3, 251), (4, 999)],
        "eid long, ts_us long",
    )
    iv = spark.createDataFrame(
        [(10, 50, 250),    # spans buckets 0..2, boundaries inclusive
         (20, 240, 260)],  # overlaps the first
        "iv_id long, lo long, hi long",
    )
    out = [(r.eid, r.iv_id) for r in interval_join_bucketed(
        ev, iv, "ts_us", "iv_id", "lo", "hi", bucket_us=B
    ).collect()]
    assert sorted(out) == [(1, 10), (2, 10), (2, 20), (3, 20)]
    # equi-join on the bucket, not a nested-loop theta join
    plan = interval_join_bucketed(ev, iv, "ts_us", "iv_id", "lo", "hi", bucket_us=B) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
