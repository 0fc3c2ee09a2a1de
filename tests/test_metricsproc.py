"""Metrics-pipeline processors: golden values on hand-computable frames."""

import math

import pyspark.sql.functions as F

from opentelemetry_collector_spark.operators.metricsproc import (
    assemble_traces,
    histogram_quantile,
    increase_with_resets,
    metrics_transform,
    red_metrics,
)
from opentelemetry_collector_spark.operators.attraction import (
    redact,
    redaction_count,
)
from opentelemetry_collector_spark.operators.textstats import token_entropy


def test_red_metrics_buckets_and_errors(spark):
    rows = [
        ("a", 0.3, 1),   # le all buckets
        ("a", 1.5, 99),  # error; le 2.0+
        ("a", 9.0, 5),   # above every bound
        ("b", 0.6, 0),
    ]
    df = spark.createDataFrame(rows, "name string, dur double, code int")
    out = {
        r["name"]: r
        for r in red_metrics(
            df, "name", "dur", F.col("code") > 90, [0.5, 2.0]
        ).collect()
    }
    a = out["a"]
    assert (a.calls, a.errors) == (3, 1)
    assert (a.le_0_5, a.le_2_0) == (1, 2)  # cumulative-LE semantics
    assert abs(a.duration_sum - 10.8) < 1e-9
    b = out["b"]
    assert (b.calls, b.errors, b.le_0_5, b.le_2_0) == (1, 0, 0, 1)


def test_metrics_transform_rename_passthrough(spark):
    df = spark.createDataFrame(
        [("old", 1, 1.0), ("old", 1, 2.0), ("other", 1, 4.0)],
        "m string, g int, v double",
    )
    out = {
        (r.m, r.g): r
        for r in metrics_transform(df, "m", {"old": "new"}, "v", 10.0, ["m", "g"]).collect()
    }
    assert out[("new", 1)].value_sum == 30.0  # renamed + scaled + re-summed
    assert out[("other", 1)].value_sum == 40.0  # unmapped passes through
    assert out[("new", 1)].n_points == 2


def test_increase_with_resets_prometheus_semantics(spark):
    # series: 5, 8, 2 (reset), 6 -> increases: NULL, 3, 2, 4
    rows = [("k", i, c) for i, c in enumerate([5, 8, 2, 6])]
    df = spark.createDataFrame(rows, "k string, t int, c long")
    out = [
        r.increase
        for r in increase_with_resets(df, ["k"], "t", "c").orderBy("t").collect()
    ]
    assert out == [None, 3, 2, 4]


def test_histogram_quantile_interpolation(spark):
    # 100 samples uniform over (0, 10]: bounds [2.5, 5.0, 10.0].
    # p50 rank=50 falls in bucket (2.5, 5.0]: cum_prev=25, n=25
    # -> 2.5 + (50-25)/25 * 2.5 = 5.0
    rows = [("u", (i + 1) / 10.0) for i in range(100)]
    df = spark.createDataFrame(rows, "d string, v double")
    out = histogram_quantile(df, "d", "v", 0.5, [2.5, 5.0, 10.0]).collect()
    assert len(out) == 1 and abs(out[0].quantile - 5.0) < 1e-9


def test_histogram_quantile_inf_clamps(spark):
    df = spark.createDataFrame([("u", 100.0)] * 5, "d string, v double")
    out = histogram_quantile(df, "d", "v", 0.95, [1.0, 2.0]).collect()
    assert out[0].quantile == 2.0  # +Inf bucket clamps to last finite bound


def test_assemble_traces_order_deterministic(spark):
    rows = [
        (7, "2024-01-01 00:00:02", 3, "c"),
        (7, "2024-01-01 00:00:00", 1, "a"),
        (7, "2024-01-01 00:00:00", 2, "b"),  # ts tie -> tiebreak column
    ]
    df = spark.createDataFrame(
        rows, "trace long, ts string, sid long, span string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = assemble_traces(df.repartition(3), "trace", "ts", "sid", "span").collect()
    assert out[0].path == "a>b>c"
    assert out[0].n_spans == 3
    assert out[0].duration_us == 2_000_000


def test_redact_masks_and_counts(spark):
    line = "from bob@x.io at 10.0.0.1 card 4111111111111111 ok"
    df = spark.createDataFrame([(line,)], "s string")
    r = df.select(
        redact(F.col("s")).alias("red"),
        redaction_count(F.col("s")).alias("n"),
    ).collect()[0]
    assert r.red == "from [EMAIL] at [IP] card [CARD] ok"
    assert r.n == 3


def test_redact_email_shadows_card_digits(spark):
    # digits inside an email are masked by the email rule first, so the
    # card pattern must not double-count them
    df = spark.createDataFrame([("x 4111111111111111@mail.com y",)], "s string")
    r = df.select(redaction_count(F.col("s")).alias("n")).collect()[0]
    assert r.n == 1


def test_token_entropy_golden(spark):
    # "a a b b" -> n=4, two types each p=0.5 -> H=1 bit, ttr=0.5
    # "a a a a" -> H=0, ttr=0.25
    df = spark.createDataFrame(
        [(1, "a a b b"), (2, "a a a a")], "id long, text string"
    )
    out = {r.id: r for r in token_entropy(df, "id", "text").collect()}
    assert out[1].n_tok == 4 and out[1].n_types == 2
    assert abs(out[1].entropy_bits - 1.0) < 1e-9
    assert abs(out[1].type_token_ratio - 0.5) < 1e-9
    assert out[2].entropy_bits == 0.0
    assert abs(out[2].type_token_ratio - 0.25) < 1e-9


def test_sketch_audits_flag_out_of_tolerance(spark):
    from opentelemetry_collector_spark.operators.aggregates import (
        approx_distinct_audit,
        approx_quantile_audit,
    )

    df = spark.createDataFrame(
        [("g", i) for i in range(1000)], "k string, v long"
    )
    ok = approx_distinct_audit(df, "k", "v", rsd=0.02, tolerance=0.05).collect()[0]
    assert ok.n_exact == 1000 and ok.sketch_ok == 1
    # tolerance 0 can only pass if the estimate is EXACTLY the true count;
    # HLL at rsd 0.3 on 1000 distincts virtually never is
    bad = approx_distinct_audit(df, "k", "v", rsd=0.3, tolerance=0.0).collect()[0]
    assert bad.sketch_ok == 0

    q = approx_quantile_audit(df, "k", "v", [0.5], tolerance=0.10).collect()[0]
    assert q.ok_p0_5 == 1 and abs(q.p0_5 - 499.5) < 1e-6


def test_exponential_histogram_bucket_edges(spark):
    from opentelemetry_collector_spark.operators.metricsproc import (
        exponential_histogram,
    )

    # scale=0 -> base 2: bucket i covers (2^i, 2^(i+1)]
    # v=1.0 -> ceil(log2(1)*1)-1 = -1; v=2.0 -> 0; v=2.5 -> ceil(1.32)-1 = 1
    # v=0 -> zero bucket
    rows = [("d", 1.0), ("d", 2.0), ("d", 2.5), ("d", 0.0)]
    df = spark.createDataFrame(rows, "d string, v double")
    out = exponential_histogram(df, "d", "v", scale=0).collect()[0]
    assert out.zero_count == 1
    assert out.idx_min == -1 and out.idx_max == 1
    assert out.n_buckets == 3 and out.n_values == 3


def test_generate_metric_ratio_and_edge_cases(spark):
    from opentelemetry_collector_spark.operators.metricsproc import generate_metric

    rows = [
        ("usage", "h1", 50.0), ("limit", "h1", 100.0),   # ratio 0.5
        ("usage", "h2", 10.0), ("limit", "h2", 0.0),     # zero denom -> NULL
        ("usage", "h3", 7.0),                            # missing denom -> NULL
        ("noise", "h1", 999.0),                          # unrelated series ignored
    ]
    df = spark.createDataFrame(rows, "name string, host string, value double")
    out = {
        r.host: r.value
        for r in generate_metric(
            df, "name", "value", ["host"], "utilization", "usage", "limit"
        ).collect()
    }
    assert out == {"h1": 0.5, "h2": None, "h3": None}

    add = generate_metric(
        df, "name", "value", ["host"], "total", "usage", "limit", operation="add"
    )
    assert {r.host: r.value for r in add.collect()}["h1"] == 150.0

    import pytest

    with pytest.raises(ValueError, match="operation"):
        generate_metric(df, "name", "value", ["host"], "x", "usage", "limit",
                        operation="modulo")


def test_generate_metric_single_aggregate_no_join(spark):
    """The two operands must come from ONE scan + ONE aggregate — no
    self-join (the naive pivot-then-join shape doubles the scan at scale)."""
    from opentelemetry_collector_spark.operators.metricsproc import generate_metric

    df = spark.createDataFrame(
        [("usage", "h1", 1.0)], "name string, host string, value double"
    )
    plan = generate_metric(
        df, "name", "value", ["host"], "u", "usage", "limit"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_service_graph_edges(spark):
    """Pair client/server spans on (trace, parent==span), per-edge RED."""
    import pyspark.sql.functions as F

    from opentelemetry_collector_spark.operators.metricsproc import service_graph

    # trace t1: a(frontend) -> b(api) -> c(db); trace t2: d(frontend) -> e(db, error)
    rows = [
        ("t1", "a", None, "frontend", 10.0, False),
        ("t1", "b", "a", "api", 30.0, False),
        ("t1", "c", "b", "db", 120.0, False),
        ("t2", "d", None, "frontend", 5.0, False),
        ("t2", "e", "d", "db", 40.0, True),
    ]
    df = spark.createDataFrame(
        rows, "trace string, span string, parent string, svc string, "
              "dur double, is_err boolean"
    )
    out = {
        (r.client, r.server): r
        for r in service_graph(
            df, "trace", "span", "parent", "svc", "dur", F.col("is_err"),
            [25.0, 100.0],
        ).collect()
    }
    # root spans (a, d) never appear as servers; 3 edges total
    assert set(out) == {("frontend", "api"), ("api", "db"), ("frontend", "db")}
    e = out[("frontend", "db")]
    assert e.calls == 1 and e.errors == 1 and e.duration_sum == 40.0
    assert e.le_25_0 == 0 and e.le_100_0 == 1
    e2 = out[("api", "db")]
    assert e2.calls == 1 and e2.errors == 0 and e2.le_100_0 == 0  # 120 > 100


def test_service_graph_matches_lag_reference(spark):
    """On chain-parentage (prev span in trace) the join must reproduce the
    window-lag reference exactly — the same pairing, different shape."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from opentelemetry_collector_spark.operators.metricsproc import service_graph

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sp = ev.withColumn(
        "parent_id",
        F.lag("event_id").over(Window.partitionBy("user_id").orderBy("ts", "event_id")),
    )
    got = (
        service_graph(
            sp, "user_id", "event_id", "parent_id", "event_type", "value",
            F.lit(False), [50.0],
        )
        .select("client", "server", "calls")
        .collect()
    )
    ref = (
        sp.withColumn(
            "client",
            F.lag("event_type").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("client").isNotNull())
        .groupBy("client", F.col("event_type").alias("server"))
        .count()
        .collect()
    )
    assert {(r.client, r.server): r.calls for r in got} == {
        (r.client, r.server): r["count"] for r in ref
    }


def test_funnel_steps_ordering_enforced(spark):
    from datetime import datetime

    from opentelemetry_collector_spark.operators.aggregates import funnel_steps

    T = lambda m: datetime(2025, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1 completes the full ordered funnel
        (1, T(0), "view"), (1, T(1), "click"), (1, T(2), "purchase"),
        # u2 clicks BEFORE viewing -> that click must not count; no later click
        (2, T(0), "click"), (2, T(1), "view"), (2, T(2), "purchase"),
        # u3 views only
        (3, T(0), "view"),
        # u4 same-timestamp view+click (ties count), no purchase
        (4, T(0), "view"), (4, T(0), "click"),
        # u5 never views -> not even step 0
        (5, T(0), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.step: r for r in funnel_steps(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert out["view"].n_users == 4
    assert out["click"].n_users == 2          # u1 and u4 only
    assert out["purchase"].n_users == 1       # u1 only
    assert out["view"].conv_from_prev is None
    assert out["click"].conv_from_prev == 0.5
    assert out["purchase"].conv_from_prev == 0.5


def test_cohort_retention_offsets_and_rates(spark):
    from datetime import datetime, timedelta

    from opentelemetry_collector_spark.operators.aggregates import cohort_retention

    base = datetime(2025, 1, 2)  # epoch-week boundary-agnostic
    rows = []
    # cohort A: users 1,2 first active week 0; user 1 returns week 1 and 3
    for u, wk_offsets in ((1, [0, 1, 3]), (2, [0]), (3, [1, 2])):
        for w in wk_offsets:
            rows.append((u, base + timedelta(weeks=w)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = cohort_retention(df, "user_id", "ts").collect()
    cohorts = sorted({r.cohort_week for r in out})
    a, b = cohorts[0], cohorts[1]
    cells = {(r.cohort_week, r.week_offset): r for r in out}
    assert cells[(a, 0)].n_active == 2 and cells[(a, 0)].retention == 1.0
    assert cells[(a, 1)].n_active == 1 and cells[(a, 1)].retention == 0.5
    assert (a, 2) not in cells and cells[(a, 3)].n_active == 1
    assert cells[(b, 0)].n_active == 1 and cells[(b, 1)].n_active == 1


def test_mad_outlier_audit_robust_to_spike(spark):
    from opentelemetry_collector_spark.operators.aggregates import mad_outlier_audit

    # 99 values near 10 (alternating 9/11 -> med 10, mad 1) + one 1000 spike
    rows = [("a", float(9 + 2 * (i % 2))) for i in range(99)] + [("a", 1000.0)]
    rows += [("b", float(i)) for i in range(1, 12)]  # clean 1..11: no outliers
    df = spark.createDataFrame(rows, "k string, value double")
    out = {r.k: r for r in mad_outlier_audit(df, "k", "value").collect()}
    assert out["a"].med == 10.0 and out["a"].mad == 1.0
    assert out["a"].n_outliers == 1 and out["a"].outlier_rate == 0.01
    assert out["b"].med == 6.0 and out["b"].mad == 3.0
    assert out["b"].n_outliers == 0


def test_transition_matrix_counts_and_probs(spark):
    from datetime import datetime

    from opentelemetry_collector_spark.operators.aggregates import transition_matrix

    T = lambda m: datetime(2025, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, 1, T(0), "a"), (1, 2, T(1), "b"), (1, 3, T(2), "a"),
        (2, 4, T(0), "a"), (2, 5, T(1), "b"), (2, 6, T(2), "b"),
        (3, 7, T(0), "c"),  # single event: no transitions
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")
    out = {(r.prev, r.cur): r for r in transition_matrix(
        df, "user_id", "ts", "event_type", "event_id"
    ).collect()}
    assert out[("a", "b")].n == 2 and out[("a", "b")].p == 1.0
    assert out[("b", "a")].n == 1 and out[("b", "a")].p == 0.5
    assert out[("b", "b")].n == 1 and out[("b", "b")].p == 0.5
    assert ("c", "c") not in out and len(out) == 3


def test_ewma_smooth_renormalizes_head(spark):
    import pytest

    from opentelemetry_collector_spark.operators.windows import ewma_smooth

    rows = [("a", i, float(v)) for i, v in enumerate([10, 10, 10, 10, 20])]
    df = spark.createDataFrame(rows, "k string, t long, n double")
    out = {r.t: r.ewma for r in ewma_smooth(df, ["k"], "t", "n", alpha=0.5, trail=4).collect()}
    # first point: only itself present -> ewma == value exactly
    assert out[0] == 10.0
    # steady series -> ewma == level at any history depth
    assert out[3] == 10.0
    # jump to 20: weights (.5,.25,.125,.0625,.03125)/0.96875 over [20,10,10,10,10]
    want = (0.5 * 20 + 0.46875 * 10) / 0.96875
    assert out[4] == pytest.approx(round(want, 6))


def test_key_skew_audit_hot_key_histogram(spark):
    from opentelemetry_collector_spark.operators.aggregates import key_skew_audit

    # group g: keys with counts 1,1,2,10 -> hist {1:2, 2:1, 10:1}
    rows = [("g", 1)] + [("g", 2)] + [("g", 3)] * 2 + [("g", 4)] * 10
    # group h: 5 uniform keys, 2 rows each -> no skew
    rows += [("h", k) for k in range(1, 6) for _ in range(2)]
    df = spark.createDataFrame(rows, "grp string, user long")
    out = {r.grp: r for r in key_skew_audit(df, "grp", "user").collect()}
    g = out["g"]
    assert (g.n_keys, g.n_rows, g.max_c) == (4, 14, 10)
    # discrete lower quantiles from the cum histogram: ceil(q*4) keys covered
    assert (g.p50_c, g.p90_c, g.p99_c) == (1, 10, 10)
    assert g.max_share == round(10 / 14, 6)
    h = out["h"]
    assert (h.n_keys, h.n_rows, h.max_c) == (5, 10, 2)
    assert (h.p50_c, h.p90_c, h.p99_c) == (2, 2, 2)
    assert h.max_share == 0.2


def test_funnel_latencies_per_edge_percentiles(spark):
    from datetime import datetime

    from opentelemetry_collector_spark.operators.aggregates import funnel_latencies

    T = lambda m: datetime(2025, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, T(0), "view"), (1, T(10), "click"), (1, T(40), "purchase"),
        (2, T(0), "view"), (2, T(20), "click"),
        (3, T(5), "click"),                       # no view: not in funnel
        (4, T(0), "click"), (4, T(10), "view"), (4, T(30), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.edge: r for r in funnel_latencies(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    e1 = out["view->click"]
    # u1 600s, u2 1200s, u4 1200s (pre-view click at T(0) ignored)
    assert e1.n_users == 3 and e1.p50_s == 1200.0 and e1.avg_s == 1000.0
    e2 = out["click->purchase"]
    assert e2.n_users == 1 and e2.p50_s == 1800.0 == e2.p90_s == e2.avg_s


def test_cooccurrence_lift_values(spark):
    from opentelemetry_collector_spark.operators.aggregates import cooccurrence_lift

    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {(r.item_a, r.item_b): r for r in cooccurrence_lift(
        df, "user_id", "event_type"
    ).collect()}
    # only a+b co-occur; duplicates within a basket count once
    assert set(out) == {("a", "b")}
    ab = out[("a", "b")]
    # n_both=2, N=4 baskets, n_a=3, n_b=2 -> lift = 2*4/(3*2)
    assert ab.n_both == 2 and ab.lift == round(8 / 6, 6)


def test_hourly_profile_chi2_and_peak(spark):
    from datetime import datetime

    from opentelemetry_collector_spark.operators.aggregates import hourly_profile

    rows = [(datetime(2025, 1, 1, 3, i), "x") for i in range(24)]       # all hour 3
    rows += [(datetime(2025, 1, 1, h, 0), "y") for h in range(24)]      # flat
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r.event_type: r for r in hourly_profile(df, "event_type", "ts").collect()}
    x = out["x"]
    # fully concentrated: chi2 = 24*24^2/24 - 24 = 552
    assert (x.n, x.peak_hour, x.peak_share, x.chi2_uniform) == (24, 3, 1.0, 552.0)
    y = out["y"]
    # perfectly uniform: chi2 = 0; peak tie resolves to the smallest hour
    assert (y.n, y.peak_hour, y.chi2_uniform) == (24, 0, 0.0)
    assert y.peak_share == round(1 / 24, 6)


def test_countmin_never_undercounts_and_is_exact_when_wide(spark):
    from opentelemetry_collector_spark.operators.aggregates import countmin_audit

    rows = [(i, " ".join(f"w{j % 13}" for j in range(i, i + 12))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    narrow = countmin_audit(df, "text", depth=4, width=8, k=13).collect()
    # CM structurally never undercounts
    assert all(r.n_est >= r.n_exact and r.overcount == r.n_est - r.n_exact for r in narrow)
    assert any(r.overcount > 0 for r in narrow)  # 13 tokens into 8 buckets MUST collide
    wide = countmin_audit(df, "text", depth=4, width=4096, k=13).collect()
    # 13 tokens into 4 independent 4096-bucket rows: min over rows is exact
    assert all(r.overcount == 0 for r in wide)
    assert len(wide) == 13


def test_countmin_deterministic_under_partitioning(spark):
    from opentelemetry_collector_spark.operators.aggregates import countmin_audit

    rows = [(i, " ".join(f"t{(i * 7 + j) % 29}" for j in range(10))) for i in range(60)]
    a = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    b = spark.createDataFrame(rows, "doc_id long, text string").repartition(16)
    ra = sorted(map(tuple, countmin_audit(a, "text", width=64).collect()))
    rb = sorted(map(tuple, countmin_audit(b, "text", width=64).collect()))
    assert ra == rb
