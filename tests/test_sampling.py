"""Sampler parity — mirrors probabilisticsampler_test.go (keep-rate within
tolerance, per-id determinism) plus bit-exact FNV-1a vectors."""

import numpy as np
import pyspark.sql.functions as F

from opentelemetry_collector_spark.functions.hashing import (
    NUM_SAMPLER_BUCKETS,
    fnv1a32,
)
from opentelemetry_collector_spark.operators.sampling import (
    TailPolicy,
    dropped_traces,
    probabilistic_sample,
    sampling_threshold,
    tail_sample,
)


def _fnv1a_ref(data: bytes) -> int:
    """Independent scalar FNV-1a 32 (the reference hash.go algorithm)."""
    h = 2166136261
    for b in data:
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def test_fnv1a_vectors_bit_exact():
    cases = [b"", b"a", b"hello", b"trace-id-0123456789abcdef", bytes(range(256))]
    for seed in (0, 1, 22):
        seed_b = seed.to_bytes(4, "big")
        got = fnv1a32(cases, seed)
        want = np.array([_fnv1a_ref(seed_b + c) for c in cases], dtype=np.uint32)
        assert (got == want).all(), (seed, got, want)


def test_threshold_scaling():
    # collector: scaledSamplingRate = pct * 0x4000 / 100
    assert sampling_threshold(100.0) == NUM_SAMPLER_BUCKETS
    assert sampling_threshold(50.0) == NUM_SAMPLER_BUCKETS // 2
    assert sampling_threshold(0.0) == 0


def test_keep_rate_and_determinism(spark):
    n = 20_000
    df = spark.range(n).select(F.concat(F.lit("trace"), F.col("id").cast("string")).alias("tid"))
    for method in ("fnv1a", "xxhash64", "portable"):
        kept = probabilistic_sample(df, 25.0, "tid", method=method)
        k1 = kept.count()
        assert abs(k1 / n - 0.25) < 0.02, (method, k1)
        # determinism: same input → identical kept set
        ids1 = {r.tid for r in kept.collect()}
        ids2 = {r.tid for r in probabilistic_sample(df, 25.0, "tid", method=method).collect()}
        assert ids1 == ids2


def test_sampled_subset_monotone(spark):
    """Reference property: raising the rate only adds traces (same hash)."""
    df = spark.range(5000).select(F.col("id").cast("string").alias("tid"))
    k10 = {r.tid for r in probabilistic_sample(df, 10.0, "tid").collect()}
    k50 = {r.tid for r in probabilistic_sample(df, 50.0, "tid").collect()}
    assert k10 <= k50


def test_tail_sample_policies(spark):
    rows = [
        ("t1", "ok", 1.0), ("t1", "error", 2.0),     # kept: string policy
        ("t2", "ok", 99.0), ("t2", "ok", 1.0),       # kept: numeric policy
        ("t3", "ok", 5.0),                            # dropped
    ]
    df = spark.createDataFrame(rows, "trace_id string, status string, value double")
    out = tail_sample(
        df,
        "trace_id",
        [
            TailPolicy("string_attribute", col="status", values=["error"]),
            TailPolicy("numeric_attribute", col="value", lo=90.0, hi=1000.0),
        ],
    )
    kept = {r.trace_id for r in out.collect()}
    assert kept == {"t1", "t2"}
    # whole traces kept (both t1 rows), and the audit anti-join sees t3
    assert out.count() == 4
    assert {r.trace_id for r in dropped_traces(df, out, "trace_id").collect()} == {"t3"}


def test_tail_sample_contrib_policy_kinds(spark):
    """latency / span_count / probabilistic / ottl / and — each decides at
    trace granularity, and all compile into the one groupBy pass."""
    rows = [
        # t1: 2 rows, 5000 ms span, has error+hi value  → and-policy keep
        ("t1", "2024-01-01 00:00:00.000", "error", 95.0),
        ("t1", "2024-01-01 00:00:05.000", "ok", 1.0),
        # t2: 3 rows → span_count keep (no error, short span)
        ("t2", "2024-01-01 00:00:00.000", "ok", 1.0),
        ("t2", "2024-01-01 00:00:00.100", "ok", 2.0),
        ("t2", "2024-01-01 00:00:00.200", "ok", 3.0),
        # t3: long span only → latency keep
        ("t3", "2024-01-01 00:00:00.000", "ok", 1.0),
        ("t3", "2024-01-01 00:00:09.000", "ok", 2.0),
        # t4: error but low value → and-policy must NOT keep
        ("t4", "2024-01-01 00:00:00.000", "error", 1.0),
        ("t4", "2024-01-01 00:00:01.000", "ok", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "trace_id string, ts string, status string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    and_p = TailPolicy(
        "and",
        sub=[
            TailPolicy("ottl", expr='status == "error"'),
            TailPolicy("numeric_attribute", col="value", lo=90.0, hi=1e9),
        ],
    )
    def kept(policies):
        out = tail_sample(df, "trace_id", policies, ts_col="ts")
        return {r.trace_id for r in out.select("trace_id").distinct().collect()}

    assert kept([and_p]) == {"t1"}                                  # ∧ not ∨
    assert kept([TailPolicy("latency", lo=6000.0)]) == {"t3"}
    assert kept([TailPolicy("span_count", lo=3)]) == {"t2"}
    assert kept([and_p, TailPolicy("latency", lo=6000.0)]) == {"t1", "t3"}
    # probabilistic: whole-trace consistent and matches the portable bucket
    pk = kept([TailPolicy("probabilistic", lo=50)])
    import zlib

    def bucket(tid):  # crc32 fallback path for string ids
        return ((zlib.crc32(tid.encode()) % 100003) * 2654435761) % 100
    assert pk == {t for t in ["t1", "t2", "t3", "t4"] if bucket(t) < 50}


def test_tail_sample_single_shuffle_for_policy_tree(spark):
    """Four policies (incl. nested and) must still plan exactly one
    Exchange for the aggregate + the semi-join's own exchange — policy
    count never multiplies shuffles."""
    df = spark.createDataFrame(
        [("t1", "2024-01-01 00:00:00", "ok", 1.0)],
        "trace_id string, ts string, status string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = tail_sample(
        df,
        "trace_id",
        [
            TailPolicy(
                "and",
                sub=[
                    TailPolicy("ottl", expr='status == "error"'),
                    TailPolicy("numeric_attribute", col="value", lo=90.0, hi=1e9),
                ],
            ),
            TailPolicy("latency", lo=6000.0),
            TailPolicy("span_count", lo=3),
            TailPolicy("probabilistic", lo=50),
        ],
        ts_col="ts",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_agg_exchanges = plan.count("Exchange hashpartitioning(trace_id")
    assert n_agg_exchanges <= 2  # one for the agg, at most one for the join


def test_tail_sample_rate_limit(spark):
    rows = [(f"t{i}", f"2024-01-01 00:00:00.{i:03d}") for i in range(10)]
    df = spark.createDataFrame(rows, "trace_id string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = tail_sample(
        df, "trace_id",
        [TailPolicy("always"), TailPolicy("rate_limiting", limit=3)],
        ts_col="ts",
    )
    kept = sorted(r.trace_id for r in out.collect())
    assert kept == ["t0", "t1", "t2"]  # first 3 in arrival order within the second


def test_stratified_sample_matches_python_reference(spark):
    from opentelemetry_collector_spark.operators.sampling import stratified_sample

    rows = [(i, f"s{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, grp string")
    fr = {"s0": 0.5, "s1": 0.1}
    got = {r.id for r in stratified_sample(df, "grp", fr, "id", default_fraction=0.02).collect()}

    def bucket(i):
        return ((i % 100003) * 2654435761) % 16384

    want = {
        i
        for i, g in rows
        if bucket(i) < int(round(fr.get(g, 0.02) * 16384))
    }
    assert got == want and 0 < len(got) < 3000


def test_stratified_sample_deterministic_under_partitioning(spark):
    from opentelemetry_collector_spark.operators.sampling import stratified_sample

    rows = [(i, f"s{i % 4}") for i in range(2000)]
    fr = {"s0": 0.4, "s1": 0.2, "s2": 0.1}
    a = {
        r.id
        for r in stratified_sample(
            spark.createDataFrame(rows, "id long, grp string").coalesce(1), "grp", fr, "id"
        ).collect()
    }
    b = {
        r.id
        for r in stratified_sample(
            spark.createDataFrame(rows, "id long, grp string").repartition(16), "grp", fr, "id"
        ).collect()
    }
    assert a == b


def test_mixture_sample_rebalances_without_upsampling(spark):
    from opentelemetry_collector_spark.operators.sampling import mixture_sample

    # heavily skewed corpus: s0 has 8x the rows of s1/s2
    rows = [(i, "s0") for i in range(1600)] + [(2000 + i, "s1") for i in range(200)] + [
        (3000 + i, "s2") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = mixture_sample(df, "grp", "id", {"s0": 1 / 2, "s1": 1 / 4, "s2": 1 / 4}, total_fraction=0.25)
    counts = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # never upsample: every stratum keeps <= its original rows
    assert counts.get("s1", 0) <= 200 and counts.get("s2", 0) <= 200
    # the head stratum is cut much harder than its original 80% share
    total = sum(counts.values())
    assert counts["s0"] / total < 0.6
    # deterministic: rerun == same sample
    out2 = mixture_sample(df, "grp", "id", {"s0": 1 / 2, "s1": 1 / 4, "s2": 1 / 4}, total_fraction=0.25)
    assert {r.id for r in out.collect()} == {r.id for r in out2.collect()}


def test_stratified_plan_is_single_codegen_filter(spark):
    from opentelemetry_collector_spark.operators.sampling import stratified_sample

    df = spark.range(1000).select(F.col("id"), (F.col("id") % 3).cast("string").alias("grp"))
    plan = stratified_sample(df, "grp", {"0": 0.5}, "id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_mixture_sample_tolerates_null_stratum(spark):
    from opentelemetry_collector_spark.operators.sampling import mixture_sample

    rows = [(1, "s0"), (2, "s0"), (3, None), (4, "s1")]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = mixture_sample(df, "grp", "id", {"s0": 0.5, "s1": 0.5}, total_fraction=1.0)
    got = {r.id for r in out.collect()}
    assert 3 not in got  # NULL stratum: no target weight, default threshold 0


def test_hash_split_is_stable_under_data_growth(spark):
    """Adding new rows must never move existing rows between splits."""
    from opentelemetry_collector_spark.operators.sampling import hash_split

    small = spark.range(500).select(F.col("id"))
    big = spark.range(2000).select(F.col("id"))
    splits = {"train": 0.8, "val": 0.2}
    a = {r.id: r.split for r in hash_split(small, "id", splits).collect()}
    b = {r.id: r.split for r in hash_split(big, "id", splits).collect()}
    assert all(b[i] == a[i] for i in a)
    assert set(b.values()) == {"train", "val"}  # fractions sum to 1: no NULLs


def test_hash_split_rejects_oversubscribed_fractions(spark):
    import pytest

    from opentelemetry_collector_spark.operators.sampling import hash_split

    with pytest.raises(ValueError, match="> 1"):
        hash_split(spark.range(10), "id", {"a": 0.7, "b": 0.5})


def test_token_budget_sample_cuts_exact_prefix_per_stratum(spark):
    """Kept set = the hash-ordered prefix whose inclusive cumsum fits the
    budget, independently per stratum; never exceeds the budget; and is
    identical at different parallelism (two-phase prefix sum, not a
    partition-order accident)."""
    from opentelemetry_collector_spark.functions.hashing import (
        NUM_SAMPLER_BUCKETS,
    )
    from opentelemetry_collector_spark.operators.sampling import (
        token_budget_sample,
    )

    rows = [(i, "s%d" % (i % 3), 10 + (i * 7) % 50) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, src string, w long")
    out = token_budget_sample(df, "src", "id", "w", budget=120)
    got = {r.id: r.cum_weight for r in out.collect()}

    # python reference: per stratum, sort by (bucket, id), take-while <= 120
    def bucket(i):
        return ((i % 100003) * 2654435761) % NUM_SAMPLER_BUCKETS

    expect = {}
    for s in ("s0", "s1", "s2"):
        cum = 0
        for i, _, w in sorted(
            (r for r in rows if r[1] == s), key=lambda r: (bucket(r[0]), r[0])
        ):
            cum += w
            if cum > 120:
                break
            expect[i] = cum
    assert got == expect
    # same cut regardless of input partitioning
    got4 = {
        r.id: r.cum_weight
        for r in token_budget_sample(
            df.repartition(13), "src", "id", "w", budget=120
        ).collect()
    }
    assert got4 == expect


def test_epoch_replicate_exact_copy_counts(spark):
    """floor(w) copies always; the fractional extra is a pure function of
    the id bucket; epoch ordinals are 0..n-1; weight-0 / unlisted / NULL
    strata vanish; negative weights rejected."""
    import pytest

    from opentelemetry_collector_spark.functions.hashing import (
        NUM_SAMPLER_BUCKETS,
    )
    from opentelemetry_collector_spark.operators.sampling import epoch_replicate

    rows = [(i, ["a", "b", "c", None][i % 4]) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = epoch_replicate(df, "src", "id", {"a": 2.5, "b": 1.0, "c": 0.0})
    got = {}
    for r in out.collect():
        got.setdefault(r.id, []).append(r.epoch)

    def bucket(i):
        return ((i % 100003) * 2654435761) % NUM_SAMPLER_BUCKETS

    for i, s in rows:
        n = {"a": 2 + (bucket(i) < NUM_SAMPLER_BUCKETS // 2), "b": 1}.get(s, 0)
        assert sorted(got.get(i, [])) == list(range(n)), (i, s)
    with pytest.raises(ValueError, match="negative"):
        epoch_replicate(df, "src", "id", {"a": -1.0})


def test_temperature_sample_flattens_mixture(spark):
    """alpha=0.5 keeps the tail whole and trims the head toward sqrt shares."""
    import pyspark.sql.functions as F

    from opentelemetry_collector_spark.operators.sampling import temperature_sample

    # head source 900 rows, tail source 100 rows
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "head").otherwise("tail").alias("source"),
    )
    out = temperature_sample(df, "source", "doc_id", alpha=0.5, total_fraction=0.5)
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # targets: sqrt(900)=30, sqrt(100)=10 -> shares 0.75/0.25 of 500 kept
    # head acceptance = 375/900 ~ 0.417; tail = 125/100 -> clamped to 1.0
    assert got["tail"] == 100                      # tail kept whole (no upsample)
    assert 300 <= got["head"] <= 450               # head trimmed near 375
    # deterministic: rerun identical
    again = {r.source: r.n for r in temperature_sample(
        df, "source", "doc_id", alpha=0.5, total_fraction=0.5
    ).groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert again == got


def test_temperature_sample_alpha_one_is_proportional(spark):
    """alpha=1 reproduces mixture_sample with natural shares: acceptance =
    tf for every stratum (up to bucket floor)."""
    import pyspark.sql.functions as F

    from opentelemetry_collector_spark.operators.sampling import temperature_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 < 3, "a").otherwise("b").alias("source"),
    )
    out = temperature_sample(df, "source", "doc_id", alpha=1.0, total_fraction=0.5)
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # natural shares: both strata accept ~50%
    assert abs(got["a"] / 1500 - 0.5) < 0.08
    assert abs(got["b"] / 500 - 0.5) < 0.10


def test_epoch_plan_allocates_budget_by_sqrt(spark):
    import math

    import pytest

    from opentelemetry_collector_spark.operators.sampling import epoch_plan

    # 3 sources with 400/100/100 tokens -> sqrt weights 20/10/10 -> 1/2,1/4,1/4
    rows = (
        [("a", " ".join(["w"] * 40)) for _ in range(10)]
        + [("b", " ".join(["w"] * 10)) for _ in range(10)]
        + [("c", " ".join(["w"] * 10)) for _ in range(10)]
    )
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.stratum: r for r in epoch_plan(df, "source", "text", budget_tokens=800).collect()}
    assert out["a"].n_toks == 400 and out["b"].n_toks == 100
    assert out["a"].weight == pytest.approx(0.5) and out["b"].weight == pytest.approx(0.25)
    assert out["a"].target_toks == 400 and out["b"].target_toks == 200
    assert out["a"].epochs == pytest.approx(1.0)
    assert out["b"].epochs == pytest.approx(2.0)  # tail source replicated 2x


def test_uniform_topk_sample_exact_k_deterministic_plan(spark):
    from opentelemetry_collector_spark.operators.sampling import uniform_topk_sample

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = uniform_topk_sample(df, "doc_id", k=10)
    rows = out.collect()
    assert len(rows) == 10
    # the kept ranks are the 10 globally smallest affine-hash ranks
    all_ranks = sorted(((i % 2**31) * 2654435761) % 2**31 for i in range(1000))
    assert sorted(r.sample_rank for r in rows) == all_ranks[:10]
    # deterministic: identical cut on re-execution
    assert [r.doc_id for r in out.collect()] == [r.doc_id for r in rows]
    # global top-k without a global sort: TakeOrderedAndProject, no Exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# --- priority sampling (Duffield/Lund/Thorup 2007) ---------------------------


def _prio_ref(ids_weights, k):
    """Independent scalar replica of the priority-sample recurrence (same
    two IEEE ops — Python floats are the same doubles the JVM computes)."""
    rows = []
    for i, w in ids_weights:
        h = ((i % 2147483648) * 2654435761) % 2147483648
        rows.append((w * 2147483648.0 / (h + 1), i, w))
    rows.sort(key=lambda r: (-r[0], r[1]))
    tau = rows[k][0]
    return {i: max(float(w), tau) for _, i, w in rows[:k]}, tau


def test_priority_sample_matches_scalar_replica(spark):
    from opentelemetry_collector_spark.operators.sampling import priority_sample

    data = [(i, 1 + (i * 13) % 97) for i in range(500)]
    df = spark.createDataFrame(data, "doc_id long, w long").repartition(8)
    got = {
        r.doc_id: r.est_weight
        for r in priority_sample(df, "doc_id", "w", k=50).collect()
    }
    want, _tau = _prio_ref(data, 50)
    assert set(got) == set(want)
    for i in got:
        assert abs(got[i] - round(want[i], 6)) < 1e-9


def test_priority_sample_estimator_near_total(spark):
    """Σ max(w, τ) over the sample is an unbiased estimator of Σw — on this
    fixed fixture the single deterministic draw lands within 25 %."""
    from opentelemetry_collector_spark.operators.sampling import priority_sample

    data = [(i, 1 + (i * 7) % 50) for i in range(1000)]
    df = spark.createDataFrame(data, "doc_id long, w long")
    s = priority_sample(df, "doc_id", "w", k=100).agg(F.sum("est_weight")).collect()[0][0]
    total = sum(w for _, w in data)
    assert abs(s - total) / total < 0.25


def test_priority_sample_deterministic_under_partitioning(spark):
    from opentelemetry_collector_spark.operators.sampling import priority_sample

    data = [(i, 1 + i % 9) for i in range(300)]
    a = spark.createDataFrame(data, "doc_id long, w long").coalesce(1)
    b = spark.createDataFrame(data, "doc_id long, w long").repartition(16)
    ra = sorted(map(tuple, priority_sample(a, "doc_id", "w", k=40).collect()))
    rb = sorted(map(tuple, priority_sample(b, "doc_id", "w", k=40).collect()))
    assert ra == rb


# --- weighted source interleave ----------------------------------------------


def _interleave_ref(rows, weights):
    """Scalar replica: per-source portable-bucket order, slot (i+1)/w,
    global order (slot, source, id)."""
    per = {}
    for i, s in rows:
        if s in weights:
            bk = ((i % 100003) * 2654435761) % 16384
            per.setdefault(s, []).append((bk, i))
    out = []
    for s, lst in per.items():
        lst.sort()
        for ix, (_bk, i) in enumerate(lst):
            out.append(((ix + 1) / weights[s], s, i))
    out.sort()
    return [(pos, i, s) for pos, (_slot, s, i) in enumerate(out)]


def test_interleave_matches_scalar_replica(spark):
    from opentelemetry_collector_spark.operators.sampling import interleave_by_weight

    rows = [(i, f"s{i % 4}") for i in range(200)]
    w = {"s0": 0.5, "s1": 0.25, "s2": 0.25}  # s3 dropped
    df = spark.createDataFrame(rows, "doc_id long, source string").repartition(8)
    got = [
        (r.interleave_pos, r.doc_id, r.source)
        for r in interleave_by_weight(df, "source", "doc_id", w)
        .orderBy("interleave_pos")
        .collect()
    ]
    assert got == _interleave_ref(rows, w)


def test_interleave_prefix_holds_mixture_shares(spark):
    """Any prefix of the interleave order contains each source in ≈ its
    weight share (the property a sort-by-source order lacks entirely)."""
    from opentelemetry_collector_spark.operators.sampling import interleave_by_weight

    rows = [(i, f"s{i % 2}") for i in range(400)]
    w = {"s0": 0.75, "s1": 0.25}
    df = spark.createDataFrame(rows, "doc_id long, source string")
    first = (
        interleave_by_weight(df, "source", "doc_id", w)
        .filter(F.col("interleave_pos") < 100)
        .groupBy("source")
        .count()
        .collect()
    )
    counts = {r.source: r["count"] for r in first}
    assert abs(counts["s0"] - 75) <= 2 and abs(counts["s1"] - 25) <= 2


def test_interleave_rejects_nonpositive_weight(spark):
    import pytest

    from opentelemetry_collector_spark.operators.sampling import interleave_by_weight

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="must be > 0"):
        interleave_by_weight(df, "source", "doc_id", {"a": 0.0})


def test_priority_sample_population_smaller_than_k_returns_all(spark):
    """n <= k: the whole population IS the sample — tau undefined, every
    row kept with est_weight = w (estimator exact, not an empty frame)."""
    from opentelemetry_collector_spark.operators.sampling import priority_sample

    data = [(i, 5 + i) for i in range(30)]
    df = spark.createDataFrame(data, "doc_id long, w long")
    got = priority_sample(df, "doc_id", "w", k=100).collect()
    assert len(got) == 30
    assert all(r.est_weight == float(r.weight) for r in got)
    assert sum(r.est_weight for r in got) == sum(w for _, w in data)


def test_priority_sample_string_ids_use_crc32_fallback(spark):
    """Non-numeric string ids must hash deterministically (crc32 fallback),
    not silently collapse to a NULL-priority first-k-by-id cut."""
    from opentelemetry_collector_spark.operators.sampling import priority_sample

    data = [(f"doc#{i}", 1 + i % 9) for i in range(200)]
    df = spark.createDataFrame(data, "doc_id string, w long")
    got = priority_sample(df, "doc_id", "w", k=50).collect()
    assert len(got) == 50
    assert all(r.priority is not None for r in got)
    # weight-sensitive: the kept set must not be the 50 smallest ids
    assert {r.doc_id for r in got} != {f"doc#{i}" for i in range(50)}
    a = sorted(map(tuple, priority_sample(df.repartition(16), "doc_id", "w", k=50).collect()))
    assert a == sorted(map(tuple, got))
