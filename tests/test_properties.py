"""Property-based parity tests (hypothesis) — the engine's analog of the
reference's PICT combinatorial golden data (SURVEY §5): instead of a fixed
permutation file, hypothesis drives randomized inputs through two
independent implementations of the same semantics and asserts equality.

Kept deliberately small (bounded examples, shared session) — these are
semantic guards, not load tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# ---------------------------------------------------------------------------
# as-of join vs a pure-python reference
# ---------------------------------------------------------------------------

_asof_rows = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),       # key
        st.integers(min_value=0, max_value=50),    # ts (seconds offset)
    ),
    min_size=1,
    max_size=25,
)


@given(left=_asof_rows, right=_asof_rows)
@SETTINGS
def test_asof_join_matches_python_reference(spark, left, right):
    from opentelemetry_collector_spark.operators.asof import asof_join

    # dedupe right per (key, ts) — the documented precondition
    rmap = {}
    for i, (k, ts) in enumerate(right):
        rmap[(k, ts)] = i * 10
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)], "lid int, k string, ts_i int"
    ).select("lid", "k", F.timestamp_seconds(F.col("ts_i") + 1_700_000_000).alias("ts"))
    rdf = spark.createDataFrame(
        [(k, ts, v) for (k, ts), v in rmap.items()], "k string, ts_i int, v int"
    ).select("k", F.timestamp_seconds(F.col("ts_i") + 1_700_000_000).alias("ts"), "v")

    got = {r.lid: r.r_v for r in asof_join(ldf, rdf, on="k", ts_col="ts").collect()}

    def ref(k, ts):
        cands = [(rts, v) for (rk, rts), v in rmap.items() if rk == k and rts <= ts]
        return max(cands)[1] if cands else None

    want = {i: ref(k, ts) for i, (k, ts) in enumerate(left)}
    assert got == want


# ---------------------------------------------------------------------------
# grok fast path (replace-then-split) vs slow path (per-group regexp_extract)
# ---------------------------------------------------------------------------

_line_words = st.lists(
    st.text(alphabet="abcdef123", min_size=1, max_size=6), min_size=0, max_size=4
)


@given(
    ks=st.lists(st.integers(min_value=0, max_value=999), min_size=1, max_size=12),
    junk=_line_words,
)
@SETTINGS
def test_grok_fast_and_slow_paths_agree(spark, ks, junk):
    from opentelemetry_collector_spark.functions.grok import GrokPattern

    pat = r"^lvl=(?P<lvl>[A-Z]+) k=%{INT:k} msg=(?P<msg>[a-z0-9 ]*)$"
    rows = []
    for i, k in enumerate(ks):
        if i % 3 == 2:
            rows.append((f"garbage {' '.join(junk)}",))          # non-matching
        else:
            rows.append((f"lvl=INFO k={k} msg={' '.join(junk)}",))
    df = spark.createDataFrame(rows, "raw string")

    fast = GrokPattern(pat, types={"k": "int"})
    assert fast.anchored
    slow = GrokPattern(pat, types={"k": "int"})
    slow.anchored = False  # force the per-group regexp_extract path

    a = [tuple(r) for r in df.select(*fast.columns(F.col("raw")).values()).collect()]
    b = [tuple(r) for r in df.select(*slow.columns(F.col("raw")).values()).collect()]
    assert a == b


# ---------------------------------------------------------------------------
# banded simhash pair search vs all-pairs, over arbitrary signatures
# ---------------------------------------------------------------------------


@given(
    sigs=st.lists(st.integers(min_value=0, max_value=(1 << 16) - 1), min_size=2, max_size=30)
)
@SETTINGS
def test_banded_simhash_equals_all_pairs_on_random_sigs(spark, sigs):
    from opentelemetry_collector_spark.operators.dedup import (
        simhash_banded_pairs,
        simhash_pairs,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "id int, simhash long"
    )
    allp = {(r.id_a, r.id_b, r.hamming) for r in simhash_pairs(df, max_hamming=3).collect()}
    band = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_banded_pairs(df, bits=16, bands=4, max_hamming=3).collect()
    }
    assert band == allp


# ---------------------------------------------------------------------------
# connected components vs a pure-python union-find
# ---------------------------------------------------------------------------

_edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=30))
    .filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@given(edges=_edge_lists)
@SETTINGS
def test_connected_components_match_union_find(spark, edges):
    from opentelemetry_collector_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.comp for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


# ---------------------------------------------------------------------------
# counter-reset increase() vs a pure-python reference
# ---------------------------------------------------------------------------

_counter_series = st.lists(
    st.integers(min_value=0, max_value=1000), min_size=1, max_size=30
)


@given(series=_counter_series)
@SETTINGS
def test_increase_with_resets_matches_python_reference(spark, series):
    from opentelemetry_collector_spark.operators.metricsproc import (
        increase_with_resets,
    )

    df = spark.createDataFrame(
        [("k", i, c) for i, c in enumerate(series)], "k string, t int, c long"
    )
    got = [
        r.increase
        for r in increase_with_resets(df.repartition(3), ["k"], "t", "c")
        .orderBy("t")
        .collect()
    ]
    want = [None] + [
        cur - prev if cur >= prev else cur
        for prev, cur in zip(series, series[1:])
    ]
    assert got == want


# ---------------------------------------------------------------------------
# histogram_quantile vs a pure-python promql-style reference
# ---------------------------------------------------------------------------

_samples = st.lists(
    st.floats(min_value=0.01, max_value=20.0, allow_nan=False),
    min_size=1,
    max_size=40,
)


@given(vals=_samples, q=st.sampled_from([0.5, 0.9, 0.99]))
@SETTINGS
def test_histogram_quantile_matches_python_reference(spark, vals, q):
    from opentelemetry_collector_spark.operators.metricsproc import (
        histogram_quantile,
    )

    bounds = [1.0, 2.0, 5.0, 10.0]
    df = spark.createDataFrame([("d", float(v)) for v in vals], "d string, v double")
    got = histogram_quantile(df, "d", "v", q, bounds).collect()[0].quantile

    # python reference: same explicit-bounds bucket walk
    counts = [0] * (len(bounds) + 1)
    for v in vals:
        for i, b in enumerate(bounds):
            if v <= b:
                counts[i] += 1
                break
        else:
            counts[-1] += 1
    total = len(vals)
    rank = q * total
    cum = 0
    for i, n in enumerate(counts):
        if cum + n >= rank and n > 0:
            if i >= len(bounds):
                want = bounds[-1]
            else:
                lo = 0.0 if i == 0 else bounds[i - 1]
                want = lo + (rank - cum) / n * (bounds[i] - lo)
            break
        cum += n
    assert abs(got - round(want, 4)) < 1e-6


# ---------------------------------------------------------------------------
# redaction: idempotent, and masks survive arbitrary surrounding text
# ---------------------------------------------------------------------------

_noise = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="@"),
    max_size=20,
)


@given(pre=_noise, post=_noise)
@SETTINGS
def test_redact_idempotent_and_total(spark, pre, post):
    from opentelemetry_collector_spark.operators.attraction import redact

    line = f"{pre} a.b@c.io {post} 192.168.0.1"
    df = spark.createDataFrame([(line,)], "s string")
    once = df.select(redact(F.col("s")).alias("r"))
    twice = once.select(redact(F.col("r")).alias("r"))
    a = once.collect()[0].r
    b = twice.collect()[0].r
    assert a == b  # masks contain no maskable material
    assert "[EMAIL]" in a and "[IP]" in a


# ---------------------------------------------------------------------------
# token entropy: permutation-invariant, bounded by log2(n_types)
# ---------------------------------------------------------------------------

_bags = st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=30)


@given(bag=_bags, seed=st.integers(min_value=0, max_value=999))
@SETTINGS
def test_token_entropy_permutation_invariant_and_bounded(spark, bag, seed):
    import math
    import random

    from opentelemetry_collector_spark.operators.textstats import token_entropy

    shuffled = list(bag)
    random.Random(seed).shuffle(shuffled)
    df = spark.createDataFrame(
        [(1, " ".join(bag)), (2, " ".join(shuffled))], "id long, text string"
    )
    out = {r.id: r for r in token_entropy(df, "id", "text").collect()}
    assert out[1].entropy_bits == out[2].entropy_bits
    assert out[1].n_tok == len(bag)
    # entropy_bits is rounded to 3 decimals by the operator, so a uniform
    # bag can round UP past the exact log2(n_types) bound (1.58496→1.585)
    assert 0.0 <= out[1].entropy_bits <= math.log2(out[1].n_types) + 5e-4


# ---------------------------------------------------------------------------
# exponential histogram vs a pure-python bucket walk
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=500.0, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
    scale=st.sampled_from([0, 1, 2]),
)
@SETTINGS
def test_exponential_histogram_matches_python_reference(spark, vals, scale):
    import math

    from opentelemetry_collector_spark.operators.metricsproc import (
        exponential_histogram,
    )

    df = spark.createDataFrame([("d", float(v)) for v in vals], "d string, v double")
    got = exponential_histogram(df, "d", "v", scale=scale).collect()[0]

    # mirror the operator/oracle contract: the scaled log2 is rounded to 9
    # decimals before ceil (boundary determinism on exact powers of the
    # base — values within 5e-10 of a power, e.g. float32 FLT_MIN vs
    # 2**-126, must land in the same bucket on every engine)
    idxs = [
        math.ceil(round(math.log2(v) * (1 << scale), 9)) - 1
        for v in vals
        if v > 0
    ]
    zero = sum(1 for v in vals if v <= 0)
    assert got.zero_count == zero
    assert got.n_values == len(idxs)
    if idxs:
        assert got.idx_min == min(idxs) and got.idx_max == max(idxs)
        assert got.n_buckets == len(set(idxs))
    else:
        assert got.idx_min is None and got.n_buckets == 0


# ---------------------------------------------------------------------------
# token-budget curation vs a pure-python take-while
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),      # id
            st.sampled_from(["a", "b", "c"]),                # stratum
            st.integers(min_value=1, max_value=200),         # weight
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],
    ),
    budget=st.integers(min_value=1, max_value=2_000),
)
@SETTINGS
def test_token_budget_sample_matches_python_takewhile(spark, rows, budget):
    """The kept set equals a per-stratum hash-ordered take-while; the
    inclusive cumsum never exceeds the budget; and removing every OTHER
    stratum leaves this stratum's cut unchanged (growth stability — the
    property a global-fraction sampler cannot give)."""
    from opentelemetry_collector_spark.functions.hashing import (
        NUM_SAMPLER_BUCKETS,
    )
    from opentelemetry_collector_spark.operators.sampling import (
        token_budget_sample,
    )

    df = spark.createDataFrame(rows, "id long, src string, w long")
    got = {
        r.id: r.cum_weight
        for r in token_budget_sample(df, "src", "id", "w", budget).collect()
    }

    def bucket(i):
        return ((i % 100003) * 2654435761) % NUM_SAMPLER_BUCKETS

    expect = {}
    for s in {r[1] for r in rows}:
        cum = 0
        for i, _, w in sorted(
            (r for r in rows if r[1] == s), key=lambda r: (bucket(r[0]), r[0])
        ):
            cum += w
            if cum > budget:
                break
            expect[i] = cum
    assert got == expect
    assert all(c <= budget for c in got.values())

    # growth stability: the 'a'-stratum cut is identical when b/c are absent
    only_a = [r for r in rows if r[1] == "a"]
    if only_a:
        df_a = spark.createDataFrame(only_a, "id long, src string, w long")
        got_a = {
            r.id: r.cum_weight
            for r in token_budget_sample(df_a, "src", "id", "w", budget).collect()
        }
        a_ids = {r[0] for r in only_a}
        assert got_a == {i: c for i, c in expect.items() if i in a_ids}


# ---------------------------------------------------------------------------
# priority sampling vs a pure-python reference
# ---------------------------------------------------------------------------

_prio_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),   # id
        st.integers(min_value=1, max_value=500),      # weight
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(rows=_prio_rows, k=st.integers(min_value=1, max_value=25))
@SETTINGS
def test_priority_sample_matches_python_reference(spark, rows, k):
    from opentelemetry_collector_spark.operators.sampling import priority_sample

    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r.doc_id: r.est_weight for r in priority_sample(df, "doc_id", "w", k=k).collect()}

    prio = []
    for i, w in rows:
        h = ((i % 2147483648) * 2654435761) % 2147483648
        prio.append((w * 2147483648.0 / (h + 1), i, w))
    prio.sort(key=lambda t: (-t[0], t[1]))
    if len(prio) <= k:
        want = {i: float(w) for _, i, w in prio}
    else:
        tau = prio[k][0]
        want = {i: max(float(w), tau) for _, i, w in prio[:k]}
    assert set(got) == set(want)
    assert all(abs(got[i] - round(want[i], 6)) < 1e-9 for i in got)


# ---------------------------------------------------------------------------
# weighted interleave vs a pure-python reference
# ---------------------------------------------------------------------------

_inter_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),          # id
        st.sampled_from(["a", "b", "c", "d"]),               # source
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(
    rows=_inter_rows,
    wa=st.sampled_from([0.5, 1.0, 2.0]),
    wb=st.sampled_from([0.25, 1.0, 3.0]),
)
@SETTINGS
def test_interleave_matches_python_reference_random(spark, rows, wa, wb):
    from opentelemetry_collector_spark.operators.sampling import interleave_by_weight

    weights = {"a": wa, "b": wb, "c": 1.0}  # "d" always dropped
    df = spark.createDataFrame(rows, "doc_id long, source string").repartition(5)
    got = [
        (r.interleave_pos, r.doc_id, r.source)
        for r in interleave_by_weight(df, "source", "doc_id", weights)
        .orderBy("interleave_pos")
        .collect()
    ]
    per = {}
    for i, s in rows:
        if s in weights:
            bk = ((i % 100003) * 2654435761) % 16384
            per.setdefault(s, []).append((bk, i))
    ref = []
    for s, lst in per.items():
        lst.sort()
        for ix, (_bk, i) in enumerate(lst):
            ref.append(((ix + 1) / weights[s], s, i))
    ref.sort()
    assert got == [(pos, i, s) for pos, (_sl, s, i) in enumerate(ref)]


# ---------------------------------------------------------------------------
# fixed-iteration graph ops vs pure-python references
# ---------------------------------------------------------------------------

_graph_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),   # src
        st.integers(min_value=0, max_value=12),   # dst
        st.integers(min_value=1, max_value=9),    # weight
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: (t[0], t[1]),
)


@given(edges=_graph_edges)
@SETTINGS
def test_pagerank_matches_python_reference_random(spark, edges):
    from tests.test_components import _pr_ref
    from opentelemetry_collector_spark.operators.components import pagerank_fixed

    df = spark.createDataFrame(edges, "src long, dst long, w long").repartition(4)
    got = {r.node: r.rank_int for r in pagerank_fixed(df, "src", "dst", "w", iters=3).collect()}
    assert got == _pr_ref(edges, iters=3)


@given(edges=_graph_edges)
@SETTINGS
def test_lpa_matches_python_reference_random(spark, edges):
    from tests.test_components import _lpa_ref
    from opentelemetry_collector_spark.operators.components import (
        label_propagation_fixed,
    )

    df = spark.createDataFrame(edges, "src long, dst long, w long").repartition(4)
    got = {
        r.node: r.community
        for r in label_propagation_fixed(df, "src", "dst", "w", iters=2).collect()
    }
    assert got == _lpa_ref(edges, iters=2)
