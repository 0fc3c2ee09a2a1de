"""Samplers (SURVEY.md §2.5 L3/L4).

L3 — probabilistic sampler.  Collector parity target:
processor/probabilisticsamplerprocessor ~approx — keep a record iff
``FNV-1a32(seed ++ id_bytes) & 0x3FFF < pct * 0x4000 / 100``; deterministic
per id, so every collector in a fleet makes the same decision.  Exact parity
needs FNV-1a, which Spark lacks → numpy pandas UDF (functions.hashing).  A
pure-JVM variant (xxhash64) and an oracle-portable variant (integer
arithmetic) are offered for the hot path / correctness gate respectively.

L4 — tail sampler.  Collector parity target:
processor/samplingprocessor/tailsamplingprocessor ~approx — buffer spans per
trace for decision_wait, then apply policies (always / numeric-range /
string-set / rate-limit) over the **whole trace** and emit kept traces.  In
batch Spark the buffer is free (we see all rows): groupBy(trace) → policy
aggregates → left-semi join.  The semi join broadcasts when the kept-id set
is small (AQE decides), so the big side never shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..functions.hashing import NUM_SAMPLER_BUCKETS, fnv1a32_udf, portable_bucket


def sampling_threshold(percent: float) -> int:
    """Collector scaling: scaledSamplingRate = pct * numHashBuckets / 100."""
    return int(percent * NUM_SAMPLER_BUCKETS / 100.0)


def probabilistic_sample(
    df: DataFrame,
    percent: float,
    id_col: str,
    hash_seed: int = 0,
    method: str = "fnv1a",
) -> DataFrame:
    """Deterministic keep-by-id-hash sampling.

    method='fnv1a'    bit-exact collector parity (pandas UDF, Arrow batches)
    method='xxhash64' JVM-native fast path (same keep-rate, different ids kept)
    method='portable' integer-arithmetic bucket reproducible in any SQL engine
    """
    t = sampling_threshold(percent)
    idc = F.col(id_col)
    if method == "fnv1a":
        bucket = F.pmod(fnv1a32_udf(idc.cast("string"), F.lit(hash_seed)), F.lit(NUM_SAMPLER_BUCKETS))
    elif method == "xxhash64":
        bucket = F.pmod(F.xxhash64(idc, F.lit(hash_seed)), F.lit(NUM_SAMPLER_BUCKETS))
    elif method == "portable":
        bucket = portable_bucket(idc, NUM_SAMPLER_BUCKETS)
    else:
        raise ValueError(f"unknown method {method!r}")
    return df.filter(bucket < F.lit(t))


@dataclass
class TailPolicy:
    """One tail-sampling policy (reference: tailsamplingprocessor/internal/sampling).

    kind='always'            keep every trace
    kind='numeric_attribute' keep traces where any row has col in [lo, hi]
    kind='string_attribute'  keep traces where any row has col in values
    kind='latency'           keep traces whose span = max(ts)−min(ts) ≥ lo ms
                             (the contrib latency policy; needs ts_col)
    kind='span_count'        keep traces with at least ``lo`` rows
    kind='probabilistic'     keep traces whose portable trace-id bucket (mod
                             100) < ``lo`` — hash-consistent sampling, same
                             trace always decides the same way across runs
    kind='ottl'              keep traces where ANY row satisfies the OTTL
                             condition in ``expr`` (contrib ottl_condition
                             policy; NULL rows don't match)
    kind='and'               keep traces where EVERY sub-policy in ``sub``
                             votes keep (the contrib And policy; composes
                             any of the aggregate kinds above)
    kind='rate_limiting'     keep the first ``limit`` traces per second (by
                             trace min-ts ordering — deterministic batch
                             reading of the reference's ticker semantics)

    Every kind except rate_limiting is a per-trace boolean AGGREGATE, so an
    arbitrary policy tree still compiles into the single groupBy(trace) pass
    — one shuffle regardless of policy count.
    """

    kind: str
    col: str | None = None
    lo: float | None = None
    hi: float | None = None
    values: list[str] | None = None
    limit: int | None = None
    expr: str | None = None
    sub: list["TailPolicy"] | None = None


def _policy_keep(
    p: TailPolicy,
    df: DataFrame | None = None,
    trace_col: str | None = None,
    ts_col: str | None = None,
) -> Column:
    """Per-trace boolean aggregate for one policy (evaluated after groupBy)."""
    if p.kind == "always":
        return F.lit(True)
    if p.kind == "numeric_attribute":
        return F.max(
            F.when(F.col(p.col).between(F.lit(p.lo), F.lit(p.hi)), F.lit(1)).otherwise(F.lit(0))
        ) == 1
    if p.kind == "string_attribute":
        return F.max(F.when(F.col(p.col).isin(p.values), F.lit(1)).otherwise(F.lit(0))) == 1
    if p.kind == "latency":
        if ts_col is None:
            raise ValueError("latency policy requires ts_col")
        # NTZ-safe: unix_micros over an explicit ltz cast (session TZ is UTC)
        us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
        return (F.max(us) - F.min(us)) / F.lit(1000.0) >= F.lit(p.lo)
    if p.kind == "span_count":
        return F.count(F.lit(1)) >= F.lit(int(p.lo))
    if p.kind == "probabilistic":
        if trace_col is None:
            raise ValueError("probabilistic policy requires trace_col")
        # expression of the grouping key — constant per group, no aggregate
        return portable_bucket(F.col(trace_col), 100) < F.lit(int(p.lo))
    if p.kind == "ottl":
        from ..functions.ottl import compile_condition

        if df is None:
            raise ValueError("ottl policy requires the input frame")
        cond = F.coalesce(compile_condition(df, p.expr), F.lit(False))
        return F.max(F.when(cond, F.lit(1)).otherwise(F.lit(0))) == 1
    if p.kind == "and":
        out: Column | None = None
        for s in p.sub or []:
            e = _policy_keep(s, df, trace_col, ts_col)
            out = e if out is None else (out & e)
        if out is None:
            raise ValueError("'and' policy requires sub-policies")
        return out
    raise ValueError(f"unknown tail policy {p.kind!r}")


def tail_sample(
    df: DataFrame,
    trace_col: str,
    policies: list[TailPolicy],
    ts_col: str | None = None,
) -> DataFrame:
    """Keep whole traces where ANY policy votes keep (reference composite:
    first Sampled decision wins).  rate_limiting applies after the vote."""
    agg_policies = [p for p in policies if p.kind != "rate_limiting"]
    rate = next((p for p in policies if p.kind == "rate_limiting"), None)
    keep_expr = None
    for p in agg_policies:
        e = _policy_keep(p, df, trace_col, ts_col)
        keep_expr = e if keep_expr is None else (keep_expr | e)
    if keep_expr is None:
        keep_expr = F.lit(True)
    aggs = [keep_expr.alias("_keep")]
    if rate is not None:
        if ts_col is None:
            raise ValueError("rate_limiting policy requires ts_col")
        aggs.append(F.min(ts_col).alias("_t0"))
    kept = df.groupBy(trace_col).agg(*aggs).filter(F.col("_keep"))
    if rate is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(F.date_trunc("second", F.col("_t0"))).orderBy(F.col("_t0"), F.col(trace_col))
        kept = kept.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= rate.limit)
    kept_ids = kept.select(trace_col)
    return df.join(kept_ids, on=trace_col, how="left_semi")


def dropped_traces(df: DataFrame, sampled: DataFrame, trace_col: str) -> DataFrame:
    """Audit view of dropped traces: anti join against the kept set."""
    return df.join(sampled.select(trace_col).distinct(), on=trace_col, how="left_anti")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling (engine extension — the
    training-data mixing primitive): keep a row iff its portable id-bucket
    falls under its stratum's threshold.

    Unlike ``DataFrame.sampleBy`` (RNG-seeded, partition-order dependent)
    the decision is a pure function of (id, stratum fraction): reruns,
    retries, and any engine reproduce the same sample — the property that
    makes a 100 TB sampling job resumable and its oracle checkable.  One
    codegen filter, no shuffle; the fractions map is plan-time config
    (route-table-sized)."""
    thresholds = {v: int(round(f * NUM_SAMPLER_BUCKETS)) for v, f in fractions.items()}
    return _stratified_filter(
        df, strata_col, id_col, thresholds, int(round(default_fraction * NUM_SAMPLER_BUCKETS))
    )


def _stratified_filter(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    thresholds: dict[str, int],
    default_threshold: int = 0,
) -> DataFrame:
    """Keep rows with portable_bucket(id) < thresholds[stratum] — one
    codegen filter built from a chained CASE (plan-time config)."""
    bucket = portable_bucket(F.col(id_col), NUM_SAMPLER_BUCKETS)
    thr = F.lit(int(default_threshold))
    # NULL strata can't match an equality CASE arm (and None won't sort
    # against str keys) — they take the default threshold like any
    # unlisted stratum
    for value, t in sorted((kv for kv in thresholds.items() if kv[0] is not None)):
        thr = F.when(F.col(strata_col) == F.lit(value), F.lit(int(t))).otherwise(thr)
    return df.filter(bucket < thr)


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    target_weights: dict[str, float],
    total_fraction: float = 1.0,
) -> DataFrame:
    """Rebalance a corpus toward target source weights by deterministic
    downsampling (the "data mixing" step before pretraining).

    Per-stratum acceptance = min(1, total_fraction · target_share · N /
    count_s) — the largest sample ≤ total_fraction·N whose kept rows
    approach the target mixture without ever UPsampling.  Counts come from
    one aggregate pass (#strata rows collected — config-sized, like a route
    table); the sample itself is the same one-pass portable-hash filter as
    ``stratified_sample``.

    Thresholds are computed in EXACT rational arithmetic
    (floor(buckets · tf · w · N / n), python Fractions — no float round
    whose half-tie behavior an independent engine could disagree on), so
    with dyadic weights the DuckDB oracle reproduces them with integer
    division."""
    from fractions import Fraction

    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("s")).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(counts.values())
    thresholds = {}
    for s, n in counts.items():
        f = Fraction(total_fraction) * Fraction(target_weights.get(s, 0.0)) * n_total
        thresholds[s] = (
            min(NUM_SAMPLER_BUCKETS, (NUM_SAMPLER_BUCKETS * f.numerator) // (f.denominator * n))
            if n
            else 0
        )
    return _stratified_filter(df, strata_col, id_col, thresholds)


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    alpha: float = 0.5,
    total_fraction: float = 1.0,
    scale_bits: int = 20,
) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual α-sampling rule,
    Devlin et al. 2019 mBERT / Conneau et al. 2020 XLM-R): the target share
    of stratum s is n_s^α / Σ_t n_t^α — α < 1 flattens the natural
    distribution toward uniform (α=1 is proportional, α=0 uniform), the
    standard fix for head sources drowning tail sources in a pretraining
    mix.  Downsample-only like :func:`mixture_sample` (acceptance =
    min(1, tf·w_s·N/n_s)); genuine upsampling of the tail composes with
    ``epoch_replicate``.

    Determinism/parity: the temperature weights are integer-quantized as
    t_s = floor(n_s^α · 2^scale_bits).  For α = 0.5 the power is computed
    as IEEE sqrt — correctly rounded in every conforming libm, and the 2^k
    scaling is exact — so an independent engine reproduces t_s bit-for-bit
    and the thresholds (exact rational arithmetic over the integer t_s,
    same construction as ``mixture_sample``) with integer division.  Other
    α go through libm pow(), which is NOT guaranteed correctly rounded —
    rerun-stable on one platform, but cross-engine value checks should
    stick to α = 0.5.  One count aggregate (#strata rows collected —
    config-sized), then the one-pass portable-hash codegen filter."""
    import math
    from fractions import Fraction

    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = sum(counts.values())
    scale = 1 << scale_bits
    if alpha == 0.5:
        t = {s: int(math.floor(math.sqrt(n) * scale)) for s, n in counts.items()}
    else:
        t = {s: int(math.floor((float(n) ** alpha) * scale)) for s, n in counts.items()}
    t_total = sum(t.values())
    thresholds = {}
    for s, n in counts.items():
        f = Fraction(total_fraction) * Fraction(t[s], t_total) * n_total
        thresholds[s] = (
            min(NUM_SAMPLER_BUCKETS, (NUM_SAMPLER_BUCKETS * f.numerator) // (f.denominator * n))
            if n
            else 0
        )
    return _stratified_filter(df, strata_col, id_col, thresholds)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the id's portable bucket
    falls into consecutive threshold ranges sized by ``splits`` fractions
    (insertion order).  Pure function of the id — the same doc lands in the
    same split on every rerun, engine, and cluster size, and adding data
    never moves existing docs between splits (the leakage guarantee an
    RNG split cannot give).  Fractions must sum to ≤ 1; the remainder
    (if any) gets NULL (excluded)."""
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    bucket = portable_bucket(F.col(id_col), NUM_SAMPLER_BUCKETS)
    expr = F.lit(None).cast("string")
    upper = 0
    bounds = []
    for name, frac in splits.items():
        upper += int(round(frac * NUM_SAMPLER_BUCKETS))
        bounds.append((name, upper))
    for name, ub in reversed(bounds):
        expr = F.when(bucket < F.lit(ub), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def token_budget_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weight_col: str,
    budget: int,
    cum_col: str = "cum_weight",
) -> DataFrame:
    """Per-stratum token-budget curation (engine extension): within each
    stratum (source), keep the prefix of documents — in deterministic
    portable-hash order — whose cumulative weight (token count) stays within
    ``budget``.  This is how fixed-token-count pretraining mixes are actually
    cut ("2B tokens of src0, 1B of src1, …"): a take-while over a hash-
    shuffled stream, not a per-doc Bernoulli rate, so the budget is hit
    exactly (to within one document) instead of in expectation.

    Keep rule: inclusive per-stratum running sum ≤ budget.  The order
    (bucket(id), id) is a pure function of the id — reruns, engines, and
    cluster sizes all cut the same prefix, and growing OTHER strata never
    changes this stratum's kept set.

    NULL strata are EXCLUDED from the output (same contract as
    :func:`epoch_replicate`'s weight-0 drop): the per-stratum start-offset
    equi-join never matches a NULL key, so rows with a NULL stratum cannot
    receive a budget and are dropped.  Filter or coalesce the stratum column
    upstream if NULL should form its own stratum.

    Plan — the 100 TB shape: ONE two-phase global prefix sum over the order
    (stratum, bucket, id) (``packing._global_prefix_sum``: range-repartition
    + per-partition totals + broadcast offsets — never a per-stratum
    one-partition Window funnel, which is the naive form's scale-killer),
    then per-stratum start offsets come from a #strata-row aggregate
    broadcast back.  Total cost: one range shuffle + two config-sized
    broadcasts, regardless of how skewed the strata are.

    The start offsets are derived from per-stratum weight TOTALS over the
    base frame (strata are contiguous blocks of the global order, so a
    stratum's first global offset = the cumulative total of all strata
    sorted before it) — NOT from ``min(_goff)`` over the prefix-sum frame,
    which would re-evaluate the whole window subtree a second time (the
    prefix-sum output is referenced once, exactly one heavy pass)."""
    from pyspark.sql import Window

    from .packing import _global_prefix_sum

    base = df.withColumn("_bk", portable_bucket(F.col(id_col), NUM_SAMPLER_BUCKETS))
    pre = _global_prefix_sum(base, [strata_col, "_bk", id_col], weight_col, "_goff")
    # #strata rows: same NULLS-FIRST ascending order as the range partitioning
    off_w = Window.orderBy(strata_col).rowsBetween(Window.unboundedPreceding, -1)
    starts = (
        base.groupBy(strata_col)
        .agg(F.sum(weight_col).alias("_tw"))
        .select(
            strata_col, F.coalesce(F.sum("_tw").over(off_w), F.lit(0)).alias("_s0")
        )
    )
    return (
        pre.join(F.broadcast(starts), strata_col)
        .withColumn(cum_col, F.col("_goff") - F.col("_s0") + F.col(weight_col))
        .filter(F.col(cum_col) <= F.lit(int(budget)))
        .drop("_bk", "_goff", "_s0")
    )


def epoch_replicate(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weights: dict[str, float],
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic fractional-epoch UPsampling (engine extension): emit
    each row ``weights[stratum]`` times in expectation — floor(w) whole
    copies plus one extra iff the row's portable id-bucket clears the
    fractional remainder — with an ``epoch`` index (0-based copy ordinal)
    on every emitted row.

    This is the "2.5 epochs of books, 0.3 of web" side of pretraining data
    mixing that :func:`mixture_sample` (downsample-only) refuses to do: the
    copy count is a pure function of (id, weight), so reruns, engines, and
    cluster sizes emit identical copies, and the epoch ordinal lets the
    downstream epoch shuffle give each copy a distinct position.

    Plan: one codegen projection (CASE chain over plan-time weights → copy
    count) + explode over ``sequence(0, n-1)`` — no shuffle, no collect;
    output size = Σ w_s·|stratum s| rows exactly (±1 per fractional doc).
    Thresholds use the same exact integer arithmetic as the samplers, so
    the oracle reproduces the cut bit-for-bit.  Unlisted / NULL strata get
    weight 0 (dropped)."""
    from fractions import Fraction

    n_copies = F.lit(0)
    bucket = portable_bucket(F.col(id_col), NUM_SAMPLER_BUCKETS)
    for value, w in sorted(kv for kv in weights.items() if kv[0] is not None):
        if w < 0:
            raise ValueError(f"negative epoch weight for {value!r}: {w}")
        fr = Fraction(w).limit_denominator(10**9)
        whole = fr.numerator // fr.denominator
        t = NUM_SAMPLER_BUCKETS * (fr - whole)  # exact Fraction in [0, B)
        frac_thr = t.numerator // t.denominator
        n_copies = F.when(
            F.col(strata_col) == F.lit(value),
            F.lit(int(whole)) + (bucket < F.lit(int(frac_thr))).cast("int"),
        ).otherwise(n_copies)
    return df.withColumn(
        epoch_col,
        F.explode(
            F.when(n_copies > 0, F.sequence(F.lit(0), n_copies - 1)).otherwise(
                F.array().cast("array<int>")
            )
        ),
    )


def epoch_plan(
    df: DataFrame,
    strata_col: str,
    text_col: str,
    budget_tokens: int,
    scale_bits: int = 20,
) -> DataFrame:
    """Mixture/epoch PLANNING table: given a token budget B and α=0.5
    temperature weights (share of stratum s ∝ sqrt(n_toks_s) — the same
    integer-quantized IEEE-sqrt construction as :func:`temperature_sample`,
    bit-reproducible across engines), emit per stratum the target token
    allocation and the fractional epoch count target/n_toks — the planner
    output a DoReMi/alpha-sampling mixture tune hands to
    ``epoch_replicate`` + ``token_budget_sample`` for execution.

    All allocation arithmetic is exact int64 (tw ≤ 2^20·sqrt(n) and
    B·tw ≤ 2^63 for any realistic budget); only the final epochs ratio is a
    rounded double.  One corpus pass to (stratum, token-count), then a
    window over the #strata-row table — bounded, the documented exception.

    Returns (stratum, n_docs, n_toks, weight, target_toks, epochs)."""
    from .textstats import token_count

    per = (
        df.groupBy(F.col(strata_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(text_col)).cast("long")).alias("n_toks"),
        )
    )
    scale = 1 << scale_bits
    tw = F.floor(F.sqrt(F.col("n_toks").cast("double")) * F.lit(scale)).cast("long")
    staged = per.select("stratum", "n_docs", "n_toks", tw.alias("_tw"))
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tt = F.sum("_tw").over(w_all)
    target = F.floor(F.lit(int(budget_tokens)) * F.col("_tw") / tt).cast("long")
    return staged.select(
        "stratum",
        "n_docs",
        "n_toks",
        F.round(F.col("_tw").cast("double") / tt, 6).alias("weight"),
        target.alias("target_toks"),
        F.round(target.cast("double") / F.col("n_toks"), 6).alias("epochs"),
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 100,
) -> DataFrame:
    """Priority sampling (Duffield/Lund/Thorup, JACM 2007, public):
    weight-sensitive sampling WITHOUT replacement with an unbiased
    subset-sum estimator — the principled "keep k docs, long docs more
    likely, and still estimate total tokens from the sample" cut that
    neither :func:`uniform_topk_sample` (weight-blind) nor
    :func:`probabilistic_sample` (fraction, not count) gives.

    Per row: u = (h+1)/2³¹ from the portable affine hash of the id
    (deterministic — same sample on every rerun, engine, and cluster
    size), priority q = w/u; keep the k LARGEST priorities; with
    τ = the (k+1)-th priority, the estimator ŵ = max(w, τ) is unbiased
    for any subset-sum of the weights.  q is computed as
    ``w * 2³¹ / (h+1)`` — one IEEE multiply + one IEEE divide, both
    correctly rounded, so an independent engine reproduces the exact
    same doubles and the exact same kept set (no transcendental in the
    key, unlike the exp-jump form of Efraimidis–Spirakis).

    Scale shape: ``orderBy(q desc).limit(k+1)`` compiles to
    TakeOrderedAndProject — each task keeps its own k+1 largest and only
    k+1 rows per partition ever leave the scan; τ and the rank then run
    on a (k+1)-row frame on one task.  No global sort, no shuffle of the
    input.  Inputs with ≤ k rows return every row with est_weight = w
    (τ undefined — the whole population is the sample, estimator exact).
    Non-numeric string ids take ``portable_bucket``'s deterministic crc32
    fallback instead of silently hashing to NULL.

    Returns (id, weight, priority, est_weight) — Σ est_weight ≈ Σ w."""
    h = portable_bucket(F.col(id_col), 2147483648, prime=2147483648)
    q = (
        F.col(weight_col).cast("double")
        * F.lit(2147483648.0)
        / (h + F.lit(1)).cast("double")
    )
    top = (
        df.select(F.col(id_col), F.col(weight_col).alias("weight"), q.alias("_q"))
        .orderBy(F.desc("_q"), id_col)
        .limit(k + 1)
    )
    w_rank = Window.orderBy(F.desc("_q"), id_col)
    ranked = top.withColumn("_rn", F.row_number().over(w_rank))
    # always exactly 1 row (NULL τ when the input has ≤ k rows), so the
    # broadcast cross join can never annihilate the kept set
    tau = ranked.agg(
        F.min(F.when(F.col("_rn") == k + 1, F.col("_q"))).alias("_tau")
    )
    return (
        ranked.filter(F.col("_rn") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            F.col(id_col),
            "weight",
            F.round("_q", 6).alias("priority"),
            F.round(
                F.greatest(
                    F.col("weight").cast("double"),
                    F.coalesce(F.col("_tau"), F.col("weight").cast("double")),
                ),
                6,
            ).alias("est_weight"),
        )
    )


def interleave_by_weight(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weights: dict[str, float],
    pos_col: str = "interleave_pos",
) -> DataFrame:
    """Deterministic weighted source-INTERLEAVE order (engine extension):
    the global training-loader order in which a mixture is actually fed to
    a trainer — every prefix of the output order contains each source in
    ≈ its mixture proportion (the `interleave_datasets`-style contract,
    stated engine-side as a total order instead of an iterator).

    Construction (pure function of (id, weights) — rerun/engine/cluster-
    size stable): within each stratum docs take their deterministic
    portable-hash order and the i-th doc (0-based) of stratum s lands at
    slot ``(i+1)/w_s`` (one IEEE divide — exactly reproducible in any
    engine); the global order is (slot, stratum, id) and the output
    position is its 0-based global rank.  A stratum with weight w gets
    every ⌈1/w⌉-th slot, so sources interleave smoothly rather than in
    blocks — unlike a sort by (epoch, source) — and strata absent from
    ``weights`` are dropped (weight-0 contract of
    :func:`epoch_replicate`).

    Plan — the 100 TB shape: TWO two-phase global prefix sums
    (:func:`packing._global_prefix_sum` — range shuffle + broadcast
    offsets each; never a per-stratum or global one-partition Window):
    one over (stratum, bucket, id) for the within-stratum index, one over
    (slot, stratum, id) for the global rank; the per-stratum start
    offsets are a #strata-row broadcast.

    Returns (pos_col, id, stratum, slot)."""
    from .packing import _global_prefix_sum

    base = df.select(
        F.col(strata_col), F.col(id_col), portable_bucket(F.col(id_col), NUM_SAMPLER_BUCKETS).alias("_bk")
    ).withColumn("_one", F.lit(1).cast("bigint"))
    pre = _global_prefix_sum(base, [strata_col, "_bk", id_col], "_one", "_goff")
    off_w = Window.orderBy(strata_col).rowsBetween(Window.unboundedPreceding, -1)
    starts = (
        base.groupBy(strata_col)
        .agg(F.sum("_one").alias("_n"))
        .select(strata_col, F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_s0"))
    )
    w_expr = F.lit(None).cast("double")
    for value, w in sorted(weights.items()):
        if w <= 0:
            raise ValueError(f"interleave weight for {value!r} must be > 0, got {w}")
        w_expr = F.when(F.col(strata_col) == F.lit(value), F.lit(float(w))).otherwise(w_expr)
    slotted = (
        pre.join(F.broadcast(starts), strata_col)
        .withColumn("_i", F.col("_goff") - F.col("_s0"))
        .withColumn("_w", w_expr)
        .filter(F.col("_w").isNotNull())
        .withColumn("_slot", (F.col("_i") + F.lit(1)).cast("double") / F.col("_w"))
        .select(strata_col, id_col, "_one", "_slot")
    )
    ranked = _global_prefix_sum(slotted, ["_slot", strata_col, id_col], "_one", pos_col)
    return ranked.select(
        F.col(pos_col), F.col(id_col), F.col(strata_col), F.round("_slot", 6).alias("slot")
    )


def uniform_topk_sample(
    df: DataFrame, id_col: str, k: int = 100, keep: list[str] | None = None
) -> DataFrame:
    """Exact-k uniform sample: rank every row by a deterministic affine hash
    of its id and keep the k smallest — the reproducible "give me exactly
    10k eyeball docs" cut (probabilistic_sample keeps a FRACTION; this
    keeps a COUNT, and the same k rows on every run and every engine).

    Scale shape: orderBy(rank).limit(k) compiles to TakeOrderedAndProject —
    each task keeps its own k smallest and only those k·#partitions rows
    ever leave the scan; no global sort, no shuffle of the input.  The id
    is folded mod 2³¹ BEFORE the multiply so the product stays under the
    int64 ANSI-overflow line for any id."""
    rank = F.pmod(
        F.pmod(F.col(id_col).cast("bigint"), F.lit(2147483648)) * F.lit(2654435761),
        F.lit(2147483648),
    )
    cols = [F.col(id_col)] + [F.col(c) for c in (keep or [])]
    return (
        df.select(*cols, rank.alias("sample_rank"))
        .orderBy("sample_rank", id_col)
        .limit(k)
    )
