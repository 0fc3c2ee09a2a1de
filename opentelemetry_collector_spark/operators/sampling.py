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
from pyspark.sql import Column, DataFrame

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
    kind='rate_limiting'     keep the first ``limit`` traces per second (by
                             trace min-ts ordering — deterministic batch
                             reading of the reference's ticker semantics)
    """

    kind: str
    col: str | None = None
    lo: float | None = None
    hi: float | None = None
    values: list[str] | None = None
    limit: int | None = None


def _policy_keep(p: TailPolicy) -> Column:
    """Per-trace boolean aggregate for one policy (evaluated after groupBy)."""
    if p.kind == "always":
        return F.lit(True)
    if p.kind == "numeric_attribute":
        return F.max(
            F.when(F.col(p.col).between(F.lit(p.lo), F.lit(p.hi)), F.lit(1)).otherwise(F.lit(0))
        ) == 1
    if p.kind == "string_attribute":
        return F.max(F.when(F.col(p.col).isin(p.values), F.lit(1)).otherwise(F.lit(0))) == 1
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
        e = _policy_keep(p)
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
