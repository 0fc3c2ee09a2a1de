"""Window-shaped semantics (SURVEY.md §2.8 W1-W3).

The reference has no SQL window functions; these are the windowed readings
of its stateful behaviors:

- W1 delta→cumulative (prometheusexporter accumulator)
- W2 start-time / first-sample per series (prometheusreceiver metricsbuilder)
- W3 rate limiting (tailsamplingprocessor rate_limiting policy ~approx:
  cap records per second) — ranking inside a time bucket.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def cumulative_sum(df: DataFrame, keys: list[str], ts_col: str, value_col: str, tiebreak: str | None = None, out_col: str = "cum_value") -> DataFrame:
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(value_col).over(w))


def delta_from_cumulative(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    out_col: str = "delta",
) -> DataFrame:
    """Cumulative→delta (the inverse of W1; contrib
    cumulativetodeltaprocessor analog): delta = value − lag(value) per
    series, NULL for the first point of a series (the upstream processor
    likewise drops/flags the first point — no start reference).  Counter
    RESETS (monotonic counter restarting at 0) surface as negative deltas;
    detecting/zeroing them is the caller's policy, matching upstream's
    reset detection knob."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col).over(w))


def first_ts(df: DataFrame, keys: list[str], ts_col: str, out_col: str = "start_ts") -> DataFrame:
    w = Window.partitionBy(*keys)
    return df.withColumn(out_col, F.min(ts_col).over(w))


def rate_limit_topk(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    limit: int,
    bucket: str = "second",
    tiebreak: str | None = None,
) -> DataFrame:
    """Keep at most ``limit`` rows per (keys, time-bucket) in arrival order —
    load-shedding as a ranking window, first-arrived wins."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(F.date_trunc(bucket, F.col(ts_col)), *keys).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= limit).drop("_rn")


def session_agg(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap: str = "1 hour",
) -> DataFrame:
    """Sessionize per key with an inactivity gap (SURVEY.md §2.12).

    Collector analog: the tail sampler's decision_wait buffering groups a
    trace's spans until activity stops (tailsamplingprocessor ~approx);
    ``session_window`` is the Spark-native form — works identically over a
    batch DataFrame and a watermarked stream.  One shuffle on the keys;
    session merge is done by the native SessionWindow exec, not in Python.
    """
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("sw"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .drop("sw")
    )


def ewma_smooth(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    trail: int = 4,
    out_col: str = "ewma",
) -> DataFrame:
    """Trailing exponentially-weighted moving average per key: the metrics
    smoothing pass dashboards and adaptive alerting run over windowed
    counts (EWMA reacts to level shifts without the trailing-mean's lag).
    Weight of the k-th most recent point is α(1−α)^k, truncated at
    ``trail`` lags and renormalized over the points actually present, so
    the first rows of a series are smoothed over what exists instead of
    biased toward zero.  α defaults to 0.5 (dyadic weights — exactly
    representable, engine-portable arithmetic).

    One window pass per key with ``trail``+1 lag terms fused into a single
    codegen projection; the window ordering domain is the series (e.g.
    #time-buckets per key), never the raw stream.

    Appends ``out_col``; preserves input columns."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(trail + 1):
        wk = F.lit(alpha * (1.0 - alpha) ** k)
        lagged = F.lag(value_col, k).over(w) if k else F.col(value_col)
        num = num + F.when(lagged.isNotNull(), wk * lagged).otherwise(F.lit(0.0))
        den = den + F.when(lagged.isNotNull(), wk).otherwise(F.lit(0.0))
    return df.withColumn(out_col, F.round(num / den, 6))
