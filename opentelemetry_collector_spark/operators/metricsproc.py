"""Metrics-pipeline processors (SURVEY.md §2.6 extensions).

Collector parity targets (contrib distribution of the same upstream):

- spanmetricsprocessor (processor/spanmetricsprocessor ~approx): derives
  RED metrics (Rate = call counts, Errors, Duration histogram with explicit
  bucket bounds) from span streams, keyed by dimension columns.  Spark: one
  hash aggregate with conditional-sum bucket columns — partial (map-side)
  combine means only per-partition bucket partials shuffle, never rows.
- metricstransformprocessor (processor/metricstransformprocessor ~approx):
  rename metrics, scale values, and `aggregate_labels` (drop a label
  dimension and re-combine the series).  Spark: a projection plus one
  re-aggregation at the coarser key.
- Prometheus `increase()` / counter-reset semantics (promql engine, public
  docs): a monotonic counter that restarts at zero yields a negative delta;
  the rate engine treats any decrease as a reset and takes the raw new value
  as the increase.  Spark: lag window + conditional, pure codegen.
- Prometheus `histogram_quantile()` (promql quantile.go semantics, public
  docs): linear interpolation inside the first bucket whose cumulative count
  reaches rank q·total; the +Inf bucket clamps to the highest finite bound.

Everything here is built-in expressions (whole-stage codegen, no UDFs), and
every function is reproducible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _red_aggs(duration_col: str, error_pred: Column, bounds: list[float]) -> list[Column]:
    d = F.col(duration_col)
    aggs = [
        F.count(F.lit(1)).alias("calls"),
        F.sum(F.when(error_pred, 1).otherwise(0)).alias("errors"),
        F.round(F.sum(d), 4).alias("duration_sum"),
    ]
    for b in bounds:
        # cumulative le-buckets: count of rows with duration <= bound
        label = str(b).replace(".", "_")
        aggs.append(F.sum(F.when(d <= F.lit(b), 1).otherwise(0)).alias(f"le_{label}"))
    return aggs


def red_metrics(
    df: DataFrame,
    dim_col: str,
    duration_col: str,
    error_pred: Column,
    bounds: list[float],
) -> DataFrame:
    """spanmetrics RED aggregate: per *dim_col* emit call count, error count,
    total duration, and an explicit-bounds duration histogram (one column per
    bucket, cumulative-LE semantics like Prometheus classic histograms).

    One shuffle of (dim, partial-counters) only; bucket membership is a
    codegen CASE chain evaluated map-side.
    """
    return df.groupBy(F.col(dim_col)).agg(
        *_red_aggs(duration_col, error_pred, bounds)
    )


def streaming_red_metrics(
    stream: DataFrame,
    dim_col: str,
    duration_col: str,
    error_pred: Column,
    bounds: list[float],
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming spanmetrics: the same RED counter/histogram columns as
    `red_metrics`, keyed by (event-time tumbling window, dim) with a
    watermark bounding late data — the upstream processor's
    metrics_flush_interval ticker becomes event-time window finalization.
    Append mode emits only finalized windows; the per-batch plan is the same
    partial+final hash aggregate as the batch form (no extra shuffles)."""
    s = stream.withWatermark(ts_col, watermark)
    return s.groupBy(F.window(ts_col, window).alias("w"), F.col(dim_col)).agg(
        *_red_aggs(duration_col, error_pred, bounds)
    )


def metrics_transform(
    df: DataFrame,
    name_col: str,
    rename: dict[str, str],
    value_col: str,
    scale: float,
    group_cols: list[str],
) -> DataFrame:
    """metricstransform: rename series names via *rename* (unmapped names pass
    through), scale the value, then aggregate_labels — i.e. drop whatever
    dimensions are NOT in *group_cols* and re-sum at the coarser key.

    The rename is a small CASE chain (codegen); the re-aggregation is the
    one necessary shuffle and carries only (group_cols, partial sums).
    """
    mapping = F.col(name_col)
    renamed = None
    for old, new in rename.items():
        renamed = (F.when(mapping == old, new) if renamed is None
                   else renamed.when(mapping == old, new))
    renamed = renamed.otherwise(mapping) if renamed is not None else mapping
    scaled = df.withColumn(name_col, renamed).withColumn(
        value_col, F.col(value_col) * F.lit(scale)
    )
    return scaled.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum(value_col), 4).alias("value_sum"),
    )


def generate_metric(
    df: DataFrame,
    name_col: str,
    value_col: str,
    dims: list[str],
    new_name: str,
    operand1: str,
    operand2: str,
    operation: str = "divide",
) -> DataFrame:
    """metricsgeneration: derive a new series from two existing ones on
    shared dims (contrib metricsgenerationprocessor `calculate` rule — e.g.
    memory.utilization = usage / limit).

    Both operands come out of ONE filtered scan + ONE groupBy(dims) pass
    (conditional partial sums, no self-join, no pivot shuffle); `divide`
    yields NULL on a zero/absent denominator (the processor skips the data
    point rather than emitting ±Inf).  Returns only the generated series —
    unionByName it onto the input to mirror the processor's append."""
    return _generate_metric_grouped(
        df, [], [], name_col, value_col, dims, new_name, operand1, operand2, operation
    )


def _generate_metric_grouped(
    df: DataFrame,
    extra_group: list,
    extra_names: list[str],
    name_col: str,
    value_col: str,
    dims: list[str],
    new_name: str,
    operand1: str,
    operand2: str,
    operation: str,
) -> DataFrame:
    ops = {"divide", "multiply", "add", "subtract"}
    if operation not in ops:
        raise ValueError(f"operation must be one of {sorted(ops)}")
    two = df.filter(F.col(name_col).isin([operand1, operand2]))
    agg = two.groupBy(*extra_group, *[F.col(c) for c in dims]).agg(
        F.sum(F.when(F.col(name_col) == operand1, F.col(value_col))).alias("_a"),
        F.sum(F.when(F.col(name_col) == operand2, F.col(value_col))).alias("_b"),
    )
    a, b = F.col("_a"), F.col("_b")
    val = {
        "divide": F.when(b != 0, a / b),
        "multiply": a * b,
        "add": a + b,
        "subtract": a - b,
    }[operation]
    return agg.select(
        *extra_names,
        *[F.col(c) for c in dims],
        F.lit(new_name).alias(name_col),
        F.round(val, 4).alias(value_col),
    )


def streaming_generate_metric(
    stream: DataFrame,
    name_col: str,
    value_col: str,
    dims: list[str],
    new_name: str,
    operand1: str,
    operand2: str,
    operation: str = "divide",
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming metricsgeneration: the same conditional-sum derivation as
    `generate_metric`, keyed by (event-time tumbling window, dims) with a
    watermark bounding late data — append mode emits only finalized
    windows, so a derived ratio is never published from a half-seen
    denominator.  Per-batch plan is the identical partial+final hash
    aggregate (no self-join, no pivot); state is one (window, dims) row
    per open window, dropped at watermark passage."""
    s = stream.withWatermark(ts_col, watermark)
    return _generate_metric_grouped(
        s,
        [F.window(ts_col, window).alias("w")],
        ["w"],
        name_col,
        value_col,
        dims,
        new_name,
        operand1,
        operand2,
        operation,
    )


def increase_with_resets(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    counter_col: str,
    tiebreak: str | None = None,
    out_col: str = "increase",
) -> DataFrame:
    """Prometheus increase() over a resetting monotonic counter: per series
    (keys, ordered by ts[,tiebreak]) the increase is counter − lag(counter)
    when non-negative, else the raw counter value (reset detected — the
    counter restarted from 0, so everything seen since the restart counts).
    First point of a series yields NULL (no reference), matching
    delta_from_cumulative.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(counter_col).over(w)
    delta = F.col(counter_col) - prev
    inc = F.when(prev.isNull(), F.lit(None)).when(
        delta >= 0, delta
    ).otherwise(F.col(counter_col))
    return df.withColumn(out_col, inc)


def histogram_quantile(
    df: DataFrame,
    dim_col: str,
    value_col: str,
    q: float,
    bounds: list[float],
    out_col: str = "quantile",
) -> DataFrame:
    """Prometheus histogram_quantile(q) from raw samples bucketed at explicit
    *bounds*: per *dim_col*, assign each sample to its le-bucket, build the
    cumulative distribution, and linearly interpolate inside the first bucket
    whose cumulative count reaches rank = q·total.  Samples above the last
    finite bound land in the +Inf bucket; if the rank falls there the result
    clamps to the highest finite bound (promql behavior).

    Plan: one hash aggregate (dim, bucket) → one tiny window over #buckets
    rows per dim → filter to the target bucket.  Raw rows shuffle once as
    (dim, bucket_idx) pairs; everything after is O(#dims · #buckets).
    """
    v = F.col(value_col)
    # bucket index = first bound >= v, else len(bounds) (the +Inf bucket)
    idx = None
    for i, b in enumerate(bounds):
        idx = (F.when(v <= F.lit(b), i) if idx is None else idx.when(v <= F.lit(b), i))
    idx = idx.otherwise(len(bounds))

    per_bucket = (
        df.select(F.col(dim_col), idx.alias("bucket"))
        .groupBy(dim_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(dim_col).orderBy("bucket")
    wall = Window.partitionBy(dim_col)
    cum = per_bucket.select(
        F.col(dim_col),
        F.col("bucket"),
        F.col("n"),
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(wall).alias("total"),
    )
    rank = F.lit(q) * F.col("total")
    # first bucket whose cum >= rank
    hit = cum.filter(F.col("cum") >= rank).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy(dim_col).orderBy("bucket")),
    ).filter(F.col("rn") == 1)

    lo_arr = F.array(*[F.lit(float(b)) for b in ([0.0] + bounds)])
    # lower edge of bucket i is bounds[i-1] (0 for the first), upper is bounds[i]
    lower = F.element_at(lo_arr, F.col("bucket") + 1)
    upper = F.when(
        F.col("bucket") < len(bounds),
        F.element_at(F.array(*[F.lit(float(b)) for b in bounds]), F.col("bucket") + 1),
    )
    prev_cum = F.col("cum") - F.col("n")
    interp = lower + (rank - prev_cum) / F.col("n") * (upper - lower)
    result = F.when(F.col("bucket") >= len(bounds), F.lit(float(bounds[-1]))).otherwise(interp)
    return hit.select(F.col(dim_col), F.round(result, 4).alias(out_col))


def assemble_traces(
    df: DataFrame,
    trace_col: str,
    ts_col: str,
    tiebreak: str,
    span_col: str,
    sep: str = ">",
) -> DataFrame:
    """groupbytrace analog (processor/groupbytraceprocessor ~approx): gather
    the complete trace per id and emit span count, wall duration, and the
    ordered span path.  Spark: collect_list of (ts, tiebreak, span) structs +
    array_sort — struct comparison is lexicographic by field order, so the
    sort key is exactly (ts, tiebreak) and the result is deterministic under
    any partitioning.  One shuffle keyed by trace id; state per trace is the
    trace itself (same bound as the upstream processor's in-memory buffer).
    """
    from ..functions.scalars import epoch_micros

    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col), F.col(tiebreak), F.col(span_col)))
    )
    return df.groupBy(F.col(trace_col)).agg(
        F.count(F.lit(1)).alias("n_spans"),
        (epoch_micros(F.max(ts_col)) - epoch_micros(F.min(ts_col))).alias("duration_us"),
        F.array_join(F.transform(ordered, lambda s: s[span_col]), sep).alias("path"),
    )


def exponential_histogram(
    df: DataFrame,
    dim_col: str,
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """OTel exponential-histogram bucketing (pdata ExponentialHistogram data
    model, public spec): base = 2^(2^-scale); a positive value v lands in
    bucket index ceil(log2(v)·2^scale) − 1, so bucket i covers
    (base^i, base^(i+1)].  Zero/negative values go to the zero bucket (the
    spec's zero_count; this engine has no negative range in its metrics).

    Per *dim_col* emit zero_count, per-index bucket counts, and min/max
    index — one hash aggregate after a codegen index projection; only
    (dim, index) pairs shuffle.  Unlike explicit bounds, the index space is
    unbounded and self-scaling, which is why the collector's OTLP path
    prefers it at high dynamic range."""
    v = F.col(value_col)
    # round the scaled log to 9 decimals before ceil, mirrored in the SQL
    # oracle: on exact powers of the base the scaled log lands on an
    # integer, and a 1-ulp log2 difference between engines would flip the
    # ceil and shift the bucket by one — the rounding makes both engines
    # agree deterministically (and is far below the bucket width 2^-scale)
    idx = F.when(
        v > 0,
        (F.ceil(F.round(F.log2(v) * F.lit(float(1 << scale)), 9)) - 1).cast("long"),
    )
    staged = df.select(F.col(dim_col), idx.alias("bucket_idx"))
    return (
        staged.groupBy(dim_col, "bucket_idx")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(dim_col)
        .agg(
            F.sum(F.when(F.col("bucket_idx").isNull(), F.col("n")).otherwise(0))
            .alias("zero_count"),
            F.min("bucket_idx").alias("idx_min"),
            F.max("bucket_idx").alias("idx_max"),
            F.count(F.when(F.col("bucket_idx").isNotNull(), 1)).alias("n_buckets"),
            F.sum(F.when(F.col("bucket_idx").isNotNull(), F.col("n")).otherwise(0))
            .alias("n_values"),
        )
    )


def service_graph(
    spans: DataFrame,
    trace_col: str,
    span_id_col: str,
    parent_id_col: str,
    service_col: str,
    duration_col: str,
    error_pred: Column,
    bounds: list[float],
) -> DataFrame:
    """Service-graph connector (contrib servicegraphconnector analog,
    `connector/servicegraphconnector/connector.go` upstream behavior): pair
    each span with its parent by (trace_id, parent_span_id == span_id) and
    emit one row per (client_service, server_service) dependency edge with
    call count, error count, total server-side duration, and an
    explicit-bounds latency histogram (same cumulative-LE column layout as
    :func:`red_metrics`).

    The reference holds an in-memory pair store keyed by (trace, span) and
    matches client/server spans as they stream in; the batch-native shape is
    the same pairing as ONE equi-join: child spans (the server side of the
    edge, carrying duration + error) join parent spans (the client side,
    projected to just the service label) on the composite key.  Root spans
    (NULL parent) drop out of the inner join exactly like the reference's
    unpaired-span expiry.  At 10¹² rows both join sides hash-partition on
    the same (trace, id) composite, the parent side is projected to 3
    columns before the exchange, and the edge aggregate that follows is a
    #edges-sized hash agg with map-side partials — the only wide data
    movement is the one pairing shuffle, which no service-graph construction
    can avoid without co-bucketed input (sources/bucketed.py covers that
    variant for repeated builds over the same table).
    """
    child = spans.select(
        F.col(trace_col).alias("_tr"),
        F.col(parent_id_col).alias("_pid"),
        F.col(service_col).alias("server"),
        F.col(duration_col).alias("_dur"),
        error_pred.alias("_err"),
    ).filter(F.col("_pid").isNotNull())
    parent = spans.select(
        F.col(trace_col).alias("_tr"),
        F.col(span_id_col).alias("_sid"),
        F.col(service_col).alias("client"),
    )
    edges = child.join(
        parent,
        (child["_tr"] == parent["_tr"]) & (child["_pid"] == parent["_sid"]),
    )
    return edges.groupBy("client", "server").agg(
        *_red_aggs("_dur", F.col("_err"), bounds)
    )
