"""Stanza log-operator analogs: multiline recombine, severity mapping,
interval log-dedup (SURVEY.md §2.1/§2.4 ext).

Reference analogs (upstream collector ecosystem, public docs):

- the filelog receiver's stanza ``recombine`` operator: consecutive raw
  lines are folded into one record, split wherever a line matches the
  ``is_first_entry`` pattern (stack traces, wrapped JSON, continuation
  lines).  The reference does this with a per-file stateful line scanner;
  here it is the classic gaps-and-islands plan: a running count of
  first-line matches per stream assigns every line its record id (ONE
  window pass, partitioned by stream — streams are independent, so 100 TB
  of logs parallelize by stream with no cross-partition state), then one
  groupBy(stream, record) rebuilds each record with an order-preserving
  sorted aggregate.
- the stanza ``severity`` parser: config-driven mapping from raw severity
  strings to the OpenTelemetry severity number/text pairs.  Compiles to a
  single CASE chain — plan-time config, codegen execution, no UDF.
- the contrib ``logdedup`` processor: identical records within an interval
  collapse to one row carrying ``log_count`` and first/last observed
  timestamps.  Maps 1:1 onto a tumbling event-time window aggregate —
  partial (map-side) counts make the shuffle carry one row per distinct
  (window, body) combination, not one per record.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# OpenTelemetry severity numbers (log data model): text -> (number, text)
OTEL_SEVERITIES = {
    "trace": 1,
    "debug": 5,
    "info": 9,
    "warn": 13,
    "error": 17,
    "fatal": 21,
}


def recombine_multiline(
    df: DataFrame,
    stream_col: str,
    order_col: str,
    line_col: str,
    is_first: Column,
    sep: str = "\n",
) -> DataFrame:
    """(stream, record_id, first_<order>, n_lines, record): fold consecutive
    lines into records, starting a new record wherever ``is_first`` is true.

    Lines BEFORE the first match in a stream form record_id 0 (the stanza
    operator emits such orphan lines as their own record rather than
    dropping them — same here).  ``order_col`` must be unique per stream
    (a line number / offset); the rebuild sorts on it so the concatenation
    is deterministic under any partitioning.
    """
    w = Window.partitionBy(stream_col).orderBy(order_col)
    lines = df.select(
        F.col(stream_col),
        F.col(order_col),
        F.col(line_col),
        F.sum(is_first.cast("long")).over(w).alias("record_id"),
    )
    # order-preserving rebuild: sort (order, line) structs inside the group
    # (array_sort on the struct sorts by the first field), then strip the
    # order component — no second window pass, one hash aggregate
    merged = lines.groupBy(stream_col, "record_id").agg(
        F.min(order_col).alias(f"first_{order_col}"),
        F.count(F.lit(1)).alias("n_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(order_col), F.col(line_col)))),
                lambda s: s[line_col],
            ),
            sep,
        ).alias("record"),
    )
    return merged


def severity_map(
    df: DataFrame,
    text_col: str,
    mapping: dict[str, str] | None = None,
    default_number: int = 0,
    default_text: str = "UNSPECIFIED",
) -> DataFrame:
    """Append ``severity_number`` / ``severity_text`` derived from
    ``text_col`` via a config mapping of raw values to OTel severity names
    (case-insensitive).  Unmapped values get the defaults (OTel severity 0,
    UNSPECIFIED).  The whole mapping compiles into one CASE chain."""
    mapping = mapping or {}
    lowered = F.lower(F.col(text_col))
    num: Column = F.lit(default_number)
    txt: Column = F.lit(default_text)
    # build the CASE chain in reverse so the first dict entry wins
    for raw, sev in reversed(list(mapping.items())):
        sev_l = sev.lower()
        if sev_l not in OTEL_SEVERITIES:
            raise ValueError(f"unknown OTel severity {sev!r}")
        hit = lowered == raw.lower()
        num = F.when(hit, F.lit(OTEL_SEVERITIES[sev_l])).otherwise(num)
        txt = F.when(hit, F.lit(sev_l.upper())).otherwise(txt)
    return df.withColumn("severity_number", num.cast("long")).withColumn(
        "severity_text", txt
    )


def logdedup_interval(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    interval: str = "15 minutes",
) -> DataFrame:
    """Collapse records with identical ``key_cols`` inside each tumbling
    ``interval`` window into one row with ``log_count`` and the first/last
    observed timestamps — the contrib logdedup processor's emit shape."""
    return (
        df.groupBy(F.window(ts_col, interval).alias("w"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("log_count"),
            F.min(ts_col).alias("first_observed"),
            F.max(ts_col).alias("last_observed"),
        )
        .select(F.col("w.start").alias("ws"), *key_cols, "log_count", "first_observed", "last_observed")
    )


# Default variable-masking rules for template mining, applied in order:
# long hex runs (ids, digests) first so their digits don't fall through to
# the numeric mask, then any digit run.
TEMPLATE_MASKS: list[tuple[str, str]] = [
    (r"[0-9a-f]{8,}", "<HEX>"),
    (r"[0-9]+", "<NUM>"),
]


def template_mine(
    df: DataFrame,
    line_col: str,
    masks: list[tuple[str, str]] | None = None,
    agg_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Log-template mining, the masking core of Drain/Spell-style parsers
    (He et al., ICWS 2017, public): collapse every log line to its template
    by replacing variable fragments (numbers, hex ids) with typed
    placeholders, then aggregate per template.  The full Drain tree exists
    to discover UNKNOWN variable positions incrementally; on a batch engine
    the config-driven mask chain covers the same telemetry surface as the
    collector ecosystem's logstransform/parser pipelines while staying a
    pure projection.

    Scale shape: the mask chain compiles to one codegen projection of
    chained ``regexp_replace`` (no UDF, no per-row Python); the aggregate
    is map-side combinable, so the shuffle carries one row per distinct
    template per map task — #templates is the log-schema size (thousands),
    not the corpus size.  At 10^12 lines this is a scan plus a
    vocabulary-sized exchange.

    ``agg_cols`` adds caller aggregates (e.g. distinct users, first/last
    seen) next to the default ``n_lines`` count.  Returns one row per
    ``template``."""
    tpl = F.col(line_col)
    for pat, repl in masks if masks is not None else TEMPLATE_MASKS:
        tpl = F.regexp_replace(tpl, pat, repl)
    aggs = [F.count(F.lit(1)).alias("n_lines")]
    for name, col in (agg_cols or {}).items():
        aggs.append(col.alias(name))
    return df.withColumn("template", tpl).groupBy("template").agg(*aggs)


def burst_zscore(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    interval: str = "15 minutes",
    trail: int = 8,
    min_trail: int = 4,
    z_thresh: float = 2.0,
) -> DataFrame:
    """Rate-anomaly (burst) detector over tumbling event-time windows: for
    each (key, window) the record count is z-scored against the trailing
    ``trail`` windows' sample mean/stddev; ``is_burst`` flags z above
    ``z_thresh`` — the alerting shape behind log-volume anomaly detection
    in collector-backed pipelines (error-spike paging).  Sparse semantics:
    windows with zero records are absent, not zero-filled, so the baseline
    is "recent non-empty windows" (documented; zero-filling needs a
    calendar spine join, which callers can add).

    Scale shape: the corpus reduces to one map-side-combinable
    (window, key) count — the only corpus-sized shuffle; the trailing
    window function then runs per key over #time-buckets rows (a year of
    15-minute buckets is 35 k rows per key), trivially bounded.  Windows
    with fewer than ``min_trail`` trailing observations, or zero trailing
    variance, yield NULL z (never a divide — ANSI-safe).

    Returns (ws, key, n, trail_mean, trail_sd, z, is_burst)."""
    counts = (
        df.groupBy(F.window(ts_col, interval).alias("w"), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "key", "n")
    )
    return burst_scores_from_counts(counts, trail, min_trail, z_thresh)


def burst_scores_from_counts(
    counts: DataFrame,
    trail: int = 8,
    min_trail: int = 4,
    z_thresh: float = 2.0,
) -> DataFrame:
    """Scoring stage of :func:`burst_zscore` over a pre-aggregated
    ``(ws, key, n)`` counts frame — split out so the STREAMING path can
    share it: structured streaming produces the finalized counts (windowed
    agg + watermark, append mode), and this bounded #time-buckets-sized
    stage scores whatever counts table has accumulated.  Batch and stream
    therefore agree row-for-row on every finalized window (pytest-asserted
    in tests/test_streaming.py)."""
    w = Window.partitionBy("key").orderBy("ws").rowsBetween(-trail, -1)
    scored = counts.select(
        "ws",
        "key",
        "n",
        F.avg("n").over(w).alias("_mu"),
        F.stddev_samp("n").over(w).alias("_sd"),
        F.count(F.lit(1)).over(w).alias("_k"),
    ).filter(F.col("_k") >= min_trail)
    z = F.when(
        F.col("_sd") > 0, (F.col("n") - F.col("_mu")) / F.col("_sd")
    )
    return scored.select(
        "ws",
        "key",
        "n",
        F.round("_mu", 6).alias("trail_mean"),
        F.round("_sd", 6).alias("trail_sd"),
        F.round(z, 6).alias("z"),
        (z > z_thresh).alias("is_burst"),
    )


def streaming_window_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    interval: str = "15 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Streaming half of the burst detector: tumbling per-key counts with
    an event-time watermark, emitted in APPEND mode — each (ws, key, n) row
    is final when the watermark passes its window, exactly the incremental
    feed :func:`burst_scores_from_counts` scores.  State is one count per
    open (window, key) — bounded by watermark horizon × key cardinality."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, interval).alias("w"), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "key", "n")
    )


def sessionize_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak: str,
    type_col: str,
    gap: str = "30 minutes",
    k: int = 20,
    sep: str = ">",
) -> DataFrame:
    """Top-k session paths: sessions are inactivity-gap islands per user
    (a new session starts when the gap from the previous event exceeds
    ``gap``), each session's path is its ordered event-type string, and the
    output is the k most frequent paths — the "what do users actually do"
    table next to the funnel's hypothesis-driven one.

    Scale shape: two stacked per-user windows (lag + running sum — the same
    gaps-and-islands plan as ``recombine_multiline``; user keys are uniform
    and a user's history fits one task), one (user, session) aggregate with
    the array_sort ordered-rebuild idiom from ``assemble_traces``, then a
    map-side-combinable per-path count and a global TakeOrdered(k) — no
    full sort, #distinct-paths rows at the final exchange.

    Returns (path, n_sessions, n_users, avg_len) — top k by (count DESC,
    path ASC), deterministic."""
    from ..functions.scalars import epoch_micros

    import re

    m = re.match(r"(\d+)\s*minute", gap)
    if not m:
        raise ValueError(f"gap must be '<N> minutes', got {gap!r}")
    gap_us = int(m.group(1)) * 60_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    prev = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev.isNull() | (epoch_micros(F.col(ts_col)) - epoch_micros(prev) > gap_us), 1
    ).otherwise(0)
    with_sid = df.select(
        F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"),
        F.col(tiebreak).alias("_tb"), F.col(type_col).alias("_ty"),
        F.sum(new_sess).over(w).alias("_sid"),
    )
    ordered = F.array_sort(F.collect_list(F.struct("_ts", "_tb", "_ty")))
    sessions = with_sid.groupBy("_u", "_sid").agg(
        F.array_join(F.transform(ordered, lambda s: s["_ty"]), sep).alias("path"),
        F.count(F.lit(1)).alias("_len"),
    )
    return (
        sessions.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("_u").alias("n_users"),
            F.round(F.avg("_len"), 6).alias("avg_len"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
    )
