"""As-of (time-travel) join — engine extension (SURVEY §2.7 noted gap).

The reference has no relational join executor at all; training-data
pipelines routinely need "attach the latest right-side row at-or-before my
timestamp, per key" (slowly-changing dims, latest-rate lookup, last-event
context).  Spark has no ASOF JOIN builtin, so this implements the classic
union-and-carry plan, which is the scale-safe shape:

  1. union right rows (payload packed in one struct) with left rows,
  2. ONE shuffle: partitionBy(key) orderBy(ts, side) — right sorts before
     left at equal ts so `<=` semantics fall out of the frame,
  3. `last(payload, ignorenulls=True)` over an unbounded-preceding running
     frame carries the latest right payload forward,
  4. keep left rows, unpack the struct.

Cost: one shuffle of |L|+|R| rows on the join key — no range explode, no
per-row binary search, no broadcast requirement.  Skewed keys salt exactly
like any other keyed shuffle.  The DuckDB oracle uses its native ASOF JOIN,
so the two engines implement the semantics independently.

The right side must be unique per (key, ts) — dedupe first (e.g.
``groupBy(key, ts).agg(...)``) or matches at duplicated timestamps are
nondeterministic in BOTH engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts_col: str = "ts",
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every left row + the right row with the largest
    ``right.ts <= left.ts`` for the same key(s); right columns come back
    prefixed.  Unmatched left rows keep NULL right columns."""
    keys = [on] if isinstance(on, str) else list(on)
    r_payload = [c for c in right.columns if c not in keys]
    l_cols = [c for c in left.columns]

    # Join semantics: NULL keys and NULL timestamps never match (the DuckDB
    # ASOF oracle agrees: `r.ts <= l.ts` is NULL-false).  Window.partitionBy
    # would otherwise group NULL-key rows together, and Spark's nulls-first
    # ASC sort would place a NULL-ts right row at the head of every frame
    # and carry it forward as a "match".  NULL-key / NULL-ts LEFT rows still
    # flow through (left-join semantics — they just find nothing to match).
    drop = F.col(ts_col).isNull()
    for k in keys:
        drop = drop | F.col(k).isNull()
    right = right.filter(~drop)

    r = right.select(
        *keys,
        F.col(ts_col).alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),
        F.struct(*r_payload).alias("__asof_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c not in keys],
    )
    l = left.select(
        *keys,
        F.col(ts_col).alias("__asof_ts"),
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(r.schema["__asof_r"].dataType).alias("__asof_r"),
        *[F.col(c) for c in l_cols if c not in keys],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__asof_ts").asc(), F.col("__asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r.unionByName(l)
        .withColumn("__asof_match", F.last("__asof_r", ignorenulls=True).over(w))
        .filter(F.col("__asof_side") == 1)
    )
    out_cols = [F.col(c) for c in l_cols]
    out_cols += [F.col("__asof_match")[c].alias(f"{right_prefix}{c}") for c in r_payload]
    return carried.select(*out_cols)


def interval_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    ev_ts_col: str,
    iv_id_col: str,
    lo_col: str,
    hi_col: str,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Range (interval-containment) join without a theta join: each interval
    explodes into the coarse time buckets it covers, each event maps to its
    one bucket, the two sides EQUI-join on the bucket, and the exact
    lo ≤ ts ≤ hi containment runs as a post-join codegen filter.  This is
    the scalable form of "join every event to the incident windows that
    contain it" — the naive version is a BroadcastNestedLoopJoin that
    re-scans every event against every interval; this version shuffles
    (or broadcasts) hash-partitioned bucket keys like any equi-join, and
    AQE's skew split applies if one bucket is hot.  Fan-out per interval =
    its length in buckets (bounded by construction); events are never
    duplicated.

    Both sides' timestamps must already be int64 microseconds (the
    NTZ-safe unix_micros idiom).  Returns events joined with
    (iv_id, lo, hi) for every containing interval — aggregate downstream.
    Cited pattern: the bucketized range-join used by Spark range-join
    hints and interval libraries (public literature; e.g. the GenomicsDB /
    Databricks range-join bin strategy)."""
    b = F.lit(int(bucket_us))
    iv = intervals.select(
        F.col(iv_id_col),
        F.col(lo_col),
        F.col(hi_col),
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b), F.floor(F.col(hi_col) / b)
            )
        ).alias("_bk"),
    )
    ev = events.withColumn("_bk", F.floor(F.col(ev_ts_col) / b))
    return ev.join(iv, "_bk").filter(
        (F.col(ev_ts_col) >= F.col(lo_col)) & (F.col(ev_ts_col) <= F.col(hi_col))
    ).drop("_bk")
