"""Log-insights scale probe: the five stages of jobs/log_insights_job.py
(templates, interval dedup, burst z-score, funnel, cohorts) driven over a
deterministic synthetic events table at probe scale (default 50 M rows —
5,000x the sf0.01 gate table), each stage materialized via count().

Everything derives from xxhash64(event_id), so reruns are bit-identical:
~20 events/user, 30 days of event time (2,880 15-minute buckets), zipf-ish
event-type mix (view 60 % ... error 5 %), JSON props with a numeric field.

Prints one JSON line with per-stage wall seconds, rows/sec through the
whole suite, and per-stage output rows; paste into BENCH/BASELINE.md.

    python bench/log_insights_probe.py --rows 50000000 --cores 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def gen_events(spark: SparkSession, n_rows: int, partitions: int) -> DataFrame:
    ids = spark.range(0, n_rows, 1, partitions).withColumnRenamed("id", "event_id")
    h = lambda tag: F.pmod(F.xxhash64(F.col("event_id"), F.lit(tag)), F.lit(1_000_000))  # noqa: E731
    u01 = lambda tag: h(tag).cast("double") / 1_000_000.0  # noqa: E731
    etype = (
        F.when(u01("ty") < 0.60, "view")
        .when(u01("ty") < 0.85, "click")
        .when(u01("ty") < 0.90, "purchase")
        .when(u01("ty") < 0.95, "signup")
        .otherwise("error")
    )
    return ids.select(
        "event_id",
        F.timestamp_seconds(
            F.lit(1_704_067_200)
            + F.pmod(F.xxhash64("event_id", F.lit("t")), F.lit(86_400 * 30))
        ).alias("ts"),
        F.pmod(F.xxhash64("event_id", F.lit("u")), F.lit(max(n_rows // 20, 1))).alias(
            "user_id"
        ),
        etype.alias("event_type"),
        (h("v").cast("double") / 1_000.0).alias("value"),
        F.concat(
            F.lit('{"k": '), F.pmod(F.xxhash64("event_id", F.lit("k")), F.lit(100)).cast("string"), F.lit("}")
        ).alias("props"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000_000)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from opentelemetry_collector_spark.operators.aggregates import (
        cohort_retention,
        funnel_steps,
        transition_matrix,
    )
    from opentelemetry_collector_spark.operators.stanza import (
        burst_zscore,
        logdedup_interval,
        template_mine,
    )
    from opentelemetry_collector_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{max(8, 2 * args.cores)}g")
    spark = get_spark(
        app_name="log-insights-probe",
        cores=args.cores,
        shuffle_partitions=4 * args.cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = gen_events(spark, args.rows, partitions=4 * args.cores)
    lined = ev.withColumn(
        "line",
        F.concat(F.col("event_type"), F.lit(" user="),
                 F.col("user_id").cast("string"), F.lit(" "), F.col("props")),
    )
    stages = {
        "templates": lambda: template_mine(
            lined, "line", agg_cols={"n_users": F.countDistinct("user_id")}
        ),
        "dedup": lambda: logdedup_interval(ev, "ts", ["event_type", "props"], "15 minutes"),
        "bursts": lambda: burst_zscore(ev, "ts", "event_type", interval="15 minutes"),
        "funnel": lambda: funnel_steps(ev, "user_id", "ts", "event_type",
                                       ["view", "click", "purchase"]),
        "cohorts": lambda: cohort_retention(ev, "user_id", "ts"),
        "transitions": lambda: transition_matrix(ev, "user_id", "ts", "event_type", "event_id"),
    }
    stage_s, rows_out = {}, {}
    t0 = time.time()
    for name, fn in stages.items():
        t = time.time()
        rows_out[name] = fn().count()
        stage_s[name] = round(time.time() - t, 1)
    wall = time.time() - t0
    print(json.dumps({
        "metric": "log-insights suite rows/sec",
        "rows": args.rows,
        "cores": args.cores,
        "wall_s": round(wall, 1),
        "rows_per_sec_per_stage_avg": round(args.rows * len(stages) / wall, 1),
        "stage_s": stage_s,
        "rows_out": rows_out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
