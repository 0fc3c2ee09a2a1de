"""spark-submit entrypoint for the log-analytics insight suite.

    spark-submit --master local[8] --driver-memory 4g \
        --py-files dist/pipeline.zip \
        jobs/log_insights_job.py --input /data/events --output /tmp/log_out

The deployable composition of the log/event analytics operators the driver
gate value-checks individually (queries.py keys in parentheses) — the
telemetry counterpart of corpus_prep_job.py's training-data ladder:

1. severity mapping           (log_severity_map)  stanza severity parser
2. template mining            (log_template_mining)  Drain-style masking
3. interval log-dedup         (log_dedup_interval)  contrib logdedup
4. burst z-score alerting     (log_error_burst)  trailing-window anomaly
5. ordered funnel conversion  (funnel_conversion)
6. weekly cohort retention    (cohort_retention)

Every stage shares ONE pass over the events table where the plan allows
(severity + template line are projections fused into the same scan; the
dedup/burst window counts reuse the same tumbling bucketing).  Outputs:

    <output>/templates/   (template, n_lines, n_users, first/last event)
    <output>/dedup/       per-interval collapsed records
    <output>/bursts/      z-scored (window, event_type) anomalies
    <output>/funnel/      per-step reach + conversion
    <output>/cohorts/     cohort x week-offset retention matrix
    <output>/manifest.json  row counts + config, for resume/audit

Like the other jobs, the master comes from spark-submit — nothing here
hardcodes local mode; stages are shuffle-shaped for a real cluster (map-side
combinable aggregates everywhere; the only windows run over bounded
template/bucket/cell tables, never the raw stream)."""

from __future__ import annotations

import argparse
import json
import os
import time

import pyspark.sql.functions as F
from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="events parquet: event_id, ts, user_id, event_type, value, props")
    ap.add_argument("--output", required=True)
    ap.add_argument("--interval", default="15 minutes", help="dedup/burst tumbling window")
    ap.add_argument("--trail", type=int, default=8, help="burst trailing-window count")
    ap.add_argument("--z-thresh", type=float, default=2.0)
    ap.add_argument("--funnel", default="view,click,purchase", help="ordered step types, comma-separated")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("otel-log-insights-job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from opentelemetry_collector_spark.operators.aggregates import (
        cohort_retention,
        funnel_steps,
    )
    from opentelemetry_collector_spark.operators.stanza import (
        burst_zscore,
        logdedup_interval,
        severity_map,
        template_mine,
    )

    ev = spark.read.parquet(args.input)
    t0 = time.monotonic()

    # severity + template line fuse into one projection over the scan
    sev = severity_map(ev, "event_type", {
        "error": "error", "purchase": "warn", "signup": "info",
        "click": "info", "view": "debug",
    }).withColumn(
        "line",
        F.concat(F.col("event_type"), F.lit(" user="),
                 F.col("user_id").cast("string"), F.lit(" "), F.col("props")),
    )

    outputs = {
        "templates": template_mine(sev, "line", agg_cols={
            "n_users": F.countDistinct("user_id"),
            "first_event": F.min("event_id"),
            "last_event": F.max("event_id"),
            "max_severity": F.max("severity_number"),
        }),
        "dedup": logdedup_interval(ev, "ts", ["event_type", "props"], args.interval),
        "bursts": burst_zscore(ev, "ts", "event_type", interval=args.interval,
                               trail=args.trail, z_thresh=args.z_thresh),
        "funnel": funnel_steps(ev, "user_id", "ts", "event_type",
                               args.funnel.split(",")),
        "cohorts": cohort_retention(ev, "user_id", "ts"),
    }

    counts = {}
    for name, df in outputs.items():
        path = os.path.join(args.output, name)
        df.write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()

    wall = time.monotonic() - t0
    manifest = {
        "rows_in": ev.count(),
        "outputs": counts,
        "wall_s": round(wall, 3),
        "config": {"interval": args.interval, "trail": args.trail,
                   "z_thresh": args.z_thresh, "funnel": args.funnel},
    }
    with open(os.path.join(args.output, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
