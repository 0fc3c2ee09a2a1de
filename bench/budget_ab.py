"""A/B: per-stratum one-partition Window funnel vs two-phase prefix sum.

`token_budget_sample` claims the two-phase global-prefix-sum shape exists
because the naive form — `Window.partitionBy(source).orderBy(...)` running
sum — serializes each stratum onto ONE task, so a 4-source corpus uses at
most 4 cores no matter the cluster.  This script MEASURES that claim on the
same input (20M rows, 4 strata, identical deterministic content) with each
variant in its own fresh JVM:

    python bench/budget_ab.py --rows 20000000 --cores 32

Prints one JSON line with both wall times, the speedup, and an equality
check (both variants must keep identical (count, sum) — the two shapes are
the same function), and writes BENCH/budget_ab.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

VARIANT_SRC = r"""
import json, sys, time
import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window

variant, rows, cores, budget, strata = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", str(cores))
    .config("spark.driver.memory", "8g")
    .config("spark.sql.adaptive.enabled", "true")
    .appName(f"budget-ab-{variant}")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo")
from opentelemetry_collector_spark.functions.hashing import NUM_SAMPLER_BUCKETS, portable_bucket
from opentelemetry_collector_spark.operators.sampling import token_budget_sample

df = (
    spark.range(rows)
    .select(
        F.col("id"),
        F.concat(F.lit("s"), (F.col("id") % strata).cast("string")).alias("src"),
        (50 + F.col("id") % 100).alias("w"),
    )
    .persist()
)
df.count()  # pin the input out of the timed region

t0 = time.time()
if variant == "naive":
    b = portable_bucket(F.col("id"), NUM_SAMPLER_BUCKETS)
    win = Window.partitionBy("src").orderBy(b, "id").rowsBetween(Window.unboundedPreceding, 0)
    out = df.withColumn("cum_weight", F.sum("w").over(win)).filter(F.col("cum_weight") <= budget)
else:
    out = token_budget_sample(df, "src", "id", "w", budget)
agg = out.agg(
    F.count(F.lit(1)).alias("n"), F.sum("cum_weight").alias("s"), F.sum("w").alias("sw")
).collect()[0]
wall = time.time() - t0
print(json.dumps({"variant": variant, "wall_s": round(wall, 2),
                  "kept": agg["n"], "sum_cum": int(agg["s"]), "sum_w": int(agg["sw"])}))
"""


def run_variant(variant: str, rows: int, cores: int, budget: int, strata: int) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", VARIANT_SRC, variant, str(rows), str(cores), str(budget), str(strata)],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "PYTHONPATH": "/root/repo"},
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-3000:])
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--strata", type=int, default=4)
    ap.add_argument("--budget", type=int, default=None,
                    help="per-stratum budget; default keeps ~half of each stratum")
    args = ap.parse_args()
    # mean w = 99.5, rows/4 per stratum -> half-stratum budget
    budget = args.budget or int(args.rows / args.strata * 99.5 / 2)

    naive = run_variant("naive", args.rows, args.cores, budget, args.strata)
    two_phase = run_variant("two_phase", args.rows, args.cores, budget, args.strata)
    assert (naive["kept"], naive["sum_cum"], naive["sum_w"]) == (
        two_phase["kept"], two_phase["sum_cum"], two_phase["sum_w"],
    ), (naive, two_phase)

    result = {
        "metric": "token_budget_sample naive-window vs two-phase prefix sum",
        "rows": args.rows, "strata": args.strata, "cores": args.cores, "budget": budget,
        "kept_rows": naive["kept"],
        "naive_wall_s": naive["wall_s"], "two_phase_wall_s": two_phase["wall_s"],
        "speedup": round(naive["wall_s"] / two_phase["wall_s"], 2),
        "results_identical": True,
    }
    print(json.dumps(result))
    # merge into the evidence file: one entry per (rows, strata) config
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH", "budget_ab.json")
    entries = []
    if os.path.exists(path):
        prior = json.load(open(path))
        entries = prior if isinstance(prior, list) else [prior]
    entries = [e for e in entries if (e["rows"], e["strata"]) != (args.rows, args.strata)]
    entries.append(result)
    entries.sort(key=lambda e: (e["strata"], e["rows"]))
    with open(path, "w") as f:
        json.dump(entries, f, indent=2)


if __name__ == "__main__":
    main()
