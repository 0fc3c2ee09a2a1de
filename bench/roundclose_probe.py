"""Scale probes for the round-close operators (BASELINE.md evidence).

The correctness gate runs these at sf0.01 (500 docs); this probe runs the
same operators at millions of rows on local[32] to show the declared scale
shapes hold where it matters:

- ``interleave_by_weight`` at --docs (default 20 M): TWO two-phase global
  prefix sums (range shuffle + broadcast offsets each) — the cost must stay
  ~2x one epoch_shuffle-style global rank, never a one-partition funnel.
- ``priority_sample`` at the same --docs: TakeOrderedAndProject — must stay
  scan-bound (no shuffle at all).
- ``pagerank_fixed`` at --edges (default 10 M, ~1 M nodes, 5 rounds):
  per-round cost = one #nodes-row rank shuffle against the pre-partitioned
  edge frame + one combinable groupBy(dst).

    python bench/roundclose_probe.py --docs 20000000 --edges 10000000

Prints one JSON line per probe.  Inputs are deterministic ``spark.range``
projections (no files): generation is fused into the first stage and costs
one codegen pass.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from opentelemetry_collector_spark.operators.components import pagerank_fixed  # noqa: E402
from opentelemetry_collector_spark.operators.sampling import (  # noqa: E402
    interleave_by_weight,
    priority_sample,
)
from opentelemetry_collector_spark.session import get_spark  # noqa: E402

WEIGHTS = {f"src{i}": w for i, w in enumerate(
    [0.30, 0.20, 0.15, 0.10, 0.08, 0.07, 0.04, 0.03, 0.02, 0.01])}


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000_000)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark(app_name="roundclose-probe", cores=args.cores,
                      shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.range(args.docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), F.pmod(F.xxhash64("id"), F.lit(10))).alias("source"),
        (F.lit(1) + F.pmod(F.xxhash64("id", F.lit(7)), F.lit(4000))).alias("n_chars"),
    )

    t0 = time.monotonic()
    noop(interleave_by_weight(docs, "source", "doc_id", WEIGHTS))
    w = time.monotonic() - t0
    print(json.dumps({"probe": "mixture_interleave", "docs": args.docs,
                      "wall_s": round(w, 1), "docs_per_sec": round(args.docs / w)}))

    t0 = time.monotonic()
    noop(priority_sample(docs, "doc_id", "n_chars", k=1000))
    w = time.monotonic() - t0
    print(json.dumps({"probe": "sample_priority", "docs": args.docs,
                      "wall_s": round(w, 1), "docs_per_sec": round(args.docs / w)}))

    edges = spark.range(args.edges).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(args.nodes)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(args.nodes)).alias("dst"),
        (F.lit(1) + F.pmod(F.col("id"), F.lit(5))).alias("w"),
    )
    t0 = time.monotonic()
    noop(pagerank_fixed(edges, "src", "dst", "w", iters=5))
    w = time.monotonic() - t0
    print(json.dumps({"probe": "graph_pagerank", "edges": args.edges,
                      "nodes": args.nodes, "iters": 5, "wall_s": round(w, 1),
                      "edge_rounds_per_sec": round(5 * args.edges / w)}))
    spark.stop()


if __name__ == "__main__":
    main()
