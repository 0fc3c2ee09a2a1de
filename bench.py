"""Benchmark entry point (driver contract + BASELINE.md protocol).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {key: sec, ...}, "sf": ...,
   "pipeline": {"rows": N, "wall_s": W, "seq_per_sec": T, "cores": C}}

- headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  on local[$SPARK_GRAFT_CPUS]; each is fully materialized through the noop
  sink (all compute, no driver collect).
- the flagship parse→enrich→route→aggregate pipeline runs over a synthetic
  ``sequences`` parquet snapshot (SPARK_GRAFT_BENCH_ROWS, default 8,000,000
  rows, zipf-skewed source) — its sequences/sec is the BASELINE.json north
  metric; scaling protocol (local[8] vs local[32]) in bench/run_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F

from opentelemetry_collector_spark.plans.pipeline import run_pipeline
from opentelemetry_collector_spark.queries import QUERIES
from opentelemetry_collector_spark.session import get_spark
from opentelemetry_collector_spark.sources.synthetic import gen_lookup, gen_telemetry

HEADLINE = [
    "join_star_schema",
    "agg_counts_by_source",
    "agg_latest_by_key",
    "route_fanout",
    "parse_grok",
    "win_cumulative_sum",
    "tail_sample_semi_join",
    "sample_prob",
    "filter_include_exclude",
    "agg_rollup_counts",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_bucketed",
    "token_freq_topk",
    "session_window_agg",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "relabel_chain",
    "join_asof",
    "text_contamination",
    "win_sliding_counts",
    # r3 additions: every key slower than ~0.3 s at sf0.1 is benched so
    # regressions are visible round-over-round (VERDICT r2 task 5)
    "time_rollup_cascade",
    "dedup_corpus_keep",
    "dedup_corpus_keep_lsh",
    "mm_resize",
    "pack_sequences",
    "ann_ivf_topk",
    "ann_ivf_refined",
    "dedup_components",
    "ann_cosine_topk",
    "chunk_token_stream",
    # r3 metrics-processor + curation suite (all ≥0.3 s at sf0.1)
    "tail_sample_policies",
    "metrics_generation",
    "attr_redact_pii",
    "span_metrics_red",
    "metrics_transform",
    "rate_counter_reset",
    "text_entropy",
    "trace_assemble",
    "hist_quantile",
    "text_unigram_logprob",
    "text_boilerplate_ratio",
    "transform_ottl",
    "hist_exponential",
    # r4 additions
    "corpus_prep_e2e",
    "text_bigram_logprob",
    "transform_ottl_parse",
    "text_dup_spans",
    "sample_token_budget",
    "bpe_pair_topk",
    "sample_epoch_replicate",
    "text_dup_spans_removed",
    "text_dsir_weight",
    # r5 additions
    "text_dsir_weight_hashed",
    "text_unigram_logprob_hashed",
    "dedup_semantic",
    "text_quality_classifier",
    "text_pii_redact",
    "text_gopher_gates",
    "bpe_encode",
    "text_bm25_topk",
    "dedup_incremental",
    "dedup_priority_groups",
    "token_kl_by_source",
    "text_winnowing_fingerprint",
    "contamination_matrix",
    "dedup_cluster_sizes",
    "connector_servicegraph",
    "text_paragraph_dedup",
    "sample_temperature",
    "token_pmi_topk",
    "vocab_oov_rate",
    "pack_efficiency_audit",
    "token_coverage_curve",
    "dedup_soft_weights",
    "log_template_mining",
    "log_error_burst",
    "token_zipf_slope",
    "token_hapax_rate",
    "funnel_conversion",
    "cohort_retention",
    "text_ngram_novelty",
    "events_anomaly_mad",
    "token_compression_ratio",
    "event_transition_matrix",
    "token_bigram_entropy",
    "embedding_label_dispersion",
    "session_path_topk",
    "mixture_epoch_plan",
    "text_lang_confusion",
    "metrics_ewma_smooth",
    "template_novelty",
    "servicegraph_degree",
    "events_user_skew",
    "lsh_band_stats",
    "sample_uniform_topk",
    "dedup_source_overlap",
    "chunk_sliding_window",
    "ann_range_search",
    "text_heldout_logprob",
    "ann_sq8_audit",
    "funnel_latency",
    "events_cooccurrence_lift",
    "events_hourly_profile",
    "join_range_bucketed",
    "sample_priority",
    "mixture_interleave",
    "graph_pagerank",
    "sketch_countmin_audit",
    "graph_label_propagation",
    "text_bigram_kn",
]

# Keys slower than 1.5x their committed per-key baseline are flagged in the
# output's `regressions` list (BENCH/query_baseline.json, recorded from the
# r04 sweep).  1.5x sits above the documented same-host variance band so a
# flag means a plan change, not noise.
REGRESSION_RATIO = 1.5


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_input(spark, n_rows: int, path: str) -> None:
    """Materialize the synthetic sequences input once (cold, re-used)."""
    if not os.path.isdir(path):
        gen_telemetry(spark, n_rows, seed=42, partitions=64).write.mode("overwrite").parquet(path)


def run_pipeline_trials(spark, n_rows: int, trials: int) -> float:
    """Warmup + `trials` timed passes of the flagship pipeline; returns the
    best wall.  min-of-N because the box is a shared host: measured
    same-code trial variance reaches 2× within a single minute (16 s vs
    36 s walls, 2026-08-17 afternoon) — min recovers the quiet-host
    number."""
    input_path = f"/tmp/spark_graft_bench_input_{n_rows}"
    bench_input(spark, n_rows, input_path)
    records = spark.read.parquet(input_path)
    lookup = gen_lookup(spark)
    best = None
    for trial in range(max(trials, 1) + 1):  # first pass = warmup (JIT/codegen)
        t0 = time.monotonic()
        out = run_pipeline(spark, records, lookup)
        # materialize the full DAG: routed rows + both obsreport aggregates
        materialize(out["tagged"])
        out["source_counts"].count()
        out["sink_counts"].count()
        wall = time.monotonic() - t0
        if trial > 0:
            best = wall if best is None else min(best, wall)
    return best


def pipeline_only() -> None:
    """Subprocess entry: measure the flagship pipeline in a FRESH JVM and
    print one JSON line.  Isolating it from the ~44-query sweep is the r03
    lesson — sharing a JVM with the sweep's GC/codegen history drifted the
    headline number 21 % below the standalone probe on identical code."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "20000000"))
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "5"))
    spark = get_spark(app_name="bench-pipeline", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    best = run_pipeline_trials(spark, n_rows, trials)
    print(json.dumps({"wall_s": round(best, 3), "rows": n_rows, "trials": trials}))
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 20M rows matches the BASELINE.md scaling-protocol input size so the
    # recorded seq/s is apples-to-apples with the baseline table
    n_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "20000000"))
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))
    pipe_trials = trials if "SPARK_GRAFT_BENCH_TRIALS" in os.environ else max(trials, 5)

    # --- flagship pipeline FIRST, in its own fresh JVM ----------------------
    # (BENCH protocol v4: the north metric must not share a JVM with the
    # query sweep; see pipeline_only docstring)
    best = None
    if os.environ.get("SPARK_GRAFT_INPROC_PIPELINE") != "1":
        import subprocess

        env = dict(os.environ, SPARK_GRAFT_BENCH_TRIALS=str(pipe_trials))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--pipeline-only"],
            capture_output=True, text=True, env=env,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                best = json.loads(line)["wall_s"]
                break
            except (ValueError, KeyError):
                continue

    spark = get_spark(app_name="bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if best is None:  # subprocess unavailable/failed — measure in-process
        best = run_pipeline_trials(spark, n_rows, pipe_trials)

    # --- headline operator queries at sf_dir -------------------------------
    # best-of-2 timed runs after a warmup: the sandbox is a shared host with
    # intermittent steal time, and min is the least-interference estimate
    qtimes: dict[str, float] = {}
    for key in HEADLINE:
        fn = QUERIES[key]
        fn(spark, sf_dir).count()  # warm: plan + scan caches
        best_q = None
        for _ in range(max(1, trials)):
            t0 = time.monotonic()
            materialize(fn(spark, sf_dir))
            dt = time.monotonic() - t0
            best_q = dt if best_q is None else min(best_q, dt)
        qtimes[key] = round(best_q, 3)

    thr = n_rows / best

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "query_baseline.json"
    )
    regressions = []
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        base_q = base.get("queries", {})
        reshaped = base.get("reshaped", {})
        for key, sec in qtimes.items():
            ref = base_q.get(key)
            if ref and sec > REGRESSION_RATIO * ref:
                row = {"key": key, "sec": sec, "baseline": ref, "ratio": round(sec / ref, 2)}
                if key in reshaped:  # documented intentional plan change
                    row["expected"] = reshaped[key]
                regressions.append(row)

    scaling = None
    scal_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling.json")
    if os.path.exists(scal_path):
        with open(scal_path) as f:
            sc = json.load(f)
        scaling = {k: sc[k] for k in ("n_cores", "fourn_cores", "thr_n", "thr_4n", "efficiency", "rows") if k in sc}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "e2e parse→enrich→route→aggregate + headline operator queries",
                "value": round(sum(qtimes.values()) + best, 3),
                "unit": "sec",
                "queries": qtimes,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "pipeline": {
                    "rows": n_rows,
                    "wall_s": round(best, 3),
                    "seq_per_sec": round(thr, 1),
                    "cores": cpus,
                },
                "scaling": scaling,
                "regressions": regressions,
            }
        )
    )


if __name__ == "__main__":
    if "--pipeline-only" in sys.argv:
        pipeline_only()
    else:
        main()
