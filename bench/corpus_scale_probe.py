"""Corpus-prep ladder scale probe (VERDICT r4 task 6).

`jobs/corpus_prep_job.py` has driver evidence only at sf0.01 (480 docs);
this probe runs the SAME `build()` composition at 10-20 M documents on the
box to show the ladder's shuffle shapes survive three orders of magnitude.

Two stages, each timed separately:

1. **generate** — a deterministic synthetic documents table (doc_id, text,
   source) written to parquet.  Everything derives from xxhash64(doc_id),
   so reruns are bit-identical:
   - ~40-120 words per doc from a ~50 k-word zipf-ish vocabulary;
   - ~3 % of docs are EXACT copies of a canonical doc in their 1000-id
     block (exercises `dedup_keep_canonical`);
   - ~20 % of docs carry one of 32 shared boilerplate sentences
     (exercises near-dup LSH + duplicate-span removal's hot-digest clamp:
     at 15 M docs a single boilerplate digest has df ≈ 100 k);
   - bench set = the synthetic docs with doc_id < 64, so decontamination
     has real matches.
2. **ladder** — `jobs.corpus_prep_job.build()` with the default stage set
   (decontaminate → exact dedup → minhash-LSH → df-capped Jaccard verify →
   connected components → duplicate-span removal → Gopher gates → mixture →
   split → pack), fully materialized via counts on kept/packed/stats.

Prints one JSON line with wall seconds, docs/sec through the ladder, and
output row counts; paste the row into BASELINE.md.

    python bench/corpus_scale_probe.py --docs 12000000 --cores 32
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def gen_documents(spark: SparkSession, n_docs: int, partitions: int) -> DataFrame:
    """Deterministic synthetic documents table: (doc_id, text, source)."""
    ids = spark.range(0, n_docs, 1, partitions).withColumnRenamed("id", "doc_id")
    h = F.xxhash64(F.col("doc_id"))
    n_words = (F.pmod(h, F.lit(81)) + F.lit(40)).cast("int")  # 40..120 words
    # words: skewed into a <=50k vocab as a product of two uniform hashes
    # (224*224 = 50176 word ids, mass concentrated at small products — a
    # crude zipf so shingle df is non-uniform like real text); each word is
    # "w<int>" so the text is realistic-shaped but fully synthetic
    def _word(seed_col, i):
        a = F.pmod(F.xxhash64(seed_col, i), F.lit(224))
        b = F.pmod(F.xxhash64(seed_col, i, F.lit(1)), F.lit(224))
        return F.concat(F.lit("w"), (a * b).cast("string"))

    words = F.transform(F.sequence(F.lit(0), n_words - F.lit(1)), lambda i: _word(F.col("doc_id"), i))
    base_text = F.array_join(words, " ")
    # ~20% of docs append one of 32 shared boilerplate sentences (12 words,
    # well past dup-span k=8) -> hot digests with df ~ n_docs/160 each
    bp_id = F.pmod(F.xxhash64(F.col("doc_id"), F.lit("bp")), F.lit(160))
    boiler = F.concat_ws(
        " ", *[F.concat(F.lit(f"bp{j}x"), bp_id.cast("string")) for j in range(12)]
    )
    text = F.when(bp_id < F.lit(32), F.concat(base_text, F.lit(" "), boiler)).otherwise(
        base_text
    )
    # ~3% exact duplicates: doc_id % 37 == 5 copies the text of the first
    # id in its 1000-block (recompute the SAME expression over that id)
    canon = F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(1000))
    ch = F.xxhash64(canon)
    cn_words = (F.pmod(ch, F.lit(81)) + F.lit(40)).cast("int")
    cwords = F.transform(F.sequence(F.lit(0), cn_words - F.lit(1)), lambda i: _word(canon, i))
    cbp = F.pmod(F.xxhash64(canon, F.lit("bp")), F.lit(160))
    cboiler = F.concat_ws(
        " ", *[F.concat(F.lit(f"bp{j}x"), cbp.cast("string")) for j in range(12)]
    )
    ctext = F.when(cbp < F.lit(32), F.concat(F.array_join(cwords, " "), F.lit(" "), cboiler)).otherwise(
        F.array_join(cwords, " ")
    )
    text = F.when(F.pmod(F.col("doc_id"), F.lit(37)) == F.lit(5), ctext).otherwise(text)
    source = F.concat(
        F.lit("src"), F.pmod(F.xxhash64(F.col("doc_id"), F.lit("s")), F.lit(4)).cast("string")
    )
    return ids.select("doc_id", text.alias("text"), source.alias("source"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=12_000_000)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--workdir", default="/tmp/corpus_probe")
    ap.add_argument("--max-len", type=int, default=512)
    ap.add_argument("--keep", action="store_true", help="keep workdir parquet")
    args = ap.parse_args()

    from jobs.corpus_prep_job import build
    from opentelemetry_collector_spark.session import get_spark

    # Scale-probe memory model: one local JVM stands in for the whole
    # cluster, so give it cluster-shaped memory (~2 GiB/core, the ordinary
    # executor sizing) instead of the 8g test default — the first 10M-doc
    # run OOM'd the 32-thread JVM on an 8 GiB heap mid-ladder.  4 shuffle
    # partitions/core halves per-task hash-aggregate footprint on the
    # shingle explodes; AQE coalesces the small ones back.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{max(8, 2 * args.cores)}g")
    spark = get_spark(
        app_name="corpus-scale-probe",
        cores=args.cores,
        shuffle_partitions=4 * args.cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("WARN")

    in_path = os.path.join(args.workdir, "documents")
    shutil.rmtree(args.workdir, ignore_errors=True)

    t0 = time.time()
    gen_documents(spark, args.docs, partitions=4 * args.cores).write.mode(
        "overwrite"
    ).parquet(in_path)
    gen_s = time.time() - t0

    d = spark.read.parquet(in_path)
    bench = d.filter(F.col("doc_id") < 64)
    corpus = d.filter(F.col("doc_id") >= 64)

    t1 = time.time()
    # xxhash64 digests: the declared scale form of the dup-span stage
    # (8-byte longs through every shuffle; output-identical to md5)
    out = build(spark, corpus, bench, max_len=args.max_len, dup_span_digest="xxhash64")
    counts = {}
    stage_s = {}
    for name in ("kept", "packed", "stats"):  # parquet write = the job's real action
        ts = time.time()
        path = os.path.join(args.workdir, name)
        out[name].write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()
        # 'kept' pays the whole ladder through hash_split (persisted there);
        # 'packed' adds tokenization + greedy packing; 'stats' folds packed
        stage_s[name] = round(time.time() - ts, 1)
    packed = (
        spark.read.parquet(os.path.join(args.workdir, "packed"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.size("tokens")).alias("tok"))
        .collect()[0]
    )
    ladder_s = time.time() - t1
    kept_n, stats_n = counts["kept"], counts["stats"]

    print(
        json.dumps(
            {
                "metric": "corpus_prep ladder docs/sec",
                "docs": args.docs,
                "cores": args.cores,
                "gen_s": round(gen_s, 1),
                "ladder_s": round(ladder_s, 1),
                "docs_per_sec": round(args.docs / ladder_s, 1),
                "stage_s": stage_s,
                "kept_docs": kept_n,
                "packed_seqs": int(packed["n"]),
                "packed_tokens": int(packed["tok"]),
                "stats_rows": stats_n,
            }
        )
    )
    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
